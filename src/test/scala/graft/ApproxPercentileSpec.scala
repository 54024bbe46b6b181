package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Accuracy bound for q_approx_percentiles: the Greenwald-Khanna sketch
  * guarantees rank error ≤ n/accuracy (accuracy = 10000 here, so ≤ ~6
  * ranks even at sf0.01) and returns an OBSERVED value, not an
  * interpolation — on the dense integer quantity domain that means each
  * estimate must land within one quantity unit of the exact interpolated
  * percentile. Run at two scale factors, same pattern as
  * ApproxDistinctSpec.
  */
class ApproxPercentileSpec extends AnyFunSuite {

  private val Tol = 1.0

  private def check(dir: String): Unit = {
    val spark = TestSpark.spark
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = toMap(Relational.qApproxPercentiles(spark, dir))
    val exact = toMap(Relational.qPercentiles(spark, dir))
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, (e25, e50, e75)) =>
      val (a25, a50, a75) = approx(flag)
      Seq(("p25", a25, e25), ("p50", a50, e50), ("p75", a75, e75)).foreach {
        case (p, a, e) =>
          assert(math.abs(a - e) <= Tol,
            s"$dir flag=$flag $p: approx=$a exact=$e |err| > $Tol")
      }
    }
  }

  test("approx percentiles within one unit of exact at sf0.001") {
    check(TestSpark.Sf0001)
  }

  test("approx percentiles within one unit of exact at sf0.01") {
    check(TestSpark.Sf001)
  }
}
