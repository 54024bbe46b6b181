package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Extensibility
import graft.operators.Relational

/** Accuracy bound for q_approx_distinct: the HLL++ estimates must sit
  * within 4× the configured relative standard deviation (Spark default
  * rsd = 0.05) of the exact distinct counts from the q_distinct_agg twin.
  * 4σ makes a spurious failure vanishingly unlikely while still catching
  * any real sketch regression — the same bounded-check pattern
  * SketchAccuracySpec applies to MinHash and AnnRecallSpec to ANN. Run at
  * two scale factors so the bound holds as cardinalities grow 10×.
  */
class ApproxDistinctSpec extends AnyFunSuite {

  private val Rsd = 0.05 // approx_count_distinct's documented default
  private val Tol = 4 * Rsd

  private def check(dir: String): Unit = {
    val spark = TestSpark.spark
    val approx = Extensibility.approxDistinct(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Relational.qDistinctAgg(spark, dir)
      .select(col("l_returnflag"), col("n_part"), col("n_supp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, (parts, supps)) =>
      val (aParts, aSupps) = approx(flag)
      val errP = math.abs(aParts - parts).toDouble / parts
      val errS = math.abs(aSupps - supps).toDouble / supps
      assert(errP <= Tol,
        s"$dir flag=$flag parts: approx=$aParts exact=$parts err=$errP > $Tol")
      assert(errS <= Tol,
        s"$dir flag=$flag supps: approx=$aSupps exact=$supps err=$errS > $Tol")
    }
  }

  test("HLL++ within 4*rsd of exact at sf0.001") { check(TestSpark.Sf0001) }
  test("HLL++ within 4*rsd of exact at sf0.01") { check(TestSpark.Sf001) }
}
