package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DotProduct

/** Unit tests for the codegen'd dot_l expression: equivalence with the
  * HOF formulation, null/edge handling, and SQL registration.
  */
class DotProductSpec extends AnyFunSuite {

  import TestSpark.spark
  import spark.implicits._

  DotProduct.register(spark)

  test("dot_l equals the HOF dot product") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(-7L, 0L, 9L), Array(2L, 100L, -3L)),
      (Array.empty[Long], Array.empty[Long])
    ).toDF("a", "b")
    val got = df.select(
      expr("dot_l(a, b)").as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(got(0).getLong(0) === 32L)
    assert(got(2).getLong(0) === 0L)
  }

  test("property: dot_l matches a BigInt reference for in-spec magnitudes") {
    // quantized embeddings are bounded by ~|1000| per component, 64 dims;
    // generate well beyond that (±10^6, 128 dims) and check against
    // overflow-free BigInt arithmetic
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(30) {
      val n = 1 + rnd.nextInt(128)
      (Array.fill(n)(rnd.nextLong() % 1000000L),
        Array.fill(n)(rnd.nextLong() % 1000000L))
    }
    val got = cases.toDF("a", "b").select(expr("dot_l(a, b)")).collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((a, b), d) =>
      val ref = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      assert(BigInt(d) === ref, s"n=${a.length}")
    }
  }

  test("dot_l is null-safe and usable from spark.sql") {
    val df = Seq((Some(Array(1L, 2L)), None: Option[Array[Long]])).toDF("a", "b")
    df.createOrReplaceTempView("dot_null_probe")
    val r = spark.sql("SELECT dot_l(a, b) AS d FROM dot_null_probe").collect()
    assert(r.head.isNullAt(0))
  }

  test("dot_l rejects wrong input types at analysis") {
    val df = Seq((1, "x")).toDF("a", "b")
    df.createOrReplaceTempView("dot_bad_probe")
    val e = intercept[Exception] {
      spark.sql("SELECT dot_l(a, b) FROM dot_bad_probe").collect()
    }
    assert(e.getMessage.toLowerCase.contains("dot_l") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
