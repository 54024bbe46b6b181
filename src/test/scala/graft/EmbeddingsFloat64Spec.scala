package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, transform => atransform}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Refresh-proofing pin for the ONE drift family the r9 verdict left
  * open (SURVEY.md §2 residual risk): a data refresh that ships
  * `embeddings.embedding` as `array<double>` instead of
  * `array<float>`. The r7 refresh proved the generator drifts
  * encodings; this spec proves the embedding family would survive the
  * float64 variant.
  *
  * Contract under test, both halves:
  *  - engine side: `Tables.conform` casts the column back to the
  *    canonical `array<float>`, so every ANN/cosine query computes over
  *    the float32-rounded values — including when the float64 file
  *    carries MORE precision than float32 (sub-ulp perturbations are
  *    planted below to force that case);
  *  - oracle side: the quantization SQL pins `CAST(x AS REAL)` before
  *    the ×1000 round (`Similarity.QuantSql`), the same
  *    float64→float32→float64 path — verified engine-side here by
  *    quantizing through that exact cast chain; the DuckDB half rides
  *    IEEE-754 round-to-nearest being engine-independent.
  *
  * Queries exercised end-to-end are the exact-oracle rows the verdict
  * named at risk: `dedup_embedding_cosine` (= ann_pairs_bruteforce),
  * `ann_topk_bruteforce`, `ann_topk_batch`.
  *
  * The half this JVM-only spec cannot cover — the actual DuckDB engine
  * evaluating the actual oracle SQL over a genuinely-float64 file — is
  * probed by `tools/float64_refresh_probe.py` (fixture builder) + the
  * real Verify/oracle_check gate; recorded PASS ×3 in SURVEY.md §2c
  * (r12).
  */
class EmbeddingsFloat64Spec extends AnyFunSuite {

  private val spark = TestSpark.spark

  /** The sf0.001 embeddings re-planted verbatim (float32 control). */
  private lazy val f32Dir: String = TestSpark.plantParquetFile(
    Tables.embeddings(spark, TestSpark.Sf0001), "embeddings.parquet")

  /** The same rows written as array<double>, each component perturbed
    * by a sub-float32-ulp amount (x → x·(1+2⁻³⁰) via double math):
    * representable in float64, rounds back to the ORIGINAL float32 —
    * exactly the "refresh carries more precision" case. A plain
    * float→double cast would leave quantization trivially unchanged
    * and test nothing. */
  private lazy val f64Dir: String = {
    val perturbed = Tables.embeddings(spark, TestSpark.Sf0001)
      .withColumn("embedding",
        atransform(col("embedding"),
          x => x.cast("double") * (1.0 + math.pow(2.0, -30))))
    TestSpark.plantParquetFile(perturbed, "embeddings.parquet")
  }

  test("conform restores canonical array<float> from a float64 file") {
    val df = Tables.embeddings(spark, f64Dir)
    assert(df.schema("embedding").dataType === ArrayType(FloatType))
    // the perturbation is sub-ulp: the float32 values round back exactly
    val a = Tables.embeddings(spark, f32Dir)
      .selectExpr("vec_id", "embedding").orderBy("vec_id").collect()
    val b = df.selectExpr("vec_id", "embedding").orderBy("vec_id").collect()
    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra.getSeq[Float](1) === rb.getSeq[Float](1),
        s"vec_id ${ra.getLong(0)}: float64 refresh did not round back to float32")
    }
  }

  /** Collect a query's full result deterministically sorted. */
  private def rows(name: String, dir: String): Seq[Seq[Any]] = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.orderBy(df.columns.map(col): _*).collect().toSeq.map(_.toSeq)
  }

  for (q <- Seq("dedup_embedding_cosine", "ann_topk_bruteforce", "ann_topk_batch"))
    test(s"$q is bit-identical between float32 and perturbed-float64 data") {
      assert(rows(q, f32Dir) === rows(q, f64Dir))
    }

  test("oracle-side REAL-cast chain quantizes like the engine on float64 data") {
    // the engine's quant path on the conformed (float32) column vs the
    // oracle's pinned float64→REAL→DOUBLE chain applied to the RAW
    // float64 column — per-component equality over every planted vector
    val engine = Tables.embeddings(spark, f64Dir)
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint)) as q")
    val oracleChain = spark.read.parquet(s"$f64Dir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(round(cast(cast(x as float) as double) * 1000) as bigint)) as q")
    val joined = engine.as("e").join(oracleChain.as("o"), "vec_id")
      .selectExpr("vec_id", "e.q as eq", "o.q as oq").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"vec_id ${r.getLong(0)}: engine and oracle quantization diverge")
    }
  }
}
