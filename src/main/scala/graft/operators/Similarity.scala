package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Similarity search over `embeddings.embedding: array<float>`.
  *
  * Cosine similarity is computed over integer-quantized components
  * (round(x·1000) as long): dot products and norms become exact integer
  * sums — order-independent and bit-identical between Spark and the
  * DuckDB oracle — with one final IEEE division+sqrt. Quantization error
  * (~1e-3) is irrelevant for ranking on this data and buys hash-exact
  * verifiability.
  *
  * Brute force is the correctness baseline (linear scan per query vector —
  * at 100 TB that's a broadcast of the query batch against a partitioned
  * scan, still shuffle-free). The LSH variant is the scale path: 16
  * random-hyperplane sign bits bucket the vectors, candidates come from a
  * bucket equi-join instead of a full scan.
  */
object Similarity {

  /** Integer-quantize a float-array column. */
  private def quant(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000).cast("long"))

  private def dotL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  private def normSqL(a: Column): Column =
    aggregate(a, lit(0L), (acc, x) => acc + x * x)

  /** Quantized cosine between two pre-quantized long-array columns. */
  private def cosine(qa: Column, qb: Column): Column =
    dotL(qa, qb).cast("double") / sqrt((normSqL(qa) * normSqL(qb)).cast("double"))

  // ---- brute-force top-k ---------------------------------------------------

  /** Top-10 nearest neighbours of vec_id=0 by quantized cosine;
    * TakeOrderedAndProject keeps the top-k without a global sort. */
  def annTopkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val qv = emb.filter(col("vec_id") === 0).select(quant(col("embedding")).as("qb"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), cosine(quant(col("embedding")), col("qb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
  }

  val annTopkBruteforceSql: String =
    """WITH q AS (
      |  SELECT list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qb
      |  FROM embeddings WHERE vec_id = 0),
      |v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qa
      |  FROM embeddings WHERE vec_id <> 0),
      |s AS (
      |  SELECT vec_id,
      |    CAST(CAST(list_sum(list_transform(list_zip(qa, qb), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
      |    / sqrt(CAST(CAST(list_sum(list_transform(qa, x -> x * x)) AS BIGINT)
      |                * CAST(list_sum(list_transform(qb, x -> x * x)) AS BIGINT) AS DOUBLE)) AS sim
      |  FROM v, q)
      |SELECT vec_id, sim FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin

  /** Embedding-cosine near-dup: all pairs above a similarity threshold.
    * Documented brute-force baseline (the LSH bucket join below is the
    * 100 TB path); threshold 0.35 sits inside a gap of this corpus's sim
    * distribution. */
  def annPairsBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(spark, dir).select(col("vec_id"), quant(col("embedding")).as("qe"))
    q.alias("a")
      .join(q.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.qe"), col("b.qe")).as("sim"))
      .filter(col("sim") >= 0.35)
  }

  val annPairsBruteforceSql: String =
    """WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qe
      |  FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  CAST(CAST(list_sum(list_transform(list_zip(a.qe, b.qe), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
      |  / sqrt(CAST(CAST(list_sum(list_transform(a.qe, x -> x * x)) AS BIGINT)
      |              * CAST(list_sum(list_transform(b.qe, x -> x * x)) AS BIGINT) AS DOUBLE)) AS sim
      |FROM v a JOIN v b ON a.vec_id < b.vec_id
      |WHERE CAST(CAST(list_sum(list_transform(list_zip(a.qe, b.qe), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
      |  / sqrt(CAST(CAST(list_sum(list_transform(a.qe, x -> x * x)) AS BIGINT)
      |              * CAST(list_sum(list_transform(b.qe, x -> x * x)) AS BIGINT) AS DOUBLE)) >= 0.35""".stripMargin

  // ---- LSH-bucketed ANN (scale path; hash-family-dependent → rows-only) ----

  val NumPlanes = 16

  /** Random-hyperplane signature: plane weights are deterministic ±1 from
    * xxhash64(plane, dim); the 16 sign bits form the bucket id. */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val planes = spark.range(NumPlanes).select(col("id").as("p"))
      .crossJoin(spark.range(64).select(col("id").as("d")))
      .select(col("p"), col("d"),
        when(pmod(xxhash64(col("p"), col("d")), lit(2L)) === 0L, lit(1.0))
          .otherwise(lit(-1.0)).as("w"))
    val dims = Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d").cast("long").as("d"), col("x").cast("double").as("x"))
    dims.join(broadcast(planes), "d")
      .groupBy("vec_id", "p")
      .agg(sum(col("w") * col("x")).as("proj"))
      .groupBy("vec_id")
      .agg(sum(when(col("proj") > 0,
        expr("shiftleft(1L, cast(p as int))"))
        .otherwise(lit(0L))).as("bucket"))
  }

  /** ANN via LSH buckets: candidates share a bucket; rank candidates by
    * quantized cosine, keep the top-1 neighbour per vector. Approximate
    * by construction (rows-only check — no SQL oracle for the hash
    * family), but the plan shape is the one that survives 100 TB:
    * bucket equi-join, no cross join. */
  def annLshTop1(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quant(col("embedding")).as("qe"))
    val b = lshBuckets(spark, dir)
    val withB = emb.join(b, "vec_id")
    val pairs = withB.alias("a")
      .join(withB.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn"),
        cosine(col("a.qe"), col("b.qe")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("nn"), col("sim"))
  }

  // ---- registry ------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_bruteforce" -> (annTopkBruteforce _),
    "ann_pairs_bruteforce" -> (annPairsBruteforce _),
    "ann_lsh_top1" -> (annLshTop1 _))

  val oracles: Map[String, String] = Map(
    "ann_topk_bruteforce" -> annTopkBruteforceSql,
    "ann_pairs_bruteforce" -> annPairsBruteforceSql)
}
