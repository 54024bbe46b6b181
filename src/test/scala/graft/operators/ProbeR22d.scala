package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band-key skew receipt for dedup_minhash_lsh / dedup_components_lsh
  * (VERDICT r21 item 3): bucket-size distribution of the banded LSH
  * join key (band, bkey) — the join's work is Σ C(bucket,2), so the
  * max/median bucket ratio is the skew gauge the guide's §2.5 rule
  * reads. Prints the top bucket sizes and the candidate-pair total.
  *
  * Run: sbt "Test/runMain graft.operators.ProbeR22d [dir]"
  */
object ProbeR22d {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.MinHash.register(spark)
    val bands = Dedup.shingleSets(spark, dir)
      .select(col("doc_id"), col("sz"),
        call_function("minhash_sigs", col("sh"), lit(Dedup.MinHashK)).as("mh"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(Dedup.MinHashK / Dedup.BandRows - 1)),
          b => when(col("sz") > 0,
            xxhash64(element_at(col("mh"), b * Dedup.BandRows + 1),
              element_at(col("mh"), b * Dedup.BandRows + 2))))).as(Seq("band", "bkey")))
      .filter(col("bkey").isNotNull)
    val buckets = bands.groupBy("band", "bkey").agg(count(lit(1)).as("n"))
    val stats = buckets.agg(
      count(lit(1)).as("n_buckets"),
      max(col("n")).as("max_bucket"),
      expr("percentile_approx(n, 0.5)").as("median_bucket"),
      sum(expr("n * (n - 1) / 2")).as("candidate_pairs")).first()
    println(s"[probe] buckets=${stats.getLong(0)} max=${stats.getLong(1)} " +
      s"median=${stats.getLong(2)} cand_pairs=${stats.getDouble(3)}")
    buckets.orderBy(col("n").desc).limit(10).collect()
      .foreach(r => println(s"[probe] top bucket band=${r.get(0)} n=${r.get(2)}"))
    spark.stop()
  }
}
