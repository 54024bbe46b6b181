package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sub-plan decomposition of the dedup_minhash_lsh pair source (feeds
  * dedup_components_lsh, the battery's slowest query): times each stage
  * of the pipeline through the noop sink so the r22 round knows which
  * stage owns the steady-state seconds.
  *
  * Run: sbt "Test/runMain graft.operators.ProbeR22c [dir]"
  */
object ProbeR22c {
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
    def time(name: String)(mk: => DataFrame): Unit =
      (1 to 3).foreach { pass =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        println(f"[probe] $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    // stage 1: the canonical shingle exchange alone
    time("shingle_sets")(Dedup.shingleSets(spark, dir))
    // stage 2: + capped inverted index (hot-shingle agg + anti-join)
    time("capped_index")(Dedup.cappedShingleIndex(spark, dir))
    // stage 3: band rows alone (minhash signatures + posexplode)
    graft.functions.MinHash.register(spark)
    def bands = Dedup.shingleSets(spark, dir)
      .select(col("doc_id"), col("sz"),
        call_function("minhash_sigs", col("sh"), lit(Dedup.MinHashK)).as("mh"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(Dedup.MinHashK / Dedup.BandRows - 1)),
          b => when(col("sz") > 0,
            xxhash64(element_at(col("mh"), b * Dedup.BandRows + 1),
              element_at(col("mh"), b * Dedup.BandRows + 2))))).as(Seq("band", "bkey")))
    time("band_rows")(bands)
    // stage 4: + candidate self-join + distinct
    time("candidates") {
      bands.alias("x")
        .join(bands.alias("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
    }
    // stage 5: the full pair source (candidates + capped-Jaccard verify)
    time("pairs_full")(Dedup.dedupMinhashLsh(spark, dir))
    spark.stop()
  }
}
