package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale receipt for the r21 batch-2 PairBlockRows change: the tiled
  * pair scan at sf1 (10× the bench corpus) under the old 1024-row and
  * new 4096-row block sizes — the block count is 20 vs 5 there, so the
  * per-block fixed cost (job + full corpus pass + scratch commit) the
  * change removes should grow with scale. */
object ProbeR21f {
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
    println("[probe] embeddings rows: " +
      graft.engine.Tables.embeddings(spark, dir).count())
    time("sf1_pairs_1024") {
      graft.operators.Similarity.annPairsBruteforceBlocks(spark, dir, 1024)
    }
    time("sf1_pairs_4096") {
      graft.operators.Similarity.annPairsBruteforceBlocks(spark, dir, 4096)
    }
    spark.stop()
  }
}
