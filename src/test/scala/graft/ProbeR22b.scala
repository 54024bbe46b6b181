package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Phase decomposition of dedup_components_lsh (the battery's slowest
  * query, VERDICT r21 item 3): times the banded-LSH pair source alone
  * (the fixpoint's input), then the full label query, at sf0.1 — the
  * difference is the edge-write + fixpoint + label-write residual the
  * round can try to shrink. Also prints the round count.
  *
  * Run: sbt "Test/runMain graft.ProbeR22b [dir]"
  */
object ProbeR22b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, passes: Int = 3)(mk: => DataFrame): Unit =
      (1 to passes).foreach { pass =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        println(f"[probe] $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    time("lsh_pairs_only") {
      graft.operators.Dedup.dedupMinhashLsh(spark, dir)
    }
    time("components_lsh_full") {
      val df = graft.operators.Dedup.dedupComponentsLsh(spark, dir)
      println(s"[probe] fixpoint rounds: ${graft.operators.Dedup.lastComponentsLshRounds}")
      df
    }
    spark.stop()
  }
}
