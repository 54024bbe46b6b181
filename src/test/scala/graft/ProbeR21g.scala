package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale receipt for the r21 batch-2 dedup_fuzzy_names distinct scoping:
  * time the declared query at sf1 (150k names, ~10× the output). Run
  * once on the shipped code and once with the one-line whole-output
  * distinct restored, to size the removed output-bulk exchange where it
  * matters. */
object ProbeR21g {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val tag = if (args.length > 1) args(1) else "current"
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
    time(s"sf1_fuzzy_$tag") {
      SparkEntry.queries("dedup_fuzzy_names")(spark, dir)
    }
    spark.stop()
  }
}
