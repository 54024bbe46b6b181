package graft

import org.apache.spark.sql.SparkSession

/** Generic scale-receipt probe: times named SparkEntry queries through
  * the noop sink, 3 passes each in one JVM (pass 1 carries per-plan
  * codegen; later passes are steady state). The r22 deliverable uses it
  * for the r21 headliners' sf1 growth numbers (VERDICT r21 item 6).
  *
  * Run: sbt "Test/runMain graft.ProbeR22f <dir> <q1,q2,...>"
  */
object ProbeR22f {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeR22f <dir> <q1,q2,...>")
    val dir = args(0)
    val names = args(1).split(',').toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      (1 to 3).foreach { pass =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        println(f"[probe] $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
