package graft

import java.nio.file.{Files, Paths}

/** [[PlanDumpR21]] for queries whose work happens in EAGER writes during
  * query construction (maint_* rewrites, ann_pairs, fmt_dynamic_overwrite):
  * registers a QueryExecutionListener and dumps the formatted plan of
  * EVERY execution the construction triggers, numbered in order, followed
  * by the returned frame's own plan — so the before/after evidence shows
  * the scatter/seed/backfill writes the bench actually times, not just
  * the final read-back.
  *
  *   sbt "runMain graft.PlanDumpEagerR21 <suffix> <name>[,<name>...] [sfDir]"
  */
object PlanDumpEagerR21 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpEagerR21 <suffix> <q1,q2,...> [sfDir]")
    val suffix = args(0)
    val names = args(1).split(',').toSeq
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r21"))
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          captured.add((funcName, qe.explainString(
            org.apache.spark.sql.execution.FormattedMode)))
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    names.foreach { name =>
      captured.clear()
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val frame = fn(spark, dir)
      val framePlan = frame.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Thread.sleep(3000) // listener bus is async — let it drain
      val sb = new StringBuilder
      var i = 0
      captured.forEach { entry =>
        i += 1
        sb.append(s"==== eager execution $i (${entry._1}) during $name construction ====\n")
        sb.append(entry._2).append("\n")
      }
      sb.append(s"==== returned frame plan ($name) ====\n").append(framePlan)
      val out = Paths.get(s"plans/r21/${name}_$suffix.txt")
      Files.writeString(out, sb.toString)
      println(s"[plandump-eager-r21] wrote $out (${sb.length} chars, $i eager executions)")
    }
    spark.stop()
  }
}
