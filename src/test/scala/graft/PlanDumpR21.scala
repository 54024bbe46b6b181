package graft

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for a named list of queries into
  * plans/r21/<query>_<suffix>.txt — the optimization round's
  * before/after plan evidence (round-21 deliverable).
  *
  *   sbt "runMain graft.PlanDumpR21 <suffix> <name>[,<name>...] [sfDir]"
  *
  * Uses the SAME session shape as Bench (extensions, UTC, nanosAsLong,
  * shuffle partitions from SPARK_GRAFT_CPUS) so the dumped plans are the
  * plans the bench times. Queries whose entry point materializes scratch
  * eagerly (maint_* rewrites, ann_pairs) pay that write once here — the
  * dumped plan is the gated read-back, same as PlanDump's contract.
  */
object PlanDumpR21 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpR21 <suffix> <q1,q2,...> [sfDir]")
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
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val plan = fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val out = Paths.get(s"plans/r21/${name}_$suffix.txt")
      Files.writeString(out, plan)
      println(s"[plandump-r21] wrote $out (${plan.length} chars)")
    }
    spark.stop()
  }
}
