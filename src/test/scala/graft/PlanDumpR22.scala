package graft

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for a named list of queries into
  * plans/r22/<query>_<suffix>.txt — the optimization round's
  * before/after plan evidence (round-22 deliverable).
  *
  *   sbt "Test/runMain graft.PlanDumpR22 <suffix> <name>[,<name>...] [sfDir]"
  *
  * Same session shape as Bench (extensions, UTC, nanosAsLong, shuffle
  * partitions from SPARK_GRAFT_CPUS) so the dumped plans are the plans
  * the bench times. Besides every SparkEntry name, the A/B form variants
  * probed this round are addressable directly:
  *   text_tfidf@df_from_tf / text_tfidf@countdistinct
  *   dedup_fuzzy_names@whole_output / dedup_fuzzy_names@scoped
  */
object PlanDumpR22 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpR22 <suffix> <q1,q2,...> [sfDir]")
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
    Files.createDirectories(Paths.get("plans/r22"))
    names.foreach { name =>
      val df = name match {
        case "text_tfidf@df_from_tf" =>
          graft.operators.TextAnalysis.textTfidfForm(spark, dir, dfFromTf = true)
        case "text_tfidf@countdistinct" =>
          graft.operators.TextAnalysis.textTfidfForm(spark, dir, dfFromTf = false)
        case "dedup_fuzzy_names@whole_output" =>
          graft.operators.Dedup.dedupFuzzyNamesForm(spark, dir, scopedDistinct = false)
        case "dedup_fuzzy_names@scoped" =>
          graft.operators.Dedup.dedupFuzzyNamesForm(spark, dir, scopedDistinct = true)
        case "events_resample@one_exchange" =>
          graft.operators.Events.eventsResampleForm(spark, dir, oneExchange = true)
        case n =>
          SparkEntry.queries.getOrElse(n, sys.error(s"unknown query: $n"))(spark, dir)
      }
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val out = Paths.get(s"plans/r22/${name.replace('@', '_')}_$suffix.txt")
      Files.writeString(out, plan)
      println(s"[plandump-r22] wrote $out (${plan.length} chars)")
    }
    spark.stop()
  }
}
