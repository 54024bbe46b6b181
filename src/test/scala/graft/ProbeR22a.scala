package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** r22 A/B probes for the VERDICT r21 "Next round" items — each arm runs
  * 3 passes through the noop sink, arms interleaved per round so a host
  * phase cannot masquerade as a form difference:
  *
  *   fuzzy     — dedup_fuzzy_names distinct placement (whole-output vs
  *               insertion-arm-scoped) at sf1: reconciles the r21 silent
  *               revert with a measured winner (VERDICT item 1).
  *   tfidf     — text_tfidf df derivation (df-from-tf vs the old
  *               countDistinct-over-tokens second corpus pass) at sf0.1
  *               and sf1: the receipt-or-revert item (VERDICT item 2).
  *
  * Run: sbt "Test/runMain graft.ProbeR22a <fuzzy|tfidf> <dir>"
  */
object ProbeR22a {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("fuzzy")
    val dir = if (args.length > 1) args(1) else "target/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeOnce(name: String, pass: Int)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      println(f"[probe] $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val arms: Seq[(String, () => DataFrame)] = which match {
      case "fuzzy" => Seq(
        "fuzzy_whole_output" ->
          (() => graft.operators.Dedup.dedupFuzzyNamesForm(spark, dir, scopedDistinct = false)),
        "fuzzy_scoped" ->
          (() => graft.operators.Dedup.dedupFuzzyNamesForm(spark, dir, scopedDistinct = true)))
      case "tfidf" => Seq(
        "tfidf_df_from_tf" ->
          (() => graft.operators.TextAnalysis.textTfidfForm(spark, dir, dfFromTf = true)),
        "tfidf_countdistinct" ->
          (() => graft.operators.TextAnalysis.textTfidfForm(spark, dir, dfFromTf = false)))
      case other => sys.error(s"unknown probe arm set '$other'")
    }
    // warm codegen once per arm (pass 0, not printed as a steady pass)
    arms.foreach { case (n, mk) => timeOnce(s"${n}_warm", 0)(mk()) }
    (1 to 3).foreach { pass =>
      arms.foreach { case (n, mk) => timeOnce(n, pass)(mk()) }
    }
    spark.stop()
  }
}
