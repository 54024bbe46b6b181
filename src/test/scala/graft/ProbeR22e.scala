package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** r22 A/B for events_resample (VERDICT r21 item 5, twice deferred):
  * the shipped two-scan partial-agg form vs the single-scan/one-exchange
  * form, 3 steady passes per arm interleaved in one JVM.
  *
  * Run: sbt "Test/runMain graft.ProbeR22e [dir]"
  */
object ProbeR22e {
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
    def timeOnce(name: String, pass: Int)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      println(f"[probe] $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "resample_two_scan" ->
        (() => graft.operators.Events.eventsResampleForm(spark, dir, oneExchange = false)),
      "resample_one_exchange" ->
        (() => graft.operators.Events.eventsResampleForm(spark, dir, oneExchange = true)))
    arms.foreach { case (n, mk) => timeOnce(s"${n}_warm", 0)(mk()) }
    (1 to 3).foreach { pass =>
      arms.foreach { case (n, mk) => timeOnce(n, pass)(mk()) }
    }
    spark.stop()
  }
}
