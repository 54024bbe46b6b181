package graft

/** Throwaway r21 probe: run one query through the noop sink and dump the
  * FINAL adaptive plan of the executed write (QueryExecutionListener —
  * the bare DataFrame's queryExecution is never executed by a write, so
  * reading it shows the initial plan only). */
object FinalPlanR21 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_minhash_lsh")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var captured: String = ""
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          captured = qe.executedPlan.toString
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.mode("overwrite").format("noop").save()
    // listener fires asynchronously on the listener bus — poll briefly
    var waited = 0
    while (captured.isEmpty && waited < 100) { Thread.sleep(100); waited += 1 }
    val s = captured
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"target/final_plan_$name.txt"), s)
    println("[finalplan] ReusedExchange: " + "ReusedExchange".r.findAllIn(s).size)
    println("[finalplan] Exchange: " + "Exchange hashpartitioning".r.findAllIn(s).size)
    println("[finalplan] Scan parquet: " + "Scan parquet".r.findAllIn(s).size)
    println("[finalplan] written target/final_plan_" + name + ".txt")
    spark.stop()
  }
}
