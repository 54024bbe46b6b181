package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Final decomposition for fmt_jdbc_roundtrip: park-without-drop vs
  * local-collect+drop (the candidate shape) vs candidate+batch10k. */
object ProbeR21e {
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
    import graft.engine.Tables

    def time(name: String, passes: Int = 4)(mk: => DataFrame): Unit = {
      (1 to passes).foreach { pass =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name pass$pass $s%.3f s")
      }
    }

    def agg(url: String, props: java.util.Properties): DataFrame = {
      val src = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val maxKey = src.agg(max(col("c_custkey"))).collect()(0).getLong(0)
      src.write.mode("overwrite").jdbc(url, "customer_jdbc", props)
      spark.read
        .option("partitionColumn", "c_custkey")
        .option("lowerBound", "0")
        .option("upperBound", (maxKey + 1).toString)
        .option("numPartitions", "4")
        .jdbc(url, "customer_jdbc", props)
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("bal"))
    }
    def drop(db: String): Unit =
      try {
        java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true"); ()
      } catch { case e: java.sql.SQLException if e.getSQLState == "08006" => () }

    time("park_nodrop") {
      val db = "grafte_a"
      val a = agg(s"jdbc:derby:memory:$db;create=true", new java.util.Properties())
      val out = graft.sources.Formats.tmp("probe_jdbc_e", dir)
      a.write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }
    time("local_drop") {
      val db = "grafte_b"
      val a = agg(s"jdbc:derby:memory:$db;create=true", new java.util.Properties())
      val rows = a.collectAsList()
      drop(db)
      spark.createDataFrame(rows, a.schema)
    }
    time("local_drop_batch10k") {
      val db = "grafte_c"
      val props = new java.util.Properties()
      props.setProperty("batchsize", "10000")
      val a = agg(s"jdbc:derby:memory:$db;create=true", props)
      val rows = a.collectAsList()
      drop(db)
      spark.createDataFrame(rows, a.schema)
    }
    spark.stop()
  }
}
