package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decompose the fmt_jdbc_roundtrip probe-c finding: batchsize vs
  * park-to-parquet vs per-pass Derby table overwrite. Each variant is an
  * exact clone of fmtJdbcRoundtrip with ONE factor changed. */
object ProbeR21d {
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

    def roundtrip(tag: String, batch: Option[String], park: Boolean,
        freshDb: Boolean): DataFrame = {
      val dbName = if (freshDb) s"graftd_${System.nanoTime()}"
        else s"graftd_fixed_$tag"
      val url = s"jdbc:derby:memory:$dbName;create=true"
      val props = new java.util.Properties()
      batch.foreach(b => props.setProperty("batchsize", b))
      val src = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val maxKey = src.agg(max(col("c_custkey"))).collect()(0).getLong(0)
      src.write.mode("overwrite").jdbc(url, "customer_jdbc", props)
      val agg = spark.read
        .option("partitionColumn", "c_custkey")
        .option("lowerBound", "0")
        .option("upperBound", (maxKey + 1).toString)
        .option("numPartitions", "4")
        .jdbc(url, "customer_jdbc", props)
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("bal"))
      if (!park) agg
      else {
        val out = graft.sources.Formats.tmp(s"probe_jdbc_$tag", dir)
        agg.write.mode("overwrite").parquet(out)
        try {
          java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$dbName;drop=true")
          ()
        } catch {
          case e: java.sql.SQLException if e.getSQLState == "08006" => ()
        }
        spark.read.parquet(out)
      }
    }

    time("base_clone")   { roundtrip("a", None, park = true, freshDb = false) }
    time("batch10k")     { roundtrip("b", Some("10000"), park = true, freshDb = false) }
    time("nopark")       { roundtrip("c", None, park = false, freshDb = false) }
    time("freshdb")      { roundtrip("d", None, park = true, freshDb = true) }
    spark.stop()
  }
}
