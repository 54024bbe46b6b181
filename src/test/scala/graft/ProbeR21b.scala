package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway round-21 optimization probe (session 2): times candidate
  * variants side-by-side in ONE JVM through the noop sink, 3 passes each
  * (pass 1 carries per-plan codegen; later passes are steady-state).
  * Nothing here touches a declared query's scratch path: variants write
  * to their own `_probe`-suffixed dirs.
  */
object ProbeR21b {
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

    def time(name: String)(mk: => DataFrame): Unit = {
      (1 to 3).foreach { pass =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name pass$pass $s%.3f s")
      }
    }

    // ---- 1. maint_compact scatter: keyless repartition(64) (local sort,
    //         sortBeforeRepartition) vs deterministic hash key (no sort) ----
    def scatterTo(path: String)(df: DataFrame): DataFrame = {
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path).groupBy("l_returnflag").count()
    }
    time("scatter_keyless") {
      scatterTo(graft.sources.Formats.tmp("probe_scatter_a", dir))(
        Tables.lineitem(spark, dir).repartition(64))
    }
    time("scatter_hashkey") {
      scatterTo(graft.sources.Formats.tmp("probe_scatter_b", dir))(
        Tables.lineitem(spark, dir)
          .repartition(64, xxhash64(col("l_orderkey"), col("l_linenumber"))))
    }
    // file counts must both be 64 for the MaintenanceSpec pin to survive
    def files(p: String): Int = graft.operators.Maintenance.dataFiles(spark, p)
    println("[probe] scatter files keyless=" +
      files(graft.sources.Formats.tmp("probe_scatter_a", dir)) +
      " hashkey=" + files(graft.sources.Formats.tmp("probe_scatter_b", dir)))

    // ---- 2. maint_profile: shipped two-scan shape vs fused one-scan
    //         (the r11/r12-rejected form, re-tested under Spark 4.1) ----
    time("profile_twoscan") {
      graft.operators.Maintenance.maintProfile(spark, dir)
    }
    val profSpec: Seq[(String, Seq[(String, String)])] = Seq(
      "orders" -> Seq("o_orderkey" -> "num", "o_custkey" -> "num",
        "o_totalprice" -> "money", "o_orderstatus" -> "str"),
      "lineitem" -> Seq("l_orderkey" -> "num", "l_quantity" -> "num",
        "l_extendedprice" -> "money", "l_returnflag" -> "str"),
      "documents" -> Seq("doc_id" -> "num", "n_chars" -> "num",
        "lang" -> "str", "source" -> "str"),
      "events" -> Seq("event_id" -> "num", "ts" -> "ts",
        "user_id" -> "num", "event_type" -> "str"))
    time("profile_fused") {
      profSpec.map { case (tbl, cols) =>
        val df = Tables.byName(spark, dir, tbl)
        val aggs = cols.zipWithIndex.flatMap { case ((c, k), i) =>
          Seq(countDistinct(col(c)).as(s"nd_$i"),
            count(when(col(c).isNull, 1)).as(s"nn_$i")) ++ (k match {
            case "num" => Seq(min(col(c)).cast("double").as(s"mn_$i"),
              max(col(c)).cast("double").as(s"mx_$i"))
            case "money" => Seq(min(col(c).cast("decimal(18,2)")).cast("double").as(s"mn_$i"),
              max(col(c).cast("decimal(18,2)")).cast("double").as(s"mx_$i"))
            case _ => Seq(min(col(c).cast("string")).as(s"mns_$i"),
              max(col(c).cast("string")).as(s"mxs_$i"))
          })
        }
        df.agg(aggs.head, aggs.tail: _*).withColumn("tbl", lit(tbl))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
    }

    // ---- 3. fmt_dynamic_overwrite: current seed write vs
    //         repartition-by-day seed + ts-range-pushed backfill ----
    time("dynover_current") {
      graft.sources.Formats.fmtDynamicOverwrite(spark, dir)
    }
    time("dynover_reparted") {
      val path = graft.sources.Formats.tmp("events_dynpart_probe", dir)
      val ev = Tables.events(spark, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      ev.repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(path)
      val backfill = Tables.events(spark, dir)
        .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .withColumn("value", col("value") * 2.0)
        .select(ev.columns.map(col): _*)
      backfill.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day").parquet(path)
      spark.read.schema(ev.schema).parquet(path)
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("val_sum"))
    }

    // ---- 4. ann pairs: 1024-row blocks (2 blocks at sf0.1) vs 4096 (1) ----
    time("pairs_1024") {
      graft.operators.Similarity.annPairsBruteforceBlocks(spark, dir, 1024)
    }
    time("pairs_4096") {
      graft.operators.Similarity.annPairsBruteforceBlocks(spark, dir, 4096)
    }

    spark.stop()
  }
}
