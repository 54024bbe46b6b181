package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}

import graft.engine.Tables

/** Structured Streaming capability demo with an oracle-checkable result:
  * the events table re-read as a FILE STREAM (`readStream.parquet`) →
  * watermark → tumbling-window aggregation → memory sink, run to
  * completion with Trigger.AvailableNow. The returned DataFrame is the
  * final in-memory table, so graft.Verify checks it like any batch query
  * against the same SQL oracle as the batch twin (Events.eventsHourly).
  *
  * The watermark is far larger than the data's time span, so no rows are
  * ever late-dropped and streaming output == batch output exactly. In a
  * live deployment the watermark would be minutes and state eviction is
  * what makes 100 TB/day of events tractable: state per (window ×
  * event_type) only, evicted once the watermark passes window end.
  */
object StreamingWindows {

  /** Run a streaming DataFrame to completion into a memory sink and
    * return the final table (shared by every streaming query here). */
  private def runToMemory(spark: SparkSession, df: DataFrame,
      mode: String, prefix: String): DataFrame = {
    val tableName = s"${prefix}_${System.nanoTime()}"
    val q = df.writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(tableName)
  }

  /** Streaming twin of Events.eventsHourly; oracle = the same SQL. */
  def streamHourly(spark: SparkSession, dir: String): DataFrame = {
    // Schema must be supplied for file streams; reuse the batch reader's
    // (ts arrives as raw nanos long — see Tables.events — and is
    // converted after read).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema

    // File streams want a directory; the testdata dir holds one parquet
    // FILE per table, so stream the directory with a glob for this one.
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "365 days")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("val_sum"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"), col("val_sum"))

    runToMemory(spark, stream, "complete", "stream_hourly")
  }

  /** Per-user lifetime totals via arbitrary stateful processing
    * (`mapGroupsWithState`) — the custom-state API a streaming pipeline
    * uses where windowed aggregation can't express the logic. State here
    * is (event count, value cents); cents keep the accumulation exact
    * integer math so the final state hash-matches the batch oracle.
    *
    * The sink runs in Update mode; with one input file AvailableNow
    * processes a single micro-batch, so each key is emitted exactly once
    * and the memory table IS the final state. At real scale the state
    * store is RocksDB and keys stream out incrementally — the plumbing
    * (groupByKey, typed state, timeout handling slot) is identical.
    */
  def streamUserTotals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema

    val typed = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .selectExpr("user_id", "CAST(round(value * 100) AS LONG) AS cents")
      .as[(Long, Long)]

    val totals = typed
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          var (n, cents) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { r => n += 1; cents += r._2 }
          state.update((n, cents))
          (uid, n, cents.toDouble / 100.0)
      }
      .toDF("user_id", "n_events", "val_sum")

    runToMemory(spark, totals, "update", "stream_user_totals")
  }

  val streamUserTotalsSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS val_sum
      |FROM events GROUP BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_hourly" -> (streamHourly _),
    "stream_user_totals" -> (streamUserTotals _))

  val oracles: Map[String, String] = Map(
    "stream_hourly" -> graft.operators.Events.eventsHourlySql,
    "stream_user_totals" -> streamUserTotalsSql)
}
