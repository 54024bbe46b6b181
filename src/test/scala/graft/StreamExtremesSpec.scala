package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingWindows

/** Pins the INITIAL-WATERMARK drop semantics of the watermarked
  * streaming paths on time-extreme events — the one boundary the
  * cross-engine edge probe cannot express in its batch oracles (a batch
  * SQL statement has no "batch 1 ran at watermark = epoch" notion), so
  * it is pinned engine-side here and the probe's planted fixture stays
  * strictly-post-epoch (tools/edge_oracle_probe.py,
  * STREAM_EXTREME_EVENT_ROWS).
  *
  * The semantics under test (measured r16 on Spark 4.1): batch 1 of an
  * AvailableNow run executes against the initial watermark, epoch 0.
  * The ROW-level late filters — dropDuplicatesWithinWatermark and the
  * stream-stream join's input filters — drop `ts <= watermark`, so a
  * pre-epoch row AND a row at exactly 1970-01-01T00:00:00.000 silently
  * vanish while one microsecond later survives. The windowed
  * AGGREGATION paths (tumbling and session) filter on WINDOW END
  * instead: the same ts = 0 row is kept because its window ends past
  * the watermark, and only windows/sessions ending at-or-before epoch
  * vanish. A production deployment ingesting corrupted (zeroed)
  * timestamps hits exactly this split — the dedup/join stages drop
  * those rows while the windowed aggs keep them; this spec is the
  * contract statement for that divergence class.
  */
class StreamExtremesSpec extends AnyFunSuite {

  private val Min = 60L * 1000000           // µs per minute
  private val Day = 24 * 60 * Min
  private val T2024 = 1704067200000000L     // 2024-01-01T00:00:00Z in µs

  /** events file: pre-epoch, window-ends-at-epoch, exact-epoch, and
    * just-post-epoch rows per event type, plus a far-away 2024 row that
    * drives the final watermark (so append emission covers everything
    * the late filter let through, except its own open tail). The ts
    * column is written as a real TIMESTAMP (not a raw int64): a
    * pre-epoch nanos long sits below the nanos/micros magnitude
    * frontier and correctly trips Tables.longTsEncoding's ambiguity
    * sentinel — raw-long encodings and time extremes are mutually
    * exclusive by design, so extreme fixtures use typed timestamps
    * (as the edge probe's do). */
  private def plantedDir(): String = {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    TestSpark.plantParquetFile(
      Seq(
        // user 1: pre-epoch (negative event time, window end < 0)
        (1L, -Day, 1L, "click", 1.0, "{}"),
        (2L, -Day + 10 * Min, 1L, "purchase", 1.0, "{}"),
        // user 4: pre-epoch row whose hour window AND session end at
        // exactly epoch 0 == the initial watermark
        (3L, -30 * Min, 4L, "click", 1.0, "{}"),
        // user 2: exactly the initial watermark (epoch 0)
        (4L, 0L, 2L, "click", 1.0, "{}"),
        (5L, 10 * Min, 2L, "purchase", 1.0, "{}"),
        // user 3: one microsecond past epoch
        (6L, 1L, 3L, "click", 1.0, "{}"),
        (7L, 1L + 10 * Min, 3L, "purchase", 1.0, "{}"),
        // watermark driver, far from every boundary above
        (8L, T2024, 9L, "click", 1.0, "{}"))
        .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props")),
      "events.parquet")
  }

  test("row-level late filters drop ts <= initial watermark (dedup + join)") {
    val spark = TestSpark.spark
    val dir = plantedDir()
    val dedup = StreamingWindows.queries("stream_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // the filter is per-ROW: every pre-epoch row (users 1, 4) and the
    // ts == watermark row (user 2's click at exactly epoch 0) vanish,
    // while user 2's post-epoch purchase survives alone and user 3
    // (epoch + 1µs) survives with both types
    assert(dedup === Set(
      (2L, "purchase"), (3L, "click"), (3L, "purchase"), (9L, "click")),
      s"dropDuplicatesWithinWatermark initial-watermark boundary drifted: $dedup")

    val joined = StreamingWindows.queries("stream_stream_join")(spark, dir)
      .collect().map(_.getAs[Long]("user_id")).toSet
    // a click->purchase pair joins only where BOTH rows cleared the late
    // filter: user 3 alone (user 2's pair is filtered at ts <= 0, user
    // 9 has no purchase)
    assert(joined === Set(3L),
      s"stream-stream join initial-watermark boundary drifted: $joined")
  }

  test("aggregation late filter works on window END: epoch rows kept, " +
      "epoch-ending windows dropped") {
    val spark = TestSpark.spark
    val dir = plantedDir()
    // hourly append: the ts = 0 and ts = 1µs rows share the window
    // [1970-01-01 00:00, 01:00) whose END is past the initial watermark
    // — KEPT (n = 2 per type), unlike the row-filtered dedup/join above.
    // Pre-epoch-ENDING windows (user 1; user 4's, ending exactly AT the
    // watermark) are late-dropped in batch 1 and never emitted. The 2024
    // driver's own window ends past the final watermark — held back.
    val hourly = StreamingWindows.queries("stream_hourly_append")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(hourly === Set(
      ("1970-01-01 00:00:00", "click", 2L),
      ("1970-01-01 00:00:00", "purchase", 2L)),
      s"append hourly epoch-boundary emission drifted: $hourly")

    // session append: same end-based contract — user 2's session
    // [0, 10 min] ends at 00:40 (last + gap) and is kept WITH its ts = 0
    // row; user 4's session ends at exactly epoch == the initial
    // watermark and vanishes; pre-epoch sessions vanish; the driver's
    // tail session is held back by the final watermark.
    val sessions = StreamingWindows.queries("stream_sessions_append")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(sessions === Set(
      (2L, "1970-01-01 00:00:00.000000", 2L, 600L),
      (3L, "1970-01-01 00:00:00.000001", 2L, 600L)),
      s"append session epoch-boundary emission drifted: $sessions")
  }
}
