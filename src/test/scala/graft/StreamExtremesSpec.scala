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
  * timestamps hits exactly this split.
  *
  * As of r17 (VERDICT r16 ask 4) the silent drop is PROMOTED TO A
  * CONTRACT on the row-filter paths: an `observe` guard counts
  * at-or-pre-epoch input rows with no extra scan and the run FAILS
  * LOUD when any exist — so this spec pins (a) the loud failure on a
  * fixture carrying them, (b) unchanged results and the exact epoch
  * boundary on a scrubbed fixture, and (c) the windowed-agg paths'
  * window-END semantics, which keep epoch-exact rows and therefore
  * stay unguarded.
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
  /** `withAtOrPreEpoch = false` scrubs exactly the rows the ingest
    * guard exists to flag (ts <= epoch 0), leaving the 1 µs boundary
    * row in place — the shape of the fixture AFTER the repair the
    * guard's message demands. */
  private def plantedDir(withAtOrPreEpoch: Boolean = true): String = {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val atOrPre = Seq(
      // user 1: pre-epoch (negative event time, window end < 0)
      (1L, -Day, 1L, "click", 1.0, "{}"),
      (2L, -Day + 10 * Min, 1L, "purchase", 1.0, "{}"),
      // user 4: pre-epoch row whose hour window AND session end at
      // exactly epoch 0 == the initial watermark
      (3L, -30 * Min, 4L, "click", 1.0, "{}"),
      // user 2: exactly the initial watermark (epoch 0)
      (4L, 0L, 2L, "click", 1.0, "{}"))
    val postEpoch = Seq(
      (5L, 10 * Min, 2L, "purchase", 1.0, "{}"),
      // user 3: one microsecond past epoch
      (6L, 1L, 3L, "click", 1.0, "{}"),
      (7L, 1L + 10 * Min, 3L, "purchase", 1.0, "{}"),
      // watermark driver, far from every boundary above
      (8L, T2024, 9L, "click", 1.0, "{}"))
    TestSpark.plantParquetFile(
      ((if (withAtOrPreEpoch) atOrPre else Seq.empty) ++ postEpoch)
        .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props")),
      "events.parquet")
  }

  test("ingest guard fails loud on ts <= epoch at the row-filter paths") {
    val spark = TestSpark.spark
    val dir = plantedDir()
    // stream_dedup sees all 4 at-or-pre-epoch rows; the guard must name
    // the query, the count, and the class instead of returning a
    // silently-short result (the pre-r17 behavior)
    val exDedup = intercept[IllegalStateException](
      StreamingWindows.queries("stream_dedup")(spark, dir))
    assert(exDedup.getMessage.contains("stream_dedup") &&
      exDedup.getMessage.contains("4 event(s)") &&
      exDedup.getMessage.contains("1970-01-01T00:00:00Z"),
      s"guard message drifted: ${exDedup.getMessage}")
    // the join guards each side AFTER its event_type filter: 3 clicks +
    // 1 purchase at-or-pre-epoch
    val exJoin = intercept[IllegalStateException](
      StreamingWindows.queries("stream_stream_join")(spark, dir))
    assert(exJoin.getMessage.contains("stream_stream_join") &&
      exJoin.getMessage.contains("4 event(s)"),
      s"guard message drifted: ${exJoin.getMessage}")
  }

  test("a NULL event time trips the guard too") {
    // NULL ts is the other corruption shape the late filters swallow
    // silently (a NULL can never satisfy ts > watermark) — the guard's
    // IS NULL arm counts it (review r17)
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val dir = TestSpark.plantParquetFile(
      Seq((1L, Some(10 * Min), 2L, "click", 1.0, "{}"),
        (2L, None, 3L, "click", 1.0, "{}"),
        (3L, Some(T2024), 9L, "click", 1.0, "{}"))
        .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props")),
      "events.parquet")
    val ex = intercept[IllegalStateException](
      StreamingWindows.queries("stream_dedup")(spark, dir))
    assert(ex.getMessage.contains("1 event(s)") &&
      ex.getMessage.contains("NULL event time"),
      s"NULL-ts guard arm drifted: ${ex.getMessage}")
  }

  test("scrubbed input passes the guard; the epoch boundary is exact") {
    val spark = TestSpark.spark
    val dir = plantedDir(withAtOrPreEpoch = false)
    // same expected sets the pre-guard spec pinned on the FULL fixture
    // (those rows were silently dropped then) — so the guard changed
    // failure loudness, never the semantics of clean data; user 3 at
    // epoch + 1µs passing pins that the guard boundary is ts <= 0
    // exactly, not a fuzzy "near epoch"
    val dedup = StreamingWindows.queries("stream_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(dedup === Set(
      (2L, "purchase"), (3L, "click"), (3L, "purchase"), (9L, "click")),
      s"dedup on scrubbed input drifted: $dedup")
    val joined = StreamingWindows.queries("stream_stream_join")(spark, dir)
      .collect().map(_.getAs[Long]("user_id")).toSet
    assert(joined === Set(3L),
      s"stream-stream join on scrubbed input drifted: $joined")
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
