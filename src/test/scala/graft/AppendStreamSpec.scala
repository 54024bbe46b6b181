package graft



import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingWindows

/** Planted-data pins for the append-mode streaming semantics — the two
  * operators whose OUTPUT depends on the watermark, where the corpus
  * oracle checks the boundary only incidentally. Events are constructed
  * so session/watermark relationships are unambiguous (days apart, no
  * boundary coincidences):
  *
  *   user 1: t0, t0+10min        → closed session (2 events)
  *   user 2: t0+5min             → closed session (1 event)
  *   user 1: t0+20d              → open tail; also drives the watermark
  *
  * Final watermark = max(ts) − 3d = t0+17d: both early sessions ended
  * (last event + 30 min gap) far before it → MUST be emitted; the tail
  * session is open at the watermark → MUST NOT be. The same planted file
  * pins stream_dedup: all events share event_type, so the surviving key
  * set is the three distinct (user, type, day) tuples.
  */
class AppendStreamSpec extends AnyFunSuite {

  private val T0 = 1704067200000000000L // 2024-01-01T00:00:00Z in nanos
  private val Min = 60L * 1000 * 1000 * 1000
  private val Day = 24 * 60 * Min

  private def plantedDir(): String = {
    val spark = TestSpark.spark
    import spark.implicits._
    TestSpark.plantParquetFile(
      Seq(
        (1L, T0, 1L, "click", 1.0, """{"k": 1}"""),
        (2L, T0 + 10 * Min, 1L, "click", 1.0, """{"k": 2}"""),
        (3L, T0 + 5 * Min, 2L, "click", 1.0, """{"k": 3}"""),
        (4L, T0 + 20 * Day, 1L, "click", 1.0, """{"k": 4}"""))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events.parquet")
  }

  test("append sessions: watermark-closed sessions emitted, open tail held back") {
    val dir = plantedDir()
    val out = StreamingWindows.queries("stream_sessions_append")(TestSpark.spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = Set(
      (1L, "2024-01-01 00:00:00.000000", 2L, 600L), // 2-event session, 10 min
      (2L, "2024-01-01 00:05:00.000000", 1L, 0L))   // singleton session
    assert(out === want,
      s"append emission wrong: got $out — the t0+20d open session must be absent")
  }

  test("append sessions: emission boundary is floor_ms(max ts) - delay, inclusive") {
    val spark = TestSpark.spark
    import spark.implicits._
    // max ts carries a sub-millisecond component so the ms-floored and
    // raw watermarks differ; single-event sessions end (last + 30 min) at:
    //   u1: floored watermark - 1ms  → emitted
    //   u2: exactly the floored watermark → emitted (inclusive)
    //   u3: floored + 500µs (below the RAW max-3d) → held back (ms floor)
    //   u4: exactly the raw max-3d → held back
    val maxTs = T0 + 20 * Day + 123456789L
    val wmRaw = maxTs - 3 * Day
    val wmFloor = (maxTs / 1000000L) * 1000000L - 3 * Day
    val gap = 30 * Min
    def evt(id: Long, uid: Long, endNs: Long) =
      (id, endNs - gap, uid, "click", 1.0, "{}")
    val dir = TestSpark.plantParquetFile(
      Seq(
        evt(1, 1, wmFloor - 1000000L),
        evt(2, 2, wmFloor),
        evt(3, 3, wmFloor + 500000L),
        evt(4, 4, wmRaw),
        (5L, maxTs, 9L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events.parquet")
    val emitted = StreamingWindows.queries("stream_sessions_append")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // user 9 (the watermark driver) sessions past the watermark and must
    // be HELD BACK — subtracting it before comparing would mask an
    // eviction regression that emits still-open sessions
    assert(emitted === Set(1L, 2L),
      s"emission boundary drifted: $emitted — oracle SQL must be updated in lockstep")
  }

  test("append hourly: tumbling windows share the inclusive ms-floored boundary") {
    val spark = TestSpark.spark
    import spark.implicits._
    // H is an hour boundary; max ts = H + 3d + 500µs makes the final
    // watermark exactly H (ms floor eats the 500µs). Windows ending H-1h
    // and H (== watermark, inclusive) must be emitted; the window ending
    // H+1h must be held in state.
    val H = T0 + 100 * 60 * Min
    val Hr = 60 * Min
    val dir = TestSpark.plantParquetFile(
      Seq(
        (1L, H - Hr - Hr / 2, 1L, "c", 1.0, "{}"), // window ends H-1h
        (2L, H - Hr / 2, 2L, "c", 1.0, "{}"),      // window ends H == wm
        (3L, H + Hr / 2, 3L, "c", 1.0, "{}"),      // window ends H+1h
        (4L, H + 3 * Day + 500000L, 9L, "c", 1.0, "{}")) // wm driver
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events.parquet")
    val emittedStarts = StreamingWindows.queries("stream_hourly_append")(spark, dir)
      .collect().map(_.getString(0)).toSet
    def hhmm(ns: Long): String =
      java.time.Instant.ofEpochSecond(0, ns)
        .atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))
    assert(emittedStarts === Set(hhmm(H - 2 * Hr), hhmm(H - Hr)),
      s"tumbling emission boundary drifted: $emittedStarts — " +
        "streamHourlyAppendSql must change in lockstep")
  }

  test("stream dedup: surviving key set is the distinct (user, type, day) tuples") {
    val dir = plantedDir()
    val out = StreamingWindows.queries("stream_dedup")(TestSpark.spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    val want = Set(
      (1L, "click", "2024-01-01"),
      (2L, "click", "2024-01-01"),
      (1L, "click", "2024-01-21"))
    assert(out === want)
  }
}
