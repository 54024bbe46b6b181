package graft

import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Events
import graft.streaming.StreamingWindows

/** Regression pin for the events-timestamp normalizer
  * (Tables.normalizeEventTs). The testdata generator has shipped two
  * on-disk encodings for `events.ts` across data refreshes — int64
  * TIMESTAMP(NANOS) (surfaced as a raw long under the nanosAsLong
  * legacy flag) and TIMESTAMP(MICROS) without a UTC flag (surfaced as
  * TIMESTAMP_NTZ) — and the round-7 refresh's switch to the latter
  * broke every events consumer at analysis time until the loader
  * dispatched on the observed type. This spec plants the SAME logical
  * events in both encodings and asserts batch and streaming consumers
  * produce identical results, so the next refresh (either direction)
  * fails here instead of in the driver's correctness gate.
  */
class EventsEncodingSpec extends AnyFunSuite {

  private val T0 = 1704067200000000000L // 2024-01-01T00:00:00Z in nanos
  private val Min = 60L * 1000 * 1000 * 1000

  private def rowsDF = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(
      (1L, T0, 1L, "click", 1.5, """{"k": 1}"""),
      (2L, T0 + 10 * Min, 1L, "view", 2.0, """{"k": 2}"""),
      (3L, T0 + 65 * Min, 2L, "click", 3.0, """{"k": 3}"""),
      (4L, T0 + 130 * Min, 2L, "click", 4.5, """{"k": 4}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** ts as a plain int64 nanos column — the legacy encoding. */
  private lazy val nanosDir: String =
    TestSpark.plantParquetFile(rowsDF, "events.parquet")

  /** ts as TIMESTAMP_NTZ micros — the refreshed encoding. The LTZ→NTZ
    * cast reinterprets the same wall clock under the UTC session zone,
    * so both dirs hold identical logical timestamps. */
  private lazy val ntzDir: String =
    TestSpark.plantParquetFile(
      rowsDF.withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")),
      "events.parquet")

  test("loader normalizes both encodings to the same TIMESTAMP column") {
    val spark = TestSpark.spark
    for (dir <- Seq(nanosDir, ntzDir)) {
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt === org.apache.spark.sql.types.TimestampType,
        s"ts not normalized to TIMESTAMP under $dir")
    }
  }

  test("batch consumers see identical rows under both encodings") {
    val spark = TestSpark.spark
    for (name <- Seq("events_hourly", "events_json_kv", "events_sessions")) {
      val a = Events.queries(name)(spark, nanosDir).collect().map(_.toSeq).toSet
      val b = Events.queries(name)(spark, ntzDir).collect().map(_.toSeq).toSet
      assert(a === b, s"$name diverges across ts encodings")
      assert(a.nonEmpty, s"$name vacuous on planted data")
    }
  }

  test("streaming consumers see identical rows under both encodings") {
    val spark = TestSpark.spark
    val a = StreamingWindows.queries("stream_hourly")(spark, nanosDir)
      .collect().map(_.toSeq).toSet
    val b = StreamingWindows.queries("stream_hourly")(spark, ntzDir)
      .collect().map(_.toSeq).toSet
    assert(a === b, "stream_hourly diverges across ts encodings")
    assert(a.nonEmpty, "stream_hourly vacuous on planted data")
  }
}
