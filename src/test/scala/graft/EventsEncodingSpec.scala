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
  * events in three encodings — raw nanos long, raw MICROS long (the
  * magnitude-dispatch arm), and TIMESTAMP_NTZ — and asserts batch and
  * streaming consumers produce identical row MULTISETS, so the next
  * refresh fails here instead of in the driver's correctness gate.
  *
  * Known limitation: Spark cannot WRITE annotated INT64
  * TIMESTAMP(NANOS) parquet, so the raw-long fixture exercises the
  * LongType dispatch arm but not the nanosAsLong legacy-flag read
  * surface itself (the part that throws [PARQUET_TYPE_ILLEGAL]
  * without the flag). If a refresh returns to annotated nanos and a
  * Spark upgrade changes that flag's behavior, the driver gate — not
  * this spec — is the detector.
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

  /** ts as a plain int64 MICROS column — the per-LOAD magnitude
    * decision's micros arm (a plausible future refresh the normalizer
    * must not read as ~1970 by blindly dividing by 1000; the
    * ambiguous-range loud failure is pinned in TablesSchemaSpec). */
  private lazy val microsLongDir: String =
    TestSpark.plantParquetFile(
      rowsDF.withColumn("ts", expr("ts div 1000")), "events.parquet")

  /** ts as TIMESTAMP_NTZ micros — the refreshed encoding. The LTZ→NTZ
    * cast reinterprets the same wall clock under the UTC session zone,
    * so all dirs hold identical logical timestamps. */
  private lazy val ntzDir: String =
    TestSpark.plantParquetFile(
      rowsDF.withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")),
      "events.parquet")

  private def allDirs = Seq(nanosDir, microsLongDir, ntzDir)

  /** Row multiset (row → count) — a plain Set would mask an encoding
    * bug that changes row multiplicity without changing the set. */
  private def multiset(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(_.toSeq).groupBy(identity).map { case (k, v) => (k, v.length) }

  test("loader normalizes all encodings to the same TIMESTAMP column") {
    val spark = TestSpark.spark
    for (dir <- allDirs) {
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt === org.apache.spark.sql.types.TimestampType,
        s"ts not normalized to TIMESTAMP under $dir")
    }
    // and the normalized instants are the planted ones, not ~1970
    val years = Tables.events(spark, microsLongDir)
      .select(expr("year(ts)")).collect().map(_.getInt(0)).distinct
    assert(years.toSeq === Seq(2024), s"micros-long arm misread: $years")
  }

  test("batch consumers see identical rows under all encodings") {
    val spark = TestSpark.spark
    for (name <- Seq("events_hourly", "events_json_kv", "events_sessions")) {
      val ref = multiset(Events.queries(name)(spark, nanosDir).collect())
      assert(ref.nonEmpty, s"$name vacuous on planted data")
      for (dir <- Seq(microsLongDir, ntzDir)) {
        val got = multiset(Events.queries(name)(spark, dir).collect())
        assert(got === ref, s"$name diverges across ts encodings ($dir)")
      }
    }
  }

  test("streaming consumers see identical rows under all encodings") {
    val spark = TestSpark.spark
    val ref = multiset(
      StreamingWindows.queries("stream_hourly")(spark, nanosDir).collect())
    assert(ref.nonEmpty, "stream_hourly vacuous on planted data")
    for (dir <- Seq(microsLongDir, ntzDir)) {
      val got = multiset(
        StreamingWindows.queries("stream_hourly")(spark, dir).collect())
      assert(got === ref, s"stream_hourly diverges across ts encodings ($dir)")
    }
  }
}
