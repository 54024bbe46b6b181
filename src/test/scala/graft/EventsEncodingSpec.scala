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
  * Spark cannot WRITE annotated INT64 TIMESTAMP(NANOS) parquet, so the
  * TRUE-annotation fixture (the encoding the generator originally
  * shipped, the one that throws [ILLEGAL_PARQUET_TYPE] unless
  * `nanosAsLong` is set) is written directly with parquet-java's
  * example Group writer — exercising the legacy-flag read surface
  * itself, not just the post-read LongType dispatch arm.
  */
class EventsEncodingSpec extends AnyFunSuite {

  private val T0 = 1704067200000000000L // 2024-01-01T00:00:00Z in nanos
  private val Min = 60L * 1000 * 1000 * 1000

  /** The same logical events as [[rowsDF]], written as an ANNOTATED
    * int64 TIMESTAMP(NANOS, isAdjustedToUTC=false) parquet file via
    * parquet-java (the on-disk shape pyarrow's nanosecond writer
    * produces). */
  private lazy val annotatedNanosDir: String = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).as(LogicalTypeAnnotation.timestampType(
        false, LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_annotated_nanos").resolve("data")
    java.nio.file.Files.createDirectories(dir)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema)
      .build()
    val f = new SimpleGroupFactory(schema)
    try rowsDF.collect().foreach { r =>
      writer.write(f.newGroup()
        .append("event_id", r.getLong(0)).append("ts", r.getLong(1))
        .append("user_id", r.getLong(2)).append("event_type", r.getString(3))
        .append("value", r.getDouble(4)).append("props", r.getString(5)))
    } finally writer.close()
    dir.toString
  }

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

  private def allDirs = Seq(nanosDir, microsLongDir, ntzDir, annotatedNanosDir)

  private def multiset(rows: Array[org.apache.spark.sql.Row]) =
    TestSpark.multiset(rows)

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

  test("annotated TIMESTAMP(NANOS) scan-fails loudly without the legacy flag") {
    val spark = TestSpark.spark
    val e = intercept[Exception] {
      Tables.withConf(spark, "spark.sql.legacy.parquet.nanosAsLong", "false") {
        spark.read.parquet(s"$annotatedNanosDir/events.parquet").collect()
      }
    }
    // match the SPECIFIC error class / flag name, not a bare "NANOS" /
    // "PARQUET" substring — the fixture's own tmpdir path
    // (graft_annotated_nanos/.../events.parquet) appears in most wrapped
    // failure messages and would satisfy the loose form for ANY failure
    assert(TestSpark.causeMessages(e).exists(m =>
      m.contains("ILLEGAL_PARQUET_TYPE") || m.contains("nanosAsLong") ||
        m.toLowerCase.contains("illegal parquet type")),
      s"no parquet-type failure surfaced: $e")
  }

  test("batch consumers see identical rows under all encodings") {
    val spark = TestSpark.spark
    for (name <- Seq("events_hourly", "events_json_kv", "events_sessions")) {
      val ref = multiset(Events.queries(name)(spark, nanosDir).collect())
      assert(ref.nonEmpty, s"$name vacuous on planted data")
      for (dir <- allDirs.filterNot(_ == nanosDir)) {
        val got = multiset(Events.queries(name)(spark, dir).collect())
        assert(got === ref, s"$name diverges across ts encodings ($dir)")
      }
    }
  }

  test("footer scan skips hidden path segments a killed write leaves behind") {
    val spark = TestSpark.spark
    // directory-shaped table (Spark layout), then inject junk under
    // _temporary/ and .staging/ whose LEAF names look like part files —
    // Spark's own file index skips these at every segment, and the
    // footer min/max scan must too (opening them would crash the load
    // on 'not a Parquet file', or fold in rows Spark never scans)
    val base = java.nio.file.Files.createTempDirectory("graft_hidden_seg")
    val table = base.resolve("events.parquet")
    rowsDF.write.parquet(table.toString)
    for (junkDir <- Seq("_temporary/0", ".staging-abc")) {
      val d = table.resolve(junkDir)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve("part-00000.parquet"),
        "not a parquet file".getBytes)
    }
    val years = Tables.events(spark, base.toString)
      .select(expr("year(ts)")).collect().map(_.getInt(0)).distinct
    assert(years.toSeq === Seq(2024), s"hidden-segment junk changed the read: $years")
  }

  test("a ts column with no footer chunk anywhere routes to the probe job") {
    val spark = TestSpark.spark
    // partition the table BY the raw int64 ts: every part file's footer
    // then lacks a ts column chunk entirely. That must read as "no
    // footer evidence" → probe job decides from the data — never as
    // complete-stats-with-no-values, which would silently decide micros
    // and decode these nanos as year ~55000
    val base = java.nio.file.Files.createTempDirectory("graft_part_key")
    rowsDF.write.partitionBy("ts").parquet(s"$base/events.parquet")
    val years = Tables.events(spark, base.toString)
      .select(expr("year(ts)")).collect().map(_.getInt(0)).distinct
    assert(years.toSeq === Seq(2024), s"partition-key ts misread: $years")
  }

  test("a deep pre-1970 micros minimum does not trip the far-future guard") {
    val spark = TestSpark.spark
    // lo ≈ year 1716 in micros: |lo| exceeds MicrosSanityCeil but the
    // guard is about far-future POSITIVE decodes (the blind-window
    // artifact) — a negative extreme is just an ancient instant the
    // magnitude rule tolerates in a micros column
    val micros = rowsDF.withColumn("ts", expr("ts div 1000"))
    val withAncient = micros.unionAll(
      micros.limit(1).withColumn("ts", expr("CAST(-8000000000000000 AS LONG)"))
        .withColumn("event_id", expr("CAST(99 AS LONG)")))
    val dir = TestSpark.plantParquetFile(withAncient, "events.parquet")
    val years = Tables.events(spark, dir)
      .select(expr("year(ts)")).collect().map(_.getInt(0)).distinct.sorted
    assert(years.contains(2024) && years.min < 1970,
      s"ancient-micros row lost or misread: ${years.toSeq}")
  }

  test("streaming consumers see identical rows under all encodings") {
    val spark = TestSpark.spark
    val ref = multiset(
      StreamingWindows.queries("stream_hourly")(spark, nanosDir).collect())
    assert(ref.nonEmpty, "stream_hourly vacuous on planted data")
    for (dir <- allDirs.filterNot(_ == nanosDir)) {
      val got = multiset(
        StreamingWindows.queries("stream_hourly")(spark, dir).collect())
      assert(got === ref, s"stream_hourly diverges across ts encodings ($dir)")
    }
  }
}
