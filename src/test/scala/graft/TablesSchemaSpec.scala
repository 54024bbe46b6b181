package graft

import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Relational

/** Refresh-proofing pin for the conform layer (Tables.conform): the
  * driver regenerates /root/testdata between rounds and has already
  * drifted one column's encoding (r7: `events.ts` → TIMESTAMP_NTZ, 37
  * queries broken at analysis time). This spec plants a drifted-schema
  * parquet fixture per loader and pins BOTH directions of the contract:
  * known-benign drifts (timestamp encodings, integral widenings, checked
  * narrowings, float→double) normalize to the canonical schema with
  * values intact, and unrecognized drift fails loudly with a
  * table.column-named message — never a silently misread column.
  */
class TablesSchemaSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  // ---- integral drifts -----------------------------------------------------

  test("integral widening drift normalizes losslessly (supplier int32 keys)") {
    val dir = TestSpark.plantParquetFile(
      Seq((1, "s1", 3, 10.5), (2, "s2", 4, -2.0))
        .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "supplier.parquet")
    val df = Tables.supplier(spark, dir)
    assert(df.schema("s_suppkey").dataType === LongType)
    assert(df.schema("s_nationkey").dataType === IntegerType)
    assert(df.orderBy("s_suppkey").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("in-range narrowing drift (int64 where int32 canonical) casts back") {
    val dir = TestSpark.plantParquetFile(
      Seq((0L, "AFRICA"), (1L, "AMERICA")).toDF("r_regionkey", "r_name"),
      "region.parquet")
    val df = Tables.region(spark, dir)
    assert(df.schema("r_regionkey").dataType === IntegerType)
    assert(df.orderBy("r_regionkey").collect().map(_.getInt(0)).toSeq === Seq(0, 1))
  }

  test("out-of-range narrowing fails loudly, never wraps") {
    val dir = TestSpark.plantParquetFile(
      Seq((0L, "AFRICA"), (5000000000L, "DRIFTED")).toDF("r_regionkey", "r_name"),
      "region.parquet")
    val e = intercept[Exception] {
      Tables.region(spark, dir).collect()
    }
    // raise_error surfaces as a runtime failure whose message names the
    // drifted column — loud and attributable, whatever the ANSI setting
    assert(TestSpark.causeMessages(e).exists(_.contains("region.r_regionkey")),
      s"failure does not name the drifted column: $e")
  }

  test("float32 drift on a double column widens (customer.c_acctbal)") {
    val dir = TestSpark.plantParquetFile(
      Seq((1L, "c1", 0, 10.25f, "BUILDING"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "customer.parquet")
    val df = Tables.customer(spark, dir)
    assert(df.schema("c_acctbal").dataType === DoubleType)
    assert(df.collect().head.getDouble(3) === 10.25)
  }

  // ---- timestamp-encoding drifts (the r7 failure family) -------------------

  /** One logical lineitem row set under four shipdate encodings. */
  private def lineitemRows(shipMicros: Seq[Long]) =
    shipMicros.zipWithIndex.map { case (us, i) =>
      (i.toLong, 1L, 1L, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", us)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")

  test("lineitem.l_shipdate normalizes across all four timestamp encodings") {
    // two rows inside Q6's [1996-01-01, 1997-01-01) window, one outside
    // — micros built at UTC explicitly: Timestamp.valueOf reads the wall
    // clock in the JVM DEFAULT zone, and the engine pins only the
    // session zone, so that form would shift the boundary row out of the
    // window on any JVM east of UTC
    val micros = Seq("1996-02-01", "1996-07-15", "1994-01-01")
      .map(d => java.time.LocalDate.parse(d)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L)
    val raw = lineitemRows(micros)
    val dirs = Seq(
      // raw epoch-micros int64
      TestSpark.plantParquetFile(raw, "lineitem.parquet"),
      // raw epoch-nanos int64
      TestSpark.plantParquetFile(
        raw.withColumn("l_shipdate", col("l_shipdate") * 1000L), "lineitem.parquet"),
      // TIMESTAMP_NTZ (the r7 refresh encoding)
      TestSpark.plantParquetFile(
        raw.withColumn("l_shipdate",
          expr("cast(timestamp_micros(l_shipdate) as timestamp_ntz)")),
        "lineitem.parquet"),
      // DATE
      TestSpark.plantParquetFile(
        raw.withColumn("l_shipdate",
          expr("cast(timestamp_micros(l_shipdate) as date)")),
        "lineitem.parquet"))
    val results = dirs.map { d =>
      val df = Tables.lineitem(spark, d)
      assert(df.schema("l_shipdate").dataType === TimestampType,
        s"not normalized under $d")
      // a real consumer: TPC-H Q6's pushed-filter revenue over the window
      Relational.qTpchQ6(spark, d).collect().head.getDouble(0)
    }
    assert(results.distinct.size === 1,
      s"Q6 diverges across l_shipdate encodings: $results")
    assert(results.head > 0.0, "vacuous fixture — no rows in the Q6 window")
  }

  test("a negative sentinel in a raw-micros column still decides micros") {
    // the magnitude rule works on |value|: -1 (or any pre-1970 instant)
    // in an otherwise-2024-micros column is NOT ambiguous, and must not
    // push the whole load onto the wrong arm or into a loud failure
    val t0 = 1704067200000000L // 2024-01-01T00:00:00Z micros
    val dir = TestSpark.plantParquetFile(
      Seq((1L, -1L, 1L, "sentinel", 0.0, "{}"),
        (2L, t0, 1L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events.parquet")
    val years = Tables.events(spark, dir)
      .selectExpr("year(ts)").collect().map(_.getInt(0)).toSet
    assert(years === Set(1969, 2024), s"sentinel arm misread: $years")
  }

  test("case-respelled columns are caught, normalized, and renamed back") {
    // Spark resolves col("value") case-insensitively, so a refresh that
    // re-spells the column VALUE (while also drifting its type) must not
    // slip past conform — and the output spelling must stay canonical
    val dir = TestSpark.plantParquetFile(
      Seq((1L, new java.sql.Timestamp(1704067200000L), 1L, "click", 1.5f, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "VALUE", "props"),
      "events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.columns.contains("value") && !df.columns.contains("VALUE"))
    assert(df.schema("value").dataType === DoubleType)
    assert(df.collect().head.getAs[Double]("value") === 1.5)
  }

  test("mixed-magnitude raw-long timestamps are ambiguous and fail loudly") {
    val dir = TestSpark.plantParquetFile(
      Seq((1L, 50000000000000000L, 1L, "click", 1.0, "{}"),
        (2L, 2000000000000000000L, 1L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("events.ts") &&
      e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("a Long.MinValue extreme cannot silently decide micros (abs overflow)") {
    // math.abs(Long.MinValue) overflows NEGATIVE; an unsaturated
    // magnitude rule would read [MinValue, 2024-micros] as
    // maxAbs = 1.7e15 < NanosFloor and silently decide micros, decoding
    // MinValue under the micros arm. The saturating magnitude must route
    // this mix to the same loud ambiguity as any other frontier-straddle
    val t0 = 1704067200000000L // 2024-01-01T00:00:00Z micros
    val dir = TestSpark.plantParquetFile(
      Seq((1L, Long.MinValue, 1L, "corrupt", 0.0, "{}"),
        (2L, t0, 1L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("events.ts") &&
      e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("DECIMAL(n,0)-encoded keys normalize back to the canonical integral") {
    val dir = TestSpark.plantParquetFile(
      Seq((1L, "c1", 0, 1.0, "BUILDING"), (2L, "c2", 1, 2.0, "AUTO"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .withColumn("c_custkey", expr("cast(c_custkey as decimal(18,0))")),
      "customer.parquet")
    val df = Tables.customer(spark, dir)
    assert(df.schema("c_custkey").dataType === LongType)
    assert(df.orderBy("c_custkey").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("streaming events source conforms drifted non-ts columns like batch") {
    // value as float32 AND ts as raw micros long — two simultaneous
    // drifts; the stream must normalize both (it shares Tables.conform
    // with the batch loader via normalizeEventTs)
    val t0 = 1704067200000000L // 2024-01-01T00:00:00Z micros
    val drifted = TestSpark.plantParquetFile(
      Seq((1L, t0, 1L, "click", 1.5f, "{}"),
        (2L, t0 + 600L * 1000 * 1000, 1L, "view", 2.25f, "{}"),
        (3L, t0 + 7200L * 1000 * 1000, 2L, "click", 4.0f, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events.parquet")
    val canonical = TestSpark.plantParquetFile(
      Seq((1L, new java.sql.Timestamp(t0 / 1000), 1L, "click", 1.5, "{}"),
        (2L, new java.sql.Timestamp(t0 / 1000 + 600L * 1000), 1L, "view", 2.25, "{}"),
        (3L, new java.sql.Timestamp(t0 / 1000 + 7200L * 1000), 2L, "click", 4.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events.parquet")
    def rows(dir: String) = TestSpark.multiset(
      graft.streaming.StreamingWindows.queries("stream_hourly")(spark, dir).collect())
    val got = rows(drifted)
    assert(got.nonEmpty, "vacuous streaming fixture")
    assert(got === rows(canonical),
      "streaming results diverge between drifted and canonical encodings")
  }

  // ---- non-benign drift and the partial-fixture allowance ------------------

  test("semantic type drift fails loudly with a table.column-named message") {
    val dir = TestSpark.plantParquetFile(
      Seq((0, 7), (1, 9)).toDF("r_regionkey", "r_name"), // r_name as int
      "region.parquet")
    val e = intercept[IllegalStateException] { Tables.region(spark, dir) }
    assert(e.getMessage.contains("region.r_name"), e.getMessage)
  }

  test("partial fixtures stay legal (FuzzyNamesSpec's two-column customer)") {
    val dir = TestSpark.plantParquetFile(
      Seq((1L, "alice"), (2L, "bob")).toDF("c_custkey", "c_name"),
      "customer.parquet")
    assert(Tables.customer(spark, dir).count() === 2L)
  }

  test("every real-testdata loader emits exactly the canonical schema") {
    // Tables.byName IS the registry (every named accessor routes through
    // the same loadConformed) — a hand-built map here would silently lag
    // an 11th table
    for (name <- Tables.names) {
      val loaded = Tables.byName(spark, TestSpark.Sf0001, name)
      def shape(dt: DataType): DataType = dt match {
        case ArrayType(et, _) => ArrayType(shape(et)) // containsNull-agnostic
        case other => other
      }
      for ((colName, wanted) <- Tables.expectedColumns(name))
        assert(shape(loaded.schema(colName).dataType) === shape(wanted),
          s"$name.$colName not canonical")
      assert(loaded.count() > 0, s"$name empty at sf0.001")
    }
  }
}
