package graft

import org.apache.spark.sql.functions.{col, input_file_name, max, min}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance
import graft.sources.Formats

/** The property that makes Z-ordering worth a rewrite: every output
  * file's bounding BOX is small in BOTH dimensions, so a predicate on
  * either column skips most files via footer stats. The 1-D clustered
  * copy (maint_cluster) is the contrast — perfect on its sort column,
  * useless on the other: its files span essentially the whole partkey
  * domain. Content preservation is the driver's maint_zorder oracle
  * row; this spec pins the layout geometry.
  */
class ZorderSpec extends AnyFunSuite {

  private def fileRanges(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[(Long, Long, String, String)] =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(
        min("l_partkey").as("pk_lo"), max("l_partkey").as("pk_hi"),
        min(col("l_shipdate").cast("string")).as("dt_lo"),
        max(col("l_shipdate").cast("string")).as("dt_hi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))

  test("z-ordered files skip on BOTH dimensions; boxes tight in bulk") {
    val spark = TestSpark.spark
    val dir = TestSpark.Sf0001

    val dest = Maintenance.zorderedCopy(spark, dir)
    val ranges = fileRanges(spark, dest)
    assert(ranges.length === 16, "rewrite must produce the planned 16 files")

    val pkDomain = (ranges.map(_._2).max - ranges.map(_._1).min).toDouble
    val days = (lo: String, hi: String) =>
      java.time.Duration.between(
        java.time.LocalDateTime.parse(lo.replace(' ', 'T')),
        java.time.LocalDateTime.parse(hi.replace(' ', 'T'))).toDays.toDouble
    val dtDomain = days(ranges.map(_._3).min, ranges.map(_._4).max)

    // Bulk tightness: 16 files = 4 Morton prefix bits = ~2 bits per
    // dimension, so ideal boxes are ~1/4 of each domain. Two variance
    // sources keep this a BULK property, never per-file: split points
    // across a high-bit flip produce fat boxes (the classic z-curve
    // jump), and repartitionByRange SAMPLES with a seed derived from
    // the RDD id — session-history-dependent, so the layout genuinely
    // varies between runs (observed 11-14 tight on partkey across
    // sessions). The regression being guarded — a 1-D layout — sits at
    // ~0-4 tight files, so >= 10 keeps full discrimination with margin
    // for resampling.
    assert(ranges.count { case (lo, hi, _, _) =>
      (hi - lo) / pkDomain <= 0.35 } >= 10,
      s"too few partkey-tight files: $ranges")
    assert(ranges.count { case (_, _, lo, hi) =>
      days(lo, hi) / dtDomain <= 0.55 } >= 10,
      s"too few date-tight files: $ranges")

    // Skipping effectiveness — the property a scan planner actually
    // uses: how many file boxes intersect each predicate (measured
    // 5 / 12 / 5 of 16; a 1-D layout hits ~16 on partkey, so the
    // bounds keep margin for the sampling variance above while still
    // separating cleanly). The partkey predicate is the one 1-D date
    // clustering can never skip on.
    val pkHit = ranges.count { case (lo, hi, _, _) => lo <= 99 && hi >= 50 }
    val dtHit = ranges.count { case (_, _, lo, hi) =>
      lo < "1999-01-01" && hi >= "1997-01-01" }
    val bothHit = ranges.count { case (pkLo, pkHi, dtLo, dtHi) =>
      pkLo <= 99 && pkHi >= 50 && dtLo < "1999-01-01" && dtHi >= "1997-01-01" }
    assert(pkHit <= 10, s"partkey slice should skip several files: $pkHit")
    assert(dtHit <= 15, s"date slice should skip some files: $dtHit")
    assert(bothHit <= 10, s"2-D slice should skip several files: $bothHit")
  }

  test("z-order survives a snowflake-scale partkey range without overflow") {
    // the long-domain normalization ((v - min) * 65535 / range) throws
    // ARITHMETIC_OVERFLOW under ANSI the moment the key range exceeds
    // Long.Max/65535 ≈ 1.4e14 (and the subtraction alone overflows for
    // mixed-sign bounds) — production id spaces sit at ~1e18. The
    // double-domain rewrite must lay these rows out and, per the
    // operator's contract, change LAYOUT only, never content.
    val spark = TestSpark.spark
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val rows = Seq(
      (1L, -9223372036854775000L, 1L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
        t("1996-03-05T00:00:00Z")),
      (2L, 0L, 1L, 1, 2.0, 20.0, 0.0, 0.0, "N", "O",
        t("1997-03-05T00:00:00Z")),
      (3L, Long.MaxValue, 1L, 1, 3.0, 30.0, 0.0, 0.0, "R", "F",
        t("1998-03-05T00:00:00Z")))
    val df = rows.toDF("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val dir = TestSpark.plantParquetFile(df, "lineitem.parquet")
    val dest = Maintenance.zorderedCopy(spark, dir) // must not throw
    val out = spark.read.parquet(dest)
    val src = graft.engine.Tables.lineitem(spark, dir)
    assert(out.count() === 3)
    assert(out.exceptAll(src).isEmpty && src.exceptAll(out).isEmpty,
      "z-order rewrite changed content on the extreme-range fixture")
  }

  test("1-D clustering leaves the second dimension unprunable") {
    val spark = TestSpark.spark
    val dir = TestSpark.Sf0001

    // maintCluster writes the clustered copy eagerly at call time; the
    // returned gated aggregate is not needed here, so no collect
    Maintenance.maintCluster(spark, dir)
    val ranges = fileRanges(spark, Formats.tmp("maint_clustered", dir))
    val pkDomain = (ranges.map(_._2).max - ranges.map(_._1).min).toDouble
    val widest = ranges.map(r => (r._2 - r._1) / pkDomain).max
    assert(widest >= 0.9,
      f"date-clustered files unexpectedly tight on partkey ($widest%.2f) — contrast broken")
  }
}
