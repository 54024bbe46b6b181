package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance
import graft.sources.Formats

/** File-count mechanics of the compaction operator (the content-
  * preservation half is the driver's `maint_compact` oracle row): the
  * scatter really over-shards, the compacted copy hits exactly the
  * byte-planned file count, and nothing is lost or duplicated.
  */
class MaintenanceSpec extends AnyFunSuite {

  test("dq audit checks every row once and bounds violations") {
    val spark = TestSpark.spark
    val dir = TestSpark.Sf0001
    val rows = Maintenance.maintDqAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.map(_._1).distinct.length === 5)
    rows.foreach { case (rule, bad, checked) =>
      assert(bad >= 0L && bad <= checked, rule)
    }
    val checkedBy = rows.map(t => t._1 -> t._3).toMap
    assert(checkedBy("lineitem_quantity_positive") ===
      graft.engine.Tables.lineitem(spark, dir).count())
    assert(checkedBy("orders_custkey_resolves") ===
      graft.engine.Tables.orders(spark, dir).count())
    // TPC-H-ish generator keeps referential integrity: no orphans
    assert(rows.find(_._1 == "orders_custkey_resolves").get._2 === 0L)
    assert(rows.find(_._1 == "lineitem_orderkey_resolves").get._2 === 0L)
  }

  test("compaction plans ceil(bytes/target) files and preserves rows") {
    val spark = TestSpark.spark
    val dir = TestSpark.Sf0001

    val out = Maintenance.maintCompact(spark, dir)
    val scatter = Formats.tmp("maint_scatter", dir)
    val dest = Formats.tmp("maint_compacted", dir)

    val scatterFiles = Maintenance.dataFiles(spark, scatter)
    val destFiles = Maintenance.dataFiles(spark, dest)
    assert(scatterFiles === 64, "scatter fixture must over-shard")
    assert(destFiles ===
      Maintenance.plannedFiles(Maintenance.dataBytes(spark, scatter)))
    assert(destFiles < scatterFiles, "compaction must reduce file count")

    // every row survives exactly once: per-group counts over the
    // compacted copy equal the source table's
    val expected = graft.engine.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("n_rows"))).toMap
    assert(got === expected)
  }

  test("clustered rewrite gives files pairwise-disjoint key ranges") {
    val spark = TestSpark.spark
    val dir = TestSpark.Sf0001
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}

    Maintenance.maintCluster(spark, dir).collect() // runs the rewrite
    val dest = Formats.tmp("maint_clustered", dir)
    assert(Maintenance.dataFiles(spark, dest) === 8)

    // per-file (min,max) of the cluster key, ordered by min: each file's
    // range must end before (or exactly where) the next begins — the
    // property that lets a range predicate skip whole files via footer
    // stats. Boundary equality is allowed (a split point value sits at
    // the edge of one partition).
    // ISO strings (lexicographic == chronological), so the check is
    // agnostic to the NTZ external class the session hands back
    val ranges = spark.read.parquet(dest)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("l_shipdate").cast("string")).as("lo"),
        max(col("l_shipdate").cast("string")).as("hi"))
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(ranges.length === 8)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: $hi > $lo2")
      case _ =>
    }
  }

  test("compact honors targets finer than the scan's default bin-packing") {
    // A target far below maxPartitionBytes: without pinning the scan's
    // bin-packing to the target, the read would open in FEWER partitions
    // than planned and coalesce (decrease-only) would silently
    // under-deliver the contract.
    val spark = TestSpark.spark
    val dir = TestSpark.Sf0001
    // own scratch prefix — must not clobber maintCompact's "maint_scatter"
    // fixture, which the first test asserts against
    val scatter = Formats.tmp("maint_fine_scatter", dir)
    graft.engine.Tables.lineitem(spark, dir)
      .repartition(64).write.mode("overwrite").parquet(scatter)
    val target = math.max(1L, Maintenance.dataBytes(spark, scatter) / 7)
    val dest = Formats.tmp("maint_fine", dir)
    val planned = Maintenance.compact(spark, scatter, dest, target)
    assert(planned >= 7, "fixture sanity: target must demand more files than scan partitions")
    assert(Maintenance.dataFiles(spark, dest) === planned)
    assert(spark.read.parquet(dest).count() ===
      graft.engine.Tables.lineitem(spark, dir).count())
  }

  test("plannedFiles is ceil with a floor of one") {
    assert(Maintenance.plannedFiles(0, 100) === 1)
    assert(Maintenance.plannedFiles(1, 100) === 1)
    assert(Maintenance.plannedFiles(100, 100) === 1)
    assert(Maintenance.plannedFiles(101, 100) === 2)
    assert(Maintenance.plannedFiles(1000, 100) === 10)
  }
}
