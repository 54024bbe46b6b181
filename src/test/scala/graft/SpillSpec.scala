package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** The spill path, exercised: the 128 GiB sandbox means no battery query
  * ever spills, yet the 100 TB design story leans on Spark's
  * spill-to-disk machinery (UnsafeExternalSorter behind window buffers
  * and sort-merge matched-row buffers, hash-aggregate sort fallback).
  * This spec forces each of those operators through its spill/fallback
  * path with the RUNTIME-settable thresholds Spark exposes for exactly
  * this (window/SMJ buffer spill thresholds; the Tungsten aggregate
  * fallback conf its own test suites use) and pins that results are
  * IDENTICAL to the unconstrained run — correctness survives memory
  * pressure — with task metrics showing bytes actually spilled to disk
  * for the window and SMJ cases.
  */
class SpillSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  /** Total disk bytes spilled by tasks while `body` runs. The forked
    * test JVM runs suites sequentially, so the listener sees only this
    * spec's jobs; delivery is async, so poll briefly before concluding. */
  private def diskSpilledDuring[T](body: => T): (T, Long) = {
    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          spilled.addAndGet(t.taskMetrics.diskBytesSpilled)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (spilled.get() == 0L && System.nanoTime() < deadline)
        Thread.sleep(100)
      (r, spilled.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  /** Per-user running sum over events ordered by time — every user's
    * whole history flows through one WindowExec buffer. */
  private def runningSum: DataFrame =
    Tables.events(spark, dir)
      .withColumn("running",
        sum(col("value")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .select(col("event_id"), col("running"))

  test("window buffer spills to disk and the running sums are unchanged") {
    val want = sortedRows(runningSum)
    val (got, spilled) = diskSpilledDuring {
      Tables.withConfs(spark,
        // switch off the in-memory row array almost immediately, then
        // force the backing UnsafeExternalSorter to spill every 16 rows
        "spark.sql.windowExec.buffer.in.memory.threshold" -> "16",
        "spark.sql.windowExec.buffer.spill.threshold" -> "16") {
        sortedRows(runningSum)
      }
    }
    assert(spilled > 0L, "window buffer never spilled to disk")
    assert(got === want, "window results diverge under spill pressure")
  }

  /** Orders ⋈ lineitem keeps multi-row match groups on the buffered
    * side — the structure the SMJ matched-row buffer exists for. */
  private def smjJoin: DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))

  test("sort-merge join buffer spills to disk and aggregates are unchanged") {
    val confs = Seq(
      // no broadcast anywhere (plan time AND AQE replan time) so the
      // join stays a true shuffle SMJ
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val want = Tables.withConfs(spark, confs: _*) { sortedRows(smjJoin) }
    val (got, spilled) = diskSpilledDuring {
      Tables.withConfs(spark, confs ++ Seq(
        "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "2",
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "2"): _*) {
        sortedRows(smjJoin)
      }
    }
    assert(spilled > 0L, "SMJ matched-row buffer never spilled to disk")
    assert(got === want, "SMJ results diverge under spill pressure")
  }

  /** High-cardinality grouping (distinct l_partkey stats) — the shape
    * whose hash map grows until it must fall back. */
  private def heavyAgg: DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
        max(col("l_extendedprice")).as("mx"))

  test("hash aggregate under forced sort-based fallback is unchanged") {
    val want = sortedRows(heavyAgg)
    // the conf Spark's own HashAggregationQuerySuite uses: "f,s" forces
    // the fast hash map off after f input rows and the sort-based
    // fallback (destruct map → external sorter) after s
    val got = Tables.withConf(spark,
      "spark.sql.TungstenAggregate.testFallbackStartsAt", "2,3") {
      sortedRows(heavyAgg)
    }
    assert(got === want, "aggregate results diverge under sort fallback")
    assert(want.nonEmpty && want.size > 100, "vacuous fixture")
  }

  /** A pure hash repartition: every lineitem row flows through the
    * shuffle WRITER and nothing else buffers — no window, no SMJ, no
    * aggregation map (the read side of a bare exchange does not sort or
    * aggregate), so any disk spill during this plan is the shuffle
    * writer's sorter and only that. 256 reduce partitions on purpose:
    * at or below `spark.shuffle.sort.bypassMergeThreshold` (200) the
    * bypass-merge writer streams per-partition files and NEVER spills —
    * only above it does the exchange take the serialized
    * ShuffleExternalSorter path this test exists to exercise, the same
    * path every wide many-reducer exchange takes at 100 TB. */
  private def repartitioned: DataFrame =
    Tables.lineitem(spark, dir)
      .repartition(256, col("l_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_returnflag"))

  test("shuffle-write sorter spills to disk and rows are unchanged") {
    val want = sortedRows(repartitioned)
    // The force-spill threshold (ShuffleExternalSorter / Spillable) is a
    // CORE SparkConf read at sorter construction per task — not a
    // SQLConf, so withConf can't scope it. local mode shares one live
    // SparkEnv conf between driver and executor threads, so pin it low
    // for this run and restore it (the forked test JVM runs suites
    // sequentially; nothing else shuffles concurrently). This is the
    // sorter the 100 TB story leans on hardest: every wide exchange at
    // scale spills its map-side blocks through exactly this path.
    val conf = org.apache.spark.SparkEnv.get.conf
    val key = "spark.shuffle.spill.numElementsForceSpillThreshold"
    val before = conf.getOption(key)
    conf.set(key, "100")
    val (got, spilled) =
      try diskSpilledDuring { sortedRows(repartitioned) }
      finally before match {
        case Some(v) => conf.set(key, v)
        case None => conf.remove(key)
      }
    assert(spilled > 0L, "shuffle writer never spilled to disk")
    assert(got === want, "rows diverge under shuffle-write spill pressure")
    assert(want.size > 1000, "vacuous fixture")
  }
}
