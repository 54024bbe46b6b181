package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeLookup

/** The interval-lookup join ([[graft.plans.RangeLookupJoinExec]]) must be
  * a drop-in replacement for the BroadcastNestedLoopJoin plan it
  * rewrites: same rows, same multiplicities, on hostile fixtures —
  * overlapping intervals, duplicate intervals, null bounds, empty build
  * side, exact-boundary probes. The kill switch must restore the stock
  * plan. (The production path is exercised end-to-end by the
  * `q_range_join` / `q_range_join_dense` oracle rows, which run through
  * extension-injected sessions.)
  */
class RangeLookupJoinSpec extends AnyFunSuite {

  import TestSpark.spark
  import spark.implicits._

  RangeLookup.install(spark)

  private def intervals: DataFrame = {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Option[Double], Option[Double], Long)] =
      Seq.tabulate(300) { i =>
        val lo = rnd.nextInt(1000).toDouble
        (Some(lo), Some(lo + 1 + rnd.nextInt(50)), i.toLong)
      } ++ Seq(
        (None, Some(10.0), 9001L),          // null lo: matches nothing
        (Some(10.0), None, 9002L),          // null hi: matches nothing
        (Some(100.0), Some(150.0), 9003L),  // duplicate of a likely band
        (Some(100.0), Some(150.0), 9004L))  // exact duplicate interval
    rows.toDF("lo", "hi", "interval_id")
  }

  private def probes: DataFrame =
    spark.range(2000).select(
      (col("id") % 1001).cast("double").as("v"), col("id").as("pid"))

  private def bandJoin(): DataFrame =
    probes.join(broadcast(intervals),
      col("v") >= col("lo") && col("v") < col("hi"))

  private def executedPlanString(df: DataFrame): String = {
    df.collect() // AQE finalizes the plan on execution
    df.queryExecution.executedPlan.toString
  }

  test("rewrite fires on the hinted band-join shape") {
    assert(executedPlanString(bandJoin()).contains("RangeLookupJoin"))
  }

  test("identical rows and multiplicities vs the nested-loop plan") {
    val fast = bandJoin()
    assert(executedPlanString(fast).contains("RangeLookupJoin"))
    // the stock-plan rows must be COLLECTED inside the disabled window:
    // count()/exceptAll() each build a fresh QueryExecution, and the
    // rewrite rule reads the kill switch at OPTIMIZATION time, so
    // comparing DataFrames after the conf is restored would re-plan the
    // "slow" side through RangeLookupJoin and compare the rewrite to
    // itself
    spark.conf.set("spark.graft.rangeLookupJoin.enabled", "false")
    val slowRows = try {
      val df = bandJoin()
      assert(!executedPlanString(df).contains("RangeLookupJoin"))
      df.collect()
    } finally spark.conf.set("spark.graft.rangeLookupJoin.enabled", "true")
    val fastRows = fast.collect()
    assert(fastRows.length === slowRows.length)
    assert(TestSpark.multiset(fastRows) === TestSpark.multiset(slowRows))
    // the fixture must actually exercise overlap: some probe value hits
    // several intervals, so the leftward walk emits more than one row
    val maxHits = fastRows.groupBy(_.getAs[Long]("pid")).values.map(_.length).max
    assert(maxHits > 1, "fixture should contain overlapping intervals")
  }

  test("inclusive-lower, exclusive-upper boundary semantics") {
    val one = Seq((Some(10.0), Some(20.0), 1L)).toDF("lo", "hi", "interval_id")
    val pts = Seq(9.999, 10.0, 19.999, 20.0).toDF("v")
    val hit = pts.join(broadcast(one),
      col("v") >= col("lo") && col("v") < col("hi"))
    assert(executedPlanString(hit).contains("RangeLookupJoin"))
    assert(hit.select("v").as[Double].collect().sorted === Array(10.0, 19.999))
  }

  test("empty and all-null build side yields no rows") {
    // Catalyst may constant-fold an all-null local build side to an
    // empty scan before the rewrite ever sees it — either way the
    // contract is zero output rows, so assert only semantics here; the
    // null-bound DROP inside the exec is covered by the mixed fixture
    // above (interval ids 9001/9002 never appear in the output).
    val nulls = Seq[(Option[Double], Option[Double], Long)](
      (None, None, 1L), (None, Some(5.0), 2L)).toDF("lo", "hi", "interval_id")
    val out = probes.join(broadcast(nulls),
      col("v") >= col("lo") && col("v") < col("hi"))
    assert(out.count() === 0L)
    val fromMixed = bandJoin().filter(col("interval_id") >= 9001L &&
      col("interval_id") <= 9002L)
    assert(fromMixed.count() === 0L,
      "null-bound intervals must never match through the exec path")
  }

  test("a ZERO-row build side still executes through the exec (m=0 path)") {
    // the all-null local fixture above may constant-fold before the
    // rewrite fires; a 0-row PARQUET relation is opaque to the optimizer
    // (and AQE's empty propagation matches only Spark's own join nodes),
    // so this pins the exec's empty-build arm — rightmostLeq over empty
    // arrays — which a production filtered-empty interval table reaches
    val dir = TestSpark.plantParquetFile(
      Seq((Some(1.0), Some(2.0), 1L)).toDF("lo", "hi", "interval_id").limit(0),
      "intervals.parquet")
    val iv = spark.read.parquet(s"$dir/intervals.parquet")
    val out = probes.join(broadcast(iv),
      col("v") >= col("lo") && col("v") < col("hi"))
    assert(executedPlanString(out).contains("RangeLookupJoin"),
      "empty parquet build side must still plan through the exec")
    assert(out.count() === 0L)
  }

  test("streamed-side sort order survives the join") {
    // outputOrdering = left.outputOrdering: the probe side streams
    // through row-by-row, so a probe side sorted below the join must
    // still read as sorted ABOVE it. Pinned end-to-end: a window below
    // the join forces a real SortExec (EliminateSorts can't touch a
    // window's required ordering), and a second window above the join
    // asking for the SAME ordering must plan with NO second sort —
    // without the override EnsureRequirements re-sorts the whole
    // probe-side output.
    import org.apache.spark.sql.execution.{SortExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.expressions.Window
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val ranked = probes.withColumn("rn", row_number().over(Window.orderBy("v")))
    val joined = ranked.join(broadcast(intervals),
      col("v") >= col("lo") && col("v") < col("hi"))
      .withColumn("rn2", row_number().over(Window.orderBy("v")))
    joined.collect()
    val nodes = flatten(joined.queryExecution.executedPlan)
    val rlj = nodes.collectFirst { case e: graft.plans.RangeLookupJoinExec => e }
    assert(rlj.nonEmpty, nodes.map(_.nodeName).mkString(", "))
    val ordering = rlj.get.outputOrdering
    assert(ordering.nonEmpty, "join must report the streamed side's ordering")
    assert(ordering === rlj.get.children.head.outputOrdering)
    assert(ordering.head.child.references.map(_.name).toSeq === Seq("v"))
    assert(nodes.count(_.isInstanceOf[SortExec]) === 1,
      "the above-join window must reuse the below-join sort:\n" +
        nodes.map(_.nodeName).mkString(", "))
  }

  test("non-matching shapes are left to Spark") {
    // exclusive lower bound: not the [lo, hi) contract — must NOT rewrite
    val df = probes.join(broadcast(intervals),
      col("v") > col("lo") && col("v") < col("hi"))
    assert(!executedPlanString(df).contains("RangeLookupJoin"))
  }
}
