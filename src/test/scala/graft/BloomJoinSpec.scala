package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Relational

/** The runtime bloom-filter injection must actually land: under the
  * same conf window qBloomJoin executes in, the optimized plan has to
  * carry a `might_contain` predicate on the fact (lineitem) side —
  * fed by a `bloom_filter_agg` over the filtered orders keys — and the
  * rewrite must not change results (bloom false positives only pass
  * extra rows to the exact join, never drop or add matches).
  */
class BloomJoinSpec extends AnyFunSuite {

  // the EXACT window qBloomJoin executes in — shared, not copied, so a
  // production tuning change cannot leave this spec pinning a dead conf
  private val confs = Relational.BloomJoinConfs

  test("bloom filter is injected on the fact side and preserves results") {
    val spark = TestSpark.spark
    val dir = TestSpark.Sf0001

    val (plan, filtered) = Tables.withConfs(spark, confs: _*) {
      val df = Relational.bloomJoinPlan(spark, dir)
      (df.queryExecution.optimizedPlan.toString,
        df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap)
    }
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter in the optimized plan:\n$plan")
    // ...and on the FACT side: the filter must reference the lineitem
    // join key — a creation-side injection would contain might_contain
    // too, while pruning nothing before the fact exchange
    assert(plan.linesIterator.exists(l =>
      l.contains("might_contain") && l.contains("l_orderkey")),
      s"runtime bloom filter not on the fact (lineitem) side:\n$plan")
    assert(plan.contains("bloom_filter_agg"),
      s"no bloom_filter_agg creation subquery in the optimized plan:\n$plan")

    val unfiltered = Tables.withConfs(spark,
      (confs :+ ("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")): _*) {
      val df = Relational.bloomJoinPlan(spark, dir)
      assert(!df.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "disable knob ignored — twin still carries the runtime filter")
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    }
    assert(filtered === unfiltered, "runtime filter changed query results")
  }
}
