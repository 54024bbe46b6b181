package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Plan pin for the batch-ANN serving query: the 100 TB shape is a
  * shuffle-free scoring scan (query set broadcast against the corpus
  * scan) with the per-query top-10 pruned by a PARTIAL WindowGroupLimit
  * before the single final exchange on query_id. A regression that
  * reintroduces a corpus-side shuffle (e.g. routing through the
  * pair-join quantization barrier) or loses the partial group limit
  * fails here, not in a 100× scale-up.
  */
class AnnBatchPlanSpec extends AnyFunSuite {

  test("batch top-k: one exchange total, partial WindowGroupLimit, bounded output") {
    val spark = TestSpark.spark
    val df = Similarity.annTopkBatch(spark, TestSpark.Sf0001)
    val rows = df.collect()

    // correctness envelope: every query serves exactly 10 ranked rows
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size === Similarity.BatchQueryCount)
    byQuery.foreach { case (qid, rs) =>
      assert(rs.length === 10, s"query $qid returned ${rs.length} rows")
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq === (1L to 10L),
        s"query $qid ranks not 1..10")
      val sims = byRank.map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"query $qid sims not non-increasing")
      assert(rs.forall(r => r.getLong(1) != qid), s"query $qid returned itself")
    }

    // plan envelope (final AQE plan only) — typed count, so a range or
    // single-partition exchange reintroduced on the corpus side fails
    // too, not just a hash one
    val executed = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val shuffles = TestSpark.shuffleExchanges(df)
    assert(shuffles.length == 1,
      s"expected exactly the final per-query-rank exchange, found " +
        s"${shuffles.map(_.nodeName)}:\n$executed")
    assert(executed.contains("BroadcastNestedLoopJoin"),
      s"query set not broadcast:\n$executed")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(executed).isDefined,
      s"no partial WindowGroupLimit before the exchange:\n$executed")
  }
}
