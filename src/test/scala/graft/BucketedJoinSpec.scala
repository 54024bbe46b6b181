package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** The bucketed join must actually be co-located. At test scale Spark
  * would happily broadcast the small side (also shuffle-free, but it
  * proves nothing about bucketing), so auto-broadcast is disabled to
  * force the sort-merge regime the 100 TB claim is about: both sides
  * then MUST be joinable with zero shuffle exchanges — the only
  * `Exchange hashpartitioning` allowed in the final plan is the
  * post-join groupBy's.
  */
class BucketedJoinSpec extends AnyFunSuite {

  test("bucketed SMJ: zero shuffle exchanges below the aggregation") {
    val spark = TestSpark.spark
    graft.engine.Tables.withConf(spark,
        "spark.sql.autoBroadcastJoinThreshold", "-1") {
      val df = Relational.qBucketedJoin(spark, TestSpark.Sf0001)
      val rows = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val ref = Relational.qJoinSortMerge(spark, TestSpark.Sf0001)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(rows === ref, "bucketed plan changed results")

      // final AQE plan only (the string also embeds the initial plan);
      // typed count so range/single-partition exchanges fail too
      val executed = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(executed.contains("SortMergeJoin"),
        s"expected a sort-merge join, plan:\n$executed")
      val shuffles = TestSpark.shuffleExchanges(df)
      assert(shuffles.length == 1,
        s"expected exactly the aggregation exchange, found " +
          s"${shuffles.map(_.nodeName)}:\n$executed")
      assert(executed.contains("Bucketed: true"),
        s"scans not bucketed:\n$executed")
    }
  }
}
