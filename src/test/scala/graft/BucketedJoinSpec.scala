package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Bucketing for co-located joins — the 100 TB recipe for repeated
  * fact⋈fact joins: write both tables bucketed+sorted by the join key,
  * and the sort-merge join reads both sides with NO shuffle exchange
  * (each bucket pair joins locally). This spec builds the bucketed
  * tables in a temp warehouse and asserts the exchange-free plan plus
  * result equality with the plain join.
  */
class BucketedJoinSpec extends AnyFunSuite {

  test("bucketed tables sort-merge join without a shuffle exchange") {
    val spark = TestSpark.spark
    val dir = TestSpark.Sf0001
    val n = 8

    // drop any leftovers from an aborted run (DROP alone doesn't clear
    // an orphaned warehouse dir when the table vanished from the catalog)
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }

    Tables.orders(spark, dir).write.mode("overwrite")
      .bucketBy(n, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(spark, dir).write.mode("overwrite")
      .bucketBy(n, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    // the sf0.001 tables are small enough to auto-broadcast, which would
    // sidestep the bucketed-SMJ path this spec demonstrates — disable it
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    // one exchange for the final groupBy is fine; the JOIN must add none
    assert(shuffles <= 1, s"expected bucketed join without join-side shuffles, got plan:\n$plan")
    assert(plan.contains("SortMergeJoin"), "bucketed join should be sort-merge")
    assert(plan.contains("SelectedBucketsCount"), "scan should be bucket-aware")

    val plain = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val a = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
