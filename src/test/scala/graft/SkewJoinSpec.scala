package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE's skew-join handling is the engine's answer to hot keys in big
  * joins (the complement to the explicit salting in wordcount_salted):
  * a skewed shuffle partition is split into sub-partitions at runtime.
  * This spec manufactures a join where one key carries ~all the rows and
  * asserts (a) AQE marks the sort-merge join skew-handled, and (b) the
  * result is unchanged.
  */
class SkewJoinSpec extends AnyFunSuite {

  test("AQE splits a skewed sort-merge join and preserves results") {
    val spark = TestSpark.spark
    import spark.implicits._
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // coalescing first can merge the skew away at this tiny scale
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val before = conf.map { case (k, _) => k -> spark.conf.get(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows on ONE key vs a uniform right side. NOTE no aggregation
      // above the join: a parent that requires the join's hash
      // partitioning (e.g. groupBy(k)) legally blocks the skew split,
      // because splitting would spread one key over several partitions.
      val left = spark.range(200000)
        .select(when(col("id") % 100 =!= 0, 0L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // right holds keys 0..99; left holds 0 (hot) and multiples of 100 —
      // so exactly the 198001 left rows with k=0 survive the join.
      // collect() THIS DataFrame (count() would plan a separate query and
      // leave joined.queryExecution unexecuted → isFinalPlan=false)
      assert(joined.collect().length === 198001)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skew-handled:\n$plan")
    } finally before.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
