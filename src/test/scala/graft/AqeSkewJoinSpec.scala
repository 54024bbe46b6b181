package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Demonstrates the RUNTIME half of the engine's skew story. The
  * authored half is salting (`wordcount_salted` splits a hot
  * aggregation key); this spec pins the other half — AQE's
  * OptimizeSkewedJoin splitting a hot JOIN partition at runtime — so
  * the 100 TB skew claim rests on an executed plan, not configuration
  * folklore. A planted fact table sends half its rows to ONE key; with
  * sort-merge forced and the skew thresholds scaled to the fixture,
  * AQE must split the hot partition (visible as the SMJ's
  * `skew=true` / the AQEShuffleRead's skewed-partition read) while
  * returning exactly the same aggregate as the unsplit plan.
  */
class AqeSkewJoinSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  // half the fact lands on key 0 — at 8 shuffle partitions that one
  // partition carries ~50x its fair share; pad makes bytes, not rows,
  // the skew signal (AQE thresholds are byte-based)
  private lazy val fact = (0 until 120000).map { i =>
    val k = if (i % 2 == 0) 0L else (i % 997).toLong
    (k, "x" * 64, i.toLong)
  }.toDF("k", "pad", "v")

  private lazy val dim = (0L until 997L).map(k => (k, s"dim_$k"))
    .toDF("dk", "name")

  private def joined = fact.join(dim, col("k") === col("dk"))
    .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))

  test("AQE splits the skewed join partition and preserves results") {
    val (skewPlan, skewRows) = Tables.withConfs(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8") {
      val df = joined
      val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      (df.queryExecution.executedPlan.toString, rows)
    }
    assert(skewPlan.contains("skew=true"),
      "AQE did not mark the sort-merge join as skew-handled:\n" +
        skewPlan.linesIterator.take(25).mkString("\n"))
    // same aggregate with skew handling OFF — splitting must be
    // result-transparent
    val plainRows = Tables.withConfs(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8") {
      joined.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(skewRows === plainRows, "skew split changed the join result")
    assert(skewRows.nonEmpty)
    // the hot key really is hot: its group carries half the fact (the
    // 60,000 even rows, plus the 60 odd multiples of 997 that also
    // reduce to key 0)
    assert(skewRows.find(_._1 == "dim_0").get._2 === 60060L)
  }
}
