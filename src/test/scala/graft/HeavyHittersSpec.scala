package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.functions.Text
import graft.operators.TextAnalysis

/** The frequent-items sketch is only useful if its one-sided contract
  * holds: every token whose exact frequency exceeds support·N must be
  * in the candidate set (no false negatives — Misra–Gries guarantees
  * this for ⌈1/support⌉ counters regardless of merge order), and the
  * candidate set stays bounded by the counter budget. False positives
  * are allowed by design, so set equality is NOT asserted.
  */
class HeavyHittersSpec extends AnyFunSuite {

  test("every token above the support threshold is a candidate") {
    val spark = TestSpark.spark
    val dir = TestSpark.Sf0001
    val support = 0.01

    val tokens = Tables.documents(spark, dir)
      .select(explode_outer(Text.tokens(col("text"))).as("word"))
      .filter(col("word").isNotNull)
    val total = tokens.count()
    val mustHave = tokens.groupBy("word").count()
      .filter(col("count") > lit(support * total))
      .collect().map(_.getString(0)).toSet
    assert(mustHave.nonEmpty, "fixture sanity: corpus has heavy hitters")

    val got = TextAnalysis.textHeavyHitters(spark, dir)
      .collect().map(_.getString(0)).toSet
    val missed = mustHave -- got
    assert(missed.isEmpty,
      s"false negatives — heavy hitters missing from the sketch: $missed")
    assert(got.size <= math.ceil(1 / support).toInt,
      s"candidate set exceeds the counter budget: ${got.size}")
  }
}
