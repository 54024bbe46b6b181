package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The minhash_union sketch estimate must track the EXACT union Jaccard
  * it approximates: per source, the true Jaccard of unioned shingle
  * sets vs the sketch's agreeing-slot fraction. K=32 gives a standard
  * error of ~sqrt(j(1-j)/32) <= 0.09, so a 0.3 bound is ~3 sigma; the
  * result is deterministic for a fixed corpus, so this pins behaviour
  * rather than gambling on variance.
  */
class SketchAccuracySpec extends AnyFunSuite {

  import TestSpark.spark

  test("per-source union sketch estimates exact union Jaccard within 0.3") {
    // exact union shingle sets per source — coalesce to empty like the
    // operator's shingleSets does, so a refreshed NULL text reads as an
    // empty set here too instead of NPEing the oracle side
    val rows = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(col("source"),
        coalesce(
          array_distinct(graft.functions.Text.shingles(
            graft.functions.Text.tokens(col("text")), Dedup.ShingleN)),
          array().cast("array<string>")).as("sh"))
      .collect()
    val unions: Map[String, Set[String]] = rows
      .groupBy(_.getString(0))
      .map { case (src, rs) =>
        src -> rs.flatMap(_.getSeq[String](1)).toSet
      }
    def exactJ(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 0.0
      else (a & b).size.toDouble / (a | b).size.toDouble

    val est = Dedup.dedupSketchSources(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

    val expectedPairs = unions.keys.toSeq.sorted.combinations(2)
      .map { case Seq(a, b) => (a, b) }.toSet
    assert(est.keySet === expectedPairs, "one row per unordered source pair")

    est.foreach { case ((a, b), e) =>
      val x = exactJ(unions(a), unions(b))
      assert(e >= 0.0 && e <= 1.0)
      assert(math.abs(e - x) <= 0.3,
        f"sketch estimate off for ($a,$b): est=$e%.3f exact=$x%.3f")
    }
  }
}
