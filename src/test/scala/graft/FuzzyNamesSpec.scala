package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Exactness of the position-tagged deletion-neighborhood blocking in
  * [[Dedup.dedupFuzzyNames]]. The driver oracle only exercises the
  * customer-name corpus, where every name has the SAME length — so the
  * substitution arm does all the work and the insertion/deletion arm
  * never fires. This spec runs the operator over adversarial
  * mixed-length vocabularies (seeded-random strings on a 2-letter
  * alphabet, lengths 1–5, so collisions, runs of equal characters, and
  * every edit type are dense) and asserts the result EQUALS the
  * brute-force all-pairs set under the same metric — no pair missed
  * (blocking is complete), none extra (position tagging kills the
  * distance-2 false-positive class without a verify filter).
  */
class FuzzyNamesSpec extends AnyFunSuite {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0) // d[i-1][j-1]
      d(0) = j
      for (i <- 1 to a.length) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(a.length)
  }

  private def plantCustomer(names: Seq[String]): String = {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fuzzy")
    TestSpark.plantParquetFileInto(
      names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("c_custkey", "c_name"),
      dir, "customer.parquet")
    dir.toString
  }

  test("blocked join equals brute force on random mixed-length vocabularies") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      val vocab = Seq.fill(120)(
        (1 to (1 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(2)).toChar)
          .mkString).distinct
      val expected = (for {
        a <- vocab; b <- vocab
        if a < b && lev(a, b) <= 1
      } yield (a, b)).toSet
      val got = Dedup.dedupFuzzyNames(TestSpark.spark, plantCustomer(vocab))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(got.map(p => (p._1, p._2)).toSet === expected, s"round $round")
      assert(got.forall(_._3 == 1L), "all emitted distances must be 1")
      assert(got.length === expected.size, s"round $round: duplicate pairs emitted")
    }
  }

  test("insertion/deletion arm: pure containment vocabulary") {
    // no two equal-length strings within distance 1 — every true pair
    // crosses lengths, isolating the arm the name corpus never runs
    val vocab = Seq("xy", "xyz", "wxyz", "vwxyz", "pq", "pqr")
    val expected = (for {
      a <- vocab; b <- vocab
      if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(expected.size === 4, "fixture sanity: four cross-length pairs")
    val got = Dedup.dedupFuzzyNames(TestSpark.spark, plantCustomer(vocab))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === expected)
    // every emitted pair must actually cross lengths (the arm under test)
    got.foreach { case (a, b) => assert(a.length != b.length) }
  }
}
