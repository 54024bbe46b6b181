package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Exactness pin for the SimHash bank-pigeonhole pair join
  * (Dedup.simhashPairsFrom): with 4 16-bit banks, any two 64-bit
  * fingerprints at Hamming distance ≤ 3 share at least one intact bank
  * (pigeonhole: 3 flipped bits can touch at most 3 of 4 banks), and the
  * final `bit_count(xor) <= 3` filter is exact — so the result must
  * EQUAL the brute-force O(n²) answer, not approximate it. Planted
  * corpus: seeded random base fingerprints plus mutants at every Hamming
  * distance 0..6, including adversarial flips concentrated in one bank
  * and spread across all four.
  */
class SimhashPairsSpec extends AnyFunSuite {

  private def bruteForce(fps: Seq[(Long, Long)], maxHamming: Int): Set[(Long, Long, Long)] =
    (for {
      (ida, fa) <- fps
      (idb, fb) <- fps
      if ida < idb
      h = java.lang.Long.bitCount(fa ^ fb).toLong
      if h <= maxHamming
    } yield (ida, idb, h)).toSet

  private def planted(): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    val bases = (0 until 20).map(_ => rnd.nextLong())
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var id = 0L
    def add(fp: Long): Unit = { out += ((id, fp)); id += 1 }
    bases.foreach { b =>
      add(b)
      // exact duplicate (Hamming 0)
      if (rnd.nextBoolean()) add(b)
      // mutants at Hamming 1..6 with random bit positions
      (1 to 6).foreach { k =>
        val bits = rnd.shuffle((0 until 64).toList).take(k)
        add(bits.foldLeft(b)((acc, p) => acc ^ (1L << p)))
      }
      // adversarial: 3 flips inside ONE bank (others intact — must be found)
      val bank = rnd.nextInt(4)
      val inBank = rnd.shuffle((0 until 16).toList).take(3).map(_ + 16 * bank)
      add(inBank.foldLeft(b)((acc, p) => acc ^ (1L << p)))
      // adversarial: 4 flips, one per bank (no intact bank, Hamming 4 —
      // must be EXCLUDED by the distance filter regardless of candidacy)
      val spread = (0 until 4).map(bk => rnd.nextInt(16) + 16 * bk)
      add(spread.foldLeft(b)((acc, p) => acc ^ (1L << p)))
    }
    out.toSeq
  }

  test("pigeonhole pair join equals brute force for Hamming <= 3 — hard equality") {
    val spark = TestSpark.spark
    import spark.implicits._
    val fps = planted()
    val df = fps.toDF("doc_id", "simhash")
    val got = Dedup.simhashPairsFrom(df, maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = bruteForce(fps, 3)
    assert(want.nonEmpty, "planted corpus must contain Hamming<=3 pairs")
    // completeness AND precision: exact set equality, including distances
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("radius > 3 is rejected — the 4-bank pigeonhole is not exact there") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((0L, 0L)).toDF("doc_id", "simhash")
    intercept[IllegalArgumentException] {
      Dedup.simhashPairsFrom(df, maxHamming = 4)
    }
  }
}
