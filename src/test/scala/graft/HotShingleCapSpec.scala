package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins the hot-shingle document-frequency cap on the exact near-dup
  * inverted index (Dedup.MaxShingleDf — VERDICT r11's scale-hardening
  * ask). The candidate join's work is Σ(df²) per shingle, so ONE
  * boilerplate shingle shared by k documents alone yields k(k-1)/2
  * candidate rows; the cap bounds that at T² regardless of corpus
  * size. This spec plants a corpus where MaxShingleDf+50 documents
  * share a single boilerplate shingle (and nothing else) and asserts:
  *  - the capped index drops the hot shingle entirely while keeping
  *    every discriminative shingle of the same documents;
  *  - the pair output is exactly the one genuinely-duplicated pair —
  *    i.e. candidate generation produced zero pairs among the ~1e3
  *    boilerplate-only docs (uncapped, those alone would be ~551k
  *    candidate rows);
  *  - a duplicate pair that ALSO carries the hot shingle is still
  *    found (its discriminative shingles suffice), with the capped
  *    score a lower bound of the true Jaccard.
  *
  * It ALSO pins the cap doc's compensating-coverage claim (the two
  * tests at the bottom): a planted > T NEAR-DUP cluster — whose own
  * shared shingles exceed the cap, the one regime declared invisible
  * to capped pairwise scoring — is provably (a) not an exact-copy
  * case, (b) emitted as zero pairs by the pairwise family, and (c)
  * collapsed at chunk level by dedupChunks, the family member the doc
  * assigns that regime to (VERDICT r12 ask #4).
  */
class HotShingleCapSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private val Hot = Dedup.MaxShingleDf + 50 // docs carrying the boilerplate shingle

  // the > T NEAR-DUP (not exact-copy) cluster for the compensating-
  // coverage tests (VERDICT r12 ask #4): Mega docs that pairwise share
  // a full 10-token passage (true Jaccard 8/10 = 0.8 ≥ the 0.5 gate)
  // plus one unique tail token each — the regime the MaxShingleDf doc
  // DECLARES invisible to capped pairwise scoring (the cluster inflates
  // its own shared shingles' df past T) and assigns to dedup_chunks
  private val Mega = Dedup.MaxShingleDf + 50
  private val MegaBase = 20000L
  private val MegaPassage = (0 until 10).map(i => s"mega$i").mkString(" ")

  // planted ONCE for the whole suite (the three tests read the same
  // corpus; re-planting would triple the pipeline work and leak a temp
  // dir per test), deleted in afterAll
  private lazy val plantedDir: String = plantDocs()

  override def afterAll(): Unit = {
    val p = new org.apache.hadoop.fs.Path(plantedDir)
    p.getFileSystem(TestSpark.spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    super.afterAll()
  }

  private def plantDocs(): String = {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_hotshingle")
    // docs 0..Hot-1: "boiler plate line u{i}a u{i}b u{i}c" — share ONLY
    // the 3-gram "boiler plate line" (df = Hot > MaxShingleDf); every
    // other shingle is unique to its doc.
    val boiler = (0 until Hot).map { i =>
      (i.toLong, s"boiler plate line u${i}a u${i}b u${i}c")
    }
    // 9001/9002: an exact duplicate pair with no hot shingle.
    val cleanDup = Seq(
      (9001L, "alpha beta gamma delta epsilon"),
      (9002L, "alpha beta gamma delta epsilon"))
    // 9003/9004: a duplicate pair that ALSO carries the boilerplate
    // prefix — shares the hot shingle plus discriminative ones.
    val mixedDup = Seq(
      (9003L, "boiler plate line zeta eta theta iota"),
      (9004L, "boiler plate line zeta eta theta iota"))
    // MegaBase..: the > T near-dup cluster — every doc = the shared
    // 10-token passage + a unique tail token (11 tokens → the passage
    // is exactly one ChunkTokens chunk, the tail a second). Each doc's
    // 9 shingles: 8 fully inside the passage (df = Mega > MaxShingleDf,
    // capped out) + 1 tail shingle (df = 1). Pairwise true Jaccard
    // 8/10; capped intersection 0.
    val megaCluster = (0 until Mega).map { i =>
      (MegaBase + i, s"$MegaPassage tail${i}x")
    }
    val rows = (boiler ++ cleanDup ++ mixedDup ++ megaCluster).map { case (id, text) =>
      (id, text, "en", "planted", text.length.toLong)
    }
    TestSpark.plantParquetFileInto(
      rows.toDF("doc_id", "text", "lang", "source", "n_chars"),
      dir, "documents.parquet")
    dir.toString
  }

  test("df cap drops the boilerplate shingle, keeps discriminative ones") {
    val dir = plantedDir
    val idx = Dedup.cappedShingleIndex(TestSpark.spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(!idx.exists(_._2 == "boiler plate line"),
      "hot shingle must be excluded from the inverted index")
    // the hot docs' unique shingles survive (df = 1 each): doc 0 still
    // indexes its three discriminative 3-grams
    val doc0 = idx.collect { case (0L, s) => s }.toSet
    assert(doc0 === Set("plate line u0a", "line u0a u0b", "u0a u0b u0c"))
  }

  test("pair output is bounded: only genuine duplicates survive the cap") {
    val dir = plantedDir
    val pairs = Dedup.dedupNearJaccard(TestSpark.spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((9001L, 9002L), (9003L, 9004L)),
      s"expected exactly the two planted dup pairs, got ${pairs.length} pairs")
    // clean pair: full intersection survives → exact Jaccard 1.0
    assert(pairs(0)._3 === 1.0)
    // mixed pair: identical 7-token docs have 5 shingles, one of them
    // hot → capped inter = 4, sizes stay 5 → 4/(5+5-4) = 2/3, a lower
    // bound of the true Jaccard 1.0 and still well over the 0.5 gate
    assert(math.abs(pairs(1)._3 - 4.0 / 6.0) < 1e-12)
  }

  test("LSH path scores with the SAME capped semantics as the exact join") {
    // identical docs band-collide with probability 1 (equal signatures),
    // so both planted pairs are guaranteed candidates; what this pins is
    // the VERIFY step — an uncapped verify would score the mixed pair at
    // its true Jaccard 1.0 and diverge from the exact join and the
    // shared oracle CTE the moment a hot shingle exists.
    val dir = plantedDir
    val pairs = Dedup.dedupMinhashLsh(TestSpark.spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((9001L, 9002L), (9003L, 9004L)),
      s"expected exactly the two planted dup pairs, got ${pairs.length} pairs")
    assert(pairs(0)._3 === 1.0)
    assert(math.abs(pairs(1)._3 - 4.0 / 6.0) < 1e-12,
      "LSH verify must use the capped intersection — uncapped scoring " +
        "would report 1.0 here and out-score the exact path")
  }

  // ---- compensating coverage for the DECLARED pairwise blindness ------
  // The MaxShingleDf doc (Dedup.scala) argues the one regime capped
  // pairwise scoring cannot see — a near-dup cluster of > T members,
  // whose own shared shingles exceed the cap — is covered by the
  // UNCAPPED family members: exact copies by dedupExact's content hash,
  // replicated passages by dedupChunks' first-occurrence chunk dedup.
  // These two tests turn that prose division of labor into assertions
  // over the planted Mega cluster (VERDICT r12 ask #4).

  test(">T near-dup cluster: invisible to the capped pairwise family, and NOT an exact-copy case") {
    val dir = plantedDir
    val inMega = (id: Long) => id >= MegaBase && id < MegaBase + Mega
    // the pairwise path emits NO pair touching the cluster — its 551k+
    // true near-dup pairs (J = 0.8 each) are the declared trade, not a
    // bug; the two planted control pairs in the same corpus still
    // surface (pinned exactly by the pair-output test above)
    val pairs = Dedup.dedupNearJaccard(TestSpark.spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.exists(p => inMega(p._1) || inMega(p._2)),
      "capped pairwise scoring saw inside the > T cluster — the cap is " +
        "not applying to the cluster's own shared shingles")
    // and dedupExact does NOT collapse it (each member's text is
    // distinct) — pinning that this fixture is the NEAR-dup regime the
    // content hash can't cover, so chunk-level coverage below is what
    // actually compensates
    val exact = Dedup.dedupExact(TestSpark.spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(r => inMega(r._3))
    assert(exact.length === Mega)
    assert(exact.forall(_._2 === 1L),
      "exact dedup merged near-dup cluster members — fixture texts must " +
        "be distinct for the compensating-coverage claim to mean anything")
  }

  test(">T near-dup cluster: collapsed at chunk level by dedupChunks (the compensating member)") {
    val dir = plantedDir
    val out = Dedup.dedupChunks(TestSpark.spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val mega = out.filter(r => r._1 >= MegaBase && r._1 < MegaBase + Mega)
      .sortBy(_._1)
    // every member survives (its unique tail chunk), so chunk dedup
    // scrubs the replicated passage without deleting documents
    assert(mega.length === Mega)
    // first occurrence keeps the shared passage exactly once,
    // corpus-wide: the min-doc_id member holds both its chunks...
    assert(mega.head === ((MegaBase, 2L, s"$MegaPassage tail0x")))
    // ...and every other member is reduced to its unique tail
    mega.tail.zipWithIndex.foreach { case ((id, nKept, text), i) =>
      assert(id === MegaBase + i + 1)
      assert(nKept === 1L, s"doc $id kept $nKept chunks, expected the tail only")
      assert(text === s"tail${i + 1}x")
    }
    // the passage survives in exactly ONE reassembled document anywhere
    // in the corpus — the chunk-level collapse the df-cap doc promises
    assert(out.count(_._3.contains(MegaPassage)) === 1)
  }
}
