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
  */
class HotShingleCapSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private val Hot = Dedup.MaxShingleDf + 50 // docs carrying the boilerplate shingle

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
    val rows = (boiler ++ cleanDup ++ mixedDup).map { case (id, text) =>
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
}
