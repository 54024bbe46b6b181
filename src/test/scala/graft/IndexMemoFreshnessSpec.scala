package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the freshness contract of the per-(JVM, dataset) similarity
  * index memos (Similarity.ivfIndex / semIndex / dimCache): each entry
  * carries the embeddings source fingerprint (ADVICE r16, closed r17),
  * so an IN-PLACE regeneration of the corpus self-invalidates the memo
  * even when the caller forgets invalidateIndexCaches. The replayed
  * failure is the exact ADVICE scenario: a query over an EMPTY
  * embeddings table memoizes an empty-index tombstone; the table is
  * then populated at the same path; a bare memo would keep serving the
  * tombstone (empty results — or a crash on the empty centroid head)
  * where the fingerprint mismatch must force a rebuild.
  */
class IndexMemoFreshnessSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private lazy val dir = Files.createTempDirectory("graft_idx_fresh")
    .resolve("data")

  override def afterAll(): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir.toString)
    p.getFileSystem(TestSpark.spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    super.afterAll()
  }

  /** Deterministic 64-dim corpus with planted IDENTICAL pairs
    * (cos = 1.0): both the IVF top-1 and the semantic pair pruner must
    * surface them regardless of centroid placement, so non-empty output
    * proves a real index was built from THIS corpus. */
  private def populated() = {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = (0 until 24).map { i =>
      (0 until 64).map(d => ((7 * i + 3 * d) % 11 - 5) / 7.0f)
    }
    val rows =
      base.zipWithIndex.map { case (v, i) => (i.toLong, v, i % 3) } ++
        // identical twins of the first four vectors, distinct ids
        base.take(4).zipWithIndex.map { case (v, i) =>
          (100L + i, v, i % 3)
        }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("in-place population invalidates the empty-index tombstones") {
    val spark = TestSpark.spark
    import spark.implicits._
    TestSpark.plantParquetFileInto(
      Seq.empty[(Long, Seq[Float], Int)]
        .toDF("vec_id", "embedding", "label"),
      dir, "embeddings.parquet")
    // memoize the tombstones (ivf + dim + sem) from the empty table
    assert(SparkEntry.queries("ann_ivf_top1")(spark, dir.toString)
      .count() === 0L)
    assert(SparkEntry.queries("ann_lsh_top1")(spark, dir.toString)
      .count() === 0L)
    assert(SparkEntry.queries("dedup_semantic")(spark, dir.toString)
      .count() === 0L)

    // refresh IN PLACE — deliberately NO invalidateIndexCaches call:
    // the source fingerprint (length+mtime) is what must catch it
    TestSpark.plantParquetFileInto(populated(), dir, "embeddings.parquet")
    val ivf = SparkEntry.queries("ann_ivf_top1")(spark, dir.toString)
    assert(ivf.count() > 0L,
      "stale EMPTY ivf tombstone served after an in-place refresh")
    val lsh = SparkEntry.queries("ann_lsh_top1")(spark, dir.toString)
    assert(lsh.count() > 0L,
      "stale dim placeholder served after an in-place refresh")
    val sem = SparkEntry.queries("dedup_semantic")(spark, dir.toString)
    assert(sem.count() > 0L,
      "stale EMPTY semantic tombstone served after an in-place refresh")
    // and not just non-empty: every planted identical twin must find
    // its original at sim exactly 1.0 through the rebuilt IVF index
    val top = ivf.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    (0 until 4).foreach { i =>
      val (nn, sim) = top(100L + i)
      assert(nn === i.toLong && sim === 1.0,
        s"twin ${100 + i} should top-1 its identical original: got ($nn, $sim)")
    }
  }
}
