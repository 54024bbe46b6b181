package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins the freshness contract of [[Dedup.lshComponentLabels]]'s guarded
  * read arm: the `dedup_cc_lsh` scratch artifact is a PERSISTENT path
  * (java.io.tmpdir outlives the JVM) keyed only by the dataset dir, so
  * after an IN-PLACE testdata refresh a bare existence check would keep
  * serving labels computed from the pre-refresh corpus — ScaleProbe's
  * recall receipt would then compare fresh exact labels against stale
  * LSH ones. The artifact's marker carries the source parquet's
  * fingerprint (same contract as fmtBinary's `_FIXTURE_OK`); this spec
  * refreshes documents.parquet in place and asserts the guarded read
  * recomputes instead of serving the stale labels.
  */
class LshLabelFreshnessSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  /** Two near-dup pairs over disjoint vocabularies; `gen` swaps the
    * doc ids between generations so stale labels are detectable. */
  private def corpus(gen: Int) = {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = gen * 100L
    Seq(
      (base + 1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (base + 2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (base + 3L, "one two three four five six seven eight"),
      (base + 4L, "one two three four five six seven nine"))
      .map { case (id, text) =>
        (id, text, "en", "planted", text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private lazy val dir = Files.createTempDirectory("graft_lsh_fresh")

  override def afterAll(): Unit = {
    val conf = TestSpark.spark.sparkContext.hadoopConfiguration
    // the data dir AND the scratch artifact it spawned — the scratch key
    // embeds this run's unique temp path, so no later run can ever reuse
    // it and it would accumulate as dead state
    for (d <- Seq(dir.toString,
        graft.sources.Formats.tmp("dedup_cc_lsh", dir.toString))) {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).delete(p, true)
    }
    super.afterAll()
  }

  test("an in-place documents refresh invalidates the persisted labels") {
    val spark = TestSpark.spark
    TestSpark.plantParquetFileInto(corpus(0), dir, "documents.parquet")
    val ids0 = Dedup.lshComponentLabels(spark, dir.toString)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids0 === Set(1L, 2L, 3L, 4L), s"generation-0 labels wrong: $ids0")

    // refresh IN PLACE: same path, different corpus (and different
    // length/mtime, which is what the fingerprint watches)
    TestSpark.plantParquetFileInto(corpus(1), dir, "documents.parquet")
    val ids1 = Dedup.lshComponentLabels(spark, dir.toString)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids1 === Set(101L, 102L, 103L, 104L),
      s"stale labels served after an in-place refresh: $ids1")
  }
}
