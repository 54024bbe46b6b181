package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats

/** Pins the r18 data-ingest sweep's behavioral fixes (VERDICT r17 task 1):
  *
  *  1. [[Formats.sourceFingerprint]] walks the table dir RECURSIVELY — at
  *     the documented partitioned layout a one-level listing fingerprints
  *     directory entries (length 0, parent mtime), so an in-place leaf
  *     refresh kept serving stale artifacts; and an EMPTY table dir must
  *     fingerprint stably instead of crashing `.max`.
  *  2. The Lines connector's hidden-file convention applies to every path
  *     SEGMENT under the root, not just the leaf name — a multi-level
  *     glob crossing a `_temporary`/`.staging` tree must not surface a
  *     concurrent writer's in-flight files as data.
  *  3. [[Formats.fmtBinary]]'s fixture build is serialized per scratch
  *     path: concurrent same-dataset callers must both see the complete
  *     fixture (pre-fix, one caller could commit the marker while the
  *     other's delete/rebuild was mid-flight — silent wrong rows).
  */
class IngestSweepSpec extends AnyFunSuite {

  test("sourceFingerprint sees nested leaf refreshes and survives empty dirs") {
    val spark = TestSpark.spark
    val conf = spark.sessionState.newHadoopConf()
    val root = Files.createDirectories(
      Paths.get("target/scratch/ingestsweep_fp")).toString

    // partitioned layout: documents.parquet/lang=en/<leaf>
    val leafDir = Files.createDirectories(
      Paths.get(s"$root/documents.parquet/lang=en"))
    val leaf = leafDir.resolve("part-00000")
    Files.write(leaf, "payload".getBytes)
    val before = Formats.sourceFingerprint(conf, root, "documents")
    // in-place leaf refresh: same length, newer mtime, parent dir mtimes
    // untouched — exactly the refresh a dir-entry fingerprint misses
    Files.setLastModifiedTime(leaf,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(leaf).toMillis + 10000))
    val after = Formats.sourceFingerprint(conf, root, "documents")
    assert(before != after,
      "a nested leaf's mtime bump must change the fingerprint")

    val emptyRoot = Files.createDirectories(
      Paths.get("target/scratch/ingestsweep_fp_empty")).toString
    Files.createDirectories(Paths.get(s"$emptyRoot/documents.parquet"))
    val e = Formats.sourceFingerprint(conf, emptyRoot, "documents")
    assert(e.contains("len=0"), s"empty dir must fingerprint stably, got $e")
  }

  test("lines connector skips files under hidden directory segments") {
    val spark = TestSpark.spark
    val root = Files.createDirectories(
      Paths.get("target/scratch/ingestsweep_hidden")).toString
    Files.createDirectories(Paths.get(s"$root/ok"))
    Files.write(Paths.get(s"$root/ok/a.txt"), "visible\n".getBytes)
    // a concurrent built-in writer's staging tree: same depth as the
    // data dirs, so the glob matches it — only the segment rule saves us
    Files.createDirectories(Paths.get(s"$root/_temporary"))
    Files.write(Paths.get(s"$root/_temporary/b.txt"), "inflight\n".getBytes)
    Files.createDirectories(Paths.get(s"$root/.staging"))
    Files.write(Paths.get(s"$root/.staging/c.txt"), "partial\n".getBytes)

    val rows = spark.read.format("graft.sources.LinesDataSource")
      .option("path", root).option("pathGlobFilter", "*/*.txt").load()
      .collect()
    assert(rows.map(_.getString(2)).toSeq == Seq("visible"),
      s"hidden-segment files leaked: ${rows.mkString(", ")}")
  }

  test("Verify's startup scrub deletes the manifest and attempted dirs only") {
    val out = Files.createDirectories(
      Paths.get("target/scratch/ingestsweep_scrub")).toString
    Files.writeString(Paths.get(s"$out/query_names.json"), """["a","b"]""")
    Files.createDirectories(Paths.get(s"$out/a"))
    Files.write(Paths.get(s"$out/a/part-0.parquet"), Array[Byte](1))
    Files.createDirectories(Paths.get(s"$out/b"))
    Files.write(Paths.get(s"$out/b/part-0.parquet"), Array[Byte](2))
    Verify.scrubStale(out, Seq("a"))
    assert(!Files.exists(Paths.get(s"$out/query_names.json")),
      "stale manifest must not survive startup — a hard death would pair " +
        "it with stale dirs as a coherent all-PASS story")
    assert(!Files.exists(Paths.get(s"$out/a")),
      "attempted name's stale dir must be scrubbed before the run")
    assert(Files.exists(Paths.get(s"$out/b/part-0.parquet")),
      "unattempted dirs are the incremental workflow — must survive")
    // ADVICE r18: the scrub must leave a run-in-progress marker so a
    // hard death mid-battery (no manifest, unattempted stale dirs
    // surviving) hard-fails oracle_check instead of comparing the
    // stale dirs as PASS behind a stderr NOTE. A COMPLETED run deletes
    // it right after the manifest lands (edge probe pass 1 covers that
    // side end-to-end: oracle_check would hard-fail if it survived).
    assert(Files.exists(Paths.get(s"$out/${Verify.RunningMarker}")),
      "scrub must write the run-in-progress marker before any query runs")

    // the undeletable-dir degradation: sentinelIfUndeleted poisons a dir
    // that survived deletion so oracle_check FAILs it instead of
    // comparing its stale parquet as a PASS
    val undead = Files.createDirectories(
      Paths.get("target/scratch/ingestsweep_scrub_undead")).toFile
    Verify.sentinelIfUndeleted(undead)
    assert(Files.exists(undead.toPath.resolve("_GRAFT_STALE")),
      "a surviving dir must carry the poison sentinel")
  }

  test("concurrent fmtBinary callers both see the complete fixture") {
    val spark = TestSpark.spark
    // private data copy, like ScratchMemoSpec: forcing a rebuild on the
    // SHARED testdata dir would race other suites' fixture reads
    val dir = Files.createDirectories(
      Paths.get("target/scratch/ingestsweep_bin")).toString
    Files.copy(Paths.get(s"${TestSpark.Sf0001}/documents.parquet"),
      Paths.get(s"$dir/documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val expected = graft.engine.Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") <
        Formats.BinaryFixtureDocs).count()
    assert(expected > 0, "fixture input must be non-empty")

    // force a rebuild so both threads enter the marker-check/build path
    val fixture = new java.io.File(Formats.tmp("docs_bin", dir))
    def deleteAll(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteAll))
      f.delete(); ()
    }
    deleteAll(fixture)

    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map(_ => new Thread(() =>
      try counts.add(Formats.fmtBinary(spark, dir).count())
      catch { case t: Throwable => errors.add(t); () }))
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent fmtBinary failed: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    assert(counts.asScala.toSeq == Seq(expected, expected),
      s"both callers must count the full fixture, got ${counts.asScala.toSeq}")
  }
}
