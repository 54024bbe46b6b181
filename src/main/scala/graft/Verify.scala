package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query subset — builder-side
    // iteration aid; the driver always runs the full set]
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // a typo'd name in the subset filter would otherwise run NOTHING
    // silently (filter match) — and the manifest would hide it too,
    // since only matched names are recorded as attempted. Hard error,
    // not a warning: a fully typo'd filter would still write an empty
    // manifest and exit 0, and oracle_check would read "0 pass, 0
    // fail" as green (review r17). The driver never passes a filter,
    // so the gate path cannot hit this.
    only.foreach(o => (o -- SparkEntry.queries.keySet).toSeq.sorted match {
      case Seq() => ()
      case bad => sys.error(
        s"unknown query name(s) in filter: ${bad.mkString(", ")}")
    })
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // legacy annotated INT64 TIMESTAMP(NANOS) testdata encodings scan-fail
      // without this flag; set once at session build (never in accessors)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val attempted = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    scrubStale(outDir, attempted.keys)
    var failed = 0
    attempted.foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce narrows the whole
      // final stage to parallelism 1 when no exchange sits between the
      // query's last operator and the write — at the sf10 oracle hold a
      // join+filter tail (array_intersect verify, hours of work) ran in
      // ONE task (r20, observed via jstack). repartition inserts a
      // shuffle boundary so the query keeps its parallelism and only
      // the single-file write is serial; row order is irrelevant — the
      // oracle compare canonically sorts.
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // class name too: getMessage is null for bare NPEs and the like
        System.err.println(
          s"[verify] $name failed: ${e.getClass.getName}: ${e.getMessage}")
        failed += 1
        // delete any result dir left by an EARLIER run into the same
        // outDir (the documented builder workflow reuses target/
        // verify_sf001): without this, a query that crashes before its
        // write leaves run N-1's data where the manifest check finds a
        // dir and oracle_check compares STALE results as PASS — the
        // same green-when-not-green class the manifest closed
        // (review r17). A crash mid-write is already loud: overwrite
        // mode deletes the target first, so the partial dir fails the
        // compare.
        val d = new java.io.File(s"$outDir/$name")
        deleteRecursively(d)
        sentinelIfUndeleted(d)
      }
    }
    // JSON string escape — the shared graft.Json.str (one implementation
    // for every artifact writer; review r16): a tab or CR in
    // builder-authored SQL would otherwise make the driver's json.load
    // fail and silently zero the round's correctness.
    def q(s: String): String = Json.str(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Manifest of the names THIS run attempted (post-`only` filter):
    // oracle_check fails any attempted query with no result dir. Without
    // it, a query that crashed above simply has no dir, and a dir-driven
    // compare reports one fewer PASS with exit 0 — green when not green
    // (review r17). Exit stays 0 on failures: the driver's own gate reads
    // the dirs + oracle_sql.json and must still get its per-query compare.
    Files.writeString(Paths.get(s"$outDir/query_names.json"),
      attempted.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    // manifest written = the run COMPLETED its battery (failures are
    // per-query and recorded); only now may the in-progress marker go
    Files.deleteIfExists(Paths.get(s"$outDir/$RunningMarker"))
    System.out.println(
      s"[verify-summary] ${attempted.size} queries attempted, $failed failed")
    spark.stop()
  }

  /** Startup scrub (ADVICE r17): the per-query crash path can only clean
    * up after crashes it SEES — a hard JVM death (OOM/kill) mid-battery
    * in a REUSED outDir would leave run N-1's manifest and result dirs
    * as a coherent, stale, all-PASS story for any caller that ignores
    * the missing summary line. Drop the old manifest, then every
    * attempted name's stale dir, BEFORE running anything: after this
    * point a death at any instant leaves either no manifest
    * (oracle_check reports detection unavailable on stderr) or result
    * dirs only for queries THIS run actually completed. Unattempted
    * names' dirs survive — the documented incremental subset workflow. */
  private[graft] def scrubStale(outDir: String, attempted: Iterable[String]): Unit = {
    Files.deleteIfExists(Paths.get(s"$outDir/query_names.json"))
    // Run-in-progress marker (ADVICE r18): scrub deletes the manifest,
    // so a hard JVM death during a SUBSET run into a reused outDir used
    // to leave no manifest while UNATTEMPTED names' dirs from an earlier
    // broader run survived — oracle_check's dir-driven loop then
    // compared those stale dirs as PASS with only a stderr NOTE. The
    // marker is written before any scrubbing and removed only at the
    // very end of a completed run (right after the manifest lands), so
    // a death at ANY instant leaves it in place and oracle_check fails
    // the whole outDir loud ("run died mid-battery") instead of
    // narrating around the hole.
    Files.writeString(Paths.get(s"$outDir/$RunningMarker"),
      "Verify run in progress; if this file survives the run died mid-battery " +
        "and every result dir here is suspect — oracle_check must FAIL loud")
    attempted.foreach { name =>
      val d = new java.io.File(s"$outDir/$name")
      if (d.exists()) { deleteRecursively(d); sentinelIfUndeleted(d) }
    }
  }

  /** Name of the run-in-progress marker scrubStale writes and a
    * completed run removes; oracle_check treats its presence as a
    * mid-battery death and fails the whole compare. */
  private[graft] val RunningMarker = "_GRAFT_RUNNING"

  /** Recursive delete of a crashed query's result dir (parquet part
    * files — never follows links). A surviving dir would serve the
    * PREVIOUS run's (typically hash-matching) results as a spurious
    * PASS, so an undeletable entry is reported loudly rather than
    * swallowed. */
  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    if (!f.delete() && f.exists())
      System.err.println(s"[verify] WARNING: could not delete stale $f " +
        "— oracle_check may compare the previous run's data for this query")
  }

  /** Poison marker for a stale dir that would not delete (ADVICE r17):
    * oracle_check FAILS any result dir containing `_GRAFT_STALE`, so the
    * rare undeletable-path case degrades to a loud per-query FAIL instead
    * of a silent stale PASS gated only by a stderr warning. Best-effort —
    * if even the sentinel write fails (truly read-only dir), the stderr
    * warning above already fired, and the parquet glob will read whatever
    * is left rather than nothing, so the warning is the last line of
    * defense there. */
  private[graft] def sentinelIfUndeleted(f: java.io.File): Unit =
    if (f.exists())
      try Files.writeString(Paths.get(f.getPath, "_GRAFT_STALE"),
        "stale result dir Verify could not delete; oracle_check must FAIL this query")
      catch { case _: Throwable => () }
}
