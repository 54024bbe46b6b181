package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Acceptance bound for [[Dedup.dedupComponentsLsh]] — the LSH-seeded
  * connected-components variant the 100 TB pipeline runs instead of the
  * exact shingle self-join. Two sides pin it to the exact fixpoint:
  *
  *  - RECALL: the only way the LSH labeling can differ from the exact
  *    one is a missed candidate edge (band collision failure), which
  *    SPLITS a component — so the metric is co-membership recall: of
  *    all doc pairs the exact fixpoint co-labels, the fraction the LSH
  *    fixpoint also co-labels. With r=2/b=16 at the corpus's planted
  *    near-dup similarities (≥0.8) the per-edge miss probability is
  *    ≈10⁻⁷; the bound is ≥ 0.95 to stay refresh-robust.
  *  - PRECISION IS EXACT, not a bound: every LSH candidate is verified
  *    with exact Jaccard before becoming an edge, so LSH edges are a
  *    subset of the exact near-dup edges and the LSH components REFINE
  *    the exact components — asserted as: every LSH-co-labeled pair is
  *    exact-co-labeled. A false merge would be an engine bug, never
  *    hash-family luck.
  */
class ComponentsLshRecallSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // metric helpers live next to the operator (Dedup.componentLabelMap /
  // coMembershipStats) — ONE definition for this spec and ScaleProbe;
  // pair COUNTS from the contingency table, never enumerated pair sets
  // (a mega-component would OOM the driver enumerating them; ADVICE r12)
  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Dedup.componentLabelMap(df)

  private lazy val exact = labels(Dedup.dedupComponents(spark, TestSpark.Sf001))
  private lazy val lsh = labels(Dedup.dedupComponentsLsh(spark, TestSpark.Sf001))

  test("co-membership recall vs the exact fixpoint >= 0.95") {
    val (exactPairs, recalled, _) = Dedup.coMembershipStats(exact, lsh)
    assert(exactPairs > 0,
      "corpus has no multi-doc near-dup component — recall is vacuous; " +
        "the fixture should plant near-dups")
    val recall = recalled.toDouble / exactPairs
    assert(recall >= 0.95,
      s"component co-membership recall $recall < 0.95 " +
        s"($recalled of $exactPairs exact co-pairs recovered)")
  }

  test("LSH components refine the exact components (no false merges)") {
    val (_, _, falseMerges) = Dedup.coMembershipStats(exact, lsh)
    assert(falseMerges === 0L,
      s"LSH fixpoint co-labeled $falseMerges pair(s) the exact fixpoint " +
        "separates — verified-candidate edges must be a subset of exact " +
        "near-dup edges")
  }

  test("node coverage: the LSH labeling covers exactly the docs in LSH edges, all within the exact node set") {
    // Every labeled node labels itself or a smaller co-member; labels
    // come from the node universe of the edge list. A node the exact
    // path labels but LSH doesn't is a (counted) recall loss, not an
    // error; the reverse would be a phantom edge.
    val phantom = lsh.keySet -- exact.keySet
    assert(phantom.isEmpty,
      s"LSH fixpoint labeled docs the exact edge set never saw: ${phantom.take(5)}")
  }

  test("guarded label load: the fallback recompute serves the same labels as the scratch read") {
    // Dedup.lshComponentLabels is the load behind ScaleProbe's recall
    // receipt: read the fixed scratch artifact when present, recompute
    // the fixpoint when absent. Exercise BOTH arms against the same
    // dataset — first force the fallback by deleting the artifact,
    // then the read arm against what the fallback re-wrote — and pin
    // them label-identical (the fixpoint is deterministic, so a probe
    // that loses its scratch file must still report the same recall).
    val reference = lsh // materializes the labeling (and the artifact)
    val path = new org.apache.hadoop.fs.Path(
      graft.sources.Formats.tmp("dedup_cc_lsh", TestSpark.Sf001))
    val fs = path.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(path, true),
      "could not delete the scratch artifact — the fallback arm would " +
        "go unexercised and the test would pass vacuously")
    val recomputed =
      labels(Dedup.lshComponentLabels(spark, TestSpark.Sf001))
    assert(recomputed === reference,
      "fallback recompute diverged from the labeling the scratch read served")
    assert(fs.exists(path),
      "fallback recompute did not restore the scratch artifact")
    val reread = labels(Dedup.lshComponentLabels(spark, TestSpark.Sf001))
    assert(reread === reference,
      "read arm diverged from the fallback's labels on the same artifact")
  }
}
