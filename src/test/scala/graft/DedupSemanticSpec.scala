package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Bounds for `dedup_semantic`, the cluster-then-prune twin of the
  * exact all-pairs embedding dedup (`dedup_embedding_cosine`). The
  * k-means initialization makes the output engine-specific (rows-only
  * at the oracle gate), so this spec pins the two properties that make
  * the approximation trustworthy:
  *
  *  1. PRECISION IS EXACTLY 1: every emitted pair appears in the exact
  *     twin's output with a bit-identical sim — the in-cluster rerank
  *     computes the same integer dot / IEEE divide as the brute-force
  *     scan, so clustering can only MISS pairs, never invent them.
  *  2. RECALL has a measured floor. The corpus is deliberately
  *     isotropic (every qualifying pair sits at cos 0.35–0.5 — no
  *     cluster structure to exploit; see the operator doc), so the
  *     floor is the honest adversarial-corner number, not the ≈1 a
  *     real corpus's cos ≥ 0.9 duplicates would give.
  */
class DedupSemanticSpec extends AnyFunSuite {

  import TestSpark.{spark, Sf0001 => dir}

  private lazy val exact: Map[(Long, Long), Double] =
    Similarity.annPairsBruteforce(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

  private lazy val semantic: Map[(Long, Long), Double] =
    Similarity.dedupSemantic(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

  test("semantic pairs are a subset of the exact twin with identical sims") {
    assert(semantic.nonEmpty)
    semantic.foreach { case (pair, sim) =>
      assert(exact.contains(pair), s"pair $pair not in exact output")
      assert(exact(pair) === sim, s"sim drift on $pair")
    }
  }

  test("recall of exact near-dup pairs clears the measured floor") {
    val recall = semantic.size.toDouble / exact.size
    assert(recall >= 0.85, f"recall $recall%.3f below floor 0.85")
  }
}
