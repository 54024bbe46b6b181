package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup.coMembershipStats

/** Property pin for [[graft.operators.Dedup.coMembershipStats]] — the
  * contingency-table pair COUNTER that replaced the old
  * enumerate-both-pair-sets-and-intersect metric (round 13; it is the
  * sole scorer behind ComponentsLshRecallSpec's recall/false-merge
  * bounds and ScaleProbe's two-scale recall receipts). Its equivalence
  * argument was a doc comment; this spec makes it an assertion by
  * re-deriving all three counts the definitional way — enumerate every
  * unordered node pair and classify it — over random labelings whose
  * domains deliberately only PARTIALLY overlap, so the edge case the
  * doc calls out (a candidate co-pair touching a node the reference
  * never labeled must count as a false merge, never a hit) is hit
  * constantly, alongside label collisions, singleton components, and
  * empty maps. Deterministic ScalaCheck sampling via the shared
  * [[TestSpark.sample]] helper: fixed seeds, no Spark session needed.
  */
class CoMembershipStatsPropSpec extends AnyFunSuite {

  import TestSpark.sample

  /** The definitional metric: enumerate unordered pairs, classify each. */
  private def bruteForce(
      reference: Map[Long, Long], candidate: Map[Long, Long]): (Long, Long, Long) = {
    def coPairs(m: Map[Long, Long]): Set[(Long, Long)] = {
      val ks = m.keys.toSeq.sorted
      (for {
        i <- ks.indices; j <- (i + 1) until ks.size
        if m(ks(i)) == m(ks(j))
      } yield (ks(i), ks(j))).toSet
    }
    val refPairs = coPairs(reference)
    val candPairs = coPairs(candidate)
    val hits = refPairs intersect candPairs
    (refPairs.size.toLong, hits.size.toLong, (candPairs -- hits).size.toLong)
  }

  // Node ids from a 16-element universe and labels from a 5-element one:
  // small enough that every sampled pair of labelings shares SOME nodes,
  // misses others on each side, and packs multi-member components.
  private val labeling: Gen[Map[Long, Long]] = for {
    n <- Gen.choose(0, 12)
    nodes <- Gen.pick(n, 0L until 16L)
    labels <- Gen.listOfN(n, Gen.choose(0L, 4L))
  } yield nodes.zip(labels).toMap

  test("property: contingency counts == brute-force pair enumeration on partially-overlapping labelings") {
    val cases = sample(Gen.zip(labeling, labeling), 500)
    // the falseMerge edge case must actually occur in the sample, or
    // the property is vacuous on the one branch that motivated it —
    // and "occur" means an actual candidate CO-PAIR touching a node
    // the reference never labeled (a candidate-only SINGLETON pairs
    // with nothing and exercises no branch at all)
    var unlabeledCoPairSeen = false
    cases.foreach { case (ref, cand) =>
      val fast = coMembershipStats(ref, cand)
      val slow = bruteForce(ref, cand)
      assert(fast === slow,
        s"contingency ($fast) != enumeration ($slow) for ref=$ref cand=$cand")
      val coPairTouchesUnlabeled = cand.groupBy(_._2).values.exists { cell =>
        cell.size > 1 && cell.keysIterator.exists(!ref.contains(_))
      }
      if (coPairTouchesUnlabeled) unlabeledCoPairSeen = true
    }
    assert(unlabeledCoPairSeen,
      "sample never produced a candidate co-pair touching an unlabeled-" +
        "in-reference node — the false-merge branch the doc calls out " +
        "went unexercised")
  }

  test("directed corners: empty, identical, disjoint-domain, all-one-label") {
    val allOne = (0L until 6L).map(_ -> 7L).toMap
    val split = (0L until 6L).map(k => k -> (k % 2)).toMap
    val shifted = (6L until 12L).map(_ -> 7L).toMap
    for {
      ref <- Seq(Map.empty[Long, Long], allOne, split, shifted)
      cand <- Seq(Map.empty[Long, Long], allOne, split, shifted)
    } assert(coMembershipStats(ref, cand) === bruteForce(ref, cand),
      s"mismatch for ref=$ref cand=$cand")
    // and the self-evident identities the metric's consumers rely on:
    // a labeling scored against itself recalls everything, merges nothing
    val (tot, hit, fm) = coMembershipStats(allOne, allOne)
    assert(tot === 15L && hit === 15L && fm === 0L)
    // disjoint domains: nothing recalled, every candidate co-pair a merge
    val (tot2, hit2, fm2) = coMembershipStats(allOne, shifted)
    assert(tot2 === 15L && hit2 === 0L && fm2 === 15L)
  }
}
