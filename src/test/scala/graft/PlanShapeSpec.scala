package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical plan-shape regression gate (VERDICT r18 task 3).
  *
  * PLANS.md is regenerated each round and, until now, compared by eye
  * ("zero structural movement"). This spec pins the LOAD-BEARING
  * operator skeletons of the headline queries so a silent plan
  * regression — an extra shuffle, a lost TakeOrderedAndProject, an
  * all-pairs join sneaking into a bucketed dedup — fails a test
  * instead of relying on the eyeball diff. ProfileApproxSpec already
  * pins maint_profile/maint_profile_approx this way (zero Sort; Expand
  * only in the exact twin); this spec extends the idiom to the other
  * queries the r18 verdict named. Assertions run on the INITIAL
  * physical plan (AQE's isFinalPlan=false print): that is what
  * PLANS.md documents and it is deterministic for fixed testdata.
  *
  * What is deliberately NOT pinned: join-strategy selection that
  * depends on table sizes (broadcast vs SMJ can legitimately flip with
  * scale), exact node counts in the big dedup DAG (refactors move
  * Projects around), and anything AQE rewrites at runtime.
  */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString

  /** Shuffle exchanges only — BroadcastExchange is a different (and
    * usually desirable) animal, so a lookbehind excludes it. */
  private def shuffles(p: String): Int =
    "(?<!Broadcast)Exchange ".r.findAllIn(p).length

  test("the shuffle counter itself sees an injected exchange") {
    // the red-flag demonstration the gate asks for: if this helper ever
    // stops seeing Exchange nodes (a Spark print-format change), every
    // "exactly N shuffles" pin below would green-light vacuously
    val base = SparkEntry.queries("wordcount")(spark, TestSpark.Sf0001)
    val injected = base.repartition(7)
      .queryExecution.executedPlan.toString
    assert(shuffles(injected) === 2,
      s"injected repartition not counted as a second shuffle:\n$injected")
  }

  test("wordcount: Scan→Generate→Filter→partial agg→ONE exchange→final agg, native tokenizer") {
    val p = plan("wordcount")
    assert(shuffles(p) === 1,
      s"wordcount must shuffle exactly once (partial/final count split):\n$p")
    assert(p.contains("graft_tokens"),
      "tokenization left the native codegen expression — a UDF here " +
        "breaks whole-stage codegen on the hot path")
    assert("HashAggregate".r.findAllIn(p).length === 2,
      s"expected partial+final HashAggregate pair:\n$p")
    assert(!p.contains("Sort ["), s"wordcount never needs a sort:\n$p")
    // top-down operator order: final agg above the exchange, partial
    // agg above Generate/Scan below it
    val idx = Seq("HashAggregate", "Exchange hashpartitioning",
      "Generate", "FileScan parquet").map(s => (s, p.indexOf(s)))
    idx.foreach { case (s, i) => assert(i >= 0, s"missing $s:\n$p") }
    assert(idx.map(_._2) === idx.map(_._2).sorted,
      s"operator skeleton out of order (expected agg→exchange→generate→scan):\n$p")
  }

  test("q_tpch_q3: filters pushed to scans, top-k via TakeOrderedAndProject, one agg shuffle") {
    val p = plan("q_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"),
      s"LIMIT+ORDER BY must plan as top-k, not a global Sort:\n$p")
    assert(!p.contains("Sort ["),
      s"a Sort operator means the top-k collapsed to a global sort:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"the segment predicate must reach the customer scan as a " +
        s"PushedFilter, not evaluate post-scan:\n$p")
    assert(shuffles(p) === 1,
      s"q3's only shuffle is the aggregation (joins broadcast at this " +
        s"scale; a second exchange means a join lost its broadcast):\n$p")
  }

  test("dedup_minhash_lsh: bucketed — no cartesian/BNLJ all-pairs shape anywhere") {
    val p = plan("dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the LSH pipeline's candidate join degenerated to an all-pairs " +
        s"shape — the exact scale failure banding exists to avoid:\n$p")
    assert(p.contains("Generate"),
      s"banding explode (Generate) missing — signatures are not being " +
        s"banded before the bucket join:\n$p")
  }

  test("text_inverted_index: ONE exchange — collect_set partial agg is the map-side distinct") {
    val p = plan("text_inverted_index")
    assert(shuffles(p) === 1,
      s"inverted index must build in one shuffle (partial collect_set " +
        s"unions per-partition; a second exchange means a separate " +
        s"distinct pass reappeared):\n$p")
    assert("ObjectHashAggregate".r.findAllIn(p).length === 2,
      s"expected partial+final ObjectHashAggregate pair for collect_set:\n$p")
    assert(!p.contains("Sort ["), s"no sort in the index build:\n$p")
  }

  test("doc_pack_shards: prefix-sum stays in the RDD pipeline — no SQL-layer shuffle or window") {
    val p = plan("doc_pack_shards")
    // the tuple RDD surfaces through toDF as an object scan
    // (`Scan[obj#..]` + SerializeFromObject), not `Scan ExistingRDD`
    assert(p.contains("Scan[obj"),
      s"packing must surface as an RDD object scan (two-phase prefix sum):\n$p")
    assert(shuffles(p) === 0,
      s"a SQL-layer exchange on top of the packed RDD is a second " +
        s"shuffle the design already paid for inside the pipeline:\n$p")
    assert(!p.contains("Window"),
      s"a Window here is the single-partition global running-sum " +
        s"scale-killer docPackShards exists to replace:\n$p")
  }

  test("events_q4_shape: EXISTS decorrelates to a semi join, ts window pushed to BOTH scans") {
    val p = plan("events_q4_shape")
    assert(p.contains("LeftSemi"),
      s"the correlated EXISTS must decorrelate to a left-semi join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"EXISTS fell back to an all-pairs join shape:\n$p")
    // the child repeats the window explicitly (the operator doc's 100 TB
    // point): BOTH event scans must carry it in PushedFilters
    assert("GreaterThanOrEqual\\(ts,2024-01-08".r.findAllIn(p).length === 2,
      s"the ts window must reach BOTH scans as a pushed filter — " +
        s"without it the EXISTS side reads all of history:\n$p")
  }

  test("events_q12_shape: single scan, derived-interval filter, ONE exchange on the group key") {
    val p = plan("events_q12_shape")
    assert(shuffles(p) === 1,
      s"q12 shape is scan→filter→partial agg→ONE exchange→final agg:\n$p")
    assert("HashAggregate".r.findAllIn(p).length === 2,
      s"expected partial+final HashAggregate pair (both CASE sums must " +
        s"combine map-side):\n$p")
    assert(!p.contains("Sort ["), s"no sort in a hash aggregation:\n$p")
    assert(!p.contains("Join"), s"q12 shape reads ONE table:\n$p")
  }
}
