package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-21 optimization-plan properties — each one a "this
  * exchange subtree is shared" invariant that runtime exchange reuse
  * depends on. Reuse dedupes by CANONICAL plan equality, so the pin is
  * exactly that: every shuffle exchange a query's heavy expression flows
  * through must canonicalize to ONE plan. A regression (a consumer
  * pushing a divergent filter/projection below its copy of the exchange)
  * silently multiplies full corpus passes — the r21 before-plans showed
  * dedup_minhash_lsh paying the tokenize+shingle pipeline 3× and
  * dedup_fuzzy_names running the customer distinct 4× exactly that way.
  */
class R21PlanOptimizationsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** All shuffle exchanges in the (pre-AQE) physical plan whose subtree
    * contains `marker`, grouped by canonicalized plan. */
  private def markedExchangeGroups(name: String, marker: String): Seq[Seq[String]] = {
    val plan = SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan
    val ex = plan.collect {
      case e: ShuffleExchangeExec if e.child.toString.contains(marker) => e
    }
    ex.groupBy(_.canonicalized).values.map(_.map(_.nodeName)).toSeq
  }

  test("dedup_minhash_lsh: every shingle-bearing exchange is ONE canonical plan (one tokenize+shingle pass at runtime)") {
    val groups = markedExchangeGroups("dedup_minhash_lsh", "graft_shingles")
    val n = groups.map(_.size).sum
    assert(n >= 3, s"expected the bands/capped-index/hot-df consumers to each read a shingle exchange, saw $n")
    assert(groups.size === 1,
      s"shingle exchanges no longer canonicalize to one plan — runtime reuse " +
        s"is broken and the corpus pays ${groups.size} tokenize+shingle passes: $groups")
  }

  test("dedup_minhash_lsh: the shingle pipeline never re-inlines into the parquet scan as a filter") {
    val plan = SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
      .queryExecution.sparkPlan.toString
    // the r21 before-plan carried `size(coalesce(array_distinct(
    // graft_shingles(...))))>0` as a per-row SCAN filter (the pushable
    // empty-doc filter) — the nulled-band-key form must keep scans clean
    val scanFilters = "DataFilters: \\[[^\\]]*graft_shingles".r
    assert(scanFilters.findFirstIn(plan).isEmpty,
      s"a shingle expression reached a scan filter (pushdown re-inline):\n$plan")
  }

  test("dedup_fuzzy_names: all four name-distinct barrier subtrees are ONE canonical plan") {
    // at test scale the tiny customer file scans as a single partition and
    // EnsureRequirements inserts no exchange below the distinct — so the
    // pin targets the struct-explode BARRIER subtrees (barrier + distinct
    // + scan): canonical equality there is exactly what makes the distinct
    // exchange reusable at bench/production scale, where it does exist
    val plan = SparkEntry.queries("dedup_fuzzy_names")(spark, dir)
      .queryExecution.sparkPlan
    val barriers = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec
          if g.generator.toString.contains("array(struct(name") => g
    }
    assert(barriers.size >= 4,
      s"expected 4 consumers of the name-distinct barrier, saw ${barriers.size}")
    assert(barriers.groupBy(_.canonicalized).size === 1,
      s"name-distinct barrier subtrees no longer canonicalize to one plan " +
        s"(a consumer pushed a filter below the barrier):\n$plan")
  }

  test("text_bm25: nothing token-shaped shuffles — the one exchange carries (doc_id, dl, tf) numbers only") {
    val qe = SparkEntry.queries("text_bm25")(spark, dir).queryExecution
    val plan = qe.sparkPlan
    val tokenized = plan.collect {
      case e: ShuffleExchangeExec if e.child.toString.contains("graft_tokens") => e
    }
    // the per-doc projection exchange computes the token array BELOW it —
    // but its OUTPUT must be the five numeric columns, never the tokens
    tokenized.foreach { e =>
      val out = e.output.map(_.dataType.simpleString)
      assert(!out.exists(_.contains("array")),
        s"a token/array column crosses an exchange in text_bm25: ${e.output}")
    }
    // and the tokenizer appears at exactly one canonical exchange
    assert(tokenized.groupBy(_.canonicalized).size <= 1,
      "multiple distinct tokenizing exchanges in text_bm25")
  }

  test("text_lm_score: the heavy Generate feeds ONE canonical exchange group") {
    val groups = markedExchangeGroups("text_lm_score", "graft_tokens")
    assert(groups.size <= 1,
      s"text_lm_score: tokenizing exchanges diverged into ${groups.size} canonical plans: $groups")
  }

  test("text_tfidf: at most TWO tokenizing branches (tf + countDistinct df) — the r22-measured shape") {
    // r22 REVERTED the r21 df-from-tf single-pass form: the two-branch
    // countDistinct shape measured faster at sf0.1 AND sf1 (ProbeR22a;
    // OPTIMIZATION_r22.md §2) because the second tokenize pass runs as
    // an independent parallel branch instead of serializing behind tf's
    // exchange. Pin the branch count at ≤ 2 so an accidental THIRD
    // tokenize pass (the pre-r21 bug class) still fails loud. (At this
    // fixture's single-partition scale the planner inserts no exchange
    // at all — 0 groups — so the pin is an upper bound, not equality;
    // the Generate count below is the scale-independent branch witness.)
    val groups = markedExchangeGroups("text_tfidf", "graft_tokens")
    assert(groups.size <= 2,
      s"text_tfidf: expected at most the tf + df tokenizing branches (2 " +
        s"canonical exchange groups), got ${groups.size}: $groups")
    val plan = SparkEntry.queries("text_tfidf")(spark, dir)
      .queryExecution.sparkPlan
    val tokenizers = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec
          if g.generator.toString.contains("graft_tokens") => g
    }
    assert(tokenizers.size === 2,
      s"text_tfidf: expected exactly the tf + df tokenize Generates, " +
        s"got ${tokenizers.size}")
  }

  test("ann_lsh_top1: quantization and buckets in one projection — embeddings-scanning exchanges canonicalize to one plan") {
    val groups = markedExchangeGroups("ann_lsh_top1", "embeddings.parquet")
    assert(groups.size === 1,
      s"ann_lsh_top1's embeddings exchanges diverged (the separate bucket " +
        s"scan + self-join-on-vec_id shape is back): $groups")
  }
}
