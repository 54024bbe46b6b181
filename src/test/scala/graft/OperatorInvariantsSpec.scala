package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Events, Relational, Similarity}

/** Semantic invariants per operator family, run on sf0.001. These check
  * relationships the DuckDB oracle can't express (cross-query
  * equivalence, physical properties), complementing the hash-compare.
  */
class OperatorInvariantsSpec extends AnyFunSuite {

  import TestSpark.{spark, Sf0001 => dir}

  test("dedup: exact dedup partitions the corpus") {
    val total = graft.engine.Tables.documents(spark, dir).count()
    val grouped = Dedup.dedupExact(spark, dir)
      .agg(sum("n_docs")).collect().head.getLong(0)
    assert(grouped === total)
  }

  test("dedup: MinHash-LSH output equals exact n-gram Jaccard output") {
    val exact = Dedup.dedupNearJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dedupMinhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
  }

  test("dedup: simhash pairs are EXACTLY the brute-force Hamming<=3 pairs") {
    // asserting `hamming <= 3` on the output would restate the SUT's own
    // final filter (a tautology, vacuously green on empty output); the
    // real invariant is the pigeonhole join's EXACTNESS, checked against
    // a driver-side brute force over the collected fingerprints
    val fps = Dedup.simhashFingerprints(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, fa) <- fps.iterator; (b, fb) <- fps.iterator
      if a < b && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (a, b, java.lang.Long.bitCount(fa ^ fb).toLong)).toSet
    val got = Dedup.simhashPairs(spark, dir, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture should contain simhash-close pairs")
  }

  test("events: sessions conserve events and durations are within gaps") {
    val ev = graft.engine.Tables.events(spark, dir)
    val sessions = Events.eventsSessions(spark, dir).collect()
    assert(sessions.map(_.getLong(2)).sum === ev.count())
    // the gap invariant: n events merged into one session are pairwise
    // within the gap, so the span is bounded by (n-1) * gap — a session
    // that merged across a >30-min silence violates this
    val gapSec = Events.SessionGapUs / 1000000L
    sessions.foreach { r =>
      assert(r.getLong(3) >= 0L)
      assert(r.getLong(3) <= (r.getLong(2) - 1L) * gapSec,
        s"session span ${r.getLong(3)}s exceeds (n-1)*gap for n=${r.getLong(2)}")
    }
  }

  test("events: as-of click is never after the purchase") {
    val rows = Events.eventsAsof(spark, dir).collect()
    assert(rows.nonEmpty, "no purchase rows — fixture or filter broken")
    assert(rows.exists(r => !r.isNullAt(3)),
      "every as-of click is NULL — the ordering invariant is never exercised")
    rows.foreach { r =>
      val purchase = r.getString(2)
      Option(r.getString(3)).foreach(click => assert(click <= purchase))
    }
  }

  test("relational: top-k is sorted and bounded") {
    val rows = Relational.qTopK(spark, dir).collect()
    assert(rows.length === 10)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("relational: rollup adds region subtotals and a grand total") {
    val rows = Relational.qRollup(spark, dir).collect()
    val detail = rows.count(r => !r.isNullAt(0) && !r.isNullAt(1))
    val regionSubtotals = rows.count(r => !r.isNullAt(0) && r.isNullAt(1))
    val grand = rows.count(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand === 1)
    assert(rows.length === detail + regionSubtotals + 1)
    val grandTotal = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get.getLong(2)
    val detailSum = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(_.getLong(2)).sum
    assert(grandTotal === detailSum)
  }

  test("ids: stable ids are a contiguous 0..n-1 bijection in doc_id order") {
    val ta = graft.operators.TextAnalysis
    val rows = ta.docStableIds(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = graft.engine.Tables.documents(spark, dir).count()
    assert(rows.length === n.toInt)
    assert(rows.map(_._2).sorted.toSeq === (0L until n).toSeq,
      "stable_id must cover 0..n-1 exactly once")
    // order-preserving: sorting by doc_id yields ascending stable_id
    val byDoc = rows.sortBy(_._1).map(_._2)
    assert(byDoc.toSeq === byDoc.sorted.toSeq)
    // the scale property: the numbering runs over MULTIPLE range
    // partitions (zipWithIndex preserves them) — a single-partition
    // global-window formulation would collapse this to 1
    assert(ta.docStableIds(spark, dir).rdd.getNumPartitions > 1)
  }

  test("ids: pack shards are nondecreasing and open exactly at budget crossings") {
    val ta = graft.operators.TextAnalysis
    val rows = ta.docPackShards(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.head._3 === 0L)
    // shard ids never decrease in doc order, and each equals the
    // sequential exclusive prefix sum over the budget — i.e. the
    // distributed two-phase prefix sum matches the sequential spec
    var cum = 0L
    rows.foreach { case (_, n, shard) =>
      assert(shard === cum / ta.PackBudget)
      cum += n
    }
  }

  test("events: retention cohorts conserve users and never grow") {
    val rows = Events.eventsRetention(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every cohort has an offset-0 row (first-active day is active),
    // and no later offset can exceed the cohort's size
    val day0 = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      assert(day0.contains(cohort), s"cohort $cohort missing offset 0")
      rs.foreach(t => assert(t._3 <= day0(cohort)))
      rs.foreach(t => assert(t._2 >= 0L))
    }
    // offset-0 totals = distinct users overall (each user in exactly one cohort)
    val totalUsers = graft.engine.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(day0.values.sum === totalUsers)
  }

  test("events: forward as-of click is never before the purchase") {
    val rows = Events.eventsAsofForward(spark, dir).collect()
    assert(rows.nonEmpty, "no purchase rows — fixture or filter broken")
    assert(rows.exists(r => !r.isNullAt(3)),
      "every forward as-of click is NULL — the ordering invariant is never exercised")
    rows.foreach { r =>
      val purchase = r.getString(2)
      Option(r.getString(3)).foreach(click => assert(click >= purchase))
    }
  }

  test("events: transitions conserve events and rows' shares sum to 1") {
    val ev = graft.engine.Tables.events(spark, dir)
    val rows = Events.eventsTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._3).sum === ev.count())
    rows.groupBy(_._1).values.foreach { g =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-9)
    }
    // every user journey terminates exactly once
    val ends = rows.filter(_._2 == "<end>").map(_._3).sum
    assert(ends === ev.select("user_id").distinct().count())
  }

  test("events: flagged outliers are exactly the rows beyond 3 independent sigma") {
    // |z| > 3 on the output is tautological (the flag filter and the z
    // column derive from the SAME broadcast stats row); recompute the
    // per-type mean/sigma driver-side and check BOTH directions against
    // it, with a relative margin for the SUT's decimal-vs-double sums
    val ev = graft.engine.Tables.events(spark, dir)
    val vals = ev.select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val stats = vals.groupBy(_._2).map { case (t, vs) =>
      val xs = vs.map(_._3)
      val mean = xs.sum / xs.length
      val sigma = math.sqrt(
        math.max(xs.map(x => x * x).sum / xs.length - mean * mean, 0.0))
      t -> ((mean, sigma))
    }
    def margin(t: String): Double = {
      val (m, s) = stats(t); 1e-6 * (math.abs(m) + s + 1.0)
    }
    val flagged = Events.eventsOutliers(spark, dir).collect()
    flagged.foreach { r =>
      val (mean, sigma) = stats(r.getString(1))
      assert(math.abs(r.getDouble(2) - mean) > 3.0 * sigma - margin(r.getString(1)),
        s"flagged ${r.getLong(0)} is within 3 sigma of independent stats")
    }
    val flaggedIds = flagged.map(_.getLong(0)).toSet
    vals.foreach { case (id, t, v) =>
      val (mean, sigma) = stats(t)
      if (math.abs(v - mean) > 3.0 * sigma + margin(t))
        assert(flaggedIds.contains(id), s"outlier $id (type $t, value $v) unflagged")
    }
    // Chebyshev: at most 1/9 of any distribution is beyond 3 sigma
    assert(flagged.length <= ev.count() / 9)
  }

  test("text: mixture weights are a probability simplex that flattens sources") {
    val rows = graft.operators.TextAnalysis.docMixtureWeights(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    // sqrt temperature: the smallest source is upweighted, the largest down
    val bySize = rows.sortBy(_._2)
    assert(bySize.head._5 >= 1.0 - 1e-12)
    assert(bySize.last._5 <= 1.0 + 1e-12)
    // α-shares are order-preserving but flatter than natural shares
    val ratioSmallLarge = bySize.head._4 / bySize.last._4
    val naturalRatio = bySize.head._3 / bySize.last._3
    assert(ratioSmallLarge >= naturalRatio)
  }

  test("text: resample copies realize the mixture weights per doc") {
    val weights = graft.operators.TextAnalysis.docMixtureWeights(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    val rows = graft.operators.TextAnalysis.docResample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // (doc, copy) unique, copy indices contiguous from 1
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq)
    }
    // every doc's copy count is floor or ceil of its source's oversample
    byDoc.foreach { case (_, rs) =>
      val f = weights(rs.head._2)
      assert(rs.length == math.floor(f).toLong || rs.length == math.ceil(f).toLong)
    }
  }

  test("text: lm score is a negative log-prob over exactly n_tokens-1 bigrams") {
    val nTokens = graft.operators.TextAnalysis.textTokenCount(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = graft.operators.TextAnalysis.textLmScore(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === nTokens(r.getLong(0)) - 1)
      assert(r.getDouble(2) < 0.0) // smoothed probabilities are < 1
    }
  }

  test("text: inverted index postings agree with df and cover every token") {
    val rows = graft.operators.TextAnalysis.textInvertedIndex(spark, dir).collect()
    assert(rows.nonEmpty, "empty index — corpus or tokenizer broken")
    rows.foreach { r =>
      val postings = r.getString(2).split(",")
      assert(postings.length.toLong === r.getLong(1))
      // numerically sorted, unique
      val ids = postings.map(_.toLong)
      assert(ids.toSeq === ids.toSeq.sorted)
      assert(ids.distinct.length === ids.length)
    }
    // coverage: the index's vocabulary is EXACTLY the corpus vocabulary
    // (per-row consistency alone stays green if the groupBy drops terms)
    val vocab = graft.engine.Tables.documents(spark, dir)
      .select(explode_outer(graft.functions.Text.tokens(col("text"))).as("w"))
      .filter(col("w").isNotNull).distinct()
      .collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet === vocab,
      "index vocabulary diverges from corpus vocabulary")
  }

  test("relational: Q13 keeps zero-order customers (left-outer + ON-clause filter)") {
    // sf0.01, not the suite's default sf0.001: the discriminating row —
    // a customer whose EVERY order is urgent — first appears at sf0.01
    // (at sf0.001 all customers have a non-urgent order, so the outer
    // join is vacuously identical to the inner one)
    val d = TestSpark.Sf001
    val rows = Relational.qTpchQ13(spark, d).collect()
    // sum(custdist) over the distribution is EVERY customer — an inner
    // join (or filtering after the join) would drop customers whose
    // every order is urgent, shrinking the sum
    val total = graft.engine.Tables.customer(spark, d).count()
    assert(rows.map(_.getLong(1)).sum === total)
    // the c_count=0 bucket exists: some customer has only urgent orders,
    // so this corpus actually exercises the outer-join edge
    assert(rows.exists(_.getLong(0) === 0L))
  }

  test("relational: Q21 reports only sole-flagged suppliers of the gated nation") {
    val natSupp = graft.engine.Tables.supplier(spark, dir)
      .join(graft.engine.Tables.nation(spark, dir)
          .filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_name").collect().map(_.getString(0)).toSet
    val rows = Relational.qTpchQ21(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(natSupp.contains(r.getString(0))))
    val waits = rows.map(_.getLong(1))
    assert(waits.forall(_ > 0L))
    assert(waits.zip(waits.tail).forall { case (a, b) => a >= b })
  }

  test("relational: Q15 emits exactly the argmax suppliers of the quarter's revenue") {
    // independent recomputation of per-supplier revenue via a different
    // route (SQL over the registered views), then compare the argmax set
    // registerAll's contract: register + analyze must share one
    // withViews window (reentrant), or a concurrent same-name
    // registrant could bind this sql to another dir's data
    val rev = graft.engine.Tables.withViews {
      graft.engine.Tables.registerAll(spark, dir)
      spark.sql(
        """SELECT l_suppkey,
          |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS r
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          |GROUP BY l_suppkey""".stripMargin)
    }.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val best = rev.values.max
    val want = rev.collect { case (k, v) if v == best => k }.toSet
    val got = Relational.qTpchQ15(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.keySet === want, "argmax supplier set diverges")
    got.values.foreach(v => assert(v === best))
  }

  test("similarity: LSH top-1 neighbours share a (table, bucket)") {
    val buckets = Similarity.lshBuckets(spark, dir)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(r => (r.getInt(1), r.getLong(2))).toSet }
    Similarity.annLshTop1(spark, dir).collect().foreach { r =>
      assert(buckets(r.getLong(0)).intersect(buckets(r.getLong(1))).nonEmpty)
    }
  }
}
