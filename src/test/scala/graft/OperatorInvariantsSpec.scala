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

  test("dedup: simhash pairs respect the Hamming bound") {
    val pairs = Dedup.simhashPairs(spark, dir, maxHamming = 3).collect()
    pairs.foreach(r => assert(r.getLong(2) <= 3))
  }

  test("events: sessions conserve events and durations are within gaps") {
    val ev = graft.engine.Tables.events(spark, dir)
    val sessions = Events.eventsSessions(spark, dir).collect()
    assert(sessions.map(_.getLong(2)).sum === ev.count())
    sessions.foreach(r => assert(r.getLong(3) >= 0L))
  }

  test("events: as-of click is never after the purchase") {
    Events.eventsAsof(spark, dir).collect().foreach { r =>
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
