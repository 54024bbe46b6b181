package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordCount

/** Golden-output tests for the flagship word count on the tiny corpus
  * (fixtures spec: FIXTURES.md §1). Exercises: tokenize/strip/lower/filter
  * edge cases, the `*.txt` format predicate (notes.pdf ignored), an empty
  * file, and count correctness.
  */
class WordCountSpec extends AnyFunSuite {

  // Hand-computed golden counts for tiny_corpus/*.txt under the engine
  // tokenizer spec (functions/Text.scala): whitespace split, strip
  // leading/trailing ASCII punctuation, lowercase, drop empties.
  val golden: Map[String, Long] = Map(
    "the" -> 2, "quick" -> 1, "brown" -> 1, "fox" -> 1, "jumps" -> 1,
    "over" -> 1, "lazy" -> 1, "dog" -> 1,
    "u.s.a" -> 1, "is" -> 1, "where" -> 1, "don't" -> 1, "and" -> 1,
    "quoted" -> 1, "words" -> 1, "live" -> 1,
    "hello" -> 3, "end-of-line" -> 1, "hyphen" -> 1, "trailing" -> 1)

  test("wordcountText matches hand-computed golden counts") {
    val got = WordCount.wordcountText(TestSpark.spark, TestSpark.corpusDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === golden)
  }

  test("non-txt files are excluded by the format predicate") {
    // 'ignored' appears only in notes.pdf; 'content' too.
    val got = WordCount.wordcountText(TestSpark.spark, TestSpark.corpusDir)
      .collect().map(_.getString(0)).toSet
    assert(!got.contains("ignored"))
    assert(!got.contains("content"))
  }

  test("total tokens equals sum of counts (Σ invariant)") {
    val total = WordCount.wordcountText(TestSpark.spark, TestSpark.corpusDir)
      .collect().map(_.getLong(1)).sum
    assert(total === golden.values.sum)
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("every query has either an oracle or is a documented rows-only op") {
    // Single source of truth lives in SparkEntry.rowsOnly — registering a
    // query without an oracle must update that one set (with a reason).
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === SparkEntry.rowsOnly,
      "queries without oracles must exactly match SparkEntry.rowsOnly " +
        "(document new rows-only queries there, beside the registry)")
    // and no oracle without a query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("query names never contain '#' — reserved for Bench's REPEAT pass tag") {
    // Bench appends '#<pass>' under SPARK_GRAFT_REPEAT and strips it by
    // regex for the best-of-pass grouping; a real name ending '#<digits>'
    // would silently merge with its prefix (ADVICE r16). Bench also
    // sys.errors on this at startup — this spec fails it at test time.
    val offenders = SparkEntry.queries.keySet.filter(_.contains('#'))
    assert(offenders.isEmpty, s"query names with '#': $offenders")
  }
}
