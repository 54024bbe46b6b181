package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.operators.WordCount

/** End-to-end parity against the reference's own corpus (8 Project
  * Gutenberg books, read-only at /root/reference/files/inputs).
  * BASELINE.md records the reference's measured per-bucket distinct-word
  * counts at M=4 under the documented tokenizer spec; reproducing them
  * exactly is the engine-vs-reference fidelity check for the full
  * pipeline (scan → tokenize → count → bucket).
  */
class ReferenceCorpusSpec extends AnyFunSuite {

  val CorpusDir = "/root/reference/files/inputs"

  test("reference corpus: per-bucket distinct-word counts match BASELINE.md") {
    val counted = WordCount.wordcountText(TestSpark.spark, CorpusDir)
    val buckets = counted
      // literal 4, NOT WordCount.M: the baseline constants were measured
      // at M=4, so a -Dgraft.buckets override must not fail this
      // fidelity pin (bucketing at other M is covered by BucketedSinkSpec)
      .groupBy(Text.bucket(col("word"), 4).as("bucket"))
      .agg(count(lit(1)).as("distinct_words"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // measured from the reference implementation's bucket function
    // (BASELINE.md: buckets 0..3 at M=4); map equality also pins the
    // 24113-word vocabulary total, so no separate full-corpus recount
    assert(buckets === Map(0L -> 6534L, 1L -> 5207L, 2L -> 4868L, 3L -> 7504L))
  }
}
