package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Planted-fixture semantics for the corpus-curation operators — the
  * oracle gate proves engine==SQL on the real corpus; these pin that the
  * SHARED semantics are the intended ones on documents constructed to
  * hit each decision boundary.
  */
class CurationSpec extends AnyFunSuite {

  /** A minimal documents table (schema of the real one) planted into a
    * temp dir the operators can read as `$dir/documents.parquet`. */
  private def plant(rows: Seq[(Long, String)]): String = {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = rows.map { case (id, text) =>
      (id, text, "en", "src0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft_curation")
    TestSpark.plantParquetFileInto(df, dir, "documents.parquet")
    dir.toString
  }

  test("decontamination: full overlap flags, zero overlap doesn't, eval doc is excluded") {
    // doc 0 (0 % 83 == 0) is the eval doc; doc 1 repeats its text
    // verbatim (every shingle contaminated); doc 2 shares nothing.
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = plant(Seq(
      0L -> evalText,
      1L -> evalText,
      2L -> "one two three four five six seven eight nine"))
    val out = Dedup.dedupDecontaminate(TestSpark.spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out.keySet === Set(1L, 2L), "eval doc must not appear in output")
    val (sh1, cont1, flag1) = out(1L)
    assert(sh1 === 6L && cont1 === 6L && flag1, "verbatim eval copy must fully flag")
    val (sh2, cont2, flag2) = out(2L)
    assert(sh2 === 7L && cont2 === 0L && !flag2, "disjoint doc must not flag")
  }

  test("decontamination: threshold is >= 20% of distinct shingles") {
    // doc 1 has 10 distinct shingles, exactly 2 of them eval (= 20%,
    // boundary inclusive); doc 2 has 1 of its 10 (10%, under).
    val evalText = "alpha beta gamma delta"         // shingles: abc bcd → 2
    val boundary = "alpha beta gamma delta x1 x2 x3 x4 x5 x6 x7 x8"
    val under = "alpha beta gamma y1 y2 y3 y4 y5 y6 y7 y8 y9"
    val dir = plant(Seq(0L -> evalText, 1L -> boundary, 2L -> under))
    val out = Dedup.dedupDecontaminate(TestSpark.spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out(1L) === ((10L, 2L, true)), "exactly-20% doc must flag (inclusive)")
    assert(out(2L) === ((10L, 1L, false)), "10% doc must not flag")
  }

  test("repetition profile: degenerate loop flags, diverse text doesn't") {
    // "a b a b a b a" → bigrams [ab ba ab ba ab ba]: n=6, distinct=2,
    // top=3 → 3·5 ≥ 6 flags. The diverse doc's 7 all-distinct bigrams
    // give top=1 → 1·5 < 7, under the 1/5 threshold.
    val dir = plant(Seq(
      10L -> "a b a b a b a",
      11L -> "one two three four five six seven eight"))
    val out = TextAnalysis.textRepetition(TestSpark.spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(out(10L) === ((6L, 2L, 3L, true)))
    assert(out(11L) === ((7L, 7L, 1L, false)))
  }
}
