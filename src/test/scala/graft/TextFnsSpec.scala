package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

/** Unit + property tests for the text primitives: tokenizer edge cases,
  * the user-visible bucket function (must equal Python `ord(w[0]) % M`,
  * reference: src/worker.py:76), and shingling. Properties use raw
  * ScalaCheck generators sampled deterministically (the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class TextFnsSpec extends AnyFunSuite {

  import TestSpark.spark
  import spark.implicits._

  private def tokenize(s: String): Seq[String] =
    Seq(s).toDF("text").select(Text.tokens(col("text")).as("t"))
      .collect().head.getSeq[String](0)

  test("tokenizer edge cases") {
    assert(tokenize("U.S.A. is!") === Seq("u.s.a", "is"))
    assert(tokenize("don't stop") === Seq("don't", "stop"))
    assert(tokenize("--- ... !!!") === Seq.empty)
    assert(tokenize("") === Seq.empty)
    assert(tokenize("  spaced\tout\nlines  ") === Seq("spaced", "out", "lines"))
    assert(tokenize("'quoted' [bracketed] {braced}") ===
      Seq("quoted", "bracketed", "braced"))
    assert(tokenize("end-of-line hyphen-") === Seq("end-of-line", "hyphen"))
  }

  test("bucket function equals first-char codepoint mod M for edge chars") {
    // covers: digits, letters at range edges, a punctuation-INITIAL word
    // ('~ok' — unreachable through the tokenizer, which strips it, but
    // reachable through the public bucket/sink API, so it must route by
    // the same ord-mod-M rule), and non-ASCII BMP chars (é=233, ω=969)
    val words = Seq("a", "z", "0", "9", "~ok", "word", "élan", "ωmega", "Zz")
    val m = 4
    val got = words.toDF("word")
      .select(col("word"), Text.bucket(col("word"), m).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) === (w.codePointAt(0) % m).toLong, s"word=$w")
    }
  }

  test("property: sum of per-word counts equals token total; buckets stable") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val docGen = Gen.listOf(wordGen).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(8, docGen)
    TestSpark.sample(corpusGen, 20).zipWithIndex.foreach { case (docs, i) =>
      val counted = docs.toDF("text")
        .select(explode(Text.tokens(col("text"))).as("word"))
        .groupBy("word").count()
      val total =
        if (counted.isEmpty) 0L
        else counted.agg(sum("count")).collect().head.getLong(0)
      val expected = docs.flatMap(_.split("\\s+")).count(_.nonEmpty).toLong
      assert(total === expected, s"seed=$i docs=$docs")
      // bucket is a pure function of the first char
      counted.select(col("word"), Text.bucket(col("word"), 4).as("b"))
        .collect()
        .foreach { r =>
          assert(r.getLong(1) === (r.getString(0).codePointAt(0) % 4).toLong)
        }
    }
  }

  test("shingles: n-gram windows over the token array") {
    val got = Seq("a b c d").toDF("text")
      .select(Text.shingles(Text.tokens(col("text")), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(got === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(Text.shingles(Text.tokens(col("text")), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(short === Seq.empty)
  }

  test("normalize collapses whitespace and case") {
    val got = Seq("  A   b\t C ").toDF("t")
      .select(Text.normalize(col("t"))).collect().head.getString(0)
    assert(got === "a b c")
  }
}
