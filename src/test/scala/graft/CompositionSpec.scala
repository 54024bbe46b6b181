package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.functions.Text
import graft.operators.{Dedup, TextAnalysis}

/** Cross-operator composition properties — the claims the per-query
  * oracles can't see because they check each query in isolation:
  *
  *  1. `curation_e2e` really IS the composition of its standalone
  *     stages (textQualityFilter ∩ textLangid='en' → exact dedup →
  *     per-source stats). If the pipeline's inlined gate ever drifts
  *     from the standalone queries — the exact failure the shared
  *     threshold/stopword constants exist to prevent — this spec
  *     fails even though both oracles still pass (each Scala copy
  *     would drift in lockstep with its own SQL copy).
  *
  *  2. `dedup_chunks` is IDENTITY on documents whose chunks are all
  *     globally unique: first-occurrence-wins may only ever remove
  *     repeated content, so such documents must reassemble to exactly
  *     their tokenized text, in order.
  */
class CompositionSpec extends AnyFunSuite {

  private val dir = TestSpark.Sf0001

  test("curation_e2e equals the composition of its standalone stages") {
    val spark = TestSpark.spark
    val quality = TextAnalysis.textQualityFilter(spark, dir)
      .filter(col("keep")).select("doc_id")
    val english = TextAnalysis.textLangid(spark, dir)
      .filter(col("lang_pred") === "en").select("doc_id")
    val hashed = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        md5(Text.normalize(col("text"))).as("content_hash"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    val kept = hashed
      .join(quality, Seq("doc_id")).join(english, Seq("doc_id"))
    val winners = kept.groupBy("content_hash")
      .agg(min(col("doc_id")).as("doc_id"))
    val expected = kept
      .join(winners, Seq("content_hash", "doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val actual = TextAnalysis.curationE2e(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(actual === expected)
    assert(actual.nonEmpty, "composition gate kept no documents — vacuous test")
  }

  test("dedup_chunks reassembles unique-chunk documents to identity") {
    val spark = TestSpark.spark
    // chunk the corpus exactly as the operator does, find the documents
    // whose every chunk occurs once corpus-wide
    val chunks = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), col("w"), expr(
        s"""transform(sequence(1, (size(w) + ${Dedup.ChunkTokens - 1}) div ${Dedup.ChunkTokens}),
           |  i -> array_join(slice(w, (i - 1) * ${Dedup.ChunkTokens} + 1, ${Dedup.ChunkTokens}), ' '))
           |""".stripMargin).as("cs"))
    val globalCounts = chunks
      .select(explode(col("cs")).as("chunk"))
      .groupBy("chunk").agg(count(lit(1)).as("c"))
    val repeated = globalCounts.filter(col("c") > 1).select("chunk")
    val uniqueDocs = chunks
      .select(col("doc_id"), col("w"), explode(col("cs")).as("chunk"))
      .join(repeated, Seq("chunk"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_unique"), first(col("w")).as("w"))
      // integer div — Column./ is double division and would silently
      // shrink the tested set to docs with token count ≡ 1 (mod 10)
      .withColumn("n_chunks",
        expr(s"(size(w) + ${Dedup.ChunkTokens - 1}) div ${Dedup.ChunkTokens}"))
      .filter(col("n_unique") === col("n_chunks"))
      .select(col("doc_id"), array_join(col("w"), " ").as("expected_text"))

    val out = Dedup.dedupChunks(spark, dir)
    val joined = uniqueDocs
      .join(out, Seq("doc_id"))
      .select(col("doc_id"), col("expected_text"), col("text"))
      .collect()
    assert(joined.nonEmpty, "no unique-chunk documents at this sf — vacuous test")
    // the inner join must lose NOTHING: a reassembly regression that
    // drops a unique-chunk doc (or emits it under a wrong doc_id) would
    // otherwise just shrink the compared set and pass on the survivors
    assert(joined.length.toLong === uniqueDocs.count(),
      "dedupChunks dropped unique-chunk documents — identity violated by absence")
    joined.foreach { r =>
      assert(r.getString(2) === r.getString(1),
        s"doc ${r.getLong(0)} did not reassemble to identity")
    }
  }
}
