package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Pins the off-fixture edge-case semantics of the text battery — the
  * cases the driver's oracle gate can never exercise because every
  * shipped document has ≥ 10 tokens, no NULLs and printable whitespace
  * only. Each test encodes the ENGINE behavior the DuckDB oracle twin
  * produces on the same input, so the parity holds if a testdata
  * refresh ever ships such rows:
  *
  *  - a ZERO-TOKEN document (all punctuation): quality ratios are NULL,
  *    not 0.0/0.0 = NaN (DuckDB's list_sum([]) and float 0/0 are NULL),
  *    and textArrayFns must not THROW — plain `element_at(w, 1)` under
  *    Spark 4's default ANSI mode raises INVALID_ARRAY_INDEX_IN_ELEMENT_AT
  *    where the oracle's `w[1]` is NULL;
  *  - a NULL or zero-token text: fingerprint/first3 are NULL — DuckDB's
  *    `array_to_string` is NULL for both a NULL and an EMPTY list where
  *    Spark's `concat_ws` skips nulls and joins [] to '' (and md5('')
  *    would collide every contentless document on one constant);
  *    tools/edge_oracle_probe.py executes the DuckDB half of this and
  *    the VT contract on the same planted rows;
  *  - a VERTICAL-TAB separator: the tokenizer contract is Java's `\s`
  *    (` \t\n\x0B\f\r`), which the oracle twins spell out explicitly
  *    because RE2's `\s` lacks `\x0B` — both the whitespace split and
  *    the BPE-ish "other char" class must treat VT as whitespace;
  *  - the curation pipeline drops both degenerate rows instead of
  *    crashing or keeping them.
  */
class TextEdgeCasesSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private lazy val plantedDir: String = {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_textedge")
    val rows = Seq(
      // a normal English doc, ≥ MinTokens tokens with plenty of
      // stopwords so the curation gate keeps it (the happy-path row)
      (1L, Option("the cat sat on the mat and the dog lay by the door " +
        "while the bird flew over the tall tree in the yard"), "en", "planted"),
      // zero tokens after punctuation strip
      (2L, Option("!!! ??? ... --- !!!"), "en", "planted"),
      // NULL body
      (3L, Option.empty[String], "en", "planted"),
      // vertical tab between tokens — Java \s whitespace, not RE2 \s
      (4L, Option("alpha\u000Bbeta gamma"), "en", "planted"))
    val df = rows.toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(coalesce(length(text), 0) AS LONG) AS n_chars")
    TestSpark.plantParquetFileInto(df, dir, "documents.parquet")
    dir.toString
  }

  override def afterAll(): Unit = {
    val p = new org.apache.hadoop.fs.Path(plantedDir)
    p.getFileSystem(TestSpark.spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    super.afterAll()
  }

  test("zero-token doc: quality ratios are NULL, not NaN") {
    val r = TextAnalysis.textStats(TestSpark.spark, plantedDir)
      .filter("doc_id = 2").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_tokens") === 0L)
    assert(row.isNullAt(row.fieldIndex("distinct_ratio")), "distinct_ratio must be NULL")
    assert(row.isNullAt(row.fieldIndex("avg_token_len")), "avg_token_len must be NULL")
    assert(row.isNullAt(row.fieldIndex("stop_ratio")), "stop_ratio must be NULL")
  }

  test("zero-token doc: quality gate drops it with NULL (not false) ratio flags") {
    val r = TextAnalysis.textQualityFilter(TestSpark.spark, plantedDir)
      .filter("doc_id = 2").collect().head
    assert(r.getAs[Boolean]("len_ok") === false)
    // NULL ratio → NULL comparison in BOTH engines (DuckDB matches)
    assert(r.isNullAt(r.fieldIndex("tok_len_ok")))
    // keep = false && NULL = false in both engines
    assert(r.getAs[Boolean]("keep") === false)
  }

  test("textArrayFns survives ANSI mode on empty/NULL arrays") {
    val rows = TextAnalysis.textArrayFns(TestSpark.spark, plantedDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // zero-token doc: element_at(w, 1) would THROW under ANSI; try_element_at is NULL
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("first_tok")))
    // empty AND null token arrays stringify to NULL (DuckDB's
    // array_to_string is NULL for both, where concat_ws would give '')
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("first3")))
    assert(rows(3L).isNullAt(rows(3L).fieldIndex("first3")))
    assert(rows(3L).isNullAt(rows(3L).fieldIndex("first_tok")))
  }

  test("fingerprint: NULL text and zero-token docs → NULL, not md5('')") {
    val fp = TextAnalysis.textFingerprint(TestSpark.spark, plantedDir)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(fp(3L).isEmpty, "NULL text must fingerprint as NULL")
    assert(fp(2L).isEmpty,
      "a contentless doc has no fingerprint (and DuckDB's array_to_string([]) is NULL)")
    assert(fp(1L).nonEmpty && fp(4L).nonEmpty)
  }

  test("vertical tab is whitespace for both n_ws and n_bpe (Java \\s contract)") {
    val r = TextAnalysis.textTokenCount(TestSpark.spark, plantedDir)
      .filter("doc_id = 4").collect().head
    assert(r.getAs[Long]("n_ws") === 3L, "alpha\\x0Bbeta gamma → 3 ws tokens")
    assert(r.getAs[Long]("n_bpe") === 3L, "VT must not count as an 'other' char")
  }

  test("curation pipeline drops the degenerate rows without crashing") {
    val out = TextAnalysis.curationE2e(TestSpark.spark, plantedDir).collect()
    // only doc 1 can pass the English-prose gate; docs 2/3/4 must drop
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total === 1L)
  }
}
