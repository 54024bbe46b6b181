package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextNorm
import org.apache.spark.unsafe.types.UTF8String

/** Pins [[graft.functions.TextNorm]] char-by-char to DuckDB's
  * `strip_accents`/`nfc_normalize` (the `text_normalize` oracle engine) —
  * the golden values below were produced by DuckDB v1.0.0 and must not
  * drift, because the driver hash-compares the two engines' md5 of the
  * normalized bytes. The composed-vs-decomposed state of every
  * non-ASCII literal below is load-bearing (the last `strip` case IS
  * the decomposed e + U+0301 sequence) — byte-dump before editing and
  * don't let tooling re-normalize the fixtures.
  * Also proves the codegen'd expression path agrees with the kernel and
  * that the ASCII fast path returns the SAME object (no copy on the
  * overwhelmingly-common case).
  */
class TextNormSpec extends AnyFunSuite {

  import TestSpark.spark

  private def strip(s: String): String =
    TextNorm.stripAccents(UTF8String.fromString(s)).toString

  private def nfc(s: String): String =
    TextNorm.nfc(UTF8String.fromString(s)).toString

  test("stripAccents matches DuckDB strip_accents golden values") {
    // decomposable accents drop their marks: áéöû ñ ç Å É
    assert(strip("áéöû") === "aeou")
    assert(strip("ñ") === "n")
    assert(strip("ç") === "c")
    assert(strip("ÅÉ") === "AE")
    // atomic letters with NO canonical decomposition survive — DuckDB
    // (utf8proc) keeps ł ø œ ß; lossy ASCII-folding libraries don't
    assert(strip("ł") === "ł")
    assert(strip("ø") === "ø")
    assert(strip("œ") === "œ")
    assert(strip("ß") === "ß")
    // already-decomposed input (e + combining acute): same result
    assert(strip("é") === "e")
    // supplementary-plane Mn marks (surrogate pairs in Java) are
    // stripped too -- DuckDB 1.0.0 golden: both go; a char-based loop
    // would see SURROGATE halves and keep them
    val vs17 = new String(Character.toChars(0xE0100))    // VARIATION SELECTOR-17
    val tremolo = new String(Character.toChars(0x1D167)) // MUSICAL SYMBOL COMBINING TREMOLO-1
    assert(Character.getType(0xE0100) === Character.NON_SPACING_MARK.toInt)
    assert(strip("a" + vs17 + "x") === "ax")
    assert(strip("a" + tremolo + "x") === "ax")
  }

  test("nfc matches DuckDB nfc_normalize golden values") {
    // a + combining grave composes to the precomposed à
    assert(nfc("à") === "à")
    // ü + combining grave composes to the precomposed U+01DC
    assert(nfc("ǜ") === "ǜ")
    // no precomposed q-grave exists: stays a 2-char combining sequence
    assert(nfc("q̀") === "q̀")
    // already-NFC input is untouched
    assert(nfc("café") === "café")
  }

  test("ASCII fast path is a no-copy identity") {
    val s = UTF8String.fromString("plain ascii only")
    assert(TextNorm.stripAccents(s) eq s)
    assert(TextNorm.nfc(s) eq s)
  }

  test("null and empty semantics through the expression layer") {
    graft.functions.CountIn.register(spark)
    import spark.implicits._
    val df = Seq(Some("café"), Some(""), None).toDF("s")
      .select(
        call_function("strip_accents", col("s")).as("stripped"),
        call_function("nfc_normalize", col("s")).as("normed"))
    val rows = df.collect()
    assert(rows(0).getString(0) === "cafe")
    assert(rows(0).getString(1) === "café")
    assert(rows(1).getString(0) === "")
    assert(rows(1).getString(1) === "")
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("codegen and interpreted paths agree on mixed unicode") {
    graft.functions.CountIn.register(spark)
    import spark.implicits._
    val inputs = Seq("déjà vu", "łódź",
      "àb́c", "naïve", "ascii")
    // fallback off: a Janino failure in the generated call must FAIL
    // the test, not silently re-run the stage interpreted. Save/restore
    // the prior value — hardcoding the restore would flip a deliberate
    // session setting.
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // rows must come FROM range(n), never a local Seq:
      // ConvertToLocalRelation folds a Project over a LocalRelation at
      // optimization time using INTERPRETED eval on the driver, so the
      // generated code would never run and this test would pin nothing
      val arr = array(inputs.map(lit): _*)
      val df = spark.range(inputs.length)
        .select(element_at(arr, (col("id") + 1).cast("int")).as("s"))
        .select(
          col("s"),
          call_function("strip_accents", col("s")).as("c_strip"),
          call_function("nfc_normalize", col("s")).as("c_nfc"))
      val rows = df.collect()
      // typed node check: WSCG prints only as a "*(n)" marker in
      // toString, never as its node name
      val wscg = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(wscg.nonEmpty,
        "plan fell out of whole-stage codegen — the codegen path is untested:\n" +
          df.queryExecution.executedPlan)
      assert(rows.length === inputs.length)
      rows.foreach { r =>
        val in = r.getString(0)
        assert(r.getString(1) === strip(in), s"strip diverged on $in")
        assert(r.getString(2) === nfc(in), s"nfc diverged on $in")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prevFallback)
  }
}
