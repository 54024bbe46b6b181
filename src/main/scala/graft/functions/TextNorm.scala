package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels shared by the [[NfcNormalize]] /
  * [[StripAccents]] expressions' interpreted AND generated paths (the
  * generated code calls these static forwarders, so the two paths cannot
  * drift). Semantics are pinned to DuckDB's functions of the same name —
  * the cross-engine oracle for `text_normalize` — and verified
  * char-by-char in `TextNormSpec`:
  *
  *  - `nfc`: canonical composition (Unicode NFC). `a` + U+0300 composes
  *    to `à`; sequences with no precomposed form stay decomposed.
  *  - `stripAccents`: NFD-decompose, drop non-spacing marks (category
  *    Mn), re-compose NFC. `é`→`e`, `ñ`→`n`, but `ł`/`ø`/`œ`/`ß` are
  *    atomic letters (no canonical decomposition) and survive — matching
  *    DuckDB/utf8proc, and deliberately NOT the lossy `Ł`→`L` folding
  *    some libraries apply.
  *
  * Both take the ASCII fast path without materializing a String:
  * `numBytes == numChars` iff every byte is ASCII, and ASCII is closed
  * under both operations. On a crawl corpus that is overwhelmingly
  * ASCII, the normalization pass then costs one comparison per row.
  */
object TextNorm {

  private def allAscii(s: UTF8String): Boolean = s.numBytes() == s.numChars()

  def nfc(s: UTF8String): UTF8String = {
    if (allAscii(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    if (allAscii(s)) return s
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    // iterate by CODE POINT, not Java char: supplementary-plane Mn marks
    // (e.g. U+E0100 VARIATION SELECTOR-17) encode as surrogate pairs,
    // and getType on either surrogate half reads SURROGATE — a per-char
    // loop would let every astral mark survive while DuckDB/utf8proc
    // strips it
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb, Normalizer.Form.NFC))
  }
}

/** Shared shape of the two string→string normalization expressions:
  * null-intolerant unary, codegen'd as a single static call (the real
  * work is intrinsically a library call; what codegen buys is staying
  * inside the WholeStageCodegen produced loop — no fallback to the
  * interpreted projection path for the whole stage). */
abstract class TextNormExpression extends UnaryExpression {

  /** Static forwarder invoked by both eval paths, e.g. `"nfc"`. */
  protected def kernel: String

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.$kernel($c)")
}

/** `nfc_normalize(s)` — Unicode canonical composition, named for its
  * DuckDB oracle twin. */
case class NfcNormalize(child: Expression) extends TextNormExpression {
  override protected def kernel: String = "nfc"
  override def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])
  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `strip_accents(s)` — drop combining marks after canonical
  * decomposition, named for its DuckDB oracle twin. */
case class StripAccents(child: Expression) extends TextNormExpression {
  override protected def kernel: String = "stripAccents"
  override def nullSafeEval(input: Any): Any =
    TextNorm.stripAccents(input.asInstanceOf[UTF8String])
  override def prettyName: String = "strip_accents"
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
