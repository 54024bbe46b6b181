package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop tokenizer core, called from both interpreted eval and the
  * generated code (the [[MinHashSigs]] static-call pattern: keeps the
  * surrounding projection inside whole-stage codegen without inlining
  * the scan loop into Janino).
  */
object TokenizeFn {

  /** Java-regex `\s` exactly (no UNICODE_CHARACTER_CLASS): the 6 chars
    * `split(c, "\\s+")` splits on. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** ASCII `string.punctuation` — the 4 ranges of [[Text.PunctClass]].
    * THE punctuation-set definition for native scan loops: the PTB shim
    * ([[TokenizePtbFn]]) shares it, so an edge-strip class change is one
    * edit here plus the regex twin [[Text.PunctClass]]. */
  private[functions] def isPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  /** Bit-identical to the declarative form it replaces —
    * `filter(transform(split(c, "\\s+"), cleanToken), length > 0)` —
    * step for step: token CONTENT equals the regex split's (runs of
    * non-`\s` chars; the split's leading empty token strips to empty and
    * is filtered either way), the end-scans strip exactly the
    * `^[punct]+` / `[punct]+$` classes, and lowercasing goes through THE
    * SAME `UTF8String.toLowerCase` the `lower()` expression calls — so
    * ASCII fast path and locale behavior cannot diverge from the HOF
    * twin ([[Text.tokensHof]], pinned by NativeExprPropSpec on random
    * inputs and by the corpus golden counts).
    */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      var j = i
      while (j < n && !isWs(str.charAt(j))) j += 1
      if (j > i) {
        var a = i
        var b = j
        while (a < b && isPunct(str.charAt(a))) a += 1
        while (b > a && isPunct(str.charAt(b - 1))) b -= 1
        if (b > a) {
          out.add(UTF8String.fromString(str.substring(a, b)).toLowerCase)
        }
      }
      i = j
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_tokens(text)`: the engine tokenizer (split on whitespace runs,
  * strip edge ASCII punctuation, lowercase, drop empties — the contract
  * documented on [[Text]]) as ONE native expression. The HOF chain it
  * replaces (`split` → `transform(regexp_replace ×2 + lower)` →
  * `filter`) runs interpreted: per token it pays lambda dispatch, two
  * regex machines, and boxing — and it sits in the hot path of every
  * text/dedup/wordcount query, often re-inlined 2-3× per row by
  * project-collapse. This is the same spec as a single primitive scan
  * per row behind a codegen'd static call.
  */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens expects string, got ${t.simpleString}")
  }

  // containsNull = true matches the HOF twin's type exactly (split()
  // declares nullable elements), so swapping the implementations cannot
  // change any downstream plan's nullability reasoning — even though
  // this expression never emits a null element.
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    TokenizeFn.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenizeFn.compute($c);")

  override def prettyName: String = "graft_tokens"

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** Tight-loop n-gram shingle core — [[TokenizeFn]]'s sibling, one
  * primitive pass building the space-joined windows.
  */
object ShinglesFn {

  /** Bit-identical to the declarative form it replaces —
    * [[graft.functions.Text.shinglesHof]], whose explicit NULL arm
    * mirrors this expression's null-intolerance (NULL array in → NULL
    * out, never `[]`) — for the non-null-element arrays the tokenizer
    * produces: windows are
    * joined with a single space exactly as `concat_ws(" ", ...)` joins
    * non-null strings, and fewer-than-n tokens yield the SAME empty
    * array the `otherwise` branch does. A null ELEMENT (unreachable from
    * [[TokenizeFn]]) would be skipped by concat_ws; this loop treats it
    * the same way.
    */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    if (total < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](total - n + 1)
    var i = 0
    while (i <= total - n) {
      val parts = new java.util.ArrayList[UTF8String](n)
      var j = 0
      while (j < n) {
        if (!toks.isNullAt(i + j)) parts.add(toks.getUTF8String(i + j))
        j += 1
      }
      out(i) = UTF8String.concatWs(UTF8String.fromString(" "),
        parts.toArray(new Array[UTF8String](parts.size())): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_shingles(tokens, n)`: word-level n-gram shingles as one native
  * expression — the interpreted `transform(sequence)` + per-window
  * `slice` + `concat_ws` chain collapsed into a single primitive pass,
  * in the dedup pipeline's per-document hot path right after
  * [[Tokenize]].
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects (array<string>, positive n), got " +
        s"(${t.simpleString}, $n)")
  }

  // containsNull = true matches the HOF twin's published type (its
  // `.otherwise(array().cast("array<string>"))` branch forces nullable
  // elements) — same swap-must-not-change-nullability rule as Tokenize.
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    ShinglesFn.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShinglesFn.compute($c, $n);")

  override def prettyName: String = "graft_shingles"

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}
