package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Penn-Treebank-compatible tokenizer core — the COMPAT SHIM beside the
  * engine tokenizer [[TokenizeFn]] (SURVEY.md §7 hard-part 1).
  *
  * The reference tokenizes with NLTK `word_tokenize` per input line and
  * then strips/lowers/filters (reference: src/worker.py:37-53), so its
  * user-visible output differs from the engine spec on contractions
  * (`don't` → `do` + `n't`), clitics (`he'll` → `he` + `'ll` → `ll`
  * after the punctuation strip), the MacIntyre special words
  * (`cannot` → `can not`, `gonna` → `gon na`, ...), double dashes and
  * mid-token brackets. This expression reproduces that contract with a
  * fully DETERMINISTIC rule set: the classic PTB `tokenizer.sed` regex
  * chain (as published in NLTK's `TreebankWordTokenizer`) applied per
  * LINE — exactly the granularity the reference uses, since it feeds
  * `word_tokenize` one file line at a time.
  *
  * The one NLTK ingredient deliberately not reproduced is the Punkt
  * sentence model (model-dependent, not a written spec). Punkt only
  * changes where the sentence-final-period rule fires, and a final
  * period is stripped by the reference's `strip(string.punctuation)`
  * post-pass whether or not it was split into its own token — so after
  * the strip/lower/filter the sentence-boundary choice is
  * output-invariant; the divergence is confined to abbreviation corner
  * cases the 8-book corpus golden run pins (PtbTokenizerSpec).
  *
  * Character classes (`\s`, `\S`, `\b`) are ASCII here; the contract is
  * defined for ASCII text — the only kind the reference was ever run on
  * (its shipped corpus is pure ASCII).
  *
  * Order of operations per line (the published PTB chain):
  * starting quotes → colon/comma/ellipsis/symbol/final-period/
  * question-exclamation/close-quote → brackets → `--` → pad → ending
  * quotes + clitics → MacIntyre contractions → whitespace split; then
  * the reference post-pass: strip edge ASCII punctuation, drop empties,
  * lowercase.
  */
object TokenizePtbFn {

  private def rule(p: String, r: String): (Pattern, String) = (Pattern.compile(p), r)
  private def rulei(p: String): Pattern = Pattern.compile(p, Pattern.CASE_INSENSITIVE)

  /** The sed-chain, in published order, as RAW (pattern, replacement)
    * string pairs: both the compiled Java chain below and the DuckDB
    * oracle emitter ([[OracleTokensSql]]) are built from this one array,
    * so the executable tokenizer and its SQL twin cannot drift (r20,
    * VERDICT r19 task 3 — wordcount_ptb's rows-only → hash-oracle
    * upgrade). Every pattern here is simultaneously valid Java regex and
    * RE2 (the single lookahead lives in [[ContractionRules]] where the
    * emitter rewrites it). */
  private val ChainRules: Array[(String, String)] = Array(
    // starting quotes
    "^\"" -> "``",
    "(``)" -> " $1 ",
    "([ \\(\\[{<])(\"|'{2})" -> "$1 `` ",
    // punctuation
    "([:,])([^\\d])" -> " $1 $2",
    "([:,])$" -> " $1 ",
    "\\.\\.\\." -> " ... ",
    "[;@#$%&]" -> " $0 ",
    "([^.])(\\.)([\\]\\)}>\"']*)\\s*$" -> "$1 $2$3 ",
    "[?!]" -> " $0 ",
    "([^'])' " -> "$1 ' ",
    // parens/brackets, double dash
    "[\\]\\[\\(\\)\\{\\}<>]" -> " $0 ",
    "--" -> " -- ")

  private val EndingRules: Array[(String, String)] = Array(
    "\"" -> " '' ",
    "(\\S)('')" -> "$1 $2 ",
    "([^' ])('[sS]|'[mM]|'[dD]|') " -> "$1 $2 ",
    "([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) " -> "$1 $2 ")

  /** MacIntyre contraction specials (CONTRACTIONS2/3), case-insensitive;
    * shared replacement " $1 $2 ". NLTK's wanna rule looks ahead for
    * `\s` (any whitespace, so a tab or FF also triggers the split), not
    * a literal space. */
  private val ContractionRules: Array[String] = Array(
    "\\b(can)(not)\\b", "\\b(d)('ye)\\b",
    "\\b(gim)(me)\\b", "\\b(gon)(na)\\b",
    "\\b(got)(ta)\\b", "\\b(lem)(me)\\b",
    "\\b(more)('n)\\b", "\\b(wan)(na)(?=\\s)",
    " ('t)(is)\\b", " ('t)(was)\\b")

  private val Chain: Array[(Pattern, String)] = ChainRules.map { case (p, r) => rule(p, r) }
  private val Ending: Array[(Pattern, String)] = EndingRules.map { case (p, r) => rule(p, r) }
  private val Contractions: Array[Pattern] = ContractionRules.map(rulei)

  // ---- DuckDB oracle emitter ----------------------------------------------

  /** `Character.isWhitespace` as an RE2 class — the FINAL token split in
    * [[ptbLine]] uses the Java predicate (Unicode space separators plus
    * the ASCII controls, minus non-breaking spaces), which is wider than
    * the engine tokenizer's ASCII-only [[Text.WsChars]]. Spelling the
    * full set keeps the oracle byte-faithful even on planted Unicode-
    * whitespace fixtures (U+2028 inside a line, U+3000, ...). */
  private val JavaWsClass: String =
    "[ \\t\\n\\x0B\\f\\r\\x{001C}-\\x{001F}\\x{1680}\\x{2000}-\\x{2006}" +
      "\\x{2008}-\\x{200A}\\x{2028}\\x{2029}\\x{205F}\\x{3000}]"

  private def sqlQ(s: String): String = s.replace("'", "''")

  /** Java `$n` replacement references → RE2 rewrite `\n`. */
  private def re2Repl(r: String): String = r.replaceAll("\\$([0-9])", "\\\\$1")

  /** The whole tokenizer contract — line split, 26-rule sed chain,
    * whitespace split, strip/lower/filter — as ONE DuckDB SQL expression
    * over a `text` column, emitted from the same rule arrays the Java
    * implementation compiles. Two deliberate Java→RE2 transforms:
    * the wanna lookahead `(?=\s)` (RE2 has no lookahead) CONSUMES the
    * whitespace and re-emits it as `\3` — string-identical output, since
    * the replacement already ends in a space; and `$n` → `\n` rewrite
    * syntax. Everything else passes through verbatim: `\s`/`\S`/`\b`/`\d`
    * are the same ASCII classes in both engines, and `$` anchors end of
    * text, which per-LINE application makes equal to Java's per-line `$`.
    */
  val OracleTokensSql: String = {
    var e = "l"
    for ((p, r) <- ChainRules)
      e = s"regexp_replace($e, '${sqlQ(p)}', '${sqlQ(re2Repl(r))}', 'g')"
    e = s"' ' || $e || ' '"
    for ((p, r) <- EndingRules)
      e = s"regexp_replace($e, '${sqlQ(p)}', '${sqlQ(re2Repl(r))}', 'g')"
    for (p <- ContractionRules) {
      val (pat, rep) =
        if (p.contains("(?=")) ("\\b(wan)(na)(\\s)", " \\1 \\2 \\3")
        else (p, " \\1 \\2 ")
      e = s"regexp_replace($e, '${sqlQ(pat)}', '${sqlQ(rep)}', 'gi')"
    }
    // Text.PunctClass is simultaneously Java-regex- and RE2-valid (the
    // TokensOracleSql precedent) — same strip set as [[isPunct]].
    val punct = Text.PunctClass
    s"""list_filter(list_transform(
       |  flatten(list_transform(string_split_regex(text, '\\r\\n|\\r|\\n'),
       |    l -> string_split_regex($e, '$JavaWsClass+'))),
       |  t -> lower(regexp_replace(regexp_replace(t, '^$punct+', ''), '$punct+$$', ''))),
       |  t -> length(t) > 0)""".stripMargin
  }

  /** The reference post-pass strips the same ASCII `string.punctuation`
    * set the engine tokenizer does — one shared definition. */
  private def isPunct(c: Char): Boolean = TokenizeFn.isPunct(c)

  /** One line through the PTB chain → raw PTB tokens. */
  private def ptbLine(line: String, out: java.util.ArrayList[AnyRef]): Unit = {
    var t = line
    var i = 0
    while (i < Chain.length) {
      t = Chain(i)._1.matcher(t).replaceAll(Chain(i)._2); i += 1
    }
    t = " " + t + " "
    i = 0
    while (i < Ending.length) {
      t = Ending(i)._1.matcher(t).replaceAll(Ending(i)._2); i += 1
    }
    i = 0
    while (i < Contractions.length) {
      t = Contractions(i).matcher(t).replaceAll(" $1 $2 "); i += 1
    }
    // whitespace split + reference post-pass (strip/filter/lower)
    val n = t.length
    var p = 0
    while (p < n) {
      while (p < n && Character.isWhitespace(t.charAt(p))) p += 1
      var q = p
      while (q < n && !Character.isWhitespace(t.charAt(q))) q += 1
      if (q > p) {
        var a = p
        var b = q
        while (a < b && isPunct(t.charAt(a))) a += 1
        while (b > a && isPunct(t.charAt(b - 1))) b -= 1
        if (b > a) out.add(UTF8String.fromString(t.substring(a, b)).toLowerCase)
      }
      p = q
    }
  }

  /** Whole input → tokens; the input is processed per LINE because that
    * is the unit the reference hands to `word_tokenize` — the
    * `$`-anchored rules must see line ends, not document end. Line
    * terminators follow universal-newline semantics (`\n`, `\r\n`, or a
    * lone `\r`), matching how the reference's Python `open()` reads the
    * file — so old-Mac `\r` separators and stray CRs split lines the
    * same way in both implementations.
    */
  def compute(s: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    val str = s.toString
    var start = 0
    val n = str.length
    while (start <= n) {
      var i = start
      while (i < n && str.charAt(i) != '\n' && str.charAt(i) != '\r') i += 1
      if (i > start) ptbLine(str.substring(start, i), out)
      start =
        if (i >= n) n + 1
        else if (str.charAt(i) == '\r' && i + 1 < n && str.charAt(i + 1) == '\n') i + 2
        else i + 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_tokens_ptb(text)`: the reference-compat tokenizer contract
  * (PTB chain + strip/lower/filter, [[TokenizePtbFn]]) as one native
  * expression — same static-call codegen pattern as [[Tokenize]], so a
  * projection using it stays inside WholeStageCodegen. This is the
  * fidelity shim for users diffing against a real reference run; the
  * engine spec (`graft_tokens`) remains the default everywhere else —
  * one primitive scan per row vs this chain's ~18 regex passes.
  */
case class TokenizePtb(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens_ptb expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    TokenizePtbFn.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenizePtbFn.compute($c);")

  override def prettyName: String = "graft_tokens_ptb"

  override protected def withNewChildInternal(newChild: Expression): TokenizePtb =
    copy(child = newChild)
}
