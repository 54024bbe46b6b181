package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the word-count flagship and the
  * text-analysis / dedup operators.
  *
  * Tokenizer spec (the engine's documented contract, mirrored 1:1 in the
  * DuckDB oracle SQL so correctness is judged engine-vs-oracle):
  *
  *   1. split on runs of whitespace (Java `\s+`, i.e. ` \t\n\x0B\f\r` —
  *      the oracle spells the class out because RE2's `\s` lacks `\x0B`)
  *   2. strip leading/trailing ASCII punctuation (Python
  *      `string.punctuation`, i.e. the three ASCII ranges `!-/`, `:-@`,
  *      `[-`` ` `` and `{-~`); interior punctuation survives
  *      (`U.S.A.` → `U.S.A`, `don't` → `don't`)
  *   3. lowercase
  *   4. drop empty tokens
  *
  * This reproduces the reference tokenizer's strip/lower/filter behavior
  * (reference: src/worker.py:37-53) with a precisely-specified split rule
  * instead of NLTK's model-dependent one (SURVEY.md §7 hard-part 1).
  *
  * Everything here is built from codegen'd Catalyst expressions
  * (`split`/`transform`/`regexp_replace`/`filter`) — no UDFs, so the whole
  * pipeline stays inside WholeStageCodegen at 100 TB.
  */
object Text {

  /** ASCII `string.punctuation` as a Java-regex character class. */
  val PunctClass = "[!-/:-@\\[-`{-~]"

  /** The whitespace characters of the split rule (Java `\s`'s set),
    * spelled explicitly because DuckDB/RE2's `\s` lacks `\x0B` (vertical
    * tab) — a bare `\s` in the oracle would diverge from the native
    * tokenizer on any text containing a VT. Every escape here is valid
    * in BOTH Java regex and RE2, so [[WsClassRe2]] is interpolated by
    * engine-side `normalize` and oracle-side SQL alike — ONE definition,
    * one edit if the whitespace set ever changes; [[Tokenize.isWs]] is
    * property-pinned to the same set (NativeExprPropSpec). */
  val WsChars = """ \t\n\x0B\f\r"""

  /** [[WsChars]] as a character class (Java-regex- and RE2-valid). */
  val WsClassRe2 = s"[$WsChars]"

  /** DuckDB twin of `tokens` for oracle SQL — the single definition every
    * oracle interpolates, so a tokenizer-spec change is one edit. */
  val TokensOracleSql: String =
    raw"""list_filter(list_transform(string_split_regex(text, '$WsClassRe2+'),
      |    t -> lower(regexp_replace(regexp_replace(t, '^[!-/:-@\[-`{-~]+', ''), '[!-/:-@\[-`{-~]+$$', ''))),
      |    t -> length(t) > 0)""".stripMargin

  /** Strip leading+trailing ASCII punctuation then lowercase. The
    * trailing anchor is `\z` (absolute end of input), NOT `$`: Java's
    * `$` also matches BEFORE a final U+0085/U+2028/U+2029 line
    * terminator, which would strip punctuation ahead of a trailing NEL —
    * diverging from both the native [[Tokenize]] scan and the DuckDB
    * oracle's RE2 `$` (end-of-text). With `\z` all three agree. */
  def cleanToken(t: Column): Column =
    lower(regexp_replace(regexp_replace(t, s"^$PunctClass+", ""), s"$PunctClass+\\z", ""))

  /** Register-then-call for the native expressions: registration rides
    * the ACTIVE session (the one assembling this very query plan on the
    * driver), so every call site — operator or test — resolves without
    * per-operator register calls; [[GraftExtensions]] sessions already
    * carry the list and the lookup short-circuits. ONE definition for
    * all three consumers below, so the registration strategy cannot
    * drift between them (review r16). */
  private def registered(name: String, cols: Column*): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    call_function(name, cols: _*)
  }

  /** Line/document → array of clean non-empty tokens, as the native
    * codegen'd [[Tokenize]] expression — one primitive scan per row
    * where the HOF twin below pays interpreted lambda dispatch plus two
    * regex machines per token, in the hot path of every text / dedup /
    * wordcount query. */
  def tokens(c: Column): Column = registered("graft_tokens", c)

  /** Reference-compat (Penn Treebank) tokenizer — the fidelity shim for
    * byte-parity with the reference's NLTK pipeline (contraction splits,
    * MacIntyre specials; contract on [[TokenizePtb]]). The engine spec
    * [[tokens]] stays the default: it is one primitive scan per row
    * where this pays the ~18-pass PTB regex chain.
    */
  def tokensPtb(c: Column): Column = registered("graft_tokens_ptb", c)

  /** The declarative HOF formulation of the SAME tokenizer spec — kept
    * as the reference twin [[Tokenize]] is pinned bit-identical to
    * (NativeExprPropSpec random-input property + corpus golden counts). */
  def tokensHof(c: Column): Column =
    filter(transform(split(c, s"$WsClassRe2+"), cleanToken _), t => length(t) > 0)

  /** Reference bucket function: codepoint of first char mod M
    * (reference: src/worker.py:76). `ascii` returns the codepoint of the
    * first character — identical to Python `ord` for all BMP chars.
    * This MUST be the partitioning expression for the bucketed sink
    * (user-visible output-file assignment), not default Murmur3 hash.
    */
  def bucket(word: Column, m: Int): Column = pmod(ascii(word), lit(m)).cast("long")

  /** Whitespace-collapse + trim + lowercase — dedup normalization. The
    * collapse regex interpolates [[WsClassRe2]] (not Java `\s`), so the
    * engine and the oracle twin ([[graft.operators.Dedup.ContentHashSql]])
    * share the whitespace set BY CONSTRUCTION. */
  def normalize(c: Column): Column = lower(trim(regexp_replace(c, s"$WsClassRe2+", " ")))

  /** Array of word-level n-gram shingles (space-joined) from a token
    * array; empty array when the doc has fewer than n tokens. Native
    * [[Shingles]] expression (registration rides the active session as
    * in [[tokens]]); the HOF twin below is the pinned reference.
    */
  def shingles(toks: Column, n: Int): Column =
    registered("graft_shingles", toks, lit(n))

  /** Declarative twin of [[shingles]] — the pinned reference form. The
    * explicit NULL arm keeps the twins identical on NULL input: the
    * native expression is null-intolerant (NULL in → NULL out), while a
    * bare `when(size(toks) >= n, ...).otherwise(array())` would send a
    * NULL array down the otherwise branch and emit `[]` — a silent
    * []-vs-NULL divergence for any consumer that distinguishes them
    * (size() = 0 vs NULL, non-outer explode). */
  def shinglesHof(toks: Column, n: Int): Column =
    when(toks.isNull, lit(null).cast("array<string>"))
      .when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
}
