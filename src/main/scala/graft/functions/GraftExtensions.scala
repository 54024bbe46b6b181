package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The ONE canonical list of the engine's function registrations,
  * consumed by both deployment routes — [[GraftExtensions]] (session
  * builder / spark.sql.extensions) and the runtime `register` fallbacks
  * on [[DotProduct]]/[[CountIn]]/[[MinHash]] — so the two routes cannot
  * drift: a builder fix lands in both by construction.
  */
object GraftFunctions {

  type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Wraps a builder with an arity gate so a malformed SQL call fails
    * with a named argument-count error instead of a raw
    * IndexOutOfBoundsException from `exprs(i)`. */
  private def fn(name: String, arity: Int, clazz: Class[_],
      builder: Seq[Expression] => Expression): Description =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      exprs => {
        if (exprs.length != arity) throw new IllegalArgumentException(
          s"$name expects $arity argument(s), got ${exprs.length}")
        builder(exprs)
      })

  /** Plan-time scalar parameter (signature width, shingle n, ...): must
    * be a foldable integral expression. Guarded so SQL-surface misuse —
    * a non-literal column, a non-integral type — reads as a named
    * argument error, not a ClassCastException / unbound-attribute eval
    * crash from `eval().asInstanceOf[Int]`. */
  private def intLit(name: String, arg: String, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$name: $arg must be a literal integer, got non-constant ${e.sql}")
    e.eval() match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long
          if l.longValue >= Int.MinValue && l.longValue <= Int.MaxValue =>
        l.intValue
      case s: java.lang.Short => s.intValue
      case b: java.lang.Byte => b.intValue
      case other => throw new IllegalArgumentException(
        s"$name: $arg must be a literal integer, got " +
          s"${e.dataType.simpleString} ${String.valueOf(other)}")
    }
  }

  val all: Seq[Description] = Seq(
    // the builder runs at analysis time on the driver, so SQLConf.get is
    // the calling session's conf: dot_l inherits the session's ANSI
    // arithmetic exactly as the HOF chain it documents itself against
    // (DotProductLong doc; review r16)
    fn("dot_l", 2, classOf[DotProductLong],
      exprs => DotProductLong(exprs.head, exprs(1),
        failOnOverflow =
          org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)),
    fn("dot_d", 2, classOf[DotProductDouble],
      exprs => DotProductDouble(exprs.head, exprs(1))),
    fn("count_in", 2, classOf[CountInSet],
      exprs => CountInSet(exprs.head, exprs(1))),
    fn("minhash_sigs", 2, classOf[MinHashSignature],
      exprs => MinHashSignature(exprs.head,
        intLit("minhash_sigs", "k", exprs(1)))),
    fn("minhash_union", 2, classOf[MinHashUnion],
      exprs => MinHashUnion(exprs.head,
        intLit("minhash_union", "k", exprs(1))).toAggregateExpression()),
    fn("lsh_buckets", 4, classOf[HyperplaneBuckets],
      exprs => HyperplaneBuckets(exprs.head,
        intLit("lsh_buckets", "dim", exprs(1)),
        intLit("lsh_buckets", "tables", exprs(2)),
        intLit("lsh_buckets", "planes", exprs(3)))),
    fn("graft_tokens", 1, classOf[Tokenize],
      exprs => Tokenize(exprs.head)),
    fn("graft_tokens_ptb", 1, classOf[TokenizePtb],
      exprs => TokenizePtb(exprs.head)),
    fn("nfc_normalize", 1, classOf[NfcNormalize],
      exprs => NfcNormalize(exprs.head)),
    fn("strip_accents", 1, classOf[StripAccents],
      exprs => StripAccents(exprs.head)),
    fn("graft_shingles", 2, classOf[Shingles],
      exprs => Shingles(exprs.head, intLit("graft_shingles", "n", exprs(1)))))

  /** Runtime registration on a live session (idempotent — re-registering
    * replaces with the identical builder). The first identifier doubles
    * as the already-registered sentinel: the only writers are this
    * method and the extension injection, and both install the whole
    * list — so one lookup short-circuits the call-per-Column fast path
    * (Text.tokens & co. call this on every Column construction). The
    * SENTINEL IS REGISTERED LAST (review r16): registering it first
    * would publish "installed" to a concurrent caller on the shared
    * session while the rest of the list is still missing — that caller
    * would skip installation and hit an undefined-function analysis
    * error on e.g. graft_shingles. With the sentinel last, a racing
    * reader either sees it absent (and runs the idempotent install
    * itself) or sees the complete list. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(all.head._1)) {
      (all.tail :+ all.head).foreach { case (id, info, builder) =>
        registry.registerFunction(id, info, builder)
      }
    }
  }
}

/** The engine's SparkSessionExtensions entry point — the deployment
  * route for everything the per-query `register(...)` calls install at
  * runtime: the native expressions, the MinHash union aggregate, and
  * the HOF-dot-product optimizer rule. A session owner wires it with
  * either
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions()), or
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * and every session (and `newSession()` clone) gets the full surface
  * with no per-query registration. The graft mains (Smoke / Verify /
  * Bench) build their sessions through this class, so the whole
  * correctness battery runs against extension-injected sessions — the
  * runtime `register` calls remain only as idempotent fallbacks for
  * externally-created sessions (e.g. the shared test session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    // interval-lookup join: rewrite fires preCBO (after column pruning,
    // before join planning); the strategy plans the node it introduces
    ext.injectPreCBORule(s => graft.plans.RewriteRangeLookup(s))
    ext.injectPlannerStrategy(_ => graft.plans.RangeLookupStrategy)
  }
}
