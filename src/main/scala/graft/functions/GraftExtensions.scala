package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's SparkSessionExtensions entry point — the deployment
  * route for everything the per-query `register(...)` calls install at
  * runtime: the four native expressions, the MinHash union aggregate,
  * and the HOF-dot-product optimizer rule. A session owner wires it
  * with either
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

  private def fn(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("dot_l", classOf[DotProductLong],
      exprs => DotProductLong(exprs.head, exprs(1))))
    ext.injectFunction(fn("dot_d", classOf[DotProductDouble],
      exprs => DotProductDouble(exprs.head, exprs(1))))
    ext.injectFunction(fn("count_in", classOf[CountInSet],
      exprs => CountInSet(exprs.head, exprs(1))))
    ext.injectFunction(fn("minhash_sigs", classOf[MinHashSignature],
      exprs => MinHashSignature(exprs.head, exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction(fn("minhash_union", classOf[MinHashUnion],
      exprs => MinHashUnion(exprs.head, exprs(1).eval().asInstanceOf[Int])
        .toAggregateExpression()))
    ext.injectOptimizerRule(_ => RewriteDotProduct)
  }
}
