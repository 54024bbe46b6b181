package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the natural declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, v) => acc + v)
  *
  * into the codegen'd [[DotProductLong]] when both inputs are
  * `array<long>`. Array higher-order functions run interpreted (~20×
  * slower for this loop, measured at sf0.1), so a user writing the
  * idiomatic HOF form gets the fast path without knowing `dot_l` exists
  * — the preference-ladder move from "compose built-ins" to "native
  * Expression" done BY the engine rather than by every query author.
  *
  * Null semantics are preserved exactly: DotProductLong returns null for
  * null inputs and null elements, as the HOF chain does. Installed via
  * `spark.experimental.extraOptimizations` (the public hook for extra
  * optimizer rules on an existing session; a deployment owning the
  * session builder would use `SparkSessionExtensions.injectOptimizerRule`).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** merge/zip lambdas must combine exactly their own two variables. */
  private def combinesOwnArgs(fn: LambdaFunction): Option[String] = fn match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), args, _)
        if args.map(_.exprId).toSet == Set(x, y).map(_.exprId) => Some("mul")
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _), args, _)
        if args.map(_.exprId).toSet == Set(x, y).map(_.exprId) => Some("add")
    case _ => None
  }

  private def isIdentity(fn: LambdaFunction): Boolean = fn match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg), _) => v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, zipFn: LambdaFunction),
          Literal(0L, LongType),
          mergeFn: LambdaFunction,
          finishFn: LambdaFunction)
        if isLongArray(a) && isLongArray(b) &&
          combinesOwnArgs(zipFn).contains("mul") &&
          combinesOwnArgs(mergeFn).contains("add") &&
          isIdentity(finishFn) =>
      DotProductLong(a, b)
  }

  /** Install on a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
}
