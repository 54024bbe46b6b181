package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd membership count: how many elements of `left` (with
  * multiplicity) appear in the set `right`. Equivalent to the HOF form
  * `size(filter(left, t => t.isin(set: _*)))` — which runs interpreted
  * (array HOFs never enter whole-stage codegen) and was 4–5 of the per-row
  * passes that made `text_stats`/`text_langid` the slowest scans in the r2
  * bench. The typical `right` is a small literal stopword list, so the
  * nested scan is a handful of `UTF8String.equals` per token inside the
  * generated loop.
  *
  * Null semantics match the HOF form: a null ELEMENT of `left` never
  * counts (`isin(null)` is null → dropped by `filter`); a null input
  * array yields null (BinaryExpression default).
  */
case class CountInSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_in expects (array<string>, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val set = b.asInstanceOf[ArrayData]
    // hoist both lengths out of the loops — numElements() is a virtual
    // call per test otherwise, ~tokens×set of them per row
    val n = xs.numElements()
    val setLen = set.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val x = xs.getUTF8String(i)
        var j = 0
        var found = false
        while (!found && j < setLen) {
          if (!set.isNullAt(j) && set.getUTF8String(j).equals(x)) found = true
          j += 1
        }
        if (found) acc += 1L
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val found = ctx.freshName("found")
      val n = ctx.freshName("n")
      val setLen = ctx.freshName("setLen")
      // lengths hoisted out of the loops, as in the interpreted path
      s"""
         |long $acc = 0L;
         |final int $n = $a.numElements();
         |final int $setLen = $b.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $x = $a.getUTF8String($i);
         |    boolean $found = false;
         |    for (int $j = 0; !$found && $j < $setLen; $j++) {
         |      if (!$b.isNullAt($j) && $b.getUTF8String($j).equals($x)) $found = true;
         |    }
         |    if ($found) $acc++;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override def prettyName: String = "count_in"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInSet =
    copy(left = newLeft, right = newRight)
}

object CountIn {

  /** Runtime-registration fallback; delegates to [[GraftFunctions]]. */
  def register(spark: SparkSession): Unit = GraftFunctions.register(spark)
}
