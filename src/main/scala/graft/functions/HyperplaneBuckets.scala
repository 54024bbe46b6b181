package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `lsh_buckets(xd, dim, tables, planes)`: all random-hyperplane LSH
  * bucket ids of a double-vector in ONE expression — for table t, the
  * Horner fold over planes p of the sign bit of `xd · w(t,p)`, with
  * deterministic ±1 weights from `xxhash64(t, p, d)`.
  *
  * This replaces a projection of `tables × planes` separate `dot_d`
  * calls against 64-element plane literals: the arithmetic was already
  * codegen'd, but Janino spent ~1.7 s compiling the resulting
  * generated-code wall per session (measured at sf0.1 — bigger than
  * the query's actual execution). Here codegen is one call into this
  * instance (`addReferenceObj`), and the weight matrix is derived
  * lazily ONCE per JVM from the same Catalyst XxHash64 values, so the
  * buckets are bit-identical to the dot_d formulation (pinned in
  * NativeExprSpec and by the LSH recall floor):
  *  - per plane, the dot accumulates left-to-right `0.0 + w0·x0 + …`,
  *    exactly `dot_d`'s order, and ±1.0·x is exact IEEE sign flip; a
  *    NaN dot (NaN vector element) takes the 1 branch, because Spark's
  *    `>` on doubles is nan-safe total ordering (NaN above everything)
  *    — NOT Java's always-false NaN comparison;
  *  - a vector whose length ≠ dim, or with a null element, takes the
  *    `otherwise(0)` branch of every plane's `when(dot > 0, 1)` — all
  *    buckets 0 — matching dot_d's null-out semantics;
  *  - a NULL input array yields NULL (standard null-intolerant
  *    expression); a caller wanting the fold form's all-zero buckets
  *    for null rows coalesces with a zero array, as lshBuckets does.
  */
case class HyperplaneBuckets(child: Expression, dim: Int, tables: Int,
    planesPerTable: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // planes <= 63: the Horner fold leaves bucket < 2^planes, so 63 sign
    // bits still fit a Long exactly (max 2^63 - 1); a 64th plane's
    // `bucket * 2` would wrap silently and collapse bucket ids with no
    // error (review r16). Validated here so SQL-surface misuse fails at
    // analysis, not as arbitrary collisions.
    case ArrayType(DoubleType, _)
        if dim > 0 && tables > 0 && planesPerTable > 0 && planesPerTable <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets expects (array<double>, positive dim/tables, " +
        s"planes in 1..63), got " +
        s"(${child.dataType.simpleString}, $dim, $tables, $planesPerTable)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // (t)(p)(d) → ±1.0, the same xxhash64(int t, int p, int d) values the
  // previous per-plane literal construction evaluated on the driver
  @transient private lazy val weights: Array[Array[Array[Double]]] =
    Array.tabulate(tables, planesPerTable, dim) { (t, p, d) =>
      val h = new XxHash64(Seq(Literal(t), Literal(p), Literal(d)))
        .eval(null).asInstanceOf[Long]
      if (math.floorMod(h, 2L) == 0L) 1.0 else -1.0
    }

  def compute(xd: ArrayData): ArrayData = {
    val out = new Array[Long](tables)
    // buffer the vector once (tables×planes passes would otherwise
    // re-read every element through ArrayData accessors); a null ELEMENT
    // or ragged length makes every plane's dot_d null → every sign bit
    // takes the otherwise(0) branch → all buckets 0
    val x = new Array[Double](dim)
    var ok = xd.numElements() == dim
    var i = 0
    while (ok && i < dim) {
      if (xd.isNullAt(i)) ok = false else x(i) = xd.getDouble(i)
      i += 1
    }
    if (ok) {
      var t = 0
      while (t < tables) {
        val planes = weights(t)
        var bucket = 0L
        var p = 0
        while (p < planesPerTable) {
          val w = planes(p)
          var dot = 0.0
          var d = 0
          while (d < dim) { dot += w(d) * x(d); d += 1 }
          // sign bit under SPARK comparison semantics, not Java's: the
          // dot_d twin's `when(dot > 0, 1)` compares via
          // nanSafeCompareDoubles, where NaN sorts above every value —
          // so a NaN dot (a NaN vector element) takes the 1 branch there
          // and must take it here, or NaN vectors land in different
          // buckets under the two formulations
          bucket = bucket * 2 +
            (if (dot > 0 || java.lang.Double.isNaN(dot)) 1L else 0L)
          p += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("hyperplanes", this,
        classOf[HyperplaneBuckets].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override def prettyName: String = "lsh_buckets"

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}
