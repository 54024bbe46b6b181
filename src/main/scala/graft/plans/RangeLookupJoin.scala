package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GreaterThan, GreaterThanOrEqual, JoinedRow, LessThan, LessThanOrEqual, PredicateHelper, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Interval-lookup join — the whole-operator extension rung
  * (`LogicalPlan` + `Rule` + `SparkStrategy` + `SparkPlan`, deployed via
  * [[graft.functions.GraftExtensions]]).
  *
  * Spark has no physical operator for the band/interval join
  * `probe.v >= r.lo AND probe.v < r.hi`: with a broadcast hint it plans
  * BroadcastNestedLoopJoin, which compares EVERY probe row against EVERY
  * interval — O(n·m) comparisons. That is invisible at 3 bands and fatal
  * at 10⁴ (histogram bucketing, IP-range tables, time-bucket tariffs):
  * at 100 TB of probe rows against 10k intervals, BNLJ does 10k
  * comparisons per row where a sorted lookup needs ~14.
  *
  * [[RangeLookupJoinExec]] sorts the broadcast intervals by `lo` once
  * per partition and binary-searches per probe row, walking left from
  * the insertion point guarded by a running `max(hi)` prefix — correct
  * for OVERLAPPING intervals (each probe row emits every containing
  * interval, like BNLJ) and O(log m + hits) per row when intervals
  * don't overlap; degenerate all-overlapping input degrades to BNLJ's
  * O(m), never worse. The streamed side keeps its partitioning and
  * ordering (`outputPartitioning = left.outputPartitioning`), so the
  * rewrite can never introduce a shuffle.
  *
  * [[RewriteRangeLookup]] fires post-column-pruning (preCBO) and only
  * on the exact safe shape: INNER join, broadcast hint on the interval
  * side, deterministic `v ∈ [lo, hi)` condition with `v` from the big
  * side and `lo`/`hi` from the small side, one shared orderable atomic
  * type. Everything else falls through to Spark's planner untouched;
  * `spark.graft.rangeLookupJoin.enabled=false` is the kill switch.
  * Equivalence to the BNLJ plan is pinned on random overlapping fixtures
  * by `RangeLookupJoinSpec`.
  */
case class RangeLookupJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    probe: Expression,
    lo: Expression,
    hi: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeLookupJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (preCBO — column pruning has already run, so the
  * rewrite can't block it) that turns a hinted BNLJ band join into
  * [[RangeLookupJoin]]. */
case class RewriteRangeLookup(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.rangeLookupJoin.enabled"

  private def enabled: Boolean =
    spark.conf.get(EnabledKey, "true").toBoolean

  /** (probe, bound) if `p` is the lower-bound conjunct `v >= lo`. */
  private def asLower(p: Expression): Option[(Expression, Expression)] = p match {
    case GreaterThanOrEqual(v, l) => Some((v, l))
    case LessThanOrEqual(l, v) => Some((v, l))
    case _ => None
  }

  /** (probe, bound) if `p` is the upper-bound conjunct `v < hi`. */
  private def asUpper(p: Expression): Option[(Expression, Expression)] = p match {
    case LessThan(v, h) => Some((v, h))
    case GreaterThan(h, v) => Some((v, h))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || plan.isStreaming) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint)
          if hint.rightHint.exists(_.strategy.contains(BROADCAST)) &&
            cond.deterministic =>
        val conjuncts = splitConjunctivePredicates(cond)
        val rewritten = conjuncts match {
          case Seq(a, b) =>
            val pair = asLower(a).zip(asUpper(b))
              .orElse(asLower(b).zip(asUpper(a)))
            pair.collect {
              case ((v1, lo), (v2, hi))
                  if v1.semanticEquals(v2) &&
                    v1.references.nonEmpty &&
                    v1.references.subsetOf(l.outputSet) &&
                    lo.references.nonEmpty &&
                    lo.references.subsetOf(r.outputSet) &&
                    hi.references.nonEmpty &&
                    hi.references.subsetOf(r.outputSet) &&
                    v1.dataType == lo.dataType &&
                    v1.dataType == hi.dataType &&
                    RowOrdering.isOrderable(v1.dataType) &&
                    !v1.dataType.isInstanceOf[StructType] &&
                    !v1.dataType.isInstanceOf[ArrayType] &&
                    !v1.dataType.isInstanceOf[MapType] =>
                RangeLookupJoin(l, r, v1, lo, hi)
            }
          case _ => None
        }
        rewritten.getOrElse(j)
    }
  }
}

/** Plans [[RangeLookupJoin]]; everything else falls through. */
object RangeLookupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeLookupJoin(left, right, probe, lo, hi) =>
      RangeLookupJoinExec(planLater(left), planLater(right), probe, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Broadcast interval-lookup join: the interval side arrives through a
  * standard `BroadcastExchange` (identity mode — AQE-visible, reused
  * across plans like any broadcast), the probe side streams through
  * unchanged. */
case class RangeLookupJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    probe: Expression,
    lo: Expression,
    hi: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the streamed side passes through row-by-row, so its sort order
  // survives — without this override EnsureRequirements would re-sort
  // the probe side for any downstream sort-consuming operator
  override def outputOrdering: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val broadcastRel = right.executeBroadcast[Array[InternalRow]]()
    val loBound = BindReferences.bindReference(lo, right.output)
    val hiBound = BindReferences.bindReference(hi, right.output)
    val probeBound = BindReferences.bindReference(probe, left.output)
    val dt = probe.dataType
    val numOutputRows = longMetric("numOutputRows")

    left.execute().mapPartitions({ iter =>
      val ord = TypeUtils.getInterpretedOrdering(dt)
      // Build the sorted lookup once per partition: intervals sorted by
      // lo, plus a running max(hi) prefix so the leftward walk can stop
      // the moment no earlier interval can still contain v. A null
      // bound matches nothing (SQL comparison semantics) — drop at build.
      val kept = broadcastRel.value.flatMap { row =>
        val lv = loBound.eval(row)
        val hv = hiBound.eval(row)
        if (lv != null && hv != null) Some((lv, hv, row)) else None
      }.sortBy(_._1)(ord)
      val m = kept.length
      val lows = new Array[Any](m)
      val his = new Array[Any](m)
      val rows = new Array[InternalRow](m)
      val maxHis = new Array[Any](m)
      var i = 0
      while (i < m) {
        lows(i) = kept(i)._1
        his(i) = kept(i)._2
        rows(i) = kept(i)._3
        maxHis(i) = if (i == 0) his(0)
          else if (ord.gt(his(i), maxHis(i - 1))) his(i) else maxHis(i - 1)
        i += 1
      }
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(output, output)

      // rightmost index with lows(idx) <= v, or -1
      def rightmostLeq(v: Any): Int = {
        var a = 0
        var b = m
        while (a < b) {
          val mid = (a + b) >>> 1
          if (ord.lteq(lows(mid), v)) a = mid + 1 else b = mid
        }
        a - 1
      }

      iter.flatMap { probeRow =>
        val v = probeBound.eval(probeRow)
        if (v == null) Iterator.empty
        else new Iterator[InternalRow] {
          private var j = rightmostLeq(v)
          seek()
          /** Walk left to the next interval containing v; stop when the
            * max(hi) prefix proves none remain. */
          private def seek(): Unit = {
            while (j >= 0) {
              if (ord.lteq(maxHis(j), v)) { j = -1; return }
              if (ord.lt(v, his(j))) return
              j -= 1
            }
          }
          override def hasNext: Boolean = j >= 0
          override def next(): InternalRow = {
            val out = proj(joined(probeRow, rows(j)))
            numOutputRows += 1
            j -= 1
            seek()
            out
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeLookupJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Runtime installation fallback for externally-built sessions (the
  * shared test session); [[graft.functions.GraftExtensions]] sessions
  * get both pieces at build time. Idempotent. */
object RangeLookup {
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(RangeLookupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeLookupStrategy
    }
    val already = spark.experimental.extraOptimizations.exists {
      case RewriteRangeLookup(_) => true
      case _ => false
    }
    if (!already) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRangeLookup(spark)
    }
  }
}
