package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance

/** Bounds for [[Maintenance.maintProfileApprox]], the HLL-sketch twin
  * of the exact ANALYZE profiler. Three pins:
  *
  *  - every NON-NDV cell (table, column, null count, typed min/max)
  *    equals the exact profile's EXACTLY — the sketch swap touches the
  *    NDV aggregate and nothing else;
  *  - every NDV estimate is within the HLL++ relative-error bound of
  *    the exact NDV (default rsd 0.05 → spec allows 3×rsd = 15 %, the
  *    same 3-sigma posture as ApproxDistinctSpec);
  *  - the PLAN has no Expand and no Sort operator — the sketch swap
  *    must remove the multi-DISTINCT expansion entirely (the exact
  *    profile still pays Expand×k scanned rows; both variants must be
  *    SORT-free — the exact one because its NDV half hash-aggregates
  *    alone and its mixed-type fold half is global). An aggregate node
  *    may print as SortAggregate — with an EMPTY grouping key that is
  *    a plain fold, costing no sort; what the assertions ban is the
  *    Sort operator.
  */
class ProfileApproxSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def byKey(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getAs[String]("tbl"), r.getAs[String]("col")) -> r
    }.toMap

  test("non-NDV columns are exactly the exact profile's; NDV within HLL++ bound") {
    val exact = byKey(Maintenance.maintProfile(spark, TestSpark.Sf001))
    val approx = byKey(Maintenance.maintProfileApprox(spark, TestSpark.Sf001))
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (key, e) =>
      val a = approx(key)
      for (f <- Seq("n_nulls", "min_num", "max_num", "min_str", "max_str")) {
        assert(a.getAs[Any](f) === e.getAs[Any](f),
          s"$key.$f drifted under the sketch swap")
      }
      val nd = e.getAs[Long]("n_distinct")
      val ndA = a.getAs[Long]("n_distinct")
      assert(math.abs(ndA - nd) <= math.max(1L, (0.15 * nd).toLong),
        s"$key: approx NDV $ndA outside 15% of exact $nd")
    }
  }

  test("plan shape: no Expand, no Sort — the multi-DISTINCT machinery is gone") {
    val plan = Maintenance.maintProfileApprox(spark, TestSpark.Sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "approx profile still plans an Expand — the sketch swap failed to " +
        "remove the multi-DISTINCT expansion")
    // SortExec prints as `Sort [keys...`; SortAggregate(key=[]) does not
    // match and is the empty-key fold the global aggregate legitimately
    // uses for its variable-width string min/max buffers
    assert(!plan.contains("Sort ["),
      "approx profile plans a Sort — rows are being ordered somewhere, " +
        "which the no-distinct global aggregate should never need")
  }

  test("exact profile plan: Expand for the NDV half, but NO Sort anywhere") {
    // the exact profiler's split shape: the multi-DISTINCT Expand is
    // inherent to exact NDVs, but isolating it from the string min/max
    // buffers lets the whole Expand pipeline HashAggregate — a Sort
    // reappearing means the two halves were re-merged into one
    // SortAggregate over the k×-expanded corpus (the r12 6.7→3 s bug
    // shape)
    val exactPlan = Maintenance.maintProfile(spark, TestSpark.Sf001)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact profile lost its Expand — exact multi-DISTINCT NDVs " +
        "cannot plan without it; if this improved for real, update docs")
    assert(!exactPlan.contains("Sort ["),
      "exact profile plans a Sort — the NDV half is no longer hash-" +
        "aggregating alone (see the maintProfile plan-shape doc)")
  }
}
