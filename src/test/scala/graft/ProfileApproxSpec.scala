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
  *  - the PLAN has no Expand and no Sort operator — the shape claim
  *    the approximate variant exists for (the exact profile pays
  *    Expand×(k+1) rows and a sort of the expanded rows under its
  *    distinct aggregation; the sketch profile must pay neither, or
  *    it is not the scale path). The aggregate node itself may print
  *    as SortAggregate — with an EMPTY grouping key that is a plain
  *    fold, costing no sort; what the assertion bans is the Sort.
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
    val exactPlan = Maintenance.maintProfile(spark, TestSpark.Sf001)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand") && exactPlan.contains("Sort ["),
      "the exact profile no longer pays Expand+Sort — if its plan " +
        "improved, update this contrast (and the operator docs)")
  }
}
