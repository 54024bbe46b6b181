package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance

/** Hard bounds for the rows-only maint_sketch_rollup query: the
  * DataSketches HLL estimate must land within the family's error bound
  * of the EXACT distinct count (lgK=14 → rsd ≈ 1.04/√2¹⁴ ≈ 0.8%; the
  * 5% gate is >6 sigma), the exact n_events side-channel must be
  * exactly right (it is decomposable arithmetic, no excuse), and the
  * property the operator exists for must hold: unioning the STORED
  * per-day sketches estimates the same cardinality as one direct
  * sketch over the same raw rows — merge-then-estimate ≈
  * estimate-of-merged, which is what lets a 100 TB pipeline answer
  * range queries from KB of sketch state.
  */
class SketchRollupSpec extends AnyFunSuite {

  test("stored-sketch union matches exact distincts and a direct sketch") {
    val spark = TestSpark.spark
    val dir = TestSpark.Sf001

    val rolled = Maintenance.maintSketchRollup(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rolled.nonEmpty)

    val ev = graft.engine.Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
    val hi = ev.agg(max(col("day"))).collect()(0).getDate(0)
    val windowed = ev.filter(col("day") > date_sub(lit(hi), 28))

    val exact = windowed
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rolled.keySet === exact.keySet)

    val direct = windowed
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14)))
        .as("users"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    rolled.foreach { case (et, (approxUsers, nEvents)) =>
      val (exactUsers, exactN) = exact(et)
      assert(nEvents === exactN, s"event count drifted for $et")
      val relErr = math.abs(approxUsers - exactUsers).toDouble / exactUsers
      assert(relErr <= 0.05,
        s"$et: estimate $approxUsers vs exact $exactUsers (relErr $relErr)")
      val mergeDrift =
        math.abs(approxUsers - direct(et)).toDouble / math.max(1L, direct(et))
      assert(mergeDrift <= 0.02,
        s"$et: union-of-daily $approxUsers vs direct ${direct(et)}")
    }
  }

  test("stored sketch state is KB-bounded regardless of group size") {
    // the claim the operator exists for: range queries touch KB of
    // sketch state, not the raw events — so the per-group sketch must
    // stay bounded (an lgK=14 HLL saturates at ~2^14 registers) and
    // must NOT grow linearly with the rows it summarizes
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.{length => blen}
    Maintenance.maintSketchRollup(spark, TestSpark.Sf001).collect()
    val snap = spark.read.parquet(
      graft.sources.Formats.tmp("maint_hll_daily", TestSpark.Sf001))
    val rows = snap
      .select(blen(col("user_sketch")).as("b"), col("n_events"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val maxBytes = rows.map(_._1).max
    assert(maxBytes <= 64 * 1024,
      s"sketch grew to $maxBytes bytes — not the KB-bounded state the design claims")
    // bytes-per-summarized-row must FALL as groups grow (saturation),
    // ruling out any linear dependence on group size
    val big = rows.maxBy(_._2); val small = rows.minBy(_._2)
    if (big._2 >= small._2 * 4)
      assert(big._1.toDouble / big._2 < small._1.toDouble / small._2,
        s"sketch bytes track row count: $small vs $big")
  }
}
