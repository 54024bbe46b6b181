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

  test("stored sketch state is KB-bounded and saturates, never linear in group size") {
    // the claim the operator exists for: range queries touch KB of
    // sketch state, not the raw events. The shipped sf0.01 fixture's
    // group sizes span only ~47-86 rows, which made a spread-guarded
    // saturation assert dead code — plant a 100x-spread corpus instead
    // so the claim is ALWAYS checked (a regression storing exact user
    // sets would scale the hot group's state ~100x and fail both
    // asserts below).
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{length => blen}
    val t0 = 1704067200000000L // 2024-01-01T00:00:00Z micros
    val hot = (0 until 20000).map(i =>
      (i.toLong, t0 + i, (i % 15000).toLong, "hot", 1.0, "{}"))
    val cold = (0 until 200).map(i =>
      ((100000 + i).toLong, t0 + i, (200000 + i).toLong, "cold", 1.0, "{}"))
    val dir = TestSpark.plantParquetFile(
      (hot ++ cold).toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events.parquet")
    Maintenance.maintSketchRollup(spark, dir) // writes the snapshot eagerly
    val snap = spark.read.parquet(
      graft.sources.Formats.tmp("maint_hll_daily", dir))
    val rows = snap
      .select(col("event_type"), blen(col("user_sketch")).as("b"), col("n_events"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val (hotB, hotN) = rows("hot")
    val (coldB, coldN) = rows("cold")
    assert(hotN === 20000L && coldN === 200L, "planted group sizes drifted")
    assert(hotB <= 64 * 1024,
      s"sketch grew to $hotB bytes — not the KB-bounded state the design claims")
    // saturation, both ways: bytes-per-summarized-row must FALL as the
    // group grows, and 100x the rows (75x the distincts) must cost far
    // less than 100x the bytes
    assert(hotB.toDouble / hotN < coldB.toDouble / coldN,
      s"sketch bytes track row count: hot ($hotB B, $hotN rows) vs cold ($coldB B, $coldN rows)")
    assert(hotB < coldB * 25L,
      s"hot sketch $hotB B vs cold $coldB B — state is not saturating")
  }
}
