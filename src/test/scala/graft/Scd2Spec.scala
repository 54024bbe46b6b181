package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance

/** Pins the SCD Type-2 contract of [[Maintenance.applyScd2]] beyond what
  * the `maint_scd2` oracle (a point-in-time snapshot compare) can see:
  * the version-chain invariants and — the property that makes the merge
  * safe under at-least-once batch delivery — idempotence of re-applying
  * the same batch.
  */
class Scd2Spec extends AnyFunSuite {

  import TestSpark.spark

  private val dir = TestSpark.Sf0001

  private def dim = graft.engine.Tables.customer(spark, dir)

  test("changed keys get exactly two versions, one open; others one") {
    val out = Maintenance.maintScd2(spark, dir).cache()
    try {
      val changedKeys = dim
        .filter(pmod(col("c_custkey"), lit(53L)) === 0)
        .select("c_custkey").collect().map(_.getLong(0)).toSet
      assert(changedKeys.nonEmpty, "fixture must contain changed keys")

      val perKey = out.groupBy("c_custkey")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_current"), 1L).otherwise(0L)).as("n_open"))
        .collect()
      perKey.foreach { r =>
        val (key, n, nOpen) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(nOpen === 1L, s"key $key must have exactly one open version")
        val expected = if (changedKeys(key)) 2L else 1L
        assert(n === expected, s"key $key has $n versions, expected $expected")
      }

      // interval continuity AND the closed leg's provenance: the closed
      // version must PRESERVE its original valid_from (a copy-paste slip
      // stamping it with eff would pass every count/continuity check),
      // end exactly where the new open version begins, and precede it
      val chains = out.filter(col("c_custkey").isin(changedKeys.toSeq: _*))
        .groupBy("c_custkey")
        .agg(
          min(when(!col("is_current"), col("valid_from"))).as("closed_from"),
          min(when(!col("is_current"), col("valid_to"))).as("closed_to"),
          min(when(col("is_current"), col("valid_from"))).as("open_from"))
        .collect()
      chains.foreach { r =>
        assert(r.getDate(1).toString === Maintenance.Scd2From,
          s"key ${r.getLong(0)}: closed version lost its original valid_from")
        assert(r.getDate(2) === r.getDate(3),
          s"key ${r.getLong(0)}: closed valid_to must equal open valid_from")
        assert(r.getDate(1).before(r.getDate(2)),
          s"key ${r.getLong(0)}: closed interval must have positive length")
      }
    } finally out.unpersist()
  }

  test("no-op batch rows do not create versions") {
    val out = Maintenance.maintScd2(spark, dir)
    val noopKeys = dim
      .filter(pmod(col("c_custkey"), lit(59L)) === 0 &&
        pmod(col("c_custkey"), lit(53L)) =!= 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(noopKeys.nonEmpty, "fixture must contain no-op keys")
    val rows = out.filter(col("c_custkey").isin(noopKeys.toSeq: _*)).collect()
    assert(rows.length === noopKeys.size)
    rows.foreach(r => assert(r.getAs[Boolean]("is_current"),
      s"no-op key ${r.getLong(0)} must keep its single open version"))
  }

  test("re-applying the same batch is a no-op (idempotent merge)") {
    val once = Maintenance.maintScd2(spark, dir)
    val twice = Maintenance.applyScd2(
      once, Maintenance.scd2Batch(dim), Maintenance.Scd2Eff)
    // set-compare via symmetric difference — order-free, null-safe
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty,
      "second apply of an identical batch must not change the table")
  }
}
