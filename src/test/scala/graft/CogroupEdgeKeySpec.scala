package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Pins qCogroupReconcile's edge-key arms — the ones the shipped
  * (unique-key, non-null) fixtures never exercise and the round-15
  * review found unguarded:
  *
  *  - a NULL o_orderkey order forms its own group (Option key), joins
  *    no lines, and still emits its header row;
  *  - duplicate keys with DIFFERENT prices emit one row per price
  *    (header.head used to drop all but an arbitrary one);
  *  - duplicate keys with the SAME price scale counts and sums by the
  *    multiplicity, exactly like the oracle's GROUP BY (key, price)
  *    over the join output;
  *  - NULL header price NULL-propagates into order/diff cents;
  *  - NULL line price counts as a line but adds 0 cents (sum skips
  *    NULLs, coalesced to 0);
  *  - NULL line keys match nothing and vanish.
  *
  * Double-checked: once against hand-computed rows, once against the
  * oracle-shaped SQL evaluated by Spark itself on the same planted
  * tables (the same standard-SQL semantics DuckDB applies in the
  * driver gate).
  */
class CogroupEdgeKeySpec extends AnyFunSuite {

  test("cogroup reconcile matches join-group semantics on NULL and duplicate keys") {
    val spark = TestSpark.spark
    import spark.implicits._

    val ts = Timestamp.valueOf("1995-06-15 00:00:00")
    val orders = Seq[(Option[Long], Long, String, Option[Double], Timestamp, String)](
      (Some(1L), 10L, "O", Some(100.00), ts, "1-URGENT"),
      (Some(2L), 10L, "O", Some(55.50), ts, "2-HIGH"),   // dup key,
      (Some(2L), 11L, "F", Some(77.25), ts, "3-MEDIUM"), //   different price
      (Some(3L), 12L, "O", Some(20.00), ts, "4-NOT SPECIFIED"), // dup key,
      (Some(3L), 12L, "O", Some(20.00), ts, "4-NOT SPECIFIED"), //   same price
      (None, 12L, "O", Some(40.00), ts, "5-LOW"),        // NULL key
      (Some(4L), 13L, "O", None, ts, "5-LOW"))           // NULL price
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val lineitem = Seq[(Option[Long], Long, Long, Int, Option[Double])](
      (Some(1L), 1L, 1L, 1, Some(30.00)),
      (Some(1L), 2L, 1L, 2, Some(50.00)),
      (Some(1L), 3L, 1L, 3, None),        // NULL price: counts, adds 0
      (Some(2L), 1L, 1L, 1, Some(10.00)),
      (Some(3L), 1L, 1L, 1, Some(5.00)),
      (Some(3L), 2L, 1L, 2, Some(7.00)),
      (Some(4L), 1L, 1L, 1, Some(9.00)),
      (None, 1L, 1L, 1, Some(999.99)))    // NULL line key: vanishes
      .map { case (k, p, s, ln, price) =>
        (k, p, s, ln, Some(1.0), price, Some(0.0), Some(0.0), "N", "O", ts)
      }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")

    val dataDir = java.nio.file.Files
      .createTempDirectory("graft_cogroup_edge").resolve("data")
    TestSpark.plantParquetFileInto(orders, dataDir, "orders.parquet")
    TestSpark.plantParquetFileInto(lineitem, dataDir, "lineitem.parquet")
    val dir = dataDir.toString

    val got = Relational.qCogroupReconcile(spark, dir).collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toSeq

    val expected = Seq(
      (Some(1L), 3L, 8000L, Some(10000L), Some(2000L)),
      (Some(2L), 1L, 1000L, Some(5550L), Some(4550L)),
      (Some(2L), 1L, 1000L, Some(7725L), Some(6725L)),
      (Some(3L), 4L, 2400L, Some(2000L), Some(-400L)), // 2 headers × 2 lines
      (None, 0L, 0L, Some(4000L), Some(4000L)),
      (Some(4L), 1L, 900L, None, None))
    assert(got.sortBy(_.toString) === expected.sortBy(_.toString))

    // the oracle-shaped SQL on the SAME planted tables, evaluated by
    // Spark (standard join-group semantics, as DuckDB evaluates in the
    // driver gate) must agree row-for-row with the typed cogroup
    graft.engine.Tables.orders(spark, dir).createOrReplaceTempView("cg_edge_o")
    graft.engine.Tables.lineitem(spark, dir).createOrReplaceTempView("cg_edge_l")
    val twin = spark.sql(
      """SELECT o.o_orderkey AS orderkey,
        |  count(l.l_orderkey) AS n_lines,
        |  CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0)
        |       AS BIGINT) AS line_cents,
        |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS order_cents,
        |  CAST(round(o.o_totalprice * 100) AS BIGINT)
        |    - CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0)
        |           AS BIGINT) AS diff_cents
        |FROM cg_edge_o o LEFT JOIN cg_edge_l l ON o.o_orderkey = l.l_orderkey
        |GROUP BY o.o_orderkey, o.o_totalprice""".stripMargin)
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toSeq
    assert(twin.sortBy(_.toString) === expected.sortBy(_.toString),
      "the SQL twin disagrees with the hand-computed truth — the " +
        "oracle semantics themselves moved")
  }
}
