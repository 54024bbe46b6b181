package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Exact.dsum6
import graft.operators.Relational

/** Randomized equivalence pins for the TPC-H queries whose Spark form
  * REWRITES the reference SQL rather than transcribing it: Q19 authors
  * derived single-side envelopes next to the cross-side disjunction,
  * and Q7 pre-filters the nation dimension to the two trade nations
  * before the fact joins and applies only the same-nation exclusion as
  * a residual. The DuckDB oracle pins each rewrite on the fixed
  * corpus; these properties pin the REWRITE ITSELF on randomized
  * corpora engineered to hit the edges (rows on every band boundary,
  * brands/sizes/quantities outside every envelope, same-nation trade
  * rows that the residual must drop). Seeded generators — failures
  * reproduce.
  */
class TpchRewriteEquivalenceSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val plantedRoots = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  override def afterAll(): Unit = plantedRoots.foreach { root =>
    org.apache.commons.io.FileUtils.deleteQuietly(root.toFile); ()
  }

  /** The three Q19 bands as (brand, size upper edge, qty lo, qty hi) —
    * SHARED with the production query, so a band change re-points the
    * planted edge rows and q19Raw automatically instead of leaving this
    * spec pinning stale semantics. */
  private val Q19Bands = Relational.Q19Bands

  private def plantTables(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    val root = java.nio.file.Files.createTempDirectory(s"graft_tpch_eq_$seed")
    plantedRoots += root
    val dataDir = root.resolve("data")
    // pinned band-edge coverage: random partkeys almost never land a
    // boundary quantity on a part of the matching brand/size (replayed
    // seeds 1-3: zero edge hits), so a narrowed authored envelope would
    // survive every seed without these — per band, a part ON the size
    // edge and one past it, lineitems ON both quantity edges (in) and
    // one past each (out), and the size-out twin with an in quantity
    val pinnedParts = Q19Bands.zipWithIndex.flatMap { case ((b, szHi, _, _), i) =>
      val pk = 61L + i * 2
      Seq((pk, s"edge_in_$pk", b, "STANDARD", szHi, 500.0),
        (pk + 1, s"edge_out_${pk + 1}", b, "STANDARD", szHi + 1, 500.0))
    }
    // parts: brands beyond the query's three, sizes saturating 1..50
    // (both envelope boundaries 15/25/35 land on generated values)
    val parts = ((1L to 60L).map { pk =>
      (pk, s"part$pk", s"Brand#${rnd.nextInt(30) + 1}", "STANDARD",
        rnd.nextInt(50) + 1, 100.0 + rnd.nextInt(900))
    } ++ pinnedParts)
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val pinnedLines = Q19Bands.zipWithIndex.flatMap { case ((_, _, qLo, qHi), i) =>
      val pkIn = 61L + i * 2
      Seq((pkIn, qLo), (pkIn, qHi), (pkIn, qLo - 1), (pkIn, qHi + 1),
        (pkIn + 1, qLo))
    }
    // lineitems: quantities saturate 1..50 with the band edges
    // (1/11/10/20/30) guaranteed present; 2-decimal money domain
    val quantities = Seq(1, 10, 11, 20, 30) ++ Seq.fill(295)(rnd.nextInt(50) + 1)
    val lines = (quantities.zipWithIndex.map { case (q, i) =>
      (i.toLong, rnd.nextInt(60) + 1L, rnd.nextInt(10) + 1L, 1,
        q.toDouble, (rnd.nextInt(99999) + 1) / 100.0,
        rnd.nextInt(11) / 100.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf(s"1995-0${rnd.nextInt(9) + 1}-15 00:00:00"))
    } ++ pinnedLines.zipWithIndex.map { case ((pk, q), i) =>
      // distinct non-round prices: any dropped/admitted edge row moves
      // the decimal revenue sum by an amount no other row can cancel
      ((300 + i).toLong, pk, 1L, 1, q.toDouble, 1000.01 + i * 1.37,
        0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("1995-05-15 00:00:00"))
    }).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    TestSpark.plantParquetFileInto(parts, dataDir, "part.parquet")
    TestSpark.plantParquetFileInto(lines, dataDir, "lineitem.parquet")
    dataDir.toString
  }

  /** Q19's semantics transcribed directly — the raw cross-side OR with
    * NO authored envelopes, over the same planted tables. */
  private def q19Raw(dir: String): DataFrame = {
    val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val residual = Q19Bands
      .map { case (b, szHi, qLo, qHi) =>
        col("p_brand") === b && col("p_size").between(1, szHi) &&
          col("l_quantity").between(qLo, qHi)
      }.reduce(_ || _)
    graft.engine.Tables.lineitem(spark, dir)
      .join(graft.engine.Tables.part(spark, dir),
        col("l_partkey") === col("p_partkey"))
      .filter(residual)
      .agg(dsum6(revenue).as("revenue"), count(lit(1)).as("n_match"))
  }

  test("Q19: authored envelopes change nothing on randomized band-edge corpora") {
    for (seed <- 1 to 3) {
      val dir = plantTables(seed)
      val got = Relational.qTpchQ19(spark, dir).collect().head
      val want = q19Raw(dir).collect().head
      // exact decimal sums → exact equality (NULL iff zero matches)
      assert(got.isNullAt(0) === want.isNullAt(0), s"seed $seed null drift")
      if (!want.isNullAt(0))
        assert(got.getDouble(0) === want.getDouble(0), s"seed $seed diverges")
      // non-vacuous AND edge-covering: the pinned rows alone contribute
      // 2 matching quantity-edge rows per band, so any seed must carry
      // at least 6 matches sitting ON envelope boundaries
      assert(!want.isNullAt(0), s"seed $seed vacuous — generator drifted")
      assert(want.getLong(1) >= 6L,
        s"seed $seed lost the pinned band-edge rows (${want.getLong(1)} matches)")
    }
  }

  private def plantQ7Tables(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    val root = java.nio.file.Files.createTempDirectory(s"graft_tpch_q7_$seed")
    plantedRoots += root
    val dataDir = root.resolve("data")
    val nations = (0 until 5).map(i => (i, s"NATION_$i", i % 3))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    // suppliers/customers spread over all 5 nations, guaranteeing both
    // cross-nation (1↔2) pairs AND same-nation pairs the residual drops
    val suppliers = (1L to 10L).map(sk =>
      (sk, s"supp$sk", (sk % 5).toInt, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val customers = (1L to 20L).map(ck =>
      (ck, s"cust$ck", (ck % 5).toInt, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = (1L to 50L).map(ok =>
      (ok, rnd.nextInt(20) + 1L, "O", 0.0,
        java.sql.Timestamp.valueOf("1995-06-01 00:00:00"), "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val lines = (1L to 200L).map { i =>
      (rnd.nextInt(50) + 1L, 1L, rnd.nextInt(10) + 1L, 1,
        1.0, (rnd.nextInt(99999) + 1) / 100.0, rnd.nextInt(11) / 100.0, 0.0,
        "N", "O",
        // straddle the window edges: some rows in 1994/1997 must be cut
        java.sql.Timestamp.valueOf(
          s"${1994 + rnd.nextInt(4)}-0${rnd.nextInt(9) + 1}-15 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    TestSpark.plantParquetFileInto(nations, dataDir, "nation.parquet")
    TestSpark.plantParquetFileInto(suppliers, dataDir, "supplier.parquet")
    TestSpark.plantParquetFileInto(customers, dataDir, "customer.parquet")
    TestSpark.plantParquetFileInto(orders, dataDir, "orders.parquet")
    TestSpark.plantParquetFileInto(lines, dataDir, "lineitem.parquet")
    dataDir.toString
  }

  /** Q7's semantics transcribed directly: join everything un-prefiltered,
    * then apply the reference's raw two-disjunct nation predicate. */
  private def q7Raw(dir: String): DataFrame = {
    val t = graft.engine.Tables
    val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val n1 = t.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = t.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    t.supplier(spark, dir)
      .join(t.lineitem(spark, dir), col("s_suppkey") === col("l_suppkey"))
      .join(t.orders(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(t.customer(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(n1, col("s_nationkey") === col("sn_key"))
      .join(n2, col("c_nationkey") === col("cn_key"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum6(revenue).as("revenue"))
  }

  test("Q7: dim pre-filter + residual equals the raw disjunction join") {
    for (seed <- 1 to 3) {
      val dir = plantQ7Tables(seed)
      val got = Relational.qTpchQ7(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val want = q7Raw(dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got === want, s"seed $seed diverges")
      assert(want.nonEmpty, s"seed $seed vacuous — generator drifted")
    }
  }
}
