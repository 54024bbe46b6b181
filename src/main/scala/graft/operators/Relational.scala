package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.Exact.{dsum, dsum6}

/** M1 relational operator battery over the TPC-H-ish star schema —
  * the checklist categories of SURVEY.md §2b, each as one oracle-checked
  * query. All plans are declarative DataFrame code: Catalyst handles
  * predicate pushdown, column pruning and join selection; broadcast hints
  * mark the dimension tables that must never shuffle at 100 TB.
  *
  * Determinism rules (engine vs DuckDB oracle must hash-match):
  *  - money columns are exact 2-decimals → sum through DECIMAL (exact,
  *    order-independent) and cast the result to double;
  *  - derived per-row doubles (products) are deterministic IEEE ops;
  *  - never emit int32/decimal/timestamp columns — longs/doubles/strings
  *    only, so Spark and DuckDB schemas line up;
  *  - every window/top-k has a unique-key tiebreak.
  */
object Relational {

  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ---- aggregation -------------------------------------------------------

  /** TPC-H Q1-style pricing summary: multi-agg + filter pushed to scan. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),            // integral doubles: exact in any order
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum6(revenue).as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  sum(l_quantity) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Distinct aggregates: exact count-distinct per group. */
  def qDistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))

  val qDistinctAggSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_suppkey) AS n_supp,
      |  count(DISTINCT l_partkey) AS n_part,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Conditional aggregation (CASE WHEN inside agg). */
  def qCaseAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(
        count(lit(1)).as("n_cust"),
        sum(when(col("c_acctbal") > 5000, 1L).otherwise(0L)).as("n_rich"),
        (sum(when(col("c_acctbal") > 5000, 1L).otherwise(0L)).cast("double")
          / count(lit(1))).as("rich_share"),
        countDistinct(col("c_mktsegment")).as("n_segments"))

  val qCaseAggSql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |  count(*) AS n_cust,
      |  CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich,
      |  CAST(CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / count(*) AS rich_share,
      |  count(DISTINCT c_mktsegment) AS n_segments
      |FROM customer GROUP BY 1""".stripMargin

  /** HAVING: filter on an aggregate. */
  def qHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
      .filter(col("n_orders") >= 15)

  val qHavingSql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM orders GROUP BY o_custkey HAVING count(*) >= 15""".stripMargin

  // ---- joins -------------------------------------------------------------

  /** Star join with broadcast dimensions: customer ⋈ nation ⋈ region.
    * nation/region are tiny and fixed-size at any scale factor —
    * broadcast them so the fact side never shuffles.
    */
  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))

  val qJoinBroadcastSql: String =
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  /** Large-large equi-join (sort-merge / shuffled-hash territory at scale):
    * orders ⋈ lineitem, revenue per order priority.
    */
  def qJoinSortMerge(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), dsum6(revenue).as("rev"))

  val qJoinSortMergeSql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS rev
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Bucketed co-located join: both fact tables written `bucketBy(8, key)
    * sortBy(key)` into the session catalog, then joined on the bucket
    * key. Bucketing pre-shuffles AT WRITE TIME, so the join itself needs
    * NO exchange on either side (BucketedJoinSpec asserts the only
    * Exchange in the plan is the post-join groupBy's) — at 100 TB this
    * converts every recurring orders⋈lineitem join from two full-table
    * shuffles into a zero-shuffle merge of pre-sorted buckets. Same
    * aggregate as qJoinSortMerge → same oracle, so the driver verifies
    * the bucketed plan produces bit-identical results to the shuffled
    * one.
    */
  def qBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = ensureBucketedTables(spark, dir)
    spark.table(ot)
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), dsum6(revenue).as("rev"))
  }

  /** One-time materialization of the bucketed orders/lineitem tables —
    * the write-time pre-shuffle that buys the zero-shuffle join above.
    * Split out of qBucketedJoin so the bench can run it as a warmup: the
    * per-query bench line then times the JOIN (the recurring cost at
    * scale), not the one-time table build that amortizes over every
    * later join on the same key. Returns the (orders, lineitem) table
    * names; idempotent per (session, dataset). */
  def ensureBucketedTables(spark: SparkSession, dir: String): (String, String) = {
    val suffix = graft.sources.Formats.sanitize(dir)
    val ot = s"orders_bkt_$suffix"
    val lt = s"lineitem_bkt_$suffix"
    // per-dataset lock around the check-then-write: the bare
    // tableExists gate alone leaves a window where two concurrent
    // same-dataset callers (sbt provably overlaps suites on the shared
    // session) both observe "missing" and race saveAsTable on one
    // catalog name + scratch path — same serialization contract as
    // Dedup's lshWriteLocks
    val lock = bucketedTableLocks.computeIfAbsent(
      graft.sources.Formats.canonicalDir(dir), _ => new Object)
    lock.synchronized {
      // gate on BOTH tables: a failure between the two writes must not
      // wedge the session into skipping the missing one forever
      if (!spark.catalog.tableExists(ot) || !spark.catalog.tableExists(lt)) {
        Tables.orders(spark, dir).write
          .option("path", graft.sources.Formats.tmp("orders_bkt", dir))
          .mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(ot)
        Tables.lineitem(spark, dir).write
          .option("path", graft.sources.Formats.tmp("lineitem_bkt", dir))
          .mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(lt)
      }
    }
    (ot, lt)
  }

  /** Per-dataset locks for [[ensureBucketedTables]]'s check-then-write —
    * see its doc. */
  private val bucketedTableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The conf window [[qBloomJoin]] executes in — shared with
    * BloomJoinSpec so the spec can never drift into asserting injection
    * under a window the production path no longer uses. */
  private[graft] val BloomJoinConfs: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB")

  /** Runtime BLOOM-FILTER join pruning — semi-join reduction at shuffle
    * scale: Catalyst turns a selective creation-side filter (urgent
    * orders) into a bloom filter computed at runtime and applies it to
    * the fact side BEFORE that side's exchange, so lineitem rows the
    * join would drop never pay shuffle IO. At 100 TB a fact ⋈
    * filtered-dim join is dominated by shuffling fact rows that cannot
    * match; `InjectRuntimeFilter` removes that cost with no semantic
    * change (bloom false positives only pass extra rows to the exact
    * join). The injection happens at OPTIMIZATION time, not DataFrame
    * construction, so the conf window must wrap execution — the result
    * is materialized to scratch inside the window and the read-back is
    * what the driver hash-checks; [[BloomJoinSpec]] asserts the
    * `might_contain` filter really lands on the lineitem scan side and
    * that results are invariant to the rewrite. The window pins the
    * size thresholds (app-side scan 0, creation side 1 GB, broadcast
    * off) because the defaults — tuned for ≥10 GB scans — correctly
    * skip injection at test scale; production keeps the defaults and
    * gets this plan exactly when it pays off.
    */
  def qBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val dest = graft.sources.Formats.tmp("bloom_join", dir)
    Tables.withConfs(spark, BloomJoinConfs: _*) {
      bloomJoinPlan(spark, dir).write.mode("overwrite").parquet(dest)
    }
    spark.read.parquet(dest)
  }

  /** The logical query [[qBloomJoin]] materializes: revenue per return
    * flag over lineitems of urgent orders. */
  private[graft] def bloomJoinPlan(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), dsum6(revenue).as("rev"))

  val qBloomJoinSql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS rev
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag""".stripMargin

  /** Semi join (EXISTS): customers that placed at least one order. */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_active"))

  val qJoinSemiSql: String =
    """SELECT c_mktsegment, count(*) AS n_active
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment""".stripMargin

  /** Anti join (NOT EXISTS): customers with no orders, per nation. */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_inactive"))

  val qJoinAntiSql: String =
    """SELECT n_name, count(*) AS n_inactive
      |FROM customer c JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY n_name""".stripMargin

  /** NULL-AWARE anti join — `NOT IN (subquery)` under three-valued
    * logic, the semantics trap that silently drops rows in hand-rolled
    * rewrites: a probe row whose key is NULL can never satisfy NOT IN
    * (comparison is UNKNOWN), and one NULL in the subquery empties the
    * whole result. Spark plans this as a dedicated physical operator
    * (BroadcastHashJoin with `isNullAwareAntiJoin=true` — single-column
    * null-aware anti join) rather than a plain LeftAnti, because the
    * null checks must ride the hash lookup. The corpus has no null `k`,
    * so probe-side NULLs are INJECTED deterministically (event_id % 7
    * = 3) and the identical CASE runs in both engines — the 3VL
    * exclusion is data-visible and hash-checked, not vacuous. The
    * blocked set is narrowed by a predicate on a DIFFERENT column
    * (value ≥ 490 — error k spans the full 0–99 domain, so an
    * unfiltered set blocks everything and the result is vacuous) but
    * never by `k IS NOT NULL`, so the planner cannot strengthen the
    * plan to a non-null plain anti join. */
  def qJoinAntiNullaware(spark: SparkSession, dir: String): DataFrame = {
    // load outside the lock (see eventsWindowTimeRange — withViews
    // guards only register+analyze, never conform/probe IO)
    val ev = Tables.events(spark, dir)
    graft.engine.Tables.withViews {
    ev.createOrReplaceTempView("anw_events")
    spark.sql(
      """WITH probe AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 7 = 3 THEN CAST(NULL AS BIGINT)
        |         ELSE try_variant_get(try_parse_json(props), '$.k', 'bigint') END AS k
        |  FROM anw_events),
        |blocked AS (
        |  SELECT try_variant_get(try_parse_json(props), '$.k', 'bigint') AS k
        |  FROM anw_events WHERE event_type = 'error' AND value >= 490.0)
        |SELECT event_type, count(*) AS n
        |FROM probe
        |WHERE k NOT IN (SELECT k FROM blocked)
        |GROUP BY event_type""".stripMargin)
    }
  }

  val qJoinAntiNullawareSql: String =
    """WITH probe AS (
      |  SELECT event_type,
      |    CASE WHEN event_id % 7 = 3 THEN CAST(NULL AS BIGINT)
      |         ELSE TRY_CAST(props->>'k' AS BIGINT) END AS k
      |  FROM events),
      |blocked AS (
      |  SELECT TRY_CAST(props->>'k' AS BIGINT) AS k
      |  FROM events WHERE event_type = 'error' AND value >= 490.0)
      |SELECT event_type, count(*) AS n
      |FROM probe
      |WHERE k NOT IN (SELECT k FROM blocked)
      |GROUP BY event_type""".stripMargin

  /** Left-outer join with null-side aggregation: EVERY customer with its
    * order count and spend — zero/0.0 for customers that never ordered
    * (the rows an inner join silently drops). count(o_orderkey) ignores
    * the null side, so no post-join CASE is needed; the spend sum is
    * null for the null side and coalesced.
    */
  def qJoinOuter(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spend"))

  val qJoinOuterSql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spend
      |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey""".stripMargin

  /** Full-outer join: customer-nation counts vs supplier-nation counts
    * over deliberately offset key ranges, so BOTH null fringes appear
    * and the coalesced using-key is exercised. */
  def qJoinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_nationkey") < 15)
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir).filter(col("s_nationkey") >= 10)
      .groupBy(col("s_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  val qJoinFullOuterSql: String =
    """WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n_cust
      |           FROM customer WHERE c_nationkey < 15 GROUP BY 1),
      |     s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey, count(*) AS n_supp
      |           FROM supplier WHERE s_nationkey >= 10 GROUP BY 1)
      |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
      |  CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
      |  CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp
      |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey""".stripMargin

  /** Semi join with a pushed predicate: parts that ever shipped in bulk. */
  def qExistsSubquery(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .join(
        Tables.lineitem(spark, dir).filter(col("l_quantity") >= 49),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"))

  val qExistsSubquerySql: String =
    """SELECT p_partkey, p_brand FROM part p
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)""".stripMargin

  /** Scalar subquery: customers above the global mean balance.
    * The single-row aggregate is cross-joined (auto-broadcast). */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val threshold = cust.agg(
      (dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    cust.crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("avg_bal"))
      .select(col("c_custkey"), col("c_acctbal"))
  }

  val qScalarSubquerySql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |                   FROM customer)""".stripMargin

  // ---- windows, sort, top-k ---------------------------------------------

  /** Ranking window: top 3 customers per nation by balance (unique-key
    * tiebreak on custkey keeps the result deterministic). */
  def qWindowTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_custkey"), col("c_acctbal"), col("rn"))
  }

  val qWindowTopNSql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_custkey, c_acctbal, rn FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    CAST(row_number() OVER (PARTITION BY c_nationkey
      |           ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rn
      |  FROM customer) t WHERE rn <= 3""".stripMargin

  /** Analytic window with frame: running spend + previous order price per
    * customer (ordered by date then key; DECIMAL keeps the running sum
    * exact so both engines agree bit-for-bit). */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 100)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        row_number().over(w).cast("long").as("order_idx"))
  }

  val qWindowRunningSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  CAST(row_number() OVER w AS BIGINT) AS order_idx
      |FROM orders WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** RANGE-frame window: for each order, spend on same-customer orders
    * priced within 1000 below it (value-based frame, not row-based —
    * the frame width varies per row). */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"))
      .rangeBetween(-1000L, Window.currentRow)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_nearby"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("nearby_spend"))
  }

  val qWindowRangeSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  count(*) OVER w AS n_nearby,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS nearby_spend
      |FROM orders WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
      |             RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Global top-k: TakeOrderedAndProject — no full sort at scale. */
  def qTopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val qTopKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** Range (interval) join: every lineitem priced into a quantity band.
    * The band table is tiny and broadcast, so the non-equi condition
    * runs as BroadcastNestedLoopJoin — each fact row tests 3 intervals,
    * no shuffle, no cartesian blow-up. At 100 TB this is the only sane
    * shape for interval joins against small band/calendar tables.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq((1.0, 18.0, "low"), (18.0, 35.0, "mid"), (35.0, 51.0, "high"))
      .toDF("lo", "hi", "band")
    Tables.lineitem(spark, dir)
      .join(broadcast(bands),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("price_sum"))
  }

  val qRangeJoinSql: String =
    """SELECT band, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
      |FROM lineitem
      |JOIN (VALUES (1.0, 18.0, 'low'), (18.0, 35.0, 'mid'), (35.0, 51.0, 'high'))
      |  AS b(lo, hi, band)
      |  ON l_quantity >= lo AND l_quantity < hi
      |GROUP BY band""".stripMargin

  /** Dense band join: 2100 width-50 price buckets — the shape where
    * Spark's stock plan (BroadcastNestedLoopJoin, 2100 comparisons per
    * probe row) stops being viable and the engine's interval-lookup
    * operator ([[graft.plans.RangeLookupJoinExec]], ~11-step binary
    * search per row) takes over via the injected preCBO rewrite +
    * strategy. Same [lo, hi) semantics and oracle shape as
    * [[qRangeJoin]]; at 100 TB this is histogram bucketing / IP-range /
    * tariff-table lookup, and the probe side streams with its
    * partitioning intact — the rewrite can never add a shuffle.
    */
  def qRangeJoinDense(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.range(2100).select(
      (col("id") * lit(50.0)).as("lo"),
      (col("id") * lit(50.0) + lit(50.0)).as("hi"),
      col("id").as("band"))
    Tables.lineitem(spark, dir)
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("price_sum"))
  }

  val qRangeJoinDenseSql: String =
    """SELECT band, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
      |FROM lineitem
      |JOIN (SELECT range AS band, range * 50.0 AS lo, range * 50.0 + 50.0 AS hi
      |      FROM range(0, 2100)) b
      |  ON l_extendedprice >= lo AND l_extendedprice < hi
      |GROUP BY band""".stripMargin

  /** TPC-H Q3-style: three-way join (customer ⋈ orders ⋈ lineitem) with
    * selective filters on both ends, aggregation, and top-10 by revenue —
    * the canonical multi-operator composition. Filters push to the scans,
    * the two fact tables sort-merge on their keys, and the final top-k is
    * TakeOrderedAndProject (no global sort).
    */
  def qTpchQ3(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg(dsum6(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)

  val qTpchQ3Sql: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** TPC-H Q5-style: the six-table join graph (customer ⋈ orders ⋈
    * lineitem ⋈ supplier ⋈ nation ⋈ region) with the classic
    * local-supplier twist — `c_nationkey = s_nationkey` closes a CYCLE in
    * the join graph, so the optimizer must order a join tree where one
    * edge is non-hierarchical. Dimension tables broadcast; the
    * year+region filters reach the orders/region scans; the two big
    * fact⋈fact edges shuffle on their keys.
    */
  def qTpchQ5(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(dsum6(revenue).as("revenue"))

  val qTpchQ5Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  /** TPC-H Q10-style (returned-item revenue): which customers returned
    * the most value in a quarter — orders date-windowed at the scan,
    * lineitem pre-filtered to returnflag='R' before its join, the
    * customer and nation dimensions broadcast, revenue summed in the
    * decimal domain (dsum6, the engine's order-independent exact form),
    * top-20 via TakeOrderedAndProject. (c_custkey is in the grouping
    * key, so (revenue DESC, c_custkey) is a total order — no limit-
    * boundary ties.)
    */
  def qTpchQ10(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_returnflag") === "R")
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum6(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)

  val qTpchQ10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin

  /** TPC-H Q14-style (promo revenue share): the conditional-aggregate
    * ratio — one quarter of lineitem joined to part, promo revenue vs
    * total revenue as exact decimal sums, the percentage formed by
    * double division of the two already-rounded sums (identical-operand
    * IEEE math on both engines; a decimal÷decimal would hit the two
    * engines' different result-scale rules). The date window reaches the
    * lineitem scan; part is the broadcast side; output is one row, so
    * the final exchange is a single-partition gather of two partial
    * decimal sums.
    */
  def qTpchQ14(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-12-01").cast("timestamp"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .agg(
        dsum6(when(col("p_type") === "PROMO", revenue).otherwise(lit(0.0)))
          .as("promo_rev"),
        dsum6(revenue).as("total_rev"))
      .select(col("promo_rev"), col("total_rev"),
        (lit(100.0) * col("promo_rev") / col("total_rev")).as("promo_pct"))

  val qTpchQ14Sql: String =
    """SELECT
      |  CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
      |                     THEN l_extendedprice * (1.0 - l_discount)
      |                     ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS promo_rev,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_rev,
      |  100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
      |                     THEN l_extendedprice * (1.0 - l_discount)
      |                     ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS promo_pct
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-12-01 00:00:00'""".stripMargin

  /** Minimum per-order quantity for [[qTpchQ18]]'s large-volume gate —
    * chosen so the HAVING filter is selective but non-empty at every
    * test scale factor (max per-order quantity in the synthetic data is
    * ~380–475 across sf0.001–0.1). */
  val Q18MinQty = 150

  /** TPC-H Q18-style (large-volume customers): the AGGREGATE-THEN-
    * SEMI-JOIN shape — first reduce the fact table to qualifying keys
    * (per-order quantity sum over a HAVING gate), then semi-join the
    * fact pipeline against that key set and re-aggregate with the
    * customer dimension attached. The qualifying-key set is orders of
    * magnitude smaller than the fact table, so AQE broadcasts it and
    * the big join runs filter-before-shuffle; the final top-100 is
    * TakeOrderedAndProject (never a global sort). Ties at the limit
    * boundary are impossible: o_orderkey is unique per output row, so
    * (total_qty DESC, o_orderkey) is a total order.
    */
  def qTpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("big_qty"))
      .filter(col("big_qty") > Q18MinQty)
      .select(col("l_orderkey").as("big_orderkey"))
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey").asc)
      .limit(100)
  }

  val qTpchQ18Sql: String =
    s"""SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  sum(l_quantity) AS total_qty
      |FROM orders
      |JOIN customer ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING sum(l_quantity) > $Q18MinQty)
      |GROUP BY 1, 2, 3
      |ORDER BY total_qty DESC, o_orderkey ASC LIMIT 100""".stripMargin

  /** TPC-H Q13-style (customer order-count distribution): the LEFT OUTER
    * join with a FILTERED JOIN CONDITION followed by an aggregate OF an
    * aggregate. The orders-side-only predicate (here on o_orderpriority —
    * the synthetic tables carry no o_comment) lives in the join's ON
    * clause, so customers whose every order fails it still appear with
    * c_count = 0 — filtering AFTER the join would silently drop them,
    * which is the semantic this query pins. `count(o_orderkey)` counts
    * only matched rows (COUNT of a nullable attribute, not COUNT(*)).
    * Scale shape: the outer join shuffles on the customer key; the
    * second aggregate groups a customer-cardinality input down to a few
    * dozen distinct counts — a cheap two-phase hash agg. (custdist DESC,
    * c_count DESC) is a total order because c_count is the grouping key.
    */
  def qTpchQ13(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val qTpchQ13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) pc
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q21-style (waiting-supplier ranking): the multi-way
    * CORRELATED EXISTS / NOT EXISTS stack against the SAME fact table —
    * lineitem appears three times (the probe l1 plus the l2 EXISTS and
    * l3 NOT EXISTS witnesses), expressed as a left-semi and a left-anti
    * join with a non-equi residual (`l_suppkey <> witness suppkey`) on
    * top of the orderkey equi-key. "Flagged" stands in for the
    * reference benchmark's late-receipt predicate (the synthetic
    * lineitem has no receipt/commit dates): a supplier is reported when
    * its item is flagged 'R' in a completed multi-supplier order where
    * NO OTHER supplier's item is flagged. Scale shape: the selective
    * dimension gate (one nation, 1/25 of suppliers) broadcasts and
    * prunes the probe side FIRST, the order-status gate semi-joins on
    * the order key, and only then do the two witness scans shuffle —
    * both on the same l_orderkey key, so AQE coalesces them into the
    * probe's exchange layout. (numwait DESC, s_name ASC) is a total
    * order because s_name is the grouping key.
    */
  def qTpchQ21(spark: SparkSession, dir: String): DataFrame = {
    val flaggedSuppliers = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    val l1 = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(broadcast(flaggedSuppliers), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    val l2 = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("w_orderkey"), col("l_suppkey").as("w_suppkey"))
    val l3 = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("w_orderkey"), col("l_suppkey").as("w_suppkey"))
    l1
      .join(l2, col("l_orderkey") === col("w_orderkey") &&
        col("l_suppkey") =!= col("w_suppkey"), "left_semi")
      .join(l3, col("l_orderkey") === col("w_orderkey") &&
        col("l_suppkey") =!= col("w_suppkey"), "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  val qTpchQ21Sql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |              WHERE l3.l_orderkey = l1.l_orderkey
      |                AND l3.l_suppkey <> l1.l_suppkey
      |                AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name ASC LIMIT 100""".stripMargin

  /** TPC-H Q6-style (forecast revenue change): the pure SCAN-SIDE query —
    * every predicate (ship-date window, discount band, quantity cap) is a
    * pushable parquet filter over native columns, so the whole plan is one
    * filtered columnar scan feeding a two-phase decimal sum: no join, no
    * wide exchange, final gather of 32 partial sums. At 100 TB this is the
    * shape that proves pushdown works end-to-end — the scan reads 4 of
    * lineitem's 11 columns (ReadSchema) and row groups outside the date
    * window never leave parquet (PushedFilters min/max pruning). Both
    * engines compare the same stored doubles against the same literals, so
    * the band edges agree bit-for-bit.
    */
  def qTpchQ6(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(dsum6(col("l_extendedprice") * col("l_discount")).as("revenue"))

  val qTpchQ6Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q7-style (volume shipping): the DISJUNCTIVE TWO-NATION join —
    * the same dimension table joins the pipeline twice under different
    * roles (supplier nation vs customer nation), with an OR-of-ANDs
    * predicate across the two roles. Scale shape: each role is
    * pre-filtered to the two named nations BEFORE touching a fact table
    * (the broadcast inner joins prune supplier and customer to 2/25 of
    * their rows, which then prunes lineitem/orders at their join), and
    * only the residual disjunction — excluding the two same-nation
    * combinations — runs after. Filtering the dims first turns a predicate
    * Catalyst cannot split across the OR into two cheap semi-filters plus
    * a tiny residual; the year split is a group key, not a shuffle-width
    * risk (2 nations × 2 years of output).
    */
  def qTpchQ7(spark: SparkSession, dir: String): DataFrame = {
    val tradeNations = Seq("NATION_1", "NATION_2")
    val n1 = Tables.nation(spark, dir)
      .filter(col("n_name").isin(tradeNations: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .filter(col("n_name").isin(tradeNations: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    Tables.supplier(spark, dir)
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(Tables.lineitem(spark, dir), col("s_suppkey") === col("l_suppkey"))
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum6(revenue).as("revenue"))
      .orderBy(col("supp_nation").asc, col("cust_nation").asc, col("l_year").asc)
  }

  val qTpchQ7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM supplier
      |JOIN lineitem ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation ASC, cust_nation ASC, l_year ASC""".stripMargin

  /** TPC-H Q8-style (national market share): the CONDITIONAL-SHARE-OF-
    * TOTAL ratio over a six-table join — what fraction of a region's
    * ECONOMY-part import volume came from one supplier nation, per order
    * year. The nation table again plays two roles: a semi-join gate
    * (customer's nation must sit in AMERICA — reduced to a broadcast key
    * set before the fact joins) and an attribute provider (supplier
    * nation feeds the CASE). Both sums aggregate in the decimal domain
    * and the share is formed by double division of the two
    * already-rounded sums (identical-operand IEEE math on both engines —
    * the Q14 rule). p_type and the date window prune part and orders at
    * their scans; every dimension broadcasts; the only wide exchanges
    * are the two fact⋈fact joins.
    */
  def qTpchQ8(spark: SparkSession, dir: String): DataFrame = {
    val amNationKeys = Tables.nation(spark, dir)
      .join(broadcast(
          Tables.region(spark, dir).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("am_nkey"))
    val suppNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_type") === "ECONOMY").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.customer(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(broadcast(amNationKeys), col("c_nationkey") === col("am_nkey"),
        "left_semi")
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        dsum6(when(col("supp_nation") === "NATION_6", revenue)
          .otherwise(lit(0.0))).as("nation_rev"),
        dsum6(revenue).as("total_rev"))
      .select(col("o_year"), col("nation_rev"), col("total_rev"),
        (col("nation_rev") / col("total_rev")).as("mkt_share"))
      .orderBy(col("o_year").asc)
  }

  val qTpchQ8Sql: String =
    """SELECT year(o_orderdate) AS o_year,
      |  CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_6'
      |                     THEN l_extendedprice * (1.0 - l_discount)
      |                     ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS nation_rev,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_rev,
      |  CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_6'
      |                     THEN l_extendedprice * (1.0 - l_discount)
      |                     ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE p_type = 'ECONOMY'
      |  AND r_name = 'AMERICA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1
      |ORDER BY o_year ASC""".stripMargin

  /** TPC-H Q17-style (small-quantity-order revenue): the CORRELATED
    * AGGREGATE SUBQUERY — each row compares against an aggregate of its
    * own group (quantity below half the part's average). Spark-first
    * form: compute the per-part threshold as a standalone aggregate and
    * join it back, which decorrelates the subquery into one extra
    * aggregation plus a broadcast-able join (the threshold table has one
    * row per qualifying part — always dimension-sized). Restricting both
    * legs to the brand's parts FIRST is semantics-preserving (the
    * correlation key is the part) and keeps the aggregate over 1/25 of
    * lineitem. l_quantity values are small integers stored as doubles, so
    * avg = exact-integer-sum / count is deterministic IEEE on both
    * engines; the final money sum goes through dsum and the /7.0 is
    * identical-operand double division (the Q14 rule).
    */
  def qTpchQ17(spark: SparkSession, dir: String): DataFrame = {
    val brandLines = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_brand") === "Brand#23").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val caps = brandLines
      .groupBy(col("l_partkey").as("cap_partkey"))
      .agg((lit(0.5) * avg(col("l_quantity"))).as("qty_cap"))
    brandLines
      .join(broadcast(caps), col("l_partkey") === col("cap_partkey"))
      .filter(col("l_quantity") < col("qty_cap"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  val qTpchQ17Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem l
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND l_quantity < (
      |    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  /** TPC-H Q15-style (top supplier): SELECT-THE-MAX-OF-AN-AGGREGATE —
    * revenue per supplier over a quarter, then the supplier(s) whose
    * total equals the global max. Scale shape: the per-supplier
    * aggregate shuffles the date-pruned fact slice on l_suppkey down to
    * a dimension-sized table; the global max is a one-row
    * re-aggregation of THAT table, broadcast back as an equality
    * filter; the supplier dimension broadcasts for the name lookup.
    * Ties at the max all emit (TPC-H semantics) and are deterministic
    * because revenue is an exact decimal sum — equality against the max
    * is well-defined, which a floating-point sum could not guarantee
    * across partition orders. TPC-H defines revenue0 as a pre-created
    * VIEW read by both the max branch and the probe branch; expressed
    * as one DataFrame graph it would be EVALUATED twice (verified in
    * the executed plan: AQE does not cross-reuse the exchange between
    * the broadcast build and the probe stage), so revenue0 is
    * materialized ONCE PER (JVM, dataset) to the per-dataset scratch —
    * the same memo pattern as the dedup family's pair/label artifacts
    * (revenue0 is likewise a deterministic per-corpus artifact; see the
    * SINGLE-PROCESS ASSUMPTION documented at
    * `Dedup.componentsMaterialized`, which this memo shares) — and both
    * branches read the supplier-dimension-sized parquet. The
    * quarter-slice fact scan happens exactly once per JVM per dataset.
    * NOTE: the FIRST construction in a JVM runs that scan + write as a
    * side effect of building the DataFrame (plan-only callers like
    * PlanDump pay it once); later constructions are pure reads.
    */
  private val q15Materialized =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Drops the revenue0 memo so the NEXT Q15 call re-materializes from
    * source — Bench calls this before each Q15 re-run (and between
    * SPARK_GRAFT_REPEAT passes, via resetDedupState) because the FIRST
    * Q15 call in a JVM pays the scan + write inside its timed region;
    * a re-timed call must pay the same, not a parquet re-read. Same
    * reset rationale as `Dedup.clearScratchMemos`. */
  def clearScratchMemos(): Unit =
    q15Materialized.clear()

  /** Per-dataset variant: drops only `dir`'s memo entry — same scoping
    * rationale as `Dedup.clearScratchMemos(dir)`. */
  def clearScratchMemos(dir: String): Unit = {
    q15Materialized.remove(graft.sources.Formats.canonicalDir(dir))
    ()
  }

  def qTpchQ15(spark: SparkSession, dir: String): DataFrame = {
    val dest = graft.sources.Formats.tmp("tpch_q15_rev0", dir)
    q15Materialized.computeIfAbsent(graft.sources.Formats.canonicalDir(dir), { _ =>
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(dsum6(revenue).as("total_revenue"))
        .write.mode("overwrite").parquet(dest)
      java.lang.Boolean.TRUE
    })
    val rev = spark.read.parquet(dest)
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev
      .join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey").asc)
  }

  val qTpchQ15Sql: String =
    """WITH revenue0 AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
      |ORDER BY s_suppkey ASC""".stripMargin

  /** TPC-H Q22-style (global-sales opportunity): the SCALAR-THRESHOLD +
    * ANTI-JOIN composite — wealthy (above-global-average balance)
    * customers with NO urgent order, totaled per nation. (The synthetic
    * corpus has no c_phone and every customer has orders, so the
    * reference's phone-prefix gate and bare NOT EXISTS are adapted to a
    * nation grouping and an urgent-order anti-join — same shapes, data
    * that actually exercises them: 5/75/937 qualifying customers at
    * sf0.001/0.01/0.1.) Scale shape: the global average reduces to ONE
    * broadcast row (never a per-row subquery), its threshold prunes
    * customer BEFORE the anti-join; the anti-join ships only the
    * urgent-filtered (o_custkey) key column; nation broadcasts. The
    * average is formed as exact-decimal-sum ÷ count in double — the
    * one deterministic form both engines compute bit-identically, where
    * a native double avg would be partition-order-dependent and could
    * flip boundary customers.
    */
  def qTpchQ22(spark: SparkSession, dir: String): DataFrame = {
    val custs = Tables.customer(spark, dir)
    val avgBal = custs.filter(col("c_acctbal") > 0.0)
      .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    custs
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("n_name").asc)
  }

  val qTpchQ22Sql: String =
    """SELECT n_name, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > (
      |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |GROUP BY n_name
      |ORDER BY n_name ASC""".stripMargin

  /** The three (brand, max size, quantity band) disjuncts of
    * [[qTpchQ19]] — one place so the Spark plan, the derived
    * single-side envelopes, and TpchRewriteEquivalenceSpec's planted
    * band-edge corpus can't drift apart. */
  private[graft] val Q19Bands: Seq[(String, Int, Int, Int)] = Seq(
    ("Brand#12", 15, 1, 11),
    ("Brand#23", 25, 10, 20),
    ("Brand#3", 35, 20, 30))

  /** TPC-H Q19-style (discounted revenue): the DISJUNCTIVE CROSS-SIDE
    * predicate — three OR'd conjunctions each mixing part attributes
    * (brand, size band) with lineitem attributes (quantity band). Two
    * pushdown layers cooperate here, both visible in the plan dump:
    * Catalyst itself PROJECTS the disjunction onto each join side
    * (extractPredicatesWithinOutputSet — the pushed `Or(And(...))` of
    * quantity bands on the lineitem scan and of brand/size conjuncts on
    * the part scan), and the authored single-side ENVELOPES (`p_brand
    * IN` + size cap, overall quantity range) ride along as the coarse
    * min/max-friendly form that parquet row-group statistics can
    * actually evaluate (a nested Or-of-And is pushed but stats-prunes
    * poorly; a plain range prunes row groups). The envelopes are
    * implied by the disjunction, so results are identical to the raw
    * OR form the oracle runs; the full disjunction stays as the join
    * residual. Part side broadcasts; one row out.
    */
  def qTpchQ19(spark: SparkSession, dir: String): DataFrame = {
    val brands = Q19Bands.map(_._1)
    val qtyLo = Q19Bands.map(_._3).min
    val qtyHi = Q19Bands.map(_._4).max
    val sizeHi = Q19Bands.map(_._2).max
    val residual = Q19Bands
      .map { case (b, szHi, qLo, qHi) =>
        col("p_brand") === b && col("p_size").between(1, szHi) &&
          col("l_quantity").between(qLo, qHi)
      }
      .reduce(_ || _)
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity").between(qtyLo, qtyHi))
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_brand").isin(brands: _*) &&
            col("p_size").between(1, sizeHi))),
        col("l_partkey") === col("p_partkey"))
      .filter(residual)
      .agg(dsum6(revenue).as("revenue"))
  }

  val qTpchQ19Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ---- grouping sets / set ops ------------------------------------------

  /** ROLLUP over the region→nation hierarchy. Expressed through
    * `spark.sql` — Spark 4's ambiguous-self-join check false-positives on
    * DataFrame `.rollup` after a multi-way join (the Expand node re-exposes
    * the join-side attributes), while the SQL path resolves cleanly. The
    * tiny dimensions auto-broadcast under the 10 MB threshold.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val (c, n, r) = (Tables.customer(spark, dir),
      Tables.nation(spark, dir), Tables.region(spark, dir))
    graft.engine.Tables.withViews {
    c.createOrReplaceTempView("rollup_customer")
    n.createOrReplaceTempView("rollup_nation")
    r.createOrReplaceTempView("rollup_region")
    spark.sql(
      """SELECT r_name, n_name, count(*) AS n_cust
        |FROM rollup_customer
        |JOIN rollup_nation ON c_nationkey = n_nationkey
        |JOIN rollup_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin)
    }
  }

  // HAVING count(*) > 0 on this and the other three grouping-analytics
  // oracles pins SPARK's empty-input semantics: Spark's Expand-based
  // rollup/cube/grouping-sets emit ZERO rows over an empty relation
  // (0 input rows × k projections = 0), while the SQL standard (and
  // DuckDB) emits the grand-total () row with count 0. The clause drops
  // exactly that row and nothing else — every group over non-empty
  // input contains ≥1 row, so non-empty results are untouched (edge
  // probe, round 15).
  val qRollupSql: String =
    """SELECT r_name, n_name, count(*) AS n_cust
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |HAVING count(*) > 0""".stripMargin

  /** CUBE over two lineitem dimensions. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |HAVING count(*) > 0""".stripMargin // Spark's empty-input pin — see qRollupSql

  /** Explicit GROUPING SETS — the general form that rollup/cube compile
    * to (same Expand operator), exercised through `spark.sql` because the
    * SQL form has no DataFrame-API equivalent. Per-column `grouping()`
    * flags disambiguate subtotal rows from genuine null groups (bit-order
    * of the combined grouping_id differs across engines; the per-column
    * form is engine-neutral). */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    graft.engine.Tables.withViews {
    li.createOrReplaceTempView("lineitem_gsets")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem_gsets
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
    }
  }

  val qGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
      |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
      |  sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |HAVING count(*) > 0""".stripMargin // Spark's empty-input pin — see qRollupSql

  /** UNPIVOT (wide → long reshape): two per-flag measures melted into
    * (flag, measure, value) rows — the normalization step feature
    * pipelines run before generic per-metric processing. `Dataset
    * .unpivot` plans as an Expand (each input row fans out to one row
    * per measure inside the same stage): no shuffle beyond the
    * aggregation's own, no join, and the fan-out happens AFTER the
    * aggregation collapses the table, so the reshaped relation is
    * group-count-sized, not input-sized. Oracle is the engine-neutral
    * UNION ALL form. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")),
        "measure", "value")

  val qUnpivotSql: String =
    """WITH a AS (
      |  SELECT l_returnflag,
      |    sum(l_quantity) AS sum_qty,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
      |UNION ALL
      |SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM a""".stripMargin

  /** Correlated LATERAL join — per-nation top-2 customers by balance,
    * expressed as the SQL shape users actually write (`, LATERAL
    * (SELECT ... WHERE corr ORDER BY ... LIMIT 2)`). Catalyst
    * decorrelates the limited subquery into the same window/rank plan
    * the DataFrame `q_window_topn` builds by hand — the point of the
    * query: the declarative form costs nothing over the manual rewrite.
    * Unique tiebreak (c_name) keeps the top-2 deterministic for the
    * hash compare. */
  def qLateral(spark: SparkSession, dir: String): DataFrame = {
    val (n, c) = (Tables.nation(spark, dir), Tables.customer(spark, dir))
    graft.engine.Tables.withViews {
    n.createOrReplaceTempView("lat_nation")
    c.createOrReplaceTempView("lat_customer")
    spark.sql(
      """SELECT n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS acctbal
        |FROM lat_nation,
        |LATERAL (SELECT c_name, c_acctbal FROM lat_customer
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_name ASC LIMIT 2) t""".stripMargin)
    }
  }

  val qLateralSql: String =
    """SELECT n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS acctbal
      |FROM nation,
      |LATERAL (SELECT c_name, c_acctbal FROM customer
      |         WHERE c_nationkey = n_nationkey
      |         ORDER BY c_acctbal DESC, c_name ASC LIMIT 2) t""".stripMargin

  /** Set ops: nations that have customers vs suppliers (INTERSECT /
    * EXCEPT / UNION branches tagged into one relation). */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val custN = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nationkey")).distinct()
    val suppN = Tables.supplier(spark, dir)
      .select(col("s_nationkey").cast("long").as("nationkey")).distinct()
    custN.intersect(suppN).withColumn("tag", lit("both"))
      .unionAll(custN.except(suppN).withColumn("tag", lit("cust_only")))
      .unionAll(suppN.except(custN).withColumn("tag", lit("supp_only")))
      .select(col("tag"), col("nationkey"))
  }

  val qSetOpsSql: String =
    """WITH c AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
      |     s AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
      |SELECT 'both' AS tag, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
      |UNION ALL
      |SELECT 'cust_only' AS tag, nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
      |UNION ALL
      |SELECT 'supp_only' AS tag, nationkey FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)""".stripMargin

  /** Ordered-set/statistical aggregates: exact interpolated median plus
    * extrema. Median only — higher quantiles interpolate with
    * formula-order-sensitive float math that differs across engines;
    * 0.5 on integral doubles is exact in both. */
  def qStatsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("n"))

  val qStatsAggSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Global total-order sort (RangePartitioning + per-partition sort —
    * distinct from top-k, which never sorts globally). Unique sort key
    * keeps the order deterministic; the hash-compare checks content,
    * the physical plan documents the Exchange rangepartitioning. */
  def qGlobalSort(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))

  val qGlobalSortSql: String =
    """SELECT s_suppkey, s_name, s_acctbal FROM supplier
      |ORDER BY s_acctbal DESC, s_suppkey ASC""".stripMargin

  /** Null-handling scalars: coalesce / nullif / nvl2-style CASE over a
    * column made sparse with nullif. */
  def qNullFns(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null"))
      .select(
        col("o_orderkey"),
        coalesce(col("status_or_null"), lit("OPEN")).as("status_filled"),
        col("status_or_null").isNull.cast("long").as("was_open"))
      .groupBy("status_filled", "was_open")
      .agg(count(lit(1)).as("n"))

  val qNullFnsSql: String =
    """WITH s AS (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null FROM orders)
      |SELECT coalesce(status_or_null, 'OPEN') AS status_filled,
      |  CAST(status_or_null IS NULL AS BIGINT) AS was_open, count(*) AS n
      |FROM s GROUP BY 1, 2""".stripMargin

  /** Multiset set ops (ALL variants keep duplicates): order-quantity
    * multisets per returnflag status. Each branch is summarized with a
    * GLOBAL aggregate (no groupBy) so an empty INTERSECT ALL / EXCEPT
    * ALL still emits its one (n=0, qty_sum NULL) row — the oracle's
    * `SELECT count(*) ... FROM (empty)` does, and `groupBy(lit(...))`
    * over zero rows would not. */
  def qSetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "A")
      .select(col("l_quantity").cast("long").as("qty"))
    val n = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "N")
      .select(col("l_quantity").cast("long").as("qty"))
    def branch(df: DataFrame, label: String): DataFrame =
      df.agg(count(lit(1)).as("n"), sum(col("qty")).as("qty_sum"))
        .select(lit(label).as("op"), col("n"), col("qty_sum"))
    branch(a.intersectAll(n), "intersect_all")
      .unionAll(branch(a.exceptAll(n), "except_all"))
  }

  val qSetOpsAllSql: String =
    """WITH a AS (SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'A'),
      |     n AS (SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'N')
      |SELECT 'intersect_all' AS op, count(*) AS n, CAST(sum(qty) AS BIGINT) AS qty_sum
      |FROM (SELECT qty FROM a INTERSECT ALL SELECT qty FROM n)
      |UNION ALL
      |SELECT 'except_all' AS op, count(*) AS n, CAST(sum(qty) AS BIGINT) AS qty_sum
      |FROM (SELECT qty FROM a EXCEPT ALL SELECT qty FROM n)""".stripMargin

  // ---- scalar function coverage -------------------------------------------

  /** String functions battery (per-row, whole-stage codegen'd). */
  def qStringFns(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") <= 100)
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 5)).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_slug"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded_key"))

  val qStringFnsSql: String =
    """SELECT p_partkey,
      |  upper(substring(p_name, 1, 5)) AS name_prefix,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  regexp_replace(p_type, ' ', '_', 'g') AS type_slug,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key
      |FROM part WHERE p_partkey <= 100""".stripMargin

  /** Date/time functions: orders per year/month/quarter. */
  def qDateFns(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        quarter(col("o_orderdate")).cast("long").as("q"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))

  val qDateFnsSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
      |  CAST(month(o_orderdate) AS BIGINT) AS m,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1, 2, 3""".stripMargin

  /** Math functions: per-row round (ties-away) summed exactly, plus
    * sqrt/ln/floor/ceil on aggregates (single deterministic IEEE ops). */
  def qMathFns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        // round in the decimal domain: Spark and DuckDB both round
        // decimals half-away-from-zero, while round-on-double diverges
        // on ties because the engines print the binary double differently
        sum(round((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)"), 2))
          .cast("double").as("sum_disc_amt"),
        sqrt(max(col("l_quantity"))).as("sqrt_max_qty"),
        log(sum(col("l_quantity"))).as("ln_total_qty"),
        floor(sum(col("l_quantity")) / count(lit(1))).cast("long").as("floor_avg_qty"),
        ceil(sum(col("l_quantity")) / count(lit(1))).cast("long").as("ceil_avg_qty"),
        pmod(count(lit(1)), lit(7L)).as("n_mod_7"))

  val qMathFnsSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(round(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)), 2)) AS DOUBLE) AS sum_disc_amt,
      |  sqrt(max(l_quantity)) AS sqrt_max_qty,
      |  ln(sum(l_quantity)) AS ln_total_qty,
      |  CAST(floor(sum(l_quantity) / count(*)) AS BIGINT) AS floor_avg_qty,
      |  CAST(ceil(sum(l_quantity) / count(*)) AS BIGINT) AS ceil_avg_qty,
      |  count(*) % 7 AS n_mod_7
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Pivot (long→wide): per-nation revenue with one column per order
    * status. The value list is EXPLICIT (`Seq("F","O","P")`) — without
    * it `pivot` first runs a values-discovery job (a full distinct scan
    * of the pivot column) before it can even plan, an extra 100 TB pass
    * that a fixed enum never needs. With the list supplied, the pivot
    * compiles to Spark's two-phase pivot aggregate — partial-aggregable
    * sum over (n_name, status), then PivotFirst gathering the three
    * status cells per nation (two exchanges, both partial-aggregated
    * map-side; see the PLANS.md dump) — with no Expand and no discovery
    * scan. Absent (nation, status) combinations surface as NULL cells in
    * both engines, matching the oracle's FILTER-aggregation form.
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum(col("o_totalprice")))

  val qPivotSql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS F,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS O,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS P
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Exact interpolated percentiles per group (`percentile`, the
    * order-statistic aggregate) vs DuckDB's `quantile_cont` — both
    * compute value[lo] + (rank − lo)·(value[hi] − value[lo]) at rank
    * p·(n−1). Hash-exact here because l_quantity is small integers and
    * p ∈ {¼, ½, ¾} are exact binary fractions, so every intermediate is
    * representable — the same reasoning documented for text_tfidf does
    * NOT hold for arbitrary doubles, which is why this query pins the
    * integer-domain case only. Scale note: exact percentile buffers a
    * value→count map per group (bounded here by the 50-value quantity
    * domain, NOT by row count — partial aggregation merges counts). For
    * unbounded real-valued columns at 100 TB the right tool is
    * approx_percentile's fixed-size sketch, the same exact→sketch trade
    * q_approx_distinct documents for count-distinct.
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"),
        count(lit(1)).as("n"))

  val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.50) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** The sketch twin of [[qPercentiles]] — `percentile_approx`'s
    * Greenwald-Khanna summary holds O(accuracy·log n) state per group
    * regardless of value domain, the 100 TB path for unbounded
    * real-valued columns. Sketch outputs are engine-specific (GK picks
    * an observed value within rank error n/accuracy; no interpolation)
    * → rows-only at the driver, with `ApproxPercentileSpec` bounding the
    * estimates against the exact twin at two scale factors — the same
    * exact↔sketch pairing as q_distinct_agg / q_approx_distinct.
    */
  def qApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_quantity"), lit(0.25), lit(10000)).as("p25"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("l_quantity"), lit(0.75), lit(10000)).as("p75"),
        count(lit(1)).as("n"))

  /** Distribution-rank window functions: per-nation quartile bucket
    * (`ntile`), `percent_rank` and `cume_dist` over customer balances.
    * Partitioned by nation — the scalable window shape (each nation's
    * frame sorts within its own shuffle partition). A GLOBAL ntile
    * (`Window.orderBy` with no partition) would collapse the whole
    * relation into one partition — the single-partition window
    * scale-killer this engine never ships; global binning at 100 TB is
    * approx-percentile boundaries + a width_bucket-style CASE instead
    * (see [[qApproxPercentiles]]). percent_rank/cume_dist are exact
    * rational ratios of row counts — the integer operands are identical
    * on both engines, so the double divisions are bit-identical (no
    * transcendental, no rounding discipline needed). Unique-key tiebreak
    * on custkey keeps ntile assignment deterministic.
    */
  def qNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  val qNtileSql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_custkey, c_acctbal,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)""".stripMargin

  /** GROUPING FLAGS — `grouping()` over ROLLUP: the only way a consumer
    * can tell a subtotal row's NULL from a real NULL in the data (the
    * classic reporting-layer trap; [[qRollup]] shows the hierarchy,
    * this query shows the disambiguation). The grouping id is computed
    * EXPLICITLY as 2·grouping(r)+grouping(n) in both engines rather
    * than via `grouping_id(...)`, whose bit order is an engine
    * convention the oracle contract shouldn't depend on. Same Expand
    * plan as every grouping-sets query — one scan fans out per set
    * before one exchange. */
  def qGroupingId(spark: SparkSession, dir: String): DataFrame = {
    val (c, n, r) = (Tables.customer(spark, dir),
      Tables.nation(spark, dir), Tables.region(spark, dir))
    graft.engine.Tables.withViews {
    c.createOrReplaceTempView("gid_customer")
    n.createOrReplaceTempView("gid_nation")
    r.createOrReplaceTempView("gid_region")
    spark.sql(
      """SELECT r_name, n_name,
        |  CAST(2 * grouping(r_name) + grouping(n_name) AS BIGINT) AS gid,
        |  count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM gid_customer
        |JOIN gid_nation ON c_nationkey = n_nationkey
        |JOIN gid_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin)
    }
  }

  val qGroupingIdSql: String =
    """SELECT r_name, n_name,
      |  CAST(2 * grouping(r_name) + grouping(n_name) AS BIGINT) AS gid,
      |  count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |HAVING count(*) > 0""".stripMargin // Spark's empty-input pin — see qRollupSql

  /** TYPED COGROUP — per-key custom logic over BOTH sides of a
    * relationship at once (`KeyValueGroupedDataset.cogroup`), the API
    * rung for reconciliation jobs where a group's output needs the two
    * collections together and doesn't reduce to join+agg expressions
    * (here it does — deliberately, so the same oracle pins the typed
    * path's semantics; the declarative twin is what production would
    * ship). Each order's header total is reconciled against the exact
    * cents sum of its line items; money rides integer cents inside the
    * typed function, so the arithmetic is exact and order-independent.
    * Physical shape = both sides shuffle on the key — identical
    * exchanges to the equivalent join, nothing extra. Orders with no
    * lines emit naturally from the empty right collection; orphan
    * lines (empty left) emit nothing, mirroring the oracle's LEFT
    * JOIN. */
  def qCogroupReconcile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Option-typed, not bare Long: a bare (Long, Long) encoder ASSERTS
    // non-null, so one NULL o_totalprice / l_extendedprice row kills the
    // whole job, where the oracle's sum/arithmetic just NULL-propagates.
    // The typed function mirrors the oracle exactly: a NULL line price
    // sums as 0 through coalesce(sum(..), 0) (sum skips NULLs), a NULL
    // header price makes order_cents and diff_cents NULL, and NULL line
    // keys are filtered because the equi-join can never match them.
    val o = Tables.orders(spark, dir)
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS LONG) AS cents")
      .as[(Option[Long], Option[Long])]
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey").isNotNull)
      .selectExpr("l_orderkey", "CAST(round(l_extendedprice * 100) AS LONG) AS cents")
      .as[(Long, Option[Long])]
    o.groupByKey(_._1).cogroup(l.groupByKey(r => Option(r._1))) { (k, os, ls) =>
      val headers = os.toList
      if (headers.isEmpty) Iterator.empty
      else {
        var n = 0L
        var s = 0L
        ls.foreach { r => n += 1L; s += r._2.getOrElse(0L) }
        // one output row per DISTINCT header price, scaled by how many
        // header rows carry it — exactly the oracle's
        // GROUP BY (o_orderkey, o_totalprice) over the join output,
        // where m same-priced orders each join every matching line
        // (m × the counts and sums). Unique keys (the shipped data)
        // degenerate to the single-header row; the arms only differ for
        // duplicate or NULL order keys, where header.head would have
        // nondeterministically dropped all but one price group.
        headers.groupBy(_._2).iterator.map { case (oc, grp) =>
          val m = grp.size
          (k, n * m, s * m, oc, oc.map(_ - s * m))
        }
      }
    }.toDF("orderkey", "n_lines", "line_cents", "order_cents", "diff_cents")
  }

  val qCogroupReconcileSql: String =
    """SELECT o.o_orderkey AS orderkey,
      |  count(l.l_orderkey) AS n_lines,
      |  CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0)
      |       AS BIGINT) AS line_cents,
      |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS order_cents,
      |  CAST(round(o.o_totalprice * 100) AS BIGINT)
      |    - CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0)
      |           AS BIGINT) AS diff_cents
      |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |GROUP BY o.o_orderkey, o.o_totalprice""".stripMargin

  /** Pure-SQL interface: the referenced tables registered as views under
    * their canonical names, the query written as SQL text — the "a
    * reference user could switch and keep their SQL" demonstration. Same
    * Catalyst plan as the DataFrame equivalent; the oracle is literally
    * the same SQL modulo dialect (which is why these views, uniquely,
    * keep the canonical un-prefixed names). */
  def qSqlInterface(spark: SparkSession, dir: String): DataFrame = {
    val (o, c, n) = (Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir))
    graft.engine.Tables.withViews {
    o.createOrReplaceTempView("orders")
    c.createOrReplaceTempView("customer")
    n.createOrReplaceTempView("nation")
    spark.sql(
      """SELECT n_name,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY n_name""".stripMargin)
    }
  }

  val qSqlInterfaceSql: String =
    """SELECT n_name, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY n_name""".stripMargin

  // ---- registry ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q_distinct_agg" -> (qDistinctAgg _),
    "q_case_agg" -> (qCaseAgg _),
    "q_having" -> (qHaving _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_join_sortmerge" -> (qJoinSortMerge _),
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_bloom_join" -> (qBloomJoin _),
    "q_join_semi" -> (qJoinSemi _),
    "q_join_anti" -> (qJoinAnti _),
    "q_join_anti_nullaware" -> (qJoinAntiNullaware _),
    "q_cogroup_reconcile" -> (qCogroupReconcile _),
    "q_grouping_id" -> (qGroupingId _),
    "q_join_outer" -> (qJoinOuter _),
    "q_join_full_outer" -> (qJoinFullOuter _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_lateral" -> (qLateral _),
    "q_unpivot" -> (qUnpivot _),
    "q_exists_subquery" -> (qExistsSubquery _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_range_join" -> (qRangeJoin _),
    "q_range_join_dense" -> (qRangeJoinDense _),
    "q_tpch_q3" -> (qTpchQ3 _),
    "q_tpch_q5" -> (qTpchQ5 _),
    "q_tpch_q10" -> (qTpchQ10 _),
    "q_tpch_q14" -> (qTpchQ14 _),
    "q_tpch_q18" -> (qTpchQ18 _),
    "q_tpch_q13" -> (qTpchQ13 _),
    "q_tpch_q21" -> (qTpchQ21 _),
    "q_tpch_q6" -> (qTpchQ6 _),
    "q_tpch_q7" -> (qTpchQ7 _),
    "q_tpch_q8" -> (qTpchQ8 _),
    "q_tpch_q17" -> (qTpchQ17 _),
    "q_tpch_q19" -> (qTpchQ19 _),
    "q_tpch_q15" -> (qTpchQ15 _),
    "q_tpch_q22" -> (qTpchQ22 _),
    "q_stats_agg" -> (qStatsAgg _),
    "q_global_sort" -> (qGlobalSort _),
    "q_null_fns" -> (qNullFns _),
    "q_sql_interface" -> (qSqlInterface _),
    "q_window_topn" -> (qWindowTopN _),
    "q_window_running" -> (qWindowRunning _),
    "q_window_range" -> (qWindowRange _),
    "q_topk" -> (qTopK _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_setops" -> (qSetOps _),
    "q_setops_all" -> (qSetOpsAll _),
    "q_string_fns" -> (qStringFns _),
    "q_date_fns" -> (qDateFns _),
    "q_math_fns" -> (qMathFns _),
    "q_ntile" -> (qNtile _),
    "q_pivot" -> (qPivot _),
    "q_percentiles" -> (qPercentiles _),
    "q_approx_percentiles" -> (qApproxPercentiles _))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1PricingSummarySql,
    "q_distinct_agg" -> qDistinctAggSql,
    "q_case_agg" -> qCaseAggSql,
    "q_having" -> qHavingSql,
    "q_join_broadcast" -> qJoinBroadcastSql,
    "q_join_sortmerge" -> qJoinSortMergeSql,
    // identical aggregate over the co-located join — bucketing must not
    // change results, only the plan
    "q_bucketed_join" -> qJoinSortMergeSql,
    "q_bloom_join" -> qBloomJoinSql,
    "q_join_semi" -> qJoinSemiSql,
    "q_join_anti" -> qJoinAntiSql,
    "q_join_anti_nullaware" -> qJoinAntiNullawareSql,
    "q_cogroup_reconcile" -> qCogroupReconcileSql,
    "q_grouping_id" -> qGroupingIdSql,
    "q_join_outer" -> qJoinOuterSql,
    "q_join_full_outer" -> qJoinFullOuterSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_lateral" -> qLateralSql,
    "q_unpivot" -> qUnpivotSql,
    "q_exists_subquery" -> qExistsSubquerySql,
    "q_scalar_subquery" -> qScalarSubquerySql,
    "q_range_join" -> qRangeJoinSql,
    "q_range_join_dense" -> qRangeJoinDenseSql,
    "q_tpch_q3" -> qTpchQ3Sql,
    "q_tpch_q5" -> qTpchQ5Sql,
    "q_tpch_q10" -> qTpchQ10Sql,
    "q_tpch_q14" -> qTpchQ14Sql,
    "q_tpch_q18" -> qTpchQ18Sql,
    "q_tpch_q13" -> qTpchQ13Sql,
    "q_tpch_q21" -> qTpchQ21Sql,
    "q_tpch_q6" -> qTpchQ6Sql,
    "q_tpch_q7" -> qTpchQ7Sql,
    "q_tpch_q8" -> qTpchQ8Sql,
    "q_tpch_q17" -> qTpchQ17Sql,
    "q_tpch_q19" -> qTpchQ19Sql,
    "q_tpch_q15" -> qTpchQ15Sql,
    "q_tpch_q22" -> qTpchQ22Sql,
    "q_stats_agg" -> qStatsAggSql,
    "q_global_sort" -> qGlobalSortSql,
    "q_null_fns" -> qNullFnsSql,
    "q_sql_interface" -> qSqlInterfaceSql,
    "q_window_topn" -> qWindowTopNSql,
    "q_window_running" -> qWindowRunningSql,
    "q_window_range" -> qWindowRangeSql,
    "q_topk" -> qTopKSql,
    "q_rollup" -> qRollupSql,
    "q_cube" -> qCubeSql,
    "q_setops" -> qSetOpsSql,
    "q_setops_all" -> qSetOpsAllSql,
    "q_string_fns" -> qStringFnsSql,
    "q_date_fns" -> qDateFnsSql,
    "q_math_fns" -> qMathFnsSql,
    "q_pivot" -> qPivotSql,
    "q_ntile" -> qNtileSql,
    "q_percentiles" -> qPercentilesSql)
    // q_approx_percentiles: GK-sketch values are engine-specific →
    // rows-only; ApproxPercentileSpec bounds them against q_percentiles.
}
