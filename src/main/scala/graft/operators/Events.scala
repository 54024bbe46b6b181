package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Tables
import graft.functions.Exact.dsum

/** Event-stream operators in batch form over the `events` table: JSON
  * extraction, tumbling/sliding/session windows, as-of join, pivot,
  * distinct-per-day. The same window expressions run under Structured
  * Streaming in `graft.streaming.StreamingWindows`; keeping the batch
  * twin here lets the DuckDB oracle check the semantics.
  *
  * Scale notes: every query shuffles once on its natural key (window
  * bucket / user_id / day). The as-of join is the union+last-over-window
  * form — one shuffle on user_id, no range-join explosion.
  */
object Events {

  private val PropsSchema = StructType(Seq(StructField("k", LongType)))

  private def fmt(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Microsecond-precision render — ONE definition for every
    * oracle-compared event timestamp (batch and streaming twins), so a
    * precision change is a single edit mirrored in the `%f` strftime of
    * the oracles. */
  private[graft] def fmtUs(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  // ---- JSON extraction -----------------------------------------------------

  /** from_json over `props` → typed field, aggregated per event type. */
  def eventsJsonKv(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), PropsSchema).getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"),
        (sum(col("k")).cast("double") / count(lit(1))).as("k_avg"))

  val eventsJsonKvSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(TRY_CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
      |  max(TRY_CAST(props->>'k' AS BIGINT)) AS k_max,
      |  CAST(sum(TRY_CAST(props->>'k' AS BIGINT)) AS DOUBLE) / count(*) AS k_avg
      |FROM events GROUP BY event_type""".stripMargin

  /** The same extraction through Spark 4's VARIANT type — the
    * semi-structured path for when props have no fixed schema (from_json
    * needs one up front; parse_json does not). `parse_json` shreds the
    * JSON into the binary variant encoding once at the scan, and
    * `variant_get` does typed path extraction — at 100 TB this is the
    * difference between parsing JSON text per field access and walking a
    * compact binary tree. Same aggregate domain as eventsJsonKv, so the
    * two extraction routes are verified against each other through the
    * shared DuckDB oracle shape. `try_parse_json` + `try_variant_get`,
    * not the strict forms: the from_json twin nulls BOTH malformed
    * props rows and type-mismatched values (PERMISSIVE mode), while
    * strict parse/extract would abort the whole query on one bad
    * record (`variant_get` raises INVALID_VARIANT_CAST on e.g.
    * {"k": "abc"}) — lenient keeps the two routes behaviorally
    * identical; the oracle's TRY_CAST is the same contract.
    */
  def eventsVariant(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        try_variant_get(try_parse_json(col("props")), "$.k", "bigint").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"))

  val eventsVariantSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(TRY_CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
      |  max(TRY_CAST(props->>'k' AS BIGINT)) AS k_max
      |FROM events GROUP BY event_type""".stripMargin

  // ---- tumbling window -----------------------------------------------------

  /** Tumbling 1-hour windows per event type: the canonical streaming agg
    * in batch form (`window()` buckets, one shuffle). */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("val_sum"))
      .select(fmt(col("w.start")).as("ws"), col("event_type"), col("n"), col("val_sum"))

  val eventsHourlySql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---- sliding window ------------------------------------------------------

  /** Sliding windows (1h length, 30m slide): every event lands in exactly
    * two windows. */
  def eventsSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(fmt(col("w.start")).as("ws"), col("n"))

  /** DuckDB twin: each event's two containing window starts are the 30-min
    * grid point at-or-before ts, and that minus 30 min. */
  val eventsSlidingSql: String =
    """WITH g AS (
      |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
      |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
      |  FROM events)
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, count(*) AS n
      |FROM g GROUP BY 1""".stripMargin

  /** lead/lag analytics: inter-event gaps per user — the feature
    * engineering shape behind dwell time / inactivity signals. One
    * window sort per user; edge rows are null in BOTH engines (lag/lead
    * outside the partition). event_id tiebreak keeps equal-ts
    * neighbours deterministic for the hash compare. */
  def eventsLeadLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(
        col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("since_prev_us"),
        (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
          .as("until_next_us"))
  }

  val eventsLeadLagSql: String =
    """SELECT event_id, user_id,
      |  date_diff('microsecond',
      |            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      |            ts) AS since_prev_us,
      |  date_diff('microsecond', ts,
      |            lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |    AS until_next_us
      |FROM events""".stripMargin

  // ---- session window ------------------------------------------------------

  /** Session inactivity gap — ONE source of truth for every session
    * twin: the interval string feeds the `session_window` paths (batch
    * + both streaming window twins) and the micros form feeds the
    * stateful flatMapGroupsWithState twin, so a gap change can never
    * move one twin without the others (they are hash-checked against
    * the same gaps-and-islands oracle). */
  private val SessionGapMinutes = 30L
  val SessionGap = s"$SessionGapMinutes minutes"
  val SessionGapUs: Long = SessionGapMinutes * 60L * 1000L * 1000L

  /** Per-user sessions with a 30-minute inactivity gap
    * (`session_window` — Spark's merging session windows in batch mode).
    * Duration = last-minus-first event, exact micros.
    */
  def eventsSessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), SessionGap).as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"),
        fmtUs(min(col("ts"))).as("sess_start"))
      // integer division (`div`): Column `/` is IEEE double division and
      // truncates on the later cast, while DuckDB CAST(double AS BIGINT)
      // rounds — off-by-one on .5+ fractions. Floor both sides instead.
      .select(col("user_id"), col("sess_start"), col("n_events"),
        expr("dur_us div 1000000").as("dur_sec"))

  /** Gaps-and-islands twin: a session break is a gap > 30 min; the
    * running sum of breaks numbers the sessions.
    *
    * Islands are computed over DISTINCT (user_id, ts) with the event
    * multiplicity carried alongside (r19, found by the sf1 oracle
    * hold): the naive per-ROW form breaks ties arbitrarily — with
    * duplicate timestamps the session-opening brk=1 row's position
    * among its equal-ts peers is whatever order the window sort
    * happened to produce, and the ROWS-frame running sum then splits
    * the tie group between two sessions nondeterministically (DuckDB
    * returned 95465–95469 sessions across runs on the sf1 fixture,
    * whose replicated events carry 10× duplicate timestamps).
    * `session_window` semantics — simultaneous events share a session
    * — are what the engine computes deterministically; de-duplicating
    * the timeline first makes the oracle say the same thing with no
    * peer order left to vary. */
  val eventsSessionsSql: String =
    """WITH t AS (
      |  SELECT user_id, ts, count(*) AS cnt
      |  FROM events GROUP BY user_id, ts),
      |d AS (
      |  SELECT user_id, ts, cnt,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL '30 minutes'
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS brk
      |  FROM t),
      |s AS (
      |  SELECT user_id, ts, cnt,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                   ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM d)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
      |  CAST(sum(cnt) AS BIGINT) AS n_events,
      |  CAST(date_diff('microsecond', min(ts), max(ts)) // 1000000 AS BIGINT) AS dur_sec
      |FROM s GROUP BY user_id, sess""".stripMargin

  // ---- as-of join ----------------------------------------------------------

  /** The union-tag + running `last(ignoreNulls)` machinery BOTH as-of
    * directions share (one definition, so a tie-break or tagging fix can
    * never land in one direction and not the other): tag click rows with
    * their own ts, scan each user's events in `tsOrder`, carry the most
    * recent non-null click ts, keep purchases. Clicks sort before
    * purchases at equal ts (`event_type` asc) so ties resolve INCLUSIVE
    * of the purchase instant in both directions. ONE shuffle on user_id,
    * the plan shape that survives 100 TB (a naive range join explodes). */
  private def asofClickForPurchase(spark: SparkSession, dir: String,
      tsOrder: Column): DataFrame = {
    val tagged = Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        when(col("event_type") === "click", col("ts")).as("click_ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(tsOrder, col("event_type").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        fmtUs(col("ts")).as("purchase_ts"),
        fmtUs(col("asof_click_ts")).as("click_ts"))
  }

  /** As-of join: for each purchase, the most recent click at-or-before it
    * by the same user — [[asofClickForPurchase]] in ascending time
    * (DuckDB's ASOF JOIN is the oracle's native form).
    */
  def eventsAsof(spark: SparkSession, dir: String): DataFrame =
    asofClickForPurchase(spark, dir, col("ts").asc)

  val eventsAsofSql: String =
    """SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  /** FORWARD as-of: for each purchase, the EARLIEST click at-or-after
    * it by the same user — the attribution direction [[eventsAsof]]'s
    * backward form can't express ("did a click follow this purchase?").
    * Same union-tag machinery, time-reversed: process per-user events
    * in DESCENDING ts (clicks before purchases at equal ts so "at-or-
    * after" includes ties) and carry the running `last` non-null click
    * timestamp — [[asofClickForPurchase]] in DESCENDING time, nothing
    * else differs. The oracle is a correlated min-subquery, deliberately
    * a different algorithm from the window form so the semantics, not
    * the plan, are what match. */
  def eventsAsofForward(spark: SparkSession, dir: String): DataFrame =
    asofClickForPurchase(spark, dir, col("ts").desc)

  val eventsAsofForwardSql: String =
    """SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
      |  strftime((SELECT min(c.ts) FROM events c
      |            WHERE c.event_type = 'click'
      |              AND c.user_id = p.user_id
      |              AND c.ts >= p.ts), '%Y-%m-%d %H:%M:%S.%f') AS click_ts
      |FROM events p WHERE p.event_type = 'purchase'""".stripMargin

  // ---- map functions -------------------------------------------------------

  /** JSON → MapType + map functions (map_keys, try_element_at,
    * map_contains_key): schema-free props handling, for payloads whose
    * keys vary by event. Robustness contract (the fixture is all-clean
    * `{"k": long}`, so these arms are latent): the map is parsed with
    * STRING values and the long cast applied per-field with
    * try_cast/TRY_CAST — a `Map<String,Long>` schema would NULL the
    * WHOLE map on one non-long value (PERMISSIVE mode nulls the row)
    * while the oracle's `json_keys` still counts its keys;
    * `try_element_at`, because ANSI `element_at` THROWS on an absent
    * key; and a NULL props row groups under has_missing = NULL in both
    * engines (the oracle CASE mirrors `map_contains_key`'s null
    * propagation — bare `json_extract(...) IS NOT NULL` would fold those
    * rows into the `false` group). */
  def eventsMapFns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), MapType(StringType, StringType)).as("m"))
      .select(col("event_type"),
        size(map_keys(col("m"))).cast("long").as("n_keys"),
        try_element_at(col("m"), lit("k")).try_cast("long").as("k_val"),
        map_contains_key(col("m"), "missing").as("has_missing"))
      .groupBy("event_type", "has_missing")
      .agg(count(lit(1)).as("n"),
        sum(col("n_keys")).as("total_keys"),
        sum(col("k_val")).as("k_sum"))

  val eventsMapFnsSql: String =
    """WITH m AS (
      |  SELECT event_type,
      |    CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
      |    TRY_CAST(props->>'k' AS BIGINT) AS k_val,
      |    CASE WHEN props IS NULL THEN NULL
      |         ELSE json_extract(props, '$.missing') IS NOT NULL END AS has_missing
      |  FROM events)
      |SELECT event_type, has_missing, count(*) AS n,
      |  CAST(sum(n_keys) AS BIGINT) AS total_keys,
      |  CAST(sum(k_val) AS BIGINT) AS k_sum
      |FROM m GROUP BY 1, 2""".stripMargin

  // ---- pivot ---------------------------------------------------------------

  /** Pivot: daily event counts, one column per event type (explicit value
    * list — at scale an unlisted pivot needs an extra distinct pass). */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  val eventsPivotSql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
      |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
      |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
      |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
      |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
      |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
      |FROM events GROUP BY 1""".stripMargin

  // ---- distinct users per day ----------------------------------------------

  /** Exact daily active users + event count. */
  def eventsDailyActive(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("dau"), count(lit(1)).as("n"))

  val eventsDailyActiveSql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
      |  count(DISTINCT user_id) AS dau, count(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  // ---- time-series / user analytics ------------------------------------------

  /** Time-series RESAMPLE + forward fill — the gap-filling step every
    * downstream ML/monitoring consumer needs (regular grid in, ragged
    * events out): per user, an hourly grid from the user's first to last
    * event hour, each grid cell carrying that hour's event count (0 when
    * silent) and the most recent non-empty hour's value sum
    * (forward/LOCF fill). Grid generation is `sequence` + explode — rows
    * are produced from each user's 2-row bound, never read — so the scan
    * stays one pass; the fill is `last(..., ignoreNulls)` over a
    * running ROWS frame, one shuffle on user_id shared by grid and fill.
    * Forward-filled values are CARRIED, not recomputed — each was
    * produced once by the decimal-domain hourly sum, so LOCF introduces
    * no new floating-point ops and the result stays hash-exact.
    * Per-user grids (not one global grid) keep the row count
    * Σ user-span-hours, not users × global-span — the difference between
    * linear and quadratic blow-up when user lifetimes are staggered at
    * scale.
    */
  def eventsResample(spark: SparkSession, dir: String): DataFrame =
    // two-scan partial-agg form SHIPPED — the r22 A/B measured the
    // single-scan/one-exchange alternative and kept this one; numbers
    // and the scale reading in OPTIMIZATION_r22.md (VERDICT r21 item 5).
    eventsResampleForm(spark, dir, oneExchange = false)

  /** Both plan shapes, for the r22 A/B (ProbeR22e; VERDICT r21 item 5 —
    * the twice-deferred events_resample decision).
    *
    * `oneExchange = false` (shipped): hourly agg and grid bounds each
    * scan events and partially aggregate BEFORE their exchange — two
    * column-pruned scans, two small exchanges, hourly joined back by
    * broadcast at bench scale; the window reuses the grid's user_id
    * partitioning.
    *
    * `oneExchange = true`: ONE raw-events scan repartitioned by user_id
    * once; the hourly agg, grid bounds, grid-hourly join and LOCF window
    * all reuse that single exchange (subset partitioning satisfies every
    * downstream ClusteredDistribution) — but every raw event row crosses
    * the exchange unaggregated, trading map-side reduction for scan and
    * exchange count. */
  private[graft] def eventsResampleForm(
      spark: SparkSession, dir: String, oneExchange: Boolean): DataFrame = {
    val hourly =
      if (oneExchange)
        Tables.events(spark, dir)
          .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("value"))
          .repartition(col("user_id"))
          .groupBy(col("user_id"), col("h"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
      else
        Tables.events(spark, dir)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
    val grid = hourly
      .groupBy("user_id")
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), fmt(col("h")).as("ws"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("v"), ignoreNulls = true).over(w).as("val_ff"))
  }

  val eventsResampleSql: String =
    """WITH o AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT user_id,
      |    unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
      |  FROM o GROUP BY user_id)
      |SELECT g.user_id, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS ws,
      |  coalesce(o.n, 0) AS n,
      |  last_value(o.v IGNORE NULLS)
      |    OVER (PARTITION BY g.user_id ORDER BY g.h
      |          ROWS UNBOUNDED PRECEDING) AS val_ff
      |FROM g LEFT JOIN o ON g.user_id = o.user_id AND g.h = o.h""".stripMargin

  /** FUNNEL analysis — staged conversion over an event stream: per user,
    * the first signup, the first click strictly after it, and the first
    * purchase strictly after that click, with the stage reached (1–3).
    * Each stage is one filtered aggregation joined to the previous
    * stage's per-user firsts — the stage tables are user-cardinality
    * (dimension-sized, broadcast), so the big event scan is filtered and
    * partially aggregated before its only exchange, three times; no
    * window over the full event history and no per-user event sorting.
    * All outputs are carried timestamps (formatted) and integer flags —
    * no arithmetic on values, hash-exact cross-engine.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t_signup"))
    val click = ev.filter(col("event_type") === "click")
      .join(broadcast(signup), Seq("user_id"))
      .filter(col("ts") > col("t_signup"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(broadcast(click), Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    signup
      .join(click, Seq("user_id"), "left")
      .join(purchase, Seq("user_id"), "left")
      .select(col("user_id"),
        fmtUs(col("t_signup")).as("t_signup"),
        fmtUs(col("t_click")).as("t_click"),
        fmtUs(col("t_purchase")).as("t_purchase"),
        (lit(1L) + col("t_click").isNotNull.cast("long")
          + col("t_purchase").isNotNull.cast("long")).as("stage"))
  }


  val eventsFunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
      |  WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
      |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
      |SELECT s1.user_id,
      |  strftime(t1, '%Y-%m-%d %H:%M:%S.%f') AS t_signup,
      |  strftime(t2, '%Y-%m-%d %H:%M:%S.%f') AS t_click,
      |  strftime(t3, '%Y-%m-%d %H:%M:%S.%f') AS t_purchase,
      |  CAST(1 + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT AS BIGINT) AS stage
      |FROM s1
      |LEFT JOIN s2 ON s1.user_id = s2.user_id
      |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin

  /** Fixed-bin histogram of event values per event type: bin =
    * min(floor(value/25), 19) — 20 equal-width bins over [0, 500) with
    * the open tail clamped into the last bin. One hash aggregation on
    * (event_type, bin) with map-side partial counts; bin count is a
    * constant, so state per task is bounded regardless of row count —
    * the histogram shape that scales to 100 TB (contrast an exact
    * value→count map, whose state grows with the value domain; see
    * [[graft.operators.Relational.qPercentiles]]'s scale note). The bin
    * boundary arithmetic is floor of a double/25 division — exact for
    * both engines on identical operands (no transcendental). Empty bins
    * are absent, not zero-filled: at scale the dense fill is a
    * generator-join the consumer adds when plotting, not a shuffle this
    * operator should pay.
    */
  def eventsHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        least(floor(col("value") / lit(25.0)), lit(19.0)).cast("long").as("bin"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("bin"),
        (col("bin") * 25.0).as("bin_lo"), col("n"))

  val eventsHistogramSql: String =
    """SELECT event_type,
      |  CAST(least(floor(value / 25.0), 19.0) AS BIGINT) AS bin,
      |  CAST(CAST(least(floor(value / 25.0), 19.0) AS BIGINT) * 25 AS DOUBLE) AS bin_lo,
      |  count(*) AS n
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** ROLLING 7-DAY ACTIVE USERS (WAU) — the canonical rolling-DISTINCT
    * problem: distinct is not decomposable over sliding windows, so a
    * per-day window can't reuse neighbors' state. The exact scalable
    * form is CONTRIBUTION REPLICATION: collapse events to distinct
    * user-days once (the only full-table pass, partially aggregated),
    * then each user-day contributes to the 7 report days it falls in —
    * a ×7 generated fan-out of the small user-day table, NOT of raw
    * events — and the final agg counts distinct users per report day.
    * Report days are restricted to days that exist in the data (join
    * with the observed-day dimension), matching the oracle's grid. At
    * extreme scale the sketch path replaces countDistinct with
    * mergeable HLL per day ([[graft.functions.Extensibility]]) — same
    * shape, no replication needed since HLL unions slide. */
  /** Distinct (user_id, day) pairs — the ONE full events pass both
    * [[eventsWau]] and [[eventsRetention]] build on, shared so the day
    * derivation (timezone, to_date semantics) can never drift between
    * the two cohort consumers. */
  private def userDays(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()

  def eventsWau(spark: SparkSession, dir: String): DataFrame = {
    val ud = userDays(spark, dir)
    val observedDays = ud.select(col("day").as("report_day")).distinct()
    ud
      .select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("off"), col("day"))
      .select(col("user_id"), date_add(col("day"), col("off")).as("report_day"))
      .join(broadcast(observedDays), Seq("report_day"))
      .groupBy("report_day")
      .agg(countDistinct(col("user_id")).as("wau"))
      .select(date_format(col("report_day"), "yyyy-MM-dd").as("report_day"),
        col("wau"))
  }

  val eventsWauSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |days AS (SELECT DISTINCT day AS report_day FROM ud)
      |SELECT strftime(d.report_day, '%Y-%m-%d') AS report_day,
      |  count(DISTINCT u.user_id) AS wau
      |FROM days d JOIN ud u
      |  ON u.day BETWEEN d.report_day - 6 AND d.report_day
      |GROUP BY 1""".stripMargin

  /** COHORT RETENTION matrix: users grouped by first-active day, counted
    * on each later active day as an offset from the cohort day — the
    * table behind every retention curve. Three aggregations, each with
    * map-side partial state: (1) the event scan collapses to distinct
    * (user, day) pairs — the only pass over the big table, partially
    * aggregated before its single exchange; (2) per-user first day is an
    * agg over those user-days (user-cardinality output, dimension-sized
    * → broadcast); (3) the user-day table joins its user's cohort day by
    * broadcast — no second shuffle of the big side — and aggregates on
    * (cohort_day, offset). `count(*)`, not `count(DISTINCT user_id)`, in
    * the final agg: rows are already distinct per (user, day) by
    * construction, so the expensive distinct state is free. At 100 TB
    * the cohort table outgrows a broadcast only when the USER count
    * does; the fallback is a shuffled join on user_id — still one
    * shuffle of user-days, never of raw events. */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val ud = userDays(spark, dir)
    val cohorts = ud.groupBy("user_id")
      .agg(min(col("day")).as("cohort_day"))
    ud.join(broadcast(cohorts), Seq("user_id"))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("offset_days"))
      .agg(count(lit(1)).as("users"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("offset_days").cast("long").as("offset_days"), col("users"))
  }

  val eventsRetentionSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1)
      |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
      |  CAST(date_diff('day', c.cohort_day, ud.day) AS BIGINT) AS offset_days,
      |  count(*) AS users
      |FROM ud JOIN c ON ud.user_id = c.user_id
      |GROUP BY 1, 2""".stripMargin

  /** TIME-RANGE WINDOW FRAME — per-user rolling 1-hour counters ending
    * at each event (`RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND
    * CURRENT ROW`): the feature-engineering shape behind velocity /
    * abuse signals ("how many events did this user fire in the last
    * hour?"). RANGE frames bound by a time interval differ from ROWS
    * frames in exactly the way that matters here — equal-timestamp
    * events share one frame, and the frame width is wall-clock, not a
    * row count. One shuffle on user_id, per-partition ordered scan; the
    * frame is evaluated with a sliding two-pointer over the sorted
    * partition, never a per-row rescan. Count and decimal sum only —
    * hash-exact. Expressed through spark.sql over the registered views
    * (the SQL INTERVAL frame literal), which also exercises the
    * ns-timestamp-safe events view registration. */
  def eventsWindowTimeRange(spark: SparkSession, dir: String): DataFrame = {
    // canonical un-prefixed view name: the oracle text IS dialect-neutral
    // SQL — run the identical string in both engines so the pair can
    // never desynchronize (only the one table the query reads is
    // registered; loading all ten per invocation was pure overhead).
    // The load (conform probing, possibly a footer/probe job on first
    // touch of a dir) runs BEFORE the lock — withViews guards only the
    // register+analyze window it exists for, not seconds of IO
    val ev = Tables.events(spark, dir)
    Tables.withViews {
      ev.createOrReplaceTempView("events")
      spark.sql(eventsWindowTimeRangeSql)
    }
  }

  val eventsWindowTimeRangeSql: String =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS n_1h,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS val_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |             RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)""".stripMargin

  /** TRANSITION MATRIX — next-event Markov counts per user journey:
    * how often does a view lead to a click, a click to a purchase? One
    * shuffle on user_id for the per-user ordered `lead` window (the
    * same exchange shape every per-user window op here shares), then a
    * dimension-cardinality aggregation on (from, to) pairs with
    * map-side partials. Terminal events (no successor) count under
    * to='<end>' so each user's row count is conserved — Σ transitions =
    * Σ events. The share is an IEEE double division of exact counts,
    * deterministic cross-engine. event_id breaks equal-timestamp ties,
    * same contract as [[eventsLeadLag]]. */
  def eventsTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val withNext = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type").as("from_type"),
        coalesce(lead(col("event_type"), 1).over(w), lit("<end>")).as("to_type"))
    val counts = withNext.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum(col("n")).as("from_n"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("from_n").cast("double")).as("share"))
  }

  val eventsTransitionsSql: String =
    """WITH t AS (
      |  SELECT event_type AS from_type,
      |    coalesce(lead(event_type) OVER (PARTITION BY user_id
      |                                    ORDER BY ts, event_id),
      |             '<end>') AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM t GROUP BY 1, 2),
      |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_n FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n,
      |  CAST(c.n AS DOUBLE) / CAST(f.from_n AS DOUBLE) AS share
      |FROM c JOIN f ON c.from_type = f.from_type""".stripMargin

  /** OUTLIER DETECTION — 3σ rule per event type, the data-quality gate
    * that catches corrupted values before they poison a training set.
    * Numerically disciplined for distributed execution: Σx and Σx² are
    * EXACT decimal sums (values carry ≤2 decimals, squares ≤4), so the
    * per-type mean/variance are IEEE doubles computed from identical
    * operands on every engine and every partition order — the naive
    * double-sum version would hash-diverge run-to-run at 100 TB, where
    * aggregation order is nondeterministic. Variance via E[x²]−E[x]²
    * on exact sums (the one-pass form; Welford is for streaming
    * accumulators, not needed when the sums are exact), σ via
    * IEEE-correctly-rounded sqrt. Per-type stats are
    * dimension-cardinality → broadcast back; the fact table is scanned
    * twice (once partially aggregated for stats, once for flagging) —
    * the unavoidable shape for global statistics, with pass 1's
    * exchange carrying only event-type cardinality rows. */
  def eventsOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val stats = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,2)")).as("s1"),
      sum((col("value").cast("decimal(18,2)") *
        col("value").cast("decimal(18,2)")).cast("decimal(28,4)")).as("s2"))
      .select(col("event_type"),
        (col("s1").cast("double") / col("n").cast("double")).as("mean"),
        // E[x²]−E[x]² can round to a tiny NEGATIVE double for
        // (near-)constant values; Spark's sqrt would yield NaN but
        // DuckDB's raises — clamp at 0 in BOTH engines so the
        // divergence class can't exist
        sqrt(greatest(col("s2").cast("double") / col("n").cast("double") -
          (col("s1").cast("double") / col("n").cast("double")) *
          (col("s1").cast("double") / col("n").cast("double")), lit(0.0)))
          .as("sigma"))
    ev.join(broadcast(stats), Seq("event_type"))
      .filter(col("value") > col("mean") + lit(3.0) * col("sigma") ||
        col("value") < col("mean") - lit(3.0) * col("sigma"))
      .select(col("event_id"), col("event_type"), col("value"),
        ((col("value") - col("mean")) / col("sigma")).as("z"))
  }

  val eventsOutliersSql: String =
    """WITH s AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(value AS DECIMAL(18,2))) AS s1,
      |    sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
      |             AS DECIMAL(28,4))) AS s2
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT event_type,
      |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |         - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) AS sigma
      |  FROM s)
      |SELECT e.event_id, e.event_type, e.value,
      |  (e.value - m.mean) / m.sigma AS z
      |FROM events e JOIN m ON e.event_type = m.event_type
      |WHERE e.value > m.mean + 3.0 * m.sigma
      |   OR e.value < m.mean - 3.0 * m.sigma""".stripMargin

  // ---- TPC-H Q4/Q12-shaped date-interval queries (r20, VERDICT r19 task 5) --

  /** TPC-H Q4's SHAPE over the events table — the two Q-shapes the
    * testdata's missing commit/receipt DATE columns kept out of the
    * TPC-H battery (SURVEY.md "expressible" cut), closed here with a
    * DERIVED commit deadline instead: every event is "due" by minute 45
    * of its hour (`commit_ts = date_trunc(hour, ts) + 45min`), and an
    * event past its deadline is a LATE arrival — ts vs a derived
    * commit-ts, exactly Q4's `l_commitdate < l_receiptdate` interval
    * test. Structure mirrors Q4 1:1: a date-window filter on the parent
    * relation (distinct user-days ~ orders in a quarter), a correlated
    * EXISTS against the event lines, and a group-count on the parent
    * dimension. Spark decorrelates the EXISTS to a left-semi hash join —
    * at 100 TB both sides partition on (day, user_id) and the parent is
    * the distinct-reduced (small) side; no driver-side anchor, no
    * cartesian. The child repeats the ts window explicitly: the day
    * equality to a windowed parent already implies it, but Catalyst
    * cannot infer that through date_format, and without it the child
    * scan reads ALL of history at 100 TB (plan audited: both scans show
    * the window in PushedFilters). */
  def eventsQ4Shape(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("q4_events")
    spark.sql(
      """SELECT day, count(*) AS late_user_days
        |FROM (SELECT DISTINCT date_format(ts, 'yyyy-MM-dd') AS day, user_id
        |      FROM q4_events
        |      WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |        AND ts <  TIMESTAMP '2024-01-22 00:00:00') v
        |WHERE EXISTS (
        |  SELECT 1 FROM q4_events e
        |  WHERE date_format(e.ts, 'yyyy-MM-dd') = v.day
        |    AND e.user_id = v.user_id
        |    AND e.ts >= TIMESTAMP '2024-01-08 00:00:00'
        |    AND e.ts <  TIMESTAMP '2024-01-22 00:00:00'
        |    AND e.ts > date_trunc('hour', e.ts) + INTERVAL 45 MINUTE)
        |GROUP BY day""".stripMargin)
  }

  val eventsQ4ShapeSql: String =
    """SELECT day, count(*) AS late_user_days
      |FROM (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id
      |      FROM events
      |      WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |        AND ts <  TIMESTAMP '2024-01-22 00:00:00') v
      |WHERE EXISTS (
      |  SELECT 1 FROM events e
      |  WHERE strftime(e.ts, '%Y-%m-%d') = v.day
      |    AND e.user_id = v.user_id
      |    AND e.ts >= TIMESTAMP '2024-01-08 00:00:00'
      |    AND e.ts <  TIMESTAMP '2024-01-22 00:00:00'
      |    AND e.ts > date_trunc('hour', e.ts) + INTERVAL 45 MINUTE)
      |GROUP BY day""".stripMargin

  /** TPC-H Q12's SHAPE over events: the two-branch CASE aggregation
    * behind a chained date-interval predicate
    * (`ship < commit AND commit < receipt AND receipt IN window`), with
    * the ship/commit/receipt timestamps DERIVED deterministically from
    * the row (`commit = ts + (event_id mod 48)h`,
    * `receipt = ts + (user_id mod 72)h`) since events carries no such
    * columns — the derivation IS the point: both engines compute the
    * same chain, so the oracle is a full hash check. The priority split
    * (`user_id mod 5 < 2` ~ URGENT/HIGH) rides the CASE branches exactly
    * like Q12's high/low line counts. One codegen'd scan + one shuffle
    * on the 5-value group key; the filter reaches the scan. */
  def eventsQ12Shape(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("commit_ts",
        expr("timestampadd(HOUR, CAST(event_id % 48 AS INT), ts)"))
      .withColumn("receipt_ts",
        expr("timestampadd(HOUR, CAST(user_id % 72 AS INT), ts)"))
      .filter(col("ts") < col("commit_ts") &&
        col("commit_ts") < col("receipt_ts") &&
        col("receipt_ts") >= lit("2024-01-01").cast("timestamp") &&
        col("receipt_ts") < lit("2024-02-01").cast("timestamp"))
      .groupBy("event_type")
      .agg(
        sum(when(pmod(col("user_id"), lit(5)) < 2, 1L).otherwise(0L))
          .as("high_priority_count"),
        sum(when(pmod(col("user_id"), lit(5)) < 2, 0L).otherwise(1L))
          .as("low_priority_count"))

  /** DuckDB %: remainder with the dividend's sign, same as Spark's `%`
    * — but the Spark side uses pmod (always ≥ 0) for the PRIORITY split,
    * so the oracle mirrors with ((user_id % 5) + 5) % 5; the interval
    * derivations use plain % on both sides. */
  val eventsQ12ShapeSql: String =
    """WITH d AS (
      |  SELECT event_type, user_id, ts,
      |    ts + (event_id % 48) * INTERVAL 1 HOUR AS commit_ts,
      |    ts + (user_id % 72) * INTERVAL 1 HOUR AS receipt_ts
      |  FROM events)
      |SELECT event_type,
      |  CAST(sum(CASE WHEN ((user_id % 5) + 5) % 5 < 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS high_priority_count,
      |  CAST(sum(CASE WHEN ((user_id % 5) + 5) % 5 < 2 THEN 0 ELSE 1 END) AS BIGINT)
      |    AS low_priority_count
      |FROM d
      |WHERE ts < commit_ts AND commit_ts < receipt_ts
      |  AND receipt_ts >= TIMESTAMP '2024-01-01 00:00:00'
      |  AND receipt_ts <  TIMESTAMP '2024-02-01 00:00:00'
      |GROUP BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_q4_shape" -> (eventsQ4Shape _),
    "events_q12_shape" -> (eventsQ12Shape _),
    "events_retention" -> (eventsRetention _),
    "events_wau" -> (eventsWau _),
    "events_transitions" -> (eventsTransitions _),
    "events_window_time_range" -> (eventsWindowTimeRange _),
    "events_outliers" -> (eventsOutliers _),
    "events_histogram" -> (eventsHistogram _),
    "events_resample" -> (eventsResample _),
    "events_funnel" -> (eventsFunnel _),
    "events_json_kv" -> (eventsJsonKv _),
    "events_variant" -> (eventsVariant _),
    "events_hourly" -> (eventsHourly _),
    "events_sliding" -> (eventsSliding _),
    "events_lead_lag" -> (eventsLeadLag _),
    "events_sessions" -> (eventsSessions _),
    "events_asof" -> (eventsAsof _),
    "events_asof_forward" -> (eventsAsofForward _),
    "events_map_fns" -> (eventsMapFns _),
    "events_pivot" -> (eventsPivot _),
    "events_daily_active" -> (eventsDailyActive _))

  val oracles: Map[String, String] = Map(
    "events_q4_shape" -> eventsQ4ShapeSql,
    "events_q12_shape" -> eventsQ12ShapeSql,
    "events_retention" -> eventsRetentionSql,
    "events_wau" -> eventsWauSql,
    "events_transitions" -> eventsTransitionsSql,
    "events_window_time_range" -> eventsWindowTimeRangeSql,
    "events_outliers" -> eventsOutliersSql,
    "events_histogram" -> eventsHistogramSql,
    "events_resample" -> eventsResampleSql,
    "events_funnel" -> eventsFunnelSql,
    "events_json_kv" -> eventsJsonKvSql,
    "events_variant" -> eventsVariantSql,
    "events_hourly" -> eventsHourlySql,
    "events_sliding" -> eventsSlidingSql,
    "events_lead_lag" -> eventsLeadLagSql,
    "events_sessions" -> eventsSessionsSql,
    "events_asof" -> eventsAsofSql,
    "events_asof_forward" -> eventsAsofForwardSql,
    "events_map_fns" -> eventsMapFnsSql,
    "events_pivot" -> eventsPivotSql,
    "events_daily_active" -> eventsDailyActiveSql)
}
