package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.Exact.dsum
import graft.sources.Formats

/** Table-maintenance operators — the janitorial half of a 100 TB
  * pipeline. Streaming ingest and per-executor sharded writes leave
  * datasets as swarms of small files; every subsequent scan then pays
  * per-file open cost (driver listing, footer reads, task scheduling)
  * that can dwarf the actual IO. Compaction rewrites a directory into
  * size-targeted files and is the standard periodic fix (the reference
  * counterpart is its bucketed M-file text sink — a FIXED fan-out that
  * small inputs over-shard the same way; see reference worker.py
  * partition/sink behavior cited in SURVEY.md §2a rows 8/11).
  */
object Maintenance {

  /** Target output file size. Sized to the test scale factors so the
    * compaction actually plans >0 merges at sf0.001–0.1; a production
    * deployment would set 128–1024 MiB (row-group-aligned) via the same
    * knob.
    */
  val TargetFileBytes: Long = 4L << 20

  /** ceil(bytes / target), floored at one file. */
  def plannedFiles(inputBytes: Long, targetBytes: Long = TargetFileBytes): Int =
    math.max(1L, (inputBytes + targetBytes - 1) / targetBytes).toInt

  /** Total data bytes of a written dataset dir (part files only —
    * _SUCCESS and checksums excluded), via the session Hadoop conf so
    * configured filesystems work (the LinesDataSource lesson).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).filter(s => s.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
  }

  /** Part-file count of a written dataset dir. */
  def dataFiles(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).count(_.getPath.getName.startsWith("part-"))
  }

  /** Compact `src` into ceil(bytes/target) files at `dest`; returns the
    * planned file count. The merge is `coalesce`, not `repartition`:
    * coalesce is a NARROW dependency — each output task concatenates
    * whole input partitions with zero shuffle — so the whole rewrite is
    * one shuffle-free pass. `repartition` would be the tool only if the
    * rewrite also had to re-CLUSTER rows (coalesce preserves whatever
    * row distribution the scan produced, which is exactly right for
    * pure compaction). Since coalesce can only DECREASE the partition
    * count, the scan's bin-packing is pinned to the compaction target
    * (`maxPartitionBytes` = targetBytes for this read only): each read
    * partition then holds at most targetBytes of data, so the scan
    * yields ≥ ceil(bytes/target) partitions and coalesce lands the
    * count exactly — under the session default (128 MiB ≫ a small
    * target) the scan could start BELOW the planned count and the
    * contract would silently under-deliver. The exact-count contract
    * holds for compaction's actual regime — input files at or below the
    * target; an input file LARGER than the target splits only at parquet
    * row-group boundaries, so a single-row-group jumbo file bounds how
    * finely any rewriter can cut (that direction is file SPLITTING, a
    * different maintenance op). Overwrite-mode write keeps the operation
    * idempotent — a retried compaction converges to the same state.
    */
  def compact(spark: SparkSession, src: String, dest: String,
      targetBytes: Long = TargetFileBytes): Int = {
    val n = plannedFiles(dataBytes(spark, src), targetBytes)
    Tables.withConf(spark, "spark.sql.files.maxPartitionBytes",
        targetBytes.toString) {
      spark.read.parquet(src).coalesce(n)
        .write.mode("overwrite").parquet(dest)
    }
    n
  }

  /** Driver-gated query: scatter lineitem into 64 deliberately tiny
    * files (simulating a micro-batched ingest), compact, then aggregate
    * the COMPACTED copy. The oracle computes the same aggregate over the
    * original table, so a hash match proves compaction is content-
    * preserving — every row survives exactly once (count), with values
    * intact (exact decimal sum) — while `MaintenanceSpec` separately
    * pins the file-count mechanics.
    */
  def maintCompact(spark: SparkSession, dir: String): DataFrame = {
    val scatter = Formats.tmp("maint_scatter", dir)
    Tables.lineitem(spark, dir)
      .repartition(64)
      .write.mode("overwrite").parquet(scatter)
    val dest = Formats.tmp("maint_compacted", dir)
    compact(spark, scatter, dest)
    spark.read.parquet(dest)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
  }

  val maintCompactSql: String =
    """SELECT l_returnflag,
      |  count(*) AS n_rows,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Sort-clustered rewrite — the data-SKIPPING half of maintenance
    * (compaction fixes file count; clustering fixes file pruning).
    * `repartitionByRange` on the filter column gives each output file a
    * disjoint key range (RangePartitioner samples split points, equal
    * keys land in one partition), and `sortWithinPartitions` orders rows
    * inside each file so parquet row-group min/max stats are tight too.
    * A later range-predicate scan then skips whole files/row-groups via
    * footer stats — at 100 TB this is the difference between reading one
    * day and reading the whole table. Single-column range clustering is
    * the degenerate-but-dominant case of Z-order (one dimension); the
    * spec pins the property that makes skipping work — pairwise-disjoint
    * per-file key ranges — rather than any engine counter.
    *
    * The gated query aggregates a date-sliced scan OF THE CLUSTERED COPY
    * against the oracle's slice of the original, proving the rewrite
    * preserved content (clustering must never change query results, only
    * IO).
    */
  def maintCluster(spark: SparkSession, dir: String): DataFrame = {
    val dest = Formats.tmp("maint_clustered", dir)
    Tables.lineitem(spark, dir)
      .repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(dest)
    spark.read.parquet(dest)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
  }

  val maintClusterSql: String =
    """SELECT l_returnflag,
      |  count(*) AS n_rows,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag""".stripMargin

  /** Interleave the low 16 bits of `a` and `b` (both pre-normalized to
    * 0..65535) into a 32-bit Morton (Z-curve) value: bit i of `a` lands
    * at position 2i+1, bit i of `b` at 2i. Pure Column arithmetic —
    * 16 shift/mask terms folded with OR — so the whole computation
    * stays inside whole-stage codegen. */
  private def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(a.bitwiseAND(lit(1L << i)), i + 1)
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i))
    }.reduce(_ bitwiseOR _)

  /** Z-ORDER clustered rewrite — multi-dimensional data skipping, the
    * general case of [[maintCluster]]'s single-column range clustering.
    * 1-D clustering gives perfect file pruning on ONE column and none on
    * any other (each shipdate-sorted file still spans the whole partkey
    * domain); interleaving the bits of BOTH normalized dimensions into a
    * Morton value and range-clustering on THAT gives files small
    * bounding BOXes — with n files, roughly 1/√n of each domain — so
    * predicates on either column (or both) skip most files via footer
    * stats. The guarantee is BULK, not per-file: a range split point
    * landing across a high-bit flip produces the occasional fat box
    * (the z-curve jump), which is why ZorderSpec pins skip counts and
    * a 12-of-16 tightness quota rather than every file. At 100 TB this
    * is the layout for the two-predicate scan pattern (time range +
    * key equality) no single sort order serves.
    * Normalization bounds come from one 1-row min/max aggregate
    * (bounded driver lookup, same discipline as the IVF index sample);
    * the z column is dropped before the write — layout must not change
    * the schema. The gated query aggregates a BOTH-dimension slice of
    * the rewritten copy against the oracle's identical slice of the
    * original (clustering must never change results, only IO);
    * `ZorderSpec` pins the bounding-box property itself and the
    * contrast with the 1-D layout.
    */
  def maintZorder(spark: SparkSession, dir: String): DataFrame = {
    val dest = zorderedCopy(spark, dir)
    spark.read.parquet(dest)
      .filter(col("l_partkey").between(50, 99) &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
  }

  /** The rewrite half of [[maintZorder]]: lineitem z-clustered on
    * (l_partkey, l_shipdate) into 16 files; returns the dataset dir. */
  private[graft] def zorderedCopy(spark: SparkSession, dir: String): String = {
    val dest = Formats.tmp("maint_zordered", dir)
    val li = Tables.lineitem(spark, dir)
    val b = li.agg(
      min("l_partkey"), max("l_partkey"),
      min("l_shipdate"), max("l_shipdate")).collect()(0)
    // empty lineitem, or EITHER z dim all-null (one unbounded axis makes
    // the whole interleave NULL for every row anyway): nothing to
    // lay out — write the rows (if any) unchanged and return. Layout
    // must never change results, only IO, so the degenerate rewrite is
    // the identity copy, not an abort (the r11 loud require traded an
    // opaque NPE for killing the whole battery on a just-created table)
    if (b.isNullAt(0) || b.isNullAt(2)) {
      li.write.mode("overwrite").parquet(dest)
      return dest
    }
    val (pkMin, pkMax) = (b.getLong(0), b.getLong(1))
    // l_shipdate is session-zone TIMESTAMP after Tables.conform
    // (java.sql.Timestamp externally; UTC is pinned) — accept the NTZ
    // external class too so this helper doesn't care which encoding a
    // data refresh shipped
    def toLdt(v: Any): java.time.LocalDateTime = v match {
      case t: java.sql.Timestamp =>
        t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      case d: java.time.LocalDateTime => d
      case other => throw new IllegalStateException(
        s"l_shipdate bound of unsupported external class: $other")
    }
    val (dtMin, dtMax) = (toLdt(b.get(2)), toLdt(b.get(3)))
    // DOUBLE-domain normalization: the long form
    // ((v - min) * 65535 / range) overflows 64-bit ANSI arithmetic the
    // moment the key range exceeds Long.Max/65535 ≈ 1.4e14 — snowflake-
    // scale ids sit at ~1e18, where even the subtraction overflows for
    // mixed-sign bounds; ANSI throws, non-ANSI silently wraps the z
    // value (wrong clustering). Doubles lose ≤2^-53 relative precision,
    // which can shift a boundary row one lattice cell — LAYOUT only,
    // never results, the operator's contract. floor + clamp keep the
    // value inside [0, 65535] against that same rounding; the clamp is
    // null-GATED because Spark's least() SKIPS null arguments — a bare
    // least(NULL, 65535) would silently re-route a NULL-partkey row
    // from the z=NULL region to the max lattice cell.
    val pkScaled =
      floor((col("l_partkey").cast("double") - lit(pkMin.toDouble)) *
        lit(65535.0) / lit(math.max(1.0, pkMax.toDouble - pkMin.toDouble)))
    val pkNorm = when(pkScaled.isNotNull, least(pkScaled, lit(65535.0)))
    // Span must use the SAME day arithmetic as the per-row datediff
    // (calendar-day boundaries): Duration.toDays truncates partial
    // days, so with time-of-day on the endpoints the ratio could
    // exceed 65535 and interleave16 would wrap it mod 2^16 — late
    // dates silently clustering with the earliest files. Belt and
    // braces: derive the span from epoch-day difference AND clamp.
    val dtSpan = math.max(1L,
      dtMax.toLocalDate.toEpochDay - dtMin.toLocalDate.toEpochDay)
    // null-gated like pkNorm: least() SKIPS null arguments, so the bare
    // clamp silently re-routed a NULL-shipdate row to the latest-date
    // lattice cell (polluting the last files' footer max-date stats)
    // instead of the z=NULL region a NULL axis belongs in
    val dtScaled =
      datediff(col("l_shipdate"), lit(dtMin)) * lit(65535L) / lit(dtSpan)
    val dtNorm = when(dtScaled.isNotNull, least(dtScaled, lit(65535L)))
    // Generate barrier (the curationE2e idiom) between the norm math
    // and the interleave: interleave16 references each input 16×, and
    // CollapseProject would inline the full double-domain/null-gated
    // norm pipeline into every reference — measured 2.0 → 12.2 s at
    // sf0.1 when the when/least layers landed. Behind the barrier each
    // norm is evaluated ONCE per row and the 32 interleave terms read
    // plain struct fields.
    li.select(col("*"), explode_outer(array(struct(
        pkNorm.cast("long").as("pk_n"), dtNorm.cast("long").as("dt_n")))).as("zn"))
      .withColumn("z", interleave16(col("zn.pk_n"), col("zn.dt_n")))
      .drop("zn")
      .repartitionByRange(16, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(dest)
    dest
  }

  val maintZorderSql: String =
    """SELECT l_returnflag,
      |  count(*) AS n_rows,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE l_partkey BETWEEN 50 AND 99
      |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY l_returnflag""".stripMargin

  /** Parquet BLOOM-FILTER indexed rewrite — the point-lookup data-
    * skipping modality the min/max family cannot provide. Footer
    * min/max stats ([[maintCluster]], [[maintZorder]]) prune RANGE
    * predicates, but only on columns the layout is clustered by: in a
    * table clustered for its dominant scan pattern (here l_orderkey —
    * the join key), every file spans essentially the whole l_partkey
    * domain, so `l_partkey = K` prunes NOTHING from stats. A parquet
    * bloom filter per row group answers "might K be here?" in a few KB
    * of footer metadata regardless of clustering: at 100 TB a single
    * key's rows live in a handful of the table's ~10⁵ row groups, and
    * the bloom check (parquet-mr applies it during row-group filtering
    * under predicate pushdown, `parquet.filter.bloom.enabled`, default
    * on) skips the rest without touching data pages — the classic
    * secondary-index win, and the ONLY skip available for negative
    * lookups ("is this id anywhere?"). The rewrite keeps the
    * join-friendly l_orderkey clustering — bloom indexing is purely
    * additive metadata, which is exactly its point: no layout tug-of-
    * war with the range-skipping columns. Row groups are deliberately
    * small here (256 KiB) so the sf-scale fixture has enough of them
    * for per-row-group skipping to be observable; a production write
    * uses default 128 MiB groups and the same two options.
    * `BloomFilterSkipSpec` pins the footer-level property itself:
    * every row group carries a bloom on l_partkey, absent keys are
    * rejected by ≥99% of row-group blooms (fpp 0.01), and a present
    * key's rows are confined to the row groups whose bloom admits it.
    * The gated query runs point lookups + an aggregate on the
    * rewritten copy; the oracle runs the identical lookup on the
    * original parquet — indexing must never change results, only IO.
    */
  def maintBloomIndex(spark: SparkSession, dir: String): DataFrame = {
    val dest = bloomIndexedCopy(spark, dir)
    spark.read.parquet(dest)
      .filter(col("l_partkey").isin(7L, 23L, 50L, 97L))
      .groupBy("l_partkey")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
  }

  /** The rewrite half of [[maintBloomIndex]]: lineitem clustered on
    * l_orderkey (the join layout), bloom-indexed on l_partkey, small
    * row groups for test-scale observability; returns the dataset dir. */
  private[graft] def bloomIndexedCopy(spark: SparkSession, dir: String): String = {
    val dest = Formats.tmp("maint_bloomed", dir)
    Tables.lineitem(spark, dir)
      .repartition(4, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#l_partkey", "true")
      // sized to the per-row-group distinct-key count, not the table's:
      // each 256 KiB group holds a few thousand rows; 16k ndv at the
      // default 0.01 fpp keeps every bloom a few KB
      .option("parquet.bloom.filter.expected.ndv#l_partkey", "16384")
      .option("parquet.block.size", (256 * 1024).toString)
      // parquet-mr (correctly) omits the bloom from a chunk whose pages
      // are ALL dictionary-encoded — the dictionary already gives exact
      // row-group membership. At 100 TB l_partkey cardinality the
      // dictionary page overflows and chunks fall back to plain pages
      // (where the bloom is the only membership index); the test-scale
      // fixture has ~2k distinct keys, so disable the dictionary on
      // just the indexed column to exercise that exact regime — all
      // other columns keep their dictionaries
      .option("parquet.enable.dictionary#l_partkey", "false")
      .parquet(dest)
    dest
  }

  /** Storage-codec rewrite (snappy → zstd) — the cheapest 100 TB lever
    * there is: parquet's default snappy optimizes CPU for a write-once
    * table, but a corpus that is READ thousands of times and STORED for
    * years wants zstd's materially smaller files (typically 25–40%
    * under snappy at level 3) — less object-store cost AND less scan IO
    * per query, for a decompression speed in the same class. The
    * rewrite is a pure pass-through (no shuffle: scan partitions map
    * straight to output files, like [[maintCompact]] without the
    * coalesce); codec choice must never change results, so the gated
    * query aggregates the zstd copy against the oracle's identical
    * aggregate on the original snappy parquet. `RecompressSpec` pins
    * the two claims the rewrite exists for: the footers actually say
    * ZSTD, and a controlled same-writer snappy-vs-zstd comparison
    * shrinks the bytes. */
  def maintRecompress(spark: SparkSession, dir: String): DataFrame = {
    val dest = recompressedCopy(spark, dir)
    spark.read.parquet(dest)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
  }

  /** The rewrite half of [[maintRecompress]]; returns the dataset dir. */
  private[graft] def recompressedCopy(spark: SparkSession, dir: String): String = {
    val dest = Formats.tmp("maint_zstd", dir)
    Tables.lineitem(spark, dir)
      .write.mode("overwrite")
      .option("compression", "zstd")
      .parquet(dest)
    dest
  }

  val maintRecompressSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  count(*) AS n_rows,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Stored-sketch DISTINCT rollup — the pattern that makes
    * COUNT(DISTINCT …) incremental at 100 TB. `approx_count_distinct`
    * (q_approx_distinct) answers one query with one scan; a pipeline
    * that serves "distinct users for ANY day range" cannot afford a
    * 100 TB rescan per range. Apache DataSketches HLL sketches (Spark 4
    * builtins) make the distinct aggregate DECOMPOSABLE like
    * [[maintIncrementalAgg]]'s sums: one pass builds a few-KB binary
    * sketch per (day, event_type) — stored like any other column — and
    * every later range query unions STORED sketches (`hll_union_agg`,
    * associative and commutative, so partial unions parallelize like
    * any agg) and estimates, touching KB of sketch state instead of TB
    * of raw events. A new day appends one sketch row; nothing is
    * recomputed. The estimate is the sketch family's, not SQL's, so
    * the driver records a rows-only check; `SketchRollupSpec` bounds
    * the estimate against exact distinct counts (lgK=14 → rsd ≈ 0.8%)
    * and pins the union-vs-direct merge property on the same rows.
    * The 28-day window bound derives from the data's own max(day) (one
    * 1-row aggregate — bounded driver lookup, the zorder discipline),
    * so testdata refreshes move the window with the data. */
  def maintSketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val snapPath = Formats.tmp("maint_hll_daily", dir)
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(
        hll_sketch_agg(col("user_id"), lit(14)).as("user_sketch"),
        count(lit(1)).as("n_events"))
      .write.mode("overwrite").parquet(snapPath)
    val daily = spark.read.parquet(snapPath)
    val hiRow = daily.agg(max(col("day"))).collect()(0)
    // an empty events table yields a null max(day): the 28-day window is
    // vacuous, and the correct rollup is EMPTY with the same schema —
    // not a throw (r11's loud require traded an opaque NPE for an abort,
    // but a pipeline profiling a just-created table should get zero
    // rows, the same answer every count-over-empty aggregate gives)
    val windowed =
      if (hiRow.isNullAt(0)) daily.filter(lit(false))
      else daily.filter(col("day") > date_sub(lit(hiRow.getDate(0)), 28))
    windowed
      .groupBy("event_type")
      .agg(
        hll_sketch_estimate(hll_union_agg(col("user_sketch"), lit(false)))
          .as("approx_users"),
        sum(col("n_events")).as("n_events"))
      .orderBy("event_type")
  }

  val maintBloomIndexSql: String =
    """SELECT l_partkey,
      |  count(*) AS n_rows,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE l_partkey IN (7, 23, 50, 97)
      |GROUP BY l_partkey""".stripMargin

  /** CDC snapshot apply (MERGE/upsert): fold a change delta — updates
    * keyed on the primary key plus brand-new inserts — into a base
    * snapshot, producing the next snapshot. Parquet has no transactional
    * MERGE, so the lakehouse-standard pattern is
    * snapshot' = (base ANTI-JOIN update-keys) ∪ updates ∪ inserts,
    * rewritten atomically. The plan is the one that survives 100 TB:
    * the delta is broadcast (deltas are small relative to the base by
    * definition of CDC), so the anti-join is a BroadcastHashJoin and the
    * 100 TB base NEVER shuffles — apply cost is one read + one write,
    * IO-bound. A same-sized-delta world would instead cluster base and
    * delta on the key (see [[maintCluster]]) for a co-located SMJ.
    *
    * The delta here is derived deterministically from the base itself
    * (keys ≡ 0 mod 97 get an exact +10.00 decimal price bump; keys ≡ 0
    * mod 101 are re-inserted under an offset key space), so the oracle
    * can reconstruct the identical delta and the driver hash-compares
    * the FULL applied snapshot — every untouched row survives, every
    * updated row carries the new price, every insert appears once.
    */
  /** The deterministic CDC delta rule (updates, inserts) derived from a
    * base slice — ONE definition shared by the batch apply and the
    * streaming foreachBatch twin so the two can never drift. */
  private[graft] def upsertDelta(base: DataFrame): (DataFrame, DataFrame) = {
    val updates = base.filter(pmod(col("o_orderkey"), lit(97L)) === 0)
      .withColumn("o_totalprice",
        (col("o_totalprice").cast("decimal(18,2)") + lit(BigDecimal("10.00")))
          .cast("double"))
    val inserts = base.filter(pmod(col("o_orderkey"), lit(101L)) === 0)
      .select(
        (col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
        col("o_custkey"),
        lit("N").as("o_orderstatus"),
        col("o_totalprice"))
    (updates, inserts)
  }

  /** snapshot' = (snapshot ANTI-JOIN delta-keys) ∪ updates ∪ inserts,
    * with the delta keys broadcast so the snapshot never shuffles. The
    * anti-join strips the keys of BOTH delta halves — update keys because
    * their rows are replaced, insert keys so re-applying the same delta
    * is IDEMPOTENT: under at-least-once delivery (a foreachBatch replay
    * after a committed swap but uncommitted checkpoint) a replayed
    * insert would otherwise append its row a second time. */
  private[graft] def applyUpsert(snapshot: DataFrame, updates: DataFrame,
      inserts: DataFrame): DataFrame = {
    val deltaKeys = updates.select("o_orderkey")
      .unionByName(inserts.select("o_orderkey"))
    snapshot
      .join(broadcast(deltaKeys), Seq("o_orderkey"), "left_anti")
      .unionByName(updates)
      .unionByName(inserts)
  }

  def maintUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val (updates, inserts) = upsertDelta(base)
    // Park the derived delta halves in scratch and apply from the
    // read-back: lazily inlining them would rescan the base FIVE times
    // in the applied plan (snapshot leg + both delta legs + both
    // deltaKeys legs — Spark reuses broadcast exchanges, not file
    // scans), where the apply contract is "one read + one write". This
    // is also the true CDC shape: deltas arrive AS FILES; deriving them
    // from the base is only this fixture's determinism trick. Same
    // park-then-apply pattern as maintDeleteVector's tombstone file.
    val updPath = Formats.tmp("maint_upsert_upd", dir)
    val insPath = Formats.tmp("maint_upsert_ins", dir)
    updates.write.mode("overwrite").parquet(updPath)
    inserts.write.mode("overwrite").parquet(insPath)
    applyUpsert(base,
      spark.read.parquet(updPath), spark.read.parquet(insPath))
  }

  val maintUpsertSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
      |upd AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 10.00 AS DOUBLE) AS o_totalprice
      |  FROM base WHERE o_orderkey % 97 = 0),
      |ins AS (
      |  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
      |    'N' AS o_orderstatus, o_totalprice
      |  FROM base WHERE o_orderkey % 101 = 0)
      |SELECT * FROM base
      |WHERE o_orderkey IS NULL
      |   OR o_orderkey NOT IN (SELECT o_orderkey FROM upd
      |                         UNION ALL SELECT o_orderkey FROM ins)
      |UNION ALL SELECT * FROM upd
      |UNION ALL SELECT * FROM ins""".stripMargin

  // ---- SCD Type-2 dimension merge -----------------------------------------

  /** Validity dates for the SCD2 fixture: the snapshot opens at
    * [[Scd2From]]; the change batch takes effect at [[Scd2Eff]]. */
  val Scd2From = "2024-01-01"
  val Scd2Eff = "2024-06-01"

  /** The current customer dimension lifted to SCD2 shape: one OPEN
    * version per key (valid_from = [[Scd2From]], valid_to = null,
    * is_current = true). */
  private[graft] def scd2Current(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"),
        to_date(lit(Scd2From)).as("valid_from"),
        lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current"))

  /** Deterministic incoming attribute batch: keys ≡0 mod 53 move to a
    * synthetic segment (a REAL change — the synthetic name never equals
    * a TPC-H segment), keys ≡0 mod 59 (and not mod 53) re-send their
    * EXISTING segment — the no-op class that change detection must NOT
    * version. Disjoint by construction, so the batch is unique per key. */
  private[graft] def scd2Batch(dim: DataFrame): DataFrame =
    dim.filter(pmod(col("c_custkey"), lit(53L)) === 0)
      .select(col("c_custkey"),
        concat(lit("SEGMENT_"), pmod(col("c_custkey"), lit(5L)).cast("string"))
          .as("new_seg"))
      .unionByName(
        dim.filter(pmod(col("c_custkey"), lit(59L)) === 0 &&
            pmod(col("c_custkey"), lit(53L)) =!= 0)
          .select(col("c_custkey"), col("c_mktsegment").as("new_seg")))

  /** SCD Type-2 apply: rows whose tracked attribute really changed get
    * their open version CLOSED (valid_to = `eff`, is_current = false)
    * and a new open version appended; no-op batch rows and untouched
    * keys pass through byte-identical. Scale shape: the batch is the
    * small side everywhere — change detection is `open-versions JOIN
    * broadcast(batch)` filtered to genuine diffs, and the pass-through
    * is an anti-join against the BROADCAST changed-key set — so the
    * 100 TB dimension is never shuffled, only scanned and unioned.
    * Detection compares against OPEN versions only (`is_current`), which
    * is what makes re-applying the same batch a no-op: the new open
    * version already carries the batch value, so the second diff set is
    * empty (`Scd2Spec` pins this idempotence, plus one-open-version-
    * per-key and interval continuity).
    */
  /** The change-detection join alone — open versions × broadcast batch,
    * filtered to genuine diffs. Split out so [[maintScd2]] can park its
    * result and apply from the read-back (see there). */
  private[graft] def scd2Changed(current: DataFrame, batch: DataFrame): DataFrame =
    current.filter(col("is_current"))
      .join(broadcast(batch), Seq("c_custkey"))
      .filter(col("new_seg") =!= col("c_mktsegment"))

  private[graft] def applyScd2(current: DataFrame, batch: DataFrame,
      eff: String): DataFrame =
    applyScd2Changed(current, scd2Changed(current, batch), eff)

  /** The apply half over an ALREADY-DETECTED change set. */
  private[graft] def applyScd2Changed(current: DataFrame, changed: DataFrame,
      eff: String): DataFrame = {
    val closed = changed.select(
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_mktsegment"),
      col("valid_from"), to_date(lit(eff)).as("valid_to"),
      lit(false).as("is_current"))
    val opened = changed.select(
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("new_seg").as("c_mktsegment"),
      to_date(lit(eff)).as("valid_from"),
      lit(null).cast("date").as("valid_to"),
      lit(true).as("is_current"))
    current
      .join(broadcast(changed.select("c_custkey")), Seq("c_custkey"), "left_anti")
      .unionByName(closed)
      .unionByName(opened)
  }

  def maintScd2(spark: SparkSession, dir: String): DataFrame = {
    val current = scd2Current(spark, dir)
    // Park the detected change set (change-cardinality rows) so the
    // three apply legs (closed, opened, anti-join keys) read it back
    // instead of each re-running the detection join — lazily inlined,
    // the applied plan re-scans the dimension once per leg (same
    // rescan class as maintUpsert's, fixed the same way).
    val chgPath = Formats.tmp("maint_scd2_changed", dir)
    scd2Changed(current, scd2Batch(Tables.customer(spark, dir)))
      .write.mode("overwrite").parquet(chgPath)
    applyScd2Changed(current, spark.read.parquet(chgPath), Scd2Eff)
  }

  val maintScd2Sql: String =
    s"""WITH cur AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
      |    DATE '$Scd2From' AS valid_from, CAST(NULL AS DATE) AS valid_to,
      |    TRUE AS is_current
      |  FROM customer),
      |batch AS (
      |  SELECT c_custkey, 'SEGMENT_' || CAST(c_custkey % 5 AS VARCHAR) AS new_seg
      |  FROM customer WHERE c_custkey % 53 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment FROM customer
      |  WHERE c_custkey % 59 = 0 AND c_custkey % 53 != 0),
      |chg AS (
      |  SELECT c.*, b.new_seg FROM cur c
      |  JOIN batch b ON c.c_custkey = b.c_custkey
      |  WHERE b.new_seg <> c.c_mktsegment)
      |SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
      |  valid_from, valid_to, is_current
      |FROM cur WHERE c_custkey IS NULL
      |           OR c_custkey NOT IN (SELECT c_custkey FROM chg)
      |UNION ALL
      |SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
      |  valid_from, DATE '$Scd2Eff', FALSE FROM chg
      |UNION ALL
      |SELECT c_custkey, c_name, c_nationkey, new_seg,
      |  DATE '$Scd2Eff', NULL, TRUE FROM chg""".stripMargin

  /** What the ANALYZE profiler collects for one column; the four roles
    * fix how min/max are typed so the long-form output schema stays
    * constant across mixed-type column lists:
    *  - [[ProfNum]]:   min/max as DOUBLE (exact for keys < 2^53);
    *  - [[ProfMoney]]: min/max through DECIMAL(18,2) then DOUBLE — the
    *    2-decimal money convention every price column here uses, robust
    *    to a refresh re-encoding prices as decimal;
    *  - [[ProfStr]]:   min/max as VARCHAR;
    *  - [[ProfTs]]:    timestamp min/max rendered as microsecond-
    *    precision VARCHAR (`yyyy-MM-dd HH:mm:ss.SSSSSS`, the pinned-UTC
    *    session zone) into the string arm. Formatting happens AFTER the
    *    min/max aggregate — the buffer stays a fixed-width timestamp —
    *    so only the RENDERING must agree with the oracle's strftime
    *    (`%f` is DuckDB's zero-padded microseconds, matching `SSSSSS`);
    *    both sides truncate sub-microsecond digits identically if a
    *    refresh ships nanos again, and truncation is monotone, so
    *    format(min(ts)) is min(format(ts)) either way. */
  private sealed trait ProfCol { def name: String }
  private final case class ProfNum(name: String) extends ProfCol
  private final case class ProfMoney(name: String) extends ProfCol
  private final case class ProfStr(name: String) extends ProfCol
  private final case class ProfTs(name: String) extends ProfCol

  /** The [[ProfTs]] rendering, Spark side; its DuckDB twin is
    * `strftime(…, '%Y-%m-%d %H:%M:%S.%f')` in [[maintProfileSql]]. */
  private val ProfTsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** The table/column list [[maintProfile]] profiles — the ANALYZE
    * argument. ONE source of truth: both the Spark plan and the DuckDB
    * oracle are GENERATED from this spec, so adding a table or column
    * is a one-line edit that cannot drift the two sides apart. */
  private val ProfileSpec: Seq[(String, Seq[ProfCol])] = Seq(
    "orders" -> Seq(ProfNum("o_orderkey"), ProfNum("o_custkey"),
      ProfMoney("o_totalprice"), ProfStr("o_orderstatus")),
    "lineitem" -> Seq(ProfNum("l_orderkey"), ProfNum("l_quantity"),
      ProfMoney("l_extendedprice"), ProfStr("l_returnflag")),
    "documents" -> Seq(ProfNum("doc_id"), ProfNum("n_chars"),
      ProfStr("lang"), ProfStr("source")),
    // the one timestamp-typed column in the corpus (VERDICT r12 §residuals):
    // ts exercises the ProfTs arm; event_id is the growing-NDV key,
    // user_id the bounded-NDV key, event_type the low-cardinality flag
    "events" -> Seq(ProfNum("event_id"), ProfTs("ts"),
      ProfNum("user_id"), ProfStr("event_type")))

  /** The FOLD-half aggregates for one profiled column: null count plus
    * the typed min/max arms. All global (no grouping), so whatever
    * aggregate node carries them — including the SortAggregate the
    * variable-width string buffers force — degenerates to a per-
    * partition fold: no Sort operator, one row per partition into the
    * final exchange. Shared by both profile variants. */
  private def foldAggs(pc: ProfCol, i: Int): Seq[Column] =
    // count(when), not sum(cast): sum over ZERO rows is NULL where the
    // oracle's count(*) FILTER is 0 — an empty table must profile as
    // 0 nulls, not NULL nulls
    count(when(col(pc.name).isNull, 1)).as(s"nn_$i") +: (pc match {
      case ProfNum(c) => Seq(
        min(col(c)).cast("double").as(s"mn_$i"),
        max(col(c)).cast("double").as(s"mx_$i"))
      case ProfMoney(c) => Seq(
        min(col(c).cast("decimal(18,2)")).cast("double").as(s"mn_$i"),
        max(col(c).cast("decimal(18,2)")).cast("double").as(s"mx_$i"))
      case ProfStr(c) => Seq(
        min(col(c)).as(s"mns_$i"),
        max(col(c)).as(s"mxs_$i"))
      case ProfTs(c) => Seq(
        date_format(min(col(c)), ProfTsFormat).as(s"mns_$i"),
        date_format(max(col(c)), ProfTsFormat).as(s"mxs_$i"))
    })

  /** The long-form projection over a table's one-row stats frame:
    * `(tbl literal, stack(k, ...))` — shared by both variants so the
    * output schema cannot drift between them. */
  private def stackSelect(tbl: String, cols: Seq[ProfCol]): Seq[String] = {
    val stackArgs = cols.zipWithIndex.map {
      case (pc @ (_: ProfStr | _: ProfTs), i) => // both land in the string arm
        s"'${pc.name}', nn_$i, nd_$i, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mns_$i, mxs_$i"
      case (pc, i) =>
        s"'${pc.name}', nn_$i, nd_$i, mn_$i, mx_$i, CAST(NULL AS STRING), CAST(NULL AS STRING)"
    }.mkString(",\n")
    Seq(
      s"'$tbl' AS tbl",
      s"""stack(${cols.size},
         |$stackArgs)
         |AS (col, n_nulls, n_distinct, min_num, max_num, min_str, max_str)""".stripMargin)
  }

  /** COLUMN PROFILE — table/column-driven ANALYZE-style statistics
    * collection: for every (table, column) in [[ProfileSpec]], null
    * count, exact distinct count, and min/max, emitted long-form (one
    * row per column, tagged with its table) for the stats catalog a
    * cost-based optimizer or data contract reads — never the naive
    * per-column ANALYZE loop (2k scans for k columns).
    *
    * Plan shape — ZERO sorts, everything hash or fold: each table
    * contributes TWO aggregates over the same column-pruned scan,
    * joined as one-row frames —
    *  - the NDV half: the k-way exact multi-DISTINCT through
    *    Catalyst's Expand. Alone in its aggregate, every aggregation
    *    buffer is fixed-width, so the whole Expand pipeline
    *    HashAggregates (distinct values are GROUPING keys, which hash
    *    fine as strings);
    *  - the fold half ([[foldAggs]]): null counts + mixed-type
    *    min/max, global, so the string-buffer SortAggregate fallback
    *    is an empty-key per-partition fold.
    * Combining both halves in ONE aggregate — the tempting
    * "single-scan" form — forces that aggregate to SortAggregate (the
    * string min/max buffers disqualify hashing) and therefore to SORT
    * the k×-expanded corpus: measured 2.6 s (orders alone, r11) and
    * 6.7–8.3 s (three tables, r12) vs 2.1 s at sf0.1 / 4.2 s at sf1
    * for this split shape (final-gate run + §e probe — ~3× faster at
    * both scales). The second streaming scan of a 4-column projection
    * is the cheaper price at every scale — scans stream, external
    * sorts of a k×-expanded 100 TB table spill. Approximate profiles
    * go further: [[maintProfileApprox]] drops the Expand too.
    *
    * Snapshot contract: the two halves are two scans, so each is
    * internally consistent but a table REWRITTEN between them (a
    * concurrent compaction/upsert) could mix snapshots in one output
    * row — the same exposure any multi-statement ANALYZE has, and the
    * same already-true caveat across the three profiled tables.
    * Profile runs belong between maintenance rewrites, not racing
    * them; all corpus dirs here are immutable during a session. */
  def maintProfile(spark: SparkSession, dir: String): DataFrame =
    ProfileSpec.map { case (tbl, cols) =>
      val df = Tables.byName(spark, dir, tbl)
      val ndvAggs = cols.zipWithIndex.map { case (pc, i) =>
        countDistinct(col(pc.name)).as(s"nd_$i")
      }
      val fa = cols.zipWithIndex.flatMap { case (pc, i) => foldAggs(pc, i) }
      val folded = df.agg(fa.head, fa.tail: _*)
      val ndvs = df.agg(ndvAggs.head, ndvAggs.tail: _*)
      folded.crossJoin(broadcast(ndvs))
        .selectExpr(stackSelect(tbl, cols): _*)
    }.reduce(_.union(_))

  /** [[maintProfile]] with HLL-sketch NDVs — the scale path for
    * profiling a 100 TB table where exact NDVs do not pay their way:
    * `approx_count_distinct` replaces `countDistinct`, and with it the
    * multi-DISTINCT machinery AND the second scan disappear — the
    * sketch NDVs ride the fold aggregate itself (no Expand, no Sort,
    * ONE scan per table; each partition collapses to one sketch row
    * before a single-partition exchange of sketches, not rows). Same
    * output schema, same spec — the documented "approximate profiles
    * swap in HLL sketches with no shape change", now as code.
    * Rows-only for the driver (HLL++ estimates are engine-specific);
    * ProfileApproxSpec pins the non-NDV columns EXACTLY equal to the
    * exact profile's, NDV within the HLL++ relative-error bound, and
    * the no-Expand/no-Sort plan shape. */
  def maintProfileApprox(spark: SparkSession, dir: String): DataFrame =
    ProfileSpec.map { case (tbl, cols) =>
      val df = Tables.byName(spark, dir, tbl)
      val aggs = cols.zipWithIndex.flatMap { case (pc, i) =>
        approx_count_distinct(col(pc.name)).as(s"nd_$i") +: foldAggs(pc, i)
      }
      df.agg(aggs.head, aggs.tail: _*)
        .selectExpr(stackSelect(tbl, cols): _*)
    }.reduce(_.union(_))

  /** Generated from [[ProfileSpec]] — one SELECT per (table, column),
    * mirroring the typed min/max arms of the Spark side. */
  val maintProfileSql: String =
    ProfileSpec.flatMap { case (tbl, cols) =>
      cols.map { pc =>
        val c = pc.name
        val minMax = pc match {
          case ProfNum(_) =>
            s"CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num, " +
              "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
          case ProfMoney(_) =>
            s"CAST(min(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS min_num, " +
              s"CAST(max(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS max_num, " +
              "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
          case ProfStr(_) =>
            "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, " +
              s"min($c) AS min_str, max($c) AS max_str"
          case ProfTs(_) =>
            "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, " +
              s"strftime(min($c), '%Y-%m-%d %H:%M:%S.%f') AS min_str, " +
              s"strftime(max($c), '%Y-%m-%d %H:%M:%S.%f') AS max_str"
        }
        // ProfTs NDV counts DISTINCT over the MICROS-truncated value:
        // Spark's side conforms a nanos refresh down to microsecond
        // timestamps before countDistinct, so the oracle must truncate
        // identically (CAST TIMESTAMP_NS AS TIMESTAMP drops nanos; a
        // no-op on already-micros data) or two events inside one micro
        // would count 1 vs 2 across the sides — the min/max strings
        // were truncation-aligned in r13, NDV gets the same treatment
        val ndv = pc match {
          case ProfTs(_) => s"count(DISTINCT CAST($c AS TIMESTAMP))"
          case _ => s"count(DISTINCT $c)"
        }
        s"""SELECT '$tbl' AS tbl, '$c' AS col,
           |  CAST(count(*) FILTER ($c IS NULL) AS BIGINT) AS n_nulls,
           |  $ndv AS n_distinct,
           |  $minMax FROM $tbl""".stripMargin
      }
    }.mkString("\nUNION ALL\n")

  /** MERGE-ON-READ ROW DELETES — the lakehouse delete-vector pattern:
    * parquet cannot delete in place, so deletes land as a TOMBSTONE
    * key set beside the immutable base, and readers apply them as an
    * anti-join until a compaction materializes the survivors
    * (copy-on-write). The tombstone side is delete-cardinality —
    * BROADCAST into the anti-join, so the 100 TB base never shuffles
    * to serve a merge-on-read scan (same delta-shape argument as
    * [[maintUpsert]]). This query builds a deterministic tombstone set
    * (every 37th order), writes it as the delete file, applies it
    * merge-on-read, and aggregates the surviving rows; the oracle
    * applies the same rule arithmetically, so the read path's
    * exclusion is what gets hash-checked. Compaction (rewriting base
    * minus tombstones, then dropping the delete file) is the
    * [[maintCompact]] rewrite applied to this anti-join — same
    * machinery, scheduled when the tombstone ratio crosses a
    * threshold. */
  def maintDeleteVector(spark: SparkSession, dir: String): DataFrame = {
    val delPath = Formats.tmp("maint_del_tombstones", dir)
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 37 === 0)
      .select(col("o_orderkey"))
      .write.mode("overwrite").parquet(delPath)
    val tombstones = spark.read.parquet(delPath)
    Tables.orders(spark, dir)
      .join(broadcast(tombstones), Seq("o_orderkey"), "left_anti")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("price_sum"))
  }

  /** Oracle mirrors left_anti's NULL semantics explicitly: a NULL key
    * never matches a tombstone, so NULL-key rows SURVIVE the
    * merge-on-read scan — without the IS NULL arm the SQL `%` predicate
    * is three-valued NULL and silently drops them. */
  val maintDeleteVectorSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
      |FROM orders WHERE o_orderkey IS NULL OR o_orderkey % 37 <> 0
      |GROUP BY 1""".stripMargin

  /** INCREMENTAL AGGREGATION — the daily-rollup maintenance pattern:
    * yesterday's stored aggregate plus today's delta, merged by
    * RE-AGGREGATING the partial states (sums and counts are
    * decomposable: merge = sum of partials), instead of rescanning all
    * of history. The query materializes the "yesterday" snapshot
    * (events before the cutoff day, aggregated and written to parquet —
    * at scale this is the table that persists between runs), aggregates
    * only the cutoff-day-onward delta from the raw table, and merges by
    * a union + one re-aggregation over event-type cardinality rows. The
    * history scan happens ONCE at snapshot build; every subsequent run
    * reads the snapshot (event-type-cardinality rows) + the delta
    * partition — the oracle recomputes from scratch, so the merge's
    * equivalence to a full recompute is what gets hash-checked. Only
    * decomposable aggregates ride this path (sum/count/min/max —
    * averages are carried as sum+count and finished at read); decimal
    * domain keeps the merge order-independent. */
  def maintIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    // The cutoff is stated in the ts DOMAIN (r21, guide §6): `day >=
    // '2024-01-25'` over day = date_format(ts) is equivalent to
    // `ts >= 2024-01-25T00:00Z` in the UTC session ('yyyy-MM-dd' string
    // order IS date order), but the ts form PUSHES to the parquet scan
    // (PushedFilters prunes row groups at scale) and drops the per-row
    // date_format the string compare forced on BOTH branch scans — day
    // itself was never used past the filter (the rollup keys on
    // event_type), so nothing else changes.
    val cutoffTs = lit("2024-01-25 00:00:00").cast("timestamp")
    val ev = Tables.events(spark, dir)
    val snapPath = Formats.tmp("maint_incr_snapshot", dir)
    // ts IS NULL (a NULL-ts refresh row) routes to the snapshot side:
    // both `< cutoff` and `>= cutoff` are three-valued NULL for it, so
    // without an explicit arm the row would vanish from BOTH partitions
    // — breaking merge-equals-full-recompute and diverging from the
    // oracle, which counts every events row
    ev.filter(col("ts") < cutoffTs || col("ts").isNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("val_sum"))
      .write.mode("overwrite").parquet(snapPath)
    val delta = ev.filter(col("ts") >= cutoffTs)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("val_sum"))
    spark.read.parquet(snapPath).union(delta)
      .groupBy("event_type")
      .agg(sum(col("n")).as("n"),
        sum(col("val_sum")).cast("double").as("val_sum"))
  }

  val maintIncrementalAggSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
      |FROM events GROUP BY 1""".stripMargin

  /** DATA-QUALITY AUDIT — the constraint gate a pipeline runs before
    * publishing a snapshot: domain checks (non-positive/null measures)
    * and referential integrity (orphan foreign keys), one summary row
    * per rule with violation and checked counts. Each rule is a single
    * conditional aggregation over its fact table — violations are
    * counted with `count-if`, never materialized or collected.
    * Referential checks join the fact against the BROADCAST distinct
    * key set of the dimension side (orders' custkeys against customer,
    * lineitem's orderkeys against orders): existence flag from a left
    * join + null probe, partially aggregated before the count — the
    * fact table never shuffles. At 100 TB the lineitem→orders check's
    * key side outgrows a broadcast; the same plan with a shuffled
    * left-semi flag join is the fallback, still one exchange of keys,
    * never of rows. The final result is a union of one-row aggregates
    * — driver-trivial, oracle-exact. */
  def maintDqAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val events = Tables.events(spark, dir)
    def rule(name: String, df: DataFrame, bad: Column): DataFrame =
      // count(when), not sum(cast): an empty fact table must audit as
      // 0 violations (the oracle's count(*) FILTER), not NULL
      df.agg(count(when(bad, 1)).as("n_violations"),
        count(lit(1)).as("n_checked"))
        .select(lit(name).as("rule"), col("n_violations"), col("n_checked"))
    val r1 = rule("lineitem_quantity_positive", li,
      col("l_quantity").isNull || col("l_quantity") <= 0)
    // Both events rules in ONE scan (r21, guide §1.2 "don't compute
    // things twice"): the per-rule helper would scan events once per
    // rule; at 100 TB audit rules over the same table must share the
    // pass. One aggregate computes both violation counts + the shared
    // row count, then fans out to the two long-form rows — values
    // identical to the per-rule form (same count(when) aggregates over
    // the same rows).
    val r23 = events.agg(
      count(when(col("user_id").isNull, 1)).as("v2"),
      count(when(col("value").isNull || col("value") < 0, 1)).as("v3"),
      count(lit(1)).as("n"))
      .select(explode(array(
        struct(lit("events_user_id_present").as("rule"),
          col("v2").as("n_violations"), col("n").as("n_checked")),
        struct(lit("events_value_in_domain").as("rule"),
          col("v3").as("n_violations"), col("n").as("n_checked")))).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_violations").as("n_violations"),
        col("r.n_checked").as("n_checked"))
    val custKeys = customer.select(col("c_custkey").as("k")).distinct()
    val r4 = rule("orders_custkey_resolves",
      orders.join(broadcast(custKeys), col("o_custkey") === col("k"), "left"),
      col("k").isNull)
    // No broadcast hint here: the distinct o_orderkey set grows linearly
    // with the fact table (the largest "dimension" in the repo), so at
    // cluster scale a forced broadcast would blow the driver long before
    // the true dimension broadcasts above. AQE picks broadcast vs shuffle
    // from the measured size, which is the right call at every SF.
    val orderKeys = orders.select(col("o_orderkey").as("k")).distinct()
    val r5 = rule("lineitem_orderkey_resolves",
      li.join(orderKeys, col("l_orderkey") === col("k"), "left"),
      col("k").isNull)
    r1.union(r23).union(r4).union(r5)
  }

  val maintDqAuditSql: String =
    """SELECT 'lineitem_quantity_positive' AS rule,
      |  CAST(count(*) FILTER (l_quantity IS NULL OR l_quantity <= 0) AS BIGINT)
      |    AS n_violations,
      |  count(*) AS n_checked FROM lineitem
      |UNION ALL
      |SELECT 'events_user_id_present',
      |  CAST(count(*) FILTER (user_id IS NULL) AS BIGINT), count(*) FROM events
      |UNION ALL
      |SELECT 'events_value_in_domain',
      |  CAST(count(*) FILTER (value IS NULL OR value < 0) AS BIGINT),
      |  count(*) FROM events
      |UNION ALL
      |SELECT 'orders_custkey_resolves',
      |  CAST(count(*) FILTER (c.c_custkey IS NULL) AS BIGINT), count(*)
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |UNION ALL
      |SELECT 'lineitem_orderkey_resolves',
      |  CAST(count(*) FILTER (o.o_orderkey IS NULL) AS BIGINT), count(*)
      |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "maint_dq_audit" -> (maintDqAudit _),
    "maint_incremental_agg" -> (maintIncrementalAgg _),
    "maint_delete_vector" -> (maintDeleteVector _),
    "maint_profile" -> (maintProfile _),
    "maint_profile_approx" -> (maintProfileApprox _),
    "maint_compact" -> (maintCompact _),
    "maint_cluster" -> (maintCluster _),
    "maint_zorder" -> (maintZorder _),
    "maint_bloom_index" -> (maintBloomIndex _),
    "maint_sketch_rollup" -> (maintSketchRollup _),
    "maint_recompress" -> (maintRecompress _),
    "maint_upsert" -> (maintUpsert _),
    "maint_scd2" -> (maintScd2 _))

  val oracles: Map[String, String] = Map(
    "maint_dq_audit" -> maintDqAuditSql,
    "maint_incremental_agg" -> maintIncrementalAggSql,
    "maint_delete_vector" -> maintDeleteVectorSql,
    "maint_profile" -> maintProfileSql,
    "maint_compact" -> maintCompactSql,
    "maint_cluster" -> maintClusterSql,
    "maint_zorder" -> maintZorderSql,
    "maint_bloom_index" -> maintBloomIndexSql,
    "maint_recompress" -> maintRecompressSql,
    "maint_upsert" -> maintUpsertSql,
    "maint_scd2" -> maintScd2Sql)
}
