package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, raise_error, when, max => fmax, min => fmin}
import org.apache.spark.sql.types._

/** Parquet star-schema loaders for the driver-generated testdata
  * (`/root/testdata/sf*`; schemas in FIXTURES.md §2).
  *
  * At 100 TB these tables become partitioned parquet directories; the
  * loaders stay identical — `spark.read.parquet` plans splits via
  * FileSourceScanExec and `spark.sql.files.maxPartitionBytes`, the same
  * mechanism that subsumes the reference's LPT file bin-packing
  * (reference: driver.py:41-68, see SURVEY.md §2a row 12).
  *
  * == Data-refresh hardening ==
  * The testdata generator has drifted its on-disk encodings across
  * refreshes (the r7 refresh turned `events.ts` from annotated INT64
  * TIMESTAMP(NANOS) into un-flagged TIMESTAMP(MICROS) and broke 37
  * queries at analysis time), so every loader now routes through
  * [[conform]]: each observed column that the canonical schema knows is
  * compared against its expected type, KNOWN-BENIGN drifts are
  * normalized in place (timestamp encodings, integral widenings/checked
  * narrowings, float→double), and anything else fails loudly with a
  * `table.column`-named message instead of propagating a misread value
  * into 30 downstream queries. Missing columns are NOT an error here —
  * spec fixtures legitimately plant partial tables (FuzzyNamesSpec's
  * two-column customer), and Spark's own unresolved-column analysis
  * error already names the column loudly when a query needs one.
  */
object Tables {

  /** Serializes conf windows JVM-wide. SQL confs are SESSION-GLOBAL and
    * sbt provably runs suites concurrently on the shared session (r14):
    * when two threads window the SAME key, interleaved save/restores can
    * leave the key STUCK at a window value for the rest of the run —
    * thread A saves "unset", B saves A's window value as its "before",
    * A restores unset, B "restores" A's window value permanently (review
    * r17; two suites window spark.sql.ansi.enabled, and the engine's own
    * bloom/AQE/shuffle windows overlap under concurrent suites too).
    * Reentrant so [[withConfs]]' nesting and window bodies that open
    * their own windows (specs around conf-windowed queries) still work;
    * a single lock, so no ordering deadlocks. Production runs (Verify/
    * Bench/driver) execute queries sequentially — zero contention there. */
  private val confWindowLock = new java.util.concurrent.locks.ReentrantLock()

  /** Acquire the conf-window lock around `body` without windowing a
    * conf — for critical sections that MIX conf windows with other
    * session-global mutations (the streaming memory-sink runs sweep
    * catalog views, then open conf windows). Such sections must take
    * THIS lock as their outermost monitor rather than a private one:
    * a private-lock-then-withConf ordering inverts against callers
    * already inside a window (streamUserTotalsTws wraps its whole run
    * in a provider withConf) — the classic AB-BA deadlock. Ordering
    * rule for every OTHER lock in the engine (review r17): a lock is
    * either (a) window-OPENING — its critical section opens conf
    * windows (Dedup's fixpoint memos run withShufflePartitions), so no
    * conf-window body may ever call into it, or (b) window-WRAPPED —
    * callers may open a window around it (BucketedJoinSpec windows
    * around ensureBucketedTables' bucketedTableLocks), so its body must
    * never open a conf window. The same lock must never be both: that
    * is the AB-BA pair. Checked r17: the Dedup memo locks are (a) with
    * no windowed caller; bucketedTableLocks/q15/pairs/Lines.dumpedOnce
    * are (b) with no window inside; no [[withViews]] body opens a conf
    * window (viewLock stays separate). */
  def withSessionLock[T](body: => T): T = {
    confWindowLock.lock()
    try body finally confWindowLock.unlock()
  }

  /** Run `body` with one SQL conf temporarily overridden, restoring the
    * prior state (set OR unset) even on failure — the single shared
    * conf-window idiom (shuffle sizing, scan bin-packing, state-store
    * providers). */
  def withConf[T](spark: SparkSession, key: String, value: String)(body: => T): T = {
    confWindowLock.lock()
    try {
      val before = spark.conf.getOption(key)
      spark.conf.set(key, value)
      try body finally before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    } finally confWindowLock.unlock()
  }

  /** [[withConf]] over several keys at once, innermost-last; each key
    * restores independently, so overlapping windows stay correct. */
  def withConfs[T](spark: SparkSession, kvs: (String, String)*)(body: => T): T =
    kvs.headOption match {
      case None => body
      case Some((k, v)) => withConf(spark, k, v)(withConfs(spark, kvs.tail: _*)(body))
    }

  /** [[withConf]] on `spark.sql.shuffle.partitions` — for stages whose
    * shuffle keys are orders of magnitude smaller than the corpus
    * (stateful streaming key spaces, label-propagation rounds). */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    withConf(spark, "spark.sql.shuffle.partitions", n.toString)(body)

  /** Serializes every engine-internal "register temp view(s), then
    * ANALYZE the SQL that reads them" critical section. Temp views are
    * SESSION-GLOBAL, and sbt provably runs suites concurrently on the
    * shared session (overlapping junit timestamps, r14) — without the
    * lock, a second caller's `createOrReplaceTempView` can land between
    * a first caller's registration and its `spark.sql` analysis, binding
    * the first caller's plan to the second caller's data whenever the
    * two pass different dirs. Analysis resolves the view INTO the plan,
    * so only the short register+analyze window needs the lock — the
    * returned DataFrame stays correct through any later replacement,
    * and execution never holds it. */
  def withViews[T](body: => T): T = viewLock.synchronized(body)
  private val viewLock = new Object

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Canonical POST-LOAD schema per table — the types every query in the
    * engine was written against. Timestamps are canonically session-zone
    * TIMESTAMP (the pinned-UTC reinterpretation of whatever wall clock
    * the generator wrote — the convention `events.ts` has used since the
    * r7 refresh and the driver's oracle compares fine against). */
  private[graft] val expectedColumns: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  // ---- raw-long timestamp encoding, decided ONCE per load --------------

  private[graft] sealed trait LongTsEncoding
  private[graft] case object NanosLong extends LongTsEncoding
  private[graft] case object MicrosLong extends LongTsEncoding

  /** Magnitude frontier between the two plausible raw-long encodings:
    * epoch-nanos exceed 1e17 for any instant past mid-1973, epoch-micros
    * stay below it until year ~5138. */
  private val NanosFloor = 100000000000000000L

  /** Sanity ceiling on a decided-micros column: 2200-01-01T00:00:00Z in
    * epoch-micros. A genuine micros timestamp in generator data lands
    * centuries below this; an all-nanos column for instants in the
    * magnitude blind window (1970 to mid-1973, below [[NanosFloor]])
    * would decode under the micros arm to a far-FUTURE instant (year
    * ~2286+ for anything past the first ~84 days of 1970) — so a
    * decided-micros maximum at or past this ceiling is treated as the
    * same loud ambiguity as a range straddling the frontier, shrinking
    * the silent-misread window to nanos instants inside the first ~84
    * days of 1970 (which decode to pre-2200 micros and are undecidable
    * by magnitude alone; documented residual). */
  private val MicrosSanityCeil = 7258118400000000L

  /** Magnitude below which an int64 "timestamp" is a missing-value
    * sentinel, not a real instant, in EITHER encoding: 1e12 is
    * ~1970-01-12 as micros and ~17 minutes as nanos — generator data
    * lives decades above both. Lets a genuinely-nanos column carry
    * 0/-1/small-epsilon sentinels without tripping the mixed-range
    * ambiguity failure (the tolerance the magnitude rule already
    * extends to sentinels in a micros column). */
  private val SentinelCeil = 1000000000000L

  /** Per-(dataset, column) memo of the encoding decision, so the ~37
    * events consumers (batch + streaming + SQL views) pay the footer
    * metadata read (or its probe-job fallback) once per JVM, not once
    * per query. Keyed by canonical
    * path — two spellings of one dir share a decision. A path
    * OVERWRITTEN in-place with a different encoding mid-JVM would serve
    * a stale decision, the same documented contract as the streaming
    * schema cache; the testdata refresh happens between driver rounds
    * (fresh JVMs), never mid-session. */
  private val longTsEncodingMemo =
    new java.util.concurrent.ConcurrentHashMap[String, LongTsEncoding]()

  /** Per-file footer fold state: the column's observed extremes, whether
    * any non-null value was seen, whether any CHUNK for the column was
    * seen at all (a column in the Spark schema but in NO footer — e.g. a
    * partition-directory key — has no footer evidence and must route to
    * the probe job, not decide by default), and whether any chunk lacked
    * usable INT64 stats. */
  private final case class FooterStats(
      lo: Long, hi: Long, seen: Boolean, chunkSeen: Boolean, unavailable: Boolean) {
    def merge(o: FooterStats): FooterStats = FooterStats(
      math.min(lo, o.lo), math.max(hi, o.hi), seen || o.seen,
      chunkSeen || o.chunkSeen, unavailable || o.unavailable)
  }
  private val FooterStatsZero =
    FooterStats(Long.MaxValue, Long.MinValue, seen = false,
      chunkSeen = false, unavailable = false)

  /** Column min/max straight from the parquet FOOTER statistics —
    * driver-side metadata reads only, no Spark job. Returns
    * `None` when any row group lacks usable stats for the column OR the
    * column appears in no footer at all (the caller then falls back to
    * the probe job); `Some(None)` when stats are complete but the column
    * has no non-null values anywhere; `Some(Some((lo, hi)))` otherwise.
    * Matching is case-insensitive, like Spark's own column resolution
    * (the conform layer passes the CANONICAL spelling while the file may
    * carry a drifted one). Hidden path SEGMENTS (`_temporary`,
    * `.staging`, ...) are skipped like Spark's own file index skips them
    * — a leaf-name-only filter would open partial files a killed write
    * left behind, crashing the load (or worse, folding in values Spark
    * will never scan). Footers are read on a bounded driver thread pool
    * with an early-exit flag — at the documented partitioned scale this
    * is thousands of small metadata reads, and a serial loop would stall
    * the first table load for minutes. */
  private def footerLongMinMax(
      spark: SparkSession, path: String, column: String): Option[Option[(Long, Long)]] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val rootQ = fs.makeQualified(root).toString
    def underHiddenSegment(leaf: org.apache.hadoop.fs.Path): Boolean = {
      var cur = leaf
      while (cur != null && cur.toString != rootQ) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val files =
      if (fs.getFileStatus(root).isDirectory) {
        // RECURSIVE listing: a partitioned table (the documented 100 TB
        // layout) nests its part files under key=... subdirectories — a
        // one-level listStatus would see only directories, produce an
        // empty file list, and the empty list MUST read as "stats
        // unavailable" (probe job decides), never as complete-stats-
        // with-no-values, which the caller maps to a silent MicrosLong
        val it = fs.listFiles(root, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
        while (it.hasNext) {
          val s = it.next()
          if (s.isFile && !underHiddenSegment(s.getPath)) buf += s.getPath
        }
        buf.toSeq
      } else Seq(root)
    if (files.isEmpty) return None // nothing listable — let the probe job decide
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    def readOne(f: org.apache.hadoop.fs.Path): FooterStats = {
      if (stop.get()) return FooterStatsZero // some file already decided "probe"
      var st = FooterStatsZero
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        val blocks = reader.getFooter.getBlocks.iterator
        while (!st.unavailable && blocks.hasNext) {
          blocks.next().getColumns.asScala
            .filter(_.getPath.toDotString.equalsIgnoreCase(column))
            .foreach { cc =>
              st = st.copy(chunkSeen = true)
              val s: org.apache.parquet.column.statistics.Statistics[_] =
                cc.getStatistics
              if (s == null || s.isEmpty) st = st.copy(unavailable = true)
              else if (s.hasNonNullValue) {
                (s.genericGetMin, s.genericGetMax) match {
                  case (mn: java.lang.Long, mx: java.lang.Long) =>
                    st = st.copy(
                      lo = math.min(st.lo, mn.longValue),
                      hi = math.max(st.hi, mx.longValue), seen = true)
                  case _ => st = st.copy(unavailable = true) // not an INT64 chunk
                }
              }
            }
        }
      } finally reader.close()
      if (st.unavailable) stop.set(true)
      st
    }
    val merged =
      if (files.lengthCompare(2) < 0) files.map(readOne)
        .foldLeft(FooterStatsZero)(_ merge _)
      else {
        val pool = java.util.concurrent.Executors
          .newFixedThreadPool(math.min(files.size, 16))
        try {
          val futures = files.map(f =>
            pool.submit(new java.util.concurrent.Callable[FooterStats] {
              override def call(): FooterStats = readOne(f)
            }))
          futures.map(_.get()).foldLeft(FooterStatsZero)(_ merge _)
        } finally pool.shutdown()
      }
    if (merged.unavailable) None
    else if (!merged.chunkSeen) None // in no footer (partition key?) — probe
    else Some(if (merged.seen) Some((merged.lo, merged.hi)) else None)
  }

  /** Decide how a raw-int64 timestamp column is encoded — ONCE per load
    * from the column's observed min/max, not per row (a per-row
    * magnitude dispatch would silently read a corrupt sentinel or a
    * pre-1973 instant under the wrong arm, and could split ONE file
    * across two interpretations). The min/max come from the parquet
    * FOOTER statistics (free — no Spark job); a file whose footer lacks
    * usable INT64 stats falls back to the one-column aggregate probe
    * job. The rule is on MAGNITUDES, so a
    * pre-1970 instant or a -1 sentinel in an otherwise-micros column
    * still decides micros (|value| stays far below the frontier in
    * either direction): all |values| below the frontier → micros, all
    * above → nanos, mixed → genuinely ambiguous, loud failure — same
    * posture as the unknown-type arm of [[conform]]. An all-null/empty
    * column decides micros (there are no rows to misread); a
    * decided-micros maximum past [[MicrosSanityCeil]] fails loudly (the
    * blind-window guard). */
  private[graft] def longTsEncoding(
      spark: SparkSession, dir: String, table: String, column: String): LongTsEncoding =
    longTsEncodingMemo.computeIfAbsent(
      s"${graft.sources.Formats.canonicalDir(dir)}#$table.$column",
      _ => {
        val path = s"$dir/$table.parquet"
        val fromFooter = footerLongMinMax(spark, path, column)
        val minMax: Option[(Long, Long)] = fromFooter match {
          case Some(mm) => mm
          case None => // footer stats unusable somewhere — probe job
            val mm = spark.read.parquet(path)
              .agg(fmin(col(column)), fmax(col(column))).first()
            if (mm.isNullAt(0)) None else Some((mm.getLong(0), mm.getLong(1)))
        }
        minMax match {
          case None => MicrosLong
          case Some((lo, hi)) =>
            // saturating |v|: math.abs(Long.MinValue) overflows NEGATIVE,
            // which would read the most-negative possible extreme as
            // magnitude-below-everything and silently decide micros (then
            // overflow the micros decode); clamping to MaxValue makes it
            // read as nanos-range-or-beyond, so a MinValue extreme paired
            // with a plausible-micros one routes to the ambiguity throw
            def mag(v: Long): Long =
              if (v == Long.MinValue) Long.MaxValue else math.abs(v)
            val maxAbs = math.max(mag(lo), mag(hi))
            val minAbs = // NOT min(|lo|,|hi|): a range spanning 0 contains 0
              if (lo <= 0L && hi >= 0L) 0L
              else math.min(mag(lo), mag(hi))
            if (maxAbs < NanosFloor) {
              // the guard is on hi, NOT maxAbs: only a POSITIVE extreme
              // can be a far-future decode (the blind-window artifact —
              // nanos misread as micros land past 2200); a deep negative
              // lo is just a pre-1970 instant, which the magnitude rule
              // deliberately tolerates in a micros column
              if (hi >= MicrosSanityCeil) throw new IllegalStateException(
                s"$table.$column: raw int64 timestamp range [$lo, $hi] " +
                  s"decides MICROS by magnitude but its maximum ($hi) " +
                  "decodes past year 2200 — either corrupt micros or an " +
                  "all-nanos column from the pre-mid-1973 blind window " +
                  "being misread; refusing to guess. Fix the data or " +
                  "extend Tables.longTsEncoding for the new encoding.")
              MicrosLong
            }
            else if (minAbs > NanosFloor) NanosLong
            else if (Seq(lo, hi).forall { v =>
              val a = mag(v); a < SentinelCeil || a > NanosFloor
            }) {
              // mixed magnitudes where EACH observed extreme is
              // individually either a missing-value sentinel (|v| below
              // ~1970-01-12 as micros / ~17 minutes as nanos — 0, -1,
              // small epsilons, the same tolerance the magnitude rule
              // already gives an otherwise-micros column) or nanos-range
              // (|v| > NanosFloor, impossible as micros — ≫ the year-2200
              // ceiling): nanos is the only consistent reading of both
              // extremes, not a guess. The check is per-extreme, NOT on
              // minAbs: a zero-spanning range forces minAbs to 0, which
              // would let a plausible-micros extreme (e.g. hi ≈ 1.6e15
              // paired with a nanos-scale negative lo) silently decide
              // nanos and be misread as a 1970-era nano instant — that
              // mix falls through to the ambiguity throw. Residual: a
              // half-converted column whose micros half sits entirely
              // BETWEEN SentinelCeil and the footer min/max extremes is
              // invisible to min/max evidence — the throw below still
              // catches every mix whose observed extreme is a real
              // timestamp in the wrong encoding.
              NanosLong
            }
            else throw new IllegalStateException(
              s"$table.$column: raw int64 timestamp range [$lo, $hi] has " +
                s"values on both sides of the nanos/micros magnitude frontier " +
                s"($NanosFloor) — ambiguous encoding; refusing to guess per " +
                "row. Fix the data or extend Tables.longTsEncoding for the " +
                "new encoding.")
        }
      })

  // ---- per-column drift normalization ----------------------------------

  /** Per-row bounds-checked cast to a (possibly narrower) integral type:
    * an out-of-range value fails loudly with a table.column-named
    * message whatever the session's ANSI setting (a non-ANSI cast would
    * silently wrap). Shared by the integral-narrowing and
    * decimal-encoded-key arms of [[normalized]]. */
  private def checkedIntegralCast(
      table: String, name: String, wanted: DataType, why: String): Column = {
    val (lo, hi) = wanted match {
      case LongType => (Long.MinValue, Long.MaxValue)
      case IntegerType => (Int.MinValue.toLong, Int.MaxValue.toLong)
      case ShortType => (Short.MinValue.toLong, Short.MaxValue.toLong)
      case _ => (Byte.MinValue.toLong, Byte.MaxValue.toLong)
    }
    when(col(name).isNotNull && (col(name) < lit(lo) || col(name) > lit(hi)),
      raise_error(lit(s"$table.$name: value out of $wanted range after a " +
        s"$why; fix the data or the canonical schema")))
      .otherwise(col(name).cast(wanted))
  }

  /** The normalized replacement for one observed column, or None when the
    * observed type is already canonical. Throws (table.column-named) on
    * drift that is not known-benign. */
  private def normalized(
      spark: SparkSession, dir: String, table: String, name: String,
      observed: DataType, wanted: DataType): Option[Column] = {

    def fail(): Nothing = throw new IllegalStateException(
      s"$table.$name arrived as unsupported type $observed (expected " +
        s"$wanted) — a data refresh changed this column's encoding in a " +
        "way Tables.conform does not recognize as benign. Extend the " +
        "normalization (failing loudly beats silently propagating a " +
        "misread column into every downstream query).")

    /** Widths for lossless-vs-checked integral casts. */
    def intWidth(dt: DataType): Option[Int] = dt match {
      case ByteType => Some(1); case ShortType => Some(2)
      case IntegerType => Some(4); case LongType => Some(8); case _ => None
    }

    (observed, wanted) match {
      case (o, w) if o == w => None

      // -- timestamps: the family of encodings the generator has shipped
      case (TimestampNTZType, TimestampType) =>
        // pure reinterpretation of the same wall clock under the pinned
        // UTC session zone — identical micros, identical to what DuckDB
        // sees as a naive timestamp
        Some(col(name).cast(TimestampType))
      case (DateType, TimestampType) =>
        // midnight-UTC widening; lossless
        Some(col(name).cast(TimestampType))
      case (LongType, TimestampType) =>
        longTsEncoding(spark, dir, table, name) match {
          case NanosLong =>
            // ns→µs with integer division (`div` — float division would
            // lose precision past 2^53), matching DuckDB's own ns→µs
            // truncation so oracle timestamps compare equal
            Some(expr(s"timestamp_micros($name div 1000)"))
          case MicrosLong => Some(expr(s"timestamp_micros($name)"))
        }

      // -- integrals: widening is lossless; narrowing is checked per row
      //    so an actually-out-of-range value fails loudly regardless of
      //    the session's ANSI setting (a non-ANSI cast would wrap)
      case (o, w) if intWidth(o).isDefined && intWidth(w).isDefined =>
        if (intWidth(o).get <= intWidth(w).get) Some(col(name).cast(w))
        else Some(checkedIntegralCast(table, name, w,
          s"narrowing data-refresh drift from $observed — not a benign widening"))

      // -- floating point / decimal → double: what DuckDB reads from the
      //    same file is the same widened value. The decimal arm is
      //    deliberately UNCHECKED, unlike int64→double below: fractional
      //    decimals (xx.45 money values) are never exactly representable
      //    in binary at ANY magnitude, so "exact" is the wrong criterion
      //    — the parity argument is that both engines perform the same
      //    correctly-rounded decimal→double conversion on the same
      //    stored value, so the two sides still compare equal; an
      //    exactness guard here would reject every routine money value.
      case (FloatType, DoubleType) => Some(col(name).cast(DoubleType))
      case (_: DecimalType, DoubleType) => Some(col(name).cast(DoubleType))
      case (o, DoubleType) if intWidth(o).isDefined =>
        // int32-and-below → double is always exact; int64 is exact only
        // within ±2^53, so values outside that band fail loudly (same
        // posture as the checked integral narrowing — a silent last-bit
        // loss here would be the layer's own "silently misread column")
        if (intWidth(o).get <= 4) Some(col(name).cast(DoubleType))
        else {
          val maxExact = 9007199254740992L // 2^53
          Some(when(col(name).isNotNull &&
              (col(name) < lit(-maxExact) || col(name) > lit(maxExact)),
            raise_error(lit(s"$table.$name: int64 value outside ±2^53 " +
              "cannot widen to DOUBLE losslessly after a data-refresh " +
              "drift; fix the data or the canonical schema")))
            .otherwise(col(name).cast(DoubleType)))
        }

      // -- scale-0 decimal where an integral is canonical (generators
      //    that write keys as DECIMAL(n,0)): same per-row bounds check
      //    as the integral narrowing — out-of-range fails loudly
      case (d: DecimalType, w) if d.scale == 0 && intWidth(w).isDefined =>
        Some(checkedIntegralCast(table, name, w,
          s"DECIMAL-encoded integer drift from $observed"))

      // -- embeddings: a float64 refresh keeps every typed path compiling;
      //    residual risk (last-ulp quantization drift vs a DuckDB oracle
      //    reading float64) is documented in SURVEY.md §2
      case (ArrayType(DoubleType, _), ArrayType(FloatType, _)) =>
        Some(col(name).cast(ArrayType(FloatType)))
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => None

      case _ => fail()
    }
  }

  /** Normalize a just-loaded table against its canonical schema — see
    * the object doc. Columns the canonical schema doesn't know pass
    * through untouched; expected-but-absent columns are allowed (partial
    * spec fixtures). Matching is CASE-INSENSITIVE (Spark's default
    * analysis resolution): a refresh that re-spells a column `VALUE`
    * would otherwise slip past the drift check while `col("value")`
    * still resolved to the raw un-normalized column — the observed
    * spelling is also renamed back to canonical, so passthrough output
    * columns keep the names the oracle SQL projects. */
  private[graft] def conform(
      spark: SparkSession, dir: String, table: String, df: DataFrame): DataFrame =
    expectedColumns.get(table) match {
      case None => df
      case Some(cols) =>
        val present = df.schema.fields
          .map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> (f.name, f.dataType))
          .toMap
        cols.foldLeft(df) { case (acc, (name, wanted)) =>
          present.get(name.toLowerCase(java.util.Locale.ROOT)) match {
            case None => acc
            case Some((obsName, observed)) =>
              val spelled =
                if (obsName == name) acc else acc.withColumnRenamed(obsName, name)
              normalized(spark, dir, table, name, observed, wanted)
                .fold(spelled)(spelled.withColumn(name, _))
          }
        }
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** A conformed named-table load — what every accessor below routes
    * through. NOTE: reading the legacy annotated INT64 TIMESTAMP(NANOS)
    * encoding requires `spark.sql.legacy.parquet.nanosAsLong=true`, set
    * at SESSION BUILD by every harness entry point (Bench/Verify/Smoke/
    * PlanDump/ScaleProbe/TestSpark) — without it Spark fails the scan
    * loudly with [PARQUET_TYPE_ILLEGAL]. */
  private def loadConformed(spark: SparkSession, dir: String, name: String): DataFrame =
    conform(spark, dir, name, load(spark, dir, name))

  /** Conformed accessor by table NAME — for spec-driven operators that
    * iterate a declared table list ([[graft.operators.Maintenance]]'s
    * ANALYZE profiler) instead of hard-coding one accessor per table.
    * Same conform pipeline as the named accessors below. */
  def byName(spark: SparkSession, dir: String, name: String): DataFrame =
    loadConformed(spark, dir, name)

  def region(spark: SparkSession, dir: String): DataFrame     = loadConformed(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = loadConformed(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = loadConformed(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = loadConformed(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = loadConformed(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = loadConformed(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = loadConformed(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame     = loadConformed(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = loadConformed(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = loadConformed(spark, dir, "embeddings")

  /** [[conform]] for callers that hold an events DataFrame with a
    * different lineage than the batch load — the file-STREAM source,
    * whose schema comes from the cached batch read. Every normalization
    * is a pure column projection (streaming-safe); the one stateful
    * step, the raw-long timestamp encoding probe, runs on a BATCH read
    * of the same `dir` (memoized), never on the stream. Keeping the
    * stream behind the same conform rules as batch means a refresh that
    * drifts any events column breaks neither half — or both halves
    * loudly, never a silent batch/stream divergence. */
  def normalizeEventTs(spark: SparkSession, dir: String, df: DataFrame): DataFrame =
    conform(spark, dir, "events", df)

  /** Register every table as a temp view so `spark.sql` works too. Every
    * table routes through its conforming accessor, so SQL consumers see
    * the same normalized schema as DataFrame consumers (and, under the
    * legacy nanos encoding, don't hit [PARQUET_TYPE_ILLEGAL] at scan
    * time).
    *
    * CONTRACT: registration alone cannot protect the caller's LATER
    * `spark.sql` analysis — a concurrent registrant of the same
    * canonical name can land in between. Callers that analyze SQL over
    * these views while other view users may run concurrently must wrap
    * registerAll + their spark.sql call together in [[withViews]]
    * (reentrant, so the nesting is safe). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    // load (conform probing, possibly first-touch footer/probe jobs)
    // OUTSIDE the lock — the same load-before-lock discipline every
    // view-based operator follows; the lock covers registration only
    val dfs = names.map(n => n -> loadConformed(spark, dir, n))
    withViews {
      dfs.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    }
  }
}
