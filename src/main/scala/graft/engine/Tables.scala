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

  /** Run `body` with one SQL conf temporarily overridden, restoring the
    * prior state (set OR unset) even on failure — the single shared
    * conf-window idiom (shuffle sizing, scan bin-packing, state-store
    * providers). */
  def withConf[T](spark: SparkSession, key: String, value: String)(body: => T): T = {
    val before = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
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

  /** Per-(dataset, column) memo of the encoding decision, so the ~37
    * events consumers (batch + streaming + SQL views) pay the one-row
    * min/max probe once per JVM, not once per query. Keyed by canonical
    * path — two spellings of one dir share a decision. A path
    * OVERWRITTEN in-place with a different encoding mid-JVM would serve
    * a stale decision, the same documented contract as the streaming
    * schema cache; the testdata refresh happens between driver rounds
    * (fresh JVMs), never mid-session. */
  private val longTsEncodingMemo =
    new java.util.concurrent.ConcurrentHashMap[String, LongTsEncoding]()

  /** Decide how a raw-int64 timestamp column is encoded — ONCE per load
    * from the column's observed min/max, not per row (a per-row
    * magnitude dispatch would silently read a corrupt sentinel or a
    * pre-1973 instant under the wrong arm, and could split ONE file
    * across two interpretations). The rule is on MAGNITUDES, so a
    * pre-1970 instant or a -1 sentinel in an otherwise-micros column
    * still decides micros (|value| stays far below the frontier in
    * either direction): all |values| below the frontier → micros, all
    * above → nanos, mixed → genuinely ambiguous, loud failure — same
    * posture as the unknown-type arm of [[conform]]. An all-null/empty
    * column decides micros (there are no rows to misread). */
  private[graft] def longTsEncoding(
      spark: SparkSession, dir: String, table: String, column: String): LongTsEncoding =
    longTsEncodingMemo.computeIfAbsent(
      s"${new java.io.File(dir).getCanonicalPath}#$table.$column",
      _ => {
        val mm = spark.read.parquet(s"$dir/$table.parquet")
          .agg(fmin(col(column)), fmax(col(column))).first()
        if (mm.isNullAt(0)) MicrosLong
        else {
          val (lo, hi) = (mm.getLong(0), mm.getLong(1))
          val maxAbs = math.max(math.abs(lo), math.abs(hi))
          val minAbs = // NOT min(|lo|,|hi|): a range spanning 0 contains 0
            if (lo <= 0L && hi >= 0L) 0L
            else math.min(math.abs(lo), math.abs(hi))
          if (maxAbs < NanosFloor) MicrosLong
          else if (minAbs > NanosFloor) NanosLong
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
      //    same file is the same widened value
      case (FloatType, DoubleType) => Some(col(name).cast(DoubleType))
      case (_: DecimalType, DoubleType) => Some(col(name).cast(DoubleType))
      case (o, DoubleType) if intWidth(o).isDefined => Some(col(name).cast(DoubleType))

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
    * time). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => loadConformed(spark, dir, n).createOrReplaceTempView(n))
}
