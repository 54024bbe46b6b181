package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet star-schema loaders for the driver-generated testdata
  * (`/root/testdata/sf*`; schemas in FIXTURES.md §2).
  *
  * At 100 TB these tables become partitioned parquet directories; the
  * loaders stay identical — `spark.read.parquet` plans splits via
  * FileSourceScanExec and `spark.sql.files.maxPartitionBytes`, the same
  * mechanism that subsumes the reference's LPT file bin-packing
  * (reference: driver.py:41-68, see SURVEY.md §2a row 12).
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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** Normalize `events.ts` to a session-zone TIMESTAMP whatever the
    * on-disk encoding. The generator has shipped two encodings across
    * data refreshes, and planted spec fixtures use a third-equivalent:
    *  - INT64 TIMESTAMP(NANOS), surfaced as a raw long under the
    *    `nanosAsLong` legacy flag (Spark rejects the type outright
    *    otherwise, [PARQUET_TYPE_ILLEGAL]) → convert ns→µs with integer
    *    division (`div` — float division would lose precision past 2^53),
    *    matching DuckDB's own ns→µs truncation so oracle timestamps
    *    compare equal;
    *  - TIMESTAMP(MICROS) without a UTC flag, surfaced as TIMESTAMP_NTZ
    *    → cast to TIMESTAMP, a pure reinterpretation of the same wall
    *    clock under the pinned UTC session zone — identical micros, and
    *    identical to what DuckDB sees as a naive timestamp.
    * Dispatching on the OBSERVED type (not the expected one) keeps every
    * events consumer — batch, streaming, SQL views — working across data
    * refreshes without a code change.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        // Per-row magnitude dispatch between the two plausible raw-long
        // encodings, so a future refresh to epoch-MICROS longs cannot
        // silently produce ~1970 timestamps: nanos for any date past
        // 1973 exceed 1e17, micros stay below it until year ~5138.
        // Branchless in codegen; zero extra scans.
        df.withColumn("ts",
          expr("timestamp_micros(CASE WHEN abs(ts) > 100000000000000000 " +
            "THEN ts div 1000 ELSE ts END)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — extend " +
          "Tables.normalizeEventTs for the new encoding (failing loudly " +
          "beats silently propagating a misread timestamp)")
    }
  }

  /** Events loader: raw parquet read + [[normalizeEventTs]]. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view so `spark.sql` works too.
    * `events` must route through its typed accessor so every SQL consumer
    * sees the normalized session-zone `ts` (and, under the legacy nanos
    * encoding, doesn't hit [PARQUET_TYPE_ILLEGAL] at scan time). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n => load(spark, dir, n).createOrReplaceTempView(n)
    }
}
