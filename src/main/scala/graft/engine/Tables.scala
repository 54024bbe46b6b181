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
  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark's reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as a raw long via
    * the legacy flag and convert ns→µs with integer division (`div` —
    * float division would lose precision past 2^53), matching DuckDB's
    * own ns→µs truncation so oracle timestamps compare equal.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view so `spark.sql` works too.
    * `events` must route through its typed accessor — a raw `load`
    * registers the INT64 TIMESTAMP(NANOS) parquet that Spark's reader
    * rejects at scan time, so any SQL touching the view would throw
    * [PARQUET_TYPE_ILLEGAL]. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n => load(spark, dir, n).createOrReplaceTempView(n)
    }
}
