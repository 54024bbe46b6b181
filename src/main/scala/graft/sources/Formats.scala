package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** File-format breadth beyond parquet/text: CSV and JSON (and, via
  * WordCount, raw text) as both source and sink. Each query round-trips a
  * table through the format in `target/` and aggregates the re-read copy;
  * the oracle runs the same aggregate on the ORIGINAL parquet, so any
  * serialization loss (types, nulls, quoting, timestamps) fails the
  * hash-compare — format fidelity is the thing under test.
  *
  * At 100 TB these writers shard per-partition like any Spark sink; CSV/
  * JSON are interchange formats, so schemas are declared explicitly on
  * re-read (inference is another full scan at scale).
  */
object Formats {

  /** Canonical form of a dataset dir — two spellings of one dir
    * (trailing slash, `.`/`..` segments, symlinks) resolve to ONE
    * string, the same normalization `Tables.longTsEncodingMemo`
    * applies, so the per-(JVM, dataset) memos and scratch paths keyed
    * through here can never split (double-materialize) across
    * spellings. Falls back to the raw string if the filesystem refuses
    * to resolve, keeping the call total. */
  private[graft] def canonicalDir(dir: String): String =
    try new java.io.File(dir).getCanonicalPath
    catch { case _: java.io.IOException => dir }

  /** Dataset dir → identifier-safe suffix, shared by scratch paths and
    * catalog table names so the two can never diverge for the same dir.
    * Canonicalizes first, so `dir` and `dir/` share one suffix. The
    * readable sanitized form alone is COLLISION-PRONE — character
    * replacement maps distinct dirs like `/a/b` and `/a_b` to one
    * suffix, which would share one scratch path / Derby DB between two
    * datasets while every canonicalDir-keyed memo believes it owns it
    * (ScaleProbe worked around exactly this locally with a path hash)
    * — so a short hash of the canonical path is appended: readable
    * prefix for humans, hash for uniqueness, one definition for all
    * consumers. */
  private[graft] def sanitize(dir: String): String = {
    val c = canonicalDir(dir)
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(c.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    c.replaceAll("[^a-zA-Z0-9]", "_") + "_" + h
  }

  /** Scratch root for round-trip sinks: overridable via
    * -Dgraft.scratch.dir, defaulting to a PER-PROCESS dir under the JVM
    * temp dir (a hardcoded repo-absolute path would break any checkout
    * elsewhere). Per-process since r20: scratch is a run-scoped cache —
    * the in-JVM [[withScratchLock]] serializes writers only within one
    * process, so a shared fixed root made two concurrent graft JVMs on
    * the SAME dataset (two Verify batteries, sbt test beside a manual
    * run) overwrite paths the other was lazily reading — the documented
    * single-process footgun, now closed by default isolation instead of
    * an operator rule. The explicit -D override keeps a fixed location
    * available and re-inherits the one-JVM-per-root contract. A
    * best-effort shutdown hook removes the default root (at sf10 a
    * maintenance rewrite parks ~1 GB there; accumulating one dir per
    * run would exhaust /tmp), exactly like Spark's own local-dir
    * cleanup — an OOM-killed JVM leaves the dir for tmpwatch. */
  private lazy val defaultScratchRoot: String = {
    val root =
      s"${sys.props("java.io.tmpdir")}/graft-fmt-${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
          Option(f.listFiles()).foreach(_.foreach(del))
        f.delete(); ()
      }
      del(new java.io.File(root))
    }))
    root
  }

  private[graft] def tmp(name: String, dir: String): String = {
    val root = sys.props.getOrElse("graft.scratch.dir", defaultScratchRoot)
    s"$root/${name}_${sanitize(dir)}"
  }

  /** Per-scratch-path locks for the format round-trips (sweep r18 — the
    * same class [[graft.operators.Dedup.dedupComponentsLsh]] closed in
    * r17 for its label artifact): every fmt query writes a FIXED scratch
    * path, then reads it back, and sbt provably runs suites concurrently
    * on the shared session — unserialized, a concurrent same-dataset
    * caller can (a) observe [[fmtBinary]]'s fixture half-rebuilt with the
    * marker already committed by the other caller (silent wrong rows),
    * (b) read [[fmtDynamicOverwrite]]'s seed state before the other
    * caller's backfill lands (silent wrong values), or (c) collide two
    * writers' `_temporary` staging under one path (loud but spurious
    * battery failure). The lock spans build THROUGH frame construction
    * (the read's file listing must not race a delete), same scope as the
    * Dedup idiom; execution of the returned frame is covered by the
    * documented fmt_* invalidation contract — a later call on the same
    * dataset invalidates earlier frames. Classification under the r17
    * lock-ordering rule: window-WRAPPED (no body opens a conf window —
    * dynamic overwrite deliberately uses a per-WRITE option). Production
    * Verify/Bench runs are sequential: zero contention there. */
  private val scratchLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[graft] def withScratchLock[T](path: String)(body: => T): T =
    scratchLocks.computeIfAbsent(path, _ => new Object).synchronized(body)

  /** CSV round-trip: supplier → csv (header) → re-read with explicit
    * schema → per-nation aggregate. */
  def fmtCsvRoundtrip(spark: SparkSession, dir: String): DataFrame =
      withScratchLock(tmp("supplier_csv", dir)) {
    val path = tmp("supplier_csv", dir)
    Tables.supplier(spark, dir)
      // CSV is the one POSITIONAL format here (the explicit re-read
      // schema binds by column order; enforceSchema=true skips the
      // header check), so the write pins the order explicitly — a
      // refresh that reorders supplier columns must not silently bind
      // s_acctbal text into s_nationkey. XML and JDBC already do this.
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
      .write.mode("overwrite").option("header", "true").csv(path)
    spark.read
      .option("header", "true")
      .schema("s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
      .csv(path)
      .groupBy(col("s_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("s_acctbal").cast("decimal(18,2)")).cast("double").as("bal"))
  }

  /** DYNAMIC PARTITION OVERWRITE — the incremental-backfill write
    * pattern: a daily pipeline recomputes ONE day and overwrites only
    * that partition, leaving every other day's files untouched. Static
    * overwrite mode would truncate the whole table first (at 100 TB,
    * re-writing a year to fix a day); `partitionOverwriteMode=dynamic`
    * scopes the overwrite to exactly the partitions present in the
    * incoming frame. The query seeds events partitioned by day, then
    * backfills day 2024-01-05 with doubled values, then aggregates the
    * re-read table; the oracle applies the same day-scoped
    * transformation to the ORIGINAL table, so both the overwrite's
    * surgical scope (other days byte-identical) and its content are
    * hash-checked. The seed write is day-partitioned exactly as a real
    * ingest would be, so the backfill touches one directory. */
  def fmtDynamicOverwrite(spark: SparkSession, dir: String): DataFrame =
      withScratchLock(tmp("events_dynpart", dir)) {
    val path = tmp("events_dynpart", dir)
    val ev = Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    // repartition by the partition column before the partitioned write
    // (guide §6's REBALANCE-before-write): each day's rows land in ONE
    // task, so the write is (a) parallel across days instead of serial
    // per input split and (b) exactly one file per day instead of
    // (input splits × days) — the many-small-files pattern at scale.
    // Distribution-only: row content, the day dirs, and the re-read
    // aggregate are unchanged (r21: 1.02→0.84 s steady at sf0.1, where
    // the single-split input previously wrote all ~60 day files from
    // one task). A single giant day skews this to one task; production
    // adds a salt bucket (day, pmod(xxhash64(key), k)) — not needed at
    // bench scale and unmeasurable locally.
    ev.repartition(col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(path)
    // day == '2024-01-05'  ⟺  ts ∈ ['2024-01-05', '2024-01-06) in the
    // UTC session (NULL ts excluded by both forms — date_format(NULL)
    // is NULL ≠ the literal). The half-open ts range is the form the
    // parquet scan can PUSH (PushedFilters prunes row groups); the
    // derived date_format equality re-scanned the whole table.
    val backfill = ev
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
      .withColumn("value", col("value") * 2.0)
    // per-WRITE option, not a session-conf window: it scopes dynamic
    // overwrite to exactly this write (DataFrameWriter options take
    // precedence over the session conf), so no concurrently-planned
    // write can inherit dynamic semantics from a mutation window
    backfill.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(path)
    // explicit writer-side schema, twice over: an EMPTY seed write
    // leaves no footer to infer from (the read would abort the whole
    // battery on a just-created table), and it pins `day` to the
    // written STRING form instead of partition-type inference's DATE
    spark.read.schema(ev.schema).parquet(path)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("val_sum"))
  }

  val fmtDynamicOverwriteSql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
      |  CAST(sum(CAST(CASE WHEN strftime(ts, '%Y-%m-%d') = '2024-01-05'
      |                     THEN value * 2.0 ELSE value END
      |                AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
      |FROM events GROUP BY 1""".stripMargin

  /** Malformed-input ingest — the robustness path a crawl pipeline needs
    * before anything else reads the data: ~10% of JSON lines are
    * DETERMINISTICALLY corrupted (doc_id % 10 == 3, truncated mid-object)
    * at write, then read back in PERMISSIVE mode with a corrupt-record
    * column. Bad lines land whole in `_corrupt` with data fields null
    * (so they fall out of the aggregates), good lines parse normally,
    * and NOTHING throws — contrast FAILFAST, which would abort a 100 TB
    * ingest on its first bad crawl record. The oracle derives the same
    * counts from the corruption rule on the ORIGINAL table, so the
    * parser's good/bad partition is exactly what is hash-checked. */
  def fmtJsonCorrupt(spark: SparkSession, dir: String): DataFrame =
      withScratchLock(tmp("docs_badjson", dir)) {
    val path = tmp("docs_badjson", dir)
    Tables.documents(spark, dir)
      .select(
        when(col("doc_id") % 10 === 3,
          concat(lit("{\"doc_id\": "), col("doc_id"), lit(", BROKEN")))
          .otherwise(to_json(struct(col("doc_id"), col("n_chars"))))
          .as("value"))
      .write.mode("overwrite").text(path)
    spark.read
      .schema("doc_id long, n_chars long, _corrupt string")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .agg(
        count(lit(1)).as("n_lines"),
        count(col("_corrupt")).as("n_bad"),
        sum(col("n_chars")).as("good_chars"))
  }

  val fmtJsonCorruptSql: String =
    """SELECT count(*) AS n_lines,
      |  count(CASE WHEN doc_id % 10 = 3 THEN 1 END) AS n_bad,
      |  CAST(sum(CASE WHEN doc_id % 10 <> 3 THEN n_chars END) AS BIGINT) AS good_chars
      |FROM documents""".stripMargin

  val fmtCsvRoundtripSql: String =
    """SELECT CAST(s_nationkey AS BIGINT) AS nationkey, count(*) AS n,
      |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM supplier GROUP BY 1""".stripMargin

  /** JSON round-trip: part → json lines → re-read with explicit schema →
    * per-brand aggregate. */
  def fmtJsonRoundtrip(spark: SparkSession, dir: String): DataFrame =
      withScratchLock(tmp("part_json", dir)) {
    val path = tmp("part_json", dir)
    Tables.part(spark, dir)
      .write.mode("overwrite").json(path)
    spark.read
      .schema("p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double")
      .json(path)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        max(col("p_size").cast("long")).as("max_size"),
        sum(col("p_retailprice").cast("decimal(18,2)")).cast("double").as("price_sum"))
  }

  val fmtJsonRoundtripSql: String =
    """SELECT p_brand, count(*) AS n,
      |  CAST(max(p_size) AS BIGINT) AS max_size,
      |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
      |FROM part GROUP BY 1""".stripMargin

  /** ORC round-trip: orders → ORC (Spark's native vectorized ORC
    * reader/writer) → monthly aggregate. Timestamps survive the
    * round-trip — the column type most formats mangle. */
  def fmtOrcRoundtrip(spark: SparkSession, dir: String): DataFrame =
      withScratchLock(tmp("orders_orc", dir)) {
    val path = tmp("orders_orc", dir)
    Tables.orders(spark, dir)
      .write.mode("overwrite").orc(path)
    spark.read.orc(path)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
  }

  val fmtOrcRoundtripSql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1""".stripMargin

  /** XML round-trip (built-in XML source, Spark 4): customer → nested
    * <customers><customer>…</customer></customers> → re-read with
    * explicit schema + rowTag → per-segment aggregate. Doubles survive
    * because the writer emits the shortest round-trippable decimal
    * representation. */
  def fmtXmlRoundtrip(spark: SparkSession, dir: String): DataFrame =
      withScratchLock(tmp("customer_xml", dir)) {
    val path = tmp("customer_xml", dir)
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"), col("c_acctbal"))
      .write.mode("overwrite")
      .option("rootTag", "customers").option("rowTag", "customer")
      .format("xml").save(path)
    spark.read
      .option("rowTag", "customer")
      .schema("c_custkey long, c_name string, c_nationkey int, c_mktsegment string, c_acctbal double")
      .format("xml").load(path)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("bal"))
  }

  val fmtXmlRoundtripSql: String =
    """SELECT c_mktsegment, count(*) AS n,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM customer GROUP BY 1""".stripMargin

  /** JDBC round-trip against embedded Derby (in the same JVM under
    * local mode): customer → JDBC table → PARTITIONED JDBC re-read →
    * per-nation aggregate. The read supplies partitionColumn/bounds, so
    * Spark issues one range-predicated query per partition — the shape
    * that parallelizes an RDBMS ingest at scale (against a real server,
    * not :memory:). Bounds come from one tiny max() job on the source
    * rather than hardcoded constants. */
  def fmtJdbcRoundtrip(spark: SparkSession, dir: String): DataFrame =
      // keyed on the parked-result path, but the lock also serializes the
      // per-dir Derby memory:db (same sanitize(dir) suffix) — a concurrent
      // same-dataset caller's drop=true would otherwise race this call's
      // write/read window
      withScratchLock(tmp("customer_jdbc_out", dir)) {
    val url = s"jdbc:derby:memory:graft_${sanitize(dir)};create=true"
    val props = new java.util.Properties()
    // write-side batch size (default 1000): 10× fewer executeBatch
    // cycles against embedded Derby — measured ~0.3 s at sf0.1 (r21,
    // ProbeR21d batch10k vs base). Read path is unaffected.
    props.setProperty("batchsize", "10000")
    val src = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    // an empty customer table has a NULL max — any bounds plan fine
    // (the partitioned read just issues four empty range queries), so
    // 0 keeps the battery alive instead of a getLong NPE
    val maxRow = src.agg(max(col("c_custkey"))).collect()(0)
    val maxKey = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    // Bounds shape the STRIDE only — Spark's first/last JDBC partitions
    // are open-ended, so rows outside [lower, upper) are still read.
    // Two overflow arms the extreme-key fixture crashes without:
    // maxKey + 1 wraps NEGATIVE at Long.MaxValue (saturate), and an
    // all-negative key space puts maxKey + 1 at or below the fixed
    // lower bound 0 (floor at 1 — Spark requires lower < upper)
    val upperKey =
      if (maxKey == Long.MaxValue) Long.MaxValue
      else math.max(1L, maxKey + 1L)
    src.write.mode("overwrite").jdbc(url, "customer_jdbc", props)
    val agg = spark.read
      .option("partitionColumn", "c_custkey")
      .option("lowerBound", "0")
      .option("upperBound", upperKey.toString)
      .option("numPartitions", "4")
      .jdbc(url, "customer_jdbc", props)
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("bal"))
    // Materialize the aggregate, then DROP the in-memory Derby DB: each
    // memory:db otherwise lives until JVM exit holding a full
    // customer-table copy per dataset dir — a heap leak no harness
    // check sees. The lazy JDBC read must be spent before the drop;
    // r21 (guide §1.2): the result is nation-bounded (≤ one row per
    // c_nationkey value, 25 here — the same bounded-collect class as
    // the one-row anchor above), so COLLECT it and return a local
    // frame instead of the old park-to-scratch-parquet round-trip,
    // whose write+re-read cost ~1 s at sf0.1 to move 25 rows
    // (ProbeR21d/e: park_nodrop ≈ base, nopark ≈ base − 1.1 s). The
    // JDBC read + aggregation still run distributed; only the final
    // 25 rows touch the driver, at 100 TB exactly as here. A local
    // frame also never goes stale — strictly safer than the fmt_*
    // invalidation contract the parked copy leaned on.
    val rows = agg.collectAsList()
    try {
      java.sql.DriverManager.getConnection(
        s"jdbc:derby:memory:graft_${sanitize(dir)};drop=true")
      ()
    } catch {
      // 08006 is Derby's SUCCESSFUL single-database shutdown signal
      case e: java.sql.SQLException if e.getSQLState == "08006" => ()
    }
    spark.createDataFrame(rows, agg.schema)
  }

  val fmtJdbcRoundtripSql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM customer GROUP BY 1""".stripMargin

  /** Hive-style partitioned parquet + partition pruning: documents
    * written partitioned by `lang`, re-read with a partition filter. The
    * plan's FileSourceScan shows the predicate under PartitionFilters
    * (directory-level pruning — non-matching partitions are never
    * listed, let alone read). At 100 TB, partition-on-ingest is what
    * turns a full-corpus scan into a single-directory read.
    */
  def fmtPartitionPruning(spark: SparkSession, dir: String): DataFrame =
      withScratchLock(tmp("docs_part", dir)) {
    val path = tmp("docs_part", dir)
    val docs = Tables.documents(spark, dir)
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    // writer-side schema: an empty corpus writes no footers to infer
    // from, and it removes partition-type inference as a drift source
    spark.read.schema(docs.schema).parquet(path)
      .filter(col("lang") === "en")
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
  }

  val fmtPartitionPruningSql: String =
    """SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents WHERE lang = 'en' GROUP BY 1""".stripMargin

  /** `binaryFile` ingest — the raw-asset on-ramp (images, audio, model
    * shards arrive as FILES, not rows): each document's text is written
    * as an individual `.bin` file from the EXECUTORS (foreachPartition
    * through the session-configured Hadoop filesystem — the driver never
    * sees a byte, and the same code writes to s3a/hdfs), then read back
    * with `format("binaryFile")`, which lists the directory into one
    * task per file group and exposes (path, length, content). The query
    * re-derives each doc's identity from its path and fingerprints the
    * bytes; the oracle computes byte length and md5 from the ORIGINAL
    * text column, so a single flipped or lost byte anywhere in the
    * write→list→read cycle fails the hash-compare. (binaryFile is
    * read-only by design in Spark; the write half IS the executor-side
    * loop.) Scale note: one small file per record is the pathology
    * [[graft.operators.Maintenance]] compaction exists to fix — here it
    * is the deliberate fixture, because raw multimodal corpora really do
    * arrive that way.
    */
  /** Fixture bound: one file per record costs ~7 ms on this VM's local
    * filesystem (create + checksum twin, then open on read) regardless
    * of size, so an unbounded fixture would benchmark the VM's file
    * syscall throughput, not the format path. 500 files exercises
    * listing, glob filtering, bin-packing, and content fidelity fully. */
  val BinaryFixtureDocs = 500L

  /** Decode a Hive-ESCAPED partition-path token back to its VALUE — the
    * raw `key=token` path segment carries %XX escapes and turns NULL
    * into the `__HIVE_DEFAULT_PARTITION__` sentinel, while oracles group
    * by the value, so every path-derived group key must decode through
    * THIS one definition ([[fmtFileLineage]] and
    * [[graft.sources.Lines.linesProvenance]]; a bare `[a-z]+` extract
    * truncated 'pt-BR' to 'pt' before this was shared). url_decode
    * inverts %XX exactly once literal '+' is pre-escaped (form-decoding
    * would otherwise read it as a space; Hive escaping leaves '+'
    * literal). */
  private[graft] def hivePartitionValue(raw: Column): Column =
    when(raw === "__HIVE_DEFAULT_PARTITION__", lit(null))
      .otherwise(url_decode(regexp_replace(raw, "\\+", "%2B")))

  /** (total length, max mtime) fingerprint of a source table's parquet —
    * the freshness token every PERSISTENT scratch artifact stores in its
    * marker (java.io.tmpdir survives the JVM, unlike the in-JVM memos,
    * whose staleness contract is "dies with the JVM"): a bare existence
    * check would keep serving an artifact built from PRE-REFRESH data
    * after an in-place testdata refresh (FIXTURES.md documents exactly
    * such refreshes). Shared by [[fmtBinary]]'s fixture and
    * [[graft.operators.Dedup.lshComponentLabels]]'s label artifact. */
  private[graft] def sourceFingerprint(
      conf: org.apache.hadoop.conf.Configuration, dir: String, table: String): String = {
    val src = new org.apache.hadoop.fs.Path(s"${canonicalDir(dir)}/$table.parquet")
    val sfs = src.getFileSystem(conf)
    // RECURSIVE file listing (sweep r18): at the documented partitioned
    // 100 TB layout the table nests part files under key=… subdirs, and a
    // one-level listStatus would fingerprint DIRECTORY entries — length 0,
    // and a parent mtime that an in-place leaf overwrite does not touch —
    // so a refreshed partition could keep serving a stale artifact. Flat
    // layouts (all shipped testdata) produce the identical fingerprint
    // either way, so no artifact rebuilds on upgrade.
    val statuses =
      if (sfs.getFileStatus(src).isDirectory) {
        val it = sfs.listFiles(src, true)
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.hadoop.fs.FileStatus]
        while (it.hasNext) { val s = it.next(); if (s.isFile) buf += s }
        buf.toSeq
      } else Seq(sfs.getFileStatus(src))
    // maxOption: an EMPTY table dir (zero files) must fingerprint stably,
    // not crash `.max` — 0 pairs with len=0 as "nothing here yet"
    s"len=${statuses.map(_.getLen).sum} " +
      s"mtime=${statuses.map(_.getModificationTime).maxOption.getOrElse(0L)}"
  }

  /** Read a marker file's content, `None` when absent. */
  private[graft] def readMarker(fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        Some(new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }

  /** (Over)write a marker file — call only AFTER the artifact it
    * validates is fully written, so a torn build leaves no marker. */
  private[graft] def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path, content: String): Unit = {
    val out = fs.create(marker, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Fingerprint of the binary fixture's INPUTS — the source parquet's
    * [[sourceFingerprint]] plus the doc-count constant (a different
    * BinaryFixtureDocs must also rebuild). */
  private def binaryFixtureFingerprint(
      conf: org.apache.hadoop.conf.Configuration, dir: String): String =
    s"v1 docs=$BinaryFixtureDocs ${sourceFingerprint(conf, dir, "documents")}"

  def fmtBinary(spark: SparkSession, dir: String): DataFrame =
      withScratchLock(tmp("docs_bin", dir)) {
    val path = tmp("docs_bin", dir)
    val conf = spark.sessionState.newHadoopConf()
    // Raw assets are a SOURCE: build the file fixture once per dataset
    // dir (marker committed only after every file is written — a torn
    // earlier attempt rebuilds), then every query run just reads it.
    // The marker carries the input fingerprint; a mismatch (testdata
    // refreshed in place, BinaryFixtureDocs changed) rebuilds from
    // scratch, deleting the directory FIRST so files from the old
    // generation can never survive into the doc_*.bin glob.
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(root, "_FIXTURE_OK")
    val wanted = binaryFixtureFingerprint(conf, dir)
    val current = readMarker(fs, marker)
    if (!current.contains(wanted)) {
      fs.delete(root, true)
      val hconf = new org.apache.spark.util.SerializableConfiguration(conf)
      Tables.documents(spark, dir)
        .filter(col("doc_id") < BinaryFixtureDocs)
        .select(col("doc_id"), col("text"))
        .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          val p = new org.apache.hadoop.fs.Path(path)
          val pfs = p.getFileSystem(hconf.value)
          rows.foreach { r =>
            val out = pfs.create(
              new org.apache.hadoop.fs.Path(p, s"doc_${r.getLong(0)}.bin"), true)
            try out.write(r.getString(1).getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
          }
        }
      writeMarker(fs, marker, wanted)
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "doc_*.bin")
      .load(path)
      .select(
        // -? arm: a NEGATIVE doc_id names its file doc_-N.bin, and a
        // sign-blind \d+ extract returns '' there — an ANSI cast crash
        // (found by the extreme-key edge fixture), where the oracle
        // (reading ids from the source table) sails through
        regexp_extract(col("path"), "doc_(-?\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("content_md5"))
  }

  val fmtBinarySql: String =
    s"""SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS content_md5
      |FROM documents WHERE doc_id < ${BinaryFixtureDocs}""".stripMargin

  /** SCHEMA EVOLUTION across ingest batches — the drift every long-lived
    * 100 TB dataset accumulates: early files lack a column that later
    * files carry. Two partition dirs are written with DIFFERENT schemas
    * (batch=1 without `o_orderpriority`, batch=2 with it), then the root
    * is read with `mergeSchema=true`: parquet's per-file self-describing
    * footers let Spark union the schemas, old files surface the new
    * column as null, and `batch` arrives as a discovered partition
    * column. count(o_orderpriority) per batch is the evolution proof in
    * data — 0 for the pre-evolution batch — and the oracle derives the
    * same split from the original table, so the merge semantics (not
    * just row counts) are hash-checked. mergeSchema costs a footer read
    * per file, so production turns it on at evolution boundaries (or
    * declares the target schema explicitly) rather than on every scan;
    * the per-batch writes here are each idempotent overwrites.
    */
  def fmtSchemaEvolution(spark: SparkSession, dir: String): DataFrame =
      withScratchLock(tmp("evolve", dir)) {
    val root = tmp("evolve", dir)
    val orders = Tables.orders(spark, dir)
    orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$root/batch=1")
    orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$root/batch=2")
    spark.read.option("mergeSchema", "true").parquet(root)
      .groupBy("batch", "o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        count(col("o_orderpriority")).as("n_evolved"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
  }

  val fmtSchemaEvolutionSql: String =
    """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS batch,
      |  o_orderstatus, count(*) AS n,
      |  count(CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END) AS n_evolved,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** File-provenance lineage through the hidden `_metadata` column: the
    * corpus is re-laid-out partitioned by `lang` (Hive-style
    * `lang=…/part-…` directories), then re-read and aggregated by the
    * language RECOVERED FROM EACH ROW'S FILE PATH — not from any data
    * column — so what the oracle hash-checks is that every row is
    * attributed to exactly the right physical file. This is the
    * forensic/reprocessing primitive at 100 TB ("which input files fed
    * this partition?"): `_metadata` is populated from the scan's own
    * file split (zero extra IO, no join against a manifest), and the
    * partitioned layout is the same one partition pruning runs on.
    */
  def fmtFileLineage(spark: SparkSession, dir: String): DataFrame =
      withScratchLock(tmp("documents_bylang", dir)) {
    val path = tmp("documents_bylang", dir)
    val docs = Tables.documents(spark, dir)
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    // writer-side schema (empty corpus = no footers); `_metadata` is
    // still served — it is scan-provided, not part of the file schema
    spark.read.schema(docs.schema).parquet(path)
      .select(col("n_chars"),
        hivePartitionValue(
          regexp_extract(col("_metadata.file_path"), "lang=([^/]+)/", 1))
          .as("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
  }

  val fmtFileLineageSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fmt_file_lineage" -> (fmtFileLineage _),
    "fmt_schema_evolution" -> (fmtSchemaEvolution _),
    "fmt_binary" -> (fmtBinary _),
    "fmt_csv_roundtrip" -> (fmtCsvRoundtrip _),
    "fmt_json_roundtrip" -> (fmtJsonRoundtrip _),
    "fmt_json_corrupt" -> (fmtJsonCorrupt _),
    "fmt_orc_roundtrip" -> (fmtOrcRoundtrip _),
    "fmt_xml_roundtrip" -> (fmtXmlRoundtrip _),
    "fmt_jdbc_roundtrip" -> (fmtJdbcRoundtrip _),
    "fmt_partition_pruning" -> (fmtPartitionPruning _),
    "fmt_dynamic_overwrite" -> (fmtDynamicOverwrite _))

  val oracles: Map[String, String] = Map(
    "fmt_file_lineage" -> fmtFileLineageSql,
    "fmt_schema_evolution" -> fmtSchemaEvolutionSql,
    "fmt_binary" -> fmtBinarySql,
    "fmt_csv_roundtrip" -> fmtCsvRoundtripSql,
    "fmt_json_roundtrip" -> fmtJsonRoundtripSql,
    "fmt_json_corrupt" -> fmtJsonCorruptSql,
    "fmt_orc_roundtrip" -> fmtOrcRoundtripSql,
    "fmt_xml_roundtrip" -> fmtXmlRoundtripSql,
    "fmt_jdbc_roundtrip" -> fmtJdbcRoundtripSql,
    "fmt_partition_pruning" -> fmtPartitionPruningSql,
    "fmt_dynamic_overwrite" -> fmtDynamicOverwriteSql)
}
