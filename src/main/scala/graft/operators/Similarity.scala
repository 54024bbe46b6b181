package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.DotProduct

/** Similarity search over `embeddings.embedding: array<float>`.
  *
  * Cosine similarity is computed over integer-quantized components
  * (round(x·1000) as long): dot products and norms become exact integer
  * sums — order-independent and bit-identical between Spark and the
  * DuckDB oracle — with one final IEEE division+sqrt. Quantization error
  * (~1e-3) is irrelevant for ranking on this data and buys hash-exact
  * verifiability.
  *
  * Brute force is the correctness baseline (linear scan per query vector —
  * at 100 TB that's a broadcast of the query batch against a partitioned
  * scan, still shuffle-free). Two approximate scale paths exist, with
  * measured trade-offs in their docs: multi-table hyperplane LSH
  * (high-similarity regimes / near-dup) and IVF with a KMeans coarse
  * quantizer (general ANN over clustered data).
  *
  * Plan-shape note (measured at sf0.1): quantized vectors and squared
  * norms are computed ONCE behind a repartition barrier and reused by
  * both sides of the pair join (ReuseExchange). Inlining `quant()` into
  * the join instead re-quantizes both 64-element arrays for every one of
  * the ~2 M pairs (59 s naive vs ~8 s materialized).
  */
object Similarity {

  /** Integer-quantize a float-array column. The engine-side input is
    * canonically float32 whatever the file carries ([[Tables.conform]]
    * casts a float64-refresh embedding back to `array<float>`), so the
    * value entering `round` is always float32→float64. */
  private def quant(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000).cast("long"))

  /** DuckDB twin of `quant` for the oracle SQL. The inner
    * `CAST(x AS REAL)` pins the oracle to the SAME float32→float64 path
    * the engine takes through the conform layer: on today's float32
    * files it is a no-op, and under a float64 data refresh it quantizes
    * the float32-rounded value exactly as Spark does — without it, a
    * component whose float64 value × 1000 sits within a float32 ulp of
    * a .5 boundary would quantize differently in the two engines and
    * hash-fail every exact ANN/cosine oracle row (the residual risk
    * SURVEY.md §2 documented after the r7 refresh proved the generator
    * drifts encodings). */
  private val QuantSql =
    "list_transform(embedding, x -> CAST(round(CAST(CAST(x AS REAL) AS DOUBLE) * 1000) AS BIGINT))"

  /** Codegen'd dot product (graft.functions.DotProductLong) — array
    * HOFs stay outside whole-stage codegen and cost ~20x for this loop.
    * DotProduct.register must have run on the session (quantized() does).
    */
  private def dotL(a: Column, b: Column): Column = call_function("dot_l", a, b)

  private def normSqL(a: Column): Column = dotL(a, a)

  /** vec_id → (quantized vector, squared norm) as a pure projection —
    * no exchange. The right input for single-pass consumers (top-k
    * scoring scans): the corpus side stays scan-partitioned and
    * shuffle-free. */
  private def quantizedPlain(spark: SparkSession, dir: String): DataFrame = {
    DotProduct.register(spark)
    Tables.embeddings(spark, dir)
      // a NULL embedding cannot participate in similarity (its quantized
      // form and norm are undefined) — filter here, at the ONE entry
      // point every ANN/semantic path quantizes through, instead of
      // letting the typed decodes downstream throw 'Null value appeared
      // in non-nullable field' on the first refresh that ships one. The
      // oracles exclude the same rows explicitly (WHERE embedding IS NOT
      // NULL); only lshBuckets deliberately keeps NULLs (bucket 0).
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), quant(col("embedding")).as("qe"))
      .select(col("vec_id"), col("qe"), normSqL(col("qe")).as("nsq"))
      // a ZERO-NORM vector (all components quantize to 0) is excluded
      // for the same reason: cosine is undefined for it, and under ANSI
      // mode the sim division THROWS DIVIDE_BY_ZERO at runtime — one
      // such row in a refreshed corpus would kill every exact-ANN query
      // (caught by tools/edge_oracle_probe.py's planted fixture). The
      // oracles carry the same quantized-norm > 0 arm.
      .filter(col("nsq") > 0)
  }

  /** Guarded integer dot product over quantized arrays — ONE definition
    * for every primitive similarity loop (tiled pair scan, IVF
    * assignment + rerank, semantic assignment + rerank), so the
    * ragged-row guard (iterate to the SHORTER length; a truncated row
    * degrades, never throws) cannot drift between siblings. */
  private def dotQ(a: Array[Long], b: Array[Long]): Long = {
    var dot = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); i += 1 }
    dot
  }

  /** Centroid probe scores for one vector — (|c|²−2x·c, cluster),
    * ascending = cosine order for unit centroids. ONE definition shared
    * by the IVF and semantic assignment loops. */
  private def centroidScores(qe: Array[Long],
      cs: Array[(Int, Array[Long], Long)]): Array[(Long, Int)] =
    cs.map { case (ci, qc, qcn) => (qcn - 2L * dotQ(qe, qc), ci) }.sorted

  /** [[quantizedPlain]] behind a repartition barrier — for consumers
    * that read the relation MORE THAN ONCE in a self-join (pair scans,
    * LSH): the exchange materializes the quantization once and
    * ReuseExchange shares it across both sides, instead of
    * re-quantizing 64-element arrays per pair (59 s vs ~8 s at sf0.1,
    * header note). Single-pass consumers should use the plain form —
    * the barrier would be a gratuitous full-corpus shuffle at 100 TB. */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    quantizedPlain(spark, dir).repartition(col("vec_id"))

  /** Cosine from precomputed (qe, nsq) pairs: one dot product per pair. */
  private def cosinePre(qa: Column, qb: Column, nsqa: Column, nsqb: Column): Column =
    dotL(qa, qb).cast("double") / sqrt((nsqa * nsqb).cast("double"))

  // ---- brute-force top-k ---------------------------------------------------

  /** Top-10 nearest neighbours of vec_id=0 by quantized cosine;
    * TakeOrderedAndProject keeps the top-k without a global sort. */
  def annTopkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val q = quantizedPlain(spark, dir)
    val qv = q.filter(col("vec_id") === 0)
      .select(col("qe").as("qb"), col("nsq").as("nsqb"))
    q.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        cosinePre(col("qe"), col("qb"), col("nsq"), col("nsqb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
  }

  val annTopkBruteforceSql: String =
    s"""WITH q0 AS (
      |  SELECT $QuantSql AS qb
      |  FROM embeddings WHERE vec_id = 0 AND embedding IS NOT NULL),
      |q AS (
      |  SELECT qb FROM q0
      |  WHERE list_sum(list_transform(qb, x -> x * x)) > 0),
      |v0 AS (
      |  SELECT vec_id, $QuantSql AS qa
      |  FROM embeddings WHERE vec_id <> 0 AND embedding IS NOT NULL),
      |v AS (
      |  SELECT vec_id, qa FROM v0
      |  WHERE list_sum(list_transform(qa, x -> x * x)) > 0),
      |s AS (
      |  SELECT vec_id,
      |    CAST(CAST(list_sum(list_transform(list_zip(qa, qb), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
      |    / sqrt(CAST(CAST(list_sum(list_transform(qa, x -> x * x)) AS BIGINT)
      |                * CAST(list_sum(list_transform(qb, x -> x * x)) AS BIGINT) AS DOUBLE)) AS sim
      |  FROM v, q)
      |SELECT vec_id, sim FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin

  /** Batch ANN serving shape: top-10 neighbours for EACH of a query SET
    * (the first [[BatchQueryCount]] vec_ids) in one job — the first query
    * a real retrieval user writes, generalizing the single-vector
    * `annTopkBruteforce`. The query block is broadcast (bounded: Q × 64
    * dims), the corpus side streams with no shuffle, and the per-query
    * top-10 runs as `row_number` over (query_id) — Spark's
    * InferWindowGroupLimit turns the rank filter into a partial
    * WindowGroupLimit BEFORE the exchange, so each map partition ships at
    * most 10 candidates per query instead of its whole score slice. At
    * 100 TB: broadcast stays Q-bounded, the scan partitions freely, and
    * the only shuffle carries ≤ 10·Q·partitions pre-pruned rows.
    */
  val BatchQueryCount = 32

  def annTopkBatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = quantizedPlain(spark, dir)
    val queries = q.filter(col("vec_id") < BatchQueryCount)
      .select(col("vec_id").as("query_id"), col("qe").as("qb"), col("nsq").as("nsqb"))
    q.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosinePre(col("qe"), col("qb"), col("nsq"), col("nsqb")).as("sim"))
      .withColumn("rk",
        row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("sim").desc, col("vec_id").asc)).cast("long"))
      .filter(col("rk") <= 10)
  }

  val annTopkBatchSql: String =
    s"""WITH e AS (
      |  SELECT vec_id, $QuantSql AS qe
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |v AS (
      |  SELECT vec_id, qe, nsq FROM (
      |    SELECT vec_id, qe,
      |      CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nsq
      |    FROM e)
      |  WHERE nsq > 0),
      |q AS (
      |  SELECT vec_id AS query_id, qe AS qb, nsq AS nsqb
      |  FROM v WHERE vec_id < $BatchQueryCount),
      |s AS (
      |  SELECT q.query_id, v.vec_id,
      |    CAST(CAST(list_sum(list_transform(list_zip(v.qe, q.qb), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
      |    / sqrt(CAST(v.nsq * q.nsqb AS DOUBLE)) AS sim
      |  FROM v JOIN q ON v.vec_id <> q.query_id),
      |r AS (
      |  SELECT query_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rk
      |  FROM s)
      |SELECT query_id, vec_id, sim, rk FROM r WHERE rk <= 10""".stripMargin

  /** Embedding-cosine near-dup: all pairs above a similarity threshold.
    * Documented brute-force baseline (the LSH bucket join below is the
    * 100 TB path); threshold 0.35 sits inside a gap of this corpus's sim
    * distribution.
    *
    * Implemented as a broadcast block-nested-loop: one side of the pair
    * space is broadcast as primitive arrays and each partition streams
    * its rows against it with a tight long[] dot-product loop. Array
    * higher-order functions don't participate in whole-stage codegen, so
    * the declarative theta-join form pays interpreted-lambda cost per
    * pair (measured 26 s vs ~2 s at sf0.1 / 2 M pairs). At 100 TB the
    * broadcast side becomes a bounded query block and the streamed side
    * tiles — the same shape used here. The arithmetic (integer dot and
    * norms, one IEEE divide+sqrt) is bit-identical to the SQL oracle's.
    */
  /** Rows per collected/broadcast block: bounds DRIVER memory by a
    * constant regardless of corpus size (the de-collect the r2 verdict
    * demanded). 4096 rows × 64 dims × 8 B ≈ 2 MB per broadcast — still a
    * corpus-independent constant, and 4× fewer blocks than the original
    * 1024: each block is a full corpus pass plus a job + scratch-append
    * commit, so fewer/larger blocks win at EVERY scale (guide §2.2's
    * fewer-larger rule; the pair-comparison work itself is independent
    * of the tiling). Measured r21: 2 blocks → 1 at sf0.1 took the query
    * from 1.14 s to 0.73 s steady-state (ProbeR21b, ×2 query names). */
  val PairBlockRows = 4096

  def annPairsBruteforce(spark: SparkSession, dir: String): DataFrame =
    annPairsBruteforceBlocks(spark, dir, PairBlockRows)

  /** [[annPairsBruteforce]] with the block size exposed — probe/spec
    * surface for measuring the block-count trade-off without touching
    * the declared query's constant. */
  private[graft] def annPairsBruteforceBlocks(spark: SparkSession, dir: String,
      blockRows: Int): DataFrame = {
    import spark.implicits._
    // cached so the per-block collects and the streamed scans all read the
    // quantize plan's one materialization (CacheManager dedupes by plan)
    val q = quantized(spark, dir).as[(Long, Array[Long], Long)].persist()
    try {
      val n = q.count()
      val numBlocks = math.max(1L, (n + blockRows - 1) / blockRows)
      // Block membership is a multiplicative (Fibonacci) HASH of the id,
      // not `id % numBlocks`: residue classes are uniform only for dense
      // sequential ids — a refresh that re-keys vec_ids with a stride
      // sharing a factor with numBlocks piles several blocks' rows into
      // one collect (degenerate case: the whole corpus onto the driver,
      // the exact OOM this tiling exists to prevent). The hash spreads
      // ANY id structure ~uniformly, so the per-block bound holds by
      // construction, not by luck of the key space. Keep the HIGH 32 bits
      // of the product: low product bits depend only on low id bits, so
      // ids strided by 2^s would still collapse onto multiples of
      // 2^(s-1) under a low-bits modulus — the high bits mix every id
      // bit into the block choice (numBlocks ≪ 2^32, so no truncation).
      def blockOf(id: Long): Long = ((id * -7046029254386353131L) >>> 32) % numBlocks
      // each pair (x<y) is emitted by exactly the block containing y
      // (blockOf is deterministic). TRUE tiling: each block is its
      // own job — collect ≤~PairBlockRows rows, broadcast, stream the full
      // scan against it, append the thresholded pairs to a scratch sink,
      // DESTROY the broadcast — so driver and executor footprint is one
      // block regardless of corpus size (a lazy union of all blocks would
      // pin every broadcast alive for the single action and re-collect the
      // corpus onto the driver, the exact failure mode this replaces).
      // Per-invocation scratch dir, sweeping prior invocations' dirs for
      // this dataset first: a single fixed path would be deleted MID-USE
      // by the next call (this function backs TWO query names), while
      // never sweeping would accumulate scratch without bound. Net
      // contract — the same one every Formats round-trip has: a NEW call
      // invalidates DataFrames returned by earlier calls on the same
      // dataset, but never a concurrently-open one on another dataset.
      val suffix = graft.sources.Formats.sanitize(dir)
      val root = new org.apache.hadoop.fs.Path(
        graft.sources.Formats.tmp("ann_pairs", dir)).getParent
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // exact-name match, not a glob suffix: one dataset's sanitized
      // suffix can be an underscore-boundary suffix of another's, and a
      // loose glob would sweep the OTHER dataset's live scratch
      val own = ("ann_pairs_[0-9a-f]{8}_" +
        java.util.regex.Pattern.quote(suffix)).r
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(root, "ann_pairs_*")))
        .getOrElse(Array.empty)
        .filter(s => own.pattern.matcher(s.getPath.getName).matches())
        .foreach(s => fs.delete(s.getPath, true))
      val out = graft.sources.Formats.tmp(
        s"ann_pairs_${java.util.UUID.randomUUID().toString.take(8)}", dir)
      (0L until numBlocks).foreach { b =>
        val bc = spark.sparkContext.broadcast(
          q.filter(r => blockOf(r._1) == b).collect())
        try {
          q.mapPartitions { it =>
            val arr = bc.value
            it.flatMap { case (ida, qa, na) =>
              arr.iterator
                .filter(_._1 > ida)
                .flatMap { case (idb, qb, nb) =>
                  val sim = dotQ(qa, qb).toDouble / math.sqrt((na * nb).toDouble)
                  if (sim >= 0.35) Iterator.single((ida, idb, sim)) else Iterator.empty
                }
            }
          }.toDF("vec_a", "vec_b", "sim")
            .write.mode("append").parquet(out)
        } finally bc.destroy()
      }
      spark.read.parquet(out)
    } finally q.unpersist()
  }

  val annPairsBruteforceSql: String =
    s"""WITH v0 AS (
      |  SELECT vec_id, $QuantSql AS qe
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |v AS (
      |  SELECT vec_id, qe FROM v0
      |  WHERE list_sum(list_transform(qe, x -> x * x)) > 0)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  CAST(CAST(list_sum(list_transform(list_zip(a.qe, b.qe), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
      |  / sqrt(CAST(CAST(list_sum(list_transform(a.qe, x -> x * x)) AS BIGINT)
      |              * CAST(list_sum(list_transform(b.qe, x -> x * x)) AS BIGINT) AS DOUBLE)) AS sim
      |FROM v a JOIN v b ON a.vec_id < b.vec_id
      |WHERE CAST(CAST(list_sum(list_transform(list_zip(a.qe, b.qe), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
      |  / sqrt(CAST(CAST(list_sum(list_transform(a.qe, x -> x * x)) AS BIGINT)
      |              * CAST(list_sum(list_transform(b.qe, x -> x * x)) AS BIGINT) AS DOUBLE)) >= 0.35""".stripMargin

  // ---- LSH-bucketed ANN (scale path; hash-family-dependent → rows-only) ----

  val NumPlanes = 8   // bits per table: ~2^8 buckets
  val NumTables = 2   // independent hash tables (multi-table LSH)

  /** Random-hyperplane signatures computed entirely inside one
    * projection: plane weights are deterministic ±1 from
    * xxhash64(table, plane, dim); each table's sign bits are
    * Horner-folded into its bucket id. No explode, no join against a
    * plane table — the naive (posexplode × broadcast-join × two
    * groupBys) form cost three shuffles.
    *
    * All tables' buckets come from the ONE native expression
    * [[graft.functions.HyperplaneBuckets]] (`lsh_buckets`). History of
    * this hot spot: the r2 nested-HOF form paid 16 interpreted
    * `aggregate(zip_with(...))` passes per row (~2 s of the query); the
    * dot_d-against-plane-literals form made the arithmetic codegen'd
    * but cost ~1.7 s of Janino compile for the 16-loop generated-code
    * wall; the native expression does the same bit-identical arithmetic
    * (doc there, pinned in NativeExprSpec + the LSH recall floor)
    * behind one reference-object call.
    *
    * Multi-table recall: 16 bits in one table gave 1921 buckets for
    * 2000 vectors — almost every vector alone, top-1 coverage ~0.3%.
    * Two independent 8-bit tables give ~8 vectors/bucket and a second
    * chance for every miss; a pair collides in ≥1 table with
    * probability 1-(1-p^8)² for per-plane agreement p.
    */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    DotProduct.register(spark)
    val dim = embeddingDim(spark, dir)
    Tables.embeddings(spark, dir)
      // one interpreted pass casts float→double; everything after is
      // codegen'd
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("xd"))
      // coalesce: a NULL embedding must keep its bucket-0 rows (the
      // dot_d fold's otherwise(0) behavior), not vanish from the join
      .select(col("vec_id"),
        posexplode(coalesce(
          call_function("lsh_buckets",
            col("xd"), lit(dim), lit(NumTables), lit(NumPlanes)),
          typedlit(Seq.fill(NumTables)(0L))))
          .as(Seq("table", "bucket")))
  }

  /** Embedding dimensionality, looked up once per dataset (one tiny
    * job) — the LSH plane literals need it at plan time. The memo value
    * carries the SOURCE FINGERPRINT it was computed from (file
    * length+mtime — a couple of FS stats per lookup, no Spark job):
    * the ivf/sem index memos carry the same guard (ADVICE r16), and a
    * stale dim placeholder is the worst of the three — it fails
    * SILENT: lshBuckets would hash every real vector against a
    * 1-dimensional plane family and return wrong-but-plausible buckets
    * forever. The fingerprint makes the tombstone (and a stale
    * populated dim) self-invalidating instead of trusting the calling
    * convention (review r16; same mechanism as Dedup.lshComponentLabels'
    * marker). */
  private val dimCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Int)]()

  /** "absent" when the table does not exist — a stable fingerprint for
    * the not-yet-populated state, distinct from any real file's. */
  private def embSourceFingerprint(spark: SparkSession, dir: String): String =
    try graft.sources.Formats.sourceFingerprint(
      spark.sessionState.newHadoopConf(), dir, "embeddings")
    catch { case _: java.io.FileNotFoundException => "absent" }

  /** The ONE fingerprint-guarded memo implementation all three index
    * memos (dim, IVF centroids, semantic centroids) share, so the two
    * load-bearing rules cannot drift apart per site (review r17): serve
    * a cached value only while the embeddings source fingerprint it was
    * built from still matches, and on mismatch REPLACE via put — never
    * putIfAbsent, which would pin the stale entry forever (the ADVICE
    * r16 bug class). Tombstones for empty/absent sources are memoized
    * like real values (ADVICE r15) and self-invalidate the same way. */
  private def fpMemo[V](
      memo: java.util.concurrent.ConcurrentHashMap[String, (String, V)],
      spark: SparkSession, dir: String)(build: => V): V = {
    val key = graft.sources.Formats.canonicalDir(dir)
    val fp = embSourceFingerprint(spark, dir)
    val cached = memo.get(key)
    if (cached != null && cached._1 == fp) cached._2
    else {
      val built = build
      memo.put(key, (fp, built))
      built
    }
  }

  private def embeddingDim(spark: SparkSession, dir: String): Int =
    fpMemo(dimCache, spark, dir) {
      // skip NULL embeddings: size(NULL) is NULL and getInt would NPE if
      // the arbitrary limit(1) row happened to be a NULL-embedding row
      val head = Tables.embeddings(spark, dir)
        .filter(col("embedding").isNotNull)
        .select(size(col("embedding"))).limit(1).collect()
      // empty (or all-NULL) embeddings: any dim plans fine — no rows
      // ever reach the plane fold, so the hash-family queries return
      // EMPTY with the right schema instead of aborting the battery.
      // The placeholder IS memoized (ADVICE r15) — fingerprint-guarded
      // by fpMemo, so a later population recomputes even without an
      // invalidate call.
      if (head.isEmpty) 1 else head(0).getInt(0)
    }

  /** ANN via LSH buckets: candidates share a bucket; rank candidates by
    * quantized cosine, keep the top-1 neighbour per vector. Approximate
    * by construction (rows-only check — no SQL oracle for the hash
    * family), but the plan shape is the one that survives 100 TB:
    * bucket equi-join, no cross join.
    *
    * Quantization and buckets in ONE projection (r21, guide §2.4): the
    * old form computed the buckets in a SEPARATE embeddings scan
    * ([[lshBuckets]]) and equi-joined it back on vec_id — a second full
    * corpus scan plus a join whose only job was reattaching rows to
    * themselves. Both are per-row functions of the same embedding, so
    * one scan computes (qe, nsq, table, bucket) directly; candidates,
    * sims and the top-1 are row-identical (the old inner join dropped
    * NULL-embedding/zero-norm bucket rows anyway, exactly what the
    * in-line quant filters drop here). [[lshBuckets]] itself stays for
    * bucket-level consumers (OperatorInvariantsSpec pins its shape). */
  def annLshTop1(spark: SparkSession, dir: String): DataFrame = {
    DotProduct.register(spark)
    val dim = embeddingDim(spark, dir)
    val withB = Tables.embeddings(spark, dir)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), quant(col("embedding")).as("qe"),
        transform(col("embedding"), x => x.cast("double")).as("xd"))
      .select(col("vec_id"), col("qe"), normSqL(col("qe")).as("nsq"), col("xd"))
      .filter(col("nsq") > 0)
      .select(col("vec_id"), col("qe"), col("nsq"),
        posexplode(call_function("lsh_buckets",
          col("xd"), lit(dim), lit(NumTables), lit(NumPlanes)))
          .as(Seq("table", "bucket")))
      .repartition(col("vec_id"))
    val pairs = withB.alias("a")
      .join(withB.alias("b"),
        col("a.table") === col("b.table") &&
          col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn"),
        cosinePre(col("a.qe"), col("b.qe"), col("a.nsq"), col("b.nsq")).as("sim"))
      .distinct() // a pair can collide in both tables
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("nn"), col("sim"))
  }

  // ---- IVF ANN (the scale path for low-similarity regimes) ----------------

  val IvfClusters = 32
  val IvfProbes = 20
  private val IvfSampleRows = 2048
  private val IvfIters = 6

  /** dataset dir → quantized coarse-quantizer centroids (cluster, qc,
    * |qc|²). Built ONCE per dataset and cached — the r2 bench showed the
    * in-query MLlib KMeans fit was 9 s of an 82 s suite, rebuilt on every
    * invocation. At scale the index is built offline; this lazy cache is
    * the in-process equivalent.
    */
  private val ivfIndex =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Array[(Int, Array[Long], Long)])]()

  private def ivfCentroids(spark: SparkSession, dir: String): Array[(Int, Array[Long], Long)] =
    // fpMemo (ADVICE r16): the old bare memo relied solely on the
    // invalidateIndexCaches calling convention, so a regeneration that
    // forgot the call crashed on the stale empty tombstone (head of an
    // empty centroid list) or silently served stale centroids
    fpMemo(ivfIndex, spark, dir)(buildCentroids(spark, dir, IvfClusters))

  /** Deterministic sampled-centroid quantizer: a hash-ordered sample of
    * ≤`IvfSampleRows` vectors (one small Spark job, bounded driver
    * memory), then SPHERICAL k-means ON THE DRIVER — 2048×64 doubles ×
    * 32 centroids × 6 iters is ~25 M flops, microseconds next to the
    * multi-job cluster fit it replaces.
    *
    * Spherical (unit-normalized points, mean renormalized each round)
    * because the search metric is COSINE: with unit centroids,
    * |x-c|² = |x|² - 2x·c + 1, so the existing dist2 probe ranking
    * (|c|² - 2x·c) orders centroids by angle regardless of |x| —
    * Euclidean k-means on raw vectors ranks by a metric the search
    * doesn't use (measured: ~5 pts of recall@nprobe on this corpus).
    */
  private def buildCentroids(spark: SparkSession, dir: String,
      kTarget: Int): Array[(Int, Array[Long], Long)] = {
    import spark.implicits._
    def unit(x: Array[Double]): Array[Double] = {
      val n = math.sqrt(x.map(v => v * v).sum)
      if (n == 0.0) x else x.map(_ / n)
    }
    val sample: Array[Array[Double]] = Tables.embeddings(spark, dir)
      .filter(col("embedding").isNotNull) // NULLs can't be sampled points
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
      .limit(IvfSampleRows)
      .select(col("embedding"))
      .as[Array[Float]]
      .collect()
      .map(e => unit(e.map(_.toDouble)))
    // empty (or all-NULL) embeddings: an EMPTY index is the correct one —
    // the assignment closures never run (the mapped dataset is empty
    // too), so the IVF queries return empty with the right schema
    // rather than aborting; a later refresh invalidates via the same
    // per-JVM memo contract as a populated index
    if (sample.isEmpty) return Array.empty
    val k = math.min(kTarget, sample.length)
    val dim = sample.head.length
    var cents = Array.tabulate(k)(i => sample(i).clone())
    for (_ <- 0 until IvfIters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnts = new Array[Int](k)
      sample.foreach { x =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = x(i) - cents(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += x(i); i += 1 }
        cnts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (cnts(c) == 0) cents(c) // empty cluster keeps its centroid
        else unit(Array.tabulate(dim)(i => sums(c)(i) / cnts(c)))
      }
    }
    cents.zipWithIndex.map { case (c, i) =>
      val qc = c.map(x => math.round(x * 1000))
      (i, qc, qc.map(v => v * v).sum)
    }
  }

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the vector
    * space; each query probes its `IvfProbes` nearest centroids and
    * reranks only those clusters' vectors by exact quantized cosine.
    *
    * Why this exists alongside LSH: random-hyperplane LSH concentrates
    * only high-cosine pairs (measured here: with true-best sims of
    * 0.27–0.51, per-plane agreement ≈0.6 makes bucket collisions nearly
    * random — top-1 recall 22/489). LSH is the right tool for near-dup
    * detection (sims ≥0.8); IVF is the general nearest-neighbour path.
    * At 100 TB: centroids are an expression-level broadcast (literals),
    * the assignment is one codegen'd map, candidates shuffle on cluster
    * id — candidates per query ≈ nprobe/k of the corpus, and k grows
    * with corpus size (k ≈ √n keeps both list length and fanout sane),
    * so the 32-key join here is a small-k artifact, not the scale shape.
    *
    * nprobe is tuned to a recall target, as in any IVF deployment. THIS
    * corpus is isotropic (best-neighbour cosine ≈ 0.36, no cluster
    * structure), so the measured recall@1 curve at sf0.001 is brutal —
    * probes 4→0.58, 8→0.74, 16→0.91 of 32 — and hitting the 0.9 floor
    * (AnnRecallSpec) honestly costs probing ~60% of the corpus. On a
    * clustered real corpus the same machinery reaches 0.9 at
    * nprobe/k ≪ 1; the spec pins the floor so plan changes can't trade
    * recall silently.
    *
    * Execution is the inverted-list scan, IVF's native physical shape:
    * assignment/probing is a per-partition primitive loop over the
    * broadcast centroid array (k dot products per vector, top-nprobe by
    * partial sort); candidates shuffle ONCE on cluster id so each
    * partition holds whole inverted lists; rerank is a per-cluster
    * primitive loop (query block × member block). The declarative
    * equi-join form of the same plan measured 1.4 µs/pair at sf0.1
    * (~3.3 s for 2.5 M candidates — per-pair join-row machinery, same
    * finding as annPairsBruteforce's 26 s theta join); the primitive
    * loop does the identical arithmetic in ~0.2 s. mapPartitions is the
    * documented last-resort rung, earned here by measurement. Per-query
    * per-cluster winners (≤ nprobe rows per query) then collapse with a
    * partial-aggregable max(struct(sim, ~nn)) — the (sim desc, nn asc)
    * tie-break as lexicographic struct order (bitwise NOT, the total
    * order-reverser; -nn overflows ANSI on a MinValue id), no window
    * sort.
    *
    * Deterministic (seeded sample order, fixed iteration count); still
    * rows-only for the oracle — cluster boundaries are engine-side state.
    */
  def annIvfTop1(spark: SparkSession, dir: String): DataFrame =
    ivfCandidates(spark, dir, k = 1, queryLimit = None)
      .toDF("vec_id", "nn", "sim")
      .groupBy("vec_id")
      // bitwise NOT, not unary minus, as the order-reverser: ~n is a
      // strictly decreasing TOTAL map on int64 (¬MinValue = MaxValue),
      // while -n overflows ANSI arithmetic on a MinValue id — the
      // extreme-key edge fixture crashes exactly there
      .agg(max(struct(col("sim"), bitwise_not(col("nn")).as("inv_nn"))).as("best"))
      .select(col("vec_id"), bitwise_not(col("best.inv_nn")).as("nn"),
        col("best.sim").as("sim"))

  /** Shared inverted-list machinery behind BOTH IVF queries: assignment
    * + probing over the broadcast centroid array, ONE shuffle on cluster
    * id, then a per-cluster primitive rerank emitting the top-`k`
    * candidates per (query, cluster) through a bounded insertion buffer
    * ((sim desc, id asc) order — `k = 1` degenerates to the single best,
    * so top-1 and top-k cannot drift apart). `queryLimit = None` makes
    * every vector a query (the all-vectors top-1 sweep); `Some(n)`
    * restricts queries to `vec_id < n` (the batch serving shape). The
    * corpus is read ONCE, so quantization is the barrier-free plain
    * projection. Every dot loop guards on min length — a ragged row
    * must degrade like the assignment loop does, not throw. Candidates
    * across clusters are disjoint (each member lives in exactly its
    * primary list), so callers can rank without dedup. Returns
    * (query_id, candidate_id, sim) rows. */
  private def ivfCandidates(spark: SparkSession, dir: String, k: Int,
      queryLimit: Option[Long]): DataFrame = {
    import spark.implicits._
    val bcCents = spark.sparkContext.broadcast(ivfCentroids(spark, dir))
    val probesN = IvfProbes
    // (cluster, is_query, vec_id, qe, nsq): one member row per vector
    // (its primary cluster) + one query row per probed cluster
    val tagged = quantizedPlain(spark, dir).as[(Long, Array[Long], Long)]
      .mapPartitions { it =>
        val cs = bcCents.value
        it.flatMap { case (id, qe, nsq) =>
          val scored = centroidScores(qe, cs)
          val member = Iterator.single((scored.head._2, false, id, qe, nsq))
          val queries =
            if (queryLimit.forall(id < _))
              scored.iterator.take(probesN).map { case (_, c) => (c, true, id, qe, nsq) }
            else Iterator.empty
          member ++ queries
        }
      }
    tagged
      .toDF("cluster", "is_q", "vec_id", "qe", "nsq")
      // ONE exchange on cluster id, then a local sort so the rerank can
      // stream ONE cluster's rows at a time — the same consecutive-group
      // shape dedupSemantic uses. Buffering the whole partition into
      // per-cluster HashMaps (the earlier form) made peak executor
      // memory the SUM of all co-resident inverted lists (+ ~nprobe
      // query copies per vector); under the skewed centroid assignment
      // real corpora have, that is the partition, not the largest list
      // — the opposite of the documented 100 TB story.
      .repartition(col("cluster"))
      .sortWithinPartitions("cluster")
      .as[(Int, Boolean, Long, Array[Long], Long)]
      .mapPartitions { it =>
        val rows = it.buffered
        new Iterator[Iterator[(Long, Long, Double)]] {
          def hasNext: Boolean = rows.hasNext
          def next(): Iterator[(Long, Long, Double)] = {
            // buffer exactly one cluster's members + its probing queries,
            // emit its candidates, release, advance
            val c = rows.head._1
            val ms = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long], Long)]
            val qs = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long], Long)]
            while (rows.hasNext && rows.head._1 == c) {
              val (_, isQ, id, qe, nsq) = rows.next()
              (if (isQ) qs else ms) += ((id, qe, nsq))
            }
            qs.iterator.flatMap { case (qid, qqe, qnsq) =>
              // bounded top-k insertion buffer: (sim desc, id asc) order
              val simB = Array.fill(k)(Double.NegativeInfinity)
              val idB = Array.fill(k)(Long.MaxValue)
              var used = 0
              ms.foreach { case (mid, mqe, mnsq) =>
                // nsq == 0 (a vector that quantized to all zeros) makes the
                // cosine 0/0 = NaN; every comparison against NaN is false,
                // so a NaN entry would be admitted while the buffer fills
                // and could never be displaced — skip zero-norm vectors on
                // either side (cosine is undefined for them)
                if (mid != qid && mnsq > 0L && qnsq > 0L) {
                  val sim = dotQ(qqe, mqe).toDouble / math.sqrt((qnsq * mnsq).toDouble)
                  var pos = used
                  while (pos > 0 && (sim > simB(pos - 1) ||
                    (sim == simB(pos - 1) && mid < idB(pos - 1)))) pos -= 1
                  if (pos < k) {
                    val last = math.min(used, k - 1)
                    var j = last
                    while (j > pos) { simB(j) = simB(j - 1); idB(j) = idB(j - 1); j -= 1 }
                    simB(pos) = sim; idB(pos) = mid
                    if (used < k) used += 1
                  }
                }
              }
              (0 until used).iterator.map(i => (qid, idB(i), simB(i)))
            }
          }
        }.flatten
      }
      .toDF("query_id", "vec_id", "sim")
  }

  /** IVF batch top-k — [[annIvfTop1]]'s machinery serving the realistic
    * request shape: top-10 neighbours for each of the [[BatchQueryCount]]
    * query vectors, probing [[IvfProbes]] inverted lists per query. The
    * exact twin (`ann_topk_batch`) is the accuracy reference:
    * AnnRecallSpec pins recall@10 against it. Two scale properties the
    * top-1 variant doesn't show: (a) per-cluster candidate generation
    * keeps a BOUNDED top-10 per (query, cluster) via a primitive
    * insertion buffer — ≤ nprobe·10 candidate rows per query leave the
    * inverted-list scan, however long the lists are; (b) every member
    * belongs to exactly ONE inverted list (its primary cluster), so
    * per-cluster winners are disjoint and the global per-query rank
    * needs no dedup — a tiny 32-key window over ≤ nprobe·10 rows. */
  def annIvfTopkBatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ivfCandidates(spark, dir, k = 10, queryLimit = Some(BatchQueryCount))
      .withColumn("rk",
        row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("sim").desc, col("vec_id").asc)).cast("long"))
      .filter(col("rk") <= 10)
  }

  // ---- semantic dedup (cluster-then-prune — the 100 TB embedding path) ----

  /** Probed clusters per vector for [[dedupSemantic]]. Fixed and SMALL on
    * purpose: candidate work is P²·N²/(2k), so with k ≈ √N the ratio to
    * the brute-force pair space is P²/√N — shrinking as the corpus
    * grows. Scaling P with k would cancel exactly that advantage. */
  val SemProbes = 4

  /** Cluster count for semantic dedup: k ≈ √N keeps inverted lists at
    * ~√N vectors so per-cluster all-pairs work is ~N per cluster — the
    * standard IVF sizing rule, here applied to pair pruning. (The IVF
    * ANN queries keep their fixed small k: their cost driver is probe
    * fan-out per QUERY, not pair volume per cluster.) */
  private def semClusterCount(n: Long): Int =
    math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)

  private val semIndex =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Array[(Int, Array[Long], Long)])]()

  private def semCentroids(spark: SparkSession, dir: String): Array[(Int, Array[Long], Long)] =
    // same fpMemo tombstone rule as ivfCentroids — see there
    fpMemo(semIndex, spark, dir) {
      val n = Tables.embeddings(spark, dir).count()
      buildCentroids(spark, dir, semClusterCount(n))
    }

  /** Drops every per-dir cached index structure (semantic-dedup
    * centroids, IVF centroids, dimensionality) for `dir` — for harnesses
    * that DELETE AND REGENERATE a corpus at the same path within one JVM
    * (ScaleProbe's planted-duplicate probe overwrites its planted
    * scratch dir per source dataset): without the drop, a second probe
    * over the same source would pair a fresh corpus with the first
    * run's cached centroids. The normal testdata dirs are immutable
    * within a JVM, so ordinary queries never need this. */
  def invalidateIndexCaches(dir: String): Unit = {
    val key = graft.sources.Formats.canonicalDir(dir)
    semIndex.remove(key)
    ivfIndex.remove(key)
    dimCache.remove(key)
  }

  /** Targeted drops for Bench's re-run memo contract (BASELINE.md §f):
    * in the full alphabetical battery, `ann_ivf_top1` (first query of
    * the run) builds the IVF centroid index inside its timed pass —
    * and ONLY that: nothing on its path calls [[embeddingDim]];
    * `ann_lsh_top1` is the first (and among queries, only) consumer of
    * the dim lookup, so ITS pass 1 pays that cold limit(1) job;
    * `dedup_semantic` builds the ~√N-centroid index (sole consumer).
    * A re-run must pay the same build, not a cache hit — each drops
    * exactly what its own first pass found absent, nothing more (the
    * topk/batch queries saw warm caches in pass 1 and re-run against
    * warm caches unchanged). An earlier revision had invalidateIvfCaches
    * also drop dimCache while no re-run path dropped it for
    * ann_lsh_top1 — a no-op for the IVF query and a falsely-rescuing
    * warm cache for a smeared LSH re-run. */
  def invalidateIvfCaches(dir: String): Unit = {
    ivfIndex.remove(graft.sources.Formats.canonicalDir(dir))
    ()
  }

  def invalidateDimCache(dir: String): Unit = {
    dimCache.remove(graft.sources.Formats.canonicalDir(dir))
    ()
  }

  def invalidateSemCache(dir: String): Unit = {
    semIndex.remove(graft.sources.Formats.canonicalDir(dir))
    ()
  }

  /** Semantic (embedding-cluster) near-dup pairs — the bucketed
    * cluster-then-prune twin of [[annPairsBruteforce]]'s tiled all-pairs
    * scan (registered as `dedup_embedding_cosine`), the shape that
    * survives 100 TB: each vector is assigned to its [[SemProbes]]
    * nearest of ~√N spherical-k-means centroids, candidates shuffle ONCE
    * on cluster id, and exact quantized cosine is computed only WITHIN a
    * cluster's inverted list by the same primitive loop the IVF rerank
    * uses. A pair that shares several probed clusters is emitted once
    * per shared cluster with BIT-IDENTICAL sim (integer dot + one IEEE
    * divide), so the closing `distinct` is exact, not a tolerance hack.
    *
    * Precision is 1 by construction — every emitted pair carries its
    * exactly-computed sim and the same 0.35 threshold as the exact twin,
    * so output ⊆ exact output (DedupSemanticSpec pins the subset).
    * Recall is the multi-probe collision rate: a pair is found iff the
    * two probe sets intersect. THIS corpus is deliberately isotropic
    * (every near-dup pair sits at cos 0.35–0.5, 60–69° apart — there is
    * no cluster structure to exploit, same adversarial corner as the
    * IVF recall note above), and on such weakly-correlated directions
    * the collision rate is ≈ 1−(1−P/k)^P ≈ P²/k, so recall DECAYS
    * ~1/√N as k grows with √N — measured: ≥0.85 at sf0.001 (the spec
    * floor, k=15), 0.77 at sf0.1 (k=45), 0.44 at sf1 (k=142). That
    * decay is the designed trade, not a defect: holding recall flat on
    * an isotropic corpus requires P² ∝ k, which algebraically cancels
    * the entire P²N²/2k advantage — low-cosine isotropic pairs are
    * indistinguishable from non-pairs without near-exhaustive probing.
    * The operational claim is different and measured separately:
    * WITHIN each scale, recall rises with the pair's cosine
    * (ScaleProbe's stratified bands), because closer directions agree
    * on their nearest centroids more often — and real semantic
    * duplicates live at cos ≥ 0.9, where both sides' probe sets
    * coincide: ScaleProbe's planted-duplicate probe (1% of vectors
    * copied at cos ≈ 0.99) measures recall 1.000 at BOTH sf0.1 and
    * sf1. Use this operator for high-threshold semantic dedup; use
    * the exact tiled twin (or LSH) when the threshold must reach down
    * into the isotropic band.
    *
    * At 100 TB: centroids are a bounded driver-side build (offline in a
    * real deployment), assignment is one codegen-adjacent partition-local
    * pass, and the only exchange carries P rows per vector keyed by
    * cluster — work P²N²/2k ≈ P²·N^1.5 with the k ≈ √N sizing, vs N²/2
    * for the exact twin. Hash-family/k-means-init dependent → rows-only
    * for the oracle, like the LSH/IVF queries.
    */
  def dedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bcCents = spark.sparkContext.broadcast(semCentroids(spark, dir))
    val probesN = SemProbes
    val probed = quantizedPlain(spark, dir).as[(Long, Array[Long], Long)]
      .mapPartitions { it =>
        val cs = bcCents.value
        it.flatMap { case (id, qe, nsq) =>
          centroidScores(qe, cs).iterator
            .take(probesN).map { case (_, c) => (c, id, qe, nsq) }
        }
      }
    probed
      .toDF("cluster", "vec_id", "qe", "nsq")
      // ONE exchange on cluster id; the local sort costs no shuffle and
      // lets the pair loop stream cluster-by-cluster, so peak executor
      // memory is the single LARGEST inverted list — not the sum of all
      // lists co-resident in a partition, which under skewed centroid
      // assignment (real corpora cluster; only this synthetic one is
      // isotropic) could be the whole partition
      .repartition(col("cluster"))
      .sortWithinPartitions("cluster")
      .as[(Int, Long, Array[Long], Long)]
      .mapPartitions { it =>
        val rows = it.buffered
        // consecutive-group iteration over the cluster-sorted stream:
        // buffer exactly one cluster's inverted list, emit its pairs,
        // release, advance
        new Iterator[Iterator[(Long, Long, Double)]] {
          def hasNext: Boolean = rows.hasNext
          def next(): Iterator[(Long, Long, Double)] = {
            val c = rows.head._1
            val ms = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long], Long)]
            while (rows.hasNext && rows.head._1 == c) {
              val (_, id, qe, nsq) = rows.next()
              ms += ((id, qe, nsq))
            }
            val arr = ms.toArray
            (0 until arr.length).iterator.flatMap { i =>
              val (ida, qa, na) = arr(i)
              (i + 1 until arr.length).iterator.flatMap { j =>
                val (idb, qb, nb) = arr(j)
                // zero-norm vectors: cosine undefined (0/0) — skip, matching
                // the exact twin's behavior (its sim is NaN ≱ 0.35)
                if (ida == idb || na == 0L || nb == 0L) Iterator.empty
                else {
                  val sim = dotQ(qa, qb).toDouble / math.sqrt((na * nb).toDouble)
                  if (sim >= 0.35)
                    Iterator.single((math.min(ida, idb), math.max(ida, idb), sim))
                  else Iterator.empty
                }
              }
            }
          }
        }.flatten
      }
      .toDF("vec_a", "vec_b", "sim")
      .distinct()
  }

  // ---- registry ------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_bruteforce" -> (annTopkBruteforce _),
    "ann_topk_batch" -> (annTopkBatch _),
    "ann_pairs_bruteforce" -> (annPairsBruteforce _),
    // the brief's "embedding-cosine near-dup" dedup method IS the
    // thresholded all-pairs cosine — registered under the dedup name so
    // the coverage mapping is explicit
    "dedup_embedding_cosine" -> (annPairsBruteforce _),
    "ann_lsh_top1" -> (annLshTop1 _),
    "ann_ivf_top1" -> (annIvfTop1 _),
    "ann_ivf_topk" -> (annIvfTopkBatch _),
    "dedup_semantic" -> (dedupSemantic _))

  val oracles: Map[String, String] = Map(
    "ann_topk_bruteforce" -> annTopkBruteforceSql,
    "ann_topk_batch" -> annTopkBatchSql,
    "ann_pairs_bruteforce" -> annPairsBruteforceSql,
    "dedup_embedding_cosine" -> annPairsBruteforceSql)
}
