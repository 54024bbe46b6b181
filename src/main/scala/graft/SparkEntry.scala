package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Extensibility
import graft.operators.{Dedup, Events, Maintenance, Multimodal, Relational, Similarity, TextAnalysis, WordCount}
import graft.sources.{Formats, Lines}
import graft.streaming.StreamingWindows

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator registry; each entry with a
  * matching `oracleSql` is hash-compared against DuckDB on the same
  * parquet tables by the driver's Verify run. Entries without SQL
  * (hash-family-dependent ops like SimHash / LSH-ANN) get a rows-only
  * check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's entire data plane as one declarative Spark plan
    * (reference: src/worker.py:55-139).
    */
  def entry(spark: SparkSession): DataFrame =
    WordCount.wordcount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Lazy val,
    * not def: the registries are immutable after class load, and Bench
    * re-reads this map per smear re-run / warmup while ScaleProbe reads
    * it once per probe per dir — a def would re-merge ~170 entries
    * across 12 maps on every one of those calls. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    WordCount.queries ++
      Relational.queries ++
      TextAnalysis.queries ++
      Dedup.queries ++
      Similarity.queries ++
      Events.queries ++
      Maintenance.queries ++
      Multimodal.queries ++
      Formats.queries ++
      Lines.queries ++
      Extensibility.queries ++
      StreamingWindows.queries

  /** The queries that deliberately have NO DuckDB oracle — each is a
    * hash-family / sketch op whose exact output depends on an algorithm
    * DuckDB cannot replay (murmur seeds, HLL++/GK/Misra–Gries sketches,
    * k-means init), so the driver records a rows-only check and a
    * dedicated ScalaTest spec hard-bounds each one.
    *
    * SINGLE SOURCE OF TRUTH: WordCountSpec asserts
    * `queries.keySet -- oracleSql.keySet === rowsOnly`, so registering a
    * query without an oracle fails exactly one clearly-named assertion
    * until it is either given SQL or documented here.
    */
  val rowsOnly: Set[String] = Set(
    // dedup_simhash / dedup_simhash_pairs left this set in r20 (md5
    // fingerprint hash — the primitive both engines share); so did
    // dedup_components_lsh (its edges ARE dedup_minhash_lsh's pair set,
    // which hash-matches the exact pairs, so the exact components
    // oracle applies — Dedup.oracles for both derivations).
    "dedup_sketch_sources", // SketchAccuracySpec: union estimate within 0.3 of exact Jaccard
    "ann_lsh_top1",         // AnnRecallSpec: recall@1 >= 0.9
    "ann_ivf_top1",         // AnnRecallSpec: recall@1 >= 0.9
    "ann_ivf_topk",         // AnnRecallSpec: batch recall@10 >= 0.9
    "dedup_semantic",       // DedupSemanticSpec: subset of exact twin + recall floor
    "q_approx_distinct",    // ApproxDistinctSpec: HLL++ error bound
    "q_approx_percentiles", // GK sketch — ApproxDistinctSpec bound
    "text_heavy_hitters",   // Misra–Gries — superset+bound spec
    "maint_profile_approx", // ProfileApproxSpec: non-NDV cols exact, NDV in HLL++ bound, no Expand
    "maint_sketch_rollup")  // DataSketches HLL — SketchRollupSpec bound + merge property
    // wordcount_ptb also left this set in r20: the PTB chain is now
    // EMITTED into DuckDB SQL from the same rule arrays the engine
    // compiles (TokenizePtbFn.OracleTokensSql) — full hash oracle; the
    // golden corpus run (PtbTokenizerSpec, 619685/21364) still pins the
    // chain against the independent Python twin.

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * (Lazy for the same reason as [[queries]].)
    */
  lazy val oracleSql: Map[String, String] =
    WordCount.oracles ++
      Relational.oracles ++
      TextAnalysis.oracles ++
      Dedup.oracles ++
      Similarity.oracles ++
      Events.oracles ++
      Maintenance.oracles ++
      Multimodal.oracles ++
      Formats.oracles ++
      Lines.oracles ++
      Extensibility.oracles ++
      StreamingWindows.oracles
}
