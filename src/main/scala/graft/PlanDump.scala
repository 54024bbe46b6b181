package graft

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for the headline queries into PLANS.md —
  * the plan-audit artifact. Regenerate after plan-shape changes:
  *   sbt "runMain graft.PlanDump"
  */
object PlanDump {

  val Headliners: Seq[(String, String)] = Seq(
    "wordcount" -> "flagship: tokenize → partial agg → shuffle → final agg; no UDFs, one shuffle",
    "q1_pricing_summary" -> "multi-agg with filter pushed to the parquet scan (PushedFilters)",
    "q_tpch_q3" -> "3-way join: filters at scans, broadcast/SMJ selection by size, TakeOrderedAndProject",
    "q_tpch_q5" -> "6-table join graph with a cycle (c_nationkey = s_nationkey): dims broadcast, facts shuffle on keys",
    "q_join_broadcast" -> "star join: both dimensions broadcast, fact side never shuffles pre-agg",
    "q_join_sortmerge" -> "fact-fact equi-join: shuffle on join key both sides, then SMJ",
    "dedup_near_jaccard" -> "shingle sets materialized once behind an exchange; pair join on shingle",
    "dedup_minhash_lsh" -> "minhash signatures as one projection; banded bucket join; exact verify",
    "ann_lsh_top1" -> "LSH buckets in one projection; bucket equi-join; codegen'd dot_l cosine",
    "ann_topk_batch" -> "batch ANN: broadcast query set, shuffle-free scoring scan, partial WindowGroupLimit prunes to top-10 per query BEFORE the exchange",
    "dedup_simhash_pairs" -> "SimHash pigeonhole: 4 banks exploded, equi-join on (bank, value), exact bit_count filter — no all-pairs",
    "ann_ivf_top1" -> "IVF inverted-list scan: primitive-loop assignment over broadcast centroids, one shuffle on cluster id, per-cluster rerank, partial-aggregable max(struct) top-1",
    "text_stats" -> "single scan, all stats codegen'd (count_in native expression + array_join; no interpreted HOF passes)",
    "q_grouping_sets" -> "GROUPING SETS via Expand: one scan fans out to the three grouping sets before one shuffle",
    "q_lateral" -> "correlated LATERAL subquery decorrelated by Catalyst into partial WindowGroupLimit + broadcast join — no per-row loop",
    "q_join_outer" -> "left-outer join with null-side aggregation: count(o_orderkey) skips the null side",
    "lines_wordcount" -> "wordcount through the DSv2 lines connector (BatchScan graft_lines, one partition per file)",
    "events_sessions" -> "session_window merging aggregation, one shuffle on user_id",
    "fmt_partition_pruning" -> "partitioned read: predicate under PartitionFilters (directory pruning)",
    "q_pivot" -> "pivot with explicit values: two-phase pivot aggregate (partial sum on (nation,status), PivotFirst gather) — no values-discovery job, no Expand",
    "dedup_decontaminate" -> "decontamination: eval shingle dim distinct-reduced then BROADCAST; training side's only exchange is the per-doc count agg (map-side partials collapse each doc first)",
    "dedup_fuzzy_names" -> "SymSpell fuzzy match: position-tagged deletion-key equi-joins (exact — no cross join, no per-candidate verify), levenshtein only as an output projection",
    "events_resample" -> "gap-fill: per-user grid via sequence+explode, left join hourly agg, LOCF via last(ignoreNulls) over running ROWS frame — one shuffle on user_id",
    "maint_upsert" -> "CDC apply: delta keys BROADCAST into the anti-join — the 100 TB base never shuffles; union with updates and inserts",
    "q_bloom_join" -> "runtime bloom filter: might_contain(bloom_filter_agg subquery over urgent orders) prunes the lineitem side BEFORE its exchange",
    "text_bm25" -> "BM25: tf/df aggregations filtered to the query terms BEFORE their exchanges, df/avgdl/N broadcast, decimal-domain per-term rounding then exact decimal sum",
    "q_ntile" -> "distribution-rank windows partitioned by nation: ONE shuffle on the partition key, per-partition sort — no global single-partition window",
    "q_range_join_dense" -> "2100-band interval join: preCBO rewrite + RangeLookupJoinExec (binary search over broadcast sorted intervals) replaces the O(n*m) BroadcastNestedLoopJoin",
    "events_retention" -> "cohort retention: events collapse to distinct user-days (partial agg before the one big exchange), cohort firsts BROADCAST back, final agg distinct-free",
    "text_inverted_index" -> "inverted index: ONE exchange — collect_set is the partial aggregate (map-side set union = per-partition distinct), df = set size; no separate distinct pass",
    "events_outliers" -> "3-sigma outliers: exact decimal Σx/Σx² partially aggregated to event-type cardinality, stats BROADCAST back over the second scan — deterministic thresholds at any partition order")

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same extension route as Smoke/Verify/Bench — the dumped plans
      // must be the plans production sessions run (incl. the injected
      // preCBO interval-join rewrite)
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of headline queries\n\n")
    sb.append("Generated by `sbt \"runMain graft.PlanDump\"` at sf0.001 ")
    sb.append("(plan shapes are scale-invariant; AQE final plans can differ at runtime).\n")

    Headliners.foreach { case (name, note) =>
      // q_bloom_join materializes to scratch inside its conf window (the
      // gated entry returns the read-back) — dump the join plan itself,
      // with optimization AND physical planning under the same confs the
      // query executes with
      val plan = if (name == "q_bloom_join")
        graft.engine.Tables.withConfs(spark,
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
          "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB") {
          graft.operators.Relational.bloomJoinPlan(spark, dir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
        }
      else SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n_${note}_\n\n```\n")
      // keep the operator tree + scan details; drop the long codegen ids
      sb.append(plan.take(6000))
      if (plan.length > 6000) sb.append("\n… (truncated)\n")
      sb.append("```\n")
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println(s"[plandump] wrote PLANS.md (${Headliners.size} plans)")
    spark.stop()
  }
}
