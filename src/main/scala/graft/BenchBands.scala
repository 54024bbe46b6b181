package graft

/** Checked-in per-query median timings (seconds) used by [[Bench]] to
  * adjudicate host steals: this rig randomly smears single runs by
  * 4-20x (BENCH_r06: 18 s on a 0.85 s-median query; BENCH_r09: 6.4 s
  * twice on 1.3 s-median q_tpch_q18), and an absolute cutoff cannot
  * tell a smeared cheap query from a genuinely expensive one. The
  * medians below are per-query medians of a recorded three-run trio at
  * sf0.1 / local[32] on this host, on the same code family that ships
  * them (round-12 full-battery trio, adjudicated totals
  * 161.3 / 147.5 / 148.4 s over 172 queries — replacing the r11 trio
  * AND its three focused mini-trio entries with full-JVM-context
  * medians; the one later addition, maint_profile_approx, is banded
  * from the round-12 CLOSING full-battery trio; provenance:
  * BASELINE.md §f). They parameterize
  * the re-run band only — they are never reported as results, so a
  * stale entry can cause a wasted (or missed) re-run, never a wrong
  * number. BenchBandsSpec pins the map to the live query battery.
  */
object BenchBands {

  /** Re-run threshold: beyond twice the recorded median (floored at
    * 1 s so sub-second jitter never triggers a re-run), or 3 s
    * absolute for a query added after the recorded trio.
    */
  def smearThresholdSec(name: String): Double =
    medianSec.get(name).map(m => math.max(2.0 * m, 1.0)).getOrElse(3.0)

  val medianSec: Map[String, Double] = Map(
    "ann_ivf_top1" -> 2.165, "ann_ivf_topk" -> 0.966, "ann_lsh_top1" -> 1.619,
    "ann_pairs_bruteforce" -> 2.294, "ann_topk_batch" -> 0.660, "ann_topk_bruteforce" -> 0.495,
    "curation_e2e" -> 0.922, "dedup_chunks" -> 1.267, "dedup_components" -> 2.399,
    "dedup_components_lsh" -> 4.048, "dedup_decontaminate" -> 0.726, "dedup_embedding_cosine" -> 1.565,
    "dedup_exact" -> 0.355, "dedup_fuzzy_names" -> 2.996, "dedup_incremental" -> 0.609,
    "dedup_minhash_lsh" -> 1.092, "dedup_near_jaccard" -> 0.104, "dedup_ngram_exact" -> 1.088,
    "dedup_semantic" -> 1.047, "dedup_simhash" -> 1.089, "dedup_simhash_pairs" -> 1.629,
    "dedup_sketch_sources" -> 0.829, "dedup_survivors" -> 0.228, "doc_mixture_weights" -> 0.538,
    "doc_pack_shards" -> 0.487, "doc_resample" -> 0.568, "doc_sample_per_source" -> 0.296,
    "doc_sample_split" -> 0.135, "doc_sample_stratified" -> 0.139, "doc_shuffle_shards" -> 1.049,
    "doc_stable_ids" -> 0.280, "events_asof" -> 0.503, "events_asof_forward" -> 0.313,
    "events_daily_active" -> 0.530, "events_funnel" -> 0.934, "events_histogram" -> 0.276,
    "events_hourly" -> 0.498, "events_json_kv" -> 0.656, "events_lead_lag" -> 0.446,
    "events_map_fns" -> 0.613, "events_outliers" -> 0.466, "events_pivot" -> 0.431,
    "events_resample" -> 1.704, "events_retention" -> 0.625, "events_sessions" -> 0.824,
    "events_sliding" -> 0.394, "events_transitions" -> 0.803, "events_variant" -> 0.580,
    "events_wau" -> 0.861, "events_window_time_range" -> 1.124, "fmt_binary" -> 0.155,
    "fmt_csv_roundtrip" -> 0.593, "fmt_dynamic_overwrite" -> 1.580, "fmt_file_lineage" -> 0.576,
    "fmt_jdbc_roundtrip" -> 1.505, "fmt_json_corrupt" -> 0.444, "fmt_json_roundtrip" -> 0.558,
    "fmt_orc_roundtrip" -> 1.151, "fmt_partition_pruning" -> 0.503, "fmt_schema_evolution" -> 0.834,
    "fmt_xml_roundtrip" -> 0.755, "lines_provenance" -> 0.864, "lines_roundtrip" -> 0.563,
    "lines_wordcount" -> 0.355, "maint_bloom_index" -> 1.428, "maint_cluster" -> 1.608,
    "maint_compact" -> 2.636, "maint_delete_vector" -> 0.635, "maint_dq_audit" -> 1.073,
    "maint_incremental_agg" -> 0.812,
    // STALE-HIGH: recorded on the pre-split one-aggregate shape; the
    // shipped zero-sort split measures ~2.1 s in full-battery context
    // (final-gate run, §f) — refresh with the r13 trio
    "maint_profile" -> 6.692,
    // median of the r12 CLOSING full-battery trio (1.227/2.155/1.349 s)
    // — the query landed after the band trio, but its median still
    // comes from full-battery JVM context, not an isolated mini-trio
    "maint_profile_approx" -> 1.349,
    "maint_recompress" -> 1.986,
    "maint_scd2" -> 0.469, "maint_sketch_rollup" -> 1.180, "maint_upsert" -> 0.450,
    "maint_zorder" -> 2.496, "mm_decode" -> 0.265, "mm_frame_sample" -> 0.171,
    "mm_metadata" -> 0.148, "mm_resize" -> 0.205, "q1_pricing_summary" -> 0.916,
    "q_approx_distinct" -> 0.983, "q_approx_percentiles" -> 0.943, "q_bloom_join" -> 1.338,
    "q_bucketed_join" -> 0.660, "q_case_agg" -> 0.325, "q_cogroup_reconcile" -> 0.974,
    "q_cube" -> 0.521, "q_date_fns" -> 0.373, "q_distinct_agg" -> 0.736,
    "q_exists_subquery" -> 0.280, "q_global_sort" -> 0.235, "q_grouping_id" -> 0.937,
    "q_grouping_sets" -> 0.498, "q_having" -> 0.468, "q_join_anti" -> 0.660,
    "q_join_anti_nullaware" -> 1.242, "q_join_broadcast" -> 0.559, "q_join_full_outer" -> 0.423,
    "q_join_outer" -> 0.796, "q_join_semi" -> 0.360, "q_join_sortmerge" -> 1.413,
    "q_lateral" -> 0.557, "q_math_fns" -> 0.808, "q_ntile" -> 0.503,
    "q_null_fns" -> 0.437, "q_percentiles" -> 0.582, "q_pivot" -> 0.815,
    "q_range_join" -> 0.978, "q_range_join_dense" -> 0.902, "q_rollup" -> 0.428,
    "q_scalar_subquery" -> 0.332, "q_setops" -> 0.668, "q_setops_all" -> 0.810,
    "q_sql_interface" -> 0.909, "q_stats_agg" -> 0.383, "q_string_fns" -> 0.149,
    "q_topk" -> 0.149, "q_tpch_q10" -> 0.789, "q_tpch_q13" -> 0.622,
    "q_tpch_q14" -> 0.412, "q_tpch_q15" -> 0.624, "q_tpch_q17" -> 0.527,
    "q_tpch_q18" -> 1.137, "q_tpch_q19" -> 0.376, "q_tpch_q21" -> 1.052,
    "q_tpch_q22" -> 0.613, "q_tpch_q3" -> 0.775, "q_tpch_q5" -> 1.147,
    "q_tpch_q6" -> 0.245, "q_tpch_q7" -> 1.036, "q_tpch_q8" -> 1.061,
    "q_unpivot" -> 0.502, "q_window_range" -> 0.333, "q_window_running" -> 0.283,
    "q_window_topn" -> 0.262, "stream_dedup" -> 1.199, "stream_enrich" -> 1.136,
    "stream_hourly" -> 0.965, "stream_hourly_append" -> 1.611, "stream_retention_tws" -> 1.478,
    "stream_sessions" -> 1.617, "stream_sessions_append" -> 3.241, "stream_sessions_stateful" -> 1.409,
    "stream_sliding" -> 1.294, "stream_stream_join" -> 2.377, "stream_upsert" -> 1.671,
    "stream_user_totals" -> 1.133, "stream_user_totals_tws" -> 1.189, "text_array_fns" -> 0.335,
    "text_bigrams" -> 0.817, "text_bm25" -> 1.031, "text_fingerprint" -> 0.311,
    "text_heavy_hitters" -> 0.403, "text_inverted_index" -> 0.536, "text_langid" -> 0.415,
    "text_lm_score" -> 1.523, "text_normalize" -> 0.471, "text_quality_filter" -> 0.260,
    "text_redact" -> 0.259, "text_repetition" -> 0.950, "text_stats" -> 0.213,
    "text_tfidf" -> 1.242, "text_token_count" -> 0.281, "text_top_terms" -> 0.432,
    "text_vocab_oov" -> 0.713, "udaf_richest_per_nation" -> 0.283, "udf_vowel_ratio" -> 0.189,
    "wordcount" -> 0.191, "wordcount_bucketed" -> 0.236, "wordcount_ptb" -> 0.856,
    "wordcount_salted" -> 0.396
  )
}
