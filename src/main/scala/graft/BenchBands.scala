package graft

/** Checked-in per-query median timings (seconds) used by [[Bench]] to
  * adjudicate host steals: this rig randomly smears single runs by
  * 4-20x (BENCH_r06: 18 s on a 0.85 s-median query; BENCH_r09: 6.4 s
  * twice on 1.3 s-median q_tpch_q18), and an absolute cutoff cannot
  * tell a smeared cheap query from a genuinely expensive one. The
  * medians below are per-query medians of a recorded three-run trio at
  * sf0.1 / local[32] on this host, on the same code family that ships
  * them (round-11 trio, adjudicated totals 126.6 / 141.7 / 149.4 s
  * over 168 queries; provenance: BASELINE.md §f). They parameterize
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
    "ann_ivf_top1" -> 1.530, "ann_ivf_topk" -> 0.694, "ann_lsh_top1" -> 1.368,
    "ann_pairs_bruteforce" -> 1.887, "ann_topk_batch" -> 0.573, "ann_topk_bruteforce" -> 0.412,
    "curation_e2e" -> 0.776, "dedup_chunks" -> 1.216, "dedup_components" -> 1.482,
    "dedup_decontaminate" -> 0.704, "dedup_embedding_cosine" -> 1.203, "dedup_exact" -> 0.328,
    "dedup_fuzzy_names" -> 2.549, "dedup_incremental" -> 0.616, "dedup_minhash_lsh" -> 1.291,
    // provisional focused-run value for the r12 addition — replaced by
    // the r12 full-battery trio below like everything else
    "dedup_components_lsh" -> 2.5,
    "dedup_near_jaccard" -> 0.099, "dedup_ngram_exact" -> 0.991, "dedup_semantic" -> 1.180,
    "dedup_simhash" -> 1.127, "dedup_simhash_pairs" -> 1.651, "dedup_sketch_sources" -> 0.868,
    "dedup_survivors" -> 0.235, "doc_mixture_weights" -> 0.480, "doc_pack_shards" -> 0.616,
    "doc_resample" -> 0.585, "doc_sample_per_source" -> 0.299, "doc_sample_split" -> 0.163,
    "doc_sample_stratified" -> 0.134, "doc_shuffle_shards" -> 0.996, "doc_stable_ids" -> 0.265,
    "events_asof" -> 0.456, "events_asof_forward" -> 0.322, "events_daily_active" -> 0.572,
    "events_funnel" -> 0.876, "events_histogram" -> 0.256, "events_hourly" -> 0.476,
    "events_json_kv" -> 0.649, "events_lead_lag" -> 0.507, "events_map_fns" -> 0.626,
    "events_outliers" -> 0.465, "events_pivot" -> 0.443, "events_resample" -> 1.806,
    "events_retention" -> 0.536, "events_sessions" -> 0.794, "events_sliding" -> 0.371,
    "events_transitions" -> 0.722, "events_variant" -> 0.612, "events_wau" -> 0.773,
    "events_window_time_range" -> 1.143, "fmt_binary" -> 0.163, "fmt_csv_roundtrip" -> 0.507,
    "fmt_dynamic_overwrite" -> 1.595, "fmt_file_lineage" -> 0.631, "fmt_jdbc_roundtrip" -> 1.614,
    "fmt_json_corrupt" -> 0.586, "fmt_json_roundtrip" -> 0.692, "fmt_orc_roundtrip" -> 1.406,
    "fmt_partition_pruning" -> 0.535, "fmt_schema_evolution" -> 0.902, "fmt_xml_roundtrip" -> 0.864,
    "lines_provenance" -> 0.925, "lines_roundtrip" -> 0.664, "lines_wordcount" -> 0.403,
    // medians from their own focused trios (queries added after the
    // full-battery trio; 2.175/2.434/2.066, 2.194/2.619/2.294 and
    // 2.856/2.563/2.723 s) — see §f
    "maint_bloom_index" -> 2.175, "maint_sketch_rollup" -> 2.294,
    "maint_recompress" -> 2.723,
    "maint_cluster" -> 2.267, "maint_compact" -> 2.703, "maint_delete_vector" -> 0.662,
    "maint_dq_audit" -> 1.183, "maint_incremental_agg" -> 0.838, "maint_profile" -> 2.595,
    "maint_scd2" -> 0.461, "maint_upsert" -> 0.470, "maint_zorder" -> 2.462,
    "mm_decode" -> 0.288, "mm_frame_sample" -> 0.139, "mm_metadata" -> 0.129,
    "mm_resize" -> 0.202, "q1_pricing_summary" -> 0.736, "q_approx_distinct" -> 0.407,
    "q_approx_percentiles" -> 0.934, "q_bloom_join" -> 1.097, "q_bucketed_join" -> 0.585,
    "q_case_agg" -> 0.294, "q_cogroup_reconcile" -> 0.942, "q_cube" -> 0.529,
    "q_date_fns" -> 0.391, "q_distinct_agg" -> 0.743, "q_exists_subquery" -> 0.284,
    "q_global_sort" -> 0.260, "q_grouping_id" -> 0.904, "q_grouping_sets" -> 0.676,
    "q_having" -> 0.569, "q_join_anti" -> 0.606, "q_join_anti_nullaware" -> 1.303,
    "q_join_broadcast" -> 0.529, "q_join_full_outer" -> 0.416, "q_join_outer" -> 0.722,
    "q_join_semi" -> 0.392, "q_join_sortmerge" -> 1.312, "q_lateral" -> 0.554,
    "q_math_fns" -> 0.952, "q_ntile" -> 0.370, "q_null_fns" -> 0.286,
    "q_percentiles" -> 0.572, "q_pivot" -> 0.869, "q_range_join" -> 0.915,
    "q_range_join_dense" -> 1.079, "q_rollup" -> 0.577, "q_scalar_subquery" -> 0.298,
    "q_setops" -> 0.684, "q_setops_all" -> 0.817, "q_sql_interface" -> 1.086,
    "q_stats_agg" -> 0.600, "q_string_fns" -> 0.180, "q_topk" -> 0.210,
    "q_tpch_q10" -> 0.895, "q_tpch_q13" -> 0.785, "q_tpch_q14" -> 0.499,
    "q_tpch_q15" -> 0.894, "q_tpch_q17" -> 0.774, "q_tpch_q18" -> 1.230,
    "q_tpch_q19" -> 0.427, "q_tpch_q21" -> 1.167, "q_tpch_q22" -> 0.584,
    "q_tpch_q3" -> 0.825, "q_tpch_q5" -> 1.054, "q_tpch_q6" -> 0.233,
    "q_tpch_q7" -> 0.871, "q_tpch_q8" -> 1.153, "q_unpivot" -> 0.534,
    "q_window_range" -> 0.286, "q_window_running" -> 0.253, "q_window_topn" -> 0.223,
    "stream_dedup" -> 1.194, "stream_enrich" -> 1.152, "stream_hourly" -> 0.964,
    "stream_hourly_append" -> 1.317, "stream_retention_tws" -> 1.384, "stream_sessions" -> 1.476,
    "stream_sessions_append" -> 1.814, "stream_sessions_stateful" -> 1.066, "stream_sliding" -> 0.897,
    "stream_stream_join" -> 1.813, "stream_upsert" -> 1.433, "stream_user_totals" -> 0.763,
    "stream_user_totals_tws" -> 0.932, "text_array_fns" -> 0.333, "text_bigrams" -> 0.900,
    "text_bm25" -> 0.887, "text_fingerprint" -> 0.291, "text_heavy_hitters" -> 0.327,
    "text_inverted_index" -> 0.462, "text_langid" -> 0.361, "text_lm_score" -> 1.168,
    "text_normalize" -> 0.456, "text_quality_filter" -> 0.255, "text_redact" -> 0.207,
    "text_repetition" -> 0.840, "text_stats" -> 0.235, "text_tfidf" -> 1.065,
    "text_token_count" -> 0.242, "text_top_terms" -> 0.344, "text_vocab_oov" -> 0.534,
    "udaf_richest_per_nation" -> 0.217, "udf_vowel_ratio" -> 0.162, "wordcount" -> 0.165,
    "wordcount_bucketed" -> 0.203, "wordcount_ptb" -> 0.856, "wordcount_salted" -> 0.341
  )
}
