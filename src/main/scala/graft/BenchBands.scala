package graft

/** Checked-in per-query median timings (seconds) used by [[Bench]] to
  * adjudicate host steals: this rig randomly smears single runs by
  * 4-20x (BENCH_r06: 18 s on a 0.85 s-median query; BENCH_r09: 6.4 s
  * twice on 1.3 s-median q_tpch_q18), and an absolute cutoff cannot
  * tell a smeared cheap query from a genuinely expensive one. The
  * medians below are per-query medians of a recorded three-run trio at
  * sf0.1 / local[32] on this host, on the same code family that ships
  * them (the round-14 CLOSING full-battery trio over all 173 queries —
  * recorded on the true final code, AFTER the round's latent-defect
  * sweep reworked the IVF rerank, parked the CDC deltas, and added the
  * JDBC materialize-and-drop — adjudicated totals
  * 132.1 / 137.0 / 128.7 s at band_drift 0.96 / 1.01 / 0.94, a
  * calm-phase recording; it replaces the round-14 OPENING trio whose
  * fmt_jdbc_roundtrip / maint_upsert / maint_scd2 medians predated
  * those plan changes; provenance: BASELINE.md §f). They parameterize
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
    "ann_ivf_top1" -> 1.773, "ann_ivf_topk" -> 0.722, "ann_lsh_top1" -> 1.273,
    "ann_pairs_bruteforce" -> 1.666, "ann_topk_batch" -> 0.705, "ann_topk_bruteforce" -> 0.408,
    "curation_e2e" -> 0.645, "dedup_chunks" -> 1.155, "dedup_components" -> 1.645,
    "dedup_components_lsh" -> 4.426, "dedup_decontaminate" -> 0.647, "dedup_embedding_cosine" -> 1.218,
    "dedup_exact" -> 0.323, "dedup_fuzzy_names" -> 3.045, "dedup_incremental" -> 0.643,
    "dedup_minhash_lsh" -> 1.785, "dedup_near_jaccard" -> 0.100, "dedup_ngram_exact" -> 0.909,
    "dedup_semantic" -> 1.049, "dedup_simhash" -> 0.885, "dedup_simhash_pairs" -> 1.428,
    "dedup_sketch_sources" -> 0.838, "dedup_survivors" -> 0.237, "doc_mixture_weights" -> 0.490,
    "doc_pack_shards" -> 0.570, "doc_resample" -> 0.579, "doc_sample_per_source" -> 0.257,
    "doc_sample_split" -> 0.124, "doc_sample_stratified" -> 0.118, "doc_shuffle_shards" -> 0.875,
    "doc_stable_ids" -> 0.260, "events_asof" -> 0.432, "events_asof_forward" -> 0.257,
    "events_daily_active" -> 0.478, "events_funnel" -> 0.779, "events_histogram" -> 0.232,
    "events_hourly" -> 0.470, "events_json_kv" -> 0.813, "events_lead_lag" -> 0.433,
    "events_map_fns" -> 0.604, "events_outliers" -> 0.479, "events_pivot" -> 0.436,
    "events_resample" -> 1.884, "events_retention" -> 0.565, "events_sessions" -> 0.683,
    "events_sliding" -> 0.340, "events_transitions" -> 0.738, "events_variant" -> 0.595,
    "events_wau" -> 0.707, "events_window_time_range" -> 1.232, "fmt_binary" -> 0.172,
    "fmt_csv_roundtrip" -> 0.529, "fmt_dynamic_overwrite" -> 1.804, "fmt_file_lineage" -> 0.607,
    "fmt_jdbc_roundtrip" -> 2.214, "fmt_json_corrupt" -> 0.469, "fmt_json_roundtrip" -> 0.497,
    "fmt_orc_roundtrip" -> 1.209, "fmt_partition_pruning" -> 0.441, "fmt_schema_evolution" -> 0.825,
    "fmt_xml_roundtrip" -> 0.698, "lines_provenance" -> 0.979, "lines_roundtrip" -> 0.626,
    "lines_wordcount" -> 0.371, "maint_bloom_index" -> 1.675, "maint_cluster" -> 1.582,
    "maint_compact" -> 2.698, "maint_delete_vector" -> 0.654, "maint_dq_audit" -> 0.999,
    "maint_incremental_agg" -> 0.876, "maint_profile" -> 2.284, "maint_profile_approx" -> 1.515,
    "maint_recompress" -> 1.847, "maint_scd2" -> 0.582, "maint_sketch_rollup" -> 0.927,
    "maint_upsert" -> 0.724, "maint_zorder" -> 2.103, "mm_decode" -> 0.236,
    "mm_frame_sample" -> 0.139, "mm_metadata" -> 0.136, "mm_resize" -> 0.175,
    "q1_pricing_summary" -> 0.698, "q_approx_distinct" -> 0.407, "q_approx_percentiles" -> 0.937,
    "q_bloom_join" -> 1.152, "q_bucketed_join" -> 0.659, "q_case_agg" -> 0.309,
    "q_cogroup_reconcile" -> 0.882, "q_cube" -> 0.556, "q_date_fns" -> 0.420,
    "q_distinct_agg" -> 0.788, "q_exists_subquery" -> 0.283, "q_global_sort" -> 0.247,
    "q_grouping_id" -> 0.843, "q_grouping_sets" -> 0.429, "q_having" -> 0.353,
    "q_join_anti" -> 0.403, "q_join_anti_nullaware" -> 0.908, "q_join_broadcast" -> 0.404,
    "q_join_full_outer" -> 0.444, "q_join_outer" -> 0.612, "q_join_semi" -> 0.340,
    "q_join_sortmerge" -> 0.972, "q_lateral" -> 0.420, "q_math_fns" -> 0.663,
    "q_ntile" -> 0.351, "q_null_fns" -> 0.270, "q_percentiles" -> 0.455,
    "q_pivot" -> 0.677, "q_range_join" -> 0.736, "q_range_join_dense" -> 0.889,
    "q_rollup" -> 0.438, "q_scalar_subquery" -> 0.281, "q_setops" -> 0.558,
    "q_setops_all" -> 0.784, "q_sql_interface" -> 0.877, "q_stats_agg" -> 0.407,
    "q_string_fns" -> 0.149, "q_topk" -> 0.151, "q_tpch_q10" -> 0.771,
    "q_tpch_q13" -> 0.645, "q_tpch_q14" -> 0.479, "q_tpch_q15" -> 0.722,
    "q_tpch_q17" -> 0.596, "q_tpch_q18" -> 1.253, "q_tpch_q19" -> 0.457,
    "q_tpch_q21" -> 1.087, "q_tpch_q22" -> 0.556, "q_tpch_q3" -> 0.783,
    "q_tpch_q5" -> 0.952, "q_tpch_q6" -> 0.234, "q_tpch_q7" -> 0.806,
    "q_tpch_q8" -> 0.941, "q_unpivot" -> 0.501, "q_window_range" -> 0.291,
    "q_window_running" -> 0.267, "q_window_topn" -> 0.254, "stream_dedup" -> 1.186,
    "stream_enrich" -> 1.114, "stream_hourly" -> 0.935, "stream_hourly_append" -> 1.269,
    "stream_retention_tws" -> 1.204, "stream_sessions" -> 1.354, "stream_sessions_append" -> 1.610,
    "stream_sessions_stateful" -> 1.023, "stream_sliding" -> 0.812, "stream_stream_join" -> 1.757,
    "stream_upsert" -> 1.301, "stream_user_totals" -> 0.775, "stream_user_totals_tws" -> 0.850,
    "text_array_fns" -> 0.293, "text_bigrams" -> 0.734, "text_bm25" -> 0.715,
    "text_fingerprint" -> 0.187, "text_heavy_hitters" -> 0.281, "text_inverted_index" -> 0.366,
    "text_langid" -> 0.291, "text_lm_score" -> 1.027, "text_normalize" -> 0.343,
    "text_quality_filter" -> 0.240, "text_redact" -> 0.193, "text_repetition" -> 0.768,
    "text_stats" -> 0.205, "text_tfidf" -> 0.965, "text_token_count" -> 0.252,
    "text_top_terms" -> 0.367, "text_vocab_oov" -> 0.580, "udaf_richest_per_nation" -> 0.177,
    "udf_vowel_ratio" -> 0.160, "wordcount" -> 0.170, "wordcount_bucketed" -> 0.186,
    "wordcount_ptb" -> 0.762, "wordcount_salted" -> 0.325
  )
}
