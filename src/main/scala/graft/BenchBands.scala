package graft

/** Checked-in per-query median timings (seconds) used by [[Bench]] to
  * adjudicate host steals: this rig randomly smears single runs by
  * 4-20x (BENCH_r06: 18 s on a 0.85 s-median query; BENCH_r09: 6.4 s
  * twice on 1.3 s-median q_tpch_q18), and an absolute cutoff cannot
  * tell a smeared cheap query from a genuinely expensive one. The
  * medians below are per-query medians of a recorded three-run trio at
  * sf0.1 / local[32] on this host, on the same code family that ships
  * them (the round-14 FINAL full-battery trio over all 173 queries —
  * recorded on the true final code, AFTER the functions-layer and
  * harness-mains review batches that closed the round — adjudicated
  * totals 134.4 / 135.3 / 138.0 s at band_drift 1.01 / 1.02 / 1.06, a
  * calm-phase recording, 1 smear per run (curation_e2e's cold-scan
  * first pass each time); it replaces the mid-round trio recorded
  * before the last six sweep commits; provenance: BASELINE.md §f). They parameterize
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
    "ann_ivf_top1" -> 1.763, "ann_ivf_topk" -> 0.890, "ann_lsh_top1" -> 1.397,
    "ann_pairs_bruteforce" -> 1.846, "ann_topk_batch" -> 0.606, "ann_topk_bruteforce" -> 0.471,
    "curation_e2e" -> 0.713, "dedup_chunks" -> 1.196, "dedup_components" -> 1.780,
    "dedup_components_lsh" -> 4.628, "dedup_decontaminate" -> 0.588, "dedup_embedding_cosine" -> 1.371,
    "dedup_exact" -> 0.362, "dedup_fuzzy_names" -> 3.025, "dedup_incremental" -> 0.684,
    "dedup_minhash_lsh" -> 1.725, "dedup_near_jaccard" -> 0.090, "dedup_ngram_exact" -> 0.927,
    "dedup_semantic" -> 1.052, "dedup_simhash" -> 0.980, "dedup_simhash_pairs" -> 1.498,
    "dedup_sketch_sources" -> 0.813, "dedup_survivors" -> 0.228, "doc_mixture_weights" -> 0.491,
    "doc_pack_shards" -> 0.626, "doc_resample" -> 0.615, "doc_sample_per_source" -> 0.280,
    "doc_sample_split" -> 0.131, "doc_sample_stratified" -> 0.123, "doc_shuffle_shards" -> 0.954,
    "doc_stable_ids" -> 0.263, "events_asof" -> 0.416, "events_asof_forward" -> 0.272,
    "events_daily_active" -> 0.491, "events_funnel" -> 0.830, "events_histogram" -> 0.269,
    "events_hourly" -> 0.417, "events_json_kv" -> 0.652, "events_lead_lag" -> 0.490,
    "events_map_fns" -> 0.751, "events_outliers" -> 0.523, "events_pivot" -> 0.489,
    "events_resample" -> 1.973, "events_retention" -> 0.605, "events_sessions" -> 0.799,
    "events_sliding" -> 0.368, "events_transitions" -> 0.759, "events_variant" -> 0.594,
    "events_wau" -> 0.762, "events_window_time_range" -> 0.609, "fmt_binary" -> 0.153,
    "fmt_csv_roundtrip" -> 0.550, "fmt_dynamic_overwrite" -> 1.631, "fmt_file_lineage" -> 0.639,
    "fmt_jdbc_roundtrip" -> 2.363, "fmt_json_corrupt" -> 0.491, "fmt_json_roundtrip" -> 0.579,
    "fmt_orc_roundtrip" -> 1.105, "fmt_partition_pruning" -> 0.469, "fmt_schema_evolution" -> 0.860,
    "fmt_xml_roundtrip" -> 0.713, "lines_provenance" -> 1.204, "lines_roundtrip" -> 0.490,
    "lines_wordcount" -> 0.170, "maint_bloom_index" -> 1.712, "maint_cluster" -> 1.872,
    "maint_compact" -> 2.498, "maint_delete_vector" -> 0.688, "maint_dq_audit" -> 1.109,
    "maint_incremental_agg" -> 0.840, "maint_profile" -> 2.438, "maint_profile_approx" -> 1.654,
    "maint_recompress" -> 1.971, "maint_scd2" -> 0.624, "maint_sketch_rollup" -> 0.906,
    "maint_upsert" -> 0.689, "maint_zorder" -> 2.180, "mm_decode" -> 0.228,
    "mm_frame_sample" -> 0.133, "mm_metadata" -> 0.135, "mm_resize" -> 0.196,
    "q1_pricing_summary" -> 0.689, "q_approx_distinct" -> 0.341, "q_approx_percentiles" -> 0.902,
    "q_bloom_join" -> 1.201, "q_bucketed_join" -> 0.672, "q_case_agg" -> 0.347,
    "q_cogroup_reconcile" -> 0.880, "q_cube" -> 0.497, "q_date_fns" -> 0.345,
    "q_distinct_agg" -> 0.713, "q_exists_subquery" -> 0.274, "q_global_sort" -> 0.209,
    "q_grouping_id" -> 0.456, "q_grouping_sets" -> 0.442, "q_having" -> 0.368,
    "q_join_anti" -> 0.421, "q_join_anti_nullaware" -> 0.447, "q_join_broadcast" -> 0.413,
    "q_join_full_outer" -> 0.394, "q_join_outer" -> 0.567, "q_join_semi" -> 0.323,
    "q_join_sortmerge" -> 1.018, "q_lateral" -> 0.406, "q_math_fns" -> 0.664,
    "q_ntile" -> 0.362, "q_null_fns" -> 0.250, "q_percentiles" -> 0.423,
    "q_pivot" -> 0.677, "q_range_join" -> 0.707, "q_range_join_dense" -> 0.788,
    "q_rollup" -> 0.404, "q_scalar_subquery" -> 0.268, "q_setops" -> 0.560,
    "q_setops_all" -> 0.646, "q_sql_interface" -> 0.502, "q_stats_agg" -> 0.348,
    "q_string_fns" -> 0.135, "q_topk" -> 0.153, "q_tpch_q10" -> 0.713,
    "q_tpch_q13" -> 0.588, "q_tpch_q14" -> 0.369, "q_tpch_q15" -> 0.661,
    "q_tpch_q17" -> 0.563, "q_tpch_q18" -> 1.125, "q_tpch_q19" -> 0.435,
    "q_tpch_q21" -> 1.096, "q_tpch_q22" -> 0.635, "q_tpch_q3" -> 0.789,
    "q_tpch_q5" -> 1.031, "q_tpch_q6" -> 0.259, "q_tpch_q7" -> 1.076,
    "q_tpch_q8" -> 1.207, "q_unpivot" -> 0.584, "q_window_range" -> 0.385,
    "q_window_running" -> 0.291, "q_window_topn" -> 0.277, "stream_dedup" -> 1.245,
    "stream_enrich" -> 1.324, "stream_hourly" -> 1.189, "stream_hourly_append" -> 1.641,
    "stream_retention_tws" -> 1.418, "stream_sessions" -> 1.563, "stream_sessions_append" -> 1.834,
    "stream_sessions_stateful" -> 1.167, "stream_sliding" -> 0.937, "stream_stream_join" -> 1.975,
    "stream_upsert" -> 1.399, "stream_user_totals" -> 0.861, "stream_user_totals_tws" -> 0.844,
    "text_array_fns" -> 0.291, "text_bigrams" -> 0.797, "text_bm25" -> 0.811,
    "text_fingerprint" -> 0.224, "text_heavy_hitters" -> 0.282, "text_inverted_index" -> 0.376,
    "text_langid" -> 0.295, "text_lm_score" -> 1.152, "text_normalize" -> 0.355,
    "text_quality_filter" -> 0.234, "text_redact" -> 0.185, "text_repetition" -> 0.784,
    "text_stats" -> 0.272, "text_tfidf" -> 1.104, "text_token_count" -> 0.215,
    "text_top_terms" -> 0.364, "text_vocab_oov" -> 0.542, "udaf_richest_per_nation" -> 0.207,
    "udf_vowel_ratio" -> 0.146, "wordcount" -> 0.160, "wordcount_bucketed" -> 0.201,
    "wordcount_ptb" -> 0.766, "wordcount_salted" -> 0.364
  )
}
