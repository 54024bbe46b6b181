package graft

/** Checked-in per-query median timings (seconds) used by [[Bench]] to
  * adjudicate host steals: this rig randomly smears single runs by
  * 4-20x (BENCH_r06: 18 s on a 0.85 s-median query; BENCH_r09: 6.4 s
  * twice on 1.3 s-median q_tpch_q18), and an absolute cutoff cannot
  * tell a smeared cheap query from a genuinely expensive one. The
  * medians below are per-query medians of a recorded three-run trio at
  * sf0.1 / local[32] on this host, on the same code family that ships
  * them (round-14 full-battery trio over all 173 queries, adjudicated
  * totals 134.8 / 137.7 / 138.0 s at band_drift 0.93 / 0.96 / 0.94 —
  * a calm-phase recording, replacing the r12 trio whose maint_profile
  * median predated the zero-sort split (6.69 stale-high vs 2.37 now)
  * and whose dedup_components_lsh median predated the capped-verify
  * rework; provenance: BASELINE.md §f). They parameterize
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
    "ann_ivf_top1" -> 1.859, "ann_ivf_topk" -> 0.739, "ann_lsh_top1" -> 1.332,
    "ann_pairs_bruteforce" -> 1.772, "ann_topk_batch" -> 0.659, "ann_topk_bruteforce" -> 0.464,
    "curation_e2e" -> 0.703, "dedup_chunks" -> 1.171, "dedup_components" -> 1.705,
    "dedup_components_lsh" -> 4.281, "dedup_decontaminate" -> 0.610, "dedup_embedding_cosine" -> 1.257,
    "dedup_exact" -> 0.347, "dedup_fuzzy_names" -> 2.905, "dedup_incremental" -> 0.611,
    "dedup_minhash_lsh" -> 1.781, "dedup_near_jaccard" -> 0.102, "dedup_ngram_exact" -> 0.865,
    "dedup_semantic" -> 1.083, "dedup_simhash" -> 0.977, "dedup_simhash_pairs" -> 1.798,
    "dedup_sketch_sources" -> 0.829, "dedup_survivors" -> 0.257, "doc_mixture_weights" -> 0.536,
    "doc_pack_shards" -> 0.489, "doc_resample" -> 0.602, "doc_sample_per_source" -> 0.316,
    "doc_sample_split" -> 0.143, "doc_sample_stratified" -> 0.140, "doc_shuffle_shards" -> 0.934,
    "doc_stable_ids" -> 0.263, "events_asof" -> 0.428, "events_asof_forward" -> 0.285,
    "events_daily_active" -> 0.570, "events_funnel" -> 0.975, "events_histogram" -> 0.275,
    "events_hourly" -> 0.519, "events_json_kv" -> 0.787, "events_lead_lag" -> 0.541,
    "events_map_fns" -> 0.721, "events_outliers" -> 0.516, "events_pivot" -> 0.464,
    "events_resample" -> 2.200, "events_retention" -> 0.655, "events_sessions" -> 0.848,
    "events_sliding" -> 0.400, "events_transitions" -> 0.747, "events_variant" -> 0.525,
    "events_wau" -> 0.736, "events_window_time_range" -> 1.174, "fmt_binary" -> 0.163,
    "fmt_csv_roundtrip" -> 0.555, "fmt_dynamic_overwrite" -> 1.707, "fmt_file_lineage" -> 0.659,
    "fmt_jdbc_roundtrip" -> 1.469, "fmt_json_corrupt" -> 0.421, "fmt_json_roundtrip" -> 0.571,
    "fmt_orc_roundtrip" -> 1.219, "fmt_partition_pruning" -> 0.470, "fmt_schema_evolution" -> 0.920,
    "fmt_xml_roundtrip" -> 0.659, "lines_provenance" -> 0.973, "lines_roundtrip" -> 0.703,
    "lines_wordcount" -> 0.397, "maint_bloom_index" -> 1.782, "maint_cluster" -> 1.981,
    "maint_compact" -> 2.599, "maint_delete_vector" -> 0.606, "maint_dq_audit" -> 1.071,
    "maint_incremental_agg" -> 0.874, "maint_profile" -> 2.365, "maint_profile_approx" -> 1.613,
    "maint_recompress" -> 2.077, "maint_scd2" -> 0.507, "maint_sketch_rollup" -> 0.983,
    "maint_upsert" -> 0.447, "maint_zorder" -> 2.237, "mm_decode" -> 0.229,
    "mm_frame_sample" -> 0.128, "mm_metadata" -> 0.121, "mm_resize" -> 0.169,
    "q1_pricing_summary" -> 0.698, "q_approx_distinct" -> 0.380, "q_approx_percentiles" -> 0.922,
    "q_bloom_join" -> 1.154, "q_bucketed_join" -> 0.654, "q_case_agg" -> 0.349,
    "q_cogroup_reconcile" -> 0.942, "q_cube" -> 0.554, "q_date_fns" -> 0.350,
    "q_distinct_agg" -> 0.782, "q_exists_subquery" -> 0.277, "q_global_sort" -> 0.202,
    "q_grouping_id" -> 0.854, "q_grouping_sets" -> 0.420, "q_having" -> 0.332,
    "q_join_anti" -> 0.446, "q_join_anti_nullaware" -> 0.950, "q_join_broadcast" -> 0.374,
    "q_join_full_outer" -> 0.352, "q_join_outer" -> 0.527, "q_join_semi" -> 0.303,
    "q_join_sortmerge" -> 1.010, "q_lateral" -> 0.403, "q_math_fns" -> 0.657,
    "q_ntile" -> 0.318, "q_null_fns" -> 0.260, "q_percentiles" -> 0.412,
    "q_pivot" -> 0.611, "q_range_join" -> 0.689, "q_range_join_dense" -> 0.835,
    "q_rollup" -> 0.411, "q_scalar_subquery" -> 0.251, "q_setops" -> 0.568,
    "q_setops_all" -> 0.709, "q_sql_interface" -> 0.942, "q_stats_agg" -> 0.326,
    "q_string_fns" -> 0.150, "q_topk" -> 0.157, "q_tpch_q10" -> 0.802,
    "q_tpch_q13" -> 0.589, "q_tpch_q14" -> 0.388, "q_tpch_q15" -> 0.714,
    "q_tpch_q17" -> 0.545, "q_tpch_q18" -> 1.188, "q_tpch_q19" -> 0.439,
    "q_tpch_q21" -> 1.153, "q_tpch_q22" -> 0.557, "q_tpch_q3" -> 0.768,
    "q_tpch_q5" -> 1.021, "q_tpch_q6" -> 0.228, "q_tpch_q7" -> 0.881,
    "q_tpch_q8" -> 1.035, "q_unpivot" -> 0.545, "q_window_range" -> 0.298,
    "q_window_running" -> 0.255, "q_window_topn" -> 0.246, "stream_dedup" -> 1.131,
    "stream_enrich" -> 1.089, "stream_hourly" -> 0.991, "stream_hourly_append" -> 1.383,
    "stream_retention_tws" -> 1.450, "stream_sessions" -> 1.543, "stream_sessions_append" -> 1.967,
    "stream_sessions_stateful" -> 1.186, "stream_sliding" -> 0.966, "stream_stream_join" -> 2.174,
    "stream_upsert" -> 1.612, "stream_user_totals" -> 0.890, "stream_user_totals_tws" -> 0.882,
    "text_array_fns" -> 0.304, "text_bigrams" -> 0.838, "text_bm25" -> 0.841,
    "text_fingerprint" -> 0.221, "text_heavy_hitters" -> 0.296, "text_inverted_index" -> 0.382,
    "text_langid" -> 0.327, "text_lm_score" -> 1.098, "text_normalize" -> 0.391,
    "text_quality_filter" -> 0.249, "text_redact" -> 0.237, "text_repetition" -> 0.868,
    "text_stats" -> 0.255, "text_tfidf" -> 1.231, "text_token_count" -> 0.235,
    "text_top_terms" -> 0.360, "text_vocab_oov" -> 0.584, "udaf_richest_per_nation" -> 0.212,
    "udf_vowel_ratio" -> 0.152, "wordcount" -> 0.186, "wordcount_bucketed" -> 0.231,
    "wordcount_ptb" -> 0.845, "wordcount_salted" -> 0.335
  )
}
