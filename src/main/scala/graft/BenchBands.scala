package graft

/** Checked-in per-query median timings (seconds) used by [[Bench]] to
  * adjudicate host steals: this rig randomly smears single runs by
  * 4-20x (BENCH_r06: 18 s on a 0.85 s-median query; BENCH_r09: 6.4 s
  * twice on 1.3 s-median q_tpch_q18), and an absolute cutoff cannot
  * tell a smeared cheap query from a genuinely expensive one. The
  * medians below are per-query medians of a recorded three-run trio at
  * sf0.1 / local[32] on this host, on the same code family that ships
  * them (the round-15 closing full-battery trio over all 173 queries —
  * recorded after the edge-probe hardening and its review fixes, the
  * plan-touching changes of the round (cogroup multiplicities,
  * pack-shards coalesce, explicit-schema fmt re-reads) — adjudicated
  * totals 154.8 / 150.6 / 140.7 s at band_drift 1.13 / 1.12 / 1.06: a
  * mildly HOT phase, so these medians run ~8% above the r14 calm-phase
  * trio's (median sum 146.0 vs 134.3 s) — read future band_drift
  * against that; 1 smear per run (curation_e2e's cold-scan first pass
  * each time, the same pre-existing pattern the r14 final artifact
  * shows); provenance: BASELINE.md §f). They parameterize
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
    "ann_ivf_top1" -> 2.296, "ann_ivf_topk" -> 0.905, "ann_lsh_top1" -> 1.515,
    "ann_pairs_bruteforce" -> 1.915, "ann_topk_batch" -> 0.781, "ann_topk_bruteforce" -> 0.624,
    "curation_e2e" -> 0.949, "dedup_chunks" -> 1.339, "dedup_components" -> 1.844,
    "dedup_components_lsh" -> 4.736, "dedup_decontaminate" -> 0.660, "dedup_embedding_cosine" -> 1.499,
    "dedup_exact" -> 0.356, "dedup_fuzzy_names" -> 3.008, "dedup_incremental" -> 0.658,
    "dedup_minhash_lsh" -> 2.015, "dedup_near_jaccard" -> 0.118, "dedup_ngram_exact" -> 1.068,
    "dedup_semantic" -> 1.182, "dedup_simhash" -> 1.040, "dedup_simhash_pairs" -> 1.539,
    "dedup_sketch_sources" -> 0.894, "dedup_survivors" -> 0.247, "doc_mixture_weights" -> 0.553,
    "doc_pack_shards" -> 0.562, "doc_resample" -> 0.624, "doc_sample_per_source" -> 0.326,
    "doc_sample_split" -> 0.162, "doc_sample_stratified" -> 0.172, "doc_shuffle_shards" -> 0.978,
    "doc_stable_ids" -> 0.274, "events_asof" -> 0.431, "events_asof_forward" -> 0.286,
    "events_daily_active" -> 0.507, "events_funnel" -> 0.989, "events_histogram" -> 0.294,
    "events_hourly" -> 0.486, "events_json_kv" -> 0.718, "events_lead_lag" -> 0.553,
    "events_map_fns" -> 0.775, "events_outliers" -> 0.527, "events_pivot" -> 0.473,
    "events_resample" -> 1.808, "events_retention" -> 0.653, "events_sessions" -> 0.845,
    "events_sliding" -> 0.450, "events_transitions" -> 0.873, "events_variant" -> 0.687,
    "events_wau" -> 0.887, "events_window_time_range" -> 0.749, "fmt_binary" -> 0.266,
    "fmt_csv_roundtrip" -> 0.649, "fmt_dynamic_overwrite" -> 1.781, "fmt_file_lineage" -> 0.635,
    "fmt_jdbc_roundtrip" -> 2.412, "fmt_json_corrupt" -> 0.518, "fmt_json_roundtrip" -> 0.574,
    "fmt_orc_roundtrip" -> 1.129, "fmt_partition_pruning" -> 0.420, "fmt_schema_evolution" -> 0.922,
    "fmt_xml_roundtrip" -> 0.779, "lines_provenance" -> 1.231, "lines_roundtrip" -> 0.510,
    "lines_wordcount" -> 0.157, "maint_bloom_index" -> 1.704, "maint_cluster" -> 1.855,
    "maint_compact" -> 2.753, "maint_delete_vector" -> 0.749, "maint_dq_audit" -> 1.347,
    "maint_incremental_agg" -> 0.969, "maint_profile" -> 2.440, "maint_profile_approx" -> 1.409,
    "maint_recompress" -> 1.848, "maint_scd2" -> 0.654, "maint_sketch_rollup" -> 0.966,
    "maint_upsert" -> 0.757, "maint_zorder" -> 2.520, "mm_decode" -> 0.267,
    "mm_frame_sample" -> 0.158, "mm_metadata" -> 0.156, "mm_resize" -> 0.212,
    "q1_pricing_summary" -> 0.738, "q_approx_distinct" -> 0.402, "q_approx_percentiles" -> 1.004,
    "q_bloom_join" -> 1.351, "q_bucketed_join" -> 0.648, "q_case_agg" -> 0.398,
    "q_cogroup_reconcile" -> 1.155, "q_cube" -> 0.598, "q_date_fns" -> 0.406,
    "q_distinct_agg" -> 0.796, "q_exists_subquery" -> 0.316, "q_global_sort" -> 0.267,
    "q_grouping_id" -> 0.597, "q_grouping_sets" -> 0.464, "q_having" -> 0.355,
    "q_join_anti" -> 0.479, "q_join_anti_nullaware" -> 0.545, "q_join_broadcast" -> 0.435,
    "q_join_full_outer" -> 0.376, "q_join_outer" -> 0.556, "q_join_semi" -> 0.332,
    "q_join_sortmerge" -> 1.103, "q_lateral" -> 0.520, "q_math_fns" -> 0.710,
    "q_ntile" -> 0.371, "q_null_fns" -> 0.296, "q_percentiles" -> 0.510,
    "q_pivot" -> 0.782, "q_range_join" -> 0.815, "q_range_join_dense" -> 0.885,
    "q_rollup" -> 0.463, "q_scalar_subquery" -> 0.290, "q_setops" -> 0.622,
    "q_setops_all" -> 0.753, "q_sql_interface" -> 0.559, "q_stats_agg" -> 0.411,
    "q_string_fns" -> 0.153, "q_topk" -> 0.182, "q_tpch_q10" -> 0.857,
    "q_tpch_q13" -> 0.685, "q_tpch_q14" -> 0.445, "q_tpch_q15" -> 0.803,
    "q_tpch_q17" -> 0.755, "q_tpch_q18" -> 1.301, "q_tpch_q19" -> 0.476,
    "q_tpch_q21" -> 1.213, "q_tpch_q22" -> 0.803, "q_tpch_q3" -> 0.954,
    "q_tpch_q5" -> 1.126, "q_tpch_q6" -> 0.248, "q_tpch_q7" -> 1.096,
    "q_tpch_q8" -> 1.172, "q_unpivot" -> 0.565, "q_window_range" -> 0.325,
    "q_window_running" -> 0.309, "q_window_topn" -> 0.279, "stream_dedup" -> 1.204,
    "stream_enrich" -> 1.310, "stream_hourly" -> 1.198, "stream_hourly_append" -> 1.507,
    "stream_retention_tws" -> 1.735, "stream_sessions" -> 1.918, "stream_sessions_append" -> 2.598,
    "stream_sessions_stateful" -> 1.170, "stream_sliding" -> 0.957, "stream_stream_join" -> 2.002,
    "stream_upsert" -> 1.504, "stream_user_totals" -> 0.895, "stream_user_totals_tws" -> 0.971,
    "text_array_fns" -> 0.341, "text_bigrams" -> 0.908, "text_bm25" -> 0.913,
    "text_fingerprint" -> 0.236, "text_heavy_hitters" -> 0.329, "text_inverted_index" -> 0.425,
    "text_langid" -> 0.305, "text_lm_score" -> 1.203, "text_normalize" -> 0.446,
    "text_quality_filter" -> 0.259, "text_redact" -> 0.240, "text_repetition" -> 0.833,
    "text_stats" -> 0.261, "text_tfidf" -> 1.256, "text_token_count" -> 0.250,
    "text_top_terms" -> 0.407, "text_vocab_oov" -> 0.618, "udaf_richest_per_nation" -> 0.228,
    "udf_vowel_ratio" -> 0.179, "wordcount" -> 0.202, "wordcount_bucketed" -> 0.229,
    "wordcount_ptb" -> 0.829, "wordcount_salted" -> 0.458)
}
