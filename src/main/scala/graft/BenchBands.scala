package graft

/** Checked-in per-query median timings (seconds) used by [[Bench]] to
  * adjudicate host steals: this rig randomly smears single runs by
  * 4-20x (BENCH_r06: 18 s on a 0.85 s-median query; BENCH_r09: 6.4 s
  * twice on 1.3 s-median q_tpch_q18), and an absolute cutoff cannot
  * tell a smeared cheap query from a genuinely expensive one. The
  * medians below are per-query medians of a recorded three-run trio at
  * sf0.1 / local[32] on this host, on the same code family that ships
  * them (the round-15 post-close full-battery trio over all 173
  * queries — identical product code to the closing trio, re-recorded
  * at a cooler host phase: adjudicated totals 144.1 / 158.3 / 139.6 s
  * at band_drift 0.94 / 1.05 / 0.94 vs the hot closing trio's
  * 1.06–1.13. Median sum 143.5 s — only ~1.7% under the hot trio's
  * 146.0, which retires that trio's "~8% hot" prediction: the hot
  * phase inflated totals far more than per-query medians. 1 smear per
  * run (curation_e2e's cold-scan first pass each time, the same
  * pre-existing pattern the r14 final artifact shows); provenance:
  * BASELINE.md §f Round-15 addendum). They parameterize
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
    "ann_ivf_top1" -> 2.058, "ann_ivf_topk" -> 0.949, "ann_lsh_top1" -> 1.519,
    "ann_pairs_bruteforce" -> 2.375, "ann_topk_batch" -> 0.773, "ann_topk_bruteforce" -> 0.598,
    "curation_e2e" -> 0.745, "dedup_chunks" -> 1.289, "dedup_components" -> 1.828,
    "dedup_components_lsh" -> 5.055, "dedup_decontaminate" -> 0.713, "dedup_embedding_cosine" -> 1.755,
    "dedup_exact" -> 0.478, "dedup_fuzzy_names" -> 3.649, "dedup_incremental" -> 0.790,
    "dedup_minhash_lsh" -> 1.949, "dedup_near_jaccard" -> 0.095, "dedup_ngram_exact" -> 1.018,
    "dedup_semantic" -> 1.386, "dedup_simhash" -> 1.159, "dedup_simhash_pairs" -> 1.622,
    "dedup_sketch_sources" -> 0.980, "dedup_survivors" -> 0.266, "doc_mixture_weights" -> 0.583,
    "doc_pack_shards" -> 0.599, "doc_resample" -> 0.636, "doc_sample_per_source" -> 0.341,
    "doc_sample_split" -> 0.163, "doc_sample_stratified" -> 0.159, "doc_shuffle_shards" -> 1.011,
    "doc_stable_ids" -> 0.319, "events_asof" -> 0.497, "events_asof_forward" -> 0.331,
    "events_daily_active" -> 0.581, "events_funnel" -> 0.987, "events_histogram" -> 0.247,
    "events_hourly" -> 0.473, "events_json_kv" -> 0.723, "events_lead_lag" -> 0.577,
    "events_map_fns" -> 0.777, "events_outliers" -> 0.583, "events_pivot" -> 0.521,
    "events_resample" -> 1.967, "events_retention" -> 0.563, "events_sessions" -> 0.765,
    "events_sliding" -> 0.364, "events_transitions" -> 0.825, "events_variant" -> 0.567,
    "events_wau" -> 0.722, "events_window_time_range" -> 0.611, "fmt_binary" -> 0.145,
    "fmt_csv_roundtrip" -> 0.524, "fmt_dynamic_overwrite" -> 1.490, "fmt_file_lineage" -> 0.567,
    "fmt_jdbc_roundtrip" -> 2.194, "fmt_json_corrupt" -> 0.496, "fmt_json_roundtrip" -> 0.524,
    "fmt_orc_roundtrip" -> 1.153, "fmt_partition_pruning" -> 0.420, "fmt_schema_evolution" -> 0.837,
    "fmt_xml_roundtrip" -> 0.931, "lines_provenance" -> 1.482, "lines_roundtrip" -> 0.534,
    "lines_wordcount" -> 0.168, "maint_bloom_index" -> 1.727, "maint_cluster" -> 1.860,
    "maint_compact" -> 2.835, "maint_delete_vector" -> 0.681, "maint_dq_audit" -> 1.141,
    "maint_incremental_agg" -> 0.830, "maint_profile" -> 2.550, "maint_profile_approx" -> 1.502,
    "maint_recompress" -> 2.074, "maint_scd2" -> 0.697, "maint_sketch_rollup" -> 1.095,
    "maint_upsert" -> 0.839, "maint_zorder" -> 2.476, "mm_decode" -> 0.233,
    "mm_frame_sample" -> 0.154, "mm_metadata" -> 0.141, "mm_resize" -> 0.215,
    "q1_pricing_summary" -> 0.783, "q_approx_distinct" -> 0.423, "q_approx_percentiles" -> 1.019,
    "q_bloom_join" -> 1.203, "q_bucketed_join" -> 0.692, "q_case_agg" -> 0.349,
    "q_cogroup_reconcile" -> 0.966, "q_cube" -> 0.509, "q_date_fns" -> 0.381,
    "q_distinct_agg" -> 0.700, "q_exists_subquery" -> 0.297, "q_global_sort" -> 0.236,
    "q_grouping_id" -> 0.522, "q_grouping_sets" -> 0.482, "q_having" -> 0.347,
    "q_join_anti" -> 0.421, "q_join_anti_nullaware" -> 0.451, "q_join_broadcast" -> 0.399,
    "q_join_full_outer" -> 0.386, "q_join_outer" -> 0.573, "q_join_semi" -> 0.339,
    "q_join_sortmerge" -> 1.056, "q_lateral" -> 0.461, "q_math_fns" -> 0.638,
    "q_ntile" -> 0.348, "q_null_fns" -> 0.275, "q_percentiles" -> 0.429,
    "q_pivot" -> 0.645, "q_range_join" -> 0.727, "q_range_join_dense" -> 0.935,
    "q_rollup" -> 0.479, "q_scalar_subquery" -> 0.298, "q_setops" -> 0.634,
    "q_setops_all" -> 0.724, "q_sql_interface" -> 0.512, "q_stats_agg" -> 0.338,
    "q_string_fns" -> 0.144, "q_topk" -> 0.169, "q_tpch_q10" -> 0.833,
    "q_tpch_q13" -> 0.682, "q_tpch_q14" -> 0.425, "q_tpch_q15" -> 0.781,
    "q_tpch_q17" -> 0.648, "q_tpch_q18" -> 1.159, "q_tpch_q19" -> 0.432,
    "q_tpch_q21" -> 1.217, "q_tpch_q22" -> 0.711, "q_tpch_q3" -> 0.841,
    "q_tpch_q5" -> 1.102, "q_tpch_q6" -> 0.265, "q_tpch_q7" -> 1.008,
    "q_tpch_q8" -> 1.243, "q_unpivot" -> 0.600, "q_window_range" -> 0.309,
    "q_window_running" -> 0.286, "q_window_topn" -> 0.246, "stream_dedup" -> 1.148,
    "stream_enrich" -> 1.135, "stream_hourly" -> 1.297, "stream_hourly_append" -> 1.598,
    "stream_retention_tws" -> 1.601, "stream_sessions" -> 1.561, "stream_sessions_append" -> 1.851,
    "stream_sessions_stateful" -> 1.148, "stream_sliding" -> 1.012, "stream_stream_join" -> 1.971,
    "stream_upsert" -> 1.407, "stream_user_totals" -> 0.844, "stream_user_totals_tws" -> 0.937,
    "text_array_fns" -> 0.309, "text_bigrams" -> 0.856, "text_bm25" -> 0.858,
    "text_fingerprint" -> 0.233, "text_heavy_hitters" -> 0.311, "text_inverted_index" -> 0.417,
    "text_langid" -> 0.297, "text_lm_score" -> 1.137, "text_normalize" -> 0.416,
    "text_quality_filter" -> 0.249, "text_redact" -> 0.213, "text_repetition" -> 0.874,
    "text_stats" -> 0.263, "text_tfidf" -> 1.178, "text_token_count" -> 0.253,
    "text_top_terms" -> 0.381, "text_vocab_oov" -> 0.599, "udaf_richest_per_nation" -> 0.215,
    "udf_vowel_ratio" -> 0.182, "wordcount" -> 0.198, "wordcount_bucketed" -> 0.220,
    "wordcount_ptb" -> 0.851, "wordcount_salted" -> 0.357)
}
