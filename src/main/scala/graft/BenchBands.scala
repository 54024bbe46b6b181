package graft

/** Checked-in per-query median timings (seconds) used by [[Bench]] to
  * adjudicate host steals: this rig randomly smears single runs by
  * 4-20x (BENCH_r06: 18 s on a 0.85 s-median query; BENCH_r09: 6.4 s
  * twice on 1.3 s-median q_tpch_q18), and an absolute cutoff cannot
  * tell a smeared cheap query from a genuinely expensive one. The
  * medians below are per-query medians of a recorded three-run trio at
  * sf0.1 / local[32] on this host, on the same code family that ships
  * them (the round-17 calm trio over all 173 queries: the three
  * over_band-CLEAN runs inside the prescribed drift 0.95-1.05 window
  * from a 13-run day — adjudicated totals 138.3 / 139.3 / 134.8 s at
  * band_drift 0.97 / 0.98 / 0.95 vs the r15 band, 0 errors, 1 smear
  * per run (curation_e2e's usual cold-scan first pass). Median sum
  * 136.0 s, 5.2% under the r15 band's 143.5 — consistent with that
  * band's adjudicated ~6%-hot recording bias, so this one sits near
  * true-neutral; provenance and the full 13-run series:
  * BASELINE.md §f Round-17 record + addendum (e)). They parameterize
  * the re-run band only — they are never reported as results, so a
  * stale entry can cause a wasted (or missed) re-run, never a wrong
  * number. BenchBandsSpec pins the map to the live query battery.
  *
  * r20 deltas (mini-trios at sf0.1, medians of 3 fresh-JVM runs —
  * VERDICT r19 task 5 convention): events_q4_shape 1.324 and
  * events_q12_shape 0.846 are NEW; dedup_simhash 0.120 and
  * dedup_simhash_pairs 0.849 re-recorded twice over — first after the
  * fingerprint hash moved to the shared md5 primitive (hash-oracle
  * upgrade; 1.043/1.937 interim), then after the fingerprint
  * aggregation became a per-dataset warmed artifact like the near-dup
  * pair join (Bench pre-materializes it untimed; the timed lines are
  * the artifact read and the pigeonhole join, exactly the
  * dedup_near_jaccard convention).
  */
object BenchBands {

  /** Re-run threshold: beyond twice the recorded median (floored at
    * 1 s so sub-second jitter never triggers a re-run), or 3 s
    * absolute for a query added after the recorded trio.
    */
  def smearThresholdSec(name: String): Double =
    medianSec.get(name).map(m => math.max(2.0 * m, 1.0)).getOrElse(3.0)

  val medianSec: Map[String, Double] = Map(
    "ann_ivf_top1" -> 1.689, "ann_ivf_topk" -> 0.778, "ann_lsh_top1" -> 1.327,
    "ann_pairs_bruteforce" -> 1.581, "ann_topk_batch" -> 0.736, "ann_topk_bruteforce" -> 0.551,
    "curation_e2e" -> 0.801, "dedup_chunks" -> 1.087, "dedup_components" -> 1.621,
    "dedup_components_lsh" -> 4.239, "dedup_decontaminate" -> 0.537, "dedup_embedding_cosine" -> 1.158,
    "dedup_exact" -> 0.295, "dedup_fuzzy_names" -> 2.757, "dedup_incremental" -> 0.555,
    "dedup_minhash_lsh" -> 1.712, "dedup_near_jaccard" -> 0.090, "dedup_ngram_exact" -> 0.941,
    "dedup_semantic" -> 1.201, "dedup_simhash" -> 0.120, "dedup_simhash_pairs" -> 0.849,
    "dedup_sketch_sources" -> 0.827, "dedup_survivors" -> 0.228, "doc_mixture_weights" -> 0.433,
    "doc_pack_shards" -> 0.500, "doc_resample" -> 0.548, "doc_sample_per_source" -> 0.264,
    "doc_sample_split" -> 0.142, "doc_sample_stratified" -> 0.128, "doc_shuffle_shards" -> 0.872,
    "doc_stable_ids" -> 0.290, "events_asof" -> 0.408, "events_asof_forward" -> 0.298,
    "events_daily_active" -> 0.537, "events_funnel" -> 0.852, "events_histogram" -> 0.272,
    "events_hourly" -> 0.460, "events_json_kv" -> 0.736, "events_lead_lag" -> 0.534,
    "events_map_fns" -> 0.811, "events_outliers" -> 0.492, "events_pivot" -> 0.433,
    "events_resample" -> 1.850, "events_retention" -> 0.533, "events_sessions" -> 0.710,
    "events_sliding" -> 0.383, "events_transitions" -> 0.730, "events_variant" -> 0.657,
    "events_q4_shape" -> 1.324, "events_q12_shape" -> 0.846,
    "events_wau" -> 0.734, "events_window_time_range" -> 0.595, "fmt_binary" -> 0.141,
    "fmt_csv_roundtrip" -> 0.551, "fmt_dynamic_overwrite" -> 1.476, "fmt_file_lineage" -> 0.569,
    "fmt_jdbc_roundtrip" -> 2.123, "fmt_json_corrupt" -> 0.442, "fmt_json_roundtrip" -> 0.609,
    "fmt_orc_roundtrip" -> 1.221, "fmt_partition_pruning" -> 0.448, "fmt_schema_evolution" -> 1.007,
    "fmt_xml_roundtrip" -> 0.872, "lines_provenance" -> 1.241, "lines_roundtrip" -> 0.559,
    "lines_wordcount" -> 0.222, "maint_bloom_index" -> 1.770, "maint_cluster" -> 2.172,
    "maint_compact" -> 2.684, "maint_delete_vector" -> 0.742, "maint_dq_audit" -> 1.117,
    "maint_incremental_agg" -> 0.829, "maint_profile" -> 2.382, "maint_profile_approx" -> 1.591,
    "maint_recompress" -> 1.951, "maint_scd2" -> 0.640, "maint_sketch_rollup" -> 0.941,
    "maint_upsert" -> 0.713, "maint_zorder" -> 2.448, "mm_decode" -> 0.284,
    "mm_frame_sample" -> 0.140, "mm_metadata" -> 0.146, "mm_resize" -> 0.184,
    "q1_pricing_summary" -> 0.722, "q_approx_distinct" -> 0.410, "q_approx_percentiles" -> 1.003,
    "q_bloom_join" -> 1.214, "q_bucketed_join" -> 0.667, "q_case_agg" -> 0.304,
    "q_cogroup_reconcile" -> 0.975, "q_cube" -> 0.685, "q_date_fns" -> 0.440,
    "q_distinct_agg" -> 0.865, "q_exists_subquery" -> 0.310, "q_global_sort" -> 0.248,
    "q_grouping_id" -> 0.507, "q_grouping_sets" -> 0.450, "q_having" -> 0.382,
    "q_join_anti" -> 0.416, "q_join_anti_nullaware" -> 0.429, "q_join_broadcast" -> 0.447,
    "q_join_full_outer" -> 0.370, "q_join_outer" -> 0.584, "q_join_semi" -> 0.329,
    "q_join_sortmerge" -> 1.061, "q_lateral" -> 0.423, "q_math_fns" -> 0.808,
    "q_ntile" -> 0.334, "q_null_fns" -> 0.261, "q_percentiles" -> 0.472,
    "q_pivot" -> 0.720, "q_range_join" -> 0.782, "q_range_join_dense" -> 0.942,
    "q_rollup" -> 0.445, "q_scalar_subquery" -> 0.264, "q_setops" -> 0.506,
    "q_setops_all" -> 0.624, "q_sql_interface" -> 0.477, "q_stats_agg" -> 0.372,
    "q_string_fns" -> 0.127, "q_topk" -> 0.161, "q_tpch_q10" -> 0.775,
    "q_tpch_q13" -> 0.626, "q_tpch_q14" -> 0.385, "q_tpch_q15" -> 0.709,
    "q_tpch_q17" -> 0.634, "q_tpch_q18" -> 1.275, "q_tpch_q19" -> 0.477,
    "q_tpch_q21" -> 1.156, "q_tpch_q22" -> 0.674, "q_tpch_q3" -> 0.846,
    "q_tpch_q5" -> 1.083, "q_tpch_q6" -> 0.226, "q_tpch_q7" -> 1.004,
    "q_tpch_q8" -> 1.096, "q_unpivot" -> 0.582, "q_window_range" -> 0.303,
    "q_window_running" -> 0.262, "q_window_topn" -> 0.267, "stream_dedup" -> 1.223,
    "stream_enrich" -> 1.163, "stream_hourly" -> 1.212, "stream_hourly_append" -> 1.382,
    "stream_retention_tws" -> 1.415, "stream_sessions" -> 1.660, "stream_sessions_append" -> 1.854,
    "stream_sessions_stateful" -> 1.067, "stream_sliding" -> 0.912, "stream_stream_join" -> 1.927,
    "stream_upsert" -> 1.558, "stream_user_totals" -> 0.824, "stream_user_totals_tws" -> 0.866,
    "text_array_fns" -> 0.327, "text_bigrams" -> 0.885, "text_bm25" -> 0.767,
    "text_fingerprint" -> 0.230, "text_heavy_hitters" -> 0.367, "text_inverted_index" -> 0.416,
    "text_langid" -> 0.352, "text_lm_score" -> 1.156, "text_normalize" -> 0.468,
    "text_quality_filter" -> 0.295, "text_redact" -> 0.223, "text_repetition" -> 0.849,
    "text_stats" -> 0.268, "text_tfidf" -> 1.269, "text_token_count" -> 0.291,
    "text_top_terms" -> 0.398, "text_vocab_oov" -> 0.579, "udaf_richest_per_nation" -> 0.197,
    "udf_vowel_ratio" -> 0.188, "wordcount" -> 0.194, "wordcount_bucketed" -> 0.212,
    "wordcount_ptb" -> 0.920, "wordcount_salted" -> 0.339
  )
}
