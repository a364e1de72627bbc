"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over finanalyzer_spark.plans.REGISTRY — every implemented
operator from SURVEY.md §2 registers itself there as a
(PySpark callable, DuckDB oracle SQL) pair; this module just re-exposes
the registry in the driver's protocol.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from finanalyzer_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    'Latest close per ticker with dedup' — scan + per-key max +
    deterministic latest observation + broadcast dimension join
    (SURVEY.md §7 Phase 0).
    """
    return REGISTRY["latest_price_per_key"].fn(spark, "/root/testdata/sf0.001")


#: names that have already received a driver-side CORRECTNESS row
#: (union of the CORRECTNESS_r01-r11 samples — 383/383 as of round 11:
#: the driver-verified union is CLOSED). Listing never-sampled names
#: FIRST steers a prefix/ordered sampler toward them so the verified
#: union widens each round. Refresh per round from the
#: CORRECTNESS_r*.json keys.
DRIVER_SAMPLED = frozenset({
    # --- r12 sample (all green, CORRECTNESS_r12.json — 50/50; the
    # names not already in older blocks) ---
    "ann_graph_build", "ann_graph_repair_recall",
    # --- r11 sample (all green, CORRECTNESS_r11.json — 50/50; covered
    # all 6 new + 3 changed r11 names, union stays closed) ---
    "ann_graph_recall_eval", "ann_graph_topk", "ann_ivf_retrain_drift",
    "approx_distinct_users", "approx_quantiles_bounded",
    "benford_first_digit", "corr_matrix_lineitem", "cube_qty",
    "cyclical_features", "date_functions", "distinct_conditional_agg",
    "dsir_importance_selection", "equidepth_histogram", "except_all",
    "forecast_revenue_change", "kcenter_coreset_selection",
    "media_dhash_cross_format_dedup", "price_percentiles",
    # --- r10 sample (all green, CORRECTNESS_r10.json — 50/50; closed
    # the union: all 28 never-sampled r9 names + all 12 r10 names) ---
    "adamic_adar_link_prediction", "ann_filtered_topk",
    "ann_postfilter_recall_eval", "ann_radius_recall_eval",
    "ann_radius_search", "anova_levene_returnflag",
    "bh_fdr_supplier_rates", "breusch_pagan_daily_trend",
    "chow_break_daily_revenue", "common_neighbor_link_prediction",
    "decomposition_strength", "degree_powerlaw_hill",
    "diff_in_diff_urgent", "durbin_watson_ols", "edge_triangle_support",
    "friedman_priority_weekday", "grubbs_outlier_test",
    "gumbel_weekly_max_revenue", "holt_forecast_backtest",
    "holt_winters_weekly_backtest", "hurst_rs_daily_revenue",
    "jarque_bera_order_value", "local_clustering_coefficient",
    "mase_pinball_naive", "media_adts_probe_stats", "media_id3_tags",
    "media_probe_summary", "multi_table_key_profile",
    "mutual_information_priority_flag", "pacf_daily_revenue",
    "pettitt_changepoint", "qq_shift_returned_vs_kept",
    "rich_club_coefficient", "runs_test_daily_revenue",
    "tail_dependence_segments", "var_cvar_daily_revenue",
    "variance_ratio_test", "welch_t_returned_vs_kept",
    "woe_iv_price_returned", "zorder_locality_audit",
    # --- r9 sample (all green, CORRECTNESS_r09.json — 50/50) ---
    "ab_power_mde", "amihud_illiquidity", "ann_bq_recall_eval",
    "ann_bq_topk", "ann_ivf_trained_recall_eval", "ann_ivf_trained_topk",
    "ann_multiprobe_recall_eval", "ann_multiprobe_topk",
    "attribution_position_based", "classifier_ks_gains",
    "cohens_kappa_langid", "dedup_method_agreement",
    "eb_shrunk_return_rates", "event_markov_stationary",
    "exact_substring_dedup", "fisher_price_index",
    "garman_klass_volatility", "heaps_law_fit",
    "hhi_supplier_concentration", "isotonic_calibration_bins",
    "item_item_cosine_topk", "label_centroid_similarity",
    "lateral_topk_per_group", "lexical_diversity_by_source",
    "ltv_cohort_curve", "luhn_pii_audit", "media_ico_pixel_stats",
    "media_ogg_flac_audio_stats", "media_pcx_pixel_stats",
    "media_tga_pixel_stats", "mixture_temperature_sampling",
    "mode_per_group", "near_dup_survivorship_by_source",
    "neyman_allocation", "ngram_novelty_rate", "obv_trend",
    "poisson_dispersion_daily_events", "price_elasticity_by_brand",
    "signup_to_purchase_latency", "srm_check", "stochastic_oscillator",
    "string_agg_ordered", "substring_dup_spans", "term_burstiness_top",
    "tokenizer_fertility", "top_session_paths", "two_proportion_ab_test",
    "unicode_nfc_audit", "vocab_capture_recapture",
    "wilson_lower_bound_ranking",
    # --- r8 sample (all green, CORRECTNESS_r08.json — closed the
    # cross-round union at 288/288) ---
    "adf_unit_root_daily_revenue", "approx_topk_contract",
    "ari_cell_vs_label", "binned_wasserstein_drift",
    "cdc_chunk_dup_share", "chi2_status_priority",
    "cms_frequency_estimates", "conditional_replace",
    "degree_assortativity", "dp_noisy_clamped_sum",
    "dp_noisy_source_counts", "engle_granger_cointegration",
    "filter_retention_window", "granger_causality_f",
    "grid_dbscan_embeddings", "groupby_last_update",
    "iqr_outlier_fences", "ivf_gemm_assignment_census",
    "kcore_cosupply", "kmv_distinct_estimate",
    "kneser_ney_trigram_score", "label_propagation_communities",
    "lead_lag_xcorr", "mann_kendall_trend",
    "media_audio_container_parity", "media_exr_pixel_stats",
    "media_g711_audio_stats", "media_legacy_image_parity",
    "media_png_pixel_stats", "media_qoi_pixel_stats",
    "media_tiff_pixel_stats", "minhash_precision_eval",
    "minhash_recall_eval", "naive_forecast_backtest",
    "ndcg_retrieval_eval", "pagerank_trade_graph", "pricing_summary",
    "psi_drift", "select_project_filter", "simhash_hamming_pairs",
    "theil_index_revenue", "theil_sen_trend_daily_revenue",
    "triangle_count_cosupply", "url_canonical_dedup", "value_counts",
    "warc_html_extraction", "warc_record_census",
    "weekday_anomaly_days", "weighted_median_price",
    "winnowing_candidate_pairs",
    # --- r7 sample (all green, CORRECTNESS_r07.json) ---
    "acf_ljung_box", "benchmark_decontamination", "bfs_hops_trade_graph",
    "bloom_filter_membership", "bm25_topk", "boilerplate_span_stats",
    "chi2_token_selection", "conformal_interval_coverage",
    "containment_near_superset", "cramers_v_segment_priority",
    "crossdoc_span_dup_share", "cuped_adjusted_ab", "curation_funnel",
    "deterministic_sample_stats", "gopher_repetition_filter",
    "group_kfold_counts", "heavy_hitters_exact", "hits_trade_graph",
    "hybrid_rrf_topk", "k_anonymity_audit", "kendall_tau_qty_discount",
    "kmeans_lloyd_step", "kruskal_wallis_returnflag", "loo_target_encoding",
    "media_flac_audio_stats", "media_h264_bframe_decode",
    "media_h264_gop_decode", "media_h264_intra_decode",
    "mrl_truncation_recall", "negative_sampling_unigram",
    "per_group_hash_sample", "pii_scrub_stats", "poisson_bootstrap_ci",
    "quality_calibration_bins", "quality_classifier_filter",
    "quality_roc_auc", "seasonal_decompose_weekday",
    "source_mixture_sample", "source_quota_cap", "spearman_price_discount",
    "stratified_sample_counts", "survival_km_curve", "survival_logrank",
    "table_profile_checks", "term_doc_frequency",
    "train_test_split_counts", "vocab_oov_rate", "weighted_sample_stats",
    "weighted_sample_topk", "wilcoxon_signed_rank_price",
    # --- r6 sample (all green, CORRECTNESS_r06.json; overlaps with the
    # round-6 ROUND_CHANGED re-queues are harmless set-union) ---
    "abc_customer_classes", "binned_ks_drift", "contrastive_pairs",
    "curriculum_quartile_bins", "cusum_changepoint",
    "funnel_conversion_lag", "gbt_price_improves",
    "gini_revenue_concentration", "grouped_agg_median_discount",
    "ks_statistic_returned_vs_kept", "mann_whitney_u_returned_vs_kept",
    "media_content_dedup", "media_frame_count", "media_h264_stream_index",
    "media_image_features", "media_metadata", "media_mp4_keyframe_index",
    "media_ppm_pixel_features", "media_probe_summary",
    "media_wav_audio_stats", "media_y4m_frames", "ml_feature_pipeline",
    "nystroem_features", "ols_price_on_qty", "pareto_front_parts",
    "pca2_price_qty", "per_supplier_ols_slopes", "polynomial_features",
    "registry_bootstrap_ids", "repeat_purchase_interval",
    "revenue_decile_profile", "rfm_segments", "ridge_price_on_qty",
    "spline_seasonal_features", "time_split_folds",
    "time_weighted_avg_price", "tpch_q11_important_stock",
    "tpch_q12_late_by_status", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q16_supplier_cnt",
    "tpch_q18_large_orders", "tpch_q20_excess_shippers",
    "tpch_q21_waiting_supplier", "tpch_q22_idle_customers",
    "tpch_q2_min_cost_supplier", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_profit_by_nation",
    "vocab_coverage_curve",
    # --- r5 sample (all green, CORRECTNESS_r05.json) ---
    "activity_streaks", "ann_ivfpq_topk", "ann_pq_recall_eval", "ann_pq_topk",
    "atr_14", "attribution_last_touch", "bollinger_breakouts",
    "cohort_retention", "concurrent_events_peak", "conversion_funnel",
    "cusum_changepoint", "dau_stickiness", "equidepth_histogram",
    "event_dedup_within_watermark", "event_entropy_per_user",
    "event_transition_matrix", "ewma_anomaly_flags", "funnel_conversion_lag",
    "hll_set_ops_estimate", "idempotent_merge", "js_divergence_sources",
    "latest_price_per_key", "macd_signal", "mad_outlier_flags",
    "market_beta", "max_drawdown", "new_vs_returning_users",
    "ohlc_downsample", "orphan_fk_check", "price_percentiles",
    "props_variant_stats", "random_projection_features",
    "realized_volatility", "registry_bootstrap_ids",
    "repeat_purchase_interval", "rfm_segments", "rolling_corr_price_qty",
    "rsi_14", "salted_token_vocabulary", "semantic_dedup_clusters",
    "session_duration_percentiles", "session_windows", "sessionize_events",
    "sessions_to_convert", "sharpe_sortino", "sliding_hourly_30m",
    "sma_crossover_backtest", "time_bucket_rollup", "tumbling_hourly",
    "vwap_premium",
    # --- r4 sample ---
    "abc_customer_classes", "ann_ivf_topk", "ann_lsh_topk",
    "ann_recall_eval", "ann_sq8_recall_eval", "ann_sq8_topk",
    "asof_nearest_order", "basket_pair_lift", "bigram_logprob_score",
    "bpe_top_merges", "calendar_spine_fill", "clean_corpus_stats",
    "cosine_topk", "curriculum_quartile_bins", "dedup_by_key_latest",
    "dedup_components", "disjunctive_revenue", "doc_top_keyword",
    "embedding_near_dup", "exact_dedup_groups", "fuzzy_code_match_blocked",
    "fuzzy_name_match", "incremental_ingest_dedup", "langid_confusion",
    "linear_interpolate_prices", "lsh_bucket_histogram",
    "minhash_lsh_candidates", "near_dup_jaccard", "null_safe_join",
    "pack_token_batches", "pareto_front_parts", "revenue_decile_profile",
    # (the five round-5-changed names that were re-queued here — salted_
    # token_vocabulary, semantic_dedup_clusters, rolling_corr_price_qty,
    # equidepth_histogram, price_percentiles — got fresh green r5 rows
    # and now live in the r5 block above)
    "rolling_median_price", "simhash_fingerprints",
    "spatial_neighbor_pairs", "text_fingerprint", "text_langid_agreement",
    "text_quality_score", "text_token_stats", "tfidf_top_terms",
    "token_pmi_pairs", "top_returning_customers", "udtf_chunk_documents",
    "unigram_logprob_score", "vector_norm_stats", "vocab_coverage_curve",
    "winsorized_price_stats", "zipf_slope_fit",
    # --- r1-r3 union ---
    "anti_join_unregistered", "approx_distinct_users",
    "approx_quantiles_bounded", "asof_join_events", "below_avg_qty_revenue",
    "benford_first_digit", "conditional_replace", "corr_matrix_lineitem",
    "cube_qty", "cumsum_rank", "customer_order_distribution",
    "cyclical_features", "date_functions", "distinct_conditional_agg",
    "distinct_pairs", "except_all",
    "filter_retention_window", "fk_broadcast_lookup",
    "forecast_revenue_change", "forward_fill_prices", "groupby_last_update",
    "grouping_sets_qty", "histogram_totalprice", "hll_mergeable_rollup",
    "intersect_all_multiset", "json_extract_coalesce", "lag_delta",
    "minmax_scale", "mom_revenue_growth", "pivot_status_qty",
    "price_qty_regression", "pricing_summary",
    "priority_count_late", "range_join_shipping_delay", "rank_analytics",
    "recursive_supplier_chain", "regex_validated_filter", "revenue_by_nation",
    "revenue_share_by_nation", "rolling_avg_price", "rolling_high_low", "rollup_qty", "scd2_order_intervals",
    "select_project_filter", "semi_join_active", "set_ops", "sql_surface",
    "staleness_report", "time_split_folds", "top_unshipped_revenue",
    "topk_orders", "topk_per_group", "trailing_30d_revenue",
    "unpivot_flag_metrics", "value_counts", "value_stats",
    "window_rownum_dedup",
})



#: Names that have never received a driver-side CORRECTNESS row.
#: Empty as of round 11: the CORRECTNESS_r10 sample covered all 28
#: previously-never-sampled names, closing the union at 377/377.
NEVER_SAMPLED = frozenset()

#: Round-13 names needing a (fresh) driver row. r13 is an OPTIMIZATION
#: round: no semantics changed anywhere (every name below is declared
#: result-identical and was verified against the DuckDB oracle at
#: sf0.001/0.01/0.1 during the round) — but these are the queries whose
#: PHYSICAL PLANS were restructured, so they are exactly the rows where
#: a fresh driver-side CORRECTNESS row carries the most signal.
#: (All r12 new/changed names got green rows in CORRECTNESS_r12.json
#: and moved into DRIVER_SAMPLED.)
ROUND_CHANGED = frozenset({
    # graph-ANN: shared entry beam, fused bucket+norm frame, exploded
    # capped-pairs pipeline, stale/touched checkpoint elisions
    "ann_graph_build", "ann_graph_topk", "ann_graph_recall_eval",
    "ann_graph_repair_recall",
    # components-loop consumers: round-0 sum seed + symmetric input
    "grid_dbscan_embeddings", "dedup_components",
    "near_dup_survivorship_by_source", "semantic_dedup_clusters",
    # single-scan / selection restructures
    "theil_sen_trend_daily_revenue", "cms_frequency_estimates",
    "hll_mergeable_rollup", "granger_causality_f",
    # vectorized H.264 kernels (bit-identical streams, verified)
    "media_h264_bframe_decode", "media_h264_gop_decode",
    "media_h264_intra_decode", "media_probe_summary",
})

#: r12's driver sample rotated these out (they have older green rows
#: but no r12 row); VERDICT r12 #10 asks that they come right after the
#: round-changed names so the verified union stays closed.
ROUND_ROTATED_OUT = frozenset({
    "ann_ivf_retrain_drift", "dsir_importance_selection",
    "kcenter_coreset_selection", "media_dhash_cross_format_dedup",
    "media_id3_tags", "minhash_recall_eval",
    "winnowing_candidate_pairs",
})


def _ordered_names() -> list[str]:
    """Sampling-priority order for the driver's ~50-query prefix
    sampler: names with NO driver row ever first, then this round's
    plan-restructured names, then the names the previous sample
    rotated out, then the verified rest (registry order within each
    tier)."""
    names = list(REGISTRY)

    def tier(n: str) -> int:
        if n in NEVER_SAMPLED:
            return 0
        if n not in DRIVER_SAMPLED:
            return 1  # no driver row ever — front outright
        if n in ROUND_CHANGED:
            return 2  # plan restructured this round — re-verify first
        if n in ROUND_ROTATED_OUT:
            return 3  # keep the cross-round union closed
        return 4

    return sorted(names, key=lambda n: (tier(n), names.index(n)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries get
    the driver's weaker rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
