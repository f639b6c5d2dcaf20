"""Central query catalog: merges per-module registries into the
``queries()`` / ``oracle_sql()`` surface consumed by __spark_entry__.py.

Each registry entry: name -> {"fn": (spark, sf_dir) -> DataFrame,
"sql": DuckDB-runnable ANSI SQL or None for non-SQL-expressible ops}.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registries() -> list[dict]:
    regs = []
    from de4ml_spark.queries import relational

    regs.append(relational.REGISTRY)
    for modname in (
        "relational2",
        "relational3",
        "tpch2",
        "etlq",
        "profileq",
        "profileq2",
        "streamq",
        "dedupq",
        "simq",
        "textq",
        "textq2",
        "textq3",
        "textq4",
        "samplingq",
        "mldataq",
        "mldataq2",
        "mldataq3",
        "pipelineq",
        "searchq",
        "tsq",
        "tsq2",
        "graphq",
        "tpch3",
        "sketchq",
        "statq",
        "statq2",
        "statq3",
        "statq4",
        "statq5",
        "statq6",
        "mldataq4",
        "mldataq5",
        "mldataq6",
    ):
        try:
            mod = __import__(f"de4ml_spark.queries.{modname}", fromlist=["REGISTRY"])
            regs.append(mod.REGISTRY)
        except ImportError:
            pass
    return regs


# Catalog iteration order. The driver's correctness harness grades a
# 50-entry PREFIX of this list per round, so ordering decides which
# queries get fresh cross-engine evidence each round.
#
# Round-16 rotation (VERDICT r15 #1): prefix = the 25 r8-remainder
# entries + the 25 oldest r9 entries. The round-15 graded prefix (50
# entries, all green in CORRECTNESS_r15.json: 31 r7-remainder + 19
# oldest r8) moves to the back of the queue as r15 evidence.
#
# Evidence-age ledger (latest driver-graded round per entry, updated at
# round-16 start from CORRECTNESS_r15.json): r8: 25   r9: 49   r10: 50
# r11: 50   r12: 50   r13: 50   r14: 50   r15: 50   (total 374).
# After round-16 grading the ledger becomes r9: 24   r10: 50   r11: 50
# r12: 50   r13: 50   r14: 50   r15: 50   r16: 50.
# Round-17 prefix plan: the 24 r9-remainder entries, then the 26
# oldest r10 entries — the blocks below are already in that order, so
# the only round-17 edit needed is moving this round's graded 50-entry
# prefix to the back of the queue (plus any new entries, which always
# land at the head).
PRIORITY = [
    # -- round-16 graded prefix part 1: the 25 r8-remainder entries
    "parse_event_props",
    "pii_scrub_docs",
    "profile_drift_events",
    "q12_ship_delay_priority",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_waiting_supplier",
    "q22_idle_customers",
    "q8_market_share",
    "quality_docs",
    "reconcile_decisions_rewards",
    "repeat_purchasers",
    "sample_docs",
    "session_stats",
    "sessionize_events",
    "split_events",
    "temperature_mix_rates",
    "text_stats_docs",
    "trailing_7d_revenue",
    "weighted_sample_docs",
    "winnow_fingerprint_docs",
    "adaptive_alert_windows",
    "asof_click_view",
    "cdc_chunk_docs",
    "cdc_dedup_chunks",
    # -- round-16 graded prefix part 2: the 25 oldest r9 entries
    #    (prefix boundary after "power_law_alpha_parts")
    "quantile_normalize_docs",
    "rfm_segments_customers",
    "pareto_revenue_parts",
    "kcore_parts",
    "welch_ttest_value",
    "anova_value_types",
    "cramers_v_events",
    "auc_roc_events",
    "spearman_quantity_price",
    "lift_deciles_events",
    "woe_iv_events",
    "cohens_kappa_docs",
    "js_divergence_sources",
    "kendall_tau_events",
    "psi_value_drift",
    "brier_decomposition_events",
    "rolling_median_user_value",
    "khop_reach_parts",
    "pr_auc_events",
    "brown_forsythe_value",
    "runs_test_value",
    "life_table_retention",
    "permutation_entropy_events",
    "rake_keywords_docs",
    "power_law_alpha_parts",
    # -- refresh queue: latest driver evidence round 9 (remainder, 24
    #    entries -> round-17 prefix part 1)
    "hurst_value_events",
    "friedman_daily_value",
    "grubbs_value_events",
    "cochran_q_docs",
    "mcnemar_docs",
    "jonckheere_value",
    "cochran_armitage_trend",
    "goertzel_weekly_events",
    "rich_club_parts",
    "simpson_diversity_sources",
    "silhouette_embeddings",
    "ndcg_at_k_orders",
    "ece_events",
    "gumbel_weekly_maxima",
    "theil_index_parts",
    "hhi_supplier_revenue",
    "katz_centrality_parts",
    "term_burstiness_docs",
    "interarrival_burstiness_events",
    "mann_kendall_daily_events",
    "turning_points_value",
    "bartlett_value_types",
    "jarque_bera_value",
    "durbin_watson_daily_events",
    # -- refresh queue: latest driver evidence round 10
    "g_test_events",
    "wilcoxon_signed_daily",
    "ks_two_sample_value",
    "mood_median_value",
    "pettitt_change_daily",
    "cusum_change_daily",
    "theil_sen_daily",
    "ccf_daily_lags",
    "pacf_daily",
    "poincare_sd_daily",
    "haar_energy_daily",
    "sample_entropy_daily",
    "bartels_rank_daily",
    "cox_stuart_daily",
    "logrank_test_retention",
    "odds_ratio_docs",
    "mrr_popularity_orders",
    "association_rules_parts",
    "lin_ccc_orders",
    "partial_corr_lineitem",
    "yule_k_docs",
    "ttr_hapax_docs",
    "flesch_reading_docs",
    "hellinger_sources",
    "lognormal_fit_price",
    "ww_runs_two_sample",
    "hodges_lehmann_daily",
    "page_trend_daily",
    "gamma_somers_lineitem",
    "weighted_kappa_docs",
    "mantel_haenszel_docs",
    "ols_daily_trend",
    "breusch_pagan_daily",
    "kendalls_w_daily",
    "kuiper_two_sample_value",
    "cvm_two_sample_value",
    "cronbach_alpha_daily",
    "icc_daily_types",
    "energy_distance_value",
    "seasonal_forecast_daily",
    "chow_break_daily",
    "fuzzy_name_pairs_parts",
    "theil_l_parts",
    "brand_modularity_parts",
    "quade_daily_value",
    "markov_entropy_rate",
    "ansari_bradley_value",
    "fligner_policello_value",
    "anderson_darling_value",
    "granger_clicks_purchases",
    # -- refresh queue: latest driver evidence round 11 (the round-11
    #    graded prefix: 34 former-never + 3 pairhist re-grades + 13 r4)
    "blomqvist_beta_lineitem",
    "gk_lambda_dow_type",
    "heaps_law_sources",
    "newey_west_daily",
    "runs_updown_daily",
    "brand_assortativity_parts",
    "participation_ratio_embeddings",
    "mean_pairwise_dot_embeddings",
    "ams_f2_sketch_events",
    "weibull_fit_user_lifetimes",
    "hoeffding_d_lineitem",
    "bowker_symmetry_transitions",
    "gwet_ac1_docs",
    "moran_geary_parts",
    "poisson_bootstrap_value_mean",
    "two_way_anova_daily",
    "trimmed_mean_value_types",
    "chapman_overlap_sources",
    "vocab_jaccard_sources",
    "brunner_munzel_value",
    "dunn_posthoc_value_types",
    "seasonal_mann_kendall_daily",
    "cucconi_value",
    "uncertainty_coeff_dow_type",
    "youden_threshold_value",
    "keyness_terms_sources",
    "mahalanobis_anomalous_days",
    "burrows_delta_sources",
    "cohens_d_value",
    "mcc_threshold_value",
    "ewma_chart_daily",
    "benford_second_digit_totalprice",
    "distance_correlation_lineitem",
    "clustering_summary_parts",
    "mann_whitney_value",
    "cliffs_delta_value",
    "emd_value_types",
    "conversion_latency_stats",
    "corpus_pipeline_report",
    "ctr_per_user",
    "dedup_canonicalize",
    "dedup_components",
    "dedup_exact_docs",
    "dedup_incremental",
    "dedup_minhash_recall",
    "dedup_ngram_jaccard",
    "dedup_source_matrix",
    "delayed_join_events",
    "embedding_norm_outliers",
    "equidepth_price_histogram",
    # -- refresh queue: latest driver evidence round 12 (the round-12
    #    graded prefix: 28 r4-evidence + 22 oldest-r5-evidence entries,
    #    all green in CORRECTNESS_r12.json)
    "ewma_user_daily",
    "fuzzy_name_pairs",
    "key_skew_orders",
    "kfold_events",
    "knn_ivf",
    "knn_lsh_recall",
    "label_balance_embeddings",
    "length_bucket_batches",
    "mad_price",
    "max_event_gap_users",
    "novelty_docs",
    "pack_sharded",
    "pattern_match_events",
    "phrase_search_docs",
    "pmi_bigrams",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "quality_rank_normalized",
    "repetition_docs",
    "reservoir_docs",
    "session_alert_overlap",
    "stratified_split_docs",
    "temporal_split_leakage",
    "timed_funnel_events",
    "top3_orders_per_customer",
    "vocab_top_terms",
    "winsorized_price_stats",
    "daily_heavy_hitters",
    "dedup_graph_degrees",
    "source_vocab_overlap",
    "rolling_7d_active_users",
    "event_transition_matrix",
    "incident_window_events",
    "gopher_rules_docs",
    "split_leakage_embeddings",
    "unpivot_part_metrics",
    "scd2_user_event_type",
    "pack_sequence_report",
    "profile_to_rules_events",
    "categorical_drift_tvd",
    "iqr_outliers_events",
    "profile_lineitem",
    "pit_features_orders",
    "decontaminate_fraction_docs",
    "rate_limit_events",
    "twap_user_value",
    "ohlc_daily_value",
    "nearest_view_per_click",
    "fk_integrity_orders_lineitem",
    # -- refresh queue: latest driver evidence round 13 (the
    #    round-13 graded prefix: 21 r12 entries + 17 r5-remainder +
    #    12 oldest r6)
    "giant_component_parts",
    "breslow_day_docs",
    "kpss_daily_events",
    "adf_daily_events",
    "variance_ratio_daily_events",
    "delong_auc_variance_events",
    "krippendorff_alpha_docs",
    "hyperanf_parts",
    "qn_scale_value",
    "cuped_user_value",
    "anf_closeness_parts",
    "hill_tail_value",
    "yuen_trimmed_ttest_value",
    "km_greenwood_retention",
    "median_of_means_value",
    "siegel_slope_daily",
    "phillips_perron_daily",
    "cusum_squares_daily",
    "arch_lm_daily",
    "contamination_span_docs",
    "wasserstein2_value",
    "weighted_median_price",
    "knn_ivf_recall",
    "validation_counts_lineitem",
    "alert_windows_events",
    "churned_purchasers",
    "corr_lineitem",
    "events_dau",
    "events_pivot",
    "funnel_events",
    "histogram_quantity",
    "hourly_seasonality_events",
    "last_reward_events",
    "latest_event_per_user",
    "limit_fetch_events",
    "monthly_revenue_ma",
    "multimodal_meta",
    "orders_price_page",
    "ks_drift_value",
    "epoch_mix_plan",
    "quota_admission_events",
    "capped_sessions_events",
    "throttle_events",
    "tfidf_top_terms",
    "tfidf_doc_similarity",
    "unigram_logprob_docs",
    "bigram_logprob_docs",
    "bm25_search_docs",
    "pagerank_copurchase_parts",
    "q2_min_cost_supplier",
    # -- round-14 graded prefix (moved to back as r14 evidence):
    #    the 35 r6-remainder entries + the 15 oldest r7 entries
    "q11_important_stock",
    "q20_potential_promo",
    "kmv_distinct_users",
    "countmin_event_types",
    "kl_drift_event_type",
    "entropy_by_source",
    "cusum_alarm_value",
    "benford_audit_totalprice",
    "trend_by_event_type",
    "neyman_allocation_events",
    "weighted_reservoir_docs",
    "rolling_corr_view_click",
    "orders_priority_counts",
    "orders_rollup",
    "override_anti_events",
    "part_type_stats",
    "price_decile_stats",
    "q10_returned_revenue",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q4_late_orders",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "retention_cohorts",
    "sliding_window_events",
    "suppliers_per_region",
    "topk_values_orders",
    "value_quartiles_by_type",
    "anomalous_days_events",
    "chunk_docs",
    "clean_corpus",
    "decontaminate_docs",
    "dedup_cluster_sizes",
    "nelson_aalen_retention",
    "q9_product_profit",
    "rollup_cascade_events",
    "q16_supplier_cnt",
    "hll_distinct_users",
    "m4_downsample_value",
    "gapfill_interp_user_daily",
    "chi2_ab_events",
    "calibration_bins_events",
    "bloom_decontaminate_docs",
    "mutual_info_events",
    "ppjoin_docs",
    "assoc_rules_parts",
    "audience_overlap_events",
    "triangle_count_parts",
    # -- refresh queue: latest driver evidence round 15 (the round-15
    #    graded prefix: 31 r7-remainder + 19 oldest r8, all green in
    #    CORRECTNESS_r15.json)
    "ltv_triangle_orders",
    "label_centroid_distances",
    "plus4_ctr_bounds",
    "kaplan_meier_retention",
    "attribution_credit_events",
    "jaccard_copurchase_parts",
    "degree_assortativity_parts",
    "oof_target_encode_events",
    "feature_hash_docs",
    "negative_samples_orders",
    "mase_seasonal_events",
    "conformal_bound_events",
    "changepoint_value_events",
    "loso_source_influence_docs",
    "sprt_ctr_deciles",
    "theil_sen_trend_events",
    "isotonic_ctr_deciles",
    "stl_decompose_events",
    "ccf_view_click_events",
    "dedup_embedding_blocked",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_dim_stats",
    "events_cube",
    "fingerprint_docs",
    "gapfill_user_daily",
    "knn_bruteforce",
    "knn_lsh",
    "knn_rrf_fusion",
    "lang_confusion_docs",
    "map_at_k_orders",
    "zipf_slope_docs",
    "popularity_hitrate_orders",
    "gini_revenue_parts",
    "embedding_covariance",
    "grid_density_clusters",
    "markov_next_event_accuracy",
    "kruskal_wallis_value",
    "acf_value_events",
    "ljung_box_value_events",
    "seasonal_strength_events",
    "hits_bipartite_orders",
    "logrank_retention_cohorts",
    "fano_burstiness_events",
    "cluster_purity_embeddings",
    "lang_id_docs",
    "lineitem_measure_stats",
    "mix_docs",
    "pack_training_sequences",
]


def _ordered(items: dict) -> dict:
    rank = {n: i for i, n in enumerate(PRIORITY)}
    return dict(
        sorted(items.items(), key=lambda kv: rank.get(kv[0], len(rank)))
    )


# Prepared-plan cache: catalog callables are pure builders (DataFrame =
# immutable logical plan; any driver-side collect they do — scalar totals,
# IVF centroids — is part of the build), so the built plan is memoized per
# (session, sf_dir, name) like a prepared statement. Repeat invocations in
# a serving session then pay execution only, not re-analysis of a plan
# that can take 0.3-2.7 s of driver time to rebuild. Keyed on the session
# token (weakref-based, survives session-id reuse — see session.py).
# LRU-bounded: a long-lived serving session cycling many (session, sf)
# combinations must not grow the driver-side plan map without limit —
# 512 comfortably holds 3 sf dirs x the full catalog; eviction just costs
# a rebuild on the next call.
from collections import OrderedDict

_PLAN_CACHE_MAX = 512
_PLAN_CACHE: "OrderedDict[tuple[int, str, str], DataFrame]" = OrderedDict()


def _release(df: DataFrame) -> None:
    """Best-effort storage release for a frame leaving the cache.
    ``unpersist`` is a no-op on frames that were never persisted, and
    for checkpoint-backed results it drops the cached blocks now
    instead of waiting for ContextCleaner GC. Never raises: the frame
    may belong to an already-stopped session."""
    try:
        df.unpersist(blocking=False)
    except Exception:  # noqa: BLE001 - session may be gone; cache integrity first
        pass


def evict(name: str, sf_dir: str | None = None) -> int:
    """Drop memoized prepared plans for ``name`` (all sessions; only
    for ``sf_dir`` if given) and release their cached blocks; returns
    how many were evicted. The parity sweep calls this before its
    serial re-check of a diverged entry so the retry rebuilds the plan
    from scratch instead of re-collecting a possibly-corrupted
    checkpoint/persisted block (VERDICT r14 #1)."""
    gone = [
        k
        for k in _PLAN_CACHE
        if k[2] == name and (sf_dir is None or k[1] == sf_dir)
    ]
    for k in gone:
        _release(_PLAN_CACHE.pop(k))
    return len(gone)


def _prepared(name: str, fn: Callable) -> Callable:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        from de4ml_spark.session import _session_token

        key = (_session_token(spark), sf_dir, name)
        df = _PLAN_CACHE.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            _PLAN_CACHE[key] = df
            while len(_PLAN_CACHE) > _PLAN_CACHE_MAX:
                # Release on LRU eviction too: long sweeps cycling many
                # (session, sf) combinations must not strand persisted
                # blocks of frames nothing references anymore.
                _release(_PLAN_CACHE.popitem(last=False)[1])
        else:
            _PLAN_CACHE.move_to_end(key)
        return df

    wrapper.__name__ = getattr(fn, "__name__", name)
    wrapper.__doc__ = fn.__doc__
    return wrapper


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for reg in _registries():
        for name, spec in reg.items():
            out[name] = _prepared(name, spec["fn"])
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for reg in _registries():
        for name, spec in reg.items():
            if spec.get("sql"):
                out[name] = spec["sql"]
    return _ordered(out)
