"""Driver-facing catalog: merges every module's QUERIES registry.

``__spark_entry__.py`` derives its ``queries()`` / ``oracle_sql()``
dicts from here; tests iterate the same registry so the in-repo
parity suite and the driver's correctness gate check the same thing.

SURVEY.md §2 inventory ids not represented by a query, by design:
- F3 (``UNWIND $rows`` client batch unnest) — an artifact of the
  reference's client/server parameter batching; Spark DataFrames are
  already distributed rows, there is nothing to unnest.
- J5 (Mongo→Neo4j cross-store handoff join) — eliminated: one
  engine, one storage layer; the same joins are plain DataFrame
  joins (J1-J4, J6).
- S9 (connectivity smoke) — ≙ the driver's own ``entry()`` smoke
  check plus the session fixture in tests/conftest.py.
"""

from __future__ import annotations

from cricket_analytics_nosql_spark.operators.spec import QuerySpec

# The driver's correctness gate checks the FIRST 50 catalog entries.
# Rounds 1-6 rotated 240 queries through that window; all 240 are
# hash-green at latest status (CORRECTNESS_r06 flipped the 8 round-5
# oracle-typing reds green — zero red remain).  The catalog grew to
# 410 in round 7 (16 operators early in the round + 24 in the second
# wave + 14 in the third + a fourth wave of 22 + a fifth of 16 + a
# sixth wave of 31); the newcomers register AFTER the window boundary
# so the round-7 window below is untouched — they queue for the
# round-8 windows (123 + canaries, three windows).
# Round-7 window (VERDICT.md r6 item 1): the 47 queries that have
# never had a driver row — the 39 round-6 operator additions plus 8
# low-information A1-family shapes deferred from r6 — fit in exactly
# one window with 3 green canaries (47 + 3 = 50).  Every one is
# already hash-green in the in-repo DuckDB parity sweep at
# sf0.001/0.01/0.1; a green CORRECTNESS_r07 completes driver
# validation of every pre-round-7 entry (287/287 of the pre-r7
# catalog).
# Rotated at round START, before any driver run, and not touched
# mid-round (the driver reads the window at round END).
# Entries past position 50 keep their green rows from earlier
# rounds; queries not listed keep registry order after the window.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # ---- the 47 never-driver-checked queries ----
    # 8 A1-family shapes deferred from the round-6 window
    "activity_heatmap",
    "embedding_norm_stats",
    "degree_distribution",
    "supplier_hhi_topk",
    "ship_latency_stats",
    "discount_band_elasticity",
    "basket_lines_histogram",
    "embedding_outlier_topk",
    # 39 round-6 operator additions
    "wcc_components",
    "mann_whitney_drift",
    "spearman_price_qty",
    "dsir_importance_weights",
    "temporal_reach_2hop",
    "mixture_budget_waterfill",
    "quantile_treatment_effect",
    "sax_revenue_motifs",
    "vocab_coverage_curve",
    "theil_sen_trend",
    "conformal_forecast_interval",
    "pmi_top_pairs",
    "mmr_diverse_topk",
    "roc_auc_langid",
    "calibration_bins_langid",
    "pca_top_component",
    "ann_ndcg_audit",
    "cov_state_merge_audit",
    "dedup_substring_spans",
    "leakage_safe_split",
    "logreg_quality_train",
    "k_anonymity_audit",
    "ols_price_model",
    "skipgram_pairs",
    "adamic_adar_linkpred",
    "doremi_mixture_weights",
    "range_partition_planner",
    "quantile_sketch_merge_audit",
    "lsh_threshold_sweep",
    "matryoshka_truncation_audit",
    "negative_sampling_table",
    "ann_filtered_search",
    "bitmap_distinct_users",
    "stream_histogram_monitor",
    "rbo_rank_stability",
    "stream_distinct_monitor",
    "pit_feature_assembly",
    "kaplan_meier_repeat",
    "sprt_ab_monitor",
    # ---- green canaries (positions 48-50) ----
    "top_revenue_customers",
    "dedup_minhash_lsh",
    "stream_tumbling_agg",
    # ---- position 50 boundary ----
    # Round-6 window order preserved below for artifact traceability
    # (all green in CORRECTNESS_r06).
    "activity_streaks",
    "interval_merge_coverage",
    "ab_conversion_wilson",
    "cep_funnel_pattern",
    "stream_cep_monitor",
    "ks_drift_orders",
    "token_entropy_kl",
    "mad_outlier_orders",
    "ppr_supplier_recs",
    "ppr_supplier_recs_weighted",
    "ann_pq",
    "pipeline_stage_retention",
    "multimodal_pipeline_e2e",
    "hard_negative_mining",
    "semantic_decontaminate",
    "curriculum_order",
    "cluster_topic_profile",
    "user_behavior_entropy",
    "key_skew_profile",
    "funnel_by_segment",
    "user_saturation_curve",
    "repeat_purchase_interval",
    "cohort_ltv_curve",
    "return_rate_by_brand",
    "nation_trade_balance",
    "revenue_autocorr_lag1",
    "gini_customer_revenue",
    "lorenz_deciles",
    "trend_slope_by_segment",
    "cusum_changepoint",
    "event_transition_probs",
    "time_to_convert_stats",
    "harmonic_centrality_2hop",
    "kcore_trade_survivors",
    "rrf_fuse_search",
    "ngram_index_search",
    "embedding_collapse_audit",
    "decayed_user_value",
    "stream_transition_monitor",
    "jsonl_export_roundtrip",
    "dedup_containment",
    "dp_noisy_segment_counts",
    "source_overlap_matrix",
    "mongo_pipeline_search",
    "forecast_backtest_naive",
    "zipf_fit_tokens",
    "customer_churn_matrix",
    "anova_weekday_revenue",
    "bpe_tokenize_stats",
    "forget_users_cascade",
    "mongo_pipeline_group_topk",
)


def all_queries() -> dict[str, QuerySpec]:
    # local imports: keep catalog import cheap and cycle-free
    from cricket_analytics_nosql_spark.operators import (
        analytics,
        bpe,
        cricket,
        dedup,
        drift,
        entity,
        graph,
        joins,
        layout,
        multimodal,
        pysurface,
        quality,
        relational,
        runtime_filters,
        sampling,
        sequences,
        setops,
        similarity,
        sinks,
        skew,
        sketches,
        text,
        training,
        versioning,
        windows,
    )

    from cricket_analytics_nosql_spark.plans import driver_queries as plan_queries
    from cricket_analytics_nosql_spark.streaming import events as streaming_events
    from cricket_analytics_nosql_spark.streaming import stateful as streaming_stateful

    registry: dict[str, QuerySpec] = {}
    for module in (
        relational,
        analytics,
        joins,
        windows,
        setops,
        sequences,
        graph,
        sketches,
        text,
        bpe,
        sampling,
        dedup,
        drift,
        entity,
        similarity,
        multimodal,
        skew,
        runtime_filters,
        training,
        versioning,
        layout,
        quality,
        cricket,
        sinks,
        pysurface,
        plan_queries,
        streaming_events,
        streaming_stateful,
    ):
        overlap = registry.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        registry.update(module.QUERIES)

    ordered: dict[str, QuerySpec] = {}
    for name in _WINDOW_PRIORITY:
        if name in registry:
            ordered[name] = registry[name]
    for name, spec in registry.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
