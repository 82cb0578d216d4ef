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
# Rounds 1-4 rotated the relational block, then the graph/text/dedup/
# ANN/multimodal/mongo/streaming block, through that window — every
# windowed query landed hash-green (CORRECTNESS_r02-r04).  This
# round's window:
# (a) the 7 queries that FLIPPED from rows-only/no_oracle to oracled
#     this round (cricket_pipeline's DuckDB ETL replay, the unrolled
#     PageRank recurrence x2, the ANN/SimHash recall audits) — they
#     already have driver rows, but the point of the flip is a HASH
#     row, so they go first;
# (b) the never-driver-checked set in round-4 priority order (the 36
#     round-4 gate-overflow queries, then the round-4/5 additions).
# Entries past position 50 rotate into round 6's window; nothing is
# dropped — queries not listed keep registry order after the window.
_WINDOW_PRIORITY: tuple[str, ...] = (
    "cricket_pipeline",
    "pagerank_top",
    "pagerank_top_weighted",
    "ann_ivf",
    "ann_ivf_kmeans",
    "ann_lsh",
    "dedup_simhash",
    "sql_udf_revenue",
    "multimodal_phash_dedup",
    "activity_streaks",
    "interval_merge_coverage",
    "market_basket_lift",
    "value_histogram",
    "ab_conversion_wilson",
    "lateral_topk_customers",
    "orc_roundtrip",
    "bpe_vocab_merges",
    "asof_join_tolerance",
    "chi_square_assoc",
    "cms_user_counts",
    "training_pipeline_e2e",
    "rolling_median_revenue",
    "boilerplate_chunks",
    "weighted_sample_docs",
    "rfm_segments",
    "revenue_growth_wow",
    "topk_with_ties",
    "event_trigrams",
    "source_drift_cosine",
    "hll_rollup_distinct",
    "incremental_dedup_ingest",
    "stream_ewma_monitor",
    "bm25_search",
    "sssp_weighted",
    "lpa_communities",
    "cep_funnel_pattern",
    "bootstrap_order_value",
    "feature_hashing",
    "dedup_jaccard_prefix",
    "gap_fill_interpolate",
    "embedding_covariance_topk",
    "local_clustering_topk",
    "stream_cep_monitor",
    "multi_touch_attribution",
    "ks_drift_orders",
    "token_entropy_kl",
    "mad_outlier_orders",
    "winsorized_segment_stats",
    "psi_value_drift",
    "benford_first_digit",
    "revenue_autocorr_lag1",
    "gini_customer_revenue",
    "lorenz_deciles",
    "trend_slope_by_segment",
    "cusum_changepoint",
    "user_behavior_entropy",
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
    "key_skew_profile",
    "source_overlap_matrix",
    "funnel_by_segment",
    "activity_heatmap",
    "user_saturation_curve",
    "repeat_purchase_interval",
    "embedding_norm_stats",
    "degree_distribution",
    "mongo_pipeline_search",
    "cohort_ltv_curve",
    "forecast_backtest_naive",
    "zipf_fit_tokens",
    "supplier_hhi_topk",
    "ship_latency_stats",
    "return_rate_by_brand",
    "customer_churn_matrix",
    "discount_band_elasticity",
    "basket_lines_histogram",
    "nation_trade_balance",
    "anova_weekday_revenue",
    # round-5 additions (never driver-checked; rotate in at round 6)
    "ppr_supplier_recs",
    "ppr_supplier_recs_weighted",
    "ann_pq",
    "pipeline_stage_retention",
    "multimodal_pipeline_e2e",
    "hard_negative_mining",
    "semantic_decontaminate",
    "curriculum_order",
    "cluster_topic_profile",
    # green canaries (only reached if the window has room)
    "top_revenue_customers",
    "dedup_minhash_lsh",
    "stream_tumbling_agg",
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
