"""Invariant tests for the drift / robust-stats family: each
statistic must live inside its mathematical bounds on real data —
the oracle gate proves cross-engine equality, these prove the
numbers mean what they claim (an identical-on-both-engines bug
would pass parity; it cannot pass a bounds law)."""

from __future__ import annotations

from cricket_analytics_nosql_spark.operators.drift import (
    benford_first_digit,
    gini_customer_revenue,
    ks_drift_orders,
    lorenz_deciles,
    mad_outlier_orders,
    psi_value_drift,
    revenue_autocorr_lag1,
    token_entropy_kl,
    winsorized_segment_stats,
)


def test_ks_stat_bounds(spark, sf_small):
    r = ks_drift_orders(spark, sf_small).collect()[0]
    assert 0.0 <= r.ks_stat <= 1.0
    assert r.d_num <= r.n_a * r.n_b
    assert r.n_a > 0 and r.n_b > 0


def test_entropy_and_kl_nonnegative(spark, sf_small):
    rows = token_entropy_kl(spark, sf_small).collect()
    assert rows
    for r in rows:
        # uniform-over-n_terms is the entropy ceiling
        import math

        assert -1e-4 <= r.entropy_nats <= math.log(r.n_terms) + 1e-4
        # Gibbs: KL >= 0 (micro-nat rounding can dip a hair under)
        assert r.kl_vs_corpus >= -1e-4


def test_psi_nonnegative(spark, sf_small):
    r = psi_value_drift(spark, sf_small).collect()[0]
    assert r.psi >= -1e-4
    assert r.n_bins == 10
    assert r.n_era_a > 0 and r.n_era_b > 0


def test_mad_outlier_rate_bounded(spark, sf_small):
    r = mad_outlier_orders(spark, sf_small).collect()[0]
    # MAD fences cannot flag half the data (median deviation is
    # inside any k>1 fence by construction)
    assert 0.0 <= r.outlier_rate < 0.5
    assert r.mad_dollars > 0


def test_winsorized_mean_inside_bounds(spark, sf_small):
    for r in winsorized_segment_stats(spark, sf_small).collect():
        assert r.p05_dollars <= r.winsorized_avg <= r.p95_dollars


def test_benford_shares_and_chi(spark, sf_small):
    rows = benford_first_digit(spark, sf_small).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-3
    assert all(r.chi_square_total >= 0 for r in rows)
    # all 9 rows carry the same total
    assert len({r.chi_square_total for r in rows}) == 1


def test_gini_and_lorenz_consistency(spark, sf_small):
    g = gini_customer_revenue(spark, sf_small).collect()[0]
    assert 0.0 <= g.gini < 1.0
    rows = lorenz_deciles(spark, sf_small).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    cum = [r.cum_share for r in rows]
    assert all(b >= a for a, b in zip(cum, cum[1:]))  # nondecreasing
    assert abs(cum[-1] - 1.0) < 1e-6
    # deciles are ascending-revenue, so shares must be nondecreasing
    shares = [r.share for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(shares, shares[1:]))
    assert g.total_dollars == sum(r.revenue_dollars for r in rows)


def test_autocorr_in_unit_interval(spark, sf_small):
    r = revenue_autocorr_lag1(spark, sf_small).collect()[0]
    assert -1.0 <= r.autocorr_lag1 <= 1.0
    assert r.n_days > 100


def test_transition_rows_normalize(spark, sf_small):
    from collections import defaultdict

    from cricket_analytics_nosql_spark.operators.sequences import (
        event_transition_probs,
    )

    rows = event_transition_probs(spark, sf_small).collect()
    by_prev = defaultdict(float)
    for r in rows:
        assert 0.0 < r.p <= 1.0
        by_prev[r.prev_type] += r.p
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-3, (prev, s)


def test_trend_pearson_bounds(spark, sf_small):
    from cricket_analytics_nosql_spark.operators.drift import (
        trend_slope_by_segment,
    )

    rows = trend_slope_by_segment(spark, sf_small).collect()
    assert len(rows) == 5  # the five TPC-H market segments
    for r in rows:
        assert -1.0 <= r.pearson_r <= 1.0


def test_decayed_value_never_exceeds_raw(spark, sf_small):
    from cricket_analytics_nosql_spark.operators.training import (
        decayed_user_value,
    )

    for r in decayed_user_value(spark, sf_small).collect():
        # exp(-λ·age) ≤ 1 with age ≥ 0, so decay can only shrink
        assert r.decayed_dollars <= r.raw_dollars + 1e-6


def test_ngram_search_nonempty_and_exact(spark, sf_small):
    """The index path must be non-vacuous (pattern occurs) and every
    returned doc must truly contain the pattern."""
    from cricket_analytics_nosql_spark.operators.text import (
        NGRAM_SEARCH_PATTERN,
        ngram_index_search,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    got = {r.doc_id for r in ngram_index_search(spark, sf_small).collect()}
    assert got, "pattern must occur in the corpus or the test is vacuous"
    texts = dict(
        load_table(spark, sf_small, "documents")
        .select("doc_id", "text")
        .collect()
    )
    for d in got:
        assert NGRAM_SEARCH_PATTERN in texts[d]


def test_forecast_backtest_sane(spark, sf_small):
    from cricket_analytics_nosql_spark.operators.drift import (
        forecast_backtest_naive,
    )

    r = forecast_backtest_naive(spark, sf_small).collect()[0]
    assert r.n_days > 100
    assert r.mae_dollars >= abs(r.bias_dollars)  # MAE bounds |bias|
    assert r.mape_pct > 0


def test_zipf_slope_negative_and_fit_strong(spark, sf_small):
    from cricket_analytics_nosql_spark.operators.drift import zipf_fit_tokens

    r = zipf_fit_tokens(spark, sf_small).collect()[0]
    assert r.zipf_slope < 0  # frequency falls with rank, always
    assert -1.0 <= r.fit_r < 0  # correlation matches the slope sign


def test_hhi_bounds(spark, sf_small):
    from cricket_analytics_nosql_spark.operators.analytics import (
        HHI_MIN_SUPPLIERS,
        supplier_hhi_topk,
    )

    for r in supplier_hhi_topk(spark, sf_small).collect():
        assert r.n_suppliers >= HHI_MIN_SUPPLIERS
        # HHI of n equal shares is 1/n; of one dominant share → 1
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-6


def test_churn_ledger_balances(spark, sf_small):
    from cricket_analytics_nosql_spark.operators.analytics import (
        customer_churn_matrix,
    )

    rows = customer_churn_matrix(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.n_retained + r.n_churned == r.n_active
        assert 0.0 <= r.retention_rate <= 1.0


def test_latency_percentiles_ordered(spark, sf_small):
    from cricket_analytics_nosql_spark.operators.analytics import (
        ship_latency_stats,
    )

    rows = ship_latency_stats(spark, sf_small).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.median_days <= r.p90_days <= r.max_days


def test_return_rate_bounds(spark, sf_small):
    from cricket_analytics_nosql_spark.operators.analytics import (
        return_rate_by_brand,
    )

    for r in return_rate_by_brand(spark, sf_small).collect():
        assert 0.0 <= r.return_rate <= 1.0
        assert r.n_returned <= r.n_lines
