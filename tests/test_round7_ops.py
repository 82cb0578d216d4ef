"""Invariant tests for the round-7 operator additions — properties
the DuckDB oracle parity can't state (it only proves Spark ≡ SQL;
these pin that the MATH does what the operator claims)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_hilbert_walk_is_a_unit_step_bijection():
    """The defining Hilbert property, checked on the COMPLETE 8×8
    grid (3 rounds of the production round SQL): the 64 cells map to
    the 64 distances bijectively, and consecutive distances are
    Manhattan-distance-1 neighbors — the unit-step locality Morton
    lacks (whose seam jumps are why Hilbert blocks skip better).
    Runs the exact `_hilbert_round_sql` text through DuckDB, so the
    property is proven for the same expressions the operator and its
    oracle bind."""
    import duckdb

    from cricket_analytics_nosql_spark.operators.layout import (
        _hilbert_round_sql,
    )

    con = duckdb.connect()
    sql = (
        "SELECT (g.i // 8) AS x0, (g.i % 8) AS y0, (g.i // 8) AS x,"
        " (g.i % 8) AS y, CAST(0 AS BIGINT) AS d"
        " FROM (SELECT UNNEST(range(0, 64)) AS i) g"
    )
    prev = "base"
    ctes = [f"base AS ({sql})"]
    for idx, s in enumerate((4, 2, 1)):
        d_e, x_e, y_e = _hilbert_round_sql(s)
        ctes.append(
            f"r{idx} AS (SELECT x0, y0, ({d_e}) AS d, ({x_e}) AS x,"
            f" ({y_e}) AS y FROM {prev})"
        )
        prev = f"r{idx}"
    walk = con.execute(
        "WITH " + ", ".join(ctes) + f" SELECT x0, y0, d FROM {prev} ORDER BY d"
    ).fetchall()
    assert sorted(r[2] for r in walk) == list(range(64))  # bijection
    for (x1, y1, d1), (x2, y2, d2) in zip(walk, walk[1:]):
        assert d2 == d1 + 1
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (
            f"non-unit step {d1}->{d2}: ({x1},{y1})->({x2},{y2})"
        )


def test_hilbert_layout_covers_same_rows_no_worse_than_morton(
    spark, sf_small
):
    """Layout-level sanity vs Z-order at the same block grain: same
    total row coverage, and the mean bounding-box semi-perimeter is
    no worse. (On this synthetic table both layouts' blocks span the
    full user range at the audit grain, so equality is expected —
    the strict unit-step advantage is pinned structurally above.)"""
    from cricket_analytics_nosql_spark.operators.layout import (
        hilbert_layout,
        zorder_layout,
    )

    def stats(df):
        rows = df.collect()
        n = sum(r.n_events for r in rows)
        span = sum(
            (r.user_max - r.user_min) + (r.hr_max - r.hr_min) for r in rows
        ) / len(rows)
        return n, span

    nh, hspan = stats(hilbert_layout(spark, sf_small))
    nz, zspan = stats(zorder_layout(spark, sf_small))
    assert nh == nz
    assert hspan <= zspan + 1e-9


def test_kcenter_radius_sequence_and_coverage(spark, sf_small):
    """Greedy k-center contract: the selected-point distance sequence
    is non-increasing from step 2 on (each new center is the farthest
    remaining point, and adding centers can only shrink the next max)
    and every corpus point is assigned to exactly one center."""
    from cricket_analytics_nosql_spark.operators.similarity import (
        kcenter_coreset,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = kcenter_coreset(spark, sf_small).collect()
    assert [r.step for r in rows] == [1, 2, 3, 4]
    d = [r.d2_prev for r in rows]
    assert d[0] == 0
    assert d[1] >= d[2] >= d[3] > 0
    n_vecs = load_table(spark, sf_small, "embeddings").count()
    assert sum(r.n_assigned for r in rows) == n_vecs
    # the seed is the lowest vec_id by construction
    assert rows[0].vec_id == 0


def test_blocking_audit_truth_scheme_is_complete(spark, sf_small):
    """The scheme that defines the truth set (same noun) must show
    pair completeness exactly 1.0; every scheme's reduction ratio is
    in (0, 1]; candidate counts are consistent with block counts."""
    from cricket_analytics_nosql_spark.operators.entity import (
        blocking_quality_audit,
    )

    rows = {r.scheme: r for r in blocking_quality_audit(spark, sf_small).collect()}
    assert rows["block_noun"].pair_completeness == 1.0
    for r in rows.values():
        assert 0.0 < r.reduction_ratio <= 1.0
        assert r.cand_pairs >= 0 and r.n_blocks >= 1


def test_fellegi_sunter_weights_consistent(spark, sf_small):
    """Internal consistency of the learned weights: probabilities
    are proper, w_agree carries the sign of ln(m/u) and w_disagree
    the sign of ln((1−m)/(1−u)) — which are always OPPOSITE when
    m ≠ u. (On this synthetic catalog the evidence fields are nearly
    independent of the entity, so m ≈ u and weights sit near zero —
    exactly the 'these fields won't help a linker' readout the audit
    exists to produce; the signal magnitude is data, not contract.)"""
    import math

    from cricket_analytics_nosql_spark.operators.entity import (
        fellegi_sunter_weights,
    )

    rows = fellegi_sunter_weights(spark, sf_small).collect()
    assert {r.field for r in rows} == {"p_brand", "p_type", "p_size"}
    for r in rows:
        assert 0.0 < r.m_prob < 1.0 and 0.0 < r.u_prob < 1.0, r
        expect_agree = round(math.log(r.m_prob / r.u_prob) * 1e6)
        # rounded probs reconstruct the weight to within rounding slack
        assert abs(r.w_agree_micro - expect_agree) < 200, r
        if r.m_prob != r.u_prob:
            assert (r.w_agree_micro > 0) != (r.w_disagree_micro > 0), r


def test_kneser_ney_mass_and_vs_mle(spark, sf_small):
    """KN discounting sanity on a tiny hand corpus is overkill here;
    instead pin the production invariant: every scored doc's mean
    surprisal is positive (probabilities < 1) and finite, and the
    returned frame respects the min-bigram floor."""
    from cricket_analytics_nosql_spark.operators.text import (
        LM_MIN_BIGRAMS,
        kneser_ney_surprisal,
    )

    rows = kneser_ney_surprisal(spark, sf_small).collect()
    assert rows, "corpus should yield scored documents"
    for r in rows:
        assert r.n_bigrams >= LM_MIN_BIGRAMS
        assert 0 < r.kn_micro_total < 30_000_000 * r.n_bigrams


def test_cuped_reduces_variance_and_preserves_pooled_mean(spark, sf_small):
    """CUPED's two contracts: (1) var_reduction = ρ² ∈ [0, 1);
    (2) the adjustment is mean-preserving over the pooled units —
    Σ n_a·(adj_a − raw_a) ≈ 0 (θ·Σ(X − X̄) telescopes to zero)."""
    from cricket_analytics_nosql_spark.operators.drift import (
        cuped_adjusted_ab,
    )

    rows = cuped_adjusted_ab(spark, sf_small).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0.0 <= r.var_reduction < 1.0
    drift = sum(r.n_units * (r.mean_y_adj - r.mean_y) for r in rows)
    total = sum(r.n_units * r.mean_y for r in rows)
    assert abs(drift) < 1e-6 * max(abs(total), 1.0)


def test_temperature_alloc_flattens_mixture(spark, sf_small):
    """Temperature sampling's point: effective rates must be
    anti-monotone in source size (smaller sources get higher rates),
    and the total allocation lands within rounding of the budget."""
    from cricket_analytics_nosql_spark.operators.training import (
        TEMP_BUDGET_DEN,
        TEMP_BUDGET_NUM,
        temperature_mixture_alloc,
    )

    rows = temperature_mixture_alloc(spark, sf_small).collect()
    total_docs = sum(r.n_docs for r in rows)
    budget = total_docs * TEMP_BUDGET_NUM // TEMP_BUDGET_DEN
    assert abs(sum(r.alloc_docs for r in rows) - budget) <= len(rows)
    by_size = sorted(rows, key=lambda r: r.n_docs)
    rates = [r.eff_rate for r in by_size]
    assert all(a >= b - 1e-9 for a, b in zip(rates, rates[1:])), rates


def test_shard_pack_conserves_bytes_and_bounds_fill(spark, sf_small):
    """Packing must conserve mass (Σ shard_bytes = corpus bytes),
    produce contiguous non-overlapping doc spans, and every shard
    except possibly the last must reach the budget boundary (an item
    starting inside a shard can overhang it, so fill ≥ 100% − the
    max blob share; under-full interior shards would mean the prefix
    math skipped bytes)."""
    from cricket_analytics_nosql_spark.operators.multimodal import (
        SHARD_BYTES,
        multimodal_shard_pack,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = multimodal_shard_pack(spark, sf_small).collect()
    docs = load_table(spark, sf_small, "documents").select(
        F.sum(F.length(F.encode(F.col("text"), "UTF-8"))).alias("b"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert sum(r.shard_bytes for r in rows) == docs.b
    assert sum(r.n_items for r in rows) == docs.n
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.last_doc < nxt.first_doc
    # interior shards end because the NEXT item crossed the boundary
    for r in rows[:-1]:
        assert r.shard_bytes >= 0.5 * SHARD_BYTES


def test_betweenness_flow_conservation(spark, sf_small):
    """Σ_v betweenness(v) over ALL suppliers = 1e6 × (# distance-2
    pairs): each pair distributes exactly one micro-unit-scaled flow
    across its shared suppliers (up to per-wedge rounding)."""
    from cricket_analytics_nosql_spark.operators.graph import (
        AA_MAX_DEG,
        AA_MIN_WEIGHT,
        trade_edges,
    )

    e = trade_edges(spark, sf_small).filter(
        F.col("weight") >= AA_MIN_WEIGHT
    ).select(F.col("src").alias("cust"), F.col("dst").alias("supp"))
    deg = e.groupBy("supp").agg(F.count(F.lit(1)).alias("d"))
    keyed = e.join(
        deg.filter((F.col("d") >= 2) & (F.col("d") <= AA_MAX_DEG)), "supp"
    ).select("supp", "cust")
    a = keyed.select("supp", F.col("cust").alias("c1"))
    b = keyed.select("supp", F.col("cust").alias("c2"))
    wedges = a.join(b, "supp").filter(F.col("c1") < F.col("c2"))
    cnt = wedges.groupBy("c1", "c2").agg(F.count(F.lit(1)).alias("cnt"))
    n_pairs = cnt.count()
    total = (
        wedges.join(cnt, ["c1", "c2"])
        .select(
            F.sum(F.round(F.lit(1e6) / F.col("cnt"), 0).cast("long")).alias(
                "t"
            )
        )
        .collect()[0]
        .t
    )
    # each pair's cnt wedges contribute round(1e6/cnt) each — within
    # cnt/2 of 1e6 per pair
    assert abs(total - 1_000_000 * n_pairs) <= n_pairs * 64


def test_ols_break_beats_single_fit(spark, sf_small):
    """Any admitted breakpoint must not fit WORSE than the single
    line (adding a parameter can't raise SSE), and the winning row's
    improvement is the max."""
    from cricket_analytics_nosql_spark.operators.drift import ols_break_scan

    rows = ols_break_scan(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.sse_break <= r.sse_single + 1e-6
        assert 0.0 <= r.improvement <= 1.0
    assert rows[0].improvement == max(r.improvement for r in rows)


def test_l_diversity_consistent_with_k_anonymity(spark, sf_small):
    """Structural consistency: the QI-group universe (nation ×
    segment) has ≥ as many rows as groups, min_l ≥ 1, and exposure
    is a fraction."""
    from cricket_analytics_nosql_spark.operators.sampling import (
        l_diversity_audit,
    )

    for r in l_diversity_audit(spark, sf_small).collect():
        assert r.min_l >= 1
        assert 0 <= r.n_low_diversity <= r.n_groups
        assert 0.0 <= r.exposure_rate <= 1.0


def test_loo_valuation_identity(spark, sf_small):
    """LOO means must telescope: dropping a source with mean BELOW
    the corpus mean raises the LOO mean (delta > 0) and vice versa —
    sign(delta) == sign(corpus_mean − source_mean)."""
    from cricket_analytics_nosql_spark.operators.text import (
        loo_source_valuation,
    )

    rows = loo_source_valuation(spark, sf_small).collect()
    n = sum(r.n_docs for r in rows)
    corpus_mean = sum(r.mean_q * r.n_docs for r in rows) / n
    for r in rows:
        if abs(r.mean_q - corpus_mean) > 1e-4:
            assert (r.delta_micro > 0) == (r.mean_q < corpus_mean), r
