"""Round-10 unit gates: the allreduce quantizer core that the ANN
paths (ann_ivf_kmeans, ann_pq, semantic_dedup's cell blocking) now
ride on — literal-codebook argmin assignment, bounded-sample Lloyd,
and the driver-side probe ranking path staying equivalent to the
DataFrame probe path it replaced."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.similarity import (
    _argmin_cell_expr,
    _doubles,
    _lloyd_numpy,
    _train_sample,
    ivf_topk,
    kmeans_fit,
    kmeans_fit_rows,
    pq_codebooks,
    pq_codebooks_rows,
)
from cricket_analytics_nosql_spark.sources.tables import load_table


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, v array<double>",
    )


def test_argmin_cell_expr_matches_numpy(spark):
    """The literal-codebook argmin projection picks the same cell as
    numpy's argmin of squared euclidean distance on non-degenerate
    inputs — the contract that makes the shuffle-free assignment a
    drop-in for the old crossJoin/min_by plan."""
    rng = np.random.RandomState(11)
    dim, k, n = 6, 4, 64
    cents = [(j + 1, [float(x) for x in rng.randn(dim)]) for j in range(k)]
    vecs = rng.randn(n, dim)
    got = {
        r["vec_id"]: r["cell"]
        for r in _vec_df(spark, vecs)
        .select("vec_id", _argmin_cell_expr(cents, dim).alias("cell"))
        .collect()
    }
    cmat = np.asarray([c for _, c in cents])
    d2 = ((vecs[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
    want = d2.argmin(axis=1) + 1  # cell ids are 1-based seed order
    assert got == {i: int(want[i]) for i in range(n)}


def test_argmin_cell_expr_tie_breaks_to_lowest_cell(spark):
    """Exact distance ties go to the lowest cell id ((score, cell)
    struct ordering) — the same tie-break the old
    min_by(struct(d2, cell)) plan used."""
    # two identical centroids, plus a far one: every vector ties
    # between cells 1 and 2 and must land in cell 1
    cents = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [9.0, 9.0])]
    rows = (
        _vec_df(spark, [[0.1, 0.2], [1.0, -1.0], [0.0, 0.0]])
        .select(_argmin_cell_expr(cents, 2).alias("cell"))
        .collect()
    )
    assert [r["cell"] for r in rows] == [1, 1, 1]


def test_argmin_cell_expr_sliced_offsets(spark):
    """``offset``/``sliced`` address a subvector in place: a vector
    whose j-th slice equals a codebook centroid must take that cell
    in subspace j regardless of the other dims (the PQ encode
    contract)."""
    sub = 2
    books = {
        0: [(1, [0.0, 0.0]), (2, [5.0, 5.0])],
        1: [(1, [1.0, 1.0]), (2, [-1.0, -1.0])],
    }
    # v = [5, 5, -1, -1]: subspace 0 → cell 2, subspace 1 → cell 2
    df = _vec_df(spark, [[5.0, 5.0, -1.0, -1.0]])
    row = df.select(
        _argmin_cell_expr(books[0], sub, offset=0, sliced=True).alias("c0"),
        _argmin_cell_expr(books[1], sub, offset=sub, sliced=True).alias(
            "c1"
        ),
    ).collect()[0]
    assert (row["c0"], row["c1"]) == (2, 2)


def test_lloyd_numpy_deterministic_and_drops_empty_cells():
    rng = np.random.RandomState(5)
    # two tight blobs far apart; k=4 seeds all land in blob 1, so
    # after one round at most the seeds' survivors remain and the
    # result must be stable across calls
    x = np.vstack(
        [rng.randn(20, 3) * 0.01, rng.randn(20, 3) * 0.01 + 100.0]
    )
    a = _lloyd_numpy(x.copy(), k=4, max_iter=3)
    b = _lloyd_numpy(x.copy(), k=4, max_iter=3)
    assert a == b
    assert 1 <= len(a) <= 4
    assert all(len(c) == 3 for _, c in a)
    # cell ids stay within the seed id range even after drops
    assert all(1 <= cid <= 4 for cid, _ in a)


def test_kmeans_fit_frame_matches_rows(spark, sf_small):
    """The DataFrame wrapper is exactly the rows list."""
    emb = _doubles(load_table(spark, sf_small, "embeddings"))
    rows = kmeans_fit_rows(emb, k=8, max_iter=2)
    frame = sorted(
        (r["cell"], list(r["centroid"]))
        for r in kmeans_fit(emb, k=8, max_iter=2).collect()
    )
    assert frame == sorted(rows)


def test_train_sample_bounded_and_sorted(spark, sf_small):
    emb = _doubles(load_table(spark, sf_small, "embeddings"))
    sample = _train_sample(emb, 2)
    assert len(sample) <= 512  # 256·k cap
    ids = [r["vec_id"] for r in sample]
    assert ids == sorted(ids)  # lowest vec_ids, in order


def test_ivf_topk_driver_probes_match_dataframe_probes(spark, sf_small):
    """The driver-side probe ranking (query_rows path) returns the
    same neighbor rows as the DataFrame probe plan it replaced —
    same centroids, same nprobe, same re-rank."""
    emb = _doubles(load_table(spark, sf_small, "embeddings"))
    cents = kmeans_fit_rows(emb, k=8, max_iter=2)
    sample = _train_sample(emb, 8)
    q_rows = [
        (r["vec_id"], list(r["v"])) for r in sample if r["vec_id"] < 8
    ]
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q")
    )
    via_rows = sorted(
        (r["q_id"], r["rank"], r["vec_id"], r["cos"])
        for r in ivf_topk(
            emb, centroid_rows=cents, query_rows=q_rows
        ).collect()
    )
    via_frame = sorted(
        (r["q_id"], r["rank"], r["vec_id"], r["cos"])
        for r in ivf_topk(
            emb, queries, centroid_rows=cents
        ).collect()
    )
    assert via_rows == via_frame


def test_pq_codebooks_frame_matches_rows(spark, sf_small):
    emb = _doubles(load_table(spark, sf_small, "embeddings"))
    books = pq_codebooks_rows(emb, m=4, k=4, iters=2)
    frame = pq_codebooks(emb, m=4, k=4, iters=2).collect()
    got = {}
    for r in frame:
        got.setdefault(r["subspace"], []).append(
            (r["cell"], list(r["centroid"]))
        )
    assert {j: sorted(v) for j, v in got.items()} == books
    # dim 64 / m 4 subspaces = 16-dim centroids
    assert all(
        len(c) == 16 for j in books for _, c in books[j]
    )


def test_argmin_cell_expr_plan_is_projection(spark, sf_small):
    """The assignment must stay a pure projection over the scan —
    no Exchange, no Join in the physical plan (the whole point of
    the literal-codebook form)."""
    emb = _doubles(load_table(spark, sf_small, "embeddings"))
    cents = kmeans_fit_rows(emb, k=8, max_iter=2)

    def shape(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange"), plan.count("Join")

    base = shape(emb)
    with_cell = shape(emb.withColumn("cell", _argmin_cell_expr(cents, 64)))
    # the assignment adds NOTHING to the exchange/join structure of
    # the bare scan (load_table's fan-out repartition is the only
    # exchange either way)
    assert with_cell == base


@pytest.mark.parametrize("name", ["ann_ivf_kmeans", "ann_pq", "ann_ivf"])
def test_ann_audit_green_at_small_sf(spark, sf_small, name):
    from cricket_analytics_nosql_spark.operators.similarity import QUERIES

    row = QUERIES[name].fn(spark, sf_small).collect()[0]
    assert row.recall_ok and row.n_exact_pairs > 0


def test_argmin_cell_expr_adversarial_magnitudes(spark):
    """The literal-codebook argmin must agree with a Python
    reference computing the SAME score form in the SAME fold order
    (‖c‖² via left-to-right sum of squares, dot via left-to-right
    fold, score = n − 2·d) across adversarial magnitudes — the
    round-8 bit-identity pattern applied to the expression
    generator (literal repr round-trips, negatives, subnormal-to-
    huge scale mixes, k=1 degenerate)."""
    import random

    rng = random.Random(17)
    dim = 8

    def vec():
        return [
            rng.uniform(-1e3, 1e3) * 10 ** rng.randint(-12, 12)
            for _ in range(dim)
        ]

    for k in (1, 5):
        cents = [(j + 1, vec()) for j in range(k)]
        vecs = [vec() for _ in range(40)]

        def ref_cell(v):
            best = None
            for cell, c in cents:
                n2 = sum(x * x for x in c)
                d = 0.0
                for x, y in zip(v, c):
                    d = d + x * y
                s = n2 - 2.0 * d
                if best is None or (s, cell) < best:
                    best = (s, cell)
            return best[1]

        got = {
            r["vec_id"]: r["cell"]
            for r in _vec_df(spark, vecs)
            .select("vec_id", _argmin_cell_expr(cents, dim).alias("cell"))
            .collect()
        }
        want = {i: ref_cell(v) for i, v in enumerate(vecs)}
        assert got == want, f"k={k}: literal argmin diverged from reference"
