"""Semantic tests for the round-9 operators (the oracle-parity gate
in test_oracle_parity.py binds their values; these pin the CLAIMS
each operator makes beyond value equality)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_minhash_estimate_pairs_and_identity(spark, sf_small):
    """The audited pair set must be exactly the exact-Jaccard pair
    set at tau, the estimate must be n_hash_matches/H, and an
    identical-signature pair must estimate 1.0."""
    from cricket_analytics_nosql_spark.operators.dedup import (
        MH_EST_HASHES,
        MH_EST_TAU,
        jaccard_pairs,
        minhash_estimate_error,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = minhash_estimate_error(spark, sf_small).collect()
    assert rows, "sf_small plants near-dup pairs above tau"
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    want = {
        (r.d1, r.d2) for r in jaccard_pairs(docs, MH_EST_TAU).collect()
    }
    assert {(r.d1, r.d2) for r in rows} == want
    for r in rows:
        assert 0 <= r.n_hash_matches <= MH_EST_HASHES
        assert abs(r.est_jaccard - round(r.n_hash_matches / MH_EST_HASHES, 6)) < 1e-12
        assert abs(r.abs_err - round(abs(r.jaccard - r.est_jaccard), 6)) < 1e-12
    # byte-identical docs share every shingle -> every min-hash
    # matches -> estimate exactly 1.0 (synthetic corpus: sf0.001 has
    # no jaccard-1.0 pair above 3 tokens)
    import cricket_analytics_nosql_spark.operators.dedup as dd

    twin = "one two three four five six seven"
    synth = spark.createDataFrame(
        [(1, twin), (2, twin), (3, "totally different words entirely here")],
        "doc_id long, text string",
    )
    orig = dd.load_table
    dd.load_table = lambda spark, sf_dir, name: synth
    try:
        got = {
            (r.d1, r.d2): r
            for r in minhash_estimate_error(spark, "x").collect()
        }
    finally:
        dd.load_table = orig
    assert got[(1, 2)].jaccard == 1.0
    assert got[(1, 2)].n_hash_matches == MH_EST_HASHES
    assert got[(1, 2)].est_jaccard == 1.0 and got[(1, 2)].abs_err == 0.0


def test_ngram_leakage_planted_corpus(spark):
    """A constructed corpus pins the semantics: an eval doc copied
    verbatim from a train doc leaks 100% and is flagged; an eval doc
    with unique shingles leaks 0%; sub-3-token docs are out of
    scope."""
    from cricket_analytics_nosql_spark.operators.dedup import (
        LEAK_EVAL_MOD,
        train_eval_ngram_leakage,
    )
    import pyspark.sql.functions as F  # noqa: F401

    common = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, common),                       # eval: fully leaked
        (LEAK_EVAL_MOD, "qq ww ee rr tt"), # eval: unique -> 0.0
        (2 * LEAK_EVAL_MOD, "xx yy"),      # eval: <3 tokens -> absent
        (1, common),                       # train source of the leak
        (2, "other train words here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    import cricket_analytics_nosql_spark.operators.dedup as dd
    from cricket_analytics_nosql_spark.sources.tables import load_table as _lt

    # route the operator onto the synthetic frame
    orig = dd.load_table
    dd.load_table = lambda spark, sf_dir, name: docs
    try:
        got = {r.doc_id: r for r in train_eval_ngram_leakage(spark, "x").collect()}
    finally:
        dd.load_table = orig
    assert set(got) == {0, LEAK_EVAL_MOD}
    assert got[0].leak_ratio == 1.0 and got[0].contaminated == 1
    assert got[LEAK_EVAL_MOD].leak_ratio == 0.0
    assert got[LEAK_EVAL_MOD].contaminated == 0


def test_seq_length_histogram_invariants(spark, sf_small):
    """Bands are powers of two covering every doc once; cumulative
    token share is monotone and ends at exactly 1.0."""
    from cricket_analytics_nosql_spark.operators.training import (
        seq_length_histogram,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = seq_length_histogram(spark, sf_small).collect()
    n_docs = load_table(spark, sf_small, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.band_lo_tokens == 1 << r.band
    shares = [r.cum_token_share for r in rows]
    assert shares == sorted(shares) and shares[-1] == 1.0


def test_packing_efficiency_identities(spark, sf_small):
    """Integer identities: padded >= packed per language, both waste
    columns are the exact budget-multiple remainders, and the padded
    count matches a per-doc ceil recomputation."""
    from cricket_analytics_nosql_spark.operators.training import (
        PACK_BUDGET,
        packing_efficiency_audit,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = packing_efficiency_audit(spark, sf_small).collect()
    assert rows
    docs = (
        load_table(spark, sf_small, "documents")
        .select(
            "lang", F.size(F.split(F.col("text"), " ")).alias("n")
        )
        .collect()
    )
    per_lang: dict[str, int] = {}
    for d in docs:
        per_lang[d.lang] = per_lang.get(d.lang, 0) + (
            (d.n + PACK_BUDGET - 1) // PACK_BUDGET
        )
    for r in rows:
        assert r.padded_seqs >= r.packed_seqs
        assert r.pad_waste_tokens == r.padded_seqs * PACK_BUDGET - r.tokens
        assert r.pack_waste_tokens == r.packed_seqs * PACK_BUDGET - r.tokens
        assert r.padded_seqs == per_lang[r.lang]


def test_srp_bucket_balance_covers_corpus(spark, sf_small):
    """Buckets partition the corpus: sizes sum to the vector count,
    shares sum to ~1, bucket ids stay inside 2^planes, and the
    assignment is deterministic across runs."""
    from cricket_analytics_nosql_spark.operators.similarity import (
        SRP_AUDIT_PLANES,
        srp_bucket_balance_audit,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    a = srp_bucket_balance_audit(spark, sf_small).collect()
    n = load_table(spark, sf_small, "embeddings").count()
    assert sum(r.n_vecs for r in a) == n
    assert abs(sum(r.share for r in a) - 1.0) < 1e-4
    assert all(0 <= r.bucket < (1 << SRP_AUDIT_PLANES) for r in a)
    b = srp_bucket_balance_audit(spark, sf_small).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_dup_cluster_histogram_consistent_with_clusters(spark, sf_small):
    """The histogram must be exactly the size distribution of the
    dedup_clusters fixpoint, and every cluster has >= 2 members."""
    from collections import Counter

    from cricket_analytics_nosql_spark.operators.dedup import (
        connected_components,
        dup_cluster_size_histogram,
        jaccard_pairs,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    cc = connected_components(
        jaccard_pairs(docs, 0.8).select("d1", "d2")
    ).collect()
    want = Counter(
        Counter(r.cluster_id for r in cc).values()
    )  # size -> n_clusters
    rows = dup_cluster_size_histogram(spark, sf_small).collect()
    assert {r.cluster_size: r.n_clusters for r in rows} == dict(want)
    total = docs.count()
    for r in rows:
        assert r.cluster_size >= 2
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert abs(r.corpus_share - round(r.n_docs / total, 6)) < 1e-12


def test_token_dedup_savings_mass_conservation(spark, sf_small):
    """tokens_after <= tokens_before per source; global tokens_after
    equals the token mass of distinct texts' first writers."""
    from cricket_analytics_nosql_spark.operators.dedup import (
        token_dedup_savings,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = token_dedup_savings(spark, sf_small).collect()
    assert rows
    docs = load_table(spark, sf_small, "documents").collect()
    first_by_hash: dict[str, object] = {}
    for d in sorted(docs, key=lambda d: d.doc_id):
        first_by_hash.setdefault(d.text, d)
    want_after = sum(
        len(d.text.split(" ")) for d in first_by_hash.values()
    )
    assert sum(r.tokens_after for r in rows) == want_after
    for r in rows:
        assert 0 <= r.tokens_after <= r.tokens_before
        assert r.n_dropped <= r.n_docs


def test_keep_best_quality_beats_min_id_when_quality_differs(spark, sf_small):
    """The survivor must carry the cluster-max quality; on clusters
    where the min-id member is NOT the best one, the two policies
    must disagree (proving the argmax is not vacuously min-id)."""
    from cricket_analytics_nosql_spark.operators.dedup import (
        connected_components,
        dedup_keep_best_quality,
        jaccard_pairs,
    )
    from cricket_analytics_nosql_spark.operators.text import quality_col
    from cricket_analytics_nosql_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    q = {
        r.doc_id: r.q
        for r in docs.select(
            "doc_id", F.round(quality_col(F.col("text")), 6).alias("q")
        ).collect()
    }
    members: dict[int, list[int]] = {}
    for r in connected_components(
        jaccard_pairs(docs, 0.8).select("d1", "d2")
    ).collect():
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    rows = dedup_keep_best_quality(spark, sf_small).collect()
    assert {r.cluster_id for r in rows} == set(members)
    for r in rows:
        ms = members[r.cluster_id]
        best = max(ms, key=lambda d: (q[d], -d))
        assert r.kept_doc_id == best
        assert r.kept_quality == q[best]
        assert r.n_members == len(ms)


def test_shard_skew_partitions_and_mean(spark, sf_small):
    """Shards partition the corpus exactly; the load factors average
    to 1 by construction."""
    from cricket_analytics_nosql_spark.operators.layout import (
        SHARD_COUNT,
        shard_skew_audit,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = shard_skew_audit(spark, sf_small).collect()
    n = load_table(spark, sf_small, "documents").count()
    assert sum(r.n_docs for r in rows) == n
    assert all(0 <= r.shard < SHARD_COUNT for r in rows)
    mean_load = sum(r.load_vs_mean * 1 for r in rows) / len(rows)
    assert abs(mean_load - 1.0) < 1e-3


def test_embedding_dim_profile_matches_numpy(spark, sf_small):
    """Per-dimension mean/variance must equal a numpy recomputation
    over the SAME integer quantization, one row per dimension."""
    import numpy as np

    from cricket_analytics_nosql_spark.operators.similarity import (
        DEAD_DIM_VAR,
        embedding_dim_profile,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    rows = embedding_dim_profile(spark, sf_small).collect()
    vecs = np.array(
        [
            r.embedding
            for r in load_table(spark, sf_small, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    q = np.round(vecs * 1e6)
    assert len(rows) == q.shape[1]

    def round_half_up(x: float, nd: int = 6) -> float:
        # Spark's ROUND is HALF_UP on the double's shortest repr;
        # Python's built-in round is banker's — they differ on ties
        from decimal import ROUND_HALF_UP, Decimal

        return float(
            Decimal(repr(x)).quantize(
                Decimal("1e-%d" % nd), rounding=ROUND_HALF_UP
            )
        )

    for r in rows:
        col = q[:, r.dim_pos]
        mean = col.sum() / len(col) / 1e6
        var = (
            (col * col).sum() / len(col)
            - (col.sum() / len(col)) ** 2
        ) / 1e12
        assert abs(r.mean - round_half_up(mean)) < 1e-9
        assert abs(r.variance - round_half_up(var)) < 1e-9
        assert r.is_dead == int(var < DEAD_DIM_VAR)
