"""Unit/invariant tests for the training-data export operators
(operators/training.py) and PII scrubbing (operators/text.py) —
properties the DuckDB oracle can't state (completeness, partition
laws), per SURVEY.md §5.

The oracle-differential check for these queries lives in
tests/test_oracle_parity.py like every other catalog entry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators import text as text_ops
from cricket_analytics_nosql_spark.operators import training
from cricket_analytics_nosql_spark.sources.tables import load_table


def test_split_partitions_corpus(spark, sf_small):
    """Every document lands in exactly one split; the audit table's
    counts re-add to the corpus size."""
    docs = load_table(spark, sf_small, "documents")
    total = docs.count()
    audit = training.train_val_test_split(spark, sf_small)
    agg = audit.agg(
        F.sum("n_docs").alias("n"),
        F.countDistinct("split").alias("k"),
    ).first()
    assert agg.n == total
    assert agg.k == 3


def test_split_is_rerun_and_partitioning_stable(spark, sf_small):
    """The split column is a pure function of the key: recomputing
    on a repartitioned frame yields the identical assignment."""
    docs = load_table(spark, sf_small, "documents").select("doc_id")
    a = docs.withColumn("s", training.split_column(F.col("doc_id")))
    b = (
        docs.repartition(13)
        .withColumn("s", training.split_column(F.col("doc_id")))
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pack_sequences_laws(spark, sf_small):
    """Packing laws: every doc is packed exactly once; seq_no is a
    dense-enough prefix (starts at 0 per stream); no sequence except
    a stream's last is 'short' (ends before budget without an
    overflowing doc) — the zero-waste property of concat-and-split."""
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id",
        "lang",
        F.pmod(F.col("doc_id"), F.lit(training.PACK_SHARDS)).alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    packed = training.pack_sequences_assign(
        docs, ["lang", "shard"], "doc_id", "n_tokens", training.PACK_BUDGET
    )
    assert packed.count() == docs.count()
    per_seq = (
        packed.groupBy("lang", "shard", "seq_no")
        .agg(F.sum("n_tokens").alias("tok"), F.max("overflows").alias("ovf"))
    )
    # first sequence of every stream is numbered 0
    firsts = per_seq.groupBy("lang", "shard").agg(F.min("seq_no").alias("m"))
    assert firsts.filter(F.col("m") != 0).count() == 0
    # every non-final sequence either fills the budget with whole
    # docs or ends in a doc that overflows into the next sequence
    last = per_seq.groupBy("lang", "shard").agg(F.max("seq_no").alias("last_seq"))
    bad = (
        per_seq.join(last, ["lang", "shard"])
        .filter(F.col("seq_no") != F.col("last_seq"))
        .filter((F.col("tok") < training.PACK_BUDGET) & (F.col("ovf") == 0))
    )
    assert bad.count() == 0


def test_mixture_resample_uniformizes(spark, sf_small):
    """Downsample-to-uniform: no source grows, and every achieved
    size is within the deterministic-modulo quantization error of
    the smallest source's size."""
    audit = training.domain_mixture_resample(spark, sf_small).collect()
    mn = min(r.n_before for r in audit)
    for r in audit:
        assert r.n_after <= r.n_before
        # rate is exact for the min source (keep_rate == DENOM)
        if r.n_before == mn:
            assert r.n_after == r.n_before
    sizes = [r.n_after for r in audit]
    # achieved sizes cluster at the target: spread bounded by the
    # per-source quantization of a DENOM-grid rate on doc_id % DENOM
    assert max(sizes) - min(sizes) <= max(3, mn // 10)


def test_pii_scrub_is_complete(spark, sf_small):
    """Scrub completeness: after redaction none of the three PII
    patterns match anywhere (the property the byte-equality oracle
    can't express), and per-type counts match the injection rule."""
    out = training  # noqa: F841  (module import exercised above)
    df = text_ops.pii_scrub(spark, sf_small)
    residue = df.select(
        F.sum(
            F.size(F.regexp_extract_all("redacted", F.lit(text_ops.PII_EMAIL_RE), 0))
            + F.size(F.regexp_extract_all("redacted", F.lit(text_ops.PII_PHONE_RE), 0))
            + F.size(F.regexp_extract_all("redacted", F.lit(text_ops.PII_IP_RE), 0))
        ).alias("n")
    ).first()
    assert residue.n == 0
    rows = df.select("doc_id", "n_emails", "n_phones", "n_ips").collect()
    for r in rows:
        assert r.n_emails == (2 if r.doc_id % 3 == 0 else 1)
        assert r.n_phones == (0 if r.doc_id % 5 == 0 else 1)
        assert r.n_ips == 1


def test_export_jsonl_shards_roundtrip(spark, sf_small, tmp_path):
    """The JSONL export must (a) produce every requested shard as a
    directory, (b) route each doc to pmod(key, shards)
    deterministically, (c) round-trip content losslessly."""
    import os

    from pyspark.sql import functions as F

    from cricket_analytics_nosql_spark.operators.training import (
        export_jsonl_shards,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "shards")
    export_jsonl_shards(docs, out, "doc_id", 4)

    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("shard=")
    )
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]

    back = spark.read.json(out)
    assert back.count() == docs.count()
    # partition column came back; routing must match the rule
    bad = back.filter(
        F.pmod(F.col("doc_id"), F.lit(4)) != F.col("shard")
    ).count()
    assert bad == 0
    # lossless: same (doc_id, text) multiset
    a = docs.select("doc_id", "text")
    b = back.select("doc_id", "text")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_leakage_safe_split_routes_clusters_whole(spark, sf_small):
    """Every duplicate cluster lands in exactly one split (zero
    cross-split content-hash leakage by construction), splits
    partition the corpus, and the audit columns are self-consistent."""
    from cricket_analytics_nosql_spark.functions.scalar import md5_u32

    res = training.leakage_safe_split(spark, sf_small).collect()
    assert {r.split for r in res} == {"train", "val", "test"}
    docs = load_table(spark, sf_small, "documents")
    n_docs = docs.count()
    assert sum(r.n_docs for r in res) == n_docs
    # independently re-derive the split per doc and assert no hash
    # appears in two splits
    hashed = docs.select(F.md5("text").alias("h"), "doc_id")
    rep = hashed.groupBy("h").agg(F.min("doc_id").alias("rep"))
    b = F.pmod(md5_u32(F.col("rep"), salt="split#"), F.lit(10))
    assigned = rep.withColumn(
        "split",
        F.when(b < 8, "train").when(b < 9, "val").otherwise("test"),
    )
    leaks = (
        hashed.join(assigned, "h")
        .groupBy("h")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert leaks == 0
    # dup-doc accounting: docs minus clusters
    for r in res:
        assert r.n_dup_docs == r.n_docs - r.n_clusters


def test_logreg_quality_train_descends_and_is_deterministic(spark, sf_small):
    """Full-batch GD: loss is non-increasing across the unrolled
    iterations, weights move from zero init, and a re-run is
    bit-identical (pure agg, no RNG)."""
    a = training.logreg_quality_train(spark, sf_small).collect()
    b = training.logreg_quality_train(spark, sf_small).collect()
    assert a == b
    losses = [r.loss for r in sorted(a, key=lambda r: r.iter)]
    assert losses == sorted(losses, reverse=True)  # non-increasing
    assert a[0].b == 0.0 and a[0].w1 == 0.0 and a[0].w2 == 0.0
    last = max(a, key=lambda r: r.iter)
    assert (last.b, last.w1, last.w2) != (0.0, 0.0, 0.0)
