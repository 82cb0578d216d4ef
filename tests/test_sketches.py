"""Misra-Gries summary: the two-stage (partition → merge) sketch
must keep its textbook guarantees against exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.sketches import (
    misra_gries_summary,
)
from cricket_analytics_nosql_spark.sources.tables import load_table


def _exact_counts(df, col):
    return {
        r[col]: r.n
        for r in df.groupBy(col).agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_misra_gries_guarantees_on_tokens(spark, sf_small):
    """On the corpus token stream with K=50: (a) ≤ K rows, (b) every
    item with true count > n/K is reported, (c) estimates bracket
    the truth: est ≤ true ≤ est + n/K."""
    k = 50
    toks = (
        load_table(spark, sf_small, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .repartition(8)  # force a real multi-partition merge
    )
    exact = _exact_counts(toks, "token")
    n = sum(exact.values())
    summary = {
        r.item: r.est for r in misra_gries_summary(toks, "token", k).collect()
    }
    assert 0 < len(summary) <= k
    slack = n / k
    for item, true in exact.items():
        if true > slack:
            assert item in summary, (item, true, slack)
    for item, est in summary.items():
        true = exact.get(item, 0)
        assert est <= true <= est + slack, (item, est, true, slack)


def test_misra_gries_exact_when_k_exceeds_vocab(spark):
    """With k larger than the vocabulary the sketch degrades to
    exact counting — no decrements ever fire."""
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(rows, "v string").repartition(4)
    got = {r.item: r.est for r in misra_gries_summary(df, "v", 10).collect()}
    assert got == {"a": 5, "b": 3, "c": 2}


def test_snapshot_diff_null_keys(spark):
    """NULL business keys are matched null-safely and must classify
    by presence markers, not key nullability."""
    from cricket_analytics_nosql_spark.operators.versioning import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(None, "x"), (1, "a"), (2, "gone")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(None, "x"), (1, "a2"), (3, "new")], "k int, v string"
    )
    got = {
        (r.k, r.status)
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert got == {
        (None, "unchanged"),
        (1, "changed"),
        (2, "removed"),
        (3, "added"),
    }


def test_cms_never_undercounts_any_key(spark, sf_small):
    """The Count-Min guarantee must hold for EVERY key, not just the
    top-20 the driver query returns."""
    import pyspark.sql.functions as F

    from cricket_analytics_nosql_spark.operators.sketches import (
        cms_build,
        cms_probes,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events").select("user_id")
    sketch = cms_build(ev, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    probes = cms_probes(exact, "user_id")
    est = (
        probes.join(
            sketch,
            (F.col("hb.i") == F.col("i")) & (F.col("hb.b") == F.col("b")),
        )
        .groupBy("user_id", "exact")
        .agg(F.min("cnt").alias("est"))
    )
    assert est.filter(F.col("est") < F.col("exact")).count() == 0


def test_cms_tiny_width_overcounts_but_never_under(spark, sf_small):
    """Force collisions (w=2): estimates must strictly exceed exact
    for some keys (collisions happened) yet never undercount."""
    import pyspark.sql.functions as F

    from cricket_analytics_nosql_spark.operators.sketches import (
        cms_build,
        cms_probes,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events").select("user_id")
    sketch = cms_build(ev, "user_id", d=2, w=2)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    probes = cms_probes(exact, "user_id", d=2, w=2)
    est = (
        probes.join(
            sketch,
            (F.col("hb.i") == F.col("i")) & (F.col("hb.b") == F.col("b")),
        )
        .groupBy("user_id", "exact")
        .agg(F.min("cnt").alias("est"))
    )
    rows = est.collect()
    assert all(r.est >= r.exact for r in rows)
    assert any(r.est > r.exact for r in rows)
