"""Skew-mitigation helper tests: salted plans must return exactly
the rows of their naive counterparts, on data with a hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    """1000 rows for hot key 'whale', a few for others."""
    hot = spark.range(1000).select(
        F.lit("whale").alias("k"), F.col("id").alias("v")
    )
    cold = spark.createDataFrame(
        [("minnow", 1), ("minnow", 2), ("crab", 7)], "k string, v long"
    )
    return hot.unionByName(cold).cache()


def test_salted_sum_matches_plain(skewed):
    from cricket_analytics_nosql_spark.operators.skew import salted_sum

    salted = {
        (r.k): (r.n, r.total)
        for r in salted_sum(
            skewed, "k", {"n": F.lit(1), "total": F.col("v")}
        ).collect()
    }
    plain = {
        (r.k): (r.n, r.total)
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    assert salted == plain
    assert salted["whale"] == (1000, 499500)


def test_salted_join_matches_plain(spark, skewed):
    from cricket_analytics_nosql_spark.operators.skew import salted_join

    dim = spark.createDataFrame(
        [("whale", "big"), ("minnow", "small"), ("crab", "side")],
        "k string, size string",
    )
    salted = sorted(
        (r.k, r.v, r.size)
        for r in salted_join(skewed, dim, "k").collect()
    )
    plain = sorted(
        (r.k, r.v, r.size) for r in skewed.join(dim, "k").collect()
    )
    assert salted == plain
    assert len(salted) == 1003


def test_aqe_skew_join_splits_hot_partition(spark, sf_medium):
    """The engine's AQE posture made executable: with a hot join key
    (90% of rows on one value) and realistic thresholds scaled down
    to local data volume, AQE's OptimizeSkewedJoin must actually
    split the hot partition (final plan reads 'AQEShuffleRead ...
    skewed').  A scale fact this test also encodes: skew splitting
    is bounded by MAP-TASK granularity — a single-mapper shuffle
    (one input split, as a small local parquet scan produces) cannot
    be split at all, so both sides fan out to 32 map tasks first;
    at 100 TB inputs arrive as thousands of splits and this is
    automatic."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        # sf0.01's hot partition is ~10-40 KB of compressed shuffle
        # bytes; thresholds scale with the fixture, the mechanism is
        # identical at 100 TB defaults (256 MB / 64 MB)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        from cricket_analytics_nosql_spark.sources.tables import load_table

        ev = (
            load_table(spark, sf_medium, "events")
            .select("event_id", "value")
            .repartition(32)
        )
        sk = ev.withColumn(
            "k",
            F.when(F.col("event_id") % 10 != 0, F.lit(1)).otherwise(
                F.col("event_id")
            ),
        )
        other = ev.select(
            (F.col("event_id") % 5000).alias("k"),
            F.col("value").alias("v2"),
        ).repartition(32)
        j = sk.join(other, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        [row] = j.collect()
        assert row.n > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_split_fires(spark):
    """The 100 TB skew story has two halves: the salted helpers
    (above) for aggregations and AQE-off clusters, and AQE's runtime
    skew-join split for sort-merge joins. This proves the second
    half actually FIRES on this engine: a worst-case skewed join
    (99% of the left side on one hot key, incompressible payload so
    the partition's shuffle BYTES are honest) with the skew
    thresholds scaled to local data sizes must rewrite the
    SortMergeJoin to its skew=true form. Note the payload matters:
    the same shape over a low-cardinality parquet column lz4-shrinks
    below any sane threshold and the rule correctly declines — size
    is measured on shuffle bytes, not rows."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "10000",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "10000",
        # force sort-merge: broadcast would bypass the skew path
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "16",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        a = spark.range(200_000).select(
            F.when(F.col("id") % 100 != 0, 1)
            .otherwise(F.col("id"))
            .alias("k"),
            F.rand(1).alias("x"),
        )
        b = spark.range(20_000).select(
            F.col("id").alias("k"), F.rand(2).alias("y")
        )
        j = a.join(b, "k")
        n = len(j.collect())
        assert n == 198_200  # hot key matches k=1, plus the multiples
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
