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
