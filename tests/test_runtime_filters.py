"""Runtime-filter tests: the explicit DataFrame-native bloom
(operators/runtime_filters.py) and Catalyst's own injected
bloom_filter_agg/might_contain pair."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.runtime_filters import (
    bloom_bitmap,
    bloom_prefilter,
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bloom_has_no_false_negatives(spark):
    keys = spark.range(0, 1000).select((F.col("id") * 7).alias("key"))
    bitmap = bloom_bitmap(keys, "key", m_bits=1 << 14, k=3)
    probe = spark.range(0, 1000).select((F.col("id") * 7).alias("k2"))
    survivors = bloom_prefilter(probe, "k2", bitmap, m_bits=1 << 14, k=3)
    # every key actually in the build set MUST survive
    assert survivors.count() == 1000


def test_bloom_prunes_absent_keys(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("key"))
    bitmap = bloom_bitmap(keys, "key", m_bits=1 << 16, k=3)
    # probe keys disjoint from the build set
    probe = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k2"))
    survivors = bloom_prefilter(probe, "k2", bitmap, m_bits=1 << 16, k=3).count()
    # 500 keys in 2^16 bits at k=3 → fp rate well under 1e-4
    assert survivors < 50, survivors


def test_bloom_probe_never_shuffles_the_fact(spark, sf_medium):
    """The probe path must be broadcast word-lookups only: no
    sort-merge join, no Exchange hashpartitioning of orders before
    the bloom filter."""
    from cricket_analytics_nosql_spark.operators.runtime_filters import (
        bloom_prefilter_join,
    )

    plan = plan_of(bloom_prefilter_join(spark, sf_medium))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_catalyst_injects_runtime_bloom(spark, sf_medium):
    """With size thresholds lowered to local-test scale, Catalyst
    plants bloom_filter_agg on the selective build side and
    might_contain on the probe scan of a shuffle join — the exact
    mechanism this engine leans on at 100 TB (where the default
    10 MB / 10 GB thresholds pass on their own)."""
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        orders = spark.read.parquet(f"{sf_medium}/orders.parquet")
        cust = spark.read.parquet(f"{sf_medium}/customer.parquet").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
        optimized = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized, optimized
        assert "bloom_filter_agg" in optimized, optimized
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_join_matches_plain_join(spark, sf_medium):
    """The bloom prunes, the exact join decides: result set identical
    to the un-prefiltered join."""
    from cricket_analytics_nosql_spark.operators.runtime_filters import (
        bloom_prefilter_join,
    )

    cust = spark.read.parquet(f"{sf_medium}/customer.parquet")
    orders = spark.read.parquet(f"{sf_medium}/orders.parquet")
    plain = (
        orders.join(
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            orders.o_custkey == cust.c_custkey,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    expected = {r["o_orderpriority"]: r["count"] for r in plain}
    got = {
        r["o_orderpriority"]: r["n_orders"]
        for r in bloom_prefilter_join(spark, sf_medium).collect()
    }
    assert got == expected
