"""observed_quality: metrics ride the materializing job — no second
pass — and report exact null/violation counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.quality import observed_quality


def test_observed_quality_counts(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, -1.0), (3, "c", None), (4, None, 5.0)],
        "id int, name string, score double",
    )
    out, obs = observed_quality(
        df,
        null_cols=["name", "score"],
        checks={"positive_score": F.col("score") > 0},
    )
    # the ONLY action: a sink write — metrics ride along
    out.write.mode("overwrite").parquet(str(tmp_path / "t"))
    got = obs.get
    assert got["n_rows"] == 4
    assert got["nulls_name"] == 2
    assert got["nulls_score"] == 1
    # score NULL counts as a failure, like a violated constraint
    assert got["fail_positive_score"] == 2


def test_observed_quality_on_star_schema(spark, sf_small):
    from cricket_analytics_nosql_spark.sources.tables import load_table

    li = load_table(spark, sf_small, "lineitem")
    out, obs = observed_quality(
        li,
        null_cols=["l_orderkey"],
        checks={
            "discount_range": (F.col("l_discount") >= 0)
            & (F.col("l_discount") <= 1)
        },
    )
    n = out.count()
    got = obs.get
    assert got["n_rows"] == n
    assert got["nulls_l_orderkey"] == 0
    assert got["fail_discount_range"] == 0


def test_approx_distinct_error_bound(spark, sf_medium):
    """The HLL++ sketch must land within 5% of the exact distinct
    count (default rsd 0.05; typically ~2%) — pins the bound that
    approx_distinct's *_ok output columns assert."""
    from cricket_analytics_nosql_spark.operators.setops import approx_distinct
    from cricket_analytics_nosql_spark.sources.tables import load_table

    row = approx_distinct(spark, sf_medium).collect()[0]
    assert row.approx_orders_ok and row.approx_parts_ok
    li = load_table(spark, sf_medium, "lineitem")
    exact = li.agg(
        F.count_distinct("l_orderkey").alias("o"),
        F.count_distinct("l_partkey").alias("p"),
    ).collect()[0]
    assert row.exact_orders == exact.o and row.exact_parts == exact.p


def test_approx_quantiles_error_bound(spark, sf_medium):
    """The GK sketch at accuracy 10000 must land within 2% of the
    exact interpolated quantile on every group — pins the bound the
    approx_quantiles *_ok output columns assert."""
    from cricket_analytics_nosql_spark.operators.setops import approx_quantiles

    rows = approx_quantiles(spark, sf_medium).collect()
    assert rows, "no groups returned"
    for r in rows:
        assert r.approx_median_ok and r.approx_p99_ok, r
