"""Skew-mitigation helpers — SURVEY.md §7.8 risk 5 / §4 item 3.

Star keys (V Kohli in deliveries, hot users in event logs) turn one
shuffle partition into the whole job's critical path. Two standard
mitigations, both pure DataFrame composition:

- **Salted two-phase aggregation**: groupBy((key, salt)) partial →
  groupBy(key) final. The hot key's rows spread over ``n_salts``
  partitions in phase 1; phase 2 merges ``n_salts`` partials per key
  — O(distinct_keys × n_salts) rows, trivially small.
- **Salted join** (skewed fact ⋈ small-ish dim): fact rows get a
  random salt; the dim side is exploded ×n_salts so every
  (key, salt) bucket finds its match. Dim replication costs
  n_salts × |dim| — the knob trades dim duplication for fact-side
  spread. (When the dim fits in a broadcast, prefer broadcast — AQE's
  skew-join split handles the sort-merge case automatically; this
  helper is for when neither applies.)

AQE (`spark.sql.adaptive.skewJoin`) already splits skewed sort-merge
join partitions at runtime; these helpers cover the aggregation case
AQE doesn't, and clusters where AQE is off.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table


def salted_sum(
    df: DataFrame,
    key: str,
    agg_cols: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates
    (sum/count/min/max — anything where partials merge by the same
    function). ``agg_cols`` maps output name → pre-aggregation column
    expression; both phases sum.

    Deterministic salt (hash of the whole row's monotonic id would
    need a shuffle; crc32 of all columns is good enough spread and
    keeps the plan narrow).
    """
    salt = (F.abs(F.hash(*df.columns)) % n_salts).alias("_salt")
    phase1 = (
        df.select(key, salt, *[c.alias(n) for n, c in agg_cols.items()])
        .groupBy(key, "_salt")
        .agg(*[F.sum(n).alias(n) for n in agg_cols])
    )
    return phase1.groupBy(key).agg(
        *[F.sum(n).alias(n) for n in agg_cols]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: fact side salted randomly-but-
    deterministically, dim side exploded across all salts."""
    f_salted = fact.withColumn(
        "_salt", F.abs(F.hash(*fact.columns)) % n_salts
    )
    d_exploded = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f_salted.join(d_exploded, [key, "_salt"]).drop("_salt")


def skewed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable: per-user event totals via the salted
    two-phase aggregation — results identical to a plain groupBy
    (the oracle), plan immune to hot users."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_sum(
        ev,
        "user_id",
        {
            "n_events": F.lit(1),
            "value_cents": F.round(F.col("value") * 100, 0).cast("long"),
        },
    )
    return (
        out.select(
            "user_id",
            "n_events",
            (F.col("value_cents").cast("double") / 100).alias("total_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(50)
    )


ORACLE_SKEWED_EVENT_COUNTS = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id ASC
LIMIT 50
"""


def salted_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable salted join: events ⋈ customer through the
    salt-and-explode path, aggregated per market segment — results
    must be IDENTICAL to the plain SQL join (the oracle), proving the
    mitigation never changes semantics. (When the dim broadcasts,
    prefer broadcast — this is the neither-side-broadcastable plan;
    the dim replication is n_salts × |dim|.)"""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, "user_id", n_salts=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("vc"),
        )
        .select(
            "c_mktsegment",
            "n_events",
            (F.col("vc").cast("double") / 100).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_SALTED_JOIN_ENRICH = """
SELECT c_mktsegment, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "should I salt this key?" advisory, as a query: for the
    shuffle key a join/agg would hash on (``events.user_id``, the
    documented hot key), report the skew numbers an engineer
    actually decides with — hottest-key share, top-10 share, the
    p99/median key-size ratio, and the key count.  Rule of thumb
    printed by every Spark tuning guide: max/median over ~50× or a
    single key over ~1/shufflePartitions of the rows means AQE
    skew-split or salting; this query turns that from folklore into
    a measured, oracle-checked readout.

    One map-combined count by key, then O(1)-row statistics over the
    key-size frame (exact percentiles on the aggregate, never the
    fact); integer counts; four rounded divisions."""
    sizes = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = sizes.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.expr("percentile(n, 0.5)").alias("med"),
        F.expr("percentile(n, 0.99)").alias("p99"),
    )
    w = Window.orderBy(F.desc("n"), F.asc("user_id"))
    top10 = (
        sizes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 10)
        .agg(F.sum("n").alias("top10_rows"))
    )
    return (
        stats.crossJoin(F.broadcast(top10))
        .select(
            "n_keys",
            "n_rows",
            "max_n",
            F.round(
                F.col("max_n").cast("double") / F.col("n_rows").cast("double"),
                6,
            ).alias("hottest_share"),
            F.round(
                F.col("top10_rows").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("top10_share"),
            F.round(F.col("p99") / F.col("med"), 4).alias("p99_over_median"),
            F.round(
                F.col("max_n").cast("double") / F.col("med"), 4
            ).alias("max_over_median"),
        )
    )


ORACLE_KEY_SKEW_PROFILE = """
WITH sizes AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
), stats AS (
  SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows, MAX(n) AS max_n,
         median(n) AS med, quantile_cont(n, 0.99) AS p99
  FROM sizes
), top10 AS (
  SELECT SUM(n) AS top10_rows FROM (
    SELECT n FROM sizes ORDER BY n DESC, user_id ASC LIMIT 10
  )
)
SELECT n_keys, n_rows, max_n,
       ROUND(CAST(max_n AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
         AS hottest_share,
       ROUND(CAST(top10_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
         AS top10_share,
       ROUND(p99 / med, 4) AS p99_over_median,
       ROUND(CAST(max_n AS DOUBLE) / med, 4) AS max_over_median
FROM stats CROSS JOIN top10
"""


QUERIES: dict[str, QuerySpec] = {
    "key_skew_profile": QuerySpec(
        key_skew_profile, ORACLE_KEY_SKEW_PROFILE, ["§7.8-skew", "A1", "A4"]
    ),
    "skewed_event_counts": QuerySpec(
        skewed_event_counts, ORACLE_SKEWED_EVENT_COUNTS, ["§7.8-skew", "A1"]
    ),
    "salted_join_enrich": QuerySpec(
        salted_join_enrich, ORACLE_SALTED_JOIN_ENRICH, ["§7.8-skew", "J1"]
    ),
}
