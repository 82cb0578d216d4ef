"""Window-function surface + MERGE-semantics dedup — SURVEY.md §2.8
(engine extension: the reference's closest analogues are the HAVING
group A6 and first-writer-wins merge A10) and §2.4 A9/A10.

All windows partition by a key before ordering — no global
ORDER BY windows (a single-partition window is the classic 100 TB
anti-pattern; every window here shuffles by its partition key only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.scalar import cents, dollars, epoch_day
from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer in order-date order — the 'running
    score' cricket shape (SURVEY §2.8). Exact cents make the running
    sum order-insensitive to float error."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        dollars(F.sum(cents("o_totalprice")).over(w)).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("order_seq"),
    )


ORACLE_WINDOW_RUNNING_TOTAL = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 100 AS running_spend,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
FROM orders
"""


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank: top-3 orders per customer — the
    'top-line-item per order' shape (SURVEY §7.2.5)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


ORACLE_WINDOW_TOPK_PER_GROUP = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
)
SELECT * FROM ranked WHERE rn <= 3
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: days since a customer's previous order and until the
    next — the 'form curve' cricket shape (SURVEY §2.8)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_d = F.lag("o_orderdate").over(w)
    next_d = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), prev_d).alias("days_since_prev"),
        F.datediff(next_d, F.col("o_orderdate")).alias("days_until_next"),
    )


ORACLE_WINDOW_LAG_LEAD = """
SELECT o_orderkey, o_custkey,
       datediff('day', LAG(o_orderdate) OVER w, o_orderdate) AS days_since_prev,
       datediff('day', o_orderdate, LEAD(o_orderdate) OVER w) AS days_until_next
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: MERGE-constraint dedup — 'MERGE (f:FACED {matchId, innings,
    over, ball})' (neo4j_loader.py:58-65): at most one row per key.
    dropDuplicates keeps an arbitrary row, so the engine's
    deterministic form is a row_number window with an explicit
    tie-break — same result on any cluster, any partitioning."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderstatus").orderBy("o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderstatus", "o_orderkey", "o_totalprice")
    )


ORACLE_DEDUP_BY_KEY = """
WITH ranked AS (
  SELECT o_custkey, o_orderstatus, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                            ORDER BY o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderstatus, o_orderkey, o_totalprice
FROM ranked WHERE rn = 1
"""


def first_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: 'ON MATCH SET m.date = coalesce(m.date, row.date)' — keep
    the first non-null per key (neo4j_loader.py:38-42). min_by over
    the non-null subset ≙ arg_min: deterministic because the order key
    (event ts, id) is unique."""
    ev = load_table(spark, sf_dir, "events")
    # planted nulls: view events with value hidden for 'error' rows
    v = ev.withColumn(
        "val_or_null",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    return (
        v.filter(F.col("val_or_null").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min_by("val_or_null", F.struct("ts", "event_id")).alias(
                "first_value"
            ),
            F.count(F.lit(1)).alias("n_nonnull"),
        )
        .orderBy("user_id")
    )


ORACLE_FIRST_WRITER_WINS = """
WITH v AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS val_or_null
  FROM events
)
SELECT user_id,
       (ARRAY_AGG(val_or_null ORDER BY ts, event_id))[1] AS first_value,
       COUNT(*) AS n_nonnull
FROM v WHERE val_or_null IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): lag + cumulative-sum
    windows — the batch twin of streaming session_window (§2.11), and
    the oracle shape for its parity test."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_min = 30
    # integer microseconds both engines (epoch_us twin); TIMESTAMP_NTZ
    # needs the ntz→ltz hop first, unambiguous under the pinned UTC tz
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    new_session = F.when(
        ts_us - F.lag(ts_us).over(w) > gap_min * 60 * 1_000_000,
        1,
    ).otherwise(0)
    sessions = ev.withColumn("new_s", new_session).withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.sum(cents("value")).alias("val_c"),
        )
        .select(
            "user_id",
            "session_id",
            "n_events",
            "session_start",
            dollars("val_c").alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


ORACLE_SESSIONIZE_BATCH = """
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS session_value
FROM numbered
GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 range-frame window: trailing 24-hour per-user activity at
    every event (RANGE, not ROWS — peers by time value, so a burst at
    one timestamp enters the frame atomically). Spark's rangeBetween
    needs a numeric order key: epoch micros of ts, with the frame in
    micros; the oracle states the same frame as a DuckDB interval
    RANGE. The cast chain is value-preserving because the engine
    pins the session to UTC (configure_session)."""
    ev = load_table(spark, sf_dir, "events")
    order_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(order_us)
        .rangeBetween(-24 * 3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        dollars(F.sum(cents("value")).over(w)).alias("value_24h"),
    ).orderBy("event_id")


ORACLE_WINDOW_TIME_RANGE = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_24h,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100
         AS value_24h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '24 hours' PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def null_ordering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§7.8 risk 2 made explicit: engines default null sort order
    differently (Spark ASC=NULLS FIRST, DuckDB ASC=NULLS LAST), so
    every ordered surface in this repo pins the order. This query
    sorts a genuinely-nullable column (lag over each customer's
    orders — first order has no predecessor) with explicit NULLS
    FIRST and a unique tiebreak."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).alias("days_since_prev"),
    )
    return gaps.orderBy(
        F.col("days_since_prev").asc_nulls_first(), F.col("o_orderkey").asc()
    ).limit(100)


ORACLE_NULL_ORDERING_TOPK = """
WITH gaps AS (
  SELECT o_orderkey, o_custkey,
         CAST(date_diff('day',
              LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS INTEGER) AS days_since_prev
  FROM orders
)
SELECT o_orderkey, o_custkey, days_since_prev
FROM gaps
ORDER BY days_since_prev ASC NULLS FIRST, o_orderkey ASC
LIMIT 100
"""


def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution-rank window family (§2.8 completion):
    ``ntile`` quartiles, ``percent_rank``, ``cume_dist`` and
    ``nth_value`` per order-priority partition, ordered by a UNIQUE
    key pair (price, orderkey) — uniqueness makes RANGE and ROWS
    default frames coincide and every rank deterministic, so the
    floats (small-integer ratios, IEEE-exact in both engines)
    hash-match the oracle. Ranks are computed over the FULL
    partition, then a keyed sample keeps the driver payload small."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.ntile(4).over(w).alias("price_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.nth_value("o_orderkey", 3).over(w).alias("third_key_so_far"),
        )
        .filter(F.col("o_orderkey") % 50 == 0)
        .orderBy("o_orderpriority", "o_orderkey")
    )


ORACLE_WINDOW_DISTRIBUTION_RANKS = """
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         ntile(4) OVER w AS price_quartile,
         percent_rank() OVER w AS pct_rank,
         cume_dist() OVER w AS cume,
         nth_value(o_orderkey, 3) OVER w AS third_key_so_far
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC)
)
SELECT * FROM ranked
WHERE o_orderkey % 50 = 0
ORDER BY o_orderpriority, o_orderkey
"""


def rolling_median_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day EXACT median of daily revenue — the robust
    trend line dashboards want where the mean is outlier-hostage.
    Spark has no median over a window frame (analysis error), so the
    engine composes it: ``collect_list`` over a RANGE frame on the
    day key, ``array_sort``, and closed-form middle selection — all
    JVM-side.  The frame is BOUNDED by construction (≤7 day-rollup
    rows), so the per-row array never grows with data volume; and
    the unpartitioned window runs over the DAY-level rollup, whose
    cardinality is calendar time, not corpus size — the same
    fact-never-enters-a-global-window rule as `chi_square_assoc`.
    DuckDB's native windowed ``median`` (avg-of-middles on even
    counts — the same formula) is the oracle."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            epoch_day("o_orderdate").alias("day"),
            cents(F.col("o_totalprice")).alias("price_c"),
        )
        .groupBy("day")
        .agg(F.sum("price_c").alias("rev_c"))
    )
    w = Window.orderBy("day").rangeBetween(-6, 0)
    vals = F.array_sort(F.collect_list("rev_c").over(w))
    n = F.size(vals)
    odd = F.element_at(vals, ((n + 1) / 2).cast("int")).cast("double")
    even = (
        F.element_at(vals, (n / 2).cast("int"))
        + F.element_at(vals, (n / 2).cast("int") + 1)
    ) / 2.0
    med_c = F.when(n % 2 == 1, odd).otherwise(even)
    return daily.select(
        "day",
        dollars(F.col("rev_c")).alias("revenue"),
        F.round(med_c / 100.0, 6).alias("median_7d"),
    ).orderBy("day")


ORACLE_ROLLING_MEDIAN = """
WITH daily AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY day
)
SELECT day, rev_c / 100.0 AS revenue,
       ROUND(median(rev_c) OVER (ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0, 6)
         AS median_7d
FROM daily ORDER BY day
"""


def revenue_growth_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth — the reporting staple: weekly
    revenue rollup (Monday-aligned epoch-day week ids, the
    `cohort_retention` convention), previous week via ``lag`` and
    the percent change in one pass.  The lag window runs over the
    WEEK-level rollup (calendar-bounded cardinality), never the
    fact; growth is null for the first week rather than a
    divide-by-zero."""
    weekly = (
        load_table(spark, sf_dir, "orders")
        .select(
            epoch_day("date_trunc('week', o_orderdate)").alias("week_day"),
            cents(F.col("o_totalprice")).alias("price_c"),
        )
        .groupBy("week_day")
        .agg(F.sum("price_c").alias("rev_c"))
    )
    w = Window.orderBy("week_day")
    prev = F.lag("rev_c").over(w)
    return weekly.select(
        "week_day",
        dollars(F.col("rev_c")).alias("revenue"),
        F.round(
            (F.col("rev_c") - prev) * 100.0 / prev, 6
        ).alias("growth_pct"),
    ).orderBy("week_day")


ORACLE_REVENUE_GROWTH_WOW = """
WITH weekly AS (
  SELECT CAST(epoch_us(CAST(date_trunc('week', o_orderdate) AS TIMESTAMP))
              // 86400000000 AS BIGINT) AS week_day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY week_day
)
SELECT week_day, rev_c / 100.0 AS revenue,
       ROUND((rev_c - LAG(rev_c) OVER (ORDER BY week_day)) * 100.0
             / LAG(rev_c) OVER (ORDER BY week_day), 6) AS growth_pct
FROM weekly ORDER BY week_day
"""


def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES (`RANK() <= k`) — the semantics LIMIT cannot
    express: every part tied at the boundary retail price survives,
    so the result is a function of the DATA alone, not of sort-order
    luck.  Per brand, all parts ranked ≤ 3 by price descending.
    WindowGroupLimit pushes the rank filter below the full sort, so
    each partition keeps O(k + ties) rows."""
    part = load_table(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice"
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        part.withColumn("price_rank", F.rank().over(w))
        .filter(F.col("price_rank") <= 3)
        .orderBy("p_brand", "price_rank", "p_partkey")
    )


ORACLE_TOPK_WITH_TIES = """
SELECT p_brand, p_partkey, p_retailprice,
       RANK() OVER (PARTITION BY p_brand
                    ORDER BY p_retailprice DESC) AS price_rank
FROM part
QUALIFY price_rank <= 3
ORDER BY p_brand, price_rank, p_partkey
"""


QUERIES: dict[str, QuerySpec] = {
    "revenue_growth_wow": QuerySpec(
        revenue_growth_wow, ORACLE_REVENUE_GROWTH_WOW, ["§2.8", "X-ts", "A1"]
    ),
    "topk_with_ties": QuerySpec(
        topk_with_ties, ORACLE_TOPK_WITH_TIES, ["§2.8", "T1"]
    ),
    "rolling_median_revenue": QuerySpec(
        rolling_median_revenue, ORACLE_ROLLING_MEDIAN, ["§2.8", "X-ts", "A1"]
    ),
    "window_distribution_ranks": QuerySpec(
        window_distribution_ranks, ORACLE_WINDOW_DISTRIBUTION_RANKS, ["§2.8"]
    ),
    "null_ordering_topk": QuerySpec(
        null_ordering_topk, ORACLE_NULL_ORDERING_TOPK, ["T3"]
    ),
    "window_time_range": QuerySpec(
        window_time_range, ORACLE_WINDOW_TIME_RANGE, []
    ),
    "window_running_total": QuerySpec(
        window_running_total, ORACLE_WINDOW_RUNNING_TOTAL, [], bench=True
    ),
    "window_topk_per_group": QuerySpec(
        window_topk_per_group, ORACLE_WINDOW_TOPK_PER_GROUP, []
    ),
    "window_lag_lead": QuerySpec(window_lag_lead, ORACLE_WINDOW_LAG_LEAD, []),
    "dedup_by_key": QuerySpec(dedup_by_key, ORACLE_DEDUP_BY_KEY, ["A9"]),
    "first_writer_wins": QuerySpec(
        first_writer_wins, ORACLE_FIRST_WRITER_WINS, ["A10"]
    ),
    "sessionize_batch": QuerySpec(
        sessionize_batch, ORACLE_SESSIONIZE_BATCH, ["X-ts"], bench=True
    ),
}
