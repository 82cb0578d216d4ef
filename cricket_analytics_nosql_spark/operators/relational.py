"""Relational operator library — SURVEY.md §2.2/2.4/2.6 re-expressed
as Spark DataFrame plans over the driver's star schema.

Each query cites the reference operator(s) it generalizes
(file:line of /root/reference) and ships with a DuckDB oracle.
Plans are written so Catalyst produces the physical shape we want at
100 TB: filters/projections at the scan, partial aggregation before
the shuffle, broadcast joins for dims, TakeOrderedAndProject for
top-k (never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.scalar import (
    cents,
    dollars,
    flag,
    revenue_cents,
)
from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Flagship: the reference's runs_by_batter (mongo_analytics_examples.py:18-29)
# shape — group → multi-agg → derived metric → top-k — over the star schema.
# ---------------------------------------------------------------------------

def top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+A5+T1+J1: $group/$addFields/$sort/$limit pipeline
    (mongo_analytics_examples.py:19-28) as scan → partial+final hash
    agg → broadcast dim join → TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", revenue_cents().alias("rev_cents")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # Aggregate per order BEFORE the join: distinct-orders-per-
    # customer becomes a plain count, so no countDistinct Expand —
    # both aggregation layers stay map-side combinable, and the join
    # probes one row per order instead of one per line item
    # (measured ~1.3× here; the ratio grows with items-per-order).
    per_order = li.groupBy("l_orderkey").agg(
        F.sum("rev_cents").alias("rc"), F.count(F.lit(1)).alias("ni")
    )
    per_cust = (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum("rc").alias("rev_cents"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("ni").alias("n_items"),
        )
    )
    return (
        # no broadcast hint: customer scales with SF — the planner
        # broadcasts from file-size stats at small SF (the plan gate
        # still sees BroadcastHashJoin), shuffles at 100 TB
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            dollars("rev_cents").alias("revenue"),
            "n_orders",
            "n_items",
            # strikeRate-style derived rate (mongo_analytics_examples.py:24-25)
            (F.col("rev_cents").cast("double") / 100 / F.col("n_orders")).alias(
                "avg_order_revenue"
            ),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


ORACLE_TOP_REVENUE_CUSTOMERS = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev_cents,
         COUNT(DISTINCT l_orderkey) AS n_orders,
         COUNT(*) AS n_items
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
)
SELECT c_custkey, c_name,
       CAST(rev_cents AS DOUBLE) / 100 AS revenue,
       n_orders, n_items,
       CAST(rev_cents AS DOUBLE) / 100 / n_orders AS avg_order_revenue
FROM per_cust JOIN customer ON o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+A5 (TPC-H Q1 shape): multi-aggregate hash group-by with
    derived post-agg columns — the $group stage of
    mongo_analytics_examples.py:20-23 widened to 8 aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge = cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents("l_quantity")).alias("qty_c"),
            F.sum(cents("l_extendedprice")).alias("base_c"),
            F.sum(disc_price).alias("disc_c"),
            F.sum(charge).alias("charge_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        dollars("qty_c").alias("sum_qty"),
        dollars("base_c").alias("sum_base_price"),
        dollars("disc_c").alias("sum_disc_price"),
        dollars("charge_c").alias("sum_charge"),
        (F.col("qty_c").cast("double") / 100 / F.col("count_order")).alias("avg_qty"),
        (F.col("base_c").cast("double") / 100 / F.col("count_order")).alias("avg_price"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_disc_price,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_charge,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Projections / filters / predicates (§2.2)
# ---------------------------------------------------------------------------

def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10+P16 + isin/between: conjunctive equality + membership +
    range predicates, all pushed into the parquet scan
    (the $match stage, mongo_analytics_examples.py:42)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & F.col("l_linestatus").isin("F", "O")
        & F.col("l_quantity").between(10, 20)
        & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


ORACLE_FILTER_PREDICATES = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_returnflag = 'R' AND l_linestatus IN ('F','O')
  AND l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05
"""


def projection_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: projected scan — Catalyst column pruning ≙ the reference's
    server-side find() projections (neo4j_loader.py:82,96-99)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_orderpriority").filter(
        F.col("o_orderstatus") == "O"
    )


ORACLE_PROJECTION_PRUNED = """
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
"""


def limited_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+T1: deterministic row-cap — the reference's --limit cursor
    break (neo4j_loader.py:133-135) as GlobalLimit over a unique sort
    key (unordered LIMIT would be nondeterministic in any engine)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy("o_orderkey").limit(100).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


ORACLE_LIMITED_SCAN = """
SELECT o_orderkey, o_custkey, o_orderstatus
FROM orders ORDER BY o_orderkey LIMIT 100
"""


def derived_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9+A3: 0/1 flag materialization then cheap sums — is_boundary /
    is_dot (etl_cricsheet_to_mongo.py:104-105) generalized: flag at
    scan, aggregate with plain SUM (compute pushdown to write/scan
    time, SURVEY.md §4)."""
    li = load_table(spark, sf_dir, "lineitem")
    flagged = li.select(
        "l_suppkey",
        flag(F.col("l_quantity").isin(4.0, 6.0)).alias("is_small_lot"),
        flag(F.col("l_discount") == 0.0).alias("is_full_price"),
        flag(F.col("l_returnflag") == "R").alias("is_returned"),
    )
    return (
        flagged.groupBy("l_suppkey")
        .agg(
            F.sum("is_small_lot").alias("small_lots"),
            F.sum("is_full_price").alias("full_price_items"),
            F.sum("is_returned").alias("returned_items"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_suppkey")
    )


ORACLE_DERIVED_FLAGS = """
SELECT l_suppkey,
       CAST(SUM(CASE WHEN l_quantity IN (4.0, 6.0) THEN 1 ELSE 0 END) AS BIGINT) AS small_lots,
       CAST(SUM(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS full_price_items,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_items,
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
"""


def conditional_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: conditional string formatting — the reference's result-text
    builder ('X won by N runs/wickets', etl_cricsheet_to_mongo.py:41-49)
    as when/otherwise + concat."""
    orders = load_table(spark, sf_dir, "orders")
    result_text = (
        F.when(
            F.col("o_orderstatus") == "F",
            F.concat(F.lit("fulfilled at "), F.col("o_totalprice").cast("string")),
        )
        .when(F.col("o_orderstatus") == "O", F.lit("open"))
        .otherwise(F.concat(F.lit("pending-"), F.col("o_orderpriority")))
    )
    return orders.select("o_orderkey", result_text.alias("status_text"))


ORACLE_CONDITIONAL_FORMAT = """
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'F'
                THEN 'fulfilled at ' || CAST(o_totalprice AS VARCHAR)
            WHEN o_orderstatus = 'O' THEN 'open'
            ELSE 'pending-' || o_orderpriority END AS status_text
FROM orders
"""


def json_coalesce_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3 + §2.9 JSON extraction: field-fallback coalesce chains
    (etl_cricsheet_to_mongo.py:31,80-81; $ifNull at
    mongo_analytics_examples.py:33) over the events.props JSON column,
    plus the synthetic concat-key fallback (etl:52)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    missing = F.get_json_object(F.col("props"), "$.does_not_exist").cast("int")
    return ev.select(
        "event_id",
        F.coalesce(missing, k, F.lit(-1)).alias("k_resolved"),
        F.coalesce(
            F.get_json_object(F.col("props"), "$.name"),
            F.concat_ws("-", F.col("event_type"), F.col("user_id").cast("string")),
        ).alias("synthetic_key"),
    )


ORACLE_JSON_COALESCE_FALLBACK = """
SELECT event_id,
       COALESCE(CAST(json_extract_string(props, '$.does_not_exist') AS INTEGER),
                CAST(json_extract_string(props, '$.k') AS INTEGER), -1) AS k_resolved,
       COALESCE(json_extract_string(props, '$.name'),
                event_type || '-' || CAST(user_id AS VARCHAR)) AS synthetic_key
FROM events
"""


def try_cast_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: try-cast semantics — datetime.fromisoformat with
    null-on-failure (etl_cricsheet_to_mongo.py:33-37) as
    try_to_timestamp over a string column with planted bad values."""
    orders = load_table(spark, sf_dir, "orders")
    date_str = F.when(
        F.col("o_orderkey") % 10 == 0, F.lit("not-a-date")
    ).otherwise(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
    parsed = F.try_to_timestamp(date_str)
    return orders.select(
        "o_orderkey",
        F.date_format(parsed, "yyyy-MM-dd").alias("parsed_date"),
        parsed.isNull().cast("int").alias("parse_failed"),
    )


ORACLE_TRY_CAST_TIMESTAMP = """
WITH s AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN 'not-a-date'
              ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS date_str
  FROM orders
)
SELECT o_orderkey,
       strftime(TRY_CAST(date_str AS TIMESTAMP), '%Y-%m-%d') AS parsed_date,
       CAST(TRY_CAST(date_str AS TIMESTAMP) IS NULL AS INTEGER) AS parse_failed
FROM s
"""


def struct_restructure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: struct restructuring projection — the nested doc builder
    (etl_cricsheet_to_mongo.py:51-68) round-tripped: pack scalars into
    nested structs, then project fields back out (proves nested schema
    handling; output is flat so the oracle can hash it)."""
    c = load_table(spark, sf_dir, "customer")
    nested = c.select(
        F.col("c_custkey").alias("_id"),
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.struct(F.col("c_nationkey").alias("nation")).alias("geo"),
        ).alias("info"),
        F.struct(F.col("c_acctbal").alias("balance")).alias("account"),
    )
    return nested.select(
        "_id",
        F.col("info.name").alias("name"),
        F.col("info.segment").alias("segment"),
        F.col("info.geo.nation").alias("nation"),
        F.col("account.balance").alias("balance"),
    )


ORACLE_STRUCT_RESTRUCTURE = """
SELECT c_custkey AS _id, c_name AS name, c_mktsegment AS segment,
       c_nationkey AS nation, c_acctbal AS balance
FROM customer
"""


# ---------------------------------------------------------------------------
# Aggregations (§2.4)
# ---------------------------------------------------------------------------

def global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: grand-total rollup ($group _id:None,
    mongo_analytics_examples.py:43-46) — partial agg on every
    partition, single-row final merge."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents("l_extendedprice")).alias("total_price_cents"),
        F.sum(flag(F.col("l_returnflag") == "R")).alias("n_returned"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    ).select(
        "n_rows",
        dollars("total_price_cents").alias("total_price"),
        "n_returned",
        F.date_format("first_ship", "yyyy-MM-dd HH:mm:ss").alias("first_ship"),
        F.date_format("last_ship", "yyyy-MM-dd HH:mm:ss").alias("last_ship"),
    )


ORACLE_GLOBAL_AGG = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_price,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S') AS first_ship,
       strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S') AS last_ship
FROM lineitem
"""


def count_if_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A6: conditional aggregate + HAVING — wickets-per-bowler
    ($cond sum, mongo_analytics_examples.py:33-34) with the Cypher
    'WITH ... WHERE balls >= 30' post-agg filter
    (cypher_queries.cypher:12-13)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
                "n_discounted"
            ),
        )
        .filter(F.col("n_items") >= 5)
        .orderBy("l_partkey")
    )


ORACLE_COUNT_IF_HAVING = """
SELECT l_partkey, COUNT(*) AS n_items,
       COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted
FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 5 ORDER BY l_partkey
"""


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countDistinct (SURVEY §2.4 free-extender): distinct suppliers
    and parts per order — expand-based distinct aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_orderkey")
    )


ORACLE_DISTINCT_AGG = """
SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_items
FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
"""


def topk_multi_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3+A5: multi-key mixed-direction sort + limit — ORDER BY
    strikeRate ASC, outs DESC LIMIT 10 (cypher_queries.cypher:15-16)
    over per-brand economics; plans as TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_brand = (
        # no broadcast hint: part scales with SF — the planner picks
        # broadcast from file-size stats at small SF, shuffle at 100 TB
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(cents("l_quantity")).alias("qty_c"),
            F.count(F.lit(1)).alias("n_items"),
            F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
        )
    )
    return (
        per_brand.select(
            "p_brand",
            (F.col("qty_c").cast("double") / 100 / F.col("n_items") * 100).alias(
                "qty_rate"
            ),
            "n_returned",
        )
        .orderBy(F.asc("qty_rate"), F.desc("n_returned"), F.asc("p_brand"))
        .limit(10)
    )


ORACLE_TOPK_MULTI_SORT = """
WITH per_brand AS (
  SELECT p_brand,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_c,
         COUNT(*) AS n_items,
         COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand,
       CAST(qty_c AS DOUBLE) / 100 / n_items * 100 AS qty_rate,
       n_returned
FROM per_brand
ORDER BY qty_rate ASC, n_returned DESC, p_brand ASC
LIMIT 10
"""


QUERIES: dict[str, QuerySpec] = {
    "top_revenue_customers": QuerySpec(
        top_revenue_customers,
        ORACLE_TOP_REVENUE_CUSTOMERS,
        ["A1", "A2", "A5", "P15", "T1", "J1"],
        bench=True,
    ),
    "pricing_summary": QuerySpec(
        pricing_summary, ORACLE_PRICING_SUMMARY, ["A1", "A2", "A5"], bench=True
    ),
    "filter_predicates": QuerySpec(
        filter_predicates, ORACLE_FILTER_PREDICATES, ["P10", "P16"]
    ),
    "projection_pruned": QuerySpec(
        projection_pruned, ORACLE_PROJECTION_PRUNED, ["S6", "P14"]
    ),
    "limited_scan": QuerySpec(limited_scan, ORACLE_LIMITED_SCAN, ["S7", "T1"]),
    "derived_flags": QuerySpec(derived_flags, ORACLE_DERIVED_FLAGS, ["P9", "A3"]),
    "conditional_format": QuerySpec(
        conditional_format, ORACLE_CONDITIONAL_FORMAT, ["P5"]
    ),
    "json_coalesce_fallback": QuerySpec(
        json_coalesce_fallback, ORACLE_JSON_COALESCE_FALLBACK, ["P2", "P3"]
    ),
    "try_cast_timestamp": QuerySpec(
        try_cast_timestamp, ORACLE_TRY_CAST_TIMESTAMP, ["P4"]
    ),
    "struct_restructure": QuerySpec(
        struct_restructure, ORACLE_STRUCT_RESTRUCTURE, ["P1"]
    ),
    "global_agg": QuerySpec(global_agg, ORACLE_GLOBAL_AGG, ["A4"]),
    "count_if_having": QuerySpec(count_if_having, ORACLE_COUNT_IF_HAVING, ["A3", "A6"]),
    "distinct_agg": QuerySpec(distinct_agg, ORACLE_DISTINCT_AGG, ["A1"]),
    "topk_multi_sort": QuerySpec(
        topk_multi_sort, ORACLE_TOPK_MULTI_SORT, ["T3", "A5"], bench=True
    ),
}
