"""Set operations, grouping analytics (rollup/cube/pivot), exact
percentiles, array/nested ops, and the scalar-function sampler —
SURVEY.md §2.7, §2.4 free-extenders, §2.9, and the F1 nested-flatten
shape over the star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.scalar import cents, dollars
from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table


def union_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: UNION ALL + distinct — multi-source event-log merge
    (SURVEY §2.7: the fixture queries exercise union)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_type")
    b = ev.filter(F.col("value") > 150).select("user_id", "event_type")
    return (
        a.union(b)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("user_id", "event_type")
    )


ORACLE_UNION_SETS = """
WITH u AS (
  SELECT user_id, event_type FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, event_type FROM events WHERE value > 150
)
SELECT user_id, event_type, COUNT(*) AS n
FROM u GROUP BY user_id, event_type ORDER BY user_id, event_type
"""


def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: INTERSECT and EXCEPT — customers who buy in BUILDING
    segment AND have open orders, minus those with pending ones."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("key")
    )
    open_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("key")
    )
    pending_cust = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("key")
    )
    return building.intersect(open_cust).exceptAll(pending_cust.distinct()).orderBy(
        "key"
    )


ORACLE_INTERSECT_EXCEPT = """
SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'P'
ORDER BY key
"""


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (SURVEY §2.4 free-extender): region → nation hierarchy
    totals with explicit grouping flags (cross-engine-stable encoding
    of the subtotal rows)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    enriched = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        enriched.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(cents("c_acctbal")).alias("bal_c"),
        )
        .select(
            "r_name",
            "n_name",
            "g_region",
            "g_nation",
            "n_customers",
            dollars("bal_c").alias("total_balance"),
        )
        .orderBy("g_region", "g_nation", "r_name", "n_name")
    )


ORACLE_ROLLUP_AGG = """
SELECT r_name, n_name,
       CAST(GROUPING(r_name) AS INTEGER) AS g_region,
       CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY g_region, g_nation, r_name, n_name
"""


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (SURVEY §2.4 free-extender): all subtotal combinations of
    (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(cents("l_quantity")).alias("qty_c"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "g_rf",
            "g_ls",
            "n_items",
            dollars("qty_c").alias("sum_qty"),
        )
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
    )


ORACLE_CUBE_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
"""


def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-priority order counts spread across status columns —
    equivalent to conditional aggregation, which is the oracle form."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .orderBy("o_orderpriority")
    )


ORACLE_PIVOT_WIDE = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT — the engine's native semi-structured type
    (binary-encoded, shredding-ready): ``parse_json`` once at the
    scan edge, then typed ``variant_get`` path extraction instead of
    per-query string re-parsing. At 100 TB the difference is real:
    a VARIANT column parses each payload once at ingest and
    extraction is a binary walk, where ``get_json_object`` re-parses
    the JSON text in every query that touches it. Rollup of the
    extracted value per event type, oracled against DuckDB's JSON
    path extraction."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    return (
        ev.select(
            "event_type",
            F.variant_get(F.col("v"), "$.k", "int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_total"),
            F.max("k").alias("k_max"),
            F.sum(F.col("k").isNull().cast("long")).alias("k_missing"),
        )
        .orderBy("event_type")
    )


ORACLE_VARIANT_EXTRACT = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
           AS k_total,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER)
           AS k_max,
       CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS k_missing
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safety surface: Spark 4 runs ANSI SQL by default,
    where 1/0 THROWS mid-job instead of returning NULL — the
    production idiom for fallible arithmetic is the ``try_*`` family
    (NULL on failure, job survives). Per-user purchase/view
    conversion where zero-view users make the denominator genuinely
    zero: ``try_divide`` yields NULL rows instead of killing the
    2-billion-row aggregate 97% of the way in. DuckDB's division
    already NULLs on zero, which is exactly the oracle."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("n_views"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "n_purchases"
        ),
    )
    return (
        per_user.select(
            "user_id",
            "n_views",
            "n_purchases",
            F.round(
                F.try_divide(F.col("n_purchases"), F.col("n_views")), 6
            ).alias("conversion"),
        )
        .orderBy("user_id")
        .limit(500)
    )


ORACLE_TRY_ARITHMETIC = """
WITH per_user AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_views,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS n_purchases
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(n_views AS BIGINT) AS n_views,
       CAST(n_purchases AS BIGINT) AS n_purchases,
       -- explicit NULL guard, not bare division: DuckDB >= 1.1
       -- defaults ieee_floating_point_ops=true, where x/0 is
       -- inf/nan rather than the NULL try_divide produces
       CASE WHEN n_views = 0 THEN NULL
            ELSE ROUND(CAST(n_purchases AS DOUBLE) / n_views, 6)
       END AS conversion
FROM per_user
ORDER BY user_id
LIMIT 500
"""


def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (``DataFrame.unpivot``/melt) — pivot_wide's inverse
    and the feature-engineering normalizer (wide metric columns →
    (metric, value) rows). Round-trips THROUGH the pivot: the wide
    per-priority status counts melt back to one row per
    (priority, status) — a narrow Expand over the wide frame, no
    shuffle of its own."""
    wide = pivot_wide(spark, sf_dir)
    return (
        wide.unpivot(
            ids=["o_orderpriority"],
            values=["F", "O", "P"],
            variableColumnName="status",
            valueColumnName="n_orders",
        )
        .orderBy("o_orderpriority", "status")
    )


ORACLE_UNPIVOT_LONG = """
WITH p AS (
  SELECT DISTINCT o_orderpriority FROM orders
), s AS (
  SELECT UNNEST(['F', 'O', 'P']) AS status
), c AS (
  SELECT o_orderpriority, o_orderstatus AS status, COUNT(*) AS n
  FROM orders GROUP BY o_orderpriority, o_orderstatus
)
SELECT p.o_orderpriority, s.status,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
FROM p CROSS JOIN s
LEFT JOIN c ON c.o_orderpriority = p.o_orderpriority
           AND c.status = s.status
ORDER BY p.o_orderpriority, s.status
"""


def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (SURVEY §2.4 free-extender; the approximate
    twin ``approx_quantiles`` below is the 100 TB path). l_quantity
    is integral so the linear-interpolated quantile is exact in both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("median_qty"),
            F.percentile("l_quantity", 0.9).alias("p90_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_PERCENTILE_STATS = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` (Greenwald-Khanna sketch) next to the
    exact quantile — the ``approx_distinct`` dual pattern: the sketch
    has no byte-exact cross-engine oracle, so the query emits the
    EXACT percentiles (oracled exactly) plus a boolean per quantile
    asserting the sketch landed within a 2%-of-value envelope
    (oracled as literal TRUE; GK rank error at accuracy 10000 is
    1/10000 of rows — orders tighter than 2% of value on this data).
    At 100 TB the sketch column is the one you'd ship: fixed-size
    mergeable state, one pass, no per-group sort."""
    li = load_table(spark, sf_dir, "lineitem")
    within = lambda approx, exact: (  # noqa: E731
        (F.abs(F.col(approx) - F.col(exact)) / F.col(exact)) <= F.lit(0.02)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.5).alias("median_price"),
            F.percentile("l_extendedprice", 0.99).alias("p99_price"),
            F.expr(
                "approx_percentile(l_extendedprice, 0.5, 10000)"
            ).alias("a_median"),
            F.expr(
                "approx_percentile(l_extendedprice, 0.99, 10000)"
            ).alias("a_p99"),
        )
        .select(
            "l_returnflag",
            "median_price",
            "p99_price",
            within("a_median", "median_price").alias("approx_median_ok"),
            within("a_p99", "p99_price").alias("approx_p99_ok"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_APPROX_QUANTILES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS median_price,
       quantile_cont(l_extendedprice, 0.99) AS p99_price,
       TRUE AS approx_median_ok,
       TRUE AS approx_p99_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def string_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — Spark 4's native ``listagg``
    with ``WITHIN GROUP (ORDER BY ...)``: the explicit order clause
    is what makes the concatenation deterministic under parallel
    merge (an unordered listagg/collect_list string is partition-
    order-dependent and can never be oracled, or trusted, at scale).
    Distinct ship-statuses observed per priority.

    Spelled as ``array_join(sort_array(collect_set(..)))`` rather
    than Spark 4's native ``listagg``: ``listagg(DISTINCT ..) WITHIN
    GROUP (ORDER BY ..)`` over a real grouped table dies in Catalyst
    on this build (AttributeReference→SortOrder ClassCastException;
    the same text over a VALUES literal works). The composition is
    semantically identical and plans as an ordinary partial-merged
    aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.collect_set("o_orderstatus").alias("s"))
        .select(
            "o_orderpriority",
            F.array_join(F.sort_array("s"), ",").alias("statuses"),
            F.size("s").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_STRING_AGG_ROLLUP = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
           AS statuses,
       CAST(COUNT(DISTINCT o_orderstatus) AS INTEGER) AS n_statuses
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface (stddev / variance / correlation
    / covariance): cross-engine float drift is ~1e-15 relative (the
    engines use different accumulation schemes), so results are
    rounded to 6 dp — drift sits nine orders below the rounding grid,
    which keeps the hash check deterministic while still pinning all
    six significant digits."""
    li = load_table(spark, sf_dir, "lineitem")
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # +0.0: -0.0 -> 0.0  # noqa: E731
    return (
        li.groupBy("l_returnflag")
        .agg(
            r6(F.stddev_samp("l_quantity")).alias("sd_qty"),
            # var of ~1e9-magnitude values: round at 2 dp, not 6 — keeps
            # the grid 1e7x above worst-case cross-engine drift
            (F.round(F.var_samp("l_extendedprice"), 2) + F.lit(0.0)).alias("var_price"),
            r6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
            r6(F.covar_samp("l_discount", "l_tax")).alias("covar_disc_tax"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_STATS_MOMENTS = """
SELECT l_returnflag,
       ROUND(stddev_samp(l_quantity), 6) + 0.0 AS sd_qty,
       ROUND(var_samp(l_extendedprice), 2) + 0.0 AS var_price,
       ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qty_price,
       ROUND(covar_samp(l_discount, l_tax), 6) + 0.0 AS covar_disc_tax
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def nested_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: the reference's signature 3-level flatten
    (etl_cricsheet_to_mongo.py:70-106) proven on the star schema:
    nest lineitems into per-order arrays-of-structs (innings→overs→
    deliveries analogue), then explode back down carrying ancestor
    columns, posexplode supplying the per-over ball number that the
    source often omits (neo4j_loader.py:113-115)."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        li.select(
            "l_orderkey",
            F.struct("l_linenumber", "l_quantity", "l_partkey").alias("item"),
        )
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("item")).alias("items"))
    )
    flattened = nested.select(
        "l_orderkey", F.posexplode("items").alias("pos", "item")
    ).select(
        "l_orderkey",
        (F.col("pos") + 1).alias("ball_no"),
        F.col("item.l_linenumber").alias("l_linenumber"),
        F.col("item.l_quantity").alias("l_quantity"),
    )
    return flattened.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(cents("l_quantity")).alias("qty_c"),
        F.max("ball_no").alias("max_ball"),
        F.min("l_linenumber").alias("first_line"),
    ).select(
        "l_orderkey", "n_items", dollars("qty_c").alias("sum_qty"),
        "max_ball", "first_line",
    ).orderBy("l_orderkey")


ORACLE_NESTED_EXPLODE_ROUNDTRIP = """
SELECT l_orderkey, COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
       COUNT(*) AS max_ball,
       MIN(l_linenumber) AS first_line
FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
"""


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P13+§2.9 array surface: build per-part word arrays, take
    head element (null-safe), size with the F.size(NULL) = -1 pitfall
    handled via coalesce (mongo_analytics_examples.py:33)."""
    part = load_table(spark, sf_dir, "part")
    arr = F.split("p_name", " ")
    empty_guarded = F.coalesce(
        F.when(F.col("p_size") < 0, F.lit(None)).otherwise(arr), F.array()
    )
    return part.select(
        "p_partkey",
        F.element_at(arr, 1).alias("first_word"),
        F.size(empty_guarded).alias("n_words"),
        F.array_contains(arr, "red").cast("int").alias("has_red"),
        F.concat_ws("|", F.sort_array(arr)).alias("sorted_words"),
    )


ORACLE_ARRAY_FUNCTIONS = """
SELECT p_partkey,
       string_split(p_name, ' ')[1] AS first_word,
       len(string_split(p_name, ' ')) AS n_words,
       CAST(list_contains(string_split(p_name, ' '), 'red') AS INTEGER) AS has_red,
       array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_words
FROM part
"""


def scalar_function_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 scalar inventory: string concat (etl:52), casing,
    substring, length, membership (etl:104), date arithmetic and
    formatting — one projection exercising each."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderkey").cast("string")).alias(
            "concat_key"
        ),
        F.lower("o_orderpriority").alias("prio_lower"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").alias("prio_len"),
        F.col("o_orderstatus").isin("F", "P").cast("int").alias("is_closedish"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.year("o_orderdate").alias("order_year"),
        F.abs(F.col("o_totalprice") * -1).alias("abs_price"),
        F.round(F.col("o_totalprice") / 1000, 1).alias("price_k"),
    )


ORACLE_SCALAR_FUNCTION_SAMPLER = """
SELECT o_orderkey,
       o_orderstatus || '-' || CAST(o_orderkey AS VARCHAR) AS concat_key,
       LOWER(o_orderpriority) AS prio_lower,
       SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
       LENGTH(o_orderpriority) AS prio_len,
       CAST(o_orderstatus IN ('F','P') AS INTEGER) AS is_closedish,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       ABS(o_totalprice * -1) AS abs_price,
       ROUND(o_totalprice / 1000, 1) AS price_k
FROM orders
"""


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) next to the exact count. The
    sketch's register layout differs from DuckDB's HLL, so the approx
    value itself can have no byte-exact oracle — instead the query
    emits the EXACT counts (oracled exactly) plus a boolean per
    column asserting the sketch landed within its documented ±5%
    relative-error envelope (oracled as literal TRUE). The driver's
    hash check therefore verifies both the exact path and the sketch
    bound; ``tests/test_quality.py`` pins the tighter measured error.
    At 100 TB the approx column is the one you'd ship: mergeable
    fixed-size state, no second Expand pass over the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    within = lambda approx, exact: (  # noqa: E731
        (F.abs(F.col(approx) - F.col(exact)) / F.col(exact)) <= F.lit(0.05)
    )
    return (
        li.agg(
            F.count_distinct("l_orderkey").alias("exact_orders"),
            F.count_distinct("l_partkey").alias("exact_parts"),
            # rsd 1.5%: the default 5% is a *standard deviation*, so
            # a single sketch misses a 5% gate ~1 run in 3 on small
            # cardinalities; 1.5% keeps the gate safe at every SF for
            # a fixed ~37 KB of register state
            F.approx_count_distinct("l_orderkey", 0.015).alias("a_o"),
            F.approx_count_distinct("l_partkey", 0.015).alias("a_p"),
        )
        .select(
            "exact_orders",
            "exact_parts",
            within("a_o", "exact_orders").alias("approx_orders_ok"),
            within("a_p", "exact_parts").alias("approx_parts_ok"),
        )
    )


ORACLE_APPROX_DISTINCT = """
SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS approx_orders_ok,
       TRUE AS approx_parts_ok
FROM lineitem
"""


def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup over the event
    log: one pass produces hour, day, per-type, and grand-total
    aggregates (the continuous-aggregate shape time-series stores
    materialize; here a single declarative ROLLUP over time buckets).

    Scale notes: ROLLUP plans as one Expand (×4 rows) feeding a
    partial+final hash agg, so the shuffle carries one row per
    (grain, bucket) per map partition — bounded by bucket count, not
    event count. The exact COUNT(DISTINCT user_id) adds the standard
    second Expand pass; at 100 TB grains above hour should instead
    merge HLL sketches upward from the hour grain
    (``approx_count_distinct`` — see ``approx_distinct``), trading
    the distinct rescan for mergeable state. The bucket columns stay
    ``timestamp_ntz`` end-to-end (events.ts discipline, tables.py).
    """
    ev = load_table(spark, sf_dir, "events")
    bucketed = ev.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("bucket_day"),
        F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
        "user_id",
        cents("value").alias("value_c"),
    )
    return (
        bucketed.rollup("event_type", "bucket_day", "bucket_hour")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("bucket_day").cast("int").alias("g_day"),
            F.grouping("bucket_hour").cast("int").alias("g_hour"),
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.sum("value_c").alias("value_c"),
        )
        .select(
            "event_type",
            "bucket_day",
            "bucket_hour",
            "g_type",
            "g_day",
            "g_hour",
            "n_events",
            "n_users",
            dollars("value_c").alias("total_value"),
        )
        .orderBy(
            "g_type", "g_day", "g_hour", "event_type", "bucket_day", "bucket_hour"
        )
    )


ORACLE_TIME_ROLLUP = """
WITH b AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP)  AS bucket_day,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
         user_id,
         CAST(ROUND(value * 100) AS BIGINT) AS value_c
  FROM events
)
SELECT event_type, bucket_day, bucket_hour,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(bucket_day) AS INTEGER) AS g_day,
       CAST(GROUPING(bucket_hour) AS INTEGER) AS g_hour,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(value_c) AS DOUBLE) / 100 AS total_value
FROM b
GROUP BY ROLLUP (event_type, bucket_day, bucket_hour)
ORDER BY g_type, g_day, g_hour, event_type, bucket_day, bucket_hour
"""


def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension: the regex family the reference never needed
    but any log/text engine must have — extract, global replace,
    match-test — over part names."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), r"^(\w+)", 1).alias("first_token"),
        F.regexp_replace(F.col("p_name"), r"\s+", "_").alias("snake_name"),
        F.col("p_name").rlike("red|blue").cast("int").alias("has_color"),
        F.regexp_extract(F.col("p_name"), r"(\w+)$", 1).alias("last_token"),
    )


ORACLE_REGEX_FUNCTIONS = """
SELECT p_partkey,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_token,
       regexp_replace(p_name, '\\s+', '_', 'g') AS snake_name,
       CAST(regexp_matches(p_name, 'red|blue') AS INTEGER) AS has_color,
       regexp_extract(p_name, '(\\w+)$', 1) AS last_token
FROM part
"""


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension: MapType construction and explosion —
    attribute maps are how semi-structured per-row metadata travels
    (the reference's officials sub-document is exactly this shape,
    etl_cricsheet_to_mongo.py:59-66). Build map<attr,value>, explode
    to (key, value) rows, profile value frequencies per key."""
    part = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return (
        part.select("p_partkey", F.explode(m).alias("k", "v"))
        .groupBy("k", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k", "v")
    )


ORACLE_MAP_FUNCTIONS = """
SELECT k, v, COUNT(*) AS n FROM (
  SELECT 'brand' AS k, p_brand AS v FROM part
  UNION ALL
  SELECT 'type' AS k, p_type AS v FROM part
)
GROUP BY k, v ORDER BY k, v
"""


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension: log/exp/pow/sqrt math — absent from the
    reference but table stakes for an analytics engine. Rounded to 4
    decimals: JVM Math and libm agree to within ulps on these, and
    the rounding absorbs the difference; row count capped so the
    flap probability is negligible."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderkey")
        .limit(200)
        .select(
            "o_orderkey",
            F.round(F.log(F.col("o_totalprice")), 4).alias("ln_price"),
            F.round(F.log10(F.col("o_totalprice")), 4).alias("log10_price"),
            F.round(F.sqrt(F.col("o_totalprice")), 4).alias("sqrt_price"),
            F.round(F.pow(F.col("o_totalprice"), 0.25), 4).alias("price_4rt"),
            F.round(
                F.exp(F.col("o_totalprice") / 100000.0), 4
            ).alias("exp_scaled"),
        )
    )


ORACLE_MATH_FUNCTIONS = """
SELECT o_orderkey,
       ROUND(LN(o_totalprice), 4) AS ln_price,
       ROUND(LOG10(o_totalprice), 4) AS log10_price,
       ROUND(SQRT(o_totalprice), 4) AS sqrt_price,
       ROUND(POW(o_totalprice, 0.25), 4) AS price_4rt,
       ROUND(EXP(o_totalprice / 100000.0), 4) AS exp_scaled
FROM orders ORDER BY o_orderkey LIMIT 200
"""


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension: pad / reverse / replace / position / repeat —
    the rest of the string family beyond the sampler."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_up"),
        F.lpad(F.col("p_brand"), 12, ".").alias("brand_pad"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.replace(
            F.col("p_name"), F.lit(" "), F.lit("_")
        ).alias("name_snake"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.repeat(F.col("p_brand"), 2).alias("brand_x2"),
    )


ORACLE_STRING_FUNCTIONS = """
SELECT p_partkey,
       UPPER(p_brand) AS brand_up,
       LPAD(p_brand, 12, '.') AS brand_pad,
       REVERSE(p_brand) AS brand_rev,
       REPLACE(p_name, ' ', '_') AS name_snake,
       CAST(STRPOS(p_name, 'a') AS INTEGER) AS first_a,
       REPEAT(p_brand, 2) AS brand_x2
FROM part
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension: calendar family — trunc, last-day, quarter,
    day-of-week, interval add. Outputs are formatted to strings so
    the comparison checks calendar SEMANTICS, not engine date-type
    representation (Spark dayofweek is 1=Sunday; DuckDB dow is
    0=Sunday — the oracle maps it)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderkey")
        .limit(500)
        .select(
            "o_orderkey",
            F.date_format(
                F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd"
            ).alias("month_start"),
            F.date_format(F.last_day(F.col("o_orderdate")), "yyyy-MM-dd").alias(
                "month_end"
            ),
            F.quarter(F.col("o_orderdate")).alias("q"),
            F.dayofweek(F.col("o_orderdate")).alias("dow1sun"),
            F.date_format(
                F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"), "yyyy-MM-dd"
            ).alias("due45"),
        )
    )


ORACLE_DATE_FUNCTIONS = """
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q,
       CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INTEGER) AS dow1sun,
       strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d') AS due45
FROM orders ORDER BY o_orderkey LIMIT 500
"""


QUERIES: dict[str, QuerySpec] = {
    "date_functions": QuerySpec(date_functions, ORACLE_DATE_FUNCTIONS, []),
    "math_functions": QuerySpec(math_functions, ORACLE_MATH_FUNCTIONS, []),
    "string_functions": QuerySpec(
        string_functions, ORACLE_STRING_FUNCTIONS, []
    ),
    "union_sets": QuerySpec(union_sets, ORACLE_UNION_SETS, []),
    "intersect_except": QuerySpec(intersect_except, ORACLE_INTERSECT_EXCEPT, []),
    "rollup_agg": QuerySpec(rollup_agg, ORACLE_ROLLUP_AGG, []),
    "time_rollup": QuerySpec(time_rollup, ORACLE_TIME_ROLLUP, ["X-ts"]),
    "cube_agg": QuerySpec(cube_agg, ORACLE_CUBE_AGG, []),
    "pivot_wide": QuerySpec(pivot_wide, ORACLE_PIVOT_WIDE, []),
    "unpivot_long": QuerySpec(unpivot_long, ORACLE_UNPIVOT_LONG, ["P1"]),
    "try_arithmetic": QuerySpec(
        try_arithmetic, ORACLE_TRY_ARITHMETIC, ["P4", "P12"]
    ),
    "variant_extract": QuerySpec(
        variant_extract, ORACLE_VARIANT_EXTRACT, ["P2", "P4", "A1"]
    ),
    "percentile_stats": QuerySpec(percentile_stats, ORACLE_PERCENTILE_STATS, []),
    "approx_quantiles": QuerySpec(approx_quantiles, ORACLE_APPROX_QUANTILES, []),
    "string_agg_rollup": QuerySpec(string_agg_rollup, ORACLE_STRING_AGG_ROLLUP, ["§2.9", "A1"]),
    "stats_moments": QuerySpec(stats_moments, ORACLE_STATS_MOMENTS, ["§2.9", "A1"]),
    "nested_explode_roundtrip": QuerySpec(
        nested_explode_roundtrip, ORACLE_NESTED_EXPLODE_ROUNDTRIP, ["F1"], bench=True
    ),
    "array_functions": QuerySpec(
        array_functions, ORACLE_ARRAY_FUNCTIONS, ["P6", "P13"]
    ),
    "scalar_function_sampler": QuerySpec(
        scalar_function_sampler, ORACLE_SCALAR_FUNCTION_SAMPLER, []
    ),
    "approx_distinct": QuerySpec(approx_distinct, ORACLE_APPROX_DISTINCT, []),
    "regex_functions": QuerySpec(regex_functions, ORACLE_REGEX_FUNCTIONS, []),
    "map_functions": QuerySpec(map_functions, ORACLE_MAP_FUNCTIONS, ["P1", "F2"]),
}
