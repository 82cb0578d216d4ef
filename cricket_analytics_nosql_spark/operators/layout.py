"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for scan pruning at 100 TB.

A table range-partitioned and sorted on ONE column prunes scans on
that column only; queries filtering the other hot dimension read
every file. Interleaving the bits of two key columns into a single
Morton key and laying the table out in Morton order gives BOTH
dimensions locality: any file covers a small rectangle of
(user, time) space, so parquet min/max stats skip most files for
either predicate — the same layout trick Delta's OPTIMIZE ZORDER BY
and Hudi clustering apply, built here from native expressions.

Everything is closed-form integer bit arithmetic (shift/and/add), so
it rides whole-stage codegen — no UDF, no shuffle beyond the single
range-exchange of the write itself.

Reference analogue: none — the reference delegates layout to
MongoDB's B-tree indexes (SURVEY.md §2.1 S5); this is the
column-store equivalent a Spark user owns explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table

MORTON_BITS = 16  # bits kept per dimension → 32-bit Morton key
US_PER_HOUR = 3_600_000_000


def morton_key(x: Column, y: Column, bits: int = MORTON_BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative integer
    columns: x occupies even bit positions, y odd. Disjoint bit
    positions mean plain addition assembles the key (no OR needed),
    and the whole expression folds into one codegen'd projection."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftleft(
            F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        key = key + F.shiftleft(
            F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return key


def zorder_write(
    df: DataFrame,
    x: Column,
    y: Column,
    path: str,
    num_files: int,
) -> None:
    """Write ``df`` clustered on the Morton key of (x, y).

    Raw column values interleave badly when the two dimensions use
    different numbers of bits (a 4-bit user id against a 20-bit
    epoch-hour puts every meaningful user bit below every hour bit —
    the curve degenerates to an hour sort). So both dimensions are
    first affine-rescaled onto the full ``MORTON_BITS`` range from
    their min/max — the same per-column normalization Delta's
    OPTIMIZE ZORDER BY applies via range ids. The bounds pass is a
    4-scalar aggregate (min/max × 2 columns) — an O(1) driver read
    over a column-pruned scan, the documented exception to the
    no-driver-data rule.

    Then: range-partition on the key (one exchange — range bounds
    come from Spark's reservoir sample), sort within partitions,
    drop the key before writing. Each output file covers a compact
    Morton range = a small rectangle in (x, y) space, which parquet
    footer stats expose to any engine's file-skipping."""
    xy = df.select(x.cast("long").alias("__x"), y.cast("long").alias("__y"))
    b = xy.agg(
        F.min("__x").alias("x0"),
        F.max("__x").alias("x1"),
        F.min("__y").alias("y0"),
        F.max("__y").alias("y1"),
    ).first()
    if b.x0 is None or b.y0 is None:
        # empty input (or an all-NULL dimension): nothing to cluster —
        # write as-is rather than dying in the rescale arithmetic
        df.write.mode("overwrite").parquet(path)
        return
    top = (1 << MORTON_BITS) - 1

    def _rescale(col: Column, lo: int, hi: int) -> Column:
        # double arithmetic: (col - lo) * 65535 in LONG overflows once
        # the span exceeds ~1.4e14 (e.g. a raw epoch-micros column);
        # the target is 16 bits, so double precision is ample
        span = float(max(hi - lo, 1))
        return (
            (col.cast("double") - float(lo)) * top / F.lit(span)
        ).cast("long")

    keyed = df.withColumn(
        "__zkey",
        morton_key(_rescale(x, b.x0, b.x1), _rescale(y, b.y0, b.y1)),
    )
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the Morton-block audit of the events table —
    bucket events by the top bits of their (user_id, hour) Morton
    key and report each block's population and its (user, hour)
    bounding rectangle. Block spans being small relative to the
    global ranges IS the data-skipping guarantee, stated as a query.
    Plan: one codegen'd projection + one map-side-combined aggregate
    keyed on ~2^10 blocks — a metadata-sized shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            f"unix_micros(cast(ts as timestamp)) div {US_PER_HOUR}"
        ).alias("hr"),
    )
    u16 = F.col("user_id").bitwiseAND(F.lit((1 << MORTON_BITS) - 1))
    h16 = F.col("hr").bitwiseAND(F.lit((1 << MORTON_BITS) - 1))
    keyed = ev.select(
        "user_id",
        "hr",
        F.shiftright(morton_key(u16, h16), 22).alias("z_block"),
    )
    return (
        keyed.groupBy("z_block")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("user_id").alias("user_min"),
            F.max("user_id").alias("user_max"),
            F.min("hr").alias("hr_min"),
            F.max("hr").alias("hr_max"),
        )
        .orderBy("z_block")
    )


def _sql_morton(x: str, y: str, bits: int = MORTON_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_MASK = (1 << MORTON_BITS) - 1

ORACLE_ZORDER_LAYOUT = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {US_PER_HOUR} AS hr
  FROM events
), keyed AS (
  SELECT user_id, hr,
         ({_sql_morton(f'(user_id & {_MASK})', f'(hr & {_MASK})')}) >> 22
             AS z_block
  FROM ev
)
SELECT z_block,
       COUNT(*) AS n_events,
       MIN(user_id) AS user_min,
       MAX(user_id) AS user_max,
       MIN(hr) AS hr_min,
       MAX(hr) AS hr_max
FROM keyed
GROUP BY z_block
ORDER BY z_block
"""


# ---------------------------------------------------------------------------
# Exact range-partition planner (what RangePartitioner samples for)
# ---------------------------------------------------------------------------

RANGE_PLAN_PARTS = 32
RANGE_PLAN_BUCKETS = 4096


def range_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced range-partition boundaries for writing orders sorted
    by o_custkey — computed EXACTLY from a fixed-width key histogram
    instead of the driver-side reservoir sample Spark's
    RangePartitioner takes.  Key space → ≤4096 equal-width buckets
    (width from an O(1) min/max probe, same bounded ``.first()``
    discipline as the Z-order rescale above), so the exchange
    carries (bucket, count) pairs and the cumulative window runs
    over a CONSTANT-size frame regardless of corpus size — never
    over raw keys (a global ordered window on 1e9 distinct keys
    would serialize in one task).  Each output row is one planned
    partition: upper-bound key (bucket edge), row count, and skew
    vs the ideal n/k — the pre-write advisory companion to
    ``key_skew_profile``."""
    k = RANGE_PLAN_PARTS
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    lo, hi = orders.agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).first()
    width = max(1, (int(hi) - int(lo) + RANGE_PLAN_BUCKETS) // RANGE_PLAN_BUCKETS)
    buckets = orders.groupBy(
        F.expr(f"div(o_custkey - {int(lo)}, {width})").alias("b")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("b")
    cum = buckets.select(
        "b",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(F.lit(0))).alias("n"),
    )
    # partition of the bucket's LAST row: floor((cum*k - 1) / n),
    # exact integer arithmetic end-to-end
    pid = F.expr(f"div(cum * {k} - 1, n)")
    return (
        cum.withColumn("pid", pid)
        .groupBy("pid")
        .agg(
            (F.max("b") * width + F.lit(int(lo) + width - 1)).alias(
                "upper_key"
            ),
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .withColumn(
            "skew",
            F.round(
                F.col("n_rows")
                / (
                    F.sum("n_rows").over(Window.partitionBy(F.lit(0)))
                    / F.lit(float(k))
                ),
                6,
            ),
        )
        .orderBy("pid")
    )


def _range_planner_oracle() -> str:
    k, nb = RANGE_PLAN_PARTS, RANGE_PLAN_BUCKETS
    return f"""
WITH bounds AS (
  SELECT MIN(o_custkey) AS lo,
         GREATEST(1, (MAX(o_custkey) - MIN(o_custkey) + {nb}) // {nb}) AS w
  FROM orders
), buckets AS (
  SELECT (o_custkey - lo) // w AS b, COUNT(*) AS cnt,
         ANY_VALUE(lo) AS lo, ANY_VALUE(w) AS w
  FROM orders CROSS JOIN bounds
  GROUP BY 1
), cum AS (
  SELECT b, cnt, lo, w,
         SUM(cnt) OVER (ORDER BY b) AS c,
         SUM(cnt) OVER () AS n
  FROM buckets
), pids AS (
  SELECT b, cnt, lo, w, (c * {k} - 1) // n AS pid FROM cum
), parts AS (
  SELECT pid,
         CAST(MAX(b) * ANY_VALUE(w) + ANY_VALUE(lo) + ANY_VALUE(w) - 1
              AS BIGINT) AS upper_key,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         COUNT(*) AS n_buckets
  FROM pids GROUP BY pid
)
SELECT CAST(pid AS BIGINT) AS pid, upper_key, n_rows, n_buckets,
       ROUND(n_rows / (SUM(n_rows) OVER () / {float(k)}), 6) AS skew
FROM parts
ORDER BY pid
"""


# --------------------------------------------------------------------------
# Hilbert-curve layout — the locality upgrade over Morton/Z-order
# --------------------------------------------------------------------------

HILBERT_BITS = MORTON_BITS  # bits per dimension → 2·bits-bit key


def _hilbert_round_sql(s: int) -> list[str]:
    """One round of the standard xy→d Hilbert walk at scale ``s``,
    as engine-neutral SQL (CASE/&/arithmetic only — identical text
    binds in Spark SQL and DuckDB, which is what makes the oracle
    exact). Returns [d_expr, x_expr, y_expr] reading columns d,x,y.

    The quadrant code (3·rx XOR ry) is spelled as a CASE over the
    four (rx, ry) combinations — no XOR operator, whose spelling
    differs between the engines."""
    rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
    quad = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END)"
    )
    d = f"d + CAST({s} AS BIGINT) * {s} * {quad}"
    # if ry = 0: optionally flip within the quadrant (rx = 1), then
    # swap x/y; if ry = 1 the frame is unchanged
    x = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {s} - 1 - y ELSE y END) ELSE x END"
    )
    y = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {s} - 1 - x ELSE x END) ELSE y END"
    )
    return [d, x, y]


def hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hilbert-curve twin of ``zorder_layout``: bucket events by
    the top bits of the Hilbert distance of (user_id, hour) and
    report each block's population and (user, hour) bounding
    rectangle. Hilbert beats Morton on exactly the property this
    audit measures — every curve step is unit-distance, so blocks
    never contain the long diagonal jumps that widen Morton block
    bounding boxes at quadrant seams (why Delta/Iceberg moved their
    clustering default from Z-order to Hilbert).

    The xy→d walk is {HILBERT_BITS} chained quadrant-rotation
    rounds, each pure CASE/bit arithmetic — in Spark a chain of
    selectExpr projections that whole-stage-codegens into ONE
    operator with zero exchanges before the block rollup; the DuckDB
    oracle binds the IDENTICAL round expressions as chained CTEs, so
    the key is bit-for-bit checkable. The only shuffle carries
    ~2^10 block keys + counts — metadata-sized at any scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            f"unix_micros(cast(ts as timestamp)) div {US_PER_HOUR}"
        ).alias("hr"),
    )
    cur = ev.selectExpr(
        "user_id",
        "hr",
        f"CAST(user_id & {(1 << HILBERT_BITS) - 1} AS BIGINT) AS x",
        f"CAST(hr & {(1 << HILBERT_BITS) - 1} AS BIGINT) AS y",
        "CAST(0 AS BIGINT) AS d",
    )
    for b in range(HILBERT_BITS - 1, -1, -1):
        d_e, x_e, y_e = _hilbert_round_sql(1 << b)
        cur = cur.selectExpr(
            "user_id",
            "hr",
            f"({d_e}) AS d",
            f"({x_e}) AS x",
            f"({y_e}) AS y",
        )
    keyed = cur.selectExpr(
        "user_id", "hr", f"d >> {2 * HILBERT_BITS - 10} AS h_block"
    )
    return (
        keyed.groupBy("h_block")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("user_id").alias("user_min"),
            F.max("user_id").alias("user_max"),
            F.min("hr").alias("hr_min"),
            F.max("hr").alias("hr_max"),
        )
        .orderBy("h_block")
    )


def _hilbert_oracle() -> str:
    rounds = []
    prev = "base"
    for idx, b in enumerate(range(HILBERT_BITS - 1, -1, -1)):
        d_e, x_e, y_e = _hilbert_round_sql(1 << b)
        rounds.append(
            f"r{idx} AS (\n  SELECT user_id, hr, ({d_e}) AS d,"
            f" ({x_e}) AS x, ({y_e}) AS y FROM {prev}\n)"
        )
        prev = f"r{idx}"
    return (
        f"""WITH base AS (
  SELECT user_id,
         epoch_us(ts) // {US_PER_HOUR} AS hr,
         CAST(user_id & {(1 << HILBERT_BITS) - 1} AS BIGINT) AS x,
         CAST((epoch_us(ts) // {US_PER_HOUR}) & {(1 << HILBERT_BITS) - 1}
              AS BIGINT) AS y,
         CAST(0 AS BIGINT) AS d
  FROM events
), """
        + ",\n".join(rounds)
        + f"""
SELECT d >> {2 * HILBERT_BITS - 10} AS h_block,
       COUNT(*) AS n_events,
       CAST(MIN(user_id) AS BIGINT) AS user_min,
       CAST(MAX(user_id) AS BIGINT) AS user_max,
       CAST(MIN(hr) AS BIGINT) AS hr_min,
       CAST(MAX(hr) AS BIGINT) AS hr_max
FROM {prev}
GROUP BY h_block
ORDER BY h_block
"""
    )


# ---------------------------------------------------------------------------
# Bucketed storage join — the shuffle-free co-located join
# ---------------------------------------------------------------------------

BUCKETED_N_BUCKETS = 8


def bucketed_join_noshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders and customer as BUCKETED tables (8 buckets on the
    customer key, sorted within buckets), then join them — the
    storage-layout move that deletes the join shuffle entirely: both
    sides' files are already hash-partitioned on the join key, so
    the sort-merge join reads bucket i against bucket i with NO
    Exchange under the join (``tests/test_plans.py`` pins that the
    only Exchanges in the plan sit ABOVE the join — the segment
    rollup and the output ordering).
    This is THE pattern for a 100 TB fact⋈fact join that runs every
    day: pay the partitioned write once, join shuffle-free forever
    after; neither side needs to fit in memory (vs broadcast).

    The query itself is revenue/order-count per market segment, with
    exact cents kept BIGINT through the agg."""
    import os
    import tempfile

    base = tempfile.mkdtemp(prefix="bucketed_join_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("o_cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    (
        orders.write.mode("overwrite")
        .format("parquet")
        .bucketBy(BUCKETED_N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .option("path", os.path.join(base, "orders_b"))
        .saveAsTable("bucketed_orders_tmp")
    )
    (
        cust.write.mode("overwrite")
        .format("parquet")
        .bucketBy(BUCKETED_N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .option("path", os.path.join(base, "customer_b"))
        .saveAsTable("bucketed_customer_tmp")
    )
    ob = spark.table("bucketed_orders_tmp")
    cb = spark.table("bucketed_customer_tmp").hint("MERGE")
    joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.sum("o_cents").alias("cents"),
        )
        .select(
            "c_mktsegment",
            "n_orders",
            "n_customers",
            F.round(F.col("cents").cast("double") / F.lit(100.0), 2).alias(
                "total_usd"
            ),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_BUCKETED_JOIN = """
WITH j AS (
  SELECT c_mktsegment, c_custkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS o_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, COUNT(*) AS n_orders,
       COUNT(DISTINCT c_custkey) AS n_customers,
       ROUND(CAST(SUM(o_cents) AS DOUBLE) / 100.0, 2) AS total_usd
FROM j
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Shard-skew audit (round 9)
# ---------------------------------------------------------------------------

SHARD_COUNT = 64


def shard_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer-shard balance audit: documents hashed into
    {SHARD_COUNT} shards by the cross-engine md5 key hash, reporting
    each shard's doc count, token mass, and its token load relative
    to the mean shard (the straggler factor). This is the
    pre-flight for any sharded export (``pack_sequences`` streams,
    ``multimodal_shard_pack``): a shard at 2× the mean doubles the
    tail of every downstream stage that consumes one shard per task.

    Scale: one narrow map over a 2-column projection into a
    {SHARD_COUNT}-row aggregate; the mean rides an unpartitioned
    window over that tiny frame — no second pass over the data."""
    from cricket_analytics_nosql_spark.functions.scalar import md5_u32

    docs = load_table(spark, sf_dir, "documents").select(
        (md5_u32(F.col("doc_id"), "shard") % SHARD_COUNT).alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    return (
        docs.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .select(
            "shard",
            "n_docs",
            "tokens",
            F.round(
                F.col("tokens")
                / (F.sum("tokens").over(w_all) / F.count(F.lit(1)).over(w_all)),
                6,
            ).alias("load_vs_mean"),
        )
        .orderBy("shard")
    )


ORACLE_SHARD_SKEW = f"""
WITH d AS (
  SELECT CAST(('0x' || substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {SHARD_COUNT} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), agg AS (
  SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens
  FROM d GROUP BY shard
)
SELECT shard, n_docs, tokens,
       ROUND(CAST(tokens AS DOUBLE)
             / (CAST(SUM(tokens) OVER () AS DOUBLE) / COUNT(*) OVER ()), 6)
         AS load_vs_mean
FROM agg
ORDER BY shard
"""


QUERIES: dict[str, QuerySpec] = {
    "shard_skew_audit": QuerySpec(
        shard_skew_audit,
        ORACLE_SHARD_SKEW,
        ["X-layout", "X-training", "A1"],
    ),
    "bucketed_join_noshuffle": QuerySpec(
        bucketed_join_noshuffle,
        ORACLE_BUCKETED_JOIN,
        ["S5", "J1", "A1", "X-layout"],
    ),
    "zorder_layout": QuerySpec(
        zorder_layout, ORACLE_ZORDER_LAYOUT, ["S5", "A1", "X-layout"]
    ),
    "hilbert_layout": QuerySpec(
        hilbert_layout, _hilbert_oracle(), ["S5", "A1", "X-layout"]
    ),
    "range_partition_planner": QuerySpec(
        range_partition_planner,
        _range_planner_oracle(),
        ["S5", "A1", "§2.8", "X-layout"],
    ),
}
