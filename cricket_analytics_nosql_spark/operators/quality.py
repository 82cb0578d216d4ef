"""Zero-extra-pass data-quality metrics — the monitoring hook a
100 TB training-data pipeline needs without paying a second scan.

``observed_quality`` attaches row/null/distinct-ish counters to a
frame via ``Observation`` (CollectMetrics): the metrics ride on
whatever job first materializes the frame (a sink write, a count, a
downstream agg), so quality monitoring costs zero additional passes
over the data — the same piggyback discipline as PageRank's
dangling-mass scalar (operators/graph.py).

The reference's quality posture is try/except-and-continue
(etl_cricsheet_to_mongo.py:132-147) plus defensive ``.get``
fallbacks; this is its observable, quantified equivalent: the
quarantine path (sources/cricsheet.py, S2) diverts corrupt records,
and these counters report the live null/violation rates of whatever
survived.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(
    df: DataFrame,
    null_cols: list[str] | None = None,
    checks: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Return (df', observation): df' is ``df`` with metrics attached;
    read ``observation.get`` AFTER an action has materialized df'.

    Metrics: ``n_rows``; ``nulls_<col>`` per requested column; and
    ``fail_<name>`` for each named boolean check (count of rows where
    the check is FALSE or NULL — nulls count as failures, matching
    constraint semantics)."""
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    for name, cond in (checks or {}).items():
        metrics.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(f"fail_{name}")
        )
    obs = Observation()
    return df.observe(obs, *metrics), obs


def constraint_audit(spark, sf_dir: str):
    """Declarative constraint suite over the warehouse — the
    Deequ-style audit a 100 TB pipeline runs before publishing a
    snapshot, as ONE catalog query: every constraint reports
    (rows checked, violations), and constraints on the same table
    share a single scan.

    - ``orders.pk_unique``        o_orderkey has no duplicates
    - ``orders.price_positive``   o_totalprice > 0
    - ``lineitem.fk_orders``      every l_orderkey exists in orders
    - ``lineitem.qty_range``      1 ≤ l_quantity ≤ 50
    - ``events.ts_not_null``      ts is present

    Plan: three table scans total. The orders pass folds uniqueness
    into count−count(distinct) (one Expand-free aggregate); the
    lineitem pass resolves the FK with a broadcast-or-shuffle left
    join against the pruned orders key column and folds the range
    check into the same aggregate; events is a pure narrow count.
    Violations, not violating rows: the audit output is O(rules),
    so it broadcasts anywhere — drill-down queries (anti_join) fetch
    the offending rows on demand."""
    from cricket_analytics_nosql_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    o_agg = orders.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "dup"
        ),
        F.sum(
            F.when(F.col("o_totalprice") > 0, 0).otherwise(1)
        ).alias("nonpos"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    okeys = orders.select(F.col("o_orderkey").alias("k")).withColumn(
        "present", F.lit(1)
    )
    l_agg = (
        li.join(okeys, li.l_orderkey == okeys.k, "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("present").isNull(), 1).otherwise(0)).alias(
                "orphan"
            ),
            F.sum(
                F.when(
                    (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
                    0,
                ).otherwise(1)
            ).alias("qty_bad"),
        )
    )
    ev = load_table(spark, sf_dir, "events").select("ts")
    e_agg = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ts").isNull().cast("long")).alias("ts_null"),
    )

    def row(src, name, n_col, v_col):
        return src.select(
            F.lit(name).alias("constraint_name"),
            F.col(n_col).cast("long").alias("n_checked"),
            F.col(v_col).cast("long").alias("n_violations"),
        )

    return (
        row(o_agg, "orders.pk_unique", "n", "dup")
        .unionAll(row(o_agg, "orders.price_positive", "n", "nonpos"))
        .unionAll(row(l_agg, "lineitem.fk_orders", "n", "orphan"))
        .unionAll(row(l_agg, "lineitem.qty_range", "n", "qty_bad"))
        .unionAll(row(e_agg, "events.ts_not_null", "n", "ts_null"))
        .orderBy("constraint_name")
    )


ORACLE_CONSTRAINT_AUDIT = """
WITH o AS (
  SELECT COUNT(*) AS n,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup,
         SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS nonpos
  FROM orders
), l AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS orphan,
         SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)
             AS qty_bad
  FROM lineitem li LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey
), e AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS ts_null
  FROM events
)
SELECT * FROM (
  SELECT 'orders.pk_unique' AS constraint_name,
         CAST(n AS BIGINT) AS n_checked, CAST(dup AS BIGINT) AS n_violations
  FROM o
  UNION ALL
  SELECT 'orders.price_positive', CAST(n AS BIGINT), CAST(nonpos AS BIGINT)
  FROM o
  UNION ALL
  SELECT 'lineitem.fk_orders', CAST(n AS BIGINT), CAST(orphan AS BIGINT)
  FROM l
  UNION ALL
  SELECT 'lineitem.qty_range', CAST(n AS BIGINT), CAST(qty_bad AS BIGINT)
  FROM l
  UNION ALL
  SELECT 'events.ts_not_null', CAST(n AS BIGINT), CAST(ts_null AS BIGINT)
  FROM e
)
ORDER BY constraint_name
"""


PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-level profile — the data-catalog staple behind every
    "describe dataset" page: per column, row count, null count, and
    exact distinct count, as one row per column.

    ONE pass over the table: all per-column aggregates ride a single
    scan (the naive spelling — one SELECT per column UNION ALL'd, as
    the test oracle does — scans the table once per column, a 6×
    difference here and a fatal one at 100 TB). The wide single-row
    aggregate is then unpivoted driver-free with ``stack``. Exact
    ``count_distinct`` plans one Expand over the column set; at
    100 TB swap ``approx_count_distinct`` in — same single-pass
    shape, no Expand."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_null, n_distinct)",
    ).select(
        "col_name",
        F.col("__n").alias("n_rows"),
        "n_null",
        "n_distinct",
    ).orderBy("col_name")


def table_profile(spark, sf_dir: str):
    """Driver query: the one-pass profile of the orders table."""
    from cricket_analytics_nosql_spark.sources.tables import load_table

    return profile(
        load_table(spark, sf_dir, "orders").select(*PROFILE_COLS),
        PROFILE_COLS,
    )


ORACLE_TABLE_PROFILE = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows,"
    f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_null,"
    f" COUNT(DISTINCT {c}) AS n_distinct FROM orders"
    for c in PROFILE_COLS
) + "\nORDER BY col_name"


# (name, integer-quantized expression) for the correlation matrix —
# quantities are already integral; price in whole dollars, discount
# and tax in percent points, so every moment sum is an exact bigint
_CORR_VARS: list[tuple[str, str, str]] = [
    ("quantity", "cast(l_quantity as bigint)", "CAST(l_quantity AS BIGINT)"),
    (
        "price_usd",
        "cast(round(l_extendedprice * 100) as bigint) div 100",
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) // 100",
    ),
    (
        "discount_pct",
        "cast(round(l_discount * 100) as bigint)",
        "CAST(ROUND(l_discount * 100) AS BIGINT)",
    ),
    (
        "tax_pct",
        "cast(round(l_tax * 100) as bigint)",
        "CAST(ROUND(l_tax * 100) AS BIGINT)",
    ),
]


def numeric_corr_matrix(spark, sf_dir: str):
    """Pairwise Pearson correlations of the lineitem numeric columns
    — the profiling pass after ``table_profile``'s null/NDV counts:
    which measures move together (price↔quantity mechanically;
    discount↔anything is a pricing-policy signal). All C(4,2)=6
    pairs from ONE map-side-combined global aggregate: per variable
    (Σx, Σx²), per pair Σxy — 15 exact-bigint scalars total, never a
    per-pair rescan (the conditional-aggregation discipline of
    ``rich_club_profile``); each r composes from five scalars in
    oracle-identical textual order, assembled by ``stack`` into the
    6-row matrix. (Moment magnitudes: dollars² × rows — bigint-safe
    to ~10⁹ rows; swap the quantization grid a decade up for more.)
    """
    from cricket_analytics_nosql_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        *[F.expr(e).alias(n) for n, e, _ in _CORR_VARS]
    )
    names = [n for n, _, _ in _CORR_VARS]
    sums = [F.count(F.lit(1)).alias("n")]
    for v in names:
        sums.append(F.sum(v).alias(f"s_{v}"))
        sums.append(F.sum(F.col(v) * F.col(v)).alias(f"ss_{v}"))
    pairs = [
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
    ]
    for a, b in pairs:
        sums.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    agg = li.agg(*sums)

    def r_expr(a: str, b: str):
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        return F.round(
            (n * F.col(f"sp_{a}_{b}").cast("double") - sa * sb)
            / F.sqrt(
                (n * F.col(f"ss_{a}").cast("double") - sa * sa)
                * (n * F.col(f"ss_{b}").cast("double") - sb * sb)
            ),
            6,
        )

    cells = agg.select(
        "n",
        *[r_expr(a, b).alias(f"r_{a}_{b}") for a, b in pairs],
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', r_{a}_{b}" for a, b in pairs
    )
    return (
        cells.selectExpr(
            "n",
            f"stack({len(pairs)}, {stack_args}) AS (var_a, var_b, corr)",
        )
        .select("var_a", "var_b", F.col("n").alias("n_rows"), "corr")
        .orderBy("var_a", "var_b")
    )


def _corr_sql(a: str, b: str) -> str:
    n = "CAST(n AS DOUBLE)"
    return (
        f"ROUND(({n} * CAST(sp_{a}_{b} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        f" / sqrt(({n} * CAST(ss_{a} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
        f" * ({n} * CAST(ss_{b} AS DOUBLE)"
        f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 6)"
    )


_CORR_PAIRS = [
    (a, b)
    for i, (a, _, _) in enumerate(_CORR_VARS)
    for (b, _, _) in _CORR_VARS[i + 1 :]
]

ORACLE_NUMERIC_CORR = (
    "WITH v AS (\n  SELECT "
    + ", ".join(f"{sql} AS {n}" for n, _, sql in _CORR_VARS)
    + "\n  FROM lineitem\n), agg AS (\n  SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    + ", ".join(
        f"CAST(SUM({n}) AS BIGINT) AS s_{n},"
        f" CAST(SUM({n} * {n}) AS BIGINT) AS ss_{n}"
        for n, _, _ in _CORR_VARS
    )
    + ", "
    + ", ".join(
        f"CAST(SUM({a} * {b}) AS BIGINT) AS sp_{a}_{b}"
        for a, b in _CORR_PAIRS
    )
    + "\n  FROM v\n)\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{a}' AS var_a, '{b}' AS var_b, n AS n_rows,"
        f" {_corr_sql(a, b)} AS corr FROM agg"
        for a, b in _CORR_PAIRS
    )
    + "\nORDER BY var_a, var_b"
)


from cricket_analytics_nosql_spark.operators.spec import QuerySpec  # noqa: E402

QUERIES: dict[str, QuerySpec] = {
    "constraint_audit": QuerySpec(
        constraint_audit, ORACLE_CONSTRAINT_AUDIT, ["A4", "J6", "X-quality"]
    ),
    "table_profile": QuerySpec(
        table_profile, ORACLE_TABLE_PROFILE, ["A4", "A1", "X-quality"]
    ),
    "numeric_corr_matrix": QuerySpec(
        numeric_corr_matrix, ORACLE_NUMERIC_CORR, ["A4", "A1", "X-quality"]
    ),
}
