"""Scalar column helpers shared by the operator library.

Money amounts are summed exactly: doubles are scaled to integer
cents *before* aggregation so that Spark's nondeterministic partial
-aggregation order cannot perturb low-order float bits. This keeps
results bit-identical to the DuckDB oracle (SURVEY.md §7.8 risk 2)
and is the right call at 100 TB too — long sums never lose precision
and never need a merge-order guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Scale a dollar double to exact integer cents (pre-aggregation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("long")


def epoch_day(expr: str) -> Column:
    """Whole days since epoch — the engine's one day-id convention,
    twinned with the oracle's ``epoch_us(...) // 86400000000``.
    Takes a column name OR any SQL expression producing a timestamp
    (e.g. ``"date_trunc('week', ts)"``), and always compiles to the
    same single spelling: ``unix_micros(cast((expr) as timestamp))
    div 86400000000`` — true integer division, exact at any
    magnitude.  Every query that buckets by day must use this helper
    so a convention change has exactly one site."""
    return F.expr(
        f"unix_micros(cast(({expr}) as timestamp)) div 86400000000"
    )


def md5_u32(key: Column, salt: str = "") -> Column:
    """Deterministic 32-bit uint from md5(salt || key) — the one
    keyed hash Spark and DuckDB (and any SQL engine) compute
    bit-identically, twinned with the oracle idiom
    ``CAST(('0x' || substr(md5(...), 1, 8)) AS BIGINT)``. The basis
    for cross-engine-reproducible sampling and sketches."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string"))) if salt else F.md5(
        key.cast("string")
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def dollars(cents_col: Column | str) -> Column:
    """Exact cents total back to a double dollar amount (post-agg)."""
    c = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    return (c.cast("double") / 100).cast("double")


def revenue_cents() -> Column:
    """lineitem discounted revenue in cents: price * (1 - discount).

    Mirrors the reference's derived-metric style (strikeRate at
    mongo_analytics_examples.py:24-25): compute once at scan time,
    aggregate cheaply after.
    """
    return cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))


def flag(cond: Column) -> Column:
    """Boolean condition to 0/1 int flag — the reference's is_boundary /
    is_dot idiom (etl_cricsheet_to_mongo.py:104-105, operator P9)."""
    return F.when(cond, 1).otherwise(0)


def safe_div(num: Column, den: Column) -> Column:
    """NULL-on-zero division, both engines agree (x / 0 is NULL in
    non-ANSI Spark but an error in DuckDB — make it explicit)."""
    return F.when(den != 0, num / den).otherwise(F.lit(None))
