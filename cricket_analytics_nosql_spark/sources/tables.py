"""Schema-checked loaders for the driver's synthetic star schema.

Reference parity note: the reference scans MongoDB collections with
server-side projections (neo4j_loader.py:82,96-99 — operator S6 in
SURVEY.md §2.1). Here the storage layer is Parquet and projection /
predicate pushdown happen automatically through Catalyst, so loaders
just return DataFrames; callers ``.select(...)`` and the scan prunes.

Explicit expected schemas are asserted at load so schema drift fails
fast instead of corrupting downstream results (the 100 TB posture:
never rely on inference, never silently re-type a column).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# column -> simpleString type, per FIXTURES.md §A (observed at sf0.001).
EXPECTED: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp_ntz",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; assert the columns we depend on exist with the
    expected types (extra columns are tolerated)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = _load_events(spark, path)
    else:
        df = spark.read.parquet(path)
    expected = EXPECTED.get(name, {})
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = {c: t for c, t in expected.items() if actual.get(c) != t}
    if missing:
        raise ValueError(
            f"schema drift in {name} at {sf_dir}: expected {missing}, got "
            f"{ {c: actual.get(c) for c in missing} }"
        )
    return df


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts arrives as parquet TIMESTAMP in either micros (read
    natively) or nanos precision. Vanilla Spark 4 rejects TIMESTAMP
    (NANOS) (PARQUET_TYPE_ILLEGAL), so for that encoding read nanos
    as raw int64 via the legacy conf and truncate to micros —
    byte-identical to what DuckDB's reader produces for the oracle.
    Either way the fix-up is a scan-time projection (no shuffle,
    codegen'd), so it scales."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    ts_type = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields).get("ts")
    if ts_type == "bigint":  # nanosAsLong kicked in: TIMESTAMP(NANOS) file
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    elif ts_type != "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a small single-file input over all cores before
    CPU-dense per-row work (shingling, hashing, vector math).

    At 100 TB inputs arrive as thousands of splits and this is a
    no-op concern; locally a 3 MB parquet is one split, so an
    expression-heavy map would run on ONE core (measured 8 s for
    shingling 5k docs single-threaded vs <1 s fanned out). The
    round-robin shuffle of a few MB costs nothing by comparison."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
