"""Driver-checkable queries for the vectorized Python surface —
SURVEY.md §2.12.

The reference's Python "UDFs" are driver-side row transformers
(``normalize_match`` etl_cricsheet_to_mongo.py:28-68, the row→many
``iter_deliveries`` generator :70-106). Our engine keeps hot paths
native, but the sanctioned Python escape hatches — Arrow-batched
``pandas_udf`` and the Spark 4 Python UDTF — must round-trip
losslessly, so each gets a driver query whose DuckDB oracle computes
the same thing in pure SQL: if Arrow conversion, batching, or the
lateral-join plumbing dropped or mangled anything, the hash check
fails.

At scale both shapes stream Arrow batches through worker-local
Python with no shuffle of their own; they scale with executors like
any JVM map (functions/vectorized.py docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.vectorized import (
    TokenizeUDTF,
    token_count_vectorized,
)
from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table


def pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched ``pandas_udf`` token counting per language; the
    oracle recomputes the counts with SQL string functions — exact
    agreement proves the Python path never diverges from SQL."""
    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        "lang", token_count_vectorized(F.col("text")).alias("t")
    )
    return (
        counted.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t").alias("total_tokens"),
            F.round(
                F.sum("t").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


ORACLE_PANDAS_UDF_TOKENS = """
WITH t AS (SELECT lang, len(string_split(text, ' ')) AS t FROM documents)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(t) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(t) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
FROM t GROUP BY lang ORDER BY lang
"""


def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (row → token rows with positions — the
    ``iter_deliveries`` generator shape) lateral-joined in SQL; the
    oracle is DuckDB's zipped-unnest of the same split."""
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "pysurface_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM pysurface_docs d, LATERAL tokenize_udtf(d.text) t
        WHERE d.doc_id < 50
        ORDER BY d.doc_id, t.pos
        """
    )


ORACLE_UDTF_TOKENIZE = """
SELECT doc_id,
       CAST(unnest(range(len(string_split(text, ' ')))) AS INT) AS pos,
       unnest(string_split(text, ' ')) AS token
FROM documents WHERE doc_id < 50 ORDER BY doc_id, pos
"""


TRIM_FRAC = 10  # drop lowest and highest n//10 values per group


def grouped_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG ``pandas_udf`` — the remaining cell of the §2.12
    taxonomy (scalar pandas_udf, UDTF, mapInPandas, applyInPandas,
    applyInPandasWithState, transformWithState all have queries):
    a rank-trimmed mean of event values per event type, an aggregate
    Spark has no builtin for.

    Exactness through Python: values quantize to integer micros
    BEFORE the UDF; inside, the trim is RANK-based (drop the n//10
    smallest and largest after a deterministic sort) and the sum is
    an int64 — no float accumulation anywhere, so the pandas path
    hash-matches the SQL oracle's window restatement bit-for-bit.
    Plan: partial grouped-agg runs per partition? No — GROUPED_AGG
    UDFs are NOT partial-aggregable (Spark ships whole groups), so
    the exchange carries raw group rows: the documented cost of
    custom aggregates vs builtins, acceptable at |event_type| ≈ 5
    groups and the reason the rest of the engine prefers native
    aggregates."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG type: the type-hint spelling only accepts
    # float-ish scalar returns, and this aggregate must return long
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def trimmed_sum_micro(v: pd.Series):
        s = v.sort_values(kind="mergesort").reset_index(drop=True)
        k = len(s) // TRIM_FRAC
        kept = s.iloc[k: len(s) - k] if len(s) > 2 * k else s.iloc[0:0]
        return int(kept.sum())

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def trimmed_n(v: pd.Series):
        k = len(v) // TRIM_FRAC
        return int(max(len(v) - 2 * k, 0))

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1e6, 0).cast("long").alias("vm"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            trimmed_sum_micro(F.col("vm")).alias("trimmed_sum_micro"),
            trimmed_n(F.col("vm")).alias("n_kept"),
        )
        .withColumn(
            "trimmed_mean_micro",
            F.expr("trimmed_sum_micro div n_kept"),
        )
        .orderBy("event_type")
    )


ORACLE_TRIMMED_MEAN = f"""
WITH vm AS (
  SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS vm
  FROM events
), ranked AS (
  SELECT event_type, vm,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vm) AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM vm
)
SELECT event_type,
       CAST(SUM(vm) AS BIGINT) AS trimmed_sum_micro,
       COUNT(*) AS n_kept,
       CAST(CAST(SUM(vm) AS BIGINT) // COUNT(*) AS BIGINT)
           AS trimmed_mean_micro
FROM ranked
WHERE r > n // {TRIM_FRAC} AND r <= n - n // {TRIM_FRAC}
GROUP BY event_type
ORDER BY event_type
"""


def arrow_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy cell of the §2.12 taxonomy:
    the Python kernel sees raw ``pyarrow.RecordBatch``es (no pandas
    materialization, no per-value Python objects) and answers with
    Arrow arrays computed by vectorized C++ kernels
    (``pyarrow.compute``). The right escape hatch when the logic is
    expressible in Arrow compute but not in Spark SQL — here it IS
    SQL-expressible on purpose, so the DuckDB oracle catches any
    batch-boundary or type mangling in the Arrow round-trip.

    Per-doc stats (utf8 length, space count) emitted per batch, then
    aggregated per source natively — the Python stage is a pure
    partition-local map, no shuffle of its own."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for b in batches:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("source"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                ],
                ["source", "n_chars", "n_spaces"],
            )

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per_doc = docs.mapInArrow(
        stats, "source string, n_chars long, n_spaces long"
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_spaces").alias("total_spaces"),
        )
        .orderBy("source")
    )


ORACLE_ARROW_DOC_STATS = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(length(text) - length(replace(text, ' ', '')))
            AS BIGINT) AS total_spaces
FROM documents GROUP BY source ORDER BY source
"""



def sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined UDFs (Spark 4 ``CREATE FUNCTION ... RETURN expr``)
    — the anti-Python UDF: the body is declarative SQL, so Catalyst
    INLINES it into the caller's plan and the expression runs inside
    whole-stage codegen like any built-in (a plan test asserts no
    Python evaluation node appears). The right tool for shared
    business logic (here: the money-in-cents discipline as a named,
    reusable function) that must not pay the Arrow/Python tax."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_rev_cents(
            p DOUBLE, d DOUBLE
        ) RETURNS BIGINT
        RETURN CAST(ROUND(p * (1 - d) * 100) AS BIGINT)
        """
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sql_udf_lineitem"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               CAST(SUM(disc_rev_cents(l_extendedprice, l_discount))
                    AS DOUBLE) / 100 AS revenue
        FROM sql_udf_lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


ORACLE_SQL_UDF_REVENUE = """
SELECT l_returnflag, COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS DOUBLE) / 100 AS revenue
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES: dict[str, QuerySpec] = {
    "sql_udf_revenue": QuerySpec(
        sql_udf_revenue, ORACLE_SQL_UDF_REVENUE, ["§2.12", "A1"]
    ),
    "arrow_doc_stats": QuerySpec(
        arrow_doc_stats, ORACLE_ARROW_DOC_STATS, ["§2.12"]
    ),
    "grouped_agg_trimmed_mean": QuerySpec(
        grouped_agg_trimmed_mean, ORACLE_TRIMMED_MEAN, ["§2.12", "A1"]
    ),
    "pandas_udf_tokens": QuerySpec(
        pandas_udf_tokens, ORACLE_PANDAS_UDF_TOKENS, ["§2.12"]
    ),
    "udtf_tokenize": QuerySpec(
        udtf_tokenize, ORACLE_UDTF_TOKENIZE, ["§2.12", "F1"]
    ),
}
