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


QUERIES: dict[str, QuerySpec] = {
    "pandas_udf_tokens": QuerySpec(
        pandas_udf_tokens, ORACLE_PANDAS_UDF_TOKENS, ["§2.12"]
    ),
    "udtf_tokenize": QuerySpec(
        udtf_tokenize, ORACLE_UDTF_TOKENIZE, ["§2.12", "F1"]
    ),
}
