"""Frequency sketches: heavy hitters exactly and under bounded
memory (Misra-Gries).

The exact heavy-hitter query (frequency > n/K) is a plain
map-combined count — correct at any scale because partial
aggregation collapses hot keys before the exchange, so the shuffle
carries at most |vocabulary| rows per map partition. That is the
oracled driver query.

The library summary is for the regime where even the vocabulary
doesn't fit (open-ended keys: URLs, session ids, raw n-grams):
Misra-Gries keeps at most K counters per partition, summaries merge
associatively, and the classic guarantee survives both stages —
every item with true frequency > n/K is present, and each reported
estimate undercounts by at most n/K. Arrow-batched ``mapInPandas``
per partition (bounded dict, no shuffle), then one tiny
``applyInPandas`` merge over the ≤ partitions×K summary rows.

Reference analogue: none (the reference's aggregations are exact
Mongo pipelines); this is the 100 TB extension for count surfaces
that outgrow exact group-by state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table

HH_K = 2000  # heavy-hitter threshold denominator: freq > n/K


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: tokens covering more than 1/{HH_K} of the
    corpus token stream, with count and per-10k share. One
    map-combined count shuffle + a broadcast of the single global
    total; the filter is post-aggregate (A6/HAVING shape)."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # derive the grand total from the vocabulary-sized counts frame —
    # aggregating `toks` separately would re-scan and re-explode the
    # whole corpus (the subtrees differ, so ReuseExchange can't help)
    total = counts.agg(F.sum("n").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * HH_K > F.col("n_total"))
        .select(
            "token",
            "n",
            "n_total",
            # integer division on both engines — double→int casts
            # truncate in Spark but round in DuckDB
            F.expr("(n * 10000) div n_total").alias("share_e4"),
        )
        .orderBy(F.desc("n"), F.asc("token"))
    )


ORACLE_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT token, COUNT(*) AS n FROM toks GROUP BY token
), total AS (
  SELECT COUNT(*) AS n_total FROM toks
)
SELECT token, n, n_total,
       CAST((n * 10000) // n_total AS BIGINT) AS share_e4
FROM counts, total
WHERE n * {HH_K} > n_total
ORDER BY n DESC, token ASC
"""


def _mg_update(counters: dict, key, inc: int, k: int) -> None:
    """One Misra-Gries step: increment key if tracked or there is a
    free counter; otherwise decrement everyone (dropping zeros)."""
    if key in counters:
        counters[key] += inc
        return
    if len(counters) < k:
        counters[key] = inc
        return
    # decrement-all by the smallest of (inc, current min) until the
    # increment is absorbed — loop is bounded because each pass
    # either empties a slot or exhausts inc
    while inc > 0:
        if len(counters) < k:
            counters[key] = inc
            return
        m = min(counters.values())
        step = min(m, inc)
        inc -= step
        for c in list(counters):
            counters[c] -= step
            if counters[c] == 0:
                del counters[c]


def misra_gries_summary(df: DataFrame, col: str, k: int) -> DataFrame:
    """Bounded-memory frequent-items summary of ``df[col]``.

    Returns ≤ k rows (item string, estimated count). Guarantees, for
    n total rows: every item with true count > n/k appears, and
    ``estimate ≤ true ≤ estimate + n/k``. State is O(k) per task in
    stage one and O(partitions×k) rows into the single-group merge —
    driver never sees data, and the fact table never shuffles."""
    schema = "item string, est long"

    def _partition_summaries(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in it:
            for v in pdf[col].astype(str):
                _mg_update(counters, v, 1, k)
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "est": list(counters.values())}
            )

    partials = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        _partition_summaries, schema
    )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        counters: dict = {}
        for item, est in zip(pdf["item"], pdf["est"]):
            _mg_update(counters, item, int(est), k)
        return pd.DataFrame(
            {"item": list(counters), "est": list(counters.values())}
        )

    return (
        partials.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(_merge, schema)
    )


QUERIES: dict[str, QuerySpec] = {
    "heavy_hitters": QuerySpec(
        heavy_hitters, ORACLE_HEAVY_HITTERS, ["A1", "A6", "X-curation"]
    ),
}
