"""Runtime filters: bloom-filter semi-join reduction — SURVEY.md §4
(scale levers beyond the reference's surface).

The reference pushes selective predicates to its stores as Mongo
``$match`` / Cypher ``WHERE`` (mongo_analytics_examples.py:42,
cypher_queries.cypher:5,11) and relies on secondary indexes
(etl_cricsheet_to_mongo.py:121-126) to avoid scanning the fat side.
Spark's analogue at 100 TB is the *runtime filter*: derive a compact
membership summary from the selective (build) side of a join and
apply it to the probe side BEFORE the shuffle, so most probe rows
die at the scan instead of crossing the network.

Two paths, both exercised here:

- **Catalyst's own injection** (``spark.sql.optimizer.runtime.
  bloomFilter.enabled``, on by default): for shuffle joins whose
  build side carries a selective filter, the optimizer plants a
  ``bloom_filter_agg``/``BloomFilterMightContain`` subquery on the
  probe scan. It only fires past size thresholds (10 MB build /
  10 GB probe scan by default) — i.e. exactly at the scale this
  repo targets; a plan test pins the injection with thresholds
  lowered (tests/test_plans.py).
- **Explicit DataFrame-native bloom** (this module): when the probe
  stage is not a plain equi-join Catalyst can inject into (Python
  UDF stages, pre-shuffle pruning for iterative loops, cross-format
  sinks), build the bloom as a distributed ``bit_or`` bitmap and
  probe it with broadcast word-lookups. No driver round-trip, no
  collect: the bitmap is a (word_index, word_mask) DataFrame of
  ``m_bits/64`` rows built in one aggregation, and each of the
  ``k`` probes is a broadcast hash join against it.

False positives are inherent to blooms, so the driver-facing query
re-verifies candidates with the exact join — the bloom only prunes
(same candidates→exact-verify discipline as dedup.py's LSH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.scalar import cents, dollars
from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table


def bloom_bitmap(
    keys: DataFrame, key: str, m_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Distributed bloom build: one row per 64-bit word of the bit
    array, ``word_mask`` = OR of all bits any key sets in that word.

    ``m_bits`` must be a power of two. Output has at most
    ``m_bits / 64`` rows — 8 KB of payload per 2^16 bits, so even a
    2^30-bit bloom (128 MB, ~50M keys at 1% fp) stays a perfectly
    ordinary DataFrame; nothing ever reaches the driver.
    """
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    positions = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    return (
        positions.select(
            F.shiftright("pos", 6).alias("word_index"),
            F.expr("shiftleft(1L, int(pos & 63))").alias("bit"),
        )
        .groupBy("word_index")
        .agg(F.bit_or("bit").alias("word_mask"))
    )


def bloom_prefilter(
    probe: DataFrame,
    probe_key: str,
    bitmap: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Drop probe rows whose key is definitely absent from the bloom.

    ``k`` broadcast joins against the word bitmap; a row survives only
    if every probed bit is set. Keeps all original probe columns.
    May pass false positives — always follow with an exact verify.
    """
    out = probe
    keep = F.lit(True)
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.col(probe_key), F.lit(i)), F.lit(m_bits))
        w = F.broadcast(
            bitmap.select(
                F.col("word_index").alias(f"_bf_w{i}"),
                F.col("word_mask").alias(f"_bf_m{i}"),
            )
        )
        out = out.withColumn(f"_bf_p{i}", pos).join(
            w,
            F.shiftright(F.col(f"_bf_p{i}"), 6) == F.col(f"_bf_w{i}"),
            "left",
        )
        keep = keep & (
            F.col(f"_bf_m{i}").isNotNull()
            & (
                F.col(f"_bf_m{i}").bitwiseAND(
                    F.expr(f"shiftleft(1L, int(_bf_p{i} & 63))")
                )
                != 0
            )
        )
    drop = [c for i in range(k) for c in (f"_bf_p{i}", f"_bf_w{i}", f"_bf_m{i}")]
    return out.filter(keep).drop(*drop)


def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable: order totals per priority for one customer
    segment, with the fact side bloom-pruned before the exact join.

    Plan: the BUILDING-segment customer keys (~1/5 of customers)
    build a 2^16-bit bloom in one aggregation; orders are pre-filtered
    through it (broadcast word-lookups, no shuffle of the fact side),
    then the surviving ~20% joins the exact key set (broadcast) to
    kill false positives. At 100 TB the bloom probe replaces a full
    fact-side shuffle with a scan-side drop — the same effect as
    Catalyst's injected runtime filter, but available to any
    downstream stage shape. Results are IDENTICAL to the plain join
    (the oracle): the bloom only prunes, the exact join decides.
    """
    cust = load_table(spark, sf_dir, "customer")
    build_keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("key")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    bitmap = bloom_bitmap(build_keys, "key")
    candidates = bloom_prefilter(orders, "o_custkey", bitmap)
    exact = candidates.join(
        F.broadcast(build_keys), candidates.o_custkey == F.col("key"), "left_semi"
    )
    return (
        exact.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("_cents"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            dollars("_cents").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_BLOOM_PREFILTER_JOIN = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
           AS total_price
FROM orders
WHERE o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES: dict[str, QuerySpec] = {
    "bloom_prefilter_join": QuerySpec(
        bloom_prefilter_join, ORACLE_BLOOM_PREFILTER_JOIN, ["J1", "P10"]
    ),
}
