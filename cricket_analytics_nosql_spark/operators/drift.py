"""Distribution-drift and robust-statistics operators.

The training-data QA surface beyond per-row quality scores: did the
*distribution* move (KS two-sample, entropy/KL divergence), and
which rows are outliers under heavy-tailed data (MAD z-scores,
winsorized means — both immune to the exact outliers they hunt,
unlike stddev-based rules).

Reference analogue: none (the reference's QA is exact aggregates,
mongo_analytics_examples.py:19-48); this is the 100 TB extension
for corpus monitoring between ingest rounds.

Float determinism contract (tools/parity.py compares exact doubles):
all sums are over integers — counts, exact cents, or per-term
``ROUND(ln(x)*1e6)`` micro-nats (the lm_surprisal idiom,
operators/text.py:674) — so partial-aggregation order can't perturb
a bit; each query ends in a handful of double ops written in the
same textual order as its oracle, then ``ROUND(..., 6)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.scalar import cents, flag
from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.operators.text import tokens_col
from cricket_analytics_nosql_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test
# ---------------------------------------------------------------------------

KS_GROUP_A = "1-URGENT"
KS_GROUP_B = "5-LOW"


def ks_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between the order-value distributions
    of urgent vs low-priority orders — the standard "did the
    distribution move" gate between two ingest batches.

    Values are quantized to whole dollars, so the ECDFs live on a
    BOUNDED value grid: the per-value rollup collapses the fact
    stream map-side, and the one unpartitioned window (cumulative
    counts need a global prefix sum) runs over the grid-sized frame
    only — the rolling_median_revenue posture, never the fact. The
    statistic itself stays integer (``|cumA·nB − cumB·nA|``) until a
    single final division.

    At 100 TB: grid size is bounded by the value domain (~1e6 rows
    for dollar-quantized prices), not the corpus; for a truly
    continuous domain, swap the window for the two-pass
    sort-partition prefix-sum and keep everything else.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin(KS_GROUP_A, KS_GROUP_B))
        .select(
            flag(F.col("o_orderpriority") == KS_GROUP_A).alias("is_a"),
            F.expr(
                "cast(round(o_totalprice * 100) as bigint) div 100"
            ).alias("v"),
        )
    )
    counts = o.groupBy("v").agg(
        F.sum("is_a").alias("ca"),
        F.sum(1 - F.col("is_a")).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = counts.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    diff = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(
            F.max(diff).alias("d_num"),
            # arg-max value, smallest on ties: max over (diff, -v)
            (-F.max(F.struct(diff.alias("d"), (-F.col("v")).alias("nv")))
             .getField("nv")).alias("at_value"),
        )
        .select(
            "n_a",
            "n_b",
            "d_num",
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("ks_stat"),
            "at_value",
        )
    )


ORACLE_KS_DRIFT = f"""
WITH o AS (
  SELECT CASE WHEN o_orderpriority = '{KS_GROUP_A}' THEN 1 ELSE 0 END AS is_a,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS v
  FROM orders
  WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
), counts AS (
  SELECT v, SUM(is_a) AS ca, SUM(1 - is_a) AS cb FROM o GROUP BY v
), cum AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b
  FROM counts
), tot AS (
  SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM counts
)
SELECT n_a, n_b,
       MAX(ABS(cum_a * n_b - cum_b * n_a)) AS d_num,
       ROUND(CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
             / CAST(n_a * n_b AS DOUBLE), 6) AS ks_stat,
       MIN(at_v) AS at_value
FROM (
  SELECT cum.*, tot.*,
         CASE WHEN ABS(cum_a * n_b - cum_b * n_a) =
                   MAX(ABS(cum_a * n_b - cum_b * n_a)) OVER ()
              THEN v END AS at_v
  FROM cum CROSS JOIN tot
)
GROUP BY n_a, n_b
"""


# ---------------------------------------------------------------------------
# Token-distribution entropy + KL divergence per source
# ---------------------------------------------------------------------------

def token_entropy_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution health: Shannon entropy (nats)
    and KL(source ‖ corpus) — low entropy flags templated/spam
    scrapes, high KL flags a source whose language drifted from the
    mix it was sampled into.

    One tokenize pass builds (source, term) counts; the corpus
    marginals derive from THAT frame (never a second corpus scan).
    Each log term is rounded to integer micro-nats before the sum —
    bigint sums are merge-order-proof where a double sum over a
    vocabulary is not — and the two final divisions mirror the
    oracle textually. The inverted-index join on term keys the
    per-term corpus mass; cost scales with the vocabulary, never
    |sources| × corpus.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(tokens_col(F.col("text"))).alias("term"))
        .filter(F.length("term") > 0)
    )
    c_st = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    n_s = c_st.groupBy("source").agg(
        F.sum("c").alias("n_tok"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    c_t = c_st.groupBy("term").agg(F.sum("c").alias("ct"))
    n_tot = n_s.agg(F.sum("n_tok").alias("nn")).select("nn")

    j = (
        c_st.join(F.broadcast(n_s), "source")
        .join(c_t, "term")
        .crossJoin(F.broadcast(n_tot))
    )
    ln_p = F.log(F.col("c").cast("double") / F.col("n_tok").cast("double"))
    ln_ratio = F.log(
        (F.col("c") * F.col("nn")).cast("double")
        / (F.col("n_tok") * F.col("ct")).cast("double")
    )
    h_term = F.col("c") * F.round(ln_p * 1e6, 0).cast("long")
    kl_term = F.col("c") * F.round(ln_ratio * 1e6, 0).cast("long")
    return (
        j.groupBy("source", "n_tok", "n_terms")
        .agg(
            F.sum(h_term).alias("h_e6"),
            F.sum(kl_term).alias("kl_e6"),
        )
        .select(
            "source",
            "n_tok",
            "n_terms",
            F.round(
                -F.col("h_e6").cast("double")
                / F.col("n_tok").cast("double") / 1e6,
                6,
            ).alias("entropy_nats"),
            F.round(
                F.col("kl_e6").cast("double")
                / F.col("n_tok").cast("double") / 1e6,
                6,
            ).alias("kl_vs_corpus"),
        )
        .orderBy("source")
    )


ORACLE_TOKEN_ENTROPY_KL = """
WITH toks AS (
  SELECT source, t.term
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS term) t
  WHERE length(t.term) > 0
), c_st AS (
  SELECT source, term, COUNT(*) AS c FROM toks GROUP BY source, term
), n_s AS (
  SELECT source, SUM(c) AS n_tok, COUNT(*) AS n_terms
  FROM c_st GROUP BY source
), c_t AS (
  SELECT term, SUM(c) AS ct FROM c_st GROUP BY term
), n_tot AS (
  SELECT SUM(n_tok) AS nn FROM n_s
)
SELECT source, n_tok, n_terms,
       ROUND(-CAST(SUM(c * CAST(ROUND(ln(CAST(c AS DOUBLE) / CAST(n_tok AS DOUBLE)) * 1000000.0) AS BIGINT)) AS DOUBLE)
             / CAST(n_tok AS DOUBLE) / 1000000.0, 6) AS entropy_nats,
       ROUND(CAST(SUM(c * CAST(ROUND(ln(CAST(c * nn AS DOUBLE) / CAST(n_tok * ct AS DOUBLE)) * 1000000.0) AS BIGINT)) AS DOUBLE)
             / CAST(n_tok AS DOUBLE) / 1000000.0, 6) AS kl_vs_corpus
FROM c_st
JOIN n_s USING (source)
JOIN c_t USING (term)
CROSS JOIN n_tot
GROUP BY source, n_tok, n_terms
ORDER BY source
"""


# ---------------------------------------------------------------------------
# MAD robust outliers
# ---------------------------------------------------------------------------

MAD_K_E4 = 44478  # 3 * 1.4826 (consistency constant), scaled 1e4


def mad_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census on order values: median / MAD (median
    absolute deviation) replace mean / stddev, so the fence is not
    dragged by the very outliers it hunts — the curation rule that
    actually survives heavy-tailed revenue data.

    Two exact-percentile passes (median, then MAD) each reduce a
    single pruned column to one row that broadcasts back — three
    narrow scans, no wide shuffle anywhere. All deviations live in
    integer half-cents (the median of ints can end in .5), MAD in
    quarter-cents, so every comparison is integer-vs-integer-scaled
    and both engines agree bit-for-bit.
    """
    c = load_table(spark, sf_dir, "orders").select(
        cents(F.col("o_totalprice")).alias("c")
    )
    med = c.agg(
        F.round(F.expr("percentile(c, 0.5)") * 2, 0)
        .cast("long")
        .alias("m2")  # half-cents
    )
    d = c.crossJoin(F.broadcast(med)).select(
        "m2", F.abs(F.col("c") * 2 - F.col("m2")).alias("d2")
    )
    mad = d.groupBy("m2").agg(
        F.round(F.expr("percentile(d2, 0.5)") * 2, 0)
        .cast("long")
        .alias("mad4"),  # quarter-cents
        F.count(F.lit(1)).alias("n_orders"),
    )
    flagged = d.join(F.broadcast(mad), "m2").select(
        "m2",
        "mad4",
        "n_orders",
        flag(
            (F.col("d2") * 2 * 10000).cast("double")
            > F.lit(MAD_K_E4).cast("double") * F.col("mad4").cast("double")
        ).alias("is_out"),
    )
    return (
        flagged.groupBy("n_orders", "m2", "mad4")
        .agg(F.sum("is_out").alias("n_outliers"))
        .select(
            "n_orders",
            F.round(F.col("m2").cast("double") / 200.0, 4).alias(
                "median_dollars"
            ),
            F.round(F.col("mad4").cast("double") / 400.0, 4).alias(
                "mad_dollars"
            ),
            "n_outliers",
            F.round(
                F.col("n_outliers").cast("double")
                / F.col("n_orders").cast("double"),
                6,
            ).alias("outlier_rate"),
        )
    )


ORACLE_MAD_OUTLIERS = f"""
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
), med AS (
  SELECT CAST(ROUND(median(c) * 2) AS BIGINT) AS m2 FROM c
), d AS (
  SELECT m2, ABS(c * 2 - m2) AS d2 FROM c CROSS JOIN med
), mad AS (
  SELECT m2, CAST(ROUND(median(d2) * 2) AS BIGINT) AS mad4,
         COUNT(*) AS n_orders
  FROM d GROUP BY m2
)
SELECT n_orders,
       ROUND(CAST(m2 AS DOUBLE) / 200.0, 4) AS median_dollars,
       ROUND(CAST(mad4 AS DOUBLE) / 400.0, 4) AS mad_dollars,
       SUM(CASE WHEN CAST(d2 * 2 * 10000 AS DOUBLE)
                     > CAST({MAD_K_E4} AS DOUBLE) * CAST(mad4 AS DOUBLE)
                THEN 1 ELSE 0 END) AS n_outliers,
       ROUND(CAST(SUM(CASE WHEN CAST(d2 * 2 * 10000 AS DOUBLE)
                     > CAST({MAD_K_E4} AS DOUBLE) * CAST(mad4 AS DOUBLE)
                THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(n_orders AS DOUBLE), 6) AS outlier_rate
FROM d JOIN mad USING (m2)
GROUP BY n_orders, m2, mad4
"""


# ---------------------------------------------------------------------------
# Winsorized per-segment revenue stats
# ---------------------------------------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorized_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean order value per customer market segment:
    clamp to the segment's [p05, p95] before averaging, so one whale
    order can't move a segment's trend line.

    The percentile bounds reduce per segment (O(segments) rows) and
    broadcast back onto the fact stream; clamped values are exact
    integer cents (bounds rounded to cents first), so the sum is
    merge-order-proof and only the final mean divides. Two passes
    over one pruned column — same shape at any scale.
    """
    seg = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", cents(F.col("o_totalprice")).alias("c"))
        .join(F.broadcast(seg), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_mktsegment").alias("segment"), "c")
    )
    bounds = o.groupBy("segment").agg(
        F.round(F.expr(f"percentile(c, {WINSOR_LO})"), 0)
        .cast("long")
        .alias("lo"),
        F.round(F.expr(f"percentile(c, {WINSOR_HI})"), 0)
        .cast("long")
        .alias("hi"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    clamped = o.join(F.broadcast(bounds), "segment").select(
        "segment",
        "lo",
        "hi",
        "n_orders",
        F.least(F.greatest(F.col("c"), F.col("lo")), F.col("hi")).alias(
            "cw"
        ),
    )
    return (
        clamped.groupBy("segment", "lo", "hi", "n_orders")
        .agg(F.sum("cw").alias("s"))
        .select(
            "segment",
            "n_orders",
            F.round(F.col("lo").cast("double") / 100.0, 2).alias(
                "p05_dollars"
            ),
            F.round(F.col("hi").cast("double") / 100.0, 2).alias(
                "p95_dollars"
            ),
            F.round(
                F.col("s").cast("double")
                / F.col("n_orders").cast("double") / 100.0,
                6,
            ).alias("winsorized_avg"),
        )
        .orderBy("segment")
    )


ORACLE_WINSORIZED = f"""
WITH o AS (
  SELECT c_mktsegment AS segment,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
), bounds AS (
  SELECT segment,
         CAST(ROUND(quantile_cont(c, {WINSOR_LO}), 0) AS BIGINT) AS lo,
         CAST(ROUND(quantile_cont(c, {WINSOR_HI}), 0) AS BIGINT) AS hi,
         COUNT(*) AS n_orders
  FROM o GROUP BY segment
)
SELECT segment, n_orders,
       ROUND(CAST(lo AS DOUBLE) / 100.0, 2) AS p05_dollars,
       ROUND(CAST(hi AS DOUBLE) / 100.0, 2) AS p95_dollars,
       ROUND(CAST(SUM(LEAST(GREATEST(c, lo), hi)) AS DOUBLE)
             / CAST(n_orders AS DOUBLE) / 100.0, 6) AS winsorized_avg
FROM o JOIN bounds USING (segment)
GROUP BY segment, n_orders, lo, hi
ORDER BY segment
"""


QUERIES: dict[str, QuerySpec] = {
    "ks_drift_orders": QuerySpec(
        ks_drift_orders, ORACLE_KS_DRIFT, ["A1", "A4", "X-curation"]
    ),
    "token_entropy_kl": QuerySpec(
        token_entropy_kl, ORACLE_TOKEN_ENTROPY_KL, ["A1", "J1", "X-curation"]
    ),
    "mad_outlier_orders": QuerySpec(
        mad_outlier_orders, ORACLE_MAD_OUTLIERS, ["A4", "X-curation"]
    ),
    "winsorized_segment_stats": QuerySpec(
        winsorized_segment_stats, ORACLE_WINSORIZED, ["A1", "J1", "X-curation"]
    ),
}
