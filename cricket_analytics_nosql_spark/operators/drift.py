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

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.scalar import cents, epoch_day, flag
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
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
  FROM counts
)
SELECT n_a, n_b,
       CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num,
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
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tok, COUNT(*) AS n_terms
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
       CAST(SUM(CASE WHEN CAST(d2 * 2 * 10000 AS DOUBLE)
                     > CAST({MAD_K_E4} AS DOUBLE) * CAST(mad4 AS DOUBLE)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
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
        # no broadcast hint: customer scales with SF — AQE decides
        .join(seg, F.col("o_custkey") == F.col("c_custkey"))
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


# ---------------------------------------------------------------------------
# Population stability index (binned drift between two eras)
# ---------------------------------------------------------------------------

PSI_BINS = 10
PSI_SPLIT_YEAR = 1998  # era A: orders before 1998; era B: 1998+


def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the order-value
    distributions of two eras (pre/post-{PSI_SPLIT_YEAR}) — the
    scorecard-monitoring standard: PSI < 0.1 stable, > 0.25 shifted.

    Equal-width dollar bins over the GLOBAL [min, max] (an O(1)-row
    bounds aggregate broadcast back — the value_histogram pattern);
    all {PSI_BINS} bins are generated from a range frame so empty
    bins still contribute through Laplace(+1) smoothing, which also
    makes every log finite. The per-bin term is the cross-multiplied
    integer ``(ca'·nb' − cb'·na') · ROUND(ln(ratio)·1e6)`` — bigint
    all the way; two final divisions mirror the oracle."""
    o = load_table(spark, sf_dir, "orders").select(
        flag(F.year("o_orderdate") < PSI_SPLIT_YEAR).alias("is_a"),
        F.expr("cast(round(o_totalprice * 100) as bigint) div 100").alias(
            "v"
        ),
    )
    bounds = o.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    binned = o.crossJoin(F.broadcast(bounds)).select(
        "is_a",
        F.least(
            F.lit(PSI_BINS - 1),
            F.expr(f"((v - lo) * {PSI_BINS}) div (hi - lo + 1)"),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum("is_a").alias("ca"),
        F.sum(1 - F.col("is_a")).alias("cb"),
    )
    all_bins = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    filled = (
        all_bins.join(counts, "bin", "left")
        .select(
            "bin",
            (F.coalesce("ca", F.lit(0)) + 1).alias("ca1"),
            (F.coalesce("cb", F.lit(0)) + 1).alias("cb1"),
        )
    )
    tot = filled.agg(
        F.sum("ca1").alias("na1"), F.sum("cb1").alias("nb1")
    )
    j = filled.crossJoin(F.broadcast(tot))
    ln_e6 = F.round(
        F.log(
            (F.col("ca1") * F.col("nb1")).cast("double")
            / (F.col("cb1") * F.col("na1")).cast("double")
        )
        * 1e6,
        0,
    ).cast("long")
    term = (
        F.col("ca1") * F.col("nb1") - F.col("cb1") * F.col("na1")
    ) * ln_e6
    return (
        j.groupBy("na1", "nb1")
        .agg(F.sum(term).alias("s"), F.count(F.lit(1)).alias("n_bins"))
        .select(
            "n_bins",
            (F.col("na1") - PSI_BINS).alias("n_era_a"),
            (F.col("nb1") - PSI_BINS).alias("n_era_b"),
            F.round(
                F.col("s").cast("double")
                / (F.col("na1") * F.col("nb1")).cast("double") / 1e6,
                6,
            ).alias("psi"),
        )
    )


ORACLE_PSI_VALUE_DRIFT = f"""
WITH o AS (
  SELECT CASE WHEN year(o_orderdate) < {PSI_SPLIT_YEAR} THEN 1 ELSE 0 END
           AS is_a,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS v
  FROM orders
), bounds AS (
  SELECT MIN(v) AS lo, MAX(v) AS hi FROM o
), binned AS (
  SELECT is_a,
         LEAST({PSI_BINS} - 1, ((v - lo) * {PSI_BINS}) // (hi - lo + 1))
           AS bin
  FROM o CROSS JOIN bounds
), counts AS (
  SELECT bin, SUM(is_a) AS ca, SUM(1 - is_a) AS cb
  FROM binned GROUP BY bin
), filled AS (
  SELECT r.range AS bin,
         COALESCE(ca, 0) + 1 AS ca1,
         COALESCE(cb, 0) + 1 AS cb1
  FROM range({PSI_BINS}) r LEFT JOIN counts ON counts.bin = r.range
), tot AS (
  SELECT SUM(ca1) AS na1, SUM(cb1) AS nb1 FROM filled
)
SELECT COUNT(*) AS n_bins,
       CAST(na1 - {PSI_BINS} AS BIGINT) AS n_era_a,
       CAST(nb1 - {PSI_BINS} AS BIGINT) AS n_era_b,
       ROUND(CAST(SUM((ca1 * nb1 - cb1 * na1)
                      * CAST(ROUND(ln(CAST(ca1 * nb1 AS DOUBLE)
                                      / CAST(cb1 * na1 AS DOUBLE)) * 1000000.0)
                             AS BIGINT)) AS DOUBLE)
             / CAST(na1 * nb1 AS DOUBLE) / 1000000.0, 6) AS psi
FROM filled CROSS JOIN tot
GROUP BY na1, nb1
"""


# ---------------------------------------------------------------------------
# Benford first-digit anomaly screen
# ---------------------------------------------------------------------------

def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order values — the classic
    fabricated-numbers screen: the leading digit of naturally-grown
    amounts follows ``P(d) = log10(1 + 1/d)``; a synthetic or capped
    feed shows up as a fat tail on high digits.  Per-digit observed
    share vs expected, plus each digit's chi-square contribution and
    the running total (a 9-row frame — the unpartitioned window is
    free).  Counts are integers; each double term is rounded to an
    integer e6 scale before the 9-term sum, so engines agree."""
    d = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.substring(
                F.expr(
                    "cast(cast(round(o_totalprice * 100) as bigint)"
                    " div 100 as string)"
                ),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    tot = d.agg(F.sum("n_obs").alias("n"))
    j = d.crossJoin(F.broadcast(tot))
    expected = F.log10(1 + 1.0 / F.col("digit"))
    chi_e6 = F.round(
        (F.col("n_obs").cast("double") - F.col("n") * expected)
        * (F.col("n_obs").cast("double") - F.col("n") * expected)
        / (F.col("n") * expected)
        * 1e6,
        0,
    ).cast("long")
    w = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        j.select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias(
                "obs_share"
            ),
            F.round(expected, 6).alias("benford_share"),
            chi_e6.alias("chi_e6"),
        )
        .withColumn(
            "chi_square_total",
            F.round(F.sum("chi_e6").over(w).cast("double") / 1e6, 4),
        )
        .orderBy("digit")
    )


ORACLE_BENFORD = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100
                          AS VARCHAR), 1, 1) AS INT) AS digit,
         COUNT(*) AS n_obs
  FROM orders GROUP BY digit
), tot AS (
  SELECT SUM(n_obs) AS n FROM d
), terms AS (
  SELECT digit, n_obs,
         ROUND(CAST(n_obs AS DOUBLE) / n, 6) AS obs_share,
         ROUND(log10(1 + 1.0 / digit), 6) AS benford_share,
         CAST(ROUND((CAST(n_obs AS DOUBLE) - n * log10(1 + 1.0 / digit))
                    * (CAST(n_obs AS DOUBLE) - n * log10(1 + 1.0 / digit))
                    / (n * log10(1 + 1.0 / digit)) * 1000000.0)
              AS BIGINT) AS chi_e6
  FROM d CROSS JOIN tot
)
SELECT digit, n_obs, obs_share, benford_share, chi_e6,
       ROUND(CAST(SUM(chi_e6) OVER () AS DOUBLE) / 1000000.0, 4)
         AS chi_square_total
FROM terms
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of daily revenue
# ---------------------------------------------------------------------------

def revenue_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Pearson autocorrelation of the daily order-revenue
    series — the one-number seasonality/trend screen that decides
    whether a forecast baseline needs differencing.

    The fact stream collapses to the ~calendar-sized daily rollup
    (one exchange with map-side combine); the lag pass and the five
    moment sums run over that frame.  Daily revenue is kept in WHOLE
    DOLLARS so Σx² stays inside bigint at sf0.1 (measured 6e17 of
    9.2e18) — at larger scales coarsen the unit (kilodollars), same
    plan.  The Pearson formula is evaluated once at the end in
    doubles from the exact integer sums, textually identical to the
    oracle."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint) div 100")
            ).alias("rev")
        )
    )
    w = Window.orderBy("day")
    pairs = daily.select(
        "day", "rev", F.lag("rev").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("sx"),
        F.sum("prev").alias("sy"),
        F.sum(F.col("rev") * F.col("rev")).alias("sxx"),
        F.sum(F.col("prev") * F.col("prev")).alias("syy"),
        F.sum(F.col("rev") * F.col("prev")).alias("sxy"),
    )
    num = F.col("n").cast("double") * F.col("sxy").cast(
        "double"
    ) - F.col("sx").cast("double") * F.col("sy").cast("double")
    den = F.sqrt(
        (
            F.col("n").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * (
            F.col("n").cast("double") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        )
    )
    return m.select(
        (F.col("n") + 1).alias("n_days"),
        F.round(num / den, 6).alias("autocorr_lag1"),
    )


ORACLE_REVENUE_AUTOCORR = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100) AS rev
  FROM orders GROUP BY day
), pairs AS (
  SELECT rev, LAG(rev) OVER (ORDER BY day) AS prev FROM daily
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rev) AS BIGINT) AS sx,
         CAST(SUM(prev) AS BIGINT) AS sy,
         CAST(SUM(rev * rev) AS BIGINT) AS sxx,
         CAST(SUM(prev * prev) AS BIGINT) AS syy,
         CAST(SUM(rev * prev) AS BIGINT) AS sxy
  FROM pairs WHERE prev IS NOT NULL
)
SELECT n + 1 AS n_days,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS autocorr_lag1
FROM m
"""


# ---------------------------------------------------------------------------
# Revenue concentration: Gini coefficient + Lorenz decile shares
# ---------------------------------------------------------------------------

def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime revenue — the
    concentration number behind "whale risk" dashboards (0 = every
    customer equal, →1 = one customer is the business).

    The fact stream reduces to the per-customer rollup first; the
    rank assignment (``G = (2Σi·xᵢ − (n+1)Σx)/(nΣx)`` needs each
    value's ascending rank) is an unpartitioned row_number over that
    CUSTOMER-sized frame — the KS/rolling-median posture: global
    order over an aggregate, never the fact. Ties in x are
    rank-permutation-invariant in Σi·xᵢ, so the tie-break is purely
    cosmetic. Revenue is whole dollars: Σi·x stays ~1e14 of bigint
    range at sf0.1; coarsen the unit at larger scales."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint) div 100")
            ).alias("x")
        )
    )
    w = Window.orderBy("x", "o_custkey")
    ranked = per_cust.select(
        "x", F.row_number().over(w).alias("i")
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    return m.select(
        F.col("n").alias("n_customers"),
        F.col("sx").alias("total_dollars"),
        F.round(
            (
                2 * F.col("six").cast("double")
                - (F.col("n") + 1).cast("double") * F.col("sx").cast("double")
            )
            / (F.col("n").cast("double") * F.col("sx").cast("double")),
            6,
        ).alias("gini"),
    )


ORACLE_GINI = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100) AS x
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i FROM per_cust
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(i * x) AS BIGINT) AS six
  FROM ranked
)
SELECT n AS n_customers, sx AS total_dollars,
       ROUND((2 * CAST(six AS DOUBLE)
              - CAST(n + 1 AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS gini
FROM m
"""


def lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve readout: customers split into revenue deciles
    (ascending), each decile's share of total revenue and the
    cumulative share — the "bottom 50% hold 9%" statement auditors
    actually quote.  Same aggregate-frame-then-rank posture as the
    Gini; shares are integer sums with one rounded division each;
    the 10-row cumulative window is free."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint) div 100")
            ).alias("x")
        )
    )
    w = Window.orderBy("x", "o_custkey")
    deciled = per_cust.select(
        "x", F.ntile(10).over(w).alias("decile")
    )
    agg = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("x").alias("revenue_dollars"),
    )
    tot = agg.agg(F.sum("revenue_dollars").alias("t"))
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "revenue_dollars",
            F.round(
                F.col("revenue_dollars").cast("double")
                / F.col("t").cast("double"),
                6,
            ).alias("share"),
            F.round(
                F.sum("revenue_dollars").over(w_cum).cast("double")
                / F.col("t").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


ORACLE_LORENZ = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100) AS x
  FROM orders GROUP BY o_custkey
), deciled AS (
  SELECT x, NTILE(10) OVER (ORDER BY x, o_custkey) AS decile FROM per_cust
), agg AS (
  SELECT decile, COUNT(*) AS n_customers,
         CAST(SUM(x) AS BIGINT) AS revenue_dollars
  FROM deciled GROUP BY decile
), tot AS (
  SELECT SUM(revenue_dollars) AS t FROM agg
)
SELECT decile, n_customers, revenue_dollars,
       ROUND(CAST(revenue_dollars AS DOUBLE) / CAST(t AS DOUBLE), 6)
         AS share,
       ROUND(CAST(SUM(revenue_dollars)
                    OVER (ORDER BY decile
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / CAST(t AS DOUBLE), 6) AS cum_share
FROM agg CROSS JOIN tot
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# OLS trend slope per market segment
# ---------------------------------------------------------------------------

def trend_slope_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment revenue trend: the OLS slope (dollars/day) of
    each market segment's daily revenue series, plus the Pearson r
    that says whether the trend is real — the forecasting baseline
    every "is this segment growing?" dashboard runs.

    The fact stream collapses to (segment, day) rollups (one keyed
    exchange with map-side combine — the calendar bounds the frame);
    the five closed-form moment sums are exact integers (days
    re-anchored to each segment's first day to keep Σt·y small), and
    slope/r are evaluated once per segment in doubles mirroring the
    oracle textually."""
    seg = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    daily = (
        load_table(spark, sf_dir, "orders")
        # no broadcast hint: customer scales with SF — AQE decides
        .join(seg, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            epoch_day("o_orderdate").alias("day"),
        )
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint) div 100")
            ).alias("y")
        )
    )
    anchored = daily.withColumn(
        "t",
        F.col("day")
        - F.min("day").over(Window.partitionBy("segment")),
    )
    m = anchored.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
    )
    num = F.col("n").cast("double") * F.col("sty").cast(
        "double"
    ) - F.col("st").cast("double") * F.col("sy").cast("double")
    den_t = F.col("n").cast("double") * F.col("stt").cast(
        "double"
    ) - F.col("st").cast("double") * F.col("st").cast("double")
    den_y = F.col("n").cast("double") * F.col("syy").cast(
        "double"
    ) - F.col("sy").cast("double") * F.col("sy").cast("double")
    return m.select(
        "segment",
        F.col("n").alias("n_days"),
        F.round(num / den_t, 6).alias("slope_dollars_per_day"),
        F.round(num / F.sqrt(den_t * den_y), 6).alias("pearson_r"),
    ).orderBy("segment")


ORACLE_TREND_SLOPE = """
WITH daily AS (
  SELECT c_mktsegment AS segment,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY segment, day
), anchored AS (
  SELECT segment, y,
         day - MIN(day) OVER (PARTITION BY segment) AS t
  FROM daily
), m AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(t * t) AS BIGINT) AS stt,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(t * y) AS BIGINT) AS sty
  FROM anchored GROUP BY segment
)
SELECT segment, n AS n_days,
       ROUND((CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
              - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)), 6)
         AS slope_dollars_per_day,
       ROUND((CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
              - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS pearson_r
FROM m
ORDER BY segment
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint locator on daily revenue
# ---------------------------------------------------------------------------

def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily-revenue series: the
    day where the cumulative deviation from the global daily mean
    peaks is the single most likely level-shift point (the classic
    offline CUSUM estimator).  Emits that day, the peak |CUSUM|, and
    the mean daily revenue on each side — the before/after readout a
    human checks first.

    Everything rides the calendar-sized day rollup: the cumulative
    window is the KS posture (global prefix over an aggregate frame,
    never the fact).  Deviations are exact integer dollars scaled by
    n (cusum_k = n·Σy_i − k·Σy, all bigint — no mean rounding
    anywhere); the two side means divide once each at the end."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint) div 100")
            ).alias("y")
        )
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "y",
        "n",
        "sy",
        F.row_number().over(Window.orderBy("day")).alias("k"),
        (F.sum("y").over(w)).alias("cy"),
    )
    scored = cum.select(
        "day",
        "n",
        "sy",
        "k",
        "cy",
        F.abs(
            F.col("n") * F.col("cy") - F.col("k") * F.col("sy")
        ).alias("dev"),
    )
    best = scored.agg(
        F.max(F.struct(F.col("dev"), (-F.col("day")).alias("nd"))).alias(
            "m"
        )
    )
    return (
        scored.crossJoin(F.broadcast(best))
        .filter(
            (F.col("dev") == F.col("m.dev"))
            & (F.col("day") == -F.col("m.nd"))
        )
        .select(
            F.col("day").alias("changepoint_day"),
            F.col("k").alias("days_before"),
            (F.col("n") - F.col("k")).alias("days_after"),
            F.round(
                F.col("cy").cast("double") / F.col("k").cast("double"),
                2,
            ).alias("mean_before"),
            F.round(
                (F.col("sy") - F.col("cy")).cast("double")
                / (F.col("n") - F.col("k")).cast("double"),
                2,
            ).alias("mean_after"),
        )
    )


def stl_weekly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite weekly seasonal profile of daily revenue: trend =
    centered 7-day moving average (full windows only), seasonal =
    per-day-of-week mean of the detrended series — the
    decomposition a capacity planner reads before trusting any
    day-over-day comparison. Output: per dow (epoch-day mod 7, a
    timezone-free weekday key), the seasonal component and the mean
    absolute detrended residual in micro-dollars.

    Exactness discipline: the trend is a ratio of exact integer
    sums over a RANGE window on the calendar-bounded day rollup
    (the KS posture — the window never sees the fact table); each
    day's detrended value is rounded to integer micro-dollars
    BEFORE the day-of-week aggregation, so the per-dow sums are
    order-free BIGINT and the only doubles are final ratios written
    identically in the oracle."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint) div 100")
            ).alias("y")
        )
    )
    wr = Window.orderBy("day").rangeBetween(-3, 3)
    trended = daily.select(
        "day",
        "y",
        F.sum("y").over(wr).alias("wy"),
        F.count(F.lit(1)).over(wr).alias("wn"),
    ).filter(F.col("wn") == 7)
    detr = trended.select(
        (F.col("day") % 7).alias("dow"),
        F.round(
            (
                F.col("y").cast("double")
                - F.col("wy").cast("double") / F.col("wn")
            )
            * 1e6,
            0,
        )
        .cast("long")
        .alias("d_micro"),
    )
    return (
        detr.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(
                F.sum("d_micro").cast("double") / F.count(F.lit(1)), 1
            ).alias("seasonal_micro"),
            F.round(
                F.sum(F.abs(F.col("d_micro"))).cast("double")
                / F.count(F.lit(1)),
                1,
            ).alias("mean_abs_resid_micro"),
        )
        .orderBy("dow")
    )


ORACLE_STL_WEEKLY = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100)
              AS BIGINT) AS y
  FROM orders GROUP BY day
), trended AS (
  SELECT day, y,
         CAST(SUM(y) OVER (ORDER BY day
              RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS wy,
         COUNT(*) OVER (ORDER BY day
              RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
  FROM daily
), detr AS (
  SELECT day % 7 AS dow,
         CAST(ROUND((CAST(y AS DOUBLE) - CAST(wy AS DOUBLE) / wn) * 1000000,
                    0) AS BIGINT) AS d_micro
  FROM trended WHERE wn = 7
)
SELECT dow, COUNT(*) AS n_days,
       ROUND(CAST(SUM(d_micro) AS DOUBLE) / COUNT(*), 1) AS seasonal_micro,
       ROUND(CAST(SUM(ABS(d_micro)) AS DOUBLE) / COUNT(*), 1)
         AS mean_abs_resid_micro
FROM detr
GROUP BY dow
ORDER BY dow
"""


def stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified average-treatment-effect estimate — the
    observational-data companion to ``cuped_adjusted_ab``: treatment
    is not randomized here (order priority correlates with customer
    mix), so the naive URGENT-vs-LOW value gap confounds segment
    composition. Stratify on market segment: within each stratum the
    treated/control means difference is unconfounded-by-stratum, and
    the ATE pools the per-stratum gaps weighted by stratum size —
    algebraically identical to inverse-propensity weighting when the
    propensity is the exact within-stratum treatment share. Output:
    one row per segment (sizes, both means, gap) plus the ATE and
    the naive gap side by side — the difference IS the measured
    confounding.

    One fact exchange (groupBy segment×arm over the pruned join);
    everything after runs on the 2·|segments| aggregate. Means are
    ratios of exact integer-dollar sums; the pooled lines are the
    same arithmetic on the tiny frame, ordered with 'ALL' rows
    last by the is_total flag."""
    seg = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin(KS_GROUP_A, KS_GROUP_B))
        .select(
            "o_custkey",
            flag(F.col("o_orderpriority") == KS_GROUP_A).alias("treat"),
            F.expr("cast(round(o_totalprice * 100) as bigint) div 100").alias(
                "v"
            ),
        )
        .join(seg, F.col("o_custkey") == F.col("c_custkey"))
    )
    cell = o.groupBy(F.col("c_mktsegment").alias("segment"), "treat").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    per_seg = (
        cell.groupBy("segment")
        .agg(
            F.sum("n").alias("n_orders"),
            F.sum(F.when(F.col("treat") == 1, F.col("n")).otherwise(0)).alias(
                "nt"
            ),
            F.sum(F.when(F.col("treat") == 1, F.col("sv")).otherwise(0)).alias(
                "svt"
            ),
            F.sum(F.when(F.col("treat") == 0, F.col("n")).otherwise(0)).alias(
                "nc"
            ),
            F.sum(F.when(F.col("treat") == 0, F.col("sv")).otherwise(0)).alias(
                "svc"
            ),
        )
        .filter((F.col("nt") > 0) & (F.col("nc") > 0))
    )
    gap = (
        F.col("svt").cast("double") / F.col("nt")
        - F.col("svc").cast("double") / F.col("nc")
    )
    seg_rows = per_seg.select(
        F.lit(0).alias("is_total"),
        "segment",
        "n_orders",
        "nt",
        "nc",
        F.round(F.col("svt").cast("double") / F.col("nt"), 2).alias("mean_t"),
        F.round(F.col("svc").cast("double") / F.col("nc"), 2).alias("mean_c"),
        F.round(gap, 2).alias("gap"),
    )
    pooled = per_seg.agg(
        F.sum("n_orders").alias("N"),
        F.sum("nt").alias("NT"),
        F.sum("nc").alias("NC"),
        F.sum("svt").alias("SVT"),
        F.sum("svc").alias("SVC"),
        F.sum(
            F.col("n_orders").cast("double")
            * (
                F.col("svt").cast("double") / F.col("nt")
                - F.col("svc").cast("double") / F.col("nc")
            )
        ).alias("wgap"),
    )
    total_rows = pooled.select(
        F.lit(1).alias("is_total"),
        F.lit("ALL_stratified").alias("segment"),
        F.col("N").alias("n_orders"),
        F.col("NT").alias("nt"),
        F.col("NC").alias("nc"),
        F.lit(None).cast("double").alias("mean_t"),
        F.lit(None).cast("double").alias("mean_c"),
        F.round(F.col("wgap") / F.col("N"), 2).alias("gap"),
    ).unionByName(
        pooled.select(
            F.lit(2).alias("is_total"),
            F.lit("ALL_naive").alias("segment"),
            F.col("N").alias("n_orders"),
            F.col("NT").alias("nt"),
            F.col("NC").alias("nc"),
            F.round(F.col("SVT").cast("double") / F.col("NT"), 2).alias(
                "mean_t"
            ),
            F.round(F.col("SVC").cast("double") / F.col("NC"), 2).alias(
                "mean_c"
            ),
            F.round(
                F.col("SVT").cast("double") / F.col("NT")
                - F.col("SVC").cast("double") / F.col("NC"),
                2,
            ).alias("gap"),
        )
    )
    return seg_rows.unionByName(total_rows).orderBy("is_total", "segment")


ORACLE_STRATIFIED_ATE = f"""
WITH o AS (
  SELECT o_custkey,
         CASE WHEN o_orderpriority = '{KS_GROUP_A}' THEN 1 ELSE 0 END AS treat,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS v
  FROM orders
  WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
), j AS (
  SELECT c.c_mktsegment AS segment, o.treat, o.v
  FROM o JOIN customer c ON o.o_custkey = c.c_custkey
), per_seg AS (
  SELECT segment,
         COUNT(*) AS n_orders,
         CAST(SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         CAST(SUM(CASE WHEN treat = 1 THEN v ELSE 0 END) AS BIGINT) AS svt,
         CAST(SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN treat = 0 THEN v ELSE 0 END) AS BIGINT) AS svc
  FROM j GROUP BY segment
  HAVING nt > 0 AND nc > 0
), pooled AS (
  SELECT CAST(SUM(n_orders) AS BIGINT) AS N,
         CAST(SUM(nt) AS BIGINT) AS NT, CAST(SUM(nc) AS BIGINT) AS NC,
         CAST(SUM(svt) AS BIGINT) AS SVT, CAST(SUM(svc) AS BIGINT) AS SVC,
         SUM(CAST(n_orders AS DOUBLE)
             * (CAST(svt AS DOUBLE) / nt - CAST(svc AS DOUBLE) / nc)) AS wgap
  FROM per_seg
)
SELECT is_total, segment, n_orders, nt, nc, mean_t, mean_c, gap FROM (
  SELECT 0 AS is_total, segment, n_orders, nt, nc,
         ROUND(CAST(svt AS DOUBLE) / nt, 2) AS mean_t,
         ROUND(CAST(svc AS DOUBLE) / nc, 2) AS mean_c,
         ROUND(CAST(svt AS DOUBLE) / nt - CAST(svc AS DOUBLE) / nc, 2) AS gap
  FROM per_seg
  UNION ALL
  SELECT 1, 'ALL_stratified', N, NT, NC,
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         ROUND(wgap / N, 2)
  FROM pooled
  UNION ALL
  SELECT 2, 'ALL_naive', N, NT, NC,
         ROUND(CAST(SVT AS DOUBLE) / NT, 2),
         ROUND(CAST(SVC AS DOUBLE) / NC, 2),
         ROUND(CAST(SVT AS DOUBLE) / NT - CAST(SVC AS DOUBLE) / NC, 2)
  FROM pooled
)
ORDER BY is_total, segment
"""


OLS_BREAK_TOPK = 5


def ols_break_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural-break scan (the Chow-test sweep): fit separate OLS
    trend lines to the daily-revenue series on each side of every
    candidate breakpoint and rank candidates by how much the split
    cuts total squared error vs the single global fit —
    ``cusum_changepoint`` finds a LEVEL shift; this finds a SLOPE
    regime change. Candidates are the 30-day block boundaries
    strictly inside the observed range (a calendar-bounded grid).

    Shapes/exactness: one day-grain rollup (the one fact exchange),
    then a days×candidates cross bounded by the CALENDAR on both
    sides (the theil_sen posture — invariant in data volume); every
    per-side moment (n, Σt, Σy, Σtt, Σty, Σyy) is an exact BIGINT
    conditional sum, and each side's SSE = Syy_c − Sty_c²/Stt_c is
    double arithmetic on those exact integers, written in the same
    order in the oracle. Sides thinner than 3 days are dropped
    (degenerate fits). Ranking sorts the ROUNDED improvement with a
    day tie-break."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint) div 100")
            ).alias("y")
        )
    )
    bounds = daily.agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    )
    cands = (
        daily.select((F.col("day") - (F.col("day") % 30)).alias("c"))
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .filter((F.col("c") > F.col("dmin")) & (F.col("c") <= F.col("dmax")))
        .select("c")
    )

    def side_moments(pred, tag: str) -> list:
        z = F.when(pred, F.lit(1)).otherwise(F.lit(0))
        return [
            F.sum(z).alias(f"n{tag}"),
            F.sum(z * F.col("day")).alias(f"st{tag}"),
            F.sum(z * F.col("y")).alias(f"sy{tag}"),
            F.sum(z * F.col("day") * F.col("day")).alias(f"stt{tag}"),
            F.sum(z * F.col("day") * F.col("y")).alias(f"sty{tag}"),
            F.sum(z * F.col("y") * F.col("y")).alias(f"syy{tag}"),
        ]

    j = daily.crossJoin(F.broadcast(cands))
    per_c = j.groupBy("c").agg(
        *side_moments(F.col("day") < F.col("c"), "l"),
        *side_moments(F.col("day") >= F.col("c"), "r"),
    )

    def sse(tag: str) -> F.Column:
        n = F.col(f"n{tag}").cast("double")
        st = F.col(f"st{tag}").cast("double")
        sy = F.col(f"sy{tag}").cast("double")
        dy = F.col(f"syy{tag}").cast("double") - sy * sy / n
        num = F.col(f"sty{tag}").cast("double") - st * sy / n
        den = F.col(f"stt{tag}").cast("double") - st * st / n
        return dy - num * num / den

    glob = daily.agg(*side_moments(F.lit(True), "g")).select(
        (sse("g")).alias("sse_single")
    )
    return (
        per_c.filter((F.col("nl") >= 3) & (F.col("nr") >= 3))
        .crossJoin(F.broadcast(glob))
        .select(
            F.col("c").alias("break_day"),
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            F.round(sse("l") + sse("r"), 2).alias("sse_break"),
            F.round(F.col("sse_single"), 2).alias("sse_single"),
            F.round(
                F.lit(1.0) - (sse("l") + sse("r")) / F.col("sse_single"), 6
            ).alias("improvement"),
        )
        .orderBy(F.desc("improvement"), F.asc("break_day"))
        .limit(OLS_BREAK_TOPK)
    )


ORACLE_OLS_BREAK = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100)
              AS BIGINT) AS y
  FROM orders GROUP BY day
), bounds AS (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM daily
), cands AS (
  SELECT DISTINCT day - (day % 30) AS c FROM daily, bounds
  WHERE day - (day % 30) > dmin AND day - (day % 30) <= dmax
), per_c AS (
  SELECT c,
    CAST(SUM(CASE WHEN day < c THEN 1 ELSE 0 END) AS BIGINT) AS nl,
    CAST(SUM(CASE WHEN day < c THEN day ELSE 0 END) AS BIGINT) AS stl,
    CAST(SUM(CASE WHEN day < c THEN y ELSE 0 END) AS BIGINT) AS syl,
    CAST(SUM(CASE WHEN day < c THEN day * day ELSE 0 END) AS BIGINT) AS sttl,
    CAST(SUM(CASE WHEN day < c THEN day * y ELSE 0 END) AS BIGINT) AS styl,
    CAST(SUM(CASE WHEN day < c THEN y * y ELSE 0 END) AS BIGINT) AS syyl,
    CAST(SUM(CASE WHEN day >= c THEN 1 ELSE 0 END) AS BIGINT) AS nr,
    CAST(SUM(CASE WHEN day >= c THEN day ELSE 0 END) AS BIGINT) AS str_,
    CAST(SUM(CASE WHEN day >= c THEN y ELSE 0 END) AS BIGINT) AS syr,
    CAST(SUM(CASE WHEN day >= c THEN day * day ELSE 0 END) AS BIGINT) AS sttr,
    CAST(SUM(CASE WHEN day >= c THEN day * y ELSE 0 END) AS BIGINT) AS styr,
    CAST(SUM(CASE WHEN day >= c THEN y * y ELSE 0 END) AS BIGINT) AS syyr
  FROM daily CROSS JOIN cands
  GROUP BY c
), g AS (
  SELECT (CAST(SUM(y * y) AS DOUBLE)
            - CAST(SUM(y) AS DOUBLE) * SUM(y) / COUNT(*))
         - (CAST(SUM(day * y) AS DOUBLE)
              - CAST(SUM(day) AS DOUBLE) * SUM(y) / COUNT(*))
           * (CAST(SUM(day * y) AS DOUBLE)
              - CAST(SUM(day) AS DOUBLE) * SUM(y) / COUNT(*))
           / (CAST(SUM(day * day) AS DOUBLE)
              - CAST(SUM(day) AS DOUBLE) * SUM(day) / COUNT(*))
           AS sse_single
  FROM daily
)
SELECT c AS break_day, nl AS n_left, nr AS n_right,
  ROUND(
    ((CAST(syyl AS DOUBLE) - CAST(syl AS DOUBLE) * syl / CAST(nl AS DOUBLE))
      - (CAST(styl AS DOUBLE) - CAST(stl AS DOUBLE) * syl / CAST(nl AS DOUBLE))
        * (CAST(styl AS DOUBLE) - CAST(stl AS DOUBLE) * syl / CAST(nl AS DOUBLE))
        / (CAST(sttl AS DOUBLE) - CAST(stl AS DOUBLE) * stl / CAST(nl AS DOUBLE)))
    + ((CAST(syyr AS DOUBLE) - CAST(syr AS DOUBLE) * syr / CAST(nr AS DOUBLE))
      - (CAST(styr AS DOUBLE) - CAST(str_ AS DOUBLE) * syr / CAST(nr AS DOUBLE))
        * (CAST(styr AS DOUBLE) - CAST(str_ AS DOUBLE) * syr / CAST(nr AS DOUBLE))
        / (CAST(sttr AS DOUBLE) - CAST(str_ AS DOUBLE) * str_ / CAST(nr AS DOUBLE))),
    2) AS sse_break,
  ROUND(sse_single, 2) AS sse_single,
  ROUND(1.0 -
    (((CAST(syyl AS DOUBLE) - CAST(syl AS DOUBLE) * syl / CAST(nl AS DOUBLE))
      - (CAST(styl AS DOUBLE) - CAST(stl AS DOUBLE) * syl / CAST(nl AS DOUBLE))
        * (CAST(styl AS DOUBLE) - CAST(stl AS DOUBLE) * syl / CAST(nl AS DOUBLE))
        / (CAST(sttl AS DOUBLE) - CAST(stl AS DOUBLE) * stl / CAST(nl AS DOUBLE)))
    + ((CAST(syyr AS DOUBLE) - CAST(syr AS DOUBLE) * syr / CAST(nr AS DOUBLE))
      - (CAST(styr AS DOUBLE) - CAST(str_ AS DOUBLE) * syr / CAST(nr AS DOUBLE))
        * (CAST(styr AS DOUBLE) - CAST(str_ AS DOUBLE) * syr / CAST(nr AS DOUBLE))
        / (CAST(sttr AS DOUBLE) - CAST(str_ AS DOUBLE) * str_ / CAST(nr AS DOUBLE))))
    / sse_single, 6) AS improvement
FROM per_c CROSS JOIN g
WHERE nl >= 3 AND nr >= 3
ORDER BY improvement DESC, break_day ASC
LIMIT {OLS_BREAK_TOPK}
"""


ORACLE_CUSUM_CHANGEPOINT = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100) AS y
  FROM orders GROUP BY day
), tot AS (
  SELECT COUNT(*) AS n, SUM(y) AS sy FROM daily
), cum AS (
  SELECT day, y, n, sy,
         ROW_NUMBER() OVER (ORDER BY day) AS k,
         SUM(y) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cy
  FROM daily CROSS JOIN tot
), scored AS (
  SELECT day, n, sy, k, cy, ABS(n * cy - k * sy) AS dev FROM cum
), best AS (
  SELECT dev, day FROM scored ORDER BY dev DESC, day ASC LIMIT 1
)
SELECT s.day AS changepoint_day,
       s.k AS days_before,
       s.n - s.k AS days_after,
       ROUND(CAST(s.cy AS DOUBLE) / CAST(s.k AS DOUBLE), 2) AS mean_before,
       ROUND(CAST(s.sy - s.cy AS DOUBLE) / CAST(s.n - s.k AS DOUBLE), 2)
         AS mean_after
FROM scored s JOIN best b ON s.dev = b.dev AND s.day = b.day
"""


# ---------------------------------------------------------------------------
# Per-user behavioral entropy (event-type diversity)
# ---------------------------------------------------------------------------

def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity feature: Shannon entropy of each user's
    event-type distribution — near-zero entropy with high volume is
    the classic single-action-bot signature; the readout is the
    20 highest-volume users ranked with their entropy so the
    anomalous flat profiles stand out.

    (user, type) counts collapse map-side to ≤|types| rows per user;
    entropy per user uses the integer micro-nat discipline (term
    counts × rounded logs summed as bigint, one division at the
    end). Top-20 by volume is a TakeOrderedAndProject."""
    c_ut = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_u = c_ut.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
    )
    j = c_ut.join(n_u, "user_id")
    h_term = F.col("c") * F.round(
        F.log(F.col("c").cast("double") / F.col("n_events").cast("double"))
        * 1e6,
        0,
    ).cast("long")
    return (
        j.groupBy("user_id", "n_events", "n_types")
        .agg(F.sum(h_term).alias("h_e6"))
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.round(
                -F.col("h_e6").cast("double")
                / F.col("n_events").cast("double") / 1e6,
                6,
            ).alias("entropy_nats"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(20)
    )


ORACLE_USER_BEHAVIOR_ENTROPY = """
WITH c_ut AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type
), n_u AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events, COUNT(*) AS n_types
  FROM c_ut GROUP BY user_id
)
SELECT user_id, n_events, n_types,
       ROUND(-CAST(SUM(c * CAST(ROUND(ln(CAST(c AS DOUBLE)
                                        / CAST(n_events AS DOUBLE))
                                      * 1000000.0) AS BIGINT)) AS DOUBLE)
             / CAST(n_events AS DOUBLE) / 1000000.0, 6) AS entropy_nats
FROM c_ut JOIN n_u USING (user_id)
GROUP BY user_id, n_events, n_types
ORDER BY n_events DESC, user_id ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest
# ---------------------------------------------------------------------------

def forecast_backtest_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecast (ŷ_t = y_{t−7}) on
    daily revenue — the baseline every real forecasting effort must
    beat, and the one to publish when a fancy model can't: MAE,
    MAPE, and bias over the overlap window.

    The lag rides the calendar-sized day rollup under one window
    pass; errors are exact integer dollars, MAPE terms are per-row
    e6-rounded ratios summed as bigint (the micro-nat discipline,
    applied to percentages), and the three readouts divide once
    each."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint) div 100")
            ).alias("y")
        )
    )
    w = Window.orderBy("day")
    pairs = (
        daily.withColumn("yhat", F.lag("y", 7).over(w))
        .filter(F.col("yhat").isNotNull())
        .select(
            (F.col("y") - F.col("yhat")).alias("e"),
            "y",
        )
    )
    ape_e6 = F.round(
        F.abs(F.col("e")).cast("double") * 1e6 / F.col("y").cast("double"),
        0,
    ).cast("long")
    return pairs.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("e"))).alias("abs_err_sum"),
        F.sum("e").alias("err_sum"),
        F.sum(ape_e6).alias("ape_e6_sum"),
    ).select(
        "n_days",
        F.round(
            F.col("abs_err_sum").cast("double")
            / F.col("n_days").cast("double"),
            2,
        ).alias("mae_dollars"),
        F.round(
            F.col("err_sum").cast("double") / F.col("n_days").cast("double"),
            2,
        ).alias("bias_dollars"),
        F.round(
            F.col("ape_e6_sum").cast("double")
            / F.col("n_days").cast("double") / 1e4,
            4,
        ).alias("mape_pct"),
    )


ORACLE_FORECAST_BACKTEST = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100) AS y
  FROM orders GROUP BY day
), pairs AS (
  SELECT y - LAG(y, 7) OVER (ORDER BY day) AS e, y,
         LAG(y, 7) OVER (ORDER BY day) AS yhat
  FROM daily
), terms AS (
  SELECT e, y,
         CAST(ROUND(CAST(ABS(e) AS DOUBLE) * 1000000.0
                    / CAST(y AS DOUBLE)) AS BIGINT) AS ape_e6
  FROM pairs WHERE yhat IS NOT NULL
)
SELECT COUNT(*) AS n_days,
       ROUND(CAST(SUM(ABS(e)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2)
         AS mae_dollars,
       ROUND(CAST(SUM(e) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2)
         AS bias_dollars,
       ROUND(CAST(SUM(ape_e6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / 10000.0, 4) AS mape_pct
FROM terms
"""


# ---------------------------------------------------------------------------
# Zipf fit of the token rank-frequency curve
# ---------------------------------------------------------------------------

ZIPF_TOP_K = 1000


def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token distribution: OLS slope of
    ln(frequency) on ln(rank) over the top-{ZIPF_TOP_K} tokens —
    natural text sits near −1; templated or synthetic corpora bend
    the curve and move the slope, making this a one-number corpus-
    authenticity screen.

    Ranks come from one TakeOrderedAndProject over the vocabulary
    counts; both logs are e6-rounded integers so the five OLS moment
    sums are exact bigint (the trend_slope discipline applied in
    log-log space); slope and r divide once at the end."""
    counts = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens_col(F.col("text"))).alias("t"))
        .filter(F.length("t") > 0)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("t"))
    top = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ZIPF_TOP_K)
    )
    lx = F.round(F.log(F.col("rank").cast("double")) * 1e6, 0).cast("long")
    ly = F.round(F.log(F.col("n").cast("double")) * 1e6, 0).cast("long")
    pts = top.select(lx.alias("x"), ly.alias("y"))
    m = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("k").cast("double") * F.col("sxy").cast(
        "double"
    ) - F.col("sx").cast("double") * F.col("sy").cast("double")
    den_x = F.col("k").cast("double") * F.col("sxx").cast(
        "double"
    ) - F.col("sx").cast("double") * F.col("sx").cast("double")
    den_y = F.col("k").cast("double") * F.col("syy").cast(
        "double"
    ) - F.col("sy").cast("double") * F.col("sy").cast("double")
    return m.select(
        F.col("k").alias("n_tokens_fit"),
        F.round(num / den_x, 6).alias("zipf_slope"),
        F.round(num / F.sqrt(den_x * den_y), 6).alias("fit_r"),
    )


ORACLE_ZIPF_FIT = f"""
WITH counts AS (
  SELECT t.t, COUNT(*) AS n
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS t) t
  WHERE length(t.t) > 0
  GROUP BY t.t
), top AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, t ASC) AS rank
  FROM counts
  QUALIFY rank <= {ZIPF_TOP_K}
), pts AS (
  SELECT CAST(ROUND(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
         CAST(ROUND(ln(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
  FROM top
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pts
)
SELECT k AS n_tokens_fit,
       ROUND((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
         AS zipf_slope,
       ROUND((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(k AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS fit_r
FROM m
"""


# ---------------------------------------------------------------------------
# One-way ANOVA: does order value differ by weekday?
# ---------------------------------------------------------------------------

def anova_weekday_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic for order value across weekdays —
    the continuous-outcome sibling of ``chi_square_assoc``: is the
    between-weekday variation in order size real or noise? Emits the
    F statistic with its degrees of freedom and the between/within
    sums of squares, all derived from exact integer (n, Σx, Σx²)
    triples per group — the sufficient statistics, so the fact
    stream reduces to 7 rows before any variance arithmetic; the
    final doubles mirror the oracle textually. Values are quantized
    to whole KILOdollars: that keeps every moment inside bigint AND
    keeps the 7 per-group double terms small enough (~5e9) that
    partial-sum order noise (≤1e-5) can never cross the 2dp output
    rounding — at dollar units the s² terms reach 1e16 where one ULP
    is 2 and order noise could flip the rounded result."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("weekday(cast(o_orderdate as timestamp))").alias("dow"),
        F.expr(
            "cast(round(o_totalprice * 100) as bigint) div 100000"
        ).alias("v"),
    )
    g = o.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("st"),
        F.sum("ss").alias("sst"),
    )
    j = g.crossJoin(F.broadcast(tot))
    # SSB = Σ_g s²/n − st²/nn ; SSW = Σ_g (ss − s²/n); exact-integer
    # numerators with one division per group term
    ssb_term = F.col("s").cast("double") * F.col("s").cast(
        "double"
    ) / F.col("n").cast("double")
    return (
        j.groupBy("k", "nn", "st", "sst")
        .agg(F.sum(F.round(ssb_term, 4)).alias("sum_sq_over_n"))
        .select(
            (F.col("k")).alias("n_groups"),
            (F.col("nn")).alias("n_orders"),
            F.round(
                F.col("sum_sq_over_n")
                - F.col("st").cast("double") * F.col("st").cast("double")
                / F.col("nn").cast("double"),
                2,
            ).alias("ss_between"),
            F.round(
                F.col("sst").cast("double") - F.col("sum_sq_over_n"),
                2,
            ).alias("ss_within"),
            F.round(
                (
                    (
                        F.col("sum_sq_over_n")
                        - F.col("st").cast("double")
                        * F.col("st").cast("double")
                        / F.col("nn").cast("double")
                    )
                    / (F.col("k") - 1).cast("double")
                )
                / (
                    (F.col("sst").cast("double") - F.col("sum_sq_over_n"))
                    / (F.col("nn") - F.col("k")).cast("double")
                ),
                6,
            ).alias("f_stat"),
        )
    )


ORACLE_ANOVA_WEEKDAY = """
WITH o AS (
  SELECT isodow(o_orderdate) - 1 AS dow,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000 AS v
  FROM orders
), g AS (
  SELECT dow, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS ss
  FROM o GROUP BY dow
), tot AS (
  SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(s) AS st, SUM(ss) AS sst FROM g
), acc AS (
  SELECT k, nn, st, sst,
         SUM(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE), 4)) AS sum_sq_over_n
  FROM g CROSS JOIN tot
  GROUP BY k, nn, st, sst
)
SELECT CAST(k AS BIGINT) AS n_groups,
       CAST(nn AS BIGINT) AS n_orders,
       ROUND(sum_sq_over_n
             - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
               / CAST(nn AS DOUBLE), 2) AS ss_between,
       ROUND(CAST(sst AS DOUBLE) - sum_sq_over_n, 2) AS ss_within,
       ROUND(((sum_sq_over_n
               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                 / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
             / ((CAST(sst AS DOUBLE) - sum_sq_over_n)
                / CAST(nn - k AS DOUBLE)), 6) AS f_stat
FROM acc
"""


# ---------------------------------------------------------------------------
# Mann-Whitney U — rank-based two-sample drift test
# ---------------------------------------------------------------------------

def mann_whitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the same two
    order-priority cohorts as ``ks_drift_orders`` — the rank-based
    member of the drift family: where KS asks "did the distribution
    SHAPE move", U asks "did one cohort stochastically dominate",
    and being rank-based it is immune to the monetary outliers MAD
    flags.

    Exactness discipline: ranks stay integer end-to-end by working
    in DOUBLED ranks — for a tie group of n values with c values
    below it, the average rank is (2c + n + 1)/2, so rank2 =
    2c + n + 1 is always an odd integer and ΣA rank2 = 2·R_A is an
    exact BIGINT. U then derives as U2 = 2U = ΣA rank2 − n_a(n_a+1).
    The tie-corrected normal approximation's z is the only float,
    evaluated once in oracle-identical textual order.

    Plan shape = the KS posture: roll up to the distinct-value grid
    first (cents → whole dollars, same grid as KS), so the only
    unpartitioned window runs over the grid frame, never the fact
    table; everything upstream is one map-side-combined aggregation
    of the pruned (priority, price) projection."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin(KS_GROUP_A, KS_GROUP_B))
        .select(
            flag(F.col("o_orderpriority") == KS_GROUP_A).alias("is_a"),
            (cents("o_totalprice") / 100).cast("long").alias("v"),
        )
    )
    counts = o.groupBy("v").agg(
        F.sum("is_a").alias("ca"),
        F.sum(1 - F.col("is_a")).alias("cb"),
    )
    w = Window.orderBy("v")
    g = counts.select(
        "v",
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("n"),
        F.coalesce(
            F.sum(F.col("ca") + F.col("cb")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("below"),
    )
    agg = g.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(F.col("ca") * (2 * F.col("below") + F.col("n") + 1)).alias("ra2"),
        F.sum(F.col("n") * F.col("n") * F.col("n") - F.col("n")).alias("ties3"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    nn = na + nb
    u2 = F.col("ra2") - F.col("n_a") * (F.col("n_a") + 1)
    mu2 = na * nb  # 2·μ_U = n_a·n_b
    var = (
        na * nb / 12.0
        * ((nn + 1.0) - F.col("ties3").cast("double") / (nn * (nn - 1.0)))
    )
    return agg.select(
        "n_a",
        "n_b",
        (u2.cast("double") / 2.0).alias("u_stat"),
        F.round((u2.cast("double") - mu2) / (2.0 * F.sqrt(var)), 6).alias(
            "z_score"
        ),
    )


ORACLE_MANN_WHITNEY = f"""
WITH o AS (
  SELECT CASE WHEN o_orderpriority = '{KS_GROUP_A}' THEN 1 ELSE 0 END AS is_a,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS v
  FROM orders
  WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
), counts AS (
  SELECT v, SUM(is_a) AS ca, SUM(1 - is_a) AS cb FROM o GROUP BY v
), g AS (
  SELECT v, ca, cb, ca + cb AS n,
         COALESCE(SUM(ca + cb) OVER (ORDER BY v
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS below
  FROM counts
), agg AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(cb) AS BIGINT) AS n_b,
         CAST(SUM(ca * (2 * below + n + 1)) AS BIGINT) AS ra2,
         CAST(SUM(n * n * n - n) AS BIGINT) AS ties3
  FROM g
)
SELECT n_a, n_b,
       CAST(ra2 - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_stat,
       ROUND((CAST(ra2 - n_a * (n_a + 1) AS DOUBLE)
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                           * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
                              - CAST(ties3 AS DOUBLE)
                                / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                                   * (CAST(n_a AS DOUBLE)
                                      + CAST(n_b AS DOUBLE) - 1.0))))),
             6) AS z_score
FROM agg
"""


# ---------------------------------------------------------------------------
# Spearman rank correlation — monotone-association screen
# ---------------------------------------------------------------------------

def spearman_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman ρ between line-item extended price and quantity —
    the monotone-association screen (Pearson on ranks): robust to
    the price scale and to outliers, the standard first question
    about any pair of numeric columns in a profiling pass.

    Exactness: tie-averaged DOUBLED ranks per distinct value (the
    ``mann_whitney_drift`` idiom, rank2 = 2·below + n + 1), joined
    back to the fact by value, then five integer moment sums; ρ is
    one double expression over the five moments, textually mirrored
    in the oracle. Integer headroom: Σ rank2_x·rank2_y ≤ 4N³ —
    exact through sf0.2 (~1.2M rows, 2⁶² headroom); past that,
    segment the moments (per-partition rollup of the same integer
    terms) before the final combine.

    Plan: two value rollups (price grid ~N distinct, quantity grid
    ~50 rows → its rank table broadcasts), two joins back to the
    pruned 2-column fact projection, one scalar agg. The
    unpartitioned windows run over the value grids only (KS
    posture)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        cents("l_extendedprice").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )

    def rank2(col: str) -> DataFrame:
        cnt = li.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
        w = Window.orderBy(col)
        return cnt.select(
            col,
            (
                2
                * F.coalesce(
                    F.sum("n").over(
                        w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
                + F.col("n")
                + 1
            ).alias(f"r_{col}"),
        )

    ranked = li.join(rank2("x"), "x").join(F.broadcast(rank2("y")), "y")
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r_x").alias("sx"),
        F.sum("r_y").alias("sy"),
        F.sum(F.col("r_x") * F.col("r_x")).alias("sxx"),
        F.sum(F.col("r_y") * F.col("r_y")).alias("syy"),
        F.sum(F.col("r_x") * F.col("r_y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return m.select(
        "n",
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("spearman_rho"),
    )


ORACLE_SPEARMAN = """
WITH li AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
), rx AS (
  SELECT x, 2 * COALESCE(SUM(n) OVER (ORDER BY x
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) + n + 1 AS r_x
  FROM (SELECT x, COUNT(*) AS n FROM li GROUP BY x)
), ry AS (
  SELECT y, 2 * COALESCE(SUM(n) OVER (ORDER BY y
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) + n + 1 AS r_y
  FROM (SELECT y, COUNT(*) AS n FROM li GROUP BY y)
), m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(r_x) AS BIGINT) AS sx,
         CAST(SUM(r_y) AS BIGINT) AS sy,
         CAST(SUM(r_x * r_x) AS BIGINT) AS sxx,
         CAST(SUM(r_y * r_y) AS BIGINT) AS syy,
         CAST(SUM(r_x * r_y) AS BIGINT) AS sxy
  FROM li JOIN rx USING (x) JOIN ry USING (y)
)
SELECT n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS spearman_rho
FROM m
"""


def kendall_tau_discount_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b between line-item discount and quantity — the
    other canonical rank correlation, pairing ``spearman_price_qty``:
    τ counts concordant-vs-discordant PAIRS, so it is the statistic
    of choice when the question is "does a deeper discount move
    quantity in the same direction", robust to any monotone rescale
    and with an exact tie correction (τ-b) for the heavily-tied
    discount grid.

    Exactness: both columns live on TINY grids (discount: 11 ticks,
    quantity: 50 integers), so the O(n²) pair sum collapses exactly
    onto the ≤550-cell contingency rollup: C and D are integer sums
    of n_a·n_b over cell pairs with x_a<x_b, tie terms Σt(t−1)/2 ride
    the marginals — ALL integers until the final τ-b expression,
    which both engines evaluate over identical exact-in-double
    integer terms (n(n−1) ≤ 3.6e11 at sf0.1, far under 2⁵³).

    Plan: one fact-sized shuffle builds the cell rollup; the pair
    join is grid²-bounded (≤550² candidate pairs, INVARIANT in data
    volume — the theil_sen days² posture) and the marginal/tie
    aggregates reuse the same 550-row frame; three 1-row frames
    cross-combine (scalar-broadcast idiom)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        cents("l_discount").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    cells = (
        li.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n")).localCheckpoint()
    )
    a, b = cells.alias("a"), cells.alias("b")
    prod = (F.col("a.n") * F.col("b.n")).cast("long")
    cd = a.join(b, F.col("a.x") < F.col("b.x")).agg(
        F.coalesce(
            F.sum(F.when(F.col("a.y") < F.col("b.y"), prod)), F.lit(0)
        ).alias("concordant"),
        F.coalesce(
            F.sum(F.when(F.col("a.y") > F.col("b.y"), prod)), F.lit(0)
        ).alias("discordant"),
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("n").alias("t"))
        .agg(
            F.sum("t").alias("n"),
            F.sum(F.expr("t * (t - 1) div 2")).alias("n1"),
        )
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("n").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) div 2")).alias("n2"))
    )
    n = F.col("n").cast("double")
    half_pairs = n * (n - 1) / 2
    return (
        cd.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            "n",
            "concordant",
            "discordant",
            F.round(
                (F.col("concordant") - F.col("discordant")).cast("double")
                / F.sqrt(
                    (half_pairs - F.col("n1"))
                    * (half_pairs - F.col("n2"))
                ),
                6,
            ).alias("tau_b"),
        )
    )


ORACLE_KENDALL_TAU = """
WITH li AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
), cells AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n FROM li GROUP BY x, y
), cd AS (
  SELECT
    CAST(COALESCE(SUM(CASE WHEN a.y < b.y THEN a.n * b.n END), 0) AS BIGINT)
      AS concordant,
    CAST(COALESCE(SUM(CASE WHEN a.y > b.y THEN a.n * b.n END), 0) AS BIGINT)
      AS discordant
  FROM cells a JOIN cells b ON a.x < b.x
), tx AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n1
  FROM (SELECT SUM(n) AS t FROM cells GROUP BY x)
), ty AS (
  SELECT CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n2
  FROM (SELECT SUM(n) AS t FROM cells GROUP BY y)
)
SELECT n, concordant, discordant,
       ROUND(CAST(concordant - discordant AS DOUBLE)
             / sqrt((CAST(n AS DOUBLE) * (n - 1) / 2 - n1)
                    * (CAST(n AS DOUBLE) * (n - 1) / 2 - n2)),
             6) AS tau_b
FROM cd, tx, ty
"""


# ---------------------------------------------------------------------------
# Quantile treatment effect — the decile uplift profile
# ---------------------------------------------------------------------------

def quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile-by-decile quantile difference between the two
    order-priority cohorts — the uplift PROFILE that a mean
    difference (or even Mann-Whitney) flattens: "treatment lifts the
    median but caps the top decile" is invisible to scalar tests.
    Per decile k ∈ 1..9: the type-1 (discrete) k/10-quantile of each
    cohort and their difference, in whole dollars.

    Type-1 quantiles keep everything integer-exact: q_k = min value
    whose cumulative count reaches ceil(k·n/10) — no interpolation,
    no floats anywhere. The grid/cross shape: both cohort ECDFs ride
    one dollar-grid rollup (the KS posture); the 9-row decile frame
    cross-joins onto the grid (bounded: 9 × |grid|) and collapses
    back to 9 rows via min-over-qualifying."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin(KS_GROUP_A, KS_GROUP_B))
        .select(
            flag(F.col("o_orderpriority") == KS_GROUP_A).alias("is_a"),
            (cents("o_totalprice") / 100).cast("long").alias("v"),
        )
    )
    counts = o.groupBy("v").agg(
        F.sum("is_a").alias("ca"),
        F.sum(1 - F.col("is_a")).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    whole = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    grid = counts.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(whole).alias("n_a"),
        F.sum("cb").over(whole).alias("n_b"),
    )
    deciles = spark.range(1, 10).select(F.col("id").alias("k"))
    j = grid.crossJoin(F.broadcast(deciles))
    # ceil(k*n/10) without floats: (k*n + 9) div 10
    t_a = F.expr("(k * n_a + 9) div 10")
    t_b = F.expr("(k * n_b + 9) div 10")
    return (
        j.groupBy("k")
        .agg(
            F.min(F.when(F.col("cum_a") >= t_a, F.col("v"))).alias("q_a"),
            F.min(F.when(F.col("cum_b") >= t_b, F.col("v"))).alias("q_b"),
        )
        .select(
            F.col("k").alias("decile"),
            "q_a",
            "q_b",
            (F.col("q_a") - F.col("q_b")).alias("uplift_dollars"),
        )
        .orderBy("decile")
    )


CUPED_PRE_YEAR = 1996
CUPED_EXP_YEAR = 1997


def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout — the industry-standard
    pre-experiment covariate adjustment (Deng et al., WSDM'13):
    Y_adj = Y − θ·(X − X̄) with θ = cov(X,Y)/var(X) fitted on the
    POOLED units, where X is each customer's pre-period
    ({CUPED_PRE_YEAR}) spend and Y the experiment-period
    ({CUPED_EXP_YEAR}) spend, arms assigned by custkey parity.
    Output: per arm, the raw and adjusted mean plus the shared θ and
    the variance-reduction factor ρ² the adjustment buys.

    Exactness: one groupBy(custkey) builds integer-dollar (X, Y)
    pairs; arm-level Σx, Σy, Σxy, Σx², Σy² are exact BIGINT sums
    (dollars bound the products within int64 far past sf100); θ, ρ²
    and the adjusted means are then pure double arithmetic on those
    exact integers — identical expression order in the oracle, so
    IEEE rounding matches bit for bit. Scale: the only corpus-scale
    exchange is the per-customer groupBy; everything after is a
    2-row frame plus a 1-row broadcast (the allreduce shape)."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate").isin(CUPED_PRE_YEAR, CUPED_EXP_YEAR))
        .select(
            "o_custkey",
            F.year("o_orderdate").alias("yr"),
            (cents("o_totalprice") / 100).cast("long").alias("v"),
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(F.col("yr") == CUPED_PRE_YEAR, F.col("v")).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("yr") == CUPED_EXP_YEAR, F.col("v")).otherwise(0)
            ).alias("y"),
        )
        .select(
            F.pmod(F.col("o_custkey"), F.lit(2)).cast("int").alias("arm"),
            "x",
            "y",
        )
    )
    arm_stats = per_cust.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    pooled = arm_stats.agg(
        F.sum("n").alias("nt"),
        F.sum("sx").alias("sxt"),
        F.sum("sy").alias("syt"),
        F.sum("sxy").alias("sxyt"),
        F.sum("sxx").alias("sxxt"),
        F.sum("syy").alias("syyt"),
    )
    nd = F.col("nt").cast("double")
    cov_num = nd * F.col("sxyt") - F.col("sxt").cast("double") * F.col("syt")
    var_x = nd * F.col("sxxt") - F.col("sxt").cast("double") * F.col("sxt")
    var_y = nd * F.col("syyt") - F.col("syt").cast("double") * F.col("syt")
    return (
        arm_stats.crossJoin(F.broadcast(pooled))
        .select(
            "arm",
            F.col("n").alias("n_units"),
            F.round(F.col("sy").cast("double") / F.col("n"), 6).alias("mean_y"),
            F.round(
                F.col("sy").cast("double") / F.col("n")
                - (cov_num / var_x)
                * (
                    F.col("sx").cast("double") / F.col("n")
                    - F.col("sxt").cast("double") / F.col("nt")
                ),
                6,
            ).alias("mean_y_adj"),
            F.round(cov_num / var_x, 6).alias("theta"),
            F.round(cov_num * cov_num / (var_x * var_y), 6).alias(
                "var_reduction"
            ),
        )
        .orderBy("arm")
    )


ORACLE_CUPED = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN year(o_orderdate) = {CUPED_PRE_YEAR}
                  THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN year(o_orderdate) = {CUPED_EXP_YEAR}
                  THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100
                  ELSE 0 END) AS BIGINT) AS y
  FROM orders
  WHERE year(o_orderdate) IN ({CUPED_PRE_YEAR}, {CUPED_EXP_YEAR})
  GROUP BY o_custkey
), armed AS (
  SELECT CAST(o_custkey % 2 AS INT) AS arm, x, y FROM per_cust
), arm_stats AS (
  SELECT arm, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM armed GROUP BY arm
), pooled AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt,
         CAST(SUM(sx) AS BIGINT) AS sxt, CAST(SUM(sy) AS BIGINT) AS syt,
         CAST(SUM(sxy) AS BIGINT) AS sxyt, CAST(SUM(sxx) AS BIGINT) AS sxxt,
         CAST(SUM(syy) AS BIGINT) AS syyt
  FROM arm_stats
)
SELECT arm, n AS n_units,
       ROUND(CAST(sy AS DOUBLE) / n, 6) AS mean_y,
       ROUND(CAST(sy AS DOUBLE) / n
             - ((CAST(nt AS DOUBLE) * sxyt - CAST(sxt AS DOUBLE) * syt)
                / (CAST(nt AS DOUBLE) * sxxt - CAST(sxt AS DOUBLE) * sxt))
               * (CAST(sx AS DOUBLE) / n - CAST(sxt AS DOUBLE) / nt), 6)
         AS mean_y_adj,
       ROUND((CAST(nt AS DOUBLE) * sxyt - CAST(sxt AS DOUBLE) * syt)
             / (CAST(nt AS DOUBLE) * sxxt - CAST(sxt AS DOUBLE) * sxt), 6)
         AS theta,
       ROUND((CAST(nt AS DOUBLE) * sxyt - CAST(sxt AS DOUBLE) * syt)
             * (CAST(nt AS DOUBLE) * sxyt - CAST(sxt AS DOUBLE) * syt)
             / ((CAST(nt AS DOUBLE) * sxxt - CAST(sxt AS DOUBLE) * sxt)
                * (CAST(nt AS DOUBLE) * syyt - CAST(syt AS DOUBLE) * syt)), 6)
         AS var_reduction
FROM arm_stats CROSS JOIN pooled
ORDER BY arm
"""


ORACLE_QTE = f"""
WITH o AS (
  SELECT CASE WHEN o_orderpriority = '{KS_GROUP_A}' THEN 1 ELSE 0 END AS is_a,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS v
  FROM orders
  WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
), counts AS (
  SELECT v, SUM(is_a) AS ca, SUM(1 - is_a) AS cb FROM o GROUP BY v
), grid AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b,
         SUM(ca) OVER () AS n_a,
         SUM(cb) OVER () AS n_b
  FROM counts
)
SELECT k AS decile,
       MIN(CASE WHEN cum_a >= (k * n_a + 9) // 10 THEN v END) AS q_a,
       MIN(CASE WHEN cum_b >= (k * n_b + 9) // 10 THEN v END) AS q_b,
       MIN(CASE WHEN cum_a >= (k * n_a + 9) // 10 THEN v END)
         - MIN(CASE WHEN cum_b >= (k * n_b + 9) // 10 THEN v END)
         AS uplift_dollars
FROM grid CROSS JOIN (SELECT unnest(range(1, 10)) AS k)
GROUP BY k
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# SAX-style motif discovery over the daily revenue series
# ---------------------------------------------------------------------------

def sax_revenue_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbolic time-series motif discovery (SAX, Lin et al. — with
    empirical-QUARTILE breakpoints instead of Gaussian ones, which
    keeps every step integer-exact): discretize daily revenue into
    symbols a<b<c<d by the series' own quartiles, slide a 3-day
    window, count each 3-symbol word. Top-10 motifs = the dominant
    local shapes ("dip-recover", "ramp") that drive alerting and
    similarity search over 100 TB of series far too long to compare
    point-wise.

    Exactness: daily revenue is exact cents; quartile breakpoints
    are type-1 discrete quantiles (min value reaching ceil(k·n/4) —
    integers end-to-end); the symbol is two/three integer
    comparisons; motif words concat under one day-ordered window.
    Plan: calendar-sized day rollup → quartiles via the decile
    cross shape (bounded) → ONE unpartitioned lag window over the
    ~2500-row day frame → word counts."""
    day_rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("day"))
        .agg(F.sum(cents("o_totalprice")).alias("c"))
    )
    w = Window.orderBy("day")
    whole = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = day_rev.select(
        "day",
        "c",
        F.row_number().over(Window.orderBy("c", "day")).alias("r"),
        F.count(F.lit(1)).over(whole).alias("n"),
    )
    qs = ranked.groupBy().agg(
        *[
            F.min(
                F.when(
                    F.col("r") >= F.expr(f"({k} * n + 3) div 4"), F.col("c")
                )
            ).alias(f"q{k}")
            for k in (1, 2, 3)
        ]
    )
    sym = (
        day_rev.crossJoin(F.broadcast(qs))
        .select(
            "day",
            (
                (F.col("c") > F.col("q1")).cast("int")
                + (F.col("c") > F.col("q2")).cast("int")
                + (F.col("c") > F.col("q3")).cast("int")
            ).alias("s"),
        )
        .select(
            "day",
            F.element_at(
                F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("d")),
                F.col("s") + 1,
            ).alias("sym"),
        )
    )
    words = sym.select(
        F.concat(
            F.lag("sym", 2).over(w), F.lag("sym", 1).over(w), F.col("sym")
        ).alias("motif")
    ).filter(F.col("motif").isNotNull())
    return (
        words.groupBy("motif")
        .agg(F.count(F.lit(1)).alias("n_windows"))
        .orderBy(F.desc("n_windows"), F.asc("motif"))
        .limit(10)
    )


ORACLE_SAX_MOTIFS = """
WITH day_rev AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY day
), ranked AS (
  SELECT day, c,
         ROW_NUMBER() OVER (ORDER BY c, day) AS r,
         COUNT(*) OVER () AS n
  FROM day_rev
), qs AS (
  SELECT MIN(CASE WHEN r >= (1 * n + 3) // 4 THEN c END) AS q1,
         MIN(CASE WHEN r >= (2 * n + 3) // 4 THEN c END) AS q2,
         MIN(CASE WHEN r >= (3 * n + 3) // 4 THEN c END) AS q3
  FROM ranked
), sym AS (
  SELECT day,
         ['a', 'b', 'c', 'd'][
           CAST(c > q1 AS INT) + CAST(c > q2 AS INT) + CAST(c > q3 AS INT) + 1
         ] AS sym
  FROM day_rev CROSS JOIN qs
), words AS (
  SELECT LAG(sym, 2) OVER (ORDER BY day)
         || LAG(sym, 1) OVER (ORDER BY day)
         || sym AS motif
  FROM sym
)
SELECT motif, COUNT(*) AS n_windows
FROM words WHERE motif IS NOT NULL
GROUP BY motif
ORDER BY n_windows DESC, motif ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Conformal forecast intervals — distribution-free calibration
# ---------------------------------------------------------------------------

CONFORMAL_ALPHA_PCT = 10  # 90% target coverage


def conformal_forecast_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for the seasonal-naive
    forecast (``forecast_backtest_naive``'s model): calibrate the
    interval half-width q̂ on the FIRST half of the series as the
    ceil((n+1)(1−α))-th smallest absolute residual, then report the
    realized coverage of ŷ ± q̂ on the held-out second half — the
    distribution-free guarantee (Vovk; Angelopoulos & Bates) that
    ships with any production forecaster regardless of how naive
    the point model is.

    Exactness: residuals are integer dollars; the calibration rank
    is the type-1 pick against an all-integer ceil'd threshold
    ((n+1)·(100−α) + 99) div 100; realized coverage is one count
    ratio. Plan: the calendar-sized day rollup under one lag
    window; split by day rank (deterministic, no randomness);
    the 1-row q̂ frame broadcasts onto the eval half."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint) div 100")
            ).alias("y")
        )
    )
    w = Window.orderBy("day")
    whole = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    resid = (
        daily.withColumn("yhat", F.lag("y", 7).over(w))
        .filter(F.col("yhat").isNotNull())
        .select(
            "day",
            F.abs(F.col("y") - F.col("yhat")).alias("r"),
            F.row_number().over(w).alias("t"),
            F.count(F.lit(1)).over(whole).alias("n"),
        )
    )
    cal = resid.filter(F.col("t") * 2 <= F.col("n"))
    ev = resid.filter(F.col("t") * 2 > F.col("n"))
    wr = Window.orderBy("r", "day")
    cal_ranked = cal.select(
        "r",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(whole).alias("n_cal"),
    )
    qhat = cal_ranked.groupBy().agg(
        F.max("n_cal").alias("n_cal"),
        F.min(
            F.when(
                F.col("rk")
                >= F.expr(
                    f"((n_cal + 1) * (100 - {CONFORMAL_ALPHA_PCT}) + 99) div 100"
                ),
                F.col("r"),
            )
        ).alias("q_hat"),
    )
    return (
        ev.crossJoin(F.broadcast(qhat))
        .groupBy("n_cal", "q_hat")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(flag(F.col("r") <= F.col("q_hat"))).alias("n_covered"),
        )
        .select(
            "n_cal",
            F.col("q_hat").alias("q_hat_dollars"),
            "n_eval",
            F.col("n_covered").cast("long").alias("n_covered"),
            F.round(
                F.col("n_covered").cast("double")
                / F.col("n_eval").cast("double"),
                6,
            ).alias("realized_coverage"),
        )
    )


ORACLE_CONFORMAL = f"""
WITH daily AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100)
              AS BIGINT) AS y
  FROM orders GROUP BY day
), resid AS (
  SELECT day, ABS(y - LAG(y, 7) OVER (ORDER BY day)) AS r,
         ROW_NUMBER() OVER (ORDER BY day) - 7 AS t,
         COUNT(*) OVER () - 7 AS n
  FROM daily
  QUALIFY LAG(y, 7) OVER (ORDER BY day) IS NOT NULL
), cal_ranked AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r, day) AS rk,
         COUNT(*) OVER () AS n_cal
  FROM resid WHERE t * 2 <= n
), qhat AS (
  SELECT CAST(MAX(n_cal) AS BIGINT) AS n_cal,
         MIN(CASE WHEN rk >= ((n_cal + 1) * (100 - {CONFORMAL_ALPHA_PCT})
                              + 99) // 100
                  THEN r END) AS q_hat
  FROM cal_ranked
)
SELECT n_cal, q_hat AS q_hat_dollars,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN r <= q_hat THEN 1 ELSE 0 END) AS BIGINT)
         AS n_covered,
       ROUND(CAST(SUM(CASE WHEN r <= q_hat THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS realized_coverage
FROM resid CROSS JOIN qhat
WHERE t * 2 > n
GROUP BY n_cal, q_hat
"""


# ---------------------------------------------------------------------------
# Theil-Sen trend — the robust slope estimator
# ---------------------------------------------------------------------------

def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator of the daily-revenue trend: the MEDIAN of
    all pairwise slopes (c_j − c_i)/(d_j − d_i) — the robust
    complement to ``trend_slope_by_segment``'s OLS (one fat-finger
    day moves an OLS slope arbitrarily; Theil-Sen tolerates 29%
    contamination). Reports the median plus the interquartile slope
    band (p25/p75) and the pair count.

    Scale argument — why an O(n²) pair join is FINE here: n is the
    CALENDAR, not the data. The fact table rolls up to one row per
    day first (exact cents), so the pair space is days² (~2.9M at
    7 years), invariant in the data volume — at 100 TB it is the
    same 2.9M pairs. The day⨯day join is a bounded
    broadcast-nested-loop by construction (the
    ``test_no_cartesian_products_across_catalog`` exemption class).

    Exactness: every slope is ONE IEEE division of two exact BIGINTs
    — bit-identical in any engine — and the median/quartiles are
    type-1 discrete picks (ROW_NUMBER against ceil'd integer
    thresholds), so no interpolation ever mixes floats."""
    day_rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("d"))
        .agg(F.sum(cents("o_totalprice")).alias("c"))
    )
    a = day_rev.select(F.col("d").alias("d1"), F.col("c").alias("c1"))
    b = day_rev.select(F.col("d").alias("d2"), F.col("c").alias("c2"))
    slopes = (
        a.join(F.broadcast(b), F.col("d1") < F.col("d2"))
        .select(
            (
                (F.col("c2") - F.col("c1")).cast("double")
                / (F.col("d2") - F.col("d1")).cast("double")
            ).alias("s")
        )
    )
    w = Window.orderBy("s")
    whole = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = slopes.select(
        "s",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(whole).alias("n"),
    )
    pick = lambda k, q: F.min(  # noqa: E731 — type-1 quantile pick
        F.when(F.col("r") >= F.expr(f"({k} * n + {q - 1}) div {q}"), F.col("s"))
    )
    return ranked.groupBy().agg(
        F.max("n").alias("n_pairs"),
        F.round(pick(2, 4) + F.lit(0.0), 6).alias("slope_cents_per_day"),
        F.round(pick(1, 4) + F.lit(0.0), 6).alias("p25_slope"),
        F.round(pick(3, 4) + F.lit(0.0), 6).alias("p75_slope"),
    )


ORACLE_THEIL_SEN = """
WITH day_rev AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY d
), slopes AS (
  SELECT CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS s
  FROM day_rev a JOIN day_rev b ON a.d < b.d
), ranked AS (
  SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS r, COUNT(*) OVER () AS n
  FROM slopes
)
SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
       ROUND(MIN(CASE WHEN r >= (2 * n + 3) // 4 THEN s END) + 0.0, 6)
         AS slope_cents_per_day,
       ROUND(MIN(CASE WHEN r >= (1 * n + 3) // 4 THEN s END) + 0.0, 6)
         AS p25_slope,
       ROUND(MIN(CASE WHEN r >= (3 * n + 3) // 4 THEN s END) + 0.0, 6)
         AS p75_slope
FROM ranked
"""


# ---------------------------------------------------------------------------
# Welch t-test — unequal-variance two-sample mean comparison
# ---------------------------------------------------------------------------

def welch_ttest_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch unequal-variance t-test between the same two
    order-priority cohorts as ``ks_drift_orders`` — the parametric
    member of the drift family: where KS asks about the SHAPE and
    Mann-Whitney about stochastic dominance, Welch asks the plain
    "did the MEAN move", without the classical t-test's
    equal-variance assumption (wrong for heteroskedastic cohorts).

    Exactness discipline (the ``anova_weekday_revenue`` idiom):
    values quantized to whole kilodollars so each cohort reduces to
    an exact integer (n, Σv, Σv²) triple in ONE map-side-combined
    global aggregate — conditional sums over the ``is_a`` flag, so
    both cohorts ride the same pass and nothing shuffles but six
    bigints. The t statistic and the Welch-Satterthwaite df are the
    only doubles, evaluated once in oracle-identical textual order
    (s² products cast to double BEFORE multiplying: at 100 TB the
    integer square would overflow bigint; the double loses nothing
    below 2⁵³)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin(KS_GROUP_A, KS_GROUP_B))
        .select(
            flag(F.col("o_orderpriority") == KS_GROUP_A).alias("is_a"),
            F.expr(
                "cast(round(o_totalprice * 100) as bigint) div 100000"
            ).alias("v"),
        )
    )
    agg = o.agg(
        F.sum("is_a").alias("n_a"),
        F.sum(F.col("is_a") * F.col("v")).alias("s_a"),
        F.sum(F.col("is_a") * F.col("v") * F.col("v")).alias("ss_a"),
        F.sum(1 - F.col("is_a")).alias("n_b"),
        F.sum((1 - F.col("is_a")) * F.col("v")).alias("s_b"),
        F.sum((1 - F.col("is_a")) * F.col("v") * F.col("v")).alias("ss_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.col("s_a").cast("double") / na
    mb = F.col("s_b").cast("double") / nb
    va = (
        F.col("ss_a").cast("double")
        - F.col("s_a").cast("double") * F.col("s_a").cast("double") / na
    ) / (na - 1.0)
    vb = (
        F.col("ss_b").cast("double")
        - F.col("s_b").cast("double") * F.col("s_b").cast("double") / nb
    ) / (nb - 1.0)
    sea, seb = va / na, vb / nb
    se2 = sea + seb
    return agg.select(
        "n_a",
        "n_b",
        F.round(ma, 4).alias("mean_a"),
        F.round(mb, 4).alias("mean_b"),
        F.round((ma - mb) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            se2 * se2
            / (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0)),
            2,
        ).alias("df_welch"),
    )


ORACLE_WELCH_TTEST = f"""
WITH o AS (
  SELECT CASE WHEN o_orderpriority = '{KS_GROUP_A}' THEN 1 ELSE 0 END AS is_a,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000 AS v
  FROM orders
  WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
), agg AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
         CAST(SUM(is_a * v) AS BIGINT) AS s_a,
         CAST(SUM(is_a * v * v) AS BIGINT) AS ss_a,
         CAST(SUM(1 - is_a) AS BIGINT) AS n_b,
         CAST(SUM((1 - is_a) * v) AS BIGINT) AS s_b,
         CAST(SUM((1 - is_a) * v * v) AS BIGINT) AS ss_b
  FROM o
), d AS (
  SELECT n_a, n_b,
         CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
         (CAST(ss_a AS DOUBLE)
          - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
            / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)
           / CAST(n_a AS DOUBLE) AS sea,
         (CAST(ss_b AS DOUBLE)
          - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
            / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)
           / CAST(n_b AS DOUBLE) AS seb
  FROM agg
)
SELECT n_a, n_b,
       ROUND(ma, 4) AS mean_a,
       ROUND(mb, 4) AS mean_b,
       ROUND((ma - mb) / sqrt(sea + seb), 6) AS t_stat,
       ROUND((sea + seb) * (sea + seb)
             / (sea * sea / (CAST(n_a AS DOUBLE) - 1.0)
                + seb * seb / (CAST(n_b AS DOUBLE) - 1.0)), 2) AS df_welch
FROM d
"""


# ---------------------------------------------------------------------------
# Mutual information — categorical×categorical association strength
# ---------------------------------------------------------------------------

def mutual_info_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between order priority and order status —
    the information-theoretic strength of the association
    ``chi_square_assoc`` only tests the existence of, plus the
    normalized variant (NMI = I/√(H_X·H_Y)) that makes the number
    comparable across tables — the standard feature-redundancy
    screen before training on categorical columns.

    Exactness (the ``token_entropy_kl`` micro-nats idiom): the fact
    stream collapses to the |X|×|Y| contingency table in one
    map-side-combined groupBy; every ln() is rounded to integer
    micro-nats per CELL and weighted by integer counts, so all
    distributed sums are bigint and partial-agg order cannot perturb
    a bit. The three unpartitioned windows run over the ≤25-row
    cell frame (the documented KS posture), never the fact."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("x"),
        F.col("o_orderstatus").alias("y"),
    )
    cells = o.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    whole = Window.partitionBy(F.lit(1))
    g = cells.select(
        "c",
        F.sum("c").over(wx).alias("cx"),
        F.sum("c").over(wy).alias("cy"),
        F.sum("c").over(whole).alias("n"),
    )
    ln = lambda e: F.round(F.log(e) * 1e6, 0).cast("long")  # noqa: E731
    mi_micro = F.sum(
        F.col("c")
        * ln(
            F.col("c").cast("double") * F.col("n").cast("double")
            / (F.col("cx").cast("double") * F.col("cy").cast("double"))
        )
    )
    agg = g.agg(
        F.max("n").alias("n"),
        mi_micro.alias("mi_micro_sum"),
    )
    # marginal entropies from rollups of the CELL frame (≤25 rows) —
    # the fact table is scanned exactly once; same micro-nat
    # discipline per marginal row
    hx = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("cx"))
        .select("cx", F.sum("cx").over(whole).alias("nx"))
        .select(
            F.sum(
                F.col("cx")
                * ln(F.col("cx").cast("double") / F.col("nx").cast("double"))
            ).alias("hx_micro_sum")
        )
    )
    hy = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("cy"))
        .select("cy", F.sum("cy").over(whole).alias("ny"))
        .select(
            F.sum(
                F.col("cy")
                * ln(F.col("cy").cast("double") / F.col("ny").cast("double"))
            ).alias("hy_micro_sum")
        )
    )
    j = agg.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    nd = F.col("n").cast("double")
    mi = F.col("mi_micro_sum").cast("double") / (nd * 1e6)
    hxv = -F.col("hx_micro_sum").cast("double") / (nd * 1e6)
    hyv = -F.col("hy_micro_sum").cast("double") / (nd * 1e6)
    return j.select(
        F.col("n").alias("n_orders"),
        F.round(mi, 6).alias("mi_nats"),
        F.round(hxv, 6).alias("h_priority"),
        F.round(hyv, 6).alias("h_status"),
        F.round(mi / F.sqrt(hxv * hyv), 6).alias("nmi"),
    )


ORACLE_MUTUAL_INFO = """
WITH o AS (
  SELECT o_orderpriority AS x, o_orderstatus AS y FROM orders
), cells AS (
  SELECT x, y, COUNT(*) AS c FROM o GROUP BY x, y
), g AS (
  SELECT c,
         SUM(c) OVER (PARTITION BY x) AS cx,
         SUM(c) OVER (PARTITION BY y) AS cy,
         SUM(c) OVER () AS n
  FROM cells
), agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(c * CAST(ROUND(ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
                    / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))) * 1e6, 0)
                  AS BIGINT)) AS BIGINT) AS mi_micro_sum
  FROM g
), hx AS (
  SELECT CAST(SUM(cx * CAST(ROUND(ln(CAST(cx AS DOUBLE)
                    / CAST(nx AS DOUBLE)) * 1e6, 0)
                  AS BIGINT)) AS BIGINT) AS hx_micro_sum
  FROM (SELECT cx, SUM(cx) OVER () AS nx
        FROM (SELECT x, SUM(c) AS cx FROM cells GROUP BY x))
), hy AS (
  SELECT CAST(SUM(cy * CAST(ROUND(ln(CAST(cy AS DOUBLE)
                    / CAST(ny AS DOUBLE)) * 1e6, 0)
                  AS BIGINT)) AS BIGINT) AS hy_micro_sum
  FROM (SELECT cy, SUM(cy) OVER () AS ny
        FROM (SELECT y, SUM(c) AS cy FROM cells GROUP BY y))
)
SELECT n AS n_orders,
       ROUND(CAST(mi_micro_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6)
         AS mi_nats,
       ROUND(-CAST(hx_micro_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6)
         AS h_priority,
       ROUND(-CAST(hy_micro_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6)
         AS h_status,
       ROUND((CAST(mi_micro_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6))
             / sqrt((-CAST(hx_micro_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6))
                    * (-CAST(hy_micro_sum AS DOUBLE)
                       / (CAST(n AS DOUBLE) * 1e6))), 6) AS nmi
FROM agg CROSS JOIN hx CROSS JOIN hy
"""


# ---------------------------------------------------------------------------
# Difference-in-differences — the two-period causal-effect workhorse
# ---------------------------------------------------------------------------

DID_CUTOVER = "1998-05-01"  # midpoint of the testdata date domain


def diff_in_diff_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the order-value effect:
    treated cohort = urgent-priority orders, control = low-priority,
    pre/post split at the date-domain midpoint. The 2×2-cell
    workhorse behind every "did the change move the metric beyond
    its trend" question; the cross-sectional siblings are
    ``cuped_adjusted_ab`` (variance reduction) and
    ``stratified_ate`` (confounder adjustment) — DiD is the one that
    nets out a shared time trend.

    Exactness (the welch/anova discipline): kilodollar quantization,
    then ONE global map-side-combined aggregate of twelve
    conditional integer sums — (n, Σv, Σv²) for each of the four
    cells — so nothing shuffles but twelve bigints at any scale.
    The estimate, its pooled standard error (Σ s²ₕ/nₕ over the four
    cells), and the t statistic are composed once from the twelve
    scalars in oracle-identical textual order."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin(KS_GROUP_A, KS_GROUP_B))
        .select(
            flag(F.col("o_orderpriority") == KS_GROUP_A).alias("t"),
            flag(
                F.col("o_orderdate")
                >= F.lit(DID_CUTOVER).cast("timestamp_ntz")
            ).alias("p"),
            F.expr(
                "cast(round(o_totalprice * 100) as bigint) div 100000"
            ).alias("v"),
        )
    )

    def cell(tv: int, pv: int, tag: str):
        m = ((F.col("t") == tv) & (F.col("p") == pv)).cast("long")
        return [
            F.sum(m).alias(f"n_{tag}"),
            F.sum(m * F.col("v")).alias(f"s_{tag}"),
            F.sum(m * F.col("v") * F.col("v")).alias(f"ss_{tag}"),
        ]

    agg = o.agg(
        *cell(1, 0, "t0"), *cell(1, 1, "t1"), *cell(0, 0, "c0"),
        *cell(0, 1, "c1"),
    )

    def mean(tag: str):
        return F.col(f"s_{tag}").cast("double") / F.col(f"n_{tag}").cast(
            "double"
        )

    def var_over_n(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"s_{tag}").cast("double")
        ss = F.col(f"ss_{tag}").cast("double")
        return (ss - s * s / n) / (n - 1.0) / n

    did = (mean("t1") - mean("t0")) - (mean("c1") - mean("c0"))
    se = F.sqrt(
        var_over_n("t1") + var_over_n("t0") + var_over_n("c1")
        + var_over_n("c0")
    )
    return agg.select(
        (F.col("n_t0") + F.col("n_t1")).alias("n_treated"),
        (F.col("n_c0") + F.col("n_c1")).alias("n_control"),
        F.round(mean("t1") - mean("t0"), 4).alias("delta_treated"),
        F.round(mean("c1") - mean("c0"), 4).alias("delta_control"),
        F.round(did, 4).alias("did_estimate"),
        F.round(se, 4).alias("std_error"),
        F.round(did / se, 6).alias("t_stat"),
    )


def _did_cell_sql(t: int, p: int, tag: str) -> str:
    m = f"CASE WHEN t = {t} AND p = {p} THEN 1 ELSE 0 END"
    return (
        f"CAST(SUM({m}) AS BIGINT) AS n_{tag},"
        f" CAST(SUM({m} * v) AS BIGINT) AS s_{tag},"
        f" CAST(SUM({m} * v * v) AS BIGINT) AS ss_{tag}"
    )


ORACLE_DIFF_IN_DIFF = f"""
WITH o AS (
  SELECT CASE WHEN o_orderpriority = '{KS_GROUP_A}' THEN 1 ELSE 0 END AS t,
         CASE WHEN o_orderdate >= TIMESTAMP '{DID_CUTOVER}'
              THEN 1 ELSE 0 END AS p,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000 AS v
  FROM orders
  WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
), agg AS (
  SELECT {_did_cell_sql(1, 0, "t0")}, {_did_cell_sql(1, 1, "t1")},
         {_did_cell_sql(0, 0, "c0")}, {_did_cell_sql(0, 1, "c1")}
  FROM o
), d AS (
  SELECT n_t0 + n_t1 AS n_treated, n_c0 + n_c1 AS n_control,
         CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE)
           - CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE) AS dt,
         CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE)
           - CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE) AS dc,
         (CAST(ss_t1 AS DOUBLE) - CAST(s_t1 AS DOUBLE) * CAST(s_t1 AS DOUBLE)
            / CAST(n_t1 AS DOUBLE)) / (CAST(n_t1 AS DOUBLE) - 1.0)
            / CAST(n_t1 AS DOUBLE)
         + (CAST(ss_t0 AS DOUBLE) - CAST(s_t0 AS DOUBLE) * CAST(s_t0 AS DOUBLE)
            / CAST(n_t0 AS DOUBLE)) / (CAST(n_t0 AS DOUBLE) - 1.0)
            / CAST(n_t0 AS DOUBLE)
         + (CAST(ss_c1 AS DOUBLE) - CAST(s_c1 AS DOUBLE) * CAST(s_c1 AS DOUBLE)
            / CAST(n_c1 AS DOUBLE)) / (CAST(n_c1 AS DOUBLE) - 1.0)
            / CAST(n_c1 AS DOUBLE)
         + (CAST(ss_c0 AS DOUBLE) - CAST(s_c0 AS DOUBLE) * CAST(s_c0 AS DOUBLE)
            / CAST(n_c0 AS DOUBLE)) / (CAST(n_c0 AS DOUBLE) - 1.0)
            / CAST(n_c0 AS DOUBLE) AS var_sum
  FROM agg
)
SELECT n_treated, n_control,
       ROUND(dt, 4) AS delta_treated,
       ROUND(dc, 4) AS delta_control,
       ROUND(dt - dc, 4) AS did_estimate,
       ROUND(sqrt(var_sum), 4) AS std_error,
       ROUND((dt - dc) / sqrt(var_sum), 6) AS t_stat
FROM d
"""


# ---------------------------------------------------------------------------
# Hill tail-index estimator — how heavy is the heavy tail?
# ---------------------------------------------------------------------------

HILL_K = 500


def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index over order values —
    the number that says HOW heavy the heavy tail is (α < 2: infinite
    variance, mean-based monitors lie; α < 1: infinite mean), the
    quantitative sequel to ``zipf_fit_tokens``' rank-slope and the
    planning input for length caps and winsorization levels:
    H = (1/k)·Σᵢ₌₁..k ln(x⁽ⁱ⁾/x⁽ᵏ⁺¹⁾) over the top-k order
    statistics, α̂ = 1/H.

    Shape: the only global operation is a TakeOrderedAndProject of
    k+1 rows (per-partition top-(k+1), then a driver-sized merge —
    never a full sort); ranking and the threshold both live on the
    (k+1)-row frame. Ties at the boundary are value-ties, and the
    estimator reads only the VALUE multiset, so any tiebreak yields
    the same answer in both engines. Each log term rounds to integer
    micro-nats (the lm_surprisal idiom) so the k-term sum is
    order-free; two final divisions mirror the oracle."""
    top = (
        load_table(spark, sf_dir, "orders")
        .select(cents("o_totalprice").alias("v"))
        .orderBy(F.desc("v"))
        .limit(HILL_K + 1)
    )
    w = Window.orderBy(F.desc("v"))
    ranked = top.select("v", F.row_number().over(w).alias("rn"))
    thr = ranked.filter(F.col("rn") == HILL_K + 1).select(
        F.col("v").alias("xk1")
    )
    terms = ranked.filter(F.col("rn") <= HILL_K).crossJoin(F.broadcast(thr))
    agg = terms.agg(
        F.sum(
            F.round(
                F.log(F.col("v").cast("double") / F.col("xk1").cast("double"))
                * 1e6,
                0,
            ).cast("long")
        ).alias("hill_micro"),
        F.max("xk1").alias("xk1"),
    )
    h = F.col("hill_micro").cast("double") / (HILL_K * 1e6)
    return agg.select(
        F.lit(HILL_K).cast("long").alias("k"),
        F.col("xk1").alias("threshold_cents"),
        F.round(h, 6).alias("hill_h"),
        F.round(F.lit(1.0) / h, 6).alias("tail_alpha"),
    )


ORACLE_HILL_TAIL = f"""
WITH ranked AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY ROUND(o_totalprice * 100) DESC) AS rn
  FROM orders
), thr AS (
  SELECT v AS xk1 FROM ranked WHERE rn = {HILL_K + 1}
), agg AS (
  SELECT CAST(SUM(CAST(ROUND(ln(CAST(v AS DOUBLE) / CAST(xk1 AS DOUBLE))
                             * 1e6, 0) AS BIGINT)) AS BIGINT) AS hill_micro,
         CAST(MAX(xk1) AS BIGINT) AS xk1
  FROM ranked CROSS JOIN thr
  WHERE rn <= {HILL_K}
)
SELECT CAST({HILL_K} AS BIGINT) AS k,
       xk1 AS threshold_cents,
       ROUND(CAST(hill_micro AS DOUBLE) / ({HILL_K} * 1e6), 6) AS hill_h,
       ROUND(1.0 / (CAST(hill_micro AS DOUBLE) / ({HILL_K} * 1e6)), 6)
         AS tail_alpha
FROM agg
"""


# ---------------------------------------------------------------------------
# Autocorrelation-function profile — the first 7 lags at once
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 7


def revenue_acf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF of daily revenue at lags 1..{ACF_MAX_LAG} in one pass —
    the seasonality fingerprint behind ``revenue_autocorr_lag1``:
    a lag-7 spike says weekly cycle (cross-check:
    ``stl_weekly_profile``), slow decay says trend
    (``theil_sen_trend``), and the profile decides differencing
    before any forecast backtest.

    Shape: the fact stream collapses to the CALENDAR-bounded day
    frame in one rollup; the seven lag columns come from seven
    ``lag()`` reads over ONE unpartitioned window ordered by day
    (bounded frame — the documented KS posture), so no per-lag
    rescans or self-joins. Exactness: each centered product rounds
    to integer micro-units before summing (order-free bigints;
    magnitude ≈ dollars²·10⁶·days, bigint-safe at any corpus scale
    because the frame is calendar-bounded); one division per lag."""
    day = (
        load_table(spark, sf_dir, "orders")
        .select(
            epoch_day("o_orderdate").alias("d"),
            (cents("o_totalprice") / 100).cast("long").alias("v"),
        )
        .groupBy("d")
        .agg(F.sum("v").alias("x"))
    )
    tot = day.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
    )
    w = Window.orderBy("d")
    lagged = day.crossJoin(F.broadcast(tot)).select(
        "x",
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias("m"),
        *[
            F.lag("x", k).over(w).alias(f"x{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    # whole-unit quantization: dollars^2-scale terms, so the ±0.5
    # per-term rounding is ~1e-14 relative while keeping the
    # calendar-length sum orders of magnitude inside bigint
    micro = lambda e: F.round(e, 0).cast("long")  # noqa: E731
    cx = F.col("x").cast("double") - F.col("m")
    agg = lagged.agg(
        F.sum(micro(cx * cx)).alias("den_micro"),
        *[
            F.sum(
                micro(cx * (F.col(f"x{k}").cast("double") - F.col("m")))
            ).alias(f"num_{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    cells = agg.select(
        *[
            F.round(
                F.col(f"num_{k}").cast("double")
                / F.col("den_micro").cast("double"),
                6,
            ).alias(f"acf_{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ]
    )
    stack_args = ", ".join(
        f"{k}L, acf_{k}" for k in range(1, ACF_MAX_LAG + 1)
    )
    return cells.selectExpr(
        f"stack({ACF_MAX_LAG}, {stack_args}) AS (lag, acf)"
    ).orderBy("lag")


_ACF_LAGS = range(1, ACF_MAX_LAG + 1)

ORACLE_REVENUE_ACF = (
    """
WITH day AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100)
              AS BIGINT) AS x
  FROM orders GROUP BY d
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
  FROM day
), lagged AS (
  SELECT x, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m, """
    + ", ".join(
        f"LAG(x, {k}) OVER (ORDER BY d) AS x{k}" for k in _ACF_LAGS
    )
    + """
  FROM day CROSS JOIN tot
), agg AS (
  SELECT CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) - m)
                             * (CAST(x AS DOUBLE) - m), 0)
                       AS BIGINT)) AS BIGINT) AS den_micro, """
    + ", ".join(
        f"CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) - m)"
        f" * (CAST(x{k} AS DOUBLE) - m), 0) AS BIGINT)) AS BIGINT)"
        f" AS num_{k}"
        for k in _ACF_LAGS
    )
    + """
  FROM lagged
)
"""
    + "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS lag,"
        f" ROUND(CAST(num_{k} AS DOUBLE) / CAST(den_micro AS DOUBLE), 6)"
        f" AS acf FROM agg"
        for k in _ACF_LAGS
    )
    + "\nORDER BY lag"
)


# ---------------------------------------------------------------------------
# Diebold-Mariano — which forecaster wins, statistically?
# ---------------------------------------------------------------------------

DM_CRIT_95 = 1.959964  # two-sided normal 95% critical value


def diebold_mariano_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold-Mariano comparison of the naive (yesterday) vs
    seasonal-naive (same weekday last week) forecasters on daily
    revenue — the inference layer ``forecast_backtest_naive`` stops
    short of: a lower backtest MAE can be luck; DM tests whether the
    absolute-error differential d_t = |e_naive| − |e_seasonal| has
    nonzero mean, so "switch to the seasonal model" becomes a
    significance call, not a point estimate.

    Exactness: the day series is integer dollars, both errors and
    d_t are exact BIGINTs, Σd and Σd² are BIGINT (|d| < 10⁶ dollars,
    calendar-bounded count — 2⁶² headroom at any corpus scale); the
    DM ratio is one double expression over three exact integers.
    Verdict vs the literal two-sided normal critical value.

    Plan: one fact rollup to the calendar day frame, two lag reads
    over ONE unpartitioned window on it (KS posture), one global
    agg — the ljung_box plan with two extra lag columns."""
    day = (
        load_table(spark, sf_dir, "orders")
        .select(
            epoch_day("o_orderdate").alias("d"),
            (cents("o_totalprice") / 100).cast("long").alias("v"),
        )
        .groupBy("d")
        .agg(F.sum("v").alias("x"))
    )
    w = Window.orderBy("d")
    lagged = day.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    ).filter(F.col("x7").isNotNull())
    dcol = F.abs(F.col("x") - F.col("x1")) - F.abs(F.col("x") - F.col("x7"))
    agg = lagged.agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(dcol).alias("sd"),
        F.sum(dcol * dcol).alias("qd"),
    )
    t_d = F.col("t").cast("double")
    mean = F.col("sd").cast("double") / t_d
    var = F.col("qd").cast("double") / t_d - mean * mean
    dm = mean / F.sqrt(var / t_d)
    return agg.select(
        "t",
        F.round(mean, 6).alias("mean_abs_err_gap"),
        F.round(dm, 6).alias("dm_stat"),
        F.when(dm > DM_CRIT_95, F.lit("seasonal_naive"))
        .when(dm < -DM_CRIT_95, F.lit("naive"))
        .otherwise(F.lit("no_significant_difference"))
        .alias("better_forecaster"),
    )


ORACLE_DIEBOLD_MARIANO = f"""
WITH day AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100)
              AS BIGINT) AS x
  FROM orders GROUP BY d
), lagged AS (
  SELECT x, LAG(x, 1) OVER (ORDER BY d) AS x1,
         LAG(x, 7) OVER (ORDER BY d) AS x7
  FROM day
), dd AS (
  SELECT ABS(x - x1) - ABS(x - x7) AS dv FROM lagged WHERE x7 IS NOT NULL
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(dv) AS BIGINT) AS sd,
         CAST(SUM(dv * dv) AS BIGINT) AS qd
  FROM dd
)
SELECT t,
       ROUND(CAST(sd AS DOUBLE) / CAST(t AS DOUBLE), 6) AS mean_abs_err_gap,
       ROUND((CAST(sd AS DOUBLE) / CAST(t AS DOUBLE))
             / sqrt((CAST(qd AS DOUBLE) / CAST(t AS DOUBLE)
                     - (CAST(sd AS DOUBLE) / CAST(t AS DOUBLE))
                       * (CAST(sd AS DOUBLE) / CAST(t AS DOUBLE)))
                    / CAST(t AS DOUBLE)), 6) AS dm_stat,
       CASE WHEN (CAST(sd AS DOUBLE) / CAST(t AS DOUBLE))
                 / sqrt((CAST(qd AS DOUBLE) / CAST(t AS DOUBLE)
                         - (CAST(sd AS DOUBLE) / CAST(t AS DOUBLE))
                           * (CAST(sd AS DOUBLE) / CAST(t AS DOUBLE)))
                        / CAST(t AS DOUBLE)) > {DM_CRIT_95}
              THEN 'seasonal_naive'
            WHEN (CAST(sd AS DOUBLE) / CAST(t AS DOUBLE))
                 / sqrt((CAST(qd AS DOUBLE) / CAST(t AS DOUBLE)
                         - (CAST(sd AS DOUBLE) / CAST(t AS DOUBLE))
                           * (CAST(sd AS DOUBLE) / CAST(t AS DOUBLE)))
                        / CAST(t AS DOUBLE)) < -{DM_CRIT_95}
              THEN 'naive'
            ELSE 'no_significant_difference' END AS better_forecaster
FROM agg
"""


# ---------------------------------------------------------------------------
# Brown-Forsythe test — variance homogeneity across k groups
# ---------------------------------------------------------------------------

# F(4, inf) 95% critical value = chi2(4)/4 — asymptotic (n >> k),
# the regime every SF here is in
BF_CRIT_95_DF4_INF = 2.371902


def brown_forsythe_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test of variance
    homogeneity across the five order priorities — the SCALE twin of
    ``kruskal_wallis_priority``'s location test: two groups can share
    a median while one is twice as volatile, and every pooled-variance
    method upstream (ANOVA, t, power analysis) silently assumes this
    test passes. Median-centering (Brown-Forsythe) rather than
    mean-centering (classic Levene) keeps the test robust on the
    heavy-tailed order-value distribution.

    Exactness: group medians are exact type-1 quantiles off the
    per-group cent-value rollup; per-row deviations |v − med_g| are
    integer cents, quantized to whole DOLLARS before squaring (the
    ``jarque_bera_orders`` discipline — keeps Σz² < 2⁶² at any
    corpus scale, identical in both engines); the F statistic is one
    double expression over seven exact BIGINTs. Verdict vs the
    literal asymptotic F critical value.

    Plan: one fact rollup onto per-group value grids (the rank/KS
    posture — windows run on the grid, never the stream), one join
    back, one 5-row group agg, one global combine."""
    ov = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("p"),
        cents("o_totalprice").alias("v"),
    )
    cnt = ov.groupBy("p", "v").agg(F.count(F.lit(1)).alias("t"))
    w_grid = Window.partitionBy("p").orderBy("v")
    w_all = Window.partitionBy("p")
    with_cum = cnt.select(
        "p",
        "v",
        "t",
        F.sum("t").over(
            w_grid.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("t").over(w_all).alias("n_g"),
    )
    med = (
        with_cum.filter(2 * F.col("cum") >= F.col("n_g"))
        .groupBy("p")
        .agg(F.min("v").alias("med"))
    )
    # integer division, not double-divide-then-cast: Spark's
    # double→long cast truncates while DuckDB's CAST rounds — `div`
    # and `//` agree exactly on non-negative integers
    dev = ov.join(med, "p").select(
        "p",
        F.expr("abs(v - med) div 100").alias("z"),
    )
    g = dev.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("z").alias("s_g"),
        F.sum(F.col("z") * F.col("z")).alias("q_g"),
    )
    comb = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(
            F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")
        ).alias("s2n"),
    )
    n_d, k_d = F.col("n").cast("double"), F.col("k").cast("double")
    between = F.col("s2n") - F.col("s").cast("double") * F.col("s") / n_d
    within = F.col("q").cast("double") - F.col("s2n")
    f_stat = (between / (k_d - 1)) / (within / (n_d - k_d))
    return comb.select(
        "n",
        "k",
        F.round(f_stat, 6).alias("f_stat"),
        (f_stat > BF_CRIT_95_DF4_INF).alias("reject_equal_spread"),
    )


ORACLE_BROWN_FORSYTHE = f"""
WITH ov AS (
  SELECT o_orderpriority AS p,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
), cnt AS (
  SELECT p, v, CAST(COUNT(*) AS BIGINT) AS t FROM ov GROUP BY p, v
), with_cum AS (
  SELECT p, v, t,
         CAST(SUM(t) OVER (PARTITION BY p ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(t) OVER (PARTITION BY p) AS BIGINT) AS n_g
  FROM cnt
), med AS (
  SELECT p, MIN(v) AS med FROM with_cum WHERE 2 * cum >= n_g GROUP BY p
), dev AS (
  SELECT ov.p, CAST(ABS(ov.v - med.med) // 100 AS BIGINT) AS z
  FROM ov JOIN med ON ov.p = med.p
), g AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(z) AS BIGINT) AS s_g,
         CAST(SUM(z * z) AS BIGINT) AS q_g
  FROM dev GROUP BY p
), comb AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(q_g) AS BIGINT) AS q,
         SUM(CAST(s_g AS DOUBLE) * s_g / n_g) AS s2n
  FROM g
)
SELECT n, k,
       ROUND(((s2n - CAST(s AS DOUBLE) * s / CAST(n AS DOUBLE))
              / (CAST(k AS DOUBLE) - 1))
             / ((CAST(q AS DOUBLE) - s2n)
                / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat,
       ((s2n - CAST(s AS DOUBLE) * s / CAST(n AS DOUBLE))
        / (CAST(k AS DOUBLE) - 1))
       / ((CAST(q AS DOUBLE) - s2n)
          / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
       > {BF_CRIT_95_DF4_INF} AS reject_equal_spread
FROM comb
"""


# ---------------------------------------------------------------------------
# 1-D Wasserstein (earth-mover) drift between two priority cohorts
# ---------------------------------------------------------------------------


def wasserstein_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W₁ (earth-mover) distance between the urgent and low-priority
    order-value distributions — the INTEGRAL twin of
    ``ks_drift_orders``: KS reports the single worst CDF gap (shape-
    sensitive, magnitude-blind); W₁ integrates |F_A − F_B| over the
    value axis, so it measures HOW MUCH money-mass must move, in
    dollars — the drift number a retraining-cost model can actually
    consume.

    Exactness: on the merged distinct-cent grid, each segment's term
    is |cumA·n_B − cumB·n_A| (exact BIGINT, cross-multiplied — no
    rate rounding) × the next-value gap; only the per-segment scale
    to dollars is a double, and the segment sum drifts by addition
    order alone (~1e-15 relative — the stats_moments discipline).

    Plan: one fact rollup onto the merged value grid, two cumulative
    windows over that grid (the KS posture verbatim), one global
    agg."""
    ov = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin(KS_GROUP_A, KS_GROUP_B))
        .select(
            (F.col("o_orderpriority") == KS_GROUP_A)
            .cast("long")
            .alias("is_a"),
            cents("o_totalprice").alias("v"),
        )
    )
    per_v = ov.groupBy("v").agg(
        F.sum("is_a").alias("na_v"),
        F.sum(F.lit(1) - F.col("is_a")).alias("nb_v"),
    )
    w = Window.orderBy("v")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    grid = per_v.select(
        "v",
        F.sum("na_v").over(w_cum).alias("cum_a"),
        F.sum("nb_v").over(w_cum).alias("cum_b"),
        F.sum("na_v").over(w_all).alias("n_a"),
        F.sum("nb_v").over(w_all).alias("n_b"),
        F.lead("v").over(w).alias("v_next"),
    )
    term = (
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).cast("double")
        * (F.col("v_next") - F.col("v"))
        / F.col("n_a")
        / F.col("n_b")
        / 100
    )
    return grid.filter(F.col("v_next").isNotNull()).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.round(F.sum(term), 6).alias("w1_dollars"),
    )


ORACLE_WASSERSTEIN = f"""
WITH ov AS (
  SELECT CASE WHEN o_orderpriority = '{KS_GROUP_A}' THEN 1 ELSE 0 END
           AS is_a,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
  WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
), per_v AS (
  SELECT v, CAST(SUM(is_a) AS BIGINT) AS na_v,
         CAST(SUM(1 - is_a) AS BIGINT) AS nb_v
  FROM ov GROUP BY v
), grid AS (
  SELECT v,
         CAST(SUM(na_v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS cum_a,
         CAST(SUM(nb_v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS cum_b,
         CAST(SUM(na_v) OVER () AS BIGINT) AS n_a,
         CAST(SUM(nb_v) OVER () AS BIGINT) AS n_b,
         LEAD(v) OVER (ORDER BY v) AS v_next
  FROM per_v
)
SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       ROUND(SUM(CAST(ABS(cum_a * n_b - cum_b * n_a) AS DOUBLE)
                 * (v_next - v) / n_a / n_b / 100), 6) AS w1_dollars
FROM grid WHERE v_next IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test — ordered exposure vs binary outcome
# ---------------------------------------------------------------------------

CA_CRIT_95_DF1 = 3.841459  # chi-square 95% critical value, df = 1


def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for TREND of return rate across the
    ordered discount ticks (0..10%) — the member of the association
    family the χ²/G-test pair cannot replace: those treat discount
    bands as unordered labels, so a clean monotone dose-response and
    a zigzag of the same magnitude score identically; CA weights the
    bands by their order and asks specifically "does return risk
    CLIMB with discount depth?".

    Exactness: with integer scores t = discount tick, the centered
    numerator is the exact BIGINT d = N·Σta − A·Σtn (≤ ~1e13 at
    sf0.1; 2⁶² headroom through sf10); Z² = N·d²/(A(N−A)(N·Σt²n −
    (Σtn)²)) is one double expression over six exact integers,
    mirrored textually. Verdict vs the literal χ²(1) critical value.

    Plan: ONE map-combined global aggregate over the pruned 2-column
    fact projection — six BIGINT scalars, zero shuffle, zero joins
    (the iv_wald posture)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        cents("l_discount").alias("t"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    )
    agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("a"),
        F.sum("t").alias("stn"),
        F.sum(F.col("t") * F.col("t")).alias("st2n"),
        F.sum(F.col("t") * F.col("y")).alias("sta"),
    )
    d = (F.col("n") * F.col("sta") - F.col("a") * F.col("stn")).cast(
        "double"
    )
    n_d = F.col("n").cast("double")
    z2 = (
        n_d
        * (d * d)
        / (
            F.col("a").cast("double")
            * (F.col("n") - F.col("a")).cast("double")
            * (
                F.col("n").cast("double") * F.col("st2n")
                - F.col("stn").cast("double") * F.col("stn")
            )
        )
    )
    return agg.select(
        "n",
        F.col("a").alias("n_returned"),
        F.signum(d).cast("long").alias("trend_sign"),
        F.round(z2, 6).alias("z2_stat"),
        (z2 > CA_CRIT_95_DF1).alias("reject_no_trend"),
    )


ORACLE_COCHRAN_ARMITAGE = f"""
WITH li AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS t,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS a,
         CAST(SUM(t) AS BIGINT) AS stn,
         CAST(SUM(t * t) AS BIGINT) AS st2n,
         CAST(SUM(t * y) AS BIGINT) AS sta
  FROM li
)
SELECT n, a AS n_returned,
       CAST(SIGN(CAST(n * sta - a * stn AS DOUBLE)) AS BIGINT)
         AS trend_sign,
       ROUND(CAST(n AS DOUBLE)
             * (CAST(n * sta - a * stn AS DOUBLE)
                * CAST(n * sta - a * stn AS DOUBLE))
             / (CAST(a AS DOUBLE) * CAST(n - a AS DOUBLE)
                * (CAST(n AS DOUBLE) * st2n
                   - CAST(stn AS DOUBLE) * stn)), 6) AS z2_stat,
       CAST(n AS DOUBLE)
       * (CAST(n * sta - a * stn AS DOUBLE)
          * CAST(n * sta - a * stn AS DOUBLE))
       / (CAST(a AS DOUBLE) * CAST(n - a AS DOUBLE)
          * (CAST(n AS DOUBLE) * st2n
             - CAST(stn AS DOUBLE) * stn)) > {CA_CRIT_95_DF1}
         AS reject_no_trend
FROM agg
"""


# ---------------------------------------------------------------------------
# Mantel-Haenszel pooled odds ratio + CMH test across brand strata
# ---------------------------------------------------------------------------


def mantel_haenszel_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio of (deep discount → return)
    ACROSS brand strata, with the CMH χ² — the inferential closure
    of ``simpson_paradox_audit``: that audit flags when pooled and
    stratified slopes disagree; MH answers "so what IS the
    common-stratum effect, and is it significant?" by pooling each
    brand's 2×2 with Σa·d/n over Σb·c/n weights (the estimator that
    is consistent even when strata are tiny).

    Exactness: per-stratum a,b,c,d are BIGINTs; every pooled term
    (ad/n, bc/n, E_i, V_i) is a double from exact integers; the
    25-stratum sums drift only by addition order (~1e-15 relative —
    under the 1e-6 grid). CMH uses the continuity-free form
    (Σa − ΣE)²/ΣV vs χ²(1).

    Plan: one fact⋈part join (dim side AQE-picked), one 25-row
    stratum rollup, one global agg — the brand-association posture
    of ``fdr_bh_brands``."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (cents("l_discount") >= 6).alias("exposed"),
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum((F.col("exposed") & F.col("ret")).cast("long")).alias("a"),
            F.sum((F.col("exposed") & ~F.col("ret")).cast("long")).alias("b"),
            F.sum((~F.col("exposed") & F.col("ret")).cast("long")).alias("c"),
            F.sum(
                (~F.col("exposed") & ~F.col("ret")).cast("long")
            ).alias("d"),
        )
    )
    n_i = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
    pooled = cells.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.col("a").cast("double") * F.col("d") / n_i).alias("s_ad"),
        F.sum(F.col("b").cast("double") * F.col("c") / n_i).alias("s_bc"),
        F.sum(F.col("a").cast("double")).alias("s_a"),
        F.sum(
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("a") + F.col("c"))
            / n_i
        ).alias("s_e"),
        F.sum(
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("c") + F.col("d"))
            * (F.col("a") + F.col("c"))
            * (F.col("b") + F.col("d"))
            / (n_i * n_i * (n_i - 1))
        ).alias("s_v"),
    )
    cmh = (
        (F.col("s_a") - F.col("s_e"))
        * (F.col("s_a") - F.col("s_e"))
        / F.col("s_v")
    )
    return pooled.select(
        "n_strata",
        F.round(F.col("s_ad") / F.col("s_bc"), 6).alias("or_mh"),
        F.round(cmh, 6).alias("cmh_chi2"),
        (cmh > CA_CRIT_95_DF1).alias("reject_no_assoc"),
    )


ORACLE_MANTEL_HAENSZEL = f"""
WITH li AS (
  SELECT l_partkey,
         CAST(ROUND(l_discount * 100) AS BIGINT) >= 6 AS exposed,
         l_returnflag = 'R' AS ret
  FROM lineitem
), cells AS (
  SELECT p_brand,
         CAST(SUM(CASE WHEN exposed AND ret THEN 1 ELSE 0 END) AS BIGINT)
           AS a,
         CAST(SUM(CASE WHEN exposed AND NOT ret THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(SUM(CASE WHEN NOT exposed AND ret THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
         CAST(SUM(CASE WHEN NOT exposed AND NOT ret THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM li JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
), pooled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         SUM(CAST(a AS DOUBLE) * d
             / CAST(a + b + c + d AS DOUBLE)) AS s_ad,
         SUM(CAST(b AS DOUBLE) * c
             / CAST(a + b + c + d AS DOUBLE)) AS s_bc,
         SUM(CAST(a AS DOUBLE)) AS s_a,
         SUM(CAST(a + b AS DOUBLE) * (a + c)
             / CAST(a + b + c + d AS DOUBLE)) AS s_e,
         SUM(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
             / (CAST(a + b + c + d AS DOUBLE)
                * CAST(a + b + c + d AS DOUBLE)
                * (CAST(a + b + c + d AS DOUBLE) - 1))) AS s_v
  FROM cells
)
SELECT n_strata,
       ROUND(s_ad / s_bc, 6) AS or_mh,
       ROUND((s_a - s_e) * (s_a - s_e) / s_v, 6) AS cmh_chi2,
       (s_a - s_e) * (s_a - s_e) / s_v > {CA_CRIT_95_DF1}
         AS reject_no_assoc
FROM pooled
"""


# ---------------------------------------------------------------------------
# Kruskal-Wallis H — k-group rank test (the Mann-Whitney generalization)
# ---------------------------------------------------------------------------

# chi-square 95% critical value at df = 4 (the 5 fixed TPC-H order
# priorities minus one) — the one table entry the verdict needs
KRUSKAL_CRIT_95_DF4 = 9.487729


def kruskal_wallis_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across ALL FIVE order priorities at once —
    the k-group generalization of ``mann_whitney_drift``: one test
    for "does order value differ by priority anywhere", run before
    any pairwise drilldown (five pairwise MW tests would need a
    multiplicity correction; KW doesn't).

    Exactness: the ``mann_whitney_drift`` tie-averaged DOUBLED-rank
    idiom (rank2 = 2·below + t + 1 per distinct cent value) makes
    every per-group rank sum an exact BIGINT; the tie correction
    Σ(t³−t) is BIGINT (headroom: n³ < 2⁶² through sf0.1 — past
    that, compute the two cubic terms in double, where both engines
    round identically). H's two ~3n-sized terms cancel to O(1), but
    the inputs are exact integers-in-double, so cross-engine drift
    is a few ulps of the Σ R²/n term scaled by 12/n² — ~1e-12,
    six orders under the ROUND(·,6) grid.

    Plan: one fact rollup onto the distinct-value grid (rank2 rides
    the unpartitioned grid window — the KS posture), one join back,
    one 5-row group agg, two 1-row tie/total frames."""
    ov = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("p"),
        cents("o_totalprice").alias("v"),
    )
    cnt = ov.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    w = Window.orderBy("v")
    rank2 = cnt.select(
        "v",
        (
            2
            * F.coalesce(
                F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
            + F.col("t")
            + 1
        ).alias("r2"),
    )
    groups = (
        ov.join(rank2, "v")
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_i"), F.sum("r2").alias("sr2_i"))
    )
    ties = cnt.agg(
        F.sum("t").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "tie_cubes"
        ),
    )
    n_d = F.col("n").cast("double")
    # R_i = sr2_i / 2 (exact double); Σ R_i²/n_i over the 5-row frame
    r_term = F.sum(
        (F.col("sr2_i").cast("double") / 2)
        * (F.col("sr2_i").cast("double") / 2)
        / F.col("n_i")
    ).alias("sum_r2n")
    agg = groups.agg(
        F.count(F.lit(1)).alias("k"), r_term
    ).crossJoin(F.broadcast(ties))
    h = (
        F.lit(12.0) / (n_d * (n_d + 1)) * F.col("sum_r2n")
        - 3.0 * (n_d + 1)
    )
    c = F.lit(1.0) - F.col("tie_cubes").cast("double") / (
        n_d * n_d * n_d - n_d
    )
    h_adj = h / c
    return agg.select(
        "n",
        "k",
        F.round(h, 6).alias("h_stat"),
        F.round(h_adj, 6).alias("h_adj"),
        (h_adj > KRUSKAL_CRIT_95_DF4).alias("reject_same_dist"),
    )


ORACLE_KRUSKAL = f"""
WITH ov AS (
  SELECT o_orderpriority AS p,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
), cnt AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM ov GROUP BY v
), rank2 AS (
  SELECT v, 2 * COALESCE(SUM(t) OVER (ORDER BY v
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) + t + 1 AS r2
  FROM cnt
), groups AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_i,
         CAST(SUM(r2) AS BIGINT) AS sr2_i
  FROM ov JOIN rank2 USING (v) GROUP BY p
), ties AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_cubes
  FROM cnt
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM((CAST(sr2_i AS DOUBLE) / 2) * (CAST(sr2_i AS DOUBLE) / 2)
             / n_i) AS sum_r2n
  FROM groups
)
SELECT n, k,
       ROUND(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)) * sum_r2n
             - 3.0 * (CAST(n AS DOUBLE) + 1), 6) AS h_stat,
       ROUND((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)) * sum_r2n
              - 3.0 * (CAST(n AS DOUBLE) + 1))
             / (1.0 - CAST(tie_cubes AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))),
             6) AS h_adj,
       (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)) * sum_r2n
        - 3.0 * (CAST(n AS DOUBLE) + 1))
       / (1.0 - CAST(tie_cubes AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
       > {KRUSKAL_CRIT_95_DF4} AS reject_same_dist
FROM agg, ties
"""


# ---------------------------------------------------------------------------
# Jarque-Bera normality test — integer-quantized centered moments
# ---------------------------------------------------------------------------

# chi-square 95% critical value at df = 2
JB_CRIT_95_DF2 = 5.991465


def jarque_bera_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of order values — the missing
    member of the distribution-shape family (moments exist, KS/MW
    compare two samples; JB asks ONE sample "is it Gaussian" from
    skewness and excess kurtosis): JB = n/6·(S² + K²/4) vs χ²(2).

    Spark's ``skewness``/``kurtosis`` and DuckDB's disagree on bias
    correction, so the statistic is built from scratch with the
    integer-quantization idiom (``revenue_acf_profile``): center on
    the exact-cents mean, then quantize each row's (x−m)², (x−m)³,
    (x−m)⁴ term to integer units (whole-dollar², mega-dollar³,
    tera-dollar⁴ — keeping every BIGINT sum inside 2⁶² at any
    corpus scale). The quantization perturbs S and K by ~1e-5
    RELATIVE but identically in both engines — parity is exact; the
    statistic is a deterministic property of the quantized moments,
    which the docstring hereby defines as the semantics.

    Plan: one 1-row (n, Σcents) agg broadcast onto the fact scan,
    one map-combined 4-moment agg — two passes, zero shuffle beyond
    1-row frames."""
    o = load_table(spark, sf_dir, "orders").select(
        cents("o_totalprice").alias("vc")
    )
    tot = o.agg(
        F.count(F.lit(1)).alias("n"), F.sum("vc").alias("s_cents")
    )
    centered = o.crossJoin(F.broadcast(tot)).select(
        "n",
        (
            F.col("vc").cast("double") / 100
            - (F.col("s_cents").cast("double") / 100) / F.col("n")
        ).alias("cx"),
    )
    cx = F.col("cx")
    moments = centered.agg(
        F.max("n").alias("n"),
        F.sum(F.round(cx * cx, 0).cast("long")).alias("s2"),
        F.sum(F.round(cx * cx * cx / 1e6, 0).cast("long")).alias("s3"),
        F.sum(F.round(cx * cx * cx * cx / 1e12, 0).cast("long")).alias("s4"),
    )
    n_d = F.col("n").cast("double")
    m2 = F.col("s2").cast("double") / n_d
    m3 = F.col("s3").cast("double") * 1e6 / n_d
    m4 = F.col("s4").cast("double") * 1e12 / n_d
    s = m3 / F.sqrt(m2 * m2 * m2)
    k = m4 / (m2 * m2) - 3.0
    jb = n_d / 6 * (s * s + k * k / 4)
    return moments.select(
        "n",
        F.round(s, 6).alias("skewness"),
        F.round(k, 6).alias("ex_kurtosis"),
        F.round(jb, 4).alias("jb_stat"),
        (jb > JB_CRIT_95_DF2).alias("reject_normal"),
    )


_JB_CX = (
    "(CAST(vc AS DOUBLE) / 100"
    " - (CAST(s_cents AS DOUBLE) / 100) / n)"
)

ORACLE_JARQUE_BERA = f"""
WITH o AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS vc FROM orders
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(vc) AS BIGINT) AS s_cents
  FROM o
), centered AS (
  SELECT n, {_JB_CX} AS cx FROM o CROSS JOIN tot
), moments AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(cx * cx, 0) AS BIGINT)) AS BIGINT) AS s2,
         CAST(SUM(CAST(ROUND(cx * cx * cx / 1e6, 0) AS BIGINT)) AS BIGINT)
           AS s3,
         CAST(SUM(CAST(ROUND(cx * cx * cx * cx / 1e12, 0) AS BIGINT))
              AS BIGINT) AS s4
  FROM centered
)
SELECT n,
       ROUND((CAST(s3 AS DOUBLE) * 1e6 / CAST(n AS DOUBLE))
             / sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))), 6)
         AS skewness,
       ROUND((CAST(s4 AS DOUBLE) * 1e12 / CAST(n AS DOUBLE))
             / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))) - 3.0, 6)
         AS ex_kurtosis,
       ROUND(CAST(n AS DOUBLE) / 6
             * (((CAST(s3 AS DOUBLE) * 1e6 / CAST(n AS DOUBLE))
                 / sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))))
                * ((CAST(s3 AS DOUBLE) * 1e6 / CAST(n AS DOUBLE))
                   / sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))))
                + ((CAST(s4 AS DOUBLE) * 1e12 / CAST(n AS DOUBLE))
                   / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))) - 3.0)
                  * ((CAST(s4 AS DOUBLE) * 1e12 / CAST(n AS DOUBLE))
                     / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))) - 3.0)
                  / 4), 4) AS jb_stat,
       CAST(n AS DOUBLE) / 6
       * (((CAST(s3 AS DOUBLE) * 1e6 / CAST(n AS DOUBLE))
           / sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))))
          * ((CAST(s3 AS DOUBLE) * 1e6 / CAST(n AS DOUBLE))
             / sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))))
          + ((CAST(s4 AS DOUBLE) * 1e12 / CAST(n AS DOUBLE))
             / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))) - 3.0)
            * ((CAST(s4 AS DOUBLE) * 1e12 / CAST(n AS DOUBLE))
               / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))) - 3.0)
            / 4) > {JB_CRIT_95_DF2} AS reject_normal
FROM moments
"""


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test — "is the series white noise at all?"
# ---------------------------------------------------------------------------

# chi-square 95% critical value at df = ACF_MAX_LAG (7) — a fixed
# literal, the one table entry the test needs
LJUNG_BOX_CRIT_95_DF7 = 14.067140

def ljung_box_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q over the first {ACF_MAX_LAG} autocorrelations of
    daily revenue — the PORTMANTEAU summary of
    ``revenue_acf_profile``: instead of eyeballing seven ACF bars,
    one statistic Q = n(n+2)·Σ ρ_k²/(n−k) against the χ²(7) critical
    value answers "is there ANY serial structure to model, or is a
    mean forecast already optimal?" — the gate a forecast pipeline
    checks before paying for seasonal models
    (``forecast_backtest_naive`` / ``stl_weekly_profile``).

    Exactness: identical integer-micro-unit moment machinery as the
    ACF profile (order-free BIGINT sums over the calendar-bounded
    day frame); Q is one double expression over those exact
    integers, textually mirrored in the oracle, and the verdict
    compares it to a literal critical value — no distribution code.

    Plan: one fact rollup to the calendar day frame, one
    unpartitioned window over it (KS posture), one global agg."""
    day = (
        load_table(spark, sf_dir, "orders")
        .select(
            epoch_day("o_orderdate").alias("d"),
            (cents("o_totalprice") / 100).cast("long").alias("v"),
        )
        .groupBy("d")
        .agg(F.sum("v").alias("x"))
    )
    tot = day.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
    )
    w = Window.orderBy("d")
    lagged = day.crossJoin(F.broadcast(tot)).select(
        "x",
        "n",
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias("m"),
        *[
            F.lag("x", k).over(w).alias(f"x{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    micro = lambda e: F.round(e, 0).cast("long")  # noqa: E731
    cx = F.col("x").cast("double") - F.col("m")
    agg = lagged.agg(
        F.max("n").alias("n"),
        F.sum(micro(cx * cx)).alias("den_micro"),
        *[
            F.sum(
                micro(cx * (F.col(f"x{k}").cast("double") - F.col("m")))
            ).alias(f"num_{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    n_d = F.col("n").cast("double")
    rho = [
        F.col(f"num_{k}").cast("double") / F.col("den_micro").cast("double")
        for k in range(1, ACF_MAX_LAG + 1)
    ]
    terms = [
        (rho[k - 1] * rho[k - 1]) / (n_d - k)
        for k in range(1, ACF_MAX_LAG + 1)
    ]
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    q = n_d * (n_d + 2) * s
    return agg.select(
        F.col("n").alias("n_days"),
        F.lit(ACF_MAX_LAG).cast("long").alias("df"),
        F.round(q, 6).alias("q_stat"),
        (q > LJUNG_BOX_CRIT_95_DF7).alias("reject_white_noise"),
    )


ORACLE_LJUNG_BOX = (
    """
WITH day AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100)
              AS BIGINT) AS x
  FROM orders GROUP BY d
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
  FROM day
), lagged AS (
  SELECT x, n, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m, """
    + ", ".join(
        f"LAG(x, {k}) OVER (ORDER BY d) AS x{k}"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    + """
  FROM day CROSS JOIN tot
), agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) - m)
                             * (CAST(x AS DOUBLE) - m), 0)
                       AS BIGINT)) AS BIGINT) AS den_micro, """
    + ", ".join(
        f"CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) - m)"
        f" * (CAST(x{k} AS DOUBLE) - m), 0) AS BIGINT)) AS BIGINT)"
        f" AS num_{k}"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    + """
  FROM lagged
)
SELECT n AS n_days, CAST("""
    + str(ACF_MAX_LAG)
    + """ AS BIGINT) AS df,
       ROUND(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2) * ("""
    + " + ".join(
        f"((CAST(num_{k} AS DOUBLE) / CAST(den_micro AS DOUBLE))"
        f" * (CAST(num_{k} AS DOUBLE) / CAST(den_micro AS DOUBLE)))"
        f" / (CAST(n AS DOUBLE) - {k})"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    + """), 6) AS q_stat,
       CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2) * ("""
    + " + ".join(
        f"((CAST(num_{k} AS DOUBLE) / CAST(den_micro AS DOUBLE))"
        f" * (CAST(num_{k} AS DOUBLE) / CAST(den_micro AS DOUBLE)))"
        f" / (CAST(n AS DOUBLE) - {k})"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    + f""") > {LJUNG_BOX_CRIT_95_DF7} AS reject_white_noise
FROM agg
"""
)


# ---------------------------------------------------------------------------
# Permutation test — assumption-free inference in ONE pass
# ---------------------------------------------------------------------------

PERM_B = 64  # replicates; p-value resolution 1/(B+1)


def permutation_test_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test of the urgent-vs-low mean order-value gap —
    the assumption-free member of the drift family: Welch trusts a
    t distribution, Mann-Whitney a normal approximation; the
    permutation test trusts nothing, comparing the observed gap to
    its distribution under {PERM_B} random relabelings. No erf, no
    tables — the null distribution is COMPUTED.

    THE one-pass trick: each replicate's relabeling is a
    deterministic md5 bit (the cross-engine ``md5_u32`` sampling
    contract, functions/scalar.py), so all {PERM_B} replicate sums
    ride the SAME map-side-combined aggregate as the observed stat —
    2·{PERM_B}+4 integer scalars total, zero extra passes, zero
    shuffle beyond one row. Replicate stats unstack to a {PERM_B}-row
    frame where the tail count is exact integer comparison of
    identically-composed doubles. At any corpus scale this is one
    scan; the classical resample-B-times spelling is B scans."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin(KS_GROUP_A, KS_GROUP_B))
        .select(
            "o_orderkey",
            flag(F.col("o_orderpriority") == KS_GROUP_A).alias("is_a"),
            F.expr(
                "cast(round(o_totalprice * 100) as bigint) div 100000"
            ).alias("v"),
        )
    )
    from cricket_analytics_nosql_spark.functions.scalar import md5_u32

    sums = [
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum("is_a").alias("n_obs"),
        F.sum(F.col("is_a") * F.col("v")).alias("s_obs"),
    ]
    for b in range(PERM_B):
        bit = md5_u32(F.col("o_orderkey"), salt=f"perm{b}#") % 2
        sums.append(F.sum(bit).alias(f"n_{b}"))
        sums.append(F.sum(bit * F.col("v")).alias(f"s_{b}"))
    agg = o.agg(*sums)

    def gap(n1, s1):
        n1d, s1d = n1.cast("double"), s1.cast("double")
        nd, sd = F.col("n").cast("double"), F.col("s").cast("double")
        return s1d / n1d - (sd - s1d) / (nd - n1d)

    stack_args = ", ".join(f"{b}L, n_{b}, s_{b}" for b in range(PERM_B))
    reps = agg.select(
        "n",
        "s",
        gap(F.col("n_obs"), F.col("s_obs")).alias("t_obs"),
        F.expr(f"stack({PERM_B}, {stack_args}) AS (b, n1, s1)"),
    )
    rep_t = reps.select(
        "n",
        "t_obs",
        gap(F.col("n1"), F.col("s1")).alias("t_b"),
    )
    return rep_t.groupBy("n", "t_obs").agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.sum(
            (F.abs(F.col("t_b")) >= F.abs(F.col("t_obs"))).cast("long")
        ).alias("n_extreme"),
    ).select(
        F.col("n").alias("n_orders"),
        F.round(F.col("t_obs"), 4).alias("observed_gap"),
        "n_replicates",
        "n_extreme",
        F.round(
            (F.col("n_extreme") + 1).cast("double")
            / (F.col("n_replicates") + 1).cast("double"),
            6,
        ).alias("p_value"),
    )


def _perm_bit_sql(b: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('perm{b}#' || CAST(o_orderkey AS VARCHAR)),"
        f" 1, 8)) AS BIGINT) % 2"
    )


ORACLE_PERMUTATION_TEST = (
    f"""
WITH o AS (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority = '{KS_GROUP_A}' THEN 1 ELSE 0 END AS is_a,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000 AS v
  FROM orders
  WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(is_a) AS BIGINT) AS n_obs,
         CAST(SUM(is_a * v) AS BIGINT) AS s_obs, """
    + ", ".join(
        f"CAST(SUM({_perm_bit_sql(b)}) AS BIGINT) AS n_{b},"
        f" CAST(SUM(({_perm_bit_sql(b)}) * v) AS BIGINT) AS s_{b}"
        for b in range(PERM_B)
    )
    + """
  FROM o
), reps AS (
"""
    + "\n  UNION ALL\n".join(
        f"  SELECT n, CAST(s_obs AS DOUBLE) / CAST(n_obs AS DOUBLE)"
        f" - (CAST(s AS DOUBLE) - CAST(s_obs AS DOUBLE))"
        f" / (CAST(n AS DOUBLE) - CAST(n_obs AS DOUBLE)) AS t_obs,"
        f" CAST(s_{b} AS DOUBLE) / CAST(n_{b} AS DOUBLE)"
        f" - (CAST(s AS DOUBLE) - CAST(s_{b} AS DOUBLE))"
        f" / (CAST(n AS DOUBLE) - CAST(n_{b} AS DOUBLE)) AS t_b FROM agg"
        for b in range(PERM_B)
    )
    + """
)
SELECT n AS n_orders,
       ROUND(t_obs, 4) AS observed_gap,
       CAST(COUNT(*) AS BIGINT) AS n_replicates,
       CAST(SUM(CASE WHEN ABS(t_b) >= ABS(t_obs) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_extreme,
       ROUND((CAST(SUM(CASE WHEN ABS(t_b) >= ABS(t_obs) THEN 1 ELSE 0 END)
                   AS DOUBLE) + 1)
             / (CAST(COUNT(*) AS DOUBLE) + 1), 6) AS p_value
FROM reps
GROUP BY n, t_obs
"""
)


# ---------------------------------------------------------------------------
# Cramér's V — effect size of categorical association (priority × status)
# ---------------------------------------------------------------------------

def cramers_v_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V (plus the Bergsma bias-corrected variant) over the
    order-priority × order-status contingency table — the EFFECT
    SIZE companion to ``chi_square_assoc``: chi² grows linearly with
    N so at 100 TB *everything* is "significant"; V rescales the
    statistic to [0, 1] so drift monitors can threshold on a
    scale-free association strength instead.

    Exactness discipline: the fact stream collapses to the 15-cell
    contingency table in one map-combined agg; marginals are window
    sums over that metadata frame; each cell's chi² contribution is
    quantized to integer micro-units BEFORE the global sum (the
    micro-nat idiom) so partial-agg order can't perturb a bit; the
    V / bias-correction formulas are scalar doubles on one row,
    textually mirrored in the oracle."""
    cells = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    w_row = Window.partitionBy("o_orderpriority")
    w_col = Window.partitionBy("o_orderstatus")
    w_all = Window.partitionBy()
    expected = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n").cast("double")
    )
    contrib_u = F.round(
        (F.col("observed") - expected)
        * (F.col("observed") - expected)
        / expected
        * F.lit(1e6)
    ).cast("long")
    agg = (
        cells.select(
            "o_orderpriority",
            "o_orderstatus",
            "observed",
            F.sum("observed").over(w_row).alias("row_tot"),
            F.sum("observed").over(w_col).alias("col_tot"),
            F.sum("observed").over(w_all).alias("n"),
        )
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "n",
            contrib_u.alias("contrib_u"),
        )
        .groupBy()
        .agg(
            F.max("n").alias("n"),
            F.countDistinct("o_orderpriority").alias("r_levels"),
            F.countDistinct("o_orderstatus").alias("c_levels"),
            F.sum("contrib_u").alias("chi2_u"),
        )
    )
    chi2 = F.col("chi2_u").cast("double") / F.lit(1e6)
    nd = F.col("n").cast("double")
    rd = F.col("r_levels").cast("double")
    cd = F.col("c_levels").cast("double")
    k_min = F.least(rd - F.lit(1.0), cd - F.lit(1.0))
    phi2 = chi2 / nd
    phi2c = F.greatest(
        F.lit(0.0),
        phi2 - (rd - F.lit(1.0)) * (cd - F.lit(1.0)) / (nd - F.lit(1.0)),
    )
    r_adj = rd - (rd - F.lit(1.0)) * (rd - F.lit(1.0)) / (nd - F.lit(1.0))
    c_adj = cd - (cd - F.lit(1.0)) * (cd - F.lit(1.0)) / (nd - F.lit(1.0))
    k_min_adj = F.least(r_adj - F.lit(1.0), c_adj - F.lit(1.0))
    return agg.select(
        "n",
        "r_levels",
        "c_levels",
        ((F.col("r_levels") - 1) * (F.col("c_levels") - 1)).alias("df"),
        F.round(chi2, 6).alias("chi2"),
        F.round(F.sqrt(phi2 / k_min), 6).alias("cramers_v"),
        F.round(F.sqrt(phi2c / k_min_adj), 6).alias("v_corrected"),
    )


ORACLE_CRAMERS_V = """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS observed
  FROM orders GROUP BY o_orderpriority, o_orderstatus
), tot AS (
  SELECT o_orderpriority, o_orderstatus, observed,
         SUM(observed) OVER (PARTITION BY o_orderpriority) AS row_tot,
         SUM(observed) OVER (PARTITION BY o_orderstatus) AS col_tot,
         SUM(observed) OVER () AS n
  FROM cells
), micro AS (
  SELECT o_orderpriority, o_orderstatus, n,
         CAST(ROUND((observed - CAST(row_tot AS DOUBLE)
                                * CAST(col_tot AS DOUBLE)
                                / CAST(n AS DOUBLE))
                    * (observed - CAST(row_tot AS DOUBLE)
                                  * CAST(col_tot AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                    / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                       / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS contrib_u
  FROM tot
), agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS r_levels,
         CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS c_levels,
         CAST(SUM(contrib_u) AS BIGINT) AS chi2_u
  FROM micro
)
SELECT n, r_levels, c_levels,
       (r_levels - 1) * (c_levels - 1) AS df,
       ROUND(CAST(chi2_u AS DOUBLE) / 1e6, 6) AS chi2,
       ROUND(sqrt(CAST(chi2_u AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)
                  / LEAST(CAST(r_levels AS DOUBLE) - 1.0,
                          CAST(c_levels AS DOUBLE) - 1.0)), 6) AS cramers_v,
       ROUND(sqrt(GREATEST(0.0,
                    CAST(chi2_u AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)
                    - (CAST(r_levels AS DOUBLE) - 1.0)
                      * (CAST(c_levels AS DOUBLE) - 1.0)
                      / (CAST(n AS DOUBLE) - 1.0))
                  / LEAST(CAST(r_levels AS DOUBLE)
                            - (CAST(r_levels AS DOUBLE) - 1.0)
                              * (CAST(r_levels AS DOUBLE) - 1.0)
                              / (CAST(n AS DOUBLE) - 1.0) - 1.0,
                          CAST(c_levels AS DOUBLE)
                            - (CAST(c_levels AS DOUBLE) - 1.0)
                              * (CAST(c_levels AS DOUBLE) - 1.0)
                              / (CAST(n AS DOUBLE) - 1.0) - 1.0)), 6)
         AS v_corrected
FROM agg
"""


# ---------------------------------------------------------------------------
# G-test (log-likelihood ratio) of independence — returnflag × linestatus
# ---------------------------------------------------------------------------

def g_test_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test of independence over the lineitem returnflag ×
    linestatus table — the likelihood-ratio sibling of the Pearson
    chi²: G = 2·Σ O·ln(O·N / (row·col)), which is also exactly
    2·N·I(X;Y), so the same rollup doubles as a mutual-information
    readout between the two flags (``mi_nats`` column).

    Shape: one map-combined agg to the 6-cell table, window
    marginals over that frame, per-cell ln terms quantized to
    integer micro-units before the sum (libm ln agreement is only
    needed per-term at the 1e-6 boundary, the lm_surprisal
    robustness argument), one division at the end."""
    cells = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    w_row = Window.partitionBy("l_returnflag")
    w_col = Window.partitionBy("l_linestatus")
    w_all = Window.partitionBy()
    term_u = F.round(
        F.lit(2.0)
        * F.col("observed")
        * F.log(
            F.col("observed").cast("double")
            * F.col("n").cast("double")
            / (F.col("row_tot").cast("double") * F.col("col_tot").cast("double"))
        )
        * F.lit(1e6)
    ).cast("long")
    agg = (
        cells.select(
            "l_returnflag",
            "l_linestatus",
            "observed",
            F.sum("observed").over(w_row).alias("row_tot"),
            F.sum("observed").over(w_col).alias("col_tot"),
            F.sum("observed").over(w_all).alias("n"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "n",
            term_u.alias("term_u"),
        )
        .groupBy()
        .agg(
            F.max("n").alias("n"),
            F.countDistinct("l_returnflag").alias("r_levels"),
            F.countDistinct("l_linestatus").alias("c_levels"),
            F.sum("term_u").alias("g_u"),
        )
    )
    g = F.col("g_u").cast("double") / F.lit(1e6)
    return agg.select(
        "n",
        "r_levels",
        "c_levels",
        ((F.col("r_levels") - 1) * (F.col("c_levels") - 1)).alias("df"),
        F.round(g, 6).alias("g_stat"),
        F.round(g / (F.lit(2.0) * F.col("n").cast("double")), 9).alias(
            "mi_nats"
        ),
    )


ORACLE_G_TEST = """
WITH cells AS (
  SELECT l_returnflag, l_linestatus, COUNT(*) AS observed
  FROM lineitem GROUP BY l_returnflag, l_linestatus
), tot AS (
  SELECT l_returnflag, l_linestatus, observed,
         SUM(observed) OVER (PARTITION BY l_returnflag) AS row_tot,
         SUM(observed) OVER (PARTITION BY l_linestatus) AS col_tot,
         SUM(observed) OVER () AS n
  FROM cells
), micro AS (
  SELECT l_returnflag, l_linestatus, n,
         CAST(ROUND(2.0 * observed
                    * ln(CAST(observed AS DOUBLE) * CAST(n AS DOUBLE)
                         / (CAST(row_tot AS DOUBLE)
                            * CAST(col_tot AS DOUBLE)))
                    * 1e6) AS BIGINT) AS term_u
  FROM tot
), agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS r_levels,
         CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS c_levels,
         CAST(SUM(term_u) AS BIGINT) AS g_u
  FROM micro
)
SELECT n, r_levels, c_levels,
       (r_levels - 1) * (c_levels - 1) AS df,
       ROUND(CAST(g_u AS DOUBLE) / 1e6, 6) AS g_stat,
       ROUND(CAST(g_u AS DOUBLE) / 1e6 / (2.0 * CAST(n AS DOUBLE)), 9)
         AS mi_nats
FROM agg
"""


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-brand return-rate tests
# ---------------------------------------------------------------------------

FDR_Q_U = 100_000_000  # q = 0.10 in 1e-9 p-value micro-units


def fdr_bh_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over one test per part
    brand ("does this brand's return rate differ from the pooled
    rate?") — the multiple-testing gate every wide drift dashboard
    needs: at 25+ simultaneous monitors, per-test α guarantees
    nothing; BH bounds the *false discovery rate* of the alarm set.

    P-values are the Hoeffding tail bound p = min(1, 2·exp(−2nε²))
    — conservative, closed-form, and free of erf (which neither
    engine exposes). Exactness: p quantized to integer 1e-9 units;
    every BH comparison (p_(i) ≤ i·q/m) is cross-multiplied into
    pure BIGINT (p_u·m ≤ rank·q_u), so the step-up cutoff is
    integer-exact. One lineitem⋈part join (AQE picks the strategy —
    part scales with SF, no forced broadcast), one 25-row brand
    rollup, windows only over that metadata frame."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", flag(F.col("l_returnflag") == "R").alias("is_ret")
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_brand = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("is_ret").alias("n_returns"),
        )
    )
    w_all = Window.partitionBy()
    with_pool = per_brand.select(
        "p_brand",
        "n_lines",
        "n_returns",
        F.sum("n_lines").over(w_all).alias("tot_n"),
        F.sum("n_returns").over(w_all).alias("tot_r"),
        F.count(F.lit(1)).over(w_all).alias("m_tests"),
    )
    eps = (
        F.col("n_returns").cast("double") / F.col("n_lines").cast("double")
        - F.col("tot_r").cast("double") / F.col("tot_n").cast("double")
    )
    p_u = F.round(
        F.least(
            F.lit(1.0),
            F.lit(2.0)
            * F.exp(F.lit(-2.0) * F.col("n_lines").cast("double") * eps * eps),
        )
        * F.lit(1e9)
    ).cast("long")
    scored = with_pool.select(
        "p_brand",
        "n_lines",
        "n_returns",
        "m_tests",
        F.round(
            F.col("n_returns").cast("double") / F.col("n_lines").cast("double"),
            6,
        ).alias("return_rate"),
        p_u.alias("p_u"),
    )
    w_rank = Window.orderBy("p_u", "p_brand")
    ranked = scored.select(
        "p_brand",
        "n_lines",
        "n_returns",
        "return_rate",
        "m_tests",
        "p_u",
        F.row_number().over(w_rank).alias("rank"),
    ).select(
        "*",
        flag(
            F.col("p_u") * F.col("m_tests")
            <= F.col("rank").cast("long") * F.lit(FDR_Q_U).cast("long")
        ).alias("qualifies"),
    )
    w_all2 = Window.partitionBy()
    return (
        ranked.select(
            "p_brand",
            "n_lines",
            "n_returns",
            "return_rate",
            F.round(F.col("p_u").cast("double") / F.lit(1e9), 9).alias(
                "p_hoeffding"
            ),
            "rank",
            F.max(F.col("qualifies") * F.col("rank")).over(w_all2).alias("k_star"),
        )
        .select(
            "p_brand",
            "n_lines",
            "n_returns",
            "return_rate",
            "p_hoeffding",
            "rank",
            flag(F.col("rank") <= F.col("k_star")).alias("rejected"),
        )
        .orderBy("rank")
    )


ORACLE_FDR_BH = f"""
WITH per_brand AS (
  SELECT p_brand, COUNT(*) AS n_lines,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returns
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
), pooled AS (
  SELECT p_brand, n_lines, n_returns,
         SUM(n_lines) OVER () AS tot_n,
         SUM(n_returns) OVER () AS tot_r,
         COUNT(*) OVER () AS m_tests
  FROM per_brand
), scored AS (
  SELECT p_brand, n_lines, n_returns, m_tests,
         ROUND(CAST(n_returns AS DOUBLE) / CAST(n_lines AS DOUBLE), 6)
           AS return_rate,
         CAST(ROUND(LEAST(1.0,
                2.0 * exp(-2.0 * CAST(n_lines AS DOUBLE)
                          * (CAST(n_returns AS DOUBLE)
                               / CAST(n_lines AS DOUBLE)
                             - CAST(tot_r AS DOUBLE)
                               / CAST(tot_n AS DOUBLE))
                          * (CAST(n_returns AS DOUBLE)
                               / CAST(n_lines AS DOUBLE)
                             - CAST(tot_r AS DOUBLE)
                               / CAST(tot_n AS DOUBLE))))
                * 1e9) AS BIGINT) AS p_u
  FROM pooled
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY p_u, p_brand) AS rank
  FROM scored
), flagged AS (
  SELECT *,
         CASE WHEN p_u * m_tests <= rank * {FDR_Q_U} THEN 1 ELSE 0 END
           AS qualifies
  FROM ranked
)
SELECT p_brand, n_lines, CAST(n_returns AS BIGINT) AS n_returns,
       return_rate,
       ROUND(CAST(p_u AS DOUBLE) / 1e9, 9) AS p_hoeffding,
       CAST(rank AS BIGINT) AS rank,
       CASE WHEN rank <= MAX(qualifies * rank) OVER () THEN 1 ELSE 0 END
         AS rejected
FROM flagged
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Delta-method CI for a ratio metric (avg order value per segment)
# ---------------------------------------------------------------------------

def delta_method_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error and 95% CI for the ratio metric
    "revenue per order" with CUSTOMER-level clustering, per market
    segment — the one-pass alternative to ``bootstrap_order_value``:
    at 100 TB you cannot afford B resamples, but Var(x̄/ȳ) ≈
    (s_x² − 2R·s_xy + R²·s_y²)/(n·ȳ²) needs only the five mixed
    moments, which map-combine in a single pass. Clustering at the
    customer (not order) level is what makes the CI honest when one
    user contributes many correlated orders.

    Exactness: per-customer revenue quantized to whole kilodollars
    (the welch_ttest idiom) so all five moments are pure BIGINT
    through the shuffle; R, SE, CI are scalar doubles per segment
    row, textually mirrored in the oracle."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "cast(sum(cast(floor(o_totalprice) as bigint)) as bigint)"
                " div 1000"
            ).alias("x"),
            F.count(F.lit(1)).alias("y"),
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    seg = (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    xbar = F.col("sx").cast("double") / nd
    ybar = F.col("sy").cast("double") / nd
    vx = F.col("sxx").cast("double") / nd - xbar * xbar
    vy = F.col("syy").cast("double") / nd - ybar * ybar
    cxy = F.col("sxy").cast("double") / nd - xbar * ybar
    ratio = xbar / ybar
    se = F.sqrt(
        (vx - F.lit(2.0) * ratio * cxy + ratio * ratio * vy)
        / (nd * ybar * ybar)
    )
    return seg.select(
        "c_mktsegment",
        "n",
        F.round(ratio, 6).alias("kusd_per_order"),
        F.round(se, 6).alias("se_delta"),
        F.round(ratio - F.lit(1.96) * se, 6).alias("ci_lo"),
        F.round(ratio + F.lit(1.96) * se, 6).alias("ci_hi"),
    ).orderBy("c_mktsegment")


ORACLE_DELTA_METHOD = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) // 1000
           AS x,
         COUNT(*) AS y
  FROM orders GROUP BY o_custkey
), seg AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM per_cust JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment, n,
       ROUND((CAST(sx AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n), 6)
         AS kusd_per_order,
       ROUND(sqrt(((CAST(sxx AS DOUBLE) / n
                    - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                   - 2.0 * ((CAST(sx AS DOUBLE) / n)
                            / (CAST(sy AS DOUBLE) / n))
                     * (CAST(sxy AS DOUBLE) / n
                        - (CAST(sx AS DOUBLE) / n)
                          * (CAST(sy AS DOUBLE) / n))
                   + ((CAST(sx AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n))
                     * ((CAST(sx AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n))
                     * (CAST(syy AS DOUBLE) / n
                        - (CAST(sy AS DOUBLE) / n)
                          * (CAST(sy AS DOUBLE) / n)))
                  / (n * (CAST(sy AS DOUBLE) / n)
                       * (CAST(sy AS DOUBLE) / n))), 6) AS se_delta,
       ROUND((CAST(sx AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n)
             - 1.96 * sqrt(((CAST(sxx AS DOUBLE) / n
                    - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                   - 2.0 * ((CAST(sx AS DOUBLE) / n)
                            / (CAST(sy AS DOUBLE) / n))
                     * (CAST(sxy AS DOUBLE) / n
                        - (CAST(sx AS DOUBLE) / n)
                          * (CAST(sy AS DOUBLE) / n))
                   + ((CAST(sx AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n))
                     * ((CAST(sx AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n))
                     * (CAST(syy AS DOUBLE) / n
                        - (CAST(sy AS DOUBLE) / n)
                          * (CAST(sy AS DOUBLE) / n)))
                  / (n * (CAST(sy AS DOUBLE) / n)
                       * (CAST(sy AS DOUBLE) / n))), 6) AS ci_lo,
       ROUND((CAST(sx AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n)
             + 1.96 * sqrt(((CAST(sxx AS DOUBLE) / n
                    - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                   - 2.0 * ((CAST(sx AS DOUBLE) / n)
                            / (CAST(sy AS DOUBLE) / n))
                     * (CAST(sxy AS DOUBLE) / n
                        - (CAST(sx AS DOUBLE) / n)
                          * (CAST(sy AS DOUBLE) / n))
                   + ((CAST(sx AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n))
                     * ((CAST(sx AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n))
                     * (CAST(syy AS DOUBLE) / n
                        - (CAST(sy AS DOUBLE) / n)
                          * (CAST(sy AS DOUBLE) / n)))
                  / (n * (CAST(sy AS DOUBLE) / n)
                       * (CAST(sy AS DOUBLE) / n))), 6) AS ci_hi
FROM seg
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Experiment power analysis — minimum detectable effect per segment
# ---------------------------------------------------------------------------

MDE_Z_SUM = 2.8  # z_{alpha/2} + z_{power} = 1.96 + 0.84 (80% power, 5% alpha)


def power_analysis_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect of a 50/50 customer-level revenue
    experiment, per market segment — the number a team consults
    BEFORE launching: MDE = (z_{α/2}+z_{β})·√(2σ²/(n/2)) on the
    per-customer revenue metric. Read together with
    ``delta_method_ratio_ci`` it closes the experiment-design loop:
    design (this) → run → infer (CI).

    Exactness: per-customer revenue in whole kilodollars (the Welch
    quantization), (n, Σx, Σx²) integer moments per segment in one
    pass; the MDE formula is scalar doubles on the ≤5-row segment
    frame, textually mirrored."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "cast(sum(cast(floor(o_totalprice) as bigint)) as bigint)"
                " div 1000"
            ).alias("x")
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    seg = (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    nd = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / nd
    var = F.col("sxx").cast("double") / nd - mean * mean
    mde = F.lit(MDE_Z_SUM) * F.sqrt(F.lit(2.0) * var / (nd / F.lit(2.0)))
    return seg.select(
        "c_mktsegment",
        "n",
        F.round(mean, 6).alias("mean_kusd"),
        F.round(F.sqrt(var), 6).alias("sd_kusd"),
        F.round(mde, 6).alias("mde_kusd"),
        F.round(mde / mean, 6).alias("mde_relative"),
    ).orderBy("c_mktsegment")


ORACLE_POWER_MDE = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) // 1000
           AS x
  FROM orders GROUP BY o_custkey
), seg AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM per_cust JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment, n,
       ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_kusd,
       ROUND(sqrt(CAST(sxx AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)),
             6) AS sd_kusd,
       ROUND({MDE_Z_SUM} * sqrt(2.0 * (CAST(sxx AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                  / (n / 2.0)), 6) AS mde_kusd,
       ROUND({MDE_Z_SUM} * sqrt(2.0 * (CAST(sxx AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                  / (n / 2.0)) / (CAST(sx AS DOUBLE) / n), 6)
         AS mde_relative
FROM seg
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Freedman-Diaconis adaptive histogram
# ---------------------------------------------------------------------------

def freedman_diaconis_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of order totals with the bin width CHOSEN FROM THE
    DATA by the Freedman-Diaconis rule h = 2·IQR/n^(1/3) — the
    binning every fixed-width histogram in this catalog hard-codes,
    made principled: FD is robust to outliers (IQR, not range) and
    adapts resolution to sample size, so the same query renders a
    sensible histogram at any SF without retuning.

    Exactness: values quantized to whole dollars; the IQR comes
    from exact type-1 quantiles over the dollar-value rollup (the
    KS posture — the unpartitioned cumsum window runs on the
    domain-bounded distinct-value frame, never the fact stream); h
    is one double expression rounded up to whole dollars; the final
    histogram is an integer rollup keyed by the derived bin."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("cast(floor(o_totalprice) as bigint)").alias("d")
    )
    per_val = o.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = per_val.select(
        "d",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    quart = cum.agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cum") * 4 >= F.col("n"), F.col("d"))
        ).alias("q25"),
        F.min(
            F.when(F.col("cum") * 4 >= F.col("n") * 3, F.col("d"))
        ).alias("q75"),
    )
    h = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(
            F.lit(2.0)
            * (F.col("q75") - F.col("q25")).cast("double")
            / F.pow(F.col("n").cast("double"), F.lit(1.0 / 3.0))
        ).cast("long"),
    )
    params = quart.select(
        "n",
        (F.col("q75") - F.col("q25")).alias("iqr_usd"),
        h.alias("bin_usd"),
    )
    return (
        o.crossJoin(F.broadcast(params))
        .groupBy("n", "iqr_usd", "bin_usd", F.expr("d div bin_usd").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bin",
            (F.col("bin") * F.col("bin_usd")).alias("bin_lo_usd"),
            "n_orders",
            "iqr_usd",
            "bin_usd",
        )
        .orderBy("bin")
    )


ORACLE_FD_HISTOGRAM = """
WITH o AS (
  SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS d FROM orders
), per_val AS (
  SELECT d, COUNT(*) AS c FROM o GROUP BY d
), cum AS (
  SELECT d,
         SUM(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS n
  FROM per_val
), quart AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         MIN(CASE WHEN cum * 4 >= n THEN d END) AS q25,
         MIN(CASE WHEN cum * 4 >= n * 3 THEN d END) AS q75
  FROM cum
), params AS (
  SELECT n, q75 - q25 AS iqr_usd,
         GREATEST(CAST(1 AS BIGINT),
                  CAST(CEIL(2.0 * CAST(q75 - q25 AS DOUBLE)
                            / POWER(CAST(n AS DOUBLE), 1.0 / 3.0))
                       AS BIGINT)) AS bin_usd
  FROM quart
)
SELECT d // bin_usd AS bin,
       (d // bin_usd) * bin_usd AS bin_lo_usd,
       COUNT(*) AS n_orders,
       iqr_usd, bin_usd
FROM o, params
GROUP BY 1, 2, iqr_usd, bin_usd
ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Mann-Kendall trend test — non-parametric monotone-trend significance
# ---------------------------------------------------------------------------


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall test for a monotone trend in daily revenue — the
    SIGNIFICANCE companion to ``theil_sen_trend``'s magnitude:
    S = Σ_{i<j} sign(c_j − c_i) over day pairs, the tie-corrected
    variance Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18,
    and the continuity-corrected normal deviate
    Z = (S ∓ 1)/√Var(S). Also reports Kendall's τ_a = S/(n(n−1)/2).

    Scale argument — the theil_sen posture verbatim: the pair space
    is the CALENDAR squared (days², ~2.9M at 7 years, invariant in
    data volume) after a one-pass exact-cents day rollup; the
    day⨯day theta join is a bounded broadcast-nested-loop by
    construction.

    Exactness: S, n and the tie term are exact BIGINT sums of
    {−1,0,+1} comparisons and cubic tie polynomials; the only
    doubles are the final τ/Var/Z divisions, written in
    oracle-identical textual order."""
    day_rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("d"))
        .agg(F.sum(cents("o_totalprice")).alias("c"))
    )
    a = day_rev.select(F.col("d").alias("d1"), F.col("c").alias("c1"))
    b = day_rev.select(F.col("d").alias("d2"), F.col("c").alias("c2"))
    s_row = (
        a.join(F.broadcast(b), F.col("d1") < F.col("d2"))
        .agg(
            F.sum(
                F.when(F.col("c2") > F.col("c1"), 1)
                .when(F.col("c2") < F.col("c1"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    # n and the tie-group polynomial ride one rollup of the SAME
    # day frame (t_g = multiplicity of each revenue value)
    ties = (
        day_rev.groupBy("c")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum("t").alias("n_days"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
        )
    )
    n = F.col("n_days").cast("double")
    var_s = (
        n * (n - 1.0) * (2.0 * n + 5.0)
        - F.col("tie_term").cast("double")
    ) / 18.0
    s = F.col("s_stat").cast("double")
    z = F.when(F.col("s_stat") > 0, (s - 1.0) / F.sqrt(var_s)).when(
        F.col("s_stat") < 0, (s + 1.0) / F.sqrt(var_s)
    ).otherwise(F.lit(0.0))
    return s_row.crossJoin(F.broadcast(ties)).select(
        "n_days",
        "s_stat",
        F.round(s / (n * (n - 1.0) / 2.0), 6).alias("tau_a"),
        F.round(var_s, 6).alias("var_s"),
        F.round(z + F.lit(0.0), 6).alias("z_stat"),
    )


ORACLE_MANN_KENDALL = """
WITH day_rev AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY d
), s_row AS (
  SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM day_rev a JOIN day_rev b ON a.d < b.d
), ties AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n_days,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT COUNT(*) AS t FROM day_rev GROUP BY c)
)
SELECT n_days, s_stat,
       ROUND(CAST(s_stat AS DOUBLE)
             / (CAST(n_days AS DOUBLE) * (n_days - 1.0) / 2.0), 6) AS tau_a,
       ROUND((CAST(n_days AS DOUBLE) * (n_days - 1.0) * (2.0 * n_days + 5.0)
              - CAST(tie_term AS DOUBLE)) / 18.0, 6) AS var_s,
       ROUND(CASE
         WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
           / sqrt((CAST(n_days AS DOUBLE) * (n_days - 1.0)
                   * (2.0 * n_days + 5.0)
                   - CAST(tie_term AS DOUBLE)) / 18.0)
         WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
           / sqrt((CAST(n_days AS DOUBLE) * (n_days - 1.0)
                   * (2.0 * n_days + 5.0)
                   - CAST(tie_term AS DOUBLE)) / 18.0)
         ELSE 0.0 END + 0.0, 6) AS z_stat
FROM s_row CROSS JOIN ties
"""


# ---------------------------------------------------------------------------
# Cramér-von Mises two-sample drift — integrated squared ECDF gap
# ---------------------------------------------------------------------------


def cvm_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises criterion between the urgent vs
    low-priority order-value distributions — the INTEGRATED member
    of the drift family: KS reads the single worst ECDF gap, CvM
    integrates (F_A − F_B)² over every observation, so many small
    coherent gaps (a mean shift KS half-misses) light it up.

    Tie-aware observation form (Anderson 1962):
    T = Σ_v w_v · (F_A(v) − F_B(v))² / (n·m·(n+m)²) · (n·m), i.e.
    T = (n·m/(n+m)²) · Σ_v w_v D_v² /(n·m)² with w_v the combined
    multiplicity at value v — computed on the SAME dollar-quantized
    value grid as ``ks_drift_orders``: bounded by the value domain,
    never the fact stream.

    Exactness: the per-value gap numerator (cumA·m − cumB·n) is an
    exact BIGINT; its square times the weight rides a DECIMAL(38,0)
    sum (128-bit on the oracle side: HUGEINT) so the integral is
    EXACT until one final double division — no float sum over the
    grid whose order could perturb a bit."""
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
        "ca",
        "cb",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = counts.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    d_num = (
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    ).cast("decimal(20,0)")
    integral = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(
            F.sum(
                d_num
                * d_num
                * (F.col("ca") + F.col("cb")).cast("decimal(10,0)")
            ).alias("u_num")
        )
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    return integral.select(
        "n_a",
        "n_b",
        F.round(
            F.col("u_num").cast("double")
            / (na * nb * (na + nb) * (na + nb)),
            6,
        ).alias("cvm_stat"),
    )


ORACLE_CVM_DRIFT = f"""
WITH o AS (
  SELECT CASE WHEN o_orderpriority = '{KS_GROUP_A}' THEN 1 ELSE 0 END AS is_a,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS v
  FROM orders
  WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
), counts AS (
  SELECT v, CAST(SUM(is_a) AS BIGINT) AS ca,
         CAST(SUM(1 - is_a) AS BIGINT) AS cb
  FROM o GROUP BY v
), cum AS (
  SELECT v, ca, cb,
         SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b
  FROM counts
), tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
  FROM counts
), integral AS (
  SELECT n_a, n_b,
         SUM(CAST(cum_a * n_b - cum_b * n_a AS HUGEINT)
             * (cum_a * n_b - cum_b * n_a) * (ca + cb)) AS u_num
  FROM cum CROSS JOIN tot
  GROUP BY n_a, n_b
)
SELECT n_a, n_b,
       ROUND(CAST(u_num AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * n_b * (n_a + n_b) * (n_a + n_b)),
             6) AS cvm_stat
FROM integral
"""


# ---------------------------------------------------------------------------
# Gumbel block-maxima fit — extreme-value model of peak revenue days
# ---------------------------------------------------------------------------

GUMBEL_EULER = 0.5772156649015329


def gumbel_maxima_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel (EV-I) fit to MONTHLY maxima of daily revenue — the
    block-maxima member of the extreme-value family next to
    ``hill_tail_index``'s peaks-over-threshold: method-of-moments
    β̂ = s·√6/π, μ̂ = x̄ − γ·β̂, plus the 99% return level
    μ̂ − β̂·ln(−ln 0.99) ("the monthly peak exceeded once per ~100
    months") — the capacity-planning number.

    Scale: one exact-cents day rollup, one month-max rollup (both
    map-side combined), then a single global (n, Σx, Σx²) aggregate
    over the ~84-row month frame. Maxima are quantized to whole
    kilodollars so Σx² stays inside BIGINT at any tested SF (the
    welch_ttest idiom; at true 100 TB re-quantize to megadollars —
    one constant).

    Exactness: (n, Σx, Σx²) are exact integers; mean, sample s²,
    and the three Gumbel outputs are the only doubles, evaluated in
    oracle-identical textual order."""
    day_rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
                "mo"
            ),
            epoch_day("o_orderdate").alias("d"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("c"))
    )
    mo_max = day_rev.groupBy("mo").agg(
        F.expr("max(c) div 100000").alias("x")
    )
    agg = mo_max.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_months").cast("double")
    mean = F.col("sx").cast("double") / n
    var = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / n
    ) / (n - 1.0)
    beta = F.sqrt(var * 6.0) / F.lit(math.pi)
    mu = mean - F.lit(GUMBEL_EULER) * beta
    return agg.select(
        "n_months",
        F.round(mean, 6).alias("mean_max_kusd"),
        F.round(beta, 6).alias("beta_kusd"),
        F.round(mu, 6).alias("mu_kusd"),
        F.round(
            mu - beta * F.log(-F.log(F.lit(0.99))), 6
        ).alias("return_level_p99"),
    )


ORACLE_GUMBEL_FIT = f"""
WITH day_rev AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mo,
         CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY mo, d
), mo_max AS (
  SELECT mo, MAX(c) // 100000 AS x FROM day_rev GROUP BY mo
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM mo_max
)
SELECT n_months,
       ROUND(CAST(sx AS DOUBLE) / n_months, 6) AS mean_max_kusd,
       ROUND(sqrt((CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_months)
                  / (n_months - 1.0) * 6.0) / pi(), 6) AS beta_kusd,
       ROUND(CAST(sx AS DOUBLE) / n_months
             - {GUMBEL_EULER} * (sqrt((CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_months)
                  / (n_months - 1.0) * 6.0) / pi()), 6) AS mu_kusd,
       ROUND(CAST(sx AS DOUBLE) / n_months
             - {GUMBEL_EULER} * (sqrt((CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_months)
                  / (n_months - 1.0) * 6.0) / pi())
             - (sqrt((CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_months)
                  / (n_months - 1.0) * 6.0) / pi())
               * ln(-ln(0.99)), 6) AS return_level_p99
FROM agg
"""


# ---------------------------------------------------------------------------
# Huber robust mean — IRLS location estimate on the value grid
# ---------------------------------------------------------------------------

HUBER_C = 1.345  # 95%-efficiency tuning constant
MAD_CONSISTENCY = 1.4826


def huber_mean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimate of the typical order value — the location
    number between the median (throws away magnitude) and the mean
    (one whale moves it): two IRLS iterations from the median, with
    k = {HUBER_C}·(MAD·{MAD_CONSISTENCY}) — reported next to both so
    the gap IS the outlier-influence readout.

    The whole estimate lives on the dollar-quantized VALUE GRID
    (the ks_drift_orders posture): one fact rollup to (value, count)
    cells, then median, MAD, and both reweighting iterations are
    grid-sized arithmetic — at 100 TB the iterations never touch
    the fact again (IRLS weight depends only on the value, so the
    grid rollup is a sufficient statistic).

    Exactness: counts and dollar values are exact BIGINTs; weights
    are quantized to 1e4 BEFORE the weighted sums (the micro-nats
    discipline — bigint sums are merge-order-proof), so each
    iteration is exact integers around ONE double division."""
    grid = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.expr(
                "cast(round(o_totalprice * 100) as bigint) div 100"
            ).alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "v", "cnt", F.sum("cnt").over(w_cum).alias("cum")
    )
    tot = grid.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("v") * F.col("cnt")).alias("sv"),
    )
    med_row = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= (F.col("n") + 1).cast("long") / 2)
        .agg(F.min("v").alias("med"))
    )
    dev = (
        grid.crossJoin(F.broadcast(med_row))
        .groupBy(F.abs(F.col("v") - F.col("med")).alias("d"))
        .agg(F.sum("cnt").alias("dc"))
    )
    w_dev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    mad_row = (
        dev.select("d", F.sum("dc").over(w_dev).alias("dcum"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("dcum") >= (F.col("n") + 1).cast("long") / 2)
        .agg(F.min("d").alias("mad"))
    )

    def irls(frame, m_col):
        k = F.lit(HUBER_C * MAD_CONSISTENCY) * F.col("mad").cast("double")
        ad = F.abs(F.col("v").cast("double") - m_col)
        wq = F.when(ad <= k, F.lit(10000).cast("long")).otherwise(
            F.round(k * 1e4 / ad, 0).cast("long")
        )
        return frame.groupBy("n", "sv", "med", "mad", "m_prev").agg(
            F.sum(F.col("cnt") * wq * F.col("v")).alias("num"),
            F.sum(F.col("cnt") * wq).alias("den"),
        ).select(
            "n",
            "sv",
            "med",
            "mad",
            (F.col("num").cast("double") / F.col("den").cast("double")).alias(
                "m_prev"
            ),
        )

    base = (
        grid.crossJoin(F.broadcast(med_row))
        .crossJoin(F.broadcast(mad_row))
        .crossJoin(F.broadcast(tot))
        .withColumn("m_prev", F.col("med").cast("double"))
    )
    it1 = irls(base, F.col("m_prev"))
    it2 = irls(
        grid.crossJoin(F.broadcast(it1)), F.col("m_prev")
    )
    return it2.select(
        "n",
        F.col("med").alias("median_usd"),
        F.col("mad").alias("mad_usd"),
        F.round(
            F.lit(HUBER_C * MAD_CONSISTENCY) * F.col("mad").cast("double"),
            6,
        ).alias("huber_k"),
        F.round(F.col("sv").cast("double") / F.col("n").cast("double"), 6)
        .alias("mean_usd"),
        F.round(F.col("m_prev"), 6).alias("huber_mean_usd"),
    )


ORACLE_HUBER_MEAN = f"""
WITH grid AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS v,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(v * cnt) AS BIGINT) AS sv
  FROM grid
), med_row AS (
  SELECT MIN(v) AS med
  FROM (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM grid)
  CROSS JOIN tot
  WHERE cum >= CAST(n + 1 AS DOUBLE) / 2
), mad_row AS (
  SELECT MIN(d) AS mad FROM (
    SELECT d, SUM(dc) OVER (ORDER BY d) AS dcum FROM (
      SELECT ABS(v - med) AS d, CAST(SUM(cnt) AS BIGINT) AS dc
      FROM grid CROSS JOIN med_row GROUP BY 1
    )
  ) CROSS JOIN tot
  WHERE dcum >= CAST(n + 1 AS DOUBLE) / 2
), it1 AS (
  SELECT n, sv, med, mad,
         CAST(SUM(cnt * wq * v) AS DOUBLE) / CAST(SUM(cnt * wq) AS DOUBLE)
           AS m_prev
  FROM (
    SELECT g.v, g.cnt, t.n, t.sv, m.med, d.mad,
           CASE WHEN ABS(CAST(g.v AS DOUBLE) - CAST(m.med AS DOUBLE))
                     <= {HUBER_C * MAD_CONSISTENCY} * CAST(d.mad AS DOUBLE)
                THEN 10000
                ELSE CAST(ROUND({HUBER_C * MAD_CONSISTENCY}
                     * CAST(d.mad AS DOUBLE) * 10000.0
                     / ABS(CAST(g.v AS DOUBLE) - CAST(m.med AS DOUBLE)))
                     AS BIGINT) END AS wq
    FROM grid g CROSS JOIN med_row m CROSS JOIN mad_row d CROSS JOIN tot t
  )
  GROUP BY n, sv, med, mad
), it2 AS (
  SELECT n, sv, med, mad,
         CAST(SUM(cnt * wq * v) AS DOUBLE) / CAST(SUM(cnt * wq) AS DOUBLE)
           AS m_prev
  FROM (
    SELECT g.v, g.cnt, i.n, i.sv, i.med, i.mad,
           CASE WHEN ABS(CAST(g.v AS DOUBLE) - i.m_prev)
                     <= {HUBER_C * MAD_CONSISTENCY} * CAST(i.mad AS DOUBLE)
                THEN 10000
                ELSE CAST(ROUND({HUBER_C * MAD_CONSISTENCY}
                     * CAST(i.mad AS DOUBLE) * 10000.0
                     / ABS(CAST(g.v AS DOUBLE) - i.m_prev)) AS BIGINT)
                END AS wq
    FROM grid g CROSS JOIN it1 i
  )
  GROUP BY n, sv, med, mad
)
SELECT n, med AS median_usd, mad AS mad_usd,
       ROUND({HUBER_C * MAD_CONSISTENCY} * CAST(mad AS DOUBLE), 6)
         AS huber_k,
       ROUND(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_usd,
       ROUND(m_prev, 6) AS huber_mean_usd
FROM it2
"""


# ---------------------------------------------------------------------------
# Anderson-Darling two-sample — tail-weighted EDF drift test
# ---------------------------------------------------------------------------


def anderson_darling_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling statistic (the tie-adjusted
    midrank A²akN of Scholz-Stephens 1987) between the urgent vs
    low-priority order-value distributions — completing the EDF
    drift trio: KS reads the worst gap, CvM the integrated gap, AD
    re-weights the integral by 1/(F(1−F)) so TAIL drift (the region
    dedup and outlier screens live in) dominates. Under H₀ the
    statistic's expectation is k−1 = 1.

    Same dollar-quantized value grid as ``ks_drift_orders``/
    ``cvm_drift_orders``: the fact collapses map-side to per-value
    cells and every cumulative lives on that bounded frame.

    Exactness: all midrank quantities ride 2×-scaled INTEGERS
    (2·cum − count kills the halves); each value's summand is one
    deterministic IEEE expression over exact-in-double integers,
    quantized to micro-units BEFORE the grid sum (bigint sums are
    merge-order-proof); the final (N−1)/N/n_i scaling mirrors the
    oracle textually."""
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
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "v",
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("w"),
        F.sum("ca").over(w_cum).alias("cum_a"),
        F.sum("cb").over(w_cum).alias("cum_b"),
    )
    tot = counts.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    j = cum.crossJoin(F.broadcast(tot)).select(
        "*", (F.col("n_a") + F.col("n_b")).alias("nn")
    )
    # midranks in half-units: B2 = 2·cum_w − w, M2_i = 2·cum_i − c_i
    b2 = 2 * (F.col("cum_a") + F.col("cum_b")) - F.col("w")
    m2a = 2 * F.col("cum_a") - F.col("ca")
    m2b = 2 * F.col("cum_b") - F.col("cb")
    denom = (b2 * (2 * F.col("nn") - b2) - F.col("nn") * F.col("w")).cast(
        "double"
    )
    da = (F.col("nn") * m2a - F.col("n_a") * b2).cast("double")
    db_ = (F.col("nn") * m2b - F.col("n_b") * b2).cast("double")
    term_a = F.round(
        F.col("w").cast("double") * da * da / denom * 1e6, 0
    ).cast("long")
    term_b = F.round(
        F.col("w").cast("double") * db_ * db_ / denom * 1e6, 0
    ).cast("long")
    agg = j.groupBy("n_a", "n_b", "nn").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum(term_a).alias("sa_e6"),
        F.sum(term_b).alias("sb_e6"),
    )
    nn = F.col("nn").cast("double")
    a2 = (
        (nn - 1.0)
        / nn
        * (
            F.col("sa_e6").cast("double")
            / F.col("n_a").cast("double")
            + F.col("sb_e6").cast("double") / F.col("n_b").cast("double")
        )
        / 1e6
        / nn
    )
    return agg.select(
        "n_a",
        "n_b",
        "n_values",
        F.round(a2, 6).alias("a2_akn"),
    )


ORACLE_AD_DRIFT = f"""
WITH o AS (
  SELECT CASE WHEN o_orderpriority = '{KS_GROUP_A}' THEN 1 ELSE 0 END AS is_a,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS v
  FROM orders
  WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
), counts AS (
  SELECT v, CAST(SUM(is_a) AS BIGINT) AS ca,
         CAST(SUM(1 - is_a) AS BIGINT) AS cb
  FROM o GROUP BY v
), cum AS (
  SELECT v, ca, cb, ca + cb AS w,
         SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b
  FROM counts
), tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
  FROM counts
), terms AS (
  SELECT n_a, n_b, n_a + n_b AS nn,
         CAST(ROUND(CAST(w AS DOUBLE)
              * CAST((n_a + n_b) * (2 * cum_a - ca)
                     - n_a * (2 * (cum_a + cum_b) - w) AS DOUBLE)
              * CAST((n_a + n_b) * (2 * cum_a - ca)
                     - n_a * (2 * (cum_a + cum_b) - w) AS DOUBLE)
              / CAST((2 * (cum_a + cum_b) - w)
                     * (2 * (n_a + n_b) - (2 * (cum_a + cum_b) - w))
                     - (n_a + n_b) * w AS DOUBLE) * 1000000.0)
              AS BIGINT) AS ta_e6,
         CAST(ROUND(CAST(w AS DOUBLE)
              * CAST((n_a + n_b) * (2 * cum_b - cb)
                     - n_b * (2 * (cum_a + cum_b) - w) AS DOUBLE)
              * CAST((n_a + n_b) * (2 * cum_b - cb)
                     - n_b * (2 * (cum_a + cum_b) - w) AS DOUBLE)
              / CAST((2 * (cum_a + cum_b) - w)
                     * (2 * (n_a + n_b) - (2 * (cum_a + cum_b) - w))
                     - (n_a + n_b) * w AS DOUBLE) * 1000000.0)
              AS BIGINT) AS tb_e6
  FROM cum CROSS JOIN tot
), agg AS (
  SELECT n_a, n_b, nn, CAST(COUNT(*) AS BIGINT) AS n_values,
         CAST(SUM(ta_e6) AS BIGINT) AS sa_e6,
         CAST(SUM(tb_e6) AS BIGINT) AS sb_e6
  FROM terms GROUP BY n_a, n_b, nn
)
SELECT n_a, n_b, n_values,
       ROUND((CAST(nn AS DOUBLE) - 1.0) / CAST(nn AS DOUBLE)
             * (CAST(sa_e6 AS DOUBLE) / CAST(n_a AS DOUBLE)
                + CAST(sb_e6 AS DOUBLE) / CAST(n_b AS DOUBLE))
             / 1000000.0 / CAST(nn AS DOUBLE), 6) AS a2_akn
FROM agg
"""


# ---------------------------------------------------------------------------
# Dunn's post-hoc test — which priority pairs differ, after KW rejects
# ---------------------------------------------------------------------------

DUNN_Z_CRIT_BONF10 = 2.807  # two-sided α=0.05 / 10 pairwise comparisons


def dunn_posthoc_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's pairwise rank test over all five order priorities —
    the drilldown ``kruskal_wallis_priority`` hands off to once H
    rejects: which PAIRS differ, with the Bonferroni-corrected
    z-criterion (α=0.05 over the 10 comparisons → |z| > {DUNN_Z_CRIT_BONF10}).
    Every pair reuses the ONE global tie-averaged rank frame — no
    per-pair re-ranking (the error five pairwise Mann-Whitneys
    would make: Dunn compares pairs on the POOLED ranking).

    Exactness: the doubled-rank idiom (rank2 = 2·below+t+1) keeps
    all rank sums exact BIGINT; the tie term is BIGINT; z is a
    handful of double ops on the 10-row pair frame, textually
    mirrored in the oracle.

    Plan: the kruskal posture verbatim (fact → cent-value grid →
    one join back → 5-row group frame), then a 5×5 theta pair join
    on the GROUP frame (bounded by the priority domain)."""
    ov = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("p"),
        cents("o_totalprice").alias("v"),
    )
    cnt = ov.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    w = Window.orderBy("v")
    rank2 = cnt.select(
        "v",
        (
            2
            * F.coalesce(
                F.sum("t").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            + F.col("t")
            + 1
        ).alias("r2"),
    )
    groups = (
        ov.join(rank2, "v")
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_i"), F.sum("r2").alias("sr2_i"))
    )
    ties = cnt.agg(
        F.sum("t").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "tie_cubes"
        ),
    )
    g1 = groups.select(
        F.col("p").alias("p1"),
        F.col("n_i").alias("n_1"),
        F.col("sr2_i").alias("sr2_1"),
    )
    g2 = groups.select(
        F.col("p").alias("p2"),
        F.col("n_i").alias("n_2"),
        F.col("sr2_i").alias("sr2_2"),
    )
    j = (
        g1.join(F.broadcast(g2), F.col("p1") < F.col("p2"))
        .crossJoin(F.broadcast(ties))
    )
    n_d = F.col("n").cast("double")
    m1 = F.col("sr2_1").cast("double") / 2.0 / F.col("n_1").cast("double")
    m2 = F.col("sr2_2").cast("double") / 2.0 / F.col("n_2").cast("double")
    var = (
        n_d * (n_d + 1.0) / 12.0
        - F.col("tie_cubes").cast("double") / (12.0 * (n_d - 1.0))
    ) * (
        1.0 / F.col("n_1").cast("double")
        + 1.0 / F.col("n_2").cast("double")
    )
    z = (m1 - m2) / F.sqrt(var)
    return j.select(
        "p1",
        "p2",
        "n_1",
        "n_2",
        F.round(m1, 6).alias("mean_rank_1"),
        F.round(m2, 6).alias("mean_rank_2"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > DUNN_Z_CRIT_BONF10).alias("reject_bonf"),
    ).orderBy("p1", "p2")


ORACLE_DUNN_POSTHOC = f"""
WITH ov AS (
  SELECT o_orderpriority AS p,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
), cnt AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM ov GROUP BY v
), rank2 AS (
  SELECT v,
         2 * COALESCE(SUM(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS r2
  FROM cnt
), groups AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_i,
         CAST(SUM(r2) AS BIGINT) AS sr2_i
  FROM ov JOIN rank2 USING (v) GROUP BY p
), ties AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_cubes
  FROM cnt
)
SELECT a.p AS p1, b.p AS p2, a.n_i AS n_1, b.n_i AS n_2,
       ROUND(CAST(a.sr2_i AS DOUBLE) / 2.0 / CAST(a.n_i AS DOUBLE), 6)
         AS mean_rank_1,
       ROUND(CAST(b.sr2_i AS DOUBLE) / 2.0 / CAST(b.n_i AS DOUBLE), 6)
         AS mean_rank_2,
       ROUND((CAST(a.sr2_i AS DOUBLE) / 2.0 / CAST(a.n_i AS DOUBLE)
              - CAST(b.sr2_i AS DOUBLE) / 2.0 / CAST(b.n_i AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 12.0
                     - CAST(tie_cubes AS DOUBLE)
                       / (12.0 * (CAST(n AS DOUBLE) - 1.0)))
                    * (1.0 / CAST(a.n_i AS DOUBLE)
                       + 1.0 / CAST(b.n_i AS DOUBLE))), 6) AS z_stat,
       ABS((CAST(a.sr2_i AS DOUBLE) / 2.0 / CAST(a.n_i AS DOUBLE)
            - CAST(b.sr2_i AS DOUBLE) / 2.0 / CAST(b.n_i AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 12.0
                   - CAST(tie_cubes AS DOUBLE)
                     / (12.0 * (CAST(n AS DOUBLE) - 1.0)))
                  * (1.0 / CAST(a.n_i AS DOUBLE)
                     + 1.0 / CAST(b.n_i AS DOUBLE))))
         > {DUNN_Z_CRIT_BONF10} AS reject_bonf
FROM groups a JOIN groups b ON a.p < b.p
CROSS JOIN ties
ORDER BY p1, p2
"""


# ---------------------------------------------------------------------------
# PACF — partial autocorrelations via Durbin-Levinson on the ACF
# ---------------------------------------------------------------------------

PACF_LAGS = 3


def pacf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily revenue at lags 1..{PACF_LAGS}
    — the AR-order identifier ``revenue_acf_profile`` can't give
    (ACF of an AR(1) decays forever; its PACF CUTS OFF after lag 1
    — the cutoff lag IS the model order a forecaster fits):
    Durbin-Levinson recursion unrolled in closed form over the
    1-row ACF frame.

    Plan/exactness: the revenue_acf posture verbatim — one
    calendar-bounded day rollup, lags off ONE window, centered
    products rounded to whole units before the bigint sums; the
    Durbin-Levinson algebra is a handful of doubles on a 1-row
    frame, textually mirrored in the oracle."""
    day = (
        load_table(spark, sf_dir, "orders")
        .select(
            epoch_day("o_orderdate").alias("d"),
            (cents("o_totalprice") / 100).cast("long").alias("v"),
        )
        .groupBy("d")
        .agg(F.sum("v").alias("x"))
    )
    tot = day.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    w = Window.orderBy("d")
    lagged = day.crossJoin(F.broadcast(tot)).select(
        "x",
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias(
            "m"
        ),
        *[
            F.lag("x", k).over(w).alias(f"x{k}")
            for k in range(1, PACF_LAGS + 1)
        ],
    )
    micro = lambda e: F.round(e, 0).cast("long")  # noqa: E731
    cx = F.col("x").cast("double") - F.col("m")
    agg = lagged.agg(
        F.sum(micro(cx * cx)).alias("den"),
        *[
            F.sum(
                micro(cx * (F.col(f"x{k}").cast("double") - F.col("m")))
            ).alias(f"num_{k}")
            for k in range(1, PACF_LAGS + 1)
        ],
    )
    rho = [
        F.col(f"num_{k}").cast("double") / F.col("den").cast("double")
        for k in range(1, PACF_LAGS + 1)
    ]
    r1, r2, r3 = rho
    p11 = r1
    p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    p21 = r1 * (1.0 - p22)
    p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    cells = agg.select(
        F.round(r1, 6).alias("acf_1"),
        F.round(r2, 6).alias("acf_2"),
        F.round(r3, 6).alias("acf_3"),
        F.round(p11, 6).alias("pacf_1"),
        F.round(p22, 6).alias("pacf_2"),
        F.round(p33, 6).alias("pacf_3"),
    )
    return cells.selectExpr(
        "stack(3, 1L, acf_1, pacf_1, 2L, acf_2, pacf_2,"
        " 3L, acf_3, pacf_3) AS (lag, acf, pacf)"
    ).orderBy("lag")


_PACF_RHO = {
    k: f"(CAST(num_{k} AS DOUBLE) / CAST(den AS DOUBLE))" for k in (1, 2, 3)
}
_P22 = (
    f"(({_PACF_RHO[2]} - {_PACF_RHO[1]} * {_PACF_RHO[1]})"
    f" / (1.0 - {_PACF_RHO[1]} * {_PACF_RHO[1]}))"
)
_P21 = f"({_PACF_RHO[1]} * (1.0 - {_P22}))"
_P33 = (
    f"(({_PACF_RHO[3]} - {_P21} * {_PACF_RHO[2]}"
    f" - {_P22} * {_PACF_RHO[1]})"
    f" / (1.0 - {_P21} * {_PACF_RHO[1]} - {_P22} * {_PACF_RHO[2]}))"
)

ORACLE_PACF = f"""
WITH day AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100)
              AS BIGINT) AS x
  FROM orders GROUP BY d
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
  FROM day
), lagged AS (
  SELECT x, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         LAG(x, 1) OVER (ORDER BY d) AS x1,
         LAG(x, 2) OVER (ORDER BY d) AS x2,
         LAG(x, 3) OVER (ORDER BY d) AS x3
  FROM day CROSS JOIN tot
), agg AS (
  SELECT CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) - m)
                             * (CAST(x AS DOUBLE) - m), 0) AS BIGINT))
              AS BIGINT) AS den,
         CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) - m)
                             * (CAST(x1 AS DOUBLE) - m), 0) AS BIGINT))
              AS BIGINT) AS num_1,
         CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) - m)
                             * (CAST(x2 AS DOUBLE) - m), 0) AS BIGINT))
              AS BIGINT) AS num_2,
         CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) - m)
                             * (CAST(x3 AS DOUBLE) - m), 0) AS BIGINT))
              AS BIGINT) AS num_3
  FROM lagged
), cells AS (
  SELECT ROUND({_PACF_RHO[1]}, 6) AS acf_1,
         ROUND({_PACF_RHO[2]}, 6) AS acf_2,
         ROUND({_PACF_RHO[3]}, 6) AS acf_3,
         ROUND({_PACF_RHO[1]}, 6) AS pacf_1,
         ROUND({_P22}, 6) AS pacf_2,
         ROUND({_P33}, 6) AS pacf_3
  FROM agg
)
SELECT lag, acf, pacf FROM (
  SELECT 1 AS lag, acf_1 AS acf, pacf_1 AS pacf FROM cells
  UNION ALL SELECT 2, acf_2, pacf_2 FROM cells
  UNION ALL SELECT 3, acf_3, pacf_3 FROM cells
)
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# Periodogram at candidate periods — DETECT the cycle, don't assume it
# ---------------------------------------------------------------------------

PERIODOGRAM_PERIODS = (7, 14, 30, 91, 365)


def periodogram_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-frequency periodogram of daily revenue at the
    {len(PERIODOGRAM_PERIODS)} business-plausible candidate periods
    {PERIODOGRAM_PERIODS} — the frequency-domain DETECTOR behind
    ``stl_weekly_profile``'s period-7 ASSUMPTION: power
    I(p) = (A²+B²)/n with A = Σ(x_d−x̄)cos(2πd/p),
    B = Σ(x_d−x̄)sin(2πd/p). The winning period feeds STL /
    seasonal-naive; a flat profile says don't deseasonalize.

    Plan: ONE calendar-bounded day rollup crossed with the 5-row
    period grid (bounded by the QUESTION); per-period A, B are
    map-combined integer sums. Exactness: centered cos/sin products
    round to whole units before the bigint sums (the revenue_acf
    idiom — the angle doubles are identical IEEE on both engines
    since d%p is exact integer); A²+B² rides DECIMAL(38,0)/HUGEINT
    so the share denominator is exact; final divisions textual."""
    day = (
        load_table(spark, sf_dir, "orders")
        .select(
            epoch_day("o_orderdate").alias("d"),
            (cents("o_totalprice") / 100).cast("long").alias("v"),
        )
        .groupBy("d")
        .agg(F.sum("v").alias("x"))
    )
    tot = day.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    per = tot.select(
        "n",
        "sx",
        F.explode(
            F.array(*[F.lit(p) for p in PERIODOGRAM_PERIODS]).cast(
                "array<long>"
            )
        ).alias("p"),
    )
    j = day.crossJoin(F.broadcast(per))
    cx = F.col("x").cast("double") - F.col("sx").cast("double") / F.col(
        "n"
    ).cast("double")
    ang = (
        F.lit(2.0 * math.pi)
        * (F.col("d") % F.col("p")).cast("double")
        / F.col("p").cast("double")
    )
    ab = j.groupBy("p", "n").agg(
        F.sum(F.round(cx * F.cos(ang), 0).cast("long")).alias("a"),
        F.sum(F.round(cx * F.sin(ang), 0).cast("long")).alias("b"),
    )
    pw_num = (
        F.col("a").cast("decimal(20,0)") * F.col("a").cast("decimal(20,0)")
        + F.col("b").cast("decimal(20,0)")
        * F.col("b").cast("decimal(20,0)")
    )
    w_all = Window.partitionBy()
    ranked = ab.select(
        "p",
        "n",
        pw_num.alias("pw_num"),
    ).select(
        "p",
        "n",
        "pw_num",
        F.sum("pw_num").over(w_all).alias("pw_tot"),
        F.row_number()
        .over(Window.orderBy(F.desc("pw_num"), F.asc("p")))
        .alias("rk"),
    )
    return ranked.select(
        F.col("p").alias("period"),
        F.round(
            F.col("pw_num").cast("double") / F.col("n").cast("double"), 2
        ).alias("power"),
        F.round(
            F.col("pw_num").cast("double") / F.col("pw_tot").cast("double"),
            6,
        ).alias("power_share"),
        (F.col("rk") == 1).alias("is_peak"),
    ).orderBy("period")


ORACLE_PERIODOGRAM = f"""
WITH day AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100)
              AS BIGINT) AS x
  FROM orders GROUP BY d
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
  FROM day
), per AS (
  SELECT n, sx, CAST(u.p AS BIGINT) AS p
  FROM tot, UNNEST([{", ".join(str(p) for p in PERIODOGRAM_PERIODS)}]) u(p)
), ab AS (
  SELECT p, n,
         CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE)
                              - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  * cos(2.0 * pi() * CAST(d % p AS DOUBLE)
                        / CAST(p AS DOUBLE)), 0) AS BIGINT)) AS BIGINT)
           AS a,
         CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE)
                              - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  * sin(2.0 * pi() * CAST(d % p AS DOUBLE)
                        / CAST(p AS DOUBLE)), 0) AS BIGINT)) AS BIGINT)
           AS b
  FROM day CROSS JOIN per
  GROUP BY p, n
), ranked AS (
  SELECT p, n,
         CAST(a AS HUGEINT) * a + CAST(b AS HUGEINT) * b AS pw_num,
         SUM(CAST(a AS HUGEINT) * a + CAST(b AS HUGEINT) * b) OVER ()
           AS pw_tot,
         ROW_NUMBER() OVER (ORDER BY CAST(a AS HUGEINT) * a
                            + CAST(b AS HUGEINT) * b DESC, p ASC) AS rk
  FROM ab
)
SELECT p AS period,
       ROUND(CAST(pw_num AS DOUBLE) / CAST(n AS DOUBLE), 2) AS power,
       ROUND(CAST(pw_num AS DOUBLE) / CAST(pw_tot AS DOUBLE), 6)
         AS power_share,
       rk = 1 AS is_peak
FROM ranked
ORDER BY period
"""


# ---------------------------------------------------------------------------
# Seasonal / trend strength — is the decomposition worth using?
# ---------------------------------------------------------------------------


def seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman's strength-of-components indices on the
    ``stl_weekly_profile`` decomposition: F_seasonal =
    max(0, 1 − Var(R)/Var(S+R)) and F_trend =
    max(0, 1 − Var(R)/Var(T+R)) — the two scalars that say whether
    the weekly cycle and the trend are REAL before anyone
    deseasonalizes or differences (``periodogram_peaks`` finds the
    period; this says how much of the variance it owns).

    Plan: the STL-lite posture verbatim — calendar-day rollup,
    7-day RANGE-window trend, 7-row seasonal means broadcast back —
    then two passes over the day frame (totals, squared
    deviations), all calendar-bounded.

    Exactness: detrended/remainder/deseasonalized values ride
    integer micro-dollars (seasonal means rounded once per dow);
    squared deviations round to whole dollar² units before the
    bigint sums (the acf idiom); the variance ratios are the only
    free doubles."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint) div 100")
            ).alias("y")
        )
    )
    wr = Window.orderBy("day").rangeBetween(-3, 3)
    detr = (
        daily.select(
            "day",
            "y",
            F.sum("y").over(wr).alias("wy"),
            F.count(F.lit(1)).over(wr).alias("wn"),
        )
        .filter(F.col("wn") == 7)
        .select(
            (F.col("day") % 7).alias("dow"),
            "y",
            F.round(
                (
                    F.col("y").cast("double")
                    - F.col("wy").cast("double") / F.col("wn")
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("d_micro"),
        )
    )
    seas = detr.groupBy("dow").agg(
        F.round(
            F.sum("d_micro").cast("double") / F.count(F.lit(1)), 0
        )
        .cast("long")
        .alias("s_micro")
    )
    cells = detr.join(F.broadcast(seas), "dow").select(
        "d_micro",
        (F.col("d_micro") - F.col("s_micro")).alias("r_micro"),
        (F.col("y") * F.lit(1000000) - F.col("s_micro")).alias("v_micro"),
    )
    tot = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d_micro").alias("sd"),
        F.sum("r_micro").alias("sr"),
        F.sum("v_micro").alias("sv"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    sq = lambda x, s: F.round(  # noqa: E731 — dollar²-scale deviation
        ((x.cast("double") - F.col(s).cast("double") / F.col("n")) / 1e6)
        * ((x.cast("double") - F.col(s).cast("double") / F.col("n")) / 1e6),
        0,
    ).cast("long")
    var_agg = j.groupBy("n").agg(
        F.sum(sq(F.col("d_micro"), "sd")).alias("ss_d"),
        F.sum(sq(F.col("r_micro"), "sr")).alias("ss_r"),
        F.sum(sq(F.col("v_micro"), "sv")).alias("ss_v"),
    )
    f_s = F.greatest(
        F.lit(0.0),
        1.0 - F.col("ss_r").cast("double") / F.col("ss_d").cast("double"),
    )
    f_t = F.greatest(
        F.lit(0.0),
        1.0 - F.col("ss_r").cast("double") / F.col("ss_v").cast("double"),
    )
    return var_agg.select(
        F.col("n").alias("n_days"),
        F.round(
            F.col("ss_d").cast("double") / F.col("n").cast("double"), 1
        ).alias("var_detrended"),
        F.round(
            F.col("ss_r").cast("double") / F.col("n").cast("double"), 1
        ).alias("var_remainder"),
        F.round(
            F.col("ss_v").cast("double") / F.col("n").cast("double"), 1
        ).alias("var_deseasonalized"),
        F.round(f_s, 6).alias("f_seasonal"),
        F.round(f_t, 6).alias("f_trend"),
    )


ORACLE_SEASONAL_STRENGTH = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100)
              AS BIGINT) AS y
  FROM orders GROUP BY day
), detr AS (
  SELECT day % 7 AS dow, y,
         CAST(ROUND((CAST(y AS DOUBLE) - CAST(wy AS DOUBLE) / wn)
                    * 1000000, 0) AS BIGINT) AS d_micro
  FROM (
    SELECT day, y,
           CAST(SUM(y) OVER (ORDER BY day
                RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
             AS wy,
           COUNT(*) OVER (ORDER BY day
                RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
    FROM daily
  ) WHERE wn = 7
), seas AS (
  SELECT dow, CAST(ROUND(CAST(SUM(d_micro) AS DOUBLE) / COUNT(*), 0)
                   AS BIGINT) AS s_micro
  FROM detr GROUP BY dow
), cells AS (
  SELECT d_micro, d_micro - s_micro AS r_micro,
         y * 1000000 - s_micro AS v_micro
  FROM detr JOIN seas USING (dow)
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(d_micro) AS BIGINT) AS sd,
         CAST(SUM(r_micro) AS BIGINT) AS sr,
         CAST(SUM(v_micro) AS BIGINT) AS sv
  FROM cells
), var_agg AS (
  SELECT n,
         CAST(SUM(CAST(ROUND(((CAST(d_micro AS DOUBLE)
                 - CAST(sd AS DOUBLE) / n) / 1000000.0)
              * ((CAST(d_micro AS DOUBLE)
                 - CAST(sd AS DOUBLE) / n) / 1000000.0), 0) AS BIGINT))
              AS BIGINT) AS ss_d,
         CAST(SUM(CAST(ROUND(((CAST(r_micro AS DOUBLE)
                 - CAST(sr AS DOUBLE) / n) / 1000000.0)
              * ((CAST(r_micro AS DOUBLE)
                 - CAST(sr AS DOUBLE) / n) / 1000000.0), 0) AS BIGINT))
              AS BIGINT) AS ss_r,
         CAST(SUM(CAST(ROUND(((CAST(v_micro AS DOUBLE)
                 - CAST(sv AS DOUBLE) / n) / 1000000.0)
              * ((CAST(v_micro AS DOUBLE)
                 - CAST(sv AS DOUBLE) / n) / 1000000.0), 0) AS BIGINT))
              AS BIGINT) AS ss_v
  FROM cells CROSS JOIN tot
  GROUP BY n
)
SELECT n AS n_days,
       ROUND(CAST(ss_d AS DOUBLE) / CAST(n AS DOUBLE), 1)
         AS var_detrended,
       ROUND(CAST(ss_r AS DOUBLE) / CAST(n AS DOUBLE), 1)
         AS var_remainder,
       ROUND(CAST(ss_v AS DOUBLE) / CAST(n AS DOUBLE), 1)
         AS var_deseasonalized,
       ROUND(GREATEST(0.0, 1.0 - CAST(ss_r AS DOUBLE)
                               / CAST(ss_d AS DOUBLE)), 6) AS f_seasonal,
       ROUND(GREATEST(0.0, 1.0 - CAST(ss_r AS DOUBLE)
                               / CAST(ss_v AS DOUBLE)), 6) AS f_trend
FROM var_agg
"""


# ---------------------------------------------------------------------------
# Variance-ratio test — is the revenue series a random walk?
# ---------------------------------------------------------------------------

VR_HORIZONS = (2, 4, 8)


def variance_ratio_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance ratio of daily revenue at horizons
    {VR_HORIZONS}: VR(q) = Var(q-day change)/(q·Var(1-day change)).
    A random walk gives VR ≈ 1 at every q; VR < 1 says mean
    reversion (shocks die out — difference once and stop), VR > 1
    says momentum — the differencing-order advisor that sits
    between ``pacf_profile`` (AR order) and ``seasonal_strength``
    (decomposition worth).

    Plan: one calendar-day rollup; the q-day changes are lag reads
    off ONE unpartitioned window over the bounded day frame.

    Exactness: each squared change rounds to whole dollar² units
    before the bigint sums (the acf idiom — changes are already
    mean-free up to the drift term, which is subtracted as the
    exact-integer mean change); one double division per horizon."""
    day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint) div 100")
            ).alias("x")
        )
    )
    w = Window.orderBy("d")
    lagged = day.select(
        "x",
        *[
            F.lag("x", q).over(w).alias(f"x{q}")
            for q in (1,) + VR_HORIZONS
        ],
    )
    tot = lagged.agg(
        F.count("x1").alias("n1"),
        F.sum(F.col("x") - F.col("x1")).alias("s1"),
        *[
            expr
            for q in VR_HORIZONS
            for expr in (
                F.count(f"x{q}").alias(f"n{q}"),
                F.sum(F.col("x") - F.col(f"x{q}")).alias(f"s{q}"),
            )
        ],
    )
    j = lagged.crossJoin(F.broadcast(tot))

    def ssq(q: int) -> F.Column:
        d = (F.col("x") - F.col(f"x{q}")).cast("double") - F.col(
            f"s{q}"
        ).cast("double") / F.col(f"n{q}").cast("double")
        return F.sum(F.round(d * d, 0).cast("long")).alias(f"ss{q}")

    agg = j.groupBy(
        "n1", *[F.col(f"n{q}") for q in VR_HORIZONS]
    ).agg(ssq(1), *[ssq(q) for q in VR_HORIZONS])
    rows = []
    for q in VR_HORIZONS:
        var1 = F.col("ss1").cast("double") / F.col("n1").cast("double")
        varq = F.col(f"ss{q}").cast("double") / F.col(
            f"n{q}"
        ).cast("double")
        rows.append(
            F.struct(
                F.lit(q).cast("long").alias("q"),
                F.col(f"n{q}").alias("n_obs"),
                F.round(varq / (F.lit(float(q)) * var1), 6).alias(
                    "variance_ratio"
                ),
            )
        )
    return (
        agg.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.q", "r.n_obs", "r.variance_ratio")
        .orderBy("q")
    )


def _vr_oracle() -> str:
    lags = ", ".join(
        f"LAG(x, {q}) OVER (ORDER BY d) AS x{q}"
        for q in (1,) + VR_HORIZONS
    )
    tot = ", ".join(
        f"CAST(COUNT(x{q}) AS BIGINT) AS n{q},"
        f" CAST(SUM(x - x{q}) AS BIGINT) AS s{q}"
        for q in (1,) + VR_HORIZONS
    )
    ss = ", ".join(
        f"CAST(SUM(CAST(ROUND((CAST(x - x{q} AS DOUBLE)"
        f" - CAST(s{q} AS DOUBLE) / n{q})"
        f" * (CAST(x - x{q} AS DOUBLE)"
        f" - CAST(s{q} AS DOUBLE) / n{q}), 0) AS BIGINT)) AS BIGINT)"
        f" AS ss{q}"
        for q in (1,) + VR_HORIZONS
    )
    ns = ", ".join(f"n{q}" for q in (1,) + VR_HORIZONS)
    arms = "\n  UNION ALL ".join(
        f"SELECT {q} AS q, n{q} AS n_obs,"
        f" ROUND((CAST(ss{q} AS DOUBLE) / CAST(n{q} AS DOUBLE))"
        f" / ({q}.0 * (CAST(ss1 AS DOUBLE) / CAST(n1 AS DOUBLE))), 6)"
        f" AS variance_ratio FROM agg"
        for q in VR_HORIZONS
    )
    return f"""
WITH day AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100)
              AS BIGINT) AS x
  FROM orders GROUP BY d
), lagged AS (
  SELECT x, {lags} FROM day
), tot AS (
  SELECT {tot} FROM lagged
), agg AS (
  SELECT {ns}, {ss}
  FROM lagged CROSS JOIN tot
  GROUP BY {ns}
)
SELECT q, n_obs, variance_ratio FROM (
  {arms}
)
ORDER BY q
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test — randomness of daily up/down moves
# ---------------------------------------------------------------------------


def runs_test_updown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the SIGNS of daily revenue
    changes — the distribution-free randomness check under
    ``variance_ratio_walk``'s magnitudes: too few runs = momentum
    (ups clump), too many = mean-reversion flip-flop;
    z = (R − E[R])/√Var with E[R] = 2n₊n₋/(n₊+n₋) + 1. Ties (flat
    days) drop, the classical convention.

    Plan: calendar-day rollup, one lag for the sign, one lag OVER
    THE FILTERED SIGN SEQUENCE for the run boundaries — both
    windows on the bounded day frame.

    Exactness: n₊, n₋ and the run count are exact BIGINTs; E, Var,
    z are the only doubles, textually mirrored."""
    day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(epoch_day("o_orderdate").alias("d"))
        .agg(F.sum(cents("o_totalprice")).alias("x"))
    )
    w = Window.orderBy("d")
    signs = (
        day.select(
            "d",
            (F.col("x") - F.lag("x", 1).over(w)).alias("diff"),
        )
        .filter(F.col("diff").isNotNull() & (F.col("diff") != 0))
        .select(
            "d", F.when(F.col("diff") > 0, 1).otherwise(0).alias("s")
        )
    )
    runs = signs.select(
        "s",
        F.when(
            F.lag("s", 1).over(w).isNull()
            | (F.lag("s", 1).over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("s").alias("n_up"),
        F.sum(1 - F.col("s")).alias("n_down"),
        F.sum("new_run").alias("n_runs"),
    )
    n1 = F.col("n_up").cast("double")
    n2 = F.col("n_down").cast("double")
    e_r = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var_r = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return agg.select(
        "n_up",
        "n_down",
        "n_runs",
        F.round(e_r, 6).alias("expected_runs"),
        F.round(
            (F.col("n_runs").cast("double") - e_r) / F.sqrt(var_r), 6
        ).alias("z_stat"),
    )


ORACLE_RUNS_TEST = """
WITH day AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS x
  FROM orders GROUP BY d
), signs AS (
  SELECT d, CASE WHEN diff > 0 THEN 1 ELSE 0 END AS s
  FROM (SELECT d, x - LAG(x, 1) OVER (ORDER BY d) AS diff FROM day)
  WHERE diff IS NOT NULL AND diff != 0
), runs AS (
  SELECT s, CASE WHEN LAG(s, 1) OVER (ORDER BY d) IS NULL
                   OR LAG(s, 1) OVER (ORDER BY d) != s
                 THEN 1 ELSE 0 END AS new_run
  FROM signs
), agg AS (
  SELECT CAST(SUM(s) AS BIGINT) AS n_up,
         CAST(SUM(1 - s) AS BIGINT) AS n_down,
         CAST(SUM(new_run) AS BIGINT) AS n_runs
  FROM runs
)
SELECT n_up, n_down, n_runs,
       ROUND(2.0 * n_up * n_down / (n_up + n_down) + 1.0, 6)
         AS expected_runs,
       ROUND((CAST(n_runs AS DOUBLE)
              - (2.0 * n_up * n_down / (n_up + n_down) + 1.0))
             / sqrt(2.0 * n_up * n_down
                    * (2.0 * n_up * n_down - n_up - n_down)
                    / ((n_up + n_down) * (n_up + n_down)
                       * (n_up + n_down - 1.0))), 6) AS z_stat
FROM agg
"""


# ---------------------------------------------------------------------------
# Mood's median test — the coarse, outlier-proof k-group location test
# ---------------------------------------------------------------------------

MOOD_CHI2_CRIT_95_DF4 = 9.488


def moods_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the five order priorities: count
    above vs at-or-below the GLOBAL median per group, χ² on the
    2×k table. The bluntest member of the k-group family — it uses
    only which side of the median each order lands on, so a single
    corrupt billion-dollar order cannot move it at all (Kruskal-
    Wallis uses full ranks; this is the extreme-robustness end).

    Plan: one fact rollup to the cent-value grid for the median
    pick (the huber posture), one group rollup for the 2×k table;
    everything after lives on ≤k rows.

    Exactness: all counts exact BIGINT; each cell's χ² contribution
    quantizes to 1e-6 units before the cross-group sum (order-
    proof); expected counts are exact rationals in double."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("p"),
        cents("o_totalprice").alias("v"),
    )
    grid = o.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = grid.agg(F.sum("t").alias("n"))
    med_row = (
        grid.select("v", F.sum("t").over(w_cum).alias("cum"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= (F.col("n") + 1).cast("double") / 2)
        .agg(F.min("v").alias("med"))
    )
    groups = (
        o.crossJoin(F.broadcast(med_row))
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.sum(flag(F.col("v") > F.col("med"))).alias("above"),
        )
    )
    gt = groups.agg(
        F.sum("n_g").alias("n"), F.sum("above").alias("tot_above")
    )
    j = groups.crossJoin(F.broadcast(gt))
    e_above = (
        F.col("n_g").cast("double")
        * F.col("tot_above").cast("double")
        / F.col("n").cast("double")
    )
    e_below = (
        F.col("n_g").cast("double")
        * (F.col("n") - F.col("tot_above")).cast("double")
        / F.col("n").cast("double")
    )
    oa = F.col("above").cast("double")
    ob = (F.col("n_g") - F.col("above")).cast("double")
    cell_e6 = F.round(
        ((oa - e_above) * (oa - e_above) / e_above
         + (ob - e_below) * (ob - e_below) / e_below) * 1e6,
        0,
    ).cast("long")
    w_all = Window.partitionBy()
    return (
        j.select(
            "p",
            "n_g",
            "above",
            F.round(e_above, 6).alias("expected_above"),
            F.sum(cell_e6).over(w_all).alias("chi2_e6"),
        )
        .select(
            "p",
            "n_g",
            "above",
            "expected_above",
            F.round(F.col("chi2_e6").cast("double") / 1e6, 6).alias(
                "chi2_stat"
            ),
            (
                F.col("chi2_e6").cast("double") / 1e6
                > MOOD_CHI2_CRIT_95_DF4
            ).alias("reject_same_median"),
        )
        .orderBy("p")
    )


ORACLE_MOODS_MEDIAN = f"""
WITH o AS (
  SELECT o_orderpriority AS p,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
), grid AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM o GROUP BY v
), tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n FROM grid
), med_row AS (
  SELECT MIN(v) AS med
  FROM (SELECT v, SUM(t) OVER (ORDER BY v) AS cum FROM grid)
  CROSS JOIN tot
  WHERE cum >= CAST(n + 1 AS DOUBLE) / 2
), groups AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT)
           AS above
  FROM o CROSS JOIN med_row GROUP BY p
), gt AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(above) AS BIGINT) AS tot_above
  FROM groups
), cells AS (
  SELECT p, n_g, above,
         CAST(n_g AS DOUBLE) * CAST(tot_above AS DOUBLE)
           / CAST(n AS DOUBLE) AS e_above,
         CAST(ROUND(((CAST(above AS DOUBLE)
                - CAST(n_g AS DOUBLE) * CAST(tot_above AS DOUBLE)
                  / CAST(n AS DOUBLE))
               * (CAST(above AS DOUBLE)
                - CAST(n_g AS DOUBLE) * CAST(tot_above AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / (CAST(n_g AS DOUBLE) * CAST(tot_above AS DOUBLE)
                  / CAST(n AS DOUBLE))
             + (CAST(n_g - above AS DOUBLE)
                - CAST(n_g AS DOUBLE)
                  * CAST(n - tot_above AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(n_g - above AS DOUBLE)
                - CAST(n_g AS DOUBLE)
                  * CAST(n - tot_above AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n_g AS DOUBLE)
                  * CAST(n - tot_above AS DOUBLE) / CAST(n AS DOUBLE)))
             * 1000000.0, 0) AS BIGINT) AS cell_e6
  FROM groups CROSS JOIN gt
)
SELECT p, n_g, above,
       ROUND(e_above, 6) AS expected_above,
       ROUND(CAST(SUM(cell_e6) OVER () AS DOUBLE) / 1000000.0, 6)
         AS chi2_stat,
       CAST(SUM(cell_e6) OVER () AS DOUBLE) / 1000000.0
         > {MOOD_CHI2_CRIT_95_DF4} AS reject_same_median
FROM cells
ORDER BY p
"""


# ---------------------------------------------------------------------------
# Taylor's law — variance-mean fluctuation scaling across event types
# ---------------------------------------------------------------------------


def taylors_law_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taylor's power law across event types: Var(daily count) ≈
    a·Mean^b, fit as ln Var = ln a + b·ln Mean over the per-type
    daily-count moments. b ≈ 1 is Poisson arrivals; b → 2 is
    burst/cluster dominated — the one-number answer to "can I model
    this stream as Poisson" that sizing, sampling-error and anomaly
    thresholds all assume. Reports per-type mean/variance plus the
    fitted slope and intercept on every row.

    Plan: one (type, day) rollup, one per-type exact moment
    aggregate, then a 2-parameter OLS over the ≤|types| frame.

    Exactness: per-type (n, Σc, Σc²) exact BIGINT; ln mean / ln var
    quantize to micro-nats per type before the cross-type OLS sums
    (order-proof integers); slope/intercept are the only free
    doubles."""
    td = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", epoch_day("cast(ts as timestamp)").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mom = td.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    n = F.col("n_days").cast("double")
    mean = F.col("sc").cast("double") / n
    var = (
        F.col("scc").cast("double")
        - F.col("sc").cast("double") * F.col("sc").cast("double") / n
    ) / (n - 1.0)
    pts = mom.select(
        "event_type",
        "n_days",
        F.round(mean, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(F.log(mean) * 1e6, 0).cast("long").alias("lx_e6"),
        F.round(F.log(var) * 1e6, 0).cast("long").alias("ly_e6"),
    )
    w_all = Window.partitionBy()
    ols = pts.select(
        "*",
        F.count(F.lit(1)).over(w_all).alias("k"),
        F.sum("lx_e6").over(w_all).alias("sx"),
        F.sum("ly_e6").over(w_all).alias("sy"),
        F.sum(F.col("lx_e6") * F.col("lx_e6")).over(w_all).alias("sxx"),
        F.sum(F.col("lx_e6") * F.col("ly_e6")).over(w_all).alias("sxy"),
    )
    kk = F.col("k").cast("double")
    slope = (
        kk * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        kk * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    intercept = (
        F.col("sy").cast("double") / kk
        - slope * F.col("sx").cast("double") / kk
    ) / 1e6
    return ols.select(
        "event_type",
        "n_days",
        "mean_daily",
        "var_daily",
        F.round(slope, 6).alias("taylor_b"),
        F.round(intercept, 6).alias("ln_a"),
    ).orderBy("event_type")


ORACLE_TAYLORS_LAW = """
WITH td AS (
  SELECT event_type,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT)
           AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(c * c) AS BIGINT) AS scc
  FROM td GROUP BY event_type
), pts AS (
  SELECT event_type, n_days,
         ROUND(CAST(sc AS DOUBLE) / n_days, 6) AS mean_daily,
         ROUND((CAST(scc AS DOUBLE)
                - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n_days)
               / (n_days - 1.0), 6) AS var_daily,
         CAST(ROUND(ln(CAST(sc AS DOUBLE) / n_days) * 1000000.0, 0)
              AS BIGINT) AS lx_e6,
         CAST(ROUND(ln((CAST(scc AS DOUBLE)
                - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n_days)
               / (n_days - 1.0)) * 1000000.0, 0) AS BIGINT) AS ly_e6
  FROM mom
), ols AS (
  SELECT event_type, n_days, mean_daily, var_daily,
         COUNT(*) OVER () AS k,
         SUM(lx_e6) OVER () AS sx, SUM(ly_e6) OVER () AS sy,
         SUM(lx_e6 * lx_e6) OVER () AS sxx,
         SUM(lx_e6 * ly_e6) OVER () AS sxy
  FROM pts
)
SELECT event_type, n_days, mean_daily, var_daily,
       ROUND((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
         AS taylor_b,
       ROUND((CAST(sy AS DOUBLE) / CAST(k AS DOUBLE)
              - ((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE) / CAST(k AS DOUBLE)) / 1000000.0, 6)
         AS ln_a
FROM ols
ORDER BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "taylors_law_events": QuerySpec(
        taylors_law_events,
        ORACLE_TAYLORS_LAW,
        ["A1", "A4", "§2.8", "X-ts"],
    ),
    "moods_median_test": QuerySpec(
        moods_median_test,
        ORACLE_MOODS_MEDIAN,
        ["A1", "A4", "§2.8", "X-curation"],
    ),
    "runs_test_updown": QuerySpec(
        runs_test_updown,
        ORACLE_RUNS_TEST,
        ["A1", "A4", "§2.8", "X-ts"],
    ),
    "variance_ratio_walk": QuerySpec(
        variance_ratio_walk,
        _vr_oracle(),
        ["A1", "A4", "§2.8", "X-ts"],
    ),
    "seasonal_strength": QuerySpec(
        seasonal_strength,
        ORACLE_SEASONAL_STRENGTH,
        ["A1", "A4", "§2.8", "X-ts"],
    ),
    "pacf_profile": QuerySpec(
        pacf_profile,
        ORACLE_PACF,
        ["A1", "A4", "§2.8", "X-ts"],
    ),
    "periodogram_peaks": QuerySpec(
        periodogram_peaks,
        ORACLE_PERIODOGRAM,
        ["A1", "A4", "§2.8", "X-ts"],
    ),
    "dunn_posthoc_priority": QuerySpec(
        dunn_posthoc_priority,
        ORACLE_DUNN_POSTHOC,
        ["A1", "A4", "J3", "§2.8", "X-curation"],
    ),
    "anderson_darling_drift": QuerySpec(
        anderson_darling_drift,
        ORACLE_AD_DRIFT,
        ["A1", "A4", "§2.8", "X-curation"],
    ),
    "huber_mean_orders": QuerySpec(
        huber_mean_orders,
        ORACLE_HUBER_MEAN,
        ["A1", "A4", "§2.8", "X-curation"],
    ),
    "mann_kendall_trend": QuerySpec(
        mann_kendall_trend,
        ORACLE_MANN_KENDALL,
        ["A1", "A4", "J3", "X-ts", "X-curation"],
    ),
    "cvm_drift_orders": QuerySpec(
        cvm_drift_orders,
        ORACLE_CVM_DRIFT,
        ["A1", "A4", "§2.8", "X-curation"],
    ),
    "gumbel_maxima_fit": QuerySpec(
        gumbel_maxima_fit,
        ORACLE_GUMBEL_FIT,
        ["A1", "A4", "X-ts", "X-curation"],
    ),
    "freedman_diaconis_histogram": QuerySpec(
        freedman_diaconis_histogram,
        ORACLE_FD_HISTOGRAM,
        ["A1", "A4", "§2.8", "X-curation"],
    ),
    "anova_weekday_revenue": QuerySpec(
        anova_weekday_revenue, ORACLE_ANOVA_WEEKDAY, ["A1", "A4", "X-curation"]
    ),
    "forecast_backtest_naive": QuerySpec(
        forecast_backtest_naive,
        ORACLE_FORECAST_BACKTEST,
        ["A4", "§2.8", "X-ts"],
    ),
    "zipf_fit_tokens": QuerySpec(
        zipf_fit_tokens, ORACLE_ZIPF_FIT, ["A1", "T1", "X-curation"]
    ),
    "cusum_changepoint": QuerySpec(
        cusum_changepoint, ORACLE_CUSUM_CHANGEPOINT, ["A4", "§2.8", "X-ts"]
    ),
    "ols_break_scan": QuerySpec(
        ols_break_scan, ORACLE_OLS_BREAK, ["A1", "A5", "§2.8", "X-ts", "T1"]
    ),
    "stratified_ate": QuerySpec(
        stratified_ate, ORACLE_STRATIFIED_ATE, ["A1", "A5", "J1", "X-curation"]
    ),
    "stl_weekly_profile": QuerySpec(
        stl_weekly_profile, ORACLE_STL_WEEKLY, ["A1", "§2.8", "X-ts"]
    ),
    "user_behavior_entropy": QuerySpec(
        user_behavior_entropy,
        ORACLE_USER_BEHAVIOR_ENTROPY,
        ["A1", "T1", "X-curation"],
    ),
    "trend_slope_by_segment": QuerySpec(
        trend_slope_by_segment,
        ORACLE_TREND_SLOPE,
        ["A1", "J1", "§2.8", "X-ts"],
    ),
    "gini_customer_revenue": QuerySpec(
        gini_customer_revenue, ORACLE_GINI, ["A1", "A4", "§2.8", "X-curation"]
    ),
    "lorenz_deciles": QuerySpec(
        lorenz_deciles, ORACLE_LORENZ, ["A1", "§2.8", "X-curation"]
    ),
    "psi_value_drift": QuerySpec(
        psi_value_drift, ORACLE_PSI_VALUE_DRIFT, ["A1", "A4", "X-curation"]
    ),
    "benford_first_digit": QuerySpec(
        benford_first_digit, ORACLE_BENFORD, ["A1", "A4", "X-curation"]
    ),
    "revenue_autocorr_lag1": QuerySpec(
        revenue_autocorr_lag1,
        ORACLE_REVENUE_AUTOCORR,
        ["A4", "§2.8", "X-ts"],
    ),
    "ks_drift_orders": QuerySpec(
        ks_drift_orders, ORACLE_KS_DRIFT, ["A1", "A4", "X-curation"]
    ),
    "mann_whitney_drift": QuerySpec(
        mann_whitney_drift, ORACLE_MANN_WHITNEY, ["A1", "A4", "X-curation"]
    ),
    "welch_ttest_drift": QuerySpec(
        welch_ttest_drift, ORACLE_WELCH_TTEST, ["A1", "A4", "X-curation"]
    ),
    "permutation_test_revenue": QuerySpec(
        permutation_test_revenue,
        ORACLE_PERMUTATION_TEST,
        ["A1", "A4", "X-curation"],
    ),
    "diebold_mariano_backtest": QuerySpec(
        diebold_mariano_backtest,
        ORACLE_DIEBOLD_MARIANO,
        ["A1", "A4", "§2.8", "X-ts"],
    ),
    "brown_forsythe_priority": QuerySpec(
        brown_forsythe_priority,
        ORACLE_BROWN_FORSYTHE,
        ["A1", "A4", "J1", "§2.8", "X-curation"],
    ),
    "wasserstein_drift_orders": QuerySpec(
        wasserstein_drift_orders,
        ORACLE_WASSERSTEIN,
        ["A1", "A4", "§2.8", "X-curation"],
    ),
    "cochran_armitage_trend": QuerySpec(
        cochran_armitage_trend,
        ORACLE_COCHRAN_ARMITAGE,
        ["A4", "X-curation"],
    ),
    "mantel_haenszel_returns": QuerySpec(
        mantel_haenszel_returns,
        ORACLE_MANTEL_HAENSZEL,
        ["A1", "J1", "X-curation"],
    ),
    "kruskal_wallis_priority": QuerySpec(
        kruskal_wallis_priority,
        ORACLE_KRUSKAL,
        ["A1", "A4", "J1", "§2.8", "X-curation"],
    ),
    "jarque_bera_orders": QuerySpec(
        jarque_bera_orders,
        ORACLE_JARQUE_BERA,
        ["A4", "X-curation"],
    ),
    "ljung_box_revenue": QuerySpec(
        ljung_box_revenue,
        ORACLE_LJUNG_BOX,
        ["A1", "A4", "§2.8", "X-ts"],
    ),
    "revenue_acf_profile": QuerySpec(
        revenue_acf_profile,
        ORACLE_REVENUE_ACF,
        ["A1", "A4", "§2.8", "X-ts"],
    ),
    "hill_tail_index": QuerySpec(
        hill_tail_index,
        ORACLE_HILL_TAIL,
        ["A4", "T1", "X-curation"],
    ),
    "diff_in_diff_revenue": QuerySpec(
        diff_in_diff_revenue,
        ORACLE_DIFF_IN_DIFF,
        ["A1", "A4", "A5", "X-curation", "X-ts"],
    ),
    "mutual_info_assoc": QuerySpec(
        mutual_info_assoc, ORACLE_MUTUAL_INFO, ["A1", "A4", "X-curation"]
    ),
    "quantile_treatment_effect": QuerySpec(
        quantile_treatment_effect, ORACLE_QTE, ["A1", "§2.8", "X-curation"]
    ),
    "cuped_adjusted_ab": QuerySpec(
        cuped_adjusted_ab, ORACLE_CUPED, ["A1", "A4", "A5", "X-curation"]
    ),
    "sax_revenue_motifs": QuerySpec(
        sax_revenue_motifs, ORACLE_SAX_MOTIFS, ["A1", "§2.8", "T1", "X-ts"]
    ),
    "theil_sen_trend": QuerySpec(
        theil_sen_trend, ORACLE_THEIL_SEN, ["A4", "J3", "§2.8", "X-ts"]
    ),
    "conformal_forecast_interval": QuerySpec(
        conformal_forecast_interval,
        ORACLE_CONFORMAL,
        ["A4", "§2.8", "X-ts", "X-curation"],
    ),
    "spearman_price_qty": QuerySpec(
        spearman_price_qty, ORACLE_SPEARMAN, ["A1", "A4", "J1", "X-curation"]
    ),
    "kendall_tau_discount_qty": QuerySpec(
        kendall_tau_discount_qty,
        ORACLE_KENDALL_TAU,
        ["A1", "A4", "P16", "X-curation"],
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
    "cramers_v_assoc": QuerySpec(
        cramers_v_assoc, ORACLE_CRAMERS_V, ["A1", "A4", "X-curation"]
    ),
    "g_test_assoc": QuerySpec(
        g_test_assoc, ORACLE_G_TEST, ["A1", "A4", "X-curation"]
    ),
    "fdr_bh_brands": QuerySpec(
        fdr_bh_brands, ORACLE_FDR_BH, ["A1", "J1", "T1", "X-curation"]
    ),
    "delta_method_ratio_ci": QuerySpec(
        delta_method_ratio_ci,
        ORACLE_DELTA_METHOD,
        ["A1", "A5", "J1", "X-curation"],
    ),
    "power_analysis_mde": QuerySpec(
        power_analysis_mde,
        ORACLE_POWER_MDE,
        ["A1", "A5", "J1", "X-curation"],
    ),
}
