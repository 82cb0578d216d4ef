"""Corpus curation: sampling and outlier-trim operators over the
``documents`` table — SURVEY.md §2.13 extension (the steps between
dedup and training-data export in an LLM data pipeline: mix control
and length trimming).

Reference analogue: the reference has no sampling surface (its
pipelines always read whole collections); these are the operations a
100 TB corpus needs before anything else touches it, implemented as
pure native expressions so they ride the scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.scalar import md5_u32
from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table

# 2^32 — the md5_u32 range; divides a hash into a uniform U(0,1)
# (shared by the Spark sides and, via f-string interpolation, the
# oracles, so the two dialects can never desynchronize)
DP_U32 = 4294967296.0
WS_TOPK = 50  # weighted-sample output size (Spark side + oracle LIMIT)

# per-language keep-rates (percent) for the driver query: downsample
# the majority language, keep the tail
STRATA_PCT = {"en": 35, "de": 80, "fr": 80}
DEFAULT_PCT = 100


def sample_stratified(
    df: DataFrame,
    key: str,
    stratum: str,
    rates_pct: dict[str, int],
    default_pct: int = 100,
    denom: int = 100,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    ``key mod denom < rate(stratum)``. Unlike ``df.sampleBy`` this is
    reproducible across runs, partitionings, and engines — the
    property that makes a corpus mix auditable — and it is a pure
    narrow filter: no shuffle, no RNG state, pushes down to the scan.

    The synthetic ``doc_id`` is dense and uniform so a plain modulo
    is unbiased here; on real corpora with structured ids use
    ``F.pmod(F.xxhash64(key), denom)`` instead — same plan shape, but
    no cross-engine SQL oracle (xxhash64 is Spark-specific), which is
    why the oracled query form keeps the modulo."""
    rate = F.lit(default_pct)
    for s, pct in rates_pct.items():
        rate = F.when(F.col(stratum) == s, F.lit(pct)).otherwise(rate)
    return df.filter(F.pmod(F.col(key), F.lit(denom)) < rate)


def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: stratified sample of documents by language with
    per-language before/after counts — the mix-rebalancing audit
    table (one row per language, exact)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    sampled = sample_stratified(docs, "doc_id", "lang", STRATA_PCT)
    before = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    after = sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("chars_sampled"),
    )
    return (
        before.join(after, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("chars_sampled", F.lit(0)).alias("chars_sampled"),
        )
        .orderBy("lang")
    )


_RATE_CASE = "CASE " + " ".join(
    f"WHEN lang = '{s}' THEN {p}" for s, p in STRATA_PCT.items()
) + f" ELSE {DEFAULT_PCT} END"

ORACLE_SAMPLE_STRATIFIED = f"""
WITH sampled AS (
  SELECT lang, n_chars FROM documents
  WHERE doc_id % 100 < {_RATE_CASE}
), after AS (
  SELECT lang, COUNT(*) AS n_sampled,
         CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
  FROM sampled GROUP BY lang
)
SELECT d.lang, COUNT(*) AS n_total,
       COALESCE(ANY_VALUE(after.n_sampled), 0) AS n_sampled,
       COALESCE(ANY_VALUE(after.chars_sampled), 0) AS chars_sampled
FROM documents d LEFT JOIN after ON d.lang = after.lang
GROUP BY d.lang
ORDER BY d.lang
"""


def length_quantile_filter(
    df: DataFrame, group: str, col: str, lo: float = 0.05, hi: float = 0.95
) -> DataFrame:
    """Trim per-group length outliers: keep rows whose ``col`` lies
    within the group's [lo, hi] quantiles (exact ``percentile``,
    linear interpolation — same definition as SQL quantile_cont).
    Plan: one small per-group aggregate (two doubles per group) →
    broadcast back onto the fact → narrow filter. The fact table
    never shuffles; at 100 TB swap the exact percentile for
    ``approx_percentile`` and nothing else changes."""
    bounds = df.groupBy(group).agg(
        F.percentile(col, F.lit(lo)).alias("__q_lo"),
        F.percentile(col, F.lit(hi)).alias("__q_hi"),
    )
    return (
        df.join(F.broadcast(bounds), group)
        .filter(F.col(col).between(F.col("__q_lo"), F.col("__q_hi")))
        .drop("__q_lo", "__q_hi")
    )


def docs_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: per-source doc counts and char mass after
    trimming to the source's [p05, p95] length band."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    kept = length_quantile_filter(docs, "source", "n_chars")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("n_chars").alias("min_len"),
            F.max("n_chars").alias("max_len"),
            F.sum("n_chars").alias("chars_kept"),
        )
        .orderBy("source")
    )


ORACLE_DOCS_LENGTH_TRIM = """
WITH bounds AS (
  SELECT source,
         quantile_cont(n_chars, 0.05) AS q_lo,
         quantile_cont(n_chars, 0.95) AS q_hi
  FROM documents GROUP BY source
)
SELECT d.source, COUNT(*) AS n_kept,
       MIN(n_chars) AS min_len, MAX(n_chars) AS max_len,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept
FROM documents d JOIN bounds b ON d.source = b.source
WHERE n_chars BETWEEN q_lo AND q_hi
GROUP BY d.source
ORDER BY d.source
"""


DOMAIN_CAP = 400  # max documents kept per source


def cap_per_group(
    df: DataFrame, group: str, order: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically
    by ``order`` — the per-domain cap every web-scale corpus applies
    so a single giant host cannot dominate the mixture (Common
    Crawl-style curation). One exchange on the group key; the
    row_number window is the top-k-per-group shape the engine
    already plans with a partial sort, and the deterministic order
    key (not RNG) makes the kept set reproducible and auditable."""
    w = Window.partitionBy(group).orderBy(F.asc(order))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: cap each source at {DOMAIN_CAP} docs (ordered
    by doc_id) and report the per-source retention — before/after
    counts and the kept char mass."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    kept = cap_per_group(docs, "source", "doc_id", DOMAIN_CAP)
    before = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_before")
    )
    after = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
    )
    return before.join(after, "source").orderBy("source")


ORACLE_DOMAIN_CAP = f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), before AS (
  SELECT source, COUNT(*) AS n_before FROM documents GROUP BY source
), after AS (
  SELECT source, COUNT(*) AS n_kept,
         CAST(SUM(n_chars) AS BIGINT) AS chars_kept
  FROM ranked WHERE rn <= {DOMAIN_CAP} GROUP BY source
)
SELECT b.source, b.n_before, a.n_kept, a.chars_kept
FROM before b JOIN after a ON b.source = a.source
ORDER BY b.source
"""


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without replacement (Efraimidis-
    Spirakis A-Res), fully deterministic: each doc draws a uniform
    u ∈ [0,1) from the md5 of its key (the one hash both engines
    compute bit-identically), gets priority u^(1/w) with w = n_chars,
    and the k largest priorities win — longer documents
    proportionally more likely, yet the sample is reproducible
    across engines, partitionings, and reruns (no RNG state).
    Priorities are rounded at 9 dp because ``pow`` is not required
    to be correctly rounded — JVM Math.pow (fdlibm) and C libm may
    differ in the last ulp; 9 dp gives both engines headroom.

    Plan: priority is a scan-stage expression; the top-k is a
    TakeOrderedAndProject, so nothing ever shuffles but k rows per
    partition.  The classic streaming/distributed weighted-reservoir
    result, as one declarative expression."""
    k = WS_TOPK
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    u = md5_u32(F.col("doc_id"), salt="ws#").cast("double") / F.lit(DP_U32)
    priority = F.pow(u, F.lit(1.0) / F.col("n_chars"))
    return (
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            F.round(priority, 9).alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(k)
    )


ORACLE_WEIGHTED_SAMPLE = f"""
SELECT doc_id, source, n_chars,
       ROUND(pow(CAST(('0x' || substr(md5('ws#' || CAST(doc_id AS VARCHAR)),
                                      1, 8)) AS BIGINT) / {DP_U32},
                 1.0 / n_chars), 9) AS priority
FROM documents
ORDER BY priority DESC, doc_id ASC
LIMIT {WS_TOPK}
"""


# ---------------------------------------------------------------------------
# Poisson bootstrap — resampling-with-replacement, one pass, B replicates
# ---------------------------------------------------------------------------

BOOT_B = 24  # bootstrap replicates

# Poisson(1) inverse CDF as integer thresholds on the md5-u32 scale:
# replicate weight k = #(thresholds ≤ u).  Integer thresholds mean
# BOTH engines compare a 32-bit hash against the same literals — no
# float compare at the CDF boundaries, so the replicate weights are
# bit-identical by construction.  P(K > 7) ≈ 1e-5 of 2^32 ≈ the cap's
# bias is below the hash's own granularity.
_POISSON1_CDF_U32: list[int] = []
_acc, _term = 0.0, math.exp(-1.0)
for _k in range(8):
    _acc += _term
    _POISSON1_CDF_U32.append(min(int(_acc * 4294967296.0), 4294967295))
    _term /= _k + 1


def poisson_weight(u32: Column) -> Column:
    """Poisson(1) draw from a uniform 32-bit hash via the shared
    threshold ladder (count of CDF thresholds the hash clears)."""
    w = F.lit(0)
    for t in _POISSON1_CDF_U32:
        w = w + F.when(u32 >= t, 1).otherwise(0)
    return w


def _poisson_weight_sql(u_expr: str) -> str:
    return " + ".join(
        f"(CASE WHEN {u_expr} >= {t} THEN 1 ELSE 0 END)"
        for t in _POISSON1_CDF_U32
    )


def bootstrap_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean order value — the uncertainty
    primitive for A/B readouts and data-quality drift checks at
    corpus scale. Classic bootstrap resamples n rows WITH replacement
    per replicate, which cannot be done in one distributed pass; the
    Poisson(1) approximation (each row enters replicate b with an
    independent Poisson(1) multiplicity) is the standard one-pass
    substitute (the same trick behind Spark's own sampleBy and
    bag-of-little-bootstraps systems).

    Determinism: the multiplicity of order o in replicate b is the
    Poisson inverse-CDF of ``md5('boot#' || o || '#' || b)`` — a pure
    function both engines compute bit-identically (see
    ``_POISSON1_CDF_U32``). One explode (×B) feeding one partial-agg
    groupBy on the replicate id: the shuffle carries B rows per
    upstream partition, the result is B rows total. Money in exact
    cents; the replicate mean is one double division of two exact
    longs, IEEE-identical across engines."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    b = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    exploded = orders.select("o_orderkey", "o_totalprice", b)
    u = md5_u32(
        F.concat_ws(
            "#", F.lit("boot"), F.col("o_orderkey"), F.col("b")
        )
    )
    w = poisson_weight(u)
    return (
        exploded.select(
            "b",
            w.alias("w"),
            (
                w.cast("long")
                * F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("wc"),
        )
        .groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.sum("wc").alias("total_cents"),
        )
        .select(
            F.col("b").alias("replicate"),
            "n_eff",
            "total_cents",
            (
                F.col("total_cents").cast("double")
                / F.col("n_eff").cast("double")
                / F.lit(100.0)
            ).alias("mean_value"),
        )
        .orderBy("replicate")
    )


_BOOT_U = (
    "CAST(('0x' || substr(md5('boot' || '#' || CAST(o_orderkey AS VARCHAR)"
    " || '#' || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT)"
)

ORACLE_BOOTSTRAP = f"""
WITH exploded AS (
  SELECT o_orderkey, o_totalprice, UNNEST(RANGE(0, {BOOT_B})) AS b
  FROM orders
), weighted AS (
  SELECT b,
         ({_poisson_weight_sql(_BOOT_U)}) AS w,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM exploded
)
SELECT b AS replicate,
       CAST(SUM(w) AS BIGINT) AS n_eff,
       CAST(SUM(w * c) AS BIGINT) AS total_cents,
       CAST(SUM(w * c) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) / 100.0
         AS mean_value
FROM weighted
GROUP BY b
ORDER BY replicate
"""


DP_EPSILON_E2 = 50  # ε = 0.5 per released count


def dp_noisy_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism ARITHMETIC AUDIT — NOT a privacy
    mechanism, and it provides NO differential-privacy guarantee:
    the "noise" here is a deterministic md5 of the public segment
    name, so anyone can recompute it and invert the release exactly
    (and the query co-emits true_count anyway, by design, so the
    two engines can cross-check the mechanism's arithmetic). What
    this fixture pins is the release FORMULA — counting queries
    have sensitivity 1, so a real deployment draws
    Laplace(b = 1/ε) — computed identically by both engines via
    the inverse-CDF. A production mechanism additionally needs
    fresh, SECRET randomness per release (not a keyed hash of any
    public value — a salt swap does not fix this) and must never
    emit the true counts alongside.

    Laplace inverse-CDF from u ∈ [0,1): noise = −b·sign(u−.5)·
    ln(1−2|u−.5|). One ln per released row (segments-sized frame);
    the fact stream only ever feeds the exact count aggregate."""
    eps = DP_EPSILON_E2 / 1e2
    seg = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    u = md5_u32(F.col("segment"), salt="dp#").cast("double") / F.lit(DP_U32)
    centered = u - 0.5
    noise = (
        -F.lit(1.0 / eps)
        * F.signum(centered)
        * F.log(1.0 - 2.0 * F.abs(centered))
    )
    return seg.select(
        "segment",
        "true_count",
        F.round(noise, 4).alias("laplace_noise"),
        F.round(F.col("true_count") + F.round(noise, 4), 4).alias(
            "released_count"
        ),
    ).orderBy("segment")


ORACLE_DP_NOISY_COUNTS = f"""
WITH seg AS (
  SELECT c_mktsegment AS segment, COUNT(*) AS true_count
  FROM customer GROUP BY segment
), drawn AS (
  SELECT segment, true_count,
         CAST(('0x' || substr(md5('dp#' || segment), 1, 8)) AS BIGINT)
           / {DP_U32} - 0.5 AS centered
  FROM seg
)
SELECT segment, true_count,
       ROUND(-(1.0 / {DP_EPSILON_E2 / 1e2}) * sign(centered)
             * ln(1.0 - 2.0 * abs(centered)), 4) AS laplace_noise,
       ROUND(true_count
             + ROUND(-(1.0 / {DP_EPSILON_E2 / 1e2}) * sign(centered)
                     * ln(1.0 - 2.0 * abs(centered)), 4), 4)
         AS released_count
FROM drawn
ORDER BY segment
"""


# --------------------------------------------------------------------------
# Exponential-mechanism quantile (arithmetic audit, same contract as
# dp_noisy_segment_counts)
# --------------------------------------------------------------------------

DPQ_BIN_USD = 10_000  # $10k candidate bins for the median release


def dp_quantile_exponential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-mechanism median ARITHMETIC AUDIT — like
    ``dp_noisy_segment_counts``, NOT a privacy mechanism (the Gumbel
    draws are a deterministic md5 of public values, and the true
    median is co-emitted so both engines can cross-check): what it
    pins is the RELEASE FORMULA for the DP quantile — candidate bins
    scored by the rank utility u(b) = −|2·rank(b) − n| (sensitivity
    2 in this scaling), selection via the Gumbel-max trick
    (argmax of ε·u/4 + Gumbel(0,1)), which is exactly equivalent to
    sampling w.p. ∝ exp(ε·u(b)/4). A real deployment swaps the hash
    for fresh secret randomness and drops the true column.

    Shape: per-(segment, $10k-bin) counts, one per-segment cumsum
    window over the ≤50-bin frame, integer utilities; one ln pair
    per candidate row. The fact stream feeds only the exact count
    rollup."""
    eps = DP_EPSILON_E2 / 1e2
    bins = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("segment"),
            F.floor(F.col("o_totalprice") / DPQ_BIN_USD)
            .cast("long")
            .alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = (
        Window.partitionBy("segment")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seg = Window.partitionBy("segment")
    cum = bins.select(
        "segment",
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_seg).alias("n"),
    )
    u01 = (
        md5_u32(
            F.concat(F.col("segment"), F.lit("#"), F.col("bin")),
            salt="dpq#",
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(DP_U32)
    gumbel = -F.log(-F.log(u01))
    utility = -F.abs(F.lit(2) * F.col("cum") - F.col("n"))
    scored = cum.select(
        "segment",
        "bin",
        "cum",
        "n",
        (F.lit(eps / 4.0) * utility.cast("double") + gumbel).alias("score"),
    )
    w_pick = Window.partitionBy("segment").orderBy(
        F.desc("score"), F.asc("bin")
    )
    picked = (
        scored.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("segment", F.col("bin").alias("dp_bin"))
    )
    truth = cum.groupBy("segment").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.lit(2) * F.col("cum") >= F.col("n"), F.col("bin"))
        ).alias("true_bin"),
    )
    return (
        truth.join(picked, "segment")
        .select(
            "segment",
            "n",
            (F.col("true_bin") * DPQ_BIN_USD).alias("true_median_lo_usd"),
            (F.col("dp_bin") * DPQ_BIN_USD).alias("released_median_lo_usd"),
            F.abs(F.col("dp_bin") - F.col("true_bin")).alias("err_bins"),
        )
        .orderBy("segment")
    )


ORACLE_DP_QUANTILE = f"""
WITH bins AS (
  SELECT o_orderpriority AS segment,
         CAST(FLOOR(o_totalprice / {DPQ_BIN_USD}) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM orders GROUP BY 1, 2
), cum AS (
  SELECT segment, bin,
         SUM(c) OVER (PARTITION BY segment ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY segment) AS n
  FROM bins
), scored AS (
  SELECT segment, bin, cum, n,
         {DP_EPSILON_E2 / 1e2} / 4.0
           * (-ABS(2 * cum - n))
         + (-ln(-ln((CAST(('0x' || substr(md5('dpq#' || segment || '#'
                                          || CAST(bin AS VARCHAR)), 1, 8))
                          AS BIGINT) + 0.5) / {DP_U32}))) AS score
  FROM cum
), picked AS (
  SELECT segment, bin AS dp_bin,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY score DESC, bin ASC) AS rn
  FROM scored
), truth AS (
  SELECT segment, CAST(MAX(n) AS BIGINT) AS n,
         MIN(CASE WHEN 2 * cum >= n THEN bin END) AS true_bin
  FROM cum GROUP BY segment
)
SELECT truth.segment, n,
       true_bin * {DPQ_BIN_USD} AS true_median_lo_usd,
       dp_bin * {DPQ_BIN_USD} AS released_median_lo_usd,
       ABS(dp_bin - true_bin) AS err_bins
FROM truth JOIN picked ON truth.segment = picked.segment AND rn = 1
ORDER BY truth.segment
"""


# --------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# --------------------------------------------------------------------------

K_ANON_K = 5


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-release gate: treating (nationkey, mktsegment,
    acctbal-band) as the quasi-identifier tuple, report per segment
    how many QI groups fall below k=5 members and what fraction of
    rows would need suppression before the table is k-anonymous.
    Two rollups — QI-group sized then segment sized — so the only
    exchange carries group keys and counts; the companion release
    path is ``dp_noisy_segment_counts`` (suppress, then add noise)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).alias("bal_band"),
    )
    groups = cust.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        groups.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("n") < K_ANON_K).cast("long")).alias("n_unsafe_groups"),
            F.sum("n").alias("n_rows"),
            F.sum(F.when(F.col("n") < K_ANON_K, F.col("n")).otherwise(F.lit(0)))
            .alias("n_rows_at_risk"),
        )
        .withColumn(
            "suppression_rate",
            F.round(F.col("n_rows_at_risk") / F.col("n_rows"), 6),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_K_ANONYMITY = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         COUNT(*) AS n
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n < {K_ANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unsafe_groups,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN n < {K_ANON_K} THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       ROUND(CAST(SUM(CASE WHEN n < {K_ANON_K} THEN n ELSE 0 END) AS DOUBLE)
             / SUM(n), 6) AS suppression_rate
FROM g
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


L_DIV_L = 3


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The l-diversity companion to ``k_anonymity_audit``: k-anonymity
    alone can't stop attribute disclosure when every member of a QI
    group shares the same sensitive value. Here the quasi-identifier
    is (nationkey, mktsegment) and the sensitive attribute is the
    account-balance band; a group is l-diverse when it contains ≥ l
    distinct sensitive values. Per segment: group count, groups below
    l={L_DIV_L}, min observed diversity, and the row fraction exposed
    to attribute disclosure.

    Shape: one rollup to (QI, sensitive) pairs, one to QI groups, one
    to segments — every exchange carries keys+counts only, the
    smallest-possible shuffles at any scale (the k-anonymity
    posture)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).alias("bal_band"),
    )
    per_value = cust.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_group = per_value.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("l_div"),
        F.sum("n").alias("n_rows"),
    )
    return (
        per_group.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("l_div") < L_DIV_L).cast("long")).alias(
                "n_low_diversity"
            ),
            F.min("l_div").alias("min_l"),
            F.sum("n_rows").alias("n_rows"),
            F.sum(
                F.when(F.col("l_div") < L_DIV_L, F.col("n_rows")).otherwise(0)
            ).alias("n_rows_exposed"),
        )
        .withColumn(
            "exposure_rate",
            F.round(F.col("n_rows_exposed") / F.col("n_rows"), 6),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_L_DIVERSITY = f"""
WITH pv AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         COUNT(*) AS n
  FROM customer GROUP BY 1, 2, 3
), pg AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS l_div,
         CAST(SUM(n) AS BIGINT) AS n_rows
  FROM pv GROUP BY 1, 2
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN l_div < {L_DIV_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_diversity,
       CAST(MIN(l_div) AS BIGINT) AS min_l,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN l_div < {L_DIV_L} THEN n_rows ELSE 0 END) AS BIGINT)
         AS n_rows_exposed,
       ROUND(CAST(SUM(CASE WHEN l_div < {L_DIV_L} THEN n_rows ELSE 0 END)
                  AS DOUBLE) / SUM(n_rows), 6) AS exposure_rate
FROM pg
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


T_CLOSE_DEN = 5  # breach threshold t = 1/T_CLOSE_DEN = 0.2


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness — the third member of the privacy-release trio
    (``k_anonymity_audit``, ``l_diversity_audit``): l-diversity can't
    stop attribute disclosure when a QI group's sensitive values are
    DISTINCT but skewed far from the table's distribution. Here the
    quasi-identifier is (nationkey, mktsegment) and the sensitive
    attribute the ordered acctbal band; each group's distance from
    the global distribution is the normalized 1-D earth-mover's
    distance EMD = Σᵢ|P̂ᵢ−Q̂ᵢ|/(m−1) over band-prefix sums. Per
    segment: group count, worst EMD, groups breaching t=0.2, and the
    exposed-row fraction.

    Exactness: the prefix-sum difference stays an exact integer —
    |cum_g·N − cum_all·n_g| — and the breach test multiplies through
    by the denominator (t·n_g·N·(m−1) vs T_CLOSE_DEN·num) so no
    float ever decides a flag; one division per group feeds the
    ROUND(…,6) readout. (Products reach n_g·N — at extreme corpus
    scale swap to DECIMAL or pre-scale; bigint-safe to ~10⁹ rows.)

    Shape: one rollup to (QI, band) pairs, then every frame is
    bounded — the dense grid is |QI groups|×|bands| (dims of the
    domain, invariant in row count) built by broadcasting the
    band frame; the per-group window partitions by QI group over m
    rows. Nothing fact-sized crosses an exchange after the first
    rollup (the k-anonymity posture)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("band"),
    )
    pv = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("c")
    )
    groups = pv.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("c").alias("n_g")
    )
    wb = Window.orderBy("band")
    whole = Window.partitionBy(F.lit(1))
    gband = (
        pv.groupBy("band")
        .agg(F.sum("c").alias("cb"))
        .select(
            "band",
            F.sum("cb").over(wb).alias("cum_all"),
            F.sum("cb").over(whole).alias("n_all"),
            F.count(F.lit(1)).over(whole).alias("m"),
        )
    )
    dense = groups.crossJoin(F.broadcast(gband)).join(
        pv, ["c_nationkey", "c_mktsegment", "band"], "left"
    )
    wg = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("band")
    cum = dense.select(
        "c_nationkey",
        "c_mktsegment",
        "n_g",
        "n_all",
        "m",
        "cum_all",
        F.sum(F.coalesce(F.col("c"), F.lit(0))).over(wg).alias("cum_g"),
    )
    per_group = cum.groupBy(
        "c_nationkey", "c_mktsegment", "n_g", "n_all", "m"
    ).agg(
        F.sum(
            F.abs(
                F.col("cum_g") * F.col("n_all")
                - F.col("cum_all") * F.col("n_g")
            )
        ).alias("num")
    )
    breach = (
        F.col("num") * T_CLOSE_DEN
        > F.col("n_g") * F.col("n_all") * (F.col("m") - 1)
    ).cast("long")
    scored = per_group.select(
        "c_mktsegment",
        "n_g",
        F.round(
            F.col("num").cast("double")
            / (
                F.col("n_g") * F.col("n_all") * (F.col("m") - 1)
            ).cast("double"),
            6,
        ).alias("emd"),
        breach.alias("breach"),
    )
    return (
        scored.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.max("emd").alias("max_emd"),
            F.sum("breach").alias("n_breaching"),
            F.round(
                F.sum(F.col("breach") * F.col("n_g")).cast("double")
                / F.sum("n_g").cast("double"),
                6,
            ).alias("exposure_rate"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_T_CLOSENESS = f"""
WITH cust AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
  FROM customer
), pv AS (
  SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS c
  FROM cust GROUP BY 1, 2, 3
), groups AS (
  SELECT c_nationkey, c_mktsegment, CAST(SUM(c) AS BIGINT) AS n_g
  FROM pv GROUP BY 1, 2
), gband AS (
  SELECT band,
         CAST(SUM(cb) OVER (ORDER BY band) AS BIGINT) AS cum_all,
         CAST(SUM(cb) OVER () AS BIGINT) AS n_all,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM (SELECT band, SUM(c) AS cb FROM pv GROUP BY band)
), dense AS (
  SELECT g.c_nationkey, g.c_mktsegment, g.n_g, b.band, b.cum_all,
         b.n_all, b.m, COALESCE(pv.c, 0) AS c
  FROM groups g CROSS JOIN gband b
  LEFT JOIN pv ON pv.c_nationkey = g.c_nationkey
              AND pv.c_mktsegment = g.c_mktsegment
              AND pv.band = b.band
), cum AS (
  SELECT c_nationkey, c_mktsegment, n_g, n_all, m, cum_all,
         SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment
                      ORDER BY band) AS cum_g
  FROM dense
), per_group AS (
  SELECT c_nationkey, c_mktsegment, n_g, n_all, m,
         CAST(SUM(ABS(cum_g * n_all - cum_all * n_g)) AS BIGINT) AS num
  FROM cum GROUP BY 1, 2, 3, 4, 5
), scored AS (
  SELECT c_mktsegment, n_g,
         ROUND(CAST(num AS DOUBLE)
               / CAST(n_g * n_all * (m - 1) AS DOUBLE), 6) AS emd,
         CASE WHEN num * {T_CLOSE_DEN} > n_g * n_all * (m - 1)
              THEN 1 ELSE 0 END AS breach
  FROM per_group
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       MAX(emd) AS max_emd,
       CAST(SUM(breach) AS BIGINT) AS n_breaching,
       ROUND(CAST(SUM(breach * n_g) AS DOUBLE)
             / CAST(SUM(n_g) AS DOUBLE), 6) AS exposure_rate
FROM scored
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def design_effect_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design effect (DEFF) of proportionate source-stratified
    sampling over document length — the one number that says whether
    stratifying the corpus sample by source buys variance: DEFF =
    Σ Wₕσ²ₕ / σ² = 1 − η², where η² is the between-source share of
    the length variance. DEFF 0.8 means a stratified corpus-metric
    estimate needs 20% fewer sampled docs for the same CI — the
    planning input for every audit-by-sampling pass over 100 TB.

    Exactness: per-stratum (n, Σy, Σy²) integer triples in one
    map-side-combined rollup (y = n_chars, already integer); the
    |sources|-row frame then folds to one row, and DEFF/η² are
    composed once from exact bigints in oracle-identical order
    (population-variance form — ss/n − mean², cast to double before
    the products; the welch overflow discipline)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("y")
    )
    strata = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    )
    tot = strata.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("st"),
        F.sum("ss").alias("sst"),
        # Σₕ s²ₕ/nₕ — the within/between split's only per-stratum
        # double; rounded to a fixed grid per term so the distributed
        # sum is order-free (the anova ssb idiom)
        F.sum(
            F.round(
                F.col("s").cast("double") * F.col("s").cast("double")
                / F.col("n").cast("double"),
                4,
            )
        ).alias("sum_sq_over_n"),
    )
    nn = F.col("nn").cast("double")
    sst = F.col("sst").cast("double")
    st = F.col("st").cast("double")
    ss_total = sst - st * st / nn
    ss_within = sst - F.col("sum_sq_over_n")
    return tot.select(
        "n_strata",
        F.col("nn").alias("n_docs"),
        F.round(ss_within / ss_total, 6).alias("deff"),
        F.round(1.0 - ss_within / ss_total, 6).alias("eta_squared"),
    )


ORACLE_DESIGN_EFFECT = """
WITH strata AS (
  SELECT source, COUNT(*) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(s) AS BIGINT) AS st,
         CAST(SUM(ss) AS BIGINT) AS sst,
         SUM(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE), 4)) AS sum_sq_over_n
  FROM strata
)
SELECT n_strata, nn AS n_docs,
       ROUND((CAST(sst AS DOUBLE) - sum_sq_over_n)
             / (CAST(sst AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                  / CAST(nn AS DOUBLE)), 6) AS deff,
       ROUND(1.0 - (CAST(sst AS DOUBLE) - sum_sq_over_n)
             / (CAST(sst AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                  / CAST(nn AS DOUBLE)), 6) AS eta_squared
FROM tot
"""


# --------------------------------------------------------------------------
# Neyman allocation — where to spend a fixed sampling/labeling budget
# --------------------------------------------------------------------------

NEYMAN_BUDGET = 10000


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a fixed {NEYMAN_BUDGET}-unit
    sampling budget across order-priority strata (n_h ∝ N_h·S_h) —
    the survey-design answer to "which strata deserve labels":
    variable strata get more than their population share, uniform
    strata less. Reported against proportional allocation so the
    gap IS the variance win; the labeling-budget planner for any
    human-eval or QA pass over a 100 TB corpus partition.

    Scale: one map-combined (n, Σv, Σv²) rollup per stratum; all
    later arithmetic lives on the ≤|priorities| frame.

    Exactness: stratum moments are exact BIGINTs (whole-dollar
    quantization, the welch idiom); each weight N_h·S_h quantizes
    to an exact integer before the cross-stratum window sum (order-
    proof), leaving one rounded division per allocation."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.expr("cast(round(o_totalprice * 100) as bigint) div 100").alias(
            "v"
        ),
    )
    agg = o.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    nh = F.col("n_h").cast("double")
    mean = F.col("sv").cast("double") / nh
    sd = F.sqrt(
        (
            F.col("svv").cast("double")
            - F.col("sv").cast("double") * F.col("sv").cast("double") / nh
        )
        / (nh - 1.0)
    )
    w_all = Window.partitionBy()
    weighted = agg.select(
        "priority",
        "n_h",
        F.round(mean, 6).alias("mean_usd"),
        F.round(sd, 6).alias("sd_usd"),
        # N_h·S_h in exact centi-units: order-proof integer window sum
        F.round(nh * sd * 100.0, 0).cast("long").alias("w_c"),
    ).select(
        "*",
        F.sum("w_c").over(w_all).alias("w_tot"),
        F.sum("n_h").over(w_all).alias("n_tot"),
    )
    return weighted.select(
        "priority",
        "n_h",
        "mean_usd",
        "sd_usd",
        F.round(
            F.lit(NEYMAN_BUDGET)
            * F.col("w_c").cast("double")
            / F.col("w_tot").cast("double"),
            0,
        )
        .cast("long")
        .alias("neyman_n"),
        F.round(
            F.lit(NEYMAN_BUDGET)
            * F.col("n_h").cast("double")
            / F.col("n_tot").cast("double"),
            0,
        )
        .cast("long")
        .alias("proportional_n"),
        F.round(
            F.lit(NEYMAN_BUDGET)
            * F.col("w_c").cast("double")
            / F.col("w_tot").cast("double")
            / F.col("n_h").cast("double")
            * 100.0,
            6,
        ).alias("sampling_pct"),
    ).orderBy("priority")


ORACLE_NEYMAN = f"""
WITH o AS (
  SELECT o_orderpriority AS priority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS v
  FROM orders
), agg AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(v) AS BIGINT) AS sv,
         CAST(SUM(v * v) AS BIGINT) AS svv
  FROM o GROUP BY priority
), weighted AS (
  SELECT priority, n_h,
         ROUND(CAST(sv AS DOUBLE) / CAST(n_h AS DOUBLE), 6) AS mean_usd,
         ROUND(sqrt((CAST(svv AS DOUBLE)
                     - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                       / CAST(n_h AS DOUBLE))
                    / (CAST(n_h AS DOUBLE) - 1.0)), 6) AS sd_usd,
         CAST(ROUND(CAST(n_h AS DOUBLE)
              * sqrt((CAST(svv AS DOUBLE)
                      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                        / CAST(n_h AS DOUBLE))
                     / (CAST(n_h AS DOUBLE) - 1.0)) * 100.0)
              AS BIGINT) AS w_c
  FROM agg
), tot AS (
  SELECT priority, n_h, mean_usd, sd_usd, w_c,
         SUM(w_c) OVER () AS w_tot,
         SUM(n_h) OVER () AS n_tot
  FROM weighted
)
SELECT priority, n_h, mean_usd, sd_usd,
       CAST(ROUND({NEYMAN_BUDGET} * CAST(w_c AS DOUBLE)
            / CAST(w_tot AS DOUBLE)) AS BIGINT) AS neyman_n,
       CAST(ROUND({NEYMAN_BUDGET} * CAST(n_h AS DOUBLE)
            / CAST(n_tot AS DOUBLE)) AS BIGINT) AS proportional_n,
       ROUND({NEYMAN_BUDGET} * CAST(w_c AS DOUBLE) / CAST(w_tot AS DOUBLE)
             / CAST(n_h AS DOUBLE) * 100.0, 6) AS sampling_pct
FROM tot
ORDER BY priority
"""


QUERIES: dict[str, QuerySpec] = {
    "neyman_allocation": QuerySpec(
        neyman_allocation,
        ORACLE_NEYMAN,
        ["A1", "A4", "§2.8", "X-curation", "X-training"],
    ),
    "l_diversity_audit": QuerySpec(
        l_diversity_audit,
        ORACLE_L_DIVERSITY,
        ["A1", "A3", "X-curation"],
    ),
    "t_closeness_audit": QuerySpec(
        t_closeness_audit,
        ORACLE_T_CLOSENESS,
        ["A1", "A3", "J1", "X-curation"],
    ),
    "design_effect_stratified": QuerySpec(
        design_effect_stratified,
        ORACLE_DESIGN_EFFECT,
        ["A1", "A4", "X-curation"],
    ),
    "k_anonymity_audit": QuerySpec(
        k_anonymity_audit,
        ORACLE_K_ANONYMITY,
        ["A1", "A3", "X-curation"],
    ),
    "dp_noisy_segment_counts": QuerySpec(
        dp_noisy_segment_counts,
        ORACLE_DP_NOISY_COUNTS,
        ["A1", "X-curation"],
    ),
    "dp_quantile_exponential": QuerySpec(
        dp_quantile_exponential,
        ORACLE_DP_QUANTILE,
        ["A1", "§2.8", "X-curation"],
    ),
    "bootstrap_order_value": QuerySpec(
        bootstrap_order_value,
        ORACLE_BOOTSTRAP,
        ["X-curation", "A1", "A4", "F2"],
    ),
    "weighted_sample_docs": QuerySpec(
        weighted_sample_docs, ORACLE_WEIGHTED_SAMPLE, ["X-curation", "T1"]
    ),
    "domain_cap_sample": QuerySpec(
        domain_cap_sample, ORACLE_DOMAIN_CAP, ["X-curation", "§2.8", "T4"]
    ),
    "sample_stratified_docs": QuerySpec(
        sample_stratified_docs, ORACLE_SAMPLE_STRATIFIED, ["X-curation"]
    ),
    "docs_length_trim": QuerySpec(
        docs_length_trim, ORACLE_DOCS_LENGTH_TRIM, ["X-curation"]
    ),
}
