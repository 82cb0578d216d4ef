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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.scalar import md5_u32
from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table

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
    k = 50
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    u = md5_u32(F.col("doc_id"), salt="ws#").cast("double") / F.lit(
        4294967296.0
    )
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


ORACLE_WEIGHTED_SAMPLE = """
SELECT doc_id, source, n_chars,
       ROUND(pow(CAST(('0x' || substr(md5('ws#' || CAST(doc_id AS VARCHAR)),
                                      1, 8)) AS BIGINT) / 4294967296.0,
                 1.0 / n_chars), 9) AS priority
FROM documents
ORDER BY priority DESC, doc_id ASC
LIMIT 50
"""


QUERIES: dict[str, QuerySpec] = {
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
