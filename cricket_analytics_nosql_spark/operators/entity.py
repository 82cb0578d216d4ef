"""Entity resolution: blocked fuzzy matching — SURVEY.md §4
(training-data curation family; the record-linkage sibling of
dedup.py's document near-dup).

The reference normalizes entity identity by convention (player names
are exact strings reused across deliveries, neo4j_loader.py:28-30
declares uniqueness on them); real corpora have typo'd variants, and
linking them is the same candidates→verify discipline the dedup
operators use:

1. **Collapse to distinct values first.** Fuzzy comparison cost
   scales with DISTINCT names, not rows — at 100 TB the entity
   table may have billions of rows but orders-of-magnitude fewer
   distinct surface forms. ``groupBy(name)`` is the first stage,
   everything pairwise happens in distinct-value space, and row
   counts ride along for re-expansion.
2. **Block, never cross-join.** Candidate pairs come from an
   equi-join on a blocking key (here: the head noun of the name);
   the quadratic blow-up is bounded per block instead of global.
3. **Verify with an exact measure** (Levenshtein ≤ 2 on the variant
   token) inside the block — Spark's ``levenshtein`` and DuckDB's
   agree exactly, so the whole operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table


def fuzzy_match_names(
    names: DataFrame,
    name_col: str,
    block_col: str,
    variant_col: str,
    max_edit: int = 2,
) -> DataFrame:
    """Self-join ``names`` on the blocking key and keep pairs whose
    variant tokens are within ``max_edit`` (≥ 1: exact duplicates
    are not matches — those are plain groupBy territory). Input must
    already be one row per distinct name (stage 1 of the module
    docstring); pairs are emitted once (name_a < name_b)."""
    a = names.select(
        F.col(name_col).alias("name_a"),
        F.col(block_col).alias("block"),
        F.col(variant_col).alias("var_a"),
    )
    b = names.select(
        F.col(name_col).alias("name_b"),
        F.col(block_col).alias("block"),
        F.col(variant_col).alias("var_b"),
    )
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("var_a", "var_b"))
        .filter(F.col("edit_dist").between(1, max_edit))
        .select("block", "name_a", "name_b", "edit_dist")
    )


def entity_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable record linkage on the part catalog: names
    share their head noun (the block) and differ by an adjective
    within edit distance 2 — with how many physical parts each
    surface form covers, so a resolver can pick the canonical side."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    toks = names.select(
        "p_name",
        "n_parts",
        F.split("p_name", " ").getItem(0).alias("adj"),
        F.element_at(F.split("p_name", " "), -1).alias("noun"),
    )
    pairs = fuzzy_match_names(toks, "p_name", "noun", "adj")
    counts = names.select(
        F.col("p_name").alias("name_a"), F.col("n_parts").alias("n_parts_a")
    )
    counts_b = names.select(
        F.col("p_name").alias("name_b"), F.col("n_parts").alias("n_parts_b")
    )
    return (
        pairs.join(F.broadcast(counts), "name_a")
        .join(F.broadcast(counts_b), "name_b")
        .select(
            "block",
            "name_a",
            "name_b",
            "edit_dist",
            "n_parts_a",
            "n_parts_b",
        )
        .orderBy("block", "name_a", "name_b")
    )


ORACLE_ENTITY_MATCH_PARTS = """
WITH names AS (
  SELECT p_name,
         split_part(p_name, ' ', 1) AS adj,
         split_part(p_name, ' ', 2) AS noun,
         COUNT(*) AS n_parts
  FROM part GROUP BY 1, 2, 3
)
SELECT a.noun AS block,
       a.p_name AS name_a,
       b.p_name AS name_b,
       CAST(levenshtein(a.adj, b.adj) AS INTEGER) AS edit_dist,
       a.n_parts AS n_parts_a,
       b.n_parts AS n_parts_b
FROM names a
JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
WHERE levenshtein(a.adj, b.adj) BETWEEN 1 AND 2
ORDER BY block, name_a, name_b
"""


def blocking_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate blocking schemes BEFORE running the linkage — the
    decision a 100 TB entity-resolution job must make up front, since
    the wrong key either explodes the candidate count or loses true
    matches. For each scheme (block on the head noun / on the
    adjective / on the name's first character) over the DISTINCT
    name space: block count, candidate-pair count, reduction ratio
    vs all-pairs, and pair completeness against a fixed truth set
    (same head noun + adjective edit distance ≤ 2, the misspelled-
    modifier twin of ``entity_match_parts``).

    The scale posture is the whole point: candidate pairs are
    COUNTED arithmetically from block sizes (Σ n·(n−1)/2) — no
    scheme's candidates are ever enumerated, so auditing a bad
    scheme costs the same as a good one. The only pairwise work is
    the (bounded) truth set, generated by an equi-join on the noun
    in distinct-name space."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .select(
            "p_name",
            F.split("p_name", " ").getItem(0).alias("adj"),
            F.element_at(F.split("p_name", " "), -1).alias("noun"),
            F.substring("p_name", 1, 1).alias("c1"),
        )
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("adj").alias("adj_a"),
        F.col("noun").alias("noun_a"),
        F.col("c1").alias("c1_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("adj").alias("adj_b"),
        F.col("noun").alias("noun_b"),
        F.col("c1").alias("c1_b"),
    )
    truth = (
        a.join(b, F.col("noun_a") == F.col("noun_b"))
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("adj_a", "adj_b") <= 2)
    )
    truth_stats = truth.agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.count(F.lit(1)).alias("cob_noun"),  # truth shares noun by def
        F.sum((F.col("adj_a") == F.col("adj_b")).cast("long")).alias(
            "cob_adj"
        ),
        F.sum((F.col("c1_a") == F.col("c1_b")).cast("long")).alias("cob_c1"),
    )
    n_names = names.agg(F.count(F.lit(1)).alias("n_names"))

    def scheme_row(key: str, label: str, cob_col: str) -> DataFrame:
        sizes = names.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
        return (
            sizes.agg(
                F.count(F.lit(1)).alias("n_blocks"),
                F.sum(
                    (F.col("n") * (F.col("n") - 1) / 2).cast("long")
                ).alias("cand_pairs"),
            )
            .crossJoin(F.broadcast(n_names))
            .crossJoin(F.broadcast(truth_stats))
            .select(
                F.lit(label).alias("scheme"),
                "n_blocks",
                "cand_pairs",
                F.round(
                    F.lit(1.0)
                    - F.col("cand_pairs").cast("double")
                    / (F.col("n_names") * (F.col("n_names") - 1) / 2),
                    6,
                ).alias("reduction_ratio"),
                F.round(
                    F.col(cob_col).cast("double") / F.col("n_truth"), 6
                ).alias("pair_completeness"),
            )
        )

    return (
        scheme_row("noun", "block_noun", "cob_noun")
        .unionByName(scheme_row("adj", "block_adj", "cob_adj"))
        .unionByName(scheme_row("c1", "block_first_char", "cob_c1"))
        .orderBy("scheme")
    )


ORACLE_BLOCKING_QUALITY = """
WITH names AS (
  SELECT p_name,
         split_part(p_name, ' ', 1) AS adj,
         split_part(p_name, ' ', -1) AS noun,
         substr(p_name, 1, 1) AS c1
  FROM part GROUP BY 1, 2, 3, 4
), truth AS (
  SELECT a.adj = b.adj AS same_adj, a.c1 = b.c1 AS same_c1
  FROM names a JOIN names b
    ON a.noun = b.noun AND a.p_name < b.p_name
  WHERE levenshtein(a.adj, b.adj) <= 2
), ts AS (
  SELECT COUNT(*) AS n_truth,
         COUNT(*) AS cob_noun,
         CAST(SUM(CASE WHEN same_adj THEN 1 ELSE 0 END) AS BIGINT) AS cob_adj,
         CAST(SUM(CASE WHEN same_c1 THEN 1 ELSE 0 END) AS BIGINT) AS cob_c1
  FROM truth
), nn AS (
  SELECT COUNT(*) AS n_names FROM names
), schemes AS (
  SELECT 'block_noun' AS scheme, noun AS k FROM names
  UNION ALL SELECT 'block_adj', adj FROM names
  UNION ALL SELECT 'block_first_char', c1 FROM names
), sizes AS (
  SELECT scheme, k, COUNT(*) AS n FROM schemes GROUP BY 1, 2
), agg AS (
  SELECT scheme, COUNT(*) AS n_blocks,
         CAST(SUM(CAST(n * (n - 1) / 2 AS BIGINT)) AS BIGINT) AS cand_pairs
  FROM sizes GROUP BY scheme
)
SELECT scheme, n_blocks, cand_pairs,
       ROUND(1.0 - CAST(cand_pairs AS DOUBLE)
             / (n_names * (n_names - 1) / 2), 6) AS reduction_ratio,
       ROUND(CAST(CASE scheme WHEN 'block_noun' THEN cob_noun
                              WHEN 'block_adj' THEN cob_adj
                              ELSE cob_c1 END AS DOUBLE) / n_truth, 6)
         AS pair_completeness
FROM agg CROSS JOIN nn CROSS JOIN ts
ORDER BY scheme
"""


def fellegi_sunter_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record-linkage weights learned from the data
    with ZERO pair enumeration: treating parts sharing a p_name as
    the matched class, the per-field agreement probabilities are

        m_f = P(field agrees | match)      — within-name pair counts
        u_f = P(field agrees | random pair) — global value frequencies

    and both reduce to the sum-of-c·(c−1) identity over count
    tables: Σ c²-style numerators from a (name, field) rollup for m,
    from a (field) rollup for u. The classic log-likelihood
    agreement/disagreement weights w = ln(m/u), w̄ = ln((1−m)/(1−u))
    come out in integer micro-nats. At 100 TB this is three
    keys+counts groupBys per field — the match class is never
    materialized as pairs (which would be quadratic in block size).

    Fields: p_brand, p_type, p_size — exactly the evidence columns a
    resolver would score. (On this synthetic catalog the fields are
    nearly independent of the entity, so m ≈ u and the weights sit
    near zero — the audit's honest 'these fields carry no linkage
    signal' readout; on real data the same math ranks evidence
    fields by discriminative power.)"""
    part = load_table(spark, sf_dir, "part").select(
        "p_name", "p_brand", "p_type", F.col("p_size").cast("string").alias("p_size")
    )
    name_sizes = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n"))
    denom_m = name_sizes.agg(
        F.sum(F.col("n") * (F.col("n") - 1)).alias("pairs_m"),
        F.sum("n").alias("N"),
    ).select(
        "pairs_m", (F.col("N") * (F.col("N") - 1)).alias("pairs_all")
    )

    def field_row(field: str) -> DataFrame:
        mc = (
            part.groupBy("p_name", field)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * (F.col("c") - 1)).alias("agree_m"))
        )
        uc = (
            part.groupBy(field)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * (F.col("c") - 1)).alias("agree_u"))
        )
        m = F.col("agree_m").cast("double") / F.col("pairs_m")
        u = F.col("agree_u").cast("double") / F.col("pairs_all")
        return (
            mc.crossJoin(F.broadcast(uc))
            .crossJoin(F.broadcast(denom_m))
            .select(
                F.lit(field).alias("field"),
                F.round(m, 6).alias("m_prob"),
                F.round(u, 6).alias("u_prob"),
                F.round(F.log(m / u) * 1e6, 0).cast("long").alias(
                    "w_agree_micro"
                ),
                F.round(
                    F.log((F.lit(1.0) - m) / (F.lit(1.0) - u)) * 1e6, 0
                )
                .cast("long")
                .alias("w_disagree_micro"),
            )
        )

    return (
        field_row("p_brand")
        .unionByName(field_row("p_type"))
        .unionByName(field_row("p_size"))
        .orderBy("field")
    )


ORACLE_FELLEGI_SUNTER = """
WITH base AS (
  SELECT p_name, p_brand, p_type, CAST(p_size AS VARCHAR) AS p_size FROM part
), d AS (
  SELECT CAST(SUM(n * (n - 1)) AS BIGINT) AS pairs_m,
         CAST(SUM(n) * (SUM(n) - 1) AS BIGINT) AS pairs_all
  FROM (SELECT COUNT(*) AS n FROM base GROUP BY p_name)
), per_field AS (
  SELECT 'p_brand' AS field,
         (SELECT CAST(SUM(c * (c - 1)) AS BIGINT)
          FROM (SELECT COUNT(*) AS c FROM base GROUP BY p_name, p_brand)) AS agree_m,
         (SELECT CAST(SUM(c * (c - 1)) AS BIGINT)
          FROM (SELECT COUNT(*) AS c FROM base GROUP BY p_brand)) AS agree_u
  UNION ALL
  SELECT 'p_type',
         (SELECT CAST(SUM(c * (c - 1)) AS BIGINT)
          FROM (SELECT COUNT(*) AS c FROM base GROUP BY p_name, p_type)),
         (SELECT CAST(SUM(c * (c - 1)) AS BIGINT)
          FROM (SELECT COUNT(*) AS c FROM base GROUP BY p_type))
  UNION ALL
  SELECT 'p_size',
         (SELECT CAST(SUM(c * (c - 1)) AS BIGINT)
          FROM (SELECT COUNT(*) AS c FROM base GROUP BY p_name, p_size)),
         (SELECT CAST(SUM(c * (c - 1)) AS BIGINT)
          FROM (SELECT COUNT(*) AS c FROM base GROUP BY p_size))
)
SELECT field,
       ROUND(CAST(agree_m AS DOUBLE) / pairs_m, 6) AS m_prob,
       ROUND(CAST(agree_u AS DOUBLE) / pairs_all, 6) AS u_prob,
       CAST(ROUND(ln((CAST(agree_m AS DOUBLE) / pairs_m)
                     / (CAST(agree_u AS DOUBLE) / pairs_all)) * 1000000, 0)
            AS BIGINT) AS w_agree_micro,
       CAST(ROUND(ln((1.0 - CAST(agree_m AS DOUBLE) / pairs_m)
                     / (1.0 - CAST(agree_u AS DOUBLE) / pairs_all)) * 1000000, 0)
            AS BIGINT) AS w_disagree_micro
FROM per_field CROSS JOIN d
ORDER BY field
"""


QUERIES: dict[str, QuerySpec] = {
    "entity_match_parts": QuerySpec(
        entity_match_parts,
        ORACLE_ENTITY_MATCH_PARTS,
        ["X-curation", "J3", "A1"],
    ),
    "blocking_quality_audit": QuerySpec(
        blocking_quality_audit,
        ORACLE_BLOCKING_QUALITY,
        ["X-curation", "A1", "A5", "J3"],
    ),
    "fellegi_sunter_weights": QuerySpec(
        fellegi_sunter_weights,
        ORACLE_FELLEGI_SUNTER,
        ["X-curation", "A1", "A5"],
    ),
}
