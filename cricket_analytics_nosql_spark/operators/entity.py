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


QUERIES: dict[str, QuerySpec] = {
    "entity_match_parts": QuerySpec(
        entity_match_parts,
        ORACLE_ENTITY_MATCH_PARTS,
        ["X-curation", "J3", "A1"],
    ),
}
