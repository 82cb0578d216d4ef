"""The reference's analytics queries re-expressed over the flattened
deliveries DataFrame — Mongo aggregation pipelines
(mongo_analytics_examples.py) and Cypher query shapes
(cypher_queries.cypher a-c). Parameterized like the Cypher $params
(P17): plain function arguments.

Physical shapes: group → partial+final hash agg; top-k plans as
TakeOrderedAndProject; the partnership self-join pre-aggregates and
orders pairs to bound the blowup (SURVEY J3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.scalar import flag
from cricket_analytics_nosql_spark.operators.spec import QuerySpec


def _wicket_flag() -> F.Column:
    """$cond[$gt[$size($ifNull(wickets, [])), 0], 1, 0]
    (mongo_analytics_examples.py:33,46) — the F.size(NULL) = -1
    legacy pitfall is dodged with coalesce (SURVEY P13)."""
    return flag(F.size(F.coalesce(F.col("wickets"), F.array())) > 0)


def runs_by_batter(deliveries: DataFrame, limit: int = 10) -> DataFrame:
    """$group → $addFields → $sort → $limit
    (mongo_analytics_examples.py:18-29): top batters by runs with
    strike rate and boundary percent."""
    agg = deliveries.groupBy("batter").agg(
        F.sum("runs_batter").alias("runs"),
        F.count(F.lit(1)).alias("balls"),
        F.sum("is_boundary").alias("boundaries"),
    )
    return (
        agg.withColumn(
            "strikeRate", F.col("runs") / F.col("balls") * 100
        )
        .withColumn("boundaryPct", F.col("boundaries") / F.col("balls") * 100)
        .orderBy(F.desc("runs"), F.asc("batter"))
        .limit(limit)
    )


def wickets_by_bowler(deliveries: DataFrame, limit: int = 10) -> DataFrame:
    """$project(wkts flag) → $group → $sort → $limit
    (mongo_analytics_examples.py:31-38)."""
    return (
        deliveries.select("bowler", _wicket_flag().alias("wkts"))
        .groupBy("bowler")
        .agg(F.sum("wkts").alias("wickets"))
        .orderBy(F.desc("wickets"), F.asc("bowler"))
        .limit(limit)
    )


def batter_vs_bowler(
    deliveries: DataFrame, batter: str, bowler: str
) -> DataFrame:
    """kohli_vs_southee (mongo_analytics_examples.py:40-48) and Cypher
    (a) (cypher_queries.cypher:4-8): head-to-head duel — $match on
    both names, grand-total group."""
    return (
        deliveries.filter(
            (F.col("batter") == batter) & (F.col("bowler") == bowler)
        )
        .agg(
            F.count(F.lit(1)).alias("balls"),
            F.sum("runs_total").alias("runs"),
            F.sum(_wicket_flag()).alias("outs"),
        )
    )


def toughest_bowlers(
    deliveries: DataFrame, batter: str, min_balls: int = 30, limit: int = 10
) -> DataFrame:
    """Cypher (b) (cypher_queries.cypher:10-16): anchored one-sided
    join shape — filter the batter, group by bowler, HAVING
    balls >= 30, strike rate asc / outs desc."""
    return (
        deliveries.filter(F.col("batter") == batter)
        .groupBy("bowler")
        .agg(
            F.count(F.lit(1)).alias("balls"),
            F.sum("runs_total").alias("runs"),
            F.sum(_wicket_flag()).alias("outs"),
        )
        .filter(F.col("balls") >= min_balls)
        .select(
            "bowler",
            "balls",
            "runs",
            (F.col("runs").cast("double") / F.col("balls") * 100).alias(
                "strikeRate"
            ),
            "outs",
        )
        .orderBy(F.asc("strikeRate"), F.desc("outs"), F.asc("bowler"))
        .limit(limit)
    )


def partnership_proxy(
    deliveries: DataFrame, team: str, min_co: int = 20, limit: int = 20
) -> DataFrame:
    """Cypher (c) (cypher_queries.cypher:18-25): batters frequently
    facing the same bowler for one team — the 2-hop self-join with
    theta residual. Faithful to the Cypher a <> b semantics (both
    orderings emitted); pre-aggregation to per-(batter,bowler) ball
    counts bounds the join blowup at scale (SURVEY J3)."""
    per_pair = (
        deliveries.filter(F.col("battingTeam") == team)
        .groupBy("batter", "bowler")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = per_pair.select(
        F.col("batter").alias("a"), "bowler", F.col("n").alias("n_a")
    )
    b = per_pair.select(
        F.col("batter").alias("b"), "bowler", F.col("n").alias("n_b")
    )
    return (
        a.join(b, "bowler")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("n_a") * F.col("n_b")).alias("co_appearances"))
        .filter(F.col("co_appearances") >= min_co)
        .orderBy(F.desc("co_appearances"), "a", "b")
        .limit(limit)
    )


def cricket_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full entry-point 1 → entry-point 2 flow,
    end-to-end in one plan (SURVEY §3.1-3.2): stage a Cricsheet-
    shaped dump (with drift variants and one corrupt file), scan it
    with the explicit-schema multiLine reader (S1), quarantine the
    corrupt row (S2), run the 3-level flatten (F1, carrying P7/P8
    drift fixes and P11/P12 validation), and answer runs_by_batter
    (T1/T2 top-k). `sf_dir` is unused — the input is the committed
    fixture dump; deterministic → rows-only driver check (the DuckDB
    oracle only sees the star-schema views)."""
    from cricket_analytics_nosql_spark.operators.etl import flatten_deliveries
    from cricket_analytics_nosql_spark.sources.cricket_fixtures import (
        write_demo_dir,
    )
    from cricket_analytics_nosql_spark.sources.cricsheet import (
        read_cricsheet,
        split_quarantine,
    )

    data_dir = write_demo_dir()
    good, bad = split_quarantine(read_cricsheet(spark, data_dir))
    deliveries = flatten_deliveries(good)
    result = runs_by_batter(deliveries, limit=10)
    # surface the quarantine count so the S2 path is part of the
    # checked output (bad files must never silently disappear)
    return result.crossJoin(
        F.broadcast(bad.agg(F.count(F.lit(1)).alias("n_quarantined")))
    )


def _cricket_pipeline_oracle() -> str:
    """DuckDB re-runs the WHOLE pipeline from the same source bytes:
    the fixture files ride in as VALUES literals (the exact content
    ``write_demo_dir`` stages), TRY_CAST-to-JSON replays the S2
    quarantine split (corrupt file → NULL → counted, never dropped
    silently), three unnest levels replay the F1 flatten, the
    batter/striker COALESCE and runs.batter default replay the
    P7/P8-adjacent drift fixes, and the final aggregate is
    runs_by_batter verbatim (mongo_analytics_examples.py:18-29).
    Independent engine, independent JSON parser, independent flatten
    — a hash match pins the ETL semantics, not just the arithmetic.
    Float columns are plain (runs/balls)*100 IEEE double ops in both
    engines — bit-identical, no rounding grid needed."""
    from cricket_analytics_nosql_spark.sources.cricket_fixtures import (
        demo_files_values_sql,
    )

    return f"""
WITH files(name, raw) AS (VALUES {demo_files_values_sql()}),
parsed AS (SELECT name, TRY_CAST(raw AS JSON) AS j FROM files),
quarantine AS (
  SELECT COUNT(*) AS n_quarantined FROM parsed WHERE j IS NULL
),
inn AS (
  SELECT unnest(CAST(j->'$.innings' AS JSON[])) AS inning
  FROM parsed WHERE j IS NOT NULL
),
ov AS (SELECT unnest(CAST(inning->'$.overs' AS JSON[])) AS ov FROM inn),
del AS (SELECT unnest(CAST(ov->'$.deliveries' AS JSON[])) AS d FROM ov),
balls AS (
  SELECT COALESCE(d->>'$.batter', d->>'$.striker') AS batter,
         CAST(COALESCE(d->'$.runs'->>'$.batter', '0') AS BIGINT)
             AS runs_batter
  FROM del
),
agg AS (
  SELECT batter,
         CAST(SUM(runs_batter) AS BIGINT) AS runs,
         COUNT(*) AS balls,
         CAST(SUM(CASE WHEN runs_batter IN (4, 6) THEN 1 ELSE 0 END)
              AS BIGINT) AS boundaries
  FROM balls GROUP BY batter
)
SELECT batter, runs, balls, boundaries,
       CAST(runs AS DOUBLE) / balls * 100 AS strikeRate,
       CAST(boundaries AS DOUBLE) / balls * 100 AS boundaryPct,
       (SELECT n_quarantined FROM quarantine) AS n_quarantined
FROM agg
ORDER BY runs DESC, batter ASC
LIMIT 10
"""


def _demo_deliveries(spark: SparkSession) -> DataFrame:
    """Stage the fixture dump and run the full S1/S2/F1 path —
    the shared front half of every cricket catalog query."""
    from cricket_analytics_nosql_spark.operators.etl import flatten_deliveries
    from cricket_analytics_nosql_spark.sources.cricket_fixtures import (
        write_demo_dir,
    )
    from cricket_analytics_nosql_spark.sources.cricsheet import (
        read_cricsheet,
        split_quarantine,
    )

    good, _bad = split_quarantine(read_cricsheet(spark, write_demo_dir()))
    return flatten_deliveries(good)


def _deliveries_cte_sql() -> str:
    """Shared oracle prefix: DuckDB re-runs parse → quarantine →
    3-level flatten from the same fixture bytes (the
    _cricket_pipeline_oracle construction, factored so every cricket
    analytics query rides the identical independent ETL replay).
    Emits per-ball rows (battingTeam, batter, bowler, runs_batter,
    runs_total, wkt) including the list-vs-single-dict wicket drift
    fix (P8)."""
    from cricket_analytics_nosql_spark.sources.cricket_fixtures import (
        demo_files_values_sql,
    )

    return f"""
WITH files(name, raw) AS (VALUES {demo_files_values_sql()}),
parsed AS (SELECT TRY_CAST(raw AS JSON) AS j FROM files),
inn AS (
  SELECT unnest(CAST(j->'$.innings' AS JSON[])) AS inning
  FROM parsed WHERE j IS NOT NULL
),
ov AS (
  SELECT inning->>'$.team' AS battingTeam,
         unnest(CAST(inning->'$.overs' AS JSON[])) AS ov
  FROM inn
),
del AS (
  SELECT battingTeam,
         unnest(CAST(ov->'$.deliveries' AS JSON[])) AS d
  FROM ov
),
balls AS (
  SELECT battingTeam,
         COALESCE(d->>'$.batter', d->>'$.striker') AS batter,
         d->>'$.bowler' AS bowler,
         CAST(COALESCE(d->'$.runs'->>'$.batter', '0') AS BIGINT)
           AS runs_batter,
         CAST(COALESCE(d->'$.runs'->>'$.total',
              CAST(CAST(COALESCE(d->'$.runs'->>'$.batter', '0') AS BIGINT)
                   + CAST(COALESCE(d->'$.runs'->>'$.extras', '0') AS BIGINT)
                   AS VARCHAR)) AS BIGINT) AS runs_total,
         CASE WHEN (d->'$.wickets') IS NOT NULL THEN
                CASE WHEN json_array_length(d->'$.wickets') > 0
                     THEN 1 ELSE 0 END
              WHEN (d->'$.wicket') IS NOT NULL THEN 1
              ELSE 0 END AS wkt
  FROM del
)
"""


def cricket_wickets_by_bowler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$project(wkts) → $group → $sort → $limit
    (mongo_analytics_examples.py:31-38), end-to-end from the staged
    dump through the flatten — the reference's second analytics
    pipeline as its own driver-checked entry."""
    return wickets_by_bowler(_demo_deliveries(spark), limit=10)


ORACLE_CRICKET_WICKETS = (
    _deliveries_cte_sql()
    + """
SELECT bowler, CAST(SUM(wkt) AS BIGINT) AS wickets
FROM balls GROUP BY bowler
ORDER BY wickets DESC, bowler ASC
LIMIT 10
"""
)


def cricket_batter_vs_bowler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kohli_vs_southee (mongo_analytics_examples.py:40-48) / Cypher
    (a): the head-to-head duel with the reference's own default
    protagonists, P17-parameterized."""
    return batter_vs_bowler(_demo_deliveries(spark), "V Kohli", "TG Southee")


ORACLE_CRICKET_DUEL = (
    _deliveries_cte_sql()
    + """
SELECT COUNT(*) AS balls,
       CAST(SUM(runs_total) AS BIGINT) AS runs,
       CAST(SUM(wkt) AS BIGINT) AS outs
FROM balls
WHERE batter = 'V Kohli' AND bowler = 'TG Southee'
"""
)


def cricket_toughest_bowlers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cypher (b) (cypher_queries.cypher:10-16): the anchored
    one-sided join with HAVING — min_balls lowered to 1 so the
    6-ball fixture exercises the full shape."""
    return toughest_bowlers(
        _demo_deliveries(spark), "V Kohli", min_balls=1, limit=10
    )


ORACLE_CRICKET_TOUGHEST = (
    _deliveries_cte_sql()
    + """
SELECT bowler, COUNT(*) AS balls,
       CAST(SUM(runs_total) AS BIGINT) AS runs,
       CAST(SUM(runs_total) AS DOUBLE) / COUNT(*) * 100 AS strikeRate,
       CAST(SUM(wkt) AS BIGINT) AS outs
FROM balls
WHERE batter = 'V Kohli'
GROUP BY bowler
HAVING COUNT(*) >= 1
ORDER BY strikeRate ASC, outs DESC, bowler ASC
LIMIT 10
"""
)


def cricket_partnerships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cypher (c) (cypher_queries.cypher:18-25): batters of one team
    co-facing the same bowler — the 2-hop self-join with theta
    residual, min_co lowered to 1 for the fixture scale."""
    return partnership_proxy(
        _demo_deliveries(spark), "India", min_co=1, limit=20
    )


ORACLE_CRICKET_PARTNERSHIPS = (
    _deliveries_cte_sql()
    + """
, per_pair AS (
  SELECT batter, bowler, COUNT(*) AS n
  FROM balls WHERE battingTeam = 'India'
  GROUP BY batter, bowler
)
SELECT pa.batter AS a, pb.batter AS b,
       CAST(SUM(pa.n * pb.n) AS BIGINT) AS co_appearances
FROM per_pair pa JOIN per_pair pb ON pa.bowler = pb.bowler
WHERE pa.batter <> pb.batter
GROUP BY pa.batter, pb.batter
HAVING SUM(pa.n * pb.n) >= 1
ORDER BY co_appearances DESC, a, b
LIMIT 20
"""
)


QUERIES: dict[str, QuerySpec] = {
    "cricket_pipeline": QuerySpec(
        cricket_pipeline,
        _cricket_pipeline_oracle(),
        ["S1", "S2", "F1", "P7", "P8", "P11", "P12", "T1", "T2", "T5"],
    ),
    "cricket_wickets_by_bowler": QuerySpec(
        cricket_wickets_by_bowler,
        ORACLE_CRICKET_WICKETS,
        ["S1", "F1", "P8", "P13", "A2", "T1", "T5"],
    ),
    "cricket_batter_vs_bowler": QuerySpec(
        cricket_batter_vs_bowler,
        ORACLE_CRICKET_DUEL,
        ["S1", "F1", "P10", "P17", "A4"],
    ),
    "cricket_toughest_bowlers": QuerySpec(
        cricket_toughest_bowlers,
        ORACLE_CRICKET_TOUGHEST,
        ["S1", "F1", "J2", "A6", "P17", "T3"],
    ),
    "cricket_partnerships": QuerySpec(
        cricket_partnerships,
        ORACLE_CRICKET_PARTNERSHIPS,
        ["S1", "F1", "J3", "P16", "A8", "T1"],
    ),
}
