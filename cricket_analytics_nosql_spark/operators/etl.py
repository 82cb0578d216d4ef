"""Cricket ETL kernels — the reference's signature dataflow
(SURVEY.md §2.3, §7.3) as pure DataFrame transforms.

``normalize_matches`` ≙ normalize_match (etl_cricsheet_to_mongo.py:28-68)
``flatten_deliveries`` ≙ iter_deliveries (etl_cricsheet_to_mongo.py:70-106)

Both are narrow (no shuffle): struct projection + 3-level explode,
fully pipelined inside one whole-stage-codegen span — at 100 TB this
runs at parquet-scan speed with per-split parallelism, vs the
reference's single-threaded Python generator.

Mongo-vs-Spark semantic note: Mongo distinguishes *missing field*
from *null*; Spark has only null. The reference's `.get(k, default)`
chains therefore map to F.coalesce, which treats both identically —
the one observable divergence is Python's `or` also swallowing empty
strings/zero; where that matters (the _id fallback, etl:52) we
replicate truthiness explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.scalar import flag


def _truthy_str(col: F.Column) -> F.Column:
    """Python `or` semantics for strings: '' is as falsy as NULL."""
    return F.when(col.isNotNull() & (col != ""), col)


def normalize_matches(raw: DataFrame) -> DataFrame:
    """One row per match: synthetic-keyed, compacted-outcome metadata
    doc (etl_cricsheet_to_mongo.py:51-68).

    - _id fallback chain (etl:31,52): match_id → registry.match →
      event.match_number → city + "-" + first date (P2/P3)
    - result text (etl:41-49): '<winner> won by N runs|wickets' when
      outcome.by exists, else outcome.result (P5)
    - first-date ISO parse is try-cast validation only — the stored
      doc keeps raw strings (etl:33-37,55); exposed as date_valid (P4)
    """
    info = F.col("info")
    # try_element_at: ANSI-safe null on empty array — exactly the
    # reference's `dates[0] if dates else None` (etl:32-33) (P6)
    date_str = F.try_element_at(info["dates"], F.lit(1))
    by = info["outcome"]["by"]
    winner = info["outcome"]["winner"]
    result = (
        F.when(
            by.isNotNull() & by["runs"].isNotNull(),
            F.concat_ws(
                " ", winner, F.lit("won by"), by["runs"], F.lit("runs")
            ),
        )
        .when(
            by.isNotNull() & by["wickets"].isNotNull(),
            F.concat_ws(
                " ", winner, F.lit("won by"), by["wickets"], F.lit("wickets")
            ),
        )
        .otherwise(_truthy_str(info["outcome"]["result"]))
    )
    match_id = F.coalesce(
        _truthy_str(info["match_id"]), _truthy_str(info["registry"]["match"])
    )
    synthetic = F.concat(
        F.coalesce(info["city"], F.lit("")),
        F.lit("-"),
        F.coalesce(date_str, F.lit("")),
    )
    return raw.select(
        F.coalesce(
            match_id, info["event"]["match_number"].cast("string"), synthetic
        ).alias("_id"),
        F.struct(
            info["dates"].alias("dates"),
            info["team_type"].alias("team_type"),
            info["match_type"].alias("match_type"),
            info["gender"].alias("gender"),
            F.coalesce(info["teams"], F.array().cast("array<string>")).alias(
                "teams"
            ),
            info["venue"].alias("venue"),
            info["city"].alias("city"),
            info["officials"].alias("officials"),
        ).alias("info"),
        F.struct(winner.alias("winner"), result.alias("result")).alias("outcome"),
        F.col("meta")["data_version"].alias("source_version"),
        F.try_to_timestamp(date_str).isNotNull().cast("int").alias("date_valid"),
    )


def flatten_deliveries(raw: DataFrame) -> DataFrame:
    """F1: the 3-level innings[]→overs[]→deliveries[] flatten with
    ancestor-carrying (etl_cricsheet_to_mongo.py:70-106) as a chained
    explode — one row per ball.

    Drift handling, all per the reference:
    - innings label: innings → number → team (etl:74; mixed int/str
      in Mongo, normalized to string here — Spark columns are typed)
    - batter → striker (etl:80); non_striker → nonStriker (etl:81)
    - runs sub-doc defaults and total = batter + extras when total is
      missing (etl:84-86, P7)
    - wickets: list → single-dict `wicket` → [] (etl:87-89, P8)
    - is_boundary / is_dot 0/1 flags (etl:104-105, P9)
    """
    # the match _id must be identical to normalize_matches' chain
    info = F.col("info")
    date_str = F.try_element_at(info["dates"], F.lit(1))
    match_id = F.coalesce(
        _truthy_str(info["match_id"]),
        _truthy_str(info["registry"]["match"]),
        info["event"]["match_number"].cast("string"),
        F.concat(
            F.coalesce(info["city"], F.lit("")),
            F.lit("-"),
            F.coalesce(date_str, F.lit("")),
        ),
    )
    inn = (
        raw.select(match_id.alias("matchId"), F.explode("innings").alias("inn"))
        .select(
            "matchId",
            F.coalesce(
                F.col("inn.innings").cast("string"),
                F.col("inn.number").cast("string"),
                F.col("inn.team"),
            ).alias("innings"),
            F.col("inn.team").alias("battingTeam"),
            F.explode("inn.overs").alias("ov"),
        )
    )
    d = inn.select(
        "matchId",
        "innings",
        "battingTeam",
        F.col("ov.over").alias("over"),
        F.explode("ov.deliveries").alias("d"),
    )
    runs_batter = F.coalesce(F.col("d.runs.batter"), F.lit(0))
    runs_extras = F.coalesce(F.col("d.runs.extras"), F.lit(0))
    runs_total = F.coalesce(F.col("d.runs.total"), runs_batter + runs_extras)
    wickets = F.coalesce(
        F.col("d.wickets"),
        F.when(F.col("d.wicket").isNotNull(), F.array(F.col("d.wicket"))),
        F.array().cast("array<struct<player_out:string,kind:string>>"),
    )
    return d.select(
        "matchId",
        "innings",
        "battingTeam",
        "over",
        F.col("d.ball").alias("ball"),
        F.coalesce(F.col("d.batter"), F.col("d.striker")).alias("batter"),
        F.coalesce(F.col("d.non_striker"), F.col("d.nonStriker")).alias(
            "nonStriker"
        ),
        F.col("d.bowler").alias("bowler"),
        runs_batter.alias("runs_batter"),
        runs_extras.alias("runs_extras"),
        runs_total.alias("runs_total"),
        wickets.alias("wickets"),
        flag(runs_batter.isin(4, 6)).alias("is_boundary"),
        flag(runs_total == 0).alias("is_dot"),
    )


def upsert_by_key(df: DataFrame, path: str, keys: list[str]) -> None:
    """S3/A9: replace_one(upsert=True) semantics (etl:136) as an
    idempotent dedup-write: at most one row per key, full overwrite.
    Recomputing and overwriting a partition is the Spark-native
    idempotency story (Delta MERGE being the incremental variant —
    kept out to stay format-agnostic, SURVEY §1.4)."""
    df.dropDuplicates(keys).write.mode("overwrite").parquet(path)
