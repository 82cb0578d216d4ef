"""Mongo-pipeline compiler tests: the reference's EXACT pipeline
documents (mongo_analytics_examples.py, quoted verbatim below),
compiled onto a cricket-shaped DataFrame, must agree with the native
DataFrame implementations in operators/cricket.py — the "run your
existing pipelines unchanged" guarantee."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.cricket import (
    batter_vs_bowler,
    runs_by_batter,
    wickets_by_bowler,
)
from cricket_analytics_nosql_spark.plans.mongo_pipeline import (
    compile_expr,
    compile_pipeline,
)


@pytest.fixture(scope="module")
def deliveries(spark):
    rows = [
        # matchId, batter, bowler, runs_batter, runs_total, wickets
        ("M1", "V Kohli", "TG Southee", 4, 4, None),
        ("M1", "V Kohli", "TG Southee", 0, 0, [("V Kohli", "caught")]),
        ("M1", "V Kohli", "MA Starc", 6, 6, None),
        ("M1", "RG Sharma", "TG Southee", 1, 1, None),
        ("M1", "RG Sharma", "MA Starc", 0, 1, None),
        ("M2", "V Kohli", "TG Southee", 2, 2, None),
        ("M2", "RG Sharma", "MA Starc", 0, 0, [("RG Sharma", "bowled")]),
        ("M2", "MS Dhoni", "TG Southee", 6, 6, None),
    ]
    df = spark.createDataFrame(
        rows,
        "matchId string, batter string, bowler string, runs_batter int, "
        "runs_total int, wickets array<struct<player_out:string,kind:string>>",
    )
    return df.withColumn(
        "is_boundary", F.col("runs_batter").isin(4, 6).cast("int")
    )


def rows_of(df):
    return [tuple(r) for r in df.collect()]


def test_reference_runs_by_batter_pipeline(spark, deliveries):
    """mongo_analytics_examples.py:19-28, verbatim stage documents."""
    pipe = [
        {
            "$group": {
                "_id": "$batter",
                "runs": {"$sum": "$runs_batter"},
                "balls": {"$sum": 1},
                "boundaries": {"$sum": "$is_boundary"},
            }
        },
        {
            "$addFields": {
                "strikeRate": {
                    "$multiply": [{"$divide": ["$runs", "$balls"]}, 100]
                },
                "boundaryPct": {
                    "$multiply": [{"$divide": ["$boundaries", "$balls"]}, 100]
                },
            }
        },
        {"$sort": {"runs": -1, "_id": 1}},
        {"$limit": 10},
    ]
    got = compile_pipeline(deliveries, pipe)
    native = runs_by_batter(deliveries)
    got_rows = rows_of(
        got.select("_id", "runs", "balls", "boundaries", "strikeRate", "boundaryPct")
    )
    native_rows = rows_of(
        native.select("batter", "runs", "balls", "boundaries", "strikeRate", "boundaryPct")
    )
    assert got_rows == native_rows
    assert got_rows[0][0] == "V Kohli" and got_rows[0][1] == 12


def test_reference_wickets_by_bowler_pipeline(spark, deliveries):
    """mongo_analytics_examples.py:32-38: $project flag via
    $cond/$size/$ifNull, then $group/$sort/$limit."""
    pipe = [
        {
            "$project": {
                "bowler": 1,
                "wkts": {
                    "$cond": [
                        {"$gt": [{"$size": {"$ifNull": ["$wickets", []]}}, 0]},
                        1,
                        0,
                    ]
                },
            }
        },
        {"$group": {"_id": "$bowler", "wickets": {"$sum": "$wkts"}}},
        {"$sort": {"wickets": -1, "_id": 1}},
        {"$limit": 10},
    ]
    got = rows_of(compile_pipeline(deliveries, pipe))
    native = rows_of(wickets_by_bowler(deliveries))
    assert got == native
    assert got[0] == ("MA Starc", 1) or got[0] == ("TG Southee", 1)


def test_reference_head_to_head_pipeline(spark, deliveries):
    """mongo_analytics_examples.py:41-48: $match both names + global
    $group (_id: None)."""
    pipe = [
        {"$match": {"batter": "V Kohli", "bowler": "TG Southee"}},
        {
            "$group": {
                "_id": None,
                "balls": {"$sum": 1},
                "runs": {"$sum": "$runs_total"},
                "outs": {
                    "$sum": {
                        "$cond": [
                            {"$gt": [{"$size": {"$ifNull": ["$wickets", []]}}, 0]},
                            1,
                            0,
                        ]
                    }
                },
            }
        },
    ]
    got = compile_pipeline(deliveries, pipe).collect()[0]
    native = batter_vs_bowler(deliveries, "V Kohli", "TG Southee").collect()[0]
    assert (got.balls, got.runs, got.outs) == (
        native.balls,
        native.runs,
        native.outs,
    ) == (3, 6, 1)


def test_match_operator_dialect(spark, deliveries):
    got = compile_pipeline(
        deliveries,
        [{"$match": {"runs_batter": {"$gte": 4}, "bowler": {"$in": ["TG Southee", "MA Starc"]}}}],
    )
    assert got.count() == 3


def test_unwind_carries_ancestors(spark, deliveries):
    got = compile_pipeline(
        deliveries,
        [
            {"$match": {"wickets": {"$exists": True}}},
            {"$unwind": "$wickets"},
            {"$project": {"batter": 1, "kind": "$wickets.kind"}},
        ],
    )
    assert rows_of(got.orderBy("batter")) == [
        ("RG Sharma", "bowled"),
        ("V Kohli", "caught"),
    ]


def test_group_by_document_key(spark, deliveries):
    got = compile_pipeline(
        deliveries,
        [
            {
                "$group": {
                    "_id": {"m": "$matchId", "b": "$batter"},
                    "n": {"$sum": 1},
                }
            },
            {"$sort": {"n": -1}},
        ],
    )
    top = got.collect()[0]
    assert top._id.m == "M1" and top._id.b in ("V Kohli", "RG Sharma")
    assert top.n == 3 or top.n == 2


def test_unsupported_stage_raises(spark, deliveries):
    with pytest.raises(ValueError, match="unsupported pipeline stage"):
        compile_pipeline(deliveries, [{"$densifyX": {}}])
    with pytest.raises(ValueError, match="collections resolver"):
        compile_pipeline(deliveries, [{"$graphLookup": {"from": "g"}}])
    with pytest.raises(ValueError, match="collections resolver"):
        compile_pipeline(deliveries, [{"$lookup": {}}])
    with pytest.raises(ValueError, match="sinks path resolver"):
        compile_pipeline(deliveries, [{"$merge": {"into": "t"}}])


def test_expr_literal_and_concat(spark):
    df = spark.range(1).select(F.lit("a").alias("x"))
    col = compile_expr({"$concat": ["$x", {"$literal": "-"}, "b"]})
    assert df.select(col.alias("y")).collect()[0].y == "a-b"


def test_lookup_unwind_equals_join(spark, deliveries):
    players = spark.createDataFrame(
        [("V Kohli", "India"), ("RG Sharma", "India"), ("MS Dhoni", "India")],
        "name string, team string",
    )
    got = compile_pipeline(
        deliveries,
        [
            {
                "$lookup": {
                    "from": "players",
                    "localField": "batter",
                    "foreignField": "name",
                    "as": "p",
                }
            },
            {"$unwind": "$p"},
            {"$group": {"_id": "$p.team", "n": {"$sum": 1}}},
        ],
        collections={"players": players},
    ).collect()
    assert [(r._id, r.n) for r in got] == [("India", 8)]


def test_lookup_no_match_is_empty_array(spark, deliveries):
    players = spark.createDataFrame([("Nobody", "X")], "name string, team string")
    got = compile_pipeline(
        deliveries,
        [{"$lookup": {"from": "players", "localField": "batter",
                      "foreignField": "name", "as": "p"}}],
        collections={"players": players},
    )
    assert got.filter(F.size("p") == 0).count() == deliveries.count()


def test_union_with(spark, deliveries):
    got = compile_pipeline(
        deliveries,
        [{"$unionWith": "more"}, {"$count": "n"}],
        collections={"more": deliveries},
    ).collect()
    assert got[0].n == 2 * deliveries.count()


def test_sort_by_count(spark, deliveries):
    got = compile_pipeline(deliveries, [{"$sortByCount": "$batter"}]).collect()
    assert [(r._id, r["count"]) for r in got] == [
        ("V Kohli", 4),
        ("RG Sharma", 3),
        ("MS Dhoni", 1),
    ]


def test_replace_root_promotes_struct(spark):
    df = spark.createDataFrame(
        [(1, ("x", 2))], "id int, info struct<name:string,n:int>"
    )
    got = compile_pipeline(df, [{"$replaceRoot": {"newRoot": "$info"}}])
    assert got.columns == ["name", "n"]
    assert tuple(got.collect()[0]) == ("x", 2)


def test_facet_two_pipelines_one_row(spark, deliveries):
    got = compile_pipeline(
        deliveries,
        [
            {
                "$facet": {
                    "by_batter": [
                        {"$group": {"_id": "$batter", "n": {"$sum": 1}}},
                        {"$sort": {"n": -1, "_id": 1}},
                    ],
                    "totals": [
                        {"$group": {"_id": None, "runs": {"$sum": "$runs_total"}}}
                    ],
                }
            }
        ],
    ).collect()
    assert len(got) == 1
    row = got[0]
    assert [(r["_id"], r["n"]) for r in row.by_batter] == [
        ("V Kohli", 4), ("RG Sharma", 3), ("MS Dhoni", 1)
    ]
    assert row.totals[0]["runs"] == 20


def test_bucket_default_and_bounds(spark, deliveries):
    got = compile_pipeline(
        deliveries,
        [
            {
                "$bucket": {
                    "groupBy": "$runs_batter",
                    "boundaries": [0, 1, 4],
                    "default": -99,
                }
            },
            {"$sort": {"_id": 1}},
        ],
    ).collect()
    # runs: [4,0,6,1,0,2,0,6] → [0,1): three 0s; [1,4): 1,2; default: 4,6,6
    assert [(r._id, r["count"]) for r in got] == [(-99, 3), (0, 3), (1, 2)]


# ---------------------------------------------------------------------------
# Mongo-semantics edge cases: $project modality, ordered $group
# accumulators, $in field paths, $lookup null/collision rules
# ---------------------------------------------------------------------------


def test_project_exclusion_mode_keeps_other_columns(spark, deliveries):
    out = compile_pipeline(deliveries, [{"$project": {"wickets": 0}}])
    assert "wickets" not in out.columns
    # everything else survives — exclusion is not "skip"
    assert set(out.columns) == set(deliveries.columns) - {"wickets"}
    out2 = compile_pipeline(
        deliveries, [{"$project": {"wickets": 0, "is_boundary": 0}}]
    )
    assert set(out2.columns) == set(deliveries.columns) - {
        "wickets",
        "is_boundary",
    }


def test_project_id_exclusion_alone(spark, deliveries):
    withid = deliveries.withColumn("_id", F.col("matchId"))
    out = compile_pipeline(withid, [{"$project": {"_id": 0}}])
    assert set(out.columns) == set(deliveries.columns)


def test_project_mixed_mode_raises(spark, deliveries):
    with pytest.raises(ValueError, match="mix"):
        compile_pipeline(
            deliveries, [{"$project": {"batter": 1, "wickets": 0}}]
        )


def test_project_inclusion_with_id_exclusion(spark, deliveries):
    withid = deliveries.withColumn("_id", F.col("matchId"))
    out = compile_pipeline(
        withid, [{"$project": {"_id": 0, "batter": 1}}]
    )
    assert out.columns == ["batter"]


def test_sort_group_first_is_deterministic_across_partitions(spark):
    """'$sort then $group {$first}' (top-1-per-group) must give the
    sort-order answer regardless of partitioning — the compiler folds
    the sort into the aggregation via a per-group ordinal."""
    import random

    rows = [
        (k, v, f"p{k}_{v}")
        for k in range(20)
        for v in random.Random(3).sample(range(1000), 50)
    ]
    df = spark.createDataFrame(
        rows, "k int, v int, payload string"
    ).repartition(32)
    out = compile_pipeline(
        df,
        [
            {"$sort": {"v": -1}},
            {
                "$group": {
                    "_id": "$k",
                    "best": {"$first": "$payload"},
                    "worst": {"$last": "$payload"},
                    "n": {"$sum": 1},
                    "all_v": {"$push": "$v"},
                }
            },
        ],
    )
    got = {r._id: (r.best, r.worst, r.all_v) for r in out.collect()}
    by_k = {}
    for k, v, p in rows:
        by_k.setdefault(k, []).append((v, p))
    for k, vals in by_k.items():
        vals.sort(key=lambda t: -t[0])
        assert got[k][0] == vals[0][1], k
        assert got[k][1] == vals[-1][1], k
        assert got[k][2] == [v for v, _ in vals], k


def test_in_with_field_path_array(spark, deliveries):
    tagged = deliveries.withColumn(
        "tags", F.array(F.col("batter"), F.col("bowler"))
    )
    out = compile_pipeline(
        tagged,
        [
            {"$addFields": {"kohli_involved": {"$in": ["V Kohli", "$tags"]}}},
            {"$match": {"kohli_involved": True}},
        ],
    )
    got = rows_of(out.select("batter", "bowler"))
    assert all("V Kohli" in t for t in got)
    assert len(got) == 4


def test_in_rejects_non_list_literal(spark):
    with pytest.raises(ValueError, match="\\$in"):
        compile_expr({"$in": ["$x", "tags"]})


def test_lookup_null_key_matches_null_foreign(spark):
    local = spark.createDataFrame(
        [(1, "a"), (2, None)], "id int, key string"
    )
    foreign = spark.createDataFrame(
        [("a", 10), (None, 99)], "fkey string, payload int"
    )
    out = compile_pipeline(
        local,
        [
            {
                "$lookup": {
                    "from": "f",
                    "localField": "key",
                    "foreignField": "fkey",
                    "as": "matched",
                }
            }
        ],
        collections={"f": foreign},
    )
    got = {r.id: [m.payload for m in r.matched] for r in out.collect()}
    assert got == {1: [10], 2: [99]}


def test_lookup_as_collision_raises(spark, deliveries):
    with pytest.raises(ValueError, match="collides"):
        compile_pipeline(
            deliveries,
            [
                {
                    "$lookup": {
                        "from": "f",
                        "localField": "batter",
                        "foreignField": "batter",
                        "as": "wickets",
                    }
                }
            ],
            collections={"f": deliveries},
        )


def test_merge_sink_roundtrip_matches_dataframe_twin(spark, tmp_path):
    """$merge writes, re-reads, and must hash-match the DataFrame-API
    upsert twin (full-outer coalesce) for every whenMatched /
    whenNotMatched combination supported."""
    target = str(tmp_path / "balances")
    existing = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "_id long, bal long"
    )
    incoming = spark.createDataFrame(
        [(2, 999), (4, 400)], "_id long, bal long"
    )

    def run(when_matched, when_not_matched):
        existing.write.mode("overwrite").parquet(target)
        out = compile_pipeline(
            incoming,
            [
                {
                    "$merge": {
                        "into": "t",
                        "on": "_id",
                        "whenMatched": when_matched,
                        "whenNotMatched": when_not_matched,
                    }
                }
            ],
            sinks={"t": target},
        )
        return {r._id: r.bal for r in out.collect()}

    assert run("replace", "insert") == {1: 100, 2: 999, 3: 300, 4: 400}
    assert run("keepExisting", "insert") == {1: 100, 2: 200, 3: 300, 4: 400}
    assert run("replace", "discard") == {1: 100, 2: 999, 3: 300}
    # DataFrame-API twin of the default (replace/insert) mode
    existing.write.mode("overwrite").parquet(target)
    twin = (
        existing.alias("o")
        .join(incoming.alias("n"), "_id", "full_outer")
        .select(
            "_id",
            F.coalesce(F.col("n.bal"), F.col("o.bal")).alias("bal"),
        )
    )
    want = {r._id: r.bal for r in twin.collect()}
    assert run("replace", "insert") == want


def test_out_sink_replaces_target(spark, tmp_path):
    target = str(tmp_path / "out_t")
    spark.createDataFrame([(99, 1)], "_id long, n long").write.parquet(target)
    src = spark.createDataFrame([(1, 10), (2, 20)], "_id long, n long")
    out = compile_pipeline(
        src, [{"$match": {"n": {"$gt": 0}}}, {"$out": "t"}], sinks={"t": target}
    )
    assert {r._id for r in out.collect()} == {1, 2}


def test_sink_stage_must_be_terminal(spark, tmp_path):
    src = spark.createDataFrame([(1, 10)], "_id long, n long")
    with pytest.raises(ValueError, match="final"):
        compile_pipeline(
            src,
            [{"$out": "t"}, {"$limit": 1}],
            sinks={"t": str(tmp_path / "x")},
        )


def test_match_boolean_connectors_and_regex(spark, deliveries):
    out = compile_pipeline(
        deliveries,
        [
            {
                "$match": {
                    "$or": [
                        {"batter": {"$regex": "^V "}},
                        {"runs_batter": {"$gte": 6}},
                    ],
                    "bowler": {"$not": {"$eq": "MA Starc"}},
                }
            }
        ],
    )
    rows = out.select("batter", "bowler", "runs_batter").collect()
    assert rows, "connector match returned nothing"
    for r in rows:
        assert r.batter.startswith("V ") or r.runs_batter >= 6
        assert r.bowler != "MA Starc"
    nor = compile_pipeline(
        deliveries,
        [{"$match": {"$nor": [{"batter": "V Kohli"}, {"runs_batter": 0}]}}],
    ).collect()
    for r in nor:
        assert r.batter != "V Kohli" and r.runs_batter != 0


def test_sort_skip_limit_pagination(spark, deliveries):
    page = compile_pipeline(
        deliveries,
        [
            {"$sort": {"runs_batter": -1, "batter": 1, "bowler": 1}},
            {"$skip": 2},
            {"$limit": 3},
        ],
    ).select("runs_batter").collect()
    full = sorted(
        deliveries.select("runs_batter", "batter", "bowler").collect(),
        key=lambda r: (-r.runs_batter, r.batter, r.bowler),
    )
    assert [r.runs_batter for r in page] == [r.runs_batter for r in full[2:5]]


def test_unwind_options(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)], "id int, xs array<string>"
    )
    plain = compile_pipeline(df, [{"$unwind": "$xs"}])
    assert plain.count() == 2
    kept = compile_pipeline(
        df, [{"$unwind": {"path": "$xs", "preserveNullAndEmptyArrays": True}}]
    )
    assert kept.count() == 4  # 2 elements + the empty + the null row
    indexed = compile_pipeline(
        df, [{"$unwind": {"path": "$xs", "includeArrayIndex": "i"}}]
    )
    got = {(r.id, r.i, r.xs) for r in indexed.collect()}
    assert got == {(1, 0, "a"), (1, 1, "b")}


def test_set_window_fields_rank_shift_and_frames(spark):
    rows = [
        ("a", 1, 10), ("a", 2, 20), ("a", 2, 5), ("a", 3, 1),
        ("b", 1, 7), ("b", 2, 7),
    ]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    out = compile_pipeline(
        df,
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$k",
                    "sortBy": {"t": 1, "v": 1},
                    "output": {
                        "running": {
                            "$sum": "$v",
                            "window": {"documents": ["unbounded", "current"]},
                        },
                        "total": {
                            "$sum": "$v",
                            "window": {"documents": ["unbounded", "unbounded"]},
                        },
                        "rk": {"$rank": {}},
                        "dn": {"$documentNumber": {}},
                        "prev_v": {"$shift": {"output": "$v", "by": -1}},
                        "next_v": {"$shift": {"output": "$v", "by": 1, "default": -1}},
                    },
                }
            },
            {"$sort": {"k": 1, "t": 1, "v": 1}},
        ],
    ).collect()
    a = [r for r in out if r.k == "a"]
    assert [r.running for r in a] == [10, 15, 35, 36]
    assert all(r.total == 36 for r in a)
    assert [r.rk for r in a] == [1, 2, 3, 4]
    assert [r.dn for r in a] == [1, 2, 3, 4]
    assert [r.prev_v for r in a] == [None, 10, 5, 20]
    assert [r.next_v for r in a] == [5, 20, 1, -1]
    b = [r for r in out if r.k == "b"]
    assert [r.running for r in b] == [7, 14]


def test_set_window_fields_requires_sort_for_rank(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(ValueError, match="requires sortBy"):
        compile_pipeline(
            df,
            [
                {
                    "$setWindowFields": {
                        "partitionBy": "$k",
                        "output": {"r": {"$rank": {}}},
                    }
                }
            ],
        )


def test_date_expression_operators(spark):
    import datetime

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 7, 14, 45, 9),)], "ts timestamp"
    )
    out = compile_pipeline(
        df,
        [
            {
                "$addFields": {
                    "y": {"$year": "$ts"},
                    "m": {"$month": "$ts"},
                    "d": {"$dayOfMonth": "$ts"},
                    "h": {"$hour": "$ts"},
                    "s": {
                        "$dateToString": {
                            "format": "%Y-%m-%d %H:%M",
                            "date": "$ts",
                        }
                    },
                    "trunc": {"$dateTrunc": {"date": "$ts", "unit": "hour"}},
                }
            }
        ],
    ).collect()[0]
    assert (out.y, out.m, out.d, out.h) == (2024, 3, 7, 14)
    assert out.s == "2024-03-07 14:45"
    assert out.trunc.minute == 0 and out.trunc.hour == 14


def test_unset_and_replace_with(spark, deliveries):
    out = compile_pipeline(deliveries, [{"$unset": ["wickets", "is_boundary"]}])
    assert set(out.columns) == set(deliveries.columns) - {"wickets", "is_boundary"}
    out2 = compile_pipeline(deliveries, [{"$unset": "wickets"}])
    assert "wickets" not in out2.columns
    nested = deliveries.select(
        F.struct("batter", "bowler").alias("duel"), "runs_batter"
    )
    out3 = compile_pipeline(nested, [{"$replaceWith": "$duel"}])
    assert out3.columns == ["batter", "bowler"]


def test_expr_string_and_math_operators(spark):
    """Round-3 expression surface: string case/trim/substr, math,
    $switch — checked against hand-computed values."""
    df = spark.range(1).select(
        F.lit("  Hello World  ").alias("s"), F.lit(-2.7).alias("x")
    )
    cases = {
        "up": ({"$toUpper": {"$trim": {"input": "$s"}}}, "HELLO WORLD"),
        "low": ({"$toLower": {"$trim": {"input": "$s"}}}, "hello world"),
        "ln_": ({"$strLenCP": {"$trim": {"input": "$s"}}}, 11),
        "sub": ({"$substrCP": [{"$trim": {"input": "$s"}}, 6, 5]}, "World"),
        "abs_": ({"$abs": "$x"}, 2.7),
        "ceil_": ({"$ceil": "$x"}, -2),
        "floor_": ({"$floor": "$x"}, -3),
        "pw": ({"$pow": [{"$abs": "$x"}, 2]}, 7.29),
        "mx": ({"$max": [1, 5, 3]}, 5),
        "mn": ({"$min": [{"$literal": 9}, 4]}, 4),
        "sw": (
            {"$switch": {
                "branches": [
                    {"case": {"$lt": ["$x", -10]}, "then": "lo"},
                    {"case": {"$lt": ["$x", 0]}, "then": "neg"},
                ],
                "default": "pos",
            }},
            "neg",
        ),
    }
    row = df.select(
        *[compile_expr(e).alias(k) for k, (e, _) in cases.items()]
    ).collect()[0]
    for k, (_, want) in cases.items():
        got = getattr(row, k)
        if isinstance(want, float):
            assert got == pytest.approx(want), (k, got)
        else:
            assert got == want, (k, got)


def test_expr_array_lambda_operators(spark):
    """$filter/$map/$reduce/$slice/$arrayElemAt/$concatArrays with
    $$this / named variables."""
    df = spark.range(1).select(F.array(F.lit(3), F.lit(1), F.lit(4), F.lit(1), F.lit(5)).alias("a"))
    cases = {
        "filt": ({"$filter": {"input": "$a", "cond": {"$gt": ["$$this", 1]}}}, [3, 4, 5]),
        "filt_named": (
            {"$filter": {"input": "$a", "as": "n", "cond": {"$gte": ["$$n", 4]}}},
            [4, 5],
        ),
        "mp": ({"$map": {"input": "$a", "in": {"$multiply": ["$$this", 10]}}}, [30, 10, 40, 10, 50]),
        "red": ({"$reduce": {"input": "$a", "initialValue": 0, "in": {"$add": ["$$value", "$$this"]}}}, 14),
        "head2": ({"$slice": ["$a", 2]}, [3, 1]),
        "last2": ({"$slice": ["$a", -2]}, [1, 5]),
        "mid": ({"$slice": ["$a", 1, 3]}, [1, 4, 1]),
        "at0": ({"$arrayElemAt": ["$a", 0]}, 3),
        "atneg": ({"$arrayElemAt": ["$a", -1]}, 5),
        "cat": ({"$concatArrays": [{"$slice": ["$a", 1]}, {"$slice": ["$a", -1]}]}, [3, 5]),
    }
    row = df.select(
        *[compile_expr(e).alias(k) for k, (e, _) in cases.items()]
    ).collect()[0]
    for k, (_, want) in cases.items():
        got = getattr(row, k)
        if isinstance(want, list):
            got = list(got)
        assert got == want, (k, got)


def test_expr_unbound_variable_raises(spark):
    with pytest.raises(ValueError, match="unbound expression variable"):
        compile_expr({"$add": ["$$this", 1]})


def test_set_window_fields_default_window_is_whole_partition(spark):
    """Mongo's default window with sortBy present is the WHOLE
    partition, not a running frame (Spark's implicit frame under an
    orderBy) — every row must carry the partition total."""
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 30), ("b", 1, 5)],
        "k string, t int, v int",
    )
    got = compile_pipeline(
        df,
        [{"$setWindowFields": {
            "partitionBy": "$k",
            "sortBy": {"t": 1},
            "output": {"total": {"$sum": "$v"}},
        }}],
    )
    rows = {(r.k, r.t): r.total for r in got.collect()}
    assert rows[("a", 1)] == 60 and rows[("a", 2)] == 60 and rows[("a", 3)] == 60
    assert rows[("b", 1)] == 5


def test_sort_key_overwrite_poisons_ordered_group(spark, deliveries):
    """$sort → $addFields overwriting the sort key → ordered $group
    must raise (Mongo orders by the ORIGINAL values, which no longer
    exist) instead of silently ordering by the rewritten ones."""
    pipe = [
        {"$sort": {"runs_total": -1}},
        {"$addFields": {"runs_total": {"$abs": "$runs_total"}}},
        {"$group": {"_id": "$batter", "best": {"$first": "$bowler"}}},
    ]
    with pytest.raises(ValueError, match="rewrites/removes .sort key"):
        compile_pipeline(deliveries, pipe)
    # order-INsensitive accumulators after the overwrite stay legal
    ok = compile_pipeline(
        deliveries,
        [
            {"$sort": {"runs_total": -1}},
            {"$addFields": {"runs_total": {"$abs": "$runs_total"}}},
            {"$group": {"_id": "$batter", "n": {"$sum": 1}}},
        ],
    )
    assert ok.count() == 3
    # and a fresh $sort AFTER the overwrite un-poisons
    ok2 = compile_pipeline(
        deliveries,
        [
            {"$sort": {"runs_total": -1}},
            {"$addFields": {"runs_total": {"$abs": "$runs_total"}}},
            {"$sort": {"runs_total": -1}},
            {"$group": {"_id": "$batter", "best": {"$first": "$bowler"}}},
        ],
    )
    assert ok2.count() == 3


def test_merge_read_failure_is_not_treated_as_first_write(spark, deliveries, tmp_path):
    """A corrupt/unreadable existing target must raise, never be
    silently overwritten with only the incoming rows."""
    target = tmp_path / "tgt"
    target.mkdir()
    (target / "part-00000.parquet").write_text("this is not parquet")
    with pytest.raises(Exception, match="(?i)parquet|footer|corrupt|magic"):
        compile_pipeline(
            deliveries.withColumn("_id", F.col("batter")),
            [{"$merge": {"into": "t", "on": "_id"}}],
            sinks={"t": str(target)},
        ).collect()


def test_fill_value_and_locf(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 10), ("a", 3, None), ("a", 4, None),
         ("b", 1, None), ("b", 2, 7)],
        "k string, t int, v int",
    )
    got = compile_pipeline(
        df,
        [{"$fill": {
            "partitionBy": "$k",
            "sortBy": {"t": 1},
            "output": {"v": {"method": "locf"}},
        }},
         {"$fill": {"output": {"v": {"value": -1}}}}],
    )
    rows = {(r.k, r.t): r.v for r in got.collect()}
    # locf carries 10 forward within partition a; leading nulls get
    # the value-fill fallback
    assert rows == {
        ("a", 1): -1, ("a", 2): 10, ("a", 3): 10, ("a", 4): 10,
        ("b", 1): -1, ("b", 2): 7,
    }
    with pytest.raises(ValueError, match="locf requires sortBy"):
        compile_pipeline(df, [{"$fill": {"output": {"v": {"method": "locf"}}}}])


def test_densify_partition_and_explicit_bounds(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 4, "y"), ("b", 2, "z")],
        "k string, t int, payload string",
    )
    got = compile_pipeline(
        df,
        [{"$densify": {
            "field": "t",
            "partitionByFields": ["k"],
            "range": {"step": 1, "bounds": "partition"},
        }}],
    )
    rows = sorted((r.k, r.t, r.payload) for r in got.collect())
    # generated docs carry only (k, t); payload is null
    assert rows == [
        ("a", 1, "x"), ("a", 2, None), ("a", 3, None), ("a", 4, "y"),
        ("b", 2, "z"),
    ]
    full = compile_pipeline(
        df,
        [{"$densify": {
            "field": "t",
            "partitionByFields": ["k"],
            "range": {"step": 2, "bounds": [0, 5]},
        }}],
    )
    frows = sorted((r.k, r.t) for r in full.select("k", "t").collect())
    # [0, 5) step 2 -> 0, 2, 4 per partition, unioned with existing
    # (values that already exist are not generated twice)
    assert frows == [
        ("a", 0), ("a", 1), ("a", 2), ("a", 4),
        ("b", 0), ("b", 2), ("b", 4),
    ]


def test_graph_lookup_bfs_depths_and_cycle(spark):
    """$graphLookup: BFS over an edge-doc collection with a cycle —
    reached sets, first-reach depths, maxDepth truncation, and the
    empty-result fill all checked by hand."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("x", "x")],
        "src string, dst string",
    )
    people = spark.createDataFrame(
        [("a",), ("d",), ("z",)], "start string"
    )
    got = compile_pipeline(
        people,
        [{"$graphLookup": {
            "from": "g",
            "startWith": "$start",
            "connectFromField": "dst",
            "connectToField": "src",
            "as": "reach",
            "depthField": "d",
        }}],
        collections={"g": edges},
    )
    rows = {r.start: sorted((e.src, e.dst, e.d) for e in r.reach)
            for r in got.collect()}
    # from a: (a,b)@0 -> (b,c)@1 -> (c,a),(c,d)@2 -> (a,b) already seen
    assert rows["a"] == [("a", "b", 0), ("b", "c", 1), ("c", "a", 2), ("c", "d", 2)]
    # d has no outgoing edges; z is absent entirely
    assert rows["d"] == [] and rows["z"] == []
    # maxDepth 0: first lookup only
    got0 = compile_pipeline(
        people,
        [{"$graphLookup": {
            "from": "g", "startWith": "$start",
            "connectFromField": "dst", "connectToField": "src",
            "as": "reach", "maxDepth": 0,
        }}],
        collections={"g": edges},
    )
    rows0 = {r.start: sorted((e.src, e.dst) for e in r.reach)
             for r in got0.collect()}
    assert rows0["a"] == [("a", "b")]
    # self-loop terminates (visited-set dedup)
    loop = compile_pipeline(
        spark.createDataFrame([("x",)], "start string"),
        [{"$graphLookup": {
            "from": "g", "startWith": "$start",
            "connectFromField": "dst", "connectToField": "src",
            "as": "reach",
        }}],
        collections={"g": edges},
    ).collect()[0]
    assert [(e.src, e.dst) for e in loop.reach] == [("x", "x")]


def test_lookup_pipeline_form_correlated_join(spark, deliveries):
    """$lookup with let + pipeline ($expr over $$vars): equality
    binding plus a theta residual, with a trailing $project — checked
    against a hand-built join."""
    bowlers = spark.createDataFrame(
        [("TG Southee", 4, "NZ"), ("MA Starc", 5, "AUS")],
        "name string, min_runs int, country string",
    )
    got = compile_pipeline(
        deliveries,
        [
            {"$lookup": {
                "from": "bowlers",
                "let": {"b": "$bowler", "r": "$runs_total"},
                "pipeline": [
                    {"$match": {"$expr": {"$and": [
                        {"$eq": ["$name", "$$b"]},
                        {"$gte": ["$$r", "$min_runs"]},
                    ]}}},
                    {"$project": {"country": 1}},
                ],
                "as": "hit",
            }},
            {"$project": {"bowler": 1, "runs_total": 1,
                          "n": {"$size": "$hit"}}},
        ],
        collections={"bowlers": bowlers},
    )
    rows = sorted((r.bowler, r.runs_total, r.n) for r in got.collect())
    # a delivery 'hits' when runs_total >= the bowler's min_runs
    want = sorted(
        (b, rt, int((b == "TG Southee" and rt >= 4) or (b == "MA Starc" and rt >= 5)))
        for b, rt in [("TG Southee", 4), ("TG Southee", 0), ("MA Starc", 6),
                      ("TG Southee", 1), ("MA Starc", 1), ("TG Southee", 2),
                      ("MA Starc", 0), ("TG Southee", 6)]
    )
    assert rows == want
    # projected element carries only the requested column
    one = compile_pipeline(
        deliveries,
        [{"$lookup": {
            "from": "bowlers",
            "let": {"b": "$bowler"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$name", "$$b"]}}},
                {"$project": {"country": 1}},
            ],
            "as": "hit",
        }}],
        collections={"bowlers": bowlers},
    ).select(F.explode("hit").alias("h")).limit(1).collect()[0]
    assert list(one.h.asDict()) == ["country"]


def test_lookup_pipeline_form_unsupported_shapes_raise(spark, deliveries):
    with pytest.raises(ValueError, match="must start with"):
        compile_pipeline(
            deliveries,
            [{"$lookup": {"from": "x", "let": {}, "pipeline": [{"$limit": 1}], "as": "a"}}],
            collections={"x": deliveries},
        )
    with pytest.raises(ValueError, match="trailing .project"):
        compile_pipeline(
            deliveries,
            [{"$lookup": {"from": "x", "let": {"b": "$bowler"}, "pipeline": [
                {"$match": {"$expr": {"$eq": ["$bowler", "$$b"]}}},
                {"$limit": 1},
            ], "as": "a"}}],
            collections={"x": deliveries},
        )


def test_bucket_auto_equi_height(spark):
    """$bucketAuto: equi-height buckets at exact quantile boundaries,
    labelled {min, max}; counts split evenly on a uniform column."""
    df = spark.range(100).select(F.col("id").cast("int").alias("v"))
    got = compile_pipeline(
        df,
        [{"$bucketAuto": {
            "groupBy": "$v",
            "buckets": 4,
            "output": {"n": {"$sum": 1}, "lo": {"$min": "$v"}},
        }}],
    ).collect()
    assert [r.n for r in got] == [25, 25, 25, 25]
    assert [r.lo for r in got] == [0, 25, 50, 75]
    # boundary struct is contiguous: each bucket's max = next min
    for a, b in zip(got, got[1:]):
        assert a._id.max == b._id.min
    with pytest.raises(ValueError, match="granularity"):
        compile_pipeline(
            df, [{"$bucketAuto": {"groupBy": "$v", "buckets": 2,
                                  "granularity": "R5"}}]
        )


def test_graph_lookup_review_fixes(spark):
    """Round-3 review fixes: restrictSearchWithMatch filters the
    traversal; null startWith matches null connectTo (null-safe);
    no-maxDepth runs to exhaustion and a still-expanding traversal
    raises instead of silently truncating."""
    edges = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 99), ("c", "d", 1)],
        "src string, dst string, w int",
    )
    got = compile_pipeline(
        spark.createDataFrame([("a",)], "start string"),
        [{"$graphLookup": {
            "from": "g", "startWith": "$start",
            "connectFromField": "dst", "connectToField": "src",
            "as": "reach",
            "restrictSearchWithMatch": {"w": {"$lt": 10}},
        }}],
        collections={"g": edges},
    ).collect()[0]
    # (a,c,99) filtered out, so (c,d) is unreachable too
    assert [(e.src, e.dst) for e in got.reach] == [("a", "b")]
    # null-safe seeds
    ne = spark.createDataFrame(
        [(None, "x")], "src string, dst string"
    )
    gotn = compile_pipeline(
        spark.createDataFrame([(None,), ("q",)], "start string"),
        [{"$graphLookup": {
            "from": "g", "startWith": "$start",
            "connectFromField": "dst", "connectToField": "src",
            "as": "reach",
        }}],
        collections={"g": ne},
    )
    rows = {r.start: [(e.src, e.dst) for e in r.reach] for r in gotn.collect()}
    assert rows[None] == [(None, "x")] and rows["q"] == []
    # deep chain, no maxDepth: runs past the old default of 20
    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(30)], "src string, dst string"
    )
    deep = compile_pipeline(
        spark.createDataFrame([("n0",)], "start string"),
        [{"$graphLookup": {
            "from": "g", "startWith": "$start",
            "connectFromField": "dst", "connectToField": "src",
            "as": "reach",
        }}],
        collections={"g": chain},
    ).collect()[0]
    assert len(deep.reach) == 30


def test_lookup_concise_form_equality_plus_pipeline(spark):
    """Mongo 5.0 concise $lookup: localField/foreignField AND a
    pipeline — the implicit equality must apply (review fix: it was
    silently dropped)."""
    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame(
        [(1, 5), (2, 5), (2, -1)], "k2 int, v int"
    )
    got = compile_pipeline(
        left,
        [{"$lookup": {
            "from": "r", "localField": "k", "foreignField": "k2",
            "pipeline": [{"$match": {"$expr": {"$gt": ["$v", 0]}}}],
            "as": "hit",
        }},
         {"$project": {"k": 1, "n": {"$size": "$hit"}}}],
        collections={"r": right},
    )
    assert sorted((r.k, r.n) for r in got.collect()) == [(1, 1), (2, 1)]


def test_densify_fractional_step(spark):
    df = spark.createDataFrame([("a", 0.0), ("a", 5.0)], "k string, t double")
    got = compile_pipeline(
        df,
        [{"$densify": {"field": "t", "partitionByFields": ["k"],
                       "range": {"step": 2.5, "bounds": "partition"}}}],
    )
    assert sorted(r.t for r in got.collect()) == [0.0, 2.5, 5.0]
    # fractional step over an int column refuses rather than truncates
    idf = spark.createDataFrame([("a", 0), ("a", 5)], "k string, t int")
    with pytest.raises(ValueError, match="fractional step"):
        compile_pipeline(
            idf,
            [{"$densify": {"field": "t", "partitionByFields": ["k"],
                           "range": {"step": 2.5, "bounds": "partition"}}}],
        )


def test_bucket_auto_nulls_in_first_bucket(spark):
    df = spark.createDataFrame(
        [(None,), (1,), (2,), (3,), (4,)], "v int"
    )
    got = compile_pipeline(
        df, [{"$bucketAuto": {"groupBy": "$v", "buckets": 2}}]
    ).collect()
    # nulls sort first in BSON order -> first bucket
    assert [r["count"] for r in got] == [3, 2]


def test_project_dotted_paths_preserve_nesting(spark):
    """Dotted $project keeps Mongo's document shape: inclusion
    rebuilds the root struct with only the named subfields; exclusion
    drops the subfield in place."""
    df = spark.createDataFrame(
        [(1, ("Pune", "T20", "IN")), (2, ("Delhi", "ODI", "IN"))],
        "id int, info struct<city:string, match_type:string, country:string>",
    )
    inc = compile_pipeline(
        df, [{"$project": {"id": 1, "info.city": 1, "info.match_type": 1}}]
    )
    assert inc.columns == ["id", "info"]
    r = inc.orderBy("id").collect()[0]
    assert r.info.asDict() == {"city": "Pune", "match_type": "T20"}
    exc = compile_pipeline(df, [{"$project": {"info.country": 0}}])
    assert exc.columns == ["id", "info"]
    assert "country" not in exc.schema["info"].dataType.fieldNames()
    with pytest.raises(ValueError, match="whole and by subfield"):
        compile_pipeline(df, [{"$project": {"info": 1, "info.city": 1}}])


def test_add_fields_dotted_sets_nested_field(spark):
    df = spark.createDataFrame(
        [(1, ("Pune", "T20"))],
        "id int, info struct<city:string, match_type:string>",
    )
    got = compile_pipeline(
        df,
        [{"$addFields": {
            "info.city": {"$toUpper": "$info.city"},
            "info.season": {"$literal": 2024},
        }}],
    ).collect()[0]
    assert got.info.city == "PUNE" and got.info.match_type == "T20"
    assert got.info.season == 2024


def test_set_window_fields_order_sensitive_functions(spark):
    """$first/$last/$push in $setWindowFields: deterministic given
    sortBy (frame order), full-partition default window."""
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 30), ("b", 1, 5)],
        "k string, t int, v int",
    )
    got = compile_pipeline(
        df,
        [{"$setWindowFields": {
            "partitionBy": "$k",
            "sortBy": {"t": 1},
            "output": {
                "fst": {"$first": "$v"},
                "lst": {"$last": "$v"},
                "all": {"$push": "$v"},
                "run": {"$push": "$v",
                        "window": {"documents": ["unbounded", "current"]}},
            },
        }}],
    )
    rows = {(r.k, r.t): (r.fst, r.lst, list(r.all), list(r.run))
            for r in got.collect()}
    assert rows[("a", 2)] == (10, 30, [10, 20, 30], [10, 20])
    assert rows[("b", 1)] == (5, 5, [5], [5])
    with pytest.raises(ValueError, match="requires sortBy"):
        compile_pipeline(
            df,
            [{"$setWindowFields": {
                "partitionBy": "$k",
                "output": {"fst": {"$first": "$v"}},
            }}],
        )


def test_merge_when_matched_merge_mode(spark, tmp_path):
    """whenMatched: 'merge' — field-wise doc merge: incoming non-null
    fields win, existing values survive where the incoming doc lacks
    or nulls them, one-sided columns pass through."""
    target = str(tmp_path / "tgt")
    spark.createDataFrame(
        [(1, "alice", 100), (2, "bob", 200)],
        "_id int, name string, score int",
    ).write.parquet(target)
    incoming = spark.createDataFrame(
        [(1, None, 150, "x"), (3, "carol", 300, "y")],
        "_id int, name string, score int, tag string",
    )
    out = compile_pipeline(
        incoming,
        [{"$merge": {"into": "t", "on": "_id",
                     "whenMatched": "merge", "whenNotMatched": "insert"}}],
        sinks={"t": target},
    )
    rows = {r._id: (r.name, r.score, r.tag) for r in out.collect()}
    assert rows[1] == ("alice", 150, "x")   # null name keeps existing
    assert rows[2] == ("bob", 200, None)    # untouched
    assert rows[3] == ("carol", 300, "y")   # inserted


def test_dotted_path_review_fixes(spark):
    """Third review round: dotted-path edge cases."""
    df = spark.createDataFrame(
        [("k1", 2, ("Pune", "T20")), ("k1", 1, ("Delhi", "ODI"))],
        "k string, v int, info struct<city:string, mt:string>",
    )
    # 1) $setWindowFields $push preserves nulls
    nulls = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, None), ("a", 3, 30)], "k string, t int, v int"
    )
    got = compile_pipeline(
        nulls,
        [{"$setWindowFields": {
            "partitionBy": "$k", "sortBy": {"t": 1},
            "output": {"all": {"$push": "$v"}},
        }}],
    ).collect()[0]
    assert list(got.all) == [10, None, 30]
    # 2) dotted $addFields into a sort key poisons the pending $sort
    with pytest.raises(ValueError, match="rewrites/removes .sort key"):
        compile_pipeline(
            df,
            [{"$sort": {"info": 1}},
             {"$addFields": {"info.city": {"$toUpper": "$info.city"}}},
             {"$group": {"_id": "$k", "f": {"$first": "$v"}}}],
        )
    # 3) prefix/extension path collisions raise
    with pytest.raises(ValueError, match="path collision"):
        compile_pipeline(df, [{"$project": {"info.city": 1, "info.city.x": 1}}])
    with pytest.raises(ValueError, match="path collision"):
        compile_pipeline(df, [{"$project": {"info.city.x": 1, "info.city": 1}}])
    # 4) dotted expression rule nests under the root
    exp = compile_pipeline(
        df, [{"$project": {"info.city": 1, "info.up": {"$toUpper": "$info.mt"}}}]
    )
    assert exp.columns == ["info"]
    r = exp.orderBy("info.city").collect()[0]
    assert r.info.asDict() == {"city": "Delhi", "up": "ODI"}
    # 5) dotted $unset drops the subfield (parity with $project exclusion)
    uns = compile_pipeline(df, [{"$unset": "info.mt"}])
    assert uns.schema["info"].dataType.fieldNames() == ["city"]
    # 6) excluding under an absent root is inert, like Mongo
    assert compile_pipeline(df, [{"$project": {"nope.x": 0}}]).count() == 2
    # 7) dotted $addFields with an absent root creates the document
    created = compile_pipeline(
        df, [{"$addFields": {"meta.flag.deep": {"$literal": 7}}}]
    ).collect()[0]
    assert created.meta.flag.deep == 7


def test_regex_match_expression(spark):
    from cricket_analytics_nosql_spark.plans.mongo_pipeline import (
        compile_pipeline,
    )

    df = spark.createDataFrame(
        [("Alpha",), ("beta",), ("gamma",)], "s string"
    )
    out = compile_pipeline(
        df,
        [
            {
                "$addFields": {
                    "is_a": {
                        "$regexMatch": {
                            "input": "$s",
                            "regex": "^a",
                            "options": "i",
                        }
                    }
                }
            },
            {"$match": {"$expr": {"$regexMatch": {"input": "$s", "regex": "ta$"}}}},
        ],
    )
    rows = {r.s: r.is_a for r in out.collect()}
    assert rows == {"beta": False}

    import pytest

    with pytest.raises(ValueError, match="options"):
        compile_pipeline(
            df,
            [{"$addFields": {"x": {"$regexMatch": {
                "input": "$s", "regex": "a", "options": "ix"}}}}],
        )


def test_vector_search_must_be_first_stage(spark):
    import pytest

    from cricket_analytics_nosql_spark.plans.mongo_pipeline import (
        compile_pipeline,
    )

    df = spark.createDataFrame(
        [(1, [0.1] * 4)], "vec_id long, embedding array<double>"
    )
    spec = {"queryVector": [0.1] * 4, "path": "embedding", "limit": 1}
    with pytest.raises(ValueError, match="first pipeline stage"):
        compile_pipeline(df, [{"$match": {}}, {"$vectorSearch": spec}])
    # and the meta score never leaks into the output columns
    out = compile_pipeline(df, [{"$vectorSearch": spec}])
    assert "__vs_score" not in out.columns


def test_search_must_be_first_stage_and_score_hidden(spark):
    import pytest

    from cricket_analytics_nosql_spark.plans.mongo_pipeline import (
        compile_pipeline,
    )

    df = spark.createDataFrame(
        [(1, "spark join"), (2, "nothing here")], "doc_id long, text string"
    )
    spec = {"text": {"query": "spark", "path": "text"}}
    with pytest.raises(ValueError, match="first pipeline stage"):
        compile_pipeline(df, [{"$match": {}}, {"$search": spec}])
    out = compile_pipeline(df, [{"$search": spec}])
    # only matching docs survive; internal score never leaks
    assert "__search_score" not in out.columns
    assert [r.doc_id for r in out.collect()] == [1]
    # score reachable via $meta for downstream stages
    scored = compile_pipeline(
        df,
        [
            {"$search": spec},
            {"$addFields": {"score": {"$meta": "searchScore"}}},
        ],
    ).collect()
    assert scored and scored[0].score > 0
