"""Cricsheet JSON source — SURVEY.md §2.1 S1/S2.

The reference lists a directory, json.load()s each file sequentially
and skips bad files with try/except (etl_cricsheet_to_mongo.py:128-147).
Spark-native: one multiLine JSON scan with an EXPLICIT schema (schema
inference would be a second full pass over 100 TB), PERMISSIVE mode
with a _corrupt_record column replacing the per-file try/except, and
input_file_name() for provenance. Parallelism is per-file/per-split
instead of the reference's single-threaded loop.

Schema-drift tolerance (v1.0.0 vs v1.1.0, SURVEY §2.3/FIXTURES §B.1)
is encoded as union-of-variants fields: both `batter` and `striker`,
both `wickets` (array) and `wicket` (single struct) are declared, and
the ETL layer coalesces (operators/etl.py). A variant the schema
cannot hold (e.g. scalar `runs`) lands in the quarantine frame rather
than silently corrupting rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WICKET = T.StructType(
    [
        T.StructField("player_out", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
)

DELIVERY_SCHEMA = T.StructType(
    [
        T.StructField("batter", T.StringType()),
        T.StructField("striker", T.StringType()),  # v1.0.0 name (etl:80)
        T.StructField("non_striker", T.StringType()),
        T.StructField("nonStriker", T.StringType()),  # drift twin (etl:81)
        T.StructField("bowler", T.StringType()),
        T.StructField("ball", T.LongType()),  # often absent (neo4j_loader:113-115)
        T.StructField(
            "runs",
            T.StructType(
                [
                    T.StructField("batter", T.LongType()),
                    T.StructField("extras", T.LongType()),
                    T.StructField("total", T.LongType()),
                ]
            ),
        ),
        T.StructField("wickets", T.ArrayType(_WICKET)),  # list form
        T.StructField("wicket", _WICKET),  # dict form (etl:87-89)
    ]
)

CRICSHEET_SCHEMA = T.StructType(
    [
        T.StructField(
            "meta",
            T.StructType([T.StructField("data_version", T.StringType())]),
        ),
        T.StructField(
            "info",
            T.StructType(
                [
                    T.StructField("match_id", T.StringType()),
                    T.StructField(
                        "registry",
                        T.StructType([T.StructField("match", T.StringType())]),
                    ),
                    T.StructField("dates", T.ArrayType(T.StringType())),
                    T.StructField("team_type", T.StringType()),
                    T.StructField("match_type", T.StringType()),
                    T.StructField("gender", T.StringType()),
                    T.StructField("teams", T.ArrayType(T.StringType())),
                    T.StructField("venue", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField(
                        "officials",
                        T.MapType(T.StringType(), T.ArrayType(T.StringType())),
                    ),
                    T.StructField(
                        "event",
                        T.StructType(
                            [T.StructField("match_number", T.LongType())]
                        ),
                    ),
                    T.StructField(
                        "outcome",
                        T.StructType(
                            [
                                T.StructField("winner", T.StringType()),
                                T.StructField("result", T.StringType()),
                                T.StructField(
                                    "by",
                                    T.StructType(
                                        [
                                            T.StructField("runs", T.LongType()),
                                            T.StructField(
                                                "wickets", T.LongType()
                                            ),
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "innings",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("team", T.StringType()),
                        T.StructField("innings", T.LongType()),
                        T.StructField("number", T.LongType()),  # drift (etl:74)
                        T.StructField(
                            "overs",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("over", T.LongType()),
                                        T.StructField(
                                            "deliveries",
                                            T.ArrayType(DELIVERY_SCHEMA),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_cricsheet(spark: SparkSession, data_dir: str) -> DataFrame:
    """One-file-per-row scan of a Cricsheet dump with provenance."""
    return (
        spark.read.schema(CRICSHEET_SCHEMA)
        .option("multiLine", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(data_dir)
        .withColumn("source_file", F.input_file_name())
    )


def split_quarantine(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S2: good rows vs quarantined rows — the Spark form of the
    reference's print-and-continue error policy (etl:132,146-147),
    except nothing is silently dropped: bad inputs are a DataFrame
    you can count, inspect, and persist.

    Spark refuses to filter a raw JSON scan by only the corrupt-record
    column (SPARK-21610: the pushed-down scan would drop the other
    columns and nothing would ever parse as corrupt), so the parse
    result must be materialized once before splitting. ``cache()``
    here; at 100 TB the same one-pass shape is write-parsed-to-parquet
    then derive both sides from that single materialization."""
    raw = raw.cache()
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        "source_file", "_corrupt_record"
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return good, bad
