"""Small-file compaction and schema-evolution reads: the dataset
must survive both operations byte-for-byte (compaction) and
old-batch-compatibly (evolution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.sinks import (
    compact_small_files,
    read_evolving,
)
from cricket_analytics_nosql_spark.sources.tables import load_table


def test_compaction_shrinks_files_losslessly(spark, sf_small, tmp_path):
    out = str(tmp_path / "fragmented")
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    li.repartition(64).write.parquet(out)
    before_sum = spark.read.parquet(out).agg(
        F.sum("l_orderkey"), F.count(F.lit(1))
    ).collect()[0]

    n_before = compact_small_files(spark, out, target_files=4)
    assert n_before == 64

    back = spark.read.parquet(out)
    assert len(back.inputFiles()) <= 4
    assert back.agg(
        F.sum("l_orderkey"), F.count(F.lit(1))
    ).collect()[0] == before_sum
    assert not (tmp_path / "fragmented.__compact_tmp").exists()
    assert not (tmp_path / "fragmented.__compact_old").exists()


def test_schema_evolution_read_merges_batches(spark, tmp_path):
    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.mode("append").parquet(out)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(out)

    df = read_evolving(spark, out)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None  # old batch: NULL-filled new column
    assert rows[2].score == 9.5


def test_stream_ingest_then_compaction(spark, sf_small, tmp_path):
    """The operational loop at 100 TB: micro-batch appends fragment
    the dataset (one small file per batch per task); periodic
    compaction restores scan-sized files without changing a row.
    Drive a real availableNow stream into a parquet sink, then
    compact, then prove the rollup over the compacted copy equals
    the batch rollup over the source."""
    import os

    from pyspark.sql import functions as F

    from cricket_analytics_nosql_spark.streaming.events import (
        read_events_stream,
        stage_event_files,
    )

    staged = stage_event_files(spark, sf_small, n_chunks=4)
    out = str(tmp_path / "ingested")
    q = (
        read_events_stream(spark, staged)
        .writeStream.format("parquet")
        .option("path", out)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    n_before = compact_small_files(spark, out, target_files=2)
    assert n_before >= 4  # at least one file per micro-batch

    back = spark.read.parquet(out)
    assert len(back.inputFiles()) <= 2
    src = spark.read.parquet(os.path.join(staged))
    assert back.count() == src.count()
    got = back.agg(F.sum("event_id")).collect()[0][0]
    want = src.agg(F.sum("event_id")).collect()[0][0]
    assert got == want


def test_partition_overwrite_touches_only_written_partitions(
    spark, sf_small, tmp_path
):
    """Dynamic partition overwrite must replace exactly the incoming
    partitions: a corrected 'R' backfill changes R, leaves A/N
    byte-identical, and never doubles rows."""
    from cricket_analytics_nosql_spark.operators.sinks import (
        write_partition_overwrite,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "by_flag")
    li.write.partitionBy("l_returnflag").parquet(out)
    before = {
        r.l_returnflag: (r.n, r.q)
        for r in spark.read.parquet(out)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"),
        )
        .collect()
    }

    fixed_r = li.filter(F.col("l_returnflag") == "R").withColumn(
        "l_quantity", F.col("l_quantity") + 1
    )
    write_partition_overwrite(fixed_r, out, "l_returnflag")

    after = {
        r.l_returnflag: (r.n, r.q)
        for r in spark.read.parquet(out)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"),
        )
        .collect()
    }
    assert set(after) == set(before)
    for flag in before:
        assert after[flag][0] == before[flag][0]  # no row doubling
        if flag == "R":
            assert after[flag][1] == before[flag][1] + 100 * before[flag][0]
        else:
            assert after[flag][1] == before[flag][1]


def test_read_new_partitions_incremental(spark, sf_small, tmp_path):
    """The manifest-driven incremental reader must see each
    partition exactly once across successive calls, and its scan
    must partition-prune."""
    from cricket_analytics_nosql_spark.operators.sinks import (
        read_new_partitions,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    out = str(tmp_path / "inc")
    li.filter(F.col("l_returnflag").isin("A", "N")).write.partitionBy(
        "l_returnflag"
    ).parquet(out)

    df1, seen1 = read_new_partitions(spark, out, "l_returnflag", set())
    assert seen1 == {"A", "N"}
    n1 = df1.count()

    # nothing new → empty frame, no reprocessing
    df2, seen2 = read_new_partitions(spark, out, "l_returnflag", seen1)
    assert seen2 == set() and df2.count() == 0

    # late partition arrives → only it is read
    li.filter(F.col("l_returnflag") == "R").write.mode(
        "append"
    ).partitionBy("l_returnflag").parquet(out)
    df3, seen3 = read_new_partitions(spark, out, "l_returnflag", seen1)
    assert seen3 == {"R"}
    assert df3.select("l_returnflag").distinct().collect()[0][0] == "R"
    assert n1 + df3.count() == li.count()


def test_read_new_partitions_unescapes_hive_names(spark, tmp_path):
    """Partition values with characters Hive URL-escapes in directory
    names (':' → '%3A') must round-trip: the manifest and the filter
    speak column values, so the escaped partition is read once, not
    silently lost."""
    from cricket_analytics_nosql_spark.operators.sinks import (
        read_new_partitions,
    )

    out = str(tmp_path / "esc")
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "plain")], "id long, stamp string"
    ).write.partitionBy("stamp").parquet(out)

    df, seen = read_new_partitions(spark, out, "stamp", set())
    assert seen == {"2024-01-01 10:00:00", "plain"}
    assert df.count() == 2

    df2, seen2 = read_new_partitions(spark, out, "stamp", seen)
    assert seen2 == set() and df2.count() == 0


def test_ignore_corrupt_files_read(spark, sf_small, tmp_path):
    """The 100 TB salvage path: with a corrupted file in the
    dataset, the default read fails the whole job; with
    spark.sql.files.ignoreCorruptFiles the scan yields every intact
    row and skips the bad file — bounded data loss instead of a dead
    pipeline, the trade an operator makes explicitly."""
    import pytest

    from cricket_analytics_nosql_spark.sources.tables import load_table

    out = str(tmp_path / "maybe_corrupt")
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    li.repartition(4).write.parquet(out)

    import os

    parts = sorted(
        f for f in os.listdir(out) if f.endswith(".parquet")
    )
    victim = os.path.join(out, parts[0])
    with open(victim, "r+b") as f:
        f.truncate(128)  # destroy footer

    schema = "l_orderkey bigint, l_quantity double"
    with pytest.raises(Exception):
        spark.read.schema(schema).parquet(out).count()

    # explicit schema is load-bearing: inference reads every footer
    # at PLANNING time and dies on the corrupt one before the
    # ignore conf can help — one more reason the engine's loaders
    # never infer
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        survivors = spark.read.schema(schema).parquet(out).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    assert 0 < survivors < li.count()
