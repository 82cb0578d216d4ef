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
