"""Custom Python DataSource (collection_dump): partition planning,
filter pushdown as partition PRUNING, and integration with the
engine-side JSON parse path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.sources.pyds import (
    CollectionDumpDataSource,
)


@pytest.fixture()
def dump_dir(tmp_path):
    for i in range(3):
        (tmp_path / f"m{i}.json").write_text(
            f'{{"match_id": "M{i}", "runs": {10 * i}}}', encoding="utf-8"
        )
    (tmp_path / "ignore.txt").write_text("not json", encoding="utf-8")
    return str(tmp_path)


def _read(spark, path):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CollectionDumpDataSource)
    return (
        spark.read.format("collection_dump")
        .schema("path string, doc string")
        .load(path)
    )


def test_reads_one_partition_per_file(spark, dump_dir):
    df = _read(spark, dump_dir)
    rows = {r.path: r.doc for r in df.collect()}
    assert set(rows) == {"m0.json", "m1.json", "m2.json"}  # suffix filter
    # one schedulable split per document file
    n_parts = df.select(F.spark_partition_id()).distinct().count()
    assert n_parts == 3


def test_engine_side_parse_composes(spark, dump_dir):
    df = _read(spark, dump_dir).select(
        "path",
        F.from_json(
            F.col("doc"), "match_id string, runs int"
        ).alias("j"),
    )
    got = {r.j.match_id: r.j.runs for r in df.collect()}
    assert got == {"M0": 0, "M1": 10, "M2": 20}


def test_path_filter_prunes_partitions(spark, tmp_path):
    """A file the filter excludes must never be OPENED: plant a
    file whose read raises (invalid UTF-8) — the pruned query
    succeeds, the unpruned one fails. That is file-skipping
    semantics, not post-scan filtering."""
    (tmp_path / "good.json").write_text('{"k": 1}', encoding="utf-8")
    (tmp_path / "bad.json").write_bytes(b"\xff\xfe\xff not utf8 \xff")

    # separate .load() per query: a reader instance carries one
    # query's pushdown state (documented single-query contract)
    pruned = _read(spark, str(tmp_path)).filter(
        F.col("path") == "good.json"
    )
    assert [r.path for r in pruned.collect()] == ["good.json"]

    with pytest.raises(Exception):
        # unpruned scan must hit the poison file
        _read(spark, str(tmp_path)).collect()


def test_stream_reader_tails_directory(spark, tmp_path):
    """The streaming form: drain existing documents with availableNow
    from a checkpoint, add a document, drain again — the second run
    reads ONLY the new arrival (offset = sorted-listing index)."""
    src = tmp_path / "dumps"
    src.mkdir()
    for i in range(2):
        (src / f"m{i}.json").write_text(f'{{"i": {i}}}', encoding="utf-8")

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CollectionDumpDataSource)

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("collection_dump")
            .schema("path string, doc string")
            .load(str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert {r.path for r in spark.read.parquet(out).collect()} == {
        "m0.json",
        "m1.json",
    }

    (src / "m2.json").write_text('{"i": 2}', encoding="utf-8")
    drain()
    rows = [r.path for r in spark.read.parquet(out).collect()]
    assert sorted(rows) == ["m0.json", "m1.json", "m2.json"]  # no re-reads


def test_fully_pruned_scan_returns_zero_rows(spark, dump_dir):
    """A filter matching no file must yield an empty result, not an
    error — the worker hands read() a None partition for an empty
    partition list."""
    df = _read(spark, dump_dir).filter(F.col("path") == "missing.json")
    assert df.count() == 0
