"""Z-order layout: the Morton key interleaves correctly and
``zorder_write`` actually clusters BOTH dimensions into files —
the property parquet min/max skipping depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.layout import (
    MORTON_BITS,
    morton_key,
    zorder_write,
)
from cricket_analytics_nosql_spark.sources.tables import load_table


def _py_morton(x: int, y: int, bits: int = MORTON_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 7, 1023)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", morton_key(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r.z == _py_morton(r.x, r.y), (r.x, r.y)


def test_zorder_write_clusters_both_dimensions(spark, sf_small, tmp_path):
    """After a z-ordered write, the average file's bounding box on
    EACH dimension is a small fraction of the global range — whereas
    a single-column sort would leave the other dimension's per-file
    span at ~100%. 16 files ⇒ Morton ranges ~1/16 of the curve ⇒
    each dimension's span should shrink to roughly sqrt(1/16) = 25%;
    assert a loose 60% to stay noise-proof."""
    ev = load_table(spark, sf_small, "events").select(
        "event_id", "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
        .alias("hr"),
    )
    out = str(tmp_path / "zorder")
    zorder_write(ev, F.col("user_id"), F.col("hr"), out, num_files=16)
    back = spark.read.parquet(out).withColumn(
        "file", F.input_file_name()
    )
    spans = (
        back.groupBy("file")
        .agg(
            (F.max("user_id") - F.min("user_id")).alias("du"),
            (F.max("hr") - F.min("hr")).alias("dh"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    glob = back.agg(
        (F.max("user_id") - F.min("user_id")).alias("du"),
        (F.max("hr") - F.min("hr")).alias("dh"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert len(spans) > 4
    assert sum(r.n for r in spans) == glob.n  # lossless rewrite
    mean_u = sum(r.du for r in spans) / len(spans)
    mean_h = sum(r.dh for r in spans) / len(spans)
    assert mean_u < 0.6 * glob.du, (mean_u, glob.du)
    assert mean_h < 0.6 * glob.dh, (mean_h, glob.dh)


def test_zorder_write_empty_input(spark, tmp_path):
    """Empty frames (routine in incremental pipelines) must write an
    empty dataset, not die in the bounds arithmetic."""
    from pyspark.sql import types as T

    empty = spark.createDataFrame(
        [], T.StructType([
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
        ])
    )
    out = str(tmp_path / "empty")
    zorder_write(empty, F.col("a"), F.col("b"), out, num_files=4)
    assert spark.read.parquet(out).count() == 0


def test_zorder_write_wide_span_no_overflow(spark, tmp_path):
    """Epoch-micros-scale spans used to overflow the long rescale
    multiply; the double path must key them correctly."""
    rows = [(i, i * 40_000_000_000_000) for i in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = str(tmp_path / "wide")
    zorder_write(df, F.col("a"), F.col("b"), out, num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 64
    assert back.agg(F.sum("a")).collect()[0][0] == sum(range(64))
