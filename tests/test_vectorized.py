"""§2.12 Python-surface tests: every Python kernel must agree
exactly with its native-expression twin, and the multimodal
resize/frame-sample stubs must round-trip the mapInPandas plumbing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").limit(50).cache()


def test_pandas_udf_l2_norm_matches_native(spark, sf_small):
    from cricket_analytics_nosql_spark.functions.vectorized import vec_l2_norm

    emb = (
        load_table(spark, sf_small, "embeddings")
        .limit(100)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    native = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    rows = emb.select(
        vec_l2_norm("v").alias("py"), native.alias("jvm")
    ).collect()
    for r in rows:
        assert r.py == pytest.approx(r.jvm, rel=1e-12)


def test_pandas_udf_token_count_matches_native(docs):
    from cricket_analytics_nosql_spark.functions.vectorized import (
        token_count_vectorized,
    )

    rows = docs.select(
        token_count_vectorized("text").alias("py"),
        F.size(F.split(F.col("text"), " ")).alias("jvm"),
    ).collect()
    assert all(r.py == r.jvm for r in rows)


def test_udtf_tokenize_matches_posexplode(spark):
    from cricket_analytics_nosql_spark.functions.vectorized import TokenizeUDTF

    spark.udtf.register("tokenize", TokenizeUDTF)
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "x"), (3, None)], "id long, text string"
    )
    df.createOrReplaceTempView("t_udtf_in")
    via_udtf = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT id, pos, token FROM t_udtf_in, "
            "LATERAL tokenize(text)"
        ).collect()
    )
    via_native = sorted(
        tuple(r)
        for r in df.select(
            "id", F.posexplode(F.split(F.col("text"), " "))
        ).collect()
    )
    assert via_udtf == via_native


def test_multimodal_resize_stub(docs):
    from cricket_analytics_nosql_spark.operators.multimodal import (
        attach_binary,
        resize_images,
    )

    mm = attach_binary(docs)
    out = resize_images(mm).collect()
    assert len(out) == docs.count()
    for r in out:
        assert r.width * r.height <= r.width * r.height + r.width  # consistent split
        assert 0 < len(r.thumb) <= 64 * 64


def test_multimodal_frame_sample_stub(docs):
    from cricket_analytics_nosql_spark.operators.multimodal import (
        attach_binary,
        sample_frames,
    )

    mm = attach_binary(docs)
    frames = sample_frames(mm, every=100, limit=3)
    rows = frames.collect()
    assert rows, "frame sampling must emit rows"
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in per_doc.items():
        assert [r.frame_no for r in sorted(rs, key=lambda r: r.frame_no)] == list(
            range(len(rs))
        )
        assert len(rs) <= 3
        assert all(len(r.frame) <= 100 for r in rs)
