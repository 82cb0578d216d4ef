"""Round-12 plan dump helper.

Writes ``plans/r12/<name>_{before,after}.txt`` — the
``explain("formatted")`` output of each touched query's final frame
(bench conditions: AQE off), plus phase-level dumps for pipelines
whose final frame hides the interesting job behind a checkpoint.

Usage:
    PYTHONPATH=<tree> python -m tools.dump_plans_r12 <suffix> <name...>

``<tree>`` selects the code version (the repo root for "after", the
round-start worktree for "before"); dumps always land in the REPO's
plans/r12/.
"""

from __future__ import annotations

import os
import sys

OUT_DIR = "/root/repo/plans/r12"


def explain_str(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cricket_analytics_nosql_spark.catalog import all_queries
    from cricket_analytics_nosql_spark.session import get_spark

    spark = get_spark("plans-r12")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        if name == "frequent_triples_gated":
            # the at-scale branch: basket materialization gate forced
            # on (sizeInBytes threshold -> 0), as it would fire on a
            # production-sized lineitem scan
            from cricket_analytics_nosql_spark.operators import sequences

            prev = sequences._BASKET_CKPT_MIN_INPUT_BYTES
            sequences._BASKET_CKPT_MIN_INPUT_BYTES = 0
            try:
                df = sequences.frequent_triples(spark, sf_dir)
            finally:
                sequences._BASKET_CKPT_MIN_INPUT_BYTES = prev
        elif name == "pagerank_biggraph_round":
            # the co-partitioned (n > broadcast_max_vertices) loop
            # round, gate forced by building the branch directly —
            # proves the per-round exchanges are vertex-sized only
            from pyspark.sql import functions as FF

            from cricket_analytics_nosql_spark.operators.graph import (
                trade_graph_edges,
            )

            spark.conf.set("spark.sql.shuffle.partitions", "8")
            edges = trade_graph_edges(spark, sf_dir).localCheckpoint()
            out_mass = edges.groupBy("src").agg(
                FF.count(FF.lit(1)).cast("double").alias("w_out")
            )
            links = (
                edges.join(out_mass, "src")
                .select(
                    FF.col("src").alias("id"),
                    "dst",
                    (FF.lit(1.0) / FF.col("w_out")).alias("p"),
                )
                .repartition(8, FF.col("id"))
                .localCheckpoint()
            )
            w = (
                links.select("dst", FF.col("p").alias("c"))
                .groupBy("dst")
                .agg(FF.sum("c").alias("x"))
                .localCheckpoint()
            )
            df = (
                links.join(w.withColumnRenamed("dst", "id"), "id")
                .select("dst", (FF.col("x") * FF.col("p")).alias("c"))
                .groupBy("dst")
                .agg(FF.sum("c").alias("x"))
            )
        elif name == "cc_keyed_round":
            # the keyed-sym (m >= _CC_KEYED_SYM_MIN_EDGES) CC loop
            # round — proves the per-round exchanges are label-sized
            from pyspark.sql import functions as FF

            from cricket_analytics_nosql_spark.operators.dedup import (
                jaccard_pairs,
                JACCARD_TAU,
            )
            from cricket_analytics_nosql_spark.sources.tables import (
                load_table as _lt,
            )

            spark.conf.set("spark.sql.shuffle.partitions", "8")
            docs = _lt(spark, sf_dir, "documents")
            pairs = jaccard_pairs(docs, JACCARD_TAU).select("d1", "d2")
            sym = (
                pairs.select(
                    FF.explode(
                        FF.array(
                            FF.struct(
                                FF.col("d1").alias("a"),
                                FF.col("d2").alias("b"),
                            ),
                            FF.struct(
                                FF.col("d2").alias("a"),
                                FF.col("d1").alias("b"),
                            ),
                        )
                    ).alias("e")
                )
                .select("e.a", "e.b")
                .repartition(8, FF.col("b"))
                .localCheckpoint()
            )
            labels = (
                sym.groupBy("a")
                .agg(FF.least(FF.col("a"), FF.min("b")).alias("label"))
                .localCheckpoint()
            )
            df = (
                sym.join(
                    labels.select(
                        FF.col("a").alias("b"), FF.col("label").alias("nl")
                    ),
                    "b",
                )
                .groupBy("a")
                .agg(FF.min("nl").alias("minn"))
            )
        elif name == "exact_cosine_pairs_job":
            # the pairs-pipeline final job (re-verify over the GEMM
            # candidates) — semantic_dedup's final frame hides it
            # behind the CC checkpoint
            from cricket_analytics_nosql_spark.operators.similarity import (
                COS_TAU,
                _doubles,
                exact_cosine_pairs,
            )
            from cricket_analytics_nosql_spark.sources.tables import (
                load_table,
            )

            emb = _doubles(load_table(spark, sf_dir, "embeddings"))
            df = exact_cosine_pairs(emb, tau=COS_TAU)
        else:
            df = registry[name].fn(spark, sf_dir)
        out = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(out, "w") as fh:
            fh.write(explain_str(df))
        print("wrote", out)


if __name__ == "__main__":
    main()
