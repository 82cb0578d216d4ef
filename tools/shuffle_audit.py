"""Shuffle audit: MEASURED bytes per headline query, not claims.

Runs each bench-flagged catalog query once (noop sink) with the Spark
UI's REST API enabled, attributes its jobs via a per-query job group,
and reports input / shuffle-write / shuffle-read bytes and task
counts summed over exactly that query's stages. PERF.md's plan-shape
arguments quote these numbers.

Caveat on input_MB: stage-level ``inputBytes`` counts RDD-reported
reads (localCheckpoint / cache replays — e.g. PageRank's per-
iteration link-table reads) but the vectorized parquet scan reports
its bytes through SQL metrics the stage API doesn't carry, so pure
parquet-scan queries show ~0 here. Shuffle write/read bytes — the
numbers the 100 TB arguments rest on — are exact.

Usage: python -m tools.shuffle_audit [query ...]   (default: bench set)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request


def _get(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}") as r:
        return json.loads(r.read())


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from cricket_analytics_nosql_spark.catalog import all_queries
    from cricket_analytics_nosql_spark.session import get_spark

    # the audit needs the UI's REST API; get_spark disables it, so
    # build the session first with UI on (all other engine defaults
    # still come from get_spark's builder path). driver.memory must
    # ride THIS builder too: it only applies at JVM launch, and this
    # getOrCreate is the launch — without it the audit JVM runs the
    # 1g default and heavier queries OOM at sf0.1.
    SparkSession.builder.config("spark.ui.enabled", "true").config(
        "spark.ui.port", "4049"
    ).config(
        "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g")
    ).getOrCreate()
    spark = get_spark("shuffle-audit")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    qs = all_queries()
    names = sys.argv[1:] or sorted(n for n, s in qs.items() if s.bench)

    base = "http://localhost:4049/api/v1"
    app_id = _get(base, "/applications")[0]["id"]

    print(
        f"{'query':28s} {'input_MB':>9s} {'shuf_write_MB':>14s} "
        f"{'shuf_read_MB':>13s} {'tasks':>6s} {'stages':>6s}"
    )
    for name in names:
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        qs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        sc.setJobGroup("", "")
        jobs = _get(base, f"/applications/{app_id}/jobs")
        stage_ids = sorted(
            {
                sid
                for j in jobs
                if j.get("jobGroup") == name
                for sid in j["stageIds"]
            }
        )
        inp = wr = rd = tasks = nstages = 0
        for sid in stage_ids:
            for att in _get(base, f"/applications/{app_id}/stages/{sid}"):
                if att["status"] == "SKIPPED":
                    continue
                inp += att.get("inputBytes", 0)
                wr += att.get("shuffleWriteBytes", 0)
                rd += att.get("shuffleReadBytes", 0)
                tasks += att.get("numCompleteTasks", 0)
                nstages += 1
        mb = 1024 * 1024
        print(
            f"{name:28s} {inp / mb:9.1f} {wr / mb:14.2f} "
            f"{rd / mb:13.2f} {tasks:6d} {nstages:6d}"
        )


if __name__ == "__main__":
    main()
