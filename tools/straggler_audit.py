"""Straggler audit: MEASURED task-time balance per headline query.

The 100 TB failure mode the shuffle inventory can't see is the
straggler — one task in a stage carrying a skewed partition (or a
slow node) while its siblings idle. This tool runs each bench query
once (noop sink), pulls per-stage task-duration QUANTILES from the
UI's REST ``taskSummary`` endpoint, and reports the worst stage per
query by max/median task-time ratio, plus that stage's task count —
the number the skew-mitigation story (AQE skew split, salting,
fan_out) should keep near 1 on balanced data.

Reading it: ratios ≲ 3 on local[32] are scheduler noise on
millisecond tasks (the first task of a stage pays codegen/JIT);
sustained ratios ≫ 5 on stages with many tasks mark a real key-skew
or partition-sizing problem worth a plan change.

Usage: python -m tools.straggler_audit [query ...]   (default: bench set)
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
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import SparkSession

    from cricket_analytics_nosql_spark.catalog import all_queries
    from cricket_analytics_nosql_spark.session import get_spark

    SparkSession.builder.config("spark.ui.enabled", "true").config(
        "spark.ui.port", "4049"
    ).getOrCreate()
    spark = get_spark("straggler-audit")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    qs = all_queries()
    names = sys.argv[1:] or sorted(n for n, s in qs.items() if s.bench)

    base = "http://localhost:4049/api/v1"
    app_id = _get(base, "/applications")[0]["id"]

    print(
        f"{'query':28s} {'worst stage':>11s} {'tasks':>6s} "
        f"{'med_ms':>7s} {'max_ms':>7s} {'max/med':>8s}"
    )
    for name in names:
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        qs[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
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
        worst = None  # (ratio, stage_id, tasks, med, mx)
        for sid in stage_ids:
            for att in _get(base, f"/applications/{app_id}/stages/{sid}"):
                if att["status"] == "SKIPPED":
                    continue
                n_tasks = att.get("numCompleteTasks", 0)
                if n_tasks < 2:
                    continue  # a 1-task stage cannot straggle
                try:
                    summ = _get(
                        base,
                        f"/applications/{app_id}/stages/{sid}"
                        f"/{att['attemptId']}/taskSummary"
                        "?quantiles=0.5,1.0",
                    )
                except Exception:
                    continue
                med, mx = summ["duration"]
                if med <= 0:
                    continue
                ratio = mx / med
                if worst is None or ratio > worst[0]:
                    worst = (ratio, sid, n_tasks, med, mx)
        if worst is None:
            print(f"{name:28s} {'—':>11s}")
            continue
        ratio, sid, n_tasks, med, mx = worst
        print(
            f"{name:28s} {sid:11d} {n_tasks:6d} "
            f"{med:7.0f} {mx:7.0f} {ratio:8.1f}"
        )


if __name__ == "__main__":
    main()
