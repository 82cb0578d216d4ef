"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through the full plan with a noop sink (no
driver collect — measures engine time, not result transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cricket_analytics_nosql_spark.catalog import all_queries  # noqa: E402
from cricket_analytics_nosql_spark.session import get_spark  # noqa: E402

# Second bench tier (VERDICT r6 item 6): round-over-round timing for
# the heaviest round-6 operators WITHOUT touching the frozen headline
# set (the 17 `bench=True` queries stay r1-comparable). Reported
# under the "extended" key; excluded from the headline total.
BENCH_EXTENDED = (
    "dedup_substring_spans",
    "adamic_adar_linkpred",
    "pca_top_component",
    # round-7 sixth-wave heavy hitters
    "kfold_nb_cv",
    "frequent_triples",
    # round-8 additions (VERDICT r7 item 4): the three ops that got
    # round-7 speedups (35.8→7.6, 18.3→7.1, 29.5→19.1 s at sf0.1)
    # but had no regression guard afterwards
    "semantic_dedup",
    "ann_pq",
    "ann_ivf_kmeans",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    # Bounded quiet-wait: the bench host carries bursty EXTERNAL load
    # (observed 1-min load-avg spikes 0.2 -> 15 inside a session,
    # uniformly inflating untouched queries 2-3x). Wait out a burst
    # before timing — bounded at 2 min so a persistently busy host
    # still benches — and stamp how long we waited.
    quiet_wait = 0.0
    while os.getloadavg()[0] > 8.0 and quiet_wait < 120.0:
        time.sleep(15)
        quiet_wait += 15.0

    load_start = os.getloadavg()
    spark = get_spark("bench")
    # Local-mode bench config: AQE's per-exchange re-planning
    # round-trips cost 20-40% at sf0.1 on local[32] (measured
    # 15.6s → 12.7s across this set) while buying nothing — the
    # headline plans have known shapes and exchange only MBs at
    # this scale, so static partition sizing wins. On a real
    # cluster AQE stays on (the get_spark default): runtime
    # coalescing and skew-splitting pay for themselves once
    # exchanges move GBs.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    catalog = {n: s for n, s in all_queries().items() if s.bench}

    # JVM/codegen warmup outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def time_query(fn, runs: int) -> tuple[float, float]:
        # best of N: the first run pays codegen/JIT for this plan
        # shape; the repeats measure the engine, not the compiler.
        # 5 rather than 3 for the headline tier: the host carries
        # bursty external load (load-avg spikes 2 -> 11 inside a
        # single bench run were observed inflating individual
        # queries 3-5x) — more samples per query raise the odds that
        # at least one lands in a calm window, at ~40s extra wall
        # for the whole set. The median is reported alongside so a
        # reader can see the per-query noise spread without PERF.md.
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return samples[0], samples[len(samples) // 2]

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in sorted(catalog):
        best, med = time_query(catalog[name].fn, 5)
        timings[name] = round(best, 4)
        medians[name] = round(med, 4)

    full = all_queries()
    extended: dict[str, float] = {}
    for name in BENCH_EXTENDED:
        if name in full:
            best, _ = time_query(full[name].fn, 3)
            extended[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "query_medians": medians,
                # extended tier: heavy round-6 operators, best-of-3,
                # NOT in the headline total (keeps the r1 series)
                "extended": extended,
                "sf": sf,
                # host-noise context: the bench host carries bursty
                # external load (observed load-avg 2-14); readers
                # should weigh run-to-run deltas against this stamp
                "load_avg_1m_5m_15m": [round(x, 2) for x in load_start],
                "load_avg_end": [round(x, 2) for x in os.getloadavg()],
                "quiet_wait_sec": quiet_wait,
            }
        )
    )


if __name__ == "__main__":
    main()
