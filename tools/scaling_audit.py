"""Multi-scale scaling audit (VERDICT r7 item 6; three-point form
per VERDICT r8 item 7).

Times the frozen 17-query headline set plus the extended bench tier
at each scale in SCALING_SF_DIRS (default sf0.001, sf0.01, sf0.1) in
the SAME session (same JVM, same configs as bench.py: AQE off,
codegen warmed), then prints a per-query table with the empirical
scaling exponent between each adjacent pair of scales

    alpha = log(t_hi / t_lo) / log(sf_hi / sf_lo)

with the data-volume ratio DERIVED from the sf values parsed out of
the dir names (ADVICE r8: a hardcoded 10.0 silently mis-scaled any
env override). alpha = 1 is linear in data volume; alpha < 1 means
fixed overhead (scheduling, codegen, driver round-trips) still
dominates at these sizes; alpha > 1 is the flag — a candidate
super-linear plan that would not survive a 100x scale-up and needs a
diagnosis in PERF.md.

Why three points (VERDICT r8 item 7): a single flat exponent between
two scales cannot distinguish "flat because fixed overhead dominates
everywhere" from "flat because the data term has not kicked in yet".
With three points, a query whose low-pair alpha is ~0 but whose
high-pair alpha turns upward is in the second regime and the
high-pair exponent is the one to extrapolate; a query flat across
BOTH pairs is measured fixed-overhead through two decades.

    python -m tools.scaling_audit            # ~8-12 min

The 100 TB argument rests on plan shape first; this adds a second,
measured leg: the exponents between real scales.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from cricket_analytics_nosql_spark.catalog import all_queries  # noqa: E402
from cricket_analytics_nosql_spark.session import get_spark  # noqa: E402

SF_DIRS = os.environ.get(
    "SCALING_SF_DIRS",
    "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1",
).split(",")


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    if not m:
        raise ValueError(f"cannot parse sf value from {sf_dir!r}")
    return float(m.group(1).rstrip("."))


def main() -> None:
    from bench import BENCH_EXTENDED

    sfs = [_sf_of(d) for d in SF_DIRS]
    if sorted(sfs) != sfs or len(sfs) < 2:
        raise ValueError(f"SCALING_SF_DIRS must be ≥2 dirs, ascending: {sfs}")

    spark = get_spark("scaling-audit")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    catalog = all_queries()
    names = sorted(n for n, s in catalog.items() if s.bench)
    names += [n for n in BENCH_EXTENDED if n in catalog]

    def best_of(fn, sf_dir: str, runs: int = 3) -> float:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        return min(samples)

    # all scales per query back-to-back so host-load bursts hit
    # every arm of a query's exponent, not one
    rows = []
    for name in names:
        fn = catalog[name].fn
        times = [best_of(fn, d) for d in SF_DIRS]
        alphas = [
            math.log(times[i + 1] / times[i])
            / math.log(sfs[i + 1] / sfs[i])
            for i in range(len(times) - 1)
        ]
        rows.append((name, times, alphas))
        pairs = " ".join(
            f"sf{sfs[i]}={times[i]:7.3f}s" for i in range(len(times))
        )
        astr = " ".join(f"{a:+.2f}" for a in alphas)
        print(f"{name:28s} {pairs} alpha=[{astr}]", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "scaling_exponents",
                "sfs": sfs,
                "load_avg": [round(x, 2) for x in os.getloadavg()],
                "queries": {
                    n: {
                        "sec": [round(t, 4) for t in ts],
                        "alpha": [round(a, 3) for a in als],
                    }
                    for n, ts, als in rows
                },
            }
        )
    )


if __name__ == "__main__":
    main()
