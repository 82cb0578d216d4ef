"""Two-scale scaling audit (VERDICT r7 item 6).

Times the frozen 17-query headline set plus the extended bench tier
at sf0.01 AND sf0.1 in the SAME session (same JVM, same configs as
bench.py: AQE off, codegen warmed), then prints a per-query table
with the empirical scaling exponent

    alpha = log(t_sf0.1 / t_sf0.01) / log(10)

alpha = 1 is linear in data volume; alpha < 1 means fixed overhead
(scheduling, codegen, driver round-trips) still dominates at these
sizes; alpha > 1 is the flag — a candidate super-linear plan that
would not survive a 100x scale-up and needs a diagnosis in PERF.md.

    python -m tools.scaling_audit            # ~6-8 min

The 100 TB argument rests on plan shape first; this adds a second,
measured leg: the exponent between two real scales.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from cricket_analytics_nosql_spark.catalog import all_queries  # noqa: E402
from cricket_analytics_nosql_spark.session import get_spark  # noqa: E402

SF_LO = os.environ.get("SCALING_SF_LO", "/root/testdata/sf0.01")
SF_HI = os.environ.get("SCALING_SF_HI", "/root/testdata/sf0.1")
RATIO = 10.0  # data-volume ratio between the two dirs


def main() -> None:
    from bench import BENCH_EXTENDED

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

    # interleave scales per query so host-load bursts hit both arms
    rows = []
    for name in names:
        fn = catalog[name].fn
        t_lo = best_of(fn, SF_LO)
        t_hi = best_of(fn, SF_HI)
        alpha = math.log(t_hi / t_lo) / math.log(RATIO)
        rows.append((name, t_lo, t_hi, alpha))
        print(
            f"{name:28s} sf0.01={t_lo:7.3f}s sf0.1={t_hi:7.3f}s "
            f"alpha={alpha:+.2f}",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "scaling_exponents_sf0.01_to_sf0.1",
                "load_avg": [round(x, 2) for x in os.getloadavg()],
                "queries": {
                    n: {
                        "sf0.01_sec": round(lo, 4),
                        "sf0.1_sec": round(hi, 4),
                        "alpha": round(a, 3),
                    }
                    for n, lo, hi, a in rows
                },
            }
        )
    )


if __name__ == "__main__":
    main()
