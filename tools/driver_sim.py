"""Round-boundary assurance artifact (VERDICT r6 item 4).

Simulates the driver's correctness pass in THIS process the way the
driver will run it after the closing commit: a fresh *vanilla*
SparkSession (non-UTC timezone, none of our get_spark configs),
``entry()`` first, then the first-50 catalog window compared against
the DuckDB oracles at sf0.01 through tools.parity — the local
replica of the driver's hash gate — plus a git-SHA-seeded sample of
10 queries beyond the window boundary (VERDICT r7 item 7), so the
artifact also covers the unproven tail.

Writes ``DRIVER_SIM.json`` at the repo root with the git SHA and a
wall timestamp, so the closing claim ("the window the driver is
about to check is green at HEAD") is committed and auditable without
re-running the suite.  Regenerate + commit as the LAST commit of
each round:

    python -m tools.driver_sim          # ~2-4 min at sf0.01
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WINDOW = 50


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from tools.parity import compare

    t0 = time.perf_counter()
    entry_rows = len(entry_mod.entry(spark).collect())

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    from cricket_analytics_nosql_spark.catalog import all_queries

    catalog_order = list(all_queries())
    window = catalog_order[:WINDOW]

    def run_one(name: str) -> str:
        try:
            if name in oracles:
                compare(queries[name](spark, sf_dir), oracles[name], sf_dir, name)
                return "OK"
            n = queries[name](spark, sf_dir).count()
            return f"rows-only:{n}"
        except Exception as exc:  # noqa: BLE001 — artifact records the failure
            return f"FAIL: {str(exc)[:300]}"

    results: dict[str, str] = {name: run_one(name) for name in window}

    sha = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()

    # VERDICT r7 item 7: also sample 10 queries from BEYOND the window
    # boundary, seeded by the git SHA, so the committed assurance
    # artifact covers the unproven tail, not just the window the
    # builder chose.  Deterministic given HEAD — auditable by re-run.
    import random

    tail_pool = catalog_order[WINDOW:]
    tail_names = sorted(
        random.Random(sha).sample(tail_pool, min(10, len(tail_pool)))
    )
    tail_results: dict[str, str] = {name: run_one(name) for name in tail_names}
    n_ok = sum(1 for v in results.values() if v == "OK")
    artifact = {
        "purpose": (
            "vanilla-session driver simulation: entry() + first-50 "
            "catalog window vs DuckDB oracles (tools.parity)"
        ),
        "git_sha": sha,
        "generated_at_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "sf_dir": sf_dir,
        "session": "local[8], spark.sql.session.timeZone=America/New_York, vanilla configs",
        "entry_rows": entry_rows,
        "window_size": len(window),
        "ok": n_ok,
        "failed": len(window) - n_ok - sum(1 for v in results.values() if v.startswith("rows-only")),
        "elapsed_sec": round(time.perf_counter() - t0, 1),
        "results": results,
        "tail_sample": {
            "purpose": (
                "10 queries sampled beyond the window boundary, "
                "seeded by git_sha (random.Random(sha).sample)"
            ),
            "ok": sum(1 for v in tail_results.values() if v == "OK"),
            "results": tail_results,
        },
    }
    out = os.path.join(ROOT, "DRIVER_SIM.json")
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=1)
        fh.write("\n")
    tail_ok = sum(1 for v in tail_results.values() if v == "OK")
    print(
        f"wrote {out}: window {n_ok}/{len(window)} OK, "
        f"tail {tail_ok}/{len(tail_names)} OK, sha={sha[:9]}"
    )
    raise SystemExit(
        0 if n_ok == len(window) and tail_ok == len(tail_names) else 1
    )


if __name__ == "__main__":
    main()
