"""Round-boundary assurance artifact (VERDICT r6 item 4).

Simulates the driver's correctness pass in THIS process the way the
driver will run it after the closing commit: a fresh *vanilla*
SparkSession (non-UTC timezone, none of our get_spark configs),
``entry()`` first, then the first-50 catalog window compared against
the DuckDB oracles at sf0.01 through tools.parity — the local
replica of the driver's hash gate.

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

    window = list(all_queries())[:WINDOW]
    results: dict[str, str] = {}
    for name in window:
        try:
            if name in oracles:
                compare(queries[name](spark, sf_dir), oracles[name], sf_dir, name)
                results[name] = "OK"
            else:
                n = queries[name](spark, sf_dir).count()
                results[name] = f"rows-only:{n}"
        except Exception as exc:  # noqa: BLE001 — artifact records the failure
            results[name] = f"FAIL: {str(exc)[:300]}"

    sha = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
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
    }
    out = os.path.join(ROOT, "DRIVER_SIM.json")
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out}: {n_ok}/{len(window)} OK, sha={sha[:9]}")
    raise SystemExit(0 if n_ok == len(window) else 1)


if __name__ == "__main__":
    main()
