"""Regenerate COVERAGE.md from the catalog's QuerySpec.ops tags.

Usage: python tools/gen_coverage.py  (from the repo root)
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cricket_analytics_nosql_spark.catalog import all_queries  # noqa: E402

SECTIONS = [
    ("§2.1 Scans / sources / sinks", [f"S{i}" for i in range(1, 10)]),
    ("§2.2 Projections / filters / scalar expressions", [f"P{i}" for i in range(1, 18)]),
    ("§2.3 Flatten / unnest", [f"F{i}" for i in range(1, 4)]),
    ("§2.4 Aggregations", [f"A{i}" for i in range(1, 11)]),
    ("§2.5 Joins", [f"J{i}" for i in range(1, 7)]),
    ("§2.6 Sorts / limits / top-k", [f"T{i}" for i in range(1, 7)]),
    ("§2.10 Graph analytics", [f"G{i}" for i in range(1, 4)]),
]
NA = {
    "F3": "client `UNWIND $rows` batching artifact — DataFrames are already distributed rows",
    "J5": "cross-store Mongo→Neo4j handoff — eliminated, one engine (joins are J1-J4/J6)",
    "S9": "connectivity smoke — ≙ the driver's `entry()` smoke + tests/conftest.py session fixture",
}
EXT = [
    ("X-dedup", "Deduplication (exact / Jaccard / MinHash-LSH / SimHash / embedding-cosine)"),
    ("X-sim", "Similarity search (brute-force / IVF / SRP-LSH)"),
    ("X-text", "Text analysis (quality / lang-ID / tokens / TF-IDF / fingerprints)"),
    ("X-mm", "Multimodal binary columns"),
    ("X-curation", "Corpus curation (stratified sampling / quantile trim / repetition / decontamination / PII scrub)"),
    ("X-training", "Training export (split / sequence packing / mixture rebalance / int8 quantization)"),
    ("X-ts", "Time-series (hypertable-style rollup / sessionize / as-of)"),
    ("X-versioning", "Data versioning (snapshot diff / incremental audit)"),
    ("X-quality", "Data-quality constraints (uniqueness / referential / range / null audit)"),
    ("X-layout", "Data layout (Z-order multi-dimensional clustering)"),
    ("§2.11", "Structured Streaming"),
    ("§2.12", "Vectorized Python surface (pandas_udf / UDTF / mapInPandas / applyInPandasWithState)"),
    ("§7.8-skew", "Skew mitigation"),
]


def _driver_telemetry(
    root: str, artifacts: list[str] | None = None
) -> tuple[list[str], dict[str, int]]:
    """Per-query driver-check status from the committed
    CORRECTNESS_r*.json artifacts: each catalog entry → the latest
    round that checked it and the result. Makes the remaining
    validation debt (never-windowed queries) visible at a glance.

    ``artifacts`` pins the exact artifact basenames consumed (the
    manifest embedded in COVERAGE.md); ``None`` globs everything
    currently on disk. The pinning is what makes the freshness gate
    race-proof: the driver writes CORRECTNESS_r{N}.json *after* the
    round's closing commit, so a gate that globs would go red through
    no fault of the committed file (VERDICT r6 item 2).
    """
    import glob
    import json
    import re

    if artifacts is None:
        paths = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    else:
        paths = [os.path.join(root, name) for name in artifacts]

    latest: dict[str, tuple[int, str]] = {}
    for path in paths:
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("err") == "no_oracle":
                status = "rows-only"
            elif row.get("hash_match"):
                status = "hash-green"
            else:
                status = f"MISMATCH ({row.get('err') or 'hash'})"
            latest[name] = (rnd, status)

    consumed = [os.path.basename(p) for p in paths]
    out = ["\n## Driver correctness telemetry\n"]
    out.append(f"<!-- artifacts: {' '.join(consumed)} -->\n")
    out.append(
        "Latest driver `CORRECTNESS_r*.json` row per catalog entry "
        "(catalog order = driver window order; the driver checks the "
        "first 50 per round, so `never` entries are queued for the "
        "next windows — all of them are green in the in-repo DuckDB "
        "parity suite, `tests/test_oracle_parity.py`).\n"
    )
    out.append("| query | last round | driver result |")
    out.append("|---|---|---|")
    counts = {"hash-green": 0, "rows-only": 0, "never": 0, "mismatch": 0}
    for name, spec in all_queries().items():
        if name in latest:
            rnd, status = latest[name]
            out.append(f"| `{name}` | r{rnd} | {status} |")
            if status.startswith("MISMATCH"):
                counts["mismatch"] += 1
            else:
                counts[status] += 1
        else:
            kind = "oracled" if spec.oracle else "rows-only"
            out.append(f"| `{name}` | — | never windowed ({kind}) |")
            counts["never"] += 1
    return out, counts


def render(root: str, artifacts: list[str] | None = None) -> str:
    """Render COVERAGE.md's full content (pure — no file writes), so
    tests can assert the committed file is not stale vs the catalog
    and the CORRECTNESS_r*.json artifacts (VERDICT r5 item 8: red
    driver rows must be visible the day they land).

    ``artifacts``: exact artifact basenames to consume (see
    ``_driver_telemetry``); ``None`` = everything on disk."""
    by_op = defaultdict(list)
    for name, spec in sorted(all_queries().items()):
        for op in spec.ops:
            by_op[op].append((name, spec.oracle is not None))

    out = []
    out.append("# COVERAGE: SURVEY.md §2 operator inventory → driver queries\n")
    out.append(
        "Generated from the `QuerySpec.ops` tags in the catalog "
        "(`python tools/gen_coverage.py` regenerates). ✓ = exact DuckDB "
        "oracle; rows = rows-only driver check (iterative / hash-seeded / "
        "non-SQL-expressible), pinned by golden + invariant tests instead.\n"
    )
    for title, ids in SECTIONS:
        out.append(f"\n## {title}\n")
        out.append("| id | covered by | check |")
        out.append("|---|---|---|")
        for op in ids:
            if op in NA:
                out.append(f"| {op} | *N/A by design* — {NA[op]} | — |")
                continue
            entries = by_op.get(op, [])
            names = ", ".join(f"`{n}`" for n, _ in entries)
            checks = "✓" if any(o for _, o in entries) else "rows"
            out.append(f"| {op} | {names} | {checks} |")
    out.append("\n## Extensions (BASELINE.md mandate)\n")
    out.append("| surface | covered by | check |")
    out.append("|---|---|---|")
    for tag, label in EXT:
        entries = by_op.get(tag, [])
        names = ", ".join(f"`{n}`" for n, _ in entries)
        mark = "✓" if any(o for _, o in entries) else "rows"
        out.append(f"| {label} | {names} | {mark} |")
    out.append("")
    out.append(
        "Query front-ends (§3.2 IR parity): the Mongo aggregation-pipeline "
        "dialect compiles to the same DataFrame plans "
        "(`plans/mongo_pipeline.py`; `mongo_pipeline_*` queries above run "
        "THROUGH the compiler and hash-match their SQL oracles; the "
        "reference's three verbatim pipelines are pinned in "
        "`tests/test_mongo_pipeline.py`). CLI: `etl` / `graph` / "
        "`analytics` / `pipeline` / `cypher` / `sql` / `query`.\n"
    )
    out.append(
        "Library surfaces without a driver-query form (tested in `tests/`): "
        "bucketed co-located joins (`write_bucketed`, no-Exchange plan test); "
        "cricket ETL golden tests over the v1.0.0/v1.1.0 drift matrix (§5.2); "
        "Z-order clustered writes (`layout.zorder_write`, per-file "
        "bounding-box test); small-file compaction, schema-evolution reads, "
        "dynamic partition-overwrite backfill, manifest-driven incremental "
        "reads (`operators/sinks.py`); Misra-Gries bounded-memory summary "
        "(`sketches.misra_gries_summary`, guarantee tests); k-core "
        "decomposition (`graph.kcore`); JSONL shard export "
        "(`training.export_jsonl_shards`); custom Python DataSource with "
        "pushdown partition pruning + streaming tail (`sources/pyds.py`)."
    )
    telemetry, counts = _driver_telemetry(root, artifacts)
    out.extend(telemetry)
    render.counts = counts  # for main()'s summary line
    return "\n".join(out) + "\n"


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    content = render(root)
    with open(os.path.join(root, "COVERAGE.md"), "w") as fh:
        fh.write(content)
    print(
        "wrote COVERAGE.md — driver telemetry:",
        ", ".join(f"{k}={v}" for k, v in render.counts.items()),
    )


if __name__ == "__main__":
    main()
