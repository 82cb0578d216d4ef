"""Compare two bench JSONs (driver ``BENCH_r{N}.json`` or raw
``bench.py`` output) per query, annotated with the documented ±20%
host-noise band (PERF.md): deltas inside the band are noise, not
signal.

Usage: python -m tools.bench_compare OLD.json NEW.json
"""

from __future__ import annotations

import json
import sys

NOISE = 0.20


def _load(path: str) -> dict:
    """Accept a driver BENCH_r{N}.json, a bench_stamps.json, or raw
    ``bench.py`` stdout — which since round 10 is TWO JSON lines
    (full stamped record first, compact contract line last). Prefer
    the FIRST parseable line with a real per-query map: the compact
    line collapses ``queries`` to ``{"n": N}`` when oversized, which
    must not be read as a query named "n"."""
    with open(path) as f:
        text = f.read()
    docs = []
    try:
        docs = [json.loads(text)]
    except json.JSONDecodeError:
        for line in text.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                docs.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    if not docs:
        raise SystemExit(f"{path}: no parseable JSON record")
    for doc in docs:
        if "parsed" in doc and isinstance(doc["parsed"], dict):
            doc = doc["parsed"]
        q = doc.get("queries")
        if isinstance(q, dict) and set(q) != {"n"}:
            return doc
    raise SystemExit(f"{path}: no record with a per-query map")


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    old, new = _load(argv[0]), _load(argv[1])
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    print(f"{'query':32} {'old':>8} {'new':>8} {'delta':>8}  verdict")
    for name in shared:
        a, b = oq[name], nq[name]
        d = (b - a) / a if a else float("inf")
        verdict = (
            "noise"
            if abs(d) <= NOISE
            else ("REGRESSED" if d > 0 else "improved")
        )
        print(f"{name:32} {a:8.3f} {b:8.3f} {d:+8.1%}  {verdict}")
    for name in sorted(set(nq) - set(oq)):
        print(f"{name:32} {'-':>8} {nq[name]:8.3f} {'new':>8}")
    for name in sorted(set(oq) - set(nq)):
        print(f"{name:32} {oq[name]:8.3f} {'-':>8} {'dropped':>8}")
    tot_old = sum(oq[n] for n in shared)
    tot_new = sum(nq[n] for n in shared)
    d = (tot_new - tot_old) / tot_old if tot_old else 0.0
    print(
        f"\nshared-set total: {tot_old:.2f}s -> {tot_new:.2f}s ({d:+.1%};"
        f" band ±{NOISE:.0%})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
