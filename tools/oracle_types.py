"""Catalog-wide oracle *type* audit — the round-5 blind spot closer.

The driver hashes Spark and DuckDB results with a type-sensitive
canonicalization: a DuckDB HUGEINT (int128, the default result type
of an integer ``SUM``) hashes differently from Spark's BIGINT even
when every value is bit-identical (VERDICT.md round 5, "What's
wrong").  tools/parity.py's ``str()`` canonicalization erases that
difference, which is how 8 red driver rows shipped as "50/50 OK".

This tool binds every oracle in the catalog through DuckDB and fails
on any *result column type* Spark cannot emit:

- HUGEINT / UHUGEINT  — DuckDB int128 SUM results; Spark has no
  128-bit integer.  Fix: ``CAST(SUM(x) AS BIGINT)``.
- DECIMAL(p,s)        — Spark queries in this repo emit DOUBLE for
  every fractional column; a DECIMAL oracle column canonicalizes as
  ``Decimal('1.50')`` vs ``1.5``.  Fix: ``CAST(... AS DOUBLE)``.
- unsigned ints       — no Spark equivalent.
- TIME / INTERVAL     — Spark has no TIME type, and DuckDB INTERVAL
  canonicalizes as ``timedelta`` vs Spark's interval types.  Fix:
  emit epoch seconds / day counts as BIGINT instead.
- TINYINT / SMALLINT  — this repo's Spark results only emit
  INT/BIGINT integers; a narrower oracle column is a hash hazard.
  Fix: ``CAST(... AS INT)`` or BIGINT.

(``TIMESTAMP`` is fine and is explicitly excluded from the TIME
match.)  Lists are recursed into (``BIGINT[]`` is fine,
``HUGEINT[]`` is not).

Value-level NaN-vs-NULL divergence is the other driver-hash hazard
class; it can't be caught by schema binding, so it's pre-killed at
the comparator level instead: tools/parity.py canonicalizes NaN,
NULL, ±Inf, and -0.0 distinctly (negative controls in
tests/test_oracle_types.py), and the full-catalog parity sweeps run
through that comparator.

Run:  python -m tools.oracle_types          # audit all, exit 1 on hit
Used by tests/test_oracle_types.py as the permanent regression gate.
"""

from __future__ import annotations

import re

_BAD = re.compile(
    r"\b(HUGEINT|UHUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT|DECIMAL"
    r"|TIME|INTERVAL|TINYINT|SMALLINT)\b"
)


def bad_columns(con, oracle: str) -> list[tuple[str, str]]:
    """Return [(column, type)] for every result column whose DuckDB
    type Spark cannot emit (or this repo never emits).  Binds the
    query (cheap) without running it to completion."""
    rel = con.sql(oracle)
    out = []
    for name, typ in zip(rel.columns, rel.types):
        t = str(typ)
        # TIMESTAMP (incl. "WITH TIME ZONE") is fine; don't let the
        # bare-TIME hazard match inside it
        scrubbed = t.replace("TIMESTAMP WITH TIME ZONE", "TS").replace(
            "TIMESTAMP", "TS"
        )
        if _BAD.search(scrubbed):
            out.append((name, t))
    return out


def audit_catalog(sf_dir: str) -> dict[str, list[tuple[str, str]]]:
    """Audit every oracled catalog query; return {query: bad_cols}."""
    from cricket_analytics_nosql_spark.catalog import all_queries
    from tools.parity import duckdb_connection

    con = duckdb_connection(sf_dir)
    hits: dict[str, list[tuple[str, str]]] = {}
    try:
        for name, spec in all_queries().items():
            if not spec.oracle:
                continue
            bad = bad_columns(con, spec.oracle)
            if bad:
                hits[name] = bad
    finally:
        con.close()
    return hits


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    hits = audit_catalog(sf_dir)
    for name, bad in sorted(hits.items()):
        for col, typ in bad:
            print(f"{name}: {col} -> {typ}")
    print(f"{len(hits)} oracle(s) with Spark-inexpressible result types")
    raise SystemExit(1 if hits else 0)
