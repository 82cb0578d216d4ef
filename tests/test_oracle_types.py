"""Oracle result-TYPE gate — closes the round-5 parity blind spot.

Eight driver rows went red in round 5 with bit-identical values:
their oracle SQL ended in an un-cast integer ``SUM``, which DuckDB
types HUGEINT (int128) and the driver's hash canonicalizes
differently from Spark's BIGINT.  tools/parity.py's ``str()``
canonicalization erased the difference, so the in-repo sweep was
green while the driver was red (VERDICT.md round 5).

This test binds every oracle in the 247-query catalog through DuckDB
and fails on any result column typed HUGEINT / DECIMAL / unsigned —
types Spark never emits.  The negative control injects exactly the
round-5 bug shape (un-cast SUM) and asserts the auditor flags it.
"""

from __future__ import annotations

import pytest

from cricket_analytics_nosql_spark.catalog import all_queries
from tools.oracle_types import bad_columns
from tools.parity import duckdb_connection


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb_connection(sf_small)
    yield c
    c.close()


def test_injected_uncast_sum_is_flagged(con):
    """Negative control: the exact round-5 bug shape must be caught."""
    bad = bad_columns(
        con, "SELECT o_custkey, SUM(o_custkey) AS s FROM orders GROUP BY 1"
    )
    assert bad == [("s", "HUGEINT")]
    # DECIMAL literals are the other driver-visible hazard
    bad = bad_columns(con, "SELECT 1.5 AS d")
    assert bad and bad[0][0] == "d" and "DECIMAL" in bad[0][1]
    # and the cast fix must clear it
    assert bad_columns(con, "SELECT CAST(SUM(o_custkey) AS BIGINT) AS s FROM orders") == []


def test_all_catalog_oracles_type_clean(con):
    """Every oracle's result schema must be Spark-emittable."""
    hits = {}
    for name, spec in all_queries().items():
        if not spec.oracle:
            continue
        bad = bad_columns(con, spec.oracle)
        if bad:
            hits[name] = bad
    assert not hits, f"oracles with Spark-inexpressible result types: {hits}"
