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


def test_time_interval_narrow_ints_flagged(con):
    """Negative controls for the round-7 gate extension (VERDICT r6
    item 5): TIME / INTERVAL / TINYINT / SMALLINT result columns are
    hazards; TIMESTAMP is not."""
    bad = bad_columns(con, "SELECT TIME '12:34:56' AS t")
    assert bad and bad[0][0] == "t" and "TIME" in bad[0][1]
    bad = bad_columns(con, "SELECT INTERVAL 1 DAY AS i")
    assert bad and bad[0][0] == "i" and "INTERVAL" in bad[0][1]
    bad = bad_columns(con, "SELECT CAST(1 AS TINYINT) AS x")
    assert bad and bad[0][1] == "TINYINT"
    bad = bad_columns(con, "SELECT CAST(1 AS SMALLINT) AS x")
    assert bad and bad[0][1] == "SMALLINT"
    # TIMESTAMP must NOT be flagged (the TIME match is word-scrubbed)
    assert bad_columns(con, "SELECT TIMESTAMP '2020-01-01 00:00:00' AS ts") == []
    # nested list of a hazard type is still a hazard
    bad = bad_columns(con, "SELECT [CAST(1 AS SMALLINT)] AS xs")
    assert bad and "SMALLINT" in bad[0][1]


def test_nan_null_inf_zero_canonicalize_distinctly():
    """Value-level negative controls: the parity comparator (the
    in-repo replica of the driver's hash) must distinguish every
    float edge class, so a Spark-NULL vs oracle-NaN divergence can
    never ship as a false green."""
    from tools.parity import _canon, canonical_rows

    nan, null = _canon(float("nan")), _canon(None)
    pinf, ninf = _canon(float("inf")), _canon(float("-inf"))
    zero, nzero = _canon(0.0), _canon(-0.0)
    distinct = {nan, null, pinf, ninf, zero}
    assert len(distinct) == 5, distinct
    assert zero != nzero  # -0.0 is a real IEEE divergence class
    # end-to-end: rows differing only NaN-vs-NULL must not compare equal
    assert canonical_rows(["x"], [(float("nan"),)]) != canonical_rows(
        ["x"], [(None,)]
    )


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
