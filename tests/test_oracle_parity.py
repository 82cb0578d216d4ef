"""Oracle-differential suite (SURVEY.md §5.1): every catalog query
with an oracle must match DuckDB exactly on sf0.001 — same check the
driver runs at sf0.01, so this is the pre-flight for CORRECTNESS_r*.
Rows-only queries are smoke-checked for executability + stable schema.
"""

from __future__ import annotations

import pytest

from cricket_analytics_nosql_spark.catalog import all_queries
from tools.parity import compare

CATALOG = all_queries()
WITH_ORACLE = sorted(n for n, s in CATALOG.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in CATALOG.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_small, name):
    spec = CATALOG[name]
    compare(spec.fn(spark, sf_small), spec.oracle, sf_small, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(spark, sf_small, name):
    spec = CATALOG[name]
    df = spec.fn(spark, sf_small)
    assert df.columns, f"[{name}] no columns"
    assert df.count() >= 0
