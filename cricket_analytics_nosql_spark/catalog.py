"""Driver-facing catalog: merges every module's QUERIES registry.

``__spark_entry__.py`` derives its ``queries()`` / ``oracle_sql()``
dicts from here; tests iterate the same registry so the in-repo
parity suite and the driver's correctness gate check the same thing.

SURVEY.md §2 inventory ids not represented by a query, by design:
- F3 (``UNWIND $rows`` client batch unnest) — an artifact of the
  reference's client/server parameter batching; Spark DataFrames are
  already distributed rows, there is nothing to unnest.
- J5 (Mongo→Neo4j cross-store handoff join) — eliminated: one
  engine, one storage layer; the same joins are plain DataFrame
  joins (J1-J4, J6).
- S9 (connectivity smoke) — ≙ the driver's own ``entry()`` smoke
  check plus the session fixture in tests/conftest.py.
"""

from __future__ import annotations

from cricket_analytics_nosql_spark.operators.spec import QuerySpec


def all_queries() -> dict[str, QuerySpec]:
    # local imports: keep catalog import cheap and cycle-free
    from cricket_analytics_nosql_spark.operators import (
        analytics,
        cricket,
        dedup,
        graph,
        joins,
        multimodal,
        pysurface,
        relational,
        setops,
        similarity,
        sinks,
        skew,
        text,
        windows,
    )

    from cricket_analytics_nosql_spark.plans import driver_queries as plan_queries
    from cricket_analytics_nosql_spark.streaming import events as streaming_events
    from cricket_analytics_nosql_spark.streaming import stateful as streaming_stateful

    registry: dict[str, QuerySpec] = {}
    for module in (
        relational,
        analytics,
        joins,
        windows,
        setops,
        graph,
        text,
        dedup,
        similarity,
        multimodal,
        skew,
        cricket,
        sinks,
        pysurface,
        plan_queries,
        streaming_events,
        streaming_stateful,
    ):
        overlap = registry.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        registry.update(module.QUERIES)
    return registry
