"""Driver-facing catalog: merges every module's QUERIES registry.

``__spark_entry__.py`` derives its ``queries()`` / ``oracle_sql()``
dicts from here; tests iterate the same registry so the in-repo
parity suite and the driver's correctness gate check the same thing.
"""

from __future__ import annotations

from cricket_analytics_nosql_spark.operators.spec import QuerySpec


def all_queries() -> dict[str, QuerySpec]:
    # local imports: keep catalog import cheap and cycle-free
    from cricket_analytics_nosql_spark.operators import (
        dedup,
        graph,
        joins,
        multimodal,
        relational,
        setops,
        similarity,
        skew,
        text,
        windows,
    )

    from cricket_analytics_nosql_spark.streaming import events as streaming_events

    registry: dict[str, QuerySpec] = {}
    for module in (
        relational,
        joins,
        windows,
        setops,
        graph,
        text,
        dedup,
        similarity,
        multimodal,
        skew,
        streaming_events,
    ):
        overlap = registry.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        registry.update(module.QUERIES)
    return registry
