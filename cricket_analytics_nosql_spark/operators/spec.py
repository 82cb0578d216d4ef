"""QuerySpec — the unit of the engine's driver-facing catalog.

Every operator from SURVEY.md §2 is exposed as a named QuerySpec:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs on
the same parquet tables. ``oracle=None`` marks the weaker rows-only
check path (iterative / hash-seed-dependent operators).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    # SURVEY.md §2 operator ids this query exercises, e.g. ["A1", "T1"]
    ops: list[str] = field(default_factory=list)
    # headline queries run in bench.py
    bench: bool = False
