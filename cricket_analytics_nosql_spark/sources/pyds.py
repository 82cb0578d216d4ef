"""Custom Python Data Source (Spark 4 DataSource API) — the
"collection dump" reader.

The reference's ingest edge is a MongoDB collection scanned
client-side (etl_cricsheet_to_mongo.py reads files, the analytics
read collections). Spark's native equivalent for anything that is
not already a file format is a DataSource V2 implementation; PySpark
4 exposes that as the Python DataSource API, and this module uses it
to make a directory of JSON-document files (a ``mongodump``-style
collection export, one document per file — exactly the Cricsheet
layout) a FIRST-CLASS format:

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CollectionDumpDataSource)
    df = (spark.read.format("collection_dump")
          .schema("path string, doc string")
          .load("/dumps/matches"))

(The pushdown conf is required because this reader implements
``pushFilters`` — Spark refuses to silently ignore a source's
pushdown hook.)

Contract note: a reader instance carries ONE query's pushdown state
(``pushFilters`` → ``partitions`` are planning-time calls on the
same object); reuse a ``.load()`` result across differently-filtered
queries and the first plan's pruning can leak into the second —
call ``.load()`` per query, as with any V2 relation options.

Engine integration, not a loop over files:

- ``partitions()`` returns one InputPartition per document file —
  Spark schedules them across executors like any other scan split
  (the 100 TB posture: a million dump files = a million schedulable
  splits, not a driver loop).
- ``pushFilters`` accepts equality/IN filters on the ``path`` column
  and prunes PARTITIONS — files that cannot match are never opened,
  the same file-skipping contract a parquet scan gets from its
  footer stats. Every other filter is returned to Spark unchanged
  (correctness never depends on the source's cleverness).
- Payload parsing stays in the engine: the ``doc`` column feeds the
  existing ``from_json``/ETL path (sources/cricsheet.py), so the
  slow Python row path carries raw bytes only.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CollectionDumpReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("collection_dump: .load(path) is required")
        self.suffix = options.get("suffix", ".json")
        self._keep: set[str] | None = None  # path pushdown, None = all

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept path equality/IN — partition pruning — and hand
        everything else back to Spark."""
        for f in filters:
            if isinstance(f, (EqualTo, In)) and f.attribute == ("path",):
                vals = (
                    {str(v) for v in f.value}
                    if isinstance(f, In)
                    else {str(f.value)}
                )
                self._keep = (
                    vals if self._keep is None else self._keep & vals
                )
            else:
                yield f  # not ours — Spark evaluates it post-scan

    def partitions(self) -> Sequence[InputPartition]:
        names = sorted(
            n for n in os.listdir(self.root) if n.endswith(self.suffix)
        )
        if self._keep is not None:
            names = [n for n in names if n in self._keep]
        return [_FilePartition(os.path.join(self.root, n)) for n in names]

    def read(self, partition: _FilePartition | None):
        # an empty partitions() list reaches read() as a single None
        # partition (the worker substitutes [None] for []) — that is
        # the zero-files / fully-pruned case: yield nothing
        if partition is None:
            return
        with open(partition.path, encoding="utf-8") as f:
            doc = f.read()
        yield (os.path.basename(partition.path), doc)


class CollectionDumpStreamReader(DataSourceStreamReader):
    """Streaming twin: tail the dump directory as documents arrive.

    Offsets are {"index": N} over the SORTED file listing — files
    are append-only and names monotone in arrival order (the
    mongodump/cricsheet convention), so the sorted prefix is a
    replayable, checkpointable position. Each micro-batch's
    partitions are the files in (start, end]: one schedulable split
    per new document, planned on the driver from a directory listing
    (metadata), never file contents — this is the
    ``DataSourceStreamReader`` (executor-read) API, not the
    driver-reading Simple variant."""

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("collection_dump: .load(path) is required")
        self.suffix = options.get("suffix", ".json")

    def _listing(self) -> list[str]:
        return sorted(
            n for n in os.listdir(self.root) if n.endswith(self.suffix)
        )

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(self._listing())}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        names = self._listing()[start["index"]: end["index"]]
        return [_FilePartition(os.path.join(self.root, n)) for n in names]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as f:
            doc = f.read()
        yield (os.path.basename(partition.path), doc)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the directory is the source of truth


class CollectionDumpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "collection_dump"

    def schema(self) -> str:
        return "path string, doc string"

    def reader(self, schema) -> CollectionDumpReader:
        return CollectionDumpReader(self.options)

    def streamReader(self, schema) -> CollectionDumpStreamReader:
        return CollectionDumpStreamReader(self.options)
