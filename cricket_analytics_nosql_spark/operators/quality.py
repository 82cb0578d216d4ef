"""Zero-extra-pass data-quality metrics — the monitoring hook a
100 TB training-data pipeline needs without paying a second scan.

``observed_quality`` attaches row/null/distinct-ish counters to a
frame via ``Observation`` (CollectMetrics): the metrics ride on
whatever job first materializes the frame (a sink write, a count, a
downstream agg), so quality monitoring costs zero additional passes
over the data — the same piggyback discipline as PageRank's
dangling-mass scalar (operators/graph.py).

The reference's quality posture is try/except-and-continue
(etl_cricsheet_to_mongo.py:132-147) plus defensive ``.get``
fallbacks; this is its observable, quantified equivalent: the
quarantine path (sources/cricsheet.py, S2) diverts corrupt records,
and these counters report the live null/violation rates of whatever
survived.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(
    df: DataFrame,
    null_cols: list[str] | None = None,
    checks: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Return (df', observation): df' is ``df`` with metrics attached;
    read ``observation.get`` AFTER an action has materialized df'.

    Metrics: ``n_rows``; ``nulls_<col>`` per requested column; and
    ``fail_<name>`` for each named boolean check (count of rows where
    the check is FALSE or NULL — nulls count as failures, matching
    constraint semantics)."""
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    for name, cond in (checks or {}).items():
        metrics.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(f"fail_{name}")
        )
    obs = Observation()
    return df.observe(obs, *metrics), obs
