"""Custom stateful streaming operator — SURVEY.md §2.11's
``applyInPandasWithState`` slot: logic that windowed aggregation
cannot express, running per-key with explicit state.

Operator: **per-user value-spike monitor**. For each user, track a
running mean of ``value`` across micro-batches and emit one row per
batch in which the user had at least one event exceeding
``threshold × running_mean-so-far`` (the mean *before* the batch —
windowless, order-sensitive across batches, inexpressible as a
groupBy). State is a 3-tuple (count, sum, n_spikes) per user —
constant size, watermark-free (the state never grows with data,
only with distinct users, exactly how a 100 TB keyed monitor must
behave; add a timeout for user churn in production).

The same kernel exposed two ways:
- ``spike_monitor_stream``: applyInPandasWithState on a streaming
  frame (GroupState plumbing, per-batch emission);
- ``spike_monitor_batch``: the whole-history closed form used as the
  parity oracle in tests (one pass, same totals).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_total", T.LongType()),
        T.StructField("n_spikes_total", T.LongType()),
        T.StructField("running_mean", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("cnt", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("spikes", T.LongType()),
    ]
)


def _update_spikes(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
    threshold: float,
) -> Iterator[pd.DataFrame]:
    """Per-key update: fold each micro-batch into (cnt, total,
    spikes); a row is a spike if its value exceeds threshold × the
    running mean at the start of ITS batch (deterministic under
    batch replay — intra-batch order must not matter)."""
    (cnt, total, spikes) = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        mean_before = (total / cnt) if cnt else None
        if mean_before is not None:
            spikes += int((pdf["value"] > threshold * mean_before).sum())
        cnt += len(pdf)
        total += float(pdf["value"].sum())
    state.update((cnt, total, spikes))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events_total": [cnt],
            "n_spikes_total": [spikes],
            "running_mean": [total / cnt if cnt else 0.0],
        }
    )


def spike_monitor_stream(
    events: DataFrame, threshold: float = 3.0
) -> DataFrame:
    """Streaming form: one output row per (user, micro-batch) with
    the totals as of that batch — update output mode."""

    def fn(key, pdfs, state):
        return _update_spikes(key, pdfs, state, threshold)

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def spike_monitor_batch(
    events: DataFrame, batch_bounds: list, threshold: float = 3.0
) -> DataFrame:
    """Batch oracle: the same semantics computed with windows over
    the full history, given the micro-batch boundary timestamps the
    stream replay used. Used by tests to pin batch↔stream parity."""
    from pyspark.sql import Window

    bucket = F.lit(len(batch_bounds))
    for i, b in enumerate(reversed(batch_bounds)):
        bucket = F.when(F.col("ts") < F.lit(b), len(batch_bounds) - 1 - i).otherwise(
            bucket
        )
    ev = events.withColumn("batch", bucket)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("batch")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    with_prior = ev.select(
        "user_id",
        "batch",
        "value",
        F.count(F.lit(1)).over(w_prev).alias("cnt_before"),
        F.sum("value").over(w_prev).alias("sum_before"),
    )
    spikes = (
        with_prior.filter(
            F.col("cnt_before").isNotNull()
            & (F.col("cnt_before") > 0)
            & (
                F.col("value")
                > F.lit(threshold) * (F.col("sum_before") / F.col("cnt_before"))
            )
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_spikes_total"))
    )
    totals = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events_total"),
        (F.sum("value") / F.count(F.lit(1))).alias("running_mean"),
    )
    return totals.join(spikes, "user_id", "left").na.fill(
        {"n_spikes_total": 0}
    ).select("user_id", "n_events_total", "n_spikes_total", "running_mean")
