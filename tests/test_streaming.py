"""Streaming surface tests (SURVEY.md §5.5): batch-stream parity on
the same transformations, watermark late-data drop over a real
multi-batch replay, stateful dedup, and the foreachBatch upsert
sink's idempotency.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.sources.tables import load_table
from cricket_analytics_nosql_spark.streaming.events import (
    enrich_with_dim,
    foreach_batch_upsert,
    late_data_filter,
    read_events_stream,
    run_available_now,
    session_aggregate,
    sliding_avg,
    sliding_traffic,
    stage_event_files,
    tumbling_counts,
    watermarked_dedup,
)


@pytest.fixture(scope="module")
def staged(spark, sf_small):
    return stage_event_files(spark, sf_small, n_chunks=4)


@pytest.fixture(scope="module")
def events_batch(spark, sf_small):
    return load_table(spark, sf_small, "events").cache()


def _rows(df, *keys):
    return sorted(tuple(r) for r in df.select(*keys).collect())


def test_staging_is_lossless(spark, staged, events_batch):
    replay = spark.read.parquet(staged)
    assert replay.count() == events_batch.count()
    assert _rows(replay, "event_id") == _rows(events_batch, "event_id")


def test_batch_stream_parity_tumbling(spark, staged, events_batch):
    """Same function, batch frame vs streamed frame → same rows."""
    stream_out = run_available_now(
        tumbling_counts(read_events_stream(spark, staged)), "complete"
    )
    batch_out = tumbling_counts(events_batch)
    cols = ["win_start", "event_type", "n_events", "total_value"]
    assert _rows(stream_out, *cols) == _rows(batch_out, *cols)


def test_batch_stream_parity_sliding(spark, staged, events_batch):
    stream_out = run_available_now(
        sliding_avg(read_events_stream(spark, staged)), "complete"
    )
    cols = ["win_start", "n_events", "n_users"]
    assert _rows(stream_out, *cols) == _rows(sliding_avg(events_batch), *cols)


def test_batch_stream_parity_sliding_traffic(spark, staged, events_batch):
    stream_out = run_available_now(
        sliding_traffic(read_events_stream(spark, staged)), "complete"
    )
    cols = ["win_start", "n_events", "total_value"]
    assert _rows(stream_out, *cols) == _rows(
        sliding_traffic(events_batch), *cols
    )


def test_batch_stream_parity_static_join(spark, sf_small, staged, events_batch):
    dim = load_table(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg_cols = ["c_mktsegment", "n_events"]
    stream_out = run_available_now(
        enrich_with_dim(read_events_stream(spark, staged), dim)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events")),
        "complete",
    )
    batch_out = (
        enrich_with_dim(events_batch, dim)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert _rows(stream_out, *agg_cols) == _rows(batch_out, *agg_cols)


def test_batch_stream_parity_sessions(spark, staged, events_batch):
    stream_out = run_available_now(
        session_aggregate(read_events_stream(spark, staged)), "complete"
    )
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(stream_out, *cols) == _rows(
        session_aggregate(events_batch), *cols
    )


def test_watermark_drops_late_data(spark, tmp_path):
    """Four micro-batches; the third carries an event hours older
    than the watermark horizon and the engine must drop it (Spark
    applies the watermark computed through batch N-2 when filtering
    batch N — hence the spacer batch). The trailing batch pushes the
    watermark far enough to finalize the on-time windows, so if the
    late row had leaked into state its 07:00 window would emit."""
    from cricket_analytics_nosql_spark.streaming.events import (
        _parquet_parts,
        set_arrival_order,
    )

    d = str(tmp_path / "late_stream")
    os.makedirs(d)

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts_s string"
        ).select(
            "event_id", F.col("ts_s").cast("timestamp_ntz").alias("ts")
        )

    files = [
        mk([(1, "2024-01-01 10:05:00"), (2, "2024-01-01 10:55:00")]),
        mk([(5, "2024-01-01 11:00:00")]),          # spacer
        mk([(3, "2024-01-01 07:10:00"),            # late vs wm 09:55
            (4, "2024-01-01 11:20:00")]),          # on time
        mk([(6, "2024-01-01 12:30:00")]),          # finalizer
    ]
    groups, seen = [], set()
    for b in files:
        b.coalesce(1).write.mode("append").parquet(d)
        parts = _parquet_parts(d)
        groups.append(sorted(parts - seen))
        seen = parts
    set_arrival_order(d, groups)
    sdf = (
        spark.readStream.schema("event_id long, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = run_available_now(late_data_filter(sdf, "1 hour"), "append").collect()
    counted = {str(r.win_start): r.n_events for r in out}
    # final watermark is 11:30 (12:30 - 1h): every window ending at or
    # before it is finalized. Had late event 3 leaked into state, its
    # 07:00 window (end 08:00 ≤ 11:30) would have emitted with n=1.
    assert counted == {"2024-01-01 10:00:00": 2}


def test_stateful_dedup_within_watermark(spark, staged):
    ev = read_events_stream(spark, staged, files_per_trigger=8)
    doubled = ev.unionByName(ev)
    out = run_available_now(watermarked_dedup(doubled), "append")
    total = spark.read.parquet(staged).count()
    assert out.count() == total
    assert out.select("event_id").distinct().count() == total


def test_foreach_batch_upsert_idempotent(spark, staged, tmp_path):
    """Replaying the same stream into the sink twice must leave the
    same state (exactly-once effect per key)."""
    target = str(tmp_path / "upsert_target")
    sdf = read_events_stream(spark, staged, files_per_trigger=2)
    foreach_batch_upsert(sdf, target, ["event_id"])
    once = spark.read.parquet(target)
    n1 = once.count()
    assert n1 == spark.read.parquet(staged).count()
    foreach_batch_upsert(
        read_events_stream(spark, staged, files_per_trigger=4), target,
        ["event_id"],
    )
    assert spark.read.parquet(target).count() == n1


def test_custom_stateful_spike_monitor(spark, tmp_path):
    """applyInPandasWithState: per-user running-mean spike counter.
    Three micro-batches with hand-computable state transitions, plus
    parity with the batch closed form."""
    from cricket_analytics_nosql_spark.streaming.events import (
        _parquet_parts,
        set_arrival_order,
    )
    from cricket_analytics_nosql_spark.streaming.stateful import (
        spike_monitor_batch,
        spike_monitor_stream,
    )

    d = str(tmp_path / "spike_stream")
    os.makedirs(d)

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, value double"
        ).select(
            "event_id",
            F.col("ts_s").cast("timestamp_ntz").alias("ts"),
            "user_id",
            "value",
        )

    # user 7: b1 mean 10; b2 has 100 (> 3*10, spike) and 10;
    #         running mean before b3 = (10+10+100+10)/4 = 32.5,
    #         b3's 50 is NOT a spike (< 97.5), 200 IS.
    batches = [
        mk([(1, "2024-01-01 00:00:00", 7, 10.0),
            (2, "2024-01-01 00:01:00", 7, 10.0),
            (3, "2024-01-01 00:02:00", 8, 5.0)]),
        mk([(4, "2024-01-01 01:00:00", 7, 100.0),
            (5, "2024-01-01 01:01:00", 7, 10.0)]),
        mk([(6, "2024-01-01 02:00:00", 7, 50.0),
            (7, "2024-01-01 02:01:00", 7, 200.0),
            (8, "2024-01-01 02:02:00", 8, 5.0)]),
    ]
    groups, seen = [], set()
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(d)
        parts = _parquet_parts(d)
        groups.append(sorted(parts - seen))
        seen = parts
    set_arrival_order(d, groups)
    sdf = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = run_available_now(spike_monitor_stream(sdf), "update").collect()
    # final state per user = row with the max event count
    final = {}
    for r in out:
        if r.user_id not in final or r.n_events_total > final[r.user_id].n_events_total:
            final[r.user_id] = r
    assert final[7].n_events_total == 6
    assert final[7].n_spikes_total == 2       # the 100 in b2, the 200 in b3
    assert final[7].running_mean == pytest.approx(380.0 / 6)
    assert final[8].n_spikes_total == 0
    # parity with the batch closed form given the same batch bounds
    all_events = batches[0].unionByName(batches[1]).unionByName(batches[2])
    import datetime as dt

    bounds = [dt.datetime(2024, 1, 1, 1, 0), dt.datetime(2024, 1, 1, 2, 0)]
    batch_rows = {
        r.user_id: r for r in spike_monitor_batch(all_events, bounds).collect()
    }
    for uid, r in final.items():
        b = batch_rows[uid]
        assert (b.n_events_total, b.n_spikes_total) == (
            r.n_events_total,
            r.n_spikes_total,
        )
        assert b.running_mean == pytest.approx(r.running_mean)


def test_stream_stream_join_batch_parity(spark, sf_small):
    """click_purchase_pairs runs identically on batch frames (where
    the watermark is a no-op) and on the replayed stream — §2.11's
    same-function design rule, for the stream-stream join."""
    from cricket_analytics_nosql_spark.sources.tables import load_table
    from cricket_analytics_nosql_spark.streaming.events import (
        click_purchase_pairs,
        read_events_stream,
        run_available_now,
        stage_event_files,
    )

    ev = load_table(spark, sf_small, "events")
    batch = click_purchase_pairs(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    staged = stage_event_files(spark, sf_small)
    sev = read_events_stream(spark, staged)
    streamed = run_available_now(
        click_purchase_pairs(
            sev.filter(F.col("event_type") == "click"),
            sev.filter(F.col("event_type") == "purchase"),
        ),
        "append",
    )
    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in streamed.collect())
    assert b == s and len(b) > 0


def test_pipeline_compiler_composes_with_streams(spark, sf_small):
    """A Mongo-pipeline document compiled onto a STREAMING frame must
    produce the same result as on the batch frame — the front-end is
    engine-orthogonal because it only builds DataFrame expressions
    ($match/$addFields/$group compile to the same Catalyst plan under
    the micro-batch planner)."""
    from cricket_analytics_nosql_spark.plans.mongo_pipeline import (
        compile_pipeline,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table
    from cricket_analytics_nosql_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        stage_event_files,
    )

    pipe = [
        {"$match": {"event_type": {"$in": ["click", "purchase"]}}},
        {
            "$addFields": {
                "value_c": {
                    "$toLong": {"$round": [{"$multiply": ["$value", 100]}, 0]}
                },
                "day": {"$dateTrunc": {"date": "$ts", "unit": "day"}},
            }
        },
        {
            "$group": {
                "_id": {"t": "$event_type", "d": "$day"},
                "n": {"$sum": 1},
                "total_c": {"$sum": "$value_c"},
            }
        },
    ]
    batch = compile_pipeline(load_table(spark, sf_small, "events"), pipe)
    staged = stage_event_files(spark, sf_small)
    streamed = run_available_now(
        compile_pipeline(read_events_stream(spark, staged), pipe), "complete"
    )
    b = sorted((r._id.t, r._id.d, r.n, r.total_c) for r in batch.collect())
    s = sorted((r._id.t, r._id.d, r.n, r.total_c) for r in streamed.collect())
    assert b == s and len(b) > 0


def test_checkpoint_resume_exactly_once(spark, sf_small, tmp_path):
    """Kill-and-resume: run the ingest stream one micro-batch at a
    time, stop it mid-stream, then resume AVAILABLE-NOW from the
    SAME checkpoint — the sink must contain every source row exactly
    once (no loss from the stop, no duplicates from the restart).
    This is the property that makes micro-batch ingest safe to
    operate at 100 TB, where restarts are routine, not exceptional."""
    from pyspark.sql import functions as F

    from cricket_analytics_nosql_spark.streaming.events import (
        read_events_stream,
        stage_event_files,
    )

    staged = stage_event_files(spark, sf_small, n_chunks=4)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            read_events_stream(spark, staged, files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    q = start()
    # let it commit at least one micro-batch, then kill it mid-run
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if any(p.numInputRows > 0 for p in q.recentProgress):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    partial = spark.read.parquet(out).count()

    # resume from the same checkpoint and drain the rest
    q2 = (
        read_events_stream(spark, staged, files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    src = spark.read.parquet(staged)
    back = spark.read.parquet(out)
    assert back.count() == src.count() >= partial
    # exactly-once: per-key multiplicity identical, not just counts
    assert (
        back.groupBy("event_id").count().filter(F.col("count") > 1).count()
        == 0
    )
    assert back.agg(F.sum("event_id")).collect()[0][0] == src.agg(
        F.sum("event_id")
    ).collect()[0][0]


def test_hwm_fold_is_chunk_invariant():
    """The fold must treat all chunks of one micro-batch against the
    PRIOR batches' mark: splitting a batch into chunks cannot change
    the result (regression: per-chunk hwm updates counted intra-batch
    exceedances)."""
    import pandas as pd

    from cricket_analytics_nosql_spark.streaming.stateful import _hwm_fold

    prior = (1, 5.0, 0, 3)  # seen, hwm=5, no records, 3 events
    whole = _hwm_fold(prior, [pd.DataFrame({"value": [6.0, 7.0, 4.0]})])
    split = _hwm_fold(
        prior,
        [
            pd.DataFrame({"value": [6.0]}),
            pd.DataFrame({"value": [7.0, 4.0]}),
        ],
    )
    assert whole == split == (1, 7.0, 2, 6)

    # first-ever batch: nothing exceeds (no prior mark), even across
    # chunks where chunk 1's max would otherwise become the bar
    first = _hwm_fold(
        (0, 0.0, 0, 0),
        [pd.DataFrame({"value": [3.0]}), pd.DataFrame({"value": [9.0]})],
    )
    assert first == (1, 9.0, 0, 2)


def test_ewma_stream_matches_sequential_python(spark, sf_small):
    """Batch↔stream parity for the EWMA state machine: the streaming
    fold across 4 replayed micro-batches must equal a pure-Python
    sequential fold over the full (ts, event_id)-ordered history —
    exact same recurrence, zero tolerance on the integer cents."""
    from cricket_analytics_nosql_spark.sources.tables import load_table
    from cricket_analytics_nosql_spark.streaming.stateful import (
        EWMA_ALPHA,
        stream_ewma_monitor,
    )

    got = {
        r.user_id: (r.n_events, r.ewma_c)
        for r in stream_ewma_monitor(spark, sf_small).collect()
    }
    rows = (
        load_table(spark, sf_small, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    hist: dict = {}
    for r in sorted(rows, key=lambda r: (r.ts, r.event_id)):
        hist.setdefault(r.user_id, []).append(r.value)
    want = {}
    for uid, xs in hist.items():
        y = 0.0
        for i, x in enumerate(xs):
            y = x if i == 0 else EWMA_ALPHA * x + (1 - EWMA_ALPHA) * y
        want[uid] = (len(xs), round(y * 100))
    assert got == want


def test_stream_cep_matches_batch_cep(spark, sf_small):
    """The drained streaming journey monitor must reproduce the batch
    CEP readout exactly — whole pattern counts, not just per-user
    fold values."""
    from cricket_analytics_nosql_spark.operators.sequences import (
        cep_funnel_pattern,
    )
    from cricket_analytics_nosql_spark.streaming.stateful import (
        stream_cep_monitor,
    )

    batch = cep_funnel_pattern(spark, sf_small).collect()
    stream = stream_cep_monitor(spark, sf_small).collect()
    assert batch == stream


def test_journey_fold_is_chunking_invariant(spark, sf_small):
    """Same journeys whether the stream arrives as 2 or 4 chunks —
    the fold must depend on event order only, never on micro-batch
    boundaries."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cricket_analytics_nosql_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        stage_event_files,
    )
    from cricket_analytics_nosql_spark.streaming.stateful import journey_stream

    def final_journeys(n_chunks):
        staged = stage_event_files(spark, sf_small, n_chunks=n_chunks)
        out = run_available_now(
            journey_stream(read_events_stream(spark, staged)), "update"
        )
        w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
        return {
            r.user_id: r.j
            for r in out.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        }

    assert final_journeys(2) == final_journeys(4)


def test_batch_stream_parity_histogram(spark, staged, events_batch):
    """The mergeable-histogram state drained from the stream must
    equal the one-shot batch histogram row-for-row — micro-batch
    state merges are exact integer addition."""
    from cricket_analytics_nosql_spark.streaming.events import (
        histogram_state,
    )

    stream_out = run_available_now(
        histogram_state(read_events_stream(spark, staged)), "complete"
    )
    batch_out = histogram_state(events_batch)
    cols = ["win_start", "bin", "n_events"]
    assert _rows(stream_out, *cols) == _rows(batch_out, *cols)


def test_batch_stream_parity_bitmap_distinct(spark, staged, events_batch):
    """Drained bitmap masks must popcount to countDistinct exactly —
    and doubling the stream (replay) must NOT change the result
    (idempotent bit_or state, where a count would double)."""
    from cricket_analytics_nosql_spark.streaming.events import bitmap_state

    masks = run_available_now(
        bitmap_state(read_events_stream(spark, staged)), "complete"
    )
    got = {
        r.event_type: r.n
        for r in masks.groupBy("event_type")
        .agg(F.sum(F.bit_count("mask")).alias("n"))
        .collect()
    }
    want = {
        r.event_type: r.n
        for r in events_batch.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want
    doubled = read_events_stream(spark, staged)
    doubled = doubled.unionByName(doubled)
    masks2 = run_available_now(bitmap_state(doubled), "complete")
    got2 = {
        r.event_type: r.n
        for r in masks2.groupBy("event_type")
        .agg(F.sum(F.bit_count("mask")).alias("n"))
        .collect()
    }
    assert got2 == want


def test_stream_wilson_brackets_rate(spark, sf_small):
    """Wilson bounds must bracket the point rate inside [0, 1] for
    every (window, variant) row — including the small early windows
    the interval exists for."""
    from cricket_analytics_nosql_spark.streaming.events import (
        stream_wilson_monitor,
    )

    rows = stream_wilson_monitor(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.purchase_rate <= r.wilson_hi <= 1.0
        assert {r.variant} <= {0, 1}


def test_stream_psi_nonnegative_and_scaled(spark, sf_small):
    """PSI is a sum of (p-q)ln(p/q) terms, each non-negative, so the
    per-window index must be ≥ 0 (micro-nat slack); the all-time
    mixture of the windows IS the reference, so windows can't all be
    wildly shifted — the minimum PSI must be small."""
    from cricket_analytics_nosql_spark.streaming.events import (
        stream_psi_monitor,
    )

    rows = stream_psi_monitor(spark, sf_small).collect()
    assert rows
    eps = 1e-4
    for r in rows:
        assert r.psi >= -eps
        assert r.n_events > 0
    assert min(r.psi for r in rows) < 0.5
