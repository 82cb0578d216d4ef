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


def stream_spike_monitor(spark, sf_dir: str) -> DataFrame:
    """Driver query for the custom stateful operator: replay the
    events table as a 4-chunk stream through
    ``applyInPandasWithState``, keep each user's final (update-mode)
    emission, and compare against a pure-SQL restatement of the same
    cross-batch semantics — the batch boundaries are the replay's
    time quartiles, so the oracle can reconstruct them from
    min/max(ts) alone. n_spikes_total is genuinely order-dependent
    state (events judged against the running mean *before their
    batch*), which no single groupBy could produce. The float
    running_mean itself is excluded from the driver surface (pandas
    incremental summation vs SQL SUM differ in the last ulp, which
    flaps a 6-decimal round) — it is pinned by the unit parity test
    instead; the integer state columns here are exact."""
    from cricket_analytics_nosql_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        stage_event_files,
    )
    from pyspark.sql import Window

    staged = stage_event_files(spark, sf_dir)
    out = run_available_now(
        spike_monitor_stream(read_events_stream(spark, staged)), "update"
    )
    # final state per user = the emission with the highest event
    # total (counts are strictly increasing across a user's batches)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events_total"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events_total", "n_spikes_total")
        .orderBy("user_id")
    )


# Batch boundaries: stage_event_files splits [lo, hi] into 4 spans of
# (hi-lo)/4. Python timedelta division is exact µs arithmetic, while
# DuckDB interval division splits the day and micro components
# separately (observed 6 h divergence) — so the oracle reconstructs
# the boundaries in epoch-microseconds. Dividing by 4 is exact in
# binary floating point, so ROUND sees the same quotient Python does.
ORACLE_STREAM_SPIKE_MONITOR = """
WITH bounds AS (
  SELECT epoch_us(MIN(ts)) AS lo_us,
         CAST(ROUND((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 4.0) AS BIGINT)
           AS span_us
  FROM events
),
ev AS (
  SELECT user_id, value,
         CASE WHEN epoch_us(ts) >= lo_us + span_us * 3 THEN 3
              WHEN epoch_us(ts) >= lo_us + span_us * 2 THEN 2
              WHEN epoch_us(ts) >= lo_us + span_us     THEN 1
              ELSE 0 END AS batch
  FROM events, bounds
),
prior AS (
  SELECT user_id, value,
         COUNT(*) OVER w AS cnt_b,
         SUM(value) OVER w AS sum_b
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY batch
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
spk AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE cnt_b > 0 AND value > 3.0 * (sum_b / cnt_b))
           AS n_spikes
  FROM prior GROUP BY user_id
),
totals AS (
  SELECT user_id, COUNT(*) AS n_events_total FROM events GROUP BY user_id
)
SELECT t.user_id, t.n_events_total,
       COALESCE(s.n_spikes, 0) AS n_spikes_total
FROM totals t LEFT JOIN spk s USING (user_id)
ORDER BY t.user_id
"""


# ---------------------------------------------------------------------------
# transformWithState (Spark 4's arbitrary-state API, the successor to
# applyInPandasWithState): typed state handles (ValueState/ListState/
# MapState), timers, and TTL — the engine surface a long-running 100 TB
# keyed monitor migrates to. Operator: per-user HIGH-WATER MARK —
# count events that exceed the user's max value from all PRIOR
# micro-batches (batch-granular, so intra-batch order can't matter),
# track the running max. State is one fixed-size ValueState row per
# user; no sums of floats anywhere (max is exact), so every output
# column is driver-oracle-safe including the double hwm.
#
# ENVIRONMENT GATE: the transformWithState Python worker speaks a
# protobuf protocol to the JVM state server, so it needs the
# `protobuf` package at runtime. Where that's absent (this container)
# the SAME kernel runs through applyInPandasWithState — identical
# semantics, columns, and oracle; `HAVE_TWS_PROTO` selects the API.
# ---------------------------------------------------------------------------

try:  # capability probe, not a version check — mirrors multimodal.HAVE_PIL
    import google.protobuf  # noqa: F401

    HAVE_TWS_PROTO = True
except ImportError:
    HAVE_TWS_PROTO = False

HWM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_total", T.LongType()),
        T.StructField("n_hwm_records", T.LongType()),
        T.StructField("hwm", T.DoubleType()),
    ]
)

HWM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.LongType()),
        T.StructField("hwm", T.DoubleType()),
        T.StructField("n_rec", T.LongType()),
        T.StructField("n_ev", T.LongType()),
    ]
)


def _hwm_fold(
    state: tuple, batches: Iterable[pd.DataFrame]
) -> tuple:
    """The ONE high-water-mark kernel, shared by both state APIs.

    All of a micro-batch's chunks are folded against the PRIOR
    batches' hwm before the mark moves: Arrow splits a large per-key
    batch into several pandas chunks (default 10k rows), and
    updating hwm per chunk would silently count *intra*-batch
    exceedances — diverging from the prior-batch-max semantics the
    oracle's `RANGE ... 1 PRECEDING` window states, with the answer
    depending on chunk boundaries."""
    seen, hwm, n_rec, n_ev = state
    batch_max = None
    batch_n = 0
    batch_exceed = 0
    for pdf in batches:
        vals = pdf["value"]
        if len(vals) == 0:
            continue
        if seen:
            batch_exceed += int((vals > hwm).sum())
        mx = float(vals.max())
        batch_max = mx if (batch_max is None or mx > batch_max) else batch_max
        batch_n += len(vals)
    if batch_n:
        n_rec += batch_exceed
        hwm = batch_max if (not seen or batch_max > hwm) else hwm
        seen = 1
        n_ev += batch_n
    return seen, hwm, n_rec, n_ev


def _hwm_emit(key: tuple, state: tuple) -> pd.DataFrame:
    seen, hwm, n_rec, n_ev = state
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events_total": [n_ev],
            "n_hwm_records": [n_rec],
            "hwm": [hwm],
        }
    )


def _make_hwm_processor():
    from pyspark.sql.streaming import StatefulProcessor

    class HwmProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("hwm", HWM_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            prior = (
                tuple(self._state.get())
                if self._state.exists()
                else (0, 0.0, 0, 0)
            )
            state = _hwm_fold(prior, rows)
            self._state.update(state)
            yield _hwm_emit(key, state)

        def close(self) -> None:
            pass

    return HwmProcessor()


def _hwm_update_legacy(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """The same ``_hwm_fold`` kernel on the GroupState API — one
    shared fold, two thin API wrappers."""
    prior = tuple(state.get) if state.exists else (0, 0.0, 0, 0)
    new = _hwm_fold(prior, batches)
    state.update(new)
    yield _hwm_emit(key, new)


def hwm_monitor_stream(events: DataFrame) -> DataFrame:
    """Streaming form — ``transformWithStateInPandas`` when the
    protobuf runtime is present, the same kernel through
    ``applyInPandasWithState`` otherwise. One update-mode row per
    (user, micro-batch) with totals as of that batch."""
    keyed = events.select("user_id", "value").groupBy("user_id")
    if HAVE_TWS_PROTO:
        return keyed.transformWithStateInPandas(
            _make_hwm_processor(),
            outputStructType=HWM_OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    return keyed.applyInPandasWithState(
        _hwm_update_legacy,
        outputStructType=HWM_OUTPUT_SCHEMA,
        stateStructType=HWM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_hwm_monitor(spark, sf_dir: str) -> DataFrame:
    """Driver query for the transformWithState surface: replay the
    events table as a 4-chunk stream, keep each user's final
    emission, compare against the SQL restatement (prior-batch MAX
    window). Exactly the spike monitor's harness, different state
    API and a max-state kernel whose float column is exact."""
    from cricket_analytics_nosql_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        stage_event_files,
    )
    from pyspark.sql import Window

    staged = stage_event_files(spark, sf_dir)
    out = run_available_now(
        hwm_monitor_stream(read_events_stream(spark, staged)), "update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events_total"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events_total", "n_hwm_records", "hwm")
        .orderBy("user_id")
    )


ORACLE_STREAM_HWM_MONITOR = """
WITH bounds AS (
  SELECT epoch_us(MIN(ts)) AS lo_us,
         CAST(ROUND((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 4.0) AS BIGINT)
           AS span_us
  FROM events
),
ev AS (
  SELECT user_id, value,
         CASE WHEN epoch_us(ts) >= lo_us + span_us * 3 THEN 3
              WHEN epoch_us(ts) >= lo_us + span_us * 2 THEN 2
              WHEN epoch_us(ts) >= lo_us + span_us     THEN 1
              ELSE 0 END AS batch
  FROM events, bounds
),
prior AS (
  SELECT user_id, value,
         MAX(value) OVER w AS mx_b
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY batch
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
rec AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE mx_b IS NOT NULL AND value > mx_b)
           AS n_hwm
  FROM prior GROUP BY user_id
),
totals AS (
  SELECT user_id, COUNT(*) AS n_events_total, MAX(value) AS hwm
  FROM events GROUP BY user_id
)
SELECT t.user_id, t.n_events_total,
       COALESCE(r.n_hwm, 0) AS n_hwm_records,
       t.hwm
FROM totals t LEFT JOIN rec r USING (user_id)
ORDER BY t.user_id
"""


from cricket_analytics_nosql_spark.operators.sequences import (  # noqa: E402
    ORACLE_CEP_FUNNEL,
    ORACLE_EVENT_TRANSITION,
)
from cricket_analytics_nosql_spark.operators.spec import QuerySpec  # noqa: E402

# --------------------------------------------------------------------------
# EWMA monitor — sequentially-recursive numeric state

EWMA_ALPHA = 0.2

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma_c", T.LongType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("y", T.DoubleType()),
    ]
)


def _update_ewma(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
    alpha: float,
) -> Iterator[pd.DataFrame]:
    """Per-key EWMA fold: y := alpha*x + (1-alpha)*y in (ts,
    event_id) order — the genuinely SEQUENTIAL recurrence no window
    aggregate expresses (each value's weight depends on how many
    events FOLLOW it).  State is two scalars per user.  The explicit
    per-row loop is fine here because per-(key, batch) row counts
    are micro-batch-sized; swap in scipy.signal.lfilter for wide
    keys — the recurrence is a linear filter."""
    (n, y) = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        for x in pdf.sort_values(["ts", "event_id"])["value"]:
            y = float(x) if n == 0 else alpha * float(x) + (1 - alpha) * y
            n += 1
    state.update((n, y))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "ewma_c": [round(y * 100)],
        }
    )


def ewma_stream(events: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """Streaming form: per-user EWMA of ``value`` maintained across
    micro-batches, one update-mode emission per (user, batch)."""

    def fn(key, pdfs, state):
        return _update_ewma(key, pdfs, state, alpha)

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_ewma_monitor(spark, sf_dir: str) -> DataFrame:
    """Driver query: replay events as a 4-chunk stream through the
    EWMA state machine and keep each user's final emission.  Unlike
    most stateful streaming ops this one IS exactly oracle-checkable:
    the sequential fold has the closed form
    ``y_n = (1-a)^(n-1) x_1 + a * sum_i (1-a)^(n-i) x_i``, which the
    oracle restates per user with one window pass — cross-engine
    float drift between the fold and the closed-form sum is ~1e-12
    relative, far inside the cent rounding."""
    from pyspark.sql import Window

    from cricket_analytics_nosql_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        stage_event_files,
    )

    staged = stage_event_files(spark, sf_dir)
    out = run_available_now(
        ewma_stream(read_events_stream(spark, staged)), "update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "ewma_c")
        .orderBy("user_id")
    )


ORACLE_STREAM_EWMA = f"""
WITH ordered AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(ROUND(100 * SUM(
         CASE WHEN rn = 1 THEN pow(1 - {EWMA_ALPHA}, n - 1) * value
              ELSE {EWMA_ALPHA} * pow(1 - {EWMA_ALPHA}, n - rn) * value
         END)) AS BIGINT) AS ewma_c
FROM ordered GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Streaming CEP: per-user journey accumulation + pattern match
# ---------------------------------------------------------------------------

JOURNEY_CAP = 4096  # state-bound guard; max events/user is 99 at sf0.1

JOURNEY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("j", T.StringType()),
    ]
)

JOURNEY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("j", T.StringType()),
    ]
)


def _update_journey(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user journey fold: append each micro-batch's event codes
    in (ts, event_id) order. Correct because the replay stages
    chunks time-ordered (every event in batch k precedes batch k+1 —
    the same contract the EWMA fold relies on), so intra-batch sort +
    append reconstructs the global order. State is one bounded
    string per user (``JOURNEY_CAP`` guards pathological keys; the
    cap truncates the TAIL, so prefix-anchored patterns stay exact
    for any user under the cap — all of them at tested scales)."""
    (n, j) = state.get if state.exists else (0, "")
    for pdf in batches:
        codes = (
            pdf.sort_values(["ts", "event_id"])["event_type"]
            .str[:1]
            .str.upper()
        )
        j = (j + "".join(codes))[:JOURNEY_CAP]
        n += len(pdf)
    state.update((n, j))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "j": [j]})


def journey_stream(events: DataFrame) -> DataFrame:
    """Streaming CEP accumulator: per-user journey strings maintained
    across micro-batches (update mode, one emission per user per
    batch)."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_journey,
            outputStructType=JOURNEY_OUTPUT_SCHEMA,
            stateStructType=JOURNEY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_cep_monitor(spark, sf_dir: str) -> DataFrame:
    """Streaming complex-event-processing: the Flink-CEP shape —
    per-key pattern state maintained incrementally over an unbounded
    stream — built from ``applyInPandasWithState`` journey
    accumulation plus the SAME regex episode predicates as the batch
    ``cep_funnel_pattern``. Replays the 4-chunk event stream, keeps
    each user's final journey emission, and aggregates the pattern
    counts — which must equal the batch answer exactly, so the
    oracle is the batch query's SQL verbatim (the strongest
    batch↔stream parity statement in the streaming suite: not one
    fold value per user, the whole pattern readout).

    Scale: state is one bounded string per active user; at 100 TB
    add a state timeout for churned users and emit pattern flags
    per batch instead of draining to a final readout — same fold,
    same predicates."""
    from pyspark.sql import Window

    from cricket_analytics_nosql_spark.operators.sequences import (
        pattern_counts_from_journeys,
    )
    from cricket_analytics_nosql_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        stage_event_files,
    )

    staged = stage_event_files(spark, sf_dir)
    out = run_available_now(
        journey_stream(read_events_stream(spark, staged)), "update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "j")
    )
    return pattern_counts_from_journeys(final)


# ---------------------------------------------------------------------------
# Streaming Markov transition monitor (per-user last-event state)
# ---------------------------------------------------------------------------

TRANSITION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("prev_type", T.StringType()),
        T.StructField("next_type", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)

TRANSITION_STATE_SCHEMA = T.StructType(
    [T.StructField("last_type", T.StringType())]
)


def _update_transitions(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user transition fold: carry the LAST event type across
    micro-batches, count (prev → next) pairs inside each batch in
    (ts, event_id) order, and emit the batch's count DELTAS (the
    final readout sums them). Same ordering contract as the journey
    fold: chunks replay time-ordered, so intra-batch sort + the
    carried boundary event reconstructs the global sequence. State
    is ONE string per user — the smallest possible keyed state."""
    (last,) = state.get if state.exists else (None,)
    frames = []
    for pdf in batches:
        seq = pdf.sort_values(["ts", "event_id"])["event_type"].tolist()
        if not seq:
            continue
        chain = ([last] if last is not None else []) + seq
        last = chain[-1]
        pairs = pd.DataFrame(
            {"prev_type": chain[:-1], "next_type": chain[1:]}
        )
        if len(pairs):
            frames.append(
                pairs.groupby(["prev_type", "next_type"], as_index=False)
                .size()
                .rename(columns={"size": "n"})
            )
    state.update((last,))
    if frames:
        out = (
            pd.concat(frames)
            .groupby(["prev_type", "next_type"], as_index=False)
            .agg({"n": "sum"})
        )
        yield out


def stream_transition_monitor(spark, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch ``event_transition_probs``: the
    Markov transition matrix maintained incrementally — per-user
    boundary state carries the last event type across micro-batches
    so batch-edge transitions are never lost. Drains the 4-chunk
    replay, sums the per-batch count deltas, and normalizes exactly
    like the batch query; the oracle is the batch SQL verbatim
    (full-matrix batch↔stream parity, the stream_cep_monitor
    contract).

    Scale: emissions are |types|²-sized deltas per user-batch and
    the final rollup is matrix-sized; add a state timeout for
    churned users at real depth — the fold is unchanged."""
    from pyspark.sql import Window

    from cricket_analytics_nosql_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        stage_event_files,
    )

    staged = stage_event_files(spark, sf_dir)
    deltas = run_available_now(
        read_events_stream(spark, staged)
        .select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=TRANSITION_OUTPUT_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        ),
        "update",
    )
    trans = deltas.groupBy("prev_type", "next_type").agg(
        F.sum("n").alias("n")
    )
    w_tot = Window.partitionBy("prev_type")
    return (
        trans.withColumn("row_total", F.sum("n").over(w_tot))
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("row_total").cast("double"),
                6,
            ).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


QUERIES: dict[str, QuerySpec] = {
    "stream_transition_monitor": QuerySpec(
        stream_transition_monitor,
        # batch↔stream parity IS the oracle: summed streaming deltas
        # must rebuild the batch transition matrix bit-for-bit
        ORACLE_EVENT_TRANSITION,
        ["§2.11", "§2.12", "X-ts"],
    ),
    "stream_cep_monitor": QuerySpec(
        stream_cep_monitor,
        # batch↔stream parity IS the oracle: the drained stream must
        # reproduce the batch CEP readout bit-for-bit
        ORACLE_CEP_FUNNEL,
        ["§2.11", "§2.12", "X-ts"],
    ),
    "stream_ewma_monitor": QuerySpec(
        stream_ewma_monitor, ORACLE_STREAM_EWMA, ["§2.11", "§2.12", "X-ts"]
    ),
    "stream_spike_monitor": QuerySpec(
        stream_spike_monitor, ORACLE_STREAM_SPIKE_MONITOR, ["§2.11", "§2.12"]
    ),
    "stream_hwm_monitor": QuerySpec(
        stream_hwm_monitor, ORACLE_STREAM_HWM_MONITOR, ["§2.11", "§2.12"]
    ),
}
