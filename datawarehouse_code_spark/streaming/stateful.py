"""Custom stateful streaming operator via applyInPandasWithState.

Beyond windowed aggregations (streaming/jobs.py), arbitrary per-key
state needs the applyInPandasWithState escape hatch: state lives in
the state store (checkpointed, partitioned by key), the user function
sees Arrow batches per key per micro-batch.

The shipped operator keeps per-user running totals across
micro-batches — the canonical shape for streaming feature
accumulation (user counters, rate trackers, dedup sets).

Scale notes: state is hash-partitioned by the grouping key across
executors and bounded by key cardinality, not history; at 10⁹ users
add a state TTL (GroupStateTimeout.ProcessingTimeTimeout) to evict
idle keys — wired through the `timeout` parameter here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_value DOUBLE"
STATE_SCHEMA = "n_events BIGINT, sum_value DOUBLE"


def _running_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_events, sum_value = state.get
    else:
        n_events, sum_value = 0, 0.0
    for pdf in pdfs:
        n_events += len(pdf)
        sum_value += float(pdf["value"].sum())
    state.update((n_events, sum_value))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n_events], "sum_value": [sum_value]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum(value)) maintained in the
    state store; emits the refreshed totals for every user seen in the
    micro-batch (update semantics)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUTPUT_SCHEMA = "user_id BIGINT, stage BIGINT, stage_ts_us BIGINT"
FUNNEL_STATE_SCHEMA = "stage BIGINT, stage_ts_us BIGINT"


def funnel_progress_stream(
    events: DataFrame, steps: list[str]
) -> DataFrame:
    """Streaming strict-order funnel: per-user furthest stage
    maintained in the state store, advanced by the same
    greedy-earliest rule as the batch operator
    (operators/sessions.funnel_counts) — an event advances the
    funnel iff it is the NEXT step and strictly later than the
    previous step's timestamp.  Emits (user_id, stage, stage_ts_us)
    only for users whose stage advanced in the micro-batch (update
    semantics); stage_ts_us is the advancing event's epoch-micros.

    Ordering contract (documented, tested): rows are sorted within
    each micro-batch, so intra-batch disorder is harmless, but an
    event arriving in a LATER batch than a same-user event with a
    greater timestamp cannot retroactively advance a stage the
    strict rule already refused — per-user in-order delivery across
    batches (a user-keyed log's natural guarantee) makes the stream
    equal the batch fold.  Under cross-batch disorder the streaming
    result is a conservative lower bound, never an overcount.

    Scale: state is two BIGINTs per user, hash-partitioned by
    user_id; at 10⁹ users add a ProcessingTimeTimeout TTL.
    """
    if len(steps) < 2 or len(set(steps)) != len(steps):
        raise ValueError(f"funnel needs >= 2 distinct steps: {steps!r}")
    idx_of = {s: i + 1 for i, s in enumerate(steps)}

    def _advance(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        stage, last_us = state.get if state.exists else (0, -1)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch["event_type"].isin(idx_of)]
        if len(batch):
            order = sorted(
                zip(
                    batch["ts_us"].tolist(),
                    batch["event_type"].map(idx_of).tolist(),
                )
            )
            advanced = False
            for ts_us, idx in order:
                if idx == stage + 1 and (stage == 0 or ts_us > last_us):
                    stage, last_us = idx, ts_us
                    advanced = True
            if advanced:
                state.update((stage, last_us))
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "stage": [stage],
                        "stage_ts_us": [last_us],
                    }
                )

    # epoch-micros computed JVM-side: the Arrow-transferred column is a
    # plain int64, so the Python side never guesses a datetime unit
    from pyspark.sql import functions as F

    # the cast accepts TIMESTAMP_NTZ sources too (parquet NTZ + UTC
    # session reads the same wall clock); NULL-ts rows are dropped —
    # a NaN would silently float-ify the int64 micros column in pandas
    return events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    ).groupBy("user_id").applyInPandasWithState(
        _advance,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id BIGINT, session_start_us BIGINT, session_end_us BIGINT, "
    "n_events BIGINT"
)
SESSION_STATE_SCHEMA = "start_us BIGINT, end_us BIGINT, n_events BIGINT"


def session_emit_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming sessionizer that emits each CLOSED session exactly
    once — the event-time-TIMEOUT pattern `F.session_window` cannot
    express (session_window re-emits updated aggregates; downstream
    consumers that act on a session, like writing a training example
    or firing a re-engagement job, need the one-shot close signal).

    Mechanics: per-user open-session state (start, end, n_events);
    batch events extend the open session or close it and open the
    next (gap-exceeded inside a batch emits immediately); the open
    session registers an event-time timeout at `end + gap`, so when
    the WATERMARK passes that point with no further activity the
    state-store timeout fires, the session emits, and the state is
    removed.  The timeout timestamp is clamped one ms above the
    current watermark (Spark rejects past timestamps; a user whose
    merged session already expired relative to the new watermark
    closes on the next no-data micro-batch instead of erroring).

    Equality contract (tested): under per-user in-order delivery the
    emitted sessions are exactly the batch gaps-and-islands sessions
    (operators/sessions.sessionize) whose `end + gap` the final
    watermark passed; still-open tail sessions stay in state, and
    nothing is ever emitted twice.

    Scale: three BIGINTs of state per ACTIVE user (closed sessions
    leave the store immediately via the timeout), hash-partitioned by
    user_id; the watermark is what bounds state, not history.
    """
    from pyspark.sql import functions as F

    gap_us = int(
        events.sparkSession.range(1)
        .select(
            F.unix_micros(
                F.lit("1970-01-01 00:00:00+00:00").cast("timestamp") + F.expr(f"INTERVAL {gap}")
            )
        )
        .first()[0]
    )

    def _sessions(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start_us],
                    "session_end_us": [end_us],
                    "n_events": [n],
                }
            )
            return
        cur = state.get if state.exists else None
        closed: list[tuple[int, int, int]] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        for ts_us in sorted(batch["ts_us"].tolist()):
            if cur is None:
                cur = (ts_us, ts_us, 1)
            elif ts_us <= cur[1] + gap_us:
                cur = (cur[0], max(cur[1], ts_us), cur[2] + 1)
            else:
                closed.append(cur)
                cur = (ts_us, ts_us, 1)
        state.update(cur)
        state.setTimeoutTimestamp(
            max(
                (cur[1] + gap_us) // 1000 + 1,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    # `events.ts` must be a true TIMESTAMP (read_events_stream's
    # contract — raw int64-nanos columns cast here would produce
    # year-294k timestamps that overflow the state worker's Arrow
    # ns conversion); the watermark column must remain in the
    # projection for EventTimeTimeout to resolve
    prepped = (
        events.filter(F.col("ts").isNotNull())
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "0 seconds")
        .select(
            "user_id",
            "ts",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _sessions,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
