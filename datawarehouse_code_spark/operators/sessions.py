"""Explicit sessionization: per-event session labels (gaps-and-islands).

`F.session_window` (plans/streaming_queries.py) aggregates directly to
one row per session, but hides the session identity — downstream work
that needs to JOIN events to their session (attribution, funnel
analysis, per-session feature extraction for an LLM behavioural
corpus) needs the label on every event.  This operator attaches it:

    session_seq = cumulative count of gap-breaks per key, in ts order

Reference parity: the reference engine (a batch MySQL loader) has no
sessionization; this covers the SURVEY.md §2.2 streaming/time-window
obligation's batch half alongside session_window.

Scale shape (100 TB): one shuffle on the session keys, one sort per
partition — both window passes (the `lag` and the running sum) share
the identical (partitionBy, orderBy) spec, so Catalyst collapses them
into a single Window node over a single exchange (plan-audited in
tests/test_scale_mechanics.py).  Per-key cost is O(n log n) local
sort; no global window, no pair explosion.  Under Structured
Streaming the same semantics come from session_window +
watermark (streaming/jobs.py) — this batch shape is for backfills
and for when the label itself must be materialized.

Determinism: ties on ts are broken by `tiebreak` (an unique column)
so `lag` sees one canonical order in every engine; the gap test uses
timestamp INTERVAL arithmetic (exact microseconds in both Spark and
DuckDB), never epoch-second truncation, so sub-second timestamps
cannot flip a session boundary between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap: str = "30 minutes",
    tiebreak: str | None = None,
) -> DataFrame:
    """Attach `session_seq` (1-based bigint, per key) to every row.

    A new session starts at the first row per key and whenever the
    gap since the previous row's `ts_col` strictly exceeds `gap`
    (a Spark INTERVAL literal, e.g. "30 minutes") — matching
    `F.session_window`'s inactivity-gap semantics.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}")),
        F.lit(1),
    ).otherwise(F.lit(0))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(is_new).over(cum))
