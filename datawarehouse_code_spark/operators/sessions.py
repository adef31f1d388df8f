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


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: for each step i, how many users performed
    steps[0..i] in timestamp order (each step STRICTLY after the
    previous — same-timestamp progress does not count, so engines
    agree on ties), plus the exact integer sum over those users of
    the microsecond lag from their funnel entry to the step
    (`sum_lag_us` — all-integer, so the oracle checks WHICH event
    completed each step, not just how many users got there).

    Single-pass shape, no per-step join cascade: filter to step events
    (pushed to the scan), ONE shuffle to group per user, sort each
    user's (ts, step_idx) list, and fold it with F.aggregate — a
    JVM-side lambda, no Python.  The fold records each step's
    EARLIEST valid completion time; greedy-earliest is optimal for
    strict-order funnels (taking an earlier occurrence never blocks a
    later step), so the result equals the iterated-min construction
    the DuckDB oracle uses.  Per-user state is the bounded list of
    step-typed events only — skew-safe for any realistic per-user
    cardinality; the rollup after the explode groups on ≤ k step
    ordinals.

    Steps with zero completers emit no row (GROUP BY semantics in
    both engines).

    No time-horizon parameter by design: with a "complete within T of
    the first step" bound, greedy-earliest is no longer optimal (a
    later funnel entry can succeed where the earliest entry's window
    expired), so a horizon needs per-entry re-scans — a different
    operator, not a flag on this one.
    """
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    idx_expr = F.lit(None).cast("int")
    for i, s in enumerate(reversed(steps)):
        idx_expr = F.when(
            F.col(type_col) == s, F.lit(len(steps) - i)
        ).otherwise(idx_expr)
    # NULL-ts rows are excluded up front: inside the fold a NULL
    # timestamp would satisfy the stage-0 branch (no prior-time
    # comparison), consume the funnel entry with t=NULL, and then
    # block every later comparison as NULL — a silent dead funnel.
    per_user = (
        events.filter(F.col(type_col).isin(steps) & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("u"),
            # cast at entry: TIMESTAMP_NTZ sources read the same wall
            # clock under the UTC session, and the fold's accumulator
            # is typed ARRAY<TIMESTAMP>
            F.struct(
                F.col(ts_col).cast("timestamp").alias("ts"),
                idx_expr.alias("idx"),
            ).alias("e"),
        )
        .groupBy("u")
        .agg(F.array_sort(F.collect_list("e")).alias("seq"))
    )
    # acc = timestamps of the steps completed so far (size = stage)
    reached = F.aggregate(
        "seq",
        F.expr("CAST(array() AS ARRAY<TIMESTAMP>)"),
        lambda acc, x: F.when(
            (x["idx"] == F.size(acc) + 1)
            & ((F.size(acc) == 0) | (x["ts"] > F.element_at(acc, -1))),
            F.concat(acc, F.array(x["ts"])),
        ).otherwise(acc),
    )
    exploded = (
        per_user.select(reached.alias("r"))
        .filter(F.size("r") > 0)
        .select(
            F.unix_micros(F.element_at("r", 1)).alias("t0"),
            F.posexplode("r").alias("pos", "t"),
        )
    )
    names = F.array(*[F.lit(s) for s in steps])
    return (
        exploded.groupBy((F.col("pos") + 1).alias("step"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.unix_micros("t") - F.col("t0")).alias("sum_lag_us"),
        )
        .select(
            "step",
            F.element_at(names, F.col("step").cast("int")).alias("step_name"),
            "n_users",
            "sum_lag_us",
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention — the second product-analytics staple beside
    funnel_counts: users are cohorted by the truncated `period`
    ("week" = Monday-start, or "day") in which they FIRST appeared;
    for each (cohort_week, week_offset), how many of them were
    active that period, with the cohort size alongside (all exact
    integers — consumers derive the retention fraction, so no float
    crosses the engine boundary).  Column names keep the week_*
    spelling for a stable schema across periods.

    Scale shape: first-seen is one groupBy on user; weekly activity
    is one distinct over (user, week) — both shuffles hash on
    user_col, so the activity⋈first-seen join arrives co-partitioned
    (no third shuffle of the big side).  The final rollup groups on
    (cohort, offset): thousands of rows at most.  The cohort size
    needs NO extra pass over events: every user is by definition
    active in their first period, so n_cohort IS the offset-0 cell's
    count — read off the rollup with a window (a re-aggregation of
    `firsts` would re-scan the source; Spark reuses exchanges, not
    arbitrary subplans).  Nothing here grows with raw event count
    except the two user-keyed passes.
    """
    divisors = {"week": 7, "day": 1}
    if period not in divisors:
        raise ValueError(f"period must be one of {sorted(divisors)}: {period!r}")
    # NULL-ts rows would form a NULL cohort/period cell; drop them
    events = events.filter(F.col(ts_col).isNotNull())
    firsts = events.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort_week")
    )
    activity = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc(period, F.col(ts_col)).alias("week"),
    ).distinct()
    per_cell = (
        activity.join(firsts, "u")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / divisors[period])
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = Window.partitionBy("cohort_week")
    n_cohort = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_users"))
    ).over(w)
    return per_cell.select(
        "cohort_week", "week_offset", "n_users", n_cohort.alias("n_cohort")
    )
