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


def _steps_idx_expr(steps: list[str], type_col: str):
    """1-based step ordinal for a step-typed event, NULL otherwise."""
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    idx_expr = F.lit(None).cast("int")
    for i, s in enumerate(reversed(steps)):
        idx_expr = F.when(
            F.col(type_col) == s, F.lit(len(steps) - i)
        ).otherwise(idx_expr)
    return idx_expr


def _cap_user_events(df: DataFrame, cap: int | None) -> DataFrame:
    """Loud per-user state guard for the funnel folds (expects the
    user key aliased to `u`).

    The per-user `collect_list` downstream is bounded by the number
    of STEP-TYPED events per user — fine for any organic user, but a
    bot/integration user emitting 10⁷ step events at 100× scale would
    build a 10⁷-struct array inside one aggregation buffer (executor
    OOM with no attributable error).  This guard counts per user with
    a window BEFORE any array exists (the filter_posting_keys
    pattern, operators/text.py) and raises a `max_events_per_user`
    error NAMING the hot user, so the failure mode is an explicit,
    actionable job error instead of a memory death.  The window
    partitions on the same key the groupBy hashes on, so Catalyst
    reuses the exchange: still exactly one shuffle (plan-pinned in
    tests/test_sessions.py).
    """
    if cap is None:
        return df
    w = Window.partitionBy("u")
    guard = F.when(
        F.col("_n_u") > cap,
        F.raise_error(
            F.concat(
                F.lit(
                    f"funnel per-user event cap exceeded (max_events_per_user={cap}): user="
                ),
                F.col("u").cast("string"),
                F.lit(" has n="),
                F.col("_n_u").cast("string"),
                F.lit(" step events; cap or pre-filter this key"),
            )
        ),
    ).otherwise(F.lit(True))
    return (
        df.withColumn("_n_u", F.count(F.lit(1)).over(w))
        .filter(guard)
        .drop("_n_u")
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events_per_user: int | None = None,
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
    expired), so a horizon needs per-entry re-scans — that operator is
    `funnel_counts_horizon` below, not a flag on this one.

    `max_events_per_user` (optional): raise — naming the user — if any
    user has more step-typed events than the cap, instead of building
    an unbounded per-user array (see _cap_user_events).
    """
    idx_expr = _steps_idx_expr(steps, type_col)
    # NULL-ts rows are excluded up front: inside the fold a NULL
    # timestamp would satisfy the stage-0 branch (no prior-time
    # comparison), consume the funnel entry with t=NULL, and then
    # block every later comparison as NULL — a silent dead funnel.
    per_user = (
        _cap_user_events(
            events.filter(
                F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()
            ).select(
                F.col(user_col).alias("u"),
                # cast at entry: TIMESTAMP_NTZ sources read the same wall
                # clock under the UTC session, and the fold's accumulator
                # is typed ARRAY<TIMESTAMP>
                F.struct(
                    F.col(ts_col).cast("timestamp").alias("ts"),
                    idx_expr.alias("idx"),
                ).alias("e"),
            ),
            max_events_per_user,
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


def funnel_counts_horizon(
    events: DataFrame,
    steps: list[str],
    horizon: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Strict-order funnel with a completion time-horizon: step i
    counts only if it happens strictly after step i-1 AND within
    `horizon` (a Spark INTERVAL literal, e.g. "1 day") of the funnel
    ENTRY (the step-1 event that opened this attempt).

    Why this is a separate operator from `funnel_counts`: under a
    horizon, greedy-earliest over one global pass is no longer
    optimal — the earliest entry's window can expire while a LATER
    entry completes the funnel, so every entry must be retried.  The
    shape stays one shuffle: group step events per user, sort once,
    then for EACH entry (step-1 occurrence) run the same greedy fold
    restricted to (entry_ts, entry_ts + horizon] — greedy-earliest IS
    optimal once the entry is fixed, because the deadline is measured
    from the entry, not per-step.  A user's credited attempt is the
    entry reaching the deepest step; ties take the EARLIEST entry.
    Both bounds are deterministic: strictly-after on the previous
    step, inclusive `<= entry + horizon` on the deadline (boundary
    pinned in tests/test_sessions.py).

    Output: (step, step_name, n_users, sum_lag_us) like
    funnel_counts, where sum_lag_us sums the microsecond lag from the
    credited entry — so the oracle checks WHICH entry and WHICH events
    completed each step, not just counts.

    Scale shape (100 TB): identical partitioning to funnel_counts —
    filter pushed to the scan, ONE shuffle on user, everything after
    is a JVM-side nested higher-order fold (transform over entries ×
    aggregate over the sorted array, no Python).  Per-user cost is
    O(entries × step_events): quadratic in the per-user STEP-event
    count only, which `max_events_per_user` bounds loudly — at any
    organic per-user cardinality (tens to thousands) this is
    microseconds; the rollup after the explode groups on ≤ k step
    ordinals.  Reference parity: none (reference is a MySQL batch
    loader, warehouse.py:1-314); this is the SURVEY §2.2 analytics
    extension the round-6 verdict scoped.
    """
    idx_expr = _steps_idx_expr(steps, type_col)
    per_user = (
        _cap_user_events(
            events.filter(
                F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()
            ).select(
                F.col(user_col).alias("u"),
                F.struct(
                    F.col(ts_col).cast("timestamp").alias("ts"),
                    idx_expr.alias("idx"),
                ).alias("e"),
            ),
            max_events_per_user,
        )
        .groupBy("u")
        .agg(F.array_sort(F.collect_list("e")).alias("seq"))
    )
    deadline_of = lambda entry_ts: entry_ts + F.expr(f"INTERVAL {horizon}")
    # one fold per entry: stage 1 is the entry itself; each later step
    # must be strictly after the previous AND inside the entry's window
    attempts = F.transform(
        F.filter("seq", lambda x: x["idx"] == 1),
        lambda e: F.aggregate(
            F.col("seq"),
            F.array(e["ts"]),
            lambda acc, x: F.when(
                (x["idx"] == F.size(acc) + 1)
                & (x["ts"] > F.element_at(acc, -1))
                & (x["ts"] <= deadline_of(e["ts"])),
                F.concat(acc, F.array(x["ts"])),
            ).otherwise(acc),
        ),
    )
    # deepest attempt wins; strict > keeps the EARLIEST entry on ties
    # (entries are in ascending ts order after the sort)
    best = F.aggregate(
        attempts,
        F.expr("CAST(array() AS ARRAY<TIMESTAMP>)"),
        lambda b, c: F.when(F.size(c) > F.size(b), c).otherwise(b),
    )
    exploded = (
        per_user.select(best.alias("r"))
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


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str | None = None,
) -> DataFrame:
    """First-order journey analysis: how often does event type A
    immediately precede event type B within a user's timeline — the
    empirical Markov transition table behind "what do users do after
    X" product questions and next-event features for behavioural
    models.

    Output: (prev_type, next_type, n_transitions, p_bp) where p_bp =
    integer basis points of prev_type's outgoing transitions
    (div(n·10⁴, total) — integer division in both engines, so no
    float crosses the oracle boundary).

    Scale shape: ONE shuffle (the lag window on user), then a
    rollup on (prev, next) — at most |types|² rows — and a window
    over prev on that tiny table.  Ties on ts are ordered by
    `tiebreak` for a deterministic sequence.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = F.sum("n_transitions").over(Window.partitionBy("prev_type"))
    return (
        counts.withColumn("_tot", tot)
        .withColumn("p_bp", F.expr("(n_transitions * 10000) div _tot"))
        .drop("_tot")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention — the second product-analytics staple beside
    funnel_counts: users are cohorted by the truncated `period`
    ("week" = Monday-start, "day", or "month") in which they FIRST
    appeared;
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
    divisors = {"week": 7, "day": 1, "month": None}
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
    if period == "month":
        # months are not a fixed number of days, so the datediff trick
        # breaks (a Jan-31 first-seen truncates to Jan-1; Feb activity
        # must be offset 1 regardless of the 28/29/30/31-day gap).
        # months_between on two month-start timestamps is exact whole
        # months, so the int cast is lossless.
        offset = F.months_between("week", "cohort_week").cast("int")
    else:
        offset = (
            F.datediff("week", "cohort_week") / divisors[period]
        ).cast("int")
    per_cell = (
        activity.join(firsts, "u")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = Window.partitionBy("cohort_week")
    n_cohort = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_users"))
    ).over(w)
    return per_cell.select(
        "cohort_week", "week_offset", "n_users", n_cohort.alias("n_cohort")
    )
