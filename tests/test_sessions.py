"""Sessionization tests: boundary semantics, agreement with
F.session_window, and the single-exchange plan shape."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.sessions import sessionize
from datawarehouse_code_spark.sources.catalog import read_table
from tests.conftest import SF_DIR


def _mk(spark, rows):
    return spark.createDataFrame(
        [(u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), i)
         for i, (u, s) in enumerate(rows)],
        "user_id int, ts timestamp, event_id int",
    )


def test_sessionize_gap_boundary_is_strict(spark):
    """A gap EXACTLY equal to the threshold stays in the session (the
    break needs ts > prev + gap), matching session_window's
    inactivity-gap semantics; one microsecond more splits."""
    df = _mk(spark, [(1, 0), (1, 60), (1, 120)])
    out = sessionize(df, ["user_id"], "ts", gap="60 seconds", tiebreak="event_id")
    seqs = [r.session_seq for r in out.orderBy("event_id").collect()]
    assert seqs == [1, 1, 1]

    df2 = _mk(spark, [(1, 0), (1, 61)])
    out2 = sessionize(df2, ["user_id"], "ts", gap="60 seconds", tiebreak="event_id")
    assert [r.session_seq for r in out2.orderBy("event_id").collect()] == [1, 2]


def test_sessionize_per_key_independent(spark):
    """Session counters restart per key; simultaneous events in
    different keys never interact."""
    df = _mk(spark, [(1, 0), (2, 0), (1, 10_000), (2, 5)])
    out = sessionize(df, ["user_id"], "ts", gap="30 minutes", tiebreak="event_id")
    got = {(r.user_id, r.event_id): r.session_seq for r in out.collect()}
    assert got == {(1, 0): 1, (2, 1): 1, (1, 2): 2, (2, 3): 1}


def test_sessionize_agrees_with_session_window(spark):
    """Ground-truth cross-check on the real fixture: the number of
    sessions per user from explicit sessionization equals the number
    of session_window rows per user, and total event counts match."""
    events = read_table(spark, "events", SF_DIR)
    labelled = sessionize(events, ["user_id"], "ts", gap="30 minutes",
                          tiebreak="event_id")
    a = (
        labelled.groupBy("user_id")
        .agg(F.max("session_seq").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
    )
    b = (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"),
             F.sum("n").alias("n_events"))
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_sessionize_single_exchange_plan(spark):
    """Scale audit: the lag pass and the running-sum pass share one
    (partitionBy, orderBy) spec, so the executed plan must contain
    exactly ONE Exchange (the shuffle on user_id) — a second one
    would double the dominant cost at 100 TB."""
    events = read_table(spark, "events", SF_DIR)
    out = sessionize(events, ["user_id"], "ts", gap="30 minutes",
                     tiebreak="event_id")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 exchange, got {n_exchanges}:\n{plan}"
