"""applyInPandasWithState: state must carry across micro-batches.

The input is split into two files processed one per micro-batch
(maxFilesPerTrigger=1), so each user's final update must equal the
batch aggregate over BOTH halves — proving the state store actually
accumulated, not just per-batch aggregation.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datawarehouse_code_spark.sources.catalog import read_table
from datawarehouse_code_spark.streaming.jobs import read_events_stream
from datawarehouse_code_spark.streaming.stateful import user_running_totals
from tests.conftest import SF_DIR


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    src = str(tmp_path / "events_split")
    events = read_table(spark, "events", SF_DIR)
    # two physical files -> two micro-batches under maxFilesPerTrigger=1
    half1 = events.filter(F.col("event_id") % 2 == 0).coalesce(1)
    half2 = events.filter(F.col("event_id") % 2 == 1).coalesce(1)
    half1.write.mode("overwrite").parquet(src)
    half2.write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    totals = user_running_totals(stream)
    q = (
        totals.writeStream.format("memory")
        .queryName("t_running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last update per user = the accumulated total
    got = {}
    for r in spark.table("t_running").collect():
        prev = got.get(r["user_id"])
        if prev is None or r["n_events"] > prev[0]:
            got[r["user_id"]] = (r["n_events"], r["sum_value"])

    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, s) in want.items():
        gn, gs = got[uid]
        assert gn == n, f"user {uid}: {gn} != {n}"
        assert math.isclose(gs, s, rel_tol=1e-9), f"user {uid}: {gs} != {s}"
    # state genuinely crossed batches: at least one user appears twice
    from collections import Counter

    seen = Counter(r["user_id"] for r in spark.table("t_running").collect())
    assert any(c >= 2 for c in seen.values())


def test_funnel_progress_stream_equals_batch_fold(spark, tmp_path):
    """Streamed funnel stages (two ordered micro-batches, per-user
    in-order across them) must equal the batch greedy fold over all
    events; intra-batch disorder must not matter; and stages only
    ever advance across updates."""
    from datawarehouse_code_spark.streaming.stateful import (
        funnel_progress_stream,
    )

    steps = ["view", "click", "signup", "purchase"]
    events = read_table(spark, "events", SF_DIR)
    cut = events.selectExpr("timestamp '2024-01-15 00:00:00' AS c").head()["c"]
    # time-split halves: per-user in-order ACROSS batches by
    # construction; shuffled within each file (ordering contract says
    # intra-batch disorder is fine)
    src = str(tmp_path / "events_time_split")
    (events.filter(F.col("ts") < F.lit(cut)).orderBy(F.rand(7)).coalesce(1)
     .write.mode("overwrite").parquet(src))
    (events.filter(F.col("ts") >= F.lit(cut)).orderBy(F.rand(8)).coalesce(1)
     .write.mode("append").parquet(src))

    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        funnel_progress_stream(stream, steps)
        .writeStream.format("memory")
        .queryName("t_funnel")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    updates = spark.table("t_funnel").collect()
    got = {}
    for r in updates:
        prev = got.get(r["user_id"], 0)
        assert r["stage"] >= prev, "stage regressed across updates"
        got[r["user_id"]] = max(prev, r["stage"])

    # batch truth: greedy fold in plain Python over all events
    idx_of = {s: i + 1 for i, s in enumerate(steps)}
    rows = events.filter(F.col("event_type").isin(steps)).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_type",
    ).collect()
    per_user: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["us"], idx_of[r["event_type"]])
        )
    want = {}
    for uid, evs in per_user.items():
        stage, last = 0, -1
        for us, idx in sorted(evs):
            if idx == stage + 1 and (stage == 0 or us > last):
                stage, last = idx, us
        if stage > 0:
            want[uid] = stage
    assert got == want and got


def test_session_emit_stream_closes_once_and_matches_batch(spark, tmp_path):
    """Event-time-timeout sessionizer: closed sessions emitted exactly
    once and byte-equal to the batch gaps-and-islands sessions; tail
    sessions the watermark never passed stay unemitted (and only
    those)."""
    from datawarehouse_code_spark.operators.sessions import sessionize
    from datawarehouse_code_spark.streaming.stateful import session_emit_stream

    src = str(tmp_path / "events_split")
    events = read_table(spark, "events", SF_DIR).filter(
        F.col("ts").isNotNull()
    )
    cut = "2024-01-20 00:00:00"
    events.filter(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    events.filter(F.col("ts") >= cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = (
        session_emit_stream(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_rows = spark.table("t_sessions").collect()
    got = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in got_rows
    }
    assert len(got) == len(got_rows), "a session was emitted twice"

    labelled = sessionize(
        events, ["user_id"], "ts", gap="30 minutes", tiebreak="event_id"
    )
    batch = {
        (
            r["user_id"],
            r["s"],
            r["e"],
            r["n"],
        )
        for r in labelled.groupBy("user_id", "session_seq")
        .agg(
            F.unix_micros(F.min("ts").cast("timestamp")).alias("s"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got <= batch, "stream emitted a session batch never saw"
    # everything the final watermark passed must have been emitted:
    # the watermark ends at the max event time (0s delay), so every
    # session with end + gap < max_ts is closed
    max_us = events.select(
        F.unix_micros(F.max("ts").cast("timestamp"))
    ).first()[0]
    gap_us = 30 * 60 * 1_000_000
    must_close = {s for s in batch if s[2] + gap_us < max_us - 1_000_000}
    missing = must_close - got
    assert not missing, f"{len(missing)} expired sessions never emitted"
    assert len(got) >= len(must_close) > 0
