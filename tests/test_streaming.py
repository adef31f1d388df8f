"""Structured Streaming ≡ batch equivalence for the time-window plans.

The batch queries (plans/streaming_queries.py) and the streaming jobs
(streaming/jobs.py) share their aggregation expressions; this proves
the streaming wrapper produces the identical result set.
"""

from __future__ import annotations

import shutil

from datawarehouse_code_spark.plans.streaming_queries import (
    _events_session_window,
    _events_tumbling_10min,
)
from datawarehouse_code_spark.streaming.jobs import (
    read_events_stream,
    run_to_memory,
    session_counts_stream,
    tumbling_counts_stream,
)
from tests.conftest import SF_DIR


def _stream_dir(tmp_path):
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_tumbling_stream_equals_batch(spark, tmp_path):
    events = read_events_stream(spark, _stream_dir(tmp_path))
    run_to_memory(tumbling_counts_stream(events), "t_tumbling")
    got = sorted(spark.table("t_tumbling").collect())
    want = sorted(_events_tumbling_10min(spark, SF_DIR).collect())
    assert got == want
    assert len(got) > 0


def test_session_stream_equals_batch(spark, tmp_path):
    events = read_events_stream(spark, _stream_dir(tmp_path))
    run_to_memory(session_counts_stream(events), "t_session")
    got = sorted(spark.table("t_session").collect())
    want = sorted(_events_session_window(spark, SF_DIR).collect())
    assert got == want
    assert len(got) > 0
