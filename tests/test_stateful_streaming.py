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
