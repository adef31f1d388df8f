"""Time-series resample + gap fill (operators/timeseries.py):
crafted gaps, both fill modes, the off-grid loudness guard, and the
span cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.timeseries import (
    gap_fill,
    resample,
    resample_buckets,
)


def _buckets(spark, rows):
    df = spark.createDataFrame(rows, "k string, bucket string, v double")
    return df.withColumn("bucket", F.col("bucket").cast("timestamp"))


def test_gap_fill_constant_and_ffill(spark):
    """Three observed days with a two-day hole: the hole appears with
    the constant fill on one column and the carried-forward value on
    the other; bounds are per key."""
    b = _buckets(spark, [
        ("a", "2024-01-01 00:00:00", 1.0),
        ("a", "2024-01-04 00:00:00", 4.0),
        ("b", "2024-01-02 00:00:00", 2.0),
    ]).withColumn("w", F.col("v"))
    out = gap_fill(b, ["k"], "bucket", "1 day", {"v": 0.0, "w": "ffill"})
    got = {
        (r["k"], str(r["bucket"])): (r["v"], r["w"])
        for r in out.collect()
    }
    assert got == {
        ("a", "2024-01-01 00:00:00"): (1.0, 1.0),
        ("a", "2024-01-02 00:00:00"): (0.0, 1.0),   # gap: const vs ffill
        ("a", "2024-01-03 00:00:00"): (0.0, 1.0),
        ("a", "2024-01-04 00:00:00"): (4.0, 4.0),
        ("b", "2024-01-02 00:00:00"): (2.0, 2.0),   # single-point key
    }


def test_gap_fill_off_grid_bucket_raises(spark):
    """A bucket off the step grid would silently vanish from a left
    join; the full-outer marker turns it into a loud error naming
    the bucket."""
    b = _buckets(spark, [
        ("a", "2024-01-01 00:00:00", 1.0),
        ("a", "2024-01-02 12:00:00", 2.0),  # not on the 1-day grid
    ])
    with pytest.raises(Exception, match="off the '1 day' grid"):
        gap_fill(b, ["k"], "bucket", "1 day", {"v": 0.0}).collect()


def test_gap_fill_span_cap_raises(spark):
    """A key whose span would explode the spine (timestamp-glitch
    sensor) raises naming the key instead of materializing it."""
    b = _buckets(spark, [
        ("glitch", "1970-01-01 00:00:00", 1.0),
        ("glitch", "2024-01-01 00:00:00", 2.0),
    ])
    with pytest.raises(Exception, match="max_buckets_per_key.*glitch"):
        gap_fill(
            b, ["k"], "bucket", "1 day", {"v": 0.0},
            max_buckets_per_key=1000,
        ).collect()


def test_resample_end_to_end_minutes(spark):
    """Sub-daily grain: 15-minute buckets from raw events, count
    filled with 0 across the inner gaps (window-start bucketing, the
    Structured-Streaming tumbling semantics)."""
    raw = spark.createDataFrame(
        [("a", "2024-01-01 00:03:00", 1.0),
         ("a", "2024-01-01 00:05:00", 2.0),
         ("a", "2024-01-01 00:50:00", 3.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample(
        raw, ["k"], "ts", "15 minutes",
        aggs={"n": F.count(F.lit(1))},
        fill={"n": 0},
    )
    got = {str(r["bucket"]): r["n"] for r in out.collect()}
    assert got == {
        "2024-01-01 00:00:00": 2,
        "2024-01-01 00:15:00": 0,
        "2024-01-01 00:30:00": 0,
        "2024-01-01 00:45:00": 1,
    }


def test_resample_buckets_validation(spark):
    b = _buckets(spark, [("a", "2024-01-01 00:00:00", 1.0)])
    with pytest.raises(ValueError, match="fill column"):
        gap_fill(b, ["k"], "bucket", "1 day", {})
    with pytest.raises(ValueError, match="absent"):
        gap_fill(b, ["k"], "bucket", "1 day", {"nope": 0})
