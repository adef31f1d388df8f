"""Custom Python Data Source (sources/pydatasource.py): partitioned
parallel generation, determinism across partitionings, schema parity
with the events catalog table, and composition with the engine's
operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_code_spark.sources.pydatasource import register
from datawarehouse_code_spark.sources.schemas import EVENTS


def _read(spark, rows, parts):
    register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("partitions", parts)
        .load()
    )


def test_generates_partitioned_rows(spark):
    df = _read(spark, 5000, 8)
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 8
    assert df.select("event_id").distinct().count() == 5000


def test_schema_matches_events_catalog(spark):
    df = _read(spark, 10, 2)
    assert [f.name for f in df.schema.fields] == [f.name for f in EVENTS.fields]
    assert [f.dataType for f in df.schema.fields] == [
        f.dataType for f in EVENTS.fields
    ]


def test_deterministic_across_partitionings(spark):
    a = sorted(map(tuple, _read(spark, 2000, 8).collect()))
    b = sorted(map(tuple, _read(spark, 2000, 3).collect()))
    assert a == b


def test_composes_with_window_aggregation(spark):
    df = _read(spark, 5000, 4)
    agg = df.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    rows = agg.collect()
    assert sum(r.n for r in rows) == 5000
