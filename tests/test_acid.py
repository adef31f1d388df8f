"""ACID adapter (sources/acid.py): the parquet fallback paths run
everywhere; the Delta branches are skip-marked on jar absence (this
container ships no Delta jar) and run wherever one exists.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.scd import scd2_init
from datawarehouse_code_spark.sources.acid import delta_available, scd2_apply, upsert


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id BIGINT, name STRING, bal DOUBLE",
    )


def test_upsert_parquet_fallback(spark, tmp_path):
    # skip BEFORE calling: on a Delta-enabled session upsert() would
    # take the Delta branch against a plain parquet dir and error
    if delta_available(spark):
        pytest.skip("Delta present; fallback branch not taken")
    path = str(tmp_path / "t")
    _base(spark).write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "b", 25.0), (4, "d", 40.0)], "id BIGINT, name STRING, bal DOUBLE"
    )
    ran = upsert(spark, path, updates, ["id"])
    assert ran == "parquet"
    got = {
        (r.id, r.name, r.bal) for r in spark.read.parquet(path).collect()
    }
    assert got == {(1, "a", 10.0), (2, "b", 25.0), (3, "c", 30.0), (4, "d", 40.0)}
    # no staging leftovers
    assert not list(tmp_path.glob("*._staging"))


def test_scd2_apply_parquet_fallback(spark, tmp_path):
    if delta_available(spark):
        pytest.skip("Delta present; fallback branch not taken")
    path = str(tmp_path / "dim")
    scd2_init(_base(spark), "2023-01-01").write.parquet(path)
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (4, "d", 40.0)],
        "id BIGINT, name STRING, bal DOUBLE",
    )
    ran = scd2_apply(spark, path, snap, ["id"], ["name", "bal"], "2024-06-01")
    assert ran == "parquet"
    dim = spark.read.parquet(path)
    cur = {(r.id, r.bal) for r in dim.filter("is_current").collect()}
    # unchanged 1 + 3 carried, 2 reopened at 99, 4 opened
    assert cur == {(1, 10.0), (2, 99.0), (3, 30.0), (4, 40.0)}
    closed = dim.filter(~F.col("is_current")).collect()
    assert [(r.id, r.bal, str(r.valid_to)) for r in closed] == [
        (2, 20.0, "2024-06-01")
    ]


def test_upsert_delta_merge(spark, tmp_path):
    if not delta_available(spark):
        pytest.skip("Delta jar/package not available in this container")
    path = str(tmp_path / "dt")
    _base(spark).write.format("delta").save(path)
    updates = spark.createDataFrame(
        [(2, "b", 25.0), (4, "d", 40.0)], "id BIGINT, name STRING, bal DOUBLE"
    )
    assert upsert(spark, path, updates, ["id"]) == "delta"
    got = {
        (r.id, r.bal)
        for r in spark.read.format("delta").load(path).collect()
    }
    assert got == {(1, 10.0), (2, 25.0), (3, 30.0), (4, 40.0)}
