"""Avro connector (sources/catalog.py read_avro/write_avro).

The spark-avro datasource is an EXTERNAL module (not in the base
distribution); this container has no network to fetch the jar, so the
round-trip and schema-evolution tests skip-mark exactly like the
Delta tests in test_acid.py — they run wherever the deployment ships
the module (``--packages org.apache.spark:spark-avro_2.13:<ver>``).
The availability gate itself is testable everywhere.
"""

from __future__ import annotations

import pytest


def test_avro_gate_raises_without_module(spark, tmp_path):
    from datawarehouse_code_spark.sources.catalog import (
        avro_available,
        read_avro,
        write_avro,
    )

    if avro_available(spark):
        pytest.skip("spark-avro present — gate-raise path not reachable")
    with pytest.raises(RuntimeError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "x"))
    with pytest.raises(RuntimeError, match="spark-avro"):
        write_avro(spark.range(1), str(tmp_path / "x"))


def test_avro_round_trip(spark, tmp_path):
    from datawarehouse_code_spark.sources.catalog import (
        avro_available,
        read_avro,
        write_avro,
    )

    if not avro_available(spark):
        pytest.skip("spark-avro jar not in this container (no network)")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    path = str(tmp_path / "t")
    write_avro(df, path)
    back = read_avro(spark, path)
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]


def test_avro_schema_evolution(spark, tmp_path):
    from datawarehouse_code_spark.sources.catalog import (
        avro_available,
        read_avro,
        write_avro,
    )

    if not avro_available(spark):
        pytest.skip("spark-avro jar not in this container (no network)")
    old = spark.createDataFrame([(1,)], ["id"])
    path = str(tmp_path / "evolving")
    write_avro(old, path)
    got = read_avro(spark, path, expected="id BIGINT, added STRING")
    rows = got.collect()
    assert got.columns == ["id", "added"]
    assert rows[0]["added"] is None
