"""Versioned parquet tables (sources/versioned.py): commit-marker
visibility, pinned snapshots, vacuum retention, and compaction."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from datawarehouse_code_spark.sources.versioned import (
    compact_table,
    list_versions,
    read_version,
    vacuum_versions,
    write_version,
)


def _mk(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_write_read_pin_and_latest(spark, tmp_path):
    path = str(tmp_path / "t")
    assert list_versions(spark, path) == []
    assert write_version(spark, _mk(spark, 10, "a"), path) == 0
    assert write_version(spark, _mk(spark, 20, "b"), path) == 1
    assert list_versions(spark, path) == [0, 1]

    assert read_version(spark, path).count() == 20          # latest
    pinned = read_version(spark, path, 0)
    assert pinned.count() == 10
    # a commit landing AFTER the pin does not disturb the snapshot
    write_version(spark, _mk(spark, 30, "c"), path)
    assert pinned.count() == 10
    assert read_version(spark, path).count() == 30


def test_incomplete_version_is_invisible(spark, tmp_path):
    path = str(tmp_path / "t")
    write_version(spark, _mk(spark, 5, "a"), path)
    write_version(spark, _mk(spark, 6, "b"), path)
    # simulate a writer crash: v=1 loses its commit marker
    os.remove(str(tmp_path / "t" / "v=1" / "_SUCCESS"))
    assert list_versions(spark, path) == [0]
    assert read_version(spark, path).count() == 5
    with pytest.raises(ValueError, match="not available"):
        read_version(spark, path, 1)
    # the next write claims the abandoned number region cleanly
    n = write_version(spark, _mk(spark, 7, "c"), path)
    assert n == 1 or n > 1  # next after max COMMITTED
    assert read_version(spark, path).count() == 7


def test_vacuum_retention(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(4):
        write_version(spark, _mk(spark, i + 1, f"v{i}"), path)
    assert vacuum_versions(spark, path, keep=2) == [0, 1]
    assert list_versions(spark, path) == [2, 3]
    with pytest.raises(ValueError, match="vacuumed or never"):
        read_version(spark, path, 0)
    with pytest.raises(ValueError, match="keep"):
        vacuum_versions(spark, path, keep=0)


def test_compaction_preserves_content_reduces_files(spark, tmp_path):
    path = str(tmp_path / "t")
    frag = _mk(spark, 1000, "x").repartition(16)
    write_version(spark, frag, path)
    assert len(glob.glob(str(tmp_path / "t" / "v=0" / "*.parquet"))) == 16

    n = compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert n == 1
    files = glob.glob(str(tmp_path / "t" / "v=1" / "*.parquet"))
    assert len(files) < 16
    a = sorted(tuple(r) for r in read_version(spark, path, 0).collect())
    b = sorted(tuple(r) for r in read_version(spark, path, 1).collect())
    assert a == b

    with pytest.raises(ValueError, match="nothing to compact"):
        compact_table(spark, str(tmp_path / "empty"))
