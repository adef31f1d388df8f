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


def test_interleaved_writers_claim_distinct_versions(spark, tmp_path):
    """The round-7 CAS protocol, interleaved at the worst point: both
    writers stage, BOTH resolve the same next version number, then
    claim in sequence.  The loser must detect the lost rename via its
    writer marker, un-nest if the FS moved it inside the winner's
    dir, re-resolve, and land on the NEXT number — two distinct
    committed versions, neither corrupted."""
    from datawarehouse_code_spark.sources.versioned import _claim, _stage

    path = str(tmp_path / "t")
    write_version(spark, _mk(spark, 5, "base"), path)  # v=0

    stag_a, id_a = _stage(spark, _mk(spark, 10, "a"), path)
    stag_b, id_b = _stage(spark, _mk(spark, 20, "b"), path)
    # both writers believe the next version is 1
    n_a = _claim(spark, path, stag_a, id_a, first_n=1)
    n_b = _claim(spark, path, stag_b, id_b, first_n=1)
    assert {n_a, n_b} == {1, 2}
    assert list_versions(spark, path) == [0, 1, 2]
    by_tag = {
        read_version(spark, path, n).select("tag").first()["tag"]: n
        for n in (n_a, n_b)
    }
    assert read_version(spark, path, by_tag["a"]).count() == 10
    assert read_version(spark, path, by_tag["b"]).count() == 20
    # no staging debris left behind
    assert not glob.glob(str(tmp_path / "t" / ".staging-*"))


def test_concurrent_writers_real_race(spark, tmp_path):
    """Two writers committing at the SAME time from two threads: both
    must succeed with distinct version numbers and intact content
    (the pre-round-7 protocol could delete the other's in-progress
    dir here)."""
    import threading

    path = str(tmp_path / "t")
    results: dict[str, int] = {}

    def work(tag: str, n_rows: int) -> None:
        results[tag] = write_version(spark, _mk(spark, n_rows, tag), path)

    threads = [
        threading.Thread(target=work, args=("a", 11)),
        threading.Thread(target=work, args=("b", 22)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results.values()) == [0, 1]
    counts = {
        read_version(spark, path, n).first()["tag"]: read_version(
            spark, path, n
        ).count()
        for n in results.values()
    }
    assert counts == {"a": 11, "b": 22}


def test_write_version_never_deletes_foreign_dirs(spark, tmp_path):
    """An UNCOMMITTED legacy v-dir (old-protocol crash debris) is
    stepped past, not deleted — write_version owns only its own
    staging dir."""
    path = str(tmp_path / "t")
    write_version(spark, _mk(spark, 5, "a"), path)  # v=0
    debris = tmp_path / "t" / "v=7"
    debris.mkdir()
    (debris / "leftover.parquet").write_text("not actually parquet")

    n = write_version(spark, _mk(spark, 6, "b"), path)
    assert n == 8  # past ALL v-dirs, committed or not
    assert (debris / "leftover.parquet").exists()  # untouched
    assert list_versions(spark, path) == [0, 8]


def test_vacuum_clears_stale_staging_only(spark, tmp_path):
    """Vacuum removes crashed writers' staging dirs past the
    retention age and leaves fresh ones (a live writer mid-stage)
    alone."""
    path = str(tmp_path / "t")
    write_version(spark, _mk(spark, 5, "a"), path)
    stale = tmp_path / "t" / ".staging-deadbeef"
    stale.mkdir()
    (stale / "part.parquet").write_text("x")
    fresh = tmp_path / "t" / ".staging-cafe"
    fresh.mkdir()

    # default retention (24h): neither goes
    vacuum_versions(spark, path, keep=1)
    assert stale.exists() and fresh.exists()
    # age out everything: both go, committed data untouched
    vacuum_versions(spark, path, keep=1, stale_staging_ms=-1)
    assert not stale.exists() and not fresh.exists()
    assert read_version(spark, path).count() == 5


def test_schema_diff_between_versions(spark, tmp_path):
    """Added, removed, and retyped columns between two commits are
    reported; identical schemas diff to empty."""
    from datawarehouse_code_spark.sources.versioned import schema_diff

    path = str(tmp_path / "t")
    v0 = write_version(
        spark,
        spark.range(3).select(
            F.col("id"), F.lit("x").alias("a"), F.lit(1).alias("b")
        ),
        path,
    )
    v1 = write_version(
        spark,
        spark.range(3).select(
            F.col("id"),
            F.lit(2.5).alias("b"),          # retyped int -> double
            F.lit(True).alias("c"),          # added
        ),                                   # 'a' removed
        path,
    )
    diff = schema_diff(spark, path, v0, v1)
    assert diff == [
        {"column": "a", "change": "removed", "old_type": "string",
         "new_type": None},
        {"column": "b", "change": "retyped", "old_type": "int",
         "new_type": "double"},
        {"column": "c", "change": "added", "old_type": None,
         "new_type": "boolean"},
    ]
    assert schema_diff(spark, path, v1, v1) == []


def test_row_diff_reports_added_removed_changed(spark, tmp_path):
    """row_diff between two committed versions: keyed anti-joins name
    the added/removed rows, the non-key hash comparison names the
    changed ones, untouched rows stay silent, and a missing key
    column is refused."""
    import pytest

    from datawarehouse_code_spark.sources.versioned import (
        row_diff,
        write_version,
    )

    path = str(tmp_path / "t")
    v0 = write_version(
        spark,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "s", "m"]
        ),
        path,
    )
    v1 = write_version(
        spark,
        spark.createDataFrame(
            [(1, "a", 10), (2, "B", 20), (4, "d", 40)], ["id", "s", "m"]
        ),
        path,
    )
    got = sorted(
        map(tuple, row_diff(spark, path, v0, v1, ["id"]).collect())
    )
    assert got == [("added", 4), ("changed", 2), ("removed", 3)]
    # symmetric direction flips added/removed
    rev = sorted(map(tuple, row_diff(spark, path, v1, v0, ["id"]).collect()))
    assert rev == [("added", 3), ("changed", 2), ("removed", 4)]
    with pytest.raises(ValueError, match="key column"):
        row_diff(spark, path, v0, v1, ["nope"])

    # a NULL swapped between two columns IS a change (xxhash64 skips
    # NULL inputs and would hash the rows identically — the injective
    # length-prefixed encoding does not)
    p2 = str(tmp_path / "t2")
    w0 = write_version(
        spark,
        spark.createDataFrame([(1, None, "x")], "id int, s string, m string"),
        p2,
    )
    w1 = write_version(
        spark,
        spark.createDataFrame([(1, "x", None)], "id int, s string, m string"),
        p2,
    )
    assert sorted(map(tuple, row_diff(spark, p2, w0, w1, ["id"]).collect())) \
        == [("changed", 1)]
