"""Exhaustive crash-point enumeration for every staged-swap lane
added since the original bucketed-replace harness (r16 verdict ask
#4): the whole-table ``_staged_overwrite`` (the write_cube/write_fact
rebuild lane, operators/cube.py:84 / fact.py:69), the RTBF
partition swap (``similarity._forget_from_table``), compact_parquet's
per-dir swap (pipeline.py), and the r17 partitioned-rollup swap
(``rollup._staged_partition_overwrite``).

Same proxy technique as tests/test_bucketed.py's harness: wrap the
Hadoop FileSystem so the k-th MUTATING call (rename/delete/create)
raises, for every k until the operation completes — if a new mutation
is ever added to a protocol, the enumeration automatically gains its
crash point.  At each point the lane's documented invariant is
asserted:

- whole-table swap: after recovery the table holds EXACTLY the old or
  exactly the new rows (never a mix, never absent), and a rerun
  converges to new;
- partition-scoped swaps (RTBF, rollup refresh): after the entry
  repair EVERY partition holds exactly its old or exactly its new
  content (per-partition atomicity), and a rerun converges to new;
- compaction: rows are IDENTICAL at every crash point after repair
  (compaction must never change content), and a rerun completes with
  no leftovers.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from tests.test_bucketed import _CrashFS, _InjectedCrash

MAX_POINTS = 80  # far above any lane's mutation count; loop guard


def _patched(module, state):
    """Swap ``module._fs_for`` for the crash-injecting proxy; returns
    the original for the caller's finally."""
    real = module._fs_for

    def fake(spark, path):
        fs, p = real(spark, path)
        return _CrashFS(fs, state), p

    module._fs_for = fake
    return real


def _rows(spark, path):
    df = spark.read.parquet(path)
    # partitioned reads append the partition column last; normalize
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def test_crash_enumeration_staged_overwrite(spark, tmp_path):
    """Whole-table staged swap (the cube/fact rebuild lane): at every
    crash point, recover_interrupted_swap (run by table_exists, i.e.
    by every entry) restores exactly-old or exactly-new, and a rerun
    lands new."""
    import datawarehouse_code_spark.sources.acid as A
    from datawarehouse_code_spark.sources.acid import (
        _staged_overwrite,
        recover_interrupted_swap,
    )

    old_df = spark.range(0, 20).select(
        F.col("id"), (F.col("id") % 3).alias("yr"), F.lit("old").alias("v")
    )
    new_df = spark.range(0, 24).select(
        F.col("id"), (F.col("id") % 3).alias("yr"), F.lit("new").alias("v")
    )
    old_rows = sorted(
        map(tuple, old_df.select(*sorted(old_df.columns)).collect())
    )
    new_rows = sorted(
        map(tuple, new_df.select(*sorted(new_df.columns)).collect())
    )

    template = str(tmp_path / "template")
    # partition_by exercises the exact write_fact shape (partition
    # dirs ride the whole-dir swap unchanged)
    _staged_overwrite(spark, old_df, template, partition_by=["yr"])

    crash_at, completed = 0, False
    seen_old = seen_new = 0
    while not completed:
        assert crash_at < MAX_POINTS, "enumeration did not terminate"
        path = str(tmp_path / f"t{crash_at}")
        shutil.copytree(template, path)
        state = {"n": 0, "crash_at": crash_at}
        real = _patched(A, state)
        try:
            _staged_overwrite(spark, new_df, path, partition_by=["yr"])
            completed = True
        except _InjectedCrash:
            pass
        finally:
            A._fs_for = real

        recover_interrupted_swap(spark, path)
        got = _rows(spark, path)
        assert got in (old_rows, new_rows), f"crash point {crash_at}: mixed state"
        seen_old += got == old_rows
        seen_new += got == new_rows
        assert not os.path.exists(f"{path}._old")
        # rerun converges to new regardless of where the crash landed
        _staged_overwrite(spark, new_df, path, partition_by=["yr"])
        assert _rows(spark, path) == new_rows
        assert not os.path.exists(f"{path}._staging")
        crash_at += 1
    # both recovery directions must have been exercised
    assert seen_old >= 1 and seen_new >= 1


def _part_old_or_new(spark, path, part_col, old_by_part, new_by_part):
    """Assert every partition of `path` equals exactly its old or its
    new content (per-partition atomicity), absent counting as new
    when the new content is empty and as old when it never existed."""
    live = {}
    for name in os.listdir(path):
        if name.startswith(f"{part_col}="):
            v = name.split("=", 1)[1]
            live[v] = sorted(
                map(tuple, spark.read.parquet(f"{path}/{name}").collect())
            )
    for v in set(old_by_part) | set(new_by_part):
        got = live.get(v, [])
        ok = got == old_by_part.get(v, []) or got == new_by_part.get(v, [])
        assert ok, f"partition {v}: neither old nor new content"


def test_crash_enumeration_forget_from_table(spark, tmp_path):
    """RTBF partition swap (similarity._forget_from_table, the
    forget_vectors lane): per-partition old-or-new after the entry
    repair at every crash point, and the rerun completes the forget
    (survivors exact, fully-forgotten partitions deleted)."""
    import datawarehouse_code_spark.sources.acid as A
    from datawarehouse_code_spark.operators.similarity import (
        _forget_from_table,
    )
    from datawarehouse_code_spark.sources.acid import _fs_for as real_fs_for
    from datawarehouse_code_spark.sources.bucketed import (
        _repair_compaction_dirs,
    )

    # 4 partitions; forget ids hit partitions 0 (partial) and 1
    # (fully emptied -> the delete lane) and leave 2,3 untouched
    rows = [(i, i % 4, f"v{i}") for i in range(16)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, cent_id INT, v STRING")
    doomed = [i for i in range(16) if i % 4 == 1] + [0, 8]
    template = str(tmp_path / "template")
    df.write.partitionBy("cent_id").parquet(template)

    survivors = [r for r in rows if r[0] not in set(doomed)]
    old_by_part = {
        str(c): sorted((i, v) for i, cc, v in rows if cc == c)
        for c in range(4)
    }
    new_by_part = {
        str(c): sorted((i, v) for i, cc, v in survivors if cc == c)
        for c in range(4)
    }

    def ids():
        return spark.createDataFrame([(i,) for i in doomed], "vec_id BIGINT")

    crash_at, completed = 0, False
    while not completed:
        assert crash_at < MAX_POINTS, "enumeration did not terminate"
        path = str(tmp_path / f"t{crash_at}")
        shutil.copytree(template, path)
        state = {"n": 0, "crash_at": crash_at}
        real = _patched(A, state)
        try:
            _forget_from_table(spark, path, ids(), A._fs_for)
            completed = True
        except _InjectedCrash:
            pass
        finally:
            A._fs_for = real

        # the entry repair every next caller runs: roll asides back,
        # then the per-partition state must be exactly old or new
        fs, p = real_fs_for(spark, path)
        names = [st.getPath().getName() for st in fs.listStatus(p)]
        _repair_compaction_dirs(spark, fs, p, names)
        _part_old_or_new(spark, path, "cent_id", old_by_part, new_by_part)

        # rerun converges: survivors exact, no staging/aside leftovers
        _forget_from_table(spark, path, ids(), real_fs_for)
        got = sorted(
            map(
                tuple,
                spark.read.parquet(path)
                .select("vec_id", "cent_id", "v")
                .collect(),
            )
        )
        assert got == sorted(survivors)
        left = os.listdir(path)
        assert not any(".rtbf-staging" in n or "._precompact" in n for n in left)
        crash_at += 1


def test_crash_enumeration_compact_parquet_bucketed(spark, tmp_path):
    """compact_parquet's per-dir swap on a bucketed table: rows are
    byte-identical after repair at EVERY crash point (compaction must
    never change content), and the rerun completes with no
    dot-prefixed leftovers."""
    import datawarehouse_code_spark.sources.bucketed as B
    from datawarehouse_code_spark.pipeline import compact_parquet
    from datawarehouse_code_spark.sources.bucketed import (
        read_bucketed,
        recover_interrupted_bucket_swap,
        write_bucketed,
    )

    df = spark.createDataFrame(
        [(i, f"p{i}") for i in range(24)], "doc_id BIGINT, payload STRING"
    )
    template = str(tmp_path / "template")
    # small repartition -> several files per bucket, so compaction
    # actually rewrites
    write_bucketed(spark, df.repartition(4), template, ["doc_id"], 4)
    want = sorted(map(tuple, read_bucketed(spark, template).collect()))

    crash_at, completed = 0, False
    while not completed:
        assert crash_at < MAX_POINTS, "enumeration did not terminate"
        path = str(tmp_path / f"t{crash_at}")
        shutil.copytree(template, path)
        state = {"n": 0, "crash_at": crash_at}
        real = _patched(B, state)
        try:
            compact_parquet(spark, path, target_file_mb=256)
            completed = True
        except _InjectedCrash:
            pass
        finally:
            B._fs_for = real

        recover_interrupted_bucket_swap(spark, path, writer=True)
        assert (
            sorted(map(tuple, read_bucketed(spark, path).collect())) == want
        ), f"crash point {crash_at}: compaction changed content"
        report = compact_parquet(spark, path, target_file_mb=256)
        assert report["files_after"] >= 1
        assert sorted(map(tuple, read_bucketed(spark, path).collect())) == want
        assert not any(
            n.endswith("._compacting") or n.endswith("._precompact")
            for n in os.listdir(path)
        )
        crash_at += 1


def test_crash_enumeration_rollup_partition_swap(spark, tmp_path):
    """The r17 partitioned-rollup staged swap
    (rollup._staged_partition_overwrite, used by
    refresh_rollup_partition and backfill_partition): per-partition
    old-or-new after the entry repair at every crash point, rerun
    converges — the enumeration proof backing this round's migration
    off dynamic partition overwrite."""
    import datawarehouse_code_spark.sources.acid as A
    from datawarehouse_code_spark.operators.rollup import (
        _staged_partition_overwrite,
    )
    from datawarehouse_code_spark.sources.acid import _fs_for as real_fs_for
    from datawarehouse_code_spark.sources.bucketed import (
        _repair_compaction_dirs,
    )

    old_df = spark.createDataFrame(
        [(y, f"old{y}-{i}") for y in (1995, 1996, 1997) for i in range(3)],
        "yr INT, v STRING",
    )
    # the refresh touches two of the three partitions
    new_df = spark.createDataFrame(
        [(y, f"new{y}-{i}") for y in (1996, 1997) for i in range(2)],
        "yr INT, v STRING",
    )
    template = str(tmp_path / "template")
    old_df.write.partitionBy("yr").parquet(template)

    old_by_part = {
        str(y): sorted((f"old{y}-{i}",) for i in range(3))
        for y in (1995, 1996, 1997)
    }
    new_by_part = dict(
        old_by_part,
        **{
            str(y): sorted((f"new{y}-{i}",) for i in range(2))
            for y in (1996, 1997)
        },
    )
    final = sorted(
        [(f"old1995-{i}", 1995) for i in range(3)]
        + [(f"new{y}-{i}", y) for y in (1996, 1997) for i in range(2)]
    )

    crash_at, completed = 0, False
    while not completed:
        assert crash_at < MAX_POINTS, "enumeration did not terminate"
        path = str(tmp_path / f"t{crash_at}")
        shutil.copytree(template, path)
        state = {"n": 0, "crash_at": crash_at}
        real = _patched(A, state)
        try:
            _staged_partition_overwrite(new_df, path, "yr")
            completed = True
        except _InjectedCrash:
            pass
        finally:
            A._fs_for = real

        fs, p = real_fs_for(spark, path)
        names = [st.getPath().getName() for st in fs.listStatus(p)]
        _repair_compaction_dirs(spark, fs, p, names)
        _part_old_or_new(spark, path, "yr", old_by_part, new_by_part)

        _staged_partition_overwrite(new_df, path, "yr")
        got = sorted(map(tuple, spark.read.parquet(path).collect()))
        assert got == final
        assert not os.path.exists(f"{path}/.refresh-staging")
        crash_at += 1
