"""Versioned parquet tables: snapshot isolation + time travel without
a table-format jar.

The staged-rename adapter (sources/acid.py) keeps ONE table at a fixed
path — atomic per writer, but a reader that starts during a swap can
see the table disappear and reappear, and yesterday's state is gone.
This module trades a little storage for both properties the fallback
lacks:

  layout     path/v=N/  (plain parquet per version)
  commit     the _SUCCESS marker Spark's job committer writes LAST —
             a version EXISTS iff its marker does; there is no pointer
             file to corrupt, so "latest" = max complete N, resolved
             at read time
  isolation  writers never touch an existing version dir; a reader
             that resolved v=N keeps a consistent snapshot no matter
             how many commits land meanwhile (until vacuum passes its
             retention window)
  crash      a writer dying mid-write leaves v=N without _SUCCESS —
             invisible to every reader, overwritten by the next
             attempt; no recovery step exists because no intermediate
             state is ever observable

This is the 20-line core of what Iceberg/Delta snapshot logs provide.
Multi-writer arbitration (round 7): a writer never writes into v=N
directly — it stages under a writer-unique dot-dir (invisible to
readers and to version resolution), then CLAIMS a number by renaming
the staged dir to v=N.  The rename is the test-and-set: exactly one
writer can own v=N.  Because Hadoop's FileSystem.rename onto an
existing directory is allowed to MOVE-INTO it (local FS) rather than
fail (HDFS), winning is verified positively — the staged dir carries
a `_WRITER-<id>` marker file, and the claim counts only if
`v=N/_WRITER-<id>` exists afterwards; a loser un-nests its staging
dir if it was moved inside the winner's version, re-resolves N, and
retries.  Corollaries: a v=N dir now APPEARS atomically complete
(_SUCCESS included) or not at all; write_version deletes nothing it
does not own (the old debris-clearing is gone — claims simply go past
every existing v-dir, committed or not); two concurrent maintenance
jobs commit two distinct versions (pinned by test, including a real
two-thread race).  Crashed writers leave only stale `.staging-*`
dirs, which vacuum_versions clears past a retention age.

Still absent by design: row-level MERGE (see acid.py).  Schema
evolution: reads go through catalog.read_evolving; drift between two
committed versions is reported by `schema_diff` below.

Scale: version resolution is one directory listing; vacuum deletes
whole directories.  Storage cost = versions retained × table size —
exactly the knob `keep` controls.  The claim loop is driver-side
metadata only (one rename + one exists per attempt); contention
between M writers costs at most M(M-1)/2 extra renames, never a
rewrite of data.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_code_spark.sources.acid import _fs_for

_V_RE = re.compile(r"^v=(\d+)$")
_STAGING_PREFIX = ".staging-"


def list_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed versions (ascending): v=N dirs whose _SUCCESS marker
    exists.  Incomplete writer leftovers are invisible."""
    fs, hpath = _fs_for(spark, path)
    if not fs.exists(hpath):
        return []
    jvm = spark._jvm
    out = []
    for status in fs.listStatus(hpath):
        m = _V_RE.match(status.getPath().getName())
        if m and status.isDirectory():
            marker = jvm.org.apache.hadoop.fs.Path(status.getPath(), "_SUCCESS")
            if fs.exists(marker):
                out.append(int(m.group(1)))
    return sorted(out)


def _all_version_numbers(spark: SparkSession, path: str) -> list[int]:
    """EVERY v=N dir present, committed or not — the claim must go
    past uncommitted legacy debris too, never delete it."""
    fs, hpath = _fs_for(spark, path)
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        m = _V_RE.match(status.getPath().getName())
        if m and status.isDirectory():
            out.append(int(m.group(1)))
    return sorted(out)


def _stage(spark: SparkSession, df: DataFrame, path: str) -> tuple[str, str]:
    """Write `df` (plus the writer marker) into a writer-unique
    staging dot-dir.  Invisible to readers: list_versions only
    matches v=N, and dot-dirs are skipped by parquet listings."""
    writer_id = uuid.uuid4().hex
    staging = f"{_STAGING_PREFIX}{writer_id}"
    df.write.mode("error").parquet(f"{path}/{staging}")
    fs, hpath = _fs_for(spark, path)
    jvm = spark._jvm
    marker = jvm.org.apache.hadoop.fs.Path(
        hpath, f"{staging}/_WRITER-{writer_id}"
    )
    fs.create(marker, True).close()
    return staging, writer_id


def _claim(
    spark: SparkSession,
    path: str,
    staging: str,
    writer_id: str,
    first_n: int | None = None,
    max_attempts: int = 64,
) -> int:
    """Rename-as-CAS: claim the next free v=N for an already-staged
    dir.  Winning is verified by the presence of OUR writer marker
    under v=N (rename onto an existing dir may move-into on local FS
    instead of failing — the marker makes either semantic safe); a
    loser un-nests its staging dir if needed, re-resolves N, retries.
    `first_n` lets tests force the initial claim number to simulate
    two writers racing for the same N."""
    fs, hpath = _fs_for(spark, path)
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path
    src = hadoop_path(hpath, staging)
    last_err: Exception | None = None
    for attempt in range(max_attempts):
        if first_n is not None and attempt == 0:
            n = first_n
        else:
            existing = _all_version_numbers(spark, path)
            n = (existing[-1] + 1) if existing else 0
        vdir = hadoop_path(hpath, f"v={n}")
        mine = hadoop_path(hpath, f"v={n}/_WRITER-{writer_id}")
        # cheap pre-check narrows the race window; the marker check
        # after the rename is what actually decides
        if not fs.exists(vdir):
            try:
                fs.rename(src, vdir)
            except Exception as e:  # noqa: BLE001 — FS variety
                # a throwing FS losing the race is expected; anything
                # persistent (permissions, quota) must surface in the
                # give-up error, not vanish into 64 silent retries
                last_err = e
        if fs.exists(mine):
            return n
        # we lost: if the rename moved our staging INSIDE the winner's
        # v=N (local-FS move-into semantics), pull it back out first
        nested = hadoop_path(hpath, f"v={n}/{staging}")
        if fs.exists(nested):
            if not fs.rename(nested, src):
                raise IOError(
                    f"writer {writer_id}: cannot un-nest {staging} from "
                    f"v={n} at {path}"
                )
        if not fs.exists(src):
            raise IOError(
                f"writer {writer_id}: staging dir {staging} vanished "
                f"while claiming a version at {path}"
            )
    raise IOError(
        f"writer {writer_id}: gave up claiming a version at {path} "
        f"after {max_attempts} attempts"
        + (f"; last rename error: {last_err}" if last_err else "")
    ) from last_err


def write_version(spark: SparkSession, df: DataFrame, path: str) -> int:
    """Commit `df` as the next version and return its number.

    Two-phase: stage under a writer-unique dot-dir (data + _SUCCESS +
    writer marker, invisible to readers), then claim v=N by rename —
    the atomic test-and-set.  The version therefore appears to
    readers complete-or-not-at-all; a crash during staging leaves
    only a `.staging-*` dir (cleared by vacuum_versions past its
    retention age); concurrent writers commit DISTINCT versions and
    never touch each other's dirs — write_version deletes nothing."""
    staging, writer_id = _stage(spark, df, path)
    return _claim(spark, path, staging, writer_id)


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned `version`, or the latest committed one.  A
    version that never committed or was vacuumed raises loudly with
    what IS available."""
    versions = list_versions(spark, path)
    if not versions:
        raise ValueError(f"no committed versions at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(
            f"version {version} not available at {path} "
            f"(committed: {versions}) — vacuumed or never committed"
        )
    return spark.read.parquet(f"{path}/v={version}")


def vacuum_versions(
    spark: SparkSession,
    path: str,
    keep: int = 2,
    stale_staging_ms: int = 24 * 3600 * 1000,
) -> list[int]:
    """Delete all but the newest `keep` committed versions, returning
    the deleted version numbers; also clear `.staging-*` dirs whose
    modification time is more than `stale_staging_ms` old (a crashed
    writer's leftovers — live writers stage and claim within their
    job, so a day-old staging dir has no owner).  Readers pinned
    inside the retention window are safe; pinning beyond it is the
    caller's contract to avoid — the same retention semantics every
    table format ships."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1: {keep}")
    versions = list_versions(spark, path)
    doomed = versions[:-keep] if len(versions) > keep else []
    fs, hpath = _fs_for(spark, path)
    jvm = spark._jvm
    for n in doomed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(hpath, f"v={n}"), True)
    if fs.exists(hpath):
        now = jvm.java.lang.System.currentTimeMillis()
        for status in fs.listStatus(hpath):
            name = status.getPath().getName()
            if (
                name.startswith(_STAGING_PREFIX)
                and status.isDirectory()
                and now - status.getModificationTime() > stale_staging_ms
            ):
                fs.delete(status.getPath(), True)
    return doomed


def compact_table(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction as a new version: read the latest
    snapshot, size the output at ceil(bytes / target) files, commit.
    Content is unchanged (same rows, new layout); readers of the old
    version are untouched — compaction under a versioned table needs
    no locks.  The lakehouse maintenance job that keeps scan-task
    counts proportional to data, not to ingest batch counts."""
    versions = list_versions(spark, path)
    if not versions:
        raise ValueError(f"nothing to compact at {path}")
    latest = versions[-1]
    fs, hpath = _fs_for(spark, path)
    jvm = spark._jvm
    vdir = jvm.org.apache.hadoop.fs.Path(hpath, f"v={latest}")
    total = fs.getContentSummary(vdir).getLength()
    n_files = max(1, -(-int(total) // int(target_file_bytes)))
    df = spark.read.parquet(f"{path}/v={latest}").coalesce(n_files)
    return write_version(spark, df, path)


def schema_diff(
    spark: SparkSession, path: str, v_old: int, v_new: int
) -> list[dict]:
    """Schema drift between two committed versions — the alerting
    report a versioned table's consumers watch: [{column, change,
    old_type, new_type}] for every added / removed / retyped column
    (column ORDER changes are not drift; parquet reads by name).
    Metadata-only: two footer reads, no data scan.
    """
    old_schema = {
        f.name: f.dataType.simpleString()
        for f in read_version(spark, path, v_old).schema.fields
    }
    new_schema = {
        f.name: f.dataType.simpleString()
        for f in read_version(spark, path, v_new).schema.fields
    }
    out: list[dict] = []
    for c in sorted(set(old_schema) | set(new_schema)):
        o, n = old_schema.get(c), new_schema.get(c)
        if o is None:
            out.append({"column": c, "change": "added",
                        "old_type": None, "new_type": n})
        elif n is None:
            out.append({"column": c, "change": "removed",
                        "old_type": o, "new_type": None})
        elif o != n:
            out.append({"column": c, "change": "retyped",
                        "old_type": o, "new_type": n})
    return out


def row_diff(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    keys: list[str],
) -> DataFrame:
    """Row-level drift between two committed versions, keyed by
    `keys`: (change, keys...) with change ∈ added / removed /
    changed — schema_diff's data-level sibling, the audit report for
    "what did the last maintenance cycle actually do to this table".
    Both versions must agree on the key columns; value comparison
    hashes the remaining shared columns through the repo's INJECTIVE
    length-prefixed encoding (functions/scalars.py
    surrogate_hash_key128) — xxhash64 would skip NULL inputs (a null
    swapped between two columns hashes identically → missed change)
    and hashes by physical type (an int→bigint retype flags every
    row) — so a row counts as changed exactly when some non-key
    VALUE differs.  Columns added or removed BETWEEN the versions
    are schema drift (schema_diff's job), not row drift — comparison
    runs over the shared non-key columns.

    Scale shape: two anti-joins + one inner join, all shuffled on the
    key columns; output is drift-sized."""
    old = read_version(spark, path, v_old)
    new = read_version(spark, path, v_new)
    for k in keys:
        if k not in old.columns or k not in new.columns:
            raise ValueError(f"row_diff: key column {k!r} missing in a version")
    shared = [c for c in old.columns if c in set(new.columns) and c not in keys]
    added = new.join(old, keys, "left_anti").select(
        F.lit("added").alias("change"), *keys
    )
    removed = old.join(new, keys, "left_anti").select(
        F.lit("removed").alias("change"), *keys
    )
    if shared:
        from datawarehouse_code_spark.functions.scalars import (
            surrogate_hash_key128,
        )

        o = old.select(
            *keys,
            surrogate_hash_key128(*[F.col(c) for c in shared]).alias("_h_old"),
        )
        n = new.select(
            *keys,
            surrogate_hash_key128(*[F.col(c) for c in shared]).alias("_h_new"),
        )
        changed = (
            o.join(n, keys)
            .filter(F.col("_h_old") != F.col("_h_new"))
            .select(F.lit("changed").alias("change"), *keys)
        )
    else:
        changed = added.limit(0)
    return added.unionByName(removed).unionByName(changed)
