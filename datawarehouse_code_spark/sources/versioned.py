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

This is the 20-line core of what Iceberg/Delta snapshot logs provide;
what it deliberately lacks: ANY multi-writer arbitration — the
contract is ONE writer per table (a single maintenance job), which is
how every function here is used.  Two concurrent writers can claim
the same N, and write_version's debris-clearing (which exists so a
crashed writer's retry can land) would delete the other's in-progress
dir.  Concurrent writers need a real table format's commit log; this
module will not pretend otherwise.  Also absent: row-level MERGE
(see acid.py) and schema-evolution metadata (see
catalog.read_evolving).

Scale: version resolution is one directory listing; vacuum deletes
whole directories.  Storage cost = versions retained × table size —
exactly the knob `keep` controls.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from datawarehouse_code_spark.sources.acid import _fs_for

_V_RE = re.compile(r"^v=(\d+)$")


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


def write_version(spark: SparkSession, df: DataFrame, path: str) -> int:
    """Commit `df` as the next version and return its number.  The
    version becomes visible only when Spark's committer writes the
    _SUCCESS marker at the end — a crash before that leaves an
    incomplete dir no reader resolves."""
    versions = list_versions(spark, path)
    n = (versions[-1] + 1) if versions else 0
    # an UNCOMMITTED leftover at the claimed number is a crashed
    # writer's debris (n is beyond every committed version by
    # construction) — clear it so the retry can land; a committed dir
    # can never be hit here, so data is never deleted
    fs, hpath = _fs_for(spark, path)
    jvm = spark._jvm
    vdir = jvm.org.apache.hadoop.fs.Path(hpath, f"v={n}")
    if fs.exists(vdir):
        fs.delete(vdir, True)
    df.write.mode("error").parquet(f"{path}/v={n}")
    return n


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


def vacuum_versions(spark: SparkSession, path: str, keep: int = 2) -> list[int]:
    """Delete all but the newest `keep` committed versions (and any
    incomplete leftovers older than the retention floor), returning
    the deleted version numbers.  Readers pinned inside the retention
    window are safe; pinning beyond it is the caller's contract to
    avoid — the same retention semantics every table format ships."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1: {keep}")
    versions = list_versions(spark, path)
    doomed = versions[:-keep] if len(versions) > keep else []
    fs, hpath = _fs_for(spark, path)
    jvm = spark._jvm
    for n in doomed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(hpath, f"v={n}"), True)
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
