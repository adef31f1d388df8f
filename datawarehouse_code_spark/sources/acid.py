"""ACID table-format adapter: Delta MERGE when available, staged
parquet overwrite as the fallback.

The reference's load pattern relies on MySQL transactions
(warehouse.py:50,65) — its Spark-first equivalent is a table format
with a transaction log.  This container ships no Delta/Iceberg jars,
so every writer here degrades to plain parquet with the job-commit /
staged-rename protocol (atomic per WRITER, not isolated from
concurrent readers); the Delta branch is exercised wherever the jar
exists (tests/test_acid.py skip-marks it on absence).

At 100 TB the difference is not academic: a keyed upsert as MERGE
touches only the files holding matched keys (plus the log), while the
parquet fallback rewrites the whole target.  The adapter keeps the
CALLER's code identical across both: same function, same result
table, different write amplification and isolation.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def delta_available(spark: SparkSession) -> bool:
    """True when both the delta-spark Python package and the Delta jar
    are importable/loadable in this session."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    try:
        # jar probe: class resolution fails fast when the jar is absent
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")
    except Exception:
        return False
    return True


def _staged_overwrite(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Write `df` beside `path`, then swap directories — never
    overwrites a dataset from its own live scan (the compact_parquet
    rule, pipeline.py).

    Crash ordering: the OLD table is renamed aside (atomic) before the
    staged result is renamed in (atomic), and only then deleted — data
    is never destroyed before its replacement is in place.  A crash
    between the two renames leaves the path momentarily absent but
    BOTH copies on disk (`._old` and `._staging`), so recovery is a
    single rename; a crash during the staged write leaves the old
    table untouched and live.
    """
    p = Path(path)
    staged = p.with_name(p.name + "._staging")
    old = p.with_name(p.name + "._old")
    df.write.mode("overwrite").parquet(str(staged))
    if old.exists():
        shutil.rmtree(old)
    had_old = p.exists()
    if had_old:
        p.rename(old)
    staged.rename(p)
    if had_old:
        shutil.rmtree(old)


def upsert(
    spark: SparkSession, target_path: str, updates: DataFrame, key: list[str]
) -> str:
    """Keyed upsert (updates win): Delta = one MERGE (matched →
    update all, not matched → insert all); parquet = anti-join the
    target against the update keys, union, staged overwrite.  Returns
    which path ran ('delta' | 'parquet').

    The parquet fallback reads the target BEFORE the staged write;
    the swap renames the old table aside before renaming the new one
    in (see _staged_overwrite), so a crash never destroys data — at
    worst the path is briefly absent with both copies recoverable on
    disk.  Concurrent readers can still see the swap mid-listing;
    Delta's log gives snapshot isolation.
    """
    if delta_available(spark):
        from delta.tables import DeltaTable

        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in key)
        (
            DeltaTable.forPath(spark, target_path)
            .alias("t")
            .merge(updates.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return "delta"
    current = spark.read.parquet(target_path)
    merged = current.join(updates, key, "left_anti").unionByName(updates)
    _staged_overwrite(spark, merged, target_path)
    return "parquet"


def scd2_apply(
    spark: SparkSession,
    target_path: str,
    snapshot: DataFrame,
    key: list[str],
    tracked: list[str],
    load_date: str,
) -> str:
    """Apply an SCD2 snapshot merge (operators/scd.py scd2_merge) to a
    stored dimension.  Returns which path ran ('delta' | 'parquet').

    Delta: the close+open rewrite is expressed as a MERGE with a
    2-branch source (each changed key contributes a 'close' row that
    matches the open target row, and an 'open' row that matches
    nothing), so only files containing changed keys rewrite.  Parquet:
    compute the full merged dimension (one join — see scd2_merge) and
    staged-overwrite the target.
    """
    from datawarehouse_code_spark.operators.scd import scd2_merge

    if delta_available(spark):
        from delta.tables import DeltaTable
        from pyspark.sql import functions as F

        dim = spark.read.format("delta").load(target_path)
        merged = scd2_merge(dim, snapshot, key, tracked, load_date)
        # Only the changed rows feed the MERGE (carried rows would
        # "update" to identical values — pure write amplification):
        # closed rows carry valid_to = load_date, opened rows carry
        # valid_from = load_date, and nothing else does.
        ld = F.to_date(F.lit(load_date))
        changes = merged.filter(
            F.col("valid_to").eqNullSafe(ld) | (F.col("valid_from") == ld)
        )
        # (key, valid_from) identifies a version row: a closed row
        # matches its stored open version (update-all flips
        # valid_to/is_current); an opened row matches nothing (insert).
        # Re-running the same load_date matches the opened rows to
        # their already-inserted versions and updates them to identical
        # values — idempotent.
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in [*key, "valid_from"])
        (
            DeltaTable.forPath(spark, target_path)
            .alias("t")
            .merge(changes.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return "delta"
    dim = spark.read.parquet(target_path)
    merged = scd2_merge(dim, snapshot, key, tracked, load_date)
    _staged_overwrite(spark, merged, target_path)
    return "parquet"
