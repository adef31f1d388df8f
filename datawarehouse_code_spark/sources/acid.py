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

For keyed tables maintained per micro-batch, sources/bucketed.py is
the parquet-native middle ground: hash-bucket partitioning +
partition-grain staged swaps make replace-keyed cost
O(|touched buckets|) instead of O(corpus) without any table-format
jar (the streaming index maintainers opt in via n_buckets=).
"""

from __future__ import annotations

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


def _fs_for(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Hadoop Path) for `path` — resolves plain
    posix paths, `file:` URIs, and any filesystem the session's Hadoop
    conf knows (HDFS, object stores).  All swap/probe operations below
    go through this API so the adapter's behavior is uniform across
    schemes; note directory rename is atomic on posix/HDFS but NOT on
    S3-style object stores (there it degrades to copy+delete — the
    crash-ordering guarantee weakens to 'recoverable', not 'atomic')."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _sibling(spark: SparkSession, hpath, suffix: str):
    return spark._jvm.org.apache.hadoop.fs.Path(
        hpath.getParent(), hpath.getName() + suffix
    )


def recover_interrupted_swap(spark: SparkSession, path: str) -> str | None:
    """Repair a `_staged_overwrite` that crashed mid-swap, restoring
    the invariant 'the target path holds one complete table'.

    Crash states and their repair (returns the action taken):
    - target live, stale `._old` beside it → crash AFTER the staged
      rename landed; the leftover old copy is redundant → delete it
      (``cleaned_stale_old``).
    - target absent, staged copy complete (its `_SUCCESS` marker
      exists) → crash between the two renames → finish the swap:
      rename staged in, drop `._old` (``rolled_forward``).
    - target absent, staged copy incomplete, `._old` present → the
      old table is the only complete copy → rename it back
      (``rolled_back``).
    - anything else (fresh path, or a partial `._staging` beside a
      live target from a crashed write) → nothing to do; the next
      staged write overwrites the partial staging (None).

    Callers MUST run this before probing table existence: after a
    mid-swap crash the target is briefly absent while both copies
    exist, and treating that as 'no table' would re-create the table
    from one batch and destroy the rest (the exact silent-loss window
    this closes).
    """
    fs, p = _fs_for(spark, path)
    staged = _sibling(spark, p, "._staging")
    old = _sibling(spark, p, "._old")
    if fs.exists(p):
        if fs.exists(old):
            fs.delete(old, True)
            return "cleaned_stale_old"
        return None
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    if fs.exists(jvm_path(staged, "_SUCCESS")):
        fs.rename(staged, p)
        if fs.exists(old):
            fs.delete(old, True)
        return "rolled_forward"
    if fs.exists(old):
        fs.rename(old, p)
        return "rolled_back"
    return None


def table_exists(spark: SparkSession, path: str) -> bool:
    """Does `path` hold a (complete) table?  Hadoop-FS-based so it is
    correct for `file:` URIs and remote filesystems, not just posix
    paths; runs swap recovery first so a mid-swap crash state reads as
    'exists' (via rollback/roll-forward), never as 'absent'."""
    recover_interrupted_swap(spark, path)
    fs, p = _fs_for(spark, path)
    return bool(fs.exists(p))


def _staged_overwrite(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
) -> None:
    """Write `df` beside `path`, then swap directories — never
    overwrites a dataset from its own live scan (the compact_parquet
    rule, pipeline.py).

    Crash ordering: the OLD table is renamed aside (atomic) before the
    staged result is renamed in (atomic), and only then deleted — data
    is never destroyed before its replacement is in place.  A crash
    between the two renames leaves the path momentarily absent but
    BOTH copies on disk (`._old` and `._staging`);
    `recover_interrupted_swap` (run here on entry, and by
    `table_exists`) completes or rolls back the swap.  A crash during
    the staged write leaves the old table untouched and live.

    ``partition_by`` stages a Hive-partitioned layout (the swap moves
    the whole directory, so partition dirs ride along unchanged —
    write_fact's year partitioning uses this).
    """
    recover_interrupted_swap(spark, path)
    fs, p = _fs_for(spark, path)
    staged = _sibling(spark, p, "._staging")
    old = _sibling(spark, p, "._old")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staged.toString())
    _finish_staged_swap(fs, p, staged, old)


def _finish_staged_swap(fs, p, staged, old) -> None:
    """The whole-table swap tail every staged writer shares (here and
    sources/bucketed.write_bucketed): old aside → staged in → aside
    deleted, in the exact ordering recover_interrupted_swap repairs.
    ONE implementation on purpose — a protocol change that landed in
    only one copy would silently break the other's crash recovery."""
    if fs.exists(old):
        fs.delete(old, True)
    had_old = fs.exists(p)
    if had_old:
        fs.rename(p, old)
    fs.rename(staged, p)
    if had_old:
        fs.delete(old, True)


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
    recover_interrupted_swap(spark, target_path)
    current = spark.read.parquet(target_path)
    merged = current.join(updates, key, "left_anti").unionByName(updates)
    _staged_overwrite(spark, merged, target_path)
    return "parquet"


def replace_keyed(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: list[str],
    keys: DataFrame | None = None,
) -> str:
    """Keyed REPLACE for one-to-many payloads: every target row whose
    `key` value appears in `keys` (default: the update rows' own key
    set) is dropped, then the update rows are inserted.  This is the
    upsert variant for grains like a document's chunk rows — a
    re-delivered document that now produces FEWER rows leaves no stale
    residue, which a row-keyed upsert (matched-update /
    not-matched-insert) cannot guarantee.  Returns which path ran
    ('delta' | 'parquet').

    `keys` exists because "fewer rows" includes ZERO: a caller that
    filters the update rows (min-word chunks, media too short to
    fingerprint) produces no update row at all for such an item, so
    keying the delete on the update rows would leave the item's OLD
    rows behind — exactly the stale residue this function closes.
    Such callers must pass the batch's full key set (e.g.
    `batch.select("doc_id")`); it is distinct-ed here.

    Parquet: one anti-join on `key` + union + staged overwrite —
    atomic via the swap, crash-safe like upsert.  Delta: a
    MERGE-delete of the matched keys followed by an append — TWO
    commits, so a crash between them can briefly lose the replaced
    rows; callers must be replay-idempotent (every streaming caller
    here re-derives the identical rows from the same batch on
    replay, so the re-run completes the pair).

    The Delta branch engages only when the TARGET actually is a
    Delta table — the streaming index maintainers bootstrap their
    tables as plain parquet (_staged_overwrite), and running MERGE
    against a parquet directory just because the jar is on the
    classpath would fail at the log lookup."""
    del_keys = (keys if keys is not None else updates).select(*key).distinct()
    if delta_available(spark):
        from delta.tables import DeltaTable

        if not DeltaTable.isDeltaTable(spark, target_path):
            recover_interrupted_swap(spark, target_path)
            current = spark.read.parquet(target_path)
            merged = current.join(
                del_keys, key, "left_anti"
            ).unionByName(updates)
            _staged_overwrite(spark, merged, target_path)
            return "parquet"

        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in key)
        (
            DeltaTable.forPath(spark, target_path)
            .alias("t")
            .merge(del_keys.alias("s"), cond)
            .whenMatchedDelete()
            .execute()
        )
        updates.write.format("delta").mode("append").save(target_path)
        return "delta"
    recover_interrupted_swap(spark, target_path)
    current = spark.read.parquet(target_path)
    merged = current.join(del_keys, key, "left_anti").unionByName(updates)
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
    recover_interrupted_swap(spark, target_path)
    dim = spark.read.parquet(target_path)
    merged = scd2_merge(dim, snapshot, key, tracked, load_date)
    _staged_overwrite(spark, merged, target_path)
    return "parquet"
