"""Bucket-partitioned keyed-replace: O(|touched buckets|) maintenance
for key-sharded tables on plain parquet.

The plain-parquet `replace_keyed` (sources/acid.py) rewrites the WHOLE
target per call — atomic and simple, but at 100 TB a streaming index
maintainer calling it per micro-batch pays corpus-sized write
amplification for increment-sized updates (the gap Delta MERGE closes,
and this container ships no Delta jar; reference contrast:
/root/reference/warehouse.py leans on MySQL transactions for the same
problem at :50,:65).  This module is the parquet-native middle: the
table is laid out as hash buckets of the key
(``_kb = pmod(hash(key), n_buckets)`` as a REAL partition column), a
keyed replace rewrites only the buckets containing the batch's keys,
and a partition-grain staged-swap protocol keeps crashes recoverable:

1. the merged rows for the touched buckets are written to a staging
   directory beside the table (``<table>._bstaging``), partitioned by
   the same bucket column;
2. a commit marker (``_BUCKET_COMMIT``) is written INTO the staging
   dir recording, for every touched bucket, whether its new state is
   ``staged`` (a directory exists in staging) or ``empty`` (the
   replace left it with zero rows — "fewer rows includes zero");
3. buckets are swapped one at a time (live renamed aside →  staged
   renamed in → aside deleted; ``empty`` buckets are deletes), and
   the staging dir is deleted last.

A crash anywhere is repaired by :func:`recover_interrupted_bucket_swap`
on the next entry: staging WITHOUT the marker means no swap started —
roll back by deleting staging; staging WITH the marker means the
staged data is complete — roll FORWARD by replaying the per-bucket
swap, which is idempotent because each bucket's three states
(staged-present / live-present / aside-present) determine exactly how
far its swap got.  Aside directories are dot-prefixed
(``._old_kb=<k>``) so parquet's directory listing never reads them as
partitions.

Isolation contract (same as the whole-table swap): atomic per WRITER
and recoverable, not isolated from concurrent readers — a reader
listing the table mid-swap can see a bucket's old rows or, for one
rename window, miss the bucket.  Single-writer-per-table is the
deployment contract for every maintainer here; Delta's log is the
upgrade for snapshot isolation.

Skew contract (r14 verdict ask, pinned by
tests/test_bucketed_scale.py's planted-hot-key test at 100x one-key
mass): ``pmod(hash(key), n)`` spreads DISTINCT keys ~uniformly, so a
bucket's size is bounded by |corpus|/n_buckets plus the mass of any
hot keys hashing into it.  A hot key inflates ONLY its own bucket —
cold-key maintenance never rewrites it, and replacing the hot key
touches exactly its bucket — and that per-key mass is the
irreducible rewrite floor of ANY keyed layout (replacing a key means
rewriting its rows wherever they live).  Salting deliberately does
NOT exist here: spreading one key across salted buckets would force
every delete of that key to touch all of them, trading bounded bucket
size for unbounded touch count.  For genuinely hot multi-row keys,
cap rows-per-key upstream (the hot-key caps every candidate generator
in operators/text.py already applies) or raise ``n_buckets`` at
creation to shrink the cold share of the hot bucket.

Determinism contract: the bucket function is Spark's Murmur3 ``hash``
(pmod n_buckets).  It is stable across partitionings and sessions of
one deployment — which is all the layout needs, since buckets are
recomputed from keys at every write and the PERSISTED partition values
drive pruning — but it is Spark-specific, so ``n_buckets`` and the key
list are recorded in a ``_buckets.json`` sidecar inside the table and
validated on every maintenance call: silently changing either would
scatter keys across wrong buckets.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_code_spark.sources.acid import (
    _finish_staged_swap,
    _fs_for,
    _sibling,
    recover_interrupted_swap,
)

BUCKET_COL = "_kb"
_STAGING_SUFFIX = "._bstaging"
_ASIDE_PREFIX = "._old_kb="
_MARKER = "_BUCKET_COMMIT"
_META = "_buckets.json"


def bucket_expr(key: list[str], n_buckets: int) -> Column:
    """``pmod(hash(key...), n_buckets)`` — the ONE bucket definition
    (write path, maintenance path and tests all call this)."""
    return F.pmod(F.hash(*[F.col(k) for k in key]), F.lit(n_buckets))


def _jpath(spark: SparkSession, parent, name: str):
    return spark._jvm.org.apache.hadoop.fs.Path(parent, name)


def _write_text(spark: SparkSession, fs, jpath, text: str) -> None:
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, fs, jpath) -> str:
    stream = fs.open(jpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def bucketed_meta(spark: SparkSession, path: str) -> dict | None:
    """The table's ``_buckets.json`` sidecar ({"n_buckets", "key"}),
    or None when the table is not bucket-partitioned."""
    fs, p = _fs_for(spark, path)
    meta = _jpath(spark, p, _META)
    if not fs.exists(meta):
        return None
    return json.loads(_read_text(spark, fs, meta))


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: list[str],
    n_buckets: int = 64,
) -> None:
    """Create (or fully rebuild) a bucket-partitioned table: ``df``
    plus the derived ``_kb`` partition column, written through the
    same whole-table staged swap as ``_staged_overwrite`` (crash
    recovery rides the existing ``recover_interrupted_swap``), with
    the ``_buckets.json`` sidecar inside the table.

    The sidecar is written into staging AFTER the parquet job (the
    write wipes the directory), so a crash exactly between them can
    roll forward a table without its sidecar; maintenance then fails
    LOUDLY (bucketed_meta → ValueError) instead of guessing a bucket
    function — recreate via this function."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1 (got {n_buckets})")
    recover_interrupted_swap(spark, path)
    recover_interrupted_bucket_swap(spark, path)
    fs, p = _fs_for(spark, path)
    staged = _sibling(spark, p, "._staging")
    old = _sibling(spark, p, "._old")
    (
        df.withColumn(BUCKET_COL, bucket_expr(key, n_buckets))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(staged.toString())
    )
    # a zero-row df partitions into NO bucket dirs (and, unlike a
    # plain parquet write, no footer file at all) — the table root
    # would be unreadable.  Anchor the schema with one empty bucket-0
    # part, in staging so the swap stays atomic; the same fix as
    # replace_keyed_bucketed's emptying-replace anchor, for the
    # empty-CREATION window a gate hits when its first batch yields
    # zero rows for a table (round-14 review find, reproduced live).
    has_bucket = any(
        st.getPath().getName().startswith(f"{BUCKET_COL}=")
        for st in fs.listStatus(staged)
    )
    if not has_bucket:
        spark.createDataFrame([], df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(_jpath(spark, staged, f"{BUCKET_COL}=0").toString())
    _write_text(
        spark, fs, _jpath(spark, staged, _META),
        json.dumps({"n_buckets": n_buckets, "key": list(key)}),
    )
    _finish_staged_swap(fs, p, staged, old)


def rebucket_table(
    spark: SparkSession,
    path: str,
    n_buckets: int,
    key: list[str] | None = None,
) -> None:
    """Migrate a keyed table to a new bucket count (or bucket a plain
    table for the first time) — the lifecycle escape hatch for the
    "``n_buckets`` is a creation-time choice" rule: a table whose
    buckets outgrow executor-comfortable swap sizes (corpus growth,
    or a key turning hot) gets a one-shot whole-table rewrite here
    and O(|touched buckets|) maintenance resumes at the new grain.

    Reads through the layout-transparent reader (both recoveries run
    first) and rewrites via :func:`write_bucketed`, so the migration
    rides the same whole-table staged swap + sidecar protocol as
    creation — a crash mid-migration leaves the OLD table intact
    (pre-swap) or the NEW layout complete (post-swap), never a mix.

    ``key`` defaults to the existing sidecar's key; bucketing a PLAIN
    table requires it explicitly.  A no-op (same n_buckets, same key)
    returns without rewriting."""
    # repair-first like every other entry point: a crashed whole-table
    # swap can leave the live dir aside, and probing the sidecar
    # through that window would misread a bucketed table as plain
    recover_interrupted_swap(spark, path)
    recover_interrupted_bucket_swap(spark, path)
    meta = bucketed_meta(spark, path)
    if key is None:
        if meta is None:
            raise ValueError(
                f"{path} is not bucketed and no key was given — pass "
                "key=[...] to bucket a plain table"
            )
        key = list(meta["key"])
    if meta is not None and int(meta["n_buckets"]) == n_buckets and list(
        meta["key"]
    ) == list(key):
        return
    current = read_keyed_table(spark, path)
    # the staged swap builds the new table BESIDE the live one, but the
    # write job's scan reads the live files lazily during the staging
    # write — which is safe (staging never mutates live) — while the
    # swap itself happens only after the staged write completed.
    write_bucketed(spark, current, path, key, n_buckets=n_buckets)


def _read_no_layout(spark: SparkSession, path: str) -> DataFrame:
    """The ONE post-recovery read both readers share: the layout
    column is dropped unconditionally (a no-op on plain tables —
    BUCKET_COL is reserved, documented in the module contract), so a
    layout change lands in exactly one place."""
    return spark.read.parquet(path).drop(BUCKET_COL)


def read_bucketed(spark: SparkSession, path: str) -> DataFrame:
    """Read a bucketed table WITHOUT the layout column — callers see
    the exact schema they wrote (the bucket column is a storage
    detail; leaking it would poison unionByName/schema-pinned
    consumers).  Runs both recoveries first, like table_exists."""
    recover_interrupted_swap(spark, path)
    recover_interrupted_bucket_swap(spark, path)
    return _read_no_layout(spark, path)


def read_keyed_table(spark: SparkSession, path: str) -> DataFrame:
    """Layout-transparent read of a keyed table — either layout, the
    caller sees the written schema (no layout column) and any
    half-done swap is repaired first.  The reader every
    maintainer/gate should use on a table whose layout the CALLER
    did not choose (the layout is a property of the table).  No
    sidecar probe: the unconditional layout-column drop is a no-op
    on plain tables, saving one filesystem read per call."""
    recover_interrupted_swap(spark, path)
    recover_interrupted_bucket_swap(spark, path)
    return _read_no_layout(spark, path)


def replace_keyed_auto(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: list[str],
    keys: DataFrame | None = None,
    n_buckets: int | None = None,
) -> None:
    """Layout-transparent keyed REPLACE: the TABLE's layout wins —
    a bucketed sidecar routes to replace_keyed_bucketed (O(|touched
    buckets|)), a plain table to sources/acid.replace_keyed (whole-
    table staged swap / Delta when applicable).  A missing table is
    created bucketed when `n_buckets` is given, plain otherwise —
    i.e. `n_buckets` is a CREATION-TIME choice and is ignored (not
    validated) against an existing table, so a maintainer run without
    it keeps maintaining a bucketed table correctly instead of
    failing on the layout column (the stickiness a long-lived index
    needs: the layout decision is made once, at birth)."""
    from datawarehouse_code_spark.sources.acid import (
        _staged_overwrite,
        replace_keyed,
        table_exists,
    )

    recover_interrupted_bucket_swap(spark, target_path)
    if table_exists(spark, target_path):
        meta = bucketed_meta(spark, target_path)
        if meta is not None:
            replace_keyed_bucketed(
                spark, target_path, updates, key, keys=keys, meta=meta
            )
        else:
            replace_keyed(spark, target_path, updates, key, keys=keys)
    elif n_buckets is not None:
        write_bucketed(spark, updates, target_path, key, n_buckets=n_buckets)
    else:
        _staged_overwrite(spark, updates, target_path)


def upsert_auto(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: list[str],
    n_buckets: int | None = None,
) -> None:
    """Layout-transparent keyed UPSERT (updates win per key), same
    stickiness rule as replace_keyed_auto.  On the bucketed lane the
    upsert IS replace_keyed_bucketed keyed on the update rows: every
    caller here upserts one collapsed row per key, for which
    delete-keys-then-insert and matched-update/not-matched-insert
    coincide."""
    from datawarehouse_code_spark.sources.acid import (
        _staged_overwrite,
        table_exists,
        upsert,
    )

    recover_interrupted_bucket_swap(spark, target_path)
    if table_exists(spark, target_path):
        meta = bucketed_meta(spark, target_path)
        if meta is not None:
            replace_keyed_bucketed(
                spark, target_path, updates, key, meta=meta
            )
        else:
            upsert(spark, target_path, updates, key)
    elif n_buckets is not None:
        write_bucketed(spark, updates, target_path, key, n_buckets=n_buckets)
    else:
        _staged_overwrite(spark, updates, target_path)


def _apply_bucket_swap(spark: SparkSession, fs, p, staging, plan: dict) -> None:
    """Execute (or re-execute — every step is state-guarded, so this
    is the recovery path too) the per-bucket swaps of a committed
    staging dir, then delete it."""
    for k, kind in plan.items():
        live = _jpath(spark, p, f"{BUCKET_COL}={k}")
        aside = _jpath(spark, p, f"{_ASIDE_PREFIX}{k}")
        stagedk = _jpath(spark, staging, f"{BUCKET_COL}={k}")
        if kind == "staged":
            if fs.exists(stagedk):
                if fs.exists(live) and not fs.exists(aside):
                    fs.rename(live, aside)
                if not fs.exists(live):
                    fs.rename(stagedk, live)
            if fs.exists(aside):
                fs.delete(aside, True)
        else:  # "empty": the replace left this bucket with zero rows
            if fs.exists(live):
                fs.delete(live, True)
            if fs.exists(aside):
                fs.delete(aside, True)
    fs.delete(staging, True)


def recover_interrupted_bucket_swap(
    spark: SparkSession, path: str
) -> str | None:
    """Repair a ``replace_keyed_bucketed`` that crashed mid-commit.

    - staging present WITHOUT the marker → the staged write itself
      crashed; no bucket was touched → delete staging
      (``rolled_back``).
    - staging present WITH the marker → the staged data is complete
      and swaps may have partially run → replay the per-bucket swap
      plan, which the per-bucket state guards make idempotent
      (``rolled_forward``).
    - no staging → nothing mid-flight; stray dot-prefixed aside dirs
      (unreachable by readers) are swept if present
      (``swept_asides``)."""
    fs, p = _fs_for(spark, path)
    staging = _sibling(spark, p, _STAGING_SUFFIX)
    if not fs.exists(staging):
        swept = False
        if fs.exists(p) and fs.getFileStatus(p).isDirectory():
            for st in fs.listStatus(p):
                name = st.getPath().getName()
                if name.startswith(_ASIDE_PREFIX):
                    fs.delete(st.getPath(), True)
                    swept = True
        return "swept_asides" if swept else None
    marker = _jpath(spark, staging, _MARKER)
    if not fs.exists(marker):
        fs.delete(staging, True)
        return "rolled_back"
    plan = json.loads(_read_text(spark, fs, marker))["buckets"]
    _apply_bucket_swap(spark, fs, p, staging, plan)
    return "rolled_forward"


def replace_keyed_bucketed(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: list[str],
    keys: DataFrame | None = None,
    meta: dict | None = None,
) -> list[int]:
    """``replace_keyed`` for a bucket-partitioned table: every target
    row whose key appears in ``keys`` (default: the update rows' key
    set) is dropped and the update rows inserted — but only the
    buckets containing those keys are read (partition-pruned scan)
    and rewritten (partition-grain staged swap).  Cost per call is
    O(|touched buckets|), not O(corpus): the write-amplification
    shape a per-micro-batch index maintainer needs at 100 TB.

    Same semantics as replace_keyed including the ``keys=`` zero-row
    closure (an item re-delivered with no update rows still sheds its
    old rows — its bucket is touched via ``keys`` and simply loses the
    rows).  Returns the touched bucket ids (diagnostics/tests).

    Replay-idempotent for the streaming maintainers: identical
    payloads re-derive identical update rows, so re-running the
    replace converges to the same buckets byte-for-byte.

    `meta` is the pre-recovered fast path for the auto helpers: a
    caller that ALREADY ran both recoveries and read the sidecar in
    this same operation passes it to skip the repeat filesystem
    probes (several redundant namenode/object-store RPCs per
    micro-batch otherwise).  Direct callers leave it None."""
    if meta is None:
        recover_interrupted_swap(spark, target_path)
        recover_interrupted_bucket_swap(spark, target_path)
        meta = bucketed_meta(spark, target_path)
    if meta is None:
        raise ValueError(
            f"{target_path} is not a bucketed table (missing {_META} — "
            "create it with write_bucketed; a creation crash in the "
            "sidecar window also lands here, recreate in that case)"
        )
    if list(meta["key"]) != list(key):
        raise ValueError(
            f"bucketed table {target_path} is keyed on {meta['key']}, "
            f"caller asked {key} — refusing a mismatched layout"
        )
    n_buckets = int(meta["n_buckets"])
    kb = bucket_expr(key, n_buckets)
    del_keys = (keys if keys is not None else updates).select(*key).distinct()
    # touched = buckets holding deleted keys ∪ buckets receiving
    # update rows (the contract says update keys ⊆ del_keys, but the
    # union makes a violating caller write correctly instead of
    # appending into an unswapped bucket)
    touched = sorted(
        r["b"]
        for r in del_keys.select(kb.alias("b"))
        .unionByName(updates.select(kb.alias("b")))
        .distinct()
        .collect()
    )
    if not touched:
        return []
    fs, p = _fs_for(spark, target_path)
    staging = _sibling(spark, p, _STAGING_SUFFIX)
    if fs.exists(staging):  # unreachable after recovery, belt only
        fs.delete(staging, True)
    current = spark.read.parquet(target_path)
    cur_touched = current.filter(
        F.col(BUCKET_COL).isin([int(b) for b in touched])
    ).drop(BUCKET_COL)
    merged = (
        cur_touched.join(del_keys, key, "left_anti")
        .unionByName(updates)
        .withColumn(BUCKET_COL, kb)
    )
    merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(
        staging.toString()
    )
    present = {
        st.getPath().getName().split("=", 1)[1]
        for st in fs.listStatus(staging)
        if st.getPath().getName().startswith(f"{BUCKET_COL}=")
    }
    # a replace that emptied the ENTIRE table would leave a root with
    # no bucket dirs — unreadable (parquet schema inference needs at
    # least one footer).  Anchor the schema by STAGING one empty
    # bucket part and marking it 'staged' BEFORE the commit marker,
    # so the anchor rides the same crash protocol: a roll-forward
    # from any crash window installs it too (round-14 self-review
    # find; review hardened it from a post-swap write, which a crash
    # inside the swap would have skipped).
    if not present:
        live_outside = {
            st.getPath().getName().split("=", 1)[1]
            for st in fs.listStatus(p)
            if st.getPath().getName().startswith(f"{BUCKET_COL}=")
        } - {str(b) for b in touched}
        if not live_outside:
            anchor = str(touched[0])
            spark.createDataFrame(
                [], cur_touched.schema
            ).coalesce(1).write.mode("overwrite").parquet(
                _jpath(spark, staging, f"{BUCKET_COL}={anchor}").toString()
            )
            present = {anchor}
    plan = {
        str(b): ("staged" if str(b) in present else "empty")
        for b in touched
    }
    _write_text(
        spark, fs, _jpath(spark, staging, _MARKER),
        json.dumps({"buckets": plan}),
    )
    _apply_bucket_swap(spark, fs, p, staging, plan)
    return [int(b) for b in touched]
