"""Bench-grade write-amplification + skew contract for the bucketed
keyed-replace layout (r14 verdict asks #3 and #4).

sources/bucketed.py PROMISES O(|touched buckets|) maintenance; the
crash-matrix tests in test_bucketed.py pin *which* files move, not
*how much*.  This module measures the amplification itself: identical
micro-batch sequences against a 64-bucket layout vs the flat
whole-table staged swap (sources/acid.replace_keyed — what every
maintainer used before round 14), asserting that bytes written and
files rewritten scale with the touched buckets, not the corpus.
Measured numbers are recorded in SCALE.md ("Bucketed keyed-replace —
measured write amplification").

Skew: `_kb = pmod(hash(key), n)` inherits KEY skew but not ROW skew
across keys — all rows of one key must co-locate (the pruned delete
finds them by bucket), so one hot key's mass is the irreducible
rewrite floor of any keyed layout: replacing a key means rewriting
its rows wherever they live.  The contract the planted-hot-key test
pins: (a) a hot key inflates ONLY its own bucket — cold-key
maintenance never rewrites the hot bucket; (b) replacing the hot key
rewrites ~its bucket (cold corpus untouched); (c) bucket size is
bounded by |corpus|/n_buckets plus the hot keys' own mass (Murmur3
spreads distinct keys ~uniformly; no salt can help a keyed-replace
layout, because salting a key across buckets would force every delete
of that key to touch all its salted buckets).
"""

from __future__ import annotations

import os

import pytest

from datawarehouse_code_spark.sources.acid import replace_keyed
from datawarehouse_code_spark.sources.bucketed import (
    BUCKET_COL,
    bucket_expr,
    replace_keyed_bucketed,
    write_bucketed,
)


def _doc_frame(spark, ids, salt=""):
    """One row per key with an INCOMPRESSIBLE ~416-byte payload
    (md5-derived, unique per row) — constant payloads snappy-compress
    to nothing and per-file parquet overhead then swamps the data
    bytes the amplification measurement is about."""
    from pyspark.sql import functions as F

    ids_df = spark.createDataFrame([(i,) for i in ids], "doc_id BIGINT")
    return ids_df.select(
        "doc_id",
        F.concat(
            *[
                F.md5(F.concat_ws(":", F.lit(salt), F.lit(k), F.col("doc_id")))
                for k in range(13)
            ]
        ).alias("payload"),
    )


def _snapshot(root):
    """{relpath: (size, mtime_ns)} of every parquet data file."""
    out = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(dirpath, name)
            st = os.stat(full)
            out[os.path.relpath(full, root)] = (st.st_size, st.st_mtime_ns)
    return out


def _rewritten(before, after):
    """(files, bytes) present in `after` that are new or changed —
    the data the batch physically wrote into the live table."""
    changed = [p for p, meta in after.items() if before.get(p) != meta]
    return changed, sum(after[p][0] for p in changed)


def _table_bytes(snap):
    return sum(size for size, _ in snap.values())


N_KEYS = 20000
N_BUCKETS = 64
BATCHES = [list(range(b * 5, b * 5 + 5)) for b in range(1, 6)]


@pytest.mark.slow  # minutes-long (r15 advice: the "slow" marker
# exists for quick-iteration deselection, and these two qualify)
def test_write_amplification_bucketed_vs_flat(spark, tmp_path):
    """Five 5-key micro-batches against a 20000-key corpus: the
    bucketed lane must rewrite O(touched buckets) files/bytes per
    batch while the flat staged swap rewrites the whole table — the
    shape that decides whether per-micro-batch index maintenance is
    affordable at 100 TB."""
    corpus = _doc_frame(spark, range(N_KEYS))

    bucketed_path = str(tmp_path / "bucketed")
    flat_path = str(tmp_path / "flat")
    write_bucketed(spark, corpus, bucketed_path, ["doc_id"], n_buckets=N_BUCKETS)
    corpus.write.mode("overwrite").parquet(flat_path)

    b_total = _table_bytes(_snapshot(bucketed_path))
    f_total = _table_bytes(_snapshot(flat_path))

    b_bytes = f_bytes = 0
    b_files = f_files = 0
    touched_total = 0
    for batch_ids in BATCHES:
        updates = _doc_frame(spark, batch_ids, salt="upd")

        before = _snapshot(bucketed_path)
        touched = replace_keyed_bucketed(
            spark, bucketed_path, updates, ["doc_id"]
        )
        files, nbytes = _rewritten(before, _snapshot(bucketed_path))
        # every rewritten file sits inside a touched bucket's dir —
        # the cold corpus is never re-staged
        touched_dirs = {f"{BUCKET_COL}={b}" for b in touched}
        for f in files:
            assert f.split(os.sep)[0] in touched_dirs, (
                f"rewrote {f} outside touched buckets {sorted(touched)}"
            )
        # bytes scale with the touched fraction of the corpus (2x
        # slack for parquet per-file overhead on small buckets)
        frac = len(touched) / N_BUCKETS
        assert nbytes <= 2 * frac * b_total + 64 * 1024, (
            f"bucketed batch rewrote {nbytes}B for {len(touched)}/"
            f"{N_BUCKETS} buckets of a {b_total}B table"
        )
        b_bytes += nbytes
        b_files += len(files)
        touched_total += len(touched)

        before = _snapshot(flat_path)
        replace_keyed(spark, flat_path, updates, ["doc_id"])
        files, nbytes = _rewritten(before, _snapshot(flat_path))
        # the flat lane pays the whole corpus every batch
        assert nbytes >= 0.9 * f_total
        f_bytes += nbytes
        f_files += len(files)

    # identical end states (layout is a storage detail)
    from datawarehouse_code_spark.sources.bucketed import read_keyed_table

    b_rows = sorted(map(tuple, read_keyed_table(spark, bucketed_path).collect()))
    f_rows = sorted(map(tuple, read_keyed_table(spark, flat_path).collect()))
    assert b_rows == f_rows and len(b_rows) == N_KEYS

    # the headline bound: cumulative amplification at least 4x apart
    # (measured ~13x at this geometry; 4x keeps the assert unflaky)
    assert b_bytes * 4 < f_bytes, (
        f"bucketed lane wrote {b_bytes}B vs flat {f_bytes}B over "
        f"{len(BATCHES)} batches — amplification advantage collapsed"
    )
    print(
        f"\nWRITE-AMP measured: corpus={b_total}B bucketed / {f_total}B flat; "
        f"5 batches x 5 keys: bucketed {b_bytes}B in {b_files} files "
        f"({touched_total} touched buckets), flat {f_bytes}B in {f_files} "
        f"files; advantage {f_bytes / max(b_bytes, 1):.1f}x"
    )


@pytest.mark.slow  # minutes-long (r15 advice: the "slow" marker
# exists for quick-iteration deselection, and these two qualify)
def test_planted_hot_key_skew_contract(spark, tmp_path):
    """One key carrying 100x the per-key mass (the planted-skew bot
    user shape): its bucket grows by exactly its mass, cold-key
    maintenance never touches it, and replacing it costs ~its bucket
    — not the corpus."""
    n = 16
    cold_ids = [i for i in range(400)]
    hot_id = 10_000
    cold = _doc_frame(spark, cold_ids)  # 1 row/key
    hot = spark.createDataFrame(
        [(hot_id, j) for j in range(100)],  # 100 rows, one key
        "doc_id BIGINT, part INT",
    )
    from pyspark.sql import functions as F

    hot = hot.select(
        "doc_id", "part",
        F.concat(*[
            F.md5(F.concat_ws(":", F.lit(k), F.col("doc_id"), F.col("part")))
            for k in range(13)
        ]).alias("payload"),
    )
    # widen cold to the same schema
    cold = cold.withColumn("part", F.lit(0)).select("doc_id", "part", "payload")
    path = str(tmp_path / "t")
    write_bucketed(
        spark, cold.unionByName(hot), path, ["doc_id"], n_buckets=n
    )

    hot_bucket = (
        spark.range(1)
        .select(F.lit(hot_id).cast("bigint").alias("doc_id"))
        .select(bucket_expr(["doc_id"], n).alias("b"))
        .collect()[0]["b"]
    )
    snap = _snapshot(path)
    hot_dir = f"{BUCKET_COL}={hot_bucket}"
    hot_bytes = sum(s for p, (s, _) in snap.items() if p.startswith(hot_dir))
    total = _table_bytes(snap)
    # (c) the bound: the hot bucket is its uniform share plus the hot
    # key's own mass — not a runaway fraction of the corpus beyond it
    uniform_share = (total - hot_bytes) / (n - 1)
    assert hot_bytes < 3 * uniform_share + 2 * (100 * 416), (
        f"hot bucket {hot_bytes}B exceeds uniform share "
        f"{uniform_share:.0f}B + planted mass"
    )

    # (a) cold-key maintenance never rewrites the hot bucket — pick
    # five keys that hash elsewhere
    cold_pick = [
        r["doc_id"]
        for r in spark.createDataFrame([(c,) for c in cold_ids], "doc_id BIGINT")
        .withColumn("b", bucket_expr(["doc_id"], n))
        .filter(F.col("b") != hot_bucket)
        .limit(5)
        .collect()
    ]
    cold_updates = (
        _doc_frame(spark, cold_pick, salt="z")
        .withColumn("part", F.lit(0))
        .select("doc_id", "part", "payload")
    )
    before = _snapshot(path)
    touched = replace_keyed_bucketed(spark, path, cold_updates, ["doc_id"])
    files, _ = _rewritten(before, _snapshot(path))
    assert hot_bucket not in touched
    assert all(not f.startswith(hot_dir) for f in files)

    # (b) replacing the hot key rewrites ~its bucket only
    hot_update = spark.createDataFrame(
        [(hot_id, 0, "H" * 416)], "doc_id BIGINT, part INT, payload STRING"
    )
    before = _snapshot(path)
    touched = replace_keyed_bucketed(spark, path, hot_update, ["doc_id"])
    files, nbytes = _rewritten(before, _snapshot(path))
    assert touched == [hot_bucket]
    assert all(f.startswith(hot_dir) for f in files)
    assert nbytes < 0.5 * total  # its bucket, not the corpus

    # correctness: 100-row hot key collapsed to the single update row
    from datawarehouse_code_spark.sources.bucketed import read_keyed_table

    out = read_keyed_table(spark, path)
    assert out.filter(F.col("doc_id") == hot_id).count() == 1
    assert out.count() == len(cold_ids) + 1
