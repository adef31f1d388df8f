"""Physical-layout operators: Z-order (Morton) clustering for
multi-column data skipping.

Reference context: the reference's only layout levers are the fact
table's year range partitions and InnoDB secondary indexes
(warehouse.py:183-200, O17/O18).  Partitioning covers ONE predicate
dimension; a secondary index has no parquet equivalent.  The
lakehouse answer to "queries filter on several columns" is Z-order
clustering: interleave the bits of the clustering columns into one
Morton value, range-partition + sort by it, and every file/row-group
ends up covering a small HYPERCUBE of the key space instead of a thin
slab of one column — so parquet min/max footer stats prune reads for
predicates on ANY prefix-free subset of the clustered columns (the
same mechanism Delta OPTIMIZE ZORDER BY and Iceberg's sort orders
use).

Scale shape: one agg job for the per-column min/max, then a pure
narrow projection (the Morton expression — shiftright/and/or inside
whole-stage codegen), one repartitionByRange on the z-value (a range
shuffle with driver-side sampling, the same cost as any sorted
write), sortWithinPartitions, write.  No Python, no driver data
paths, no global single-partition sort.

Skew note: `width_bucket` over [min, max] assumes roughly uniform
value spread; for heavily skewed columns pass explicit `bounds` from
`approxQuantile` so buckets equalize row counts instead of value
ranges — the operator takes either.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave the low `bits` bits of the given bucket ids into one
    Morton code: result bit (b * k + i) = bit b of column i (k =
    number of columns).  Inputs must already lie in [0, 2^bits); the
    output fits in a BIGINT for bits * k <= 63.

    Built as a flat OR-fold of bits*k shift/and terms — ~48 expression
    nodes for 3 columns × 16 bits, well under any codegen limit (the
    similarity.py plane-matrix lesson: keep literal trees small and
    flat)."""
    k = len(bucket_cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed BIGINT")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(bucket_cols):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write `df` as parquet clustered by the Z-order of `cols`.

    Each clustering column is bucketized to [0, 2^bits) with
    `width_bucket` over its [min, max] (computed in ONE agg job, or
    taken from `bounds` — pass approxQuantile-derived bounds for
    skewed columns), the bucket ids are Morton-interleaved, and the
    frame is range-partitioned + sorted by the z-value into `n_files`
    output files.  NULLs bucket to 0 (the lowest hypercube corner) so
    they cluster together instead of scattering.

    The z column is dropped before the write — layout is physical,
    the schema is unchanged, and any reader prunes via ordinary
    parquet min/max stats with zero reader-side cooperation.
    """
    if not cols:
        raise ValueError("zorder_write needs at least one clustering column")
    need = [c for c in cols if bounds is None or c not in bounds]
    stats: dict[str, tuple[float, float]] = dict(bounds or {})
    if need:
        row = df.agg(
            *[F.min(c).cast("double").alias(f"mn_{c}") for c in need],
            *[F.max(c).cast("double").alias(f"mx_{c}") for c in need],
        ).collect()[0]
        for c in need:
            stats[c] = (row[f"mn_{c}"], row[f"mx_{c}"])
    n_buckets = 1 << bits
    buckets = []
    for c in cols:
        mn, mx = stats[c]
        if mn is None or mx is None or mn == mx:
            # constant or all-NULL column contributes nothing to the
            # ordering; bucket 0 keeps the interleave well-defined
            buckets.append(F.lit(0))
            continue
        wb = F.expr(
            f"width_bucket(CAST({c} AS DOUBLE), {mn!r}, {mx!r}, {n_buckets - 1})"
        )
        # width_bucket: 0 below min, n+1 above max, else 1..n; NULL in
        # -> NULL out.  Clamp into [0, 2^bits) and send NULLs to 0.
        buckets.append(
            F.coalesce(F.least(F.greatest(wb - 1, F.lit(0)), F.lit(n_buckets - 1)),
                       F.lit(0))
        )
    z = morton_interleave(buckets, bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def collect_file_stats(
    spark: "SparkSession", path: str, cols: list[str]
) -> DataFrame:
    """Per-file (min, max, n_nulls, n_rows) for each of `cols` — the
    standalone-parquet equivalent of the stats Delta/Iceberg keep in
    table metadata, enabling QUERY-TIME file pruning without opening
    any footer (prune_files) and layout audits (how well did
    zorder_write cluster?).

    Built distributedly: scan pruned to `cols` + the `_metadata`
    hidden column, one groupBy on file_path.  One pass over the table
    at BUILD time (amortized across every pruned read after it, the
    same trade every table format makes); the manifest itself is
    one row per file — negligible at any scale.

    Schema: file_path, n_rows, then per column c: mn_{c}, mx_{c},
    nulls_{c}.
    """
    if not cols:
        raise ValueError("collect_file_stats needs at least one column")
    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("file_path"), *cols
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulls_{c}"),
        ]
    return df.groupBy("file_path").agg(*aggs)


def prune_files(
    manifest: DataFrame, predicates: dict[str, tuple[object, object]]
) -> list[str]:
    """File paths that MIGHT contain rows satisfying every [lo, hi]
    interval predicate (inclusive; None = unbounded on that side) —
    a file survives unless some column's [mn, mx] is disjoint from
    its interval.  All-NULL columns (mn/mx NULL) survive pruning:
    NULL comparisons are unknowable from stats, the row-level filter
    decides.

    The collect here is the file LIST (manifest-sized, one string per
    file), not data — the same driver-side step every table format's
    scan planner performs.
    """
    keep = manifest
    for c, (lo, hi) in predicates.items():
        if f"mn_{c}" not in manifest.columns:
            raise ValueError(f"manifest has no stats for column {c!r}")
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(f"mx_{c}") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(f"mn_{c}") <= F.lit(hi))
        # NULL stats (all-NULL file) -> cond NULL -> keep the file
        keep = keep.filter(cond | F.col(f"mn_{c}").isNull())
    return [r["file_path"] for r in keep.select("file_path").collect()]


def read_pruned(
    spark: "SparkSession",
    path: str,
    manifest: DataFrame,
    predicates: dict[str, tuple[object, object]],
) -> DataFrame:
    """Read only the files the manifest can't rule out, then apply
    the interval predicates as ordinary row-level filters (file stats
    are coarse — a surviving file still holds non-matching rows).
    Returns an empty, correctly-typed frame when nothing survives.

    Semantics contract: equals the full-scan filter exactly (pytest
    asserts it); the win is I/O — with a Z-ordered layout a narrow
    band on ANY clustered column keeps a small fraction of files,
    BEFORE parquet footer/row-group pruning sees a byte.
    """
    files = prune_files(manifest, predicates)
    full = spark.read.parquet(path)
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            cond = cond & (F.col(c) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(c) <= F.lit(hi))
    if not files:
        return full.filter(F.lit(False))
    return spark.read.schema(full.schema).parquet(*files).filter(cond)
