"""Slowly-changing-dimension (type 2) merge.

The reference manages dimensions as insert-if-not-exists only
(warehouse.py:78-94): a changed attribute is silently skipped, so the
warehouse forgets history.  The classic completion of that load
pattern is SCD type 2 — close the superseded row, open a new one —
which the reference's MySQL would express as a multi-statement
UPDATE+INSERT transaction per changed key.  Spark-first it is one
join + three branch projections + a union, all set-based:

  changed  = current ⋈ snapshot where any tracked column differs
  closed   = changed current rows with valid_to := load_date
  opened   = changed-or-new snapshot rows with valid_from := load_date
  carried  = everything else, untouched

Scale shape: ONE shuffle (the key equi-join between the current slice
and the snapshot); history rows are carried through without touching
the join; the three output branches are projections of the two join
sides, so the whole merge is a single stage after the join.  No
windows, no driver materialization.  On a Delta/Iceberg table the
same plan lands as MERGE WHEN MATCHED/WHEN NOT MATCHED; on plain
parquet the result df overwrites the dimension atomically via the
job-commit protocol (same guarantee as O22/O24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCD2_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(snapshot: DataFrame, load_date: str) -> DataFrame:
    """Bootstrap an SCD2 dimension from a first snapshot: every row
    opens at `load_date` and is current."""
    return snapshot.select(
        "*",
        F.to_date(F.lit(load_date)).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    dim: DataFrame,
    snapshot: DataFrame,
    key: list[str],
    tracked: list[str],
    load_date: str,
) -> DataFrame:
    """Merge a full `snapshot` (natural key + tracked attributes) into
    an SCD2 `dim` (same columns + valid_from/valid_to/is_current).

    - new key        → open (valid_from=load_date, current)
    - tracked change → close the current row at load_date + open a new one
    - unchanged      → carried through untouched
    - key absent from snapshot → carried through (no implicit deletes;
      deletions are a policy decision, not a default)

    NULL-safe change detection: a tracked column going NULL→value or
    value→NULL counts as a change (struct equality is null-safe).
    """
    missing = [c for c in SCD2_COLS if c not in dim.columns]
    if missing:
        raise ValueError(f"scd2_merge: dim lacks SCD2 columns {missing}")
    want = set(dim.columns) - set(SCD2_COLS)
    if set(snapshot.columns) != want:
        raise ValueError(
            f"scd2_merge: snapshot columns {sorted(snapshot.columns)} != dim "
            f"business columns {sorted(want)}"
        )
    if set(key) | set(tracked) != want:
        raise ValueError(
            "scd2_merge: key+tracked must cover every business column "
            f"(missing {sorted(want - set(key) - set(tracked))})"
        )

    ld = F.to_date(F.lit(load_date))
    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    snap = snapshot.select(
        *key, F.struct(*[F.col(c).alias(c) for c in tracked]).alias("_new")
    )
    cur = current.withColumn(
        "_old", F.struct(*[F.col(c).alias(c) for c in tracked])
    )
    # ONE key equi-join, executed once: filtering the join output per
    # branch and unioning would re-run the join subtree once per branch
    # (4 physical joins for 1 logical one — plan-audited in
    # tests/test_scale_mechanics.py).  Instead each joined row explodes
    # into its 1-2 output rows in the same pass.
    joined = cur.join(snap, key, "full_outer")
    dim_cols = dim.columns

    def _row(overrides: dict) -> F.Column:
        return F.struct(
            *[overrides.get(c, F.col(c)).alias(c) for c in dim_cols]
        )

    carried = _row({})  # current-side columns as-is (key cols coalesced)
    closed = _row({"valid_to": ld, "is_current": F.lit(False)})
    opened = _row(
        {
            **{c: F.col("_new")[c] for c in tracked},
            "valid_from": ld,
            "valid_to": F.lit(None).cast("date"),
            "is_current": F.lit(True),
        }
    )
    changed = (
        F.col("_old").isNotNull()
        & F.col("_new").isNotNull()
        & ~F.col("_old").eqNullSafe(F.col("_new"))
    )
    merged = joined.select(
        F.explode(
            F.when(changed, F.array(closed, opened))
            .when(F.col("_old").isNotNull(), F.array(carried))  # same or snap-absent
            .otherwise(F.array(opened))  # new key
        ).alias("_r")
    ).select("_r.*")
    return history.unionByName(merged)


def scd2_point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key: list[str],
    ts_col: str,
) -> DataFrame:
    """Point-in-time lookup against an SCD2 dimension — the query
    SCD2 exists FOR: join each fact to the dimension version that was
    valid at the fact's own time (valid_from <= t < valid_to, open
    end NULL = still valid; the boundary day belongs to the NEWLY
    opened version, matching scd2_merge's close/open convention).
    LEFT join: a fact before its key's first version keeps NULL
    attributes rather than vanishing.

    Scale shape: a keyed EQUI-join with the validity window as a
    residual predicate — a hash join partitioned by the business key
    (versions per key are few), never a range join.  This is the
    opposite trade from asof_join_backward, where both sides are big
    on the time axis and union+window wins; here the dimension is
    key-bounded, so the hash join is the plan that survives 100×.

    SCD2 integrity (non-overlapping versions per key) guarantees at
    most one match per fact; this function trusts it — run the
    dq/scd2 tests on the dimension, don't re-validate per query.
    """
    f = facts.alias("f")
    d = dim.alias("d")
    t = F.to_date(F.col(f"f.{ts_col}"))
    cond = [F.col(f"f.{k}").eqNullSafe(F.col(f"d.{k}")) for k in key]
    window = (F.col("d.valid_from") <= t) & (
        F.col("d.valid_to").isNull() | (t < F.col("d.valid_to"))
    )
    dim_cols = [c for c in dim.columns if c not in key]
    return f.join(d, cond + [window], "left").select(
        "f.*", *[F.col(f"d.{c}").alias(c) for c in dim_cols]
    )


def scd3_merge(
    dim: DataFrame,
    snapshot: DataFrame,
    key: list[str],
    tracked: list[str],
    load_date: str,
) -> DataFrame:
    """SCD TYPE 3: keep the previous value of each tracked attribute
    in a `prev_<col>` column beside the current one, with the change
    date — the limited-history alternative to type 2 (ONE prior
    version, no row versioning; the right tool when consumers only
    ever ask "what changed since last load").

    - new key            → current values, prev_* NULL
    - tracked change     → new current, prev_* = superseded values,
                           changed_at = load_date
    - unchanged          → carried (prev_* and changed_at kept)
    - key absent from snapshot → carried (no implicit deletes, same
      policy as scd2_merge)

    Change detection is NULL-safe per the scd2 doctrine.  The dim's
    schema: key..., tracked..., prev_<tracked>..., changed_at DATE
    (use scd3_init to bootstrap).

    Scale shape: ONE key equi-join between dim and snapshot, narrow
    branch projections — same single-stage shape as scd2_merge,
    WITHOUT the close+open row fan-out (type 3 never grows rows).
    """
    want = set(key) | set(tracked)
    prev_cols = [f"prev_{c}" for c in tracked]
    missing = [c for c in [*prev_cols, "changed_at"] if c not in dim.columns]
    if missing:
        raise ValueError(f"scd3_merge: dim lacks SCD3 columns {missing}")
    if set(snapshot.columns) != want:
        raise ValueError(
            f"scd3_merge: snapshot columns {sorted(snapshot.columns)} != "
            f"dim business columns {sorted(want)}"
        )
    ld = F.to_date(F.lit(load_date))
    snap = snapshot.select(
        *key, F.struct(*[F.col(c).alias(c) for c in tracked]).alias("_new")
    )
    cur = dim.withColumn(
        "_old", F.struct(*[F.col(c).alias(c) for c in tracked])
    )
    joined = cur.join(snap, key, "full_outer")
    changed = (
        F.col("_old").isNotNull()
        & F.col("_new").isNotNull()
        & ~F.col("_old").eqNullSafe(F.col("_new"))
    )
    new_key = F.col("_old").isNull()
    out_cols = []
    for c in key:
        out_cols.append(F.col(c))
    for c in tracked:
        out_cols.append(
            F.when(changed | new_key, F.col("_new")[c])
            .otherwise(F.col(c))
            .alias(c)
        )
    for c in tracked:
        out_cols.append(
            F.when(changed, F.col(c))                # superseded value
            .when(new_key, F.lit(None).cast(dim.schema[c].dataType))
            .otherwise(F.col(f"prev_{c}"))
            .alias(f"prev_{c}")
        )
    out_cols.append(
        F.when(changed, ld)
        .when(new_key, F.lit(None).cast("date"))
        .otherwise(F.col("changed_at"))
        .alias("changed_at")
    )
    return joined.select(*out_cols)


def scd3_init(snapshot: DataFrame, key: list[str], tracked: list[str]) -> DataFrame:
    """Bootstrap an SCD3 dimension: current = snapshot, prev_* NULL,
    changed_at NULL (nothing has changed yet)."""
    return snapshot.select(
        *key, *tracked,
        *[
            F.lit(None).cast(snapshot.schema[c].dataType).alias(f"prev_{c}")
            for c in tracked
        ],
        F.lit(None).cast("date").alias("changed_at"),
    )
