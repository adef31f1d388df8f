"""Materialized-rollup maintenance: incremental merge of additive
aggregates — the aggregate-table counterpart of `incremental_cube`.

The reference's only refresh strategy is TRUNCATE + full rebuild
(warehouse.py:254-284, O22).  For an aggregate table at 100 TB that
means re-scanning the entire fact history to absorb a day of new
rows.  The standard warehouse evolution is partial-aggregate merge:
aggregate ONLY the delta, then combine per group with the stored
rollup — valid exactly for ADDITIVE measures (sum, count; avg is
derived as sum/count at read time, never stored).  Cost scales with
|delta| + |rollup|, never |fact history|.

Delta contract (documented loudly, enforced nowhere — the feed owns
it): each fact row reaches the rollup EXACTLY ONCE across all deltas.
Re-delivering a delta double-counts; this module's idempotence story
is the caller's exactly-once feed (a streaming checkpoint, a
partition manifest), matching every production incremental-agg
system.  A re-deliverable-delta design needs per-row dedup state the
size of the fact table — that is `incremental_cube`'s anti-join on
fact_id, only affordable because the cube is a JOIN, not an
aggregate.

Scale shape: `aggregate_delta` is one partial-agg shuffle over the
delta; `merge_rollup` is a full-outer equi-join on the group keys —
both sides rollup-sized (bounded by the group-key cardinality, not
data size).  The staged parquet rewrite touches the whole rollup
table (small); under Delta the same merge is expressible as MERGE
with update-set `t.m = t.m + s.m`, touching matched files only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def aggregate_delta(
    delta: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Partial aggregate of a fact delta: per group, sum of each
    measure plus `n_rows` (the count measure every derived average
    needs).  The output schema IS the rollup-table schema."""
    return delta.groupBy(*keys).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_rollup(
    existing: DataFrame, delta_agg: DataFrame, keys: list[str]
) -> DataFrame:
    """Combine a stored rollup with a delta partial-aggregate: full
    outer join on the group keys, measure-wise `coalesce(a,0) +
    coalesce(b,0)` — groups new to the delta appear, untouched groups
    carry through, shared groups add.  Associative and commutative,
    so any delta arrival order yields the rebuild-equivalent table
    (oracle-checked by the `rollup_merge` registry row)."""
    measures = [c for c in existing.columns if c not in keys]
    if measures != [c for c in delta_agg.columns if c not in keys]:
        raise ValueError(
            f"rollup schemas disagree: {existing.columns} vs {delta_agg.columns}"
        )
    e = existing.alias("e")
    d = delta_agg.alias("d")
    cond = [F.col(f"e.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys]
    joined = e.join(d, cond, "full_outer")
    key_cols = [
        F.coalesce(F.col(f"e.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    measure_cols = [
        (
            F.coalesce(F.col(f"e.{m}"), F.lit(0))
            + F.coalesce(F.col(f"d.{m}"), F.lit(0))
        ).alias(m)
        for m in measures
    ]
    return joined.select(*key_cols, *measure_cols)


def retract_delta(
    deleted: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Partial aggregate of DELETED fact rows with every measure
    negated — the retraction half of incremental maintenance (user
    deletion / right-to-be-forgotten propagated into aggregate
    tables without a fact-history rescan).  Feed the result through
    the same `merge_rollup` as an ordinary delta: addition with
    negated partials IS retraction, so one merge path serves both
    directions.  The exactly-once contract applies symmetrically:
    each deleted row is retracted exactly once."""
    agg = aggregate_delta(deleted, keys, sum_cols)
    measures = [c for c in agg.columns if c not in keys]
    return agg.select(
        *keys, *[(-F.col(m)).alias(m) for m in measures]
    )


def compact_rollup(rollup: DataFrame, strict: bool = True) -> DataFrame:
    """Drop groups whose `n_rows` reached 0 after retraction (the
    group's last fact row was deleted — a rebuild would not contain
    it, so neither may the maintained table).

    `strict` (default): a NEGATIVE n_rows anywhere means more rows
    were retracted than ever inserted — a broken exactly-once feed —
    and silently dropping it would hide corruption in every other
    group too; fail loudly instead (one cheap agg over the
    rollup-sized table).  Pass strict=False only in forensic
    contexts that want to LOOK at the corrupt state."""
    if strict:
        bad = rollup.filter(F.col("n_rows") < 0).limit(1).count()
        if bad:
            raise ValueError(
                "rollup has groups with negative n_rows: more rows were "
                "retracted than inserted — the exactly-once delta contract "
                "was violated; rebuild the rollup from the fact history"
            )
    return rollup.filter(F.col("n_rows") > 0)


def propagate_deletes(
    spark: SparkSession,
    rollup_path: str,
    deleted: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> None:
    """Absorb fact-row deletions into the stored rollup at
    `rollup_path`: negate-aggregate the deleted rows, merge, drop
    emptied groups, staged-overwrite (crash-recoverable swap).  The
    aggregate-table leg of a GDPR delete — pair with the fact table's
    own delete and the index rebuild; cost |deleted| + |rollup|,
    never |history|."""
    from datawarehouse_code_spark.sources.acid import (
        _staged_overwrite,
        table_exists,
    )

    if not table_exists(spark, rollup_path):
        raise ValueError(f"no rollup at {rollup_path} to retract from")
    existing = spark.read.parquet(rollup_path)
    merged = merge_rollup(
        existing, retract_delta(deleted, keys, sum_cols), keys
    )
    _staged_overwrite(spark, compact_rollup(merged), rollup_path)


def refresh_rollup_incremental(
    spark: SparkSession,
    rollup_path: str,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> None:
    """Absorb a fact delta into the stored rollup at `rollup_path`:
    aggregate the delta, merge with the stored table (creating it on
    first call), staged-overwrite (crash-recoverable swap,
    sources/acid.py).  See the module docstring for the exactly-once
    delta contract."""
    from datawarehouse_code_spark.sources.acid import (
        _staged_overwrite,
        table_exists,
    )

    delta_agg = aggregate_delta(delta, keys, sum_cols)
    if table_exists(spark, rollup_path):
        existing = spark.read.parquet(rollup_path)
        merged = merge_rollup(existing, delta_agg, keys)
    else:
        merged = delta_agg
    _staged_overwrite(spark, merged, rollup_path)


def histogram_delta(
    delta: DataFrame, keys: list[str], value_col: str, bin_width: int
) -> DataFrame:
    """Fixed-width histogram partial aggregate: per group and bin
    (floor(value / bin_width)), the row count — the MERGEABLE state
    that brings percentiles into incremental rollup maintenance.
    True percentiles are not additive (merging two medians is
    meaningless), but bin counts are: merge histograms with the same
    `merge_rollup` as any additive rollup (keys + ['bin']), then read
    percentiles off the merged counts at bin granularity.  The error
    is bounded by bin_width BY CONSTRUCTION and both engines replay
    the same binning exactly — honest, deterministic approximation
    instead of an engine-specific sketch.  NULL values land in bin
    NULL (kept: they carry the null count; percentile extraction
    skips them)."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive: {bin_width}")
    return delta.groupBy(
        *keys, F.floor(F.col(value_col) / F.lit(bin_width)).alias("bin")
    ).agg(F.count(F.lit(1)).alias("n_rows"))


def percentile_from_histogram(
    hist: DataFrame, keys: list[str], bin_width: int, ps_bp: list[int]
) -> DataFrame:
    """Percentiles at bin granularity from a (merged) histogram: for
    each group and each requested percentile (in BASIS POINTS — 5000
    = median — so the target rank ceil(bp·n/10000) is computed in
    pure integer arithmetic; a float 0.9·n ending in .000000001 would
    ceil to the wrong rank and disagree across engines), return the
    lower bound of the bin holding the target-ranked row.

    One pass: cumulative sum + total over the per-group bins (window
    over rollup-sized state, never raw rows), then min bin whose
    cumulative count reaches each target.  Output: keys, p_bp,
    bin_lo (= bin · bin_width), n (non-NULL row count)."""
    for bp in ps_bp:
        if not 0 < bp <= 10000:
            raise ValueError(f"percentile basis points must be in (0, 10000]: {bp}")
    w = Window.partitionBy(*keys).orderBy("bin")
    wt = Window.partitionBy(*keys)
    c = (
        hist.filter(F.col("bin").isNotNull())
        .withColumn("cum", F.sum("n_rows").over(w))
        .withColumn("total", F.sum("n_rows").over(wt))
    )
    picks = []
    for bp in ps_bp:
        target = F.floor(
            (F.lit(bp) * F.col("total") + F.lit(9999)) / F.lit(10000)
        )
        picks.append(
            F.min(F.when(F.col("cum") >= target, F.col("bin"))).alias(f"b{bp}")
        )
    agg = c.groupBy(*keys).agg(*picks, F.max("total").alias("n"))
    rows = F.array(
        *[
            F.struct(
                F.lit(bp).alias("p_bp"),
                (F.col(f"b{bp}") * F.lit(bin_width)).alias("bin_lo"),
            )
            for bp in ps_bp
        ]
    )
    return agg.select(*keys, F.explode(rows).alias("r"), "n").select(
        *keys, "r.p_bp", "r.bin_lo", "n"
    )


def distinct_sketch_delta(
    delta: DataFrame, keys: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """HLL sketch partial aggregate: per group, the Apache
    DataSketches HLL state over `value_col` — the mergeable answer to
    DISTINCT counts in incremental rollups (exact distinct is the
    third non-additive measure after percentiles and avg, and unlike
    them it has no exact mergeable form smaller than the value set
    itself).  Sketch insertion is set-semantics: the state depends
    only on the VALUE SET, not row order or partitioning, so
    merge-then-estimate equals one-shot-estimate EXACTLY (pinned by
    test), and re-delivering the same values is harmless — distinct
    sketches are the one rollup measure exempt from the exactly-once
    delta contract.

    `lgk` fixes the register count (2^lgk); all partials to be merged
    must share it.  Native JVM aggregate (hll_sketch_agg), one
    partial-agg shuffle, ~KB state per group at any data size."""
    return delta.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("distinct_sketch")
    )


def merge_distinct_rollup(
    parts: list[DataFrame], keys: list[str]
) -> DataFrame:
    """Merge HLL partials from any number of deltas: stack and
    re-aggregate with hll_union_agg (union of HLL states is
    associative/commutative, so arrival order is irrelevant).  Merge
    cost is rollup-sized — group count × sketch bytes — never data-
    sized."""
    if not parts:
        raise ValueError("merge_distinct_rollup needs at least one partial")
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)
    return stacked.groupBy(*keys).agg(
        F.hll_union_agg("distinct_sketch").alias("distinct_sketch")
    )


def distinct_estimate(rollup: DataFrame, keys: list[str]) -> DataFrame:
    """Read distinct-count estimates off a sketch rollup:
    (keys..., n_distinct_est).  Relative error ~1.04/sqrt(2^lgk)
    (~1.6% at the default lgk=12) — the standard HLL bound."""
    return rollup.select(
        *keys,
        F.hll_sketch_estimate("distinct_sketch").alias("n_distinct_est"),
    )


# Typed DataSketches KLL function triples: value class -> (sketch_agg,
# merge_agg, get_quantile, get_rank, get_n).  bigint is the default —
# integer measures are the cross-engine-exact currency of this repo.
_KLL_FNS = {
    "bigint": (
        F.kll_sketch_agg_bigint, F.kll_merge_agg_bigint,
        F.kll_sketch_get_quantile_bigint, F.kll_sketch_get_rank_bigint,
        F.kll_sketch_get_n_bigint,
    ),
    "double": (
        F.kll_sketch_agg_double, F.kll_merge_agg_double,
        F.kll_sketch_get_quantile_double, F.kll_sketch_get_rank_double,
        F.kll_sketch_get_n_double,
    ),
    "float": (
        F.kll_sketch_agg_float, F.kll_merge_agg_float,
        F.kll_sketch_get_quantile_float, F.kll_sketch_get_rank_float,
        F.kll_sketch_get_n_float,
    ),
}


def quantile_sketch_delta(
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    k: int = 200,
    dtype: str = "bigint",
) -> DataFrame:
    """KLL quantile-sketch partial aggregate: per group, the Apache
    DataSketches KLL state over `value_col` — the mergeable answer to
    percentiles in incremental rollups WITHOUT the known-value-bounds
    precondition of `histogram_delta` (fixed-width bins need min/max
    up front and break when a new delta exceeds them; KLL adapts its
    compaction levels to whatever range arrives).  Same JVM-native
    family as the HLL distinct sketches (`distinct_sketch_delta`).

    Error contract: normalized RANK error ~1.65% at the default
    k=200 (the published KLL single-sided 99% bound; grows as k
    shrinks), i.e. get_quantile(0.5) returns a value whose true rank
    is within ~±1.65% of the median rank.  The sketch's compaction
    coin is RANDOM (verified: identical input can yield different
    states run to run), so tests and driver rows must check
    rank-error-within-bound, never raw estimate equality.

    Unlike the additive measures, KLL insertion is NOT set-semantics:
    re-delivered deltas double-count ranks — the exactly-once delta
    contract (module docstring) applies.

    Scale shape: one partial-agg shuffle (map-side combine inside the
    JVM aggregate), ~KB of state per group at any data size.  All
    partials to be merged must share `dtype`; `k` may differ (merge
    keeps the smaller, i.e. looser, accuracy).
    """
    sketch_agg = _KLL_FNS[dtype][0]
    return delta.groupBy(*keys).agg(
        sketch_agg(value_col, F.lit(k)).alias("quantile_sketch")
    )


def merge_quantile_rollup(
    parts: list[DataFrame], keys: list[str], k: int = 200,
    dtype: str = "bigint",
) -> DataFrame:
    """Merge KLL partials from any number of deltas: stack and
    re-aggregate with the DataSketches merge aggregate (KLL merge is
    associative/commutative in DISTRIBUTION — the merged sketch obeys
    the same rank-error bound as a one-shot sketch over the union,
    which is the property the maintenance test pins; byte-identical
    states are not promised).  Merge cost is rollup-sized: group
    count x sketch bytes, never data-sized."""
    if not parts:
        raise ValueError("merge_quantile_rollup needs at least one partial")
    merge_agg = _KLL_FNS[dtype][1]
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)
    return stacked.groupBy(*keys).agg(
        merge_agg("quantile_sketch", F.lit(k)).alias("quantile_sketch")
    )


def quantile_estimate(
    rollup: DataFrame, keys: list[str], ps_bp: list[int],
    dtype: str = "bigint",
) -> DataFrame:
    """Read percentile estimates off a KLL sketch rollup: one output
    row per group and requested percentile (BASIS POINTS, 5000 =
    median, matching percentile_from_histogram's integer convention).
    Output: keys..., p_bp, value_est, n (exact stream length — KLL
    tracks n exactly)."""
    for bp in ps_bp:
        if not 0 < bp <= 10000:
            raise ValueError(f"percentile basis points must be in (0, 10000]: {bp}")
    _, _, get_q, _, get_n = _KLL_FNS[dtype]
    rows = F.array(
        *[
            F.struct(
                F.lit(bp).alias("p_bp"),
                get_q("quantile_sketch", F.lit(bp / 10000.0)).alias("value_est"),
            )
            for bp in ps_bp
        ]
    )
    return rollup.select(
        *keys, F.explode(rows).alias("r"),
        get_n("quantile_sketch").alias("n"),
    ).select(*keys, "r.p_bp", "r.value_est", "n")


# dot-invisible staging root for the partition-scoped staged swap
# (parquet directory listings never read dot-prefixed names as data)
_REFRESH_STAGING = ".refresh-staging"


def _staged_partition_overwrite(
    df: DataFrame, path: str, partition_col: str
) -> None:
    """Replace the partitions present in ``df`` with ``df``'s rows via
    the aside-first staged swap, under the table's writer lease — the
    r17 replacement for Spark's dynamic partition overwrite, whose
    driver-side commit DELETES a partition dir before renaming the
    staged one in (r16 verdict What's-wrong #1: a crash in that window
    left the live fact/rollup partition ABSENT until a caller retried
    with the same inputs — the exact defect class the r16 campaign
    eliminated from forget_vectors/cube/fact, which this lane missed).

    Protocol, byte-compatible with similarity._forget_from_table's
    RTBF swap and pipeline.compact_parquet's per-dir swap so the
    shared ``_repair_compaction_dirs`` recovers all three: every
    touched partition stages in ONE job under ``.refresh-staging``
    inside the table, then per partition live →
    ``.{col}={v}._precompact`` aside → staged in → aside dropped —
    data is never destroyed before its replacement is in place.  A
    crashed run self-repairs on the next entry (aside rolls BACK to
    the pre-refresh state, stale staging is dropped, and the rerun —
    a pure function of its inputs — converges).  Touched-partition
    discovery is the STAGING dir's own listing, so Hive's
    partition-value escaping is honored by construction (both sides
    of every rename come from writer-produced names).

    Concurrency: runs under ``writer_lease(path)`` with the standard
    fence at the staged-write → rename boundary and per partition —
    a second concurrent refresher raises ConcurrentWriterError; a
    holder stolen from mid-stall aborts with LeaseLostError instead
    of racing the thief (sources/acid.py protocol)."""
    from datawarehouse_code_spark.sources.acid import _fs_for
    from datawarehouse_code_spark.sources.bucketed import (
        _apply_aside_swap,
        _repair_compaction_dirs,
        writer_lease,
    )

    spark = df.sparkSession
    fs, hpath = _fs_for(spark, path)
    jp = spark._jvm.org.apache.hadoop.fs.Path
    with writer_lease(spark, path) as lease:
        if not fs.exists(hpath):
            fs.mkdirs(hpath)
        names = [st.getPath().getName() for st in fs.listStatus(hpath)]
        _repair_compaction_dirs(spark, fs, hpath, names)
        staging = jp(hpath, _REFRESH_STAGING)
        if fs.exists(staging):
            fs.delete(staging, True)
        (
            df.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(f"{path}/{_REFRESH_STAGING}")
        )
        # fence between the long un-heartbeated staged write and the
        # mutating renames (the same boundary every swap lane fences)
        lease.verify()
        lease.heartbeat()
        # NULL partition values stage under Hive's
        # __HIVE_DEFAULT_PARTITION__ dir, which carries the same
        # `{col}=` prefix — they swap like any other slice (pinned by
        # test; backfill_partition still REJECTS NULL because its
        # == filters and delete lane can't address that dir)
        staged_parts = sorted(
            st.getPath().getName()
            for st in fs.listStatus(staging)
            if st.getPath().getName().startswith(f"{partition_col}=")
        )
        for name in staged_parts:
            # fenced + heartbeated per dir (shared protocol step):
            # a long loop must neither race a thief nor age into
            # stealability mid-swap
            _apply_aside_swap(spark, fs, hpath, name, jp(staging, name), lease)
        fs.delete(staging, True)


def _leased_partition_delete(
    spark: SparkSession, path: str, partition_col: str, value: object
) -> None:
    """Delete one partition directory outright (the zero-row
    restatement lane — a rewrite can't express an empty partition)
    under the table's writer lease, repairing any crashed swap
    leftovers FIRST so the delete acts on the rolled-back live dir,
    not a no-op path beside an aside-renamed one."""
    from datawarehouse_code_spark.sources.acid import _fs_for
    from datawarehouse_code_spark.sources.bucketed import (
        _repair_compaction_dirs,
        writer_lease,
    )

    fs, hpath = _fs_for(spark, path)
    jp = spark._jvm.org.apache.hadoop.fs.Path
    with writer_lease(spark, path) as lease:
        if not fs.exists(hpath):
            return
        names = [st.getPath().getName() for st in fs.listStatus(hpath)]
        _repair_compaction_dirs(spark, fs, hpath, names)
        staging = jp(hpath, _REFRESH_STAGING)
        if fs.exists(staging):
            fs.delete(staging, True)
        lease.verify()
        fs.delete(jp(hpath, f"{partition_col}={value}"), True)


def refresh_rollup_partition(
    spark: SparkSession,
    rollup_path: str,
    partition_rows: DataFrame,
    partition_col: str,
    keys: list[str],
    sum_cols: list[str],
) -> None:
    """Refresh a PARTITIONED rollup's slice from its fact partition's
    rows: aggregate, then replace that slice via the leased
    aside-first staged swap (_staged_partition_overwrite; dynamic
    partition overwrite until r17 — see that helper for the crash
    window it closes).

    The partitioned-rollup layout stores each fact partition's PARTIAL
    aggregate under the same partition key (`partition_col` must be in
    `partition_rows`); readers merge partials via read_partitioned_rollup.
    What this buys over the flat rollup + delta-merge: REFRESH IS A
    PURE FUNCTION OF ONE FACT PARTITION — recomputable, idempotent,
    crash-safe without journals or exactly-once delta feeds.  The flat
    rollup's merge needs a retraction journal to restate a partition
    (the net-delta is not rerunnable: a crash between the rollup swap
    and its completion marker double-applies), while here re-running
    any step converges.  Cost: |partition| aggregate + one partition
    write; the stored table holds keys x partitions rows (still
    rollup-sized).
    """
    agg = partition_rows.groupBy(partition_col, *keys).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("n_rows"),
    )
    _staged_partition_overwrite(agg, rollup_path, partition_col)


def read_partitioned_rollup(
    spark: SparkSession, rollup_path: str, keys: list[str]
) -> DataFrame:
    """Merge a partitioned rollup's per-partition partials into the
    flat rollup view (sums add, n_rows adds) — rollup-sized work.

    Runs the reader-grade crashed-swap repair first (r17, same fix as
    the bucketed read paths): a refresh/backfill killed between its
    two renames leaves the slice's live dir renamed aside — without
    repair a read-mostly rollup would silently return merged totals
    MISSING that slice until the next writer entry.  The repair only
    acts when it can prove a crash (live dir absent, stale lease);
    a live writer's fresh lease defers, reading through the
    documented transient window."""
    from datawarehouse_code_spark.sources.acid import _fs_for
    from datawarehouse_code_spark.sources.bucketed import (
        _reader_repair_compaction,
    )

    fs, hpath = _fs_for(spark, rollup_path)
    _reader_repair_compaction(spark, fs, hpath, rollup_path)
    parts = spark.read.parquet(rollup_path)
    measures = [
        c for c in parts.columns
        if c.startswith("sum_") or c == "n_rows"
    ]
    return parts.groupBy(*keys).agg(
        *[F.sum(m).alias(m) for m in measures]
    )


def _check_partition_value_path_safe(fn: str, value: object) -> None:
    """Partition-scoped maintenance builds the partition DIRECTORY
    path as a raw f-string `{col}={value}`, but Hive/Spark writers
    percent-escape special characters (space, '/', ':', '%', ...) in
    partition dir names — so for such values the raw path points at a
    directory that does not exist and fs.delete silently no-ops,
    leaving stale fact rows and a stale rollup slice behind (r8
    ADVICE).  Rather than reimplementing Hive's escaping table (and
    silently depending on it staying in sync), restrict the value's
    PATH RENDERING to the unescaped charset and fail loudly — on
    str(value) whatever the Python type, since a datetime/timestamp
    renders with spaces and colons and hits the same
    escaped-directory mismatch a raw string would."""
    import re

    if not re.fullmatch(r"[A-Za-z0-9._-]+", str(value)):
        raise ValueError(
            f"{fn}: partition value {value!r} renders with characters "
            "Hive escapes in partition directory names; restrict "
            "partition keys to values spelled with [A-Za-z0-9._-] "
            "(or re-key the partition column upstream)"
        )


def backfill_partition(
    spark: SparkSession,
    fact_path: str,
    rollup_path: str,
    partition_col: str,
    partition_value: object,
    new_rows: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> None:
    """Partition-scoped RESTATEMENT: replace one fact partition and
    bring the partitioned rollup's slice with it — the backfill a
    warehouse actually runs when a day/year of facts is corrected,
    at cost ∝ |partition| + rollup slice, never |fact history| (the
    reference's only restatement tool is the full TRUNCATE+rebuild,
    warehouse.py:254-284).

    Two leased aside-first staged swaps (_staged_partition_overwrite;
    until r17 these rode dynamic partition overwrite, whose
    delete-before-rename driver commit could leave the LIVE FACT
    partition absent after a crash), each IDEMPOTENT and derived
    from `new_rows` alone: (1) the fact partition, (2) the rollup
    slice.  A crash anywhere leaves a state the entry repair plus a
    plain re-run converges from; between (1) and (2) the rollup slice
    is stale, which verify_rollup_partition detects cheaply
    (partition-pruned re-aggregate vs stored partials).  The two
    tables are leased independently: each swap holds its own table's
    writer lease for its duration.  `new_rows` must all carry
    `partition_col` = `partition_value` (guarded — silently writing a
    row into another partition would corrupt a slice this backfill
    then never refreshes).

    Restating to ZERO rows deletes the fact partition directory and
    its rollup slice outright (a partition rewrite cannot express an
    empty partition: writing no rows would leave both untouched — the
    same hazard forget_vectors handles for emptied IVF buckets); the
    deletes run under each table's writer lease with crashed-swap
    repair first (_leased_partition_delete).
    NULL partition values are rejected: parquet spells them
    __HIVE_DEFAULT_PARTITION__ and == filters silently miss them —
    route NULL-keyed rows to a real sentinel partition upstream.
    """
    if partition_value is None:
        raise ValueError(
            "backfill_partition: NULL partition values are unsupported "
            "(use a sentinel partition value upstream)"
        )
    _check_partition_value_path_safe("backfill_partition", partition_value)
    stray = new_rows.filter(
        ~F.col(partition_col).eqNullSafe(F.lit(partition_value))
    ).limit(1).count()
    if stray:
        raise ValueError(
            f"backfill_partition: new_rows contain rows outside "
            f"{partition_col}={partition_value!r}"
        )
    if new_rows.limit(1).count() == 0:
        for base in (fact_path, rollup_path):
            _leased_partition_delete(
                spark, base, partition_col, partition_value
            )
        return
    _staged_partition_overwrite(new_rows, fact_path, partition_col)
    refresh_rollup_partition(
        spark, rollup_path, new_rows, partition_col, keys, sum_cols
    )


def verify_rollup_partition(
    spark: SparkSession,
    fact_path: str,
    rollup_path: str,
    partition_col: str,
    partition_value: object,
    keys: list[str],
    sum_cols: list[str],
) -> bool:
    """Consistency probe for one rollup slice: re-aggregate the fact
    partition (partition-pruned scan) and compare against the stored
    partials — True iff they match exactly.  The cheap post-crash /
    post-backfill audit; run over all partitions it is the full
    rollup ≡ rebuild check at |fact| cost.  NULL partition values are
    rejected for the same reason as in backfill_partition (== filters
    would vacuously verify an empty comparison)."""
    if partition_value is None:
        raise ValueError(
            "verify_rollup_partition: NULL partition values are "
            "unsupported (use a sentinel partition value upstream)"
        )
    _check_partition_value_path_safe("verify_rollup_partition", partition_value)
    fact = spark.read.parquet(fact_path).filter(
        F.col(partition_col) == F.lit(partition_value)
    )
    want = fact.groupBy(partition_col, *keys).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("n_rows"),
    )
    got = spark.read.parquet(rollup_path).filter(
        F.col(partition_col) == F.lit(partition_value)
    ).select(*want.columns)
    # exact symmetric difference on the slice (rollup-sized)
    return (
        want.exceptAll(got).limit(1).count() == 0
        and got.exceptAll(want).limit(1).count() == 0
    )


def theta_sketch_delta(
    delta: DataFrame, keys: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """Theta sketch partial aggregate: per group, the DataSketches
    Theta (KMV) state over `value_col` — the third mergeable sketch in
    the rollup family (HLL = distinct counts, KLL = quantiles, Theta =
    distinct counts WITH SET ALGEBRA).  Where HLL only unions, theta
    sketches support union, intersection, and difference — the
    audience-overlap questions ("users who did A and B", "A but not
    B") answered from rollup-sized state without rescanning raw data.

    Like HLL, insertion is set-semantics (state depends only on the
    value set), so re-delivered deltas are harmless and merge-then-
    estimate equals one-shot-estimate (KMV keeps the k smallest
    hashes; a union of sketches retains exactly the k smallest of the
    union — pinned by test).  Below ~2^lgk distinct values the sketch
    is in EXACT mode (estimates are exact counts); above it the
    standard KMV bound ~1/sqrt(2^lgk) applies, and INTERSECTION error
    scales with the UNION size — a small overlap of two big sets
    carries the unions' absolute error, the documented theta caveat.

    One JVM partial-agg shuffle, ~KB state per group at any size."""
    return delta.groupBy(*keys).agg(
        F.theta_sketch_agg(value_col, F.lit(lgk)).alias("theta_sketch")
    )


def merge_theta_rollup(
    parts: list[DataFrame], keys: list[str], lgk: int = 12
) -> DataFrame:
    """Merge theta partials from any number of deltas (union of KMV
    states is associative/commutative; arrival order irrelevant).
    Merge cost is rollup-sized — group count x sketch bytes."""
    if not parts:
        raise ValueError("merge_theta_rollup needs at least one partial")
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)
    return stacked.groupBy(*keys).agg(
        F.theta_union_agg("theta_sketch", F.lit(lgk)).alias("theta_sketch")
    )


def theta_estimate(rollup: DataFrame, keys: list[str]) -> DataFrame:
    """Distinct-count estimates off a theta rollup:
    (keys..., n_distinct_est)."""
    return rollup.select(
        *keys,
        F.theta_sketch_estimate("theta_sketch").alias("n_distinct_est"),
    )


def theta_overlap(
    rollup: DataFrame, keys: list[str], label_col: str, a: object, b: object
) -> DataFrame:
    """Set-algebra report between two labeled groups of a theta
    rollup: per remaining `keys` group present on BOTH sides, the
    estimated |A|, |B|, |A∪B|, |A∩B|, |A\\B| — audience overlap from
    sketch state alone.  With empty `keys` the rollup must hold one
    row per label (aggregate first); the two single rows cross-join.

    Scale shape: filter + equi-join (or 1x1 cross) on rollup-sized
    state, then five scalar sketch expressions — no data rescan."""
    sa = rollup.filter(F.col(label_col) == a).select(
        *keys, F.col("theta_sketch").alias("_sa")
    )
    sb = rollup.filter(F.col(label_col) == b).select(
        *keys, F.col("theta_sketch").alias("_sb")
    )
    joined = sa.join(sb, keys) if keys else sa.crossJoin(sb)
    return joined.select(
        *keys,
        F.theta_sketch_estimate("_sa").alias("est_a"),
        F.theta_sketch_estimate("_sb").alias("est_b"),
        F.theta_sketch_estimate(F.theta_union("_sa", "_sb")).alias("est_union"),
        F.theta_sketch_estimate(
            F.theta_intersection("_sa", "_sb")
        ).alias("est_intersection"),
        F.theta_sketch_estimate(
            F.theta_difference("_sa", "_sb")
        ).alias("est_a_not_b"),
    )


def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Incremental maintenance for a materialized JOIN view — the
    other half of IVM beside the additive rollups above: for
    append-only inputs, the delta of A ⋈ B is exactly

        ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    (the algebraic identity (A∪ΔA)⋈(B∪ΔB) minus A⋈B, with bag
    semantics — pinned merge ≡ rebuild by test).  Appending the
    result to the stored view refreshes it at a cost proportional to
    the DELTAS times join selectivity, never |A|·|B| — the reference's
    truncate-and-rebuild cube (warehouse.py:254-284) done
    incrementally without the cube's per-row anti-join.

    Append-only contract (loud, like the rollup delta contract):
    updates/deletes must flow as retractions through table_diff/CDC,
    not through this identity — a mutated old row would need the view
    rows it produced to be found and replaced, which is MERGE
    territory (incremental_cube's fact_id anti-join is that, priced
    accordingly).

    Scale shape: three equi-joins, each with at least one delta-sized
    side — broadcast the delta when it fits, and keep A/B bucketed or
    key-partitioned so the big sides never reshuffle; the ΔA ⋈ ΔB
    term is delta × delta (tiny).  Nothing rescans the stored view.
    """
    t1 = a_delta.join(b_old, keys)
    t2 = a_old.join(b_delta, keys)
    t3 = a_delta.join(b_delta, keys)
    return t1.unionByName(t2).unionByName(t3)


def maintain_join_view(
    view_old: DataFrame,
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Stored view ∪ join_view_delta — the refreshed materialized
    join view (write with mode("append") of just the delta in
    practice; this frame exists for the merge ≡ rebuild proof)."""
    return view_old.unionByName(
        join_view_delta(a_old, a_delta, b_old, b_delta, keys)
    )


# ------------------------------------------ count-min frequency sketches

CMS_SKETCH_COL = "cms_sketch"


def cms_sketch_delta(
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    eps: float = 0.01,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Count-min sketch partial aggregate: per group, Spark's native
    CMS state over `value_col` — the FREQUENCY-sketch family beside
    HLL (distinct), KLL (quantiles), and theta (set algebra): point
    lookups "how often did item x occur" from rollup-sized state,
    with the one-sided guarantee estimate >= true and, with
    probability `confidence`, estimate <= true + eps * N.

    CMS counters are ADDITIVE, so merging partials is elementwise
    array addition — with a shared (eps, confidence, seed) the merged
    state is BYTE-IDENTICAL to the one-shot sketch (pinned by test;
    stronger than HLL's estimate-level equality).  All partials to be
    merged must share all three parameters: eps/confidence size the
    counter table and seed derives the row hashes.  Native JVM
    aggregate, one partial-agg shuffle, width(=ceil(2/eps)) x
    depth(=ceil(ln(1/(1-confidence))/ln 2)) longs per group.

    Add-only: CMS has no retraction form (negative counts break the
    min estimator) — RTBF on a frequency rollup is a rebuild, unlike
    the histogram family (retract_delta).
    """
    return delta.groupBy(*keys).agg(
        F.count_min_sketch(
            value_col, F.lit(float(eps)), F.lit(float(confidence)),
            F.lit(int(seed)),
        ).alias(CMS_SKETCH_COL)
    )


def _cms_parse(b: bytes):
    """(total_count, depth, width, hashA[d], table[d][w]) from Spark's
    CountMinSketch serialization (version 1, big-endian: int version,
    long totalCount, int depth, int width, long hashA per row, then
    the row-major counter table) — format pinned by the byte-identity
    test against the JVM's own writeTo/readFrom."""
    import struct

    import numpy as np

    version, = struct.unpack(">i", b[:4])
    if version != 1:
        raise ValueError(f"unsupported CountMinSketch version {version}")
    tc, = struct.unpack(">q", b[4:12])
    d, w = struct.unpack(">2i", b[12:20])
    rest = np.frombuffer(b, dtype=">i8", offset=20)
    if rest.size != d + d * w:
        raise ValueError(
            f"count-min sketch payload size mismatch: {rest.size} longs "
            f"for depth={d} width={w}"
        )
    return tc, d, w, rest[:d], rest[d:].reshape(d, w)


def _cms_serialize(tc: int, d: int, w: int, hash_a, table) -> bytes:
    import struct

    return (
        struct.pack(">iq2i", 1, int(tc), int(d), int(w))
        + hash_a.astype(">i8").tobytes()
        + table.astype(">i8").tobytes()
    )


def _cms_merge_bytes(sketches) -> bytes:
    """Merge CMS binaries by counter addition (numpy) — refuses
    mismatched geometry or hash rows (different eps/confidence/seed
    states are not mergeable; adding them would silently answer from
    scrambled counters)."""
    tc, d, w, hash_a, table = _cms_parse(sketches[0])
    table = table.copy()
    for b in sketches[1:]:
        tc2, d2, w2, h2, t2 = _cms_parse(b)
        if d2 != d or w2 != w or not (h2 == hash_a).all():
            raise ValueError(
                "cannot merge count-min sketches with different "
                "eps/confidence/seed parameters"
            )
        tc += tc2
        table += t2
    return _cms_serialize(tc, d, w, hash_a, table)


def merge_cms_rollup(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge CMS partials from any number of deltas: stack and reduce
    per group with counter addition (an Arrow-batched grouped map —
    the merge is pure numpy on KB-sized states; no JVM union agg
    exists for CMS the way hll_union_agg does, so this is the
    legitimate-Python-path exception, and it runs on ROLLUP-sized
    data only).  Byte-identical to the one-shot sketch over the same
    rows (pinned)."""
    import pandas as pd

    if not parts:
        raise ValueError("merge_cms_rollup needs at least one partial")
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)

    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stacked.schema.fields if f.name in keys
    )
    schema = f"{key_fields}, {CMS_SKETCH_COL} binary"

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        head = pdf.iloc[:1][keys].copy()
        head[CMS_SKETCH_COL] = [
            _cms_merge_bytes([bytes(x) for x in pdf[CMS_SKETCH_COL]])
        ]
        return head

    return stacked.groupBy(*keys).applyInPandas(_merge, schema)


def cms_estimate(
    rollup: DataFrame, keys: list[str], items: list
) -> DataFrame:
    """Point-frequency report off a CMS rollup: one row per
    (group, item) with the sketch's estimate and the eps*N error
    budget implied by the stored geometry (width = ceil(2/eps) ⇒
    budget = ceil(2·N/width)).  `items` is a BOUNDED list (the
    report's columns, like theta_overlap's set labels) and the rollup
    is group-count-sized, so the collect here is rollup-sized by
    construction — estimates decode through the JVM's own readFrom,
    never a re-implementation of the hash."""
    import numpy as np

    if all(isinstance(i, (int, np.integer)) and not isinstance(i, bool)
           for i in items):
        items = [int(i) for i in items]
        item_type = "bigint"
    elif all(isinstance(i, str) for i in items):
        item_type = "string"
    else:
        raise ValueError(
            "cms_estimate: items must be all integers or all strings "
            f"(got {sorted({type(i).__name__ for i in items})})"
        )
    spark = rollup.sparkSession
    jcms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    out = []
    for row in rollup.select(*keys, CMS_SKETCH_COL).collect():
        b = bytes(row[CMS_SKETCH_COL])
        tc, d, w, _h, _t = _cms_parse(b)
        budget = -(-2 * tc // w)
        sk = jcms.readFrom(bytearray(b))
        for item in items:
            out.append(
                (*[row[k] for k in keys], item, int(sk.estimateCount(item)),
                 int(tc), int(budget))
            )
    # schema fields in CALLER key order — the tuples above are built in
    # that order, and createDataFrame matches positionally (a
    # rollup-schema-ordered DDL would silently swap permuted keys)
    types = {f.name: f.dataType.simpleString() for f in rollup.schema.fields}
    key_fields = ", ".join(f"{k} {types[k]}" for k in keys)
    return spark.createDataFrame(
        out,
        f"{key_fields}, item {item_type}, est bigint, n_total bigint, "
        "err_budget bigint",
    )
