"""Join strategy helpers beyond the built-ins.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime, but only for sort-merge joins between shuffle stages.  The
manual salting here covers the cases AQE can't: a hot-key join where
the small side is too big to broadcast but small enough to replicate
`n_salts`×, or engines/stages where the AQE rewrite doesn't apply.

Mechanism: the skewed side gets a deterministic salt in [0, n_salts)
derived from the whole row (so one hot key spreads across n_salts
shuffle partitions); the other side is replicated once per salt
value; the join key becomes (key, salt).  Correct for inner/left
joins keyed on the skewed side; cost = n_salts× replication of the
smaller side, which is exactly the trade a 100 TB skewed join wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted across `n_salts` buckets.

    The salt comes from monotonically_increasing_id, NOT a hash of the
    row: the canonical skew case is millions of IDENTICAL rows for one
    hot key, and a content hash would send them all to the same salt
    bucket (zero spread while still paying the replication).  No
    layout-independent salt can spread identical rows — they carry no
    distinguishing information — so some layout dependence is
    inherent to row-level salting.

    Determinism caveat (task retries / speculative execution): the
    salt is a pure function of (partition index, row offset), so a
    retried or speculative task attempt recomputes IDENTICAL salts as
    long as the skewed input enumerates rows in a stable order per
    partition — true for file scans and any deterministic narrow
    lineage.  If `skewed` sits downstream of a round-robin
    repartition, an unordered shuffle read, or another
    nondeterministic operator, a lost-executor stage retry can replay
    rows in a different order and re-salt them differently — the
    classic repartition-retry hazard (SPARK-23207), which Spark guards
    by recomputing all consumer stages.  For such inputs, checkpoint
    or persist-with-replication the skewed side first (or sort it)
    before salting.  Across *separate runs* the assignment may differ
    with cluster layout; any assignment yields the identical joined
    result set.
    """
    for df in (skewed, other):
        if "_salt" in df.columns:
            raise ValueError("salted_join: input already has a _salt column")
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    salted = skewed.withColumn("_salt", salt.cast("int"))
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [*key, "_salt"], how).drop("_salt")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of join (backward): for each left row, attach the payload of
    the single most recent right row with the same keys and
    right.ts <= left.ts, as `asof_<payload>` columns (NULL when no
    prior right row exists — left-outer semantics).

    Spark has no native as-of join; the scale-correct shape is NOT a
    range join (O(|L|·|R|) per key for a theta condition Catalyst
    can't hash) but a tagged union + one window pass: both inputs
    shuffle ONCE on the keys, sort by (ts, side), and each left row
    picks up the running `last(payload)` of right rows — O((|L|+|R|)
    log) per key, no pair explosion, AQE-splittable like any window.
    Ties (right.ts == left.ts) match — "at or before"; among equal-ts
    right rows `right_tiebreak` (required for determinism if such
    ties can occur) picks the one sorting last.

    NULL timestamps: right rows with NULL ts are ignored (an unknown
    time can't be "before" anything), and left rows with NULL ts get
    NULL payloads — pinned explicitly (asc_nulls_first + the right-ts
    filter) because engines disagree on default NULL ordering (Spark
    ASC = NULLS FIRST, DuckDB = NULLS LAST).
    """
    from pyspark.sql import Window

    unioned, left_only = _asof_tagged_union(
        left, right, keys, ts_col, payload_cols, right_tiebreak
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts_col).asc_nulls_first(),
            F.col("_is_left").asc(),
            F.col("_tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the whole right row as ONE struct: a struct is non-null for
    # every right row, so a legitimately-NULL payload value on the
    # latest right row is carried as-is instead of last(ignorenulls)
    # falling back to an older row's value
    carried = unioned.select(
        "*",
        F.last(_asof_struct(ts_col, payload_cols), ignorenulls=True)
        .over(w)
        .alias("_asof"),
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *keys, ts_col, *left_only,
        *[F.col(f"_asof.{p}").alias(f"asof_{p}") for p in payload_cols],
    )


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    point_date: str,
    start_date: str,
    end_date: str,
    bucket_days: int = 30,
) -> DataFrame:
    """Point-in-interval (range) join as an EQUI-join: each point row
    matches every interval row with start <= point <= end (inner
    semantics; inverted intervals match nothing).

    A raw `BETWEEN` theta-join has no equi-key, so Catalyst compiles
    it to BroadcastNestedLoopJoin — O(|points|·|intervals|) pair
    evaluations, a scale-killer the moment the interval side outgrows
    a broadcast.  The scale shape bins time into fixed buckets of
    `bucket_days`: a point lands in exactly ONE bucket, an interval is
    replicated to each bucket it overlaps (⌈len/width⌉+1 ≈ 2 rows for
    intervals shorter than the width), and the join becomes a hash
    equi-join on the bucket id with the BETWEEN kept as a residual
    filter.  Each qualifying pair meets in exactly one bucket (the
    point's), so no dedup is needed.  Cost: one shuffle on bucket id,
    candidate pairs = points per bucket × intervals overlapping that
    bucket — local to the time axis instead of global.

    Pick `bucket_days` >= the typical interval length (replication
    factor stays ~2); longer stragglers still work, they just
    replicate more.  Both join inputs must have disjoint column names.
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"interval_bucket_join: overlapping columns {overlap}")
    if "_bucket" in points.columns or "_bucket" in intervals.columns:
        # withColumn would silently overwrite a caller's _bucket and the
        # name-based join/drop below would corrupt the result
        raise ValueError("interval_bucket_join: inputs must not have a _bucket column")
    if bucket_days < 1:
        raise ValueError("interval_bucket_join: bucket_days must be >= 1")
    epoch = F.to_date(F.lit("1970-01-01"))

    def _bucket(col: str):
        return F.floor(F.datediff(F.col(col), epoch) / bucket_days)

    pb = points.withColumn("_bucket", _bucket(point_date))
    ib = (
        intervals.filter(F.col(end_date) >= F.col(start_date))
        .withColumn(
            "_bucket", F.explode(F.sequence(_bucket(start_date), _bucket(end_date)))
        )
    )
    return (
        pb.join(ib, "_bucket")
        .where(F.col(point_date).between(F.col(start_date), F.col(end_date)))
        .drop("_bucket")
    )


def fuzzy_prefix_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    block_prefix: int = 2,
) -> DataFrame:
    """Prefix-blocked fuzzy string join: pairs whose Levenshtein
    distance is <= `max_distance`, candidate-generated by an
    EQUI-join on the lowercase `block_prefix`-char prefix plus a
    length-difference bound — the dirty-dimension reconciliation join
    (vendor names, addresses, free-text categories) the reference's
    exact-id world cannot express.

    Semantics contract (deliberate, documented): this is a
    PREFIX-BLOCKED fuzzy join — a pair whose edits fall inside the
    first `block_prefix` characters is not a candidate and is not
    returned.  That is the standard blocking trade (exact fuzzy join
    is all-pairs quadratic); recall lost to prefix edits is bought
    back by lowering block_prefix to 1 or blocking on additional keys
    (both parameters, not code changes).  The oracle replays the
    same blocking, so the contract is hash-enforced, not prose.

    Scale shape: ONE equi-shuffle on (prefix, length band) — never a
    cross join (pinned by the no-cartesian plan test).  The length
    band is the second blocking key the distance bound gives for
    free: band = len div (d+1), and any pair within distance d
    differs by <= d in length, so the LEFT side probes its band ± 1
    (a 3× fan-out of the smaller side) and candidates co-locate by
    both prefix AND size — this is what keeps a skewed prefix
    distribution (real name corpora share few leading tokens) from
    turning a block into a quadratic hotspot; the interval-join
    bucketing trick applied to string length.  Levenshtein evaluates
    only on co-located candidates, with the THRESHOLD form
    (levenshtein(l, r, d) — early-exits the DP past d, turning the
    per-candidate cost from O(|l|·|r|) into O(d·min(|l|,|r|))).  For
    residual hotspots, raise block_prefix or pre-salt (salted_join
    above).
    """
    if max_distance < 1:
        raise ValueError(f"max_distance must be >= 1: {max_distance}")
    if block_prefix < 1:
        raise ValueError(f"block_prefix must be >= 1: {block_prefix}")
    band = max_distance + 1
    l_norm = F.lower(F.col("_l_str"))
    r_norm = F.lower(F.col("_r_str"))
    a = (
        left.withColumn("_l_str", F.col(left_col))
        .withColumn("_blk", F.substring(l_norm, 1, block_prefix))
        .withColumn(
            "_band",
            F.explode(
                F.array(
                    *[
                        F.expr(f"length(_l_str) div {band}") + F.lit(off)
                        for off in (-1, 0, 1)
                    ]
                )
            ),
        )
    )
    b = (
        right.withColumn("_r_str", F.col(right_col))
        .withColumn("_blk", F.substring(r_norm, 1, block_prefix))
        .withColumn("_band", F.expr(f"length(_r_str) div {band}"))
    )
    bounded_dist = F.levenshtein(
        F.lower("_l_str"), F.lower("_r_str"), max_distance
    )
    return (
        a.join(b, ["_blk", "_band"])
        .filter(
            (
                F.abs(F.length("_l_str") - F.length("_r_str"))
                <= max_distance
            )
            & (bounded_dist >= 0)  # threshold form returns -1 past d
        )
        .withColumn("edit_distance", bounded_dist)
        .drop("_blk", "_band", "_l_str", "_r_str")
    )


def _asof_tagged_union(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
    right_tiebreak: str | None,
) -> tuple[DataFrame, list[str]]:
    """The shared as-of machinery: both inputs tagged and unioned so
    ONE shuffle on the keys serves every direction's window pass.
    The right-side struct carries `_ts_us` so `nearest` can compare
    distances.  See asof_join_backward for the full design notes."""
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"as-of join: payload collides with left: {overlap}")
    left_only = [c for c in left.columns if c not in keys and c != ts_col]
    tb_type = (
        right.schema[right_tiebreak].dataType.simpleString()
        if right_tiebreak is not None
        else "int"
    )
    tagged_left = left.select(
        *keys, ts_col, *left_only,
        *[F.lit(None).alias(p) for p in payload_cols],
        F.lit(None).cast(tb_type).alias("_tb"),
        F.lit(1).alias("_is_left"),
    )
    tb = F.col(right_tiebreak) if right_tiebreak is not None else F.lit(0)
    tagged_right = right.filter(F.col(ts_col).isNotNull()).select(
        *keys, ts_col,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        *payload_cols,
        tb.alias("_tb"),
        F.lit(0).alias("_is_left"),
    )
    return tagged_left.unionByName(tagged_right), left_only


def _asof_struct(ts_col: str, payload_cols: list[str]) -> F.Column:
    return F.when(
        F.col("_is_left") == 0,
        F.struct(
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts_us"),
            *payload_cols,
        ),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of join, FORWARD direction: each left row attaches the
    EARLIEST right row with right.ts >= left.ts (the "next quote /
    next reading" lookup — pandas merge_asof(direction='forward')).
    Same tagged-union + single-window shape as the backward join,
    traversed in descending time; ties ("at or after") match, and
    among equal-ts right rows the max-`right_tiebreak` row wins (the
    same rule as backward, so flipping direction never changes tie
    policy).  NULL-ts left rows get NULL payloads; NULL-ts right
    rows are ignored."""
    from pyspark.sql import Window

    unioned, left_only = _asof_tagged_union(
        left, right, keys, ts_col, payload_cols, right_tiebreak
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts_col).desc_nulls_first(),
            F.col("_is_left").asc(),
            F.col("_tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last(_asof_struct(ts_col, payload_cols), ignorenulls=True)
        .over(w)
        .alias("_asof"),
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *keys, ts_col, *left_only,
        *[F.col(f"_asof.{p}").alias(f"asof_{p}") for p in payload_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join, NEAREST direction: the closest right row in either
    direction (pandas merge_asof(direction='nearest')); equidistant
    candidates resolve BACKWARD (pandas' rule).  `tolerance` (a Spark
    INTERVAL literal, e.g. "10 minutes") drops matches farther than
    the bound in either direction.

    One shuffle still: both directions' window passes share the
    tagged union's key partitioning (two sorts over one exchange —
    Catalyst reuses the exchange for compatible windows), then a
    narrow projection picks the closer struct per row.
    """
    from pyspark.sql import Window

    unioned, left_only = _asof_tagged_union(
        left, right, keys, ts_col, payload_cols, right_tiebreak
    )
    wb = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts_col).asc_nulls_first(),
            F.col("_is_left").asc(),
            F.col("_tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts_col).desc_nulls_first(),
            F.col("_is_left").asc(),
            F.col("_tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = _asof_struct(ts_col, payload_cols)
    carried = unioned.select(
        "*",
        F.last(s, ignorenulls=True).over(wb).alias("_b"),
        F.last(s, ignorenulls=True).over(wf).alias("_f"),
    ).filter(F.col("_is_left") == 1)
    lts = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d_b = lts - F.col("_b._ts_us")
    d_f = F.col("_f._ts_us") - lts
    if tolerance is not None:
        # the epoch anchor carries an explicit +00:00 offset: a bare
        # "1970-01-01 00:00:00" parses in the SESSION timezone, which
        # would shift the tolerance by the UTC offset under any
        # non-UTC session (tolerance ± tz_offset — silently wrong)
        tol_us = F.unix_micros(
            F.lit("1970-01-01 00:00:00+00:00").cast("timestamp")
            + F.expr(f"INTERVAL {tolerance}")
        )
        b_ok = F.col("_b").isNotNull() & (d_b <= tol_us)
        f_ok = F.col("_f").isNotNull() & (d_f <= tol_us)
    else:
        b_ok = F.col("_b").isNotNull()
        f_ok = F.col("_f").isNotNull()
    chosen = (
        F.when(b_ok & f_ok, F.when(d_b <= d_f, F.col("_b")).otherwise(F.col("_f")))
        .when(b_ok, F.col("_b"))
        .when(f_ok, F.col("_f"))
    )
    return carried.select(
        *keys, ts_col, *left_only, chosen.alias("_c")
    ).select(
        *keys, ts_col, *left_only,
        *[F.col(f"_c.{p}").alias(f"asof_{p}") for p in payload_cols],
    )
