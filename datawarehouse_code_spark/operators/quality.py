"""Data-quality audit: constraint checks as one long-format report.

The reference's only quality mechanism is skip-on-duplicate-key with a
per-row warning (warehouse.py:94,116,126,136,169,210) — MySQL's PK/FK
constraints do the real enforcement, invisibly to the program.  A
parquet lakehouse has no enforcing storage layer, so the engine must
*audit*: count violations declaratively and let the pipeline gate on
the report.

Report schema (long format, so adding checks never changes it):
  check_kind STRING — 'null' | 'unique' | 'fk' | 'range'
  target STRING  — column or relationship audited
  n_bad BIGINT   — violating rows
  n_rows BIGINT  — rows scanned for that check

Scale shapes:
- `null`/`range` checks for a whole table compile to ONE aggregation
  pass (a single agg with per-column conditional counts, unpivoted) —
  never one job per column.
- `unique` is count(*) - count(distinct key): a partial-aggregated
  pass, no self-join.
- `fk` is a left-anti join child→parent on the key — the same shape
  as insert-if-not-exists (operators/dimensions.py), shuffle-
  partitioned on the key; NULL FKs are not violations (SQL semantics).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_REPORT_COLS = ("check_kind", "target", "n_bad", "n_rows")


def _report(kind: str, target: str, n_bad: Column, n_rows: Column) -> list[Column]:
    return [
        F.lit(kind).alias("check_kind"),
        F.lit(target).alias("target"),
        n_bad.cast("bigint").alias("n_bad"),
        n_rows.cast("bigint").alias("n_rows"),
    ]


def null_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """Null count per column — ONE aggregation over the table, then a
    1-row unpivot (never a scan per column)."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.count_if(F.col(c).isNull()).alias(c) for c in cols],
    )
    return agg.unpivot(["_n"], cols, "target", "n_bad").select(
        F.lit("null").alias("check_kind"),
        "target",
        F.col("n_bad").cast("bigint"),
        F.col("_n").cast("bigint").alias("n_rows"),
    )


def unique_violations(df: DataFrame, key: list[str]) -> DataFrame:
    """Rows in excess of one per key value: count(*) - count(distinct).

    NULL-key behavior (documented, SQL-consistent): countDistinct
    skips rows where ANY key column is NULL, so every NULL-keyed row
    counts toward n_bad even if it is the only one — the check treats
    a NULL key as a violation in itself, conflated with duplicates in
    one number.  For a key that legitimately allows NULLs, pair this
    with `null_counts` on the key columns to attribute the two causes
    separately; for a primary-key audit the conflation is what you
    want (a PK must be non-NULL *and* unique).
    """
    return df.agg(
        *_report(
            "unique",
            ",".join(key),
            F.count(F.lit(1)) - F.countDistinct(*key),
            F.count(F.lit(1)),
        )
    )


def fk_violations(
    child: DataFrame, fk: str, parent: DataFrame, pk: str, target: str
) -> DataFrame:
    """Non-NULL child FKs with no parent: anti-join, counted."""
    bad = child.where(F.col(fk).isNotNull()).join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    n_rows = child.agg(F.count(F.lit(1)).alias("n")).select("n")
    return bad.agg(F.count(F.lit(1)).alias("b")).crossJoin(n_rows).select(
        *_report("fk", target, F.col("b"), F.col("n"))
    )


def range_violations(df: DataFrame, target: str, predicate: Column) -> DataFrame:
    """Rows where `predicate` (the VALID condition) is false or NULL."""
    return df.agg(
        *_report(
            "range",
            target,
            F.count(F.lit(1)) - F.count_if(predicate),
            F.count(F.lit(1)),
        )
    )


def dq_audit(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check reports into one audit table."""
    if not checks:
        raise ValueError("dq_audit: no checks given")
    return reduce(lambda a, b: a.unionByName(b), checks).select(*_REPORT_COLS)


def skew_report(
    df: DataFrame, keys: list[str], top_n: int = 20
) -> DataFrame:
    """The heavy-hitter diagnosis every shuffle-debugging session
    starts with: the `top_n` heaviest key groups with row counts and
    corpus share — the keys that make a join/groupBy partition
    straggle and that salting / AQE skew-join would target
    (operators/joins.py salted_join).

    Output: keys..., n_rows, share_f4 (floor-scaled: cross-engine
    doctrine), ordered heaviest-first with the key tuple as
    deterministic tie-break.

    Scale shape: one partial-aggregated groupBy on the keys, the
    total re-aggregated from the GROUP COUNTS (rollup-sized input —
    never a second scan of the table) and broadcast back; the top-n
    compiles to TakeOrderedAndProject, never a global sort.  NULL
    keys group normally — a hot NULL is the single most common skew
    culprit.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            (F.floor(F.col("n_rows") / F.col("_total") * 10000) / 10000).alias(
                "share_f4"
            ),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(k).asc_nulls_last() for k in keys])
        .limit(top_n)
    )


def anomaly_report(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    metric_col: str,
    k_bp: int = 50_000,
) -> DataFrame:
    """Robust outlier detection over a metric time series (the ops
    check on a MAINTAINED rollup: which days deviate from this
    group's norm?): flag points where |x − median| · 10⁴ > k_bp ·
    MAD, with the median and MAD as DISCRETE per-key quantiles
    (value at floor(0.5·(n−1)) — the engine-exact doctrine) and the
    threshold in pure integer arithmetic (`k_bp` basis points, 50000
    = 5 MADs) so both engines flag identical rows.  Median/MAD, not
    mean/stddev: one genuine spike inflates a stddev enough to mask
    the next spike; the breakdown point of MAD is 50%.

    MAD = 0 (over half the points identical) flags ANY deviation —
    documented, intentional: in a constant series every change is
    signal.

    Scale shape: two window passes over the INPUT (a rollup-sized
    series, never raw facts) — rank for the median, rank for the
    MAD — then a broadcast-sized join back.  Output: the flagged
    rows with median, mad, dev for triage.
    """
    w = Window.partitionBy(*keys).orderBy(metric_col)
    wk = Window.partitionBy(*keys)
    ranked = df.withColumn("_rn", F.row_number().over(w) - 1).withColumn(
        "_n", F.count(F.lit(1)).over(wk)
    )
    med_idx = F.floor(F.lit(0.5) * (F.col("_n") - 1)).cast("long")
    med = ranked.groupBy(*keys).agg(
        F.max(F.when(F.col("_rn") == med_idx, F.col(metric_col))).alias("med")
    )
    devs = df.join(F.broadcast(med), keys).withColumn(
        "dev", F.abs(F.col(metric_col) - F.col("med"))
    )
    wd = Window.partitionBy(*keys).orderBy("dev")
    ranked_d = devs.withColumn("_rn", F.row_number().over(wd) - 1).withColumn(
        "_n", F.count(F.lit(1)).over(wk)
    )
    mad = ranked_d.groupBy(*keys).agg(
        F.max(F.when(F.col("_rn") == med_idx, F.col("dev"))).alias("mad")
    )
    return (
        devs.join(F.broadcast(mad), keys)
        .filter(F.col("dev") * F.lit(10_000) > F.lit(k_bp) * F.col("mad"))
        .select(*keys, time_col, metric_col, "med", "mad", "dev")
    )


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    n_buckets: int = 10,
) -> DataFrame:
    """Distribution-drift report between a REFERENCE slice and a
    CURRENT slice — the train/serve skew and data-freshness check an
    ML pipeline runs before trusting new data: per column, fixed
    integer buckets derived from the reference's [min, max], with
    both sides' counts and basis-point shares and the absolute share
    drift.  Feed the PSI/chi-square of your choice from the counts;
    the report itself stays all-integer, so it is hash-exact across
    engines.

    `cols` must be INTEGER-typed columns (cast money to cents, dates
    to epoch days — the caller owns the lossless int conversion).
    Integer bucketing is the cross-engine contract: float bucket
    arithmetic differs in the last ulp on boundary values, integer
    `div` cannot.  Bucket ids: -2 = NULL, -1 = below the reference
    min (new low outliers), n_buckets = above the reference max (new
    high outliers), else 0..n_buckets-1 over the reference range.

    Scale shape: one tiny min/max agg over the reference (collected —
    2·|cols| longs), then ONE scan per side (per-column buckets
    emitted via a single explode, so |cols| never multiplies scans),
    two partial-aggregated groupBys merged with a full-outer on
    (col, bucket) — at most |cols|·(n_buckets+3) rows ever shuffle.
    """
    if not cols:
        raise ValueError("drift_report needs at least one column")
    for df, side in ((ref, "ref"), (cur, "cur")):
        non_int = [
            c for c in cols
            if df.schema[c].dataType.simpleString()
            not in ("int", "bigint", "smallint", "tinyint")
        ]
        if non_int:
            raise ValueError(
                f"drift_report: {side} columns must be integer-typed "
                f"(cast money to cents, dates to epoch days): {non_int}"
            )
    row = ref.agg(
        *[F.min(c).cast("bigint").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("bigint").alias(f"mx_{c}") for c in cols],
    ).collect()[0]

    def bucket(c: str) -> Column:
        lo, hi = row[f"mn_{c}"], row[f"mx_{c}"]
        if lo is None or hi is None:
            return F.when(F.col(c).isNull(), F.lit(-2)).otherwise(F.lit(0))
        width = hi - lo + 1
        x = F.col(c).cast("bigint")
        return (
            F.when(F.col(c).isNull(), F.lit(-2))
            .when(x < lo, F.lit(-1))
            .when(x > hi, F.lit(n_buckets))
            .otherwise(
                # backticks: column names with spaces/keywords must
                # survive the expr round-trip like they do everywhere
                # else in this function
                F.expr(
                    f"(CAST(`{c}` AS BIGINT) - {lo}) * {n_buckets} div {width}"
                )
            )
        )

    def side_counts(df: DataFrame, alias: str) -> DataFrame:
        pairs = F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("col"), bucket(c).alias("bucket"))
                    for c in cols
                ]
            )
        ).alias("p")
        return (
            df.select(pairs)
            .select("p.col", "p.bucket")
            .groupBy("col", "bucket")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    merged = side_counts(ref, "n_ref").join(
        side_counts(cur, "n_cur"), ["col", "bucket"], "full_outer"
    ).select(
        "col",
        "bucket",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    w = Window.partitionBy("col")
    return (
        merged.withColumn("_tr", F.sum("n_ref").over(w))
        .withColumn("_tc", F.sum("n_cur").over(w))
        .withColumn(
            "ref_bp",
            F.when(F.col("_tr") > 0, F.expr("(n_ref * 10000) div _tr"))
            .otherwise(F.lit(0)),
        )
        .withColumn(
            "cur_bp",
            F.when(F.col("_tc") > 0, F.expr("(n_cur * 10000) div _tc"))
            .otherwise(F.lit(0)),
        )
        .withColumn("drift_bp", F.abs(F.col("ref_bp") - F.col("cur_bp")))
        .drop("_tr", "_tc")
    )


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Column profile in long format — the data-discovery report every
    warehouse onboarding starts with: per column, row count, NULL
    count, EXACT distinct count, and min/max rendered as strings (so
    one schema covers every column type).

    Scale shape: one independent aggregation branch PER COLUMN,
    unioned — each branch's scan prunes to its single column
    (columnar parquet reads exactly one column's pages) and runs a
    plain single-distinct aggregate.  This beats the tempting
    one-pass multi-distinct agg by ~6× (measured at sf0.1): Spark
    compiles N distinct aggregates in one pass via EXPAND, shuffling
    N+1 copies of every row, while N narrow branches shuffle N
    single-column streams.  Min/max evaluate on the NATIVE type and
    cast to string only for display (string comparison would order
    "10" < "9").  For routine monitoring at 100 TB swap
    approx_count_distinct into the branch (the HLL rollups above);
    exact profiling is for onboarding runs, where its answer is the
    point — `approx=True` is that monitoring knob (±2% rsd HLL).
    """
    if cols is None:
        cols = df.columns
    if not cols:
        raise ValueError("profile_table needs at least one column")

    def branch(c: str) -> DataFrame:
        nd = (
            F.approx_count_distinct(c, 0.02)
            if approx
            else F.countDistinct(c)
        )
        return df.select(c).agg(
            F.lit(c).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(c).isNull().cast("bigint")).alias("n_nulls"),
            nd.alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        ).select(
            "col", "n_rows", "n_nulls", "n_distinct",
            "min_value", "max_value",
        )

    out = branch(cols[0])
    for c in cols[1:]:
        out = out.unionByName(branch(c))
    return out
