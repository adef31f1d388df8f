"""Time-series regularization: bucket resampling + gap filling.

Reference parity: none — the reference (a MySQL batch loader,
warehouse.py:1-314) has no time-series surface at all; this is the
§2.2 streaming/time-window obligation's missing batch half: windowed
aggregation (events_time_windows) produces buckets that EXIST, but
every downstream consumer of a regular series (charting, anomaly
detection over fixed intervals, ML feature frames, SLA reports)
needs the buckets that DON'T — the gaps made explicit, filled with a
constant or the last observation.

Scale shape: the spine (one row per key × bucket) is generated from a
TINY per-key bounds table (one partial-aggregated groupBy of the
pre-aggregated buckets, never the raw events), so the explode is
narrow and bounded by span/step per key; the join back to the
observed buckets shuffles both sides on (keys, bucket) — rollup-sized,
not event-sized; forward fill is ONE window over the same partition
keys.  Nothing here rescans raw data.

Span guard: a key whose [min, max] span divided by `step` exceeds
`max_buckets_per_key` raises loudly (a sensor with a 1970 timestamp
glitch would otherwise explode a 50-year minute-grain spine inside
one task) — the funnel-cap doctrine applied to time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_buckets(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    step: str,
    aggs: dict[str, F.Column],
) -> DataFrame:
    """Aggregate raw rows into `step`-wide buckets per key: bucket =
    the F.window start (shared semantics with Structured Streaming's
    tumbling windows, so "15 minutes" works as well as "1 day").
    Output: keys..., bucket, then one column per aggs entry."""
    return (
        df.groupBy(*keys, F.window(ts_col, step).alias("_w"))
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(*keys, F.col("_w.start").alias("bucket"), *aggs.keys())
    )


def gap_fill(
    buckets: DataFrame,
    keys: list[str],
    bucket_col: str,
    step: str,
    fill: dict[str, object],
    max_buckets_per_key: int = 10_000_000,
) -> DataFrame:
    """Regularize a bucketed series: emit EVERY `step`-spaced bucket
    between each key's first and last observation, filling the gaps
    per `fill` — column -> constant (e.g. 0 for counts), or the
    string "ffill" (last observation carried forward; the first
    bucket per key is always observed, so ffill never emits NULL).

    Bucket timestamps must already lie on the step grid
    (resample_buckets output does): an off-grid row would miss the
    spine join and silently vanish from the output, so the join is a
    full-outer with a spine marker and any bucket row the spine did
    not cover raises at execution, naming the offending bucket.
    """
    if not fill:
        raise ValueError("gap_fill needs at least one fill column")
    missing = [c for c in fill if c not in buckets.columns]
    if missing:
        raise ValueError(f"fill columns absent from input: {missing}")
    step_expr = f"INTERVAL {step}"
    bounds = buckets.groupBy(*keys).agg(
        F.min(bucket_col).alias("_mn"),
        F.max(bucket_col).alias("_mx"),
        F.count(F.lit(1)).alias("_n_obs"),
    )
    # span guard BEFORE the explode: the count of buckets the sequence
    # will produce, checked against the cap with the key in the error
    # cast: NTZ sources read the same wall clock under the UTC
    # session; unix_micros only accepts TIMESTAMP.  The step length in
    # µs comes from epoch + step (approximate for month steps — fine
    # for a cap).
    n_buckets = (
        (
            F.unix_micros(F.col("_mx").cast("timestamp"))
            - F.unix_micros(F.col("_mn").cast("timestamp"))
        )
        / F.unix_micros(
            F.lit("1970-01-01 00:00:00+00:00").cast("timestamp") + F.expr(step_expr)
        )
    ).cast("bigint") + 1
    guard = F.when(
        n_buckets > max_buckets_per_key,
        F.raise_error(
            F.concat(
                F.lit(
                    f"gap_fill: key spans more than max_buckets_per_key="
                    f"{max_buckets_per_key} buckets of '{step}': key="
                ),
                F.concat_ws("/", *[F.col(k).cast("string") for k in keys]),
            )
        ),
    ).otherwise(F.lit(True))
    spine = (
        bounds.filter(guard)
        .select(
            *keys,
            F.explode(
                F.expr(f"sequence(_mn, _mx, {step_expr})")
            ).alias(bucket_col),
            F.lit(True).alias("_on_grid"),
        )
    )
    joined = (
        spine.join(buckets, [*keys, bucket_col], "full_outer")
        .filter(
            F.when(
                F.col("_on_grid").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"gap_fill: bucket off the '{step}' grid "
                            "(not produced by resample_buckets?): "
                        ),
                        F.concat_ws(
                            "/",
                            *[F.col(k).cast("string") for k in keys],
                            F.col(bucket_col).cast("string"),
                        ),
                    )
                ),
            ).otherwise(F.lit(True))
        )
        .drop("_on_grid")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for c, how in fill.items():
        if how == "ffill":
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
        else:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(how)))
    return out


def resample(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    step: str,
    aggs: dict[str, F.Column],
    fill: dict[str, object],
    max_buckets_per_key: int = 10_000_000,
) -> DataFrame:
    """resample_buckets ∘ gap_fill: raw rows to a REGULAR per-key
    series in one call — the pandas `resample(...).agg(...).ffill()`
    of the DataFrame world, with the spine generated distributedly."""
    return gap_fill(
        resample_buckets(df, keys, ts_col, step, aggs),
        keys,
        "bucket",
        step,
        fill,
        max_buckets_per_key,
    )
