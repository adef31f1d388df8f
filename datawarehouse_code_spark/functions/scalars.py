"""Scalar expression helpers — pure Column → Column, JVM-side.

Everything here stays inside whole-stage codegen (no Python UDFs):
the reference's per-row Python transforms (SURVEY.md O7, O10-O12) and
the vector math for the similarity operators are all expressible as
built-in Spark SQL expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quarter_start_month(date_col: Column) -> Column:
    """First month of the quarter: the reference's `three_months`
    derivation ``(quarter-1)*3 + 1`` (warehouse.py:164-165, O11/O12)."""
    return ((F.quarter(date_col) - F.lit(1)) * F.lit(3) + F.lit(1)).cast("int")


def date_key(date_col: Column) -> Column:
    """Deterministic yyyymmdd surrogate key for a date dimension.

    Replaces the reference's AUTO_INCREMENT date-dim id
    (warehouse.py:162, O19): computable per-row with no global
    sequence or shuffle, idempotent across re-runs — the property a
    100 TB load needs and LAST_INSERT_ID() can't give.
    """
    return (
        F.year(date_col) * F.lit(10000) + F.month(date_col) * F.lit(100) + F.dayofmonth(date_col)
    ).cast("int")


def surrogate_hash_key(*cols: Column) -> Column:
    """Stable 64-bit surrogate key from a natural key (SURVEY.md §7.1).

    xxhash64 is deterministic, parallel and join-stable — the scale-safe
    replacement for AUTO_INCREMENT/LAST_INSERT_ID (warehouse.py:110,151).
    64-bit birthday bound is ~4.3×10⁹ keys: use only for bounded-domain
    dimensions; fact-scale keys take :func:`surrogate_hash_key128`.
    """
    return F.xxhash64(*cols)


def surrogate_hash_key128(*cols: Column) -> Column:
    """Stable 128-bit surrogate key (hex string) from a natural key.

    md5 over an INJECTIVE encoding of the key columns: each value is
    length-prefixed (``len:value``) and NULL becomes the literal ``N``
    (distinguishable — real encodings always start with a digit), so
    neither concat_ws's NULL-skipping nor delimiter characters inside
    values can make two distinct keys collide.  Deterministic,
    parallel, join-stable, and collision-safe at 100 TB row counts
    (128-bit birthday bound ≈ 1.8×10¹⁹ ≫ ~6×10¹¹ lineitem rows),
    where a 64-bit surrogate would already collide (~4.3×10⁹).
    """
    parts = [
        F.coalesce(
            F.concat(F.length(c.cast("string")).cast("string"), F.lit(":"), c.cast("string")),
            F.lit("N"),
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("|", *parts))


def dot_product(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns via zip_with + aggregate
    (JVM-side; no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of a float-array column."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, fully JVM-side."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
