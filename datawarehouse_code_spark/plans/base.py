"""Query registry plumbing.

Every engine capability is exposed as a named `Query`: a PySpark
callable `(spark, sf_dir) -> DataFrame` plus (when SQL-expressible) a
DuckDB oracle SQL string over the same parquet tables.  The driver's
correctness gate compares the two at sf0.01 (row count + schema +
order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- derived integer columns are cast explicitly (Spark `year()` is INT,
  DuckDB's is BIGINT — mismatches are cast away on the oracle side);
- floating-point aggregates are rounded (ROUND(x, 2)) on both sides so
  summation-order ulp differences can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    """One named engine capability."""

    name: str
    fn: SparkFn
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    note: str = ""      # SURVEY.md §2 operator ids covered


def make_registry(*groups: list[Query]) -> dict[str, Query]:
    out: dict[str, Query] = {}
    for group in groups:
        for q in group:
            if q.name in out:
                raise ValueError(f"duplicate query name {q.name!r}")
            out[q.name] = q
    return out
