"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``datawarehouse_code_spark`` package; this
module only adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datawarehouse_code_spark.plans.registry import oracle_sql as _oracle_sql
from datawarehouse_code_spark.plans.registry import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's cube
    (warehouse.py:256-284) completed with the aggregation it exists to
    serve — revenue by year × country (SURVEY.md §7.2)."""
    from pyspark.sql import functions as F

    from datawarehouse_code_spark.pipeline import build_warehouse

    wh = build_warehouse(spark, "/root/testdata/sf0.001")
    return (
        wh.cube.groupBy("year", "country_name")
        .agg(
            F.round(F.sum(F.col("quantity") * F.col("price")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("year", "country_name")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible query."""
    return _oracle_sql()
