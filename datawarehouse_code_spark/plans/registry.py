"""The engine's named-query registry (driver contract surface).

`queries()` / `oracle_sql()` here are re-exported by
`/root/repo/__spark_entry__.py` for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datawarehouse_code_spark.plans.base import Query, make_registry
from datawarehouse_code_spark.plans.reference_queries import REFERENCE_QUERIES

_GROUPS: list[list[Query]] = [REFERENCE_QUERIES]

try:  # widened per-phase; import-gated so a broken module never kills the gate
    from datawarehouse_code_spark.plans.warehouse_queries import WAREHOUSE_QUERIES

    _GROUPS.append(WAREHOUSE_QUERIES)
except ImportError:
    pass

try:
    from datawarehouse_code_spark.plans.llm_queries import LLM_QUERIES

    _GROUPS.append(LLM_QUERIES)
except ImportError:
    pass

try:
    from datawarehouse_code_spark.plans.streaming_queries import STREAMING_QUERIES

    _GROUPS.append(STREAMING_QUERIES)
except ImportError:
    pass

QUERIES: dict[str, Query] = make_registry(*_GROUPS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
