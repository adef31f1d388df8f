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

# Gate each phase module on ITS OWN absence only: a typo'd import or
# broken transitive dependency inside the module must fail loudly, not
# silently drop a whole phase from the correctness gate.
def _load_group(module: str, attr: str) -> None:
    try:
        mod = __import__(module, fromlist=[attr])
    except ModuleNotFoundError as e:
        if e.name != module:
            raise
        return
    _GROUPS.append(getattr(mod, attr))


_load_group("datawarehouse_code_spark.plans.warehouse_queries", "WAREHOUSE_QUERIES")
_load_group("datawarehouse_code_spark.plans.llm_queries", "LLM_QUERIES")
_load_group("datawarehouse_code_spark.plans.streaming_queries", "STREAMING_QUERIES")

QUERIES: dict[str, Query] = make_registry(*_GROUPS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
