"""datawarehouse_code_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``enesmezani/datawarehouse_code`` (a MySQL star-schema ETL program,
``/root/reference/warehouse.py``) as an idiomatic Spark DataFrame/SQL
engine, extended with warehouse analytics (aggregations, windows,
set ops, time windows) and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout:
    sources/    — table catalog, schemas, readers (parquet/csv/json/jdbc)
    operators/  — dimension builders, fact build, cube, dedup, similarity
    functions/  — scalar expression helpers (pure Column → Column)
    plans/      — the named-query registry (Spark fn + DuckDB oracle SQL)
    streaming/  — batch-compatible time windows + Structured Streaming wrappers
    pipeline.py — end-to-end warehouse build driver (dims → fact → cube)
"""

from datawarehouse_code_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
