from datawarehouse_code_spark.plans.registry import QUERIES, Query, oracle_sql, queries

__all__ = ["QUERIES", "Query", "queries", "oracle_sql"]
