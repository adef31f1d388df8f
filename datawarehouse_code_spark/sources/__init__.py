from datawarehouse_code_spark.sources.catalog import TABLES, read_table, register_views

__all__ = ["TABLES", "read_table", "register_views"]
