"""Explicit schemas for every catalog table.

The reference keeps schemas only in external MySQL DDL and accesses
rows positionally (warehouse.py:78,82,140,208 — `row[0]`, `row[8]`,
…), crashing on any drift.  We invert that: every table has a declared
``StructType`` here, and :func:`datawarehouse_code_spark.sources.catalog.read_table`
verifies the parquet footer against it (fail fast on drift, SURVEY.md
§1.4).  No ``inferSchema`` anywhere in engine paths.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


REGION = T.StructType([
    _f("r_regionkey", T.IntegerType()),
    _f("r_name", T.StringType()),
])

NATION = T.StructType([
    _f("n_nationkey", T.IntegerType()),
    _f("n_name", T.StringType()),
    _f("n_regionkey", T.IntegerType()),
])

CUSTOMER = T.StructType([
    _f("c_custkey", T.LongType()),
    _f("c_name", T.StringType()),
    _f("c_nationkey", T.IntegerType()),
    _f("c_acctbal", T.DoubleType()),
    _f("c_mktsegment", T.StringType()),
])

SUPPLIER = T.StructType([
    _f("s_suppkey", T.LongType()),
    _f("s_name", T.StringType()),
    _f("s_nationkey", T.IntegerType()),
    _f("s_acctbal", T.DoubleType()),
])

PART = T.StructType([
    _f("p_partkey", T.LongType()),
    _f("p_name", T.StringType()),
    _f("p_brand", T.StringType()),
    _f("p_type", T.StringType()),
    _f("p_size", T.IntegerType()),
    _f("p_retailprice", T.DoubleType()),
])

ORDERS = T.StructType([
    _f("o_orderkey", T.LongType()),
    _f("o_custkey", T.LongType()),
    _f("o_orderstatus", T.StringType()),
    _f("o_totalprice", T.DoubleType()),
    _f("o_orderdate", T.TimestampNTZType()),
    _f("o_orderpriority", T.StringType()),
])

LINEITEM = T.StructType([
    _f("l_orderkey", T.LongType()),
    _f("l_partkey", T.LongType()),
    _f("l_suppkey", T.LongType()),
    _f("l_linenumber", T.IntegerType()),
    _f("l_quantity", T.DoubleType()),
    _f("l_extendedprice", T.DoubleType()),
    _f("l_discount", T.DoubleType()),
    _f("l_tax", T.DoubleType()),
    _f("l_returnflag", T.StringType()),
    _f("l_linestatus", T.StringType()),
    _f("l_shipdate", T.TimestampNTZType()),
])

EVENTS = T.StructType([
    _f("event_id", T.LongType()),
    _f("ts", T.TimestampNTZType()),
    _f("user_id", T.LongType()),
    _f("event_type", T.StringType()),
    _f("value", T.DoubleType()),
    _f("props", T.StringType()),
])

DOCUMENTS = T.StructType([
    _f("doc_id", T.LongType()),
    _f("text", T.StringType()),
    _f("lang", T.StringType()),
    _f("source", T.StringType()),
    _f("n_chars", T.LongType()),
])

EMBEDDINGS = T.StructType([
    _f("vec_id", T.LongType()),
    _f("embedding", T.ArrayType(T.FloatType())),
    _f("label", T.IntegerType()),
])

SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
