"""Reference-surface queries (SURVEY.md §2.1, Phase 1).

Each entry re-expresses one operator family of the reference
(warehouse.py) as a declarative Spark plan, with a DuckDB oracle twin.
The fixture role-mapping is FIXTURES.md's: customer→dimclient,
part→dimproduct, nation→dimcountry, region→subregion,
orders→purchases, lineitem⋈orders→transportfact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.dimensions import insert_if_not_exists
from datawarehouse_code_spark.pipeline import build_warehouse
from datawarehouse_code_spark.plans.base import Query
from datawarehouse_code_spark.sources.catalog import read_table

# ---------------------------------------------------------------- dims


def _dim_client(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_warehouse(spark, sf_dir).dim_client


_DIM_CLIENT_SQL = """
SELECT c_custkey AS client_id,
       c_name AS company_name,
       CASE c_mktsegment
            WHEN 'MACHINERY'  THEN 'mechanic_company'
            WHEN 'AUTOMOBILE' THEN 'electric_company'
            WHEN 'BUILDING'   THEN 'industry'
       END AS company_type,
       CAST(CASE c_mktsegment
            WHEN 'MACHINERY'  THEN 1
            WHEN 'AUTOMOBILE' THEN 2
            WHEN 'BUILDING'   THEN 3
       END AS INTEGER) AS industry_id,
       c_nationkey AS country_id,
       c_acctbal AS acctbal
FROM customer
"""


def _dim_product_subcategory(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_warehouse(spark, sf_dir).dim_product_subcategory


_DIM_SUB_SQL = """
SELECT CAST(row_number() OVER (ORDER BY subcategory) AS INTEGER) AS subcategory_id,
       subcategory
FROM (SELECT DISTINCT p_type AS subcategory FROM part)
"""


def _dim_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_warehouse(spark, sf_dir).dim_product


_DIM_PRODUCT_SQL = """
WITH sub AS (
  SELECT CAST(row_number() OVER (ORDER BY subcategory) AS INTEGER) AS subcategory_id,
         subcategory
  FROM (SELECT DISTINCT p_type AS subcategory FROM part)
)
SELECT p_partkey AS product_id,
       p_brand AS code,
       p_name AS product_name,
       p_type AS family,
       subcategory_id AS category_id,
       p_retailprice AS retail_price
FROM part JOIN sub ON part.p_type = sub.subcategory
"""


def _dim_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_warehouse(spark, sf_dir).dim_country


_DIM_COUNTRY_SQL = """
SELECT n_nationkey AS country_id, n_name AS country_name, n_regionkey AS region_id
FROM nation
"""


def _dim_country_subregion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_warehouse(spark, sf_dir).dim_country_subregion


_DIM_SUBREGION_SQL = """
SELECT r_regionkey AS subregion_id, r_name AS subregion, n_nationkey AS country_id
FROM nation JOIN region ON nation.n_regionkey = region.r_regionkey
"""


def _dim_date_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_warehouse(spark, sf_dir).dim_date_year


_DIM_YEAR_SQL = """
SELECT CAST(row_number() OVER (ORDER BY year) AS INTEGER) AS year_id, year
FROM (SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS year FROM orders)
"""


def _dim_date_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_warehouse(spark, sf_dir).dim_date_month


_DIM_MONTH_SQL = """
SELECT CAST(m AS INTEGER) AS month_id, CAST(m AS INTEGER) AS month
FROM generate_series(1, 12) t(m)
"""


def _dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_warehouse(spark, sf_dir).dim_date


_DIM_DATE_SQL = """
WITH years AS (
  SELECT CAST(row_number() OVER (ORDER BY year) AS INTEGER) AS year_id, year
  FROM (SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS year FROM orders)
), dates AS (
  SELECT DISTINCT CAST(o_orderdate AS DATE) AS date FROM orders
)
SELECT CAST(year(date) * 10000 + month(date) * 100 + day(date) AS INTEGER) AS date_id,
       CAST(day(date) AS INTEGER) AS day,
       CAST(month(date) AS INTEGER) AS month_id,
       years.year_id AS year_id,
       years.year AS year,
       date,
       CAST((quarter(date) - 1) * 3 + 1 AS INTEGER) AS three_months
FROM dates JOIN years ON CAST(year(dates.date) AS INTEGER) = years.year
"""

# ---------------------------------------------------------------- fact & cube


def _fact_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # surrogate `id` is md5('|'-joined natural key) — reproducible in
    # DuckDB, so the oracle now checks it too (tests/test_operators.py
    # additionally covers determinism + uniqueness).
    return build_warehouse(spark, sf_dir).fact


_FACT_SQL = """
SELECT md5(CAST(length(CAST(l_orderkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_orderkey AS VARCHAR) || '|' || CAST(length(CAST(l_linenumber AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) || '|' || CAST(length(CAST(l_partkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR) || '|' || CAST(length(CAST(l_suppkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR) || '|' || CAST(length(CAST(l_quantity AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_quantity AS VARCHAR) || '|' || CAST(length(CAST(l_extendedprice AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_extendedprice AS VARCHAR)) AS id,
       l_partkey AS product_id,
       o_custkey AS client_id,
       CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100 + day(o_orderdate)
            AS INTEGER) AS date_id,
       c_nationkey AS country_id,
       l_quantity AS quantity,
       l_extendedprice AS price,
       CAST(year(o_orderdate) AS INTEGER) AS year
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def _cube_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_warehouse(spark, sf_dir).cube


_CUBE_SQL = """
WITH sub AS (
  SELECT CAST(row_number() OVER (ORDER BY subcategory) AS INTEGER) AS subcategory_id,
         subcategory
  FROM (SELECT DISTINCT p_type AS subcategory FROM part)
)
SELECT md5(CAST(length(CAST(l_orderkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_orderkey AS VARCHAR) || '|' || CAST(length(CAST(l_linenumber AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) || '|' || CAST(length(CAST(l_partkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR) || '|' || CAST(length(CAST(l_suppkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR) || '|' || CAST(length(CAST(l_quantity AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_quantity AS VARCHAR) || '|' || CAST(length(CAST(l_extendedprice AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_extendedprice AS VARCHAR)) AS fact_id,
       l_partkey AS product_id,
       sub.subcategory AS category,
       p_name AS product_name,
       p_type AS family,
       p_brand AS code,
       o_custkey AS client_id,
       c_name AS company_name,
       CASE c_mktsegment
            WHEN 'MACHINERY'  THEN 'mechanic_company'
            WHEN 'AUTOMOBILE' THEN 'electric_company'
            WHEN 'BUILDING'   THEN 'industry'
       END AS company_type,
       n_name AS country_name,
       CAST(o_orderdate AS DATE) AS date,
       CAST(day(o_orderdate) AS INTEGER) AS day,
       CAST(month(o_orderdate) AS INTEGER) AS month,
       CAST(year(o_orderdate) AS INTEGER) AS year,
       l_quantity AS quantity,
       l_extendedprice AS price
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN part     ON l_partkey = p_partkey
JOIN sub      ON p_type = sub.subcategory
"""

# ------------------------------------------------- load-pattern operators


def _insert_if_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: incoming orders anti-joined against the 'already loaded' set
    (orders that already have lineitems) — the rows the reference's
    per-row existence check would insert (warehouse.py:78-94).
    Non-empty at every fixture sf, so the oracle hash is a real check."""
    orders = read_table(spark, "orders", sf_dir)
    lineitem = read_table(spark, "lineitem", sf_dir)
    existing = lineitem.select(F.col("l_orderkey").alias("o_orderkey"))
    return insert_if_not_exists(orders, existing, ["o_orderkey"]).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


_ANTI_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
"""


def _union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: bag union across homogeneous-projected tables."""
    customer = read_table(spark, "customer", sf_dir)
    supplier = read_table(spark, "supplier", sf_dir)
    c = customer.select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = supplier.select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


_UNION_SQL = """
SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
UNION ALL
SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier
"""


def _dedup_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O14: composite-natural-key dedup — one row per (day, month, year)
    of o_orderdate, keeping the smallest orderkey as a witness."""
    orders = read_table(spark, "orders", sf_dir)
    return (
        orders.select(
            F.dayofmonth("o_orderdate").cast("int").alias("day"),
            F.month("o_orderdate").cast("int").alias("month_id"),
            F.year("o_orderdate").cast("int").alias("year"),
            F.col("o_orderkey"),
        )
        .groupBy("day", "month_id", "year")
        .agg(F.min("o_orderkey").alias("witness_orderkey"))
    )


_DEDUP_SQL = """
SELECT CAST(day(o_orderdate) AS INTEGER) AS day,
       CAST(month(o_orderdate) AS INTEGER) AS month_id,
       CAST(year(o_orderdate) AS INTEGER) AS year,
       min(o_orderkey) AS witness_orderkey
FROM orders
GROUP BY 1, 2, 3
"""


# ------------------------------------------------- consolidated suites
#
# The driver's correctness gate checks a bounded prefix of the registry
# (50 entries), so trivially-coupled queries are unioned into labeled
# suite rows — SAME constituent plans, SAME oracle SQL per branch, one
# registry slot.  The constituents stay importable (and benchable via
# SUPPLEMENTARY below); only the driver-facing surface consolidates.


def _dim_date_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_date_year + dim_date_month as one labeled union (O9 + B4)."""
    wh = build_warehouse(spark, sf_dir)
    y = wh.dim_date_year.select(
        F.lit("year").alias("part"),
        F.col("year_id").cast("int").alias("id"),
        F.col("year").cast("int").alias("value"),
    )
    m = wh.dim_date_month.select(
        F.lit("month").alias("part"),
        F.col("month_id").cast("int").alias("id"),
        F.col("month").cast("int").alias("value"),
    )
    return y.unionByName(m)


_DIM_DATE_LOOKUP_SQL = """
SELECT 'year' AS part,
       CAST(row_number() OVER (ORDER BY year) AS INTEGER) AS id,
       year AS value
FROM (SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS year FROM orders)
UNION ALL
SELECT 'month' AS part, CAST(m AS INTEGER) AS id, CAST(m AS INTEGER) AS value
FROM generate_series(1, 12) t(m)
"""


def _dim_country_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_country ⋈ dim_country_subregion — both dims' projections in
    one row set (O1/O21 projection + the bridge dim)."""
    wh = build_warehouse(spark, sf_dir)
    return wh.dim_country.join(
        wh.dim_country_subregion, "country_id"
    ).select("country_id", "country_name", "region_id", "subregion_id", "subregion")


_DIM_COUNTRY_REGION_SQL = """
SELECT n_nationkey AS country_id,
       n_name AS country_name,
       n_regionkey AS region_id,
       r_regionkey AS subregion_id,
       r_name AS subregion
FROM nation JOIN region ON nation.n_regionkey = region.r_regionkey
"""


def _load_pattern_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 anti-join load + O3 bag union + O14 composite dedup, labeled."""
    anti = _insert_if_not_exists(spark, sf_dir).select(
        F.lit("anti").alias("part"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_custkey").alias("k2"),
        F.col("o_orderstatus").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.col("o_totalprice").alias("val"),
    )
    union = _union_all(spark, sf_dir).select(
        F.lit("union").alias("part"),
        F.lit(None).cast("bigint").alias("k1"),
        F.lit(None).cast("bigint").alias("k2"),
        F.col("name").alias("s1"),
        F.col("kind").alias("s2"),
        F.col("acctbal").alias("val"),
    )
    dedup = _dedup_composite_key(spark, sf_dir).select(
        F.lit("dedup").alias("part"),
        (
            F.col("year").cast("bigint") * 10000
            + F.col("month_id") * 100
            + F.col("day")
        ).alias("k1"),
        F.col("witness_orderkey").alias("k2"),
        F.lit(None).cast("string").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.lit(None).cast("double").alias("val"),
    )
    return anti.unionByName(union).unionByName(dedup)


_LOAD_PATTERN_SQL = """
SELECT 'anti' AS part, o_orderkey AS k1, o_custkey AS k2,
       o_orderstatus AS s1, CAST(NULL AS VARCHAR) AS s2, o_totalprice AS val
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
UNION ALL
SELECT 'union', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       c_name, 'customer', c_acctbal FROM customer
UNION ALL
SELECT 'union', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       s_name, 'supplier', s_acctbal FROM supplier
UNION ALL
SELECT 'dedup',
       CAST(year(o_orderdate) AS BIGINT) * 10000
         + month(o_orderdate) * 100 + day(o_orderdate),
       min(o_orderkey),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
FROM orders
GROUP BY year(o_orderdate), month(o_orderdate), day(o_orderdate)
"""


REFERENCE_QUERIES: list[Query] = [
    Query("dim_client", _dim_client, _DIM_CLIENT_SQL, "O5/O7: CASE mapping dim"),
    Query("dim_product", _dim_product, _DIM_PRODUCT_SQL, "O8 snowflake dim (embeds the subcategory lookup)"),
    Query("dim_country_region", _dim_country_region, _DIM_COUNTRY_REGION_SQL, "O1/O21 projection + bridge dim"),
    Query("dim_date_lookup", _dim_date_lookup, _DIM_DATE_LOOKUP_SQL, "O9 lookup-or-create + B4 static month dim"),
    Query("dim_date", _dim_date, _DIM_DATE_SQL, "O10-O14 date derivations"),
    Query("fact_build", _fact_build, _FACT_SQL, "O15/O16 fact projection, real measures (B6)"),
    Query("cube_table", _cube_table, _CUBE_SQL, "O20-O22 star join cube"),
    Query("load_pattern_suite", _load_pattern_suite, _LOAD_PATTERN_SQL, "O5 anti-join + O3 bag union + O14 composite dedup"),
]

# Constituents of the suites above (plus dims whose derivation a suite
# already exercises end-to-end): still first-class library queries —
# benchable, unit-tested, importable — just not separate driver rows.
REFERENCE_SUPPLEMENTARY: list[Query] = [
    Query("dim_product_subcategory", _dim_product_subcategory, _DIM_SUB_SQL, "O8 lookup-or-create (embedded in dim_product)"),
    Query("dim_country", _dim_country, _DIM_COUNTRY_SQL, "O1/O21 projection (in dim_country_region)"),
    Query("dim_country_subregion", _dim_country_subregion, _DIM_SUBREGION_SQL, "bridge dim (in dim_country_region)"),
    Query("dim_date_year", _dim_date_year, _DIM_YEAR_SQL, "O9 lookup-or-create (in dim_date_lookup)"),
    Query("dim_date_month", _dim_date_month, _DIM_MONTH_SQL, "B4: static month dim (in dim_date_lookup)"),
    Query("insert_if_not_exists", _insert_if_not_exists, _ANTI_SQL, "O5 anti-join load (in load_pattern_suite)"),
    Query("union_all_tables", _union_all, _UNION_SQL, "O3 bag union (in load_pattern_suite)"),
    Query("dedup_composite_key", _dedup_composite_key, _DEDUP_SQL, "O14 composite dedup (in load_pattern_suite)"),
]
