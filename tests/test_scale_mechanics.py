"""Scale-mechanics tests: bucketed co-located joins eliminate the
shuffle (the 100 TB escape hatch for big-big joins), the SQL view
surface works, and the O25 skip report counts correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.dimensions import insert_if_not_exists_report
from datawarehouse_code_spark.pipeline import write_bucketed
from datawarehouse_code_spark.sources.catalog import read_table, register_views
from tests.conftest import SF_DIR


def test_bucketed_join_eliminates_shuffle(spark):
    """Joining two tables bucketed+sorted on the join key must need no
    Exchange (and no Sort beyond the bucket files): the co-location
    that replaces a multi-TB shuffle at scale."""
    li = read_table(spark, "lineitem", SF_DIR).select("l_orderkey", "l_quantity")
    orders = read_table(spark, "orders", SF_DIR).select("o_orderkey", "o_custkey")
    write_bucketed(li, "t_li_bucketed", 8, "l_orderkey")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "t_ord_bucketed", 8,
        "l_orderkey",
    )
    try:
        a = spark.table("t_li_bucketed")
        b = spark.table("t_ord_bucketed")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "l_orderkey")
            assert joined.count() > 0
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, "bucketed join still shuffles:\n" + plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def test_register_views_sql_surface(spark):
    """O23: every catalog table is queryable through spark.sql, and the
    cube view (the reference's commented-out VIEW design) works too."""
    from datawarehouse_code_spark.operators.cube import register_cube_view
    from datawarehouse_code_spark.pipeline import build_warehouse

    register_views(spark, SF_DIR)
    row = spark.sql(
        """
        SELECT count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        """
    ).collect()[0]
    assert row["n"] > 0
    assert spark.sql("SELECT count(*) AS n FROM documents").collect()[0]["n"] > 0

    register_cube_view(build_warehouse(spark, SF_DIR).cube)
    agg = spark.sql(
        "SELECT count(DISTINCT country_name) AS n FROM cube_view"
    ).collect()[0]
    assert agg["n"] > 0


def test_read_jdbc_builder_reaches_load(spark):
    """JDBC connector parity: no driver jar ships in this container, so
    the reader must at least assemble its options and fail at load time
    (not before) with a driver/connection error."""
    import pytest

    from datawarehouse_code_spark.sources.catalog import read_jdbc

    with pytest.raises(Exception):
        read_jdbc(
            spark,
            "jdbc:mysql://localhost:1/nope",
            "transportation.companies",
            partition_column="id",
            num_partitions=4,
            upper_bound=1000,
        )


def test_salted_join_equals_plain_join(spark):
    """Salting must not change join semantics: on a deliberately
    skewed dataset (90% of rows share one key) the salted inner join
    returns exactly the plain join's rows."""
    from datawarehouse_code_spark.operators.joins import salted_join

    skewed = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    plain = skewed.join(dim, ["k"]).select("k", "payload", "attr")
    salted = salted_join(skewed, dim, ["k"]).select("k", "payload", "attr")
    assert salted.count() == plain.count() > 0
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_insert_report_counts(spark):
    orders = read_table(spark, "orders", SF_DIR)
    existing = orders.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey")
    delta, report = insert_if_not_exists_report(orders, existing, ["o_orderkey"])
    assert report["incoming"] == orders.count()
    assert report["inserted"] == delta.count()
    assert report["skipped"] == report["incoming"] - report["inserted"]
    assert report["skipped"] > 0
