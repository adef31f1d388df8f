"""End-to-end materialization: run_pipeline writes every warehouse
table to disk; the loaded artifacts are read back and verified
(O4/O17/O22/O26 — the reference's whole point is the load,
warehouse.py:307-314).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datawarehouse_code_spark.pipeline import build_warehouse, run_pipeline
from tests.conftest import SF_DIR


def test_run_pipeline_materializes_and_reads_back(spark, tmp_path):
    out = str(tmp_path / "wh")
    wh = run_pipeline(spark, SF_DIR, out)

    # every table written
    for name in (
        "dim_client", "dim_product", "dim_product_subcategory", "dim_country",
        "dim_country_subregion", "dim_date", "dim_date_month", "dim_date_year",
        "fact", "cube",
    ):
        assert os.path.isdir(f"{out}/{name}"), name

    # O17: fact is hive-partitioned by year on disk
    year_dirs = [d for d in os.listdir(f"{out}/fact") if d.startswith("year=")]
    assert len(year_dirs) >= 2

    # partition pruning actually happens on a year filter
    fact_back = spark.read.parquet(f"{out}/fact")
    plan = fact_back.filter(F.col("year") == 1995)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "year" in plan

    # O22/O26: the overwritten cube read back equals the in-memory cube
    cube_back = spark.read.parquet(f"{out}/cube")
    assert cube_back.count() == wh.cube.count()
    assert sorted(cube_back.columns) == sorted(wh.cube.columns)
    sym_diff = cube_back.exceptAll(wh.cube.select(*cube_back.columns)).count()
    assert sym_diff == 0

    # fact read back equals in-memory fact (column order differs:
    # partition column lands last on read)
    fact_mem = build_warehouse(spark, SF_DIR).fact
    assert fact_back.count() == fact_mem.count()
    assert fact_back.select(*fact_mem.columns).exceptAll(fact_mem).count() == 0


def test_run_pipeline_incremental_noop_then_catchup(spark, tmp_path):
    """Pipeline-level O5/O25: against an up-to-date warehouse the
    incremental load inserts nothing; against a warehouse built from a
    fact prefix it appends exactly the missing rows, converging to the
    full rebuild."""
    from datawarehouse_code_spark.operators.cube import build_cube
    from datawarehouse_code_spark.operators.fact import write_fact
    from datawarehouse_code_spark.pipeline import run_pipeline_incremental

    out = str(tmp_path / "wh_inc")
    wh = run_pipeline(spark, SF_DIR, out)

    # 1) idempotent no-op against the fresh materialization
    reports = run_pipeline_incremental(spark, wh, out)
    assert all(r["inserted"] == 0 for r in reports.values())
    assert spark.read.parquet(f"{out}/fact").count() == wh.fact.count()

    # 2) rebuild out_dir with a fact/cube PREFIX, then catch up
    old_fact = wh.fact.filter(F.col("year") <= 1995)
    write_fact(old_fact, f"{out}/fact")
    old_cube = build_cube(
        old_fact, wh.dim_product, wh.dim_product_subcategory, wh.dim_client,
        wh.dim_date, wh.dim_date_month, wh.dim_date_year, wh.dim_country,
    )
    old_cube.write.mode("overwrite").parquet(f"{out}/cube")

    reports = run_pipeline_incremental(spark, wh, out)
    missing = wh.fact.count() - old_fact.count()
    assert reports["fact"]["inserted"] == missing > 0
    assert reports["cube"]["inserted"] == wh.cube.count() - old_cube.count()

    fact_back = spark.read.parquet(f"{out}/fact")
    assert fact_back.count() == wh.fact.count()
    cube_back = spark.read.parquet(f"{out}/cube")
    assert cube_back.count() == wh.cube.count()
    assert cube_back.select(*wh.cube.columns).exceptAll(wh.cube).count() == 0


def test_incremental_cube_equals_full_rebuild(spark):
    """Incremental maintenance: starting from a cube built on a fact
    prefix, feeding the FULL fact as the delta (overlapping rows must
    be skipped via the deterministic fact_id) yields exactly the full
    rebuild."""
    from datawarehouse_code_spark.operators.cube import build_cube, incremental_cube

    wh = build_warehouse(spark, SF_DIR)
    dims = (
        wh.dim_product, wh.dim_product_subcategory, wh.dim_client,
        wh.dim_date, wh.dim_date_month, wh.dim_date_year, wh.dim_country,
    )
    old_fact = wh.fact.filter(F.col("year") <= 1995)
    old_cube = build_cube(old_fact, *dims)
    assert 0 < old_cube.count() < wh.cube.count()

    inc = incremental_cube(old_cube, wh.fact, *dims)
    assert inc.count() == wh.cube.count()
    assert inc.exceptAll(wh.cube).count() == 0
    assert wh.cube.exceptAll(inc).count() == 0
    # idempotent: a second delivery of the same delta changes nothing
    again = incremental_cube(inc, wh.fact, *dims)
    assert again.count() == inc.count()


def test_write_fact_append_mode(spark, tmp_path):
    """O6: the append sink actually appends — a second append doubles
    the rows and both partitions' files coexist."""
    from datawarehouse_code_spark.operators.fact import write_fact

    out = str(tmp_path / "fact_append")
    fact = build_warehouse(spark, SF_DIR).fact
    n = fact.count()
    write_fact(fact, out, mode="append")
    write_fact(fact, out, mode="append")
    assert spark.read.parquet(out).count() == 2 * n


def test_run_pipeline_overwrite_idempotent(spark, tmp_path):
    """Running the pipeline twice over the same output is a no-op
    change: deterministic surrogate keys + overwrite semantics."""
    out = str(tmp_path / "wh2")
    run_pipeline(spark, SF_DIR, out)
    first = spark.read.parquet(f"{out}/cube").collect()
    run_pipeline(spark, SF_DIR, out)
    second = spark.read.parquet(f"{out}/cube").collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """Small-file compaction: many tiny files collapse to the byte-
    sized target count, rows and values survive, input is never read
    and overwritten in the same job (staged rename)."""
    from datawarehouse_code_spark.pipeline import compact_parquet
    from datawarehouse_code_spark.sources.catalog import read_table
    from tests.conftest import SF_DIR

    out = str(tmp_path / "frag")
    nation = read_table(spark, "nation", SF_DIR)
    nation.repartition(20).write.parquet(out)  # 20 tiny files
    before = sorted(map(tuple, nation.collect()))

    report = compact_parquet(spark, out, target_file_mb=256)
    assert report["files_before"] >= 20
    assert report["files_after"] == 1  # tiny table -> one file
    after = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert after == before


def test_write_cube_failed_rebuild_leaves_live_cube(spark, tmp_path):
    """r16 self-review: write_cube rides the staged swap, so a rebuild
    whose job FAILS (or crashes) leaves the live cube intact and
    readable — the previous bare overwrite deleted the live table
    before running the job, so every rebuild opened a no-cube window
    and a failure held it open until the next successful rebuild."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datawarehouse_code_spark.operators.cube import write_cube

    path = str(tmp_path / "cube")
    write_cube(spark.range(5).toDF("x"), path)
    bad = spark.range(5).select(
        F.assert_true(F.col("id") < 3).alias("a"), F.col("id").alias("x")
    )
    with _pytest.raises(Exception):
        write_cube(bad, path)
    assert spark.read.parquet(path).count() == 5


def test_write_fact_failed_rebuild_leaves_live_fact(spark, tmp_path):
    """write_fact's overwrite branch rides the staged swap like
    write_cube: a failed rebuild leaves the previous year-partitioned
    fact intact (the previous bare overwrite deleted it before the
    job ran)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datawarehouse_code_spark.operators.fact import write_fact

    path = str(tmp_path / "fact")
    good = spark.range(6).select(
        F.col("id").alias("date_id"),
        (F.lit(2020) + (F.col("id") % 2)).cast("int").alias("year"),
    )
    write_fact(good, path)
    assert spark.read.parquet(path).count() == 6

    # the assert column must stay in the output — dropping it lets
    # Catalyst prune the failing expression away entirely
    bad = good.select(
        F.assert_true(F.col("date_id") < 3).alias("x"), "date_id", "year"
    )
    with _pytest.raises(Exception):
        write_fact(bad, path)
    got = spark.read.parquet(path)
    assert got.count() == 6  # live fact survived the failed rebuild
    # the year partitioning survived too (partition pruning still works)
    assert got.filter(F.col("year") == 2020).count() == 3
