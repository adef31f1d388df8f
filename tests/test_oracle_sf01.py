"""sf0.1 oracle spot-lane for scale-SENSITIVE queries (r14 verdict
ask #2).

The driver's correctness gate compares Spark vs DuckDB at sf0.01,
which cannot see defects that only materialize in larger data
structure: the r14 xmodal fixture bug (additive Knuth-hash collisions
chaining a diameter-20 component) produced IDENTICAL results at
sf0.01 — every colliding Δ sat above the 125-group id range — and was
only caught because the sf0.1 bench blew up.  That was the gate's
first demonstrated blind spot in 14 rounds.

This lane re-runs the full DuckDB comparison at sf0.1 for exactly the
rows whose semantics depend on data-scale structure — the connected-
component / pair-graph suites, where more rows means longer chains,
new hash-bucket collisions, and deeper component diameters:

- corpus_survivors          (near-dup CC → canonical selection)
- dedup_suite               (MinHash-LSH / SimHash / exact pair graphs)
- media_dedup_suite         (image/audio/video fingerprint pair graphs)
- cross_modal_suite         (cross-carrier matches + canonical CC)
- planted_recall_suite      (planted-pair recall at banding boundaries)
- corpus_split_leakage      (split assignment × near-dup components)
- shift_robust_dedup_suite  (winnowing/CDC chunk pair graphs)
- incremental_near_dup      (increment vs persisted-index banding)

Budget: ~2-3 min for the eight rows at sf0.1 (marked `slow` so a quick
iteration loop can deselect with `-m "not slow"`; the full suite and
the per-round judge run include it).
"""

from __future__ import annotations

import duckdb
import pytest

from datawarehouse_code_spark.plans.registry import QUERIES, SUPPLEMENTARY_QUERIES
from tests.conftest import TABLES
from tests.test_oracle_differential import _sorted_rows, _values_close

SF01_DIR = "/root/testdata/sf0.1"

ALL_QUERIES = {**QUERIES, **SUPPLEMENTARY_QUERIES}

SCALE_SENSITIVE = [
    "corpus_survivors",
    "dedup_suite",
    "media_dedup_suite",
    "cross_modal_suite",
    "planted_recall_suite",
    "corpus_split_leakage",
    # same blind-spot class, added r15 beyond the verdict's six: the
    # winnowing/CDC pair graphs and the incremental-vs-persisted-index
    # banding both change structure with corpus size
    "shift_robust_dedup_suite",
    "incremental_near_dup",
]


@pytest.fixture(scope="module")
def duck_sf01():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", SCALE_SENSITIVE)
def test_matches_oracle_at_sf01(name, spark, duck_sf01):
    q = ALL_QUERIES[name]
    assert q.oracle is not None, f"{name} lost its oracle — lane is void"

    sdf = q.fn(spark, SF01_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    rel = duck_sf01.sql(q.oracle)
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), (
        f"{name}@sf0.1: column mismatch {scols} vs {dcols}"
    )
    assert len(srows) == len(drows), (
        f"{name}@sf0.1: row count {len(srows)} vs {len(drows)}"
    )
    # zero rows would "match" trivially and void the lane's point
    assert len(srows) > 0, f"{name}@sf0.1: empty result proves nothing"

    s_sorted = _sorted_rows(scols, [tuple(r) for r in srows])
    d_sorted = _sorted_rows(dcols, drows)
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for sv, dv in zip(sr, dr):
            assert _values_close(sv, dv), (
                f"{name}@sf0.1: row {i} differs: spark={sr} duck={dr}"
            )
