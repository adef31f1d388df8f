"""DuckDB-oracle differential test — mirrors the driver's correctness
gate (SURVEY.md §5.2): for every registered query with an oracle, run
the Spark plan and the DuckDB SQL on the same sf0.001 parquet and
compare row count + column names + order-insensitive values.

Doubles are compared with a relative tolerance (the driver hashes
rounded values; here we assert close-enough so summation-order ulp
noise can't flake the suite).
"""

from __future__ import annotations

import datetime
import math

import pytest

from datawarehouse_code_spark.plans.registry import QUERIES, SUPPLEMENTARY_QUERIES
from tests.conftest import SF_DIR

# Suite constituents keep their own oracle check here even though the
# driver sees only the suite rows.
ALL_QUERIES = {**QUERIES, **SUPPLEMENTARY_QUERIES}


def _normalize(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_normalize(x) for x in v)
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_normalize(r[i]) for i in idx) for r in rows]
    return sorted(out, key=repr)


def _values_close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6)
    return a == b


ORACLE_QUERIES = [name for name, q in ALL_QUERIES.items() if q.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_oracle(name, spark, duck):
    q = ALL_QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    rel = duck.sql(q.oracle)
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    s_sorted = _sorted_rows(scols, [tuple(r) for r in srows])
    d_sorted = _sorted_rows(dcols, drows)
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for sv, dv in zip(sr, dr):
            assert _values_close(sv, dv), (
                f"{name}: row {i} differs: spark={sr} duck={dr}"
            )
