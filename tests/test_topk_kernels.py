"""The r17 bounded-query Arrow kernels vs the expression reference.

brute_force_topk / quantized_rerank_topk (code-ranking stage) /
ivf_topk's dense-probe mode now rank through mapInPandas kernels whose
similarity arithmetic must stay BIT-IDENTICAL to the expression twin
(_ranked_topk: left-fold dot, (·inv_q)·inv_c multiplication order,
floor-6 grain, (sim desc, candidate_id asc) with NaN greatest).  These
tests pin each kernel row-for-row against the pre-r17 expression plan
rebuilt inline — including the edge cases the fixtures never exercise:
exact-colinear candidates (floor-6 rank ties decided by the
candidate_id tie-break), fewer candidates than k, an empty query set,
and a selective `allowed` filter.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.similarity import (
    _int8_expressions,
    _ranked_topk,
    _restrict_candidates,
    _with_inv_norm,
    as_double_array,
    brute_force_topk,
    dot,
    quantized_rerank_topk,
)


def _vecs_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def _brute_reference(embeddings, max_query_id=100, k=5, allowed=None):
    """The pre-r17 expression plan, verbatim."""
    vecs = _with_inv_norm(
        embeddings.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    )
    q = vecs.filter(F.col("vec_id") < max_query_id).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("inv").alias("inv_q"),
    )
    c = _restrict_candidates(vecs, allowed).select(
        F.col("vec_id").alias("candidate_id"), F.col("v").alias("cv"),
        F.col("inv").alias("inv_c"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("candidate_id")
    )
    return _ranked_topk(pairs, k)


def _quant_reference(embeddings, max_query_id=100, k=5, rerank_factor=2):
    from pyspark.sql import Window

    vecs = _with_inv_norm(
        embeddings.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    )
    q = vecs.filter(F.col("vec_id") < max_query_id).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("inv").alias("inv_q"),
    )
    scale, code = _int8_expressions(F.col("v"), "double")
    c = vecs.select(
        F.col("vec_id").alias("candidate_id"), F.col("v").alias("cv"),
        F.col("inv").alias("inv_c"), code.alias("code"), scale.alias("scale"),
    )
    asim = (
        dot(F.col("qv"), F.col("code"))
        * F.col("scale") * F.col("inv_q") * F.col("inv_c")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("asim_f6").desc(), F.col("candidate_id").asc()
    )
    shortlist = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id", "qv", "inv_q", "candidate_id", "cv", "inv_c",
            (F.floor(asim * 1e6) / 1e6).alias("asim_f6"),
        )
        .withColumn("ark", F.row_number().over(w))
        .filter(F.col("ark") <= k * rerank_factor)
        .drop("asim_f6", "ark")
    )
    return _ranked_topk(shortlist, k)


# 8 vectors, dim 4; ids 0/1/4/6 are near-colinear (rank ties exercise
# the candidate_id tie-break through the floor-6 grain); queries are <3.
# No zero-norm vector: ANSI mode makes _with_inv_norm's 1/norm a
# DIVIDE_BY_ZERO error in BOTH the kernel and the expression path, so
# the NaN-ranking branch is defensive dead code in practice.
ROWS = [
    (0, [1.0, 0.25, -0.5, 2.0]),
    (1, [0.9, 0.30, -0.4, 1.7]),
    (2, [-1.0, 4.0, 0.5, 0.1]),
    (3, [2.0, 0.5, -1.0, 4.0]),
    (4, [1.1, 0.2, -0.6, 2.1]),
    (5, [0.5, -3.0, 2.5, 0.7]),
    (6, [4.0, 1.0, -2.0, 8.0]),
    (7, [-0.9, 3.9, 0.55, 0.05]),
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_brute_kernel_matches_expression_reference(spark):
    emb = _vecs_df(spark, ROWS)
    assert _rows(brute_force_topk(emb, max_query_id=3, k=3)) == _rows(
        _brute_reference(emb, max_query_id=3, k=3)
    )


def test_brute_kernel_colinear_tie_break(spark):
    # ids 3 and 6 are exact scalar multiples: identical cosine to every
    # query at the floor-6 grain, so their relative order is decided
    # purely by the candidate_id tie-break — kernel and expression
    # reference must agree on it
    emb = _vecs_df(spark, ROWS)
    new = brute_force_topk(emb, max_query_id=4, k=4)
    ref = _brute_reference(emb, max_query_id=4, k=4)
    assert _rows(new) == _rows(ref)


def test_brute_kernel_fewer_candidates_than_k(spark):
    emb = _vecs_df(spark, ROWS[:3])
    assert _rows(brute_force_topk(emb, max_query_id=2, k=10)) == _rows(
        _brute_reference(emb, max_query_id=2, k=10)
    )


def test_brute_kernel_empty_query_set(spark):
    emb = _vecs_df(spark, ROWS)
    out = brute_force_topk(emb, max_query_id=-1, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "candidate_id", "sim_f6", "rk"]


def test_brute_kernel_allowed_filter(spark):
    emb = _vecs_df(spark, ROWS)
    allowed = spark.createDataFrame([(1,), (4,), (5,)], "vec_id bigint")
    assert _rows(brute_force_topk(emb, max_query_id=3, k=2, allowed=allowed)) == _rows(
        _brute_reference(emb, max_query_id=3, k=2, allowed=allowed)
    )


def test_quantized_kernel_matches_expression_reference(spark):
    emb = _vecs_df(spark, ROWS)
    assert _rows(quantized_rerank_topk(emb, max_query_id=3, k=2)) == _rows(
        _quant_reference(emb, max_query_id=3, k=2)
    )


@pytest.mark.parametrize("n_probes,n_centroids", [(2, 2), (3, 4)])
def test_ivf_dense_kernel_matches_brute_force(spark, n_probes, n_centroids):
    # the dense-probe kernel (n_probes·2 ≥ n_centroids — both
    # parametrizations take it) must agree with brute force wherever
    # it is exact: full probing ranks every candidate (the full-probe
    # ≡ brute doctrine).  ROWS deliberately has no zero-norm vector:
    # ANSI mode makes _with_inv_norm's 1/norm a DIVIDE_BY_ZERO error
    # in both paths, so the NaN branch is defensive dead code here
    # (r17 advice: the old name/comment claimed a sparse-path and a
    # zero-norm case this test never had).
    from datawarehouse_code_spark.operators.similarity import ivf_topk

    emb = _vecs_df(spark, ROWS)
    full = ivf_topk(
        emb, max_query_id=3, k=3,
        n_centroids=n_centroids, n_probes=n_centroids, fit_max_iter=2,
    )
    brute = brute_force_topk(emb, max_query_id=3, k=3)
    assert _rows(full) == _rows(brute)


def _ivf_sparse_reference(emb, max_query_id, k, n_centroids, n_probes,
                          fit_max_iter):
    """The pre-r18 sparse join path, verbatim: cent_id equi-join with
    vector payloads on every pair row, dropDuplicates on the pair
    ids, then _ranked_topk.  kmeans_centroids is seed-deterministic
    for a fixed input layout, so reference and operator fit identical
    centroids."""
    from datawarehouse_code_spark.operators.similarity import (
        _nearest_centroids,
        kmeans_centroids,
    )

    vecs = _with_inv_norm(
        emb.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    )
    cents = kmeans_centroids(vecs, n_centroids, max_iter=fit_max_iter)
    assigned = _nearest_centroids(vecs, cents, "vec_id", 1).select(
        F.col("vec_id").cast("bigint").alias("candidate_id"),
        F.col("v").alias("cv"), F.col("inv").alias("inv_c"), "cent_id",
    )
    probed = _nearest_centroids(
        vecs.filter(F.col("vec_id") < max_query_id), cents, "vec_id", n_probes
    ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("inv").alias("inv_q"), "cent_id",
    )
    pairs = (
        probed.join(assigned, "cent_id")
        .filter(F.col("query_id") != F.col("candidate_id"))
        .select("query_id", "qv", "inv_q", "candidate_id", "cv", "inv_c")
        .dropDuplicates(["query_id", "candidate_id"])
    )
    return _ranked_topk(pairs, k)


@pytest.mark.parametrize("n_probes,n_centroids", [(1, 4), (2, 8)])
def test_ivf_sparse_join_path_matches_pre_r18_reference(
    spark, n_probes, n_centroids
):
    # the SPARSE join path (n_probes·2 < n_centroids — the serving
    # default regime the dense parametrizations above never reach,
    # r17 advice): the r18 narrow shape (sim computed in the join
    # projection, no pair dedup — provably a no-op, since a candidate
    # has ONE centroid and a query's probe set is distinct) must be
    # row-identical to the pre-r18 payload-dedup reference
    from datawarehouse_code_spark.operators.similarity import ivf_topk

    emb = _vecs_df(spark, ROWS)
    got = ivf_topk(
        emb, max_query_id=3, k=3,
        n_centroids=n_centroids, n_probes=n_probes, fit_max_iter=2,
    )
    ref = _ivf_sparse_reference(
        emb, max_query_id=3, k=3,
        n_centroids=n_centroids, n_probes=n_probes, fit_max_iter=2,
    )
    assert _rows(got) == _rows(ref)
