"""Checkpoint-strategy knob for the iterative operators.

All six iterative operators (pagerank, BFS, LPA, weighted SSSP,
near-dup connected components, BPE training) take a
``checkpoint: "auto"|"local"|"reliable"`` parameter
(operators/iterative.py).  These tests pin:

- "auto" resolves to RELIABLE ``checkpoint()`` iff the session has a
  checkpoint directory, local otherwise;
- reliable mode actually materializes to the checkpoint dir (files
  appear; the result frame's RDD lineage shows ReliableCheckpointRDD)
  — executor-loss resilience on a real cluster, the property
  localCheckpoint lacks;
- every operator returns identical results under both strategies;
- "reliable" without a configured dir fails FAST (before any work).

The checkpoint dir is restored (unset) after each test so the shared
session's other tests keep the cheap local path.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def ckpt_dir(spark, tmp_path):
    sc = spark.sparkContext
    old = sc.getCheckpointDir()
    assert old is None, "shared test session unexpectedly has a checkpoint dir"
    d = str(tmp_path / "reliable_ckpt")
    sc.setCheckpointDir(d)
    yield d
    # SparkContext.setCheckpointDir(None) unsets (Option(null) -> None)
    sc.setCheckpointDir(None)
    assert sc.getCheckpointDir() is None


def _n_ckpt_files(d: str) -> int:
    return sum(len(files) for _, _, files in os.walk(d))


def test_resolve_modes(spark):
    from datawarehouse_code_spark.operators.iterative import (
        resolve_checkpoint_mode,
    )

    df = spark.range(1)
    assert resolve_checkpoint_mode(df, "auto") == "local"
    assert resolve_checkpoint_mode(df, "local") == "local"
    with pytest.raises(ValueError, match="setCheckpointDir"):
        resolve_checkpoint_mode(df, "reliable")
    with pytest.raises(ValueError, match="checkpoint must be one of"):
        resolve_checkpoint_mode(df, "hdfs")


def test_resolve_auto_prefers_reliable_with_dir(spark, ckpt_dir):
    from datawarehouse_code_spark.operators.iterative import (
        resolve_checkpoint_mode,
    )

    assert resolve_checkpoint_mode(spark.range(1), "auto") == "reliable"
    assert resolve_checkpoint_mode(spark.range(1), "local") == "local"


def test_pagerank_reliable_checkpoints_and_matches_local(spark, ckpt_dir):
    from datawarehouse_code_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)], ["src", "dst"]
    )
    # checkpoint_every=1 so the RETURNED frame is itself checkpointed
    reliable = pagerank_fixed(edges, iters=2, checkpoint_every=1)  # auto→reliable
    assert "ReliableCheckpointRDD" in reliable.rdd.toDebugString().decode()
    assert _n_ckpt_files(ckpt_dir) > 0
    local = pagerank_fixed(edges, iters=2, checkpoint_every=1, checkpoint="local")
    assert sorted(map(tuple, reliable.collect())) == sorted(
        map(tuple, local.collect())
    )


def test_bfs_reliable_matches_local(spark, ckpt_dir):
    from datawarehouse_code_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], ["a", "b"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    reliable = bfs_distances(edges, seeds)  # auto → reliable
    assert "ReliableCheckpointRDD" in reliable.rdd.toDebugString().decode()
    local = bfs_distances(edges, seeds, checkpoint="local")
    assert sorted(map(tuple, reliable.collect())) == sorted(
        map(tuple, local.collect())
    )


def test_lpa_reliable_matches_local(spark, ckpt_dir):
    from datawarehouse_code_spark.operators.graph import label_propagation

    clique1 = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
    clique2 = [(a, b) for a in (7, 8, 9) for b in (7, 8, 9) if a < b]
    edges = spark.createDataFrame(clique1 + clique2 + [(3, 7)], ["a", "b"])
    reliable = label_propagation(edges, n_rounds=2, checkpoint_every=1)
    assert "ReliableCheckpointRDD" in reliable.rdd.toDebugString().decode()
    local = label_propagation(
        edges, n_rounds=2, checkpoint_every=1, checkpoint="local"
    )
    assert sorted(map(tuple, reliable.collect())) == sorted(
        map(tuple, local.collect())
    )


def test_sssp_reliable_matches_local(spark, ckpt_dir):
    from datawarehouse_code_spark.operators.graph import weighted_shortest_paths

    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (1, 3, 10), (3, 4, 2)], ["a", "b", "w"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    reliable = weighted_shortest_paths(edges, seeds)
    assert "ReliableCheckpointRDD" in reliable.rdd.toDebugString().decode()
    local = weighted_shortest_paths(edges, seeds, checkpoint="local")
    assert sorted(map(tuple, reliable.collect())) == sorted(
        map(tuple, local.collect())
    )


def test_sssp_negative_weight_still_raises(spark, ckpt_dir):
    from datawarehouse_code_spark.operators.graph import weighted_shortest_paths

    seeds = spark.createDataFrame([(1,)], ["node"])
    neg = spark.createDataFrame([(1, 2, 3), (2, 3, -1)], ["a", "b", "w"])
    with pytest.raises(ValueError, match="negative edge weights"):
        weighted_shortest_paths(neg, seeds)
    # a negative SELF-LOOP is a negative cycle and must raise too
    # (the guard runs before self-loops are dropped)
    loop = spark.createDataFrame([(1, 2, 3), (2, 2, -5)], ["a", "b", "w"])
    with pytest.raises(ValueError, match="negative edge weights"):
        weighted_shortest_paths(loop, seeds)


def test_components_reliable_matches_local(spark, ckpt_dir):
    from datawarehouse_code_spark.operators.corpus import near_dup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11)], ["d1", "d2"]
    )
    for algo in ("propagation", "two_phase"):
        reliable = near_dup_components(pairs, algorithm=algo)
        local = near_dup_components(pairs, algorithm=algo, checkpoint="local")
        assert sorted(map(tuple, reliable.collect())) == sorted(
            map(tuple, local.collect())
        ), algo
    assert _n_ckpt_files(ckpt_dir) > 0


def test_bpe_train_reliable_matches_local(spark, ckpt_dir):
    from datawarehouse_code_spark.operators.tokenizer import bpe_train

    docs = spark.createDataFrame(
        [("low lower lowest",), ("newer newest low",)], ["text"]
    )
    before = _n_rdd_dirs(ckpt_dir)
    reliable = bpe_train(docs, n_merges=3)
    # the merge LIST is the return value — every round's symbol-table
    # checkpoint is superseded by the next and the final one released,
    # so a completed training run leaves NOTHING in the checkpoint dir
    # (the unbounded-growth fix: 20-round loops used to persist 20
    # copies forever under reliable mode)
    assert _n_rdd_dirs(ckpt_dir) == before
    local = bpe_train(docs, n_merges=3, checkpoint="local")
    assert reliable == local and len(reliable) == 3


def _n_rdd_dirs(d: str) -> int:
    """Reliable checkpoints materialize as rdd-<id> directories."""
    n = 0
    for _root, dirs, _files in os.walk(d):
        n += sum(1 for x in dirs if x.startswith("rdd-"))
    return n


def test_cut_lineage_supersedes_reclaims_reliable_checkpoint(spark, ckpt_dir):
    """cut_lineage(supersedes=prev) deletes prev's checkpoint files
    once the new cut materializes; release_checkpoint reclaims a dead
    terminal frame; local mode ignores both (blocks are ContextCleaner
    territory)."""
    from datawarehouse_code_spark.operators.iterative import (
        _reliable_checkpoint_file,
        cut_lineage,
        release_checkpoint,
    )

    df1 = cut_lineage(spark.range(10), "reliable")
    f1 = _reliable_checkpoint_file(df1)
    assert f1 is not None and os.path.exists(f1.replace("file:", ""))
    df2 = cut_lineage(
        df1.withColumn("y", F.col("id") * 2), "reliable", supersedes=df1
    )
    f2 = _reliable_checkpoint_file(df2)
    assert f2 is not None and f2 != f1
    assert not os.path.exists(f1.replace("file:", ""))  # superseded → gone
    assert df2.count() == 10  # the survivor still computes
    release_checkpoint(df2)
    assert not os.path.exists(f2.replace("file:", ""))
    # identity guard: a frame listed in `unless` is never deleted
    df3 = cut_lineage(spark.range(3), "reliable")
    release_checkpoint(df3, unless=(df3,))
    f3 = _reliable_checkpoint_file(df3)
    assert f3 is not None and os.path.exists(f3.replace("file:", ""))
    # local mode: supersedes/release are no-ops, both frames usable
    l1 = cut_lineage(spark.range(5), "local")
    l2 = cut_lineage(l1.withColumn("y", F.col("id") + 1), "local", supersedes=l1)
    release_checkpoint(l1)
    assert l1.count() == 5 and l2.count() == 5


def test_iterative_loops_hold_bounded_checkpoints(spark, ckpt_dir):
    """A multi-round reliable-mode loop must not retain one checkpoint
    per round: after pagerank(iters=4, checkpoint_every=1) the dir
    holds only the PERMANENT per-loop frames (edges, nodes, outdeg)
    plus the final ranks — not 4 rank generations (the r8 verdict's
    unbounded-checkpoint-growth finding)."""
    from datawarehouse_code_spark.operators.graph import (
        bfs_distances,
        pagerank_fixed,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)], ["src", "dst"]
    )
    before = _n_rdd_dirs(ckpt_dir)
    ranks = pagerank_fixed(edges, iters=4, checkpoint_every=1)
    ranks.count()
    # at most edges + nodes + outdeg + final ranks = 4 (the 3
    # superseded generations are reclaimed synchronously; the
    # permanent frames may ALSO disappear at any moment after
    # pagerank_fixed returns — cleanCheckpoints lets the
    # ContextCleaner delete them asynchronously once their driver
    # references are GC'd — so the pin is a RANGE, not an exact
    # count: the returned frame's own checkpoint must survive, and
    # nothing like the 7 dirs a no-GC run would hold may remain)
    d_pr = _n_rdd_dirs(ckpt_dir) - before
    assert 1 <= d_pr <= 4, d_pr
    # BFS on a 4-hop chain: per-round dist/frontier generations are
    # reclaimed as they are superseded; the converged run keeps at
    # most sym + the final dist (same async-cleaner caveat for sym)
    chain = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["a", "b"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    mid = _n_rdd_dirs(ckpt_dir)
    dist = bfs_distances(chain, seeds)
    assert sorted(map(tuple, dist.collect())) == [(1, 0), (2, 1), (3, 2), (4, 3)]
    # the delta can go NEGATIVE under load: the async ContextCleaner
    # may reclaim pagerank's now-unreferenced permanent frames during
    # the BFS window (observed in a full-suite run under CPU
    # contention, r17) — so only the growth BOUND is a delta
    # assertion; "the final dist survives" is asserted on the frame's
    # own checkpoint file, which no cleaner may touch while `dist`
    # is referenced
    d_bfs = _n_rdd_dirs(ckpt_dir) - mid
    assert d_bfs <= 2, d_bfs
    from datawarehouse_code_spark.operators.iterative import (
        _reliable_checkpoint_file,
    )

    f = _reliable_checkpoint_file(dist)
    assert f is not None and os.path.exists(f.replace("file:", ""))
