"""Shared lineage-truncation strategy for the iterative operators.

Every fixpoint/fixed-round operator in this repo (pagerank, BFS, LPA,
weighted SSSP, near-dup connected components, BPE training) must cut
its lineage each round — the naive loop builds an exponentially
growing plan and re-executes the whole upstream per iteration.  Spark
offers two cuts with different failure semantics:

- ``DataFrame.localCheckpoint()``: materializes partitions in executor
  block storage.  Fast (no distributed-FS write), but the truncated
  lineage is UNRECOVERABLE if an executor holding blocks dies — on a
  real cluster a single executor loss mid-loop fails the job.  Fine on
  local[n] (one JVM: losing "the executor" loses the job anyway).
- ``DataFrame.checkpoint()``: materializes to the RELIABLE checkpoint
  directory (HDFS/object store).  Survives executor loss; costs a
  distributed write per cut.

Which one is right depends on where the job runs, so the operators
take a ``checkpoint`` knob instead of hardcoding the local variant:

- ``"local"`` — always ``localCheckpoint`` (single-node / ephemeral).
- ``"reliable"`` — always ``checkpoint``; raises up front if no
  checkpoint directory is configured (failing at the first cut with
  Spark's own error would waste the work done before it).
- ``"auto"`` (default) — reliable iff the session has a checkpoint
  directory (``spark.sparkContext.setCheckpointDir(...)``), local
  otherwise.  A cluster deployment that configures the dir gets
  executor-loss resilience with no per-operator code change; local
  runs keep the cheap path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CHECKPOINT_MODES = ("auto", "local", "reliable")


def resolve_checkpoint_mode(df: DataFrame, checkpoint: str) -> str:
    """Collapse ``"auto"`` to ``"local"`` or ``"reliable"`` for THIS
    session (reliable iff a checkpoint dir is set), validating the
    knob and the reliable-mode precondition up front so iterative
    operators fail before doing any work rather than at round k."""
    if checkpoint not in CHECKPOINT_MODES:
        raise ValueError(
            f"checkpoint must be one of {CHECKPOINT_MODES}: {checkpoint!r}"
        )
    has_dir = df.sparkSession.sparkContext.getCheckpointDir() is not None
    if checkpoint == "reliable" and not has_dir:
        raise ValueError(
            "checkpoint='reliable' requires "
            "spark.sparkContext.setCheckpointDir(...) to be configured"
        )
    if checkpoint == "auto":
        return "reliable" if has_dir else "local"
    return checkpoint


def cut_lineage(df: DataFrame, mode: str, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage per a RESOLVED mode (``"local"`` or
    ``"reliable"`` — call :func:`resolve_checkpoint_mode` once per
    operator invocation, not per round, so 'auto' doesn't re-probe the
    JVM every iteration)."""
    if mode == "reliable":
        return df.checkpoint(eager=eager)
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    raise ValueError(f"unresolved checkpoint mode: {mode!r}")
