"""Graph algorithms as iterative DataFrame plans.

Connected components live in operators/corpus.py (near-dup
clustering); this module adds PageRank — the other graph primitive a
training-data pipeline reaches for (domain/source authority scoring
for quality weighting, influence ranking over interaction graphs).

Exactness doctrine: ranks are INTEGER mass, not doubles.  A float
PageRank sums contributions in engine- and partition-dependent order,
so the low bits differ between Spark and DuckDB and any floor/round
of the result can flip — untestable cross-engine.  Integer mass with
integer division is exact everywhere: mass_0 = S div N and

    mass_{k+1}(i) = (15·mass_0 + 85·Σ_{j→i} (mass_k(j) div outdeg(j)))
                    div 100

(damping 0.85 as the 85/100 rational).  The div-truncation loses a
few units of mass per round — irrelevant for ranking, and the same
few units on every engine.

Scale shape per iteration: one equi-join (edges ⋈ ranks on src — the
join that partitions by src) + one groupBy dst — the identical
join+agg round as the connected-components loop, AQE-splittable on
hot nodes.  Fixed iteration count k (driver-side Python loop, no
convergence fixpoint needed); lineage stays k joins deep, so for
large k localCheckpoint each round like near_dup_components does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOTAL_MASS = 10**12


def pagerank_fixed(
    edges: DataFrame,
    iters: int = 3,
    checkpoint_every: int | None = 8,
    check_dangling: bool = True,
) -> DataFrame:
    """Integer-mass PageRank over a directed edge list (src, dst) for
    a FIXED number of iterations.  Every node must appear as a src at
    least once (no dangling nodes) — symmetrize the edge list first
    if needed; violating this silently leaks rank mass, so it raises.

    `check_dangling=False` skips that precondition scan (a distinct +
    anti-join + count — two extra jobs over the full edge list per
    invocation, pure overhead at scale): callers that just symmetrized
    the edge list (every src is also a dst and vice versa, so every
    node has an out-edge by construction) can prove the precondition
    statically and opt out.  Default stays ON — silent mass leak is
    strictly worse than two cheap jobs.

    Returns (node, mass) — higher mass = higher rank; mass values are
    exactly reproducible on any engine (integer arithmetic only).

    The edge list (and nodes/outdeg derived from it) is eagerly
    localCheckpoint-ed up front: every iteration joins against all
    three, and without the cut each round's plan would re-derive the
    whole upstream edge lineage (at scale typically a large join +
    distinct) once per iteration.
    """
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if check_dangling:
        srcs = edges.select("src").distinct()
        dangling = nodes.join(
            srcs.withColumnRenamed("src", "node"), "node", "left_anti"
        )
        if dangling.limit(1).count() > 0:
            raise ValueError(
                "pagerank_fixed: dangling nodes (no out-edges) present — "
                "symmetrize or self-loop the edge list first"
            )

    outdeg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    base = TOTAL_MASS // n_nodes

    ranks = nodes.withColumn("mass", F.lit(base).cast("bigint"))
    for it in range(iters):
        # `div` is true integer division on both engines; a double `/`
        # followed by a cast can round UP across an integer boundary
        # (1-ulp error) and break exact cross-engine parity
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("mass div outdeg").alias("c"),
            )
        )
        incoming = contrib.groupBy("node").agg(F.sum("c").alias("inc"))
        ranks = nodes.join(incoming, "node", "left").select(
            "node",
            F.expr(
                f"(15 * CAST({base} AS BIGINT) + 85 * coalesce(inc, 0)) div 100"
            ).alias("mass"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
