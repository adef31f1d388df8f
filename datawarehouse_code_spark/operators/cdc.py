"""Change-data-capture application: collapse a change log to state.

The reference's load loop re-reads full source tables every run
(warehouse.py:25-43); the production pattern it approximates is a CDC
feed — an append-only log of (key, operation, sequence, payload)
rows from upstream OLTP — applied to the warehouse as latest-wins
upsert + delete.  Spark-first that is ONE window pass, not a per-row
loop:

  rank change rows per key by sequence (descending) → keep rank 1 →
  drop keys whose latest operation is a delete.

Scale shape: a single shuffle on the key (the window partition);
row_number short-circuits per key, no self-join against "current
state", and the output feeds sources/acid.upsert (Delta MERGE when
available) for the actual table write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_latest(
    changes: DataFrame,
    key: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Latest-wins state from a CDC change log.

    `seq_col` must totally order each key's changes (log offset, LSN,
    commit timestamp + tiebreak).  Ties within a key would make the
    survivor nondeterministic, so equal sequence values raise at
    runtime via a strict uniqueness check folded into the same window
    pass (count over the (key, seq) frame — no extra shuffle).
    """
    w = Window.partitionBy(*key).orderBy(F.col(seq_col).desc())
    wdup = Window.partitionBy(*key, seq_col)
    ranked = changes.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_nseq", F.count(F.lit(1)).over(wdup)
    )
    latest = ranked.filter(F.col("_rn") == 1)
    # The guards live INSIDE the filter condition (a dropped helper
    # column would be pruned by Catalyst and never evaluated).  Ties
    # below the survivor rank are harmless and deliberately ignored;
    # a tie AT the survivor would make row_number's pick arbitrary,
    # so it fails loudly — and so does a NULL op on the survivor
    # (`op != 'D'` would evaluate to NULL and silently drop the key,
    # indistinguishable from a legitimate delete).
    def _raise(msg: str) -> F.Column:
        return F.raise_error(
            F.concat(
                F.lit(msg),
                F.concat_ws("/", *[F.col(k).cast("string") for k in key]),
            )
        ).cast("boolean")

    keep = (
        F.when(F.col("_nseq") > 1,
               _raise("cdc_latest: duplicate sequence value for key "))
        .when(F.col(op_col).isNull(),
              _raise("cdc_latest: NULL operation on surviving change for key "))
        .otherwise(F.col(op_col) != delete_op)
    )
    return latest.filter(keep).drop("_rn", "_nseq", op_col)
