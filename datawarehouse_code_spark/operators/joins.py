"""Join strategy helpers beyond the built-ins.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime, but only for sort-merge joins between shuffle stages.  The
manual salting here covers the cases AQE can't: a hot-key join where
the small side is too big to broadcast but small enough to replicate
`n_salts`×, or engines/stages where the AQE rewrite doesn't apply.

Mechanism: the skewed side gets a deterministic salt in [0, n_salts)
derived from the whole row (so one hot key spreads across n_salts
shuffle partitions); the other side is replicated once per salt
value; the join key becomes (key, salt).  Correct for inner/left
joins keyed on the skewed side; cost = n_salts× replication of the
smaller side, which is exactly the trade a 100 TB skewed join wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted across `n_salts` buckets.

    The salt comes from monotonically_increasing_id, NOT a hash of the
    row: the canonical skew case is millions of IDENTICAL rows for one
    hot key, and a content hash would send them all to the same salt
    bucket (zero spread while still paying the replication).  The salt
    assignment varies with partition layout between runs, but any
    assignment is semantically correct — the joined result set is
    identical either way.
    """
    for df in (skewed, other):
        if "_salt" in df.columns:
            raise ValueError("salted_join: input already has a _salt column")
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    salted = skewed.withColumn("_salt", salt.cast("int"))
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [*key, "_salt"], how).drop("_salt")
