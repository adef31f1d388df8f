"""End-to-end corpus cleaning: the deliverable a training-data
pipeline runs nightly — compose exact dedup + near-dup detection into
a canonical-document selection and a partitioned clean-corpus write.

Policy:
1. exact duplicates (normalized content hash) collapse to the
   smallest doc_id;
2. near-duplicate PAIRS (MinHash-LSH verified at Jaccard ≥ threshold)
   collapse via a union-find-free rule that needs no iteration: a doc
   is dropped iff it appears as the LARGER id in any near-dup pair.
   (Keep-smallest transitivity: in any near-dup cluster exactly the
   minimum id survives under this rule if the cluster's pair graph
   contains each doc paired with a smaller doc — LSH pair sets are
   verified pairs, so every non-minimum member was detected against
   at least one smaller member or survives conservatively.  At 100 TB
   a full connected-components pass (GraphFrames / iterative
   smallest-neighbor propagation) replaces this single-step rule; the
   write path is identical.)
3. the surviving corpus is written partitioned by `lang` — the
   partition key analytics and per-language sampling use downstream.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.text import exact_dedup, near_dup_pairs_lsh

# a pair source maps (documents, threshold) -> DataFrame[d1, d2, ...]
PairSource = Callable[[DataFrame, float], DataFrame]


def clean_corpus(
    documents: DataFrame,
    near_dup_threshold: float = 0.5,
    pair_source: PairSource | None = None,
) -> DataFrame:
    """The surviving documents after exact + near-dup removal.

    `pair_source` selects the near-dup detector: the default is the
    banded-LSH scale path; the oracle-checked registry query passes
    the exact inverted-index variant.  The selection POLICY lives only
    here, so both paths stay in lockstep.
    """
    if pair_source is None:
        pair_source = lambda docs, t: near_dup_pairs_lsh(docs, threshold=t)  # noqa: E731
    canonical = exact_dedup(documents).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    exact_survivors = documents.join(canonical, "doc_id", "left_semi")
    dropped_near = (
        pair_source(documents, near_dup_threshold)
        .select(F.col("d2").alias("doc_id"))
        .distinct()
    )
    return exact_survivors.join(dropped_near, "doc_id", "left_anti")


def write_clean_corpus(
    spark: SparkSession, documents: DataFrame, out_path: str,
    near_dup_threshold: float = 0.5,
) -> dict[str, int]:
    """Materialize the cleaned corpus partitioned by lang; returns
    aggregate counts (input, surviving, dropped) — the O25-style
    report at corpus level."""
    survivors = clean_corpus(documents, near_dup_threshold)
    survivors.write.mode("overwrite").partitionBy("lang").parquet(out_path)
    n_in = documents.count()
    n_out = spark.read.parquet(out_path).count()
    return {"input": n_in, "surviving": n_out, "dropped": n_in - n_out}
