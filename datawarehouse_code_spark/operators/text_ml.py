"""MLlib-backed near-duplicate detection (pyspark.ml.feature.MinHashLSH).

The hand-rolled banded LSH in operators/text.py is the primary path
(full control over banding, no model state).  This module is the
stock-library twin SURVEY.md §2.2 names: HashingTF (stateless feature
hashing — deliberately NOT CountVectorizer, whose vocabulary fit is a
global pass that doesn't scale) into MinHashLSH's
approxSimilarityJoin.

Scale notes: HashingTF is a narrow map; MinHashLSH.fit only draws the
hash coefficients (no data pass); approxSimilarityJoin explodes per
hash-table buckets and joins within buckets — the same cost shape as
the custom implementation.  Distance is Jaccard distance over the
binarized feature vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.text import shingle_hash_docs


def near_dup_pairs_mllib(
    documents: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-dup pairs via pyspark.ml MinHashLSH: shingle-hash sets →
    binary HashingTF vectors → approxSimilarityJoin at Jaccard
    distance ≤ 1 - threshold.  Returns (d1, d2, jaccard_f4) like the
    custom variants (jaccard here is over hashed feature positions, so
    tiny feature collisions can nudge it — rows-only check; the exact
    inverted-index query is the hash-checked twin)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = shingle_hash_docs(documents, k).withColumn(
        "tokens", F.transform(F.col("sh"), lambda h: h.cast("string"))
    )
    tf = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(docs).select("doc_id", "features")
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="jaccard_dist"
    )
    return (
        joined.select(
            F.col("datasetA.doc_id").alias("d1"),
            F.col("datasetB.doc_id").alias("d2"),
            (F.floor((1.0 - F.col("jaccard_dist")) * 10000) / 10000).alias("jaccard_f4"),
        )
        .filter(F.col("d1") < F.col("d2"))
        .dropDuplicates(["d1", "d2"])
    )
