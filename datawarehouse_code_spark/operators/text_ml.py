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


def train_bigram_lm(
    ref_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Word-bigram language model from a reference corpus — the
    KenLM-style quality filter's small sibling: (bigram counts,
    unigram counts, vocabulary size).  Both tables are tf-idf-shaped
    aggregations (one shuffle each on the word keys); the model IS
    the tables — persist them like any rollup and reuse across
    scoring runs.
    """
    from datawarehouse_code_spark.operators.text import words

    ws = ref_docs.select(words(F.col(text_col)).alias("ws")).filter(
        F.size("ws") >= 2
    )
    k = F.greatest(F.size("ws") - 1, F.lit(0))
    bigrams = (
        ws.select(
            F.explode(
                F.arrays_zip(
                    F.slice("ws", 1, k).alias("w1"),
                    F.slice("ws", 2, k).alias("w2"),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n_bi"))
    )
    unigrams = (
        ref_docs.select(F.explode(words(F.col(text_col))).alias("w1"))
        .filter(F.col("w1") != "")
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("n_uni"))
    )
    n_vocab = unigrams.count()
    return bigrams, unigrams, n_vocab


def bigram_lm_score(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    n_vocab: int,
    text_col: str = "text",
    smoothing_k: float = 0.5,
) -> DataFrame:
    """Per-document mean negative log2 probability under the bigram
    LM (add-k smoothed: P(w2|w1) = (c(w1,w2)+k) / (c(w1)+k·V)) — the
    perplexity-proxy quality score: fluent text that resembles the
    reference corpus scores LOW, gibberish and wrong-language text
    score HIGH.  Rank or threshold on it like the heuristic quality
    scores (operators/text.py) — this one is corpus-adaptive instead
    of hand-tuned.

    Output: (doc_id, n_bigrams, avg_neg_log2p) — float by nature
    (logs), so this is a rows-only operator with exact-twin pytest
    coverage, not an oracle row.

    Scale shape: explode the document bigrams once, LEFT join the
    count tables on their word keys (hash joins — the model tables
    are word-keyed aggregates, broadcast only if genuinely small),
    one per-doc aggregation.  Unseen words/bigrams hit the smoothing
    floor instead of -inf.
    """
    from datawarehouse_code_spark.operators.text import words

    ws = docs.select(
        "doc_id", words(F.col(text_col)).alias("ws")
    ).filter(F.size("ws") >= 2)
    k = F.greatest(F.size("ws") - 1, F.lit(0))
    doc_bi = ws.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("ws", 1, k).alias("w1"),
                F.slice("ws", 2, k).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    joined = (
        doc_bi.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams, ["w1"], "left")
        .select(
            "doc_id",
            (
                -F.log2(
                    (F.coalesce("n_bi", F.lit(0)) + F.lit(smoothing_k))
                    / (
                        F.coalesce("n_uni", F.lit(0))
                        + F.lit(smoothing_k * n_vocab)
                    )
                )
            ).alias("nlp"),
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("nlp").alias("avg_neg_log2p"),
    )
