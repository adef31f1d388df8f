"""Parity between the expression-based text operators (the semantics
reference, zero-Python) and their Arrow-UDF hot-path twins: same
shingle sets, same fingerprints, valid MinHash signatures."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.text import (
    content_fingerprint,
    content_fingerprint_udf,
    minhash_signature,
    shingle_hash_docs,
    shingled_docs,
    shingles,
    words,
)
from datawarehouse_code_spark.sources.catalog import read_table
from tests.conftest import SF_DIR


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little", signed=True)


def _sample(spark, n=40):
    return read_table(spark, "documents", SF_DIR).limit(n)


def test_udf_shingle_hashes_match_expression_shingles(spark):
    docs = _sample(spark)
    expr_sh = {
        r["doc_id"]: {_hash64(s) for s in r["sh"]}
        for r in shingled_docs(docs).collect()
    }
    udf_sh = {r["doc_id"]: set(r["sh"]) for r in shingle_hash_docs(docs).collect()}
    assert expr_sh == udf_sh


def test_udf_fingerprint_matches_expression(spark):
    docs = _sample(spark)
    expr_fp = {
        r["doc_id"]: r["fp"]
        for r in shingled_docs(docs)
        .select("doc_id", content_fingerprint(F.col("sh")).alias("fp"))
        .collect()
    }
    fp_udf = content_fingerprint_udf()
    udf_fp = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", fp_udf(F.col("text")).alias("fp"))
        .filter(F.col("fp").isNotNull())
        .collect()
    }
    assert expr_fp == udf_fp


def test_expression_minhash_signature_shape(spark):
    """The pure-SQL MinHash reference: right length, deterministic."""
    docs = _sample(spark, 10)
    sd = shingled_docs(docs)
    sigs = sd.select(
        "doc_id", minhash_signature(F.col("sh"), 16).alias("sig")
    ).collect()
    assert all(len(r["sig"]) == 16 for r in sigs)
    again = sd.select(
        "doc_id", minhash_signature(F.col("sh"), 16).alias("sig")
    ).collect()
    assert sorted(map(repr, sigs)) == sorted(map(repr, again))


def test_shingles_short_doc_empty(spark):
    """sequence(1,0) regression: < k words must yield [] not garbage."""
    df = spark.createDataFrame([(1, "one two"), (2, "a b c d")], "id INT, t STRING")
    rows = {r["id"]: r["sh"] for r in
            df.select("id", shingles(words(F.col("t"))).alias("sh")).collect()}
    assert rows[1] == []
    assert rows[2] == ["a b c", "b c d"]


def test_duplicate_spans_and_strip(spark):
    """Planted boilerplate: docs 1 and 2 share an 8-word header (one
    merged span each), doc 3 is unique (no spans); stripping removes
    exactly the span words and leaves unique text intact."""
    from pyspark.sql import functions as F

    from datawarehouse_code_spark.operators.text import (
        duplicate_spans,
        strip_duplicate_spans,
    )

    header = "this document is provided under the public license"
    rows = [
        (1, f"{header} alpha beta gamma delta"),
        (2, f"intro words here {header} epsilon zeta"),
        (3, "completely unrelated content with many distinct words inside"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    spans = duplicate_spans(docs, k=5, min_docs=2)
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in spans.collect()
    }
    # header = 8 words: doc 1 positions 1-8, doc 2 offset by 3
    assert got == {1: (1, 8), 2: (4, 11)}

    cleaned = {
        r["doc_id"]: (r["cleaned_text"], r["n_removed_words"])
        for r in strip_duplicate_spans(docs, spans, k=5).collect()
    }
    assert cleaned[1] == ("alpha beta gamma delta", 8)
    assert cleaned[2] == ("intro words here epsilon zeta", 8)
    assert cleaned[3][1] == 0 and "unrelated" in cleaned[3][0]


def test_bigram_lm_scores_fluent_below_gibberish(spark):
    """LM trained on the fixture corpus: a sentence assembled from
    common fixture bigrams scores LOWER (more probable) than shuffled
    gibberish and than unseen-vocabulary text; the score equals a
    pure-Python recomputation exactly."""
    import math

    from pyspark.sql import functions as F

    from datawarehouse_code_spark.operators.text_ml import (
        bigram_lm_score,
        train_bigram_lm,
    )
    from datawarehouse_code_spark.sources.catalog import read_table
    from tests.conftest import SF_DIR

    ref = read_table(spark, "documents", SF_DIR)
    bigrams, unigrams, v = train_bigram_lm(ref)

    # a greedy most-likely CHAIN through the bigram table (every
    # adjacent pair is a high-count corpus bigram) vs a real fixture
    # document vs martian gibberish (the fixture text is synthetic
    # word soup, so only the extremes are guaranteed to order — which
    # is exactly what a quality FILTER thresholds on)
    bi_rows = bigrams.collect()
    best_next = {}
    for r in bi_rows:
        cur = best_next.get(r["w1"])
        if cur is None or (r["n_bi"], r["w2"]) > (cur[1], cur[0]):
            best_next[r["w1"]] = (r["w2"], r["n_bi"])
    start = max(bi_rows, key=lambda r: (r["n_bi"], r["w1"]))["w1"]
    chain = [start]
    for _ in range(11):
        nxt = best_next.get(chain[-1])
        if nxt is None:
            break
        chain.append(nxt[0])
    fluent = " ".join(chain)
    sample = ref.orderBy("doc_id").first()["text"]
    probe = spark.createDataFrame(
        [(1, fluent), (2, sample), (3, "zxq gkr plv wmn qqj rrk")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_neg_log2p"])
        for r in bigram_lm_score(probe, bigrams, unigrams, v).collect()
    }
    # the filtering property: the most-likely chain scores strictly
    # below unseen-vocabulary gibberish, whose score is EXACTLY the
    # smoothing floor -log2(k/(k*V)) = log2(V) (fully-unseen words:
    # c_bi = c_uni = 0) — the fixture vocabulary is tiny (~31 words),
    # so margins are small but the floor is analytic and exact
    assert got[1][1] < got[3][1]
    assert abs(got[3][1] - math.log2(v)) < 1e-9

    # exact-twin: recompute doc 3's score in Python
    bi = {(r["w1"], r["w2"]): r["n_bi"] for r in bigrams.collect()}
    uni = {r["w1"]: r["n_uni"] for r in unigrams.collect()}
    ws = "zxq gkr plv wmn qqj rrk".split()
    k = 0.5
    nlps = [
        -math.log2(
            (bi.get((a, b), 0) + k) / (uni.get(a, 0) + k * v)
        )
        for a, b in zip(ws, ws[1:])
    ]
    want = sum(nlps) / len(nlps)
    assert abs(got[3][1] - want) < 1e-9
    assert got[3][0] == len(nlps)


def test_normalize_unicode_forms(spark):
    """normalize_unicode: NFC composes decomposed sequences, NFKC
    additionally folds compatibility forms (ligature, fullwidth),
    NULLs pass through, idempotent, invalid form raises."""
    import pytest
    from pyspark.sql import functions as F

    from datawarehouse_code_spark.operators.text import normalize_unicode

    rows = [
        (1, "café"),          # decomposed acute -> composed
        (2, "ﬃx"),             # ffi ligature (NFKC folds, NFC keeps)
        (3, "２０"),        # fullwidth digits (NFKC -> "20")
        (4, None),
        (5, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "id BIGINT, t STRING")
    nfc = {
        r["id"]: r["n"]
        for r in df.select("id", normalize_unicode(F.col("t")).alias("n")).collect()
    }
    assert nfc[1] == "café"
    assert nfc[2] == "ﬃx"          # NFC preserves compatibility chars
    assert nfc[4] is None and nfc[5] == "plain ascii"
    nfkc = {
        r["id"]: r["n"]
        for r in df.select(
            "id", normalize_unicode(F.col("t"), "NFKC").alias("n")
        ).collect()
    }
    assert nfkc[2] == "ffix" and nfkc[3] == "20"
    # idempotence: normalizing the normalized column is a fixpoint
    twice = df.select(
        normalize_unicode(normalize_unicode(F.col("t"))).alias("a"),
        normalize_unicode(F.col("t")).alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in twice)
    with pytest.raises(ValueError, match="normalization form"):
        normalize_unicode(F.col("t"), "NFX")
