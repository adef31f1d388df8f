"""BPE tokenizer (operators/tokenizer.py): distributed training must
equal an independent pure-Python BPE trainer; encoding must apply the
merge list exactly and compose with sequence packing."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.tokenizer import (
    END,
    bpe_encode,
    bpe_train,
    encode_word,
)
from datawarehouse_code_spark.sources.catalog import read_table
from tests.conftest import SF_DIR


def _reference_bpe(word_freq: dict[str, int], n_merges: int):
    """Independent in-test BPE trainer (dict-based, no Spark): the
    classic word-frequency formulation with lexicographic tiebreak."""
    vocab = {tuple(list(w) + [END]): n for w, n in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for syms, n in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference_trainer(spark):
    corpus = [
        "the cat sat on the mat",
        "the cats sat",
        "a cat and the mat",
        "the the the",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id int, text string"
    )
    wf: Counter = Counter()
    for t in corpus:
        for w in t.split():
            wf[w] += 1
    want = _reference_bpe(dict(wf), 12)
    got = bpe_train(docs, 12)
    assert got == want and len(got) >= 8

    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(docs, 0)


def test_bpe_encode_roundtrip_and_compression(spark):
    """Tokens partition each word exactly (concatenation restores the
    normalized text), and more merges never increase token count."""
    docs = read_table(spark, "documents", SF_DIR).limit(60)
    merges = bpe_train(docs, 25, vocab_cap=500)
    assert len(merges) == 25

    enc = bpe_encode(docs, merges)
    rows = enc.select("doc_id", "text", "tokens", "n_tokens").collect()
    assert len(rows) == 60
    import re

    for r in rows:
        norm = re.sub(r"\s+", " ", r["text"].lower()).strip()
        rebuilt = "".join(r["tokens"]).replace(END, " ").strip()
        assert rebuilt == norm
        assert r["n_tokens"] == len(r["tokens"])

    # monotone compression: applying a PREFIX of the merges can't
    # yield fewer tokens than the full list
    enc_half = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode(docs, merges[:5]).select("doc_id", "n_tokens").collect()
    }
    for r in rows:
        assert r["n_tokens"] <= enc_half[r["doc_id"]]

    # the UDF path equals the pure-Python reference per word
    some = rows[0]["text"]
    norm = re.sub(r"\s+", " ", some.lower()).strip()
    expect = []
    for w in norm.split(" "):
        if w:
            expect.extend(encode_word(w, merges))
    assert rows[0]["tokens"] == expect


def test_bpe_tokens_feed_pack_sequences(spark):
    """Pipeline composition: encode -> pack_sequences runs end-to-end
    on the real fixture (the text -> tokens -> packed path)."""
    from datawarehouse_code_spark.operators.corpus import pack_sequences

    docs = read_table(spark, "documents", SF_DIR).limit(40)
    merges = bpe_train(docs, 10, vocab_cap=300)
    enc = bpe_encode(docs, merges).select("doc_id", "lang", "n_tokens")
    packed = pack_sequences(
        enc, budget=512, shard_col="lang", order_col="doc_id",
        tokens_col="n_tokens",
    )
    assert packed.count() > 0
    total = enc.agg(F.sum("n_tokens")).first()[0]
    assert total and total > 0


def test_bpe_merges_save_load_round_trip(spark, tmp_path):
    """Ordered merge-list persistence: load returns the exact ordered
    list, and the encoder built from it segments identically."""
    from datawarehouse_code_spark.operators.tokenizer import (
        bpe_train,
        encode_word,
        load_bpe_merges,
        save_bpe_merges,
    )

    docs = spark.createDataFrame(
        [("low lower lowest",), ("newer newest low",)], ["text"]
    )
    merges = bpe_train(docs, n_merges=4)
    path = str(tmp_path / "merges")
    save_bpe_merges(spark, merges, path)
    loaded = load_bpe_merges(spark, path)
    assert loaded == merges
    for w in ("lowest", "newer", "unseen"):
        assert encode_word(w, loaded) == encode_word(w, merges)
