"""Unigram-LM tokenizer (operators/tokenizer.py unigram_train /
unigram_encode): Viterbi semantics against brute-force enumeration,
the roundtrip guarantee, training determinism across partitionings,
and the end-to-end encode feeding n_tokens."""

import itertools
import math

from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.tokenizer import (
    unigram_encode,
    unigram_train,
    viterbi_segment,
)


def _logp_of(pieces):
    counts = dict(pieces)
    total = sum(counts.values()) + len(counts) + 1
    lp = {p: math.log((c + 1) / total) for p, c in counts.items()}
    return lp, math.log(1 / total)


def _brute_best(word, lp, max_len, unk):
    """Enumerate EVERY segmentation (exponential — short words only)
    and apply the documented tiebreak: max score, then fewer pieces,
    then the longer last piece, recursively toward the front (encoded
    by comparing the reversed piece-length tuple descending)."""
    n = len(word)
    best = None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        segs = [word[bounds[i] : bounds[i + 1]] for i in range(len(bounds) - 1)]
        if any(len(s) > max_len for s in segs):
            continue
        score = 0.0
        ok = True
        for s in segs:
            v = lp.get(s)
            if v is None:
                if len(s) > 1:
                    ok = False
                    break
                v = unk
            score += v
        if not ok:
            continue
        key = (score, -len(segs), tuple(len(s) for s in reversed(segs)))
        if best is None or key > best[0]:
            best = (key, segs)
    return best[1]


def test_viterbi_matches_brute_force_enumeration():
    pieces = [("ab", 10), ("ba", 9), ("aba", 4), ("bab", 4),
              ("a", 3), ("b", 2), ("c", 1)]
    lp, unk = _logp_of(pieces)
    for word in ("a", "ab", "aba", "abab", "ababa", "babab",
                 "abcab", "ccc", "abq", "qab"):
        got = viterbi_segment(word, lp, 3, unk)
        assert "".join(got) == word
        assert got == _brute_best(word, lp, 3, unk), word


def test_unigram_train_learns_repeated_pieces(spark):
    docs = spark.createDataFrame(
        [(i, "abab abab abc xyz abab abcxy") for i in range(20)],
        ["doc_id", "text"],
    )
    pieces = unigram_train(
        docs, vocab_size=12, n_iters=3, max_piece_len=3, seed_size=50
    )
    ranked = [p for p, _ in pieces]
    assert ranked[0] == "ab"  # the dominant repeated piece wins
    counts = dict(pieces)
    # single chars always survive pruning (segmentability guarantee)
    for ch in "abcxyz":
        assert ch in counts
    # counts are word-frequency weighted integers
    assert counts["ab"] == 140 and counts["xyz"] == 20


def test_unigram_train_deterministic_across_partitionings(spark):
    from datawarehouse_code_spark.sources.catalog import read_table
    from tests.conftest import SF_DIR

    docs = read_table(spark, "documents", SF_DIR).limit(120)
    a = unigram_train(docs.repartition(1), vocab_size=60, n_iters=2,
                      max_piece_len=3, seed_size=300)
    b = unigram_train(docs.repartition(13), vocab_size=60, n_iters=2,
                      max_piece_len=3, seed_size=300)
    assert a == b


def test_unigram_encode_end_to_end(spark):
    from datawarehouse_code_spark.sources.catalog import read_table
    from tests.conftest import SF_DIR

    docs = read_table(spark, "documents", SF_DIR).limit(50)
    pieces = unigram_train(docs, vocab_size=80, n_iters=2,
                           max_piece_len=3, seed_size=300)
    enc = unigram_encode(docs, pieces, max_piece_len=3)
    rows = enc.select("doc_id", "tokens", "n_tokens", "text").collect()
    assert len(rows) == 50
    for r in rows[:10]:
        assert r["n_tokens"] == len(r["tokens"]) > 0
        # concatenating pieces reproduces the normalized text
        norm = " ".join(r["text"].lower().split())
        assert "".join(r["tokens"]) == norm.replace(" ", "")
    # a NULL text yields NULL tokens, not a crash
    null_doc = spark.createDataFrame([(1, None)], "doc_id BIGINT, text STRING")
    got = unigram_encode(null_doc, pieces).collect()[0]
    assert got["tokens"] is None
