"""Unit tests for the round-5 operators: PII redaction, repetition
signals, duplicate-token collapse, CDC latest-wins, sequence packing.
(The registry suites built on these are oracle-checked in
test_oracle_differential.py; here we pin the edge semantics the
oracle rows can't isolate.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.cdc import cdc_latest
from datawarehouse_code_spark.operators.corpus import pack_sequences
from datawarehouse_code_spark.operators.text import (
    collapse_repeats,
    redact_pii,
    repetition_stats,
    words,
)


def test_redact_pii_counts_and_rewrites(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d@e.org ip 10.0.0.1 phone 555-867-5309"),
            (2, "nothing sensitive here"),
            (3, ""),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (got[1].n_email, got[1].n_ip, got[1].n_phone) == (2, 1, 1)
    assert got[1].redacted_text == "mail [EMAIL] and [EMAIL] ip [IP] phone [PHONE]"
    assert (got[2].n_email, got[2].n_ip, got[2].n_phone) == (0, 0, 0)
    assert got[2].redacted_text == "nothing sensitive here"
    assert got[3].redacted_text == ""


def test_repetition_stats_flags_degenerate_text(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words here are unique")],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[1].n_words == 4 and got[1].n_distinct_words == 1
    assert got[1].top_word_frac_f4 == 1.0
    # 3 2-grams, all "spam spam" -> 2 duplicates of 3
    assert got[1].n_2grams == 3 and got[1].dup_2gram_frac_f4 == 0.6666
    assert got[2].top_word_frac_f4 == 0.2 and got[2].dup_2gram_frac_f4 == 0.0


def test_collapse_repeats(spark):
    df = spark.createDataFrame([(1, "a a a the the end a")], "doc_id BIGINT, text STRING")
    out = df.select(
        F.concat_ws(" ", collapse_repeats(words(F.col("text")))).alias("c")
    ).head()
    assert out.c == "a the end a"


def test_cdc_latest_applies_updates_and_deletes(spark):
    log = spark.createDataFrame(
        [
            (1, 10.0, "I", 1),
            (1, 11.0, "U", 2),
            (2, 20.0, "I", 1),
            (2, 20.0, "D", 2),
            (3, 30.0, "I", 1),
        ],
        "id BIGINT, val DOUBLE, op STRING, seq INT",
    )
    got = {(r.id, r.val) for r in cdc_latest(log, ["id"], "seq").collect()}
    assert got == {(1, 11.0), (3, 30.0)}


def test_cdc_latest_rejects_tied_survivor(spark):
    log = spark.createDataFrame(
        [(1, 10.0, "I", 1), (1, 11.0, "U", 1)],
        "id BIGINT, val DOUBLE, op STRING, seq INT",
    )
    with pytest.raises(Exception, match="duplicate sequence"):
        cdc_latest(log, ["id"], "seq").collect()


def test_cdc_latest_ignores_ties_below_survivor(spark):
    log = spark.createDataFrame(
        [(1, 10.0, "I", 1), (1, 10.5, "U", 1), (1, 11.0, "U", 2)],
        "id BIGINT, val DOUBLE, op STRING, seq INT",
    )
    got = [(r.id, r.val) for r in cdc_latest(log, ["id"], "seq").collect()]
    assert got == [(1, 11.0)]


def test_pack_sequences_offsets_and_straddle(spark):
    df = spark.createDataFrame(
        [("s", 1, 300), ("s", 2, 300), ("s", 3, 100), ("t", 9, 50)],
        "src STRING, doc_id BIGINT, n INT",
    )
    got = {
        r.doc_id: (r.token_offset, r.seq_first, r.seq_last)
        for r in pack_sequences(df, 512, "src", "doc_id", "n").collect()
    }
    assert got[1] == (0, 0, 0)
    assert got[2] == (300, 0, 1)  # straddles the 512 boundary
    assert got[3] == (600, 1, 1)
    assert got[9] == (0, 0, 0)  # independent shard


def test_pack_sequences_rejects_nonpositive_tokens(spark):
    df = spark.createDataFrame([("s", 1, 0)], "src STRING, doc_id BIGINT, n INT")
    with pytest.raises(Exception, match="non-positive or NULL token count"):
        pack_sequences(df, 512, "src", "doc_id", "n").collect()
    # NULL counts raise too — `n <= 0` alone is NULL for NULL input and
    # would silently fall through to NULL offsets (the ADVICE hole)
    nul = spark.createDataFrame([("s", 1, None)], "src STRING, doc_id BIGINT, n INT")
    with pytest.raises(Exception, match="non-positive or NULL token count"):
        pack_sequences(nul, 512, "src", "doc_id", "n").collect()


def test_pagerank_star_ranks_center_highest(spark):
    from datawarehouse_code_spark.operators.graph import TOTAL_MASS, pagerank_fixed

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 0), (2, 0)], "src BIGINT, dst BIGINT"
    )
    got = {r.node: r.mass for r in pagerank_fixed(edges, iters=3).collect()}
    assert got[1] == got[2]  # symmetric leaves tie exactly
    assert got[0] > got[1]  # the hub outranks the leaves
    # integer mass is conserved up to div truncation
    assert 0 < sum(got.values()) <= TOTAL_MASS


def test_pagerank_rejects_dangling_nodes(spark):
    import pytest

    from datawarehouse_code_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame([(1, 2)], "src BIGINT, dst BIGINT")  # 2 has no out
    with pytest.raises(ValueError, match="dangling"):
        pagerank_fixed(edges, iters=1)


def test_pagerank_check_dangling_opt_out(spark):
    """check_dangling=False must (a) skip the precondition scan yet
    produce identical masses on a valid graph, (b) NOT raise on a
    dangling graph (the caller claimed the precondition) — the guard
    stays default-on."""
    from datawarehouse_code_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 0), (2, 0)], "src BIGINT, dst BIGINT"
    )
    checked = {r.node: r.mass for r in pagerank_fixed(edges, iters=3).collect()}
    unchecked = {
        r.node: r.mass
        for r in pagerank_fixed(edges, iters=3, check_dangling=False).collect()
    }
    assert checked == unchecked

    dangling = spark.createDataFrame([(1, 2)], "src BIGINT, dst BIGINT")
    # opt-out: runs without raising (mass leaks -- caller's claim)
    pagerank_fixed(dangling, iters=1, check_dangling=False).collect()


def test_explode_sequence_spans_straddle(spark):
    """A doc straddling the budget boundary emits one span per
    sequence; slices are half-open within the doc and positioned
    correctly inside each sequence."""
    from datawarehouse_code_spark.operators.corpus import (
        explode_sequence_spans,
        pack_sequences,
    )

    df = spark.createDataFrame(
        [("s", 1, 300), ("s", 2, 300), ("s", 3, 100), ("t", 9, 50)],
        "src STRING, doc_id BIGINT, n INT",
    )
    packed = pack_sequences(df, 512, "src", "doc_id", "n")
    got = {
        (r.doc_id, r.seq_id): (r.token_start, r.token_len, r.pos_in_seq)
        for r in explode_sequence_spans(packed, 512, "src", "doc_id").collect()
    }
    assert got == {
        (1, 0): (0, 300, 0),      # doc 1 entirely in seq 0 at pos 0
        (2, 0): (0, 212, 300),    # doc 2: first 212 tokens fill seq 0
        (2, 1): (212, 88, 0),     # ...remaining 88 open seq 1
        (3, 1): (0, 100, 88),     # doc 3 follows within seq 1
        (9, 0): (0, 50, 0),       # shard t independent
    }


def test_explode_sequence_spans_tiling_invariants(spark):
    """Per doc: spans tile [0, n_tokens). Per (shard, seq): spans tile
    [0, budget) — except each shard's final partial sequence."""
    from datawarehouse_code_spark.operators.corpus import (
        explode_sequence_spans,
        pack_sequences,
    )
    from datawarehouse_code_spark.sources.catalog import read_table
    from tests.conftest import SF_DIR

    docs = read_table(spark, "documents", SF_DIR)
    with_tokens = docs.select(
        "source", "doc_id",
        F.regexp_count(F.lower(F.col("text")), F.lit("[a-z0-9]+"))
        .cast("bigint").alias("n_tok"),
    )
    packed = pack_sequences(with_tokens, 512, "source", "doc_id", "n_tok")
    spans = explode_sequence_spans(packed, 512, "source", "doc_id").cache()

    # doc tiling: token_len sums to n_tokens, min start 0, max end n
    per_doc = spans.groupBy("source", "doc_id").agg(
        F.sum("token_len").alias("len_sum"),
        F.min("token_start").alias("s0"),
        F.max(F.col("token_start") + F.col("token_len")).alias("end"),
    ).join(packed, ["source", "doc_id"])
    assert per_doc.filter(
        (F.col("len_sum") != F.col("n_tokens"))
        | (F.col("s0") != 0)
        | (F.col("end") != F.col("n_tokens"))
    ).count() == 0

    # sequence tiling: every seq except each shard's last is exactly full
    per_seq = spans.groupBy("source", "seq_id").agg(
        F.sum("token_len").alias("fill"),
        F.min("pos_in_seq").alias("p0"),
    )
    last = per_seq.groupBy("source").agg(F.max("seq_id").alias("seq_id"))
    full = per_seq.join(last, ["source", "seq_id"], "left_anti")
    assert full.filter((F.col("fill") != 512) | (F.col("p0") != 0)).count() == 0
    spans.unpersist()


def test_table_diff_classifies_and_roundtrips(spark):
    """Diff two deterministic variants of orders: %7==0 keys deleted,
    %5==0 (surviving) keys price-bumped, +10M keys inserted.  The
    diff must classify exactly, and applying it to `old` (drop D,
    upsert I/U) must reconstruct `new` — the completeness contract."""
    from datawarehouse_code_spark.operators.cdc import table_diff
    from datawarehouse_code_spark.sources.catalog import read_table
    from tests.conftest import SF_DIR

    old = read_table(spark, "orders", SF_DIR).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    kept = old.filter(F.col("o_orderkey") % 7 != 0)
    new = kept.withColumn(
        "cents",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("cents") + 1).otherwise(
            F.col("cents")
        ),
    ).unionByName(
        old.limit(50).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_orderstatus",
            "cents",
        )
    )
    diff = table_diff(old, new, ["o_orderkey"]).cache()
    ops = {r["op"] for r in diff.select("op").distinct().collect()}
    assert ops == {"I", "D", "U"}
    # every D is a %7 key, every U a surviving %5 key, every I a +10M key
    assert diff.filter((F.col("op") == "D") & (F.col("o_orderkey") % 7 != 0)).count() == 0
    assert diff.filter(
        (F.col("op") == "U")
        & ((F.col("o_orderkey") % 5 != 0) | (F.col("o_orderkey") % 7 == 0))
    ).count() == 0
    assert diff.filter((F.col("op") == "I") & (F.col("o_orderkey") < 10_000_000)).count() == 0

    # completeness: apply_diff(old, diff) == new (the operator pair)
    from datawarehouse_code_spark.operators.cdc import apply_diff

    rebuilt = apply_diff(old, diff, ["o_orderkey"])
    assert rebuilt.count() == new.count()
    assert rebuilt.exceptAll(new).count() == 0
    diff.unpersist()


def test_table_diff_null_keys_and_values(spark):
    """NULL keys match null-safely (a NULL-keyed row present on both
    sides with equal values is UNCHANGED, not insert+delete), and a
    NULL<->value flip in a compared column is an update."""
    from datawarehouse_code_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(None, 1), (2, None), (3, 3)], "k int, v int"
    )
    new = spark.createDataFrame(
        [(None, 1), (2, 22), (3, None)], "k int, v int"
    )
    got = {
        (r["op"], r["k"]): r["v"]
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {("U", 2): 22, ("U", 3): None}

    # NULL-keyed roundtrip through apply_diff too
    from datawarehouse_code_spark.operators.cdc import apply_diff

    rebuilt = apply_diff(old, table_diff(old, new, ["k"]), ["k"])
    key_fn = lambda t: (repr(t[0]), repr(t[1]))  # None-safe sort
    assert sorted(
        ((r["k"], r["v"]) for r in rebuilt.collect()), key=key_fn
    ) == sorted(((r["k"], r["v"]) for r in new.collect()), key=key_fn)

    import pytest

    with pytest.raises(ValueError, match="absent from old"):
        table_diff(old, new.withColumn("extra", F.lit(1)), ["k"])
    # a key passed as a compare column would collide output column
    # names downstream — rejected up front, naming the overlap
    with pytest.raises(ValueError, match="overlap keys \\['k'\\]"):
        table_diff(old, new, ["k"], compare_cols=["k", "v"])
