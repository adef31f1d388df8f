"""Corpus cleaning end-to-end: duplicates (planted + synthetic exact
copies) are dropped, everything else survives, and the written corpus
is lang-partitioned."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datawarehouse_code_spark.operators.corpus import clean_corpus, write_clean_corpus
from datawarehouse_code_spark.operators.text import near_dup_pairs_exact
from datawarehouse_code_spark.sources.catalog import read_table
from tests.conftest import SF_DIR


def _with_exact_copies(spark):
    docs = read_table(spark, "documents", SF_DIR)
    copies = docs.limit(5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    return docs.unionByName(copies)


def test_clean_corpus_drops_dups_keeps_rest(spark):
    docs = _with_exact_copies(spark)
    survivors = clean_corpus(docs)
    ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    # every synthetic exact copy dropped (original id is smaller)
    assert all(i < 1_000_000 for i in ids)
    # every doc appearing as the larger side of a verified near-dup
    # pair is gone; all never-duplicated docs survive
    pairs = near_dup_pairs_exact(read_table(spark, "documents", SF_DIR)).collect()
    dup_larger = {r["d2"] for r in pairs}
    dup_any = {r["d1"] for r in pairs} | dup_larger
    all_ids = {r["doc_id"] for r in read_table(spark, "documents", SF_DIR).collect()}
    assert ids & dup_larger == set()
    assert (all_ids - dup_any) <= ids


def test_write_clean_corpus_partitioned(spark, tmp_path):
    out = str(tmp_path / "clean")
    docs = _with_exact_copies(spark)
    report = write_clean_corpus(spark, docs, out)
    assert report["input"] == report["surviving"] + report["dropped"]
    assert report["dropped"] >= 5
    lang_dirs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert len(lang_dirs) >= 2
    back = spark.read.parquet(out)
    assert back.count() == report["surviving"]
