"""Multimodal plumbing tests: schema, batch shapes, one-to-many frame
explosion, determinism, and the decode stub's contract."""

from __future__ import annotations

import pytest

from datawarehouse_code_spark.operators.multimodal import (
    HAVE_PIL,
    decode_image,
    extract_features,
    media_from_documents,
    sample_frames,
)
from datawarehouse_code_spark.sources.catalog import read_table
from tests.conftest import SF_DIR


def _media(spark):
    return media_from_documents(read_table(spark, "documents", SF_DIR))


def test_media_schema(spark):
    media = _media(spark)
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "media_type": "string",
        "content": "binary",
        "meta_n_chars": "bigint",
    }


def test_extract_features_matches_bytes(spark):
    media = _media(spark)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            read_table(spark, "documents", SF_DIR).collect()}
    assert len(feats) == len(docs)
    for doc_id, text in list(docs.items())[:25]:
        b = text.encode("utf-8")
        f = feats[doc_id]
        assert f["n_bytes"] == len(b)
        assert f["width"] == len(b) % 640
        assert f["height"] == (7 * len(b)) % 480
        assert f["checksum"] == sum(ord(c) for c in text[:64])


def test_sample_frames_one_to_many(spark):
    media = _media(spark).limit(20)
    frames = sample_frames(media, n_frames=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == 20
    for rows in by_media.values():
        assert 1 <= len(rows) <= 4
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == list(
            range(len(rows))
        )
        for r in rows:
            assert r["frame_len"] == len(r["frame_bytes"])


def test_decode_stub_contract():
    if not HAVE_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG...")
