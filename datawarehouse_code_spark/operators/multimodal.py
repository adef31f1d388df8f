"""Multimodal column plumbing: opaque binary media + typed metadata,
processed with Arrow-batched `mapInPandas`.

Doctrine for image/audio/video at 100 TB:
- media is an opaque `binary` column with typed metadata columns
  beside it — never decoded driver-side, never a Python object column;
- decode / feature-extraction / frame-sampling run as `mapInPandas`
  stages: Arrow batches in, Arrow batches out, one Python worker per
  partition — a narrow map, so it scales like any projection;
- the actual codec libraries (Pillow / torchaudio / ffmpeg) are NOT
  in this container, so `decode_image` is a stub raising
  NotImplementedError, and the shipped feature extractor computes
  DETERMINISTIC byte-level features instead.  Everything around the
  decode — schemas, batch iteration, one-to-many frame explosion,
  partitioning — is real and tested; swapping the fake for a codec
  is a one-function change.

The fixture has no binary table, so `media_from_documents` derives
one by UTF-8-encoding `documents.text` — deterministic, and (for
ASCII text) byte-level features are reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # codec libraries are optional; absent in this container
    from PIL import Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

FEATURE_SCHEMA = (
    "media_id BIGINT, media_type STRING, n_bytes INT, width INT, height INT, "
    "checksum BIGINT"
)
FRAME_SCHEMA = "media_id BIGINT, frame_idx INT, frame_bytes BINARY, frame_len INT"


def decode_image(data: bytes):
    """Decode an encoded image to pixels.  STUB: requires Pillow,
    which is not installed here — the surrounding plumbing is what
    this module ships and tests."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires Pillow; install it and replace the "
            "deterministic fake in extract_features"
        )
    raise NotImplementedError("wire Image.open(BytesIO(data)) here when Pillow exists")


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Derive a media table from the documents fixture: the UTF-8 bytes
    of the text stand in for an encoded media payload."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.col("n_chars").alias("meta_n_chars"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Per-media feature extraction via mapInPandas.

    With a real codec this is where decode_image would run; the
    deterministic fake derives features purely from the payload so the
    DuckDB oracle can verify the plumbing end-to-end:
      n_bytes   — payload size
      width     — n_bytes mod 640   (fake "decoded" dimension)
      height    — (7 * n_bytes) mod 480
      checksum  — sum of the code points of the first 64 CHARACTERS
                  (character-based, matching the SQL oracle's
                  ascii(substr(...)) on any UTF-8 input, not just ASCII)
    NULL payloads yield NULL features (the oracle's arithmetic over
    NULL does the same) instead of crashing the Python worker.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes, width, height, checksum = [], [], [], []
            for b in pdf["content"]:
                if b is None:
                    n_bytes.append(None)
                    width.append(None)
                    height.append(None)
                    checksum.append(None)
                    continue
                n = len(b)
                n_bytes.append(n)
                width.append(n % 640)
                height.append((7 * n) % 480)
                checksum.append(sum(ord(c) for c in bytes(b).decode("utf-8")[:64]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.array(n_bytes, dtype="Int32"),
                    "width": pd.array(width, dtype="Int32"),
                    "height": pd.array(height, dtype="Int32"),
                    "checksum": pd.array(checksum, dtype="Int64"),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """One-to-many frame sampling via mapInPandas: each payload is cut
    into `n_frames` evenly-spaced slices (the batch shape a real video
    frame-sampler produces: input row → multiple output rows)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_bytes, out_len = [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue  # no payload, no frames
                size = len(content)
                step = max(size // n_frames, 1)
                for i in range(n_frames):
                    start = i * step
                    if start >= size:
                        break
                    frame = bytes(content[start : start + step])
                    out_ids.append(media_id)
                    out_idx.append(i)
                    out_bytes.append(frame)
                    out_len.append(len(frame))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_bytes": pd.Series(out_bytes, dtype=object),
                    "frame_len": pd.Series(out_len, dtype="int32"),
                }
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)
