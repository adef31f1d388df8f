"""Multimodal column plumbing: opaque binary media + typed metadata,
processed with Arrow-batched `mapInPandas`.

Doctrine for image/audio/video at 100 TB:
- media is an opaque `binary` column with typed metadata columns
  beside it — never decoded driver-side, never a Python object column;
- decode / feature-extraction / frame-sampling run as `mapInPandas`
  stages: Arrow batches in, Arrow batches out, one Python worker per
  partition — a narrow map, so it scales like any projection;
- `decode_image` has a REAL executable branch: binary PNM (PPM "P6"
  RGB / PGM "P5" grayscale) decodes in pure Python — header parse,
  comment handling, channel de-interleave — with `decoded_image_stats`
  running it inside the mapInPandas path, oracle-verified over
  synthetic PPM payloads.  Compressed codecs (PNG/JPEG/audio/video)
  need the codec libraries (Pillow / torchaudio / ffmpeg) that are
  NOT in this container, so only THAT branch raises
  NotImplementedError; swapping it for a codec is a one-function
  change.

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
DECODED_STATS_SCHEMA = (
    "media_id BIGINT, width INT, height INT, "
    "sum_r BIGINT, sum_g BIGINT, sum_b BIGINT"
)


def _decode_pnm(data: bytes) -> tuple[int, int, int, bytes]:
    """Pure-Python binary-PNM decode: P6 (RGB, 3 channels) or P5
    (grayscale, 1 channel) → (width, height, n_channels, pixel_bytes)
    with pixels interleaved per the format.  Handles the full header
    grammar — arbitrary whitespace between tokens and `#` comments
    through end-of-line — and fails loudly on truncated payloads or
    a >8-bit maxval (16-bit PNM is out of scope)."""
    magic = bytes(data[:2])
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PNM payload (magic {magic!r})")
    channels = 3 if magic == b"P6" else 1
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(data):
            c = data[pos : pos + 1]
            if c == b"#":
                while pos < len(data) and data[pos : pos + 1] != b"\n":
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        vals.append(int(data[start:pos]))
    width, height, maxval = vals
    if not 0 < maxval < 256:
        raise ValueError(f"unsupported PNM maxval {maxval} (8-bit only)")
    pos += 1  # exactly one whitespace byte separates maxval from pixels
    n = width * height * channels
    pixels = bytes(data[pos : pos + n])
    if len(pixels) != n:
        raise ValueError(
            f"PNM payload truncated: want {n} pixel bytes, have {len(pixels)}"
        )
    return width, height, channels, pixels


def _decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Pure-Python uncompressed 24-bit BMP (BI_RGB) decode →
    (width, height, 3, RGB pixel bytes).  Handles the BITMAPFILEHEADER
    + BITMAPINFOHEADER layout, 4-byte row padding, bottom-up (positive
    height) and top-down (negative height) storage, and the BGR→RGB
    channel swap.  Anything else (palettes, other bit depths, RLE)
    fails loudly."""
    import struct

    if bytes(data[:2]) != b"BM":
        raise ValueError(f"not a BMP payload (magic {bytes(data[:2])!r})")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    width, height_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    if width <= 0 or height <= 0:
        raise ValueError(f"bad BMP dimensions {width}x{height_raw}")
    row_stride = (width * 3 + 3) & ~3
    need = pixel_offset + row_stride * height
    if len(data) < need:
        raise ValueError(
            f"BMP payload truncated: want {need} bytes, have {len(data)}"
        )
    out = bytearray(width * height * 3)
    for r in range(height):
        src_row = r if top_down else height - 1 - r
        base = pixel_offset + src_row * row_stride
        dst = r * width * 3
        for x in range(width):
            b, g, rr = data[base + 3 * x : base + 3 * x + 3]
            out[dst + 3 * x] = rr
            out[dst + 3 * x + 1] = g
            out[dst + 3 * x + 2] = b
    return width, height, 3, bytes(out)


def decode_image(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an encoded image to (width, height, n_channels,
    interleaved_pixel_bytes).

    Uncompressed formats decode in pure Python — binary PNM (PPM/PGM)
    and 24-bit BMP are the real executable branches this container
    exercises end-to-end (decoded_image_stats).  Compressed codecs
    require Pillow, which is not installed here; that branch alone
    stays NotImplementedError until a codec library exists."""
    if bytes(data[:2]) in (b"P6", b"P5"):
        return _decode_pnm(data)
    if bytes(data[:2]) == b"BM":
        return _decode_bmp(data)
    if not HAVE_PIL:
        raise NotImplementedError(
            "compressed image decode requires Pillow (binary PNM and "
            "24-bit BMP decode natively); install Pillow for PNG/JPEG "
            "payloads"
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


def decoded_image_stats(media: DataFrame) -> DataFrame:
    """Per-media stats computed from REAL decoded pixels — the stage
    that proves the decode path executes inside the Arrow plumbing
    (not just the byte-level fake): decode_image each payload, then
    integer per-channel sums (grayscale payloads report the single
    channel as r=g=b).  Integer sums, never float means — exact on
    every engine, so the DuckDB oracle can hash-verify the decode.

    Scale shape: same as extract_features — a narrow Arrow-batched
    map, no shuffle; pixels never leave the worker, only the
    fixed-width stats row does.  NULL payloads yield no row (a real
    decode pipeline routes them to a quarantine instead)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, srs, sgs, sbs = [], [], [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                w, h, ch, px = decode_image(bytes(content))
                if ch == 3:
                    sr, sg, sb = sum(px[0::3]), sum(px[1::3]), sum(px[2::3])
                else:
                    sr = sg = sb = sum(px)
                ids.append(media_id)
                ws.append(w)
                hs.append(h)
                srs.append(sr)
                sgs.append(sg)
                sbs.append(sb)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "sum_r": pd.Series(srs, dtype="int64"),
                    "sum_g": pd.Series(sgs, dtype="int64"),
                    "sum_b": pd.Series(sbs, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, DECODED_STATS_SCHEMA)


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
