"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs —
the Spark-side contract (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the actual codec work is
stubbed because no image/audio libraries exist in this sandbox:

* ``decode_image_meta`` — header sniffing (PNG/JPEG/GIF magic) is REAL;
  pixel decode is a deterministic fake derived from the byte content
  (documented, seedable) so pipelines are testable end-to-end.
* ``extract_image_features`` / ``resize_images`` / ``sample_video_frames``
  — Arrow-batched mapInPandas transforms with production signatures; the
  numeric kernel raises ``NotImplementedError`` unless ``fake=True``.

Swapping in PIL/ffmpeg later changes only the inner function body — the
DataFrame-level schema and batching are already what a real pipeline needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "riff"),
]


def sniff_format(data: bytes) -> str:
    for magic, name in _MAGIC:
        if data[:len(magic)] == magic:
            return name
    return "unknown"


def fake_dims(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in for pixel-header decode: dimensions derived
    from byte length and first bytes (pure function; SQL-mirrorable)."""
    n = len(data)
    w = (n % 640) + 1
    h = ((n // 640) % 480) + 1
    return w, h


def decode_image_meta(df: DataFrame, binary_col: str = "payload",
                      fake: bool = True) -> DataFrame:
    """binary -> ``meta struct<format,byte_len,width,height>`` via
    mapInPandas (Arrow batches; per-batch numpy/pandas, no per-row Python
    at the Spark level)."""
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("meta", IMAGE_META_SCHEMA)])
    cols = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for data in pdf[binary_col]:
                b = bytes(data) if data is not None else b""
                fmt = sniff_format(b)
                if not fake:
                    raise NotImplementedError(
                        "real pixel decode requires an image library "
                        "(absent in this sandbox)")
                w, h = fake_dims(b)
                metas.append({"format": fmt, "byte_len": len(b),
                              "width": w, "height": h})
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf[cols + ["meta"]]

    return df.mapInPandas(batches, schema=out_schema)


def extract_image_features(df: DataFrame, binary_col: str = "payload",
                           dim: int = 16, fake: bool = True) -> DataFrame:
    """binary -> ``features array<float>`` (an embedding stand-in: a
    deterministic byte-histogram when ``fake``; NotImplementedError hook
    for a real model)."""
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("features",
                                               T.ArrayType(T.FloatType()))])
    cols = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for data in pdf[binary_col]:
                b = np.frombuffer(bytes(data or b""), dtype=np.uint8)
                if not fake:
                    raise NotImplementedError("real feature extraction "
                                              "requires a vision model")
                if len(b) == 0:
                    feats.append([0.0] * dim)
                    continue
                hist, _ = np.histogram(b % dim, bins=dim, range=(0, dim))
                feats.append((hist / len(b)).astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf[cols + ["features"]]

    return df.mapInPandas(batches, schema=out_schema)


def sample_video_frames(df: DataFrame, binary_col: str = "payload",
                        every_n: int = 4, fake: bool = True) -> DataFrame:
    """binary "video" -> exploded (frame_idx, frame binary) rows: the
    frame-sampling shape a real pipeline needs (1 input row -> k output
    rows inside mapInPandas).  Fake codec: fixed-size byte windows."""
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("frame_idx", T.IntegerType()),
                                 T.StructField("frame", T.BinaryType())])
    cols = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # column lists instead of iterrows (the per-row Series
            # construction dominates at batch size)
            col_vals = {c: pdf[c].tolist() for c in cols}
            rows = []
            for ridx, data in enumerate(col_vals[binary_col]):
                b = bytes(data or b"")
                if not fake:
                    raise NotImplementedError("real frame sampling requires "
                                              "ffmpeg")
                size = max(len(b) // 16, 1)
                frames = [b[i * size:(i + 1) * size]
                          for i in range(0, 16, every_n)]
                for i, fr in enumerate(frames):
                    d = {c: col_vals[c][ridx] for c in cols}
                    d["frame_idx"] = i
                    d["frame"] = fr
                    rows.append(d)
            yield pd.DataFrame(rows, columns=cols + ["frame_idx", "frame"])

    return df.mapInPandas(batches, schema=out_schema)
