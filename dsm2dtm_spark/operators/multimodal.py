"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns with typed metadata, exactly like the DSM
grids; all heavy work happens in Arrow-batched ``mapInPandas`` stages. The
real media codecs (JPEG/PNG-RGB, PCM/Opus, H.264) are NOT available in this
environment (no PIL/cv2/ffmpeg — SURVEY.md §7.0), so the decode step is
stubbed: ``media_decode_stub`` raises ``NotImplementedError`` for real codecs
and supports a deterministic fake codec ``fake_rgb8`` so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is real
and tested end-to-end. Swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

REAL_CODECS = ("jpeg", "png_rgb", "webp", "pcm16", "opus", "h264")


def fake_rgb8_encode(arr: np.ndarray) -> bytes:
    """Deterministic fake media codec: uint8 HxWx3, raw bytes."""
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    return arr.tobytes()


def media_decode_stub(data: bytes, h: int, w: int, fmt: str) -> np.ndarray:
    """Decode media bytes → uint8 (h, w, 3). Real codecs are stubbed."""
    if fmt == "fake_rgb8":
        return np.frombuffer(data, dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)
    if fmt in REAL_CODECS:
        raise NotImplementedError(
            f"media codec {fmt!r} requires an image/audio library not present in this "
            "environment; plug a decoder into media_decode_stub (plumbing is codec-agnostic)"
        )
    raise ValueError(f"unknown media fmt {fmt!r}")


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mean_rgb", ArrayType(DoubleType())),
        StructField("luma_hist", ArrayType(LongType())),
        StructField("phash", LongType()),
    ]
)


def media_features(df: DataFrame) -> DataFrame:
    """Feature extraction over media rows (media_id, bytes, h, w, fmt):
    channel means, 16-bin luma histogram, perceptual hash. Arrow-batched;
    ~ARROW_BATCH_ROWS rows per python invocation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dsm2dtm_spark import codecs as _c

        for pdf in batches:
            out = {k: [] for k in FEATURE_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                img = media_decode_stub(row.bytes, int(row.h), int(row.w), row.fmt)
                luma = img.astype(np.float64).mean(axis=2)
                hist = np.histogram(luma, bins=16, range=(0, 256))[0]
                out["media_id"].append(row.media_id)
                out["mean_rgb"].append([round(float(x), 4) for x in img.reshape(-1, 3).mean(axis=0)])
                out["luma_hist"].append(hist.astype(np.int64).tolist())
                out["phash"].append(_c.ahash64(luma, nodata=float("nan")))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("h", IntegerType()),
        StructField("w", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def media_resize(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Bilinear resize per channel (reuses the raster zoom kernel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dsm2dtm_spark.kernels import zoom_bilinear

        for pdf in batches:
            out = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                img = media_decode_stub(row.bytes, int(row.h), int(row.w), row.fmt)
                chans = [
                    zoom_bilinear(img[:, :, c].astype(np.float64), (out_h / img.shape[0], out_w / img.shape[1]))
                    for c in range(3)
                ]
                rs = np.clip(np.rint(np.stack(chans, axis=2)), 0, 255).astype(np.uint8)
                rs = rs[:out_h, :out_w]
                out["media_id"].append(row.media_id)
                out["bytes"].append(fake_rgb8_encode(np.ascontiguousarray(rs)))
                out["h"].append(rs.shape[0])
                out["w"].append(rs.shape[1])
                out["fmt"].append("fake_rgb8")
            yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("bytes", BinaryType()),
        StructField("h", IntegerType()),
        StructField("w", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def frame_sample(df: DataFrame, every_n: int) -> DataFrame:
    """Video frame sampling plumbing: rows are (media_id, bytes, h, w, fmt,
    n_frames) where bytes hold n_frames concatenated fake_rgb8 frames; emits
    every ``every_n``-th frame as its own row (UDTF-style expansion, the same
    pattern as raster tiling)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in FRAME_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                h, w, nf = int(row.h), int(row.w), int(row.n_frames)
                frame_bytes = h * w * 3
                for i in range(0, nf, every_n):
                    out["media_id"].append(row.media_id)
                    out["frame_idx"].append(i)
                    out["bytes"].append(row.bytes[i * frame_bytes : (i + 1) * frame_bytes])
                    out["h"].append(h)
                    out["w"].append(w)
                    out["fmt"].append("fake_rgb8")
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)
