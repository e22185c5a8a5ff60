"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns with typed metadata, exactly like the DSM
grids; all heavy work happens in Arrow-batched ``mapInPandas`` stages.

Codec status in this environment (no PIL/cv2/ffmpeg — SURVEY.md §7.0):
- ``png_rgb`` is a REAL codec: a from-scratch stdlib-zlib PNG truecolor
  decoder (8-bit RGB/RGBA, all five scanline filters — None/Sub/Up/Average/
  Paeth — per the PNG spec) plus a filter-0 encoder, so any tool's
  non-interlaced RGB8 PNG decodes here without external libraries.
- ``wav_pcm16`` is a REAL audio codec (stdlib ``wave``): standard PCM16 WAV
  files decode to int16 sample arrays, with an encoder for round trips;
  ``audio_features`` extracts duration/RMS/zero-crossings/peak per row.
- ``fake_rgb8`` is the deterministic raw codec used by the video-frame
  plumbing tests.
- JPEG/WebP and the compressed audio/video codecs (Opus/H.264) remain
  honestly stubbed behind ``NotImplementedError`` — entropy-coded formats
  need a library this sandbox doesn't ship; the surrounding Spark plumbing
  (schema, partitioning, UDF signature, Arrow batch shape) is real and
  tested, and a decoder drop-in is a one-function change.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
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

STUBBED_CODECS = ("jpeg", "webp", "opus", "h264")

# one PNG container implementation in the tree: codecs.py owns it
from dsm2dtm_spark.codecs import _PNG_SIG, _iter_png_chunks, _png_chunk  # noqa: E402


def fake_rgb8_encode(arr: np.ndarray) -> bytes:
    """Deterministic fake media codec: uint8 HxWx3, raw bytes."""
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    return arr.tobytes()


def encode_png_rgb8(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) → a valid truecolor PNG (filter 0, stdlib zlib)."""
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter_scanline(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """One PNG scanline filter inversion (spec §9.2). Sub is a per-residue
    wrapping prefix sum (vectorized); Average/Paeth chain along x, so they
    run a per-pixel loop — correct on any producer's PNG, and the hot corpus
    path (our own encoder) always emits filter 0."""
    if ftype == 0:
        return cur
    if ftype == 2:  # Up
        return (cur + prev).astype(np.uint8)
    if ftype == 1:  # Sub: out[i] = cur[i] + out[i-bpp] — wrapping cumsum
        out = cur.copy()
        for r in range(bpp):
            np.add.accumulate(out[r::bpp], out=out[r::bpp], dtype=np.uint8)
        return out
    out = np.empty_like(cur)
    n = len(cur)
    if ftype == 3:  # Average
        for i in range(n):
            a = out[i - bpp] if i >= bpp else 0
            out[i] = (int(cur[i]) + ((int(a) + int(prev[i])) >> 1)) & 0xFF
        return out
    if ftype == 4:  # Paeth
        for i in range(n):
            a = int(out[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (int(cur[i]) + pred) & 0xFF
        return out
    raise ValueError(f"invalid PNG filter type {ftype}")


def decode_png_rgb8(data: bytes, h: int | None = None, w: int | None = None) -> np.ndarray:
    """Any non-interlaced 8-bit truecolor PNG (color type 2, or 6 with the
    alpha channel dropped) → uint8 (h, w, 3). Pure stdlib+numpy; handles all
    five scanline filters, so PNGs written by PIL/libpng/etc decode here."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    idat = b""
    pw = ph = channels = None
    for tag, payload in _iter_png_chunks(data):
        if tag == b"IHDR":
            pw, ph, depth, ctype, _comp, _filt, interlace = struct.unpack_from(">IIBBBBB", payload)
            if depth != 8 or ctype not in (2, 6):
                raise ValueError(f"png_rgb decodes 8-bit truecolor (type 2/6), got depth={depth} type={ctype}")
            if interlace != 0:
                raise ValueError("Adam7 interlacing not supported")
            channels = 3 if ctype == 2 else 4
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if pw is None:
        raise ValueError("PNG missing IHDR")
    if (h is not None and h != ph) or (w is not None and w != pw):
        raise ValueError(f"PNG dims {(ph, pw)} disagree with row metadata {(h, w)}")
    raw = zlib.decompress(idat)
    stride = 1 + channels * pw
    prev = np.zeros(channels * pw, dtype=np.uint8)
    rows = []
    for i in range(ph):
        line = raw[i * stride : (i + 1) * stride]
        cur = np.frombuffer(line[1:], dtype=np.uint8).copy()
        cur = _unfilter_scanline(line[0], cur, prev, channels)
        prev = cur
        rows.append(cur.reshape(pw, channels)[:, :3])
    return np.stack(rows)


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 (n,) or (n, channels) → a standard PCM16 WAV container."""
    assert samples.dtype == np.int16
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """Any standard PCM16 WAV → (int16 array (n, channels), sample_rate).
    Pure stdlib ``wave`` — third-party WAV files decode without ffmpeg."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(f"wav_pcm16 reads 16-bit PCM, got {8 * wf.getsampwidth()}-bit")
        n, ch, rate = wf.getnframes(), wf.getnchannels(), wf.getframerate()
        samples = np.frombuffer(wf.readframes(n), dtype="<i2").reshape(n, ch)
    return samples, rate


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("duration_s", DoubleType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
        StructField("zero_crossing_rate", DoubleType()),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """Audio quality/filtering features per row (media_id, bytes) of PCM16
    WAV payloads: duration, RMS level, peak, zero-crossing rate (a crude
    voiced/noise discriminator) — the signals a pretraining-audio pipeline
    filters on. Arrow-batched ``mapInPandas``, numpy-vectorized per clip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in AUDIO_FEATURE_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                samples, rate = decode_wav_pcm16(row.bytes)
                mono = samples.astype(np.float64).mean(axis=1)
                out["media_id"].append(row.media_id)
                out["duration_s"].append(round(len(samples) / rate, 6))
                out["sample_rate"].append(rate)
                out["channels"].append(samples.shape[1])
                out["rms"].append(round(float(np.sqrt(np.mean(mono**2))), 4) if len(mono) else 0.0)
                out["peak"].append(int(np.abs(samples).max()) if len(samples) else 0)
                zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
                out["zero_crossing_rate"].append(round(zc, 4))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def media_decode_stub(data: bytes, h: int, w: int, fmt: str) -> np.ndarray:
    """Decode media bytes → uint8 (h, w, 3). png_rgb and fake_rgb8 are real;
    entropy-coded formats are stubbed (module docstring)."""
    if fmt == "fake_rgb8":
        return np.frombuffer(data, dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)
    if fmt == "png_rgb":
        return decode_png_rgb8(data, h, w)
    if fmt in STUBBED_CODECS:
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
