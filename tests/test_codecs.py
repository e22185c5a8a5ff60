"""Codec round-trip, PSNR, and perceptual-hash tests (FIXTURES.md §1)."""

from __future__ import annotations

import numpy as np
import pytest

from dsm2dtm_spark import codecs
from dsm2dtm_spark.params import NODATA_DEFAULT


def scene(seed=0, n=40, nodata_frac=0.1):
    rng = np.random.default_rng(seed)
    g = (100 + rng.normal(0, 5, (n, n))).astype(np.float32)
    idx = rng.choice(n * n, int(n * n * nodata_frac), replace=False)
    g.ravel()[idx] = NODATA_DEFAULT
    return g


class TestRawF32:
    def test_roundtrip_exact(self):
        g = scene()
        out = codecs.decode(codecs.encode(g, "raw_f32"), 40, 40, "raw_f32")
        np.testing.assert_array_equal(out, g)


class TestPng16:
    def test_valid_png_signature_and_roundtrip(self):
        g = scene(1)
        data = codecs.encode(g, "png16")
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        out = codecs.decode(data, 40, 40, "png16")
        # quantization error bounded by scale/2
        valid = g != NODATA_DEFAULT
        scale = (g[valid].max() - g[valid].min()) / 65534
        # bound: scale/2 quantization + float32 representation of the result
        f32_eps = np.abs(g[valid]).max() * np.finfo(np.float32).eps
        assert np.abs(out[valid] - g[valid]).max() <= scale * 0.5 + f32_eps
        np.testing.assert_array_equal(out == NODATA_DEFAULT, ~valid)

    def test_snapped_grid_is_lossless(self):
        g = codecs.snap(scene(2), "png16")
        out = codecs.decode(codecs.encode(g, "png16"), 40, 40, "png16")
        np.testing.assert_allclose(out, g, rtol=0, atol=1e-9)

    def test_flat_image(self):
        g = np.full((10, 10), 42.0, dtype=np.float32)
        out = codecs.decode(codecs.encode(g, "png16"), 10, 10, "png16")
        np.testing.assert_allclose(out, g)

    def test_dim_mismatch_raises(self):
        data = codecs.encode(scene(), "png16")
        with pytest.raises(ValueError):
            codecs.decode(data, 39, 40, "png16")


class TestQz8:
    def test_lossy_but_psnr_above_40(self):
        g = scene(3)
        out = codecs.decode(codecs.encode(g, "qz8"), 40, 40, "qz8")
        assert codecs.psnr(g, out) >= 40.0
        valid = g != NODATA_DEFAULT
        np.testing.assert_array_equal(out == NODATA_DEFAULT, ~valid)

    def test_all_nodata(self):
        g = np.full((5, 5), NODATA_DEFAULT, dtype=np.float32)
        out = codecs.decode(codecs.encode(g, "qz8"), 5, 5, "qz8")
        np.testing.assert_array_equal(out, g)


class TestPsnr:
    def test_identical_is_inf(self):
        g = scene(4)
        assert codecs.psnr(g, g) == float("inf")

    def test_known_value(self):
        r = np.zeros((10, 10), dtype=np.float32)
        r[0, 0] = 10.0  # peak range 10
        t = r + 0.1
        # mse = 0.01, psnr = 10*log10(100/0.01) = 40
        assert abs(codecs.psnr(r, t) - 40.0) < 1e-6


class TestAHash:
    def test_deterministic_and_int64(self):
        g = scene(5)
        h1, h2 = codecs.ahash64(g), codecs.ahash64(g)
        assert h1 == h2
        assert -(1 << 63) <= h1 < (1 << 63)

    def test_differs_for_different_scenes(self):
        yy, xx = np.mgrid[0:64, 0:64]
        a = (xx < 32).astype(np.float32)  # left-bright
        b = (yy < 32).astype(np.float32)  # top-bright
        assert codecs.ahash64(a) != codecs.ahash64(b)

    def test_robust_to_small_noise(self):
        rng = np.random.default_rng(6)
        yy, xx = np.mgrid[0:64, 0:64]
        g = (xx * 2.0).astype(np.float32)
        noisy = g + rng.normal(0, 0.01, g.shape).astype(np.float32)
        a, b = codecs.ahash64(g), codecs.ahash64(noisy)
        assert bin(np.uint64(a ^ b).item() if a ^ b >= 0 else (a ^ b) + (1 << 64)).count("1") <= 4


class TestZf32ShuffleCodec:
    def test_roundtrip_smooth_and_noisy(self):
        rng = np.random.default_rng(6)
        smooth = np.full((300, 200), 101.5, dtype=np.float32)
        noisy = rng.normal(100, 5, (300, 200)).astype(np.float32)
        for g in (smooth, noisy):
            data = codecs.encode_zf32(g)
            np.testing.assert_array_equal(codecs.decode_zf32(data, 300, 200), g)

    def test_adaptive_markers(self):
        rng = np.random.default_rng(7)
        smooth = np.full((256, 256), 7.25, dtype=np.float32)
        assert codecs.encode_zf32(smooth)[:1] == b"P"
        assert len(codecs.encode_zf32(smooth)) < smooth.nbytes // 50
        # pure-white-noise bytes in EVERY plane: nothing worth compressing
        noise = np.frombuffer(rng.bytes(256 * 256 * 4), dtype="<f4").reshape(256, 256).copy()
        assert codecs.encode_zf32(noise)[:1] == b"R"
        # lidar-like data: noisy mantissa planes ship raw INSIDE a 'P'
        # payload while the exponent planes compress — whole ratio ≥ 1.5×
        lidar = (100.0 + rng.normal(0, 0.2, (256, 256))).astype(np.float32)
        data = codecs.encode_zf32(lidar)
        assert data[:1] == b"P" and len(data) < 0.7 * lidar.nbytes
        np.testing.assert_array_equal(codecs.decode_zf32(data, 256, 256), lidar)

    def test_truncated_and_unknown_marker_raise(self):
        rng = np.random.default_rng(8)
        g = rng.normal(100, 4, (64, 64)).astype(np.float32)  # Z path, real body
        data = codecs.encode_zf32(g)
        with pytest.raises(ValueError, match="truncated|corrupt"):
            codecs.decode_zf32(data[: len(data) // 2], 64, 64)
        with pytest.raises(ValueError, match="marker"):
            codecs.decode_zf32(b"X" + data[1:], 64, 64)
        raw = codecs.encode_zf32(np.frombuffer(rng.bytes(64 * 64 * 4), dtype="<f4").reshape(64, 64))
        assert raw[:1] == b"R"
        with pytest.raises(ValueError, match="truncated"):
            codecs.decode_zf32(raw[:100], 64, 64)
