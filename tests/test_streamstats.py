"""Chunked pass-1 statistics: bounded-memory (min, exact median slope) must
equal the whole-image golden computation bit-for-bit (the two-pass selection
is the distributed-median pattern for rasters beyond single-task memory)."""

from __future__ import annotations

import numpy as np
import pytest

from dsm2dtm_spark import codecs, golden
from dsm2dtm_spark.kernels.streamstats import chunked_min_and_slope

NODATA = -9999.0


def check(grid: np.ndarray, res: float, block_rows: int = 47) -> None:
    h, w = grid.shape
    got_min, got_slope = chunked_min_and_slope(
        codecs.encode_raw_f32(grid), h, w, res, NODATA, block_rows=block_rows
    )
    valid = grid != NODATA
    if valid.any():
        assert got_min == float(grid[valid].min())
    assert got_slope == golden.terrain_slope(grid, res, NODATA)


@pytest.mark.parametrize("sigma,res,nodata_frac", [(0.1, 1.0, 0.0), (0.3, 2.0, 0.0), (0.05, 1.0, 0.3), (0.2, 0.7, 0.1)])
def test_midrange_medians_bitexact(sigma, res, nodata_frac):
    rng = np.random.default_rng(int(sigma * 100) + int(res * 10))
    g = (100 + rng.normal(0, sigma, (301, 253))).astype(np.float32)
    if nodata_frac:
        g[rng.random(g.shape) < nodata_frac] = NODATA
    check(g, res)


def test_clamped_and_degenerate_cases():
    rng = np.random.default_rng(5)
    big = (100 + rng.normal(0, 3, (300, 257))).astype(np.float32)
    big[50:90, 40:80] += 14
    check(big, 1.0)  # clamps at 1.0
    check(np.full((123, 77), 5.0, dtype=np.float32), 1.0)  # flat → 0.01
    ramp = (np.mgrid[0:200, 0:200][1] * 1.0).astype(np.float32)
    check(ramp, 0.5)


def test_block_size_invariance():
    rng = np.random.default_rng(9)
    g = (50 + rng.normal(0, 0.15, (211, 97))).astype(np.float32)
    ref = chunked_min_and_slope(codecs.encode_raw_f32(g), 211, 97, 1.0, NODATA, block_rows=211)
    for br in (1, 2, 13, 64, 210):
        assert chunked_min_and_slope(codecs.encode_raw_f32(g), 211, 97, 1.0, NODATA, block_rows=br) == ref


def test_histogram_path_still_bitexact(monkeypatch):
    # the single-gather fast path now serves everything under
    # MAG_GATHER_LIMIT px; force the gigapixel histogram-selection path on a
    # small grid and pin it to golden too (it must stay correct — it is the
    # path that actually runs on rasters whose magnitudes don't fit)
    from dsm2dtm_spark.kernels import streamstats

    monkeypatch.setattr(streamstats, "MAG_GATHER_LIMIT", 0)
    rng = np.random.default_rng(17)
    for nodata_frac in (0.0, 0.25):
        g = (100 + rng.normal(0, 0.2, (211, 97))).astype(np.float32)
        if nodata_frac:
            g[rng.random(g.shape) < nodata_frac] = NODATA
        check(g, 1.0)


def test_fast_and_histogram_paths_agree(monkeypatch):
    from dsm2dtm_spark.kernels import streamstats

    rng = np.random.default_rng(23)
    g = (100 + rng.normal(0, 1.1, (256, 129))).astype(np.float32)
    g[rng.random(g.shape) < 0.15] = NODATA
    data = codecs.encode_raw_f32(g)
    fast = streamstats.chunked_min_and_slope(data, 256, 129, 1.0, NODATA)
    monkeypatch.setattr(streamstats, "MAG_GATHER_LIMIT", 0)
    hist = streamstats.chunked_min_and_slope(data, 256, 129, 1.0, NODATA)
    assert fast == hist


def test_fine_resolution_rejected():
    g = np.zeros((20, 20), dtype=np.float32)
    with pytest.raises(ValueError):
        chunked_min_and_slope(codecs.encode_raw_f32(g), 20, 20, 0.1, NODATA)
