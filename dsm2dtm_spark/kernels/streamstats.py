"""Bounded-memory exact per-image statistics for the tiled plan's pass 1.

The tiled pipeline needs two whole-image scalars before any tile can be
processed (SURVEY.md §7.2 item 3): the global valid minimum and the exact
median terrain slope. The straightforward pass-1 decodes the full image in
one task (memory ∝ pixels). This module computes BOTH exactly from row-block
chunks of a raw_f32 payload, so pass-1 memory is O(block + in-bucket values):

- valid min: running minimum over blocks;
- exact median slope: two-pass selection — pass A histograms the gradient
  magnitudes (blocks carry a one-row halo; np.gradient's central differences
  need only that) and locates the bucket(s) holding the middle order
  statistics; pass B re-streams and keeps only values assigned to those
  buckets, then selects exactly.

Matches ``golden.terrain_slope`` exactly on the standard path (res ≥ 0.5 m,
no decimation — the tiled plan's domain; float32 arithmetic mirrored
operation-for-operation). The same two-pass scheme lifts unchanged to Spark
aggregations (per-tile histograms → merge → targeted gather) when even one
row-block per task is too big.
"""

from __future__ import annotations

import numpy as np

from dsm2dtm_spark.params import PMF_BASE_SLOPE


def _block_mags(arr: np.ndarray, h: int, w: int, res: float, nodata: float, block_rows: int):
    """Yield, per row-block [y0, y1), the float32 gradient magnitudes /res of
    exactly those rows (computed with a one-row halo so central differences
    match the whole-image np.gradient) and the block's valid mask."""
    for y0 in range(0, h, block_rows):
        y1 = min(h, y0 + block_rows)
        lo = max(0, y0 - 1)
        hi = min(h, y1 + 1)
        blk = arr[lo * w : hi * w].reshape(hi - lo, w)
        as_nan = blk.copy()
        as_nan[as_nan == nodata] = np.nan
        dy, dx = np.gradient(as_nan)
        mag = np.sqrt(dy**2 + dx**2) / res  # float32, same ops as golden
        sl = slice(y0 - lo, y0 - lo + (y1 - y0))
        yield mag[sl], blk[sl] != nodata


def chunked_min_and_slope(
    buf: bytes,
    h: int,
    w: int,
    res: float,
    nodata: float,
    block_rows: int = 256,
    n_buckets: int = 4096,
) -> tuple[float, float]:
    """(valid_min, median_slope) from a raw_f32 payload without materializing
    the full image. Exactly equals (min over valid, golden.terrain_slope) for
    res ≥ 0.5."""
    if res < 0.5:
        raise ValueError("chunked stats cover the standard path only (res ≥ 0.5 m)")
    arr = np.frombuffer(buf, dtype="<f4", count=h * w)  # zero-copy view

    # ---- pass 0: valid min, finite-magnitude count and max
    vmin = np.inf
    mag_max = np.float32(0.0)
    n_valid = 0
    n_finite = 0
    for y0 in range(0, h, block_rows):
        y1 = min(h, y0 + block_rows)
        sel = arr[y0 * w : y1 * w]
        valid = sel != nodata
        n_valid += int(valid.sum())
        if valid.any():
            vmin = min(vmin, float(sel[valid].min()))
    if n_valid == 0 or h < 2 or w < 2:
        return (float(vmin) if np.isfinite(vmin) else float("nan"), PMF_BASE_SLOPE)
    for mag, valid in _block_mags(arr, h, w, res, nodata, block_rows):
        finite = mag[valid]
        finite = finite[~np.isnan(finite)]
        n_finite += finite.size
        if finite.size:
            mag_max = max(mag_max, finite.max())
    if n_finite == 0:
        return float(vmin), PMF_BASE_SLOPE

    want = [n_finite // 2] if n_finite % 2 else [n_finite // 2 - 1, n_finite // 2]

    # ---- pass A: bucket counts (bucket = searchsorted(right)-1, clipped)
    edges = np.linspace(0.0, float(mag_max), n_buckets + 1)

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(np.searchsorted(edges, v, side="right") - 1, 0, n_buckets - 1)

    counts = np.zeros(n_buckets, dtype=np.int64)
    for mag, valid in _block_mags(arr, h, w, res, nodata, block_rows):
        finite = mag[valid]
        finite = finite[~np.isnan(finite)]
        if finite.size:
            counts += np.bincount(bucket_of(finite), minlength=n_buckets)
    cum = np.cumsum(counts)
    need = sorted({int(np.searchsorted(cum, k + 1)) for k in want})

    # ---- pass B: gather exactly the in-bucket values, select exactly
    keep = []
    for mag, valid in _block_mags(arr, h, w, res, nodata, block_rows):
        finite = mag[valid]
        finite = finite[~np.isnan(finite)]
        if finite.size:
            b = bucket_of(finite)
            keep.append(finite[np.isin(b, need)])
    pool = np.sort(np.concatenate(keep))
    rank_before = int(cum[need[0] - 1]) if need[0] > 0 else 0
    # bucket `need` may be non-contiguous (two medians in different buckets):
    # map global ranks onto the pooled values bucket-by-bucket
    by_bucket = pool_by_bucket(pool, bucket_of, need, counts)
    picks = []
    for k in want:
        b = int(np.searchsorted(cum, k + 1))
        rank_in_bucket = k - (int(cum[b - 1]) if b > 0 else 0)
        picks.append(by_bucket[b][rank_in_bucket])
    med = picks[0] if len(picks) == 1 else np.float32((np.float32(picks[0]) + np.float32(picks[1])) / np.float32(2))
    return float(vmin), float(max(0.01, min(float(med), 1.0)))


def pool_by_bucket(pool: np.ndarray, bucket_of, need: list[int], counts: np.ndarray) -> dict:
    """Split the sorted pooled values back into their (sorted) buckets."""
    out = {}
    b_of_pool = bucket_of(pool)
    for b in need:
        out[b] = pool[b_of_pool == b]
    return out
