"""Deterministic synthetic data generators (FIXTURES.md).

Builds the image+caption table (BASELINE.json input_hint schema + synthetic
geo anchors), the vector footprints table, and the kNN query-point table —
all seeded, no external data. Scene scenarios reproduce the reference's own
test classes (reference tests/test_core.py:12-39, tests/test_stress.py:10-36,
tests/test_parity.py:39-49).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from dsm2dtm_spark import codecs
from dsm2dtm_spark.params import NODATA_DEFAULT

SCENARIOS = (
    "flat_building",
    "ramp_noise_blocks",
    "vegetation",
    "cliff",
    "perfectly_flat",
    "nodata_stripes",
    "nodata_random60",
    "nodata_checker",
    "spike_pit",
    "sparse_ground",
    "highres_1cm",
    "aniso_pixels",
)

# default geo anchor: UTM-like zone 31N origin (reference tests/test_core.py:25)
_ANCHOR_LON, _ANCHOR_LAT = 2.0, 36.0


def make_scene(scenario: str, rng: np.random.Generator, size: int) -> tuple[np.ndarray, float, float]:
    """Return (grid float32, xres_m, yres_m) for one scenario instance."""
    n = size
    base = np.full((n, n), 100.0, dtype=np.float32)
    xres = yres = 1.0
    if scenario == "flat_building":
        g = base.copy()
        s = max(4, n // 5)
        g[n // 3 : n // 3 + s, n // 3 : n // 3 + s] += 20.0
        g[n // 10, n // 10] += 15.0
        g[(3 * n) // 4, n // 6] += 15.0
    elif scenario == "ramp_noise_blocks":
        yy, xx = np.mgrid[0:n, 0:n]
        g = (100.0 + 0.05 * yy + 0.03 * xx + rng.normal(0, 0.2, (n, n))).astype(np.float32)
        for frac, dh in ((0.15, 18.0), (0.5, 12.0), (0.75, 8.0)):
            o = int(n * frac)
            s = max(3, n // 8)
            g[o : o + s, o : o + s] += dh
    elif scenario == "vegetation":
        g = base.copy()
        dens = float(rng.uniform(0.1, 0.5))
        k = int(n * n * dens)
        idx = rng.choice(n * n, k, replace=False)
        g.ravel()[idx] += rng.uniform(2.0, 15.0, k).astype(np.float32)
    elif scenario == "cliff":
        g = base.copy()
        g[:, n // 2 :] = 150.0
    elif scenario == "perfectly_flat":
        g = np.zeros((n, n), dtype=np.float32)
    elif scenario == "nodata_stripes":
        yy, xx = np.mgrid[0:n, 0:n]
        g = (100.0 + 0.05 * yy + 0.03 * xx + rng.normal(0, 0.2, (n, n))).astype(np.float32)
        g[n // 4, :] = NODATA_DEFAULT
        g[:, n // 3] = NODATA_DEFAULT
    elif scenario == "nodata_random60":
        g = base.copy()
        idx = rng.choice(n * n, int(n * n * 0.6), replace=False)
        g.ravel()[idx] = NODATA_DEFAULT
    elif scenario == "nodata_checker":
        g = base.copy()
        checker = np.indices((n, n)).sum(axis=0) % 2
        g[checker == 1] = NODATA_DEFAULT
    elif scenario == "spike_pit":
        g = base.copy()
        g[n // 2, n // 2] = 10000.0
        g[n // 5, n // 5] = 0.0
    elif scenario == "sparse_ground":
        g = np.full((n, n), 120.0, dtype=np.float32)
        idx = rng.choice(n * n, int(n * n * 0.05), replace=False)
        g.ravel()[idx] = 100.0
    elif scenario == "highres_1cm":
        g = base.copy()
        s = max(10, n // 5)
        g[n // 3 : n // 3 + s, n // 3 : n // 3 + s] += 5.0
        xres = yres = 0.01
    elif scenario == "aniso_pixels":
        g = base.copy()
        xres, yres = 0.5, 2.0
    else:
        raise ValueError(f"unknown scenario {scenario!r}")
    return g, xres, yres


def image_table(
    n_rows: int,
    seed: int = 42,
    sizes: tuple[int, ...] = (50, 80, 120),
    fmts: tuple[str, ...] = codecs.FORMATS,
    dup_fraction: float = 0.01,
    hot_cell_fraction: float = 0.0,
) -> pd.DataFrame:
    """Deterministic image+caption table as a pandas DataFrame.

    Columns per input_hint — (image_id, bytes, w, h, fmt, caption, phash) —
    plus geo anchors (lon0, lat0, xres_m, yres_m, crs) so cell indexing and
    spatial joins are meaningful. ``hot_cell_fraction`` anchors that share of
    rows in one small neighborhood to manufacture cell-id skew (FIXTURES.md).
    """
    rng = np.random.default_rng(seed)
    rows = []
    originals: list[dict] = []
    for i in range(n_rows):
        dup_pool = originals if originals and rng.random() < dup_fraction else None
        if dup_pool is not None:
            src = dup_pool[int(rng.integers(len(dup_pool)))]
            row = dict(src)
            row["image_id"] = f"img_{i:06d}_{row['scenario']}_dup"
            rows.append(row)
            continue
        scenario = SCENARIOS[int(rng.integers(len(SCENARIOS)))]
        size = int(sizes[int(rng.integers(len(sizes)))])
        fmt = fmts[int(rng.integers(len(fmts)))]
        grid, xres, yres = make_scene(scenario, rng, size)
        if fmt == "png16":  # snap so the stored truth is exactly representable
            grid = codecs.snap(grid, fmt)
        data = codecs.encode(grid, fmt)
        decoded = codecs.decode(data, size, size, fmt)
        if hot_cell_fraction and rng.random() < hot_cell_fraction:
            lon = _ANCHOR_LON + float(rng.uniform(0, 0.001))
            lat = _ANCHOR_LAT + float(rng.uniform(0, 0.001))
        else:
            lon = _ANCHOR_LON + float(rng.uniform(-2.0, 2.0))
            lat = _ANCHOR_LAT + float(rng.uniform(-2.0, 2.0))
        nod = float(np.mean(decoded == NODATA_DEFAULT) * 100)
        row = {
            "image_id": f"img_{i:06d}_{scenario}",
            "bytes": data,
            "w": size,
            "h": size,
            "fmt": fmt,
            "caption": f"{scenario} res={xres}m nodata={nod:.1f}%",
            "phash": codecs.ahash64(decoded),
            "lon0": lon,
            "lat0": lat,
            "xres_m": xres,
            "yres_m": yres,
            "crs": 32631,
            "scenario": scenario,
        }
        rows.append(row)
        originals.append(row)
    df = pd.DataFrame(rows)
    return df.astype({"w": "int32", "h": "int32", "phash": "int64", "crs": "int32"})


def footprint_table(n_rows: int, seed: int = 43) -> pd.DataFrame:
    """Seeded polygons (rectangles + convex hulls of 5-9 random points) near
    the image anchor extent. Rectangles carry (x0, y0, x1, y1) so the exact
    point-in-polygon refinement has a pure-SQL oracle (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        cx = _ANCHOR_LON + float(rng.uniform(-2.0, 2.0))
        cy = _ANCHOR_LAT + float(rng.uniform(-2.0, 2.0))
        if rng.random() < 0.6:  # rectangle
            hw = float(rng.uniform(0.02, 0.5))
            hh = float(rng.uniform(0.02, 0.5))
            xs = [cx - hw, cx + hw, cx + hw, cx - hw]
            ys = [cy - hh, cy - hh, cy + hh, cy + hh]
            kind = "rect"
        else:  # convex hull of random points
            k = int(rng.integers(5, 10))
            px = cx + rng.uniform(-0.2, 0.2, k)
            py = cy + rng.uniform(-0.2, 0.2, k)
            hull = _convex_hull(list(zip(px.tolist(), py.tolist())))
            xs = [p[0] for p in hull]
            ys = [p[1] for p in hull]
            kind = "hull"
        rows.append(
            {
                "footprint_id": f"fp_{i:05d}",
                "xs": xs,
                "ys": ys,
                "x0": min(xs),
                "y0": min(ys),
                "x1": max(xs),
                "y1": max(ys),
                "kind": kind,
                "tag": f"tag_{int(rng.integers(5))}",
            }
        )
    return pd.DataFrame(rows)


def knn_query_table(n_rows: int, seed: int = 44, k: int = 4) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "query_id": [f"q_{i:05d}" for i in range(n_rows)],
            "x": _ANCHOR_LON + rng.uniform(-2.2, 2.2, n_rows),
            "y": _ANCHOR_LAT + rng.uniform(-2.2, 2.2, n_rows),
            "k": np.full(n_rows, k, dtype=np.int32),
        }
    )


def _smooth_terrain(rng: np.random.Generator, n: int, coarse: int, amplitude: float) -> np.ndarray:
    """Low-frequency terrain: a coarse seeded random grid bilinearly upsampled
    to n×n (kernels.zoom — smooth by construction, no libm dependence)."""
    from dsm2dtm_spark.kernels.zoom import zoom_bilinear

    base = rng.normal(0, amplitude, (coarse, coarse)).astype(np.float32)
    return zoom_bilinear(base, n / coarse)[:n, :n]


TRUTH_SCENARIOS = ("urban_1m", "river_50cm", "vegetation_50cm")


def make_truth_scene(scenario: str, seed: int = 31) -> tuple[np.ndarray, np.ndarray, float]:
    """(true_terrain, dsm, res_m) pairs with a KNOWN ground truth — synthetic
    stand-ins for the reference's three pooch-downloaded accuracy fixtures
    (reference tests/test_integration.py:22-31: RMSE < 5.0 m urban @1 m,
    < 2.0 m river @50 cm, < 8.5 m vegetation @50 cm; unreachable offline,
    tests/conftest.py:7-9). DSM = truth + above-ground objects; the DTM
    accuracy test asserts RMSE(dsm_to_dtm(dsm), truth) under the SAME bounds.
    """
    rng = np.random.default_rng(seed + hash(scenario) % 1000)
    if scenario == "urban_1m":
        n, res = 300, 1.0
        truth = 100.0 + _smooth_terrain(rng, n, 6, 2.5)
        dsm = truth.copy()
        for _ in range(24):  # city blocks: 10-40 m footprints, 6-25 m tall
            s = int(rng.integers(10, 40))
            y, x = int(rng.integers(0, n - s)), int(rng.integers(0, n - s))
            dsm[y : y + s, x : x + s] = truth[y : y + s, x : x + s].max() + float(rng.uniform(6, 25))
    elif scenario == "river_50cm":
        n, res = 400, 0.5
        truth = 50.0 + _smooth_terrain(rng, n, 5, 1.5)
        xx = np.arange(n, dtype=np.float32)
        channel = 3.0 * np.exp(-((xx - n / 2) ** 2) / (2 * (n / 10) ** 2))  # valley
        truth = truth - channel[None, :]
        dsm = truth.copy()
        bank_veg = rng.random((n, n)) < 0.06  # sparse riparian vegetation
        dsm[bank_veg] += rng.uniform(1.0, 4.0, int(bank_veg.sum())).astype(np.float32)
    elif scenario == "vegetation_50cm":
        n, res = 400, 0.5
        truth = 200.0 + _smooth_terrain(rng, n, 6, 3.0)
        dsm = truth.copy()
        canopy = _smooth_terrain(rng, n, 12, 1.0) > 0.3  # clumped canopy mask
        dsm[canopy] += rng.uniform(5.0, 20.0, int(canopy.sum())).astype(np.float32)
    else:
        raise ValueError(f"unknown truth scenario {scenario!r}; known: {TRUTH_SCENARIOS}")
    return truth.astype(np.float32), dsm.astype(np.float32), res


def embedding_table(
    n_rows: int,
    dim: int = 64,
    n_clusters: int = 20,
    noise: float = 0.15,
    dup_fraction: float = 0.05,
    dup_noise: float = 0.01,
    seed: int = 77,
) -> pd.DataFrame:
    """Clustered unit-norm embeddings with planted near-duplicates — the
    fixture ANN recall must be measured on (a near-uniform corpus defeats
    every locality hash by construction; real embedding corpora are
    clustered). Each row is a cluster direction + gaussian noise,
    re-normalized; ``dup_fraction`` of rows additionally copy an earlier row
    with tiny ``dup_noise`` (cosine ≈ 0.999+) so near-dup dedup has real
    work. Columns: vec_id:int64, embedding:array<float>, cluster:int32,
    dup_of:int64 (−1 when original)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.empty((n_rows, dim), dtype=np.float64)
    cluster = np.empty(n_rows, dtype=np.int32)
    dup_of = np.full(n_rows, -1, dtype=np.int64)
    for i in range(n_rows):
        if i > 0 and rng.random() < dup_fraction:
            j = int(rng.integers(i))
            v = vecs[j] + rng.normal(0, dup_noise, dim)
            cluster[i] = cluster[j]
            dup_of[i] = j
        else:
            c = int(rng.integers(n_clusters))
            v = centers[c] + rng.normal(0, noise, dim)
            cluster[i] = c
        vecs[i] = v / np.linalg.norm(v)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n_rows, dtype=np.int64),
            "embedding": [v.astype(np.float32).tolist() for v in vecs],
            "cluster": cluster,
            "dup_of": dup_of,
        }
    )


def _convex_hull(points: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """Andrew's monotone chain, CCW output."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]
