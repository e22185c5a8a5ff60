"""Skew A/B: measure the tiled pipeline's wall time on a hot-cell dataset
with the shuffle keyed by cell_id alone vs (cell_id, salt). Quantifies E13
beyond the partition-count test — results → BENCH/skew_ab.json.

Dataset: 48 images of 256², 90% anchored in one cell neighborhood (the
FIXTURES hot-cell tier) → unsalted, nearly every tile lands in one shuffle
partition and one core does all the PMF work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import pandas as pd

    from dsm2dtm_spark import codecs, synth
    from dsm2dtm_spark.operators import tiling
    from dsm2dtm_spark.session import get_spark

    spark = get_spark("skew-ab", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    rng = np.random.default_rng(2468)
    rows = []
    n = 256
    for i in range(48):
        yy, xx = np.mgrid[0:n, 0:n]
        g = (100.0 + 0.02 * yy + rng.normal(0, 0.2, (n, n))).astype(np.float32)
        g[60:120, 60:140] += 12.0
        hot = rng.random() < 0.9
        rows.append(
            {
                "image_id": f"sk_{i:03d}", "bytes": codecs.encode_raw_f32(g), "w": n, "h": n,
                "fmt": "raw_f32", "caption": "skew", "phash": i,
                "lon0": 2.0 + (rng.uniform(0, 0.0005) if hot else rng.uniform(-3, 3)),
                "lat0": 36.0 + (rng.uniform(0, 0.0005) if hot else rng.uniform(-3, 3)),
                "xres_m": 2.0, "yres_m": 2.0, "crs": 32631,
            }
        )
    sdf = spark.createDataFrame(pd.DataFrame(rows)).repartition(32).cache()
    sdf.count()
    stats = tiling.image_stats(sdf, 15.0, 0.1).cache()
    stats.count()
    tiles = tiling.emit_tiles(sdf.join(stats.select("image_id", "halo_px"), on="image_id"), tile_px=64).cache()
    n_tiles = tiles.count()

    def run(salted: bool) -> float:
        t0 = time.time()
        tiling.process_tiles(tiles, stats, salted=salted).count()
        return time.time() - t0

    run(True)  # warmup
    salted = min(run(True) for _ in range(2))
    unsalted = min(run(False) for _ in range(2))
    result = {
        "n_tiles": n_tiles,
        "hot_fraction": 0.9,
        "unsalted_sec": round(unsalted, 2),
        "salted_sec": round(salted, 2),
        "speedup": round(unsalted / salted, 2),
    }
    print(json.dumps(result))
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "skew_ab.json"), "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
