"""Headline benchmark (driver contract): DTM throughput + relational suite.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "dtm_tiles_per_sec": ...,
     "dtm_mpix_per_sec": ..., "cores": N}

The DTM phase is the north-star metric (tiles/sec, tile = 128 px core over
the processed image grid). The bench image table is deterministic and cached
under data/bench/ so rounds are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "bench")
BENCH_IMAGES = os.path.join(BENCH_DIR, "images.parquet")
BENCH_BIG_IMAGES = os.path.join(BENCH_DIR, "big_images.parquet")
TILE = 128


def ensure_bench_images() -> None:
    if os.path.exists(BENCH_IMAGES):
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dsm2dtm_spark import synth

    os.makedirs(BENCH_DIR, exist_ok=True)
    # ~12.5 Mpix total: 160 images across 128..384 px, every scenario/codec
    pdf = synth.image_table(n_rows=160, seed=1234, sizes=(128, 192, 256, 384), dup_fraction=0.02)
    # small row groups keep the single file splittable across input tasks
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), BENCH_IMAGES, row_group_size=4)
    # tiled-path phase: 4 big rasters (2048², res 2 m) that tile genuinely
    import numpy as np

    from dsm2dtm_spark import codecs

    rng = np.random.default_rng(4321)
    rows = []
    n = 2048
    for i in range(4):
        yy, xx = np.mgrid[0:n, 0:n]
        g = (100.0 + 0.02 * yy + 0.01 * xx + rng.normal(0, 0.2, (n, n))).astype(np.float32)
        for _ in range(6):
            y, x, s = rng.integers(0, n - 200), rng.integers(0, n - 200), int(rng.integers(40, 180))
            g[y : y + s, x : x + s] += float(rng.uniform(6, 18))
        rows.append(
            {
                "image_id": f"big_{i:02d}", "bytes": codecs.encode_raw_f32(g), "w": n, "h": n,
                "fmt": "raw_f32", "caption": f"bench big {i}", "phash": codecs.ahash64(g),
                "lon0": 2.0 + i * 0.5, "lat0": 36.0, "xres_m": 2.0, "yres_m": 2.0, "crs": 32631,
            }
        )
    import pandas as pd

    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False), BENCH_BIG_IMAGES, row_group_size=1)


def run_dtm_phase(spark) -> dict:
    from pyspark.sql import functions as F

    from dsm2dtm_spark.plans import dtm_transform

    images = spark.read.parquet(BENCH_IMAGES)
    # warmup: 8 rows through the full plan spins up codegen + the python
    # worker pool so the measured number is engine throughput, not JVM boot
    dtm_transform(images.limit(8), radius_m=40.0).count()
    t0 = time.time()
    out = dtm_transform(images, radius_m=40.0)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.ceil(F.col("w") / TILE) * F.ceil(F.col("h") / TILE)).alias("tiles"),
        F.sum(F.col("w").cast("long") * F.col("h")).alias("pixels"),
    ).collect()[0]
    wall = time.time() - t0
    return {
        "sec": round(wall, 2),
        "images": agg.n,
        "tiles": int(agg.tiles),
        "tiles_per_sec": round(agg.tiles / wall, 2),
        "mpix_per_sec": round(agg.pixels / wall / 1e6, 3),
    }


def run_tiled_phase(spark) -> dict:
    from pyspark.sql import functions as F

    from dsm2dtm_spark.operators.tiling import tiled_dtm_transform

    images = spark.read.parquet(BENCH_BIG_IMAGES)
    tiled_dtm_transform(images.limit(1), tile_px=512, radius_m=15.0).count()  # warmup
    t0 = time.time()
    out = tiled_dtm_transform(images, tile_px=512, radius_m=15.0)
    agg = out.agg(
        F.count("*").alias("n"), F.sum(F.col("w").cast("long") * F.col("h")).alias("pixels")
    ).collect()[0]
    wall = time.time() - t0
    tiles = agg.n * (2048 // 512) ** 2
    return {"sec": round(wall, 2), "tiles": tiles, "tiles_per_sec": round(tiles / wall, 2),
            "mpix_per_sec": round(agg.pixels / wall / 1e6, 3)}


def relational_queries(sf_dir: str):
    """Headline subset of the contract queries (fast, scale-sensitive)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    names = [
        "q1_pricing_summary",
        "q3_top_revenue_orders",
        "q5_nation_volume",
        "window_top3_orders_per_customer",
        "cell_encode_events",
        "events_user_rank_by_type",
        "docs_token_stats",
        "docs_exact_dedup",
        "docs_jaccard_consecutive",
        "emb_topk_cosine",
        "img_tile_assignments",
        "img_knn_anchors",
        "docs_incremental_dedup",
        "docs_decontam",
        "docs_global_shuffle",
    ]
    return {n: qs[n] for n in names}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ensure_bench_images()

    from dsm2dtm_spark.session import get_spark

    spark = get_spark("bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    dtm = run_dtm_phase(spark)
    timings["dtm_pipeline"] = dtm["sec"]
    tiled = run_tiled_phase(spark)
    timings["tiled_pipeline"] = tiled["sec"]

    for name, fn in relational_queries(sf_dir).items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 2)

    total = round(sum(timings.values()), 2)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "dtm+relational bench wall time (headline: dtm_tiles_per_sec)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else sf_dir,
                "cores": cores,
                "dtm_images": dtm["images"],
                "dtm_tiles": dtm["tiles"],
                "dtm_tiles_per_sec": dtm["tiles_per_sec"],
                "dtm_mpix_per_sec": dtm["mpix_per_sec"],
                "tiled_tiles_per_sec": tiled["tiles_per_sec"],
                "tiled_mpix_per_sec": tiled["mpix_per_sec"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
