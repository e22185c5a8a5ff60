"""Headline benchmark (driver contract): DTM throughput + relational suite.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "dtm_tiles_per_sec": ...,
     "dtm_mpix_per_sec": ..., "cores": N, "runs": {name: [raw...]}}

The DTM phase is the north-star metric (tiles/sec, tile = 128 px core over
the processed image grid). The bench image table is deterministic and cached
under data/bench/ so rounds are comparable.

Every number is a MIN over repeated passes (5 for the dtm/tiled phases,
3 for each relational query), with the raw per-pass walls embedded under
"runs": this shared box suffers multi-10-second co-tenant stalls that
inflated single-shot records by 1.5-4x on zero code delta (VERDICT r5);
the min over interleaved passes measures engine capability, not host
steal. Passes are interleaved (whole suite per pass, min per query) so a
stall burst degrades at most one pass of each query, never all of them.
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


def _dtm_once(spark) -> tuple[float, object]:
    from pyspark.sql import functions as F

    from dsm2dtm_spark.plans import dtm_transform

    images = spark.read.parquet(BENCH_IMAGES)
    t0 = time.time()
    out = dtm_transform(images, radius_m=40.0)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.ceil(F.col("w") / TILE) * F.ceil(F.col("h") / TILE)).alias("tiles"),
        F.sum(F.col("w").cast("long") * F.col("h")).alias("pixels"),
    ).collect()[0]
    return time.time() - t0, agg


def _tiled_once(spark) -> tuple[float, object]:
    from pyspark.sql import functions as F

    from dsm2dtm_spark.operators.tiling import tiled_dtm_transform

    images = spark.read.parquet(BENCH_BIG_IMAGES)
    t0 = time.time()
    out = tiled_dtm_transform(images, tile_px=512, radius_m=15.0)
    agg = out.agg(
        F.count("*").alias("n"), F.sum(F.col("w").cast("long") * F.col("h")).alias("pixels")
    ).collect()[0]
    return time.time() - t0, agg


def run_dtm_phases(spark, n_passes: int = 5) -> tuple[dict, dict, dict]:
    """Both raster phases, ``n_passes`` interleaved (dtm, tiled) rounds;
    min wall per phase. Returns (dtm_stats, tiled_stats, raw_runs)."""
    from dsm2dtm_spark.operators.tiling import tiled_dtm_transform
    from dsm2dtm_spark.plans import dtm_transform

    images = spark.read.parquet(BENCH_IMAGES)
    big = spark.read.parquet(BENCH_BIG_IMAGES)
    # warmup: a few rows through each full plan spins up codegen + the
    # python worker pool so measured passes are engine throughput, not boot
    dtm_transform(images.limit(8), radius_m=40.0).count()
    tiled_dtm_transform(big.limit(1), tile_px=512, radius_m=15.0).count()
    runs: dict[str, list[float]] = {"dtm_pipeline": [], "tiled_pipeline": []}
    dtm_agg = tiled_agg = None
    for _ in range(n_passes):
        w, dtm_agg = _dtm_once(spark)
        runs["dtm_pipeline"].append(round(w, 2))
        w, tiled_agg = _tiled_once(spark)
        runs["tiled_pipeline"].append(round(w, 2))
    dtm_wall = min(runs["dtm_pipeline"])
    dtm = {
        "sec": dtm_wall,
        "images": dtm_agg.n,
        "tiles": int(dtm_agg.tiles),
        "tiles_per_sec": round(dtm_agg.tiles / dtm_wall, 2),
        "mpix_per_sec": round(dtm_agg.pixels / dtm_wall / 1e6, 3),
    }
    t_wall = min(runs["tiled_pipeline"])
    tiles = tiled_agg.n * (2048 // 512) ** 2
    tiled = {"sec": t_wall, "tiles": tiles, "tiles_per_sec": round(tiles / t_wall, 2),
             "mpix_per_sec": round(tiled_agg.pixels / t_wall / 1e6, 3)}
    return dtm, tiled, runs


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
    dtm, tiled, runs = run_dtm_phases(spark, n_passes=5)
    timings["dtm_pipeline"] = dtm["sec"]
    timings["tiled_pipeline"] = tiled["sec"]

    rel = relational_queries(sf_dir)
    for name in rel:
        runs[name] = []
    for _ in range(3):  # interleaved passes; min per query below
        for name, fn in rel.items():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.time() - t0, 2))
    for name in rel:
        timings[name] = min(runs[name])

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
                "runs": runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
