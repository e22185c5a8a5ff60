"""spark-submit entry point for the DTM pipeline (reference CLI, core.py:254-317,
re-expressed as a cluster job — SURVEY.md R24).

    zip -qr engine.zip dsm2dtm_spark
    spark-submit --py-files engine.zip jobs/run_dtm.py \
        --input /path/to/images_table --output /path/to/dtm_table \
        --radius 40 [--slope 0.1] [--tile-px 1024] [--tiled] [--cores 32]

Input/output are Iceberg-style snapshot tables (sources.manifest). Rerunning
after an interruption resumes from the committed snapshot (anti-join) —
the distributed analog of the reference's --overwrite guard.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser(description="Generate DTMs from an image+caption table")
    ap.add_argument("--input", required=True, help="input snapshot-table root")
    ap.add_argument("--output", required=True, help="output snapshot-table root")
    ap.add_argument("--radius", type=float, default=40.0, help="max PMF window radius in meters (default 40)")
    ap.add_argument("--slope", type=float, default=None, help="terrain slope (0-1); auto-estimated when omitted")
    ap.add_argument("--init-threshold", type=float, default=0.1)
    ap.add_argument("--max-threshold", type=float, default=20.0)
    ap.add_argument("--tiled", action="store_true", help="use the tiled+halo plan (big rasters)")
    ap.add_argument(
        "--permissive",
        action="store_true",
        help="quarantine poison rows (null bytes + error column) instead of failing the job",
    )
    ap.add_argument("--tile-px", type=int, default=1024)
    ap.add_argument("--cores", type=int, default=None, help="local-mode core count (ignored under a cluster master)")
    args = ap.parse_args()

    from dsm2dtm_spark.session import get_spark
    from dsm2dtm_spark.sources import SnapshotTable

    spark = get_spark("dtm-job", cores=args.cores)
    inp = SnapshotTable(args.input)
    out = SnapshotTable(args.output)

    if args.tiled:
        from dsm2dtm_spark.operators.tiling import tiled_dtm_transform
        from dsm2dtm_spark.plans import resume_remaining

        src = inp.read(spark)
        try:
            done = out.read(spark)
        except ValueError:
            done = None
        todo = resume_remaining(src, done)
        n = todo.count()
        if n:
            out.write_dataframe(
                tiled_dtm_transform(
                    todo,
                    tile_px=args.tile_px,
                    radius_m=args.radius,
                    slope=args.slope,
                    init_threshold=args.init_threshold,
                    max_threshold=args.max_threshold,
                    permissive=args.permissive,
                ),
                summary={"rows": n, "op": "dtm-tiled"},
            )
        snap = out.current_snapshot()
    else:
        from dsm2dtm_spark.plans import run_dtm_job

        n, snap = run_dtm_job(
            spark,
            inp,
            out,
            radius_m=args.radius,
            slope=args.slope,
            init_threshold=args.init_threshold,
            max_threshold=args.max_threshold,
            permissive=args.permissive,
        )

    print(json.dumps({"processed": n, "snapshot": snap.snapshot_id if snap else None}))
    spark.stop()


if __name__ == "__main__":
    main()
