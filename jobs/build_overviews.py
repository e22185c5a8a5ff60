"""spark-submit entry point: build the overview pyramid of an image table
and commit it to a LEVEL-PARTITIONED snapshot table.

    zip -qr engine.zip dsm2dtm_spark
    spark-submit --py-files engine.zip jobs/build_overviews.py \
        --input /path/to/images_table --output /path/to/pyramid_table \
        [--levels 3] [--cores 8]

The pyramid plan is map-only (decode → emit every level's cells; no
shuffle); the sink partitions by ``level`` so LOD readers prune to one
directory (`table.read(spark).filter("level = 2")` reads one partition).
Rerunning after an interruption resumes: images whose pyramid rows are
already committed are anti-joined away, and the commit is atomic
(snapshot manifest), so a killed run never leaves half-visible output.
"""

from __future__ import annotations

import argparse
import json


def run_overview_job(spark, input_table: str, output_table: str, levels: int = 3) -> dict:
    """Build + commit the pyramid for every not-yet-done image; returns
    {"images": n_processed, "total_rows": committed pyramid rows}.

    Every processed image also commits one LEVEL-0 MARKER row
    (py = px = 0, n_src = levels built, value NULL): the resume anti-join
    keys off markers, so an all-nodata image (zero pyramid rows) is still
    marked done instead of being re-decoded on every rerun, and a rerun
    requesting a DIFFERENT --levels fails fast instead of silently leaving
    resumed images with fewer levels than appended ones. Readers take
    ``level >= 1`` for pyramid cells."""
    from dsm2dtm_spark.operators.terrain import (
        build_overviews,
        ensure_pyramid_levels,
        overview_markers,
    )
    from dsm2dtm_spark.plans import resume_remaining
    from dsm2dtm_spark.sources import SnapshotTable

    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    src = SnapshotTable(input_table).read(spark)
    out = SnapshotTable(output_table)
    ensure_pyramid_levels(out, spark, levels)
    try:
        done = out.read(spark).filter("level = 0")
    except ValueError:  # no commits yet
        done = None
    todo = resume_remaining(src, done)
    n = todo.count()
    if n:
        out.write_dataframe(
            build_overviews(todo, levels=levels).unionByName(overview_markers(todo, levels)),
            partition_by=["level"],
            summary={"images": n, "levels": levels},
        )
    try:
        # count comes from parquet footer stats — no pixel work
        total = out.read(spark).filter("level >= 1").count()
    except ValueError:  # nothing ever committed (empty input table)
        total = 0
    return {"images": n, "total_rows": total}


def main():
    ap = argparse.ArgumentParser(description="Build overview pyramids into a partitioned snapshot table")
    ap.add_argument("--input", required=True, help="input snapshot-table root")
    ap.add_argument("--output", required=True, help="output snapshot-table root (partitioned by level)")
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from dsm2dtm_spark.session import get_spark

    spark = get_spark("overview-job", cores=args.cores)
    res = run_overview_job(spark, args.input, args.output, levels=args.levels)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
