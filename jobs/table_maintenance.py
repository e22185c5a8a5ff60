"""spark-submit entry point for snapshot-table maintenance (the warehouse
housekeeping a long-lived 100 TB table needs on a schedule):

    spark-submit --py-files engine.zip jobs/table_maintenance.py \
        --table /path/to/table [--compact] [--sort-by cell_id] \
        [--expire-keep 3] [--small-file-mb 32] [--target-file-mb 128]

--compact folds small data files into target-sized ones as one atomic
snapshot (optionally range-clustering rows by --sort-by so the new parquet
footers' min/max make read(where=...) file skipping sharp); --expire-keep N
drops all but the newest N snapshot manifests and deletes data files no
surviving snapshot references (crashed-write orphans included). Both print a
one-line JSON report.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser(description="Snapshot-table compaction / snapshot expiry")
    ap.add_argument("--table", required=True, help="snapshot-table root")
    ap.add_argument("--compact", action="store_true", help="fold small files into target-sized ones")
    ap.add_argument("--sort-by", default=None, help="range-cluster rows by this column during compaction")
    ap.add_argument("--expire-keep", type=int, default=None, help="keep only the newest N snapshots")
    ap.add_argument("--small-file-mb", type=int, default=32)
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from dsm2dtm_spark.session import get_spark
    from dsm2dtm_spark.sources import SnapshotTable

    t = SnapshotTable(args.table)
    report: dict = {"table": args.table}

    if args.compact:
        spark = get_spark("table-maintenance", cores=args.cores)
        snap = t.compact(
            spark,
            small_file_bytes=args.small_file_mb << 20,
            target_file_bytes=args.target_file_mb << 20,
            sort_by=[args.sort_by] if args.sort_by else None,
        )
        report["compacted"] = snap.summary if snap else None
        spark.stop()

    if args.expire_keep is not None:
        deleted = t.expire_snapshots(keep_last=args.expire_keep)
        report["expired_files"] = len(deleted)

    cur = t.current_snapshot()
    report["current_snapshot"] = cur.snapshot_id if cur else None
    report["live_files"] = len(cur.files) if cur else 0
    print(json.dumps(report))


if __name__ == "__main__":
    main()
