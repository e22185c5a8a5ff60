"""spark-submit job: table + dedup-store MAINTENANCE — the periodic
compaction/expiry pass every long-lived ingest loop needs.

A year of daily `ingest_snapshot` batches leaves each snapshot table with
hundreds of small files (every commit appends a few) and as many snapshot
manifests; scan time degrades into footer-listing, and the dedup store's
bucketed SMJ loses its sorted-within-bucket fast path. This job folds all
of it in one sequential pass:

    zip -qr engine.zip dsm2dtm_spark
    spark-submit --py-files engine.zip jobs/maintain_tables.py \
        [--table /path/to/snapshot_table]... [--sort-by cell_id] \
        [--store /path/to/sigstore [--bucketed-store] \
         [--repair-corpus /path/to/corpus_table] \
         [--store-n-buckets 64] [--store-max-files-per-bucket 1]] \
        [--ann-store /path/to/annindex]... \
        [--small-file-mb 32] [--target-file-mb 128] \
        [--expire-keep-last 3] [--cores 32]

- each `--table` (repeatable): `SnapshotTable.compact` (small files fold
  into ~target-sized ones as ONE atomic snapshot; `--sort-by` range-
  clusters rows during the rewrite so the new parquet footers' min/max
  make `read(where=...)` file skipping sharp), then
  `expire_snapshots(keep_last)` — old manifests drop and unreferenced
  data files (crashed-write orphans included) are deleted;
- `--store`: the matching store class's `compact()` — the plain store
  folds its three sub-tables (bands clustered by bucket for sharp footer
  min/max) and rolls up the hot-bucket census; the bucketed store
  INCREMENTALLY folds only buckets whose per-append file pileup exceeds
  `--store-max-files-per-bucket` into the next versioned location
  (cold buckets hard-link across, unread and unwritten — restoring the
  exchange-free SMJ's sort-free read at cost proportional to recent
  appends, not the table), swaps the catalog entry + manifest pointer,
  and sweeps old/orphan version directories; `--store-n-buckets N`
  re-buckets BOTH sub-tables into a new bucket count (a deliberate full
  rewrite — how a store bootstrapped small evolves its read parallelism
  as it grows, instead of being rebuilt). Store layout is auto-guarded: opening with the
  wrong flag fails fast rather than touching anything. `--repair-corpus`
  additionally runs the store self-heal against that corpus table BEFORE
  compacting (footer watermarks; re-signs/re-bands only what a crashed
  ingest actually lost) using the signature parameters the store itself
  recorded — useful after restoring a store from backup, when the next
  scheduled ingest is far away.
- each `--ann-store` (repeatable): `AnnIndexStore.compact()` — per-append
  posting files fold within their inverted-list partition directories
  (layout and pruning untouched), then old snapshots expire.

Safe to run between ingests (single-writer discipline, same as the ingest
job itself); every compaction is an atomic commit, so a crash mid-pass
leaves every table readable at its previous snapshot. Emits one JSON line
of per-target counts for the operator's logs.
"""

from __future__ import annotations

import argparse
import json


def run_maintenance(
    spark,
    tables: list[str],
    store_root: str | None = None,
    bucketed: bool = False,
    small_file_mb: int = 32,
    target_file_mb: int = 128,
    expire_keep_last: int = 3,
    sort_by: str | None = None,
    repair_corpus: str | None = None,
    store_n_buckets: int | None = None,
    store_max_files_per_bucket: int = 1,
    ann_stores: list[str] | None = None,
) -> dict:
    """Compact each snapshot table (then expire old snapshots) and the
    dedup store, sequentially. Returns the per-target count report the CLI
    prints. ``expire_keep_last=0`` disables expiry — keep > 1 normally so
    readers pinned to the pre-compaction snapshot keep working."""
    from dsm2dtm_spark.operators.incremental import BucketedSignatureStore, SignatureStore
    from dsm2dtm_spark.sources import SnapshotTable

    report: dict = {"tables": {}, "store": None}
    for root in tables:
        t = SnapshotTable(root)
        snap = t.compact(
            spark,
            small_file_bytes=small_file_mb << 20,
            target_file_bytes=target_file_mb << 20,
            sort_by=[sort_by] if sort_by else None,
        )
        expired = t.expire_snapshots(expire_keep_last) if expire_keep_last else []
        report["tables"][root] = {
            "compacted": (snap.summary.get("compacted", 0) if snap else 0),
            "expired_files": len(expired),
        }
    if store_root:
        store_cls = BucketedSignatureStore if bucketed else SignatureStore
        store = store_cls(store_root)
        if repair_corpus:
            from dsm2dtm_spark.operators.incremental import repair_store

            sp = store.params()
            report["repaired"] = repair_store(
                spark,
                SnapshotTable(repair_corpus),
                store,
                n_hashes=sp.get("n_hashes", 16),
                bands=sp.get("bands", 4),
                method=sp.get("method", "xxhash64"),
            )
        kwargs = (
            {
                "n_buckets": store_n_buckets,
                "max_files_per_bucket": store_max_files_per_bucket,
            }
            if bucketed
            else {
                "small_file_bytes": small_file_mb << 20,
                "target_file_bytes": target_file_mb << 20,
            }
        )
        report["store"] = store.compact(spark, **kwargs)
    if ann_stores:
        from dsm2dtm_spark.operators.annstore import AnnIndexStore

        report["ann_stores"] = {}
        for root in ann_stores:
            ann = AnnIndexStore(root)
            if not ann.exists():
                # mistyped path: a maintenance pass must be a no-op, same
                # contract as the dedup stores
                report["ann_stores"][root] = {"postings": 0}
                continue
            r = ann.compact(
                spark,
                small_file_bytes=small_file_mb << 20,
                target_file_bytes=target_file_mb << 20,
            )
            if expire_keep_last:
                r["expired"] = ann.expire(expire_keep_last)
            report["ann_stores"][root] = r
    return report


def main():
    ap = argparse.ArgumentParser(description="Compact + expire snapshot tables and dedup stores")
    ap.add_argument(
        "--table", action="append", default=[], help="snapshot-table root (repeatable)"
    )
    ap.add_argument("--store", default=None, help="SignatureStore root")
    ap.add_argument(
        "--bucketed-store",
        action="store_true",
        help="the --store root holds a BucketedSignatureStore layout",
    )
    ap.add_argument(
        "--repair-corpus",
        default=None,
        help="corpus snapshot-table root: run the store self-heal against it before compacting",
    )
    ap.add_argument(
        "--store-n-buckets",
        type=int,
        default=None,
        help="bucketed store only: re-bucket BOTH sub-tables into this bucket "
        "count (full rewrite; manifest records it for every later session)",
    )
    ap.add_argument(
        "--store-max-files-per-bucket",
        type=int,
        default=1,
        help="bucketed store only: rewrite only buckets holding more files "
        "than this (cold buckets are hard-linked, not rewritten)",
    )
    ap.add_argument(
        "--ann-store",
        action="append",
        default=[],
        help="AnnIndexStore root (repeatable): fold per-append posting-file "
        "pileup per inverted-list directory and expire old snapshots",
    )
    ap.add_argument(
        "--sort-by", default=None, help="range-cluster table rows by this column during compaction"
    )
    ap.add_argument("--small-file-mb", type=int, default=32)
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument(
        "--expire-keep-last",
        type=int,
        default=3,
        help="snapshots to keep per table after compaction (0 disables expiry)",
    )
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    if not args.table and not args.store and not args.ann_store:
        ap.error("nothing to do: pass --table, --store and/or --ann-store")

    from dsm2dtm_spark.session import get_spark

    spark = get_spark("maintain-tables", cores=args.cores)
    report = run_maintenance(
        spark,
        args.table,
        store_root=args.store,
        bucketed=args.bucketed_store,
        small_file_mb=args.small_file_mb,
        target_file_mb=args.target_file_mb,
        expire_keep_last=args.expire_keep_last,
        sort_by=args.sort_by,
        repair_corpus=args.repair_corpus,
        store_n_buckets=args.store_n_buckets,
        store_max_files_per_bucket=args.store_max_files_per_bucket,
        ann_stores=args.ann_store,
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
