"""Iceberg-style snapshot-manifest table layout on parquet.

No Iceberg runtime jar ships with the sandbox's PySpark and there is no
network (SURVEY.md §1.3), so the engine implements the part of the Iceberg
model it needs — an append-only table whose committed state is a JSON snapshot
listing immutable parquet data files — and reads/writes it through plain
``spark.read.parquet``. Swapping in real Iceberg is a config change.

Layout:
    <root>/data/<uuid>.parquet      immutable data files
    <root>/meta/snapshot-<n>.json   {"snapshot_id", "parent_id", "files",
                                     "operation", "summary"}
    <root>/meta/CURRENT             text pointer to the current snapshot file

Commit protocol: write the new snapshot JSON to a temp name, ``os.replace``
it into place, then ``os.replace`` the CURRENT pointer — atomic on POSIX, so
readers always see a complete snapshot (exactly-once resume depends on this;
SURVEY.md §7.2 item 5).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    operation: str
    files: list[str]  # data-file names relative to <root>/data/
    summary: dict


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.meta_dir = os.path.join(root, "meta")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

    # ------------------------------------------------------------- snapshots

    def _current_path(self) -> str:
        return os.path.join(self.meta_dir, "CURRENT")

    def current_snapshot(self) -> Snapshot | None:
        try:
            with open(self._current_path()) as f:
                name = f.read().strip()
        except FileNotFoundError:
            return None
        with open(os.path.join(self.meta_dir, name)) as f:
            d = json.load(f)
        return Snapshot(d["snapshot_id"], d.get("parent_id"), d["operation"], d["files"], d.get("summary", {}))

    def snapshots(self) -> list[Snapshot]:
        out = []
        for name in sorted(os.listdir(self.meta_dir)):
            if name.startswith("snapshot-") and name.endswith(".json"):
                with open(os.path.join(self.meta_dir, name)) as f:
                    d = json.load(f)
                out.append(
                    Snapshot(d["snapshot_id"], d.get("parent_id"), d["operation"], d["files"], d.get("summary", {}))
                )
        return out

    def commit(self, new_files: list[str], operation: str = "append", summary: dict | None = None) -> Snapshot:
        cur = self.current_snapshot()
        sid = (cur.snapshot_id + 1) if cur else 0
        files = (cur.files if cur and operation == "append" else []) + new_files
        snap = Snapshot(sid, cur.snapshot_id if cur else None, operation, files, summary or {})
        name = f"snapshot-{sid:06d}.json"
        tmp = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "snapshot_id": snap.snapshot_id,
                    "parent_id": snap.parent_id,
                    "operation": operation,
                    "files": files,
                    "summary": snap.summary,
                },
                f,
                indent=1,
            )
        os.replace(tmp, os.path.join(self.meta_dir, name))
        tmp2 = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp2, "w") as f:
            f.write(name)
        os.replace(tmp2, self._current_path())
        return snap

    # ------------------------------------------------------------------ I/O

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """DataFrame over the committed file set (time travel via snapshot_id).
        Plain parquet scan → Catalyst predicate pushdown / column pruning
        apply untouched; hive-style partition directories (from a
        ``partition_by`` write) keep partition-pruning via basePath."""
        if snapshot_id is None:
            snap = self.current_snapshot()
        else:
            snap = next((s for s in self.snapshots() if s.snapshot_id == snapshot_id), None)
        if snap is None or not snap.files:
            raise ValueError(f"table {self.root} has no committed data (snapshot_id={snapshot_id})")
        paths = [os.path.join(self.data_dir, f) for f in snap.files]
        return spark.read.option("basePath", self.data_dir).parquet(*paths)

    def write_dataframe(
        self,
        df: DataFrame,
        operation: str = "append",
        summary: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> Snapshot:
        """Write ``df`` as new immutable data files + commit one snapshot.

        Spark writes to a scratch dir; the part files are moved into data/
        under fresh UUID names before the snapshot references them, so a
        crashed job never leaves half-visible data (files without a snapshot
        are invisible garbage, collectable later). With ``partition_by`` the
        hive-style ``col=value`` directory layout is preserved, making the
        partition column prunable at scan time (Iceberg-style data layout).
        """
        scratch = os.path.join(self.root, f".stage-{uuid.uuid4().hex}")
        try:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(scratch)
            new_files = []
            for dirpath, _, fns in os.walk(scratch):
                rel_dir = os.path.relpath(dirpath, scratch)
                for fn in sorted(fns):
                    if not fn.endswith(".parquet"):
                        continue
                    if rel_dir == ".":
                        rel = f"{uuid.uuid4().hex}.parquet"
                    else:
                        rel = os.path.join(rel_dir, f"{uuid.uuid4().hex}.parquet")
                        os.makedirs(os.path.join(self.data_dir, rel_dir), exist_ok=True)
                    shutil.move(os.path.join(dirpath, fn), os.path.join(self.data_dir, rel))
                    new_files.append(rel)
            return self.commit(new_files, operation, summary)
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Table maintenance (Iceberg-style): drop all but the newest
        ``keep_last`` snapshot manifests, then delete data files no surviving
        snapshot references (orphans from crashed writes included). Returns
        the deleted data-file names. CURRENT is never expired."""
        snaps = self.snapshots()
        if not snaps:
            return []
        cur = self.current_snapshot()
        keep_ids = {s.snapshot_id for s in snaps[-keep_last:]} | {cur.snapshot_id}
        referenced: set[str] = set()
        for s in snaps:
            if s.snapshot_id in keep_ids:
                referenced.update(s.files)
            else:
                os.remove(os.path.join(self.meta_dir, f"snapshot-{s.snapshot_id:06d}.json"))
        deleted = []
        for dirpath, _, fns in os.walk(self.data_dir):
            for fn in fns:
                rel = os.path.relpath(os.path.join(dirpath, fn), self.data_dir)
                if fn.endswith(".parquet") and rel not in referenced:
                    os.remove(os.path.join(dirpath, fn))
                    deleted.append(rel)
        return deleted

    def write_pandas(self, pdf, operation: str = "append", summary: dict | None = None) -> Snapshot:
        """Commit a pandas DataFrame as one data file (generator convenience)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        tgt = f"{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(self.data_dir, f".tmp-{tgt}")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(self.data_dir, tgt))
        return self.commit([tgt], operation, summary)
