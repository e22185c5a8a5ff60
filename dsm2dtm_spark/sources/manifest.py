"""Iceberg-style snapshot-manifest table layout on parquet.

No Iceberg runtime jar ships with the sandbox's PySpark and there is no
network (SURVEY.md §1.3), so the engine implements the part of the Iceberg
model it needs — an append-only table whose committed state is a JSON snapshot
listing immutable parquet data files — and reads/writes it through plain
``spark.read.parquet``. Swapping in real Iceberg is a config change.

Layout:
    <root>/data/<uuid>.parquet      immutable data files
    <root>/meta/snapshot-<n>.json   {"snapshot_id", "parent_id", "files",
                                     "operation", "summary", "stats"}
    <root>/meta/CURRENT             text pointer to the current snapshot file

Commit protocol: write the new snapshot JSON to a temp name, ``os.replace``
it into place, then ``os.replace`` the CURRENT pointer — atomic on POSIX, so
readers always see a complete snapshot (exactly-once resume depends on this;
SURVEY.md §7.2 item 5).

Iceberg-style file skipping: every commit records per-file column min/max
(harvested from the parquet FOOTERS the writer already produced — no data
scan), and ``read(where=...)`` prunes non-matching files from the scan
BEFORE Spark lists them. At warehouse scale this is the difference between
touching 40 files and 40,000; the residual predicate is still applied, so
pruning is purely an optimization, never a semantics change. ``compact``
folds small files into target-sized ones as a new snapshot (time travel to
pre-compaction snapshots keeps working — old files stay until expired).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

_JSONABLE = (int, float, str, bool)


def _file_column_stats(path: str) -> dict:
    """Per-column [min, max] from the parquet footer (row-group statistics
    merged; zero data pages read). Columns without clean JSON-able stats
    (binary payloads, missing stats) are simply absent — absent = unprunable,
    which is always safe."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out: dict[str, list] = {}
    skip: set[str] = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            st = col.statistics
            if name in skip:
                continue
            if st is None or not st.has_min_max or not (
                isinstance(st.min, _JSONABLE) and isinstance(st.max, _JSONABLE)
            ):
                skip.add(name)  # one stats-less row group poisons the column
                out.pop(name, None)
                continue
            if name in out:
                out[name] = [min(out[name][0], st.min), max(out[name][1], st.max)]
            else:
                out[name] = [st.min, st.max]
    return out


def _file_survives(stats: dict | None, col: str, op: str, val) -> bool:
    """Can a file with these footer stats contain a row matching the
    predicate? Missing stats → must keep (never prune blindly)."""
    if not stats or col not in stats:
        return True
    lo, hi = stats[col]
    if op == "=":
        return lo <= val <= hi
    if op == ">=":
        return hi >= val
    if op == ">":
        return hi > val
    if op == "<=":
        return lo <= val
    if op == "<":
        return lo < val
    raise ValueError(f"unsupported prune op {op!r} (use =, <, <=, >, >=)")


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    operation: str
    files: list[str]  # data-file names relative to <root>/data/
    summary: dict
    stats: dict = field(default_factory=dict)  # file -> {col: [min, max]}


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
        return self._parse(d)

    @staticmethod
    def _parse(d: dict) -> Snapshot:
        return Snapshot(
            d["snapshot_id"],
            d.get("parent_id"),
            d["operation"],
            d["files"],
            d.get("summary", {}),
            d.get("stats", {}),
        )

    def snapshots(self) -> list[Snapshot]:
        out = []
        for name in sorted(os.listdir(self.meta_dir)):
            if name.startswith("snapshot-") and name.endswith(".json"):
                with open(os.path.join(self.meta_dir, name)) as f:
                    out.append(self._parse(json.load(f)))
        return out

    def _harvest_stats(self, files: list[str]) -> dict:
        out = {}
        for rel in files:
            try:
                out[rel] = _file_column_stats(os.path.join(self.data_dir, rel))
            except Exception:  # noqa: BLE001 — stats are an optimization only
                out[rel] = {}
        return out

    def commit(self, new_files: list[str], operation: str = "append", summary: dict | None = None) -> Snapshot:
        cur = self.current_snapshot()
        base = cur.files if cur and operation == "append" else []
        return self._commit_file_set(base + new_files, new_files, operation, summary)

    def _commit_file_set(
        self, files: list[str], new_files: list[str], operation: str, summary: dict | None
    ) -> Snapshot:
        """Commit an explicit final file set (compaction needs remove+add in
        one atomic snapshot). Footer stats are harvested for the new files;
        surviving files keep theirs."""
        cur = self.current_snapshot()
        sid = (cur.snapshot_id + 1) if cur else 0
        stats = {f: s for f, s in (cur.stats if cur else {}).items() if f in set(files)}
        stats.update(self._harvest_stats(new_files))
        snap = Snapshot(sid, cur.snapshot_id if cur else None, operation, files, summary or {}, stats)
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
                    "stats": stats,
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

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        where: list[tuple] | None = None,
    ) -> DataFrame:
        """DataFrame over the committed file set (time travel via snapshot_id).
        Plain parquet scan → Catalyst predicate pushdown / column pruning
        apply untouched; hive-style partition directories (from a
        ``partition_by`` write) keep partition-pruning via basePath.

        ``where``: optional conjunction of ``(col, op, value)`` predicates
        (op ∈ =, <, <=, >, >=). Files whose footer min/max provably cannot
        match are dropped from the scan path list — Iceberg-style file
        skipping using the manifest's stats — and the SAME predicates are
        then applied as DataFrame filters, so results are identical to a
        full scan + filter; only the I/O shrinks."""
        if snapshot_id is None:
            snap = self.current_snapshot()
        else:
            snap = next((s for s in self.snapshots() if s.snapshot_id == snapshot_id), None)
        if snap is None or not snap.files:
            raise ValueError(f"table {self.root} has no committed data (snapshot_id={snapshot_id})")
        files = snap.files
        if where:
            files = [
                f for f in files if all(_file_survives(snap.stats.get(f), c, op, v) for (c, op, v) in where)
            ] or snap.files[:1]  # keep one file for schema; filters below yield 0 rows
        paths = [os.path.join(self.data_dir, f) for f in files]
        df = spark.read.option("basePath", self.data_dir).parquet(*paths)
        ops = {
            "=": lambda col, v: col == v,
            "<": lambda col, v: col < v,
            "<=": lambda col, v: col <= v,
            ">": lambda col, v: col > v,
            ">=": lambda col, v: col >= v,
        }
        for c, op, v in where or []:
            df = df.filter(ops[op](F.col(c), F.lit(v)))
        return df

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

    def compact(
        self,
        spark: SparkSession,
        small_file_bytes: int = 32 << 20,
        target_file_bytes: int = 128 << 20,
        sort_by: list[str] | None = None,
    ) -> Snapshot | None:
        """Table maintenance: fold small data files into ~target-sized ones
        as ONE new snapshot (remove+add atomically). Small files are the
        classic warehouse failure mode — every incremental/streaming commit
        adds a few, and a year later the scan spends longer listing footers
        than reading data. Hive-partitioned layouts (from a ``partition_by``
        write) compact PER PARTITION DIRECTORY: each partition's small files
        fold among themselves and the rewritten files stay under the same
        ``col=value`` path, so partition pruning is untouched and untouched
        partitions cost nothing. ``sort_by`` optionally clusters rows (e.g.
        by cell id) during the rewrite so the new footers' min/max become
        tight and ``read(where=...)`` file skipping gets sharper. Time
        travel to pre-compaction snapshots keeps working — replaced files
        stay on disk until ``expire_snapshots`` drops the snapshots that
        reference them. Returns the new snapshot, or None when there is
        nothing to do."""
        cur = self.current_snapshot()
        if cur is None:
            return None
        groups: dict[str, list[str]] = {}
        for f in cur.files:
            if os.path.getsize(os.path.join(self.data_dir, f)) < small_file_bytes:
                d = os.path.dirname(f)
                groups.setdefault("" if d == "." else d, []).append(f)
        groups = {d: fs for d, fs in groups.items() if len(fs) >= 2}
        if not groups:
            return None
        small_all: list[str] = []
        new_files: list[str] = []
        scratch = os.path.join(self.root, f".stage-{uuid.uuid4().hex}")
        try:
            for d, small in sorted(groups.items()):
                total = sum(os.path.getsize(os.path.join(self.data_dir, f)) for f in small)
                n_out = max(1, math.ceil(total / target_file_bytes))
                df = spark.read.parquet(*[os.path.join(self.data_dir, f) for f in small])
                if sort_by:  # range-cluster: tight per-file min/max for file skipping
                    df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
                else:
                    df = df.coalesce(n_out)
                df.write.mode("overwrite").parquet(scratch)
                if d:
                    os.makedirs(os.path.join(self.data_dir, d), exist_ok=True)
                for fn in sorted(os.listdir(scratch)):
                    if fn.endswith(".parquet"):
                        rel = os.path.join(d, f"{uuid.uuid4().hex}.parquet") if d else f"{uuid.uuid4().hex}.parquet"
                        shutil.move(os.path.join(scratch, fn), os.path.join(self.data_dir, rel))
                        new_files.append(rel)
                small_all.extend(small)
            survivors = [f for f in cur.files if f not in set(small_all)]
            return self._commit_file_set(
                survivors + new_files,
                new_files,
                "compact",
                {"compacted": len(small_all), "into": len(new_files)},
            )
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

    def row_count(self, snapshot_id: int | None = None) -> int | None:
        """Committed row count from parquet FOOTER metadata only (summed
        ``num_rows`` over the snapshot's files — zero data pages read, cost
        O(#files), tiny after compaction). The high-watermark primitive:
        ``repair_store`` compares corpus rows vs signature rows to skip its
        O(corpus) anti-join on the happy path. Returns None for a table with
        no commits; raises nothing — an unreadable footer falls back to a
        Spark count by the caller (never guessed)."""
        import pyarrow.parquet as pq

        if snapshot_id is None:
            snap = self.current_snapshot()
        else:
            snap = next((s for s in self.snapshots() if s.snapshot_id == snapshot_id), None)
        if snap is None:
            return None
        total = 0
        for rel in snap.files:
            total += pq.ParquetFile(os.path.join(self.data_dir, rel)).metadata.num_rows
        return total

    def write_pandas(self, pdf, operation: str = "append", summary: dict | None = None) -> Snapshot:
        """Commit a pandas DataFrame as one data file (generator convenience)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        tgt = f"{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(self.data_dir, f".tmp-{tgt}")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(self.data_dir, tgt))
        return self.commit([tgt], operation, summary)
