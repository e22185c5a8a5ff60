"""Snapshot-table maintenance: expiring old snapshots removes exactly the
unreferenced data files while the current state keeps reading correctly."""

from __future__ import annotations

import os

import pandas as pd

from dsm2dtm_spark.sources import SnapshotTable


def test_expire_snapshots_keeps_current_state(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.write_pandas(pd.DataFrame({"a": [1, 2]}))
    t.write_pandas(pd.DataFrame({"a": [3]}))
    t.write_pandas(pd.DataFrame({"a": [4, 5]}))
    assert t.read(spark).count() == 5

    deleted = t.expire_snapshots(keep_last=1)
    # append-only snapshots: the newest references every live file → nothing
    # referenced by it may be deleted
    assert deleted == []
    assert len(t.snapshots()) == 1
    assert t.read(spark).count() == 5


def test_expire_removes_orphans_and_overwritten_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t2"))
    t.write_pandas(pd.DataFrame({"a": [1, 2]}))
    # simulate a crashed write: a data file no snapshot references
    orphan = os.path.join(t.data_dir, "deadbeef.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    # an overwrite snapshot drops the old file set
    t.write_dataframe(spark.range(3).toDF("a"), operation="overwrite")
    deleted = t.expire_snapshots(keep_last=1)
    assert "deadbeef.parquet" in deleted
    assert len(deleted) >= 2  # orphan + the pre-overwrite file
    assert t.read(spark).count() == 3
