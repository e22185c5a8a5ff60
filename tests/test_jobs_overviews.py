"""Overview-pyramid job (jobs/build_overviews.py): resume semantics,
level partitioning, and parity with the operator."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

from build_overviews import run_overview_job  # noqa: E402

from dsm2dtm_spark import synth  # noqa: E402
from dsm2dtm_spark.operators.terrain import build_overviews  # noqa: E402
from dsm2dtm_spark.sources import SnapshotTable  # noqa: E402


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "in_table"), str(tmp_path / "out_table")


def test_job_builds_resumes_and_appends(spark, roots):
    in_root, out_root = roots
    images = synth.image_table(n_rows=6, seed=21, sizes=(20, 32)).drop(columns=["scenario"])
    SnapshotTable(in_root).write_pandas(images)

    res1 = run_overview_job(spark, in_root, out_root, levels=2)
    assert res1["images"] == 6
    direct = build_overviews(spark.createDataFrame(images), levels=2).count()
    assert res1["total_rows"] == direct

    # rerun: nothing to do, totals unchanged (idempotent resume)
    res2 = run_overview_job(spark, in_root, out_root, levels=2)
    assert res2 == {"images": 0, "total_rows": direct}

    # append two more images: only the delta is processed
    more = synth.image_table(n_rows=8, seed=21, sizes=(20, 32)).drop(columns=["scenario"]).iloc[6:]
    SnapshotTable(in_root).write_pandas(more)
    res3 = run_overview_job(spark, in_root, out_root, levels=2)
    assert res3["images"] == 2
    assert res3["total_rows"] > direct


def test_level_partition_prunes_files(spark, roots):
    in_root, out_root = roots
    images = synth.image_table(n_rows=3, seed=33, sizes=(24,)).drop(columns=["scenario"])
    SnapshotTable(in_root).write_pandas(images)
    run_overview_job(spark, in_root, out_root, levels=3)

    t = SnapshotTable(out_root)
    lvl2 = t.read(spark).filter("level = 2")
    plan = lvl2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "level" in plan.split("PartitionFilters")[1][:120]
    assert lvl2.count() > 0


def test_all_nodata_image_is_marked_done(spark, roots):
    import numpy as np
    import pandas as pd

    from dsm2dtm_spark import codecs
    from dsm2dtm_spark.params import NODATA_DEFAULT

    in_root, out_root = roots
    dead = np.full((8, 8), NODATA_DEFAULT, dtype=np.float32)
    live = np.full((8, 8), 5.0, dtype=np.float32)
    pdf = pd.DataFrame(
        [
            {"image_id": "dead", "bytes": codecs.encode_raw_f32(dead), "w": 8, "h": 8, "fmt": "raw_f32"},
            {"image_id": "live", "bytes": codecs.encode_raw_f32(live), "w": 8, "h": 8, "fmt": "raw_f32"},
        ]
    )
    SnapshotTable(in_root).write_pandas(pdf)
    res1 = run_overview_job(spark, in_root, out_root, levels=2)
    assert res1["images"] == 2
    # the all-nodata image contributed no pyramid rows but IS done: the
    # rerun reprocesses nothing and commits nothing
    n_snaps = len(SnapshotTable(out_root).snapshots())
    res2 = run_overview_job(spark, in_root, out_root, levels=2)
    assert res2["images"] == 0
    assert len(SnapshotTable(out_root).snapshots()) == n_snaps


def test_levels_mismatch_fails_fast(spark, roots):
    in_root, out_root = roots
    images = synth.image_table(n_rows=2, seed=44, sizes=(16,)).drop(columns=["scenario"])
    SnapshotTable(in_root).write_pandas(images)
    run_overview_job(spark, in_root, out_root, levels=2)
    with pytest.raises(ValueError, match="levels="):
        run_overview_job(spark, in_root, out_root, levels=3)


def test_invalid_levels_raises(spark, roots):
    in_root, out_root = roots
    SnapshotTable(in_root).write_pandas(
        synth.image_table(n_rows=1, seed=1, sizes=(16,)).drop(columns=["scenario"])
    )
    with pytest.raises(ValueError):
        run_overview_job(spark, in_root, out_root, levels=0)
