"""DTM accuracy vs a KNOWN synthetic ground truth — the offline stand-in for
the reference's real-fixture integration tests (reference
tests/test_integration.py:22-31 asserts RMSE < {5.0, 2.0, 8.5} m on three
pooch-downloaded DSM/DTM pairs; the download needs network,
tests/conftest.py:7-9). Here each scenario generates (truth, dsm = truth +
objects) deterministically, so the SAME bound classes apply with no external
data, plus the reference's monotonicity property (test_integration.py:65-87)
and a per-scenario bias check the reference's RMSE bound implies.

Also run distributed: the Spark plan must land inside the same bounds (it is
bit-exact vs golden, so this is a consistency guard, not a second tolerance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dsm2dtm_spark import codecs, golden, synth
from dsm2dtm_spark.params import NODATA_DEFAULT

# scenario → (rmse_bound_m, mae_bound_m); rmse bounds mirror the reference's
# three-fixture table (urban 1 m: 5.0, river 50 cm: 2.0, vegetation 50 cm: 8.5)
BOUNDS = {
    "urban_1m": (5.0, 1.5),
    "river_50cm": (2.0, 0.5),
    "vegetation_50cm": (8.5, 2.0),
}


def rmse_mae(dtm: np.ndarray, truth: np.ndarray) -> tuple[float, float]:
    valid = dtm != NODATA_DEFAULT
    d = dtm[valid].astype(np.float64) - truth[valid].astype(np.float64)
    return float(np.sqrt(np.mean(d * d))), float(np.mean(np.abs(d)))


class TestGroundTruthAccuracy:
    @pytest.mark.parametrize("scenario", synth.TRUTH_SCENARIOS)
    def test_rmse_within_reference_bounds(self, scenario):
        truth, dsm, res = synth.make_truth_scene(scenario)
        dtm = golden.dsm_to_dtm(dsm, (res, res))
        rmse, mae = rmse_mae(dtm, truth)
        rmse_bound, mae_bound = BOUNDS[scenario]
        assert rmse < rmse_bound, f"{scenario}: RMSE {rmse:.3f} ≥ {rmse_bound}"
        assert mae < mae_bound, f"{scenario}: MAE {mae:.3f} ≥ {mae_bound}"

    @pytest.mark.parametrize("scenario", synth.TRUTH_SCENARIOS)
    def test_monotonicity_vs_dsm(self, scenario):
        # reference test_integration.py:81-87: DTM ≤ DSM + 0.1 m for ≥98.5%
        truth, dsm, res = synth.make_truth_scene(scenario)
        dtm = golden.dsm_to_dtm(dsm, (res, res))
        valid = dtm != NODATA_DEFAULT
        frac = float(np.mean(dtm[valid] <= dsm[valid] + 0.1))
        assert frac >= 0.985, f"{scenario}: only {frac:.4f} monotone"

    def test_spark_plan_inside_same_bounds(self, spark):
        from dsm2dtm_spark.plans import dtm_transform

        rows, truths = [], {}
        for scenario in synth.TRUTH_SCENARIOS:
            truth, dsm, res = synth.make_truth_scene(scenario)
            truths[scenario] = truth
            rows.append(
                {
                    "image_id": scenario,
                    "bytes": codecs.encode_raw_f32(dsm),
                    "w": dsm.shape[1],
                    "h": dsm.shape[0],
                    "fmt": "raw_f32",
                    "caption": scenario,
                    "phash": codecs.ahash64(dsm),
                    "xres_m": res,
                    "yres_m": res,
                }
            )
        sdf = spark.createDataFrame(pd.DataFrame(rows).astype({"w": "int32", "h": "int32"}))
        for r in dtm_transform(sdf).collect():
            dtm = codecs.decode(bytes(r.bytes), r.h, r.w, r.fmt)
            rmse, mae = rmse_mae(dtm, truths[r.image_id])
            rmse_bound, mae_bound = BOUNDS[r.image_id]
            assert rmse < rmse_bound and mae < mae_bound, r.image_id
