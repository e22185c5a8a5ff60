"""Interval join via binned equi-join: exact vs a brute-force reference,
boundary semantics (hi exclusive, bin-edge ranges), and the plan property
that motivates it (equi-join, not a nested loop)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dsm2dtm_spark.operators.rangejoin import range_join


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(23)
    pts = pd.DataFrame({"pid": range(300), "v": rng.uniform(-50, 150, 300).round(3)})
    ranges = pd.DataFrame(
        {
            "rid": range(40),
            "lo": rng.uniform(-60, 140, 40).round(3),
            "len": rng.uniform(0.5, 30, 40).round(3),
        }
    )
    ranges["hi"] = ranges.lo + ranges.len
    return pts, ranges.drop(columns=["len"]), spark.createDataFrame(pts), spark.createDataFrame(
        ranges.drop(columns=["len"])
    )


class TestRangeJoin:
    @pytest.mark.parametrize("bin_size", [1.0, 7.3, 25.0, 200.0])
    def test_matches_brute_force(self, spark, data, bin_size):
        pts, ranges, spts, sranges = data
        got = {(r.pid, r.rid) for r in range_join(spts, sranges, "v", "lo", "hi", bin_size).collect()}
        want = {
            (int(p.pid), int(r.rid))
            for p in pts.itertuples()
            for r in ranges.itertuples()
            if r.lo <= p.v < r.hi
        }
        assert got == want, bin_size

    def test_exclusive_hi_on_bin_edge(self, spark):
        pts = spark.createDataFrame(pd.DataFrame({"pid": [0, 1], "v": [10.0, 9.999]}))
        rng_df = spark.createDataFrame(pd.DataFrame({"rid": [0], "lo": [0.0], "hi": [10.0]}))
        got = {(r.pid, r.rid) for r in range_join(pts, rng_df, "v", "lo", "hi", 10.0).collect()}
        assert got == {(1, 0)}  # v == hi is OUT (half-open), even on a bin edge

    def test_hi_just_above_bin_edge_still_matches(self, spark):
        # regression (ADVICE r2): an epsilon nudge on hi_bin dropped matches
        # whenever hi sat within bin_size*1e-9 ABOVE a bin boundary — the
        # range never exploded into its top bin
        hi = 10.0 + 10.0 * 1e-10  # inside the old nudge window
        pts = spark.createDataFrame(pd.DataFrame({"pid": [0], "v": [10.0]}))
        rng_df = spark.createDataFrame(pd.DataFrame({"rid": [0], "lo": [0.0], "hi": [hi]}))
        got = {(r.pid, r.rid) for r in range_join(pts, rng_df, "v", "lo", "hi", 10.0).collect()}
        assert got == {(0, 0)}  # lo <= 10.0 < hi holds, the point must match

    def test_non_inner_join_rejected(self, spark, data):
        # outer semantics would silently collapse to inner (exact predicate
        # runs post-join); the operator must refuse rather than lie
        _, _, spts, sranges = data
        with pytest.raises(ValueError, match="inner"):
            range_join(spts, sranges, "v", "lo", "hi", 10.0, how="left")

    def test_plan_is_equi_join(self, spark, data):
        _, _, spts, sranges = data
        plan = range_join(spts, sranges, "v", "lo", "hi", 10.0)._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
