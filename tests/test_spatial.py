"""Spatial-join and kNN-join tests: Spark results vs brute-force references
computed in numpy/pandas (the DuckDB oracle replays the same checks in the
driver contract)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dsm2dtm_spark import synth
from dsm2dtm_spark.operators import spatial
from dsm2dtm_spark.operators.spatial import points_in_polygon


class TestPointInPolygon:
    def test_square(self):
        xs = np.array([0.0, 2.0, 2.0, 0.0])
        ys = np.array([0.0, 0.0, 2.0, 2.0])
        px = np.array([1.0, 3.0, -0.5, 1.999])
        py = np.array([1.0, 1.0, 1.0, 0.001])
        np.testing.assert_array_equal(points_in_polygon(xs, ys, px, py), [True, False, False, True])

    def test_convex_hull_matches_halfplane_test(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 10, (8, 2))
        hull = synth._convex_hull([tuple(p) for p in pts])
        xs = np.array([p[0] for p in hull])
        ys = np.array([p[1] for p in hull])
        qx = rng.uniform(-2, 12, 300)
        qy = rng.uniform(-2, 12, 300)
        got = points_in_polygon(xs, ys, qx, qy)
        # CCW hull: inside ⇔ left of every edge (strict interior check;
        # skip points within eps of an edge to dodge boundary conventions)
        n = len(xs)
        cross_min = np.full(300, np.inf)
        for i in range(n):
            j = (i + 1) % n
            cr = (xs[j] - xs[i]) * (qy - ys[i]) - (ys[j] - ys[i]) * (qx - xs[i])
            cross_min = np.minimum(cross_min, cr)
        sure = np.abs(cross_min) > 1e-9
        np.testing.assert_array_equal(got[sure], cross_min[sure] > 0)


class TestSpatialJoin:
    @pytest.fixture(scope="class")
    def data(self, spark):
        fps = synth.footprint_table(40, seed=5)
        rng = np.random.default_rng(6)
        centers = pd.DataFrame(
            {
                "image_id": [f"img_{i:04d}" for i in range(300)],
                "tile_row": np.zeros(300, dtype=np.int32),
                "tile_col": np.zeros(300, dtype=np.int32),
                "lon_c": rng.uniform(-0.5, 4.5, 300),
                "lat_c": rng.uniform(33.5, 38.5, 300),
            }
        )
        return fps, centers

    def test_matches_bruteforce(self, spark, data):
        fps, centers = data
        got = spatial.spatial_join_tiles(
            spark.createDataFrame(fps), spark.createDataFrame(centers)
        ).collect()
        got_set = {(r.footprint_id, r.image_id) for r in got}
        want = set()
        for fp in fps.itertuples(index=False):
            inside = points_in_polygon(
                np.array(fp.xs), np.array(fp.ys), centers.lon_c.to_numpy(), centers.lat_c.to_numpy()
            )
            for img in centers.image_id[inside]:
                want.add((fp.footprint_id, img))
        assert got_set == want
        assert len(want) > 10  # the fixture actually exercises the join

    def test_rect_footprints_equal_bbox_semantics(self, spark, data):
        """For rectangles, PIP refinement ≡ BETWEEN on the bbox — the property
        that makes the join oracle-checkable in pure SQL (FIXTURES.md §2)."""
        fps, centers = data
        rects = fps[fps.kind == "rect"]
        got = spatial.spatial_join_tiles(
            spark.createDataFrame(rects), spark.createDataFrame(centers)
        ).collect()
        got_set = {(r.footprint_id, r.image_id) for r in got}
        want = set()
        for fp in rects.itertuples(index=False):
            m = (
                (centers.lon_c >= fp.x0)
                & (centers.lon_c <= fp.x1)
                & (centers.lat_c >= fp.y0)
                & (centers.lat_c <= fp.y1)
            )
            for img in centers.image_id[m]:
                want.add((fp.footprint_id, img))
        assert got_set == want

    def test_broadcast_hint_in_plan(self, spark, data):
        fps, centers = data
        df = spatial.spatial_join_tiles(spark.createDataFrame(fps), spark.createDataFrame(centers))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestKnnJoin:
    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(7)
        queries = pd.DataFrame(
            {"query_id": [f"q_{i}" for i in range(60)], "x": rng.uniform(0, 4, 60), "y": rng.uniform(34, 38, 60)}
        )
        points = pd.DataFrame(
            {
                "point_id": [f"p_{i}" for i in range(500)],
                "x": rng.uniform(-1, 5, 500),
                "y": rng.uniform(33, 39, 500),
            }
        )
        return queries, points

    def test_exact_vs_bruteforce(self, spark, data):
        queries, points = data
        k = 4
        got = spatial.knn_join(spark.createDataFrame(queries), spark.createDataFrame(points), k=k).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append((r.rank, r.point_id, r.dist))
        px = points.x.to_numpy()
        py = points.y.to_numpy()
        for q in queries.itertuples(index=False):
            d = np.sqrt((px - q.x) ** 2 + (py - q.y) ** 2)
            order = sorted(range(len(d)), key=lambda i: (d[i], points.point_id.iloc[i]))[:k]
            want = [points.point_id.iloc[i] for i in order]
            gotq = [pid for _, pid, _ in sorted(by_q[q.query_id])]
            assert gotq == want, q.query_id
            assert len(by_q[q.query_id]) == k

    def test_sparse_region_falls_back_correctly(self, spark):
        # 3 points total, k=2: rings can't certify quickly → fallback path
        queries = pd.DataFrame({"query_id": ["a"], "x": [0.0], "y": [0.0]})
        points = pd.DataFrame({"point_id": ["p1", "p2", "p3"], "x": [50.0, -60.0, 0.1], "y": [0.0, 10.0, 0.0]})
        got = spatial.knn_join(spark.createDataFrame(queries), spark.createDataFrame(points), k=2).collect()
        assert {r.point_id for r in got} == {"p3", "p1"}


class TestFootprintOverlapPairs:
    def test_matches_brute_force(self, spark):
        from dsm2dtm_spark import synth
        from dsm2dtm_spark.operators.spatial import footprint_overlap_pairs

        fps = synth.footprint_table(40, seed=17)
        got = {
            (r.id_a, r.id_b): r.overlap_area
            for r in footprint_overlap_pairs(spark.createDataFrame(fps)).collect()
        }
        want = {}
        rows = list(fps.itertuples(index=False))
        for i, a in enumerate(rows):
            for b in rows[i + 1:]:
                w = min(a.x1, b.x1) - max(a.x0, b.x0)
                h = min(a.y1, b.y1) - max(a.y0, b.y0)
                if w > 0 and h > 0:
                    want[(a.footprint_id, b.footprint_id)] = w * h
        assert got == want  # exact doubles, no tolerance needed
        assert len(want) > 0

    def test_pairs_unique_and_touching_excluded(self, spark):
        import pandas as pd
        from dsm2dtm_spark.operators.spatial import footprint_overlap_pairs

        fps = pd.DataFrame(
            [
                {"footprint_id": "a", "x0": 0.0, "y0": 0.0, "x1": 2.0, "y1": 2.0},
                {"footprint_id": "b", "x0": 1.0, "y0": 1.0, "x1": 3.0, "y1": 3.0},
                {"footprint_id": "c", "x0": 2.0, "y0": 0.0, "x1": 4.0, "y1": 2.0},  # touches a
                {"footprint_id": "d", "x0": 10.0, "y0": 10.0, "x1": 11.0, "y1": 11.0},
            ]
        )
        out = footprint_overlap_pairs(spark.createDataFrame(fps)).collect()
        got = {(r.id_a, r.id_b): r.overlap_area for r in out}
        assert got == {("a", "b"): 1.0, ("b", "c"): 1.0}

    def test_no_cartesian_in_plan(self, spark):
        from dsm2dtm_spark import synth
        from dsm2dtm_spark.operators.spatial import footprint_overlap_pairs

        df = footprint_overlap_pairs(spark.createDataFrame(synth.footprint_table(10, seed=2)))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
