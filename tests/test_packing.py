"""Sequence packing (operators/packing.py) and aspect octants
(operators/terrain.aspect_octants)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dsm2dtm_spark import codecs
from dsm2dtm_spark.operators import terrain
from dsm2dtm_spark.operators.packing import pack_documents
from dsm2dtm_spark.params import NODATA_DEFAULT


def _img(image_id, g, xres=1.0, yres=1.0):
    return {
        "image_id": image_id, "bytes": codecs.encode_raw_f32(g),
        "w": g.shape[1], "h": g.shape[0], "fmt": "raw_f32",
        "lon0": 10.0, "lat0": 20.0, "xres_m": xres, "yres_m": yres,
    }


class TestPackDocuments:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )

    def test_hand_packing(self, spark):
        # one bucket, budget 5; token counts 3, 4, 2, 6
        texts = ["a b c", "a b c d", "a b", "a b c d e f"]
        out = {
            r.doc_id: (r.bucket, r.n_tokens, r.pack_idx, r.offset_in_pack)
            for r in pack_documents(
                self._docs(spark, texts), budget_tokens=5, n_buckets=1
            ).collect()
        }
        # cum-prev: 0, 3, 7, 9 → pack 0/0, 0/3, 1/2, 1/4
        assert out == {
            0: (0, 3, 0, 0),
            1: (0, 4, 0, 3),
            2: (0, 2, 1, 2),
            3: (0, 6, 1, 4),
        }

    def test_buckets_pack_independently(self, spark):
        texts = ["x " * 3, "y " * 3, "z " * 3, "w " * 3]  # 3 tokens each
        out = {
            r.doc_id: (r.bucket, r.pack_idx, r.offset_in_pack)
            for r in pack_documents(
                self._docs(spark, texts), budget_tokens=4, n_buckets=2
            ).collect()
        }
        # bucket 0: docs 0, 2 (cum-prev 0, 3); bucket 1: docs 1, 3
        assert out == {
            0: (0, 0, 0), 2: (0, 0, 3),
            1: (1, 0, 0), 3: (1, 0, 3),
        }

    def test_partitioning_invariant(self, spark):
        texts = [f"tok {'w ' * (i % 7)}end" for i in range(40)]
        docs = self._docs(spark, texts)
        a = sorted(map(tuple, pack_documents(docs, 16, 4).collect()))
        b = sorted(map(tuple, pack_documents(docs.repartition(7), 16, 4).collect()))
        assert a == b

    def test_invalid_params_raise(self, spark):
        docs = self._docs(spark, ["a"])
        with pytest.raises(ValueError):
            pack_documents(docs, budget_tokens=0)
        with pytest.raises(ValueError):
            pack_documents(docs, n_buckets=0)


class TestStratifiedSample:
    def _docs(self, spark, n=60):
        return spark.createDataFrame(
            pd.DataFrame({"doc_id": range(n), "lang": [["en", "de", "fr"][i % 3] for i in range(n)]})
        )

    def test_quota_and_determinism(self, spark):
        from dsm2dtm_spark.operators.sampling import stratified_sample

        docs = self._docs(spark)
        out = stratified_sample(docs, "lang", 5, "doc_id")
        rows = out.collect()
        per = {}
        for r in rows:
            per.setdefault(r.lang, []).append((r.sample_rank, r.doc_id))
        assert all(len(v) == 5 for v in per.values())
        assert all(sorted(x[0] for x in v) == [1, 2, 3, 4, 5] for v in per.values())
        # deterministic under repartitioning (the reproducibility contract)
        again = sorted(map(tuple, stratified_sample(docs.repartition(7), "lang", 5, "doc_id").collect()))
        assert sorted(map(tuple, rows)) == again

    def test_small_stratum_kept_whole(self, spark):
        from dsm2dtm_spark.operators.sampling import stratified_sample

        docs = self._docs(spark, n=4)  # en: 2 docs, de: 1, fr: 1
        out = stratified_sample(docs, "lang", 10, "doc_id")
        assert out.count() == 4

    def test_invalid_quota_raises(self, spark):
        from dsm2dtm_spark.operators.sampling import stratified_sample

        with pytest.raises(ValueError):
            stratified_sample(self._docs(spark, 3), "lang", 0, "doc_id")


class TestAspectOctants:
    def _run(self, spark, g, **kw):
        df = spark.createDataFrame(pd.DataFrame([_img("a", g, **kw)]))
        return {r.octant: r.n_px for r in terrain.aspect_octants(df).collect()}

    def test_cardinal_directions(self, spark):
        yy, xx = np.mgrid[0:5, 0:5]
        # rises east → downslope faces west (octant 4, the 180° boundary)
        assert self._run(spark, (100.0 + 2.0 * xx).astype(np.float32)) == {4: 9}
        # rises south (+py) → downslope faces north (octant 2, the 90° boundary)
        assert self._run(spark, (100.0 + 2.0 * yy).astype(np.float32)) == {2: 9}
        # falls east → downslope faces east (octant 0, the 0° boundary)
        assert self._run(spark, (100.0 - 2.0 * xx).astype(np.float32)) == {0: 9}
        # falls south → downslope faces south (octant 6, the 270° boundary)
        assert self._run(spark, (100.0 - 2.0 * yy).astype(np.float32)) == {6: 9}

    def test_flat_is_minus_one(self, spark):
        assert self._run(spark, np.full((5, 5), 7.0, dtype=np.float32)) == {-1: 9}

    def test_every_gradient_gets_exactly_one_octant(self, spark):
        # random terrain: octant counts partition the interior pixel count
        rng = np.random.default_rng(5)
        g = (100.0 + rng.normal(0, 3.0, (20, 20))).astype(np.float32)
        counts = self._run(spark, g)
        assert sum(counts.values()) == 18 * 18
        assert all(-1 <= k <= 7 for k in counts)

    def test_octants_match_atan2_reference(self, spark):
        # sector membership agrees with the trig definition away from
        # boundaries (boundaries are ownership conventions, excluded here)
        rng = np.random.default_rng(11)
        g = (100.0 + np.cumsum(rng.normal(0, 1.0, (16, 16)), axis=1)).astype(np.float32)
        grads = terrain.interior_gradients(g, 1.0, 1.0)
        assert grads is not None
        gx, gy = grads
        de, dn = -gx, gy
        ang = np.degrees(np.arctan2(dn, de)) % 360.0
        on_boundary = np.isclose(ang % 45.0, 0.0) | np.isclose(ang % 45.0, 45.0)
        flat = (de == 0) & (dn == 0)
        expect = (ang // 45.0).astype(int)
        sel = ~on_boundary & ~flat
        out = terrain.aspect_octants(
            spark.createDataFrame(pd.DataFrame([_img("r", g)]))
        ).collect()
        got_total = {r.octant: r.n_px for r in out}
        ref_total = {}
        # recompute engine-side octants locally for the off-boundary subset
        import collections

        oct_local = np.select(
            [
                (de > 0) & (dn >= 0) & (de >= dn),
                (de > 0) & (dn > 0) & (dn > de),
                (de <= 0) & (dn > 0) & (dn >= -de),
                (de < 0) & (dn > 0) & (-de > dn),
                (de < 0) & (dn <= 0) & (-de >= -dn),
                (de < 0) & (dn < 0) & (-dn > -de),
                (de >= 0) & (dn < 0) & (-dn >= de),
                (de > 0) & (dn < 0) & (de > -dn),
            ],
            list(range(8)),
            default=-1,
        )
        assert np.array_equal(oct_local[sel], expect[sel])
        ref_total = collections.Counter(oct_local.tolist())
        assert got_total == dict(ref_total)
