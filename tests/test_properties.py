"""Property-based tests (hypothesis) — the reference's stress/property style
(SURVEY.md §5 level 3) applied to the engine's pure kernels: random inputs,
invariants that must hold for ALL of them, shrinking on failure. No Spark
session needed — these pin the numpy/stdlib layers every Spark path sits on.
"""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from dsm2dtm_spark import codecs
from dsm2dtm_spark.operators import cellindex
from dsm2dtm_spark.params import NODATA_DEFAULT
from dsm2dtm_spark.sources import tiffio

# keep runs fast and deterministic in CI: bounded examples, no deadline
# (Spark-adjacent numpy work can blip over hypothesis's default 200 ms)
FAST = settings(max_examples=60, deadline=None)


grids = st.tuples(
    st.integers(min_value=1, max_value=40),  # h
    st.integers(min_value=1, max_value=40),  # w
    st.integers(min_value=0, max_value=2**32 - 1),  # seed
    st.floats(min_value=0.0, max_value=0.5),  # nodata fraction
)


def _grid(h, w, seed, nodata_frac):
    rng = np.random.default_rng(seed)
    g = (rng.normal(100, 25, (h, w))).astype(np.float32)
    if nodata_frac:
        g[rng.random((h, w)) < nodata_frac] = NODATA_DEFAULT
    return g


class TestTiffProperties:
    @FAST
    @given(grids, st.booleans(), st.booleans())
    def test_roundtrip_identity(self, hwsf, compress, bigtiff):
        h, w, seed, frac = hwsf
        g = _grid(h, w, seed, frac)
        data = tiffio.write_geotiff(
            g, x0=1.5, y0=2.5, xres=0.5, yres=0.25, epsg=32631,
            compress=compress, bigtiff=bigtiff,
        )
        back, meta = tiffio.read_geotiff(data)
        np.testing.assert_array_equal(back, g)
        assert (meta["x0"], meta["y0"], meta["xres"], meta["yres"]) == (1.5, 2.5, 0.5, 0.25)
        assert meta["epsg"] == 32631

    @FAST
    @given(grids)
    def test_roundtrip_with_embedded_overviews(self, hwsf):
        from dsm2dtm_spark.operators.terrain import overview_levels_numpy

        h, w, seed, frac = hwsf
        g = _grid(h, w, seed, frac)
        ovs = [
            np.where(cnt > 0, value, float(NODATA_DEFAULT)).astype(np.float32)
            for _, cnt, value in overview_levels_numpy(g, 2)
        ]
        data = tiffio.write_geotiff(g, 1.5, 2.5, 0.5, 0.25, overviews=ovs)
        back, _ = tiffio.read_geotiff(data)
        np.testing.assert_array_equal(back, g)
        for k, ov in enumerate(ovs, start=1):
            got, _ = tiffio.read_geotiff(data, ifd_index=k)
            np.testing.assert_array_equal(got, ov)

    @FAST
    @given(st.binary(min_size=0, max_size=64))
    @example(b"II\x2a\x00\x40\x00\x00\x00")  # valid magic, IFD past EOF
    @example(b"II\x2a\x00\x08\x00\x00\x00\xff\xff")  # huge entry count, truncated
    @example(b"MM\x00\x2a\x00\x00\x00\x08\x00")  # big-endian, truncated IFD
    def test_garbage_never_crashes_uncontrolled(self, junk):
        # arbitrary bytes must raise ValueError (a typed, catchable error for
        # the permissive quarantine), never segfault/IndexError/struct.error —
        # random bytes rarely carry the TIFF magic, so the post-magic parse
        # paths are pinned by the directed @example cases too
        try:
            tiffio.read_geotiff(junk)
        except ValueError:
            pass
        try:
            tiffio.read_geotiff(b"II\x2a\x00" + junk)  # force the parse path
        except ValueError:
            pass

    @FAST
    @given(grids)
    def test_truncated_payload_detected(self, hwsf):
        h, w, seed, frac = hwsf
        if h * w < 2:
            return
        g = _grid(h, w, seed, frac)
        data = tiffio.write_geotiff(g, 0, 0, 1.0, 1.0)
        try:
            tiffio.read_geotiff(data[: len(data) - h * w * 2])  # cut half the pixels
        except ValueError:
            pass  # either a clean error ...
        # ... or, if the cut only removed trailing strips the reader doesn't
        # need (impossible here since strips are last), equality would hold.


class TestCodecProperties:
    @FAST
    @given(grids)
    def test_raw_f32_and_png16_roundtrip(self, hwsf):
        h, w, seed, frac = hwsf
        g = _grid(h, w, seed, frac)
        np.testing.assert_array_equal(codecs.decode(codecs.encode(g, "raw_f32"), h, w, "raw_f32"), g)
        # png16 quantizes to 65535 levels of the value range: error bounded
        back = codecs.decode(codecs.encode(g, "png16"), h, w, "png16")
        valid = g != NODATA_DEFAULT
        np.testing.assert_array_equal(back == NODATA_DEFAULT, ~valid)
        if valid.any():
            rng_v = float(g[valid].max() - g[valid].min())
            atol = max(rng_v / 65534.0, 1e-6)
            np.testing.assert_allclose(back[valid], g[valid], rtol=0, atol=atol)

    @FAST
    @given(grids)
    def test_qz8_psnr_bound_holds(self, hwsf):
        h, w, seed, frac = hwsf
        g = _grid(h, w, seed, frac)
        valid = g != NODATA_DEFAULT
        if valid.sum() < 2:
            return
        back = codecs.decode(codecs.encode(g, "qz8"), h, w, "qz8")
        # the engine's lossy-codec contract: PSNR >= 40 dB on valid pixels
        assert codecs.psnr(g, back) >= 40.0


class TestCellIndexProperties:
    lonlats = st.tuples(
        st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
        st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
        st.integers(min_value=1, max_value=15),
    )

    @FAST
    @given(lonlats)
    def test_res_tag_and_parent_chain(self, lls):
        lon, lat, res = lls
        cell = int(cellindex.encode_cells(np.array([lon]), np.array([lat]), res)[0])
        assert cell & 31 == res  # res tag in the low bits
        # parent at every coarser level is itself the parent's own encode-
        # compatible ancestor: parent(parent(c, r2), r1) == parent(c, r1)
        for r2 in range(1, res + 1):
            p2 = int(cellindex.parent_cell(np.array([cell]), r2)[0])
            assert p2 & 31 == r2
            for r1 in range(1, r2 + 1):
                a = int(cellindex.parent_cell(np.array([cell]), r1)[0])
                b = int(cellindex.parent_cell(np.array([p2]), r1)[0])
                assert a == b, (lon, lat, res, r2, r1)

    @FAST
    @given(lonlats)
    def test_same_point_same_cell_and_containment(self, lls):
        lon, lat, res = lls
        c1 = int(cellindex.encode_cells(np.array([lon]), np.array([lat]), res)[0])
        c2 = int(cellindex.encode_cells(np.array([lon]), np.array([lat]), res)[0])
        assert c1 == c2  # deterministic
        # encoding directly at a coarser res == taking the parent
        for r in range(1, res + 1):
            direct = int(cellindex.encode_cells(np.array([lon]), np.array([lat]), r)[0])
            via_parent = int(cellindex.parent_cell(np.array([c1]), r)[0])
            assert direct == via_parent, (lon, lat, res, r)


class TestTerrainProperties:
    @FAST
    @given(grids)
    def test_pyramid_conserves_mass_and_counts(self, hwsf):
        from dsm2dtm_spark.operators.terrain import overview_levels_numpy

        g = _grid(*hwsf)
        valid = g != NODATA_DEFAULT
        n_valid = int(valid.sum())
        base_sum = float(np.where(valid, g.astype(np.float64), 0.0).sum())
        lo = float(g.astype(np.float64)[valid].min()) if n_valid else 0.0
        hi = float(g.astype(np.float64)[valid].max()) if n_valid else 0.0
        for level, cnt, value in overview_levels_numpy(g, 4):
            assert int(cnt.sum()) == n_valid  # every valid base pixel counted once
            assert cnt.max(initial=0) <= 4 ** level
            m = cnt > 0
            if m.any():
                # weighted mean identity: each cell's value·count is its exact
                # base-pixel sum (float32 addends → exact float64 partials)
                assert np.isclose((value[m] * cnt[m]).sum(), base_sum, rtol=1e-12)
                assert value[m].min() >= lo - 1e-9 and value[m].max() <= hi + 1e-9

    @FAST
    @given(st.integers(min_value=0, max_value=2**32 - 1))
    def test_octant_rules_total_and_disjoint(self, seed):
        rng = np.random.default_rng(seed)
        de = rng.choice([0.0, -0.0, 1.0]) * rng.normal(size=200)
        dn = rng.choice([0.0, -0.0, 1.0]) * rng.normal(size=200)
        conds = np.stack(
            [
                (de > 0) & (dn >= 0) & (de >= dn),
                (de > 0) & (dn > 0) & (dn > de),
                (de <= 0) & (dn > 0) & (dn >= -de),
                (de < 0) & (dn > 0) & (-de > dn),
                (de < 0) & (dn <= 0) & (-de >= -dn),
                (de < 0) & (dn < 0) & (-dn > -de),
                (de >= 0) & (dn < 0) & (-dn >= de),
                (de > 0) & (dn < 0) & (de > -dn),
            ]
        )
        hits = conds.sum(axis=0)
        flat = (de == 0) & (dn == 0)
        assert np.all(hits[flat] == 0)  # flat matches no sector (→ -1)
        assert np.all(hits[~flat] == 1)  # every other vector exactly one


class TestPackingProperties:
    @FAST
    @given(
        st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=80),
        st.integers(min_value=1, max_value=64),
        st.integers(min_value=1, max_value=7),
    )
    def test_positions_are_contiguous_per_bucket(self, token_counts, budget, n_buckets):
        # pure recomputation of the operator's window arithmetic: absolute
        # position = pack_idx·budget + offset must advance by exactly
        # n_tokens within a bucket (docs ordered by id), starting at 0
        by_bucket = {}
        for doc_id, n in enumerate(token_counts):
            by_bucket.setdefault(doc_id % n_buckets, []).append(n)
        for counts in by_bucket.values():
            cum = 0
            for n in counts:
                pack_idx, offset = divmod(cum, budget)
                assert offset < budget and pack_idx >= 0
                cum += n


class TestZf32Properties:
    @FAST
    @given(grids, st.sampled_from(["normal", "flat", "randbytes", "mixed"]))
    def test_roundtrip_identity_all_regimes(self, hwsf, regime):
        h, w, seed, frac = hwsf
        rng = np.random.default_rng(seed)
        if regime == "flat":
            g = np.full((h, w), np.float32(rng.normal(100, 25)))
        elif regime == "randbytes":
            g = np.frombuffer(rng.bytes(h * w * 4), dtype="<f4").reshape(h, w).copy()
        elif regime == "mixed":
            g = _grid(h, w, seed, frac)
            g[: h // 2] = 7.0  # half smooth, half noisy → per-plane split
        else:
            g = _grid(h, w, seed, frac)
        data = codecs.encode_zf32(g)
        back = codecs.decode_zf32(data, h, w)
        np.testing.assert_array_equal(
            np.asarray(back, dtype="<f4").view(np.uint32),
            np.asarray(g, dtype="<f4").view(np.uint32),
        )  # bit-exact incl. NaN payloads and signed zeros

    @FAST
    @given(st.binary(min_size=0, max_size=200), st.integers(min_value=1, max_value=16))
    def test_garbage_raises_typed_never_crashes(self, junk, hw):
        try:
            codecs.decode_zf32(junk, hw, hw)
        except ValueError:
            pass  # the only acceptable failure type


class TestLZWProperties:
    @FAST
    @given(st.integers(min_value=0, max_value=2**32 - 1),
           st.integers(min_value=0, max_value=6000),
           st.integers(min_value=1, max_value=8))
    def test_roundtrip_any_alphabet(self, seed, size, alphabet_bits):
        from dsm2dtm_spark.sources.tiffio import _lzw_decode

        from tests.test_geotiff_source import _lzw_encode

        rng = np.random.default_rng(seed)
        data = (rng.integers(0, 1 << alphabet_bits, size) % 256).astype(np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data), max(size, 1)) == data

    @FAST
    @given(st.binary(min_size=0, max_size=100))
    def test_garbage_raises_typed_never_crashes(self, junk):
        from dsm2dtm_spark.sources.tiffio import _lzw_decode

        try:
            _lzw_decode(junk, 4096)
        except ValueError:
            pass


class TestPngAdam7Properties:
    """Adam7 decode inverts an independently-constructed spec-lattice
    interlaced encoding for EVERY image shape — the pass geometry
    (ceil-divisions, empty passes, 1-pixel edges) is where off-by-ones
    live, so shapes are the fuzzed axis."""

    @staticmethod
    def _encode_adam7(img):
        import struct
        import zlib

        from dsm2dtm_spark.operators import multimodal as M

        h, w, channels = img.shape
        raw = b""
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            block = img[y0::dy, x0::dx]
            if block.shape[0] == 0 or block.shape[1] == 0:
                continue
            raw += b"".join(b"\x00" + block[y].tobytes() for y in range(block.shape[0]))
        ctype = 2 if channels == 3 else 6
        return (
            b"\x89PNG\r\n\x1a\n"
            + M._png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1))
            + M._png_chunk(b"IDAT", zlib.compress(raw))
            + M._png_chunk(b"IEND", b"")
        )

    @FAST
    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.sampled_from([3, 4]),
    )
    @example(1, 1, 0, 3)
    @example(8, 8, 0, 4)
    @example(9, 17, 7, 3)
    def test_adam7_roundtrip_any_shape(self, h, w, seed, channels):
        from dsm2dtm_spark.operators import multimodal as M

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, channels), dtype=np.uint8)
        got = M.decode_png_rgb8(self._encode_adam7(img))
        np.testing.assert_array_equal(got, img[:, :, :3])
        # and it agrees with the non-interlaced decode of the same pixels
        if channels == 3:
            np.testing.assert_array_equal(got, M.decode_png_rgb8(M.encode_png_rgb8(img)))
