"""GeoTIFF surface: the from-scratch TIFF reader/writer (sources.tiffio —
uncompressed strips, GeoTIFF keys, GDAL_NODATA) runs everywhere, so the
reference's file-in/file-out job shape (core.py:126-136, 191-204) is tested
without rasterio; the rasterio adapter stays as the full-GDAL-coverage
option behind the same interface."""

from __future__ import annotations

import numpy as np
import pytest

from dsm2dtm_spark.params import NODATA_DEFAULT
from dsm2dtm_spark.sources import geotiff, tiffio


def _grid():
    g = np.full((60, 60), 100.0, dtype=np.float32)
    g[20:32, 20:32] += 15.0
    g[5:8, 5:8] = NODATA_DEFAULT
    return g


class TestTiffCodec:
    def test_roundtrip_bytes_and_meta(self):
        g = _grid()
        data = tiffio.write_geotiff(g, x0=500000.0, y0=4000000.0, xres=1.0, yres=1.0,
                                    epsg=32631, nodata=NODATA_DEFAULT)
        back, meta = tiffio.read_geotiff(data)
        np.testing.assert_array_equal(back, g)
        assert (meta["x0"], meta["y0"]) == (500000.0, 4000000.0)
        assert (meta["xres"], meta["yres"]) == (1.0, 1.0)
        assert meta["epsg"] == 32631 and meta["is_geographic"] is False
        assert meta["nodata"] == NODATA_DEFAULT

    def test_accepts_path_and_open_handle(self, tmp_path):
        # reference core.py:126-136 takes a path OR an open dataset; the
        # engine twin accepts bytes, a path string, or a binary handle
        g = _grid()
        p = str(tmp_path / "h.tif")
        data = tiffio.write_geotiff(g, 0, 0, 1.0, 1.0, epsg=32631)
        with open(p, "wb") as f:
            f.write(data)
        for src in (data, p, open(p, "rb")):
            back, meta = tiffio.read_geotiff(src)
            np.testing.assert_array_equal(back, g)
            assert meta["epsg"] == 32631

    def test_geographic_crs_flag(self):
        data = tiffio.write_geotiff(_grid(), x0=2.0, y0=46.0, xres=0.001, yres=0.001, epsg=4326)
        _, meta = tiffio.read_geotiff(data)
        assert meta["epsg"] == 4326 and meta["is_geographic"] is True

    def test_multi_strip_layout(self):
        # 400 rows × 200 cols f32 = 800 B/row → several 64 KiB strips
        rng = np.random.default_rng(5)
        g = rng.normal(100, 10, (400, 200)).astype(np.float32)
        back, _ = tiffio.read_geotiff(tiffio.write_geotiff(g, 0, 0, 1.0, 1.0))
        np.testing.assert_array_equal(back, g)

    def test_big_endian_read(self):
        # the reader must handle MM files; synthesize one by byte-swapping a
        # minimal hand-rolled header (simplest: write LE, reread, compare to
        # an MM fixture built with struct '>' packing)
        g = np.arange(12, dtype=np.float32).reshape(3, 4)
        import struct

        pix = g.astype(">f4").tobytes()
        entries = [
            (256, 4, 1, struct.pack(">I", 4)),
            (257, 4, 1, struct.pack(">I", 3)),
            (258, 3, 1, struct.pack(">HH", 32, 0)),
            (259, 3, 1, struct.pack(">HH", 1, 0)),
            (273, 4, 1, struct.pack(">I", 8 + 2 + 12 * 7 + 4)),
            (279, 4, 1, struct.pack(">I", len(pix))),
            (339, 3, 1, struct.pack(">HH", 3, 0)),
        ]
        ifd = struct.pack(">H", len(entries))
        for tag, ftype, count, val in entries:
            ifd += struct.pack(">HHI", tag, ftype, count) + val
        ifd += struct.pack(">I", 0)
        data = struct.pack(">2sHI", b"MM", 42, 8) + ifd + pix
        back, meta = tiffio.read_geotiff(data)
        np.testing.assert_array_equal(back, g)
        assert meta["epsg"] is None  # no geo keys in this fixture

    def test_multiband_chunky_reads_band_1(self):
        # the reference reads band 1 of ANY raster (core.py:68 src.read(1));
        # build a 3-band chunky (interleaved) float32 TIFF by hand
        import struct

        h, w, spp = 5, 7, 3
        bands = np.arange(h * w * spp, dtype=np.float32).reshape(h, w, spp)
        pix = bands.tobytes()  # chunky interleave is the natural C order
        entries = [
            (256, 4, 1, struct.pack("<I", w)),
            (257, 4, 1, struct.pack("<I", h)),
            (259, 3, 1, struct.pack("<HH", 1, 0)),
            (273, 4, 1, struct.pack("<I", 0)),  # patched below
            (277, 3, 1, struct.pack("<HH", spp, 0)),
            (279, 4, 1, struct.pack("<I", len(pix))),
            (284, 3, 1, struct.pack("<HH", 1, 0)),  # chunky
            (339, 3, 1, struct.pack("<HH", 3, 0)),
        ]
        # BitsPerSample with count=3 must live out-of-line (6 bytes)
        n_entries = len(entries) + 1
        bps_off = 8 + 2 + 12 * n_entries + 4
        entries.insert(2, (258, 3, 3, struct.pack("<I", bps_off)))
        strip_at = bps_off + 6
        entries = [(t, f, c, struct.pack("<I", strip_at)) if t == 273 else (t, f, c, v)
                   for t, f, c, v in entries]
        ifd = struct.pack("<H", n_entries)
        for tag, ftype, count, val in sorted(entries):
            ifd += struct.pack("<HHI", tag, ftype, count) + val.ljust(4, b"\x00")[:4]
        ifd += struct.pack("<I", 0)
        overflow = struct.pack("<3H", 32, 32, 32)
        data = struct.pack("<2sHI", b"II", 42, 8) + ifd + overflow + pix
        grid, _ = tiffio.read_geotiff(data)
        np.testing.assert_array_equal(grid, bands[:, :, 0])

    def test_multiband_planar_reads_band_1(self):
        # PlanarConfiguration=2: strips come band-by-band; band 1 = first
        # ceil(h / rows_per_strip) strips. Single strip per band here.
        import struct

        h, w, spp = 5, 7, 3
        bands = np.arange(h * w * spp, dtype=np.float32).reshape(spp, h, w)
        pix = bands.tobytes()  # planar: band planes concatenated
        band_bytes = h * w * 4
        entries = [
            (256, 4, 1, struct.pack("<I", w)),
            (257, 4, 1, struct.pack("<I", h)),
            (259, 3, 1, struct.pack("<HH", 1, 0)),
            (273, 4, 3, None),  # out-of-line offsets, patched below
            (277, 3, 1, struct.pack("<HH", spp, 0)),
            (278, 4, 1, struct.pack("<I", h)),
            (279, 4, 3, None),  # out-of-line counts
            (284, 3, 1, struct.pack("<HH", 2, 0)),  # planar
            (339, 3, 1, struct.pack("<HH", 3, 0)),
        ]
        n_entries = len(entries) + 1  # + BitsPerSample
        ifd_end = 8 + 2 + 12 * n_entries + 4
        bps_off, off_off, cnt_off = ifd_end, ifd_end + 6, ifd_end + 6 + 12
        strip_at = cnt_off + 12
        entries.insert(2, (258, 3, 3, struct.pack("<I", bps_off)))
        vals = {273: struct.pack("<I", off_off), 279: struct.pack("<I", cnt_off)}
        ifd = struct.pack("<H", n_entries)
        for tag, ftype, count, val in sorted(entries):
            ifd += struct.pack("<HHI", tag, ftype, count) + (vals.get(tag, val) or b"").ljust(4, b"\x00")[:4]
        ifd += struct.pack("<I", 0)
        overflow = struct.pack("<3H", 32, 32, 32)
        overflow += struct.pack("<3I", *(strip_at + i * band_bytes for i in range(spp)))
        overflow += struct.pack("<3I", band_bytes, band_bytes, band_bytes)
        data = struct.pack("<2sHI", b"II", 42, 8) + ifd + overflow + pix
        grid, _ = tiffio.read_geotiff(data)
        np.testing.assert_array_equal(grid, bands[0])

    def test_rejects_compressed_and_garbage(self):
        with pytest.raises(ValueError, match="byte-order"):
            tiffio.read_geotiff(b"PK\x03\x04 definitely not a tiff")
        data = bytearray(tiffio.write_geotiff(_grid(), 0, 0, 1.0, 1.0))
        # flip the Compression tag value to 7 (JPEG — entropy coding, out of
        # the module's honest boundary): entry order is fixed, so find it by
        # scanning the IFD. (5/LZW graduated to a supported codec in r4.)
        import struct

        n = struct.unpack("<H", data[8:10])[0]
        for i in range(n):
            off = 10 + 12 * i
            tag = struct.unpack("<H", data[off : off + 2])[0]
            if tag == 259:
                data[off + 8 : off + 10] = struct.pack("<H", 7)
        with pytest.raises(ValueError, match="compression 7"):
            tiffio.read_geotiff(bytes(data))

    def test_deflate_roundtrip_and_size(self):
        g = _grid()
        plain = tiffio.write_geotiff(g, 2.0, 36.0, 1.0, 1.0)
        packed = tiffio.write_geotiff(g, 2.0, 36.0, 1.0, 1.0, compress=True)
        assert len(packed) < len(plain)
        grid, meta = tiffio.read_geotiff(packed)
        np.testing.assert_array_equal(grid, g)
        assert meta["epsg"] == 32631 and meta["x0"] == 2.0

    def test_deflate_corrupt_strip_raises(self):
        # a half-delivered Deflate strip surfaces as the typed ValueError
        # (the capped decompressor returns the partial prefix without an
        # exception; the assembly's expected-size check is what fires)
        import struct

        data = bytearray(tiffio.write_geotiff(_grid(), 0.0, 0.0, 1.0, 1.0, compress=True))
        n = struct.unpack("<H", data[8:10])[0]
        for i in range(n):
            off = 10 + 12 * i
            tag = struct.unpack("<H", data[off : off + 2])[0]
            if tag == 279:  # single-strip byte count, inline
                (scnt,) = struct.unpack("<I", data[off + 8 : off + 12])
                data[off + 8 : off + 12] = struct.pack("<I", scnt // 2)
        with pytest.raises(ValueError, match="corrupt|truncated"):
            tiffio.read_geotiff(bytes(data))

    @staticmethod
    def _build_predictor2(pix: bytes, h: int, w: int, bits: int, sfmt: int) -> bytes:
        """Minimal little-endian single-strip TIFF: Deflate + Predictor 2."""
        import struct

        entries = [
            (256, 4, 1, struct.pack("<I", w)),
            (257, 4, 1, struct.pack("<I", h)),
            (258, 3, 1, struct.pack("<HH", bits, 0)),
            (259, 3, 1, struct.pack("<HH", 8, 0)),  # Deflate
            (273, 4, 1, None),  # patched to the strip offset
            (277, 3, 1, struct.pack("<HH", 1, 0)),
            (279, 4, 1, struct.pack("<I", len(pix))),
            (317, 3, 1, struct.pack("<HH", 2, 0)),  # horizontal predictor
            (339, 3, 1, struct.pack("<HH", sfmt, 0)),
        ]
        strip_at = 8 + 2 + 12 * len(entries) + 4
        ifd = struct.pack("<H", len(entries))
        for tag, ftype, count, val in sorted(entries):
            v = struct.pack("<I", strip_at) if tag == 273 else val
            ifd += struct.pack("<HHI", tag, ftype, count) + v.ljust(4, b"\x00")[:4]
        ifd += struct.pack("<I", 0)
        return struct.pack("<2sHI", b"II", 42, 8) + ifd + pix

    def test_predictor2_deflate_uint16(self):
        import zlib

        h, w = 4, 6
        rng = np.random.default_rng(3)
        truth = rng.integers(0, 60000, (h, w), dtype=np.uint16)
        diff = truth.copy()
        diff[:, 1:] = (truth[:, 1:].astype(np.int64) - truth[:, :-1].astype(np.int64)) % 65536
        pix = zlib.compress(diff.astype("<u2").tobytes())
        grid, _ = tiffio.read_geotiff(self._build_predictor2(pix, h, w, 16, 1))
        np.testing.assert_array_equal(grid, truth)

    @staticmethod
    def _build_tiled(h, w, tw, tl, tiles, compress=False):
        """Minimal little-endian tiled float32 TIFF; ``tiles`` in row-major
        tile order, each (tl, tw) float32, already edge-padded."""
        import struct
        import zlib

        payloads = [t.astype("<f4").tobytes() for t in tiles]
        if compress:
            payloads = [zlib.compress(p) for p in payloads]
        n_tiles = len(payloads)
        entries = [
            (256, 4, 1, struct.pack("<I", w)),
            (257, 4, 1, struct.pack("<I", h)),
            (258, 3, 1, struct.pack("<HH", 32, 0)),
            (259, 3, 1, struct.pack("<HH", 8 if compress else 1, 0)),
            (277, 3, 1, struct.pack("<HH", 1, 0)),
            (322, 4, 1, struct.pack("<I", tw)),
            (323, 4, 1, struct.pack("<I", tl)),
            (324, 4, n_tiles, None),  # offsets, patched
            (325, 4, n_tiles, None),  # byte counts, patched
            (339, 3, 1, struct.pack("<HH", 3, 0)),
        ]
        ifd_end = 8 + 2 + 12 * len(entries) + 4
        off_at, cnt_at = ifd_end, ifd_end + 4 * n_tiles
        data_at = cnt_at + 4 * n_tiles
        offs, pos = [], data_at
        for p in payloads:
            offs.append(pos)
            pos += len(p)
        vals = {324: struct.pack("<I", off_at), 325: struct.pack("<I", cnt_at)}
        ifd = struct.pack("<H", len(entries))
        for tag, ftype, count, val in sorted(entries):
            v = vals.get(tag, val)
            if count == 1 or tag not in (324, 325):
                ifd += struct.pack("<HHI", tag, ftype, count) + (v or b"").ljust(4, b"\x00")[:4]
            else:
                ifd += struct.pack("<HHI", tag, ftype, count) + v
        ifd += struct.pack("<I", 0)
        overflow = struct.pack(f"<{n_tiles}I", *offs)
        overflow += struct.pack(f"<{n_tiles}I", *(len(p) for p in payloads))
        return struct.pack("<2sHI", b"II", 42, 8) + ifd + overflow + b"".join(payloads)

    @pytest.mark.parametrize("compress", [False, True])
    def test_tiled_layout_with_edge_padding(self, compress):
        # 5×7 image in 4×4 tiles: 2×2 tile grid, right/bottom tiles padded
        h, w, tw, tl = 5, 7, 4, 4
        truth = np.arange(h * w, dtype=np.float32).reshape(h, w) + 0.5
        canvas = np.full((8, 8), -1.0, dtype=np.float32)
        canvas[:h, :w] = truth
        tiles = [canvas[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
                 for ty in range(2) for tx in range(2)]
        grid, _ = tiffio.read_geotiff(self._build_tiled(h, w, tw, tl, tiles, compress))
        np.testing.assert_array_equal(grid, truth)

    def test_predictor2_float_rejected(self):
        import zlib

        g = np.arange(12, dtype="<f4").reshape(3, 4)
        pix = zlib.compress(g.tobytes())
        with pytest.raises(ValueError, match="predictor 2 with float"):
            tiffio.read_geotiff(self._build_predictor2(pix, 3, 4, 32, 3))


class TestGeoTiffIngest:
    """The documented swap-in path, now runnable WITHOUT rasterio: .tif files
    → canonical image table → dtm_transform, bit-exact vs golden."""

    def _write_tif(self, tmp_path, name="dsm.tif", nodata=NODATA_DEFAULT):
        g = _grid()
        path = str(tmp_path / name)
        with open(path, "wb") as f:
            f.write(tiffio.write_geotiff(g, x0=500000.0, y0=4000000.0, xres=1.0,
                                         yres=1.0, epsg=32631, nodata=nodata))
        return path, g

    def test_roundtrip_and_dtm(self, spark, tmp_path):
        from dsm2dtm_spark import codecs, golden
        from dsm2dtm_spark.plans import dtm_transform

        path, grid = self._write_tif(tmp_path)
        images = geotiff.read_geotiff_table(spark, [path])  # auto → builtin here
        row = images.collect()[0]
        assert (row.w, row.h, row.fmt, row.crs) == (60, 60, "raw_f32", 32631)
        assert row.is_geographic is False
        np.testing.assert_array_equal(codecs.decode(bytes(row.bytes), 60, 60, "raw_f32"), grid)
        out = dtm_transform(images).collect()[0]
        want = golden.dsm_to_dtm(grid, (1.0, 1.0))
        np.testing.assert_array_equal(codecs.decode(bytes(out.bytes), 60, 60, "raw_f32"), want)

    def test_missing_crs_hard_fails(self, spark, tmp_path):
        # reference core.py:60-61: no CRS → error. Strip the geo key tag by
        # writing a bare TIFF (no epsg) via the MM-less low-level path.
        g = _grid()
        import struct

        pix = g.tobytes()
        entries = [
            (256, 4, 1, struct.pack("<I", 60)),
            (257, 4, 1, struct.pack("<I", 60)),
            (258, 3, 1, struct.pack("<HH", 32, 0)),
            (259, 3, 1, struct.pack("<HH", 1, 0)),
            (273, 4, 1, struct.pack("<I", 8 + 2 + 12 * 7 + 4)),
            (279, 4, 1, struct.pack("<I", len(pix))),
            (339, 3, 1, struct.pack("<HH", 3, 0)),
        ]
        ifd = struct.pack("<H", len(entries))
        for tag, ftype, count, val in entries:
            ifd += struct.pack("<HHI", tag, ftype, count) + val
        ifd += struct.pack("<I", 0)
        path = str(tmp_path / "nocrs.tif")
        with open(path, "wb") as f:
            f.write(struct.pack("<2sHI", b"II", 42, 8) + ifd + pix)
        with pytest.raises(Exception, match="no CRS"):
            tiffio.read_geotiff_table(spark, [path]).collect()

    def test_nan_nodata_normalized(self, spark, tmp_path):
        from dsm2dtm_spark import codecs

        g = _grid()
        g[0, 0] = np.nan
        path = str(tmp_path / "nan.tif")
        with open(path, "wb") as f:
            f.write(tiffio.write_geotiff(g, 0, 0, 1.0, 1.0, epsg=32631, nodata=float("nan")))
        row = tiffio.read_geotiff_table(spark, [path]).collect()[0]
        back = codecs.decode(bytes(row.bytes), 60, 60, "raw_f32")
        assert back[0, 0] == NODATA_DEFAULT  # NaN → sentinel, never smears

    def test_sink_skips_quarantined_rows(self, spark, tmp_path):
        # permissive plans mark poison rows with bytes=NULL; the sink must
        # skip them, not crash the whole export after the main job succeeded
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "image_id": ["ok", "poisoned"],
                "bytes": [tiffio.np.zeros((4, 4), dtype="f4").tobytes(), None],
                "w": [4, 4],
                "h": [4, 4],
                "fmt": ["raw_f32", "raw_f32"],
            }
        )
        outd = str(tmp_path / "sink")
        paths = tiffio.write_geotiff_files(spark.createDataFrame(pdf), outd)
        assert len(paths) == 1 and "ok" in paths[0]

    def test_sink_duplicate_basenames_do_not_collide(self, spark, tmp_path):
        # a/site.tif and b/site.tif must produce two distinct outputs
        import pandas as pd

        g = tiffio.np.arange(16, dtype="f4").reshape(4, 4)
        pdf = pd.DataFrame(
            {
                "image_id": ["a/site.tif", "b/site.tif"],
                "bytes": [g.tobytes(), (g + 1).tobytes()],
                "w": [4, 4],
                "h": [4, 4],
                "fmt": ["raw_f32", "raw_f32"],
            }
        )
        outd = str(tmp_path / "dups")
        paths = tiffio.write_geotiff_files(spark.createDataFrame(pdf), outd)
        assert len(paths) == 2 and len(set(paths)) == 2

    def test_write_geotiff_files_sink_roundtrip(self, spark, tmp_path):
        # full reference job shape: .tif in → DTM → .tif out → re-ingest equal
        from dsm2dtm_spark import codecs, golden
        from dsm2dtm_spark.plans import dtm_transform

        path, grid = self._write_tif(tmp_path)
        images = geotiff.read_geotiff_table(spark, [path])
        dtm = dtm_transform(images)
        # carry geo columns through for the sink
        geo_cols = images.select("image_id", "lon0", "lat0", "xres_m", "yres_m", "crs", "is_geographic")
        dtm_geo = dtm.join(geo_cols, on="image_id")
        outd = str(tmp_path / "out")
        paths = tiffio.write_geotiff_files(dtm_geo, outd)
        assert len(paths) == 1 and paths[0].endswith("_dtm.tif")
        with open(paths[0], "rb") as f:
            back, meta = tiffio.read_geotiff(f.read())
        want = golden.dsm_to_dtm(grid, (1.0, 1.0))
        np.testing.assert_array_equal(back, want)
        assert meta["epsg"] == 32631 and meta["x0"] == 500000.0


@pytest.mark.skipif(not geotiff.HAS_RASTERIO, reason="rasterio not installed in this environment")
class TestRasterioAdapter:
    """Runs only where rasterio exists; asserts the rasterio reader and the
    builtin reader agree on the same file."""

    def test_rasterio_matches_builtin(self, spark, tmp_path):
        g = _grid()
        path = str(tmp_path / "dsm.tif")
        with open(path, "wb") as f:
            f.write(tiffio.write_geotiff(g, 500000.0, 4000000.0, 1.0, 1.0, epsg=32631))
        a = geotiff.read_geotiff_table(spark, [path], reader="rasterio").collect()[0]
        b = geotiff.read_geotiff_table(spark, [path], reader="builtin").collect()[0]
        assert bytes(a.bytes) == bytes(b.bytes)
        assert (a.crs, a.xres_m, a.yres_m) == (b.crs, b.xres_m, b.yres_m)


class TestBigTiff:
    @pytest.mark.parametrize("compress", [False, True])
    def test_bigtiff_roundtrip(self, compress):
        g = _grid()
        data = tiffio.write_geotiff(
            g, 2.0, 36.0, 1.0, 1.0, epsg=4326, compress=compress, bigtiff=True
        )
        assert data[2:4] == b"\x2b\x00"  # magic 43, little-endian
        grid, meta = tiffio.read_geotiff(data)
        np.testing.assert_array_equal(grid, g)
        assert meta["epsg"] == 4326 and meta["is_geographic"] is True
        assert meta["x0"] == 2.0 and meta["y0"] == 36.0

    def test_bigtiff_bad_offset_size_rejected(self):
        import struct

        data = bytearray(tiffio.write_geotiff(_grid(), 0.0, 0.0, 1.0, 1.0, bigtiff=True))
        data[4:6] = struct.pack("<H", 4)  # invalid offset size
        with pytest.raises(ValueError, match="offset size"):
            tiffio.read_geotiff(bytes(data))


class TestSparseAndRobustness:
    def test_sparse_tiles_fill_nodata(self):
        # GDAL SPARSE_OK: empty blocks have offset 0 / count 0 and read as
        # nodata (0 without a GDAL_NODATA tag). Zero out tile 3's entry.
        import struct

        h, w, tw, tl = 5, 7, 4, 4
        truth = np.arange(h * w, dtype=np.float32).reshape(h, w) + 0.5
        canvas = np.full((8, 8), -1.0, dtype=np.float32)
        canvas[:h, :w] = truth
        tiles = [canvas[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
                 for ty in range(2) for tx in range(2)]
        data = bytearray(TestTiffCodec._build_tiled(h, w, tw, tl, tiles, False))
        # tile offsets/counts live out-of-line right after the IFD
        ifd_end = 8 + 2 + 12 * 10 + 4
        data[ifd_end + 4 * 3 : ifd_end + 4 * 4] = struct.pack("<I", 0)       # offset[3] = 0
        data[ifd_end + 16 + 4 * 3 : ifd_end + 16 + 4 * 4] = struct.pack("<I", 0)  # count[3] = 0
        grid, _ = tiffio.read_geotiff(bytes(data))
        want = truth.copy()
        want[4:5, 4:7] = 0.0  # the sparse bottom-right tile's live region
        np.testing.assert_array_equal(grid, want)

    def test_sparse_strip_fills_nodata_value(self):
        # zero a middle strip's offset/count in a multi-strip file carrying
        # GDAL_NODATA: the gap must read as the nodata value
        import struct

        rng = np.random.default_rng(5)
        g = rng.normal(100, 10, (400, 200)).astype(np.float32)
        data = bytearray(tiffio.write_geotiff(g, 0, 0, 1.0, 1.0))
        n = struct.unpack("<H", data[8:10])[0]
        offs = cnts = None
        for i in range(n):
            off = 10 + 12 * i
            tag, ftype, count = struct.unpack("<HHI", data[off : off + 8])
            if tag in (273, 279):
                (voff,) = struct.unpack("<I", data[off + 8 : off + 12])
                vals = list(struct.unpack(f"<{count}I", data[voff : voff + 4 * count]))
                if tag == 273:
                    offs = (voff, vals)
                else:
                    cnts = (voff, vals)
        assert offs and cnts and len(offs[1]) > 2
        rps = 65536 // (200 * 4)
        k = 1  # second strip
        data[offs[0] + 4 * k : offs[0] + 4 * (k + 1)] = struct.pack("<I", 0)
        data[cnts[0] + 4 * k : cnts[0] + 4 * (k + 1)] = struct.pack("<I", 0)
        grid, meta = tiffio.read_geotiff(bytes(data))
        want = g.copy()
        want[k * rps : (k + 1) * rps] = meta["nodata"]
        np.testing.assert_array_equal(grid, want)

    def test_truncated_bigtiff_header_typed_error(self):
        with pytest.raises(ValueError, match="truncated"):
            tiffio.read_geotiff(b"II+\x00\x08\x00\x00\x00")

    def test_deflate_bomb_is_capped_not_materialized(self):
        # a strip that inflates far past the image size must not allocate
        # past the expected byte count (and the file still errors as
        # truncated REAL data rather than OOMing)
        import struct
        import zlib

        bomb = zlib.compress(b"\x00" * (64 << 20))  # 64 MiB of zeros, ~64 KiB packed
        entries = [
            (256, 4, 1, struct.pack("<I", 4)),
            (257, 4, 1, struct.pack("<I", 3)),
            (258, 3, 1, struct.pack("<HH", 32, 0)),
            (259, 3, 1, struct.pack("<HH", 8, 0)),
            (273, 4, 1, None),
            (279, 4, 1, struct.pack("<I", len(bomb))),
            (339, 3, 1, struct.pack("<HH", 3, 0)),
        ]
        strip_at = 8 + 2 + 12 * len(entries) + 4
        ifd = struct.pack("<H", len(entries))
        for tag, ftype, count, val in sorted(entries):
            v = struct.pack("<I", strip_at) if tag == 273 else val
            ifd += struct.pack("<HHI", tag, ftype, count) + v.ljust(4, b"\x00")[:4]
        ifd += struct.pack("<I", 0)
        data = struct.pack("<2sHI", b"II", 42, 8) + ifd + bomb
        grid, _ = tiffio.read_geotiff(data)  # 3×4 zeros — capped, not 64 MiB
        np.testing.assert_array_equal(grid, np.zeros((3, 4), dtype=np.float32))


class TestEmbeddedOverviews:
    @pytest.mark.parametrize("bigtiff,compress", [(False, False), (False, True), (True, True)])
    def test_pyramid_in_file_roundtrip(self, bigtiff, compress):
        from dsm2dtm_spark.operators.terrain import overview_levels_numpy

        g = _grid()
        levels = overview_levels_numpy(g, 2)
        ovs = []
        for _, cnt, value in levels:
            ov = np.where(cnt > 0, value, float(NODATA_DEFAULT)).astype(np.float32)
            ovs.append(ov)
        data = tiffio.write_geotiff(
            g, 500000.0, 4000000.0, 1.0, 1.0, epsg=32631,
            compress=compress, bigtiff=bigtiff, overviews=ovs,
        )
        base, meta0 = tiffio.read_geotiff(data)
        np.testing.assert_array_equal(base, g)
        assert (meta0["xres"], meta0["epsg"]) == (1.0, 32631)
        for k, ov in enumerate(ovs, start=1):
            got, meta = tiffio.read_geotiff(data, ifd_index=k)
            np.testing.assert_array_equal(got, ov)
            # overview pixel size scales by the actual reduction factor
            assert meta["xres"] == pytest.approx(g.shape[1] / ov.shape[1])
            assert meta["nodata"] == NODATA_DEFAULT
        with pytest.raises(ValueError, match="no IFD"):
            tiffio.read_geotiff(data, ifd_index=len(ovs) + 1)

    def test_plain_file_has_single_ifd(self):
        data = tiffio.write_geotiff(_grid(), 0.0, 0.0, 1.0, 1.0)
        with pytest.raises(ValueError, match="no IFD"):
            tiffio.read_geotiff(data, ifd_index=1)


class TestReviewHardening:
    def test_trailing_bomb_strip_never_inflated(self):
        # extra strip entries past the image's byte need must be ignored:
        # cap 0 means UNLIMITED to zlib, so the loop has to break instead
        import struct
        import zlib

        g = np.arange(12, dtype="<f4").reshape(3, 4)
        good = zlib.compress(g.tobytes())
        bomb = zlib.compress(b"\x00" * (32 << 20))
        entries = [
            (256, 4, 1, struct.pack("<I", 4)),
            (257, 4, 1, struct.pack("<I", 3)),
            (258, 3, 1, struct.pack("<HH", 32, 0)),
            (259, 3, 1, struct.pack("<HH", 8, 0)),
            (273, 4, 2, None),
            (278, 4, 1, struct.pack("<I", 3)),
            (279, 4, 2, None),
            (339, 3, 1, struct.pack("<HH", 3, 0)),
        ]
        ifd_end = 8 + 2 + 12 * len(entries) + 4
        off_at, cnt_at = ifd_end, ifd_end + 8
        data_at = cnt_at + 8
        vals = {273: struct.pack("<I", off_at), 279: struct.pack("<I", cnt_at)}
        ifd = struct.pack("<H", len(entries))
        for tag, ftype, count, val in sorted(entries):
            ifd += struct.pack("<HHI", tag, ftype, count) + vals.get(tag, val or b"").ljust(4, b"\x00")[:4]
        ifd += struct.pack("<I", 0)
        overflow = struct.pack("<2I", data_at, data_at + len(good))
        overflow += struct.pack("<2I", len(good), len(bomb))
        data = struct.pack("<2sHI", b"II", 42, 8) + ifd + overflow + good + bomb
        grid, _ = tiffio.read_geotiff(data)
        np.testing.assert_array_equal(grid, g)

    def test_integer_file_with_nan_nodata_still_reads(self):
        # GDAL_NODATA 'nan' on a uint16 file: unrepresentable fill must not
        # crash a file that has no sparse blocks
        import struct

        h, w = 3, 4
        g = np.arange(h * w, dtype="<u2").reshape(h, w)
        nodata_ascii = b"nan\x00"
        entries = [
            (256, 4, 1, struct.pack("<I", w)),
            (257, 4, 1, struct.pack("<I", h)),
            (258, 3, 1, struct.pack("<HH", 16, 0)),
            (259, 3, 1, struct.pack("<HH", 1, 0)),
            (273, 4, 1, None),
            (279, 4, 1, struct.pack("<I", g.nbytes)),
            (339, 3, 1, struct.pack("<HH", 1, 0)),
            (42113, 2, len(nodata_ascii), nodata_ascii),  # 4 bytes → inline
        ]
        ifd_end = 8 + 2 + 12 * len(entries) + 4
        strip_at = ifd_end
        vals = {273: struct.pack("<I", strip_at)}
        ifd = struct.pack("<H", len(entries))
        for tag, ftype, count, val in sorted(entries):
            ifd += struct.pack("<HHI", tag, ftype, count) + vals.get(tag, val or b"").ljust(4, b"\x00")[:4]
        ifd += struct.pack("<I", 0)
        data = struct.pack("<2sHI", b"II", 42, 8) + ifd + g.tobytes()
        grid, meta = tiffio.read_geotiff(data)
        np.testing.assert_array_equal(grid, g)
        assert np.isnan(meta["nodata"])

    def test_empty_grid_rejected_typed(self):
        with pytest.raises(ValueError, match="non-empty"):
            tiffio.write_geotiff(np.zeros((0, 5), dtype=np.float32), 0, 0, 1.0, 1.0)
        with pytest.raises(ValueError, match="non-empty"):
            tiffio.write_geotiff(
                np.ones((4, 4), dtype=np.float32), 0, 0, 1.0, 1.0,
                overviews=[np.zeros((4, 0), dtype=np.float32)],
            )

    def test_overview_kernel_honors_custom_nodata(self):
        from dsm2dtm_spark.operators.terrain import overview_levels_numpy

        g = np.array([[1.0, -9999.0], [3.0, 5.0]], dtype=np.float32)
        (_, cnt, value), = overview_levels_numpy(g, 1, nodata=-9999.0)
        assert cnt[0, 0] == 3 and value[0, 0] == (1.0 + 3.0 + 5.0) / 3.0


class TestForgedHeaderBound:
    """A crafted few-hundred-byte file claiming huge dimensions must raise
    the typed ValueError BEFORE any multi-GB allocation (the header-claim
    bound complements the per-strip Deflate-bomb cap)."""

    @staticmethod
    def _patch_tag(data: bytearray, tag: int, value: int) -> None:
        import struct

        n = struct.unpack("<H", data[8:10])[0]
        for i in range(n):
            off = 10 + 12 * i
            t, ftype = struct.unpack("<HH", data[off : off + 4])
            if t == tag:
                if ftype == 3:
                    data[off + 8 : off + 10] = struct.pack("<H", value)
                else:
                    data[off + 8 : off + 12] = struct.pack("<I", value)
                return
        raise AssertionError(f"tag {tag} not found")

    def test_strip_path_forged_dims_rejected(self):
        data = bytearray(tiffio.write_geotiff(_grid(), 0, 0, 1.0, 1.0))
        self._patch_tag(data, 256, 200_000)  # ImageWidth
        self._patch_tag(data, 257, 200_000)  # ImageLength → 160 GB claim
        with pytest.raises(ValueError, match="forged or corrupt"):
            tiffio.read_geotiff(bytes(data))

    def test_tiled_path_forged_tile_dims_rejected(self):
        h, w, tw, tl = 5, 7, 4, 4
        canvas = np.zeros((8, 8), dtype=np.float32)
        tiles = [canvas[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
                 for ty in range(2) for tx in range(2)]
        data = bytearray(TestTiffCodec._build_tiled(h, w, tw, tl, tiles, False))
        self._patch_tag(data, 322, 60_000)  # TileWidth
        self._patch_tag(data, 323, 60_000)  # TileLength → multi-TB claim
        with pytest.raises(ValueError, match="forged or corrupt"):
            tiffio.read_geotiff(bytes(data))

    def test_sparse_but_legit_small_file_still_reads(self):
        # the 64 MiB floor: a tiny file with a real (≤ floor) grid of sparse
        # strips is legitimate and must keep reading
        import struct

        g = np.zeros((512, 512), dtype=np.float32)
        data = bytearray(tiffio.write_geotiff(g, 0, 0, 1.0, 1.0, compress=True))
        n = struct.unpack("<H", data[8:10])[0]
        grid, _ = tiffio.read_geotiff(bytes(data))
        assert grid.shape == (512, 512)


def _lzw_encode(data: bytes) -> bytes:
    """Independent TIFF-LZW encoder (test-side reference, the stream GDAL /
    libtiff would produce): MSB-first packing, ClearCode up front and on
    table-full, EOI, EARLY CHANGE (width bumps when the next free slot is
    (1<<width)-1)."""
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width, next_code = 9, 258
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}

    def emit(code):
        out_bits.append((code, width))

    emit(256)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        # the encoder's table runs ONE ENTRY AHEAD of the decoder's (the
        # decoder adds each entry only on the NEXT code), so its width bump
        # lands at 2^w while the decoder's "early change" lands at 2^w - 1
        if next_code == (1 << width) and width < 12:
            width += 1
        w = c
        if next_code >= 4094:  # table full: clear and restart
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            width, next_code = 9, 258
    if w:
        emit(table[w])
    emit(257)
    # pack MSB-first
    acc = n = 0
    buf = bytearray()
    for code, cw in out_bits:
        acc = (acc << cw) | code
        n += cw
        while n >= 8:
            n -= 8
            buf.append((acc >> n) & 0xFF)
    if n:
        buf.append((acc << (8 - n)) & 0xFF)
    return bytes(buf)


class TestLZW:
    def test_hand_built_stream_decodes(self):
        # codes 256,7,258,8,257 at 9 bits ≡ the spec walkthrough for
        # [7,7,7,8] (KwKwK case included): decode must reproduce it
        from dsm2dtm_spark.sources.tiffio import _lzw_decode

        codes = [(256, 9), (7, 9), (258, 9), (8, 9), (257, 9)]
        acc = n = 0
        buf = bytearray()
        for code, cw in codes:
            acc = (acc << cw) | code
            n += cw
            while n >= 8:
                n -= 8
                buf.append((acc >> n) & 0xFF)
        if n:
            buf.append((acc << (8 - n)) & 0xFF)
        assert _lzw_decode(bytes(buf), 100) == bytes([7, 7, 7, 8])

    @pytest.mark.parametrize("size", [40, 3000, 30000])
    def test_roundtrip_across_width_changes(self, size):
        # 3000 random bytes cross the 9→10→11-bit early-change boundaries;
        # 30000 forces a mid-stream ClearCode (table full at 4094)
        from dsm2dtm_spark.sources.tiffio import _lzw_decode

        rng = np.random.default_rng(size)
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data), size) == data

    def test_cap_bounds_output(self):
        from dsm2dtm_spark.sources.tiffio import _lzw_decode

        enc = _lzw_encode(b"\x01" * 100000)
        assert len(_lzw_decode(enc, 64)) == 64

    def test_corrupt_stream_raises_typed(self):
        from dsm2dtm_spark.sources.tiffio import _lzw_decode

        # first data code references a not-yet-defined table entry
        codes = [(256, 9), (300, 9)]
        acc, n, buf = 0, 0, bytearray()
        for code, cw in codes:
            acc = (acc << cw) | code
            n += cw
            while n >= 8:
                n -= 8
                buf.append((acc >> n) & 0xFF)
        buf.append((acc << (8 - n)) & 0xFF)
        with pytest.raises(ValueError, match="LZW"):
            _lzw_decode(bytes(buf), 100)

    def _lzw_file(self, g: np.ndarray, predictor: int = 1) -> bytes:
        """Build a single-strip LZW TIFF the way GDAL would (optionally with
        the horizontal predictor on integer samples)."""
        import struct

        h, w = g.shape
        if predictor == 2:
            d = g.astype(np.int64)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            raw = (d % (1 << (g.itemsize * 8))).astype(g.dtype).tobytes()
        else:
            raw = g.tobytes()
        pix = _lzw_encode(raw)
        bits = g.itemsize * 8
        sfmt = 3 if g.dtype.kind == "f" else 1
        entries = [
            (256, 4, 1, struct.pack("<I", w)),
            (257, 4, 1, struct.pack("<I", h)),
            (258, 3, 1, struct.pack("<HH", bits, 0)),
            (259, 3, 1, struct.pack("<HH", 5, 0)),
            (273, 4, 1, None),
            (279, 4, 1, struct.pack("<I", len(pix))),
            (317, 3, 1, struct.pack("<HH", predictor, 0)),
            (339, 3, 1, struct.pack("<HH", sfmt, 0)),
        ]
        ifd_end = 8 + 2 + 12 * len(entries) + 4
        vals = {273: struct.pack("<I", ifd_end)}
        ifd = struct.pack("<H", len(entries))
        for tag, ftype, count, val in sorted(entries):
            ifd += struct.pack("<HHI", tag, ftype, count) + vals.get(tag, val or b"").ljust(4, b"\x00")[:4]
        ifd += struct.pack("<I", 0)
        return struct.pack("<2sHI", b"II", 42, 8) + ifd + pix

    def test_lzw_float32_file_reads_exact(self):
        rng = np.random.default_rng(11)
        g = rng.normal(120, 15, (37, 53)).astype("<f4")
        grid, _ = tiffio.read_geotiff(self._lzw_file(g))
        np.testing.assert_array_equal(grid, g)

    def test_lzw_uint16_with_horizontal_predictor(self):
        # the standard `-co COMPRESS=LZW -co PREDICTOR=2` legacy layout
        rng = np.random.default_rng(12)
        g = (rng.integers(0, 4000, (29, 41))).astype("<u2")
        grid, _ = tiffio.read_geotiff(self._lzw_file(g, predictor=2))
        np.testing.assert_array_equal(grid, g)


class TestObjectIngest:
    """Path-or-open-object ingest parity (reference core.py:126-136,
    test_core.py:189-198 `test_generate_dtm_with_object`): the engine must
    accept an open handle / raw bytes / (array, profile) and run the DTM
    pipeline on them exactly as it would on the file path."""

    @staticmethod
    def _tif(tmp_path, name="site.tif", seed=4):
        rng = np.random.default_rng(seed)
        g = rng.normal(100, 3, (24, 30)).astype(np.float32)
        data = tiffio.write_geotiff(g, x0=500000.0, y0=4000000.0, xres=1.0, yres=1.0, epsg=32631)
        p = tmp_path / name
        p.write_bytes(data)
        return str(p), g

    def test_generate_dtm_with_object(self, spark, tmp_path):
        # the reference scenario, distributed: open the file, hand the OBJECT
        # (not the path) to the ingest, generate the DTM, check it ran
        from dsm2dtm_spark import codecs, golden
        from dsm2dtm_spark.plans import dtm_transform

        path, g = self._tif(tmp_path)
        with open(path, "rb") as handle:
            df = tiffio.read_geotiff_objects(spark, [handle])
            rows = dtm_transform(df, radius_m=8.0).collect()
        assert len(rows) == 1 and (rows[0].h, rows[0].w) == (24, 30)
        got = codecs.decode(rows[0].bytes, 24, 30, rows[0].fmt)
        want = golden.dsm_to_dtm(g, (1.0, 1.0), radius_m=8.0)
        np.testing.assert_array_equal(got, want)

    def test_mixed_paths_bytes_handles_arrays(self, spark, tmp_path):
        path, g = self._tif(tmp_path)
        raw = open(path, "rb").read()
        arr_item = ("in_mem", g + 1.0, {"x0": 1.0, "y0": 2.0, "xres": 0.5, "yres": 0.5, "epsg": 32631})
        df = tiffio.read_geotiff_objects(spark, [path, raw, open(path, "rb"), arr_item])
        collected = df.collect()
        assert len(collected) == 4  # the handle's .name == the path string,
        # so the dict below holds 3 distinct ids for 4 rows
        rows = {r.image_id: r for r in collected}
        assert len(rows) == 3
        assert rows["in_mem"].xres_m == 0.5 and rows["in_mem"].crs == 32631
        assert rows["mem_000001.tif"].w == 30
        # all four decode to consistent pixel grids
        from dsm2dtm_spark import codecs

        for r in rows.values():
            assert codecs.decode(r.bytes, r.h, r.w, r.fmt).shape == (24, 30)

    def test_array_without_crs_hard_fails(self, spark):
        with pytest.raises(ValueError, match="no CRS"):
            tiffio.read_raster_array("x", np.zeros((4, 4), np.float32), {"x0": 0.0})

    def test_array_with_explicit_none_nodata(self, spark):
        # rasterio profiles always carry nodata (usually None): must behave
        # exactly like an absent key, not crash on np.isnan(None)
        row = tiffio.read_raster_array(
            "x", np.full((4, 4), 7.0, np.float32), {"epsg": 32631, "nodata": None}
        )
        assert row["crs"] == 32631 and row["w"] == 4

    def test_generator_input_not_exhausted(self, spark, tmp_path):
        path, g = self._tif(tmp_path)
        raw = open(path, "rb").read()
        df = geotiff.read_geotiff_objects(spark, (x for x in [path, raw]), reader="builtin")
        assert df.count() == 2

    def test_dispatching_wrapper_unions_paths_and_objects(self, spark, tmp_path):
        path, g = self._tif(tmp_path)
        df = geotiff.read_geotiff_objects(
            spark, [path, ("mem", g, {"epsg": 32631})], reader="builtin"
        )
        assert df.count() == 2
        with pytest.raises(TypeError, match="expected path"):
            tiffio.read_geotiff_objects(spark, [42])
