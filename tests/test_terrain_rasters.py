"""SRTMHGT / Surfer DSAA+DSBB / EHdr / SAGA (sources.terrain_rasters):
byte/text anchors against the published layouts, round trips, nodata
and row-order conventions, plus a distributed map_batches drive.

Reference behavior: frmts/srtmhgt/srtmhgtdataset.cpp, frmts/gsg/
gsbgdataset.cpp, frmts/raw/ehdrdataset.cpp, frmts/saga/sagadataset.cpp.
"""

import struct

import numpy as np
import pytest

from gdal_ray.sources.terrain_rasters import (
    SRTM_NODATA,
    SURFER_NODATA,
    hgt_corner,
    read_ehdr,
    read_gsag,
    read_gsbg,
    read_saga,
    read_srtmhgt,
    write_ehdr,
    write_gsag,
    write_gsbg,
    write_saga,
    write_srtmhgt,
)


def test_srtmhgt_name_size_and_voids(tmp_path):
    assert hgt_corner("N51E000.hgt") == (51, 0)
    assert hgt_corner("/a/b/S14W077.hgt") == (-14, -77)
    with pytest.raises(ValueError, match="SRTM tile name"):
        hgt_corner("tile.hgt")
    n = 1201
    rng = np.random.default_rng(7)
    g = rng.integers(-200, 8000, (n, n)).astype(np.int16)
    g[3, 5] = SRTM_NODATA
    p = str(tmp_path / "N40W105.hgt")
    write_srtmhgt(p, g)
    # byte anchor: big-endian int16, first sample = NW corner
    raw = open(p, "rb").read(4)
    assert struct.unpack(">h", raw[:2])[0] == g[0, 0]
    assert struct.unpack(">h", raw[2:4])[0] == g[0, 1]
    m = read_srtmhgt(p)
    assert (m["lat"], m["lon"], m["n"]) == (40, -105, n)
    assert m["cellsize"] == pytest.approx(1.0 / 1200)
    np.testing.assert_array_equal(m["raw"], g)
    assert np.isnan(m["grid"][3, 5])
    # float input with NaN voids
    p2 = str(tmp_path / "S01E010.hgt")
    gf = g.astype(np.float64)
    gf[0, 0] = np.nan
    write_srtmhgt(p2, gf)
    m2 = read_srtmhgt(p2)
    assert m2["raw"][0, 0] == SRTM_NODATA
    with pytest.raises(ValueError, match="1201x1201 or 3601x3601"):
        write_srtmhgt(str(tmp_path / "N00E000.hgt"), np.zeros((10, 10)))


def test_gsag_text_anchor_and_roundtrip(tmp_path):
    g = np.array([[1.0, 2.0, 3.0], [4.0, np.nan, 6.0]])
    p = str(tmp_path / "g.grd")
    write_gsag(p, g, xmin=100.0, ymin=200.0, cellsize=10.0)
    lines = open(p).read().splitlines()
    assert lines[0] == "DSAA"
    assert lines[1] == "3 2"
    assert lines[2] == "100.0 120.0"
    assert lines[3] == "200.0 210.0"
    # south row first on disk: row with the NaN (north row index 1)
    assert lines[5].split()[0] == "4.0"
    assert float(lines[5].split()[1]) == pytest.approx(SURFER_NODATA,
                                                       rel=1e-6)
    assert lines[6] == "1.0 2.0 3.0"
    m = read_gsag(p)
    np.testing.assert_array_equal(np.isnan(m["grid"]), np.isnan(g))
    np.testing.assert_allclose(m["grid"][~np.isnan(g)], g[~np.isnan(g)])
    assert (m["xmin"], m["ymin"], m["cellsize"]) == (100.0, 200.0, 10.0)
    assert m["zmin"] == 1.0 and m["zmax"] == 6.0


def test_gsbg_byte_anchors_and_roundtrip(tmp_path):
    g = np.arange(12.0).reshape(3, 4)
    g[0, 1] = np.nan
    p = str(tmp_path / "g6.grd")
    write_gsbg(p, g, xmin=-10.0, ymin=40.0, cellsize=0.5)
    raw = open(p, "rb").read()
    assert raw[:4] == b"DSBB"
    assert struct.unpack("<hh", raw[4:8]) == (4, 3)
    xmin, xmax, ymin, ymax, zmin, zmax = struct.unpack("<6d", raw[8:56])
    assert (xmin, xmax) == (-10.0, -8.5)
    assert (ymin, ymax) == (40.0, 41.0)
    assert zmin == 0.0 and zmax == 11.0
    # first payload float = SW corner (south row first)
    assert struct.unpack("<f", raw[56:60])[0] == 8.0
    m = read_gsbg(p)
    np.testing.assert_array_equal(np.isnan(m["grid"]), np.isnan(g))
    np.testing.assert_allclose(m["grid"][~np.isnan(g)], g[~np.isnan(g)])
    bad = str(tmp_path / "bad.grd")
    open(bad, "wb").write(b"NOPE" + b"\x00" * 60)
    with pytest.raises(ValueError, match="DSBB magic"):
        read_gsbg(bad)


@pytest.mark.parametrize("layout", ["bil", "bip", "bsq"])
@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_ehdr_layout_dtype_matrix(tmp_path, layout, dtype):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 100, (2, 5, 7)).astype(dtype)
    p = str(tmp_path / f"e_{layout}_{np.dtype(dtype).name}.bil")
    write_ehdr(p, img, layout=layout, ul_map=(500015.0, 4199985.0),
               dims=(30.0, 30.0), nodata=-9999.0)
    m = read_ehdr(p)
    np.testing.assert_array_equal(m["img"], img)
    assert m["layout"] == layout.upper()
    assert m["ul_map"] == (500015.0, 4199985.0)
    assert m["dims"] == (30.0, 30.0)
    assert m["nodata"] == -9999.0


def test_ehdr_header_anchor_and_bigendian(tmp_path):
    img = np.array([[1, 2], [3, 4]], dtype=np.int16)
    p = str(tmp_path / "m.bil")
    write_ehdr(p, img, byteorder="M")
    hdr = open(str(tmp_path / "m.hdr")).read()
    assert "BYTEORDER      M" in hdr
    assert "NBITS          16" in hdr
    assert "PIXELTYPE      SIGNEDINT" in hdr
    # big-endian on disk
    assert struct.unpack(">h", open(p, "rb").read(2))[0] == 1
    m = read_ehdr(p)
    np.testing.assert_array_equal(m["img"][0], img)
    with pytest.raises(ValueError, match="unsupported dtype"):
        write_ehdr(str(tmp_path / "x.bil"),
                   np.zeros((2, 2), dtype=np.complex64))


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32,
                                   np.float64])
def test_saga_dtypes_and_row_order(tmp_path, dtype):
    rng = np.random.default_rng(5)
    g = rng.integers(1, 90, (3, 4)).astype(dtype)
    p = str(tmp_path / f"s_{np.dtype(dtype).name}.sdat")
    write_saga(p, g, xmin=10.0, ymin=20.0, cellsize=2.0)
    # TOPTOBOTTOM=FALSE: first sample on disk is the SW corner
    first = np.frombuffer(open(p, "rb").read(np.dtype(dtype).itemsize),
                          dtype=np.dtype(dtype).newbyteorder("<"))[0]
    assert first == g[-1, 0]
    sgrd = open(str(tmp_path / f"s_{np.dtype(dtype).name}.sgrd")).read()
    assert "TOPTOBOTTOM\t= FALSE" in sgrd
    assert "BYTEORDER_BIG\t= FALSE" in sgrd
    m = read_saga(p)
    np.testing.assert_array_equal(m["raw"], g)
    assert (m["xmin"], m["ymin"], m["cellsize"]) == (10.0, 20.0, 2.0)


def test_saga_float_nodata(tmp_path):
    g = np.array([[1.0, np.nan], [3.0, 4.0]], dtype=np.float32)
    p = str(tmp_path / "n.sdat")
    write_saga(p, g, nodata=-99999.0)
    m = read_saga(p)
    assert np.isnan(m["grid"][0, 1])
    assert m["raw"][0, 1] == -99999.0
    np.testing.assert_array_equal(m["grid"][~np.isnan(g)],
                                  g[~np.isnan(g)].astype(np.float64))


def test_terrain_formats_distributed(ray_session, tmp_path):
    """Every format written and re-read inside map_batches over a
    small chip table — the Ray-side plumbing, not just local IO."""
    import ray

    rng = np.random.default_rng(11)
    chips = [rng.integers(0, 1000, (16, 16)).astype(np.int16)
             for _ in range(6)]
    ds = ray.data.from_items(
        [{"i": i, "chip": c.tobytes()} for i, c in enumerate(chips)])
    root = str(tmp_path)

    def roundtrip(batch):
        outs = []
        for i, raw in zip(batch["i"].to_pylist(),
                          batch["chip"].to_pylist()):
            chip = np.frombuffer(raw, dtype=np.int16).reshape(16, 16)
            gp = f"{root}/c{i}.grd"
            write_gsbg(gp, chip.astype(np.float64))
            bp = f"{root}/c{i}.bil"
            write_ehdr(bp, chip)
            sp = f"{root}/c{i}.sdat"
            write_saga(sp, chip)
            ok = (np.array_equal(read_gsbg(gp)["grid"], chip)
                  and np.array_equal(read_ehdr(bp)["img"][0], chip)
                  and np.array_equal(read_saga(sp)["raw"], chip))
            outs.append({"i": i, "ok": ok})
        import pyarrow as pa

        return pa.Table.from_pylist(outs)

    res = ds.map_batches(roundtrip, batch_format="pyarrow").take_all()
    assert len(res) == 6 and all(r["ok"] for r in res)


def test_registry_identifies_terrain_formats(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster

    g = np.arange(9.0).reshape(3, 3)
    paths = {}
    write_gsag(str(tmp_path / "a.grd"), g)
    paths["gsag"] = str(tmp_path / "a.grd")
    write_gsbg(str(tmp_path / "b.grd"), g)
    paths["gsbg"] = str(tmp_path / "b.grd")
    write_saga(str(tmp_path / "c.sdat"), g.astype(np.float32))
    paths["saga"] = str(tmp_path / "c.sdat")
    write_ehdr(str(tmp_path / "d.bil"), g.astype(np.int16))
    paths["ehdr"] = str(tmp_path / "d.bil")
    hgt = np.zeros((1201, 1201), dtype=np.int16)
    write_srtmhgt(str(tmp_path / "N10E020.hgt"), hgt)
    paths["srtmhgt"] = str(tmp_path / "N10E020.hgt")
    for drv, p in paths.items():
        assert identify(p) == drv, p
        out = open_raster(p)
        assert out["driver"] == drv
    # ENVI .hdr still wins over EHdr for ENVI-written files
    from gdal_ray.sources.simple_rasters import write_envi

    ep = str(tmp_path / "e.img")
    write_envi(ep, g.astype(np.float32))
    assert identify(ep) == "envi"


@pytest.mark.parametrize("dtype,bo", [(np.uint8, "LSBFirst"),
                                      (np.int16, "LSBFirst"),
                                      (np.float32, "MSBFirst"),
                                      (np.float64, "LSBFirst")])
def test_ers_header_anchor_and_roundtrip(tmp_path, dtype, bo):
    from gdal_ray.sources.terrain_rasters import read_ers, write_ers

    rng = np.random.default_rng(8)
    img = rng.integers(1, 100, (2, 4, 5)).astype(dtype)
    p = str(tmp_path / f"e_{np.dtype(dtype).name}.ers")
    write_ers(p, img, registration=(500000.0, 4200000.0),
              dims=(30.0, 30.0), byteorder=bo)
    txt = open(p).read()
    assert txt.startswith("DatasetHeader Begin\n")
    assert f"ByteOrder\t= {bo}" in txt
    assert "NrOfLines\t= 4" in txt
    assert "NrOfCellsPerLine\t= 5" in txt
    assert "NrOfBands\t= 2" in txt
    assert txt.rstrip().endswith("DatasetHeader End")
    m = read_ers(p)
    np.testing.assert_array_equal(m["img"], img)
    assert m["registration"] == (500000.0, 4200000.0)
    assert m["dims"] == (30.0, 30.0)
    # BIL on disk: first row of band 0 then first row of band 1
    raw = np.fromfile(p[:-4], dtype=np.dtype(dtype).newbyteorder(
        "<" if bo == "LSBFirst" else ">"))
    np.testing.assert_array_equal(raw[:5].astype(dtype), img[0, 0])
    np.testing.assert_array_equal(raw[5:10].astype(dtype), img[1, 0])


def test_ers_registry_and_guards(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import write_ers

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    p = str(tmp_path / "r.ers")
    write_ers(p, img)
    assert identify(p) == "ers"
    out = open_raster(p)
    np.testing.assert_array_equal(out["img"][0], img)
    with pytest.raises(ValueError, match="end in .ers"):
        write_ers(str(tmp_path / "bad.hdr"), img)
    with pytest.raises(ValueError, match="unsupported dtype"):
        write_ers(str(tmp_path / "c.ers"),
                  np.zeros((2, 2), np.complex64))


def test_zmap_anchors_and_column_order(tmp_path):
    from gdal_ray.sources.terrain_rasters import read_zmap, write_zmap

    g = np.arange(12.0).reshape(3, 4)
    g[1, 2] = np.nan
    p = str(tmp_path / "z.dat")
    write_zmap(p, g, xmin=100.0, ymax=500.0, cellsize=10.0,
               nodata=-99.0)
    lines = open(p).read().splitlines()
    assert lines[0] == "!"
    assert lines[3] == "@GRID FILE, GRID, 4"
    assert lines[7] == "@"
    # column-oriented: first data line = column 0 north->south
    first = [float(v) for v in lines[8].split()]
    assert first == [0.0, 4.0, 8.0]
    # nodata appears in column 2's line
    col2 = [float(v) for v in lines[10].split()]
    assert col2 == [2.0, -99.0, 10.0]
    m = read_zmap(p)
    assert (m["xmin"], m["ymax"], m["cellsize"]) == (100.0, 500.0, 10.0)
    np.testing.assert_array_equal(np.isnan(m["grid"]), np.isnan(g))
    np.testing.assert_allclose(m["grid"][~np.isnan(g)], g[~np.isnan(g)])


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_rst_dtypes_and_rdc_anchor(tmp_path, dtype):
    from gdal_ray.sources.terrain_rasters import read_rst, write_rst

    img = np.arange(20, dtype=dtype).reshape(4, 5)
    p = str(tmp_path / f"r_{np.dtype(dtype).name}.rst")
    write_rst(p, img, extent=(10.0, 60.0, 20.0, 60.0))
    rdc = open(p[:-4] + ".rdc").read()
    assert rdc.startswith("file format : Idrisi Raster A.1\n")
    assert "columns     : 5" in rdc
    assert "rows        : 4" in rdc
    want_t = {"uint8": "byte", "int16": "integer",
              "float32": "real"}[np.dtype(dtype).name]
    assert f"data type   : {want_t}" in rdc
    m = read_rst(p)
    np.testing.assert_array_equal(m["img"], img)
    assert m["extent"] == (10.0, 60.0, 20.0, 60.0)


def test_rst_rgb24_bgr_and_registry(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import (read_rst, write_rst,
                                                  write_zmap)

    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 255, (4, 5, 3)).astype(np.uint8)
    p = str(tmp_path / "c.rst")
    write_rst(p, rgb)
    raw = open(p, "rb").read(3)
    assert raw[0] == rgb[0, 0, 2] and raw[2] == rgb[0, 0, 0]  # BGR
    m = read_rst(p)
    np.testing.assert_array_equal(m["img"], rgb)
    assert identify(p) == "rst"
    assert open_raster(p)["dtype_name"] == "rgb24"
    zp = str(tmp_path / "z.dat")
    write_zmap(zp, np.ones((2, 2)))
    assert identify(zp) == "zmap"
    assert open_raster(zp)["driver"] == "zmap"


def test_usgsdem_anchors_and_roundtrip(tmp_path):
    from gdal_ray.sources.terrain_rasters import (read_usgsdem,
                                                  write_usgsdem)

    rng = np.random.default_rng(19)
    g = rng.integers(-100, 4000, (9, 6)).astype(float)
    g[3, 2] = np.nan
    p = str(tmp_path / "t.dem")
    write_usgsdem(p, g, sw_lon=-105.0, sw_lat=39.5, cell_arcsec=3.0)
    txt = open(p).read()
    # A-record anchors at the reference's fixed offsets
    assert int(txt[156:162]) == 0        # geographic
    assert int(txt[528:534]) == 3        # arc-second ground units
    assert int(txt[534:540]) == 2        # meter elevations
    assert int(txt[852:858]) == 1 and int(txt[858:864]) == 6
    assert "D+" in txt[546:570]          # Fortran D-floats
    # data begins at 864 with the 1/1 profile anchor the reference
    # detection relies on (usgsdemdataset.cpp:639)
    first = txt[864:].split()[:2]
    assert first == ["1", "1"]
    m = read_usgsdem(p)
    np.testing.assert_array_equal(np.isnan(m["grid"]), np.isnan(g))
    np.testing.assert_array_equal(m["grid"][~np.isnan(g)],
                                  g[~np.isnan(g)])
    assert (m["sw_lon"], m["sw_lat"], m["cell_arcsec"]) == \
        (-105.0, 39.5, 3.0)
    # negative elevations fill their I6 width: char-scanner required
    g2 = np.full((4, 3), -12345.0)
    p2 = str(tmp_path / "n.dem")
    write_usgsdem(p2, g2, sw_lon=0.0, sw_lat=0.0)
    np.testing.assert_array_equal(read_usgsdem(p2)["grid"], g2)


def test_usgsdem_registry(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import write_usgsdem

    g = np.arange(12.0).reshape(4, 3)
    p = str(tmp_path / "r.dem")
    write_usgsdem(p, g, sw_lon=10.0, sw_lat=20.0)
    assert identify(p) == "usgsdem"
    out = open_raster(p)
    np.testing.assert_array_equal(out["grid"], g)


def test_gxf_anchors_roundtrip_and_registry(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import read_gxf, write_gxf

    g = np.arange(12.0).reshape(3, 4)
    g[0, 1] = np.nan
    p = str(tmp_path / "g.gxf")
    write_gxf(p, g, xorigin=100.0, yorigin=200.0, cellsize=25.0,
              dummy=-1e12)
    lines = open(p).read().splitlines()
    gi = lines.index("#GRID")
    assert "#SENSE" in lines and lines[lines.index("#SENSE") + 1] == "1"
    # SENSE 1: first data row is the SOUTH row
    assert [float(v) for v in lines[gi + 1].split()] == \
        [8.0, 9.0, 10.0, 11.0]
    m = read_gxf(p)
    np.testing.assert_array_equal(np.isnan(m["grid"]), np.isnan(g))
    np.testing.assert_allclose(m["grid"][~np.isnan(g)], g[~np.isnan(g)])
    assert (m["xorigin"], m["yorigin"], m["cellsize"]) == \
        (100.0, 200.0, 25.0)
    assert identify(p) == "gxf"
    out = open_raster(p)
    assert out["driver"] == "gxf"
    # unsupported sense errors loudly
    bad = open(p).read().replace("#SENSE\n1", "#SENSE\n2")
    p2 = str(tmp_path / "b.gxf")
    open(p2, "w").write(bad)
    with pytest.raises(ValueError, match="SENSE 2"):
        read_gxf(p2)


def test_lan_anchors_roundtrip_and_registry(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import read_lan, write_lan

    rng = np.random.default_rng(29)
    img = rng.integers(-900, 900, (2, 4, 6)).astype(np.int16)
    p = str(tmp_path / "t.lan")
    write_lan(p, img, ul=(500000.0, 4200000.0), pixel=(30.0, 30.0),
              coord_sys=1)
    raw = open(p, "rb").read()
    assert raw[:6] == b"HEAD74"
    assert struct.unpack_from("<hh", raw, 6) == (2, 2)   # 16-bit, 2 bands
    assert struct.unpack_from("<ii", raw, 16) == (6, 4)
    assert struct.unpack_from("<h", raw, 88)[0] == 1     # UTM
    assert struct.unpack_from("<ff", raw, 120) == (30.0, 30.0)
    # BIL: row 0 = band0 row0 then band1 row0
    got = np.frombuffer(raw[128:128 + 24], "<i2")
    np.testing.assert_array_equal(got[:6], img[0, 0])
    np.testing.assert_array_equal(got[6:], img[1, 0])
    m = read_lan(p)
    np.testing.assert_array_equal(m["img"], img)
    assert m["ul"] == (500000.0, 4200000.0)
    assert identify(p) == "lan"
    np.testing.assert_array_equal(open_raster(p)["img"], img)
    # 4-bit guard
    bad = bytearray(raw)
    struct.pack_into("<h", bad, 6, 1)
    p2 = str(tmp_path / "b.lan")
    open(p2, "wb").write(bytes(bad))
    with pytest.raises(ValueError, match="4-bit"):
        read_lan(p2)


def test_terragen_tags_roundtrip_and_registry(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import (read_terragen,
                                                  write_terragen)

    rng = np.random.default_rng(31)
    step = 30.0 * 256 / 65536          # one int16 quantum in meters
    g = rng.integers(-200, 800, (6, 9)).astype(float) * step
    p = str(tmp_path / "t.ter")
    write_terragen(p, g)
    raw = open(p, "rb").read()
    assert raw[:16] == b"TERRAGENTERRAIN "
    assert raw[16:20] == b"SIZE"
    assert struct.unpack_from("<h", raw, 20)[0] == 5   # min-1
    assert b"XPTS" in raw and b"YPTS" in raw            # non-square
    assert b"SCAL" in raw and b"ALTW" in raw
    assert raw.rstrip().endswith(b"EOF")
    # ALTW first stored elevation = SW corner
    ai = raw.index(b"ALTW")
    hv0 = struct.unpack_from("<h", raw, ai + 8)[0]
    assert abs(30.0 * hv0 * 256 / 65536 - g[-1, 0]) < 1e-9
    m = read_terragen(p)
    np.testing.assert_allclose(m["grid_m"], g, atol=1e-9)
    assert m["scal"] == 30.0
    assert identify(p) == "terragen"
    np.testing.assert_allclose(open_raster(p)["grid_m"], g, atol=1e-9)
    # arbitrary heights round-trip within one quantum
    g2 = rng.normal(scale=500.0, size=(5, 5))
    p2 = str(tmp_path / "q.ter")
    write_terragen(p2, g2)
    np.testing.assert_allclose(read_terragen(p2)["grid_m"], g2,
                               atol=step / 2 + 1e-9)


def test_hf2_anchors_tiles_and_registry(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import read_hf2, write_hf2

    rng = np.random.default_rng(37)
    g = (rng.integers(-20000, 80000, (70, 90)) * 0.01).round(2)
    p = str(tmp_path / "h.hf2")
    write_hf2(p, g, tile_size=32, vert_pres=0.01)
    raw = open(p, "rb").read()
    assert raw[:4] == b"HF2\x00"
    ver, nx, ny, ts = struct.unpack_from("<HIIH", raw, 4)
    assert (ver, nx, ny, ts) == (0, 90, 70, 32)
    # first tile starts at 28: f32 scale=vert_pres, f32 off=0,
    # then word size byte and the SW-corner first value
    scale, off = struct.unpack_from("<ff", raw, 28)
    assert abs(scale - 0.01) < 1e-9 and off == 0.0
    ws = struct.unpack_from("<b", raw, 36)[0]
    assert ws in (1, 2, 4)
    first = struct.unpack_from("<i", raw, 37)[0]
    assert abs(first * 0.01 - g[-1, 0]) < 1e-6
    m = read_hf2(p)
    np.testing.assert_allclose(m["grid"], g, atol=1e-6)
    assert m["tile_size"] == 32
    assert identify(p) == "hf2"
    out = open_raster(p)
    np.testing.assert_allclose(out["grid"], g, atol=1e-6)
    # wide deltas force 4-byte words and still round-trip
    g2 = np.zeros((5, 6))
    g2[:, 3] = 1e6
    p2 = str(tmp_path / "w.hf2")
    write_hf2(p2, g2, tile_size=8)
    np.testing.assert_allclose(read_hf2(p2)["grid"], g2, atol=1e-4)


@pytest.mark.parametrize("dtype,nc", [(np.uint8, 3), (np.uint8, 4),
                                      (np.uint16, 1), (np.float32, 3)])
def test_kro_roundtrip_and_registry(tmp_path, dtype, nc):
    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import read_kro, write_kro

    rng = np.random.default_rng(43)
    img = rng.integers(0, 250, (5, 7, nc)).astype(dtype)
    p = str(tmp_path / f"k_{np.dtype(dtype).name}_{nc}.kro")
    write_kro(p, img)
    raw = open(p, "rb").read()
    assert raw[:4] == b"KRO\x01"
    assert struct.unpack(">IIII", raw[4:20]) == \
        (7, 5, np.dtype(dtype).itemsize * 8, nc)
    want = img[:, :, 0] if nc == 1 else img   # 1-comp reads 2-D
    m = read_kro(p)
    np.testing.assert_array_equal(m["img"], want)
    assert identify(p) == "kro"
    np.testing.assert_array_equal(open_raster(p)["img"], want)


def test_leveller_tags_roundtrip_and_registry(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import (read_leveller,
                                                  write_leveller)

    rng = np.random.default_rng(47)
    g = rng.normal(scale=200.0, size=(6, 9)).astype(np.float32) \
        .astype(np.float64)
    p = str(tmp_path / "l.ter")
    write_leveller(p, g)
    raw = open(p, "rb").read()
    assert raw[:5] == b"trrn\x07"
    # first tag: u8 len=4, 'hf_w', u32 len=4, i32 width
    assert raw[5] == 4 and raw[6:10] == b"hf_w"
    assert struct.unpack_from("<I", raw, 10)[0] == 4
    assert struct.unpack_from("<i", raw, 14)[0] == 9
    m = read_leveller(p)
    np.testing.assert_allclose(m["grid"], g, atol=1e-5)
    assert identify(p) == "leveller"     # magic beats the shared .ter
    np.testing.assert_allclose(open_raster(p)["grid"], g, atol=1e-5)
    # scaled variant round-trips through em_scale/base
    write_leveller(p, g, elev_scale=0.5, elev_base=100.0)
    m2 = read_leveller(p)
    assert (m2["elev_scale"], m2["elev_base"]) == (0.5, 100.0)
    np.testing.assert_allclose(m2["grid"], g, atol=1e-4)
    # Terragen on the same extension still identifies by ITS magic
    from gdal_ray.sources.terrain_rasters import write_terragen

    tp = str(tmp_path / "t.ter")
    write_terragen(tp, np.zeros((5, 5)))
    assert identify(tp) == "terragen"


def test_gs7bg_sections_roundtrip_and_registry(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import (read_gs7bg,
                                                  write_gs7bg)

    g = np.arange(12.0).reshape(3, 4)
    g[0, 2] = np.nan
    p = str(tmp_path / "s7.grd")
    write_gs7bg(p, g, xmin=-10.0, ymin=40.0, cellsize=0.5)
    raw = open(p, "rb").read()
    assert raw[:4] == b"DSRB"
    assert struct.unpack_from("<II", raw, 4) == (4, 1)
    assert raw[12:16] == b"GRID"
    assert struct.unpack_from("<I", raw, 16)[0] == 72
    assert struct.unpack_from("<ii", raw, 20) == (3, 4)
    xmin, ymin, dx, dy = struct.unpack_from("<4d", raw, 28)
    assert (xmin, ymin, dx, dy) == (-10.0, 40.0, 0.5, 0.5)
    di = raw.index(b"DATA")
    assert struct.unpack_from("<I", raw, di + 4)[0] == 96
    # first payload double = SW corner (south row first)
    assert struct.unpack_from("<d", raw, di + 8)[0] == 8.0
    m = read_gs7bg(p)
    np.testing.assert_array_equal(np.isnan(m["grid"]), np.isnan(g))
    np.testing.assert_allclose(m["grid"][~np.isnan(g)], g[~np.isnan(g)])
    assert identify(p) == "gs7bg"
    out = open_raster(p)
    assert out["driver"] == "gs7bg" and out["cellsize"] == 0.5
    # unknown sections are skipped like the reference's walk
    spliced = (raw[:12] + b"FOO " + struct.pack("<I", 5) + b"abcde"
               + raw[12:])
    p2 = str(tmp_path / "x.grd")
    open(p2, "wb").write(spliced)
    np.testing.assert_allclose(
        read_gs7bg(p2)["grid"][~np.isnan(g)], g[~np.isnan(g)])


def test_doq2_roundtrip_and_registry(tmp_path):
    from gdal_ray.sources.doq2 import read_doq2, write_doq2
    from gdal_ray.sources.registry import identify, open_raster

    rng = np.random.default_rng(59)
    rgb = rng.integers(0, 255, (6, 9, 3)).astype(np.uint8)
    p = str(tmp_path / "q.doq")
    write_doq2(p, rgb, xy_origin=(443000.0, 4451000.0),
               resolution=1.0)
    head = open(p, "rb").read(600).decode("ascii", "replace")
    assert head.startswith("BEGIN_USGS_DOQ_HEADER\n")
    assert "SAMPLES_AND_LINES 9 6" in head
    assert "BAND_ORGANIZATION BIP" in head
    assert head.count("BAND_CONTENT") == 3
    bc = int([ln for ln in head.splitlines()
              if ln.startswith("BYTE_COUNT")][0].split()[1])
    raw = open(p, "rb").read()
    assert raw[bc:bc + 3] == rgb[0, 0].tobytes()   # BIP at BYTE_COUNT
    m = read_doq2(p)
    np.testing.assert_array_equal(m["img"], rgb)
    assert m["xy_origin"] == (443000.0, 4451000.0)
    assert identify(p) == "doq2"
    np.testing.assert_array_equal(open_raster(p)["img"], rgb)
    # grayscale single band reads 2-D
    g = rng.integers(0, 255, (4, 5)).astype(np.uint8)
    p2 = str(tmp_path / "g.doq")
    write_doq2(p2, g)
    np.testing.assert_array_equal(read_doq2(p2)["img"], g)


def test_ace2_name_table_roundtrip_and_registry(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import (ace2_params,
                                                  read_ace2,
                                                  write_ace2)

    p = ace2_params("30S120W_5M.ACE2")
    assert (p["sw_lat"], p["sw_lon"], p["n"]) == (-30, -120, 180)
    assert p["pixel"] == 5.0 / 60 and p["dtype"] == np.dtype("<f4")
    pq = ace2_params("45N000E_CONF_30S.ACE2")
    assert (pq["sw_lat"], pq["n"]) == (45, 1800)
    assert pq["dtype"] == np.dtype("<i2")
    with pytest.raises(ValueError, match="ACE2 tile name"):
        ace2_params("whatever.ACE2")

    rng = np.random.default_rng(73)
    g = rng.normal(scale=100, size=(180, 180)).astype(np.float32)
    fp = str(tmp_path / "30S120W_5M.ACE2")
    write_ace2(fp, g)
    assert np.frombuffer(open(fp, "rb").read(4), "<f4")[0] == g[0, 0]
    m = read_ace2(fp)
    np.testing.assert_array_equal(m["raw"], g)
    assert (m["sw_lat"], m["sw_lon"]) == (-30, -120)
    assert identify(fp) == "ace2"
    np.testing.assert_array_equal(open_raster(fp)["raw"], g)
    with pytest.raises(ValueError, match="tile size"):
        write_ace2(str(tmp_path / "10N010E_5M.ACE2"),
                   np.zeros((10, 10), np.float32))


def test_ace2_gz(tmp_path):
    import gzip

    from gdal_ray.sources.registry import identify, open_raster
    from gdal_ray.sources.terrain_rasters import read_ace2

    rng = np.random.default_rng(83)
    g = rng.normal(size=(180, 180)).astype(np.float32)
    p = str(tmp_path / "10N010E_5M.ACE2.gz")
    with gzip.open(p, "wb") as fh:
        fh.write(g.astype("<f4").tobytes())
    m = read_ace2(p)
    np.testing.assert_array_equal(m["raw"], g)
    assert identify(p) == "ace2"
    np.testing.assert_array_equal(open_raster(p)["raw"], g)
