"""AAIGrid / ENVI / BMP (sources.simple_rasters): byte/text anchors
against the published layouts, round trips, nodata and interleave
matrices.

Reference behavior: frmts/aaigrid, frmts/envi (raw), frmts/bmp.
"""

import struct

import numpy as np
import pytest

from gdal_ray.sources.simple_rasters import (
    read_aaigrid,
    read_bmp,
    read_envi,
    write_aaigrid,
    write_bmp,
    write_envi,
)


def test_aaigrid_roundtrip_and_header(tmp_path):
    p = str(tmp_path / "g.asc")
    g = np.arange(12.0).reshape(3, 4)
    g[1, 2] = np.nan
    write_aaigrid(p, g, xll=500000.0, yll=4100000.0, cellsize=30.0,
                  nodata=-9999.0)
    txt = open(p).read()
    assert txt.startswith("ncols 4\nnrows 3\nxllcorner 500000.0\n"
                          "yllcorner 4100000.0\ncellsize 30.0\n"
                          "NODATA_value -9999.0\n")
    assert "-9999.0" in txt.splitlines()[7]      # row 1 carries nodata
    m = read_aaigrid(p)
    assert (m["xll"], m["yll"], m["cellsize"]) == (500000.0, 4100000.0,
                                                   30.0)
    assert m["corner"] is True and m["nodata"] == -9999.0
    np.testing.assert_array_equal(np.isnan(m["grid"]), np.isnan(g))
    np.testing.assert_array_equal(m["grid"][~np.isnan(g)],
                                  g[~np.isnan(g)])
    # integer grid + center convention
    p2 = str(tmp_path / "i.asc")
    gi = np.arange(6).reshape(2, 3)
    write_aaigrid(p2, gi, corner=False)
    m2 = read_aaigrid(p2)
    assert m2["corner"] is False
    np.testing.assert_array_equal(m2["grid"], gi)
    with pytest.raises(ValueError, match="nodata="):
        write_aaigrid(str(tmp_path / "x.asc"),
                      np.array([[np.nan, 1.0]]))


@pytest.mark.parametrize("interleave", ["bsq", "bil", "bip"])
def test_envi_interleaves(tmp_path, interleave):
    p = str(tmp_path / f"e_{interleave}.img")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 4000, (3, 7, 11)).astype(np.uint16)
    write_envi(p, img, interleave=interleave,
               map_info=(500000.0, 4200000.0, 30.0, 30.0))
    m = read_envi(p)
    assert m["interleave"] == interleave
    np.testing.assert_array_equal(m["img"], img)
    assert m["map_info"] == (500000.0, 4200000.0, 30.0, 30.0)
    hdr = open(p + ".hdr").read()
    assert hdr.startswith("ENVI\n")
    assert "data type = 12" in hdr               # ENVI code for uint16
    assert f"interleave = {interleave}" in hdr


def test_envi_dtypes_and_guards(tmp_path):
    for dt, code in ((np.uint8, 1), (np.int16, 2), (np.float32, 4),
                     (np.float64, 5), (np.int64, 14)):
        p = str(tmp_path / f"d_{code}.img")
        img = np.arange(24, dtype=dt).reshape(4, 6)
        write_envi(p, img)
        m = read_envi(p)
        assert m["img"].dtype == dt
        np.testing.assert_array_equal(m["img"][0], img)
        assert f"data type = {code}" in open(p + ".hdr").read()
    with pytest.raises(ValueError, match="missing header"):
        read_envi(str(tmp_path / "nohdr.img"))


def test_bmp_rgb_anchors_and_roundtrip(tmp_path):
    p = str(tmp_path / "c.bmp")
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    write_bmp(p, img)
    buf = open(p, "rb").read()
    assert buf[:2] == b"BM"
    assert struct.unpack("<I", buf[2:6])[0] == len(buf)
    hsz, w, h, planes, bpp = struct.unpack("<IiiHH", buf[14:30])
    assert (hsz, w, h, planes, bpp) == (40, 7, 5, 1, 24)
    # bottom-up BGR: byte 0 of the pixel data is BLUE of the LAST row
    data_off = struct.unpack("<I", buf[10:14])[0]
    assert buf[data_off] == img[-1, 0, 2]
    # row stride padded to 4: 7*3=21 -> 24
    assert len(buf) - data_off == 5 * 24
    np.testing.assert_array_equal(read_bmp(p), img)


def test_bmp_gray8(tmp_path):
    p = str(tmp_path / "g.bmp")
    img = np.arange(30, dtype=np.uint8).reshape(5, 6) * 8
    write_bmp(p, img)
    buf = open(p, "rb").read()
    assert struct.unpack("<H", buf[28:30])[0] == 8
    # 256-entry grayscale palette right after the 40-byte info header
    assert buf[54:58] == b"\x00\x00\x00\x00"
    assert buf[54 + 255 * 4:54 + 255 * 4 + 3] == b"\xff\xff\xff"
    np.testing.assert_array_equal(read_bmp(p), img)
    with pytest.raises(ValueError, match="uint8"):
        write_bmp(str(tmp_path / "x.bmp"), img.astype(np.uint16))


def test_pnm_matrix(tmp_path):
    """PGM/PPM x binary/ASCII x 8/16-bit: magic + header anchors,
    comments in headers, big-endian 16-bit samples."""
    from gdal_ray.sources.simple_rasters import read_pnm, write_pnm

    rng = np.random.default_rng(7)
    g8 = rng.integers(0, 256, (5, 7)).astype(np.uint8)
    c8 = rng.integers(0, 256, (4, 6, 3)).astype(np.uint8)
    g16 = rng.integers(0, 65536, (3, 5)).astype(np.uint16)
    for img, ascii_, magic in ((g8, False, b"P5"), (g8, True, b"P2"),
                               (c8, False, b"P6"), (c8, True, b"P3"),
                               (g16, False, b"P5")):
        p = str(tmp_path / f"x_{magic.decode()}_{ascii_}.pnm")
        write_pnm(p, img, ascii_=ascii_)
        buf = open(p, "rb").read()
        assert buf[:2] == magic
        np.testing.assert_array_equal(read_pnm(p), img)
    # 16-bit binary samples are BIG-endian per the spec
    p16 = str(tmp_path / "be.pgm")
    write_pnm(p16, np.array([[0x1234]], np.uint16))
    assert open(p16, "rb").read()[-2:] == b"\x12\x34"
    # header comments parse
    p = str(tmp_path / "c.pgm")
    open(p, "wb").write(b"P5\n# a comment\n2 1\n255\n\x07\x09")
    np.testing.assert_array_equal(read_pnm(p), [[7, 9]])
    with pytest.raises(ValueError, match="maxval"):
        write_pnm(str(tmp_path / "bad.pgm"), g8, maxval=100)


def test_bmp_rle8_roundtrip_and_anchors(tmp_path):
    """BI_RLE8 (BITMAPINFOHEADER compression 1): encoded-mode runs
    with EOL/EOB escapes; biCompression anchor, bit-exact round trip,
    smaller than raw on runs-heavy data; absolute-mode and delta
    escapes decode (hand-assembled stream)."""
    import os as _os
    import struct as st

    from gdal_ray.sources.simple_rasters import (_rle8_decode,
                                                 read_bmp, write_bmp)

    rng = np.random.default_rng(42)
    img = np.repeat(rng.integers(0, 8, (40, 20), dtype=np.uint8) * 30,
                    4, axis=1)[:, :75]
    p = str(tmp_path / "r.bmp")
    p2 = str(tmp_path / "u.bmp")
    write_bmp(p, img, rle=True)
    write_bmp(p2, img)
    buf = open(p, "rb").read()
    assert st.unpack("<I", buf[30:34])[0] == 1        # BI_RLE8
    assert np.array_equal(read_bmp(p), img)
    assert _os.path.getsize(p) < _os.path.getsize(p2)
    # hand-assembled stream: run, absolute mode (word-padded), delta,
    # EOL, run, EOB
    data = (bytes((3, 7))                  # 3x value 7
            + bytes((0, 3, 1, 2, 3, 0))   # absolute: 1,2,3 (+pad)
            + bytes((0, 2, 2, 1))         # delta +2x +1y
            + bytes((0, 0))               # EOL -> (x=0, y=2)
            + bytes((2, 9))               # 2x value 9
            + bytes((0, 1)))              # EOB
    out = _rle8_decode(data, 10, 4)
    assert list(out[0, :6]) == [7, 7, 7, 1, 2, 3]
    assert list(out[2, :2]) == [9, 9]
    # RLE on RGB is rejected
    with pytest.raises(ValueError, match="8-bit"):
        write_bmp(str(tmp_path / "x.bmp"),
                  np.zeros((4, 4, 3), np.uint8), rle=True)
