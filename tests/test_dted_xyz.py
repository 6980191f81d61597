"""DTED (sources.dted) and ASCII XYZ raster: layout anchors against
MIL-PRF-89020B / the reference's frmts/dted and frmts/xyz conventions,
checksum verification, void handling, round trips.
"""

import struct

import numpy as np
import pytest

from gdal_ray.sources.dted import (
    read_dted,
    read_xyz,
    write_dted,
    write_xyz,
)


def test_dted_byte_anchors(tmp_path):
    """UHL field offsets, DSI/ACC sentinels, 0xAA column records and
    the 32-bit record checksum — straight off the spec."""
    p = str(tmp_path / "c.dt1")
    elev = np.arange(12.0).reshape(4, 3) * 100 - 200
    write_dted(p, elev, lon0=-105.0, lat0=39.0)
    buf = open(p, "rb").read()
    assert buf[:4] == b"UHL1"
    assert buf[4:12] == b"1050000W"                # lon origin DDDMMSSH
    assert buf[12:20] == b"0390000N"               # lat origin, 3-digit
    assert int(buf[20:24]) == 300                  # tenths of arcsec
    assert buf[47:51] == b"0003" and buf[51:55] == b"0004"
    assert buf[80:83] == b"DSI" and buf[728:731] == b"ACC"
    rec0 = buf[3428:3428 + 8 + 8 + 4]
    assert rec0[0] == 0xAA
    # checksum = sum of preceding record bytes
    assert struct.unpack(">I", rec0[-4:])[0] == sum(rec0[:-4])
    # first column, SOUTH-first: elevations -200, 100, 400, 700
    raw = np.frombuffer(rec0, ">u2", 4, 8).astype(np.int64)
    vals = np.where(raw & 0x8000, -(raw & 0x7FFF), raw)
    np.testing.assert_array_equal(vals, [-200, 100, 400, 700])


def test_dted_roundtrip_void_and_checksum_guard(tmp_path):
    p = str(tmp_path / "v.dt1")
    rng = np.random.default_rng(5)
    elev = rng.integers(-500, 9000, (7, 5)).astype(np.float64)
    elev[2, 3] = np.nan
    write_dted(p, elev, lon0=7.0, lat0=46.0)
    m = read_dted(p)
    assert m["lon0"] == 7.0 and m["lat0"] == 46.0
    np.testing.assert_array_equal(np.isnan(m["elev"]), np.isnan(elev))
    np.testing.assert_array_equal(m["elev"][~np.isnan(elev)],
                                  elev[~np.isnan(elev)])
    # corrupt one elevation byte -> the checksum catches it
    buf = bytearray(open(p, "rb").read())
    buf[3428 + 9] ^= 0x40
    open(p, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="checksum"):
        read_dted(p)


def test_xyz_roundtrip_and_grid_inference(tmp_path):
    p = str(tmp_path / "g.xyz")
    rng = np.random.default_rng(6)
    g = rng.normal(size=(5, 7))
    write_xyz(p, g, x0=100.0, y0=250.0, dx=2.5, dy=5.0)
    first = open(p).readline().split()
    assert [float(v) for v in first[:2]] == [100.0, 250.0]
    m = read_xyz(p)
    np.testing.assert_array_equal(m["grid"], g)
    assert (m["x0"], m["y0"], m["dx"], m["dy"]) == (100.0, 250.0,
                                                    2.5, 5.0)
    bad = str(tmp_path / "bad.xyz")
    open(bad, "w").write("0 0 1\n1 0 2\n0 1 3\n")   # missing (1,1)
    with pytest.raises(ValueError, match="complete regular grid"):
        read_xyz(bad)
