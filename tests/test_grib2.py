"""GRIB2 source/sink (sources.grib2): byte anchors against a
hand-assembled message, simple-packing round trips, the bitmap path,
sign-magnitude negatives, scanning modes, the distributed row reader
and the mdim adapter.

Reference behavior: frmts/grib (degrib/g2clib vendoring); the layout
anchors restate WMO FM 92 Edition 2 directly.
"""

import struct

import numpy as np
import pytest

from gdal_ray.sources.grib2 import (
    _sm_bytes,
    _sm_read,
    grid_lats_lons,
    read_grib2,
    read_grib2_mdim,
    read_grib2_rows,
    scan_grib2,
    write_grib2,
)


def _hand_message() -> bytes:
    """A 2x3 lat/lon field assembled BYTE BY BYTE from the published
    spec, independent of the writer: values 273.1 273.2 273.3 / 273.4
    273.5 273.6 at decimal scale 1 -> scaled ints 2731..2736, R=2731,
    X=0..5, 3 bits per value."""
    sec1 = (struct.pack(">IB", 21, 1) + struct.pack(">HHBBB", 7, 0, 2, 1, 1)
            + struct.pack(">HBBBBB", 2021, 6, 15, 12, 0, 0)
            + struct.pack(">BB", 0, 1))
    tmpl3 = (b"\x06" + b"\xff" * 5 + b"\xff" * 5 + b"\xff" * 5
             + struct.pack(">II", 3, 2)            # ni=3, nj=2
             + struct.pack(">II", 0, 0)
             + struct.pack(">I", 50_000_000)        # la1 = 50 N
             + struct.pack(">I", 10_000_000)        # lo1 = 10 E
             + b"\x30"
             + struct.pack(">I", 49_000_000)        # la2 = 49 N
             + struct.pack(">I", 12_000_000)        # lo2 = 12 E
             + struct.pack(">II", 1_000_000, 1_000_000)  # di = dj = 1
             + b"\x00")                             # scan N->S
    sec3 = struct.pack(">IBBIBBH", 72, 3, 0, 6, 0, 0, 0) + tmpl3
    tmpl4 = struct.pack(">BBBBBHBBiBbIBbI",
                        0, 0, 0, 255, 0, 0, 0, 1, 6,
                        1, 0, 0, 255, 0, 0)
    sec4 = struct.pack(">IBHH", 9 + len(tmpl4), 4, 0, 0) + tmpl4
    sec5 = (struct.pack(">IBIH", 21, 5, 6, 0)
            + struct.pack(">f", 2731.0)             # R
            + struct.pack(">H", 0)                  # E = 0
            + struct.pack(">H", 1)                  # D = 1
            + struct.pack(">BB", 3, 0))             # 3 bits
    sec6 = struct.pack(">IBB", 6, 6, 255)
    # X = 0,1,2,3,4,5 at 3 bits each -> 000 001 010 011 100 101 (+pad)
    bits = "000001010011100101" + "000000"
    packed = bytes(int(bits[i:i + 8], 2) for i in range(0, 24, 8))
    sec7 = struct.pack(">IB", 5 + len(packed), 7) + packed
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    sec0 = b"GRIB\x00\x00" + struct.pack(">BB", 0, 2) \
        + struct.pack(">Q", 16 + len(body) + 4)
    return sec0 + body + b"7777"


def test_hand_assembled_anchor(tmp_path):
    """The reader decodes a message built independently byte-by-byte
    from the spec: Y = (R + X * 2^E) / 10^D."""
    p = str(tmp_path / "hand.grib2")
    open(p, "wb").write(_hand_message())
    msgs = read_grib2(p)
    assert len(msgs) == 1
    m = msgs[0]
    assert (m["ni"], m["nj"]) == (3, 2)
    assert m["lat1"] == 50.0 and m["lon1"] == 10.0
    assert m["param_category"] == 0 and m["forecast_hours"] == 6
    assert m["centre"] == 7 and m["ref_time"][0] == 2021
    np.testing.assert_allclose(
        m["values"], [[273.1, 273.2, 273.3], [273.4, 273.5, 273.6]],
        rtol=0, atol=1e-12)
    lats, lons = grid_lats_lons(m)
    np.testing.assert_array_equal(lats, [50.0, 49.0])
    np.testing.assert_array_equal(lons, [10.0, 11.0, 12.0])


def test_writer_byte_anchors(tmp_path):
    """Writer output is spec-shaped: indicator magic/edition/length,
    section numbers in order, terminator."""
    p = str(tmp_path / "w.grib2")
    vals = np.arange(6.0).reshape(2, 3)
    write_grib2(p, [{"values": vals, "lat1": 45.0, "lon1": -115.0,
                     "di": 0.25, "dj": 0.25, "discipline": 2}])
    buf = open(p, "rb").read()
    assert buf[:4] == b"GRIB"
    assert buf[6] == 2 and buf[7] == 2            # discipline, edition
    assert struct.unpack(">Q", buf[8:16])[0] == len(buf)
    assert buf[-4:] == b"7777"
    # section chain: 1, 3, 4, 5, 6, 7
    pos, seen = 16, []
    while pos < len(buf) - 4:
        ln = struct.unpack(">I", buf[pos:pos + 4])[0]
        seen.append(buf[pos + 4])
        pos += ln
    assert seen == [1, 3, 4, 5, 6, 7]
    # longitudes stored 0..360: -115 -> 245 microdegrees
    m = read_grib2(p)[0]
    assert m["lon1"] == 245.0


def test_sign_magnitude():
    """GRIB negatives are sign-and-magnitude, not two's complement."""
    assert _sm_bytes(-45_000_000, 4) == struct.pack(">I",
                                                    0x80000000 | 45_000_000)
    assert _sm_read(_sm_bytes(-3, 2)) == -3
    assert _sm_read(_sm_bytes(7, 2)) == 7
    assert _sm_read(struct.pack(">I", 0x80000000 | 12)) == -12


def test_roundtrip_exact_and_scales(tmp_path):
    """Integer-representable values at the chosen decimal scale
    round-trip exactly; southern-hemisphere lat1 exercises the
    sign-magnitude path end to end."""
    p = str(tmp_path / "rt.grib2")
    rng = np.random.default_rng(3)
    v1 = rng.integers(-500, 500, (7, 11)).astype(np.float64)
    v2 = rng.integers(0, 10000, (5, 4)).astype(np.float64) / 100.0
    write_grib2(p, [
        {"values": v1, "lat1": -10.0, "lon1": 100.0, "di": 0.5,
         "dj": 0.5, "scan": 0x40, "param_number": 5},
        {"values": v2, "lat1": 60.0, "lon1": 355.0, "di": 1.25,
         "dj": 1.25, "decimal_scale": 2, "forecast_hours": 24},
    ])
    m1, m2 = read_grib2(p)
    np.testing.assert_array_equal(m1["values"], v1)
    assert m1["lat1"] == -10.0 and m1["scan"] == 0x40
    lats, _ = grid_lats_lons(m1)
    assert lats[0] == -10.0 and lats[-1] == -10.0 + 0.5 * 6
    np.testing.assert_array_equal(m2["values"], v2)
    assert m2["forecast_hours"] == 24 and m2["param_number"] == 0


def test_bitmap_nan_roundtrip(tmp_path):
    p = str(tmp_path / "bm.grib2")
    vals = np.arange(24.0).reshape(4, 6)
    vals[0, 0] = np.nan
    vals[2, 3] = np.nan
    vals[3, 5] = np.nan
    write_grib2(p, [{"values": vals, "lat1": 0.0, "lon1": 0.0,
                     "di": 1.0, "dj": 1.0}])
    buf = open(p, "rb").read()
    m = read_grib2(p)[0]
    np.testing.assert_array_equal(np.isnan(m["values"]), np.isnan(vals))
    np.testing.assert_array_equal(m["values"][~np.isnan(vals)],
                                  vals[~np.isnan(vals)])
    # bitmap section present (indicator 0), 21 present points packed
    assert b"GRIB" in buf


def test_multi_message_scan(tmp_path):
    p = str(tmp_path / "mm.grib2")
    msgs = [{"values": np.full((2, 2), float(k)), "lat1": 10.0,
             "lon1": 20.0, "di": 1.0, "dj": 1.0,
             "param_category": k} for k in range(5)]
    write_grib2(p, msgs)
    spans = scan_grib2(p)
    assert len(spans) == 5
    assert spans[0][0] == 0
    for k, m in enumerate(read_grib2(p)):
        assert m["param_category"] == k
        assert m["values"][0, 0] == float(k)


def test_unsupported_guards(tmp_path):
    with pytest.raises(ValueError, match="scanning mode"):
        write_grib2(str(tmp_path / "x.grib2"),
                    [{"values": np.ones((2, 2)), "lat1": 0, "lon1": 0,
                      "di": 1, "dj": 1, "scan": 0x80}])
    p = str(tmp_path / "junk.grib2")
    open(p, "wb").write(b"NOTGRIB2" + b"\x00" * 16)
    with pytest.raises(ValueError, match="bad indicator"):
        scan_grib2(p)


def test_ray_rows_and_mdim(tmp_path, ray_session):
    """Distributed row reader and the mdim chunk adapter."""
    p = str(tmp_path / "r.grib2")
    v0 = np.arange(48.0).reshape(6, 8)
    v1 = np.arange(20.0).reshape(4, 5) * 2.0
    write_grib2(p, [
        {"values": v0, "lat1": 55.0, "lon1": 5.0, "di": 0.5, "dj": 0.5},
        {"values": v1, "lat1": 30.0, "lon1": 10.0, "di": 1.0, "dj": 1.0,
         "param_number": 2},
    ])
    rows = read_grib2_rows(p, parallelism=2).take_all()
    assert len(rows) == 2
    rows.sort(key=lambda r: r["msg_id"])
    got0 = np.frombuffer(rows[0]["values"], np.float64).reshape(6, 8)
    np.testing.assert_array_equal(got0, v0)
    assert rows[1]["param_number"] == 2 and rows[1]["ni"] == 5

    ds, spec = read_grib2_mdim(p, msg=0, slab=2, parallelism=4)
    assert spec.shape == (6, 8) and spec.chunks == (2, 8)
    chunks = ds.take_all()
    assert len(chunks) == 3
    rebuilt = np.concatenate(
        [np.frombuffer(c["data"], np.float64).reshape(tuple(c["shape"]))
         for c in sorted(chunks, key=lambda c: c["chunk"][0])])
    np.testing.assert_array_equal(rebuilt, v0)


def test_complex_packing_roundtrips(tmp_path):
    """Templates 5.2 / 5.3: grouped packing and spatial differencing
    (orders 1 and 2) round-trip exactly, with bitmap and negatives."""
    p = str(tmp_path / "cx.grib2")
    yy, xx = np.mgrid[0:40, 0:60]
    smooth = np.round((250.0 + 20 * np.sin(xx / 9)
                       + 10 * np.cos(yy / 7)) * 100) / 100
    smooth[3, 4] = np.nan
    rng = np.random.default_rng(17)
    noise = rng.integers(-300, 300, (25, 25)).astype(float)
    write_grib2(p, [
        {"values": smooth, "lat1": 30.0, "lon1": 0.0, "di": 0.5,
         "dj": 0.5, "decimal_scale": 2, "packing": 2},
        {"values": smooth, "lat1": 30.0, "lon1": 0.0, "di": 0.5,
         "dj": 0.5, "decimal_scale": 2, "packing": 3, "diff_order": 1},
        {"values": smooth, "lat1": 30.0, "lon1": 0.0, "di": 0.5,
         "dj": 0.5, "decimal_scale": 2, "packing": 3, "diff_order": 2},
        {"values": noise, "lat1": 0.0, "lon1": 0.0, "di": 1.0,
         "dj": 1.0, "packing": 2, "group_size": 17},
    ])
    msgs = read_grib2(p)
    assert [m["packing"] for m in msgs] == [2, 3, 3, 2]
    for m in msgs[:3]:
        np.testing.assert_array_equal(
            np.isnan(m["values"]), np.isnan(smooth))
        np.testing.assert_array_equal(
            m["values"][~np.isnan(smooth)], smooth[~np.isnan(smooth)])
    np.testing.assert_array_equal(msgs[3]["values"], noise)


def test_complex_packing_template_anchors(tmp_path):
    """Section-5 template fields at their spec offsets: template
    number, NG, group-length reference/increment, 5.3 order octet."""
    p = str(tmp_path / "anchor.grib2")
    v = np.arange(100.0).reshape(10, 10)
    write_grib2(p, [{"values": v, "lat1": 0.0, "lon1": 0.0,
                     "di": 1.0, "dj": 1.0, "packing": 3,
                     "diff_order": 2, "group_size": 16}])
    buf = open(p, "rb").read()
    # walk to section 5
    pos = 16
    while buf[pos + 4] != 5:
        pos += struct.unpack(">I", buf[pos:pos + 4])[0]
    s5 = buf[pos:pos + struct.unpack(">I", buf[pos:pos + 4])[0]]
    assert len(s5) == 49                               # 5.3 length
    assert struct.unpack(">H", s5[9:11])[0] == 3       # template 5.3
    assert struct.unpack(">I", s5[5:9])[0] == 100      # n points
    assert s5[21] == 1 and s5[22] == 0                 # split / no MV
    assert struct.unpack(">I", s5[31:35])[0] == 7      # NG = ceil(100/16)
    assert struct.unpack(">I", s5[37:41])[0] == 16     # len reference
    assert s5[41] == 1                                 # len increment
    assert struct.unpack(">I", s5[42:46])[0] == 4      # last group len
    assert s5[47] == 2                                 # diff order
    # a smooth ramp under 2nd-order differencing: all diffs constant,
    # so every group packs at width 0 -> section 7 is tiny
    pos7 = pos + len(s5)
    while buf[pos7 + 4] != 7:
        pos7 += struct.unpack(">I", buf[pos7:pos7 + 4])[0]
    assert struct.unpack(">I", buf[pos7:pos7 + 4])[0] < 40


def test_complex_beats_simple_on_smooth(tmp_path):
    """5.3 produces a smaller message than 5.0 on a smooth field (the
    reason the operational archives use it)."""
    import os

    yy, xx = np.mgrid[0:64, 0:64]
    v = np.round((1000.0 + 30 * np.sin(xx / 11)
                  + 20 * np.cos(yy / 13)) * 100) / 100
    sizes = {}
    for pk in (0, 3):
        p = str(tmp_path / f"s{pk}.grib2")
        write_grib2(p, [{"values": v, "lat1": 0.0, "lon1": 0.0,
                         "di": 0.5, "dj": 0.5, "decimal_scale": 2,
                         "packing": pk, "diff_order": 2}])
        sizes[pk] = os.path.getsize(p)
    assert sizes[3] < sizes[0]


def test_lambert_grid_template(tmp_path):
    """Grid template 3.30 (Lambert conformal — the NAM/HRRR-class
    grid): template fields at spec offsets, value round trip, and
    grid_xy_lambert wiring into the engine's LCC transform."""
    from gdal_ray.sources.grib2 import grid_xy_lambert

    p = str(tmp_path / "lcc.grib2")
    rng = np.random.default_rng(3)
    v = np.round(rng.normal(280, 10, (30, 40)) * 100) / 100
    lam = dict(la1=21.138, lo1=-122.72, lad=38.5, lov=-97.5,
               dx_m=3000.0, dy_m=3000.0, latin1=38.5, latin2=38.5)
    write_grib2(p, [{"values": v, "lambert": lam, "scan": 0x40,
                     "decimal_scale": 2, "packing": 3}])
    buf = open(p, "rb").read()
    pos = 16
    while buf[pos + 4] != 3:
        pos += struct.unpack(">I", buf[pos:pos + 4])[0]
    s3 = buf[pos:pos + struct.unpack(">I", buf[pos:pos + 4])[0]]
    assert len(s3) == 81
    assert struct.unpack(">H", s3[12:14])[0] == 30      # template 3.30
    t = s3[14:]
    assert struct.unpack(">II", t[16:24]) == (40, 30)   # nx, ny
    assert struct.unpack(">I", t[41:45])[0] == 3_000_000  # Dx in mm
    m = read_grib2(p)[0]
    np.testing.assert_array_equal(m["values"], v)
    assert m["lambert"]["latin1"] == 38.5
    xs, ys, prj = grid_xy_lambert(m)
    lo, la = prj.inv(xs[:1], ys[:1])
    assert abs(lo[0] - (-122.72)) < 1e-9
    assert abs(la[0] - 21.138) < 1e-9
    assert xs[1] - xs[0] == 3000.0 and ys[1] - ys[0] == 3000.0
    with pytest.raises(ValueError, match="grid_xy_lambert"):
        grid_lats_lons(m)


def test_polar_stereo_grid_template(tmp_path):
    """Grid template 3.20 (polar stereographic — the sea-ice /
    high-latitude operational grid): spec offsets, value round trip,
    grid_xy_stereo wiring into the engine's projection."""
    from gdal_ray.sources.grib2 import grid_xy_stereo

    p = str(tmp_path / "ps.grib2")
    rng = np.random.default_rng(6)
    v = np.round(rng.normal(250, 5, (20, 25)) * 100) / 100
    ps = dict(la1=60.0, lo1=-100.0, lad=70.0, lov=-45.0,
              dx_m=25000.0, dy_m=25000.0, south=False)
    write_grib2(p, [{"values": v, "polar_stereo": ps, "scan": 0x40,
                     "decimal_scale": 2, "packing": 2}])
    buf = open(p, "rb").read()
    pos = 16
    while buf[pos + 4] != 3:
        pos += struct.unpack(">I", buf[pos:pos + 4])[0]
    s3 = buf[pos:pos + struct.unpack(">I", buf[pos:pos + 4])[0]]
    assert len(s3) == 65
    assert struct.unpack(">H", s3[12:14])[0] == 20
    t = s3[14:]
    assert struct.unpack(">I", t[41:45])[0] == 25_000_000   # Dx mm
    assert t[49] == 0                                       # north
    m = read_grib2(p)[0]
    np.testing.assert_array_equal(m["values"], v)
    xs, ys, prj = grid_xy_stereo(m)
    lo, la = prj.inv(xs[:1], ys[:1])
    assert abs(lo[0] - (-100.0)) < 1e-9
    assert abs(la[0] - 60.0) < 1e-9
    with pytest.raises(ValueError, match="grid_xy_stereo"):
        grid_lats_lons(m)


# ----------------------------------------- template 5.41 (PNG packing)


def test_png_packing_roundtrip_and_anchor(tmp_path):
    """Template 5.41: section 5 carries the simple-packing layout with
    template number 41 and the g2clib depth byte; section 7 is a PNG
    stream (signature anchor) whose decode matches 5.0 bit-for-bit."""
    rng = np.random.default_rng(42)
    x = np.linspace(0.0, 4.0, 144)
    y = np.linspace(0.0, 3.0, 73)
    f = np.round(273.15 + 30.0 * np.sin(x)[None, :] * np.cos(y)[:, None]
                 + rng.normal(0.0, 0.5, (73, 144)), 2)
    p = str(tmp_path / "png.grib2")
    write_grib2(p, [
        {"values": f, "lat1": 90.0, "lon1": 0.0, "di": 2.5, "dj": 2.5,
         "packing": 41, "decimal_scale": 2},
        {"values": f, "lat1": 90.0, "lon1": 0.0, "di": 2.5, "dj": 2.5,
         "packing": 0, "decimal_scale": 2},
    ])
    msgs = read_grib2(p)
    assert msgs[0]["packing"] == 41
    assert np.array_equal(msgs[0]["values"], msgs[1]["values"])
    assert np.allclose(msgs[0]["values"], f, atol=1e-9)
    # byte anchors: template number at s5 octets 10-11, PNG signature
    # at the head of section 7's payload
    buf = open(p, "rb").read()
    pos = 16
    s5_off = None
    while pos < len(buf) - 4:
        ln, num = struct.unpack_from(">IB", buf, pos)
        if num == 5:
            s5_off = pos
        if num == 7:
            assert buf[pos + 5:pos + 13] == b"\x89PNG\r\n\x1a\n"
            break
        pos += ln
    assert s5_off is not None
    assert struct.unpack_from(">H", buf, s5_off + 9)[0] == 41
    depth = buf[s5_off + 19]
    assert depth in (8, 16, 24, 32)


def test_png_packing_bitmap_and_depths(tmp_path):
    """Bitmap-present 5.41 messages use the ndpts x 1 image shape;
    depth selection follows the value range (8 -> 16 -> 24 bits)."""
    rng = np.random.default_rng(7)
    base = np.linspace(0.0, 1.0, 32 * 20).reshape(20, 32)
    for scale, want_min_depth in ((100.0, 8), (60000.0, 16),
                                  (8.0e6, 24)):
        f = np.round(base * scale)
        f[3:5, 4:9] = np.nan
        p = str(tmp_path / f"d{want_min_depth}.grib2")
        write_grib2(p, [{"values": f, "lat1": 60.0, "lon1": 0.0,
                         "di": 1.0, "dj": 1.0, "packing": 41}])
        m = read_grib2(p)[0]
        good = np.isfinite(f)
        assert np.allclose(m["values"][good], f[good])
        assert np.isnan(m["values"][~good]).all()
        buf = open(p, "rb").read()
        pos = 16
        while pos < len(buf) - 4:
            ln, num = struct.unpack_from(">IB", buf, pos)
            if num == 5:
                assert buf[pos + 19] >= want_min_depth
                break
            pos += ln
