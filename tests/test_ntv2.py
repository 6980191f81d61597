"""NTv2 datum-shift grid: .gsb binary format (sources.ntv2), the
grid-shift transform (functions.proj.NTv2GridShift) and the warp
stage (stages.warp.WarpChipsNTv2).

Reference behavior: frmts/ntv2/ntv2dataset.cpp (the grid file as a
4-band float32 raster) and the PROJ +nadgrids= horizontal correction
path behind ogr/ogrct.cpp:1018.  Byte anchors restate the published
NTv2 record layout directly against raw file bytes.
"""

import struct

import numpy as np
import pytest

from gdal_ray.functions.proj import (
    NTv2GridShift,
    fixture_ntv2_transform,
    synth_ntv2,
    synth_ntv2_subgrids,
)
from gdal_ray.sources.ntv2 import grid_dims, read_ntv2, write_ntv2


@pytest.fixture()
def tiny(tmp_path):
    """One 3x4 subgrid with hand-picked float32-exact shifts."""
    la = np.arange(12, dtype=np.float64).reshape(3, 4) * 0.25
    lo = (np.arange(12, dtype=np.float64).reshape(3, 4) - 6.0) * 0.5
    sub = dict(name="TINY", parent=None,
               s_lat=144000.0, n_lat=151200.0,     # 40..42 N
               e_long=360000.0, w_long=370800.0,   # 100..103 W
               lat_inc=3600.0, long_inc=3600.0,
               lat_shift=la, lon_shift=lo)
    path = str(tmp_path / "tiny.gsb")
    write_ntv2(path, [sub])
    return path, sub


def test_byte_anchors(tiny):
    """Record layout straight off the published spec: 16-byte records,
    8-byte names, int32+pad ints, float64 values, float32 nodes."""
    path, sub = tiny
    buf = open(path, "rb").read()
    # overview: 11 records of 16 bytes
    assert buf[0:8] == b"NUM_OREC"
    assert struct.unpack("<i", buf[8:12])[0] == 11
    assert buf[12:16] == b"\x00" * 4
    assert buf[16:24] == b"NUM_SREC"
    assert struct.unpack("<i", buf[24:28])[0] == 11
    assert buf[32:40] == b"NUM_FILE"
    assert struct.unpack("<i", buf[40:44])[0] == 1
    assert buf[48:64] == b"GS_TYPE SECONDS "
    assert buf[80:88] == b"SYSTEM_F"
    # MAJOR_F is record 8 (offset 7*16): Clarke 1866 semi-major
    assert buf[112:120] == b"MAJOR_F "
    assert struct.unpack("<d", buf[120:128])[0] == 6378206.4
    # subgrid header starts at 11*16
    off = 176
    assert buf[off:off + 8] == b"SUB_NAME"
    assert buf[off + 8:off + 16] == b"TINY    "
    assert buf[off + 16:off + 24] == b"PARENT  "
    assert buf[off + 24:off + 32] == b"NONE    "
    # S_LAT is subgrid record 5
    assert buf[off + 64:off + 72] == b"S_LAT   "
    assert struct.unpack("<d", buf[off + 72:off + 80])[0] == 144000.0
    # GS_COUNT is subgrid record 11
    assert buf[off + 160:off + 168] == b"GS_COUNT"
    assert struct.unpack("<i", buf[off + 168:off + 172])[0] == 12
    # first node: 4 float32 (lat shift, lon shift, accuracies)
    node0 = off + 176
    vals = struct.unpack("<4f", buf[node0:node0 + 16])
    assert vals == (0.0, -3.0, 0.0, 0.0)
    # END record terminates the file
    assert buf[-16:-8] == b"END     "
    assert len(buf) == node0 + 12 * 16 + 16


def test_roundtrip_and_dims(tiny):
    path, sub = tiny
    meta = read_ntv2(path)
    assert meta["system_f"] == "NAD27"
    assert meta["major_t"] == 6378137.0
    assert meta["byteorder"] == "<"
    assert len(meta["subgrids"]) == 1
    got = meta["subgrids"][0]
    assert got["name"] == "TINY"
    assert got["parent"] is None
    assert grid_dims(got) == (3, 4)
    np.testing.assert_array_equal(got["lat_shift"],
                                  sub["lat_shift"].astype(np.float32))
    np.testing.assert_array_equal(got["lon_shift"],
                                  sub["lon_shift"].astype(np.float32))
    assert got["lat_acc"].max() == 0.0


def test_big_endian_roundtrip(tmp_path, tiny):
    _, sub = tiny
    path = str(tmp_path / "be.gsb")
    write_ntv2(path, [sub], byteorder=">")
    buf = open(path, "rb").read()
    assert struct.unpack(">i", buf[8:12])[0] == 11
    meta = read_ntv2(path)
    assert meta["byteorder"] == ">"
    np.testing.assert_array_equal(meta["subgrids"][0]["lat_shift"],
                                  sub["lat_shift"].astype(np.float32))


def test_format_errors(tmp_path, tiny):
    _, sub = tiny
    bad = dict(sub)
    bad["lat_shift"] = sub["lat_shift"][:2]  # wrong shape
    with pytest.raises(ValueError, match="shift arrays"):
        write_ntv2(str(tmp_path / "x.gsb"), [bad])
    p = str(tmp_path / "junk.gsb")
    open(p, "wb").write(b"NOT_NTV2" + b"\x00" * 24)
    with pytest.raises(ValueError, match="NUM_OREC"):
        read_ntv2(p)


def test_fixture_file_matches_inmemory(tmp_path):
    """The warp stage's file path and the in-memory fixture transform
    interpolate identical values (dyadic nodes survive float32)."""
    path = str(tmp_path / "fix.gsb")
    write_ntv2(path, synth_ntv2_subgrids())
    t_file = NTv2GridShift(read_ntv2(path)["subgrids"])
    t_mem = fixture_ntv2_transform()
    lon = np.linspace(-117.9, -112.1, 41)
    lat = np.linspace(42.1, 45.9, 41)
    LO, LA = np.meshgrid(lon, lat)
    a = t_file.fwd(LO, LA)
    b = t_mem.fwd(LO, LA)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_shift_semantics():
    """Node-exact interpolation, positive-west sign convention, and
    child-over-parent subgrid selection."""
    t = fixture_ntv2_transform()
    subs = synth_ntv2_subgrids()
    # exactly on base node (r=4, c=8): lat 43 N, lon 114 W -> outside
    # child (child S_LAT is 43.5) so the BASE value applies
    lon, lat = np.array([-114.0]), np.array([43.0])
    dla, dlo = t._shift_sec(lon, lat)
    assert dla[0] == subs[0]["lat_shift"][4, 8]
    assert dlo[0] == subs[0]["lon_shift"][4, 8]
    lo2, la2 = t.fwd(lon, lat)
    # lon shift positive west REDUCES east-positive longitude
    assert la2[0] == lat[0] + dla[0] / 3600.0
    assert lo2[0] == lon[0] - dlo[0] / 3600.0
    # inside the child window the CHILD field wins (node r=2, c=8 of
    # the child = lat 43.75, lon 115 W)
    lon, lat = np.array([-115.0]), np.array([43.75])
    dla, dlo = t._shift_sec(lon, lat)
    assert dla[0] == subs[1]["lat_shift"][2, 8]
    assert dlo[0] == subs[1]["lon_shift"][2, 8]
    # outside every subgrid: pass-through (zero shift)
    lon, lat = np.array([-100.0]), np.array([10.0])
    lo2, la2 = t.fwd(lon, lat)
    assert lo2[0] == lon[0] and la2[0] == lat[0]


def test_inverse_fixed_iterations():
    """inv is the documented fixed-4 fixed-point: applying fwd to the
    inverse output reproduces the input to realistic-gradient accuracy
    (and exactly 4 iterations, so it is deterministic by construction)."""
    t = fixture_ntv2_transform()
    lon = np.linspace(-117.4, -112.6, 13)
    lat = np.linspace(42.6, 45.7, 13)
    LO, LA = np.meshgrid(lon, lat)
    lo2, la2 = t.fwd(LO, LA)
    lo3, la3 = t.inv(lo2, la2)
    # residual bounded by the contraction rate of the fixture field
    assert np.abs(lo3 - LO).max() * 3600.0 < 0.05
    assert np.abs(la3 - LA).max() * 3600.0 < 0.05


def test_warp_stage_and_family_route(ray_session):
    """WarpChipsNTv2 over a tiny Dataset through the projfam route:
    runs end-to-end, output shape preserved, and the stage's file-
    round-tripped transform equals the in-memory one."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.functions import codecs
    from gdal_ray.stages.warp import WarpChipsNTv2, warp_images_projfam

    rng = np.random.default_rng(7)
    rows = []
    for i in (0, 5, 9):
        img = rng.integers(0, 256, (20, 20, 3)).astype(np.uint8)
        rows.append({
            "image_id": f"img{i:06d}",
            "bytes": codecs.encode(img, "raw"),
            "w": 20, "h": 20, "fmt": "raw",
            "minx": 0.0, "miny": 0.0, "maxx": 20.0, "maxy": 20.0,
        })
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = warp_images_projfam(ds, "ntv2", concurrency=1,
                              batch_size=4).take_all()
    assert len(out) == 3
    st = WarpChipsNTv2()
    img = rng.integers(0, 256, (20, 20, 3)).astype(np.uint8)
    warped, bbox = st._warp_one(img, "img000005")
    assert warped.shape == img.shape
    lon0, lat0, gsd = synth_ntv2(5)
    # dst bbox is the forward-shifted corner envelope: within one
    # max-shift (32 sec) of the source footprint
    assert abs(bbox[0] - lon0) * 3600.0 <= 32.0
    assert abs(bbox[3] - (lat0 + gsd * 20)) * 3600.0 <= 32.0


# -------------------------------------------- GTX geoid grids (vertical)


def test_gtx_byte_anchors_and_roundtrip(tmp_path):
    """GTX header: 4 big-endian float64 (SW lat, SW lon 0..360, dlat,
    dlon) + 2 big-endian int32 (nrows, ncols); float32 BE values,
    row 0 = south edge."""
    import struct as st

    from gdal_ray.sources.ntv2 import read_gtx, write_gtx

    v = np.arange(12.0, dtype=np.float64).reshape(3, 4)
    p = str(tmp_path / "g.gtx")
    write_gtx(p, -10.0, -75.5, 0.5, 0.25, v)
    buf = open(p, "rb").read()
    lat0, lon0, dlat, dlon, nr, nc = st.unpack(">4d2i", buf[:40])
    assert (lat0, dlat, dlon, nr, nc) == (-10.0, 0.5, 0.25, 3, 4)
    assert lon0 == 284.5                       # -75.5 stored 0..360
    assert st.unpack(">f", buf[40:44])[0] == 0.0
    g = read_gtx(p)
    assert g["lon0"] == -75.5                  # normalized back
    assert np.array_equal(g["values"], v)


def test_geoid_shift_bilinear_and_exact_inverse(tmp_path):
    from gdal_ray.functions.proj import GeoidGridShift, synth_geoid
    from gdal_ray.sources.ntv2 import read_gtx, write_gtx

    fx = synth_geoid()
    p = str(tmp_path / "geoid.gtx")
    write_gtx(p, fx["lat0"], fx["lon0"], fx["dlat"], fx["dlon"],
              fx["values"])
    gs = GeoidGridShift(**read_gtx(p))
    # node-exact (float32 storage)
    v32 = fx["values"].astype(">f4").astype(np.float64)
    assert gs.undulation(fx["lon0"], fx["lat0"]) == v32[0, 0]
    # midpoint = 4-node average on a bilinear surface
    mid = gs.undulation(fx["lon0"] + fx["dlon"] / 2.0,
                        fx["lat0"] + fx["dlat"] / 2.0)
    assert abs(mid - v32[:2, :2].mean()) < 1e-12
    # orthometric <-> ellipsoidal is an exact inverse
    lon = fx["lon0"] + np.linspace(0.001, 0.9, 17) * fx["dlon"] * 40
    lat = fx["lat0"] + np.linspace(0.001, 0.9, 17) * fx["dlat"] * 32
    h = np.linspace(-100.0, 900.0, 17)
    H = gs.to_orthometric(h, lon, lat)
    assert np.array_equal(gs.to_ellipsoidal(H, lon, lat), h)
    assert not np.array_equal(H, h)            # it actually shifted
    # outside coverage: zero shift (PROJ soft path)
    assert gs.undulation(fx["lon0"] + 30.0, fx["lat0"]) == 0.0
    # triple protocol round trip
    lo, la, hh = gs.inv(*gs.fwd(lon, lat, h))
    assert np.array_equal(hh, h)


def test_geoid_shift_stage_spec_drive(ray_session):
    """raster_geoid_shift drives from JSON; the actor round-trips the
    fixture grid through a real .gtx file."""
    import ray.data as rd

    from gdal_ray.functions.codecs import decode, encode
    from gdal_ray.functions.proj import GeoidGridShift, synth_geoid
    from gdal_ray.pipelines.spec import run_pipeline

    rng = np.random.default_rng(42)
    img = rng.integers(60, 200, (16, 20, 3), dtype=np.uint8)
    ds = rd.from_items([{
        "image_id": "img0", "bytes": encode(img, "raw"),
        "w": 20, "h": 16, "fmt": "raw",
    }])
    out = run_pipeline([{"step": "raster_geoid_shift",
                         "concurrency": 1}], ds).take_all()
    got = decode(out[0]["bytes"], 20, 16, "raw")
    fx = synth_geoid()
    gs = GeoidGridShift(
        lat0=fx["lat0"], lon0=fx["lon0"], dlat=fx["dlat"],
        dlon=fx["dlon"],
        values=fx["values"].astype(">f4").astype(np.float64))
    nrows, ncols = gs.grid.shape
    lon = fx["lon0"] + (np.arange(20) + 0.5) / 20 * fx["dlon"] * (ncols - 1)
    lat = fx["lat0"] + fx["dlat"] * (nrows - 1) \
        - (np.arange(16) + 0.5) / 16 * fx["dlat"] * (nrows - 1)
    LO, LA = np.meshgrid(lon, lat)
    n = gs.undulation(LO, LA)
    want = np.clip(np.round(img.astype(np.float64) - n[:, :, None]),
                   0, 255).astype(np.uint8)
    assert np.array_equal(got, want)


def test_byn_geoid_grid(tmp_path):
    """NRCan BYN geoid grids (byndataset.h field table): header
    offsets, factor scaling, the (east-west+1)/dlon+1 size formula,
    registry dispatch."""
    import struct as _struct

    from gdal_ray.sources.ntv2 import read_byn, write_byn
    from gdal_ray.sources.registry import identify, open_raster

    rng = np.random.default_rng(13)
    g = rng.integers(-30000, 30000, (7, 9)) / 1000.0
    p = str(tmp_path / "g.byn")
    write_byn(p, g, south=44.0, west=-80.0, dlat=60.0, dlon=60.0)
    hdr = open(p, "rb").read(80)
    s, n, w, e = _struct.unpack_from("<iiii", hdr, 0)
    assert (s, w) == (44 * 3600, -80 * 3600)
    assert e == w + 8 * 60 - 1 and n == s + 6 * 60 - 1
    assert _struct.unpack_from("<hh", hdr, 16) == (60, 60)
    assert _struct.unpack_from("<d", hdr, 24)[0] == 1000.0
    assert _struct.unpack_from("<hh", hdr, 32) == (2, 2)
    assert _struct.unpack_from("<hh", hdr, 48) == (1, 0)
    m = read_byn(p)
    np.testing.assert_allclose(m["grid"], g, atol=5e-4)
    assert (m["south"], m["west"]) == (44.0, -80.0)
    assert identify(p) == "byn"
    assert open_raster(p)["driver"] == "byn"
