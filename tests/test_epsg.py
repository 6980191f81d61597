"""EPSG code -> parameter registry (functions.epsg) — the PROJ
database front door (`ogr/ogrct.cpp:1018`
OGRCreateCoordinateTransformation / importFromEPSG analog).

Anchors are DEFINITIONAL, not memorized doubles: a projected CRS's
forward at its own natural/false origin equals (FE, FN) by
construction of the EPSG parametrization, UTM registry entries must be
bit-identical to the existing Krueger fast path, and fwd/inv must
round-trip.  Two loose (±5 km) city bounds catch gross parameter
transposition without relying on externally-sourced precise values.
"""

import numpy as np
import pytest

from gdal_ray.functions import proj as P
from gdal_ray.functions.epsg import (
    DATUM_SHIFTED,
    parse_code,
    resolve_epsg,
    sample_point,
    supported_codes,
    synth_epsg,
)

# (code, origin lon, origin lat, FE, FN) — each is the CRS definition's
# own natural/false origin, where fwd == (FE, FN) exactly.
ORIGIN_ANCHORS = [
    (2154, 3.0, 46.5, 700000.0, 6600000.0),          # Lambert-93
    (5070, -96.0, 23.0, 0.0, 0.0),                   # Conus Albers
    (102003, -96.0, 37.5, 0.0, 0.0),                 # ESRI Albers
    (3035, 10.0, 52.0, 4321000.0, 3210000.0),        # LAEA Europe
    (3413, -45.0, 90.0, 0.0, 0.0),                   # NSIDC north
    (3031, 0.0, -90.0, 0.0, 0.0),                    # Antarctic PS
    (5041, 0.0, 90.0, 2000000.0, 2000000.0),         # UPS North
    (5042, 0.0, -90.0, 2000000.0, 2000000.0),        # UPS South
    (2193, 173.0, 0.0, 1600000.0, 10000000.0),       # NZTM
    (3577, 132.0, 0.0, 0.0, 0.0),                    # Australian Albers
    (54008, 0.0, 0.0, 0.0, 0.0),                     # World Sinusoidal
    (54009, 0.0, 0.0, 0.0, 0.0),                     # World Mollweide
    (6933, 0.0, 0.0, 0.0, 0.0),                      # EASE-Grid 2.0
    (4087, 0.0, 0.0, 0.0, 0.0),                      # World EqC
    (32631, 3.0, 0.0, 500000.0, 0.0),                # UTM 31N
    (32731, 3.0, 0.0, 500000.0, 10000000.0),         # UTM 31S
    (25832, 9.0, 0.0, 500000.0, 0.0),                # ETRS89 UTM 32N
    (26917, -81.0, 0.0, 500000.0, 0.0),              # NAD83 UTM 17N
]


@pytest.mark.parametrize("code,lon,lat,fe,fn", ORIGIN_ANCHORS)
def test_origin_anchor(code, lon, lat, fe, fn):
    x, y = resolve_epsg(code).fwd(np.float64(lon), np.float64(lat))
    assert abs(float(x) - fe) < 1e-6
    assert abs(float(y) - fn) < 1e-6


def test_datum_shifted_projection_origins():
    """For datum-composed CRS the (FE, FN) anchor holds at the origin
    expressed in the SOURCE datum — test the projection step alone."""
    # NTF (Paris) / Lambert zone II etendu: Paris meridian, 52 grad
    l2e = P.LambertConformalConic(
        46.8, 46.8, 46.8, 2.337229166666667, 600000.0, 2200000.0,
        k0=0.99987742, ellipsoid="clarke1880ign")
    x, y = l2e.fwd(2.337229166666667, 46.8)
    assert abs(float(x) - 600000.0) < 1e-6
    assert abs(float(y) - 2200000.0) < 1e-6
    # British National Grid on Airy 1830
    bng = P.TransverseMercator(
        49.0, -2.0, 0.9996012717, 400000.0, -100000.0, "airy1830")
    x, y = bng.fwd(-2.0, 49.0)
    assert abs(float(x) - 400000.0) < 1e-6
    assert abs(float(y) + 100000.0) < 1e-6


def test_city_bounds():
    """Loose ±5 km bounds on famous points: catches transposed or
    mis-scaled parameters without relying on memorized doubles."""
    x, y = resolve_epsg(2154).fwd(2.3522, 48.8566)       # Paris
    assert abs(x - 652000.0) < 5000.0 and abs(y - 6862000.0) < 5000.0
    x, y = resolve_epsg(27700).fwd(-0.1276, 51.5072)     # London
    assert abs(x - 530000.0) < 5000.0 and abs(y - 180000.0) < 5000.0


def test_utm_registry_bit_equals_fast_path():
    x = np.linspace(-1.0, 7.0, 64)
    y = np.linspace(35.0, 60.0, 64)
    for code in (32631, 32731):
        a = resolve_epsg(code).fwd(x, y)
        b = P.UTMProjection(f"EPSG:{code}").fwd(x, y)
        assert np.array_equal(a[0], b[0])
        assert np.array_equal(a[1], b[1])


def test_roundtrip_every_code():
    for code in supported_codes():
        prj = resolve_epsg(code)
        lon, lat = sample_point(code)
        lons = lon + np.linspace(-0.5, 0.5, 7)
        lats = lat + np.linspace(-0.5, 0.5, 7)
        X, Y = prj.fwd(lons, lats)
        lo, la = prj.inv(X, Y)
        # datum-composed codes carry the documented h=0 2-D contract
        # (~1e-8 deg); null-datum codes round-trip to 1e-9
        tol = 1e-7 if code in DATUM_SHIFTED else 1e-9
        assert np.abs(lo - lons).max() < tol, code
        assert np.abs(la - lats).max() < tol, code


def test_lcc_scale_unity_at_standard_parallels():
    """Lambert-93's local meridional scale factor is exactly 1 at the
    standard parallels 44°N / 49°N (defining property of 2SP LCC)."""
    prj = resolve_epsg(2154)
    for lat in (44.0, 49.0):
        d = 1e-6
        x1, y1 = prj.fwd(3.0, lat - d)
        x2, y2 = prj.fwd(3.0, lat + d)
        ground = np.radians(2 * d) * _meridian_radius(lat)
        k = float(np.hypot(x2 - x1, y2 - y1)) / ground
        assert abs(k - 1.0) < 1e-6


def _meridian_radius(lat_deg, a=6378137.0, inv_f=298.257222101):
    f = 1.0 / inv_f
    e2 = f * (2.0 - f)
    s = np.sin(np.radians(lat_deg))
    return a * (1.0 - e2) / (1.0 - e2 * s * s) ** 1.5


def test_parse_and_aliases():
    assert parse_code("EPSG:2154") == 2154
    assert parse_code("ESRI:102003") == 102003
    assert parse_code(900913) == 3857
    assert parse_code("EPSG:102100") == 3857


def test_unknown_code_loud():
    with pytest.raises(ValueError, match="family:"):
        resolve_epsg(31370)


def test_synth_epsg_deterministic_and_dyadic():
    for code in (2154, 3413, 27700):
        a = synth_epsg(code, 5)
        b = synth_epsg(code, 5)
        assert a == b
        x0, y0, gsd = a
        assert x0 == np.floor(x0) and y0 == np.floor(y0)
        assert gsd == 16.0


def test_geographic_identity_and_shifts():
    ident = resolve_epsg(4326)
    lon, lat = ident.fwd(np.array([12.5]), np.array([41.9]))
    assert lon[0] == 12.5 and lat[0] == 41.9
    # OSGB36 geographic: shift magnitude is the published ~100 m-scale
    osgb = resolve_epsg(4277)
    lo, la = osgb.fwd(np.float64(-2.0), np.float64(53.0))
    dist_m = np.hypot((float(lo) + 2.0) * 111320.0 * np.cos(np.radians(53.0)),
                      (float(la) - 53.0) * 110574.0)
    assert 10.0 < dist_m < 300.0


def test_spec_step_epsg_codes(ray_session):
    """raster_reproject / vector_reproject drive from EPSG codes
    through the JSON spec layer (the importFromEPSG user surface)."""
    import ray.data as rd

    from gdal_ray.functions.codecs import encode
    from gdal_ray.pipelines.spec import run_pipeline

    rng = np.random.default_rng(42)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    rows = {
        "image_id": ["img5"],
        "bytes": [encode(img, "raw")],
        "w": [16], "h": [16], "fmt": ["raw"],
        "minx": [0.0], "miny": [0.0], "maxx": [256.0], "maxy": [256.0],
    }
    ds = rd.from_arrow(__import__("pyarrow").table(rows))
    out = run_pipeline([{"step": "raster_reproject",
                         "src_srs": "EPSG:2154", "concurrency": 1}], ds)
    t = out.take_all()
    assert len(t) == 1
    # unknown code fails loudly at plan time
    with pytest.raises(ValueError, match="registry"):
        run_pipeline([{"step": "raster_reproject",
                       "src_srs": "EPSG:31370"}], ds).take_all()


def test_epsg_pair_warp_chain(ray_session):
    """raster_reproject src EPSG -> dst EPSG composes
    src-inverse -> WGS84 -> dst-forward (the -s_srs/-t_srs pair);
    identity pair (2154 -> 2154) reproduces the source chip for the
    interior (nearest resampling, same grid)."""
    import ray.data as rd

    from gdal_ray.functions.codecs import decode, encode
    from gdal_ray.pipelines.spec import run_pipeline

    rng = np.random.default_rng(42)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    ds = rd.from_items([{
        "image_id": "img5", "bytes": encode(img, "raw"),
        "w": 16, "h": 16, "fmt": "raw",
    }])
    out = run_pipeline([{"step": "raster_reproject",
                         "src_srs": "EPSG:2154",
                         "dst_srs": "EPSG:3035",
                         "resampling": "bilinear",
                         "concurrency": 1}], ds).take_all()
    assert len(out) == 1
    got = decode(out[0]["bytes"], 16, 16, "raw")
    assert got.shape == img.shape
    # identity pair: chain fwd == chain inv == same grid -> same chip
    out2 = run_pipeline([{"step": "raster_reproject",
                          "src_srs": "EPSG:2154",
                          "dst_srs": "EPSG:2154",
                          "resampling": "near",
                          "concurrency": 1}], ds).take_all()
    got2 = decode(out2[0]["bytes"], 16, 16, "raw")
    assert np.array_equal(got2, img)


def test_epsg_pair_chain_coordinates():
    """Chain math: 2154 -> 3035 equals manual via-WGS84 composition
    to machine precision over the shared validity window."""
    from gdal_ray.functions.epsg import resolve_epsg
    from gdal_ray.functions.proj import ComposedTransform, InverseOf

    a = resolve_epsg(2154)
    b = resolve_epsg(3035)
    chain = ComposedTransform(InverseOf(a), b)
    E = 700000.0 + np.linspace(-5e4, 5e4, 9)
    N = 6600000.0 + np.linspace(-5e4, 5e4, 9)
    lon, lat = a.inv(E, N)
    wx, wy = b.fwd(lon, lat)
    cx, cy = chain.fwd(E, N)
    assert np.array_equal(cx, wx) and np.array_equal(cy, wy)
    # round trip through the chain
    e2, n2 = chain.inv(cx, cy)
    assert np.abs(e2 - E).max() < 1e-6
    assert np.abs(n2 - N).max() < 1e-6


def test_polar_laea_codes():
    """Polar-aspect LAEA (EASE-Grid 2.0 N/S, North Pole LAEA Europe):
    origin at the pole, round trips, and the equal-area defining
    property (ring at 80N maps to a circle whose area equals the
    authalic cap area)."""
    n = resolve_epsg(6931)
    x, y = n.fwd(0.0, 90.0)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
    s = resolve_epsg(6932)
    xs, ys = s.fwd(0.0, -90.0)
    assert abs(float(xs)) < 1.0 and abs(float(ys)) < 1.0  # fp at pole
    for code, lat in ((6931, 75.0), (6932, -75.0), (3575, 72.0)):
        prj = resolve_epsg(code)
        lons = np.linspace(-170.0, 170.0, 13)
        lats = np.full(13, lat)
        lo, la = prj.inv(*prj.fwd(lons, lats))
        assert np.abs(lo - lons).max() < 1e-9
        assert np.abs(la - lats).max() < 1e-9
    # equal-area property: pi*rho(80N)^2 == authalic area north of 80N
    from gdal_ray.functions.proj import (A as _A, E1 as _E1, E2 as _E2,
                                         _q_snyder)
    x80, y80 = n.fwd(0.0, 80.0)
    rho = np.hypot(float(x80), float(y80))
    qp = _q_snyder(np.pi / 2.0, _E1, _E2)
    q80 = _q_snyder(np.radians(80.0), _E1, _E2)
    cap = np.pi * _A ** 2 * (qp - q80)
    assert abs(np.pi * rho ** 2 - cap) / cap < 1e-12


def test_vector_reproject_pair(ray_session):
    """vector_reproject src EPSG -> dst EPSG: ring sums equal the
    manual chain over the same coordinates."""
    import math

    import ray.data as rd

    from gdal_ray.functions.epsg import resolve_epsg
    from gdal_ray.pipelines.spec import run_pipeline

    a = resolve_epsg(2154)
    b = resolve_epsg(3035)
    ring = np.array([[700000.0, 6600000.0], [710000.0, 6600000.0],
                     [710000.0, 6610000.0], [700000.0, 6610000.0],
                     [700000.0, 6600000.0]])
    ds = rd.from_items([{"fid": 1,
                         "xs": ring[:, 0].tolist(),
                         "ys": ring[:, 1].tolist()}])
    out = run_pipeline([{"step": "vector_reproject",
                         "src_srs": "EPSG:2154",
                         "dst_srs": "EPSG:3035"}], ds).take_all()
    lon, lat = a.inv(ring[:, 0], ring[:, 1])
    wx, wy = b.fwd(lon, lat)
    assert abs(out[0]["lon_fsum"] - math.fsum(wx)) < 1e-9
    assert abs(out[0]["lat_fsum"] - math.fsum(wy)) < 1e-9


def test_round5b_codes_and_6350_alias():
    """3310 / 26985 / 3112 resolve with their defining invariants;
    6350 aliases Conus Albers (identical parameters)."""
    import numpy as np

    from gdal_ray.functions.epsg import parse_code, resolve_epsg

    assert parse_code("EPSG:6350") == 5070
    ca = resolve_epsg(3310)
    # lat0=0, lon0=-120, fn=-4 000 000: the projection origin
    x, y = ca.fwd(np.array([-120.0]), np.array([0.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0] + 4000000.0) < 1e-6
    md = resolve_epsg(26985)
    x, y = md.fwd(np.array([-77.0]), np.array([37.666666666666664]))
    assert abs(x[0] - 400000.0) < 1e-6 and abs(y[0]) < 1e-6
    au = resolve_epsg(3112)
    x, y = au.fwd(np.array([134.0]), np.array([0.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    # round trips at the sample points
    for code, lon, lat in ((3310, -120.0, 37.0), (26985, -77.0, 39.0),
                           (3112, 134.0, -25.0)):
        p = resolve_epsg(code)
        xx, yy = p.fwd(np.array([lon]), np.array([lat]))
        lo, la = p.inv(xx, yy)
        assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9
