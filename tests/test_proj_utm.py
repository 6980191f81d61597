"""Transverse Mercator / UTM projection tests.

Independent validation (not the mirrored golden): the alpha series +
rectifying radius are pinned against a 200-point Gauss-Legendre
integration of the meridian arc (the defining property of the
rectifying latitude mapping — by analyticity of the Krueger complex
series, agreement on the central meridian pins every coefficient);
the beta series is pinned by forward->inverse round trips across the
zone; the UTM parametrization by EPSG-code semantics.
"""

import numpy as np
import pytest

from gdal_ray.functions import proj


def _meridian_arc(lat_deg: float) -> float:
    """Meridian distance from the equator by Gauss-Legendre quadrature
    of M(phi) = a(1-e^2) integral (1 - e^2 sin^2 t)^(-3/2) dt."""
    from numpy.polynomial.legendre import leggauss

    xs, ws = leggauss(200)
    phi = np.radians(lat_deg)
    t = 0.5 * (xs + 1.0) * phi
    integ = proj.A * (1 - proj.E2) * (1 - proj.E2 * np.sin(t) ** 2) ** -1.5
    return float(np.sum(ws * integ) * phi / 2.0)


@pytest.mark.parametrize("lat", [0.0, 10.0, 33.7, 45.0, 60.0, 80.0, 89.0])
def test_central_meridian_is_scaled_meridian_arc(lat):
    _, northing = proj.tm_forward(-117.0, lat, -117.0)
    assert abs(float(northing) - 0.9996 * _meridian_arc(lat)) < 1e-6


def test_forward_inverse_roundtrip_across_zone():
    rng = np.random.default_rng(42)
    lon = -120.0 + 6.0 * rng.random(5000)
    lat = -80.0 + 160.0 * rng.random(5000)
    e, n = proj.tm_forward(lon, lat, -117.0)
    lon2, lat2 = proj.tm_inverse(e, n, -117.0)
    assert np.max(np.abs(lon2 - lon)) < 1e-11
    assert np.max(np.abs(lat2 - lat)) < 1e-11


def test_utm_parametrization():
    # zone 11 north: central meridian -117, FE 500 km at the CM
    u = proj.UTMProjection("EPSG:32611")
    e, n = u.fwd(-117.0, 33.9)
    assert abs(float(e) - 500000.0) < 1e-6
    assert float(n) > 0
    # south zone gets the 10,000 km false northing
    lon0, fn = proj.parse_utm_epsg("EPSG:32711")
    assert lon0 == -117.0 and fn == 10000000.0
    s = proj.UTMProjection("EPSG:32711")
    _, n_s = s.fwd(-117.0, -33.9)
    assert 0 < float(n_s) < 10000000.0
    with pytest.raises(ValueError):
        proj.parse_utm_epsg("EPSG:3857")


def test_scale_factor_on_central_meridian():
    # numeric dN/dM must equal k0 (finite-difference tolerance)
    d = 1e-6
    _, n1 = proj.tm_forward(-117.0, 40.0 - d, -117.0)
    _, n2 = proj.tm_forward(-117.0, 40.0 + d, -117.0)
    k = (float(n2) - float(n1)) / (_meridian_arc(40.0 + d) - _meridian_arc(40.0 - d))
    assert abs(k - 0.9996) < 1e-7


def test_warp_chips_utm_stage():
    """The non-separable UTM warp stage: identity-content chip warps
    to a grid whose envelope matches the TM-inverse corners and whose
    interior is populated (nodata only at the non-rectangular edge)."""
    from gdal_ray.functions import codecs
    from gdal_ray.functions.proj import UTMProjection, synth_utm
    from gdal_ray.stages.warp import WarpChipsUTM
    import pyarrow as pa

    rng = np.random.default_rng(7)
    img = rng.integers(1, 255, size=(64, 64, 3), dtype=np.uint8)
    batch = pa.table({
        "image_id": ["img0"],
        "bytes": pa.array([codecs.encode(img, "raw")], pa.binary()),
        "w": pa.array([64], pa.int32()),
        "h": pa.array([64], pa.int32()),
        "fmt": ["raw"],
    })
    out = WarpChipsUTM(resampling="bilinear")(batch)
    epsg, e0, n0, gsd = synth_utm(0)
    prj = UTMProjection(epsg)
    clon, clat = prj.inv(
        np.array([e0, e0 + gsd * 64, e0 + gsd * 64, e0]),
        np.array([n0 + gsd * 64, n0 + gsd * 64, n0, n0]),
    )
    assert out.column("minx")[0].as_py() == float(np.min(clon))
    assert out.column("maxy")[0].as_py() == float(np.max(clat))
    warped = codecs.decode(out.column("bytes")[0].as_py(), 64, 64, "raw")
    # rotation between UTM grid north and geographic north is tiny at
    # 1 km scale: interior fully populated, values near the source's
    assert np.count_nonzero(warped[16:48, 16:48]) == 32 * 32 * 3
    assert abs(float(warped.mean()) - float(img.mean())) < 8.0


# ------------------------------------------------ transform composition


def test_composed_transform_roundtrip():
    """ComposedTransform (PROJ-pipeline analog): UTM -> lon/lat ->
    3857 round-trips through the chained inverse to meter accuracy."""
    import numpy as np

    from gdal_ray.functions.proj import (
        ComposedTransform,
        InverseOf,
        UTMProjection,
        WebMercatorProjection,
    )

    prj = UTMProjection("EPSG:32611")
    chain = ComposedTransform(InverseOf(prj), WebMercatorProjection())
    rng = np.random.default_rng(4)
    E = 320000.0 + rng.uniform(0, 200000, 50)
    N = 3600000.0 + rng.uniform(0, 400000, 50)
    x, y = chain.fwd(E, N)
    E2, N2 = chain.inv(x, y)
    assert np.allclose(E2, E, atol=1e-6)
    assert np.allclose(N2, N, atol=1e-6)
    # the chain equals the manual two-step application
    lon, lat = prj.inv(E, N)
    x1, y1 = WebMercatorProjection().fwd(lon, lat)
    assert (x1 == x).all() and (y1 == y).all()


def test_composed_chain_warp_matches_manual():
    """WarpChipsUTMChain output equals the manual compose-by-hand warp
    (same grid spec as WarpChipsUTM, dst in 3857)."""
    import numpy as np

    from gdal_ray.functions import kernels
    from gdal_ray.functions.proj import (
        UTMProjection,
        synth_utm,
    )
    from gdal_ray.functions import mercator
    from gdal_ray.stages.warp import WarpChipsUTMChain

    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    st = WarpChipsUTMChain(resampling="bilinear")
    out, env = st._warp_one(img, "img0000012")
    epsg, e0, n0, gsd = synth_utm(12)
    prj = UTMProjection(epsg)
    w = h = 32
    lon, lat = prj.inv(np.array([e0, e0 + gsd * w, e0 + gsd * w, e0]),
                       np.array([n0 + gsd * h, n0 + gsd * h, n0, n0]))
    cx, cy = mercator.lat_lon_to_meters(lat, lon)
    assert env == (cx.min(), cy.min(), cx.max(), cy.max())
    X = env[0] + (np.arange(w) + 0.5) * ((env[2] - env[0]) / w)
    Y = env[3] - (np.arange(h) + 0.5) * ((env[3] - env[1]) / h)
    XX, YY = np.meshgrid(X, Y)
    glat, glon = mercator.meters_to_lat_lon(XX, YY)
    E, N = prj.fwd(glon, glat)
    ref = kernels.resample_grid(
        img, (E - e0) / gsd - 0.5, (n0 + gsd * h - N) / gsd - 0.5,
        "bilinear", nodata=0,
    )
    assert (out == ref).all()
