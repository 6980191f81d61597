"""Parameter-level WKT1 import (functions.crswkt.build_from_wkt) —
the importFromWkt + OGRCreateCoordinateTransformation pair for text
with no (or unknown) AUTHORITY code.

Reference behavior: ogr/ogrspatialreference.cpp importFromWkt,
ogr/ogrct.cpp:1018.
"""

import re

import numpy as np
import pytest

from gdal_ray.functions import proj as P
from gdal_ray.functions.crswkt import (
    authority_code,
    build_from_wkt,
    from_wkt,
    parse_wkt1,
    to_wkt,
)
from gdal_ray.functions.epsg import resolve_epsg, sample_point


def _strip_authority(wkt: str) -> str:
    return re.sub(r',AUTHORITY\[[^\]]*\]', "", wkt)


# every named PROJCS entry the emitter covers, plus UTM samples
_CODES = [3857, 2154, 3034, 3035, 5070, 102003, 102008, 3413, 3031,
          3976, 3995, 5041, 5042, 6931, 6932, 3575, 6933, 4087,
          54008, 54009, 2193, 3577, 32633, 32733, 25832, 26915,
          3310, 26985, 3112]


@pytest.mark.parametrize("code", _CODES)
def test_param_import_bit_equals_registry(code):
    """Registry WKT with the AUTHORITY node REMOVED goes down the
    parameter path and must rebuild the identical transform."""
    wkt = _strip_authority(to_wkt(code))
    assert authority_code(wkt) is None
    prj = build_from_wkt(wkt)
    ref = resolve_epsg(code)
    lon, lat = sample_point(code)
    lons = np.array([lon - 0.5, lon, lon + 0.7])
    lats = np.array([lat - 0.3, lat, lat + 0.4])
    xr, yr = ref.fwd(lons, lats)
    xp, yp = prj.fwd(lons, lats)
    np.testing.assert_array_equal(xp, xr)
    np.testing.assert_array_equal(yp, yr)
    li, bi = prj.inv(xp, yp)
    np.testing.assert_allclose(li, lons, atol=1e-9)
    np.testing.assert_allclose(bi, lats, atol=1e-9)


def test_from_wkt_prefers_registry_then_params():
    # registered AUTHORITY -> registry object class
    assert isinstance(from_wkt(to_wkt(3857)), P.WebMercatorProjection)
    # unknown authority code but valid parameters -> parameter path
    wkt = to_wkt(2154).replace('"2154"', '"999999"')
    prj = from_wkt(wkt)
    ref = resolve_epsg(2154)
    x, y = prj.fwd(np.array([2.35]), np.array([48.85]))
    xr, yr = ref.fwd(np.array([2.35]), np.array([48.85]))
    np.testing.assert_array_equal(x, xr)
    np.testing.assert_array_equal(y, yr)


def test_towgs84_projcs_matches_datum_composed_registry():
    """A British National Grid WKT with the published TOWGS84 terms
    must match the registry's datum-composed 27700 entry bit-for-bit
    (same Helmert parameters, same TM)."""
    wkt = (
        'PROJCS["OSGB 1936 / British National Grid",'
        'GEOGCS["OSGB 1936",DATUM["OSGB_1936",'
        'SPHEROID["Airy 1830",6377563.396,299.3249646],'
        'TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,'
        '-20.4894]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",49],'
        'PARAMETER["central_meridian",-2],'
        'PARAMETER["scale_factor",0.9996012717],'
        'PARAMETER["false_easting",400000],'
        'PARAMETER["false_northing",-100000],UNIT["metre",1]]')
    prj = build_from_wkt(wkt)
    ref = resolve_epsg(27700)
    lons = np.array([-3.0, -1.5, 0.0])
    lats = np.array([51.0, 52.5, 54.0])
    xr, yr = ref.fwd(lons, lats)
    xp, yp = prj.fwd(lons, lats)
    np.testing.assert_array_equal(xp, xr)
    np.testing.assert_array_equal(yp, yr)


def test_geogcs_with_and_without_towgs84():
    null = build_from_wkt(
        'GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')
    assert isinstance(null, P.IdentityCRS)
    shifted = build_from_wkt(
        'GEOGCS["NTF",DATUM["Nouvelle_Triangulation_Francaise",'
        'SPHEROID["Clarke 1880 (IGN)",6378249.2,293.4660212936269],'
        'TOWGS84[-168,-60,320,0,0,0,0]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]]')
    ref = resolve_epsg(4275)
    x, y = shifted.fwd(np.array([2.34]), np.array([46.8]))
    xr, yr = ref.fwd(np.array([2.34]), np.array([46.8]))
    np.testing.assert_array_equal(x, xr)
    np.testing.assert_array_equal(y, yr)


def test_esri_spelling_and_unnamed_ellipsoid():
    """latitude_of_origin spelling for Albers (ESRI WKT habit) and a
    SPHEROID not in the named table (passes (a, 1/f) through)."""
    wkt = (
        'PROJCS["custom_albers",GEOGCS["GCS_Custom",'
        'DATUM["D_Custom",SPHEROID["Custom",6378200,297.5]],'
        'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Albers_Conic_Equal_Area"],'
        'PARAMETER["False_Easting",0],'
        'PARAMETER["False_Northing",0],'
        'PARAMETER["Central_Meridian",-96],'
        'PARAMETER["Standard_Parallel_1",29.5],'
        'PARAMETER["Standard_Parallel_2",45.5],'
        'PARAMETER["Latitude_Of_Origin",23],UNIT["Meter",1]]')
    prj = build_from_wkt(wkt)
    want = P.AlbersEqualArea(29.5, 45.5, 23.0, -96.0, 0.0, 0.0,
                             ellipsoid=(6378200.0, 297.5))
    x, y = prj.fwd(np.array([-96.0]), np.array([38.0]))
    xw, yw = want.fwd(np.array([-96.0]), np.array([38.0]))
    np.testing.assert_array_equal(x, xw)
    np.testing.assert_array_equal(y, yw)


def test_loud_errors():
    with pytest.raises(ValueError, match="unsupported"):
        build_from_wkt(
            'PROJCS["x",GEOGCS["g",DATUM["d",'
            'SPHEROID["s",6378137,298.257223563]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.017453292519943295]],'
            'PROJECTION["Hotine_Oblique_Mercator"],'
            'PARAMETER["central_meridian",0],UNIT["metre",1]]')
    with pytest.raises(ValueError, match="metre"):
        build_from_wkt(
            'PROJCS["ft",GEOGCS["g",DATUM["d",'
            'SPHEROID["s",6378137,298.257223563]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.017453292519943295]],'
            'PROJECTION["Transverse_Mercator"],'
            'PARAMETER["central_meridian",0],'
            'UNIT["US survey foot",0.3048006096012192]]')
    with pytest.raises(ValueError, match="missing parameter"):
        build_from_wkt(
            'PROJCS["x",GEOGCS["g",DATUM["d",'
            'SPHEROID["s",6378137,298.257223563]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.017453292519943295]],'
            'PROJECTION["Transverse_Mercator"],UNIT["metre",1]]')
    with pytest.raises(ValueError, match="AUTHORITY|GEOGCS|PROJCS"):
        build_from_wkt('LOCAL_CS["none",UNIT["metre",1]]')


def test_parser_structure():
    node = parse_wkt1('A["n",B[1,2.5,"s"],C["x"]]')
    assert node[0] == "A"
    assert node[1][0] == "n"
    assert node[1][1] == ("B", [1.0, 2.5, "s"])
    assert node[1][2] == ("C", ["x"])


def test_vector_reproject_accepts_wkt(ray_session):
    """src_srs as raw WKT text through the JSON spec layer — the
    .prj-string user surface (resolve_epsg WKT route)."""
    import ray.data as rd

    from gdal_ray.pipelines.spec import run_pipeline

    prj = resolve_epsg(2154)
    x, y = prj.fwd(np.array([2.35]), np.array([48.85]))
    x0, y0 = float(x[0]), float(y[0])
    src = rd.from_items([{
        "fid": 1,
        "xs": [x0, x0 + 100.0, x0 + 100.0, x0],
        "ys": [y0, y0, y0 + 100.0, y0],
    }])
    wkt = _strip_authority(to_wkt(2154))
    out = run_pipeline([{"step": "vector_reproject",
                         "src_srs": wkt}], src).take_all()
    ref = run_pipeline([{"step": "vector_reproject",
                         "src_srs": "EPSG:2154"}], src).take_all()
    assert out == ref and len(out) == 1
