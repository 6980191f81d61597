"""Shapefile source/sink (sources/shapefile.py)."""

import numpy as np
import pyarrow as pa

from gdal_ray.functions import geom as G
from gdal_ray.sources import shapefile as SHP


def _sample_table():
    sq = G.wkb_polygon([np.array(
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])])
    holed = G.wkb_polygon([
        np.array([[0.0, 0.0], [8.0, 0.0], [8.0, 8.0], [0.0, 8.0],
                  [0.0, 0.0]]),
        np.array([[2.0, 2.0], [3.0, 2.0], [3.0, 3.0], [2.0, 3.0],
                  [2.0, 2.0]]),
    ])
    return pa.table({
        "geometry": pa.array([sq, holed], pa.binary()),
        "name": pa.array(["sq", "holed"]),
        "rank": pa.array([7, 11], pa.int64()),
        "score": pa.array([1.5, -2.25], pa.float64()),
    })


def test_shapefile_polygon_roundtrip(tmp_path):
    t = _sample_table()
    path = str(tmp_path / "poly.shp")
    SHP.write_shapefile(t, path)
    back = SHP.shapefile_to_table(path)
    assert back.num_rows == 2
    assert back.column("name").to_pylist() == ["sq", "holed"]
    assert back.column("rank").to_pylist() == [7, 11]
    assert back.column("score").to_pylist() == [1.5, -2.25]
    # geometric equivalence (winding normalized to shapefile CW rule)
    for i, (n_rings, area2) in enumerate([(1, 32.0), (2, 126.0)]):
        rings = G.polygon_rings(
            G.parse_wkb(back.column("geometry")[i].as_py()))[0]
        assert len(rings) == n_rings
        tot = sum(abs(G.ring_area(r)) for r in rings)
        src = G.polygon_rings(
            G.parse_wkb(t.column("geometry")[i].as_py()))[0]
        assert tot == sum(abs(G.ring_area(r)) for r in src)


def test_shapefile_points_and_sink(ray_session, tmp_path):
    import ray.data as rd

    pts = pa.table({
        "geometry": pa.array(
            [G.wkb_point(float(i), float(-i)) for i in range(5)],
            pa.binary()),
        "pid": pa.array(list(range(5)), pa.int64()),
    })
    out = str(tmp_path / "parts")
    res = SHP.write_shapefile_sink(rd.from_arrow(pts), out).take_all()
    assert sum(r["n"] for r in res) == 5
    back = SHP.read_shapefile(out).take_all()
    assert sorted(r["pid"] for r in back) == [0, 1, 2, 3, 4]
    got = {r["pid"]: G.parse_wkb(r["geometry"])[1] for r in back}
    assert got[3] == (3.0, -3.0)


# ------------------------------------------------ .prj / CRS WKT1


def test_prj_sidecar_roundtrip(tmp_path):
    """write_shapefile(srs=...) emits the registry WKT1 .prj; read_prj
    recovers the code via the AUTHORITY node (exportToWkt /
    importFromWkt analog)."""
    from gdal_ray.functions.geom import wkb_point
    from gdal_ray.sources.shapefile import (read_prj, write_shapefile)

    t = pa.table({"geometry": [wkb_point(1.0, 2.0)], "name": ["a"]})
    p = str(tmp_path / "pts.shp")
    write_shapefile(t, p, srs=4326)
    wkt = open(str(tmp_path / "pts.prj")).read()
    assert wkt.startswith('GEOGCS["WGS 84"')
    assert read_prj(p) == 4326
    p2 = str(tmp_path / "utm.shp")
    write_shapefile(t, p2, srs="EPSG:32633")
    wkt2 = open(str(tmp_path / "utm.prj")).read()
    assert 'PROJECTION["Transverse_Mercator"]' in wkt2
    assert 'PARAMETER["central_meridian",15]' in wkt2
    assert read_prj(p2) == 32633


def test_crswkt_all_registry_entries():
    """Every null-shift registry code either emits WKT whose
    AUTHORITY round-trips to the same code, or raises the documented
    datum-composed error."""
    import pytest as _pytest

    from gdal_ray.functions.crswkt import authority_code, from_wkt, to_wkt
    from gdal_ray.functions.epsg import (DATUM_SHIFTED, resolve_epsg,
                                         supported_codes)

    n_ok = 0
    for code in supported_codes():
        if code in DATUM_SHIFTED:
            with _pytest.raises(ValueError):
                to_wkt(code)
            continue
        wkt = to_wkt(code)
        assert authority_code(wkt) == code
        # from_wkt resolves to a transform equal to the direct one
        a = from_wkt(wkt)
        b = resolve_epsg(code)
        import numpy as np

        lon = np.array([10.0, 11.0])
        lat = np.array([45.0, 46.0])
        xa, ya = a.fwd(lon, lat)
        xb, yb = b.fwd(lon, lat)
        assert np.array_equal(xa, xb) and np.array_equal(ya, yb)
        n_ok += 1
    assert n_ok > 150


def test_dbf_logical_and_date_fields(tmp_path):
    """dBase 'L' (logical) and 'D' (YYYYMMDD date) field types: bool
    columns write as single-byte T/F (?=null), date32 columns as
    8-digit dates, both reading back through the OGR conventions
    (bool, ISO date string)."""
    import datetime

    from gdal_ray.functions.geom import wkb_point
    from gdal_ray.sources.shapefile import (shapefile_to_table,
                                            write_shapefile)

    t = pa.table({
        "geometry": [wkb_point(float(i), 0.0) for i in range(3)],
        "ok": pa.array([True, False, None], pa.bool_()),
        "day": pa.array([datetime.date(2026, 8, 20),
                         datetime.date(1999, 1, 2), None],
                        pa.date32()),
        "name": ["a", "b", "c"],
    })
    p = str(tmp_path / "ld.shp")
    write_shapefile(t, p)
    buf = open(str(tmp_path / "ld.dbf"), "rb").read()
    # field descriptors: type bytes at offset 32*k+11
    ftypes = [chr(buf[32 * k + 11]) for k in range(1, 4)]
    assert ftypes == ["L", "D", "C"]
    back = shapefile_to_table(p)
    assert back.column("ok").to_pylist() == [True, False, None]
    assert back.column("day").to_pylist() == ["2026-08-20",
                                              "1999-01-02", None]
    assert back.column("name").to_pylist() == ["a", "b", "c"]
