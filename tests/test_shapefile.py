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
