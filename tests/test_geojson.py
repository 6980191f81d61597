"""GeoJSON source/sink (sources/geojson.py)."""

import json

import numpy as np
import pyarrow as pa

from gdal_ray.sources import geojson as GJ


_FC = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [1.5, 2.5]},
         "properties": {"name": "a", "v": 1}},
        {"type": "Feature",
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4],
                                       [0, 0]]]},
         "properties": {"name": "b", "v": 2}},
        {"type": "Feature",
         "geometry": {"type": "MultiPolygon",
                      "coordinates": [[[[0, 0], [1, 0], [1, 1], [0, 0]]],
                                      [[[5, 5], [6, 5], [6, 6], [5, 5]]]]},
         "properties": {"name": "c", "v": None}},
    ],
}


def test_geojson_parse_roundtrip():
    t = GJ.geojson_to_table(json.dumps(_FC))
    assert t.num_rows == 3
    assert set(t.column_names) == {"geometry", "name", "v"}
    from gdal_ray.functions.geom import envelope_wkb, parse_wkb

    k0, p0 = parse_wkb(t.column("geometry")[0].as_py())
    assert k0 == "point" and p0 == (1.5, 2.5)
    assert envelope_wkb(t.column("geometry")[1].as_py()) == (0, 0, 4, 4)
    # render back and re-parse: identical WKB + properties
    out = GJ.table_to_geojson(t)
    t2 = GJ.geojson_to_table(out)
    assert t2.column("geometry").to_pylist() == \
        t.column("geometry").to_pylist()
    assert t2.column("name").to_pylist() == ["a", "b", "c"]


def test_geojson_unclosed_ring_is_closed():
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature",
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [2, 0], [2, 2]]]},
         "properties": {}},
    ]}
    t = GJ.geojson_to_table(json.dumps(fc))
    from gdal_ray.functions.geom import parse_wkb

    kind, rings = parse_wkb(t.column("geometry")[0].as_py())
    assert kind == "polygon"
    assert np.array_equal(rings[0][0], rings[0][-1])


def test_geojson_sink_and_source(ray_session, tmp_path):
    import ray.data as rd

    t = GJ.geojson_to_table(json.dumps(_FC))
    ds = rd.from_arrow(t)
    out = str(tmp_path / "gj")
    res = GJ.write_geojson(ds, out).take_all()
    assert sum(r["n"] for r in res) == 3
    back = GJ.read_geojson(out).take_all()
    assert len(back) == 3
    assert sorted(r["name"] for r in back) == ["a", "b", "c"]
