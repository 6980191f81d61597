"""Text vector formats (sources.textvec): CSV with the OGR WKT
geometry column, KML 2.2 Placemarks, GPX 1.1 waypoints/tracks — all
round-tripping WKB bit-exactly through the repr-shortest WKT layer,
plus the vector_read/vector_write convert-step hops from JSON.

Reference behavior: ogr/ogrsf_frmts/{csv,kml,gpx}.
"""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import geom as G
from gdal_ray.sources.textvec import (
    read_csv_features,
    read_gpx,
    read_kml,
    write_csv_features,
    write_gpx,
    write_kml,
)


@pytest.fixture()
def features():
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0],
                     [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 1.0]])
    # awkward doubles prove the repr-shortest WKT bridge is bit-exact
    line = np.array([[0.1, 0.2], [0.1 + 0.2, 2.5], [3.25, 0.125]])
    return pa.table({
        "geometry": pa.array([G.wkb_point(10.25, -3.5),
                         G.wkb_linestring(line),
                         G.wkb_polygon([ring, hole])], pa.binary()),
        "name": pa.array(["pt", "ln, quoted", "pg"]),
        "score": pa.array([3, 14, 15], pa.int64()),
        "w": pa.array([0.5, 2.25, np.pi], pa.float64()),
    })


def test_csv_roundtrip_and_sniffing(tmp_path, features):
    p = str(tmp_path / "f.csv")
    write_csv_features(p, features)
    head = open(p).readline().strip()
    assert head == "WKT,name,score,w"
    r = read_csv_features(p)
    assert r.column("geometry").to_pylist() == features.column(
        "geometry").to_pylist()                       # bit-exact geometry
    assert r.column("score").type == pa.int64()
    assert r.column("w").type == pa.float64()
    assert r.column("w").to_pylist()[2] == np.pi  # repr round trip
    assert r.column("name").to_pylist()[1] == "ln, quoted"
    with pytest.raises(ValueError, match="WKT"):
        bad = str(tmp_path / "bad.csv")
        open(bad, "w").write("a,b\n1,2\n")
        read_csv_features(bad)


def test_kml_roundtrip(tmp_path, features):
    p = str(tmp_path / "f.kml")
    write_kml(p, features, name_col="name")
    txt = open(p).read()
    assert "http://www.opengis.net/kml/2.2" in txt
    assert "<outerBoundaryIs>" in txt and "<innerBoundaryIs>" in txt
    k = read_kml(p)
    assert k.column("geometry").to_pylist() == features.column(
        "geometry").to_pylist()
    assert k.column("name").to_pylist() == features.column(
        "name").to_pylist()
    assert k.column("score").to_pylist() == ["3", "14", "15"]


def test_gpx_roundtrip(tmp_path):
    line = np.array([[7.0, 46.0], [7.1, 46.05], [7.25, 46.125]])
    w = pa.table({"geometry": pa.array([G.wkb_point(7.125, 46.5)],
                                  pa.binary()),
                  "name": pa.array(["summit"]),
                  "ele": pa.array([4478.0])})
    trk = pa.table({"geometry": pa.array([G.wkb_linestring(line)],
                                    pa.binary()),
                    "name": pa.array(["route"])})
    p = str(tmp_path / "t.gpx")
    write_gpx(p, waypoints=w, tracks=trk)
    txt = open(p).read()
    assert 'lat="46.5"' in txt and 'lon="7.125"' in txt
    g = read_gpx(p)
    assert g["waypoints"].column("geometry").to_pylist() == \
        w.column("geometry").to_pylist()
    assert g["waypoints"].column("ele").to_pylist() == [4478.0]
    assert g["tracks"].column("geometry").to_pylist() == \
        trk.column("geometry").to_pylist()
    with pytest.raises(ValueError, match="points"):
        write_gpx(str(tmp_path / "x.gpx"), waypoints=trk)


def test_convert_steps_csv_kml_hops(tmp_path, features, ray_session):
    """gdal vector convert chain from JSON: table -> csv -> kml ->
    back, WKB identical across every hop."""
    import json

    import ray.data as rd

    from gdal_ray.pipelines.spec import run_pipeline

    ds = rd.from_arrow(features)
    csvp = str(tmp_path / "h.csv")
    kmlp = str(tmp_path / "h.kml")
    run_pipeline(json.dumps([{"step": "vector_write", "path": csvp}]),
                 ds).take_all()
    out = run_pipeline(json.dumps([
        {"step": "vector_read", "path": csvp},
        {"step": "vector_write", "path": kmlp},
    ])).take_all()
    assert out[0]["n"] == 3
    back = run_pipeline(json.dumps([
        {"step": "vector_read", "path": kmlp}])).take_all()
    got = sorted(r["geometry"] for r in back)
    assert got == sorted(features.column("geometry").to_pylist())


# -------------------------------------------------- GeoParquet 1.0


def _gp_layer(n=15, seed=42):
    rng = np.random.default_rng(seed)
    rows = {"fid": [], "wkb": []}
    for i in range(n):
        cx, cy = rng.uniform(-100.0, 100.0, 2)
        if i % 3 == 0:
            rows["wkb"].append(G.wkb_point(cx, cy))
        else:
            ang = np.linspace(0.0, 2.0 * np.pi, 7)[:-1]
            ring = np.stack([cx + 5.0 * np.cos(ang),
                             cy + 5.0 * np.sin(ang)], axis=1)
            ring = np.vstack([ring, ring[:1]])
            rows["wkb"].append(G.wkb_polygon([ring]))
        rows["fid"].append(i)
    return rows


def test_geoparquet_metadata_and_roundtrip(ray_session, tmp_path):
    """GeoParquet 1.0 (the reference's ogr/ogrsf_frmts/parquet driver
    contract): every written file carries the 'geo' footer metadata
    with encoding=WKB, aggregated geometry_types and the exact global
    bbox; reading validates and round-trips the rows."""
    import json

    import pyarrow.parquet as pq
    import ray.data as rd

    from gdal_ray.sources.geoparquet import (read_geoparquet,
                                             write_geoparquet)

    rows = _gp_layer()
    ds = rd.from_arrow(pa.table(rows))
    out = str(tmp_path / "gp")
    meta = write_geoparquet(ds, out)
    col = meta["columns"]["wkb"]
    assert col["encoding"] == "WKB"
    assert set(col["geometry_types"]) == {"Point", "Polygon"}
    # bbox equals the exact envelope union of the source WKB
    envs = np.array([G.envelope_wkb(w) for w in rows["wkb"]])
    want = [envs[:, 0].min(), envs[:, 1].min(),
            envs[:, 2].max(), envs[:, 3].max()]
    assert np.allclose(col["bbox"], want, atol=0.0)
    # footer anchor on the actual parquet file
    import glob
    import os

    f = sorted(glob.glob(os.path.join(out, "*.parquet")))[0]
    md = pq.read_schema(f).metadata
    assert b"geo" in md
    assert json.loads(md[b"geo"]) == meta
    ds2, meta2 = read_geoparquet(out)
    assert meta2 == meta
    got = sorted(ds2.take_all(), key=lambda r: r["fid"])
    for i, r in enumerate(got):
        assert bytes(r["wkb"]) == rows["wkb"][i]


def test_geoparquet_plain_parquet_loud(ray_session, tmp_path):
    import ray.data as rd

    from gdal_ray.sources.geoparquet import read_geoparquet

    ds = rd.from_items([{"a": 1}])
    out = str(tmp_path / "plain")
    ds.write_parquet(out)
    with pytest.raises(ValueError, match="geo"):
        read_geoparquet(out)
