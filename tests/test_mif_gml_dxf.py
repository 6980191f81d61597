"""MIF/MID, GML, DXF, PGDump (sources.mif/gml/dxf/pgdump): text
anchors against the published layouts, WKB-invariant round trips,
hole reassembly, GML2/GML3 spellings, closed-polyline => polygon,
COPY escaping.

Reference behavior: ogr/ogrsf_frmts/mitab (MIF half), ogr/ogrsf_frmts/
gml, ogr/ogrsf_frmts/dxf, ogr/ogrsf_frmts/pgdump.
"""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import geom as G
from gdal_ray.sources.dxf import read_dxf, write_dxf
from gdal_ray.sources.gml import read_gml, write_gml
from gdal_ray.sources.mif import read_mif, write_mif
from gdal_ray.sources.pgdump import write_pgdump


def _sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                     [x0, y0 + s], [x0, y0]], dtype=float)


@pytest.fixture()
def feat_table():
    geoms = [
        G.wkb_point(2.5, -7.25),
        G.wkb_linestring(np.array([[0.0, 0.0], [10.0, 5.0]])),
        G.wkb_linestring(np.array([[0.0, 0.0], [1.0, 2.0],
                                   [3.0, 1.0]])),
        G.wkb_polygon([_sq(0, 0, 10), _sq(2, 2, 2)[::-1]]),
        G.wkb_multipolygon([[_sq(20, 20, 4)], [_sq(30, 30, 2)]]),
        G.wkb_multilinestring([np.array([[0.0, 1.0], [2.0, 3.0]]),
                               np.array([[5.0, 5.0], [6.0, 7.0],
                                         [8.0, 7.0]])]),
    ]
    return pa.table({
        "geometry": pa.array(geoms, pa.binary()),
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "score": pa.array([0.5, 1.25, -3.0, 2.0, 0.0, 9.5],
                          pa.float64()),
        "name": pa.array(["a", "b with, comma", "c", "d", "e", "f"],
                         pa.string()),
    })


def test_mif_anchors_and_roundtrip(tmp_path, feat_table):
    p = str(tmp_path / "f.mif")
    write_mif(p, feat_table)
    txt = open(p).read()
    assert txt.startswith("Version 300\n")
    assert 'Delimiter ","' in txt
    assert "Columns 3" in txt
    assert "  id Integer" in txt
    assert "  score Float" in txt
    assert "  name Char(254)" in txt
    assert "Point 2.5 -7.25" in txt
    assert "Line 0 0 10 5" in txt          # 2-vertex shortcut
    assert "Pline 3" in txt
    assert "Region 2" in txt               # polygon with hole
    assert "Pline Multiple 2" in txt
    mid = open(str(tmp_path / "f.mid")).read()
    assert '"b with, comma"' in mid
    t = read_mif(p)
    assert t.column_names == ["geometry", "id", "score", "name"]
    assert t.column("id").to_pylist() == [1, 2, 3, 4, 5, 6]
    assert t.column("score").to_pylist() == feat_table.column(
        "score").to_pylist()
    assert t.column("name").to_pylist() == feat_table.column(
        "name").to_pylist()
    # WKB-invariant geometries (hole reassembled by containment)
    for got, want in zip(t.column("geometry").to_pylist(),
                         feat_table.column("geometry").to_pylist()):
        kg, vg = G.parse_wkb(got)
        kw, vw = G.parse_wkb(want)
        assert kg == kw
        if kg == "point":
            assert vg == vw
        elif kg in ("linestring",):
            np.testing.assert_allclose(vg, vw)
        elif kg == "polygon":
            assert len(vg) == len(vw)
            np.testing.assert_allclose(vg[0], vw[0])
            np.testing.assert_allclose(vg[1], vw[1])
        elif kg == "multipolygon":
            assert len(vg) == len(vw)
        elif kg == "multilinestring":
            for a, b in zip(vg, vw):
                np.testing.assert_allclose(a, b)


def test_mif_nested_island_in_lake(tmp_path):
    # square with a lake, island inside the lake: depths 0,1,2 ->
    # the island is a second exterior (multipolygon), mitab's rule
    outer = _sq(0, 0, 100)
    lake = _sq(10, 10, 50)[::-1]
    island = _sq(20, 20, 10)
    t = pa.table({"geometry": pa.array(
        [G.wkb_multipolygon([[outer, lake], [island]])], pa.binary())})
    p = str(tmp_path / "n.mif")
    write_mif(p, t)
    k, v = G.parse_wkb(read_mif(p).column("geometry")[0].as_py())
    assert k == "multipolygon"
    assert sorted(len(poly) for poly in v) == [1, 2]


def test_gml_write_read_and_gml3_spelling(tmp_path, feat_table):
    p = str(tmp_path / "f.gml")
    write_gml(p, feat_table)
    txt = open(p).read()
    assert "FeatureCollection" in txt and "featureMember" in txt
    assert "outerBoundaryIs" in txt and "innerBoundaryIs" in txt
    assert "2.5,-7.25" in txt
    t = read_gml(p)
    assert t.num_rows == feat_table.num_rows
    assert t.column("id").to_pylist() == [1, 2, 3, 4, 5, 6]
    assert t.column("score").to_pylist() == feat_table.column(
        "score").to_pylist()
    for got, want in zip(t.column("geometry").to_pylist(),
                         feat_table.column("geometry").to_pylist()):
        assert got == want            # byte-exact: same WKB builders
    # GML 3 spelling reads identically
    gml3 = """<?xml version="1.0"?>
<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs"
  xmlns:gml="http://www.opengis.net/gml" xmlns:x="http://x/">
 <gml:featureMember>
  <x:road><x:geom><gml:LineString>
    <gml:posList>1 2 3 4 5 6</gml:posList>
  </gml:LineString></x:geom><x:nm>r1</x:nm></x:road>
 </gml:featureMember>
 <gml:featureMember>
  <x:road><x:geom><gml:Polygon><gml:exterior><gml:LinearRing>
    <gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList>
  </gml:LinearRing></gml:exterior></gml:Polygon></x:geom>
  <x:nm>r2</x:nm></x:road>
 </gml:featureMember>
</wfs:FeatureCollection>"""
    p3 = str(tmp_path / "g3.gml")
    open(p3, "w").write(gml3)
    t3 = read_gml(p3)
    assert t3.num_rows == 2
    k, v = G.parse_wkb(t3.column("geometry")[0].as_py())
    assert k == "linestring"
    np.testing.assert_array_equal(v, [[1, 2], [3, 4], [5, 6]])
    k2, v2 = G.parse_wkb(t3.column("geometry")[1].as_py())
    assert k2 == "polygon" and len(v2[0]) == 5
    assert t3.column("nm").to_pylist() == ["r1", "r2"]


def test_dxf_anchors_and_roundtrip(tmp_path, feat_table):
    p = str(tmp_path / "f.dxf")
    write_dxf(p, feat_table)
    txt = open(p).read()
    assert "ENTITIES" in txt and txt.rstrip().endswith("EOF")
    assert "LWPOLYLINE" in txt and "\n70\n1\n" in txt  # closed flag
    t = read_dxf(p)
    kinds = [G.parse_wkb(b)[0] for b in t.column("geometry").to_pylist()]
    # point, line, pline, polygon->2 rings, multipolygon->2 rings,
    # multilinestring->2 open plines = 9 entities
    assert kinds == ["point", "linestring", "linestring", "polygon",
                     "polygon", "polygon", "polygon", "linestring",
                     "linestring"]
    k, v = G.parse_wkb(t.column("geometry")[0].as_py())
    assert v == (2.5, -7.25)
    # closed ring round-trips with the wrap vertex restored
    k, rings = G.parse_wkb(t.column("geometry")[3].as_py())
    np.testing.assert_allclose(rings[0], _sq(0, 0, 10))
    assert t.column("Layer").to_pylist() == ["0"] * 9


def test_dxf_r12_polyline_and_layers(tmp_path):
    r12 = "\n".join([
        "0", "SECTION", "2", "ENTITIES",
        "0", "POLYLINE", "8", "roads", "70", "1",
        "0", "VERTEX", "10", "0", "20", "0",
        "0", "VERTEX", "10", "5", "20", "0",
        "0", "VERTEX", "10", "5", "20", "5",
        "0", "SEQEND",
        "0", "POINT", "8", "pts", "10", "7", "20", "8",
        "0", "ENDSEC", "0", "EOF", ""])
    p = str(tmp_path / "r12.dxf")
    open(p, "w").write(r12)
    t = read_dxf(p)
    assert t.column("Layer").to_pylist() == ["roads", "pts"]
    k, rings = G.parse_wkb(t.column("geometry")[0].as_py())
    assert k == "polygon"
    np.testing.assert_array_equal(
        rings[0], [[0, 0], [5, 0], [5, 5], [0, 0]])


def test_pgdump_anchors(tmp_path, feat_table):
    p = str(tmp_path / "f.sql")
    tbl = feat_table.append_column(
        "note", pa.array(["tab\there", None, "x", "y", "z", "w"]))
    write_pgdump(p, tbl, table_name="roads", srid=4326)
    txt = open(p).read()
    assert 'CREATE TABLE "public"."roads"' in txt
    assert '"id" BIGINT' in txt and '"score" DOUBLE PRECISION' in txt
    assert "AddGeometryColumn('public','roads','geometry',4326" in txt
    assert "COPY" in txt and txt.rstrip().endswith("COMMIT;")
    body = txt.split("FROM STDIN;\n")[1].split("\n\\.")[0]
    rows = body.splitlines()
    assert len(rows) == 6
    assert rows[0].split("\t")[0] == "1"
    assert r"tab\there" in rows[0]          # COPY tab escaping
    assert rows[1].split("\t")[4] == r"\N"  # null note
    # geometry column is hex WKB of the input
    hexwkb = rows[0].split("\t")[-1]
    assert bytes.fromhex(hexwkb) == feat_table.column(
        "geometry")[0].as_py()


def test_vector_interchange_distributed(ray_session, tmp_path):
    """write mif -> read -> write gml -> read -> write dxf -> read,
    WKB kind preserved, inside map_batches."""
    import ray

    root = str(tmp_path)
    polys = [G.wkb_polygon([_sq(i * 10, 0, 5)]) for i in range(6)]
    ds = ray.data.from_items(
        [{"i": i, "geometry": p} for i, p in enumerate(polys)])

    def chain(batch):
        def sq(x0, y0, s):
            return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                             [x0, y0 + s], [x0, y0]], dtype=float)

        out = []
        for i, b in zip(batch["i"].to_pylist(),
                        batch["geometry"].to_pylist()):
            t = pa.table({"geometry": pa.array([b], pa.binary()),
                          "i": pa.array([i], pa.int64())})
            mp = f"{root}/c{i}.mif"
            write_mif(mp, t)
            t2 = read_mif(mp)
            gp = f"{root}/c{i}.gml"
            write_gml(gp, t2)
            t3 = read_gml(gp)
            dp = f"{root}/c{i}.dxf"
            write_dxf(dp, t3)
            t4 = read_dxf(dp)
            k, rings = G.parse_wkb(t4.column("geometry")[0].as_py())
            ok = (k == "polygon"
                  and np.allclose(rings[0], sq(i * 10, 0, 5)))
            out.append({"i": i, "ok": ok})
        return pa.Table.from_pylist(out)

    res = ds.map_batches(chain, batch_format="pyarrow").take_all()
    assert len(res) == 6 and all(r["ok"] for r in res)


def test_registry_identifies_vector_interchange(ray_session, tmp_path,
                                                feat_table):
    from gdal_ray.sources.registry import identify, open_vector

    mp = str(tmp_path / "r.mif")
    write_mif(mp, feat_table)
    gp = str(tmp_path / "r.gml")
    write_gml(gp, feat_table)
    dp = str(tmp_path / "r.dxf")
    write_dxf(dp, feat_table)
    assert identify(mp) == "mif"
    assert identify(gp) == "gml"
    assert identify(dp) == "dxf"
    for p, n in ((mp, 6), (gp, 6), (dp, 9)):
        ds = open_vector(p)
        assert ds.count() == n
        assert "geometry" in ds.schema().names


def test_spec_vector_convert_chain(ray_session, tmp_path, feat_table):
    """JSON-driven vector_read/vector_write through the new drivers
    (the ogr2ogr convert surface)."""
    import ray.data as rd

    from gdal_ray.pipelines.spec import run_pipeline

    src = rd.from_arrow(feat_table)
    mp = str(tmp_path / "s.mif")
    out = run_pipeline([{"step": "vector_write", "path": mp}], src)
    assert out.take_all()[0]["n"] == 6
    gp = str(tmp_path / "s.gml")
    out = run_pipeline([{"step": "vector_read", "path": mp},
                        {"step": "vector_write", "path": gp}])
    assert out.take_all()[0]["n"] == 6
    back = run_pipeline([{"step": "vector_read", "path": gp}])
    assert back.count() == 6
    sql = str(tmp_path / "s.sql")
    out = run_pipeline([{"step": "vector_read", "path": gp},
                        {"step": "vector_write", "path": sql,
                         "layer": "feats", "srs_id": 4326}])
    assert out.take_all()[0]["n"] == 6
    assert "AddGeometryColumn('public','feats'" in open(sql).read()
    dp = str(tmp_path / "s.dxf")
    out = run_pipeline([{"step": "vector_read", "path": gp},
                        {"step": "vector_write", "path": dp}])
    assert out.take_all()[0]["n"] == 6


def test_gpx_routes_and_csv_points(tmp_path):
    """GPX <rte>/<rtept> routes (the ogr/gpx routes layer) and CSV
    point features from separate X/Y columns (the X_POSSIBLE_NAMES
    open option)."""
    from gdal_ray.sources.textvec import (read_csv_points, read_gpx,
                                          write_gpx)

    route = G.wkb_linestring(np.array([[2.0, 48.0], [2.5, 48.4],
                                       [3.0, 49.0]]))
    rt = pa.table({"geometry": pa.array([route], pa.binary()),
                   "name": pa.array(["commute"], pa.string())})
    p = str(tmp_path / "r.gpx")
    write_gpx(p, routes=rt)
    txt = open(p).read()
    assert "<rte>" in txt and txt.count("<rtept") == 3
    back = read_gpx(p)
    assert back["routes"].num_rows == 1
    assert back["routes"].column("name").to_pylist() == ["commute"]
    assert back["routes"].column("geometry")[0].as_py() == route
    assert back["waypoints"].num_rows == 0

    cp = str(tmp_path / "pts.csv")
    open(cp, "w").write(
        "name,lon,lat,score\na,2.5,48.9,7\nb,-1.25,43.5,9\n")
    t = read_csv_points(cp, x_col="lon", y_col="lat")
    assert t.column_names == ["geometry", "name", "score"]
    k, v = G.parse_wkb(t.column("geometry")[0].as_py())
    assert k == "point" and v == (2.5, 48.9)
    assert t.column("score").to_pylist() == [7, 9]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing"):
        read_csv_points(cp, x_col="X", y_col="Y")
