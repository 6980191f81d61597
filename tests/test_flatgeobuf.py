"""FlatGeobuf source/sink (sources/flatgeobuf.py).

Behavior model: ogr/ogrsf_frmts/flatgeobuf/ — magic bytes, packed
Hilbert R-tree (packedrtree.h:78-120), size-prefixed FlatBuffers
features.
"""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.geom import (
    envelope_wkb,
    wkb_multipolygon,
    wkb_point,
    wkb_polygon,
)
from gdal_ray.sources import flatgeobuf as FGB


def _ring(cx, cy, h):
    return np.array(
        [[cx - h, cy - h], [cx + h, cy - h], [cx + h, cy + h],
         [cx - h, cy + h], [cx - h, cy - h]], np.float64)


def _mixed_table(n=60):
    wkbs = []
    for i in range(n):
        if i % 3 == 0:
            wkbs.append(wkb_point(float(i), float(i % 7)))
        elif i % 3 == 1:
            wkbs.append(wkb_polygon(
                [_ring(i * 2.0, i * 1.5, 1.0), _ring(i * 2.0, i * 1.5, 0.25)]))
        else:
            wkbs.append(wkb_multipolygon(
                [[_ring(i * 2.0, 0, 0.5)], [_ring(i * 2.0, 5, 0.5)]]))
    return pa.table({
        "geometry": pa.array(wkbs, pa.binary()),
        "name": pa.array([f"f{i}" for i in range(n)]),
        "v": pa.array([None if i == 5 else i * 0.5 for i in range(n)],
                      pa.float64()),
        "k": pa.array(list(range(n)), pa.int64()),
        "flag": pa.array([i % 2 == 0 for i in range(n)], pa.bool_()),
    })


def _sorted_rows(t):
    cols = ["k", "geometry", "name", "v", "flag"]
    if hasattr(t, "column"):
        vals = [t.column(c).to_pylist() for c in cols]
    else:
        vals = [list(t[c]) for c in cols]
    norm = [[None if isinstance(v, float) and v != v else v for v in col]
            for col in vals]
    return sorted(zip(*norm))


def test_hilbert_anchors():
    # the reference's branchless form (packedrtree.cpp:73): d=0 at the
    # origin, base quadrant order (0,0) (1,0) (1,1) (0,1)
    h = FGB.hilbert_u16(np.array([0, 1, 1, 0], np.uint32),
                        np.array([0, 0, 1, 1], np.uint32))
    assert h.tolist() == [0, 1, 2, 3]
    # (0xFFFF, 0) is the curve end for this orientation
    hmax = FGB.hilbert_u16(np.array([0xFFFF], np.uint32),
                           np.array([0], np.uint32))
    assert hmax[0] == (1 << 32) - 1
    # every value distinct on a 4x4 sub-lattice scaled to 16 bits
    s = np.arange(4, dtype=np.uint32) * 0x5555
    X, Y = np.meshgrid(s, s)
    hv = FGB.hilbert_u16(X.ravel(), Y.ravel())
    assert len(set(hv.tolist())) == 16


def test_magic_and_header(tmp_path):
    t = _mixed_table()
    path = str(tmp_path / "a.fgb")
    assert FGB.write_flatgeobuf(t, path, layer="mixed") == t.num_rows
    with open(path, "rb") as fh:
        assert fh.read(8) == FGB.MAGIC
    meta = FGB.read_header(path)
    assert meta["name"] == "mixed"
    assert meta["features_count"] == t.num_rows
    assert meta["geometry_type"] == 0  # mixed layer -> Unknown
    assert meta["srs_code"] == 4326
    assert [c[0] for c in meta["columns"]] == ["name", "v", "k", "flag"]
    assert [c[1] for c in meta["columns"]] == [11, 10, 7, 2]
    envs = [envelope_wkb(w.as_py()) for w in t.column("geometry")]
    assert meta["envelope"] == [min(e[0] for e in envs),
                                min(e[1] for e in envs),
                                max(e[2] for e in envs),
                                max(e[3] for e in envs)]
    # index section is numNodes * 40 bytes
    _, num_nodes = FGB._level_bounds(t.num_rows, 16)
    assert meta["index_len"] == num_nodes * 40


def test_round_trip_via_ray(ray_session, tmp_path):
    t = _mixed_table()
    path = str(tmp_path / "rt.fgb")
    FGB.write_flatgeobuf(t, path)
    back = FGB.read_flatgeobuf(path, parallelism=4).to_pandas()
    assert _sorted_rows(back) == _sorted_rows(t)
    one = FGB.read_flatgeobuf(path, parallelism=1).to_pandas()
    assert _sorted_rows(one) == _sorted_rows(t)


def test_bbox_pushdown_exact_subset(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    pts = [wkb_point(float(x), float(y))
           for x, y in rng.uniform(0, 1000, (500, 2))]
    t = pa.table({"geometry": pa.array(pts, pa.binary()),
                  "i": pa.array(range(500), pa.int64())})
    path = str(tmp_path / "pts.fgb")
    FGB.write_flatgeobuf(t, path)
    bbox = (200.0, 300.0, 400.0, 700.0)
    got = FGB.read_flatgeobuf(path, bbox=bbox).to_pandas()
    envs = [envelope_wkb(w) for w in pts]
    exp = {i for i, e in enumerate(envs)
           if not (e[2] < bbox[0] or e[0] > bbox[2]
                   or e[3] < bbox[1] or e[1] > bbox[3])}
    assert set(got["i"]) == exp
    # empty window: zero rows, schema preserved on the Dataset
    none_ds = FGB.read_flatgeobuf(path, bbox=(-50, -50, -10, -10))
    assert none_ds.count() == 0
    assert set(none_ds.schema().names) == {"geometry", "i"}


def test_search_touches_only_index(tmp_path):
    """Pruned search must be answerable from the header+index prefix
    alone — truncating the feature block must not affect it."""
    rng = np.random.default_rng(3)
    pts = [wkb_point(float(x), float(y))
           for x, y in rng.uniform(0, 100, (300, 2))]
    t = pa.table({"geometry": pa.array(pts, pa.binary())})
    path = str(tmp_path / "ix.fgb")
    FGB.write_flatgeobuf(t, path)
    meta = FGB.read_header(path)
    offs = FGB.search_bbox(path, (10, 10, 30, 30), meta)
    clipped = str(tmp_path / "clip.fgb")
    with open(path, "rb") as fh:
        prefix = fh.read(meta["header_len"] + meta["index_len"])
    with open(clipped, "wb") as fh:
        fh.write(prefix)
    assert FGB.search_bbox(clipped, (10, 10, 30, 30)) == offs
    assert len(offs) > 0


def test_rtree_parity_with_reference_layout():
    """Node layout invariants from packedrtree.cpp: level bounds,
    parent envelopes, leaf offsets."""
    bounds, num_nodes = FGB._level_bounds(100, 16)
    # 100 leaves -> 7 parents -> 1 root
    assert [b[1] - b[0] for b in bounds] == [100, 7, 1]
    assert num_nodes == 108
    boxes = np.array([[i, 0, i + 1, 1] for i in range(100)], np.float64)
    offs = np.arange(100, dtype=np.uint64) * 10
    tree = FGB.build_rtree(boxes, offs, 16)
    assert len(tree) == 108 * 40
    root = struct.unpack_from("<4dQ", tree, 0)
    assert root[:4] == (0.0, 0.0, 100.0, 1.0)
    assert root[4] == 1  # root children start at node index 1
    first_leaf = struct.unpack_from("<4dQ", tree, 8 * 40)
    assert first_leaf[4] == 0  # first feature byte offset


def test_geojson_interop(ray_session, tmp_path):
    from gdal_ray.sources import geojson as GJ

    t = _mixed_table(21)
    gj = GJ.geojson_to_table(GJ.table_to_geojson(t))
    path = str(tmp_path / "io.fgb")
    FGB.write_flatgeobuf(t, path)
    fg = FGB.read_flatgeobuf(path).to_pandas()
    assert (sorted(gj.column("geometry").to_pylist())
            == sorted(fg["geometry"]))


def test_writer_rejects_empty_and_bad_magic(tmp_path):
    with pytest.raises(ValueError):
        FGB.write_flatgeobuf(
            pa.table({"geometry": pa.array([], pa.binary())}),
            str(tmp_path / "e.fgb"))
    bad = str(tmp_path / "bad.fgb")
    with open(bad, "wb") as fh:
        fh.write(b"NOTFGB\x00\x00" + b"\x00" * 64)
    with pytest.raises(ValueError):
        FGB.read_header(bad)


def test_dataset_write_and_hilbert_locality(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(5)
    pts = [wkb_point(float(x), float(y))
           for x, y in rng.uniform(0, 1000, (400, 2))]
    t = pa.table({"geometry": pa.array(pts, pa.binary()),
                  "i": pa.array(range(400), pa.int64())})
    path = str(tmp_path / "ds.fgb")
    n = FGB.write_flatgeobuf(rd.from_arrow(t).repartition(4), path)
    assert n == 400
    # locality: a small window should read a small byte fraction
    meta = FGB.read_header(path)
    offs = FGB.search_bbox(path, (0.0, 0.0, 100.0, 100.0), meta)
    size = os.path.getsize(path) - meta["header_len"] - meta["index_len"]
    assert offs, "window should hit something"
    # matched features coalesce near each other on the Hilbert curve:
    # the covered byte span is far below the whole feature block
    span = max(offs) - min(offs)
    assert span < 0.5 * size
