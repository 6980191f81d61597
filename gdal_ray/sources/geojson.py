"""GeoJSON vector source / sink.

Reference analog: the OGR GeoJSON driver (ogr/ogrsf_frmts/geojson/ —
RFC 7946): FeatureCollection of Features with a geometry object and a
properties bag.  The engine's at-rest vector convention is a columnar
Arrow table with geometry as WKB (`geometry` column) plus attribute
columns — GeoParquet-shaped — so GeoJSON is an interop boundary
format: read parses features into that convention, write renders it
back.

Scale shape: a sink write is a resumable partitioned layout (one
`part-<task>.geojson` FeatureCollection per input block, RFC 7946
compliant individually), mirroring the tile-tree/COG sinks — never
one giant file; the reader accepts a file or a partition directory
and exposes the standard Dataset over the parsed rows.

Geometry support: Point / MultiPoint / LineString / MultiLineString /
Polygon / MultiPolygon (ring closure enforced on read), matching the
subset the engine's WKB layer handles (functions/geom.py).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ..functions import geom as G

_GJ_TO_WKB = {
    "Point": 1, "LineString": 2, "Polygon": 3,
    "MultiPoint": 4, "MultiLineString": 5, "MultiPolygon": 6,
}


def _coords_to_wkb(gtype: str, coords) -> bytes:
    """GeoJSON coordinates -> little-endian ISO WKB."""
    import struct

    def ring(pts):
        a = np.asarray(pts, np.float64)
        if not np.array_equal(a[0], a[-1]):
            a = np.vstack([a, a[:1]])  # RFC 7946 rings must close
        return a

    if gtype == "Point":
        return struct.pack("<BIdd", 1, 1, float(coords[0]), float(coords[1]))
    if gtype == "LineString":
        a = np.asarray(coords, np.float64)
        return (struct.pack("<BII", 1, 2, len(a))
                + a.astype("<f8").tobytes())
    if gtype == "Polygon":
        rings = [ring(r) for r in coords]
        return G.wkb_polygon(rings)
    if gtype == "MultiPolygon":
        return G.wkb_multipolygon(
            [[ring(r) for r in poly] for poly in coords])
    if gtype == "MultiPoint":
        parts = [_coords_to_wkb("Point", c) for c in coords]
        return (struct.pack("<BII", 1, 4, len(parts)) + b"".join(parts))
    if gtype == "MultiLineString":
        parts = [_coords_to_wkb("LineString", c) for c in coords]
        return (struct.pack("<BII", 1, 5, len(parts)) + b"".join(parts))
    raise ValueError(f"unsupported GeoJSON geometry {gtype!r}")


def _wkb_to_geojson(wkb: bytes) -> dict:
    """WKB -> GeoJSON geometry dict (via the engine's parser)."""
    g = G.parse_wkb(wkb)
    kind, payload = g
    if kind == "point":
        return {"type": "Point", "coordinates": list(payload)}
    if kind == "linestring":
        return {"type": "LineString",
                "coordinates": np.asarray(payload).tolist()}
    if kind == "polygon":
        return {"type": "Polygon",
                "coordinates": [np.asarray(r).tolist() for r in payload]}
    if kind == "multipolygon":
        return {
            "type": "MultiPolygon",
            "coordinates": [
                [np.asarray(r).tolist() for r in poly] for poly in payload
            ],
        }
    if kind == "multipoint":
        return {"type": "MultiPoint",
                "coordinates": np.asarray(payload).tolist()}
    if kind == "multilinestring":
        return {"type": "MultiLineString",
                "coordinates": [np.asarray(a).tolist() for a in payload]}
    if kind == "geometrycollection":
        return {"type": "GeometryCollection",
                "geometries": [_wkb_to_geojson(G.wkb_of(g))
                               for g in payload]}
    raise ValueError(f"unsupported geometry kind {kind!r}")


def geojson_to_table(text: str) -> pa.Table:
    """Parse one FeatureCollection into the engine's WKB-column
    convention; properties become columns (union of keys, nulls where
    absent)."""
    doc = json.loads(text)
    feats = doc["features"] if doc.get("type") == "FeatureCollection" \
        else [doc]
    keys: list[str] = []
    for f in feats:
        for k in (f.get("properties") or {}):
            if k not in keys:
                keys.append(k)
    cols = {k: [] for k in keys}
    wkbs = []
    for f in feats:
        gj = f["geometry"]
        wkbs.append(_coords_to_wkb(gj["type"], gj["coordinates"]))
        props = f.get("properties") or {}
        for k in keys:
            cols[k].append(props.get(k))
    out = {"geometry": pa.array(wkbs, pa.binary())}
    for k in keys:
        out[k] = pa.array(cols[k])
    return pa.table(out)


def read_geojson(path: str):
    """Dataset over a GeoJSON file or a partition directory of them."""
    import ray.data as rd

    paths = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith((".geojson", ".json")):
                paths.append(os.path.join(path, name))
    else:
        paths = [path]
    ds = rd.from_items([{"path": p} for p in paths])

    def parse(t: pa.Table) -> pa.Table:
        tables = []
        for p in t.column("path").to_pylist():
            with open(p) as fh:
                tables.append(geojson_to_table(fh.read()))
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(parse, batch_format="pyarrow")


def table_to_geojson(t: pa.Table, geometry_col: str = "geometry") -> str:
    """Render a WKB-convention table as a FeatureCollection string."""
    wkbs = t.column(geometry_col).to_pylist()
    attrs = [c for c in t.column_names if c != geometry_col]
    cols = {c: t.column(c).to_pylist() for c in attrs}
    feats = []
    for i, wkb in enumerate(wkbs):
        feats.append({
            "type": "Feature",
            "geometry": _wkb_to_geojson(wkb),
            "properties": {c: cols[c][i] for c in attrs},
        })
    return json.dumps(
        {"type": "FeatureCollection", "features": feats},
        separators=(",", ":"), sort_keys=False,
    )


def write_geojson(ds, out_dir: str, geometry_col: str = "geometry",
                  resume: bool = True):
    """Resumable partitioned GeoJSON sink: one FeatureCollection file
    per block, atomic rename, existing parts skipped on resume."""
    os.makedirs(out_dir, exist_ok=True)

    def sink(t: pa.Table, ctx=None) -> pa.Table:
        import uuid

        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        name = f"part-{uuid.uuid5(uuid.NAMESPACE_URL, t.column(geometry_col)[0].as_py().hex() + str(t.num_rows)).hex[:16]}.geojson"
        final = os.path.join(out_dir, name)
        if not (resume and os.path.exists(final)):
            tmp = final + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(table_to_geojson(t, geometry_col))
            os.replace(tmp, final)
        return pa.table({"path": pa.array([final]),
                         "n": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(sink, batch_format="pyarrow")
