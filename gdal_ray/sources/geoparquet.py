"""GeoParquet 1.0 vector interchange (the reference's Parquet driver,
`ogr/ogrsf_frmts/parquet/` — its write half emits the ``geo``
file-metadata JSON, the read half validates it and recovers the
geometry column).

The engine's at-rest vector form is already a WKB column in Parquet;
this module adds the standardized envelope: file-level ``geo``
key-value metadata ``{"version": "1.0.0", "primary_column": ...,
"columns": {col: {"encoding": "WKB", "geometry_types": [...],
"bbox": [minx, miny, maxx, maxy], ...}}}`` so external GeoParquet
readers (GDAL/GeoPandas/DuckDB-spatial) open the output directly.

Distributed shape: geometry types and the global bbox are reduced
from per-batch partials (one pass over the WKB column's 5-byte
headers + ring coordinates), then the metadata is attached to every
written file's schema — no driver-side materialization of the data.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

#: WKB base type code -> GeoParquet geometry_types name
_TYPE_NAMES = {
    1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
    5: "MultiLineString", 6: "MultiPolygon", 7: "GeometryCollection",
}


def _batch_partial(t: pa.Table, col: str) -> tuple[set, list]:
    """(geometry type names, [minx, miny, maxx, maxy]) for one batch
    — types from the 5-byte WKB headers, bbox from parsed coords."""
    from ..functions import geom

    names = set()
    minx = miny = np.inf
    maxx = maxy = -np.inf
    for wkb in t.column(col).to_pylist():
        if wkb is None:
            continue
        bo = wkb[0]
        (code,) = struct.unpack_from("<I" if bo == 1 else ">I", wkb, 1)
        base = code % 1000
        name = _TYPE_NAMES.get(base)
        if name is None:
            raise ValueError(f"GeoParquet: WKB type {code} unsupported")
        if code >= 3000:
            name += " ZM"
        elif code >= 2000:
            name += " M"
        elif code >= 1000:
            name += " Z"
        names.add(name)
        e = geom.envelope_wkb(wkb)
        minx = min(minx, e[0])
        miny = min(miny, e[1])
        maxx = max(maxx, e[2])
        maxy = max(maxy, e[3])
    return names, [minx, miny, maxx, maxy]


def geo_metadata(types: set, bbox: list, primary: str) -> dict:
    return {
        "version": "1.0.0",
        "primary_column": primary,
        "columns": {
            primary: {
                "encoding": "WKB",
                "geometry_types": sorted(types),
                "bbox": [float(v) for v in bbox],
            }
        },
    }


def write_geoparquet(ds, path: str, geometry_column: str = "wkb"):
    """Write a Dataset with a WKB geometry column as GeoParquet: one
    partial-aggregation pass computes geometry types + global bbox,
    then every written file carries the ``geo`` schema metadata.
    Returns the metadata dict."""

    def partial(t: pa.Table) -> pa.Table:
        names, bbox = _batch_partial(t, geometry_column)
        return pa.table({
            "types": pa.array([json.dumps(sorted(names))]),
            "minx": pa.array([bbox[0]], pa.float64()),
            "miny": pa.array([bbox[1]], pa.float64()),
            "maxx": pa.array([bbox[2]], pa.float64()),
            "maxy": pa.array([bbox[3]], pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        raise ValueError("write_geoparquet: empty dataset")
    types: set = set()
    for r in parts:
        types.update(json.loads(r["types"]))
    bbox = [min(r["minx"] for r in parts),
            min(r["miny"] for r in parts),
            max(r["maxx"] for r in parts),
            max(r["maxy"] for r in parts)]
    meta = geo_metadata(types, bbox, geometry_column)
    blob = json.dumps(meta).encode("utf-8")

    def attach(t: pa.Table) -> pa.Table:
        md = dict(t.schema.metadata or {})
        md[b"geo"] = blob
        return t.replace_schema_metadata(md)

    ds.map_batches(attach, batch_format="pyarrow").write_parquet(path)
    return meta


def read_geoparquet(path: str):
    """Open a GeoParquet file/directory: validates the ``geo``
    metadata (encoding must be WKB) and returns (Dataset, geo dict).
    Plain parquet without ``geo`` raises a loud error naming the fix."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    files = ([path] if os.path.isfile(path)
             else sorted(glob.glob(os.path.join(path, "*.parquet"))))
    if not files:
        raise ValueError(f"read_geoparquet: no parquet under {path}")
    md = pq.read_schema(files[0]).metadata or {}
    if b"geo" not in md:
        raise ValueError(
            f"{files[0]} has no 'geo' metadata — not GeoParquet "
            "(write with write_geoparquet, or read via plain "
            "read_parquet)")
    meta = json.loads(md[b"geo"].decode("utf-8"))
    primary = meta.get("primary_column")
    cols = meta.get("columns", {})
    if primary not in cols or cols[primary].get("encoding") != "WKB":
        raise ValueError(f"GeoParquet: unsupported encoding in {meta}")
    return rd.read_parquet(path), meta
