"""MVT vector-tile writer stage — bucket polygons into z/x/y tiles.

Reference: OGRMVTWriterDataset (ogr/ogrsf_frmts/mvt/ogrmvtdataset.cpp
:3323): features are assigned to every tile they intersect, geometry is
transformed to tile-local integer coordinates (extent 4096), clipped
with a buffer margin, and each tile is protobuf-encoded by a worker
pool — here: cover-cells replication -> groupby(cell) -> map_groups
encode (gdal_ray.functions.mvt codec).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import geom, mercator, mvt
from .cells import cover_envelope_cells

EXTENT = 4096


def write_mvt_tiles(polygons, zoom: int, layer_name: str = "layer", buffer_px: int = 64):
    """Polygon layer (fid, wkb, minx..maxy [+ category]) -> one row per
    tile: z, x, y (TMS), mvt_bytes.  Rings are clipped to the tile plus
    a buffer margin and quantized to the 4096 extent (y axis flipped:
    MVT y grows downward/south)."""
    ds = polygons.map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")

    def encode_group(g: pa.Table) -> pa.Table:
        cell = int(g.column("cell")[0].as_py())
        z, tx, ty = (int(v) for v in mercator.unpack_cell(np.array([cell])))
        minx, miny, maxx, maxy = mercator.tile_bounds(tx, ty, z)
        size = maxx - minx
        buf = buffer_px / EXTENT * size
        feats = []
        has_cat = "category" in g.schema.names
        for r in range(g.num_rows):
            fid = int(g.column("fid")[r].as_py())
            parsed = geom.parse_wkb(g.column("wkb")[r].as_py())
            parts = []
            for rings in geom.polygon_rings(parsed):
                for ring in rings:
                    clipped = geom.clip_ring_rect(
                        ring, minx - buf, miny - buf, maxx + buf, maxy + buf
                    )
                    if clipped is None:
                        continue
                    ix = np.floor((clipped[:, 0] - minx) / size * EXTENT + 0.5)
                    iy = np.floor((maxy - clipped[:, 1]) / size * EXTENT + 0.5)
                    pts = np.stack([ix, iy], axis=1).astype(np.int64)
                    # drop consecutive duplicates after quantization
                    keep = np.ones(len(pts), dtype=bool)
                    keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
                    pts = pts[keep]
                    if len(pts) >= 4:
                        parts.append(pts)
            if not parts:
                continue
            tags = {"fid": fid}
            if has_cat:
                tags["category"] = g.column("category")[r].as_py()
            feats.append(
                {"id": fid, "type": mvt.GEOM_POLYGON, "parts": parts, "tags": tags}
            )
        if not feats:
            return pa.table(
                {
                    "z": pa.array([], pa.int32()),
                    "x": pa.array([], pa.int32()),
                    "y": pa.array([], pa.int32()),
                    "mvt_bytes": pa.array([], pa.binary()),
                    "n_features": pa.array([], pa.int32()),
                }
            )
        data = mvt.encode_tile(layer_name, feats, extent=EXTENT)
        return pa.table(
            {
                "z": pa.array([z], pa.int32()),
                "x": pa.array([tx], pa.int32()),
                "y": pa.array([ty], pa.int32()),
                "mvt_bytes": pa.array([data], pa.binary()),
                "n_features": pa.array([len(feats)], pa.int32()),
            }
        )

    return ds.groupby("cell").map_groups(encode_group, batch_format="pyarrow")
