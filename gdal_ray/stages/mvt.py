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


def write_mvt_layers(
    polygons, points, zoom: int, buffer_px: int = 64
):
    """All three MVT geometry classes in one tile set
    (ogrmvtdataset.cpp:3323 handles every geometry type):

    - ``polys``  : polygon features, rings clipped to tile+buffer and
      quantized (a feature survives with >= 1 ring of >= 4 points);
    - ``lines``  : each polygon's exterior ring as a LINESTRING
      ("boundary" layer), kept loose (un-clipped, renderer-clip style)
      when its envelope touches the buffered tile and >= 2 distinct
      quantized points remain;
    - ``points`` : point features inside the buffered tile.

    Both sides replicate to every tile whose BUFFERED square they
    touch.  Output rows: z, x, y (TMS), mvt_bytes (3 layers),
    n_polys, n_lines, n_points.
    """
    res = float(mercator.resolution(zoom))
    buf_m = buffer_px / EXTENT * (256.0 * res)

    def cover_buffered_polys(t: pa.Table) -> pa.Table:
        grown = pa.table(
            {
                **{c: t.column(c) for c in t.schema.names if c not in
                   ("minx", "miny", "maxx", "maxy")},
                "minx": pa.array(
                    t.column("minx").to_numpy() - buf_m, pa.float64()),
                "miny": pa.array(
                    t.column("miny").to_numpy() - buf_m, pa.float64()),
                "maxx": pa.array(
                    t.column("maxx").to_numpy() + buf_m, pa.float64()),
                "maxy": pa.array(
                    t.column("maxy").to_numpy() + buf_m, pa.float64()),
            }
        )
        out = cover_envelope_cells(zoom)(grown)
        # (the grown envelope columns are only used for covering; the
        # encode step reads geometry from the WKB directly)
        return out.append_column("side", pa.array([0] * out.num_rows, pa.int8()))

    def cover_buffered_points(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        row_idx, cells = mercator.cover_cells_batch(
            x - buf_m, y - buf_m, x + buf_m, y + buf_m, zoom
        )
        out = t.take(pa.array(row_idx, pa.int64()))
        out = out.append_column("cell", pa.array(cells, pa.int64()))
        return out.append_column("side", pa.array([1] * out.num_rows, pa.int8()))

    pol = polygons.select_columns(["fid", "wkb", "minx", "miny", "maxx", "maxy"]).map_batches(
        cover_buffered_polys, batch_format="pyarrow"
    )
    pts = points.select_columns(["pid", "x", "y"]).map_batches(
        cover_buffered_points, batch_format="pyarrow"
    )

    # union with aligned schemas (typed nulls)
    full = {
        "cell": pa.int64(), "side": pa.int8(), "fid": pa.int64(),
        "wkb": pa.binary(), "minx": pa.float64(), "miny": pa.float64(),
        "maxx": pa.float64(), "maxy": pa.float64(), "pid": pa.int64(),
        "x": pa.float64(), "y": pa.float64(),
    }

    def aligned(t: pa.Table) -> pa.Table:
        cols = {}
        for name, ty in full.items():
            if name in t.schema.names:
                cols[name] = t.column(name).cast(ty)
            else:
                cols[name] = pa.nulls(t.num_rows, ty)
        return pa.table(cols)

    both = pol.map_batches(aligned, batch_format="pyarrow").union(
        pts.map_batches(aligned, batch_format="pyarrow")
    )

    def encode_group(g: pa.Table) -> pa.Table:
        cell = int(g.column("cell")[0].as_py())
        z, tx, ty = (int(v) for v in mercator.unpack_cell(np.array([cell])))
        minx, miny, maxx, maxy = mercator.tile_bounds(tx, ty, z)
        size = maxx - minx
        buf = buffer_px / EXTENT * size

        def qxy(coords: np.ndarray) -> np.ndarray:
            ix = np.floor((coords[:, 0] - minx) / size * EXTENT + 0.5)
            iy = np.floor((maxy - coords[:, 1]) / size * EXTENT + 0.5)
            pts2 = np.stack([ix, iy], axis=1).astype(np.int64)
            keep = np.ones(len(pts2), dtype=bool)
            keep[1:] = (pts2[1:] != pts2[:-1]).any(axis=1)
            return pts2[keep]

        side = g.column("side").to_numpy(zero_copy_only=False)
        poly_rows = np.flatnonzero(side == 0)
        pt_rows = np.flatnonzero(side == 1)
        poly_feats, line_feats, point_feats = [], [], []
        for r in poly_rows:
            fid = int(g.column("fid")[r].as_py())
            parsed = geom.parse_wkb(g.column("wkb")[r].as_py())
            parts = []
            ext_ring = None
            for rings in geom.polygon_rings(parsed):
                if ext_ring is None:
                    ext_ring = rings[0]
                for ring in rings:
                    clipped = geom.clip_ring_rect(
                        ring, minx - buf, miny - buf, maxx + buf, maxy + buf
                    )
                    if clipped is None:
                        continue
                    pts2 = qxy(clipped)
                    if len(pts2) >= 4:
                        parts.append(pts2)
            if parts:
                poly_feats.append(
                    {"id": fid, "type": mvt.GEOM_POLYGON, "parts": parts,
                     "tags": {"fid": fid}}
                )
            # loose boundary line from the exterior ring
            if ext_ring is not None:
                e = ext_ring
                if (
                    e[:, 0].min() <= maxx + buf and e[:, 0].max() >= minx - buf
                    and e[:, 1].min() <= maxy + buf and e[:, 1].max() >= miny - buf
                ):
                    lp = qxy(e)
                    if len(lp) >= 2:
                        line_feats.append(
                            {"id": fid, "type": mvt.GEOM_LINESTRING,
                             "parts": [lp], "tags": {"fid": fid}}
                        )
        if len(pt_rows):
            px = g.column("x").to_numpy(zero_copy_only=False)[pt_rows]
            py = g.column("y").to_numpy(zero_copy_only=False)[pt_rows]
            pids = g.column("pid").to_numpy(zero_copy_only=False)[pt_rows]
            inside = (
                (px >= minx - buf) & (px <= maxx + buf)
                & (py >= miny - buf) & (py <= maxy + buf)
            )
            for k in np.flatnonzero(inside):
                ix = int(np.floor((px[k] - minx) / size * EXTENT + 0.5))
                iy = int(np.floor((maxy - py[k]) / size * EXTENT + 0.5))
                point_feats.append(
                    {"id": int(pids[k]), "type": mvt.GEOM_POINT,
                     "parts": [np.array([[ix, iy]], dtype=np.int64)],
                     "tags": {"pid": int(pids[k])}}
                )
        if not (poly_feats or line_feats or point_feats):
            return pa.table(
                {
                    "z": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                    "mvt_bytes": pa.array([], pa.binary()),
                    "n_polys": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "n_points": pa.array([], pa.int64()),
                }
            )
        payload = b"".join(
            mvt.encode_tile(name, feats, extent=EXTENT)
            for name, feats in (
                ("polys", poly_feats), ("lines", line_feats), ("points", point_feats)
            )
            if feats
        )
        return pa.table(
            {
                "z": pa.array([z], pa.int64()),
                "x": pa.array([tx], pa.int64()),
                "y": pa.array([ty], pa.int64()),
                "mvt_bytes": pa.array([payload], pa.binary()),
                "n_polys": pa.array([len(poly_feats)], pa.int64()),
                "n_lines": pa.array([len(line_feats)], pa.int64()),
                "n_points": pa.array([len(point_feats)], pa.int64()),
            }
        )

    return both.groupby("cell").map_groups(encode_group, batch_format="pyarrow")


def read_mvt_features(tiles, layer: str | None = None):
    """MVT READER (the open/read half of the reference's MVT driver,
    ogr/ogrsf_frmts/mvt/ogrmvtdataset.cpp): rows of (z, x, y,
    mvt_bytes) -> one row per feature with world-coordinate (3857)
    WKB geometry.

    Tile-local integer coordinates invert the writer's quantization:
    X = minx + ix/extent*size, Y = maxy - iy/extent*size (y axis
    flipped back).  Points emit POINT/the first part; linestrings
    emit LINESTRING per part (one row per part, part index in
    ``part``); polygons reassemble rings into POLYGON (exterior =
    CW-in-tile-space ring per the MVT winding rule, interiors
    attached) — matching OGRMVTLayer's geometry reconstruction.
    Output: z, x, y, layer, fid, gtype, part, wkb, tags (JSON).

    Distributed: plain map_batches over tile rows — each tile decodes
    independently (the driver's per-tile open), no shuffle.
    """
    import json

    from ..functions import geom, mvt as mvtc

    def _ring_area2(pts: np.ndarray) -> float:
        x, y = pts[:, 0], pts[:, 1]
        return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

    def fn(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("z", "x", "y", "layer", "fid", "gtype",
                               "part", "wkb", "tags")}
        zs = t.column("z").to_pylist()
        xs = t.column("x").to_pylist()
        ys = t.column("y").to_pylist()
        bl = t.column("mvt_bytes").to_pylist()
        for r in range(t.num_rows):
            z, tx, ty = int(zs[r]), int(xs[r]), int(ys[r])
            minx, miny, maxx, maxy = mercator.tile_bounds(tx, ty, z)
            size = maxx - minx
            layers = mvtc.decode_tile(bl[r])
            for lname, lay in layers.items():
                if layer is not None and lname != layer:
                    continue
                ext = float(lay["extent"])

                def to_world(pts_i: np.ndarray) -> np.ndarray:
                    w = np.empty((len(pts_i), 2), np.float64)
                    w[:, 0] = minx + pts_i[:, 0] / ext * size
                    w[:, 1] = maxy - pts_i[:, 1] / ext * size
                    return w

                for f in lay["features"]:
                    gt = f["type"]
                    tags = json.dumps(f.get("tags", {}), sort_keys=True)

                    def emit(part_idx, wkb):
                        out["z"].append(z)
                        out["x"].append(tx)
                        out["y"].append(ty)
                        out["layer"].append(lname)
                        out["fid"].append(-1 if f["id"] is None
                                          else int(f["id"]))
                        out["gtype"].append(int(gt))
                        out["part"].append(part_idx)
                        out["wkb"].append(wkb)
                        out["tags"].append(tags)

                    if gt == mvtc.GEOM_POINT:
                        for pi, part in enumerate(f["parts"]):
                            w = to_world(part)
                            for j in range(len(w)):
                                emit(pi, geom.wkb_point(w[j, 0], w[j, 1]))
                    elif gt == mvtc.GEOM_LINESTRING:
                        for pi, part in enumerate(f["parts"]):
                            if len(part) >= 2:
                                emit(pi, geom.wkb_linestring(to_world(part)))
                    else:  # POLYGON: exterior starts a new polygon at
                        # each positive-area (tile-space CW) ring
                        polys: list[list[np.ndarray]] = []
                        for part in f["parts"]:
                            ring = part
                            if len(ring) < 4:
                                continue
                            w = to_world(ring)
                            # tile-space y is flipped, so the MVT
                            # CW-exterior rule is area2 > 0 on ints
                            if _ring_area2(ring[:-1].astype(np.float64)) > 0                                     or not polys:
                                polys.append([w])
                            else:
                                polys[-1].append(w)
                        for pi, rings in enumerate(polys):
                            emit(pi, geom.wkb_polygon(rings))
        return pa.table({
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "layer": pa.array(out["layer"], pa.string()),
            "fid": pa.array(out["fid"], pa.int64()),
            "gtype": pa.array(out["gtype"], pa.int32()),
            "part": pa.array(out["part"], pa.int32()),
            "wkb": pa.array(out["wkb"], pa.binary()),
            "tags": pa.array(out["tags"], pa.string()),
        })

    return tiles.map_batches(fn, batch_format="pyarrow")
