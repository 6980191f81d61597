"""Geometry kernel: WKB parse/emit, envelopes, exact predicates, clipping.

From-scratch numpy implementation of the subset of the reference's
geometry model the engine needs (reference semantics:
- WKB (de)serialization: ogr/ogrgeometryfactory.cpp:89 createFromWkb
- ray-casting point-in-ring incl. crossing rule:
  ogr/ogrlinearring.cpp:462-530 isPointInRing
- boundary rule: ogr/ogrlinearring.cpp:543+ isPointOnRingBoundary
- envelope pre-filter: ogr/ogrsf_frmts/generic/ogrlayer.cpp:2253
  FilterGeometry).

WKB is the at-rest form for geometry columns (GeoParquet convention);
geometries are parsed per group/batch into ring arrays and predicates
run vectorized over many probe points at once.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6
# ISO curve / surface types (ogr/ogr_core.h:405-440)
WKB_CIRCULARSTRING = 8
WKB_COMPOUNDCURVE = 9
WKB_CURVEPOLYGON = 10
WKB_POLYHEDRALSURFACE = 15
WKB_TIN = 16
WKB_TRIANGLE = 17

# ---------------------------------------------------------------- WKB emit


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def _pack_ring(ring: np.ndarray) -> bytes:
    ring = np.asarray(ring, dtype=np.float64)
    return struct.pack("<I", len(ring)) + ring.astype("<f8").tobytes()


def wkb_polygon(rings: list[np.ndarray]) -> bytes:
    """rings[0] = exterior, rest = holes; each (N, 2), closed or not
    (auto-closed)."""
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(_pack_ring(ring))
    return b"".join(out)


def wkb_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(wkb_polygon(rings))
    return b"".join(out)


# Z variants use the ISO +1000 type codes (ogr/ogr_core.h:405-440 —
# the modern form; the EWKB 0x80000000 flag parses too)


def wkb_point_z(x: float, y: float, z: float) -> bytes:
    return struct.pack("<BIddd", 1, WKB_POINT + 1000, x, y, z)


def wkb_point_m(x: float, y: float, m: float) -> bytes:
    return struct.pack("<BIddd", 1, WKB_POINT + 2000, x, y, m)


def wkb_point_zm(x: float, y: float, z: float, m: float) -> bytes:
    return struct.pack("<BIdddd", 1, WKB_POINT + 3000, x, y, z, m)


def wkb_linestring_m(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, dtype=np.float64)
    if pts.shape[1] != 3:
        raise ValueError("wkb_linestring_m: points must be (N, 3)")
    return struct.pack("<BI", 1, WKB_LINESTRING + 2000) + _pack_ring(pts)


def wkb_linestring_zm(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, dtype=np.float64)
    if pts.shape[1] != 4:
        raise ValueError("wkb_linestring_zm: points must be (N, 4)")
    return struct.pack("<BI", 1, WKB_LINESTRING + 3000) + _pack_ring(pts)


def wkb_linestring_z(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, dtype=np.float64)
    if pts.shape[1] != 3:
        raise ValueError("wkb_linestring_z: points must be (N, 3)")
    return struct.pack("<BI", 1, WKB_LINESTRING + 1000) + _pack_ring(pts)


def wkb_polygon_z(rings: list[np.ndarray]) -> bytes:
    out = [struct.pack("<BII", 1, WKB_POLYGON + 1000, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if ring.shape[1] != 3:
            raise ValueError("wkb_polygon_z: rings must be (N, 3)")
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(_pack_ring(ring))
    return b"".join(out)


def wkb_multipoint(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, np.float64)
    return (struct.pack("<BII", 1, 4, len(pts))
            + b"".join(wkb_point(float(x), float(y)) for x, y in pts))


def wkb_multilinestring(lines: list[np.ndarray]) -> bytes:
    return (struct.pack("<BII", 1, 5, len(lines))
            + b"".join(wkb_linestring(np.asarray(a, np.float64))
                       for a in lines))


def wkb_geometrycollection(members: list[bytes]) -> bytes:
    """Emit a GeometryCollection (type 7) from encoded member WKBs."""
    return struct.pack("<BII", 1, 7, len(members)) + b"".join(members)


def wkb_triangle(ring: np.ndarray) -> bytes:
    """Emit a Triangle (ISO type 17): one closed 4-point ring."""
    ring = np.asarray(ring, np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    if len(ring) != 4:
        raise ValueError("wkb_triangle: need 3 distinct vertices")
    return struct.pack("<BII", 1, WKB_TRIANGLE, 1) + _pack_ring(ring)


def wkb_polyhedralsurface(patches: list[list[np.ndarray]]) -> bytes:
    """Emit a PolyhedralSurface (type 15) of Polygon patches."""
    return (struct.pack("<BII", 1, WKB_POLYHEDRALSURFACE, len(patches))
            + b"".join(wkb_polygon(list(p)) for p in patches))


def wkb_tin(triangles: list[np.ndarray]) -> bytes:
    """Emit a TIN (type 16) of Triangle patches."""
    return (struct.pack("<BII", 1, WKB_TIN, len(triangles))
            + b"".join(wkb_triangle(t) for t in triangles))


def surface_to_multipolygon(wkb: bytes) -> bytes:
    """OGRGeometryFactory::forceTo analog for the surface family:
    PolyhedralSurface / TIN -> MultiPolygon (each patch one part;
    Triangle -> Polygon)."""
    kind, val = parse_wkb(wkb)
    if kind == "triangle":
        return wkb_polygon(list(val))
    if kind in ("polyhedralsurface", "tin"):
        # patches parse as ring lists for both (Triangle = 1-ring)
        return wkb_multipolygon([list(p) for p in val])
    raise ValueError(f"surface_to_multipolygon: not a surface: {kind!r}")


def wkb_of(geom) -> bytes:
    """Re-emit WKB from a parsed (kind, payload) tuple — the inverse
    of parse_wkb for the 2-D simple-feature kinds."""
    kind, val = geom
    if kind == "point":
        return wkb_point(val[0], val[1])
    if kind == "linestring":
        return wkb_linestring(np.asarray(val, np.float64))
    if kind == "polygon":
        return wkb_polygon(list(val))
    if kind == "multipolygon":
        return wkb_multipolygon([list(p) for p in val])
    if kind == "multipoint":
        return wkb_multipoint(val)
    if kind == "multilinestring":
        return wkb_multilinestring(val)
    if kind == "geometrycollection":
        return wkb_geometrycollection([wkb_of(g) for g in val])
    raise ValueError(f"wkb_of: unsupported kind {kind!r}")


def flatten_to_2d(wkb: bytes) -> bytes:
    """OGR_G_FlattenTo2D analog: drop Z/M, re-emit 2-D WKB."""
    kind, payload = parse_wkb(wkb)
    base = kind.split("_")[0]
    if kind == base:  # already 2-D
        return wkb
    if base == "point":
        return wkb_point(payload[0], payload[1])
    if base == "linestring":
        return (struct.pack("<BI", 1, WKB_LINESTRING)
                + _pack_ring(np.asarray(payload)[:, :2]))
    if base == "polygon":
        return wkb_polygon([np.asarray(r)[:, :2] for r in payload])
    if base == "multipolygon":
        return wkb_multipolygon(
            [[np.asarray(r)[:, :2] for r in poly] for poly in payload])
    raise ValueError(f"flatten_to_2d: unsupported kind {kind!r}")


def force_3d(wkb: bytes, z: float = 0.0) -> bytes:
    """OGR_G_Set3D analog: promote 2-D geometry to Z with constant z;
    Z inputs pass through, M is dropped."""
    kind, payload = parse_wkb(wkb)
    if kind.endswith("_z"):
        return wkb
    base = kind.split("_")[0]

    def with_z(a):
        a = np.asarray(a, np.float64)[:, :2]
        return np.column_stack([a, np.full(len(a), z)])

    if base == "point":
        return wkb_point_z(payload[0], payload[1], z)
    if base == "linestring":
        return wkb_linestring_z(with_z(payload))
    if base == "polygon":
        return wkb_polygon_z([with_z(r) for r in payload])
    raise ValueError(f"force_3d: unsupported kind {kind!r}")


# ---------------------------------------------------------------- WKB parse


def _read_ring(buf: memoryview, pos: int, dim: int = 2
               ) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    ring = np.frombuffer(buf, dtype="<f8", count=dim * n,
                         offset=pos).reshape(n, dim)
    return ring, pos + 8 * dim * n


def parse_wkb(data: bytes):
    """Parse WKB -> ("point", (x, y)) | ("polygon", [rings]) |
    ("multipolygon", [[rings], ...]).  Z/M variants (ISO +1000/+2000/
    +3000 type codes and the EWKB 0x80000000/0x40000000 flags,
    ogr/ogr_core.h:405-440 / ogrgeometry.cpp importFromWkb) parse to
    kinds suffixed "_z" / "_m" / "_zm" with 3- or 4-wide vertex rows
    ((x, y, z[, m]) order)."""
    buf = memoryview(data)
    geom, _ = _parse_geom(buf, 0)
    return geom


def _wkb_dims(gtype: int) -> tuple[int, bool, bool]:
    """Raw WKB type code -> (base type, has_z, has_m)."""
    has_z = bool(gtype & 0x80000000)  # EWKB Z flag
    has_m = bool(gtype & 0x40000000)  # EWKB M flag
    base = gtype & 0x3FFFFFFF
    if base >= 1000:  # ISO offsets: +1000 Z, +2000 M, +3000 ZM
        iso = base // 1000
        base = base % 1000
        has_z = has_z or iso in (1, 3)
        has_m = has_m or iso in (2, 3)
    return base, has_z, has_m


def _kind_suffix(has_z: bool, has_m: bool) -> str:
    if has_z and has_m:
        return "_zm"
    return "_z" if has_z else ("_m" if has_m else "")


def _parse_geom(buf: memoryview, pos: int):
    byte_order = buf[pos]
    endian = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(endian + "I", buf, pos + 1)
    gtype, has_z, has_m = _wkb_dims(gtype)
    dim = 2 + int(has_z) + int(has_m)
    sfx = _kind_suffix(has_z, has_m)
    pos += 5
    if endian == ">":
        raise NotImplementedError("big-endian WKB not supported")
    if gtype == WKB_POINT:
        coords = struct.unpack_from(f"<{dim}d", buf, pos)
        return ("point" + sfx, coords if dim > 2 else (coords[0], coords[1])
                ), pos + 8 * dim
    if dim > 2:
        # higher-dim parse for the linear family (curve WKB stays 2-D)
        if gtype == WKB_LINESTRING:
            ring, pos = _read_ring(buf, pos, dim)
            return ("linestring" + sfx, ring), pos
        if gtype == WKB_POLYGON:
            (nrings,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            rings = []
            for _ in range(nrings):
                ring, pos = _read_ring(buf, pos, dim)
                rings.append(ring)
            return ("polygon" + sfx, rings), pos
        if gtype == WKB_MULTIPOLYGON:
            (npolys,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            polys = []
            for _ in range(npolys):
                g, pos = _parse_geom(buf, pos)
                if g[0] != "polygon" + sfx:
                    raise ValueError(
                        f"MultiPolygon{sfx} member {g[0]} (mixed dims)")
                polys.append(g[1])
            return ("multipolygon" + sfx, polys), pos
        raise NotImplementedError(
            f"WKB geometry type {gtype} with Z/M not supported")
    if gtype in (WKB_LINESTRING,):
        ring, pos = _read_ring(buf, pos)
        return ("linestring", ring), pos
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nrings):
            ring, pos = _read_ring(buf, pos)
            rings.append(ring)
        return ("polygon", rings), pos
    if gtype == WKB_MULTIPOLYGON:
        (npolys,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        polys = []
        for _ in range(npolys):
            (g, pos) = _parse_geom(buf, pos)
            assert g[0] == "polygon"
            polys.append(g[1])
        return ("multipolygon", polys), pos
    if gtype == 4:  # MultiPoint: point count + full point WKBs
        (npts,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        pts = []
        for _ in range(npts):
            g, pos = _parse_geom(buf, pos)
            if g[0] != "point":
                raise ValueError(f"MultiPoint member {g[0]}")
            pts.append(g[1])
        return ("multipoint", np.asarray(pts, np.float64)), pos
    if gtype == 5:  # MultiLineString
        (nls,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lines = []
        for _ in range(nls):
            g, pos = _parse_geom(buf, pos)
            if g[0] != "linestring":
                raise ValueError(f"MultiLineString member {g[0]}")
            lines.append(g[1])
        return ("multilinestring", lines), pos
    if gtype == 7:  # GeometryCollection: any members
        (ng,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        geoms = []
        for _ in range(ng):
            g, pos = _parse_geom(buf, pos)
            geoms.append(g)
        return ("geometrycollection", geoms), pos
    if gtype == WKB_TRIANGLE:
        # same layout as Polygon: one closed 4-point ring
        (nrings,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if nrings != 1:
            raise ValueError(f"Triangle needs exactly 1 ring, got {nrings}")
        ring, pos = _read_ring(buf, pos)
        if len(ring) != 4:
            raise ValueError(f"Triangle ring needs 4 points, got {len(ring)}")
        return ("triangle", [ring]), pos
    if gtype in (WKB_POLYHEDRALSURFACE, WKB_TIN):
        # patch count + full patch WKBs (Polygon / Triangle)
        kind = "polyhedralsurface" if gtype == WKB_POLYHEDRALSURFACE \
            else "tin"
        want = "polygon" if gtype == WKB_POLYHEDRALSURFACE else "triangle"
        (npatch,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        patches = []
        for _ in range(npatch):
            g, pos = _parse_geom(buf, pos)
            if g[0] != want:
                raise ValueError(f"{kind} patch {g[0]} (expected {want})")
            patches.append(g[1])
        return (kind, patches), pos
    if gtype == WKB_CIRCULARSTRING:
        # same layout as LineString: point count + xy pairs; odd count
        # >= 3, every consecutive point triple is one arc
        pts, pos = _read_ring(buf, pos)
        return ("circularstring", pts), pos
    if gtype == WKB_COMPOUNDCURVE:
        # count + child curve geometries (each with its own WKB
        # header); children are LineString or CircularString
        (nseg,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        segs = []
        for _ in range(nseg):
            g, pos = _parse_geom(buf, pos)
            if g[0] not in ("linestring", "circularstring"):
                raise ValueError(f"CompoundCurve member {g[0]}")
            segs.append(g)
        return ("compoundcurve", segs), pos
    if gtype == WKB_CURVEPOLYGON:
        # ring count + rings, each a full curve geometry (LineString /
        # CircularString / CompoundCurve)
        (nrings,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nrings):
            g, pos = _parse_geom(buf, pos)
            if g[0] not in ("linestring", "circularstring",
                            "compoundcurve"):
                raise ValueError(f"CurvePolygon ring {g[0]}")
            rings.append(g)
        return ("curvepolygon", rings), pos
    raise NotImplementedError(f"WKB geometry type {gtype}")


def wkb_circularstring(pts: np.ndarray) -> bytes:
    """Emit a CircularString (ISO WKB type 8): like LineString, an odd
    point count >= 3 where each consecutive triple is one arc."""
    pts = np.asarray(pts, dtype=np.float64)
    return struct.pack("<BI", 1, WKB_CIRCULARSTRING) + _pack_ring(pts)


def wkb_compoundcurve(segs: list[bytes]) -> bytes:
    """Emit a CompoundCurve (type 9) from already-encoded member WKBs
    (LineString / CircularString); members must chain end-to-start."""
    return (struct.pack("<BII", 1, WKB_COMPOUNDCURVE, len(segs))
            + b"".join(segs))


def wkb_curvepolygon(rings: list[bytes]) -> bytes:
    """Emit a CurvePolygon (type 10) from encoded closed ring WKBs."""
    return (struct.pack("<BII", 1, WKB_CURVEPOLYGON, len(rings))
            + b"".join(rings))


def wkb_linestring(pts: np.ndarray) -> bytes:
    """Emit a LineString (type 2)."""
    pts = np.asarray(pts, dtype=np.float64)
    return struct.pack("<BI", 1, WKB_LINESTRING) + _pack_ring(pts)


def polygon_rings(geom) -> list[list[np.ndarray]]:
    """Normalize a parsed polygon/multipolygon to a list of
    [exterior, holes...] ring lists."""
    kind, val = geom
    if kind == "polygon":
        return [val]
    if kind == "multipolygon":
        return val
    raise ValueError(f"not a polygon: {kind}")


def envelope_wkb(data: bytes) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) of any supported WKB geometry (the
    XY envelope; Z/M coordinates are ignored)."""
    kind, val = parse_wkb(data)
    if kind.startswith("point"):
        return val[0], val[1], val[0], val[1]
    if kind == "multipoint":
        return (float(val[:, 0].min()), float(val[:, 1].min()),
                float(val[:, 0].max()), float(val[:, 1].max()))
    if kind == "multilinestring":
        pts = np.vstack(val)
        return (float(pts[:, 0].min()), float(pts[:, 1].min()),
                float(pts[:, 0].max()), float(pts[:, 1].max()))
    if kind == "geometrycollection":
        envs = [envelope_wkb(wkb_of(g)) for g in val]
        return (min(e[0] for e in envs), min(e[1] for e in envs),
                max(e[2] for e in envs), max(e[3] for e in envs))
    if kind.startswith("polygon_") or kind.startswith("multipolygon_"):
        # Z/M variants: gather all ring vertices directly
        rings = val if kind.startswith("polygon_") else [
            r for poly in val for r in poly]
        pts = np.vstack(rings)
        return (
            float(pts[:, 0].min()),
            float(pts[:, 1].min()),
            float(pts[:, 0].max()),
            float(pts[:, 1].max()),
        )
    if kind.startswith("linestring"):
        val = np.asarray(val)
        return (
            float(val[:, 0].min()),
            float(val[:, 1].min()),
            float(val[:, 0].max()),
            float(val[:, 1].max()),
        )
    pts = np.vstack([r for rings in polygon_rings((kind, val)) for r in rings])
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )


# ------------------------------------------------------- exact predicates


def points_in_ring(xs: np.ndarray, ys: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized ray-casting crossing test for many points vs one ring.

    Exactly the reference's crossing rule (ogrlinearring.cpp:462-530):
    segment (i-1, i) is counted when y-signs straddle ((y1>0 && y2<=0) ||
    (y2>0 && y1<=0)) and the x-intersection (x1*y2 - x2*y1)/(y2-y1) > 0.
    """
    xs = np.asarray(xs, dtype=np.float64)[:, None]  # (P, 1)
    ys = np.asarray(ys, dtype=np.float64)[:, None]
    vx = ring[:, 0][None, :]  # (1, N)
    vy = ring[:, 1][None, :]
    x1 = vx[:, 1:] - xs  # current point i
    y1 = vy[:, 1:] - ys
    x2 = vx[:, :-1] - xs  # previous point i-1
    y2 = vy[:, :-1] - ys
    straddle = ((y1 > 0) & (y2 <= 0)) | ((y2 > 0) & (y1 <= 0))
    denom = y2 - y1
    with np.errstate(divide="ignore", invalid="ignore"):
        inter = (x1 * y2 - x2 * y1) / denom
    crossings = (straddle & (inter > 0.0)).sum(axis=1)
    return (crossings % 2).astype(bool)


def points_on_ring_boundary(xs, ys, ring) -> np.ndarray:
    """Vectorized exact on-segment test (isPointOnRingBoundary semantics:
    collinear with a segment and within its extent)."""
    xs = np.asarray(xs, dtype=np.float64)[:, None]
    ys = np.asarray(ys, dtype=np.float64)[:, None]
    ax = ring[:-1, 0][None, :]
    ay = ring[:-1, 1][None, :]
    bx = ring[1:, 0][None, :]
    by = ring[1:, 1][None, :]
    cross = (bx - ax) * (ys - ay) - (by - ay) * (xs - ax)
    dot = (xs - ax) * (xs - bx) + (ys - ay) * (ys - by)
    on = (cross == 0.0) & (dot <= 0.0)
    return on.any(axis=1)


def points_intersect_polygon(xs, ys, rings: list[np.ndarray]) -> np.ndarray:
    """OGR Intersects(point, polygon): true when inside the exterior and
    not strictly inside a hole, or anywhere on a ring boundary."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    inside = points_in_ring(xs, ys, rings[0])
    boundary = points_on_ring_boundary(xs, ys, rings[0])
    for hole in rings[1:]:
        hb = points_on_ring_boundary(xs, ys, hole)
        boundary |= hb
        inside &= ~(points_in_ring(xs, ys, hole) & ~hb)
    return inside | boundary


def points_intersect_geom(xs, ys, geom) -> np.ndarray:
    """Points vs parsed polygon/multipolygon."""
    out = np.zeros(len(np.atleast_1d(xs)), dtype=bool)
    for rings in polygon_rings(geom):
        out |= points_intersect_polygon(xs, ys, rings)
    return out


def _segments_cross(a: np.ndarray, b: np.ndarray) -> bool:
    """Any proper or touching crossing between segment sets a (N,2 closed
    ring) and b (M,2 closed ring), vectorized O(N*M)."""
    p = a[:-1][:, None, :]  # (N,1,2)
    r = (a[1:] - a[:-1])[:, None, :]
    q = b[:-1][None, :, :]  # (1,M,2)
    s = (b[1:] - b[:-1])[None, :, :]
    qp = q - p
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qpxr = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    qpxs = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = qpxs / rxs
        u = qpxr / rxs
    nonpar = rxs != 0
    hit = nonpar & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    if hit.any():
        return True
    # collinear overlap: qpxr == 0 and projections overlap
    col = (~nonpar) & (qpxr == 0)
    if col.any():
        rr = (r * r).sum(-1)
        t0 = (qp * r).sum(-1) / np.where(rr == 0, 1, rr)
        t1 = t0 + (s * r).sum(-1) / np.where(rr == 0, 1, rr)
        lo = np.minimum(t0, t1)
        hi = np.maximum(t0, t1)
        if (col & (hi >= 0) & (lo <= 1)).any():
            return True
    return False


def polygons_intersect(rings_a: list[np.ndarray], rings_b: list[np.ndarray]) -> bool:
    """Exact Intersects for two simple polygons (with holes):
    vertex-containment either way, or any boundary crossing."""
    ea, eb = rings_a[0], rings_b[0]
    if points_intersect_polygon(eb[:-1, 0], eb[:-1, 1], rings_a).any():
        return True
    if points_intersect_polygon(ea[:-1, 0], ea[:-1, 1], rings_b).any():
        return True
    for ra in rings_a:
        for rb in rings_b:
            if _segments_cross(ra, rb):
                return True
    return False


# --------------------------------------------------------------- clipping


def clip_ring_rect(ring: np.ndarray, minx, miny, maxx, maxy) -> np.ndarray | None:
    """Sutherland-Hodgman clip of one ring to an axis-aligned rect.
    Returns a closed ring or None when empty."""
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    for axis, bound, keep_ge in (
        (0, minx, True),
        (0, maxx, False),
        (1, miny, True),
        (1, maxy, False),
    ):
        if len(pts) == 0:
            return None
        out = []
        n = len(pts)
        for i in range(n):
            cur = pts[i]
            prv = pts[i - 1]
            cin = cur[axis] >= bound if keep_ge else cur[axis] <= bound
            pin = prv[axis] >= bound if keep_ge else prv[axis] <= bound
            if cin != pin:
                t = (bound - prv[axis]) / (cur[axis] - prv[axis])
                out.append(prv + t * (cur - prv))
            if cin:
                out.append(cur)
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return None
    return np.vstack([pts, pts[:1]])


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (CCW positive)."""
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def clip_polygon_rect(polys: list[list[np.ndarray]], minx, miny, maxx, maxy):
    """Intersection GEOMETRY of a (multi)polygon with an axis-aligned
    rect (reference semantics: OGR layer-algebra Intersection,
    ogrlayer.cpp:3345, for the rect clip window case).  Sutherland-
    Hodgman per ring; hole areas subtract.  Returns (wkb | None, area);
    boundary-touch intersections come back as (None, 0.0)."""
    out_polys: list[list[np.ndarray]] = []
    area = 0.0
    for rings in polys:
        ext = clip_ring_rect(rings[0], minx, miny, maxx, maxy)
        if ext is None:
            continue
        clipped = [ext]
        a = abs(ring_area(ext))
        for hole in rings[1:]:
            ch = clip_ring_rect(hole, minx, miny, maxx, maxy)
            if ch is not None:
                clipped.append(ch)
                a -= abs(ring_area(ch))
        out_polys.append(clipped)
        area += a
    if not out_polys:
        return None, 0.0
    if len(out_polys) == 1:
        return wkb_polygon(out_polys[0]), area
    return wkb_multipolygon(out_polys), area


def representative_point(rings: list[np.ndarray]) -> tuple[float, float]:
    """Deterministic interior-ish representative: the exterior ring's
    first vertex (matches are canonicalized on this point's cell)."""
    return float(rings[0][0, 0]), float(rings[0][0, 1])
