"""ESRI Shapefile source / sink (.shp / .shx / .dbf).

Reference analog: the OGR Shapefile driver
(ogr/ogrsf_frmts/shape/ — shpopen.c / dbfopen.c, the shapelib core),
implementing the published ESRI Shapefile Technical Description
(July 1998) and dBase III DBF layout:

- .shp: 100-byte header (file code 9994 BE @0, file length BE in
  16-bit words @24, version 1000 LE @28, shape type LE @32, bbox
  doubles LE @36), then records of (record number BE, content length
  BE in words) + content (shape type LE + geometry).
- .shx: same header + (offset, length) BE word pairs per record.
- .dbf: version byte 0x03, record count LE int32, header/record sizes
  LE int16, 32-byte field descriptors (name[11], type, length,
  decimals), 0x0D terminator; records are a deletion-flag byte plus
  fixed-width ASCII fields ('C' text, 'N' numeric).

Shape types supported: Point (1), PolyLine (3), Polygon (5) — parsed
into the engine's WKB-column convention (multi-ring polygons become
WKB polygons; outer/inner ring classification is by the shapefile's
ring-winding rule: clockwise = outer).

Scale shape: one shapefile is one read task (the format is a single
sequential file); a directory of part shapefiles parallelizes like
any partitioned layout.  The sink writes one .shp/.shx/.dbf triple
per input block with atomic renames (resumable, never a giant file).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from ..functions import geom as G

_SHP_POINT, _SHP_POLYLINE, _SHP_POLYGON = 1, 3, 5


# ------------------------------------------------------------------ read


def _parse_shp(buf: bytes):
    """Yield WKB geometries from a .shp buffer."""
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError("not a shapefile (bad file code)")
    pos = 100
    out = []
    n = len(buf)
    while pos + 8 <= n:
        _recno, clen = struct.unpack_from(">ii", buf, pos)
        pos += 8
        start = pos
        (stype,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        if stype == 0:  # null shape
            out.append(None)
        elif stype == _SHP_POINT:
            x, y = struct.unpack_from("<dd", buf, pos)
            out.append(G.wkb_point(x, y))
        elif stype in (_SHP_POLYLINE, _SHP_POLYGON):
            nparts, npoints = struct.unpack_from("<ii", buf, pos + 32)
            parts = np.frombuffer(buf, "<i4", nparts, pos + 40)
            pts = np.frombuffer(
                buf, "<f8", 2 * npoints, pos + 40 + 4 * nparts
            ).reshape(npoints, 2)
            bounds = list(parts) + [npoints]
            rings = [
                pts[bounds[i]:bounds[i + 1]].astype(np.float64)
                for i in range(nparts)
            ]
            if stype == _SHP_POLYGON:
                out.append(G.wkb_polygon(rings))
            else:
                if nparts == 1:
                    a = rings[0]
                    out.append(
                        struct.pack("<BII", 1, 2, len(a))
                        + a.astype("<f8").tobytes())
                else:
                    partsb = b"".join(
                        struct.pack("<BII", 1, 2, len(a))
                        + a.astype("<f8").tobytes() for a in rings)
                    out.append(
                        struct.pack("<BII", 1, 5, nparts) + partsb)
        else:
            raise NotImplementedError(f"shape type {stype}")
        pos = start + clen * 2
    return out


def _parse_dbf(buf: bytes):
    """Parse dBase III records -> (names, types, rows)."""
    nrec, hsize, rsize = struct.unpack_from("<iHH", buf, 4)
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        name = buf[pos:pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    rows = []
    pos = hsize
    for _ in range(nrec):
        rec = buf[pos:pos + rsize]
        pos += rsize
        if rec[:1] == b"*":  # deleted
            continue
        vals, off = [], 1
        for name, ftype, flen, fdec in fields:
            raw = rec[off:off + flen].decode("ascii", "replace")
            off += flen
            if ftype == "N":
                raw = raw.strip()
                if not raw:
                    vals.append(None)
                elif fdec or "." in raw:
                    vals.append(float(raw))
                else:
                    vals.append(int(raw))
            elif ftype == "L":
                # dBase logical: T/t/Y/y true, F/f/N/n false, else null
                c0 = raw.strip()[:1]
                vals.append(True if c0 in "TtYy"
                            else False if c0 in "FfNn" else None)
            elif ftype == "D":
                # dBase date: YYYYMMDD (blank = null), kept as the
                # OGR-convention ISO string
                raw = raw.strip()
                vals.append(f"{raw[0:4]}-{raw[4:6]}-{raw[6:8]}"
                            if len(raw) == 8 and raw.isdigit()
                            else None)
            else:
                vals.append(raw.rstrip() or None)
        rows.append(vals)
    return [f[0] for f in fields], [f[1] for f in fields], rows


def shapefile_to_table(shp_path: str) -> pa.Table:
    """One .shp (+.dbf if present) -> WKB-convention Arrow table."""
    with open(shp_path, "rb") as fh:
        wkbs = _parse_shp(fh.read())
    cols = {"geometry": pa.array(wkbs, pa.binary())}
    dbf = os.path.splitext(shp_path)[0] + ".dbf"
    if os.path.exists(dbf):
        with open(dbf, "rb") as fh:
            names, _types, rows = _parse_dbf(fh.read())
        for j, name in enumerate(names):
            cols[name] = pa.array([r[j] for r in rows])
    return pa.table(cols)


def read_prj(shp_path: str) -> int | None:
    """EPSG code recovered from the .prj sidecar's AUTHORITY node
    (None when absent)."""
    prj = shp_path[:-4] + ".prj"
    if not os.path.exists(prj):
        return None
    from ..functions.crswkt import authority_code

    with open(prj) as fh:
        return authority_code(fh.read())


def read_shapefile(path: str):
    """Dataset over one .shp or a directory of part shapefiles."""
    import ray.data as rd

    paths = []
    if os.path.isdir(path):
        paths = [os.path.join(path, n) for n in sorted(os.listdir(path))
                 if n.endswith(".shp")]
    else:
        paths = [path]
    ds = rd.from_items([{"path": p} for p in paths])

    def parse(t: pa.Table) -> pa.Table:
        tables = [shapefile_to_table(p)
                  for p in t.column("path").to_pylist()]
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(parse, batch_format="pyarrow")


# ----------------------------------------------------------------- write


def _ring_cw(a: np.ndarray) -> np.ndarray:
    """Shapefile outer rings are clockwise (signed area < 0 in the
    shoelace-with-y-up convention)."""
    s = float(np.sum(a[:-1, 0] * a[1:, 1] - a[1:, 0] * a[:-1, 1]))
    return a[::-1] if s > 0 else a


def _shape_record(wkb: bytes) -> bytes:
    kind, payload = G.parse_wkb(wkb)
    if kind == "point":
        return struct.pack("<idd", _SHP_POINT, *payload)
    if kind == "linestring":
        a = np.asarray(payload, np.float64)
        head = struct.pack(
            "<i4dii", _SHP_POLYLINE,
            a[:, 0].min(), a[:, 1].min(), a[:, 0].max(), a[:, 1].max(),
            1, len(a))
        return head + struct.pack("<i", 0) + a.astype("<f8").tobytes()
    if kind in ("polygon", "multipolygon"):
        ring_lists = G.polygon_rings((kind, payload))
        rings = []
        for rl in ring_lists:
            for k, r in enumerate(rl):
                a = np.asarray(r, np.float64)
                if not np.array_equal(a[0], a[-1]):
                    a = np.vstack([a, a[:1]])
                a = _ring_cw(a) if k == 0 else _ring_cw(a)[::-1]
                rings.append(a)
        allp = np.vstack(rings)
        parts, off = [], 0
        for a in rings:
            parts.append(off)
            off += len(a)
        head = struct.pack(
            "<i4dii", _SHP_POLYGON,
            allp[:, 0].min(), allp[:, 1].min(),
            allp[:, 0].max(), allp[:, 1].max(),
            len(rings), len(allp))
        return (head + struct.pack(f"<{len(parts)}i", *parts)
                + allp.astype("<f8").tobytes())
    raise NotImplementedError(kind)


def write_shapefile(table: pa.Table, shp_path: str,
                    geometry_col: str = "geometry",
                    srs=None) -> None:
    """Write one .shp/.shx/.dbf triple from a WKB-convention table;
    ``srs`` (an EPSG code) also writes the ``.prj`` sidecar with the
    registry-emitted WKT1 (functions.crswkt — the
    OGRSpatialReference::exportToWkt analog)."""
    if srs is not None:
        from ..functions.crswkt import to_wkt

        with open(shp_path[:-4] + ".prj", "w") as fh:
            fh.write(to_wkt(srs))
    wkbs = table.column(geometry_col).to_pylist()
    recs = [_shape_record(w) for w in wkbs]
    # shp + shx
    shp = bytearray(100)
    shx = bytearray(100)
    offsets = []
    pos = 100
    for i, rc in enumerate(recs):
        offsets.append((pos // 2, len(rc) // 2))
        shp += struct.pack(">ii", i + 1, len(rc) // 2) + rc
        pos += 8 + len(rc)
    stype = struct.unpack_from("<i", recs[0], 0)[0] if recs else 0
    xs, ys = [], []
    for w in wkbs:
        e = G.envelope_wkb(w)
        xs += [e[0], e[2]]
        ys += [e[1], e[3]]
    bbox = (min(xs), min(ys), max(xs), max(ys)) if xs else (0, 0, 0, 0)
    for target, total in ((shp, len(shp)), (shx, 100 + 8 * len(recs))):
        struct.pack_into(">i", target, 0, 9994)
        struct.pack_into(">i", target, 24, total // 2)
        struct.pack_into("<i", target, 28, 1000)
        struct.pack_into("<i", target, 32, stype)
        struct.pack_into("<4d", target, 36, *bbox)
    for off, ln in offsets:
        shx += struct.pack(">ii", off, ln)
    # dbf: C for strings, N(18) for ints, N(18.6) for floats
    attrs = [c for c in table.column_names if c != geometry_col]
    fields = []
    for c in attrs:
        ty = table.schema.field(c).type
        if pa.types.is_boolean(ty):
            fields.append((c, "L", 1, 0))
        elif pa.types.is_integer(ty):
            fields.append((c, "N", 18, 0))
        elif pa.types.is_floating(ty):
            fields.append((c, "N", 18, 6))
        elif (pa.types.is_date(ty) or pa.types.is_timestamp(ty)):
            fields.append((c, "D", 8, 0))
        else:
            fields.append((c, "C", 32, 0))
    rsize = 1 + sum(f[2] for f in fields)
    hsize = 32 + 32 * len(fields) + 1
    dbf = bytearray(32)
    dbf[0] = 0x03
    struct.pack_into("<iHH", dbf, 4, len(recs), hsize, rsize)
    for name, ftype, flen, fdec in fields:
        fd = bytearray(32)
        fd[:11] = name.encode("ascii")[:11].ljust(11, b"\x00")
        fd[11] = ord(ftype)
        fd[16] = flen
        fd[17] = fdec
        dbf += fd
    dbf += b"\x0d"
    cols = {c: table.column(c).to_pylist() for c in attrs}
    for i in range(len(recs)):
        rec = b" "
        for name, ftype, flen, fdec in fields:
            v = cols[name][i]
            if ftype == "N":
                s = ("" if v is None else
                     (f"{v:.{fdec}f}" if fdec else str(int(v))))
                rec += s.rjust(flen)[:flen].encode("ascii")
            elif ftype == "L":
                rec += (b"?" if v is None
                        else (b"T" if v else b"F"))
            elif ftype == "D":
                if v is None:
                    rec += b" " * 8
                else:
                    rec += (f"{v.year:04d}{v.month:02d}"
                            f"{v.day:02d}").encode("ascii")
            else:
                rec += ("" if v is None else str(v)).ljust(
                    flen)[:flen].encode("ascii")
        dbf += rec
    dbf += b"\x1a"
    base = os.path.splitext(shp_path)[0]
    for ext, data in ((".shp", shp), (".shx", shx), (".dbf", dbf)):
        tmp = base + ext + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(bytes(data))
        os.replace(tmp, base + ext)


def write_shapefile_sink(ds, out_dir: str, geometry_col: str = "geometry",
                         resume: bool = True):
    """Resumable partitioned sink: one shapefile triple per block."""
    os.makedirs(out_dir, exist_ok=True)

    def sink(t: pa.Table) -> pa.Table:
        import uuid

        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        tag = uuid.uuid5(
            uuid.NAMESPACE_URL,
            t.column(geometry_col)[0].as_py().hex() + str(t.num_rows)
        ).hex[:16]
        final = os.path.join(out_dir, f"part-{tag}.shp")
        if not (resume and os.path.exists(final)):
            write_shapefile(t, final, geometry_col)
        return pa.table({"path": pa.array([final]),
                         "n": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(sink, batch_format="pyarrow")
