"""MapInfo Interchange Format (MIF/MID) over the engine's WKB column
convention — the reference's ``ogr/ogrsf_frmts/mitab`` MIF half
(``mitab_miffile.cpp``), from the published MIF spec, not the
reference's code.

Layout a reference user relies on:

- ``.mif`` header: ``Version`` / ``Charset`` / ``Delimiter`` /
  ``Columns N`` with per-column ``name Type`` lines, then ``Data``
  and one geometry block per feature;
- ``.mid`` sidecar: one delimited attribute row per feature in
  ``Columns`` order;
- geometry blocks: ``Point x y``, ``Line x1 y1 x2 y2``,
  ``Pline [Multiple n] npts`` + coords, ``Region nrings`` with
  per-ring counts + coords, ``None`` for null geometry; styling
  clauses (``Symbol``/``Pen``/``Brush``/``Center``/``Smooth``) are
  skipped on read exactly as attribute-only consumers do;
- Region rings carry no explicit exterior/hole nesting — holes are
  recovered by containment (smallest enclosing ring wins), the same
  reassembly rule mitab applies.

Column types written: int64 -> ``Integer``, float64 -> ``Float``,
bool -> ``Logical``, strings -> ``Char(254)``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions import geom as G

_FMT = "{:.15g}"


def _coords(pts) -> list[str]:
    return [f"{_FMT.format(float(x))} {_FMT.format(float(y))}"
            for x, y in np.asarray(pts)[:, :2]]


def _geom_block(wkb: bytes | None) -> list[str]:
    if wkb is None or len(wkb) == 0:
        return ["None"]
    kind, val = G.parse_wkb(wkb)
    kind = kind.split("_")[0]          # Z/M flatten to 2-D on MIF write
    if kind == "point":
        return [f"Point {_FMT.format(val[0])} {_FMT.format(val[1])}"]
    if kind == "linestring":
        pts = np.asarray(val)
        if len(pts) == 2:
            (x1, y1), (x2, y2) = pts[:, 0:2]
            return [f"Line {_FMT.format(x1)} {_FMT.format(y1)} "
                    f"{_FMT.format(x2)} {_FMT.format(y2)}"]
        return [f"Pline {len(pts)}"] + _coords(pts)
    if kind == "multilinestring":
        parts = val
        out = [f"Pline Multiple {len(parts)}"]
        for pts in parts:
            out.append(str(len(pts)))
            out += _coords(pts)
        return out
    if kind == "polygon":
        rings = val
    elif kind == "multipolygon":
        rings = [r for poly in val for r in poly]
    else:
        raise ValueError(f"MIF: unsupported geometry kind {kind}")
    out = [f"Region {len(rings)}"]
    for ring in rings:
        out.append(str(len(ring)))
        out += _coords(ring)
    return out


def write_mif(path: str, table: pa.Table,
              geom_col: str = "geometry",
              delimiter: str = ",") -> None:
    """Write ``.mif`` + ``.mid``; ``path`` is the ``.mif`` file."""
    attrs = [c for c in table.column_names if c != geom_col]
    col_lines = []
    for c in attrs:
        t = table.schema.field(c).type
        if pa.types.is_boolean(t):
            col_lines.append(f"  {c} Logical")
        elif pa.types.is_integer(t):
            col_lines.append(f"  {c} Integer")
        elif pa.types.is_floating(t):
            col_lines.append(f"  {c} Float")
        else:
            col_lines.append(f"  {c} Char(254)")
    head = [
        "Version 300",
        'Charset "WindowsLatin1"',
        f'Delimiter "{delimiter}"',
        f"Columns {len(attrs)}",
        *col_lines,
        "Data",
        "",
    ]
    wkbs = table.column(geom_col).to_pylist()
    body: list[str] = []
    for b in wkbs:
        body += _geom_block(b)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(head + body) + "\n")
    os.replace(tmp, path)

    mid = os.path.splitext(path)[0] + ".mid"
    cols = [table.column(c).to_pylist() for c in attrs]
    lines = []
    for i in range(table.num_rows):
        vals = []
        for c, col in zip(attrs, cols):
            v = col[i]
            t = table.schema.field(c).type
            if pa.types.is_boolean(t):
                vals.append("T" if v else "F")
            elif pa.types.is_string(t) or pa.types.is_large_string(t):
                vals.append(f'"{v}"')
            else:
                vals.append(repr(v) if isinstance(v, float) else str(v))
        lines.append(delimiter.join(vals))
    tmp = mid + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
    os.replace(tmp, mid)


_STYLE = {"symbol", "pen", "brush", "center", "smooth"}


def _assemble_region(rings: list[np.ndarray]) -> bytes:
    """Containment-based exterior/hole reassembly (the mitab rule):
    a ring inside another ring is that ring's hole; nesting depth
    decides (even = exterior)."""
    n = len(rings)
    if n == 1:
        return G.wkb_polygon([rings[0]])
    # representative point of each ring vs every other ring
    depth = [0] * n
    parent = [-1] * n
    areas = [abs(G.ring_area(r)) for r in rings]
    for i, r in enumerate(rings):
        px, py = float(r[0, 0]), float(r[0, 1])
        best = -1
        best_area = np.inf
        for j, other in enumerate(rings):
            if i == j:
                continue
            inside = G.points_in_ring(np.array([px]), np.array([py]),
                                      other)[0]
            if inside and areas[j] < best_area and areas[j] > areas[i]:
                best, best_area = j, areas[j]
        parent[i] = best
    for i in range(n):
        d, j = 0, parent[i]
        while j != -1:
            d += 1
            j = parent[j]
        depth[i] = d
    polys: list[list[np.ndarray]] = []
    index: dict[int, int] = {}
    for i in range(n):
        if depth[i] % 2 == 0:
            index[i] = len(polys)
            polys.append([rings[i]])
    for i in range(n):
        if depth[i] % 2 == 1 and parent[i] in index:
            polys[index[parent[i]]].append(rings[i])
    if len(polys) == 1:
        return G.wkb_polygon(polys[0])
    return G.wkb_multipolygon(polys)


def read_mif(path: str) -> pa.Table:
    """-> Table(geometry WKB, <attrs...>) from ``.mif`` + ``.mid``."""
    with open(path) as fh:
        lines = [ln.strip() for ln in fh]
    delimiter = ","
    columns: list[tuple[str, str]] = []
    i = 0
    while i < len(lines) and lines[i].lower() != "data":
        low = lines[i].lower()
        if low.startswith("delimiter"):
            q = lines[i].split('"')
            if len(q) >= 2:
                delimiter = q[1]
        elif low.startswith("columns"):
            ncol = int(lines[i].split()[1])
            for k in range(ncol):
                parts = lines[i + 1 + k].split()
                columns.append((parts[0], parts[1]))
            i += ncol
        i += 1
    i += 1  # past "Data"

    geoms: list[bytes | None] = []
    while i < len(lines):
        ln = lines[i]
        if not ln:
            i += 1
            continue
        toks = ln.split()
        kw = toks[0].lower()
        if kw in _STYLE:
            i += 1
            continue
        if kw == "none":
            geoms.append(None)
            i += 1
        elif kw == "point":
            geoms.append(G.wkb_point(float(toks[1]), float(toks[2])))
            i += 1
        elif kw == "line":
            pts = np.array([[float(toks[1]), float(toks[2])],
                            [float(toks[3]), float(toks[4])]])
            geoms.append(G.wkb_linestring(pts))
            i += 1
        elif kw == "pline":
            if len(toks) >= 3 and toks[1].lower() == "multiple":
                nparts = int(toks[2])
                i += 1
                parts = []
                for _ in range(nparts):
                    npts = int(lines[i])
                    i += 1
                    pts = np.array([[float(v) for v in
                                     lines[i + k].split()[:2]]
                                    for k in range(npts)])
                    i += npts
                    parts.append(pts)
                geoms.append(G.wkb_multilinestring(parts))
            else:
                npts = int(toks[1])
                i += 1
                pts = np.array([[float(v) for v in
                                 lines[i + k].split()[:2]]
                                for k in range(npts)])
                i += npts
                geoms.append(G.wkb_linestring(pts))
        elif kw == "region":
            nrings = int(toks[1])
            i += 1
            rings = []
            for _ in range(nrings):
                npts = int(lines[i])
                i += 1
                ring = np.array([[float(v) for v in
                                  lines[i + k].split()[:2]]
                                 for k in range(npts)])
                i += npts
                if not np.array_equal(ring[0], ring[-1]):
                    ring = np.vstack([ring, ring[0]])
                rings.append(ring)
            geoms.append(_assemble_region(rings))
        else:
            raise ValueError(f"{path}: unsupported MIF entry {toks[0]!r}")

    mid = os.path.splitext(path)[0] + ".mid"
    arrays: dict[str, pa.Array] = {
        "geometry": pa.array(geoms, pa.binary())}
    if columns and os.path.exists(mid):
        import csv as _csv

        with open(mid, newline="") as fh:
            rows = list(_csv.reader(fh, delimiter=delimiter))
        if len(rows) != len(geoms):
            raise ValueError(
                f"{mid}: {len(rows)} attribute rows vs "
                f"{len(geoms)} geometries")
        for k, (name, ctype) in enumerate(columns):
            vals = [r[k] for r in rows]
            base = ctype.split("(")[0].lower()
            if base in ("integer", "smallint"):
                arrays[name] = pa.array([int(v) for v in vals],
                                        pa.int64())
            elif base in ("float", "decimal"):
                arrays[name] = pa.array([float(v) for v in vals],
                                        pa.float64())
            elif base == "logical":
                arrays[name] = pa.array(
                    [v.strip().upper().startswith("T") for v in vals],
                    pa.bool_())
            else:
                arrays[name] = pa.array(vals, pa.string())
    return pa.Table.from_pydict(arrays)
