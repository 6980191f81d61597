"""AutoCAD DXF (ASCII) entity read/write over the engine's WKB column
convention — the reference's ``ogr/ogrsf_frmts/dxf`` driver surface
(``ogrdxflayer.cpp`` / ``ogrdxfwriterlayer.cpp``), from the published
DXF group-code layout, not the reference's code.

Entities covered (the interchange core the reference maps to OGR
geometry):

- ``POINT`` (codes 10/20) <-> point;
- ``LINE`` (10/20 + 11/21) <-> 2-vertex linestring;
- ``LWPOLYLINE`` (90 = vertex count, 70 bit 1 = closed, repeated
  10/20) <-> linestring, or polygon ring when closed — the
  reference's own closed-polyline => POLYGON translation;
- ``POLYLINE``/``VERTEX``/``SEQEND`` (the R12 spelling) read the
  same way;
- polygons WRITE as one closed LWPOLYLINE per ring (the reference
  writer's representation for areas without HATCH).

Each entity carries its layer (code 8); ``read_dxf`` returns it as
the ``Layer`` attribute, matching the OGR field of the same name.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions import geom as G

_F = "{:.15g}"


def _pair(code: int, value) -> str:
    return f"{code}\n{value}"


def _lwpolyline(pts: np.ndarray, closed: bool, layer: str) -> list[str]:
    a = np.asarray(pts)[:, :2]
    if closed and len(a) > 1 and np.array_equal(a[0], a[-1]):
        a = a[:-1]                     # DXF closed flag implies the wrap
    out = [_pair(0, "LWPOLYLINE"), _pair(8, layer),
           _pair(90, len(a)), _pair(70, 1 if closed else 0)]
    for x, y in a:
        out += [_pair(10, _F.format(float(x))),
                _pair(20, _F.format(float(y)))]
    return out


def _entity(wkb: bytes, layer: str) -> list[str]:
    kind, val = G.parse_wkb(wkb)
    kind = kind.split("_")[0]
    if kind == "point":
        return [_pair(0, "POINT"), _pair(8, layer),
                _pair(10, _F.format(val[0])),
                _pair(20, _F.format(val[1]))]
    if kind == "linestring":
        pts = np.asarray(val)
        if len(pts) == 2:
            return [_pair(0, "LINE"), _pair(8, layer),
                    _pair(10, _F.format(float(pts[0, 0]))),
                    _pair(20, _F.format(float(pts[0, 1]))),
                    _pair(11, _F.format(float(pts[1, 0]))),
                    _pair(21, _F.format(float(pts[1, 1])))]
        return _lwpolyline(pts, False, layer)
    if kind == "multilinestring":
        out: list[str] = []
        for pts in val:
            out += _lwpolyline(np.asarray(pts), False, layer)
        return out
    if kind == "polygon":
        out = []
        for ring in val:
            out += _lwpolyline(np.asarray(ring), True, layer)
        return out
    if kind == "multipolygon":
        out = []
        for poly in val:
            for ring in poly:
                out += _lwpolyline(np.asarray(ring), True, layer)
        return out
    raise ValueError(f"DXF: unsupported geometry kind {kind}")


def write_dxf(path: str, table: pa.Table,
              geom_col: str = "geometry",
              layer_col: str | None = None,
              default_layer: str = "0") -> None:
    """Minimal-header ASCII DXF with an ENTITIES section — the same
    skeleton the reference writer emits for R12-compatible output."""
    wkbs = table.column(geom_col).to_pylist()
    layers = (table.column(layer_col).to_pylist()
              if layer_col and layer_col in table.column_names
              else [default_layer] * len(wkbs))
    parts = [_pair(0, "SECTION"), _pair(2, "HEADER"),
             _pair(0, "ENDSEC"),
             _pair(0, "SECTION"), _pair(2, "ENTITIES")]
    for b, ly in zip(wkbs, layers):
        if b:
            parts += _entity(b, str(ly))
    parts += [_pair(0, "ENDSEC"), _pair(0, "EOF")]
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(parts) + "\n")
    os.replace(tmp, path)


def read_dxf(path: str) -> pa.Table:
    """-> Table(geometry WKB, Layer) from the ENTITIES section.
    Closed LWPOLYLINE/POLYLINE become polygons (the reference's
    translation); open ones become linestrings."""
    with open(path) as fh:
        raw = fh.read().splitlines()
    pairs: list[tuple[int, str]] = []
    for i in range(0, len(raw) - 1, 2):
        code = raw[i].strip()
        if not code.lstrip("-").isdigit():
            raise ValueError(f"{path}: bad group code line {i}: "
                             f"{code!r}")
        pairs.append((int(code), raw[i + 1].strip()))

    geoms: list[bytes] = []
    layers: list[str] = []

    def finish_poly(pts: list, closed: bool, layer: str) -> None:
        a = np.asarray(pts)
        if closed:
            if not np.array_equal(a[0], a[-1]):
                a = np.vstack([a, a[0]])
            geoms.append(G.wkb_polygon([a]))
        else:
            geoms.append(G.wkb_linestring(a))
        layers.append(layer)

    i = 0
    in_entities = False
    while i < len(pairs):
        code, val = pairs[i]
        if code == 0 and val == "SECTION":
            in_entities = (i + 1 < len(pairs)
                           and pairs[i + 1] == (2, "ENTITIES"))
            i += 1
            continue
        if not in_entities or code != 0:
            i += 1
            continue
        if val == "POINT":
            x = y = 0.0
            layer = "0"
            i += 1
            while i < len(pairs) and pairs[i][0] != 0:
                c, v = pairs[i]
                if c == 10:
                    x = float(v)
                elif c == 20:
                    y = float(v)
                elif c == 8:
                    layer = v
                i += 1
            geoms.append(G.wkb_point(x, y))
            layers.append(layer)
        elif val == "LINE":
            c0 = [0.0, 0.0]
            c1 = [0.0, 0.0]
            layer = "0"
            i += 1
            while i < len(pairs) and pairs[i][0] != 0:
                c, v = pairs[i]
                if c == 10:
                    c0[0] = float(v)
                elif c == 20:
                    c0[1] = float(v)
                elif c == 11:
                    c1[0] = float(v)
                elif c == 21:
                    c1[1] = float(v)
                elif c == 8:
                    layer = v
                i += 1
            geoms.append(G.wkb_linestring(np.array([c0, c1])))
            layers.append(layer)
        elif val == "LWPOLYLINE":
            pts: list[list[float]] = []
            closed = False
            layer = "0"
            i += 1
            cur_x = None
            while i < len(pairs) and pairs[i][0] != 0:
                c, v = pairs[i]
                if c == 70:
                    closed = bool(int(v) & 1)
                elif c == 8:
                    layer = v
                elif c == 10:
                    cur_x = float(v)
                elif c == 20:
                    pts.append([cur_x, float(v)])
                i += 1
            if len(pts) < 2:
                raise ValueError(f"{path}: LWPOLYLINE with "
                                 f"{len(pts)} vertices")
            finish_poly(pts, closed, layer)
        elif val == "POLYLINE":
            closed = False
            layer = "0"
            pts = []
            i += 1
            while i < len(pairs) and pairs[i][0] != 0:
                c, v = pairs[i]
                if c == 70:
                    closed = bool(int(v) & 1)
                elif c == 8:
                    layer = v
                i += 1
            while i < len(pairs) and pairs[i] == (0, "VERTEX"):
                vx = vy = 0.0
                i += 1
                while i < len(pairs) and pairs[i][0] != 0:
                    c, v = pairs[i]
                    if c == 10:
                        vx = float(v)
                    elif c == 20:
                        vy = float(v)
                    i += 1
                pts.append([vx, vy])
            if i < len(pairs) and pairs[i] == (0, "SEQEND"):
                i += 1
                while i < len(pairs) and pairs[i][0] != 0:
                    i += 1
            finish_poly(pts, closed, layer)
        else:
            i += 1
    return pa.Table.from_pydict({
        "geometry": pa.array(geoms, pa.binary()),
        "Layer": pa.array(layers, pa.string()),
    })
