"""GML simple-features read/write over the engine's WKB column
convention — the reference's ``ogr/ogrsf_frmts/gml`` driver surface
(``gmlreader.cpp`` / ``ogr2gmlgeometry.cpp``), from the published
GML 2.1.2 / 3.1.1 encodings via stdlib ElementTree.

- write: a ``gml:FeatureCollection`` of ``gml:featureMember``
  elements; geometry in GML 2 form (``gml:coordinates`` with
  ``x,y`` pairs, ``outerBoundaryIs``/``innerBoundaryIs`` rings);
  attributes as child elements under the ``ogr:`` feature namespace
  exactly as the reference writer lays them out;
- read: both GML 2 (``coordinates``) and GML 3 (``posList``,
  ``exterior``/``interior``, ``MultiSurface``/``surfaceMember``)
  geometry spellings, namespace-agnostic by local-name matching (the
  reference reader also ignores prefixes), attribute types recovered
  by OGR-style sniffing (int -> float -> string).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from ..functions import geom as G

_GML = "http://www.opengis.net/gml"
_OGR = "http://ogr.maptools.org/"


def _coord_text(pts) -> str:
    a = np.asarray(pts)[:, :2]
    return " ".join(f"{float(x):.15g},{float(y):.15g}" for x, y in a)


def _geom_xml(parent: ET.Element, wkb: bytes) -> None:
    kind, val = G.parse_wkb(wkb)
    kind = kind.split("_")[0]
    if kind == "point":
        pt = ET.SubElement(parent, f"{{{_GML}}}Point")
        ET.SubElement(pt, f"{{{_GML}}}coordinates").text = (
            f"{val[0]:.15g},{val[1]:.15g}")
        return
    if kind == "linestring":
        ls = ET.SubElement(parent, f"{{{_GML}}}LineString")
        ET.SubElement(ls, f"{{{_GML}}}coordinates").text = \
            _coord_text(val)
        return
    if kind == "polygon":
        _polygon_xml(parent, val)
        return
    if kind == "multipolygon":
        mp = ET.SubElement(parent, f"{{{_GML}}}MultiPolygon")
        for rings in val:
            pm = ET.SubElement(mp, f"{{{_GML}}}polygonMember")
            _polygon_xml(pm, rings)
        return
    if kind == "multilinestring":
        ml = ET.SubElement(parent, f"{{{_GML}}}MultiLineString")
        for pts in val:
            lm = ET.SubElement(ml, f"{{{_GML}}}lineStringMember")
            ls = ET.SubElement(lm, f"{{{_GML}}}LineString")
            ET.SubElement(ls, f"{{{_GML}}}coordinates").text = \
                _coord_text(pts)
        return
    raise ValueError(f"GML: unsupported geometry kind {kind}")


def _polygon_xml(parent: ET.Element, rings) -> None:
    pg = ET.SubElement(parent, f"{{{_GML}}}Polygon")
    for i, ring in enumerate(rings):
        tag = "outerBoundaryIs" if i == 0 else "innerBoundaryIs"
        b = ET.SubElement(pg, f"{{{_GML}}}{tag}")
        lr = ET.SubElement(b, f"{{{_GML}}}LinearRing")
        ET.SubElement(lr, f"{{{_GML}}}coordinates").text = \
            _coord_text(ring)


def write_gml(path: str, table: pa.Table,
              geom_col: str = "geometry",
              layer: str = "features") -> None:
    ET.register_namespace("gml", _GML)
    ET.register_namespace("ogr", _OGR)
    root = ET.Element(f"{{{_OGR}}}FeatureCollection")
    attrs = [c for c in table.column_names if c != geom_col]
    wkbs = table.column(geom_col).to_pylist()
    cols = [table.column(c).to_pylist() for c in attrs]
    for i, b in enumerate(wkbs):
        fm = ET.SubElement(root, f"{{{_GML}}}featureMember")
        ft = ET.SubElement(fm, f"{{{_OGR}}}{layer}")
        ft.set("fid", f"{layer}.{i}")
        if b:
            gp = ET.SubElement(ft, f"{{{_OGR}}}geometryProperty")
            _geom_xml(gp, b)
        for c, col in zip(attrs, cols):
            el = ET.SubElement(ft, f"{{{_OGR}}}{c}")
            v = col[i]
            el.text = (repr(v) if isinstance(v, float) else str(v))
    tmp = path + f".tmp.{os.getpid()}"
    ET.ElementTree(root).write(tmp, encoding="unicode",
                               xml_declaration=True)
    os.replace(tmp, path)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_pts(el: ET.Element) -> np.ndarray:
    """coordinates (x,y pairs) or posList (flat x y stream)."""
    for child in el.iter():
        ln = _local(child.tag)
        if ln == "coordinates" and child.text:
            pairs = child.text.split()
            return np.array([[float(v) for v in p.split(",")[:2]]
                             for p in pairs])
        if ln in ("posList", "pos") and child.text:
            flat = [float(v) for v in child.text.split()]
            return np.array(flat).reshape(-1, 2)
    raise ValueError(f"GML: no coordinates under <{_local(el.tag)}>")


def _parse_polygon(el: ET.Element) -> list[np.ndarray]:
    rings: list[np.ndarray] = []
    exterior = None
    for child in el:
        ln = _local(child.tag)
        if ln in ("outerBoundaryIs", "exterior"):
            exterior = _parse_pts(child)
        elif ln in ("innerBoundaryIs", "interior"):
            rings.append(_parse_pts(child))
    if exterior is None:
        raise ValueError("GML Polygon without exterior ring")
    return [exterior] + rings


def _parse_geom(el: ET.Element) -> bytes | None:
    ln = _local(el.tag)
    if ln == "Point":
        pts = _parse_pts(el)
        return G.wkb_point(float(pts[0, 0]), float(pts[0, 1]))
    if ln in ("LineString", "Curve"):
        return G.wkb_linestring(_parse_pts(el))
    if ln == "Polygon":
        return G.wkb_polygon(_parse_polygon(el))
    if ln in ("MultiPolygon", "MultiSurface"):
        polys = []
        for mem in el.iter():
            if _local(mem.tag) == "Polygon":
                polys.append(_parse_polygon(mem))
        return G.wkb_multipolygon(polys)
    if ln in ("MultiLineString", "MultiCurve"):
        lines = []
        for mem in el.iter():
            if _local(mem.tag) == "LineString":
                lines.append(_parse_pts(mem))
        return G.wkb_multilinestring(lines)
    if ln == "MultiPoint":
        pts = []
        for mem in el.iter():
            if _local(mem.tag) == "Point":
                p = _parse_pts(mem)
                pts.append([float(p[0, 0]), float(p[0, 1])])
        return G.wkb_multipoint(np.array(pts))
    return None


_GEOM_TAGS = {"Point", "LineString", "Curve", "Polygon",
              "MultiPolygon", "MultiSurface", "MultiLineString",
              "MultiCurve", "MultiPoint"}


def _sniff(values: list[str | None]) -> pa.Array:
    try:
        return pa.array([None if v is None else int(v)
                         for v in values], pa.int64())
    except (ValueError, TypeError):
        pass
    try:
        return pa.array([None if v is None else float(v)
                         for v in values], pa.float64())
    except (ValueError, TypeError):
        return pa.array(values, pa.string())


def read_gml(path: str) -> pa.Table:
    """-> Table(geometry WKB, <attrs...>) from a FeatureCollection
    in GML 2 or GML 3 geometry spelling."""
    root = ET.parse(path).getroot()
    geoms: list[bytes | None] = []
    records: list[dict[str, str]] = []
    for fm in root.iter():
        if _local(fm.tag) not in ("featureMember", "member"):
            continue
        for feat in fm:
            rec: dict[str, str] = {}
            gwkb = None
            for prop in feat:
                ln = _local(prop.tag)
                kids = list(prop)
                geom_kid = next((k for k in kids
                                 if _local(k.tag) in _GEOM_TAGS), None)
                if geom_kid is not None:
                    gwkb = _parse_geom(geom_kid)
                elif ln in _GEOM_TAGS:
                    gwkb = _parse_geom(prop)
                else:
                    rec[ln] = prop.text
            geoms.append(gwkb)
            records.append(rec)
    names: list[str] = []
    for r in records:
        for k in r:
            if k not in names:
                names.append(k)
    arrays: dict[str, pa.Array] = {
        "geometry": pa.array(geoms, pa.binary())}
    for k in names:
        arrays[k] = _sniff([r.get(k) for r in records])
    return pa.Table.from_pydict(arrays)
