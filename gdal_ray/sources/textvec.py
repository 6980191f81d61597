"""Text vector interchange formats over the engine's WKB column
convention: CSV with a WKT geometry column (the reference's
``ogr/ogrsf_frmts/csv`` convention), KML 2.2 Placemarks
(``ogr/ogrsf_frmts/kml``/libkml), and GPX waypoints + tracks
(``ogr/ogrsf_frmts/gpx``) — all via the in-engine WKT layer and the
stdlib csv / xml.etree modules (nothing from the reference's code).

Feature tables are pyarrow Tables carrying a ``geometry`` WKB binary
column (the engine's vector convert-layer convention) plus attribute
columns; attribute types round-trip through OGR-style sniffing on
read (int, then float, else string).
"""

from __future__ import annotations

import csv
import os
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from ..functions import geom as G
from ..functions.wkt import wkb_to_wkt, wkt_to_wkb

# --------------------------------------------------------- CSV / WKT


def write_csv_features(path: str, table: pa.Table,
                       geom_col: str = "geometry") -> None:
    """CSV with the OGR ``WKT`` geometry-column convention; attribute
    columns written verbatim, proper quoting via the csv module."""
    attrs = [c for c in table.column_names if c != geom_col]
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w", newline="") as fh:
        wr = csv.writer(fh)
        wr.writerow(["WKT"] + attrs)
        wkbs = table.column(geom_col).to_pylist()
        cols = [table.column(c).to_pylist() for c in attrs]
        for i, b in enumerate(wkbs):
            wr.writerow([wkb_to_wkt(b)] + [c[i] for c in cols])
    os.replace(tmp, path)


def _sniff(values: list[str]):
    """OGR-style column type sniffing: int64 -> float64 -> string."""
    try:
        return pa.array([int(v) for v in values], pa.int64())
    except ValueError:
        pass
    try:
        return pa.array([float(v) for v in values], pa.float64())
    except ValueError:
        return pa.array(values, pa.string())


def read_csv_features(path: str) -> pa.Table:
    """-> Table(geometry, <attrs...>); requires a ``WKT`` column."""
    with open(path, newline="") as fh:
        rows = list(csv.reader(fh))
    if not rows:
        raise ValueError("CSV: empty file")
    header = rows[0]
    if "WKT" not in header:
        raise ValueError("CSV: no WKT geometry column")
    gi = header.index("WKT")
    body = rows[1:]
    cols = {"geometry": pa.array([wkt_to_wkb(r[gi]) for r in body],
                                pa.binary())}
    for j, name in enumerate(header):
        if j == gi:
            continue
        cols[name] = _sniff([r[j] for r in body])
    return pa.table(cols)


# ---------------------------------------------------------------- KML

_KML_NS = "http://www.opengis.net/kml/2.2"


def _kml_coords(pts: np.ndarray) -> str:
    return " ".join(f"{x!r},{y!r}" for x, y in pts)


def _parse_kml_coords(text: str) -> np.ndarray:
    pts = [tuple(float(v) for v in tok.split(",")[:2])
           for tok in text.split()]
    return np.asarray(pts, np.float64)


def write_kml(path: str, table: pa.Table, *, name_col: str | None = None,
              geom_col: str = "geometry") -> None:
    """KML 2.2 Placemarks: Point / LineString / Polygon (outer +
    inner boundaries); other attribute columns ride ExtendedData."""
    kml = ET.Element("kml", xmlns=_KML_NS)
    doc = ET.SubElement(kml, "Document")
    attrs = [c for c in table.column_names
             if c not in (geom_col, name_col)]
    wkbs = table.column(geom_col).to_pylist()
    names = (table.column(name_col).to_pylist()
             if name_col else [None] * len(wkbs))
    cols = {c: table.column(c).to_pylist() for c in attrs}
    for i, b in enumerate(wkbs):
        pm = ET.SubElement(doc, "Placemark")
        if names[i] is not None:
            ET.SubElement(pm, "name").text = str(names[i])
        if attrs:
            ext = ET.SubElement(pm, "ExtendedData")
            for c in attrs:
                d = ET.SubElement(ext, "Data", name=c)
                ET.SubElement(d, "value").text = str(cols[c][i])
        g = G.parse_wkb(b)
        kind = g[0]
        if kind == "point":
            x, y = g[1]
            pt = ET.SubElement(pm, "Point")
            ET.SubElement(pt, "coordinates").text = f"{x!r},{y!r}"
        elif kind == "linestring":
            ls = ET.SubElement(pm, "LineString")
            ET.SubElement(ls, "coordinates").text = _kml_coords(g[1])
        elif kind == "polygon":
            poly = ET.SubElement(pm, "Polygon")
            for k, ring in enumerate(g[1]):
                bnd = ET.SubElement(
                    poly, "outerBoundaryIs" if k == 0
                    else "innerBoundaryIs")
                lr = ET.SubElement(bnd, "LinearRing")
                ET.SubElement(lr, "coordinates").text = \
                    _kml_coords(ring)
        else:
            raise ValueError(f"KML writer: geometry {kind!r} "
                             "unsupported (point/linestring/polygon)")
    tmp = path + f".tmp.{os.getpid()}"
    ET.ElementTree(kml).write(tmp, encoding="utf-8",
                              xml_declaration=True)
    os.replace(tmp, path)


def read_kml(path: str) -> pa.Table:
    """-> Table(geometry, name, <ExtendedData attrs...> as
    strings)."""
    root = ET.parse(path).getroot()
    ns = {"k": _KML_NS}
    out_wkb, out_name = [], []
    ext_cols: dict[str, list] = {}
    pms = root.findall(".//k:Placemark", ns)
    for idx, pm in enumerate(pms):
        nm = pm.find("k:name", ns)
        out_name.append(nm.text if nm is not None else "")
        for d in pm.findall("k:ExtendedData/k:Data", ns):
            c = d.get("name")
            v = d.find("k:value", ns)
            ext_cols.setdefault(c, [""] * idx).append(
                v.text if v is not None else "")
        for c in ext_cols:
            if len(ext_cols[c]) <= idx:
                ext_cols[c].append("")
        pt = pm.find("k:Point/k:coordinates", ns)
        ls = pm.find("k:LineString/k:coordinates", ns)
        poly = pm.find("k:Polygon", ns)
        if pt is not None:
            x, y = _parse_kml_coords(pt.text)[0]
            out_wkb.append(G.wkb_point(x, y))
        elif ls is not None:
            out_wkb.append(G.wkb_linestring(
                _parse_kml_coords(ls.text)))
        elif poly is not None:
            rings = [_parse_kml_coords(c.text) for c in
                     poly.findall(".//k:LinearRing/k:coordinates", ns)]
            out_wkb.append(G.wkb_polygon(rings))
        else:
            raise ValueError("KML: Placemark without a supported "
                             "geometry")
    cols = {"geometry": pa.array(out_wkb, pa.binary()),
            "name": pa.array(out_name, pa.string())}
    for c, vals in ext_cols.items():
        cols[c] = pa.array(vals, pa.string())
    return pa.table(cols)


# ---------------------------------------------------------------- GPX

_GPX_NS = "http://www.topografix.com/GPX/1/1"


def write_gpx(path: str, *, waypoints: pa.Table | None = None,
              tracks: pa.Table | None = None,
              routes: pa.Table | None = None) -> None:
    """GPX 1.1: ``waypoints`` = Table(geometry point WKB, name?,
    ele?); ``tracks`` = Table(geometry linestring WKB, name?);
    ``routes`` = Table(geometry linestring WKB, name?) — ``<rte>``
    with ``<rtept>`` members (the ogr/gpx 'routes' layer)."""
    gpx = ET.Element("gpx", xmlns=_GPX_NS, version="1.1",
                     creator="gdal_ray")
    if waypoints is not None:
        names = (waypoints.column("name").to_pylist()
                 if "name" in waypoints.column_names
                 else [None] * waypoints.num_rows)
        eles = (waypoints.column("ele").to_pylist()
                if "ele" in waypoints.column_names
                else [None] * waypoints.num_rows)
        for b, nm, el in zip(waypoints.column("geometry").to_pylist(),
                             names, eles):
            g = G.parse_wkb(b)
            if g[0] != "point":
                raise ValueError("GPX waypoints must be points")
            x, y = g[1]
            w = ET.SubElement(gpx, "wpt", lat=repr(y), lon=repr(x))
            if el is not None:
                ET.SubElement(w, "ele").text = repr(float(el))
            if nm is not None:
                ET.SubElement(w, "name").text = str(nm)
    if tracks is not None:
        names = (tracks.column("name").to_pylist()
                 if "name" in tracks.column_names
                 else [None] * tracks.num_rows)
        for b, nm in zip(tracks.column("geometry").to_pylist(), names):
            g = G.parse_wkb(b)
            if g[0] != "linestring":
                raise ValueError("GPX tracks must be linestrings")
            trk = ET.SubElement(gpx, "trk")
            if nm is not None:
                ET.SubElement(trk, "name").text = str(nm)
            seg = ET.SubElement(trk, "trkseg")
            for x, y in g[1]:
                ET.SubElement(seg, "trkpt", lat=repr(y), lon=repr(x))
    if routes is not None:
        names = (routes.column("name").to_pylist()
                 if "name" in routes.column_names
                 else [None] * routes.num_rows)
        for b, nm in zip(routes.column("geometry").to_pylist(), names):
            g = G.parse_wkb(b)
            if g[0] != "linestring":
                raise ValueError("GPX routes must be linestrings")
            rte = ET.SubElement(gpx, "rte")
            if nm is not None:
                ET.SubElement(rte, "name").text = str(nm)
            for x, y in g[1]:
                ET.SubElement(rte, "rtept", lat=repr(y), lon=repr(x))
    tmp = path + f".tmp.{os.getpid()}"
    ET.ElementTree(gpx).write(tmp, encoding="utf-8",
                              xml_declaration=True)
    os.replace(tmp, path)


def read_gpx(path: str) -> dict:
    """-> {'waypoints': Table(geometry, name, ele), 'tracks':
    Table(geometry, name), 'routes': Table(geometry, name)} (absent
    elements -> empty tables)."""
    root = ET.parse(path).getroot()
    ns = {"g": _GPX_NS}
    w_wkb, w_name, w_ele = [], [], []
    for w in root.findall("g:wpt", ns):
        w_wkb.append(G.wkb_point(float(w.get("lon")),
                                 float(w.get("lat"))))
        nm = w.find("g:name", ns)
        w_name.append(nm.text if nm is not None else "")
        el = w.find("g:ele", ns)
        w_ele.append(float(el.text) if el is not None else np.nan)
    t_wkb, t_name = [], []
    for trk in root.findall("g:trk", ns):
        nm = trk.find("g:name", ns)
        pts = [(float(p.get("lon")), float(p.get("lat")))
               for seg in trk.findall("g:trkseg", ns)
               for p in seg.findall("g:trkpt", ns)]
        t_wkb.append(G.wkb_linestring(np.asarray(pts, np.float64)))
        t_name.append(nm.text if nm is not None else "")
    r_wkb, r_name = [], []
    for rte in root.findall("g:rte", ns):
        nm = rte.find("g:name", ns)
        pts = [(float(p.get("lon")), float(p.get("lat")))
               for p in rte.findall("g:rtept", ns)]
        r_wkb.append(G.wkb_linestring(np.asarray(pts, np.float64)))
        r_name.append(nm.text if nm is not None else "")
    return {
        "waypoints": pa.table({
            "geometry": pa.array(w_wkb, pa.binary()),
            "name": pa.array(w_name, pa.string()),
            "ele": pa.array(w_ele, pa.float64())}),
        "tracks": pa.table({
            "geometry": pa.array(t_wkb, pa.binary()),
            "name": pa.array(t_name, pa.string())}),
        "routes": pa.table({
            "geometry": pa.array(r_wkb, pa.binary()),
            "name": pa.array(r_name, pa.string())}),
    }


def read_csv_points(path: str, x_col: str = "x",
                    y_col: str = "y") -> pa.Table:
    """CSV with SEPARATE coordinate columns -> point features — the
    reference CSV driver's X_POSSIBLE_NAMES/Y_POSSIBLE_NAMES open
    option (``ogr/ogrsf_frmts/csv``).  The coordinate columns become
    the ``geometry`` WKB point; all other columns stay attributes
    with OGR-style sniffing."""
    with open(path, newline="") as fh:
        rows = list(csv.reader(fh))
    if not rows:
        raise ValueError(f"{path}: empty CSV")
    header = rows[0]
    if x_col not in header or y_col not in header:
        raise ValueError(f"{path}: missing {x_col!r}/{y_col!r} "
                         f"columns (have {header})")
    xi, yi = header.index(x_col), header.index(y_col)
    geoms = [G.wkb_point(float(r[xi]), float(r[yi]))
             for r in rows[1:]]
    arrays: dict[str, pa.Array] = {
        "geometry": pa.array(geoms, pa.binary())}
    for k, name in enumerate(header):
        if k in (xi, yi):
            continue
        arrays[name] = _sniff([r[k] for r in rows[1:]])
    return pa.Table.from_pydict(arrays)
