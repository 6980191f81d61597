"""WKT (Well-Known Text) geometry parse / emit.

Reference analog: OGRGeometry::exportToWkt / importFromWkt
(ogr/ogrgeometry.cpp, ogr/ogrgeometryfactory.cpp createFromWkt) — the
text twin of the WKB layer, used throughout the reference's autotest
suites as the human-readable geometry form.  Grammar: ISO simple
features with optional Z/M dimension tokens (``POINT Z (1 2 3)``;
bare 3-coordinate tuples read as Z per OGR), EMPTY sets, and nested
GEOMETRYCOLLECTION.

Round-trip contract: numbers render via Python ``repr`` (shortest
form that round-trips the double exactly), so
``parse_wkt(to_wkt(g)) == g`` bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from . import geom as G

__all__ = ["parse_wkt", "to_wkt", "wkt_to_wkb", "wkb_to_wkt"]


def _num(v: float) -> str:
    r = repr(float(v))
    return r[:-2] if r.endswith(".0") else r


def _coords(a: np.ndarray) -> str:
    a = np.asarray(a, np.float64)
    return ", ".join(" ".join(_num(v) for v in row) for row in a)


def _ring_list(rings) -> str:
    return ", ".join(f"({_coords(r)})" for r in rings)


def to_wkt(geom) -> str:
    """Parsed (kind, payload) tuple -> WKT string."""
    kind, val = geom
    base, _, sfx = kind.partition("_")
    dim = (" " + sfx.upper()) if sfx else ""
    tag = base.upper()
    if base == "point":
        return f"POINT{dim} ({' '.join(_num(v) for v in val)})"
    if base == "linestring":
        return f"LINESTRING{dim} ({_coords(val)})"
    if base in ("polygon", "triangle"):
        return f"{tag}{dim} ({_ring_list(val)})"
    if base == "multipoint":
        return f"MULTIPOINT{dim} ({_coords(val)})"
    if base == "multilinestring":
        return f"MULTILINESTRING{dim} ({_ring_list(val)})"
    if base in ("multipolygon", "polyhedralsurface", "tin"):
        body = ", ".join(f"({_ring_list(p)})" for p in val)
        return f"{tag}{dim} ({body})"
    if base == "geometrycollection":
        return f"GEOMETRYCOLLECTION{dim} ({', '.join(to_wkt(g) for g in val)})"
    if base == "circularstring":
        return f"CIRCULARSTRING{dim} ({_coords(val)})"
    if base == "compoundcurve":
        # members: bare parens = LineString, tagged = CircularString
        parts = []
        for mk, mv in val:
            parts.append(f"({_coords(mv)})" if mk == "linestring"
                         else to_wkt((mk, mv)))
        return f"COMPOUNDCURVE{dim} ({', '.join(parts)})"
    if base == "curvepolygon":
        parts = []
        for mk, mv in val:
            parts.append(f"({_coords(mv)})" if mk == "linestring"
                         else to_wkt((mk, mv)))
        return f"CURVEPOLYGON{dim} ({', '.join(parts)})"
    raise ValueError(f"to_wkt: unsupported kind {kind!r}")


class _Scanner:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def skip_ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t\n\r":
            self.i += 1

    def peek(self) -> str:
        self.skip_ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def expect(self, ch: str):
        self.skip_ws()
        if self.i >= len(self.s) or self.s[self.i] != ch:
            raise ValueError(
                f"WKT parse error at {self.i}: expected {ch!r} in "
                f"{self.s[self.i:self.i + 20]!r}")
        self.i += 1

    def word(self) -> str:
        self.skip_ws()
        j = self.i
        while j < len(self.s) and (self.s[j].isalpha()):
            j += 1
        w = self.s[self.i:j]
        self.i = j
        return w.upper()

    def number(self) -> float:
        self.skip_ws()
        j = self.i
        while j < len(self.s) and self.s[j] not in " \t\n\r,)":
            j += 1
        v = float(self.s[self.i:j])
        self.i = j
        return v


def _scan_coords(sc: _Scanner) -> np.ndarray:
    sc.expect("(")
    rows = []
    while True:
        row = [sc.number()]
        while sc.peek() not in ",)":
            row.append(sc.number())
        rows.append(row)
        if sc.peek() == ")":
            sc.expect(")")
            break
        sc.expect(",")
    width = len(rows[0])
    if any(len(r) != width for r in rows):
        raise ValueError("WKT: inconsistent coordinate dimension")
    return np.asarray(rows, np.float64)


def _scan_ring_list(sc: _Scanner) -> list[np.ndarray]:
    sc.expect("(")
    rings = []
    while True:
        rings.append(_scan_coords(sc))
        if sc.peek() == ")":
            sc.expect(")")
            break
        sc.expect(",")
    return rings


def _dim_suffix(word_dim: str, width: int) -> tuple[str, int]:
    """Resolve the kind suffix from an explicit Z/M/ZM token or the
    bare coordinate width (3 wide reads as Z, the OGR default)."""
    if word_dim == "Z":
        return "_z", 3
    if word_dim == "M":
        return "_m", 3
    if word_dim == "ZM":
        return "_zm", 4
    if width == 3:
        return "_z", 3
    if width == 4:
        return "_zm", 4
    return "", 2


def parse_wkt(s: str):
    """WKT string -> the parse_wkb-convention (kind, payload) tuple."""
    sc = _Scanner(s)
    geom = _parse(sc)
    sc.skip_ws()
    if sc.i != len(sc.s):
        raise ValueError(f"WKT: trailing input at {sc.i}")
    return geom


def _parse(sc: _Scanner):
    tag = sc.word()
    dim = ""
    nxt = sc.word()
    if nxt in ("Z", "M", "ZM"):
        dim = nxt
        nxt = sc.word()
    if nxt == "EMPTY":
        if tag == "POINT":
            raise ValueError("POINT EMPTY has no coordinate form")
        empty = {"LINESTRING": np.zeros((0, 2)), "MULTIPOINT":
                 np.zeros((0, 2))}.get(tag, [])
        return (tag.lower(), empty)
    if nxt:
        raise ValueError(f"WKT: unexpected token {nxt!r}")

    if tag == "POINT":
        a = _scan_coords(sc)
        if len(a) != 1:
            raise ValueError("POINT needs exactly one coordinate")
        sfx, w = _dim_suffix(dim, a.shape[1])
        if a.shape[1] != w:
            raise ValueError("POINT: dimension token/width mismatch")
        return ("point" + sfx,
                tuple(a[0]) if w > 2 else (a[0, 0], a[0, 1]))
    if tag in ("LINESTRING", "CIRCULARSTRING"):
        a = _scan_coords(sc)
        sfx, w = _dim_suffix(dim, a.shape[1])
        if a.shape[1] != w:
            raise ValueError(f"{tag}: dimension token/width mismatch")
        return (tag.lower() + sfx, a)
    if tag in ("POLYGON", "TRIANGLE"):
        rings = _scan_ring_list(sc)
        sfx, w = _dim_suffix(dim, rings[0].shape[1])
        return (tag.lower() + sfx, rings)
    if tag == "MULTIPOINT":
        # both forms: (1 2, 3 4) and ((1 2), (3 4))
        sc.expect("(")
        pts = []
        while True:
            if sc.peek() == "(":
                inner = _scan_coords(sc)
                pts.extend(inner.tolist())
            else:
                row = [sc.number()]
                while sc.peek() not in ",)":
                    row.append(sc.number())
                pts.append(row)
            if sc.peek() == ")":
                sc.expect(")")
                break
            sc.expect(",")
        a = np.asarray(pts, np.float64)
        sfx, _ = _dim_suffix(dim, a.shape[1])
        return ("multipoint" + sfx, a)
    if tag == "MULTILINESTRING":
        lines = _scan_ring_list(sc)
        sfx, _ = _dim_suffix(dim, lines[0].shape[1])
        return ("multilinestring" + sfx, lines)
    if tag in ("MULTIPOLYGON", "POLYHEDRALSURFACE", "TIN"):
        sc.expect("(")
        polys = []
        while True:
            polys.append(_scan_ring_list(sc))
            if sc.peek() == ")":
                sc.expect(")")
                break
            sc.expect(",")
        sfx, _ = _dim_suffix(dim, polys[0][0].shape[1])
        return (tag.lower() + sfx, polys)
    if tag in ("COMPOUNDCURVE", "CURVEPOLYGON"):
        # members: a bare paren group is a LineString segment/ring; a
        # tagged member (CIRCULARSTRING / COMPOUNDCURVE) parses fully
        sc.expect("(")
        members = []
        while True:
            if sc.peek() == "(":
                members.append(("linestring", _scan_coords(sc)))
            else:
                members.append(_parse(sc))
            if sc.peek() == ")":
                sc.expect(")")
                break
            sc.expect(",")
    # validate member kinds per the WKB layer's rules
        allowed = (("linestring", "circularstring")
                   if tag == "COMPOUNDCURVE"
                   else ("linestring", "circularstring", "compoundcurve"))
        for mk, _ in members:
            if mk not in allowed:
                raise ValueError(f"{tag}: member {mk!r} not allowed")
        return (tag.lower(), members)
    if tag == "GEOMETRYCOLLECTION":
        sc.expect("(")
        members = []
        while True:
            members.append(_parse(sc))
            if sc.peek() == ")":
                sc.expect(")")
                break
            sc.expect(",")
        return ("geometrycollection", members)
    raise ValueError(f"WKT: unknown geometry tag {tag!r}")


def wkt_to_wkb(s: str) -> bytes:
    """WKT -> WKB for the 2-D simple-feature family."""
    return G.wkb_of(parse_wkt(s))


def wkb_to_wkt(wkb: bytes) -> str:
    return to_wkt(G.parse_wkb(wkb))
