"""Curve geometry linearization (CircularString / CompoundCurve /
CurvePolygon -> simple features).

Reference semantics: OGRGeometryFactory::curveToLineString /
approximateArcAngles (ogr/ogrgeometryfactory.cpp:4278-4310): an arc is
subdivided at a maximum angular step (default 4 degrees,
OGR_ARC_STEPSIZE) into ``n = max(2, ceil(|sweep_deg| / step) + 1)``
points placed at uniform slices ``start + i * sweep/(n-1)``; curve
types are ogr/ogr_core.h:405-440.  The geomref golden restates the
same published discipline with the identical elementwise expression
sequence, so engine and golden produce identical doubles.

Each consecutive point triple (p0, p1, p2) of a CircularString is one
arc through the three points; collinear triples degenerate to the two
straight segments (the reference's fallback).  Full circles are
represented as 5-point CircularStrings (two half arcs) per the OGR
convention.
"""

from __future__ import annotations

import numpy as np


def arc_center(x0, y0, x1, y1, x2, y2):
    """Circumcenter of three points, or None when collinear (exact
    float determinant test; lattice fixture coordinates make it
    reliable)."""
    d = 2.0 * (x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1))
    if d == 0.0:
        return None
    ux = ((x0 * x0 + y0 * y0) * (y1 - y2)
          + (x1 * x1 + y1 * y1) * (y2 - y0)
          + (x2 * x2 + y2 * y2) * (y0 - y1)) / d
    uy = ((x0 * x0 + y0 * y0) * (x2 - x1)
          + (x1 * x1 + y1 * y1) * (x0 - x2)
          + (x2 * x2 + y2 * y2) * (x1 - x0)) / d
    return ux, uy


def linearize_arc3(p0, p1, p2, step_deg: float = 4.0) -> np.ndarray:
    """Linearize ONE arc through (p0, p1, p2) -> (n, 2) points
    INCLUDING both endpoints (exact input endpoints, interpolated
    interior) — the approximateArcAngles stepping discipline.
    Collinear triples return the 3 input points (straight fallback)."""
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    x2, y2 = float(p2[0]), float(p2[1])
    c = arc_center(x0, y0, x1, y1, x2, y2)
    if c is None:
        return np.array([[x0, y0], [x1, y1], [x2, y2]], np.float64)
    cx, cy = c
    r = np.hypot(x0 - cx, y0 - cy)
    a0 = np.arctan2(y0 - cy, x0 - cx)
    a1 = np.arctan2(y1 - cy, x1 - cx)
    a2 = np.arctan2(y2 - cy, x2 - cx)
    two_pi = 2.0 * np.pi
    s01 = (a1 - a0) % two_pi
    s02 = (a2 - a0) % two_pi
    # orientation: p1 must lie on the swept path from p0 to p2
    sweep = s02 if s01 <= s02 else s02 - two_pi
    n = max(2, int(np.ceil(abs(sweep) * 180.0 / np.pi / step_deg)) + 1)
    i = np.arange(n, dtype=np.float64)
    th = a0 + sweep * i / (n - 1)
    xs = cx + r * np.cos(th)
    ys = cy + r * np.sin(th)
    # exact endpoints (the interpolation is for the interior)
    xs[0], ys[0] = x0, y0
    xs[-1], ys[-1] = x2, y2
    return np.column_stack([xs, ys])


def linearize_circularstring(pts: np.ndarray,
                             step_deg: float = 4.0) -> np.ndarray:
    """CircularString points (odd count >= 3) -> LineString points;
    consecutive triples share endpoints (dropped on concat)."""
    pts = np.asarray(pts, np.float64)
    n = len(pts)
    if n < 3 or n % 2 == 0:
        raise ValueError(f"CircularString needs odd >= 3 points, got {n}")
    out = []
    for k in range(0, n - 2, 2):
        seg = linearize_arc3(pts[k], pts[k + 1], pts[k + 2], step_deg)
        out.append(seg if k == 0 else seg[1:])
    return np.vstack(out)


def linearize_curve(geom, step_deg: float = 4.0):
    """Linearize any parsed curve geometry (functions.geom.parse_wkb
    output) into its simple-feature form:
      circularstring / compoundcurve -> ("linestring", pts)
      curvepolygon -> ("polygon", [rings])
    Simple-feature inputs pass through unchanged."""
    kind, val = geom
    if kind == "circularstring":
        return ("linestring", linearize_circularstring(val, step_deg))
    if kind == "compoundcurve":
        parts = []
        for sub in val:
            skind, spts = sub
            pts = (linearize_circularstring(spts, step_deg)
                   if skind == "circularstring"
                   else np.asarray(spts, np.float64))
            parts.append(pts if not parts else pts[1:])
        return ("linestring", np.vstack(parts))
    if kind == "curvepolygon":
        rings = []
        for sub in val:
            lkind, pts = linearize_curve(sub, step_deg)
            rings.append(pts)
        return ("polygon", rings)
    return geom
