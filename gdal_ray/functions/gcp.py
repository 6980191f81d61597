"""GCP polynomial transformer (order 1/2/3 least-squares fit).

Reference analog: GDALCreateGCPTransformer / CRS_georef in
alg/gdal_crs.cpp (orders 1-3 polynomial fit over ground control
points) feeding GDALCreateGenImgProjTransformer
(alg/gdaltransformer.cpp:2187); the canonical user path is
``gdalwarp -order n`` on a GCP-tagged source (e.g. the UTM fixtures of
autotest/benchmark/test_gdalwarp.py).

Reproducibility discipline (the engine<->oracle contract):
- inputs are min/max-midpoint normalized (exact arithmetic on the
  GCP extremes, no data-dependent means),
- the fitted coefficients are quantized to multiples of 2^-16
  (floor(c * 65536 + 0.5) / 65536), so any least-squares solver that
  agrees within ~1e-6 absolute yields the IDENTICAL transform,
- evaluation is a fixed-order chained sum (c0 + c1*u + c2*v + ...),
  elementwise IEEE-deterministic.
"""

from __future__ import annotations

import numpy as np

_N_TERMS = {1: 3, 2: 6, 3: 10}


def poly_basis(u: np.ndarray, v: np.ndarray, order: int) -> list[np.ndarray]:
    """Monomial basis in gdal_crs.c order: 1, u, v, u^2, u*v, v^2,
    u^3, u^2*v, u*v^2, v^3 (truncated to the order)."""
    one = np.ones_like(u)
    terms = [one, u, v]
    if order >= 2:
        terms += [u * u, u * v, v * v]
    if order >= 3:
        terms += [u * u * u, u * u * v, u * v * v, v * v * v]
    return terms[: _N_TERMS[order]]


def _norm_params(a: np.ndarray):
    lo, hi = float(np.min(a)), float(np.max(a))
    mid = (lo + hi) * 0.5
    half = (hi - lo) * 0.5
    if half == 0.0:
        half = 1.0
    return mid, half


def quantize16(c: np.ndarray) -> np.ndarray:
    return np.floor(c * 65536.0 + 0.5) / 65536.0


class PolyTransform2D:
    """One direction of a GCP polynomial transform: (x, y) -> (X, Y)."""

    def __init__(self, src_xy, dst_xy, order: int = 1):
        sx = np.asarray([p[0] for p in src_xy], np.float64)
        sy = np.asarray([p[1] for p in src_xy], np.float64)
        dx = np.asarray([p[0] for p in dst_xy], np.float64)
        dy = np.asarray([p[1] for p in dst_xy], np.float64)
        n_terms = _N_TERMS[order]
        if len(sx) < n_terms:
            raise ValueError(
                f"order-{order} fit needs >= {n_terms} GCPs, got {len(sx)}"
            )
        self.order = order
        self.sxm, self.sxh = _norm_params(sx)
        self.sym, self.syh = _norm_params(sy)
        self.dxm, self.dxh = _norm_params(dx)
        self.dym, self.dyh = _norm_params(dy)
        u = (sx - self.sxm) / self.sxh
        v = (sy - self.sym) / self.syh
        B = np.column_stack(poly_basis(u, v, order))
        tu = (dx - self.dxm) / self.dxh
        tv = (dy - self.dym) / self.dyh
        cx, *_ = np.linalg.lstsq(B, tu, rcond=None)
        cy, *_ = np.linalg.lstsq(B, tv, rcond=None)
        self.cx = quantize16(cx)
        self.cy = quantize16(cy)

    def _eval(self, coef: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
        acc = np.full_like(u, coef[0])
        for c, term in zip(coef[1:], poly_basis(u, v, self.order)[1:]):
            acc = acc + c * term  # fixed-order chained sum (deterministic)
        return acc

    def __call__(self, x: np.ndarray, y: np.ndarray):
        u = (np.asarray(x, np.float64) - self.sxm) / self.sxh
        v = (np.asarray(y, np.float64) - self.sym) / self.syh
        X = self._eval(self.cx, u, v) * self.dxh + self.dxm
        Y = self._eval(self.cy, u, v) * self.dyh + self.dym
        return X, Y


def auto_order(n_gcps: int) -> int:
    """Reference auto-selection (``gdalwarp -order 0`` /
    ``nReqOrder == 0``, alg/gdal_crs.cpp:202-210): order 2 from 6 GCPs
    up, else 1 — third order is never chosen automatically ("for now we
    avoid 3rd order since it is unstable")."""
    return 2 if n_gcps >= 6 else 1


_FLT_EPS = 1.19209290e-07  # FLT_EPSILON, the reference's zero clamp


class GCPTransformer:
    """Bidirectional GCP transformer: forward = pixel -> geo, inverse =
    geo -> pixel, each its own least-squares fit (the gdal_crs.c
    two-way CRS_compute_georef_equations discipline).

    ``order=0`` auto-selects like the reference (:func:`auto_order`).
    Two GCPs forming opposite rectangle corners synthesize a third
    (alg/gdal_crs.cpp:223-237).  ``refine=True`` iteratively drops the
    worst forward-residual GCP above ``tolerance`` (geo units) until
    none remains or ``minimum_gcps`` would be violated — the
    remove_outliers/worst_outlier loop of alg/gdal_crs.cpp (first
    maximum wins ties; residuals under FLT_EPSILON clamp to zero).
    ``n_dropped`` / ``n_used`` report the outcome (no silent drops)."""

    def __init__(self, pixels, geos, order: int = 1, refine: bool = False,
                 tolerance: float = 0.0, minimum_gcps: int | None = None):
        pixels = [tuple(map(float, p)) for p in pixels]
        geos = [tuple(map(float, g)) for g in geos]
        if order == 0:
            order = auto_order(len(pixels))
        if len(pixels) == 2 and order == 1:
            if geos[0][0] != geos[1][0] and geos[0][1] != geos[1][1]:
                # opposite rectangle corners -> synthesize the third
                geos.append((geos[1][0], geos[0][1]))
                pixels.append((pixels[1][0], pixels[0][1]))
            else:
                # 2 GCPs sharing a geo X or Y: the reference reports the
                # unsolvable-transform condition explicitly (gdal_crs.cpp
                # MUNSOLVABLE) rather than a generic fit-arity error
                raise ValueError(
                    "2 GCPs sharing a geo X or Y cannot define an "
                    "order-1 transform (unsolvable; reference "
                    "gdal_crs.cpp MUNSOLVABLE)"
                )
        self.order = order
        self.n_dropped = 0
        if refine:
            if minimum_gcps is None:
                minimum_gcps = _N_TERMS[order] + 1
            pixels, geos = self._remove_outliers(
                pixels, geos, order, tolerance, minimum_gcps
            )
        self.n_used = len(pixels)
        self.fwd = PolyTransform2D(pixels, geos, order)
        self.inv = PolyTransform2D(geos, pixels, order)

    def _remove_outliers(self, pixels, geos, order, tolerance, minimum_gcps):
        while True:
            fwd = PolyTransform2D(pixels, geos, order)
            px = np.asarray([p[0] for p in pixels])
            py = np.asarray([p[1] for p in pixels])
            gx, gy = fwd(px, py)
            res = np.hypot(
                gx - np.asarray([g[0] for g in geos]),
                gy - np.asarray([g[1] for g in geos]),
            )
            res[res < _FLT_EPS] = 0.0
            if len(pixels) <= minimum_gcps:
                return pixels, geos
            # first strict maximum at or above tolerance (reference scan)
            worst, diff = -1, -1.0
            for i, r in enumerate(res):
                if r > diff and r >= tolerance:
                    worst, diff = i, r
            if worst == -1:
                return pixels, geos
            pixels = pixels[:worst] + pixels[worst + 1:]
            geos = geos[:worst] + geos[worst + 1:]
            self.n_dropped += 1
