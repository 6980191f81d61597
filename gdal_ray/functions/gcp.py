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


class GCPTransformer:
    """Bidirectional GCP transformer: forward = pixel -> geo, inverse =
    geo -> pixel, each its own least-squares fit (the gdal_crs.c
    two-way CRS_compute_georef_equations discipline)."""

    def __init__(self, pixels, geos, order: int = 1):
        self.fwd = PolyTransform2D(pixels, geos, order)
        self.inv = PolyTransform2D(geos, pixels, order)
