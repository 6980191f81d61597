"""Thin-plate-spline GCP transformer.

Reference analog: GDALCreateTPSTransformer (alg/gdal_tps.cpp) over
VizGeorefSpline2D (alg/thinplatespline.cpp): radial basis
``phi(d2) = d2 * log(d2)`` (squared-distance form,
thinplatespline.cpp:179-180) plus an affine part, one spline fitted
per direction (forward pixel->geo, inverse geo->pixel), the
``gdalwarp -tps`` path.

Reproducibility discipline (identical to functions/gcp.py):
- min/max-midpoint normalization of both coordinate spaces,
- solved coefficients quantized to multiples of 2^-16, so any solver
  agreeing within ~1e-6 produces the IDENTICAL transform,
- evaluation is a fixed-order chained sum over basis points,
  elementwise IEEE-deterministic.
"""

from __future__ import annotations

import numpy as np

from .gcp import _norm_params, quantize16


def tps_phi(d2: np.ndarray) -> np.ndarray:
    """phi(d2) = d2 * log(d2), phi(0) = 0 (thinplatespline.cpp:179)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(d2 > 0.0, d2 * np.log(np.maximum(d2, 1e-300)), 0.0)


def build_tps_system(u: np.ndarray, v: np.ndarray, t: np.ndarray):
    """(n+3)x(n+3) TPS interpolation system in normalized coords:
    [K  P] [w]   [t]
    [P' 0] [a] = [0],  K_ij = phi(|p_i - p_j|^2), P_i = (1, u_i, v_i).
    """
    n = len(u)
    A = np.zeros((n + 3, n + 3), np.float64)
    d2 = (u[:, None] - u[None, :]) ** 2 + (v[:, None] - v[None, :]) ** 2
    A[:n, :n] = tps_phi(d2)
    A[:n, n] = 1.0
    A[:n, n + 1] = u
    A[:n, n + 2] = v
    A[n, :n] = 1.0
    A[n + 1, :n] = u
    A[n + 2, :n] = v
    rhs = np.concatenate([t, np.zeros(3)])
    return A, rhs


class TPS2D:
    """One direction of a TPS transform: (x, y) -> (X, Y)."""

    def __init__(self, src_xy, dst_xy):
        sx = np.asarray([p[0] for p in src_xy], np.float64)
        sy = np.asarray([p[1] for p in src_xy], np.float64)
        dx = np.asarray([p[0] for p in dst_xy], np.float64)
        dy = np.asarray([p[1] for p in dst_xy], np.float64)
        if len(sx) < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        self.sxm, self.sxh = _norm_params(sx)
        self.sym, self.syh = _norm_params(sy)
        self.dxm, self.dxh = _norm_params(dx)
        self.dym, self.dyh = _norm_params(dy)
        self.u = (sx - self.sxm) / self.sxh
        self.v = (sy - self.sym) / self.syh
        tu = (dx - self.dxm) / self.dxh
        tv = (dy - self.dym) / self.dyh
        A, ru = build_tps_system(self.u, self.v, tu)
        _, rv = build_tps_system(self.u, self.v, tv)
        cx = np.linalg.solve(A, ru)
        cy = np.linalg.solve(A, rv)
        self.cx = quantize16(cx)
        self.cy = quantize16(cy)

    def _eval(self, coef: np.ndarray, u: np.ndarray, v: np.ndarray):
        n = len(self.u)
        acc = coef[n] + coef[n + 1] * u + coef[n + 2] * v
        for i in range(n):
            d2 = (u - self.u[i]) ** 2 + (v - self.v[i]) ** 2
            acc = acc + coef[i] * tps_phi(d2)
        return acc

    def __call__(self, x: np.ndarray, y: np.ndarray):
        u = (np.asarray(x, np.float64) - self.sxm) / self.sxh
        v = (np.asarray(y, np.float64) - self.sym) / self.syh
        X = self._eval(self.cx, u, v) * self.dxh + self.dxm
        Y = self._eval(self.cy, u, v) * self.dyh + self.dym
        return X, Y


class TPSTransformer:
    """Bidirectional TPS: forward = pixel -> geo, inverse = geo ->
    pixel, each its own spline fit (the gdal_tps.cpp two-spline
    discipline)."""

    def __init__(self, pixels, geos):
        self.fwd = TPS2D(pixels, geos)
        self.inv = TPS2D(geos, pixels)
