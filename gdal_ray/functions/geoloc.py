"""Geolocation-array transformer (gdalwarp GEOLOCATION analog).

Reference: alg/gdalgeoloc.cpp — GDALCreateGeoLocTransformer over
subsampled per-pixel geolocation arrays:

- index mapping: g_pixel = (pixel - PIXEL_OFFSET) / PIXEL_STEP (:616,
  top-left-corner georef convention, offset 0);
- forward (pixel,line) -> (X,Y): clamp the fractional index to
  [0, n-1], step one cell back on the right/bottom edge (the no-nodata
  collapse of the two retry branches :455-470), then the EXACT nested
  bilinear expression of PixelLineToXY (:436-452):
  X = (1-fy)*(x00 + fx*(x10-x00)) + fy*(x01 + fx*(x11-x01)).

Inverse: GDAL builds an oversampled scatter "backmap" with
hole-filling (GDALGeoLoc::GenerateBackMap) — an approximation.  This
engine instead runs a masked NEWTON iteration on the exact bilinear
patch (analytic 2x2 Jacobian, affine seed from the grid corners,
break-before-update at 2^-16 geo units, max 12 iterations), which is
strictly more accurate than the backmap; the golden shares this
documented iteration contract (same elementwise expression sequence
=> identical doubles), so parity is bit-exact.
"""

from __future__ import annotations

import numpy as np


class GeolocTransformer:
    """glx/gly: (nr, nc) geolocation arrays; pixel = c*pixel_step +
    pixel_offset, line likewise (corner convention)."""

    def __init__(self, glx: np.ndarray, gly: np.ndarray,
                 pixel_offset: float = 0.0, pixel_step: float = 4.0,
                 line_offset: float = 0.0, line_step: float = 4.0):
        self.glx = np.asarray(glx, np.float64)
        self.gly = np.asarray(gly, np.float64)
        self.nr, self.nc = self.glx.shape
        self.po, self.ps = float(pixel_offset), float(pixel_step)
        self.lo, self.ls = float(line_offset), float(line_step)
        # affine seed geo -> array coords from the grid corner span
        x00, y00 = self.glx[0, 0], self.gly[0, 0]
        gt = [0.0] * 6
        gt[0], gt[3] = x00, y00
        gt[1] = (self.glx[0, self.nc - 1] - x00) / (self.nc - 1)
        gt[4] = (self.gly[0, self.nc - 1] - y00) / (self.nc - 1)
        gt[2] = (self.glx[self.nr - 1, 0] - x00) / (self.nr - 1)
        gt[5] = (self.gly[self.nr - 1, 0] - y00) / (self.nr - 1)
        det = gt[1] * gt[5] - gt[2] * gt[4]
        iv = 1.0 / det
        self.inv_gt = [
            (gt[2] * gt[3] - gt[0] * gt[5]) * iv, gt[5] * iv, -gt[2] * iv,
            (-gt[1] * gt[3] + gt[0] * gt[4]) * iv, -gt[4] * iv, gt[1] * iv,
        ]

    # ------------------------------------------------------------ forward

    def _cell(self, gp, gl):
        """Clamped integer cell + fractional offsets (PixelLineToXY
        index rules; right/bottom edge steps one cell back)."""
        gp = np.minimum(np.maximum(0.0, gp), float(self.nc - 1))
        gl = np.minimum(np.maximum(0.0, gl), float(self.nr - 1))
        iX = gp.astype(np.int64)
        iY = gl.astype(np.int64)
        iX = np.minimum(iX, self.nc - 2)
        iY = np.minimum(iY, self.nr - 2)
        return iX, iY, gp, gl

    def _interp(self, iX, iY, gp, gl):
        fx = gp - iX
        fy = gl - iY
        x00 = self.glx[iY, iX]
        x10 = self.glx[iY, iX + 1]
        x01 = self.glx[iY + 1, iX]
        x11 = self.glx[iY + 1, iX + 1]
        y00 = self.gly[iY, iX]
        y10 = self.gly[iY, iX + 1]
        y01 = self.gly[iY + 1, iX]
        y11 = self.gly[iY + 1, iX + 1]
        X = (1 - fy) * (x00 + fx * (x10 - x00)) + fy * (
            x01 + fx * (x11 - x01))
        Y = (1 - fy) * (y00 + fx * (y10 - y00)) + fy * (
            y01 + fx * (y11 - y01))
        return X, Y

    def forward(self, pixel, line):
        """(pixel, line) -> (X, Y)."""
        gp = (np.asarray(pixel, np.float64) - self.po) / self.ps
        gl = (np.asarray(line, np.float64) - self.lo) / self.ls
        iX, iY, gp, gl = self._cell(gp, gl)
        return self._interp(iX, iY, gp, gl)

    # ------------------------------------------------------------ inverse

    THRESH = 2.0 ** -16
    MAX_ITER = 12

    def inverse(self, x, y):
        """(X, Y) -> (pixel, line): masked Newton on the bilinear
        patch, break-before-update under the 2^-16 geo-unit residual."""
        shape = np.asarray(x).shape
        x = np.asarray(x, np.float64).reshape(-1)
        y = np.asarray(y, np.float64).reshape(-1)
        g = self.inv_gt
        U = g[0] + g[1] * x + g[2] * y   # array col coord
        V = g[3] + g[4] * x + g[5] * y   # array row coord
        active = np.ones(U.shape, bool)
        for _ in range(self.MAX_ITER):
            if not active.any():
                break
            iX, iY, gp, gl = self._cell(U[active], V[active])
            fx = gp - iX
            fy = gl - iY
            x00 = self.glx[iY, iX]
            x10 = self.glx[iY, iX + 1]
            x01 = self.glx[iY + 1, iX]
            x11 = self.glx[iY + 1, iX + 1]
            y00 = self.gly[iY, iX]
            y10 = self.gly[iY, iX + 1]
            y01 = self.gly[iY + 1, iX]
            y11 = self.gly[iY + 1, iX + 1]
            FX = (1 - fy) * (x00 + fx * (x10 - x00)) + fy * (
                x01 + fx * (x11 - x01)) - x[active]
            FY = (1 - fy) * (y00 + fx * (y10 - y00)) + fy * (
                y01 + fx * (y11 - y01)) - y[active]
            err = np.maximum(np.abs(FX), np.abs(FY))
            conv = err < self.THRESH
            idx = np.flatnonzero(active)
            active[idx[conv]] = False
            live = ~conv
            # analytic patch Jacobian
            ju_x = (1 - fy) * (x10 - x00) + fy * (x11 - x01)
            jv_x = (x01 + fx * (x11 - x01)) - (x00 + fx * (x10 - x00))
            ju_y = (1 - fy) * (y10 - y00) + fy * (y11 - y01)
            jv_y = (y01 + fx * (y11 - y01)) - (y00 + fx * (y10 - y00))
            det = ju_x * jv_y - jv_x * ju_y
            du = (FX * jv_y - FY * jv_x) / det
            dv = (FY * ju_x - FX * ju_y) / det
            upd = idx[live]
            U[upd] = U[upd] - du[live]
            V[upd] = V[upd] - dv[live]
        pixel = (U * self.ps + self.po).reshape(shape)
        line = (V * self.ls + self.lo).reshape(shape)
        return pixel, line


# ------------------------------------------------------- fixture synthesis


def synth_geoloc(i: int, w: int, h: int, minx: float, miny: float,
                 maxx: float, maxy: float):
    """Deterministic per-chip geolocation arrays at subsample step 4
    (FIXTURE — mirrored by the rasterref golden): the chip's affine
    georeferencing plus a dyadic parabolic bend, monotone by
    construction (bend slope << 4 px/step)."""
    gsd = (maxx - minx) / w
    gsdy = (maxy - miny) / h
    nc = w // 4 + 1
    nr = h // 4 + 1
    ax = ((i * 3) % 8) / 32.0
    bx = ((i * 5) % 8) / 64.0
    ay = ((i * 7) % 8) / 32.0
    by = ((i * 11) % 8) / 64.0
    c = np.arange(nc, dtype=np.float64)[None, :]
    r = np.arange(nr, dtype=np.float64)[:, None]
    bend_c = c * (nc - 1 - c) / 64.0
    bend_r = r * (nr - 1 - r) / 64.0
    glx = minx + gsd * (4.0 * c + ax * bend_c + bx * bend_r)
    gly = maxy - gsdy * (4.0 * r + ay * bend_r + by * bend_c)
    return np.broadcast_to(glx, (nr, nc)).copy(), np.broadcast_to(
        gly, (nr, nc)).copy()
