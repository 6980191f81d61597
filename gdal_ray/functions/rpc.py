"""RPC (rational polynomial coefficients) transformer.

Reference analog: GDALCreateRPCTransformer (alg/gdal_rpc.cpp), the
``gdalwarp -rpc`` path, no-DEM configuration:

- 20-term cubic polynomial basis in normalized (long, lat, height),
  exact term order of RPCComputeTerms (alg/gdal_rpc.cpp:193-219);
- forward geo->image: pixel = SAMP_NUM/SAMP_DEN * SAMP_SCALE +
  SAMP_OFF (RPCTransformPoint :358), line likewise with LINE_*;
- inverse image->geo: affine initial guess from a geotransform
  established by 1e-4-degree forward differences at the reference
  point (GDALCreateRPCTransformerV2 :1060-1085, GDALInvGeoTransform),
  then fixed-point iteration ``X -= dx*gt[1] + dy*gt[2]; Y -= dx*gt[4]
  + dy*gt[5]`` with break-BEFORE-update once max(|dx|,|dy|) <
  pix_err_threshold, at most 10 iterations (RPCInverseTransformPoint
  :1128-1360, no-DEM branches only — no oscillation damping or boost,
  those require a DEM).

Reproducibility discipline: there is no solve to quantize here, so the
bit-for-bit contract is the EXPRESSION SEQUENCE itself — the engine
vectorizes across pixels but accumulates the 20 terms SEQUENTIALLY
(k = 0..19) with elementwise IEEE ops, so a scalar loop evaluating the
same sequence produces identical doubles.  Fixture coefficients and
offsets/scales are dyadic with power-of-two scales, keeping the
normalization exact.
"""

from __future__ import annotations

import numpy as np


def rpc_terms(L, P, H):
    """The 20 basis terms of RPCComputeTerms (alg/gdal_rpc.cpp:193),
    exact order.  L = normalized long, P = normalized lat, H =
    normalized height (arrays ok)."""
    one = np.ones_like(L)
    return [
        one, L, P, H,
        L * P, L * H, P * H, L * L, P * P, H * H,
        L * P * H, L * L * L, L * P * P, L * H * H, L * L * P,
        P * P * P, P * H * H, L * L * H, P * P * H, H * H * H,
    ]


def _poly(coef: np.ndarray, terms) -> np.ndarray:
    """Sequential 20-term accumulation: acc = c0*t0; acc += ck*tk for
    k=1..19 (elementwise — a scalar loop in the same order is
    bit-identical)."""
    acc = coef[0] * terms[0]
    for k in range(1, 20):
        acc = acc + coef[k] * terms[k]
    return acc


class RPCModel:
    """One RPC model (RPC00B layout) + derived inverse geotransform."""

    def __init__(self, *, line_num, line_den, samp_num, samp_den,
                 long_off, long_scale, lat_off, lat_scale,
                 height_off, height_scale,
                 samp_off, samp_scale, line_off, line_scale,
                 pix_err_threshold: float = 0.1, max_iterations: int = 10):
        self.line_num = np.asarray(line_num, np.float64)
        self.line_den = np.asarray(line_den, np.float64)
        self.samp_num = np.asarray(samp_num, np.float64)
        self.samp_den = np.asarray(samp_den, np.float64)
        self.long_off = float(long_off)
        self.long_scale = float(long_scale)
        self.lat_off = float(lat_off)
        self.lat_scale = float(lat_scale)
        self.height_off = float(height_off)
        self.height_scale = float(height_scale)
        self.samp_off = float(samp_off)
        self.samp_scale = float(samp_scale)
        self.line_off = float(line_off)
        self.line_scale = float(line_scale)
        self.thresh = float(pix_err_threshold)
        self.max_iter = int(max_iterations)
        self._setup_inverse_gt()

    # ------------------------------------------------------------ forward

    def forward(self, lon, lat, h=0.0):
        """(long, lat, height) -> (pixel, line), RPCTransformPoint.
        The dateline branch is omitted (fixture |diff| << 270)."""
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        hh = np.broadcast_to(np.asarray(h, np.float64), lon.shape)
        L = (lon - self.long_off) / self.long_scale
        P = (lat - self.lat_off) / self.lat_scale
        H = (hh - self.height_off) / self.height_scale
        t = rpc_terms(L, P, H)
        pixel = (_poly(self.samp_num, t) / _poly(self.samp_den, t)
                 ) * self.samp_scale + self.samp_off
        line = (_poly(self.line_num, t) / _poly(self.line_den, t)
                ) * self.line_scale + self.line_off
        return pixel, line

    # ------------------------------------------------- inverse geotransform

    def _setup_inverse_gt(self):
        """Affine LL->PL from 1e-4 forward differences at the reference
        point (gdal_rpc.cpp:1060-1085), inverted with the
        GDALInvGeoTransform formula."""
        ref_long, ref_lat = self.long_off, self.lat_off
        ref_px, ref_ln = self.forward(np.float64(ref_long),
                                      np.float64(ref_lat), 0.0)
        ref_px, ref_ln = float(ref_px), float(ref_ln)
        d = 0.0001
        px1, ln1 = self.forward(np.float64(ref_long + d),
                                np.float64(ref_lat), 0.0)
        px2, ln2 = self.forward(np.float64(ref_long),
                                np.float64(ref_lat + d), 0.0)
        gt = [0.0] * 6
        gt[1] = (float(px1) - ref_px) / d
        gt[4] = (float(ln1) - ref_ln) / d
        gt[2] = (float(px2) - ref_px) / d
        gt[5] = (float(ln2) - ref_ln) / d
        gt[0] = ref_px - gt[1] * ref_long - gt[2] * ref_lat
        gt[3] = ref_ln - gt[4] * ref_long - gt[5] * ref_lat
        # GDALInvGeoTransform (gcore/gdal_misc.cpp): 2x3 inversion
        det = gt[1] * gt[5] - gt[2] * gt[4]
        inv_det = 1.0 / det
        inv = [0.0] * 6
        inv[1] = gt[5] * inv_det
        inv[4] = -gt[4] * inv_det
        inv[2] = -gt[2] * inv_det
        inv[5] = gt[1] * inv_det
        inv[0] = (gt[2] * gt[3] - gt[0] * gt[5]) * inv_det
        inv[3] = (-gt[1] * gt[3] + gt[0] * gt[4]) * inv_det
        self.pl_to_ll = inv

    # ------------------------------------------------------------ inverse

    def inverse(self, pixel, line, h=0.0):
        """(pixel, line) -> (long, lat): masked fixed-point iteration
        mirroring RPCInverseTransformPoint's no-DEM path per element.
        Returns (lon, lat, ok)."""
        shape = np.asarray(pixel).shape
        pixel = np.asarray(pixel, np.float64).reshape(-1)
        line = np.asarray(line, np.float64).reshape(-1)
        gt = self.pl_to_ll
        X = gt[0] + gt[1] * pixel + gt[2] * line
        Y = gt[3] + gt[4] * pixel + gt[5] * line
        ok = np.zeros(X.shape, bool)
        active = np.ones(X.shape, bool)
        for _ in range(self.max_iter):
            if not active.any():
                break
            bp, bl = self.forward(X[active], Y[active], h)
            dx = bp - pixel[active]
            dy = bl - line[active]
            err = np.maximum(np.abs(dx), np.abs(dy))
            conv = err < self.thresh
            # converged lanes keep their PRE-update value (GDAL breaks
            # before applying the update)
            idx = np.flatnonzero(active)
            ok[idx[conv]] = True
            active[idx[conv]] = False
            upd = idx[~conv]
            X[upd] = X[upd] - (dx[~conv] * gt[1]) - (dy[~conv] * gt[2])
            Y[upd] = Y[upd] - (dx[~conv] * gt[4]) - (dy[~conv] * gt[5])
        return X.reshape(shape), Y.reshape(shape), ok.reshape(shape)


# ------------------------------------------------------- fixture synthesis


def synth_rpc(i: int, w: int, h: int) -> dict:
    """Deterministic per-chip RPC spec (FIXTURE — mirrored verbatim by
    the rasterref golden, like the q57 _ngon formula): a mild cubic
    distortion over a pseudo-degree footprint.  All coefficients are
    dyadic, scales are powers of two, so normalization and term
    products round identically everywhere."""
    lon0 = ((i * 5) % 64 - 32) / 256.0          # dyadic center
    lat0 = ((i * 11) % 64 - 32) / 256.0
    a = ((i * 7) % 16) / 1024.0                  # cross-term strength
    b = ((i * 13) % 16) / 2048.0                 # quadratic
    c = ((i * 3) % 8) / 4096.0                   # cubic
    d = ((i * 17) % 8) / 8192.0                  # denominator tilt
    samp_num = np.zeros(20)
    samp_num[1] = 1.0          # + L
    samp_num[4] = a            # + a*L*P
    samp_num[8] = b            # + b*P^2
    samp_num[11] = c           # + c*L^3
    samp_den = np.zeros(20)
    samp_den[0] = 1.0
    samp_den[2] = d            # 1 + d*P
    line_num = np.zeros(20)
    line_num[2] = 1.0          # + P
    line_num[4] = -a           # - a*L*P
    line_num[7] = b            # + b*L^2
    line_num[15] = c           # + c*P^3
    line_den = np.zeros(20)
    line_den[0] = 1.0
    line_den[1] = d            # 1 + d*L
    return dict(
        line_num=line_num, line_den=line_den,
        samp_num=samp_num, samp_den=samp_den,
        long_off=lon0, long_scale=1.0 / 16.0,
        lat_off=lat0, lat_scale=1.0 / 16.0,
        height_off=0.0, height_scale=1.0,
        samp_off=w / 2.0, samp_scale=w / 2.0,
        line_off=h / 2.0, line_scale=h / 2.0,
    )


# ------------------------------------------------------------- DEM-backed


class DEMGrid:
    """Elevation grid for the DEM-backed RPC path (the psTransform->poDS
    lookup of alg/gdal_rpc.cpp): values on a regular (lat, lon) grid,
    bilinear interpolation (the default RPC_DEMINTERPOLATION), edge
    clamp."""

    def __init__(self, values: np.ndarray, lon0: float, lat0: float,
                 step: float):
        self.v = np.asarray(values, np.float64)  # (nr, nc), row = lat idx
        self.lon0 = float(lon0)
        self.lat0 = float(lat0)
        self.step = float(step)

    def lookup(self, lon, lat):
        gx = (np.asarray(lon, np.float64) - self.lon0) / self.step
        gy = (np.asarray(lat, np.float64) - self.lat0) / self.step
        nr, nc = self.v.shape
        gx = np.minimum(np.maximum(0.0, gx), float(nc - 1))
        gy = np.minimum(np.maximum(0.0, gy), float(nr - 1))
        ix = np.minimum(gx.astype(np.int64), nc - 2)
        iy = np.minimum(gy.astype(np.int64), nr - 2)
        fx = gx - ix
        fy = gy - iy
        v = self.v
        return (1 - fy) * (v[iy, ix] + fx * (v[iy, ix + 1] - v[iy, ix])) \
            + fy * (v[iy + 1, ix] + fx * (v[iy + 1, ix + 1] - v[iy + 1, ix]))


def rpc_forward_dem(model: RPCModel, dem: DEMGrid, lon, lat, user_h=0.0):
    """Forward with per-point DEM height (GDALRPCTransform forward
    path: height = user height + DEM at the input long/lat)."""
    h = user_h + dem.lookup(lon, lat)
    return model.forward(lon, lat, h)


def rpc_inverse_dem(model: RPCModel, dem: DEMGrid, pixel, line,
                    user_h=0.0, max_iterations: int = 20):
    """DEM-backed iterative inverse: the FULL RPCInverseTransformPoint
    state machine (alg/gdal_rpc.cpp:1128-1360) vectorized with
    per-lane state — DEM height refreshed at each guess, oscillation
    damping (mean of the two previous guesses when BOTH pixel deltas
    change sign), boost factor 10 after 5 consecutive sub-2-px errors,
    max 20 iterations.  Per-element expression order mirrors the
    scalar reference loop exactly."""
    shape = np.asarray(pixel).shape
    pixel = np.asarray(pixel, np.float64).reshape(-1)
    line = np.asarray(line, np.float64).reshape(-1)
    gt = model.pl_to_ll
    X = gt[0] + gt[1] * pixel + gt[2] * line
    Y = gt[3] + gt[4] * pixel + gt[5] * line
    n = X.size
    ok = np.zeros(n, bool)
    active = np.ones(n, bool)
    last_dx = np.zeros(n)
    last_dy = np.zeros(n)
    last_X = np.zeros(n)
    last_Y = np.zeros(n)
    last_valid = np.zeros(n, bool)
    cnt_below2 = np.zeros(n, np.int64)
    for _ in range(max_iterations):
        if not active.any():
            break
        idx = np.flatnonzero(active)
        demh = dem.lookup(X[idx], Y[idx])
        bp, bl = model.forward(X[idx], Y[idx], user_h + demh)
        dx = bp - pixel[idx]
        dy = bl - line[idx]
        err = np.maximum(np.abs(dx), np.abs(dy))
        conv = err < model.thresh
        ok[idx[conv]] = True
        active[idx[conv]] = False
        live = ~conv
        li = idx[live]
        dxl, dyl, errl = dx[live], dy[live], err[live]
        # oscillation: both deltas changed sign vs the previous iter
        osc = (last_valid[li]
               & (dxl * last_dx[li] < 0) & (dyl * last_dy[li] < 0))
        oi = li[osc]
        if oi.size:
            adx, aldx = np.abs(dxl[osc]), np.abs(last_dx[oi])
            ady, aldy = np.abs(dyl[osc]), np.abs(last_dy[oi])
            X[oi] = (adx * last_X[oi] + aldx * X[oi]) / (adx + aldx)
            Y[oi] = (ady * last_Y[oi] + aldy * Y[oi]) / (ady + aldy)
            last_valid[oi] = False
            cnt_below2[oi] = 0
        reg = li[~osc]
        if reg.size:
            dxr, dyr, errr = dxl[~osc], dyl[~osc], errl[~osc]
            boost = np.where((cnt_below2[reg] >= 5) & (errr < 2), 10.0, 1.0)
            cnt_below2[reg] = np.where(errr < 2, cnt_below2[reg] + 1, 0)
            newX = X[reg] - (dxr * gt[1] * boost) - (dyr * gt[2] * boost)
            newY = Y[reg] - (dxr * gt[4] * boost) - (dyr * gt[5] * boost)
            last_X[reg] = X[reg]
            last_Y[reg] = Y[reg]
            X[reg] = newX
            Y[reg] = newY
            last_dx[reg] = dxr
            last_dy[reg] = dyr
            last_valid[reg] = True
    return X.reshape(shape), Y.reshape(shape), ok.reshape(shape)


def synth_dem(i: int) -> DEMGrid:
    """Deterministic dyadic DEM over the synth_rpc footprint
    (FIXTURE — mirrored by the golden): a smooth parabola bump,
    17x17 grid at step 1/128 covering [lon0-1/16, lon0+1/16]^2."""
    lon0 = ((i * 5) % 64 - 32) / 256.0
    lat0 = ((i * 11) % 64 - 32) / 256.0
    amp = float(i % 8)
    r = np.arange(17, dtype=np.float64)[:, None]
    c = np.arange(17, dtype=np.float64)[None, :]
    v = amp * (r * (16.0 - r) + c * (16.0 - c)) / 8.0
    return DEMGrid(np.broadcast_to(v, (17, 17)).copy(),
                   lon0 - 1.0 / 16.0, lat0 - 1.0 / 16.0, 1.0 / 128.0)


def synth_rpc_dem(i: int, w: int, h: int) -> dict:
    """synth_rpc variant with height sensitivity (small dyadic H
    terms, height scale 128) for the DEM-backed q58 tag."""
    spec = synth_rpc(i, w, h)
    e = ((i * 9) % 8) / 512.0
    spec["samp_num"] = spec["samp_num"].copy()
    spec["line_num"] = spec["line_num"].copy()
    spec["samp_num"][3] = e       # + e*H
    spec["line_num"][3] = -e      # - e*H
    spec["height_off"] = 0.0
    spec["height_scale"] = 128.0
    return spec
