"""Warp / reprojection — the gdalwarp core as an actor-pool stage.

Reference semantics: per-destination-pixel inverse transform + kernel
sampling (alg/gdalwarpkernel.cpp GWKRun :447 and the weight functions
:3383-3560), output grid from the transformed source bbox
(GDALSuggestedWarpOutput2, alg/gdaltransformer.cpp:342), and the
approximate transformer contract — linearized transform with max error
0.125 px (alg/gdaltransformer.cpp:2571, default threshold
apps/gdalwarp_lib.cpp:1576).

Both supported CRS (EPSG:3857 <-> EPSG:4326) are axis-separable
(lon = f(x), lat = g(y), gdal2tiles.py:422-441 formulas), so each chip
warps as a separable resample: x is linear, y uses the exact (or
0.125-px approximated) inverse mapping per destination row.

The stage is a callable CLASS for ``map_batches(WarpChips, ...)``:
transformer state built once per actor (__init__), per-batch work in
__call__ (the per-thread transformer clone pattern of
alg/gdalwarpkernel.cpp GWKThreadsCreate :307-317).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs, kernels, mercator


class Transform3857To4326:
    """y-inverse mapping for 3857->4326 output grids."""

    name = "EPSG:3857->EPSG:4326"
    dst_srs = "EPSG:4326"

    def src_bbox_to_dst(self, minx, miny, maxx, maxy):
        lat0, lon0 = mercator.meters_to_lat_lon(minx, miny)
        lat1, lon1 = mercator.meters_to_lat_lon(maxx, maxy)
        return float(lon0), float(lat0), float(lon1), float(lat1)

    def dst_y_to_src_y(self, lats):
        _, my = mercator.lat_lon_to_meters(lats, np.zeros_like(lats))
        return my

    def dst_x_to_src_x(self, lons):
        mx, _ = mercator.lat_lon_to_meters(np.zeros_like(lons), lons)
        return mx

    def src_x_to_dst_x(self, xs):
        _, lon = mercator.meters_to_lat_lon(xs, np.zeros_like(xs))
        return lon

    def src_y_to_dst_y(self, ys):
        lat, _ = mercator.meters_to_lat_lon(np.zeros_like(ys), ys)
        return lat


class Transform4326To3857:
    name = "EPSG:4326->EPSG:3857"
    dst_srs = "EPSG:3857"

    def src_bbox_to_dst(self, minx, miny, maxx, maxy):
        # src is lon/lat; dst meters
        mx0, my0 = mercator.lat_lon_to_meters(miny, minx)
        mx1, my1 = mercator.lat_lon_to_meters(maxy, maxx)
        return float(mx0), float(my0), float(mx1), float(my1)

    def dst_y_to_src_y(self, ys):
        lat, _ = mercator.meters_to_lat_lon(np.zeros_like(ys), ys)
        return lat

    def dst_x_to_src_x(self, xs):
        _, lon = mercator.meters_to_lat_lon(xs, np.zeros_like(xs))
        return lon

    def src_x_to_dst_x(self, lons):
        mx, _ = mercator.lat_lon_to_meters(np.zeros_like(lons), lons)
        return mx

    def src_y_to_dst_y(self, lats):
        _, my = mercator.lat_lon_to_meters(lats, np.zeros_like(lats))
        return my


_TRANSFORMS = {
    ("EPSG:3857", "EPSG:4326"): Transform3857To4326,
    ("EPSG:4326", "EPSG:3857"): Transform4326To3857,
}


def approx_1d(exact_fn, coords: np.ndarray, threshold_px: float, px_size: float):
    """GDAL approx-transformer contract in 1-D: evaluate endpoints +
    midpoint; if linear interpolation is within ``threshold_px`` of the
    exact midpoint everywhere, interpolate; else subdivide (recursive,
    alg/gdaltransformer.cpp:2571 semantics).  ``coords`` must be sorted."""
    n = len(coords)
    out = np.empty(n, dtype=np.float64)

    def rec(lo: int, hi: int, flo: float, fhi: float):
        if hi - lo <= 1:
            out[lo] = flo
            out[hi] = fhi
            return
        mid = (lo + hi) // 2
        fmid = float(exact_fn(np.array([coords[mid]]))[0])
        # probe midpoint AND quarter point: a midpoint-only check wrongly
        # accepts odd functions over symmetric spans (flin(mid) == f(mid))
        quarter = (lo + mid) // 2
        span = coords[hi] - coords[lo]
        tol = 0.8 * threshold_px * px_size  # probe margin: non-probe points
        t_m = (coords[mid] - coords[lo]) / span  # may exceed probe error a bit
        ok = abs(flo + t_m * (fhi - flo) - fmid) <= tol
        if ok and quarter not in (lo, mid):
            fq = float(exact_fn(np.array([coords[quarter]]))[0])
            t_q = (coords[quarter] - coords[lo]) / span
            ok = abs(flo + t_q * (fhi - flo) - fq) <= tol
        if ok:
            # linear segment is accurate enough: interpolate the span
            seg = np.interp(coords[lo : hi + 1], [coords[lo], coords[hi]], [flo, fhi])
            out[lo : hi + 1] = seg
            out[mid] = fmid
        else:
            rec(lo, mid, flo, fmid)
            rec(mid, hi, fmid, fhi)

    if n == 1:
        out[0] = float(exact_fn(coords[:1])[0])
        return out
    rec(0, n - 1, float(exact_fn(coords[:1])[0]), float(exact_fn(coords[-1:])[0]))
    return out


class WarpChips:
    """Actor-pool stage: reproject every chip in a batch.

    Output rows keep the input schema; bytes re-encoded in the same
    fmt, envelope columns + srs updated to the destination CRS.  Dst
    grid keeps the source pixel count (w x h) over the transformed
    bbox (square-ish pixels, the SuggestedWarpOutput analog for
    axis-aligned chips).
    """

    def __init__(
        self,
        src_srs: str = "EPSG:3857",
        dst_srs: str = "EPSG:4326",
        resampling: str = "bilinear",
        error_threshold_px: float = 0.125,
        use_approx: bool = True,
    ):
        self.tr = _TRANSFORMS[(src_srs, dst_srs)]()
        self.resampling = resampling
        self.err = error_threshold_px
        self.use_approx = use_approx
        self.src_srs = src_srs
        self.dst_srs = dst_srs

    def _warp_one(self, img: np.ndarray, minx, miny, maxx, maxy):
        h, w = img.shape[:2]
        dminx, dminy, dmaxx, dmaxy = self.tr.src_bbox_to_dst(minx, miny, maxx, maxy)
        res_x = (maxx - minx) / w
        res_y = (maxy - miny) / h
        dres_x = (dmaxx - dminx) / w
        dres_y = (dmaxy - dminy) / h
        xs = dminx + (np.arange(w) + 0.5) * dres_x
        ys = dmaxy - (np.arange(h) + 0.5) * dres_y
        sx_m = self.tr.dst_x_to_src_x(xs)
        if self.use_approx:
            # ys is descending; approx_1d wants sorted input
            sy_m = approx_1d(
                lambda a: self.tr.dst_y_to_src_y(a), ys[::-1], self.err, res_y
            )[::-1]
        else:
            sy_m = self.tr.dst_y_to_src_y(ys)
        src_x = (sx_m - minx) / res_x - 0.5
        src_y = (maxy - sy_m) / res_y - 0.5
        out = kernels.resample_separable(img, src_x, src_y, self.resampling)
        return out, (dminx, dminy, dmaxx, dmaxy)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {
            c: batch.column(c).to_pylist()
            for c in ("bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy")
        }
        n = batch.num_rows
        new_bytes = []
        env = np.empty((n, 4), dtype=np.float64)
        for i in range(n):
            img = codecs.decode(
                cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i]
            )
            out, dst_env = self._warp_one(
                img, cols["minx"][i], cols["miny"][i], cols["maxx"][i], cols["maxy"][i]
            )
            new_bytes.append(codecs.encode(out, cols["fmt"][i]))
            env[i] = dst_env
        out_t = batch
        for name, arr in (
            ("bytes", pa.array(new_bytes, pa.binary())),
            ("minx", pa.array(env[:, 0])),
            ("miny", pa.array(env[:, 1])),
            ("maxx", pa.array(env[:, 2])),
            ("maxy", pa.array(env[:, 3])),
        ):
            out_t = out_t.set_column(out_t.schema.get_field_index(name), name, arr)
        if "srs" in out_t.schema.names:
            out_t = out_t.set_column(
                out_t.schema.get_field_index("srs"),
                "srs",
                pa.array([self.dst_srs] * n, pa.string()),
            )
        return out_t


def warp_images(
    images,
    src_srs: str = "EPSG:3857",
    dst_srs: str = "EPSG:4326",
    resampling: str = "bilinear",
    concurrency: int = 4,
    batch_size: int = 64,
    use_approx: bool = True,
):
    """Reproject an images Dataset (actor pool; transformer built once
    per actor).  ``use_approx=False`` evaluates the exact inverse
    transform per row (the -et 0 gdalwarp path)."""
    return images.map_batches(
        WarpChips,
        fn_constructor_kwargs=dict(
            src_srs=src_srs, dst_srs=dst_srs, resampling=resampling,
            use_approx=use_approx,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class WarpChipsGCP:
    """Actor-pool stage: warp each chip by its OWN ground-control-point
    set (per-row list columns gcp_p / gcp_l / gcp_x / gcp_y), the
    ``gdalwarp -order n`` path for arbitrary affine/polynomial
    georeferencing (UTM-like grids, sheared scans).

    Grid spec (mirrored by the rasterref oracle): dst bbox is the
    envelope of the forward-transformed pixel-space corners (0,0),
    (w,0), (w,h), (0,h); dst keeps w x h pixels; each dst pixel center
    maps through the fitted inverse polynomial to source pixel space
    (GDAL pixel-corner convention: center of pixel i is i+0.5) and
    samples with functions.kernels.resample_grid (nodata 0 outside)."""

    def __init__(self, order: int = 1, resampling: str = "bilinear",
                 refine: bool = False, tolerance: float = 0.0):
        self.order = order
        self.resampling = resampling
        self.refine = refine
        self.tolerance = tolerance

    def _warp_one(self, img, gp, gl, gx, gy, refine: bool | None = None,
                  tolerance: float | None = None):
        from ..functions.gcp import GCPTransformer

        h, w = img.shape[:2]
        tr = GCPTransformer(
            list(zip(gp, gl)), list(zip(gx, gy)), order=self.order,
            refine=self.refine if refine is None else refine,
            tolerance=self.tolerance if tolerance is None else tolerance,
        )
        cpx = np.array([0.0, float(w), float(w), 0.0])
        cpl = np.array([0.0, 0.0, float(h), float(h)])
        cx, cy = tr.fwd(cpx, cpl)
        minx, maxx = float(np.min(cx)), float(np.max(cx))
        miny, maxy = float(np.min(cy)), float(np.max(cy))
        X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
        Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
        XX, YY = np.meshgrid(X, Y)
        sp, sl = tr.inv(XX, YY)
        out = kernels.resample_grid(
            img, sp - 0.5, sl - 0.5, self.resampling, nodata=0
        )
        return out, (minx, miny, maxx, maxy)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {
            c: batch.column(c).to_pylist()
            for c in ("bytes", "w", "h", "fmt", "gcp_p", "gcp_l", "gcp_x", "gcp_y")
        }
        n = batch.num_rows
        new_bytes = []
        env = np.empty((n, 4), dtype=np.float64)
        for i in range(n):
            img = codecs.decode(
                cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i]
            )
            out, dst_env = self._warp_one(
                img, cols["gcp_p"][i], cols["gcp_l"][i],
                cols["gcp_x"][i], cols["gcp_y"][i],
            )
            new_bytes.append(codecs.encode(out, cols["fmt"][i]))
            env[i] = dst_env
        keep = [c for c in batch.schema.names
                if not c.startswith("gcp_")]
        out_t = batch.select(keep)
        for name, arr in (
            ("bytes", pa.array(new_bytes, pa.binary())),
            ("minx", pa.array(env[:, 0])),
            ("miny", pa.array(env[:, 1])),
            ("maxx", pa.array(env[:, 2])),
            ("maxy", pa.array(env[:, 3])),
        ):
            if name in out_t.schema.names:
                out_t = out_t.set_column(
                    out_t.schema.get_field_index(name), name, arr
                )
            else:
                out_t = out_t.append_column(name, arr)
        return out_t


def warp_images_gcp(images, order: int = 1, resampling: str = "bilinear",
                    concurrency: int = 4, batch_size: int = 64):
    """GCP-polynomial warp over an images Dataset carrying per-row GCP
    list columns (actor pool, fit + quantize per chip)."""
    return images.map_batches(
        WarpChipsGCP,
        fn_constructor_kwargs=dict(order=order, resampling=resampling),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def cutline_mask(poly_x: np.ndarray, poly_y: np.ndarray, X: np.ndarray,
                 Y: np.ndarray) -> np.ndarray:
    """Even-odd (parity) inside mask of a polygon evaluated at the dst
    pixel-center grid — the warp cutline density mask
    (alg/gdalcutline.cpp + alg/gdalwarpoperation.cpp density path,
    binary -cblend 0 case).  X: (w,) column centers, Y: (h,) row
    centers.  Vectorized per edge: a row crosses when (y1 <= y) !=
    (y2 <= y); the column is inside-toggled when its center x is less
    than the edge's x-intercept."""
    h, w = len(Y), len(X)
    inside = np.zeros((h, w), dtype=bool)
    n = len(poly_x)
    for k in range(n):
        x1, y1 = poly_x[k], poly_y[k]
        x2, y2 = poly_x[(k + 1) % n], poly_y[(k + 1) % n]
        crosses = (y1 <= Y) != (y2 <= Y)  # (h,)
        if not crosses.any():
            continue
        xint = x1 + (Y - y1) * (x2 - x1) / (y2 - y1)  # (h,)
        inside ^= crosses[:, None] & (X[None, :] < xint[:, None])
    return inside


class WarpChipsCutline(WarpChips):
    """WarpChips + per-chip cutline: after the reprojection, dst pixels
    whose centers fall outside the chip's cutline polygon (list columns
    cut_x / cut_y, dst CRS) are zeroed (nodata)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cut_x = batch.column("cut_x").to_pylist()
        cut_y = batch.column("cut_y").to_pylist()
        base = batch.drop_columns(["cut_x", "cut_y"])
        warped = super().__call__(base)
        cols = {
            c: warped.column(c).to_pylist()
            for c in ("bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy")
        }
        out_bytes = []
        for i in range(warped.num_rows):
            img = codecs.decode(
                cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i]
            )
            w, h = int(cols["w"][i]), int(cols["h"][i])
            X = cols["minx"][i] + (np.arange(w) + 0.5) * (
                (cols["maxx"][i] - cols["minx"][i]) / w
            )
            Y = cols["maxy"][i] - (np.arange(h) + 0.5) * (
                (cols["maxy"][i] - cols["miny"][i]) / h
            )
            m = cutline_mask(
                np.asarray(cut_x[i], np.float64),
                np.asarray(cut_y[i], np.float64), X, Y,
            )
            img = img * m[:, :, None].astype(np.uint8)
            out_bytes.append(codecs.encode(img, cols["fmt"][i]))
        return warped.set_column(
            warped.schema.get_field_index("bytes"), "bytes",
            pa.array(out_bytes, pa.binary()),
        )


def warp_images_cutline(images, src_srs="EPSG:3857", dst_srs="EPSG:4326",
                        resampling="bilinear", concurrency=4, batch_size=64,
                        use_approx=True):
    """Cutline-masked reprojection (cut_x/cut_y list columns carry each
    chip's polygon in the destination CRS)."""
    return images.map_batches(
        WarpChipsCutline,
        fn_constructor_kwargs=dict(
            src_srs=src_srs, dst_srs=dst_srs, resampling=resampling,
            use_approx=use_approx,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class WarpChipsTPS(WarpChipsGCP):
    """WarpChipsGCP with a thin-plate-spline transformer
    (alg/gdal_tps.cpp / thinplatespline.cpp analog, ``gdalwarp -tps``):
    same dst-grid spec, the fitted transform is TPS instead of the
    polynomial."""

    def _warp_one(self, img, gp, gl, gx, gy):
        from ..functions.tps import TPSTransformer

        h, w = img.shape[:2]
        tr = TPSTransformer(list(zip(gp, gl)), list(zip(gx, gy)))
        cpx = np.array([0.0, float(w), float(w), 0.0])
        cpl = np.array([0.0, 0.0, float(h), float(h)])
        cx, cy = tr.fwd(cpx, cpl)
        minx, maxx = float(np.min(cx)), float(np.max(cx))
        miny, maxy = float(np.min(cy)), float(np.max(cy))
        X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
        Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
        XX, YY = np.meshgrid(X, Y)
        sp, sl = tr.inv(XX, YY)
        out = kernels.resample_grid(
            img, sp - 0.5, sl - 0.5, self.resampling, nodata=0
        )
        return out, (minx, miny, maxx, maxy)


def warp_images_tps(images, resampling: str = "bilinear",
                    concurrency=4, batch_size: int = 64):
    """TPS warp over an images Dataset carrying per-row GCP list
    columns (actor pool, spline fit + quantize per chip)."""
    return images.map_batches(
        WarpChipsTPS,
        fn_constructor_kwargs=dict(resampling=resampling),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class WarpChipsRPC:
    """Actor-pool stage: warp each chip by a rational-polynomial-
    coefficient model (alg/gdal_rpc.cpp analog, ``gdalwarp -rpc``,
    no-DEM configuration).  The per-chip RPC model comes from the
    deterministic fixture spec functions.rpc.synth_rpc(i, w, h)
    (mirrored by the rasterref golden).

    Grid spec: dst bbox = envelope of the RPC-INVERSE-mapped pixel
    corners (iterative inverse, 0.1-px threshold); dst keeps w x h
    pixels; each dst pixel center maps through the RPC FORWARD
    (geo -> image) to source pixel space and samples with
    resample_grid (nodata 0 outside)."""

    def __init__(self, resampling: str = "bilinear"):
        self.resampling = resampling

    def _warp_one(self, img, iid: str):
        from ..functions.rpc import RPCModel, synth_rpc

        h, w = img.shape[:2]
        m = RPCModel(**synth_rpc(int(iid[3:]), w, h))
        cpx = np.array([0.0, float(w), float(w), 0.0])
        cpl = np.array([0.0, 0.0, float(h), float(h)])
        cx, cy, ok = m.inverse(cpx, cpl)
        minx, maxx = float(np.min(cx)), float(np.max(cx))
        miny, maxy = float(np.min(cy)), float(np.max(cy))
        X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
        Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
        XX, YY = np.meshgrid(X, Y)
        sp, sl = m.forward(XX, YY)
        out = kernels.resample_grid(
            img, sp - 0.5, sl - 0.5, self.resampling, nodata=0
        )
        return out, (minx, miny, maxx, maxy)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {
            c: batch.column(c).to_pylist()
            for c in ("image_id", "bytes", "w", "h", "fmt")
        }
        n = batch.num_rows
        new_bytes = []
        env = np.empty((n, 4), dtype=np.float64)
        for i in range(n):
            img = codecs.decode(
                cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i]
            )
            out, dst_env = self._warp_one(img, cols["image_id"][i])
            new_bytes.append(codecs.encode(out, cols["fmt"][i]))
            env[i] = dst_env
        out_t = batch
        for name, arr in (
            ("bytes", pa.array(new_bytes, pa.binary())),
            ("minx", pa.array(env[:, 0])),
            ("miny", pa.array(env[:, 1])),
            ("maxx", pa.array(env[:, 2])),
            ("maxy", pa.array(env[:, 3])),
        ):
            if name in out_t.schema.names:
                out_t = out_t.set_column(
                    out_t.schema.get_field_index(name), name, arr
                )
            else:
                out_t = out_t.append_column(name, arr)
        return out_t


def warp_images_rpc(images, resampling: str = "bilinear",
                    concurrency=4, batch_size: int = 64):
    """RPC warp over an images Dataset (actor pool; model built per
    chip from the deterministic fixture spec)."""
    return images.map_batches(
        WarpChipsRPC,
        fn_constructor_kwargs=dict(resampling=resampling),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class WarpChipsGeoloc:
    """Actor-pool stage: warp each chip by a geolocation-array
    transformer (alg/gdalgeoloc.cpp analog, GEOLOCATION metadata
    path).  Per-chip subsampled geoloc arrays come from the
    deterministic fixture spec functions.geoloc.synth_geoloc
    (mirrored by the rasterref golden).

    Grid spec: dst bbox = envelope of the geoloc-FORWARD-mapped pixel
    corners; dst keeps w x h pixels; each dst pixel center maps back
    through the masked-Newton INVERSE to source pixel space and
    samples with resample_grid (nodata 0 outside)."""

    def __init__(self, resampling: str = "bilinear"):
        self.resampling = resampling

    def _warp_one(self, img, iid: str, env):
        from ..functions.geoloc import GeolocTransformer, synth_geoloc

        h, w = img.shape[:2]
        glx, gly = synth_geoloc(int(iid[3:]), w, h, *env)
        tr = GeolocTransformer(glx, gly)
        cpx = np.array([0.0, float(w), float(w), 0.0])
        cpl = np.array([0.0, 0.0, float(h), float(h)])
        cx, cy = tr.forward(cpx, cpl)
        minx, maxx = float(np.min(cx)), float(np.max(cx))
        miny, maxy = float(np.min(cy)), float(np.max(cy))
        X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
        Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
        XX, YY = np.meshgrid(X, Y)
        sp, sl = tr.inverse(XX, YY)
        out = kernels.resample_grid(
            img, sp - 0.5, sl - 0.5, self.resampling, nodata=0
        )
        return out, (minx, miny, maxx, maxy)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {
            c: batch.column(c).to_pylist()
            for c in ("image_id", "bytes", "w", "h", "fmt",
                      "minx", "miny", "maxx", "maxy")
        }
        n = batch.num_rows
        new_bytes = []
        env = np.empty((n, 4), dtype=np.float64)
        for i in range(n):
            img = codecs.decode(
                cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i]
            )
            out, dst_env = self._warp_one(
                img, cols["image_id"][i],
                (cols["minx"][i], cols["miny"][i],
                 cols["maxx"][i], cols["maxy"][i]),
            )
            new_bytes.append(codecs.encode(out, cols["fmt"][i]))
            env[i] = dst_env
        out_t = batch
        for name, arr in (
            ("bytes", pa.array(new_bytes, pa.binary())),
            ("minx", pa.array(env[:, 0])),
            ("miny", pa.array(env[:, 1])),
            ("maxx", pa.array(env[:, 2])),
            ("maxy", pa.array(env[:, 3])),
        ):
            out_t = out_t.set_column(
                out_t.schema.get_field_index(name), name, arr
            )
        return out_t


def warp_images_geoloc(images, resampling: str = "bilinear",
                       concurrency=4, batch_size: int = 64):
    """Geolocation-array warp over an images Dataset (actor pool)."""
    return images.map_batches(
        WarpChipsGeoloc,
        fn_constructor_kwargs=dict(resampling=resampling),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class WarpChipsRPCDEM(WarpChipsRPC):
    """WarpChipsRPC with the DEM-backed transformer: per-chip dyadic
    DEM (functions.rpc.synth_dem) refreshed inside every inverse
    iteration, oscillation damping + boost branches active, per-pixel
    DEM height in the forward sampling (the poDS configuration of
    alg/gdal_rpc.cpp)."""

    def _warp_one(self, img, iid: str):
        from ..functions.rpc import (
            RPCModel,
            rpc_forward_dem,
            rpc_inverse_dem,
            synth_dem,
            synth_rpc_dem,
        )

        h, w = img.shape[:2]
        i = int(iid[3:])
        m = RPCModel(**synth_rpc_dem(i, w, h))
        dem = synth_dem(i)
        cpx = np.array([0.0, float(w), float(w), 0.0])
        cpl = np.array([0.0, 0.0, float(h), float(h)])
        cx, cy, ok = rpc_inverse_dem(m, dem, cpx, cpl)
        minx, maxx = float(np.min(cx)), float(np.max(cx))
        miny, maxy = float(np.min(cy)), float(np.max(cy))
        X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
        Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
        XX, YY = np.meshgrid(X, Y)
        sp, sl = rpc_forward_dem(m, dem, XX, YY)
        out = kernels.resample_grid(
            img, sp - 0.5, sl - 0.5, self.resampling, nodata=0
        )
        return out, (minx, miny, maxx, maxy)


def warp_images_rpc_dem(images, resampling: str = "bilinear",
                        concurrency=4, batch_size: int = 64):
    """DEM-backed RPC warp over an images Dataset (actor pool)."""
    return images.map_batches(
        WarpChipsRPCDEM,
        fn_constructor_kwargs=dict(resampling=resampling),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class WarpChipsUTM(WarpChipsRPC):
    """Actor-pool stage: warp each chip from its UTM zone to
    EPSG:4326 — the reference's canonical gdalwarp benchmark
    (autotest/benchmark/test_gdalwarp.py:24, byte.tif is UTM zone 11).

    UTM <-> geographic is NOT axis-separable (lat depends on both E
    and N away from the central meridian), so unlike WarpChips this
    runs the full 2-D inverse-mapped grid: dst bbox = envelope of the
    TM-INVERSE-mapped chip corners; dst keeps w x h pixels; each dst
    pixel center (lon, lat) maps through the TM FORWARD to (E, N) and
    on to source pixel space, sampling with resample_grid (nodata 0
    outside).  Per-chip UTM georeferencing comes from the
    deterministic fixture spec functions.proj.synth_utm(i) (mirrored
    by the rasterref golden).  Projections are cached per zone in the
    actor (three zones in the fixture family)."""

    def __init__(self, resampling: str = "bilinear"):
        super().__init__(resampling)
        self._projs = {}

    def _warp_one(self, img, iid: str):
        from ..functions.proj import UTMProjection, synth_utm

        h, w = img.shape[:2]
        i = int(iid[3:])
        epsg, e0, n0, gsd = synth_utm(i)
        prj = self._projs.get(epsg)
        if prj is None:
            prj = self._projs[epsg] = UTMProjection(epsg)
        cE = np.array([e0, e0 + gsd * w, e0 + gsd * w, e0])
        cN = np.array([n0 + gsd * h, n0 + gsd * h, n0, n0])
        clon, clat = prj.inv(cE, cN)
        minx, maxx = float(np.min(clon)), float(np.max(clon))
        miny, maxy = float(np.min(clat)), float(np.max(clat))
        X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
        Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
        XX, YY = np.meshgrid(X, Y)
        E, N = prj.fwd(XX, YY)
        sp = (E - e0) / gsd
        sl = (n0 + gsd * h - N) / gsd
        out = kernels.resample_grid(
            img, sp - 0.5, sl - 0.5, self.resampling, nodata=0
        )
        return out, (minx, miny, maxx, maxy)


class WarpChipsUTMChain(WarpChipsUTM):
    """Actor-pool stage: warp each UTM-georeferenced chip directly to
    EPSG:3857 through a COMPOSED transform chain
    (functions.proj.ComposedTransform — the reference's
    GDALCreateGenImgProjTransformer src-CRS -> geographic -> dst-CRS
    chain, alg/gdaltransformer.cpp:2187 / PROJ `+proj=pipeline`):
    UTM inverse -> WebMercator forward, with the inverse chain mapping
    each dst 3857 pixel center back through lon/lat to (E, N) and on
    to source pixels.  Same dst-grid spec as WarpChipsUTM (corner
    envelope, w x h kept)."""

    def _warp_one(self, img, iid: str):
        from ..functions.proj import (
            ComposedTransform,
            InverseOf,
            UTMProjection,
            WebMercatorProjection,
            synth_utm,
        )

        h, w = img.shape[:2]
        i = int(iid[3:])
        epsg, e0, n0, gsd = synth_utm(i)
        prj = self._projs.get(epsg)
        if prj is None:
            prj = self._projs[epsg] = UTMProjection(epsg)
        chain = ComposedTransform(InverseOf(prj), WebMercatorProjection())
        cE = np.array([e0, e0 + gsd * w, e0 + gsd * w, e0])
        cN = np.array([n0 + gsd * h, n0 + gsd * h, n0, n0])
        cx, cy = chain.fwd(cE, cN)
        minx, maxx = float(np.min(cx)), float(np.max(cx))
        miny, maxy = float(np.min(cy)), float(np.max(cy))
        X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
        Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
        XX, YY = np.meshgrid(X, Y)
        E, N = chain.inv(XX, YY)
        sp = (E - e0) / gsd
        sl = (n0 + gsd * h - N) / gsd
        out = kernels.resample_grid(
            img, sp - 0.5, sl - 0.5, self.resampling, nodata=0
        )
        return out, (minx, miny, maxx, maxy)


class WarpChipsProjFam(WarpChipsRPC):
    """Actor-pool stage: warp each chip from a conic/polar projected
    CRS (Lambert Conformal Conic / Albers Equal Area / Polar
    Stereographic — the Snyder closed forms of functions.proj,
    covering the arbitrary-CRS families the reference reaches through
    PROJ, ogr/ogrct.cpp:1018) to EPSG:4326.  Same full-2-D
    inverse-mapped grid spec as WarpChipsUTM: dst bbox = envelope of
    the INVERSE-projected chip corners, w x h kept, each dst pixel
    center forward-projected back to source pixel space.  The
    projection object and fixture spec are built once per actor."""

    FAMILY: str = ""

    def __init__(self, resampling: str = "bilinear"):
        super().__init__(resampling)
        from ..functions import proj as P

        if self.FAMILY == "lcc":
            self.prj = P.LambertConformalConic(*P.LCC_PARAMS)
            self.synth = P.synth_lcc
        elif self.FAMILY == "albers":
            self.prj = P.AlbersEqualArea(*P.ALBERS_PARAMS)
            self.synth = P.synth_albers
        elif self.FAMILY == "stere":
            self.prj = P.PolarStereographic(*P.STERE_PARAMS)
            self.synth = P.synth_stere
        elif self.FAMILY == "sinu":
            self.prj = P.Sinusoidal(*P.SINU_PARAMS)
            self.synth = P.synth_sinu
        elif self.FAMILY == "eqc":
            self.prj = P.EquidistantCylindrical(*P.EQC_PARAMS)
            self.synth = P.synth_eqc
        elif self.FAMILY == "moll":
            self.prj = P.Mollweide(*P.MOLL_PARAMS)
            self.synth = P.synth_moll
        elif self.FAMILY == "aeqd":
            self.prj = P.SphericalAzimuthal("aeqd", *P.AEQD_PARAMS)
            self.synth = P.synth_aeqd
        elif self.FAMILY == "ortho":
            self.prj = P.SphericalAzimuthal("ortho", *P.ORTHO_PARAMS)
            self.synth = P.synth_ortho
        elif self.FAMILY == "gnom":
            self.prj = P.SphericalAzimuthal("gnom", *P.GNOM_PARAMS)
            self.synth = P.synth_gnom
        else:
            raise ValueError(f"unknown projection family {self.FAMILY!r}")

    def _warp_one(self, img, iid: str):
        h, w = img.shape[:2]
        i = int(iid[3:])
        x0, y0, gsd = self.synth(i)
        cX = np.array([x0, x0 + gsd * w, x0 + gsd * w, x0])
        cY = np.array([y0 + gsd * h, y0 + gsd * h, y0, y0])
        clon, clat = self.prj.inv(cX, cY)
        minx, maxx = float(np.min(clon)), float(np.max(clon))
        miny, maxy = float(np.min(clat)), float(np.max(clat))
        X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
        Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
        XX, YY = np.meshgrid(X, Y)
        E, N = self.prj.fwd(XX, YY)
        sp = (E - x0) / gsd
        sl = (y0 + gsd * h - N) / gsd
        out = kernels.resample_grid(
            img, sp - 0.5, sl - 0.5, self.resampling, nodata=0
        )
        return out, (minx, miny, maxx, maxy)


class WarpChipsLCC(WarpChipsProjFam):
    FAMILY = "lcc"


class WarpChipsAlbers(WarpChipsProjFam):
    FAMILY = "albers"


class WarpChipsStere(WarpChipsProjFam):
    FAMILY = "stere"


class WarpChipsSinu(WarpChipsProjFam):
    FAMILY = "sinu"


class WarpChipsEqc(WarpChipsProjFam):
    FAMILY = "eqc"


class WarpChipsMoll(WarpChipsProjFam):
    FAMILY = "moll"


class WarpChipsAeqd(WarpChipsProjFam):
    FAMILY = "aeqd"


class WarpChipsOrtho(WarpChipsProjFam):
    FAMILY = "ortho"


class WarpChipsGnom(WarpChipsProjFam):
    FAMILY = "gnom"


class WarpChipsEPSG(WarpChipsProjFam):
    """Actor-pool stage: warp each chip from ANY CRS in the engine's
    static EPSG registry (functions.epsg — the PROJ-database front
    door the reference reaches through ogr/ogrct.cpp:1018
    OGRCreateCoordinateTransformation / importFromEPSG) to EPSG:4326.
    Same full-2-D inverse-mapped grid spec as WarpChipsProjFam; chip
    georeferencing comes from the deterministic synth_epsg fixture
    (dyadic offsets around the code's registry sample point).  The
    resolver and projection object are built once per actor."""

    def __init__(self, epsg="EPSG:2154", resampling: str = "bilinear"):
        WarpChipsRPC.__init__(self, resampling)
        from ..functions.epsg import resolve_epsg, synth_epsg

        self.epsg = epsg
        self.prj = resolve_epsg(epsg)
        self.synth = lambda i: synth_epsg(epsg, i)


class WarpChipsEPSGPair(WarpChipsProjFam):
    """Actor-pool stage: warp each chip between TWO registry CRS
    (the gdalwarp -s_srs/-t_srs pair, both resolved from EPSG codes)
    through the composed chain src-inverse -> WGS84 -> dst-forward
    (the GenImgProjTransformer composition,
    alg/gdaltransformer.cpp:2187).  Chip georeferencing comes from
    synth_epsg on the SOURCE code; dst bbox = envelope of the
    chain-mapped corners, w x h kept."""

    def __init__(self, src="EPSG:2154", dst="EPSG:3035",
                 resampling: str = "bilinear"):
        WarpChipsRPC.__init__(self, resampling)
        from ..functions.epsg import resolve_epsg, synth_epsg
        from ..functions.proj import ComposedTransform, InverseOf

        self.chain = ComposedTransform(InverseOf(resolve_epsg(src)),
                                       resolve_epsg(dst))
        self.synth = lambda i: synth_epsg(src, i)

    def _warp_one(self, img, iid: str):
        h, w = img.shape[:2]
        i = int(iid[3:])
        x0, y0, gsd = self.synth(i)
        cX = np.array([x0, x0 + gsd * w, x0 + gsd * w, x0])
        cY = np.array([y0 + gsd * h, y0 + gsd * h, y0, y0])
        dx, dy = self.chain.fwd(cX, cY)
        minx, maxx = float(np.min(dx)), float(np.max(dx))
        miny, maxy = float(np.min(dy)), float(np.max(dy))
        X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
        Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
        XX, YY = np.meshgrid(X, Y)
        E, N = self.chain.inv(XX, YY)
        sp = (E - x0) / gsd
        sl = (y0 + gsd * h - N) / gsd
        out = kernels.resample_grid(
            img, sp - 0.5, sl - 0.5, self.resampling, nodata=0
        )
        return out, (minx, miny, maxx, maxy)


def warp_images_epsg(images, epsg, resampling: str = "bilinear",
                     concurrency=4, batch_size: int = 64):
    """EPSG-code-resolved warp over an images Dataset (actor pool):
    ``epsg`` is any code in functions.epsg's registry."""
    return images.map_batches(
        WarpChipsEPSG,
        fn_constructor_kwargs=dict(epsg=epsg, resampling=resampling),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def warp_images_epsg_pair(images, src, dst,
                          resampling: str = "bilinear",
                          concurrency=4, batch_size: int = 64):
    """src-CRS -> dst-CRS warp over an images Dataset, both resolved
    from the static EPSG registry (actor pool)."""
    return images.map_batches(
        WarpChipsEPSGPair,
        fn_constructor_kwargs=dict(src=src, dst=dst,
                                   resampling=resampling),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def warp_images_projfam(images, family: str, resampling: str = "bilinear",
                        concurrency=4, batch_size: int = 64):
    """Projected-CRS-family warp over an images Dataset (actor pool).
    ``family='ntv2'`` routes to the NTv2 grid-shift datum warp (same
    stage protocol; georeferencing in source-datum lon/lat)."""
    cls = {"lcc": WarpChipsLCC, "albers": WarpChipsAlbers,
           "stere": WarpChipsStere, "sinu": WarpChipsSinu,
           "eqc": WarpChipsEqc, "moll": WarpChipsMoll,
           "aeqd": WarpChipsAeqd, "ortho": WarpChipsOrtho,
           "gnom": WarpChipsGnom, "ntv2": WarpChipsNTv2}[family]
    return images.map_batches(
        cls,
        fn_constructor_kwargs=dict(resampling=resampling),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class WarpChipsNTv2(WarpChipsRPC):
    """Actor-pool stage: warp each chip across a horizontal DATUM
    SHIFT driven by an NTv2 grid file — the reference reaches this
    through PROJ's ``+nadgrids=`` correction (ogr/ogrct.cpp:1018) and
    ships the grid format itself as the frmts/ntv2 driver.

    The actor ``__init__`` writes the deterministic fixture grid
    (functions.proj.synth_ntv2_subgrids) to a real .gsb file under
    /tmp once, reads it back through sources.ntv2.read_ntv2 and builds
    the transform from the PARSED records — so every driver-checked
    row exercises the binary format round trip, not just the math.

    Chips are georeferenced in source-datum (NAD27-style) lon/lat by
    functions.proj.synth_ntv2(i); dst bbox = envelope of the
    FORWARD-shifted corners (source datum -> target datum), w x h
    kept, each dst pixel center mapped back through the fixed-4-step
    iterative INVERSE to source pixel space (mirrored by the
    rasterref golden)."""

    FIXTURE_GSB = "/tmp/gdal_ray_fixtures/ntv2_fixture.gsb"

    def __init__(self, resampling: str = "bilinear"):
        super().__init__(resampling)
        import os

        from ..functions.proj import NTv2GridShift, synth_ntv2_subgrids
        from ..sources.ntv2 import read_ntv2, write_ntv2

        if not os.path.exists(self.FIXTURE_GSB):
            os.makedirs(os.path.dirname(self.FIXTURE_GSB), exist_ok=True)
            write_ntv2(self.FIXTURE_GSB, synth_ntv2_subgrids())
        self.shift = NTv2GridShift(read_ntv2(self.FIXTURE_GSB)["subgrids"])

    def _warp_one(self, img, iid: str):
        from ..functions.proj import synth_ntv2

        h, w = img.shape[:2]
        i = int(iid[3:])
        lon0, lat0, gsd = synth_ntv2(i)
        cX = np.array([lon0, lon0 + gsd * w, lon0 + gsd * w, lon0])
        cY = np.array([lat0 + gsd * h, lat0 + gsd * h, lat0, lat0])
        clon, clat = self.shift.fwd(cX, cY)
        minx, maxx = float(np.min(clon)), float(np.max(clon))
        miny, maxy = float(np.min(clat)), float(np.max(clat))
        X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
        Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
        XX, YY = np.meshgrid(X, Y)
        E, N = self.shift.inv(XX, YY)
        sp = (E - lon0) / gsd
        sl = (lat0 + gsd * h - N) / gsd
        out = kernels.resample_grid(
            img, sp - 0.5, sl - 0.5, self.resampling, nodata=0
        )
        return out, (minx, miny, maxx, maxy)


def warp_images_ntv2(images, resampling: str = "bilinear",
                     concurrency=4, batch_size: int = 64):
    """NTv2 grid-shift datum warp over an images Dataset (actor pool;
    the .gsb fixture is written/parsed once per actor)."""
    return images.map_batches(
        WarpChipsNTv2,
        fn_constructor_kwargs=dict(resampling=resampling),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def warp_images_utm(images, resampling: str = "bilinear",
                    concurrency=4, batch_size: int = 64):
    """UTM -> EPSG:4326 warp over an images Dataset (actor pool;
    per-zone Transverse Mercator transformers cached per actor)."""
    return images.map_batches(
        WarpChipsUTM,
        fn_constructor_kwargs=dict(resampling=resampling),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def overlap_weights(edges: np.ndarray, m: int) -> np.ndarray:
    """1-D fractional-overlap scatter matrix for sum-preserving
    resampling: ``edges`` are the n+1 monotone source-pixel edge
    positions in destination pixel coordinates; returns A (m, n) with
    A[j, i] = |[edges[i], edges[i+1]] ^ [j, j+1]| / (edges[i+1] -
    edges[i]), so each source pixel's unit weight splits across the
    destination pixels its footprint covers (row sums of A^T = 1 for
    footprints inside the grid)."""
    e0 = edges[:-1][None, :]
    e1 = edges[1:][None, :]
    j = np.arange(m, dtype=np.float64)[:, None]
    ov = np.minimum(e1, j + 1.0) - np.maximum(e0, j)
    return np.maximum(ov, 0.0) / (e1 - e0)


class WarpChipsSum(WarpChips):
    """Sum-preserving warp (alg/gdalwarpkernel.cpp:7969
    GWKSumPreserving, ``gdalwarp -r sum``): each SOURCE pixel's value
    is distributed to destination pixels in proportion to the
    fractional overlap of its transformed footprint with each dst
    pixel (weight = area(src_quad ^ dst_pixel) / area(src_quad)), so
    the global sum is conserved.  For the engine's axis-separable CRS
    pairs every source footprint is an axis-aligned rect in dst pixel
    space, so the scatter factorizes exactly into two 1-D overlap
    matrices: dst = Ay @ src @ Ax^T (the general-quad clipping path of
    the reference collapses to this for affine-per-axis transforms).
    Byte output is rounded half-up and clamped (the float path is the
    conserved one — see tests/test_warp_sum.py)."""

    @staticmethod
    def _band_weights(edges: np.ndarray, m: int):
        """Banded form of overlap_weights: source pixel i overlaps dst
        cells base[i] + {0, 1, 2} with fractions wt[k][i] (the
        footprint spans < 2 dst pixels for the engine's near-identity
        grids, so 3 cells always suffice; out-of-grid cells get weight
        0).  Deterministic elementwise ops only — no BLAS — so the
        golden mirror reproduces identical doubles."""
        e0, e1 = edges[:-1], edges[1:]
        base = np.floor(e0).astype(np.int64)
        width = e1 - e0
        wts, idxs = [], []
        for k in range(3):
            j = base + k
            ov = np.minimum(e1, j + 1.0) - np.maximum(e0, j)
            wt = np.maximum(ov, 0.0) / width
            wt[(j < 0) | (j >= m)] = 0.0
            wts.append(wt)
            idxs.append(np.clip(j, 0, m - 1))
        return idxs, wts

    def _warp_sum_float(self, img: np.ndarray, minx, miny, maxx, maxy):
        h, w = img.shape[:2]
        dminx, dminy, dmaxx, dmaxy = self.tr.src_bbox_to_dst(
            minx, miny, maxx, maxy)
        res_x = (maxx - minx) / w
        res_y = (maxy - miny) / h
        dres_x = (dmaxx - dminx) / w
        dres_y = (dmaxy - dminy) / h
        # source pixel EDGES (not centers) mapped to dst pixel coords
        ex = self.tr.src_x_to_dst_x(minx + np.arange(w + 1) * res_x)
        ey = self.tr.src_y_to_dst_y(maxy - np.arange(h + 1) * res_y)
        ex_px = (np.asarray(ex, np.float64) - dminx) / dres_x
        ey_px = (dmaxy - np.asarray(ey, np.float64)) / dres_y
        xi, xw = self._band_weights(ex_px, w)
        yi, yw = self._band_weights(ey_px, h)
        src = img.astype(np.float64)
        out = np.zeros((h, w, img.shape[2]), np.float64)
        for ky in range(3):
            if not np.any(yw[ky] > 0):
                continue
            for kx in range(3):
                if not np.any(xw[kx] > 0):
                    continue
                contrib = src * (yw[ky][:, None, None] * xw[kx][None, :, None])
                np.add.at(out, (yi[ky][:, None], xi[kx][None, :]), contrib)
        return out, (dminx, dminy, dmaxx, dmaxy)

    def _warp_one(self, img, minx, miny, maxx, maxy):
        out, env = self._warp_sum_float(img, minx, miny, maxx, maxy)
        return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8), env


def warp_images_sum(images, concurrency=4, batch_size: int = 64):
    """Sum-preserving reprojection over an images Dataset."""
    return images.map_batches(
        WarpChipsSum,
        fn_constructor_kwargs=dict(),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

class GeoidShiftChips:
    """Actor-pool stage: vertical (geoid) shift of chip band values —
    the engine's analog of PROJ's +vgridshift behind the reference's
    3-D transforms (ogr/ogrct.cpp).  The actor ``__init__`` writes the
    deterministic synth_geoid fixture to a REAL .gtx file under /tmp
    once, reads it back through sources.ntv2.read_gtx and builds the
    GeoidGridShift from the PARSED grid — every row exercises the
    binary format round trip.  Each chip's pixel grid is mapped onto
    the fixture window by normalized position (always in coverage);
    band values are treated as ellipsoidal heights and shifted to
    orthometric: out = clip(round(v - N), 0, 255)."""

    FIXTURE_GTX = "/tmp/gdal_ray_fixtures/geoid_fixture.gtx"

    def __init__(self):
        import os

        from ..functions.proj import GeoidGridShift, synth_geoid
        from ..sources.ntv2 import read_gtx, write_gtx

        if not os.path.exists(self.FIXTURE_GTX):
            os.makedirs(os.path.dirname(self.FIXTURE_GTX),
                        exist_ok=True)
            fx = synth_geoid()
            write_gtx(self.FIXTURE_GTX, fx["lat0"], fx["lon0"],
                      fx["dlat"], fx["dlon"], fx["values"])
        self.gs = GeoidGridShift(**read_gtx(self.FIXTURE_GTX))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import codecs

        cols = {c: batch.column(c).to_pylist()
                for c in ("image_id", "bytes", "w", "h", "fmt")}
        out_bytes = []
        nrows, ncols = self.gs.grid.shape
        lon_span = self.gs.dlon * (ncols - 1)
        lat_span = self.gs.dlat * (nrows - 1)
        for i in range(batch.num_rows):
            w, h, fmt = cols["w"][i], cols["h"][i], cols["fmt"][i]
            img = codecs.decode(cols["bytes"][i], w, h, fmt)
            lon = self.gs.lon0 + (np.arange(w) + 0.5) / w * lon_span
            lat = self.gs.lat0 + lat_span                 - (np.arange(h) + 0.5) / h * lat_span
            LO, LA = np.meshgrid(lon, lat)
            n = self.gs.undulation(LO, LA)
            shifted = np.clip(
                np.round(img.astype(np.float64) - n[:, :, None]),
                0, 255).astype(np.uint8)
            out_bytes.append(codecs.encode(shifted, fmt))
        return batch.set_column(
            batch.column_names.index("bytes"), "bytes",
            pa.array(out_bytes, pa.binary()))


def geoid_shift_images(images, concurrency=4, batch_size: int = 64):
    """Vertical geoid shift over an images Dataset (actor pool)."""
    return images.map_batches(
        GeoidShiftChips,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

