"""gdal_translate analog — per-chip window/resize/band/scale edits.

Reference semantics: apps/gdal_translate_lib.cpp:621 GDALTranslate —
-srcwin/-projwin subsetting, -outsize resize, -b band select/reorder,
-scale linear rescale (with clipping for Byte), -a_srs/-a_ullr
georef override.  One vectorized map_batches stage; rows keep the
input schema (bytes re-encoded in place, envelope updated for
windows)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs, kernels


class TranslateChips:
    """Actor-pool stage applying a gdal_translate-style recipe per chip.

    Options (all optional, applied in reference order):
      projwin: (minx, miny, maxx, maxy) georeferenced crop
      srcwin:  (xoff, yoff, xsize, ysize) pixel crop (after projwin)
      out_size: (w, h) resize; resampling: kernel name
      bands:   list like [2, 1, 0] band select/reorder (0-based)
      scale:   (src_min, src_max, dst_min, dst_max) linear rescale,
               clipped to [0, 255] with GDAL rounding (floor(x+0.5))
    """

    def __init__(
        self,
        projwin=None,
        srcwin=None,
        out_size=None,
        resampling: str = "near",
        bands=None,
        scale=None,
    ):
        self.projwin = projwin
        self.srcwin = srcwin
        self.out_size = out_size
        self.resampling = resampling
        if bands is not None and len(bands) not in (1, 3):
            # chips are stored 3-channel; a 2-band selection would
            # silently mis-round-trip through the codecs
            raise ValueError("bands must select 1 or 3 channels")
        self.bands = bands
        self.scale = scale

    def _one(self, img: np.ndarray, env: tuple[float, float, float, float]):
        minx, miny, maxx, maxy = env
        h, w = img.shape[:2]
        res_x = (maxx - minx) / w
        res_y = (maxy - miny) / h
        if self.projwin is not None:
            pminx, pminy, pmaxx, pmaxy = self.projwin
            # pixel window containing the projwin (clipped to the chip)
            x0 = max(0, int(np.floor((pminx - minx) / res_x)))
            x1 = min(w, int(np.ceil((pmaxx - minx) / res_x)))
            y0 = max(0, int(np.floor((maxy - pmaxy) / res_y)))
            y1 = min(h, int(np.ceil((maxy - pminy) / res_y)))
            if x1 <= x0 or y1 <= y0:
                return None, env
            img = img[y0:y1, x0:x1]
            minx2 = minx + x0 * res_x
            maxy2 = maxy - y0 * res_y
            env = (minx2, maxy2 - img.shape[0] * res_y,
                   minx2 + img.shape[1] * res_x, maxy2)
            minx, miny, maxx, maxy = env
            h, w = img.shape[:2]
        if self.srcwin is not None:
            xo, yo, xs, ys = self.srcwin
            xo2, yo2 = max(0, xo), max(0, yo)
            img = img[yo2 : min(h, yo + ys), xo2 : min(w, xo + xs)]
            if img.size == 0:
                return None, env
            minx2 = minx + xo2 * res_x
            maxy2 = maxy - yo2 * res_y
            env = (minx2, maxy2 - img.shape[0] * res_y,
                   minx2 + img.shape[1] * res_x, maxy2)
        if self.out_size is not None:
            ow, oh = self.out_size
            img = kernels.resize(img, ow, oh, self.resampling)
        if self.bands is not None:
            img = img[:, :, self.bands]
            if img.ndim == 2:
                img = img[:, :, None]
            if img.shape[2] == 1:  # keep 3-band at-rest form
                img = np.repeat(img, 3, axis=2)
        if self.scale is not None:
            smin, smax, dmin, dmax = self.scale
            f = (dmax - dmin) / max(smax - smin, 1e-12)
            out = (img.astype(np.float64) - smin) * f + dmin
            img = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
        return img, env

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = {
            c: t.column(c).to_pylist()
            for c in ("bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy")
        }
        keep, new_bytes, ws, hs = [], [], [], []
        env = []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            out, e = self._one(
                img,
                (cols["minx"][i], cols["miny"][i], cols["maxx"][i], cols["maxy"][i]),
            )
            if out is None:  # window misses the chip entirely -> drop row
                continue
            keep.append(i)
            new_bytes.append(codecs.encode(out, cols["fmt"][i]))
            hs.append(out.shape[0])
            ws.append(out.shape[1])
            env.append(e)
        out_t = t.take(pa.array(keep, pa.int64()))
        env = np.asarray(env, dtype=np.float64).reshape(len(keep), 4)
        for name, arr in (
            ("bytes", pa.array(new_bytes, pa.binary())),
            ("w", pa.array(ws, pa.int32())),
            ("h", pa.array(hs, pa.int32())),
            ("minx", pa.array(env[:, 0])),
            ("miny", pa.array(env[:, 1])),
            ("maxx", pa.array(env[:, 2])),
            ("maxy", pa.array(env[:, 3])),
        ):
            out_t = out_t.set_column(out_t.schema.get_field_index(name), name, arr)
        return out_t


def translate_images(images, concurrency: int = 4, batch_size: int = 128, **opts):
    return images.map_batches(
        TranslateChips,
        fn_constructor_kwargs=opts,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def xyz_points_batch(skip_zero: bool = False):
    """gdal2xyz analog (osgeo_utils/gdal2xyz.py:196-197 pixel-center
    formula): explode each chip into one row per pixel with geo
    coordinates and band values.

    geo_x = minx + (col + 0.5) * gsd_x
    geo_y = maxy - (row + 0.5) * gsd_y   (north-up, gt[5] < 0 analog)

    ``skip_zero`` mirrors -skipnodata with nodata=0: rows whose bands
    are ALL zero are dropped.  Emits (image_id, x, y, r, g, b)."""

    def fn(t: pa.Table) -> pa.Table:
        ids_o, xs_o, ys_o = [], [], []
        vals_o = [[], [], []]
        cols = {c: t.column(c).to_pylist()
                for c in ("image_id", "bytes", "w", "h", "fmt",
                          "minx", "miny", "maxx", "maxy")}
        for i in range(t.num_rows):
            w, h = cols["w"][i], cols["h"][i]
            img = codecs.decode(cols["bytes"][i], w, h, cols["fmt"][i])
            gsd_x = (cols["maxx"][i] - cols["minx"][i]) / w
            gsd_y = (cols["maxy"][i] - cols["miny"][i]) / h
            gx = cols["minx"][i] + (np.arange(w) + 0.5) * gsd_x
            gy = cols["maxy"][i] - (np.arange(h) + 0.5) * gsd_y
            XX, YY = np.meshgrid(gx, gy)
            flat = img.reshape(-1, 3)
            keep = slice(None)
            if skip_zero:
                keep = np.nonzero(flat.any(axis=1))[0]
            xs = XX.ravel()[keep]
            ids_o.append(np.full(len(xs), cols["image_id"][i]))
            xs_o.append(xs)
            ys_o.append(YY.ravel()[keep])
            for b in range(3):
                vals_o[b].append(flat[keep, b])
        if not ids_o:
            return pa.table(
                {
                    "image_id": pa.array([], pa.string()),
                    "x": pa.array([], pa.float64()),
                    "y": pa.array([], pa.float64()),
                    "r": pa.array([], pa.int32()),
                    "g": pa.array([], pa.int32()),
                    "b": pa.array([], pa.int32()),
                }
            )
        return pa.table(
            {
                "image_id": pa.array(np.concatenate(ids_o)),
                "x": pa.array(np.concatenate(xs_o), pa.float64()),
                "y": pa.array(np.concatenate(ys_o), pa.float64()),
                "r": pa.array(np.concatenate(vals_o[0]).astype(np.int32)),
                "g": pa.array(np.concatenate(vals_o[1]).astype(np.int32)),
                "b": pa.array(np.concatenate(vals_o[2]).astype(np.int32)),
            }
        )

    return fn
