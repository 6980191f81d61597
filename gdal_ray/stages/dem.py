"""DEM derivatives — 3x3 window ops per chip (gdaldem analog).

Reference semantics: apps/gdaldem_lib.cpp — generic 3x3 engine
GDALGeneric3x3Processing :318, hillshade :806 (Horn's formula, ZevenbergenThorne
variant), slope :1322 (percent/degrees), aspect :1397, TRI/TPI/roughness
(same file).  Band 0 of each chip is treated as elevation; windows are
fully vectorized numpy with edge replication (the reference computes
edges with duplicated border rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs


def _pad(e: np.ndarray) -> np.ndarray:
    return np.pad(e, 1, mode="edge")


def _horn_gradients(e: np.ndarray, xres: float, yres: float):
    p = _pad(e.astype(np.float64))
    a = p[:-2, :-2]; b = p[:-2, 1:-1]; c = p[:-2, 2:]
    d = p[1:-1, :-2];                  f = p[1:-1, 2:]
    g = p[2:, :-2];  h = p[2:, 1:-1];  i = p[2:, 2:]
    # Horn's formula (gdaldem_lib.cpp hillshade/slope kernels)
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8 * xres)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8 * yres)
    return dzdx, dzdy


def slope_degrees(e: np.ndarray, xres: float, yres: float) -> np.ndarray:
    dzdx, dzdy = _horn_gradients(e, xres, yres)
    return np.degrees(np.arctan(np.hypot(dzdx, dzdy)))


def aspect_degrees(e: np.ndarray, xres: float, yres: float) -> np.ndarray:
    """Aspect in degrees from north, clockwise (gdaldem aspect
    convention); flat cells -> -9999."""
    dzdx, dzdy = _horn_gradients(e, xres, yres)
    asp = np.degrees(np.arctan2(dzdy, -dzdx))
    out = np.where(
        asp > 90.0, 450.0 - asp, 90.0 - asp
    )
    out = np.where((dzdx == 0) & (dzdy == 0), -9999.0, out % 360.0)
    return out


def hillshade(
    e: np.ndarray,
    xres: float,
    yres: float,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    z_factor: float = 1.0,
) -> np.ndarray:
    """Horn hillshade, Byte output 1..255 (0 reserved), gdaldem rule."""
    dzdx, dzdy = _horn_gradients(e * z_factor, xres, yres)
    az = np.radians(360.0 - azimuth + 90.0)
    alt = np.radians(altitude)
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    shade = np.sin(alt) * np.cos(slope) + np.cos(alt) * np.sin(slope) * np.cos(
        az - aspect
    )
    return np.clip(np.floor(254.0 * np.maximum(shade, 0.0) + 1.5), 1, 255).astype(
        np.uint8
    )


def tri(e: np.ndarray) -> np.ndarray:
    """Terrain ruggedness: mean |center - neighbor| over the 8 neighbors
    (Wilson variant, the gdaldem TRI default)."""
    p = _pad(e.astype(np.float64))
    c = p[1:-1, 1:-1]
    acc = np.zeros_like(c)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            acc += np.abs(p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx] - c)
    return acc / 8.0


def tpi(e: np.ndarray) -> np.ndarray:
    """Topographic position: center minus mean of the 8 neighbors."""
    p = _pad(e.astype(np.float64))
    c = p[1:-1, 1:-1]
    acc = np.zeros_like(c)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            acc += p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
    return c - acc / 8.0


def roughness(e: np.ndarray) -> np.ndarray:
    """Max - min over the 3x3 window."""
    p = _pad(e.astype(np.float64))
    mx = np.full(e.shape, -np.inf)
    mn = np.full(e.shape, np.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            win = p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
            mx = np.maximum(mx, win)
            mn = np.minimum(mn, win)
    return mx - mn


DEFAULT_RAMP = (
    (0.0, (0, 0, 139)),
    (64.0, (0, 128, 255)),
    (128.0, (34, 139, 34)),
    (192.0, (205, 133, 63)),
    (255.0, (255, 255, 255)),
)


def color_relief(e: np.ndarray, ramp=DEFAULT_RAMP) -> np.ndarray:
    """gdaldem color-relief (apps/gdaldem_lib.cpp:1497): elevation ->
    RGB via linear interpolation between ramp entries."""
    xs = np.asarray([r[0] for r in ramp], np.float64)
    ef = e.astype(np.float64)
    out = np.empty((*e.shape, 3), dtype=np.uint8)
    for c in range(3):
        ys = np.asarray([r[1][c] for r in ramp], np.float64)
        v = np.interp(ef, xs, ys)
        out[:, :, c] = np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)
    return out


def color_relief_stage(images, ramp=DEFAULT_RAMP, concurrency: int = 4):
    """Per-chip color-relief of band 0; output rows (image_id, w, h,
    data RGB bytes)."""

    def fn(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).to_pylist() for c in ("image_id", "bytes", "w", "h", "fmt")}
        out = []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            out.append(color_relief(img[:, :, 0], ramp).tobytes())
        return pa.table(
            {
                "image_id": pa.array(cols["image_id"], pa.string()),
                "w": t.column("w"),
                "h": t.column("h"),
                "data": pa.array(out, pa.binary()),
            }
        )

    return images.map_batches(fn, batch_format="pyarrow", batch_size=128)


_OPS = {
    "hillshade": lambda e, xr, yr: hillshade(e, xr, yr),
    "slope": slope_degrees,
    "aspect": aspect_degrees,
    "tri": lambda e, xr, yr: tri(e),
    "tpi": lambda e, xr, yr: tpi(e),
    "roughness": lambda e, xr, yr: roughness(e),
}


class DemStage:
    """Actor-pool stage: apply a DEM op to band 0 of every chip; output
    rows (image_id, op, result bytes float32/uint8 raw + shape)."""

    def __init__(self, op: str = "hillshade"):
        if op not in _OPS:
            raise ValueError(f"unknown dem op {op}; known {sorted(_OPS)}")
        self.op = op
        self.fn = _OPS[op]

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = {
            c: t.column(c).to_pylist()
            for c in ("image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy")
        }
        out_bytes, dtypes = [], []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            e = img[:, :, 0].astype(np.float64)
            xres = (cols["maxx"][i] - cols["minx"][i]) / cols["w"][i]
            yres = (cols["maxy"][i] - cols["miny"][i]) / cols["h"][i]
            res = self.fn(e, xres, yres)
            if res.dtype == np.uint8:
                out_bytes.append(res.tobytes())
                dtypes.append("uint8")
            else:
                out_bytes.append(res.astype(np.float32).tobytes())
                dtypes.append("float32")
        return pa.table(
            {
                "image_id": t.column("image_id"),
                "op": pa.array([self.op] * t.num_rows, pa.string()),
                "w": t.column("w"),
                "h": t.column("h"),
                "dtype": pa.array(dtypes, pa.string()),
                "data": pa.array(out_bytes, pa.binary()),
            }
        )


def dem_derivative(images, op: str = "hillshade", concurrency: int = 4):
    return images.map_batches(
        DemStage,
        fn_constructor_kwargs=dict(op=op),
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
    )
