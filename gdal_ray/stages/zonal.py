"""Zonal statistics — per-polygon-zone raster statistics.

The classic GDAL-ecosystem operation (osgeo_utils / QGIS "zonal
stats"; the reference composes it from gdal_rasterize +
band-statistics, alg/llrasterize.cpp + gcore ComputeStatistics): for
every polygon zone, aggregate the pixels of every intersecting chip
whose CENTER falls inside the polygon.

Distributed shape: ONE co-partitioned spatial-join shuffle
(:func:`join_chips_with_polygons` — exactly-once per (chip, zone)
pair, candidate pairs never leave the group task), then a vectorized
per-pair masked partial (n, Σ, min, max per band — 3 tiny rows per
pair) and a tiny keyed ``grouped_aggregate`` merge by (zone, band).
Chip payloads replicate only to their covering cells (the same
replication the tile pipeline pays).  Counts and sums are integer
(uint8 pixels, int64 sums) so results are accumulation-order-exact.

Mask contract (shared with the independent oracle): pixel center
inside the polygon under the llrasterize half-open scanline rule —
an edge spans scanline y when min(y1,y2) <= y < max(y1,y2); a center
exactly at a span-opening crossing x is IN, at a span-closing one is
OUT (ties resolve identically via ceil(t - 0.5) span bounds on the
engine side and <=-crossing parity on the oracle side).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs
from ..functions.geom import parse_wkb, polygon_rings


def mask_parity(rings: list[np.ndarray], x0: float, y0: float, res: float,
                w: int, h: int) -> np.ndarray:
    """(h, w) bool mask of pixel centers inside the rings (exterior +
    holes via parity), window anchored at top-left (x0, y0), centers
    at +0.5 pixels, y decreasing downward.  Fully vectorized crossing
    parity: one (rows x edges x cols) comparison tensor per chip —
    center inside iff the count of edge crossings with x <= center_x
    is odd (crossing xs use the identical interpolation expression as
    the oracle, so exact ties agree)."""
    a = np.vstack([r[:-1] for r in rings])
    b = np.vstack([r[1:] for r in rings])
    y1, y2 = a[:, 1], b[:, 1]
    x1, x2 = a[:, 0], b[:, 0]
    ys = (y0 - (np.arange(h) + 0.5) * res)[:, None]  # (h, 1)
    cond = ((y1[None, :] <= ys) & (y2[None, :] > ys)) | (
        (y2[None, :] <= ys) & (y1[None, :] > ys)
    )  # (h, E)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (ys - y1[None, :]) / (y2 - y1)[None, :]
    xs = np.where(cond, x1[None, :] + t * (x2 - x1)[None, :], np.inf)
    cx = x0 + (np.arange(w) + 0.5) * res
    return ((xs[:, :, None] <= cx[None, None, :]).sum(axis=1) % 2) == 1


def _pair_partials(t: pa.Table) -> pa.Table:
    """(chip x zone) pair rows -> per-band masked partials
    (fid, band, n, s, mn, mx); pairs whose mask is empty emit nothing."""
    n_rows = t.num_rows
    cols = {
        c: t.column(c).to_pylist()
        for c in ("bytes", "w", "h", "fmt", "minx", "maxy", "maxx", "wkb")
    }
    fids = t.column("fid").to_pylist()
    ids = t.column("image_id").to_pylist()
    decoded: dict[str, np.ndarray] = {}  # chips repeat across zones
    out_f, out_b, out_n, out_s, out_mn, out_mx = [], [], [], [], [], []
    for i in range(n_rows):
        w, h = int(cols["w"][i]), int(cols["h"][i])
        res = (cols["maxx"][i] - cols["minx"][i]) / w
        rings = [
            r
            for poly in polygon_rings(parse_wkb(cols["wkb"][i]))
            for r in poly
        ]
        mask = mask_parity(rings, cols["minx"][i], cols["maxy"][i], res, w, h)
        if not mask.any():
            continue
        img = decoded.get(ids[i])
        if img is None:
            img = codecs.decode(cols["bytes"][i], w, h, cols["fmt"][i])
            decoded[ids[i]] = img
        sel = img[mask]  # (n_pix, bands)
        for band in range(img.shape[2]):
            v = sel[:, band]
            out_f.append(fids[i])
            out_b.append(band)
            out_n.append(len(v))
            out_s.append(int(v.sum(dtype=np.int64)))
            out_mn.append(int(v.min()))
            out_mx.append(int(v.max()))
    return pa.table(
        {
            "fid": pa.array(out_f, pa.int64()),
            "band": pa.array(out_b, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
            "s": pa.array(out_s, pa.int64()),
            "mn": pa.array(out_mn, pa.int64()),
            "mx": pa.array(out_mx, pa.int64()),
        }
    )


def zonal_statistics(chips, polygons, zoom: int = 10,
                     hot_cells: dict[int, int] | None = None):
    """Per-(zone fid, band) pixel statistics: n_pix, sum_val, min_val,
    max_val.  ``chips``: image rows with payload + envelope;
    ``polygons``: (fid, wkb, minx..maxy)."""
    from ..pipelines.relational import grouped_aggregate
    from .join import join_chips_with_polygons

    pairs = join_chips_with_polygons(
        chips, polygons, zoom=zoom,
        chip_cols=["image_id", "bytes", "w", "h", "fmt",
                   "minx", "miny", "maxx", "maxy"],
        poly_cols=["fid", "wkb"],
        hot_cells=hot_cells,
    )
    partials = pairs.map_batches(
        _pair_partials, batch_format="pyarrow", batch_size=64
    )
    return grouped_aggregate(
        partials,
        ["fid", "band"],
        [
            ("n", "sum", "n_pix"),
            ("s", "sum", "sum_val"),
            ("mn", "min", "min_val"),
            ("mx", "max", "max_val"),
        ],
    )
