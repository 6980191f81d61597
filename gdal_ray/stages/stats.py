"""Raster statistics & histogram — blockwise partial -> merged final.

Reference semantics: band min/max/mean/stddev computed blockwise and
merged partial->final (gcore/gdalrasterband.cpp:5205,5325
ComputeStatistics[Internal]), bucketed histogram
(gcore/gdalrasterband.cpp:4133), ComputeRasterMinMax, and the
approx/decimated variants (:4151-4157 — here: a row-sample fraction).

Ray-Data shape: one partial row per batch (sum, sumsq, count, min,
max, bincount) from a vectorized map_batches, merged with a tiny
global aggregate — the mergeable-partial pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs


def band_statistics(images, sample_frac: float | None = None, seed: int = 42):
    """Per-band (R, G, B) statistics over every decoded chip pixel.

    Returns a 3-row Dataset: band, n, min, max, mean, stddev (population
    stddev, the ComputeStatistics default).  ``sample_frac`` decimates
    ROWS (chips) like the reference's approx-ok path."""
    import ray.data as rd

    ds = images.select_columns(["bytes", "w", "h", "fmt"])
    if sample_frac is not None:
        ds = ds.random_sample(sample_frac, seed=seed)

    def partial(t: pa.Table) -> pa.Table:
        # exact int64 partials: float partial sums would make the final
        # mean/stddev depend on the (nondeterministic) merge order
        s = np.zeros(3, dtype=np.int64)
        ss = np.zeros(3, dtype=np.int64)
        n = np.zeros(3, dtype=np.int64)
        mn = np.full(3, 255, dtype=np.int64)
        mx = np.zeros(3, dtype=np.int64)
        b = t.column("bytes").to_pylist()
        w = t.column("w").to_pylist()
        h = t.column("h").to_pylist()
        f = t.column("fmt").to_pylist()
        for i in range(len(b)):
            img = codecs.decode(b[i], w[i], h[i], f[i]).astype(np.int64)
            flat = img.reshape(-1, 3)
            s += flat.sum(axis=0)
            ss += (flat * flat).sum(axis=0)
            n += flat.shape[0]
            mn = np.minimum(mn, flat.min(axis=0))
            mx = np.maximum(mx, flat.max(axis=0))
        return pa.table(
            {
                "band": pa.array(np.arange(3, dtype=np.int64)),
                "s": pa.array(s),
                "ss": pa.array(ss),
                "n": pa.array(n),
                "mn": pa.array(mn),
                "mx": pa.array(mx),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("band")
        .aggregate(
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
            Sum("n", alias_name="n"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        ss = t.column("ss").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        mean = s / n
        var = ss / n - mean * mean
        return pa.table(
            {
                "band": t.column("band"),
                "n": t.column("n"),
                "min": t.column("mn"),
                "max": t.column("mx"),
                "mean": pa.array(mean),
                "stddev": pa.array(np.sqrt(np.maximum(var, 0.0))),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow").sort("band")


def band_histogram(images, n_buckets: int = 256):
    """256-bucket histogram per band (np.bincount partials + sum merge,
    gdalrasterband.cpp:4133 semantics for Byte data)."""

    def partial(t: pa.Table) -> pa.Table:
        counts = np.zeros((3, n_buckets), dtype=np.int64)
        b = t.column("bytes").to_pylist()
        w = t.column("w").to_pylist()
        h = t.column("h").to_pylist()
        f = t.column("fmt").to_pylist()
        for i in range(len(b)):
            img = codecs.decode(b[i], w[i], h[i], f[i])
            for band in range(3):
                counts[band] += np.bincount(
                    img[:, :, band].reshape(-1), minlength=n_buckets
                )[:n_buckets]
        bands = np.repeat(np.arange(3, dtype=np.int64), n_buckets)
        buckets = np.tile(np.arange(n_buckets, dtype=np.int64), 3)
        flat = counts.reshape(-1)
        nz = flat > 0  # sparse partials: only non-empty buckets travel
        return pa.table(
            {
                "band": pa.array(bands[nz]),
                "bucket": pa.array(buckets[nz]),
                "count": pa.array(flat[nz]),
            }
        )

    from ray.data.aggregate import Sum

    return (
        images.select_columns(["bytes", "w", "h", "fmt"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .aggregate(Sum("count", alias_name="count"))
        .sort(["band", "bucket"])
    )


def band_stats_and_histogram(images, n_buckets: int = 256):
    """ONE decode pass serving both surfaces: the merged per-band
    histogram is materialized (<= 768 tiny rows) and the statistics
    DERIVE from it — for Byte data the histogram is a sufficient
    statistic: s = sum(k*c) and ss = sum(k^2*c) are the identical
    int64 partial sums the direct pass accumulates, so the finalize
    floats are bit-equal while every chip decodes once instead of
    twice.  Returns (stats_ds, hist_ds)."""
    hist = band_histogram(images, n_buckets).materialize()

    def derive(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False)
        bucket = t.column("bucket").to_numpy(zero_copy_only=False)
        count = t.column("count").to_numpy(zero_copy_only=False)
        rows = {"band": [], "s": [], "ss": [], "n": [], "mn": [], "mx": []}
        for b in np.unique(band):
            sel = band == b
            k = bucket[sel].astype(np.int64)
            c = count[sel].astype(np.int64)
            rows["band"].append(int(b))
            rows["s"].append(int((k * c).sum()))
            rows["ss"].append(int((k * k * c).sum()))
            rows["n"].append(int(c.sum()))
            nz = k[c > 0]
            rows["mn"].append(int(nz.min()))
            rows["mx"].append(int(nz.max()))
        s = np.asarray(rows["s"], np.float64)
        ss = np.asarray(rows["ss"], np.float64)
        n = np.asarray(rows["n"], np.float64)
        mean = s / n
        var = ss / n - mean * mean
        return pa.table(
            {
                "band": pa.array(rows["band"], pa.int64()),
                "n": pa.array(rows["n"], pa.int64()),
                "min": pa.array(rows["mn"], pa.int64()),
                "max": pa.array(rows["mx"], pa.int64()),
                "mean": pa.array(mean),
                "stddev": pa.array(np.sqrt(np.maximum(var, 0.0))),
            }
        )

    stats = (hist.repartition(1)
             .map_batches(derive, batch_format="pyarrow").sort("band"))
    return stats, hist


def image_checksums(images):
    """Per-chip GDAL checksum Dataset (the golden-compare aggregate)."""
    from ..functions import checksum

    def fn(t: pa.Table) -> pa.Table:
        b = t.column("bytes").to_pylist()
        w = t.column("w").to_pylist()
        h = t.column("h").to_pylist()
        f = t.column("fmt").to_pylist()
        cs = np.empty((len(b), 3), dtype=np.int64)
        for i in range(len(b)):
            cs[i] = checksum.checksum_image(codecs.decode(b[i], w[i], h[i], f[i]))
        return pa.table(
            {
                "image_id": t.column("image_id"),
                "cs_r": pa.array(cs[:, 0]),
                "cs_g": pa.array(cs[:, 1]),
                "cs_b": pa.array(cs[:, 2]),
            }
        )

    return images.select_columns(["image_id", "bytes", "w", "h", "fmt"]).map_batches(
        fn, batch_format="pyarrow"
    )
