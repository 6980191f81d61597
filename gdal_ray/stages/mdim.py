"""Multidimensional (N-D) array engine — GDAL multidim analog.

Reference: the GDAL multidim data model (gcore/gdalmultidim.cpp:
GDALGroup / GDALDimension / GDALMDArray, ~14k LoC), its Zarr driver
(frmts/zarr/ — regular chunk grids), the `gdal mdim convert/info`
CLI (apps/gdalalg_mdim_*.cpp) and the slice/transpose/resample views
(GDALMDArray::GetView, ::Transpose, ::GetResampled,
gdalmultidim.cpp).

Ray-Data-native model: an MDArray is a **Dataset of chunk rows** over
a regular chunk grid (the Zarr layout re-expressed as rows):

    (chunk: list<int64>   -- chunk grid index per dimension
     data:  binary        -- C-order ndarray buffer of the chunk
     shape: list<int64>)  -- this chunk's shape (edge chunks shrink)

plus a small MDSpec (dims, dtype, chunk shape) that travels by closure
— never the data.  The ops compose as Dataset transforms:

- ``transpose(perm)``   — pure map_batches (chunk index + buffer
  transpose); NO shuffle, the chunk grid is closed under transpose.
- ``slice(ranges)``     — filter + per-chunk crop + reindex; pure map.
- ``calc(fn)``          — elementwise map_batches.
- ``reduce(op, axis)``  — per-chunk partial reduce (combiner), then
  ONE groupby shuffle on the surviving chunk index to merge partials
  — the partial-aggregation discipline every wide op in this engine
  uses; mean divides the exact integer sum once at the end.
- ``resample2x(axes)``  — per-chunk area-average downscale (chunk
  shapes even => pure map, no halo).

At 100 TB the chunk rows stream through the object store like any
other block; a reduce over axis k moves each chunk once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "MDSpec", "mdim_create", "mdim_transpose", "mdim_slice",
    "mdim_calc", "mdim_reduce", "mdim_resample2x", "mdim_chunk_checksums",
]


class MDSpec:
    """Array metadata: full shape, chunk shape, numpy dtype string."""

    def __init__(self, shape, chunks, dtype: str = "int64"):
        self.shape = tuple(int(s) for s in shape)
        self.chunks = tuple(int(c) for c in chunks)
        self.dtype = dtype
        if len(self.shape) != len(self.chunks):
            raise ValueError("shape/chunks rank mismatch")

    @property
    def grid(self):
        return tuple(
            -(-s // c) for s, c in zip(self.shape, self.chunks)
        )

    def chunk_shape(self, idx):
        return tuple(
            min(c, s - i * c)
            for i, s, c in zip(idx, self.shape, self.chunks)
        )


def _row(idx, arr: np.ndarray) -> dict:
    return {
        "chunk": list(int(i) for i in idx),
        "shape": list(int(s) for s in arr.shape),
        "data": arr.tobytes(),
    }


def _arr(row_chunk, row_shape, row_data, dtype) -> np.ndarray:
    return np.frombuffer(row_data, dtype=dtype).reshape(tuple(row_shape))


def _emit(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "chunk": pa.array([r["chunk"] for r in rows],
                              pa.list_(pa.int64())),
            "shape": pa.array([r["shape"] for r in rows],
                              pa.list_(pa.int64())),
            "data": pa.array([r["data"] for r in rows], pa.binary()),
        }
    )


def _iter_rows(t: pa.Table, dtype):
    ch = t.column("chunk").to_pylist()
    sh = t.column("shape").to_pylist()
    da = t.column("data").to_pylist()
    for i in range(t.num_rows):
        yield ch[i], _arr(ch[i], sh[i], da[i], dtype)


def mdim_create(spec: MDSpec, fill_fn, *, parallelism: int = 0):
    """Materialize an array as a chunk Dataset.  ``fill_fn(i0grid,
    i1grid, ...) -> ndarray`` receives open index grids in GLOBAL
    coordinates for one chunk (vectorized synthesis — the fixture
    path; a reader Datasource is the file path)."""
    import ray.data as rd

    grid = spec.grid
    n = int(np.prod(grid))
    ids = rd.range(n, override_num_blocks=max(parallelism, 1) or None)

    def gen(b: pa.Table) -> pa.Table:
        rows = []
        for lin in b.column("id").to_pylist():
            idx = np.unravel_index(int(lin), grid)
            cs = spec.chunk_shape(idx)
            coords = np.meshgrid(
                *[
                    np.arange(i * c, i * c + s, dtype=np.int64)
                    for i, c, s in zip(idx, spec.chunks, cs)
                ],
                indexing="ij",
            )
            arr = np.ascontiguousarray(
                fill_fn(*coords).astype(spec.dtype)
            )
            rows.append(_row(idx, arr))
        return _emit(rows)

    return ids.map_batches(gen, batch_format="pyarrow")


def mdim_transpose(ds, spec: MDSpec, perm):
    """GDALMDArray::Transpose analog — zero-shuffle: permute the chunk
    index and transpose each buffer."""
    perm = tuple(perm)

    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for idx, arr in _iter_rows(t, spec.dtype):
            rows.append(_row(
                [idx[p] for p in perm],
                np.ascontiguousarray(arr.transpose(perm)),
            ))
        return _emit(rows)

    out_spec = MDSpec(
        [spec.shape[p] for p in perm],
        [spec.chunks[p] for p in perm],
        spec.dtype,
    )
    return ds.map_batches(fn, batch_format="pyarrow"), out_spec


def mdim_slice(ds, spec: MDSpec, ranges):
    """GetView slice [a:b, ...] — drop non-intersecting chunks, crop
    survivors, reindex to a fresh chunk grid anchored at the slice
    origin.  Output chunks keep the source chunk size (edge chunks
    shrink), so the result is again a regular grid."""
    ranges = [
        (int(a), int(b)) for (a, b) in ranges
    ]
    out_shape = [b - a for a, b in ranges]
    out_spec = MDSpec(out_shape, spec.chunks, spec.dtype)

    aligned = all(a % c == 0 for (a, _), c in zip(ranges, spec.chunks))

    def fn(t: pa.Table) -> pa.Table:
        rows, offs, keys = [], [], []
        for idx, arr in _iter_rows(t, spec.dtype):
            sel = []
            ok = True
            origin = []
            for d, (a, b) in enumerate(ranges):
                lo = idx[d] * spec.chunks[d]
                hi = lo + arr.shape[d]
                s, e = max(a, lo), min(b, hi)
                if s >= e:
                    ok = False
                    break
                sel.append(slice(s - lo, e - lo))
                origin.append(s - a)
            if not ok:
                continue
            sub = np.ascontiguousarray(arr[tuple(sel)])
            # global output offset -> output chunk grid index; pieces
            # are re-chunked locally so every output row lands on the
            # fresh grid (a piece can span 2^rank output chunks when
            # the slice origin is not chunk-aligned)
            for oidx, ooff, part in _rechunk_piece(origin, sub, out_spec):
                rows.append(_row(oidx, part))
                offs.append(ooff)
                keys.append("_".join(str(v) for v in oidx))
        out = _emit(rows)
        if not aligned:
            out = out.append_column(
                "off", pa.array(offs, pa.list_(pa.int64()))
            ).append_column("key", pa.array(keys, pa.string()))
        return out

    pieces = ds.map_batches(fn, batch_format="pyarrow")
    if aligned:
        return pieces, out_spec

    # one groupby merges sub-chunk pieces landing in the same output
    # chunk (unaligned slices only)
    def merge(g: pa.Table) -> pa.Table:
        rows = list(_iter_rows(g, spec.dtype))
        idx = rows[0][0]
        cs = out_spec.chunk_shape(idx)
        acc = np.zeros(cs, dtype=spec.dtype)
        base = [i * c for i, c in zip(idx, out_spec.chunks)]
        offs = g.column("off").to_pylist()
        for (_ix, arr), off in zip(rows, offs):
            sel = tuple(
                slice(o - b, o - b + s)
                for o, b, s in zip(off, base, arr.shape)
            )
            acc[sel] = arr
        return _emit([_row(idx, acc)])

    return pieces.groupby("key").map_groups(
        merge, batch_format="pyarrow"
    ), out_spec


def _rechunk_piece(origin, sub, out_spec: MDSpec):
    """Split a cropped piece (at global output offset ``origin``) onto
    the output chunk grid."""
    rank = len(origin)
    # ranges of output chunk indices touched per dim
    lo = [origin[d] // out_spec.chunks[d] for d in range(rank)]
    hi = [
        (origin[d] + sub.shape[d] - 1) // out_spec.chunks[d]
        for d in range(rank)
    ]
    out = []
    for lin in np.ndindex(*[h - l + 1 for l, h in zip(lo, hi)]):
        oidx = [lo[d] + lin[d] for d in range(rank)]
        sel, ooff = [], []
        for d in range(rank):
            cs = out_spec.chunks[d]
            s = max(oidx[d] * cs, origin[d])
            e = min((oidx[d] + 1) * cs, origin[d] + sub.shape[d])
            sel.append(slice(s - origin[d], e - origin[d]))
            ooff.append(s)
        out.append((oidx, ooff, np.ascontiguousarray(sub[tuple(sel)])))
    return out


def mdim_calc(ds, spec: MDSpec, fn_elem, out_dtype: str | None = None):
    """Elementwise map (pixel-function/mdim math analog)."""
    dt = out_dtype or spec.dtype

    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for idx, arr in _iter_rows(t, spec.dtype):
            rows.append(_row(idx, np.ascontiguousarray(
                fn_elem(arr).astype(dt))))
        return _emit(rows)

    return ds.map_batches(fn, batch_format="pyarrow"), MDSpec(
        spec.shape, spec.chunks, dt
    )


def mdim_reduce(ds, spec: MDSpec, op: str, axis: int):
    """Reduce one dimension (sum/min/max/mean): per-chunk partials,
    ONE groupby shuffle on the surviving chunk index, local merge.
    mean = exact integer sum / dim size (single final division)."""
    inner = {"sum": np.sum, "mean": np.sum,
             "min": np.min, "max": np.max}[op]
    merge_np = {"sum": np.add, "mean": np.add,
                "min": np.minimum, "max": np.maximum}[op]
    acc_dt = "int64" if spec.dtype.startswith(("int", "uint")) else "float64"

    def partial(t: pa.Table) -> pa.Table:
        rows, keys = [], []
        for idx, arr in _iter_rows(t, spec.dtype):
            part = inner(arr.astype(acc_dt), axis=axis)
            oidx = [v for d, v in enumerate(idx) if d != axis]
            rows.append(_row(oidx, np.ascontiguousarray(part)))
            keys.append("_".join(str(v) for v in oidx))
        out = _emit(rows)
        return out.append_column("key", pa.array(keys, pa.string()))

    out_shape = [s for d, s in enumerate(spec.shape) if d != axis]
    out_chunks = [c for d, c in enumerate(spec.chunks) if d != axis]
    out_spec = MDSpec(out_shape, out_chunks,
                      "float64" if op == "mean" else acc_dt)

    nd = float(spec.shape[axis])

    def merge(g: pa.Table) -> pa.Table:
        rows = list(_iter_rows(g, acc_dt))
        acc = rows[0][1].copy()
        for _, arr in rows[1:]:
            acc = merge_np(acc, arr)
        if op == "mean":
            acc = acc.astype(np.float64) / nd
        return _emit([_row(rows[0][0], acc)])

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "key"
    ).map_groups(merge, batch_format="pyarrow"), out_spec


def mdim_resample2x(ds, spec: MDSpec, axes: tuple[int, int]):
    """GetResampled 2x average over two dims (chunk shapes along those
    dims must be even -> pure per-chunk map, no halo).  Integer input
    rounds half up like the overview reducer."""
    a0, a1 = axes
    for a in axes:
        if spec.chunks[a] % 2 or spec.shape[a] % 2:
            raise ValueError("resample2x needs even chunk/shape on axes")

    def red2(v: np.ndarray, ax: int) -> np.ndarray:
        sh = list(v.shape)
        return v.reshape(
            sh[:ax] + [sh[ax] // 2, 2] + sh[ax + 1:]
        ).sum(axis=ax + 1)

    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for idx, arr in _iter_rows(t, spec.dtype):
            v = red2(red2(arr.astype(np.int64), a0), a1)
            rows.append(_row(idx, np.ascontiguousarray(
                ((v + 2) // 4).astype(spec.dtype))))
        return _emit(rows)

    out_shape = [
        s // 2 if d in axes else s for d, s in enumerate(spec.shape)
    ]
    out_chunks = [
        c // 2 if d in axes else c for d, c in enumerate(spec.chunks)
    ]
    return ds.map_batches(fn, batch_format="pyarrow"), MDSpec(
        out_shape, out_chunks, spec.dtype
    )


def mdim_chunk_checksums(ds, spec: MDSpec, op_tag: str):
    """One (image_id, op, cs) row per chunk — the GDAL checksum over
    the chunk buffer (float path for float dtypes)."""
    from ..functions import checksum

    is_float = spec.dtype.startswith("float")

    def fn(t: pa.Table) -> pa.Table:
        ids, css = [], []
        for idx, arr in _iter_rows(t, spec.dtype):
            ids.append("chunk_" + "_".join(str(v) for v in idx))
            flat = arr.reshape(1, -1)
            if is_float:
                cs = checksum.checksum_float_band(flat)
            else:
                cs = checksum.checksum_band(flat)  # any non-negative int
            css.append(int(cs))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "op": pa.array([op_tag] * len(ids), pa.string()),
                "cs": pa.array(css, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
