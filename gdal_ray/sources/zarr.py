"""Zarr v2 source / sink for the multidim (N-D chunk-row) engine.

Reference analog: GDAL's Zarr driver (frmts/zarr/ — regular chunk
grids over the GDAL multidim model, gcore/gdalmultidim.cpp).  The
on-disk form is the public Zarr v2 spec: a directory with a
``.zarray`` JSON document (shape, chunks, dtype, compressor, fill
value, C order) and one file per chunk named by its grid index
(``i.j.k`` with the default "." separator), each holding the chunk
buffer at the FULL chunk shape (edge chunks zero-padded, per spec),
optionally compressed.

This is the file form of ``stages/mdim.py``'s chunk-row Datasets —
the mapping is 1:1 (chunk grid index -> file name, buffer -> file
body), so both directions are embarrassingly parallel and the sink is
resumable (one atomic file per chunk; existing chunks skip on
re-run).  Unlike the single-file interop sinks (GPKG/FlatGeobuf) this
layout scales: at 100 TB each Ray task reads or writes only its own
chunk files.

Compressors: ``None`` (raw) and ``"zlib"`` (stdlib) — the container
has no blosc; GDAL's Zarr driver likewise negotiates per-store
compressors.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa

from ..stages.mdim import MDSpec, _arr, _emit, _row

__all__ = ["write_zarr", "read_zarr", "zarr_info"]


def _meta_of_spec(spec: MDSpec, compressor, level: int,
                  fill_value) -> dict:
    return {
        "zarr_format": 2,
        "shape": list(spec.shape),
        "chunks": list(spec.chunks),
        "dtype": np.dtype(spec.dtype).str,
        "compressor": (
            {"id": "zlib", "level": int(level)}
            if compressor == "zlib" else None
        ),
        "fill_value": fill_value,
        "order": "C",
        "filters": None,
        "dimension_separator": ".",
    }


def _chunk_name(idx) -> str:
    return ".".join(str(int(i)) for i in idx)


def write_zarr(ds, spec: MDSpec, path: str, *, compressor: str | None =
               "zlib", level: int = 1, fill_value=0, attrs: dict | None =
               None, resume: bool = True):
    """Distributed Zarr v2 sink over a chunk-row Dataset: the driver
    writes ``.zarray`` (and ``.zattrs``), then every Ray task writes
    its own chunk files (atomic rename; existing files skip when
    ``resume``).  Edge chunks pad to the full chunk shape with
    ``fill_value`` per the spec.  Returns a Dataset of per-chunk sink
    rows (name, nbytes, written)."""
    if compressor not in (None, "zlib"):
        raise ValueError(f"unsupported compressor {compressor!r}")
    os.makedirs(path, exist_ok=True)
    meta = _meta_of_spec(spec, compressor, level, fill_value)
    with open(os.path.join(path, ".zarray"), "w") as fh:
        json.dump(meta, fh, indent=2)
    if attrs is not None:
        with open(os.path.join(path, ".zattrs"), "w") as fh:
            json.dump(attrs, fh, indent=2)
    dtype, chunks = spec.dtype, spec.chunks

    def sink(t: pa.Table) -> pa.Table:
        names, nbytes, wrote = [], [], []
        for idx, shape, data in zip(t.column("chunk").to_pylist(),
                                    t.column("shape").to_pylist(),
                                    t.column("data").to_pylist()):
            arr = _arr(idx, shape, data, dtype)
            if tuple(arr.shape) != chunks:  # pad edge chunk (spec)
                full = np.full(chunks, fill_value, dtype=dtype)
                full[tuple(slice(0, s) for s in arr.shape)] = arr
                arr = full
            raw = np.ascontiguousarray(arr).tobytes()
            if compressor == "zlib":
                raw = zlib.compress(raw, level)
            name = _chunk_name(idx)
            final = os.path.join(path, name)
            skip = resume and os.path.exists(final)
            if not skip:
                tmp = final + f".tmp.{os.getpid()}"
                with open(tmp, "wb") as fh:
                    fh.write(raw)
                os.replace(tmp, final)
            names.append(name)
            nbytes.append(len(raw))
            wrote.append(not skip)
        return pa.table({
            "name": pa.array(names, pa.string()),
            "nbytes": pa.array(nbytes, pa.int64()),
            "written": pa.array(wrote, pa.bool_()),
        })

    return ds.map_batches(sink, batch_format="pyarrow")


def zarr_info(path: str) -> dict:
    with open(os.path.join(path, ".zarray")) as fh:
        meta = json.load(fh)
    if meta.get("zarr_format") != 2:
        raise ValueError(f"{path}: not a Zarr v2 array")
    if meta.get("order", "C") != "C":
        raise ValueError("only C-order Zarr arrays are supported")
    if meta.get("filters"):
        raise ValueError("Zarr filters are not supported")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") != "zlib":
        raise ValueError(
            f"unsupported Zarr compressor {comp.get('id')!r} "
            "(supported: null, zlib)")
    attrs = None
    zattrs = os.path.join(path, ".zattrs")
    if os.path.exists(zattrs):
        with open(zattrs) as fh:
            attrs = json.load(fh)
    return {"meta": meta, "attrs": attrs}


def read_zarr(path: str, *, parallelism: int = 16):
    """Ray Dataset of chunk rows over a Zarr v2 array + its MDSpec.
    The chunk grid enumerates deterministically from the metadata (no
    directory listing); each task reads/decompresses its chunk files,
    cropping edge chunks back to their logical shape.  Missing chunk
    files materialize as ``fill_value`` per the spec."""
    import ray.data as rd

    info = zarr_info(path)
    meta = info["meta"]
    dtype = str(np.dtype(meta["dtype"]))
    spec = MDSpec(meta["shape"], meta["chunks"], dtype)
    comp = meta.get("compressor")
    fill = meta.get("fill_value", 0)
    sep = meta.get("dimension_separator", ".")
    grid = spec.grid
    n = int(np.prod(grid))

    def fetch(t: pa.Table) -> pa.Table:
        rows = []
        for lin in t.column("id").to_pylist():
            idx = np.unravel_index(int(lin), grid)
            cs = spec.chunk_shape(idx)
            f = os.path.join(path,
                             sep.join(str(int(i)) for i in idx))
            if os.path.exists(f):
                with open(f, "rb") as fh:
                    raw = fh.read()
                if comp is not None:
                    raw = zlib.decompress(raw)
                arr = np.frombuffer(raw, dtype=dtype).reshape(spec.chunks)
                if cs != spec.chunks:
                    arr = arr[tuple(slice(0, s) for s in cs)]
            else:
                arr = np.full(cs, fill, dtype=dtype)
            rows.append(_row(idx, np.ascontiguousarray(arr)))
        return _emit(rows)

    ids = rd.range(n, override_num_blocks=min(parallelism, n))
    return ids.map_batches(fetch, batch_format="pyarrow"), spec
