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

__all__ = ["write_zarr", "read_zarr", "zarr_info",
           "write_zarr3", "read_zarr3", "zarr3_info"]


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

# ----------------------------------------------------------- Zarr v3
#
# The current Zarr spec (v3): one ``zarr.json`` array document
# (node_type "array", regular chunk grid, "default" chunk-key
# encoding -> keys ``c/i/j`` in nested directories, codec CHAIN
# ["bytes" (little-endian) and optionally "gzip"]).  GDAL's Zarr
# driver reads both formats (frmts/zarr); the engine mirrors that.
# Note the v3 "gzip" codec is REAL gzip framing (RFC 1952), not the
# zlib stream v2's numcodecs-zlib uses — wbits=31 below.

_V3_DTYPES = {
    "int8": "<i1", "int16": "<i2", "int32": "<i4", "int64": "<i8",
    "uint8": "<u1", "uint16": "<u2", "uint32": "<u4", "uint64": "<u8",
    "float32": "<f4", "float64": "<f8",
}


def _v3_name_of_dtype(dtype) -> str:
    dt = np.dtype(dtype)
    for name, code in _V3_DTYPES.items():
        if np.dtype(code) == dt.newbyteorder("<"):
            return name
    raise ValueError(f"Zarr v3: dtype {dt} unsupported")


def _gzip_compress(raw: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, 31)
    return co.compress(raw) + co.flush()


def _gzip_decompress(raw: bytes) -> bytes:
    return zlib.decompress(raw, 31)


def write_zarr3(ds, spec: MDSpec, path: str, *,
                codec: str | None = "gzip", level: int = 1,
                fill_value=0, attrs: dict | None = None,
                resume: bool = True):
    """Distributed Zarr v3 sink: the driver writes ``zarr.json``,
    every Ray task writes its own ``c/i/j`` chunk files (atomic
    rename, resumable).  Codec chain: ["bytes"] or
    ["bytes", "gzip"]."""
    if codec not in (None, "gzip"):
        raise ValueError(f"unsupported v3 codec {codec!r} "
                         "(null / gzip)")
    os.makedirs(path, exist_ok=True)
    codecs = [{"name": "bytes",
               "configuration": {"endian": "little"}}]
    if codec == "gzip":
        codecs.append({"name": "gzip",
                       "configuration": {"level": int(level)}})
    doc = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(spec.shape),
        "data_type": _v3_name_of_dtype(spec.dtype),
        "chunk_grid": {"name": "regular",
                       "configuration":
                           {"chunk_shape": list(spec.chunks)}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "fill_value": fill_value,
        "codecs": codecs,
        "attributes": attrs or {},
    }
    with open(os.path.join(path, "zarr.json"), "w") as fh:
        json.dump(doc, fh, indent=2)
    dtype, chunks = spec.dtype, spec.chunks
    le = np.dtype(dtype).newbyteorder("<")

    def sink(t: pa.Table) -> pa.Table:
        names, nbytes, wrote = [], [], []
        for idx, shape, data in zip(t.column("chunk").to_pylist(),
                                    t.column("shape").to_pylist(),
                                    t.column("data").to_pylist()):
            arr = _arr(idx, shape, data, dtype)
            if tuple(arr.shape) != chunks:
                full = np.full(chunks, fill_value, dtype=dtype)
                full[tuple(slice(0, s) for s in arr.shape)] = arr
                arr = full
            raw = np.ascontiguousarray(arr).astype(le).tobytes()
            if codec == "gzip":
                raw = _gzip_compress(raw, level)
            name = "c/" + "/".join(str(int(i)) for i in idx)
            final = os.path.join(path, name)
            skip = resume and os.path.exists(final)
            if not skip:
                os.makedirs(os.path.dirname(final), exist_ok=True)
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


def zarr3_info(path: str) -> dict:
    with open(os.path.join(path, "zarr.json")) as fh:
        doc = json.load(fh)
    if doc.get("zarr_format") != 3 or doc.get("node_type") != "array":
        raise ValueError(f"{path}: not a Zarr v3 array")
    if doc["chunk_grid"]["name"] != "regular":
        raise ValueError("only regular chunk grids are supported")
    cke = doc.get("chunk_key_encoding",
                  {"name": "default", "configuration":
                   {"separator": "/"}})
    if cke["name"] != "default":
        raise ValueError(f"chunk key encoding {cke['name']!r} "
                         "unsupported")
    codecs = doc.get("codecs", [])
    names = [c["name"] for c in codecs]
    if names not in (["bytes"], ["bytes", "gzip"]):
        raise ValueError(f"codec chain {names} unsupported "
                         "(bytes [+ gzip])")
    if codecs[0].get("configuration", {}).get("endian",
                                              "little") != "little":
        raise ValueError("only little-endian bytes codec supported")
    return doc


def read_zarr3(path: str, *, parallelism: int = 16):
    """Ray Dataset of chunk rows over a Zarr v3 array + its MDSpec
    (the read_zarr contract; missing chunks -> fill_value)."""
    import ray.data as rd

    doc = zarr3_info(path)
    dtype = str(np.dtype(_V3_DTYPES[doc["data_type"]]))
    spec = MDSpec(doc["shape"],
                  doc["chunk_grid"]["configuration"]["chunk_shape"],
                  dtype)
    gz = [c["name"] for c in doc["codecs"]] == ["bytes", "gzip"]
    fill = doc.get("fill_value", 0)
    sep = doc["chunk_key_encoding"]["configuration"].get("separator",
                                                         "/")
    grid = spec.grid
    n = int(np.prod(grid))

    def fetch(t: pa.Table) -> pa.Table:
        rows = []
        for lin in t.column("id").to_pylist():
            idx = np.unravel_index(int(lin), grid)
            cs = spec.chunk_shape(idx)
            f = os.path.join(
                path, "c" + sep + sep.join(str(int(i)) for i in idx))
            if os.path.exists(f):
                with open(f, "rb") as fh:
                    raw = fh.read()
                if gz:
                    raw = _gzip_decompress(raw)
                arr = np.frombuffer(raw, dtype=dtype).reshape(
                    spec.chunks)
                if cs != spec.chunks:
                    arr = arr[tuple(slice(0, s) for s in cs)]
            else:
                arr = np.full(cs, fill, dtype=dtype)
            rows.append(_row(idx, np.ascontiguousarray(arr)))
        return _emit(rows)

    ids = rd.range(n, override_num_blocks=min(parallelism, n))
    return ids.map_batches(fetch, batch_format="pyarrow"), spec

