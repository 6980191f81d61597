"""netCDF classic (CDF-1 / CDF-2) source / sink for the multidim
engine.

Reference analog: the netCDF driver (frmts/netcdf/) over the GDAL
multidim model.  This implements the PUBLIC classic file format (the
self-contained CDF-1/CDF-2 binary layout — not netCDF-4/HDF5): magic
'CDF\\x01'/'CDF\\x02', big-endian header with dimension / global-
attribute / variable lists (4-byte-padded names and values), then
each fixed variable's data contiguous row-major big-endian at its
``begin`` offset (CDF-2 widens ``begin`` to 8 bytes).  Record
(unlimited) dimensions are out of scope — fixed variables only, which
is what the engine's MDSpec model maps to.

mdim mapping: a variable reads into the chunk-row Dataset convention
(stages/mdim.py) chunked as FIRST-AXIS SLABS — a slab of a row-major
array is one contiguous byte range, so every Ray task performs a
single ranged read (the natural parallel access pattern for this
format; the Zarr sink remains the scale path for writes)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from ..stages.mdim import MDSpec, _emit, _row

__all__ = ["write_netcdf", "read_netcdf", "netcdf_info"]

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

#: nc_type -> (big-endian numpy dtype, size)
_NC_TYPES = {
    1: ">i1", 3: ">i2", 4: ">i4", 5: ">f4", 6: ">f8",
}
_NC_OF_NP = {
    "int8": 1, "int16": 3, "int32": 4, "float32": 5, "float64": 6,
    # int64 is not representable in classic netCDF
}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((-len(b)) % 4)


def _name(b: str) -> bytes:
    raw = b.encode("utf-8")
    return struct.pack(">I", len(raw)) + _pad4(raw)


def _read_name(buf: bytes, pos: int) -> tuple[str, int]:
    (n,) = struct.unpack_from(">I", buf, pos)
    pos += 4
    s = buf[pos:pos + n].decode("utf-8")
    return s, pos + n + ((-n) % 4)


def _att_bytes(name: str, value) -> bytes:
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return _name(name) + struct.pack(">II", 2, len(raw)) + _pad4(raw)
    arr = np.asarray(value)
    if arr.dtype.kind == "f":
        nct, fmt = 6, ">f8"
    else:
        nct, fmt = 4, ">i4"
    flat = np.atleast_1d(arr).astype(fmt)
    return (_name(name) + struct.pack(">II", nct, flat.size)
            + _pad4(flat.tobytes()))


def _read_atts(buf: bytes, pos: int) -> tuple[dict, int]:
    tag, n = struct.unpack_from(">II", buf, pos)
    pos += 8
    if tag not in (0, _NC_ATTRIBUTE):
        raise ValueError(f"bad attribute list tag {tag}")
    out = {}
    for _ in range(n):
        name, pos = _read_name(buf, pos)
        nct, cnt = struct.unpack_from(">II", buf, pos)
        pos += 8
        if nct == 2:  # NC_CHAR
            out[name] = buf[pos:pos + cnt].decode("utf-8")
            pos += cnt + ((-cnt) % 4)
        else:
            dt = _NC_TYPES[nct]
            sz = np.dtype(dt).itemsize
            vals = np.frombuffer(buf, dt, cnt, pos)
            out[name] = vals.tolist() if cnt > 1 else vals[0].item()
            pos += cnt * sz + ((-(cnt * sz)) % 4)
    return out, pos


def write_netcdf(path: str, variables: dict, dims: dict,
                 attrs: dict | None = None, version: int = 2,
                 record_dim: str | None = None) -> None:
    """Write variables to a classic netCDF file.

    ``dims``: ordered {name: length}; ``variables``: {name: (dim_names
    tuple, ndarray)} — arrays must match their dims and use a classic-
    representable dtype (int8/16/32, float32/64).  ``version`` 1 =
    CDF-1 (32-bit offsets), 2 = CDF-2 (64-bit).  ``record_dim`` names
    the unlimited dimension: it is stored with length 0, its actual
    length becomes numrecs, and every variable whose FIRST dim is the
    record dim writes into the interleaved record section (per-record
    chunks padded to 4 bytes unless there is exactly one record
    variable — the classic-format special case)."""
    if version not in (1, 2):
        raise ValueError("classic netCDF is version 1 or 2")
    dim_names = list(dims)
    numrecs = 0
    if record_dim is not None:
        if record_dim not in dims:
            raise ValueError(f"record_dim {record_dim!r} not in dims")
        numrecs = int(dims[record_dim])
    header = bytearray(b"CDF" + bytes([version]))
    header += struct.pack(">I", numrecs)
    header += struct.pack(">II", _NC_DIMENSION, len(dims))
    for dname in dim_names:
        ln = 0 if dname == record_dim else int(dims[dname])
        header += _name(dname) + struct.pack(">I", ln)
    a = attrs or {}
    header += struct.pack(">II", _NC_ATTRIBUTE if a else 0, len(a))
    for k, v in a.items():
        header += _att_bytes(k, v)
    # variable list: sizes depend on begin width
    header += struct.pack(">II", _NC_VARIABLE, len(variables))
    fixed_entries, rec_entries = [], []
    for vname, (vdims, arr) in variables.items():
        arr = np.asarray(arr)
        if str(arr.dtype) not in _NC_OF_NP:
            raise ValueError(
                f"{vname}: dtype {arr.dtype} not representable in "
                "classic netCDF (int64 is not; cast first)")
        if tuple(arr.shape) != tuple(int(dims[d]) for d in vdims):
            raise ValueError(f"{vname}: shape {arr.shape} != dims {vdims}")
        is_rec = bool(vdims) and vdims[0] == record_dim \
            and record_dim is not None
        if record_dim is not None and record_dim in vdims[1:]:
            raise ValueError(
                f"{vname}: the record dim must be the FIRST dimension")
        nct = _NC_OF_NP[str(arr.dtype)]
        sz = np.dtype(_NC_TYPES[nct]).itemsize
        if is_rec:
            per_rec = int(np.prod(arr.shape[1:], dtype=np.int64)) * sz
            vsize = per_rec + ((-per_rec) % 4)
        else:
            vsize = arr.size * sz
            vsize += (-vsize) % 4
        ent = _name(vname) + struct.pack(">I", len(vdims))
        for d in vdims:
            ent += struct.pack(">I", dim_names.index(d))
        ent += struct.pack(">II", 0, 0)  # empty vatt list
        ent += struct.pack(">I", nct) + struct.pack(">I", vsize)
        (rec_entries if is_rec else fixed_entries).append(
            (vname, ent, arr, nct, vsize))
    begin_w = 4 if version == 1 else 8
    n_ent = len(fixed_entries) + len(rec_entries)
    hdr_len = len(header) + sum(
        len(e[1]) + begin_w for e in fixed_entries + rec_entries)
    del n_ent
    offset = hdr_len
    body = bytearray()
    ordered = []
    for vname, ent, arr, nct, vsize in fixed_entries:
        ordered.append((ent, offset))
        raw = _pad4(np.ascontiguousarray(arr).astype(
            _NC_TYPES[nct]).tobytes())
        body += raw
        offset += len(raw)
    # record section: per-record interleave in variable order
    if rec_entries:
        single = len(rec_entries) == 1
        chunks = []
        for vname, ent, arr, nct, vsize in rec_entries:
            per_rec_raw = np.ascontiguousarray(arr).astype(
                _NC_TYPES[nct]).reshape(numrecs, -1)
            chunks.append((per_rec_raw, vsize))
            ordered.append((ent, offset))
            offset += (per_rec_raw[0].nbytes if single else vsize)
        for r in range(numrecs):
            for per_rec_raw, vsize in chunks:
                raw = per_rec_raw[r].tobytes()
                if not single:
                    raw = raw + b"\x00" * (vsize - len(raw))
                body += raw
    # emit entries in the original dict order (fixed then record order
    # matches the offsets recorded above)
    for ent, off in ordered:
        header += ent
        header += struct.pack(">I" if version == 1 else ">Q", off)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(header)
        fh.write(body)
    os.replace(tmp, path)


def netcdf_info(path: str) -> dict:
    """Parse the header: dims, global attrs, variables (dims, dtype,
    shape, begin offset)."""
    with open(path, "rb") as fh:
        head = fh.read(1 << 20)  # classic headers are small
    if head[:3] != b"CDF" or head[3] not in (1, 2):
        raise ValueError(f"{path}: not a classic netCDF file")
    version = head[3]
    (numrecs,) = struct.unpack_from(">I", head, 4)
    pos = 8
    tag, ndims = struct.unpack_from(">II", head, pos)
    pos += 8
    dims = []
    record_dim = None
    if tag == _NC_DIMENSION:
        for _ in range(ndims):
            name, pos = _read_name(head, pos)
            (ln,) = struct.unpack_from(">I", head, pos)
            pos += 4
            if ln == 0:  # the unlimited dimension: actual len = numrecs
                record_dim = name
                ln = numrecs
            dims.append((name, ln))
    attrs, pos = _read_atts(head, pos)
    tag, nvars = struct.unpack_from(">II", head, pos)
    pos += 8
    variables = {}
    for _ in range(nvars):
        name, pos = _read_name(head, pos)
        (nd,) = struct.unpack_from(">I", head, pos)
        pos += 4
        dimids = struct.unpack_from(f">{nd}I", head, pos) if nd else ()
        pos += 4 * nd
        vatts, pos = _read_atts(head, pos)
        nct, _vsize = struct.unpack_from(">II", head, pos)
        pos += 8
        if version == 1:
            (begin,) = struct.unpack_from(">I", head, pos)
            pos += 4
        else:
            (begin,) = struct.unpack_from(">Q", head, pos)
            pos += 8
        variables[name] = {
            "dims": tuple(dims[i][0] for i in dimids),
            "shape": tuple(dims[i][1] for i in dimids),
            "dtype": str(np.dtype(_NC_TYPES[nct]).newbyteorder("=")),
            "nc_type": nct,
            "vsize": _vsize,
            "begin": begin,
            "attrs": vatts,
            "record": bool(dimids) and record_dim is not None
            and dims[dimids[0]][0] == record_dim,
        }
    rec_vars = [v for v in variables.values() if v["record"]]
    if len(rec_vars) == 1:
        per = int(np.prod(rec_vars[0]["shape"][1:], dtype=np.int64)
                  ) * np.dtype(_NC_TYPES[rec_vars[0]["nc_type"]]).itemsize
        recsize = per  # single-record-var special case: unpadded
    else:
        recsize = sum(v["vsize"] for v in rec_vars)
    return {"version": version, "dims": dict(dims), "attrs": attrs,
            "variables": variables, "record_dim": record_dim,
            "numrecs": numrecs, "recsize": recsize}


def read_netcdf(path: str, var: str, *, slab: int = 0,
                parallelism: int = 16):
    """Ray Dataset of mdim chunk rows over one fixed variable + its
    MDSpec.  Chunking is first-axis slabs of ``slab`` rows (default:
    ceil(shape[0] / parallelism)) — each chunk is ONE contiguous byte
    range of the row-major variable, so each task does a single
    ranged read."""
    import ray.data as rd

    info = netcdf_info(path)
    if var not in info["variables"]:
        raise ValueError(f"no variable {var!r} in {path}; "
                         f"have {sorted(info['variables'])}")
    v = info["variables"][var]
    shape = v["shape"]
    if not shape:
        raise ValueError(f"{var} is a scalar; mdim needs >= 1 dim")
    if slab <= 0:
        slab = max(1, -(-shape[0] // parallelism))
    chunks = (slab,) + shape[1:]
    spec = MDSpec(shape, chunks, v["dtype"])
    dt_be = _NC_TYPES[v["nc_type"]]
    row_bytes = int(np.prod(shape[1:], dtype=np.int64)
                    ) * np.dtype(dt_be).itemsize
    begin = v["begin"]
    n_slabs = -(-shape[0] // slab)

    is_record = v["record"]
    recsize = info["recsize"]

    def fetch(t: pa.Table) -> pa.Table:
        rows = []
        with open(path, "rb") as fh:
            for i in t.column("id").to_pylist():
                i = int(i)
                r0 = i * slab
                nrows = min(slab, shape[0] - r0)
                if is_record and recsize != row_bytes:
                    # interleaved record section: this var's chunk of
                    # record r sits at begin + r*recsize
                    fh.seek(begin + r0 * recsize)
                    span = fh.read((nrows - 1) * recsize + row_bytes)
                    parts = [
                        np.frombuffer(span, dt_be,
                                      row_bytes // np.dtype(dt_be).itemsize,
                                      r * recsize)
                        for r in range(nrows)
                    ]
                    arr = np.stack(parts).reshape(
                        (nrows,) + shape[1:]).astype(spec.dtype)
                else:
                    fh.seek(begin + r0 * row_bytes)
                    raw = fh.read(nrows * row_bytes)
                    arr = np.frombuffer(raw, dt_be).reshape(
                        (nrows,) + shape[1:]).astype(spec.dtype)
                idx = (i,) + (0,) * (len(shape) - 1)
                rows.append(_row(idx, np.ascontiguousarray(arr)))
        return _emit(rows)

    ids = rd.range(n_slabs, override_num_blocks=min(parallelism, n_slabs))
    return ids.map_batches(fetch, batch_format="pyarrow"), spec
