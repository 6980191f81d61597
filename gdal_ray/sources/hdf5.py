"""HDF5 source/sink — a from-scratch implementation of the published
HDF5 File Format Specification for the classic interchange core (the
reference's ``frmts/hdf5`` driver links libhdf5; none of its code is
used here).

Supported surface (written AND read):

- version-0 superblock (``\\x89HDF\\r\\n\\x1a\\n`` signature, 8-byte
  offsets/lengths, end-of-file address);
- the classic root-group machinery: version-1 B-tree (node type 0)
  over symbol-table nodes (``SNOD``), a local heap (``HEAP``) holding
  link names, the root symbol-table entry with cached btree/heap
  addresses AND a Symbol Table message in the root object header;
- version-1 object headers with Dataspace (v1 simple, v2 read too),
  Datatype (class 0 fixed-point and class 1 IEEE float,
  little-endian), and version-3 CONTIGUOUS Data Layout messages;
- int8..int64 / uint8..uint64 / float32 / float64 datasets of any
  rank.

NOT supported (declared, rejected explicitly): chunked/compressed
layouts, attributes, nested groups, datatype classes beyond
fixed/float, object header continuation blocks.  The writer produces
files the reader round-trips bit-exactly; byte anchors in the tests
restate the spec layout directly.
"""

from __future__ import annotations

import os
import struct

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF
_LEAF_K = 16  # up to 2K = 32 links per symbol-table node


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


# datatype message bodies (version 1) per dtype
def _dt_body(dt: np.dtype) -> bytes:
    if dt.byteorder == ">":
        raise ValueError("HDF5 writer: little-endian dtypes only")
    if dt.kind in ("i", "u"):
        bits = bytes([0x08 if dt.kind == "i" else 0x00, 0, 0])
        props = struct.pack("<HH", 0, dt.itemsize * 8)
        cls = 0
    elif dt.kind == "f" and dt.itemsize in (4, 8):
        # bitfield 0: byte order 0 (LE), mantissa norm 2 (msb implied)
        # -> 0x20; bitfield 1: sign bit position
        if dt.itemsize == 4:
            sign, eloc, esz, mloc, msz, bias = 31, 23, 8, 0, 23, 127
        else:
            sign, eloc, esz, mloc, msz, bias = 63, 52, 11, 0, 52, 1023
        bits = bytes([0x20, sign, 0])
        props = struct.pack("<HHBBBBI", 0, dt.itemsize * 8,
                            eloc, esz, mloc, msz, bias)
        cls = 1
    else:
        raise ValueError(f"HDF5 writer: dtype {dt} unsupported")
    return bytes([0x10 | cls]) + bits + struct.pack("<I", dt.itemsize) \
        + props


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    # v1 header: version, reserved, message count, reference count,
    # header size, 4-byte pad so messages start 8-aligned
    return struct.pack("<BBHII4x", 1, 0, len(messages), 1,
                       len(blob)) + blob


def _symbol_entry(name_off: int, hdr_addr: int, cache: bytes = b"",
                  cache_type: int = 0) -> bytes:
    return struct.pack("<QQI4x", name_off, hdr_addr, cache_type) \
        + cache.ljust(16, b"\x00")


def write_hdf5(path: str, datasets: dict[str, np.ndarray]) -> None:
    """Write ``{name: array}`` as contiguous root-level HDF5 datasets."""
    if not datasets:
        raise ValueError("write_hdf5 needs >= 1 dataset")
    if len(datasets) > 2 * _LEAF_K:
        raise ValueError(f"write_hdf5: > {2 * _LEAF_K} datasets needs "
                         "a multi-node B-tree (unsupported)")
    names = sorted(datasets)
    arrays = {n: np.ascontiguousarray(datasets[n]) for n in names}
    # ---- local heap data: offset 0 reserved (empty string), names
    # NUL-terminated and 8-aligned
    heap_data = bytearray(b"\x00" * 8)
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        heap_data += _pad8(n.encode("ascii") + b"\x00")
    heap_data = bytes(heap_data)

    # ---- address plan (sequential): superblock, root header, heap
    # header, heap data, btree, snod, dataset headers, raw data
    pos = 96                      # superblock v0 with 8/8 offsets
    root_hdr_addr = pos
    root_hdr = None               # built once btree/heap addrs known
    root_hdr_size = 16 + len(_msg(0x0011, struct.pack("<QQ", 0, 0)))
    pos += root_hdr_size
    heap_hdr_addr = pos
    pos += 32                     # HEAP header
    heap_data_addr = pos
    pos += len(heap_data)
    btree_addr = pos
    # TREE: sig4 + type1 + level1 + entries2 + sib8 + sib8 + keys/child
    btree_size = 24 + 8 * (2 * _LEAF_K + 1) + 8 * 2 * _LEAF_K
    pos += btree_size
    snod_addr = pos
    snod_size = 8 + 40 * 2 * _LEAF_K
    pos += snod_size
    hdr_addr = {}
    layout_fixup = {}
    hdrs = {}
    for n in names:
        a = arrays[n]
        msgs = [
            _msg(0x0001, struct.pack("<BBB5x", 1, a.ndim, 0)
                 + b"".join(struct.pack("<Q", d) for d in a.shape)),
            _msg(0x0003, _dt_body(a.dtype)),
            _msg(0x0008, struct.pack("<BBQQ", 3, 1, 0, a.nbytes)),
        ]
        hdr = _object_header(msgs)
        hdr_addr[n] = pos
        # the layout message is last: its (padded) body starts 24
        # bytes short of the header end, address field 2 bytes in —
        # patched once data addresses are planned
        layout_fixup[n] = len(hdr) - len(_pad8(b"\x00" * 18))
        hdrs[n] = bytearray(hdr)
        pos += len(hdr)
    data_addr = {}
    for n in names:
        data_addr[n] = pos
        pos += arrays[n].nbytes
    eof = pos
    for n in names:
        off = layout_fixup[n]
        hdrs[n][off + 2:off + 10] = struct.pack("<Q", data_addr[n])

    # ---- root object header (Symbol Table message)
    root_hdr = _object_header(
        [_msg(0x0011, struct.pack("<QQ", btree_addr, heap_hdr_addr))])
    assert len(root_hdr) == root_hdr_size

    # ---- superblock
    sb = (_SIG
          + struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
          + struct.pack("<HHI", _LEAF_K, 16, 0)
          + struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
          + _symbol_entry(0, root_hdr_addr,
                          struct.pack("<QQ", btree_addr, heap_hdr_addr),
                          cache_type=1))
    assert len(sb) == 96

    # ---- heap header
    heap_hdr = (b"HEAP" + struct.pack("<B3x", 0)
                + struct.pack("<QQQ", len(heap_data), _UNDEF,
                              heap_data_addr))

    # ---- B-tree v1 (group node, level 0, one SNOD child)
    bt = bytearray(b"\x00" * btree_size)
    bt[0:4] = b"TREE"
    bt[4:6] = bytes([0, 0])                       # type 0, level 0
    bt[6:8] = struct.pack("<H", 1)                # one child
    bt[8:24] = struct.pack("<QQ", _UNDEF, _UNDEF)
    bt[24:32] = struct.pack("<Q", 0)              # key 0: "" offset
    bt[32:40] = struct.pack("<Q", snod_addr)
    bt[40:48] = struct.pack("<Q", name_off[names[-1]])  # key 1: max

    # ---- SNOD
    sn = bytearray(b"\x00" * snod_size)
    sn[0:4] = b"SNOD"
    sn[4:6] = bytes([1, 0])
    sn[6:8] = struct.pack("<H", len(names))
    for k, n in enumerate(names):
        e = _symbol_entry(name_off[n], hdr_addr[n])
        sn[8 + 40 * k:8 + 40 * (k + 1)] = e

    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(sb)
        fh.write(root_hdr)
        fh.write(heap_hdr)
        fh.write(heap_data)
        fh.write(bytes(bt))
        fh.write(bytes(sn))
        for n in names:
            fh.write(bytes(hdrs[n]))
        for n in names:
            fh.write(arrays[n].tobytes())
    os.replace(tmp, path)


def _parse_datatype(body: bytes) -> np.dtype:
    cls = body[0] & 0x0F
    ver = body[0] >> 4
    if ver not in (1, 2, 3):
        raise ValueError(f"HDF5: datatype version {ver} unsupported")
    size = struct.unpack("<I", body[4:8])[0]
    if cls == 0:
        signed = bool(body[1] & 0x08)
        be = bool(body[1] & 0x01)
        kind = "i" if signed else "u"
        return np.dtype(f"{'>' if be else '<'}{kind}{size}")
    if cls == 1:
        be = bool(body[1] & 0x01)
        if size not in (4, 8):
            raise ValueError(f"HDF5: float size {size} unsupported")
        return np.dtype(f"{'>' if be else '<'}f{size}")
    raise ValueError(f"HDF5: datatype class {cls} unsupported "
                     "(fixed/float only)")


def _parse_dataspace(body: bytes) -> tuple[int, ...]:
    ver = body[0]
    if ver == 1:
        rank, flags = body[1], body[2]
        off = 8
    elif ver == 2:
        rank, flags = body[1], body[2]
        off = 4
    else:
        raise ValueError(f"HDF5: dataspace version {ver} unsupported")
    dims = struct.unpack(f"<{rank}Q", body[off:off + 8 * rank])
    return tuple(int(d) for d in dims)


def _parse_object_header(buf: bytes, addr: int) -> dict:
    ver, _r, nmsg, _rc, hsize = struct.unpack(
        "<BBHII", buf[addr:addr + 12])
    if ver != 1:
        raise ValueError(f"HDF5: object header version {ver} unsupported")
    pos = addr + 16
    end = pos + hsize
    info: dict = {}
    for _ in range(nmsg):
        if pos >= end:
            break
        mtype, msize, _fl = struct.unpack("<HHB", buf[pos:pos + 5])
        body = buf[pos + 8:pos + 8 + msize]
        pos += 8 + msize
        if mtype == 0x0000:      # NIL
            continue
        if mtype == 0x0001:
            info["shape"] = _parse_dataspace(body)
        elif mtype == 0x0003:
            info["dtype"] = _parse_datatype(body)
        elif mtype == 0x0008:
            lver, lclass = body[0], body[1]
            if lver != 3 or lclass != 1:
                raise ValueError(
                    "HDF5: only version-3 CONTIGUOUS data layout "
                    f"supported (got v{lver} class {lclass})")
            info["data_addr"], info["data_size"] = struct.unpack(
                "<QQ", body[2:18])
        elif mtype == 0x0011:
            info["btree_addr"], info["heap_addr"] = struct.unpack(
                "<QQ", body[0:16])
        elif mtype == 0x0010:
            raise ValueError("HDF5: object header continuation blocks "
                             "unsupported")
    return info


def _walk_btree(buf: bytes, addr: int) -> list[int]:
    """v1 group B-tree -> SNOD addresses (recurses internal levels)."""
    if buf[addr:addr + 4] != b"TREE":
        raise ValueError(f"HDF5: TREE signature missing at {addr}")
    ntype, level = buf[addr + 4], buf[addr + 5]
    if ntype != 0:
        raise ValueError(f"HDF5: B-tree node type {ntype} unsupported")
    used = struct.unpack("<H", buf[addr + 6:addr + 8])[0]
    children = []
    p = addr + 24
    for k in range(used):
        child = struct.unpack("<Q", buf[p + 8:p + 16])[0]
        children.append(child)
        p += 16
    if level == 0:
        return children
    out = []
    for c in children:
        out.extend(_walk_btree(buf, c))
    return out


def _heap_name(buf: bytes, heap_addr: int, off: int) -> str:
    if buf[heap_addr:heap_addr + 4] != b"HEAP":
        raise ValueError("HDF5: HEAP signature missing")
    data_addr = struct.unpack("<Q", buf[heap_addr + 24:heap_addr + 32])[0]
    end = buf.index(b"\x00", data_addr + off)
    return buf[data_addr + off:end].decode("utf-8")


def hdf5_info(path: str) -> dict:
    """Parse the root group: ``{name: {shape, dtype, data_addr,
    data_size}}`` under ``datasets``."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:8] != _SIG:
        raise ValueError("not an HDF5 file (signature missing)")
    if buf[8] != 0:
        raise ValueError(f"HDF5: superblock version {buf[8]} unsupported")
    if buf[13] != 8 or buf[14] != 8:
        raise ValueError("HDF5: only 8-byte offsets/lengths supported")
    root_hdr_addr = struct.unpack("<Q", buf[64:72])[0]
    root = _parse_object_header(buf, root_hdr_addr)
    if "btree_addr" not in root:
        raise ValueError("HDF5: root group has no symbol table message")
    btree, heap = root["btree_addr"], root["heap_addr"]
    datasets = {}
    for snod in _walk_btree(buf, btree):
        if buf[snod:snod + 4] != b"SNOD":
            raise ValueError(f"HDF5: SNOD signature missing at {snod}")
        nsym = struct.unpack("<H", buf[snod + 6:snod + 8])[0]
        for k in range(nsym):
            e = snod + 8 + 40 * k
            noff, haddr = struct.unpack("<QQ", buf[e:e + 16])
            name = _heap_name(buf, heap, noff)
            info = _parse_object_header(buf, haddr)
            if "shape" not in info or "dtype" not in info:
                raise ValueError(f"HDF5: {name!r} lacks dataspace/"
                                 "datatype (group links unsupported)")
            datasets[name] = info
    return {"datasets": datasets}


def read_hdf5(path: str, name: str) -> np.ndarray:
    """Read one contiguous dataset fully (driver-side)."""
    info = hdf5_info(path)["datasets"]
    if name not in info:
        raise ValueError(f"no dataset {name!r}; have {sorted(info)}")
    v = info[name]
    with open(path, "rb") as fh:
        fh.seek(v["data_addr"])
        raw = fh.read(v["data_size"])
    return np.frombuffer(raw, v["dtype"]).reshape(v["shape"]).copy()


def read_hdf5_mdim(path: str, name: str, *, slab: int = 0,
                   parallelism: int = 16):
    """Ray Dataset of mdim chunk rows over one contiguous dataset
    (the sources.netcdf.read_netcdf contract): first-axis slabs, each
    task one ranged read of the row-major buffer."""
    import ray.data as rd

    from ..stages.mdim import MDSpec, _emit, _row

    v = hdf5_info(path)["datasets"]
    if name not in v:
        raise ValueError(f"no dataset {name!r}; have {sorted(v)}")
    v = v[name]
    shape, dt = v["shape"], v["dtype"]
    if not shape:
        raise ValueError(f"{name} is a scalar; mdim needs >= 1 dim")
    if slab <= 0:
        slab = max(1, -(-shape[0] // parallelism))
    spec = MDSpec(shape, (slab,) + shape[1:], dt.name)
    row_bytes = int(np.prod(shape[1:], dtype=np.int64)) * dt.itemsize
    base = v["data_addr"]
    n_slabs = -(-shape[0] // slab)

    def fetch(t):
        rows = []
        with open(path, "rb") as fh:
            for i in t.column("id").to_pylist():
                r0 = int(i) * slab
                nrows = min(slab, shape[0] - r0)
                fh.seek(base + r0 * row_bytes)
                raw = fh.read(nrows * row_bytes)
                arr = np.frombuffer(raw, dt).reshape(
                    (nrows,) + shape[1:])
                rows.append(_row((r0 // slab,) + (0,) * (len(shape) - 1),
                                 np.ascontiguousarray(arr)))
        return _emit(rows)

    ids = rd.range(n_slabs, override_num_blocks=min(parallelism, n_slabs))
    return ids.map_batches(fetch, batch_format="pyarrow"), spec
