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
  little-endian), version-3 CONTIGUOUS and CHUNKED Data Layout
  messages (node-type-1 chunk B-trees, deflate filter pipeline — the
  netCDF-4/h5py layout), and Attribute messages (0x000C: numeric
  scalars/1-D arrays + ASCII strings);
- NESTED GROUPS: ``a/b/dset`` paths create per-group B-tree/heap/SNOD
  machinery identical to the root's (read side recurses, cycle-
  bounded);
- int8..int64 / uint8..uint64 / float32 / float64 datasets of any
  rank.

NOT supported (declared, rejected explicitly): filters beyond
deflate, datatype classes beyond fixed/float/string, object header
continuation blocks, non-symbol-table (\"new style\") group links.
The writer produces files the reader round-trips bit-exactly; byte
anchors in the tests restate the spec layout directly.
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


def _attr_msg(name: str, value) -> bytes:
    """Attribute message (0x000C) version 1: numeric scalars / 1-D
    arrays, or a fixed-length ASCII string (datatype class 3,
    NUL-padded) — the CF-convention metadata shape."""
    if isinstance(value, str):
        raw = value.encode("utf-8")
        dt_body = bytes([0x13, 0, 0, 0]) + struct.pack(
            "<I", max(len(raw), 1))
        sp_body = struct.pack("<BBB5x", 1, 0, 0)     # scalar
        data = raw if raw else b"\x00"
    else:
        # np.ascontiguousarray would promote 0-d to 1-d; keep scalars
        # scalar (tobytes copies contiguously either way)
        arr = np.asarray(value)
        if arr.ndim > 1:
            raise ValueError(f"attribute {name!r}: rank > 1 unsupported")
        dt_body = _dt_body(arr.dtype)
        if arr.ndim == 0:
            sp_body = struct.pack("<BBB5x", 1, 0, 0)
        else:
            sp_body = struct.pack("<BBB5x", 1, 1, 0) \
                + struct.pack("<Q", arr.shape[0])
        data = arr.tobytes()
    nm = name.encode("ascii") + b"\x00"
    body = (struct.pack("<BBHHH", 1, 0, len(nm), len(dt_body),
                        len(sp_body))
            + _pad8(nm) + _pad8(dt_body) + _pad8(sp_body) + data)
    return _msg(0x000C, body)


def _chunk_grid(shape, chunk):
    """Chunk-origin offsets per dimension (edge chunks stored FULL
    size per the spec, padded with zeros)."""
    import itertools

    ranges = [range(0, s, c) for s, c in zip(shape, chunk)]
    return list(itertools.product(*ranges))


def _shuffle(raw: bytes, itemsize: int) -> bytes:
    """HDF5 shuffle filter (id 2): byte-transpose so each element's
    k-th bytes are contiguous (improves deflate on floats)."""
    if itemsize <= 1:
        return raw
    a = np.frombuffer(raw, np.uint8).reshape(-1, itemsize)
    return np.ascontiguousarray(a.T).tobytes()


def _unshuffle(raw: bytes, itemsize: int) -> bytes:
    if itemsize <= 1:
        return raw
    a = np.frombuffer(raw, np.uint8).reshape(itemsize, -1)
    return np.ascontiguousarray(a.T).tobytes()


def write_hdf5(path: str, datasets: dict[str, np.ndarray], *,
               chunks: dict[str, tuple] | None = None,
               compress: dict[str, int] | None = None,
               shuffle: set | frozenset | list | None = None,
               attrs: dict[str, dict] | None = None) -> None:
    """Write ``{name: array}`` HDF5 datasets; ``"/"``-separated names
    create NESTED GROUPS (each group is its own v1 B-tree + local heap
    + SNOD symbol table, exactly like the root).

    Default layout is CONTIGUOUS.  ``chunks={name: chunk_shape}``
    switches a dataset to CHUNKED (version-1 node-type-1 B-tree over
    whole chunks, zero-padded at the edges); ``compress={name: level}``
    adds the deflate filter (id 1) to a chunked dataset — the layout
    netCDF-4 / h5py files actually use — and ``shuffle={names}`` puts
    the byte-transpose shuffle filter (id 2) in front of it (the h5py
    shuffle=True float path).  ``attrs={key: {attr: value}}``
    attaches attribute messages (numeric scalars/1-D arrays or ASCII
    strings — the CF-convention metadata shape) where ``key`` is a
    dataset path, a group path, or ``"/"`` for the root group."""
    import zlib

    chunks = dict(chunks or {})
    compress = dict(compress or {})
    shuffle = set(shuffle or ())
    for n in shuffle:
        if n not in compress:
            raise ValueError(f"shuffle[{n!r}] requires compress[{n!r}] "
                             "(the shuffle filter precedes deflate)")
    attrs = {("" if k == "/" else k): dict(v)
             for k, v in (attrs or {}).items()}
    for n in compress:
        if n not in chunks:
            raise ValueError(f"compress[{n!r}] requires chunks[{n!r}] "
                             "(deflate applies to chunked layout)")
    if not datasets:
        raise ValueError("write_hdf5 needs >= 1 dataset")

    # ---- group tree: path "" = root; children sorted by link name
    groups: dict[str, dict] = {"": {"groups": {}, "dsets": {}}}
    for full in sorted(datasets):
        parts = full.split("/")
        if any(not p for p in parts):
            raise ValueError(f"bad dataset path {full!r}")
        gpath = ""
        for comp in parts[:-1]:
            sub = f"{gpath}/{comp}" if gpath else comp
            if sub in groups and sub in datasets:
                raise ValueError(f"{sub!r} is both group and dataset")
            groups[gpath]["groups"][comp] = sub
            groups.setdefault(sub, {"groups": {}, "dsets": {}})
            gpath = sub
        groups[gpath]["dsets"][parts[-1]] = full
    for k in attrs:
        if k not in datasets and k not in groups:
            raise ValueError(f"attrs[{k!r}]: no such dataset or group")
    gorder = sorted(groups)                     # root "" first
    for g in gorder:
        n_children = len(groups[g]["groups"]) + len(groups[g]["dsets"])
        if n_children > 2 * _LEAF_K:
            raise ValueError(
                f"group {g or '/'!r}: > {2 * _LEAF_K} links needs a "
                "multi-node B-tree (unsupported)")

    names = sorted(datasets)
    arrays = {n: np.ascontiguousarray(datasets[n]) for n in names}

    # ---- per-dataset object headers (addresses patched later)
    hdrs: dict[str, bytearray] = {}
    layout_fixup: dict[str, int] = {}
    chunk_blobs: dict[str, list[bytes]] = {}
    chunk_offs: dict[str, list[tuple]] = {}
    for n in names:
        a = arrays[n]
        msgs = [
            _msg(0x0001, struct.pack("<BBB5x", 1, a.ndim, 0)
                 + b"".join(struct.pack("<Q", d) for d in a.shape)),
            _msg(0x0003, _dt_body(a.dtype)),
        ]
        msgs += [_attr_msg(k, v)
                 for k, v in sorted(attrs.get(n, {}).items())]
        if n in chunks:
            ck = tuple(int(c) for c in chunks[n])
            if len(ck) != a.ndim:
                raise ValueError(f"chunks[{n!r}] rank != dataset rank")
            if n in compress:
                # filter pipeline v1 in WRITE order: optional shuffle
                # (id 2, client value = element size) then deflate
                # (id 1, client value = level); odd client-value
                # counts carry the spec 4-byte pad
                descs = b""
                nf = 0
                if n in shuffle:
                    descs += (struct.pack("<HHHH", 2, 0, 0, 1)
                              + struct.pack("<I4x", a.dtype.itemsize))
                    nf += 1
                descs += (struct.pack("<HHHH", 1, 0, 0, 1)
                          + struct.pack("<I4x", int(compress[n])))
                nf += 1
                msgs.append(_msg(
                    0x000B, struct.pack("<BB6x", 1, nf) + descs))
            body = (struct.pack("<BBB", 3, 2, a.ndim + 1)
                    + struct.pack("<Q", 0)            # btree (fixup)
                    + b"".join(struct.pack("<I", c) for c in ck)
                    + struct.pack("<I", a.dtype.itemsize))
            msgs.append(_msg(0x0008, body))
            offs = _chunk_grid(a.shape, ck)
            if len(offs) > 64:
                raise ValueError(
                    f"write_hdf5: {n!r} has {len(offs)} chunks; > 64 "
                    "needs a multi-node chunk B-tree (unsupported — "
                    "use larger chunks)")
            blobs = []
            for o in offs:
                sl = tuple(slice(i, i + c) for i, c in zip(o, ck))
                blk = np.zeros(ck, a.dtype)
                part = a[sl]
                blk[tuple(slice(0, s) for s in part.shape)] = part
                raw = blk.tobytes()
                if n in shuffle:
                    raw = _shuffle(raw, a.dtype.itemsize)
                blobs.append(zlib.compress(raw, int(compress[n]))
                             if n in compress else raw)
            chunk_blobs[n] = blobs
            chunk_offs[n] = offs
            layout_body_pad = len(_pad8(b"\x00" * len(body)))
        else:
            body = struct.pack("<BBQQ", 3, 1, 0, a.nbytes)
            msgs.append(_msg(0x0008, body))
            layout_body_pad = len(_pad8(b"\x00" * 18))
        hdr = _object_header(msgs)
        # the layout message is last: its (padded) body ends the
        # header; the address field (data for contiguous, btree for
        # chunked) is patched once addresses are planned
        layout_fixup[n] = len(hdr) - layout_body_pad
        hdrs[n] = bytearray(hdr)

    # ---- per-group machinery sizes: heap data (offset 0 reserved),
    # header (symbol-table msg + attrs), btree, snod
    gmeta: dict[str, dict] = {}
    for g in gorder:
        children = sorted(list(groups[g]["groups"])
                          + list(groups[g]["dsets"]))
        heap_data = bytearray(b"\x00" * 8)
        name_off = {}
        for c in children:
            name_off[c] = len(heap_data)
            heap_data += _pad8(c.encode("ascii") + b"\x00")
        amsgs = [_attr_msg(k, v)
                 for k, v in sorted(attrs.get(g, {}).items())]
        hdr_size = 16 + len(_msg(0x0011, struct.pack("<QQ", 0, 0))) \
            + sum(len(m) for m in amsgs)
        n_ch = len(children)
        gmeta[g] = dict(
            children=children, heap_data=bytes(heap_data),
            name_off=name_off, amsgs=amsgs, hdr_size=hdr_size,
            btree_size=24 + (n_ch + 1) * 8 + n_ch * 8,
            snod_size=8 + 40 * n_ch)

    # ---- address plan: superblock, [group hdr/heap hdr/heap data/
    # btree/snod]*, dataset headers, chunk btrees, raw data
    pos = 96
    for g in gorder:
        m = gmeta[g]
        m["hdr_addr"] = pos
        pos += m["hdr_size"]
        m["heap_hdr_addr"] = pos
        pos += 32
        m["heap_data_addr"] = pos
        pos += len(m["heap_data"])
        m["btree_addr"] = pos
        pos += m["btree_size"]
        m["snod_addr"] = pos
        pos += m["snod_size"]
    hdr_addr = {}
    for n in names:
        hdr_addr[n] = pos
        pos += len(hdrs[n])
    cbt_addr = {}
    for n in names:
        if n in chunk_blobs:
            cbt_addr[n] = pos
            keysize = 8 + 8 * (arrays[n].ndim + 1)
            pos += 24 + (len(chunk_blobs[n]) + 1) * keysize \
                + len(chunk_blobs[n]) * 8
    data_addr = {}
    chunk_addr: dict[str, list[int]] = {}
    for n in names:
        if n in chunk_blobs:
            chunk_addr[n] = []
            for b in chunk_blobs[n]:
                chunk_addr[n].append(pos)
                pos += len(b)
        else:
            data_addr[n] = pos
            pos += arrays[n].nbytes
    eof = pos

    # ---- patch dataset layout addresses
    for n in names:
        off = layout_fixup[n]
        if n in chunk_blobs:
            hdrs[n][off + 3:off + 11] = struct.pack("<Q", cbt_addr[n])
        else:
            hdrs[n][off + 2:off + 10] = struct.pack("<Q", data_addr[n])

    # ---- serialize groups
    def child_hdr_addr(g: str, c: str) -> int:
        sub = groups[g]["groups"].get(c)
        if sub is not None:
            return gmeta[sub]["hdr_addr"]
        return hdr_addr[groups[g]["dsets"][c]]

    gblobs: dict[str, bytes] = {}
    for g in gorder:
        m = gmeta[g]
        hdr = _object_header(
            [_msg(0x0011, struct.pack("<QQ", m["btree_addr"],
                                      m["heap_hdr_addr"]))]
            + m["amsgs"])
        assert len(hdr) == m["hdr_size"]
        heap_hdr = (b"HEAP" + struct.pack("<B3x", 0)
                    + struct.pack("<QQQ", len(m["heap_data"]), _UNDEF,
                                  m["heap_data_addr"]))
        children = m["children"]
        bt = bytearray(b"\x00" * m["btree_size"])
        bt[0:4] = b"TREE"
        bt[4:6] = bytes([0, 0])
        bt[6:8] = struct.pack("<H", 1 if children else 0)
        bt[8:24] = struct.pack("<QQ", _UNDEF, _UNDEF)
        if children:
            bt[24:32] = struct.pack("<Q", 0)      # key 0: "" offset
            bt[32:40] = struct.pack("<Q", m["snod_addr"])
            bt[40:48] = struct.pack("<Q", m["name_off"][children[-1]])
        sn = bytearray(b"\x00" * m["snod_size"])
        sn[0:4] = b"SNOD"
        sn[4:6] = bytes([1, 0])
        sn[6:8] = struct.pack("<H", len(children))
        for k, c in enumerate(children):
            e = _symbol_entry(m["name_off"][c], child_hdr_addr(g, c))
            sn[8 + 40 * k:8 + 40 * (k + 1)] = e
        gblobs[g] = (hdr + heap_hdr + m["heap_data"] + bytes(bt)
                     + bytes(sn))

    # ---- superblock (root group machinery cached in the root entry)
    root = gmeta[""]
    sb = (_SIG
          + struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
          + struct.pack("<HHI", _LEAF_K, 16, 0)
          + struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
          + _symbol_entry(0, root["hdr_addr"],
                          struct.pack("<QQ", root["btree_addr"],
                                      root["heap_hdr_addr"]),
                          cache_type=1))
    assert len(sb) == 96

    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(sb)
        for g in gorder:
            fh.write(gblobs[g])
        for n in names:
            fh.write(bytes(hdrs[n]))
        for n in names:
            if n in chunk_blobs:
                fh.write(_chunk_btree_node(arrays[n], chunks[n],
                                           chunk_blobs[n],
                                           chunk_offs[n],
                                           chunk_addr[n]))
        for n in names:
            if n in chunk_blobs:
                for b in chunk_blobs[n]:
                    fh.write(b)
            else:
                fh.write(arrays[n].tobytes())
    os.replace(tmp, path)


def _chunk_btree_node(a: np.ndarray, ck, blobs, offs, addrs) -> bytes:
    """One level-0 node-type-1 chunk B-tree (keys carry chunk byte
    size, filter mask and per-dimension offsets; trailing max key)."""
    ck = tuple(int(c) for c in ck)
    node = bytearray()
    node += b"TREE" + bytes([1, 0]) + struct.pack("<H", len(blobs))
    node += struct.pack("<QQ", _UNDEF, _UNDEF)
    for b, o, addr in zip(blobs, offs, addrs):
        node += struct.pack("<II", len(b), 0)       # size, mask
        node += b"".join(struct.pack("<Q", i) for i in o)
        node += struct.pack("<Q", 0)                # elem-dim off
        node += struct.pack("<Q", addr)
    nxt = tuple(-(-s // c) * c for s, c in zip(a.shape, ck))
    node += struct.pack("<II", 0, 0)
    node += b"".join(struct.pack("<Q", i) for i in nxt)
    node += struct.pack("<Q", 0)
    return bytes(node)

# ------------------------------------------------ new-style (1.8+) groups
#
# h5py files written with libver='latest' store group links with
# version-2 object headers ("OHDR", Jenkins-lookup3 checksummed):
# compact Link messages in the header for small groups, and DENSE
# storage (fractal heap "FRHP"/"FHDB" + version-2 B-tree
# "BTHD"/"BTLF" name index) beyond max_compact links.  The reference
# reads these through libhdf5 (frmts/hdf5); everything below is the
# published HDF5 file-format spec sections III.A.2 (v2 B-trees),
# III.D (fractal heap), IV.A.2 (v2 object headers), II (superblock
# v3).  Dataset object headers stay version 1 (v3 data layout + v1
# chunk B-tree — the on-disk dataset format through HDF5 1.8).

_M32 = 0xFFFFFFFF


def _rot32(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & _M32


def _lookup3(data: bytes, init: int = 0) -> int:
    """Jenkins lookup3 hashlittle — THE HDF5 metadata checksum
    (H5_checksum_lookup3; also the dense-link name hash)."""
    length = len(data)
    a = b = c = (0xDEADBEEF + length + init) & _M32
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i:i + 4], "little")) & _M32
        b = (b + int.from_bytes(data[i + 4:i + 8], "little")) & _M32
        c = (c + int.from_bytes(data[i + 8:i + 12], "little")) & _M32
        a = (a - c) & _M32; a ^= _rot32(c, 4); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot32(a, 6); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot32(b, 8); b = (b + a) & _M32
        a = (a - c) & _M32; a ^= _rot32(c, 16); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot32(a, 19); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot32(b, 4); b = (b + a) & _M32
        i += 12
        length -= 12
    if len(data) == 0:
        return c
    tail = data[i:] + b"\x00" * (12 - length)
    a = (a + int.from_bytes(tail[0:4], "little")) & _M32
    b = (b + int.from_bytes(tail[4:8], "little")) & _M32
    c = (c + int.from_bytes(tail[8:12], "little")) & _M32
    c ^= b; c = (c - _rot32(b, 14)) & _M32
    a ^= c; a = (a - _rot32(c, 11)) & _M32
    b ^= a; b = (b - _rot32(a, 25)) & _M32
    c ^= b; c = (c - _rot32(b, 16)) & _M32
    a ^= c; a = (a - _rot32(c, 4)) & _M32
    b ^= a; b = (b - _rot32(a, 14)) & _M32
    c ^= b; c = (c - _rot32(b, 24)) & _M32
    return c


def _msg_v2(mtype: int, body: bytes) -> bytes:
    """v2 object-header message: type(1) size(2) flags(1) body —
    no 8-byte alignment, no creation-order field (header flags
    bit 2 unset)."""
    return struct.pack("<BHB", mtype, len(body), 0) + body


def _ohdr_v2(messages: list[bytes]) -> bytes:
    """Version-2 object header: OHDR signature, flags 0x02 (4-byte
    size-of-chunk-0, no times, no attr phase change), messages,
    lookup3 checksum over signature..messages."""
    body = b"".join(messages)
    hdr = b"OHDR" + bytes([2, 0x02]) + struct.pack("<I", len(body))         + body
    return hdr + struct.pack("<I", _lookup3(hdr))


def _link_msg_body(name: str, addr: int) -> bytes:
    """Link message (type 0x06) body, hard link, flags 0: 1-byte
    name length, no link-type/creation-order/charset fields."""
    nb = name.encode("utf-8")
    if len(nb) > 255:
        raise ValueError(f"link name too long: {name!r}")
    return bytes([1, 0]) + bytes([len(nb)]) + nb + struct.pack("<Q", addr)


_FH_START_BLOCK = 512
_FH_MAX_DIRECT = 65536
_FH_MAX_HEAP_BITS = 32
_FH_TABLE_WIDTH = 4
_FH_ID_LEN = 7          # 1 flag + 4 offset + 2 length


def _fractal_heap_blobs(link_bodies: list[bytes], frhp_addr: int):
    """Serialize one FRHP header + one root FHDB direct block holding
    every link-message body (fixture-scale heaps: everything fits the
    root block — loud error otherwise).  Returns (frhp, fhdb,
    heap_ids) with ids encoding heap-space offsets (which include the
    block header, per spec)."""
    off_size = _FH_MAX_HEAP_BITS // 8
    blk_hdr = 4 + 1 + 8 + off_size + 4          # FHDB..checksum
    need = blk_hdr + sum(len(b) for b in link_bodies)
    bsize = _FH_START_BLOCK
    while bsize < need:
        bsize *= 2
    if bsize > _FH_MAX_DIRECT:
        raise ValueError("dense group too large for a single fractal-"
                         "heap direct block (unsupported)")
    fhdb_addr = frhp_addr + 4 + 1 + 2 + 2 + 1 + 4 + 8 * 12 + 2 + 8         + 8 + 2 + 2 + 8 + 2 + 4
    ids = []
    pos = blk_hdr
    payload = bytearray()
    for b in link_bodies:
        ids.append(bytes([0x00]) + pos.to_bytes(off_size, "little")
                   + len(b).to_bytes(2, "little"))
        payload += b
        pos += len(b)
    frhp = (b"FRHP" + bytes([0])
            + struct.pack("<HH", _FH_ID_LEN, 0)
            + bytes([0x02])                     # flags: cksum blocks
            + struct.pack("<I", _FH_MAX_DIRECT)
            + struct.pack("<QQ", 0, _UNDEF)     # huge next id / bt2
            + struct.pack("<Q", bsize - pos)    # free space
            + struct.pack("<Q", _UNDEF)         # free-space manager
            + struct.pack("<QQ", bsize, bsize)  # managed / allocated
            + struct.pack("<Q", pos)            # iterator offset
            + struct.pack("<Q", len(link_bodies))
            + struct.pack("<QQQQ", 0, 0, 0, 0)  # huge/tiny sizes+counts
            + struct.pack("<H", _FH_TABLE_WIDTH)
            + struct.pack("<QQ", _FH_START_BLOCK, _FH_MAX_DIRECT)
            + struct.pack("<H", _FH_MAX_HEAP_BITS)
            + struct.pack("<H", 0)              # starting rows
            + struct.pack("<Q", fhdb_addr)
            + struct.pack("<H", 0))             # root is direct block
    frhp += struct.pack("<I", _lookup3(frhp))
    assert len(frhp) == fhdb_addr - frhp_addr
    blk = bytearray(bsize)
    blk[0:4] = b"FHDB"
    blk[4] = 0
    blk[5:13] = struct.pack("<Q", frhp_addr)
    blk[13:13 + off_size] = (0).to_bytes(off_size, "little")
    blk[blk_hdr:blk_hdr + len(payload)] = payload
    # direct-block checksum (flags bit 1): computed with the checksum
    # field zeroed, stored right after the block offset
    ck = _lookup3(bytes(blk))
    blk[13 + off_size:13 + off_size + 4] = struct.pack("<I", ck)
    return frhp, bytes(blk), ids


def _bt2_blobs(records: list[tuple[int, bytes]], bthd_addr: int):
    """Version-2 B-tree, type 5 (link-name-hash index), single root
    leaf: BTHD header + BTLF leaf with records (hash u32 + 7-byte
    heap id) sorted by hash."""
    records = sorted(records, key=lambda r: r[0])
    rec_size = 4 + _FH_ID_LEN
    leaf = b"BTLF" + bytes([0, 5]) + b"".join(
        struct.pack("<I", h) + hid for h, hid in records)
    leaf += struct.pack("<I", _lookup3(leaf))
    btlf_addr = bthd_addr + 4 + 1 + 1 + 4 + 2 + 2 + 1 + 1 + 8 + 2         + 8 + 4
    bthd = (b"BTHD" + bytes([0, 5])
            + struct.pack("<I", 512)            # node size
            + struct.pack("<H", rec_size)
            + struct.pack("<H", 0)              # depth
            + bytes([100, 40])                  # split / merge %
            + struct.pack("<Q", btlf_addr)
            + struct.pack("<H", len(records))
            + struct.pack("<Q", len(records)))
    bthd += struct.pack("<I", _lookup3(bthd))
    assert len(bthd) == btlf_addr - bthd_addr
    return bthd, leaf


def write_hdf5_latest(path: str, datasets: dict[str, np.ndarray], *,
                      chunks: dict[str, tuple] | None = None,
                      compress: dict[str, int] | None = None,
                      max_compact: int = 8,
                      fixed_array: set | frozenset | list | None = None,
                      ext_array: set | frozenset | list | None = None,
                      btree2: set | frozenset | list | None = None,
                      maxshape: dict[str, tuple] | None = None,
                      fa_page_bits: int = 10,
                      ) -> None:
    """Write an HDF5 file in the 1.8+ "latest" layout (h5py
    ``libver='latest'``): superblock version 3, groups as version-2
    object headers with COMPACT Link messages (<= ``max_compact``
    children) or DENSE storage (fractal heap + v2 B-tree name index)
    beyond that.  Dataset object headers remain version 1
    (contiguous, or chunked via the v1 chunk B-tree, optional
    deflate) — the on-disk dataset format through HDF5 1.8.

    1.10 chunk indexes (v4 data layout message): ``fixed_array``
    names use index type 3 (FAHD/FADB), ``ext_array`` type 4
    (EAHD/EAIB/EADB — the library's choice for ONE unlimited
    dimension), ``btree2`` type 5 (BTHD/BTLF record type 10, the
    choice for >= 2 unlimited dimensions; non-filtered only).
    ``maxshape={name: (None, ...)}`` records unlimited maximum
    dimensions in the dataspace message.
    """
    import zlib

    chunks = dict(chunks or {})
    compress = dict(compress or {})
    fixed_array = set(fixed_array or ())
    ext_array = set(ext_array or ())
    btree2 = set(btree2 or ())
    maxshape = dict(maxshape or {})
    for n in compress:
        if n not in chunks:
            raise ValueError(f"compress[{n!r}] requires chunks[{n!r}]")
    for kind, group in (("fixed_array", fixed_array),
                        ("ext_array", ext_array), ("btree2", btree2)):
        for n in group:
            if n not in chunks:
                raise ValueError(f"{kind}[{n!r}] requires "
                                 f"chunks[{n!r}] (chunked layout)")
    overlap = (fixed_array & ext_array) | (fixed_array & btree2) \
        | (ext_array & btree2)
    if overlap:
        raise ValueError(f"conflicting chunk-index choices for "
                         f"{sorted(overlap)}")
    for n in btree2 & set(compress):
        raise ValueError(
            f"btree2[{n!r}]: filtered v2-B-tree chunk records "
            "(type 11) unsupported — use ext_array or fixed_array "
            "for compressed chunks")
    if not datasets:
        raise ValueError("write_hdf5_latest needs >= 1 dataset")

    groups: dict[str, dict] = {"": {"groups": {}, "dsets": {}}}
    for full in sorted(datasets):
        parts = full.split("/")
        if any(not p for p in parts):
            raise ValueError(f"bad dataset path {full!r}")
        gpath = ""
        for comp in parts[:-1]:
            sub = f"{gpath}/{comp}" if gpath else comp
            groups[gpath]["groups"][comp] = sub
            groups.setdefault(sub, {"groups": {}, "dsets": {}})
            gpath = sub
        groups[gpath]["dsets"][parts[-1]] = full
    gorder = sorted(groups)

    names = sorted(datasets)
    arrays = {n: np.ascontiguousarray(datasets[n]) for n in names}

    # ---- v1 dataset headers (same message set as write_hdf5)
    hdrs: dict[str, bytearray] = {}
    layout_fixup: dict[str, int] = {}
    chunk_blobs: dict[str, list[bytes]] = {}
    chunk_offs: dict[str, list[tuple]] = {}
    for n in names:
        a = arrays[n]
        if n in maxshape:
            mx = tuple(maxshape[n])
            if len(mx) != a.ndim:
                raise ValueError(f"maxshape[{n!r}] rank != dataset "
                                 "rank")
            sp_body = (struct.pack("<BBB5x", 1, a.ndim, 1)
                       + b"".join(struct.pack("<Q", d)
                                  for d in a.shape)
                       + b"".join(struct.pack(
                           "<Q", _UNDEF_ADDR if m is None else int(m))
                           for m in mx))
        else:
            sp_body = (struct.pack("<BBB5x", 1, a.ndim, 0)
                       + b"".join(struct.pack("<Q", d)
                                  for d in a.shape))
        msgs = [
            _msg(0x0001, sp_body),
            _msg(0x0003, _dt_body(a.dtype)),
        ]
        if n in chunks:
            ck = tuple(int(c) for c in chunks[n])
            if len(ck) != a.ndim:
                raise ValueError(f"chunks[{n!r}] rank != dataset rank")
            if n in compress:
                descs = (struct.pack("<HHHH", 1, 0, 0, 1)
                         + struct.pack("<I4x", int(compress[n])))
                msgs.append(_msg(0x000B,
                                 struct.pack("<BB6x", 1, 1) + descs))
            if n in fixed_array:
                # v4 chunked layout + fixed-array index (HDF5 1.10
                # libver-latest): rank 8-byte dims, index type 3,
                # page bits, FAHD address (patched later — LAST 8
                # bytes of the body)
                body = (struct.pack("<BBBBB", 4, 2, 0, a.ndim, 8)
                        + b"".join(struct.pack("<Q", c) for c in ck)
                        + struct.pack("<BB", 3, fa_page_bits)
                        + struct.pack("<Q", 0))
            elif n in ext_array:
                # index type 4 + the five 1-byte EA creation params
                body = (struct.pack("<BBBBB", 4, 2, 0, a.ndim, 8)
                        + b"".join(struct.pack("<Q", c) for c in ck)
                        + struct.pack("<BBBBBB", 4, _EA_MAX_BITS,
                                      _EA_IDX_ELEMS, _EA_DBLK_MIN,
                                      _EA_SBLK_MIN_PTRS,
                                      _EA_PAGE_BITS)
                        + struct.pack("<Q", 0))
            elif n in btree2:
                # index type 5 + node size u32 + split/merge percents
                body = (struct.pack("<BBBBB", 4, 2, 0, a.ndim, 8)
                        + b"".join(struct.pack("<Q", c) for c in ck)
                        + struct.pack("<BIBB", 5, 2048, 100, 40)
                        + struct.pack("<Q", 0))
            else:
                body = (struct.pack("<BBB", 3, 2, a.ndim + 1)
                        + struct.pack("<Q", 0)
                        + b"".join(struct.pack("<I", c) for c in ck)
                        + struct.pack("<I", a.dtype.itemsize))
            msgs.append(_msg(0x0008, body))
            offs = _chunk_grid(a.shape, ck)
            cap = 1024 if n in ext_array else 64
            if len(offs) > cap:
                raise ValueError(f"{n!r}: > {cap} chunks unsupported")
            blobs = []
            for o in offs:
                sl = tuple(slice(i, i + c) for i, c in zip(o, ck))
                blk = np.zeros(ck, a.dtype)
                part = a[sl]
                blk[tuple(slice(0, sh) for sh in part.shape)] = part
                raw = blk.tobytes()
                blobs.append(zlib.compress(raw, int(compress[n]))
                             if n in compress else raw)
            chunk_blobs[n] = blobs
            chunk_offs[n] = offs
            layout_body_pad = len(_pad8(b"\x00" * len(body)))
        else:
            body = struct.pack("<BBQQ", 3, 1, 0, a.nbytes)
            msgs.append(_msg(0x0008, body))
            layout_body_pad = len(_pad8(b"\x00" * 18))
        hdr = _object_header(msgs)
        layout_fixup[n] = len(hdr) - layout_body_pad
        hdrs[n] = bytearray(hdr)

    # ---- group header sizes depend only on child names + density
    def group_children(g):
        return sorted(list(groups[g]["groups"])
                      + list(groups[g]["dsets"]))

    def ohdr_size(g) -> int:
        children = group_children(g)
        dense = len(children) > max_compact
        size = 4 + 2 + 4 + 4                    # OHDR+ver/flags+len+ck
        size += 4 + 18                          # Link Info msg
        size += 4 + 2                           # Group Info msg
        if not dense:
            for c in children:
                size += 4 + len(_link_msg_body(c, 0))
        return size

    def dense_extra_size(g) -> tuple[int, int, int, int]:
        """(frhp, fhdb, bthd, btlf) byte sizes for a dense group."""
        children = group_children(g)
        bodies = [_link_msg_body(c, 0) for c in children]
        off_size = _FH_MAX_HEAP_BITS // 8
        blk_hdr = 4 + 1 + 8 + off_size + 4
        need = blk_hdr + sum(len(b) for b in bodies)
        bsize = _FH_START_BLOCK
        while bsize < need:
            bsize *= 2
        frhp_len = 4 + 1 + 2 + 2 + 1 + 4 + 8 * 12 + 2 + 8 + 8 + 2             + 2 + 8 + 2 + 4
        bthd_len = 4 + 1 + 1 + 4 + 2 + 2 + 1 + 1 + 8 + 2 + 8 + 4
        btlf_len = 4 + 1 + 1 + len(children) * (4 + _FH_ID_LEN) + 4
        return frhp_len, bsize, bthd_len, btlf_len

    # ---- address plan: superblock(48), group headers, dense blobs,
    # dataset headers, chunk btrees, raw data
    pos = 48
    gaddr: dict[str, int] = {}
    dense_addr: dict[str, tuple[int, int]] = {}
    for g in gorder:
        gaddr[g] = pos
        pos += ohdr_size(g)
        if len(group_children(g)) > max_compact:
            frhp_len, bsize, bthd_len, btlf_len = dense_extra_size(g)
            dense_addr[g] = (pos, pos + frhp_len + bsize)
            pos += frhp_len + bsize + bthd_len + btlf_len
    hdr_addr = {}
    for n in names:
        hdr_addr[n] = pos
        pos += len(hdrs[n])
    cbt_addr = {}
    for n in names:
        if n in chunk_blobs and n in fixed_array:
            cbt_addr[n] = pos
            entry = 16 if n in compress else 8
            pos += _fa_size(len(chunk_blobs[n]), entry, fa_page_bits)
        elif n in chunk_blobs and n in ext_array:
            cbt_addr[n] = pos
            esize = 16 if n in compress else 8
            hdr_ib, body_bytes, _d, _s = _ea_sizes(
                len(chunk_blobs[n]), esize)
            pos += hdr_ib + body_bytes
        elif n in chunk_blobs and n in btree2:
            cbt_addr[n] = pos
            pos += _bt2_chunk_size(len(chunk_blobs[n]),
                                   arrays[n].ndim)
        elif n in chunk_blobs:
            cbt_addr[n] = pos
            keysize = 8 + 8 * (arrays[n].ndim + 1)
            pos += 24 + (len(chunk_blobs[n]) + 1) * keysize \
                + len(chunk_blobs[n]) * 8
    data_addr = {}
    chunk_addr: dict[str, list[int]] = {}
    for n in names:
        if n in chunk_blobs:
            chunk_addr[n] = []
            for b in chunk_blobs[n]:
                chunk_addr[n].append(pos)
                pos += len(b)
        else:
            data_addr[n] = pos
            pos += arrays[n].nbytes
    eof = pos

    for n in names:
        off = layout_fixup[n]
        if n in chunk_blobs and n in fixed_array:
            blen = 5 + 8 * arrays[n].ndim + 2 + 8  # v4 body length
            hdrs[n][off + blen - 8:off + blen] = struct.pack(
                "<Q", cbt_addr[n])
        elif n in chunk_blobs and n in ext_array:
            blen = 5 + 8 * arrays[n].ndim + 6 + 8
            hdrs[n][off + blen - 8:off + blen] = struct.pack(
                "<Q", cbt_addr[n])
        elif n in chunk_blobs and n in btree2:
            blen = 5 + 8 * arrays[n].ndim + 7 + 8
            hdrs[n][off + blen - 8:off + blen] = struct.pack(
                "<Q", cbt_addr[n])
        elif n in chunk_blobs:
            hdrs[n][off + 3:off + 11] = struct.pack("<Q", cbt_addr[n])
        else:
            hdrs[n][off + 2:off + 10] = struct.pack("<Q", data_addr[n])

    def child_addr(g, c):
        sub = groups[g]["groups"].get(c)
        if sub is not None:
            return gaddr[sub]
        return hdr_addr[groups[g]["dsets"][c]]

    # ---- serialize groups
    gblobs: dict[str, bytes] = {}
    for g in gorder:
        children = group_children(g)
        dense = len(children) > max_compact
        if dense:
            frhp_addr, bthd_addr = dense_addr[g]
            li = _msg_v2(0x02, bytes([0, 0])
                         + struct.pack("<QQ", frhp_addr, bthd_addr))
        else:
            li = _msg_v2(0x02, bytes([0, 0])
                         + struct.pack("<QQ", _UNDEF, _UNDEF))
        msgs = [li, _msg_v2(0x0A, bytes([0, 0]))]
        if not dense:
            for c in children:
                msgs.append(_msg_v2(
                    0x06, _link_msg_body(c, child_addr(g, c))))
        blob = _ohdr_v2(msgs)
        assert len(blob) == ohdr_size(g), (g, len(blob), ohdr_size(g))
        if dense:
            bodies = [_link_msg_body(c, child_addr(g, c))
                      for c in children]
            frhp, fhdb, ids = _fractal_heap_blobs(bodies, frhp_addr)
            recs = [(_lookup3(c.encode("utf-8")), ids[k])
                    for k, c in enumerate(children)]
            bthd, btlf = _bt2_blobs(recs, bthd_addr)
            blob += frhp + fhdb + bthd + btlf
        gblobs[g] = blob

    # ---- superblock v3
    sb = (_SIG + bytes([3, 8, 8, 0])
          + struct.pack("<QQQQ", 0, _UNDEF, eof, gaddr[""]))
    sb += struct.pack("<I", _lookup3(sb))
    assert len(sb) == 48

    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(sb)
        for g in gorder:
            fh.write(gblobs[g])
        for n in names:
            fh.write(bytes(hdrs[n]))
        for n in names:
            if n in chunk_blobs and n in fixed_array:
                fh.write(_fixed_array_blobs(
                    cbt_addr[n], chunk_blobs[n], chunk_addr[n],
                    filtered=n in compress, page_bits=fa_page_bits))
            elif n in chunk_blobs and n in ext_array:
                fh.write(_ext_array_blobs(
                    cbt_addr[n], chunk_blobs[n], chunk_addr[n],
                    filtered=n in compress))
            elif n in chunk_blobs and n in btree2:
                fh.write(_bt2_chunk_blobs(
                    cbt_addr[n], chunk_addr[n], chunk_offs[n],
                    tuple(int(c) for c in chunks[n])))
            elif n in chunk_blobs:
                fh.write(_chunk_btree_node(arrays[n], chunks[n],
                                           chunk_blobs[n],
                                           chunk_offs[n],
                                           chunk_addr[n]))
        for n in names:
            if n in chunk_blobs:
                for b in chunk_blobs[n]:
                    fh.write(b)
            else:
                fh.write(arrays[n].tobytes())
    os.replace(tmp, path)


# ------------------------------------------------------------------
# Extensible-array chunk index (HDF5 1.10 "EAHD"/"EAIB"/"EADB") —
# the index HDF5 selects for chunked datasets with ONE unlimited
# dimension.  Creation parameters follow the library defaults the
# data layout message records (max_nelmts_bits=32, idx_blk_elems=4,
# data_blk_min_elems=16, sblk_min_data_ptrs=4, page_nelmts_bits=10).
# Element schedule (file-format spec, Extensible Array section):
#   - the index block stores the first ``idx_blk_elems`` elements
#     directly;
#   - super block s (0-based) holds 2^(s//2) data blocks of
#     ``data_blk_min_elems * 2^((s+1)//2)`` elements each;
#   - super blocks whose data-block count is below
#     ``sblk_min_data_ptrs`` keep their data-block ADDRESSES in the
#     index block (defaults: s=0..3 -> 6 address slots); later super
#     blocks go through secondary blocks (unsupported here — loud);
#   - total super blocks = 2 * (max_nelmts_bits - log2(idx_blk_elems)).

_EA_MAX_BITS = 32
_EA_IDX_ELEMS = 4
_EA_DBLK_MIN = 16
_EA_SBLK_MIN_PTRS = 4
_EA_PAGE_BITS = 10
_UNDEF_ADDR = 0xFFFFFFFFFFFFFFFF


def _ea_schedule():
    """-> (n_iblock_dblks, [dblk_nelmts...]) for the data blocks
    addressed directly from the index block."""
    sizes = []
    s = 0
    while True:
        ndb = 1 << (s // 2)
        if ndb >= _EA_SBLK_MIN_PTRS:
            break
        nel = _EA_DBLK_MIN * (1 << ((s + 1) // 2))
        sizes += [nel] * ndb
        s += 1
    return len(sizes), sizes


def _ea_secondary_schedule():
    """Secondary super blocks (those whose data-block count reaches
    ``sblk_min_data_ptrs``): list of (ndblks, dblk_nelmts) in super-
    block order, bounded by the registry's total super-block count."""
    nsblks_total = 2 * (_EA_MAX_BITS - (_EA_IDX_ELEMS.bit_length() - 1))
    out = []
    s = 0
    while (1 << (s // 2)) < _EA_SBLK_MIN_PTRS:
        s += 1
    for ss in range(s, nsblks_total):
        out.append((1 << (ss // 2),
                    _EA_DBLK_MIN * (1 << ((ss + 1) // 2))))
    return out


def _ea_plan(n: int, esize: int):
    """-> (direct_used [dblk nelmts], secondary_used [(ndblks_alloc,
    dblk_nelmts, ndblks_needed)], per-structure byte sizes) for n
    elements.  Secondary super blocks allocate their FULL data-block
    address slot count; only ``ndblks_needed`` data blocks exist."""
    _n_slots, sizes = _ea_schedule()
    rem = max(0, n - _EA_IDX_ELEMS)
    direct = []
    for nel in sizes:
        if rem <= 0:
            break
        direct.append(nel)
        rem -= nel
    secondary = []
    for ndb, nel in _ea_secondary_schedule():
        if rem <= 0:
            break
        need = min(ndb, -(-rem // nel))
        secondary.append((ndb, nel, need))
        rem -= need * nel
    if rem > 0:
        raise ValueError(
            f"extensible array: {n} chunks exceed the representable "
            "capacity")
    return direct, secondary


def _ea_sizes(n: int, esize: int):
    """(eahd+eaib bytes, data+secondary-block bytes, direct dblk
    nelmts, secondary plan) for n elements."""
    n_slots, _sizes = _ea_schedule()
    nsblks_total = 2 * (_EA_MAX_BITS - (_EA_IDX_ELEMS.bit_length() - 1))
    n_sblk_slots = nsblks_total - 4        # s=0..3 live in the iblock
    eaib = 4 + 1 + 1 + 8 + _EA_IDX_ELEMS * esize + n_slots * 8 \
        + n_sblk_slots * 8 + 4
    direct, secondary = _ea_plan(n, esize)
    off_bytes = (_EA_MAX_BITS + 7) // 8

    def dblk_size(nel: int) -> int:
        return 4 + 1 + 1 + 8 + off_bytes + nel * esize + 4

    body = sum(dblk_size(nel) for nel in direct)
    for ndb, nel, need in secondary:
        body += 4 + 1 + 1 + 8 + off_bytes + ndb * 8 + 4   # EASB
        body += need * dblk_size(nel)
    return 72 + eaib, body, direct, secondary


def _ext_array_blobs(eahd_addr: int, blobs: list[bytes],
                     addrs: list[int], filtered: bool) -> bytes:
    """EAHD + EAIB + EADB blobs for one chunked dataset (client 0 =
    address-only elements, client 1 = address + 4-byte stored size +
    filter mask, the fixed-array element convention)."""
    client = 1 if filtered else 0
    esize = 16 if filtered else 8
    n = len(blobs)
    hdr_ib, body_bytes, direct, secondary = _ea_sizes(n, esize)
    n_slots, _sizes = _ea_schedule()
    nsblks_total = 2 * (_EA_MAX_BITS - (_EA_IDX_ELEMS.bit_length() - 1))
    n_sblk_slots = nsblks_total - 4
    eaib_addr = eahd_addr + 72
    eaib_len = hdr_ib - 72

    def elem(k: int) -> bytes:
        if k >= n:
            e = struct.pack("<Q", _UNDEF_ADDR)
            return e + b"\x00" * 8 if filtered else e
        e = struct.pack("<Q", addrs[k])
        if filtered:
            e += struct.pack("<II", len(blobs[k]), 0)
        return e

    off_bytes = (_EA_MAX_BITS + 7) // 8
    dpos = eahd_addr + hdr_ib
    parts: list[bytes] = []
    k = _EA_IDX_ELEMS

    def emit_dblk(nel: int) -> int:
        nonlocal dpos, k
        body = bytearray(b"EADB" + bytes([0, client])
                         + struct.pack("<Q", eahd_addr)
                         + k.to_bytes(off_bytes, "little"))
        for j in range(nel):
            body += elem(k + j)
        body += struct.pack("<I", _lookup3(bytes(body)))
        parts.append(bytes(body))
        at = dpos
        dpos += len(body)
        k += nel
        return at

    # ---- direct data blocks (addressed from the index block)
    dblk_addrs = [emit_dblk(nel) for nel in direct]
    # ---- secondary blocks: EASB carries its super block's FULL
    # data-block address slot list; only the needed blocks exist
    sblk_addrs: list[int] = []
    ndblks_total = len(direct)
    sblk_bytes = 0
    sblk_elem0 = _EA_IDX_ELEMS + sum(direct)
    for ndb, nel, need in secondary:
        easb_at = dpos
        easb_len = 4 + 1 + 1 + 8 + off_bytes + ndb * 8 + 4
        dpos += easb_len
        sblk_bytes += easb_len
        here = [emit_dblk(nel) for _ in range(need)]
        ndblks_total += need
        easb = bytearray(b"EASB" + bytes([0, client])
                         + struct.pack("<Q", eahd_addr)
                         + sblk_elem0.to_bytes(off_bytes, "little"))
        for j in range(ndb):
            easb += struct.pack(
                "<Q", here[j] if j < need else _UNDEF_ADDR)
        easb += struct.pack("<I", _lookup3(bytes(easb)))
        assert len(easb) == easb_len
        parts.insert(len(parts) - need, bytes(easb))
        sblk_addrs.append(easb_at)
        sblk_elem0 += ndb * nel            # full capacity advances
    dblk_size_total = sum(len(b) for b in parts) - sblk_bytes

    # ---- header
    eahd = (b"EAHD" + bytes([0, client, esize, _EA_MAX_BITS,
                             _EA_IDX_ELEMS, _EA_DBLK_MIN,
                             _EA_SBLK_MIN_PTRS, _EA_PAGE_BITS])
            + struct.pack("<QQQQQQ", len(sblk_addrs), sblk_bytes,
                          ndblks_total, dblk_size_total, n, n)
            + struct.pack("<Q", eaib_addr))
    eahd += struct.pack("<I", _lookup3(eahd))
    assert len(eahd) == 72

    # ---- index block
    eaib = bytearray(b"EAIB" + bytes([0, client])
                     + struct.pack("<Q", eahd_addr))
    for kk in range(_EA_IDX_ELEMS):
        eaib += elem(kk)
    for j in range(n_slots):
        eaib += struct.pack(
            "<Q", dblk_addrs[j] if j < len(dblk_addrs)
            else _UNDEF_ADDR)
    for j in range(n_sblk_slots):
        eaib += struct.pack(
            "<Q", sblk_addrs[j] if j < len(sblk_addrs)
            else _UNDEF_ADDR)
    eaib += struct.pack("<I", _lookup3(bytes(eaib)))
    assert len(eaib) == eaib_len, (len(eaib), eaib_len)
    out = bytes(eahd) + bytes(eaib) + b"".join(parts)
    assert len(out) == hdr_ib + body_bytes, (len(out),
                                             hdr_ib + body_bytes)
    return out


def _bt2_chunk_blobs(bthd_addr: int, addrs: list[int],
                     offs: list[tuple], chunk: tuple) -> bytes:
    """Version-2 B-tree chunk index (record type 10, non-filtered):
    single root leaf of (chunk address + per-dim SCALED offsets)
    records in row-major chunk order — the index HDF5 selects for
    chunked datasets with >= 2 unlimited dimensions."""
    rank = len(chunk)
    rec_size = 8 + 8 * rank
    recs = []
    for a, o in zip(addrs, offs):
        scaled = tuple(oo // cc for oo, cc in zip(o, chunk))
        recs.append(struct.pack("<Q", a)
                    + b"".join(struct.pack("<Q", s) for s in scaled))
    leaf = b"BTLF" + bytes([0, 10]) + b"".join(recs)
    leaf += struct.pack("<I", _lookup3(leaf))
    btlf_addr = bthd_addr + 38
    bthd = (b"BTHD" + bytes([0, 10])
            + struct.pack("<I", 2048)
            + struct.pack("<H", rec_size)
            + struct.pack("<H", 0)
            + bytes([100, 40])
            + struct.pack("<Q", btlf_addr)
            + struct.pack("<H", len(recs))
            + struct.pack("<Q", len(recs)))
    bthd += struct.pack("<I", _lookup3(bthd))
    assert len(bthd) == 38
    return bthd + leaf


def _bt2_chunk_size(n: int, rank: int) -> int:
    return 38 + 6 + n * (8 + 8 * rank) + 4


def _fa_size(n: int, entry: int, page_bits: int) -> int:
    """Total FAHD+FADB bytes (paged when n exceeds one page)."""
    page = 1 << page_bits
    if n <= page:
        return 28 + 14 + n * entry + 4
    npages = -(-n // page)
    return 28 + 14 + (npages + 7) // 8 + 4 + n * entry + npages * 4


def _fixed_array_blobs(fahd_addr: int, blobs: list[bytes],
                       addrs: list[int], filtered: bool,
                       page_bits: int = 10) -> bytes:
    """FAHD header + FADB data block for one chunked dataset: client
    0 entries are chunk addresses, client 1 adds 4-byte stored size +
    filter mask (the 1.10 filtered-chunk element).  When the element
    count exceeds one page (2^page_bits) the data block is PAGED:
    page bitmap + header checksum, then per-page element runs each
    closed by its own checksum."""
    client = 1 if filtered else 0
    entry = 16 if filtered else 8
    n = len(blobs)
    fadb_addr = fahd_addr + 28
    fahd = (b"FAHD" + bytes([0, client, entry, page_bits])
            + struct.pack("<QQ", n, fadb_addr))
    fahd += struct.pack("<I", _lookup3(fahd))
    assert len(fahd) == 28

    def elem(k: int) -> bytes:
        e = struct.pack("<Q", addrs[k])
        if filtered:
            e += struct.pack("<II", len(blobs[k]), 0)
        return e

    page = 1 << page_bits
    head = bytearray(b"FADB" + bytes([0, client])
                     + struct.pack("<Q", fahd_addr))
    if n <= page:
        for k in range(n):
            head += elem(k)
        head += struct.pack("<I", _lookup3(bytes(head)))
        out = bytes(head)
    else:
        npages = -(-n // page)
        bitmap = bytearray((npages + 7) // 8)
        for pg in range(npages):
            bitmap[pg // 8] |= 1 << (pg % 8)
        head += bitmap
        head += struct.pack("<I", _lookup3(bytes(head)))
        body = bytearray()
        k = 0
        for pg in range(npages):
            pgbuf = bytearray()
            for _ in range(min(page, n - pg * page)):
                pgbuf += elem(k)
                k += 1
            pgbuf += struct.pack("<I", _lookup3(bytes(pgbuf)))
            body += pgbuf
        out = bytes(head) + bytes(body)
    assert len(out) + 28 == _fa_size(n, entry, page_bits)
    return fahd + out


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
    if buf[addr:addr + 4] == b"OHDR":
        return _parse_object_header_v2(buf, addr)
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
        _apply_message(info, mtype, body)
    return info


def _parse_object_header_v2(buf: bytes, addr: int) -> dict:
    """Version-2 ("OHDR") object header: flag-sized chunk-0 length,
    5-byte message headers, lookup3 checksum (verified)."""
    if buf[addr:addr + 4] != b"OHDR":
        raise ValueError(f"HDF5: OHDR signature missing at {addr}")
    ver, flags = buf[addr + 4], buf[addr + 5]
    if ver != 2:
        raise ValueError(f"HDF5: OHDR version {ver} unsupported")
    pos = addr + 6
    if flags & 0x20:            # times stored
        pos += 16
    if flags & 0x10:            # attribute phase-change stored
        pos += 4
    c0sz = 1 << (flags & 0x03)
    hsize = int.from_bytes(buf[pos:pos + c0sz], "little")
    pos += c0sz
    end = pos + hsize
    stored_ck = struct.unpack("<I", buf[end:end + 4])[0]
    calc = _lookup3(buf[addr:end])
    if stored_ck != calc:
        raise ValueError(f"HDF5: OHDR checksum mismatch at {addr}")
    track_order = bool(flags & 0x04)
    info: dict = {}
    while pos + 4 <= end:
        mtype, msize, _fl = struct.unpack("<BHB", buf[pos:pos + 4])
        pos += 4
        if track_order:
            pos += 2
        body = buf[pos:pos + msize]
        pos += msize
        if mtype == 0x00:
            continue
        if mtype == 0x02:       # Link Info
            lflags = body[1]
            p2 = 2 + (8 if lflags & 0x01 else 0)
            fheap, bt2 = struct.unpack("<QQ", body[p2:p2 + 16])
            if fheap != _UNDEF:
                info["dense_fheap"] = fheap
                info["dense_bt2"] = bt2
            info.setdefault("links", {})
        elif mtype == 0x06:     # Link message (compact)
            nm, a2 = _parse_link_body(body)
            info.setdefault("links", {})[nm] = a2
        elif mtype == 0x0A:     # Group Info
            info.setdefault("links", {})
        else:
            _apply_message(info, mtype, body)
    return info


def _parse_link_body(body: bytes) -> tuple[str, int]:
    """Link message body -> (name, object header address); hard links
    only (the layout the engine and h5py group trees use)."""
    ver, flags = body[0], body[1]
    if ver != 1:
        raise ValueError(f"HDF5: link message version {ver} unsupported")
    p = 2
    ltype = 0
    if flags & 0x08:
        ltype = body[p]
        p += 1
    if flags & 0x04:            # creation order
        p += 8
    if flags & 0x10:            # charset
        p += 1
    lsz = 1 << (flags & 0x03)
    nlen = int.from_bytes(body[p:p + lsz], "little")
    p += lsz
    name = body[p:p + nlen].decode("utf-8")
    p += nlen
    if ltype != 0:
        raise ValueError(f"HDF5: link type {ltype} unsupported "
                         "(hard links only)")
    (a2,) = struct.unpack("<Q", body[p:p + 8])
    return name, a2


def _dense_links(buf: bytes, fheap_addr: int, bt2_addr: int) -> dict:
    """Dense link storage -> {name: addr}: v2 B-tree (BTHD/BTLF)
    records give (hash, heap id); heap ids index the fractal heap's
    direct block (heap-space offsets include the block header)."""
    if buf[fheap_addr:fheap_addr + 4] != b"FRHP":
        raise ValueError(f"HDF5: FRHP signature missing at {fheap_addr}")
    hid_len = struct.unpack("<H", buf[fheap_addr + 5:fheap_addr + 7])[0]
    p = fheap_addr + 4 + 1 + 2 + 2 + 1 + 4 + 8 * 12
    table_width = struct.unpack("<H", buf[p:p + 2])[0]
    start_block, max_direct = struct.unpack("<QQ", buf[p + 2:p + 18])
    max_heap_bits = struct.unpack("<H", buf[p + 18:p + 20])[0]
    root_addr = struct.unpack("<Q", buf[p + 22:p + 30])[0]
    cur_rows = struct.unpack("<H", buf[p + 30:p + 32])[0]
    del table_width, start_block, max_direct
    if cur_rows != 0:
        raise ValueError("HDF5: fractal-heap indirect root blocks "
                         "unsupported (single direct block only)")
    if buf[root_addr:root_addr + 4] != b"FHDB":
        raise ValueError(f"HDF5: FHDB signature missing at {root_addr}")
    off_size = (max_heap_bits + 7) // 8
    # B-tree records
    if buf[bt2_addr:bt2_addr + 4] != b"BTHD":
        raise ValueError(f"HDF5: BTHD signature missing at {bt2_addr}")
    rec_size = struct.unpack("<H", buf[bt2_addr + 10:bt2_addr + 12])[0]
    depth = struct.unpack("<H", buf[bt2_addr + 12:bt2_addr + 14])[0]
    if depth != 0:
        raise ValueError("HDF5: multi-level v2 B-trees unsupported")
    leaf_addr = struct.unpack("<Q", buf[bt2_addr + 16:bt2_addr + 24])[0]
    nrec = struct.unpack("<H", buf[bt2_addr + 24:bt2_addr + 26])[0]
    if buf[leaf_addr:leaf_addr + 4] != b"BTLF":
        raise ValueError(f"HDF5: BTLF signature missing at {leaf_addr}")
    out = {}
    rp = leaf_addr + 6
    for _ in range(nrec):
        rec = buf[rp:rp + rec_size]
        rp += rec_size
        hid = rec[4:4 + hid_len]
        if hid[0] & 0x30:
            raise ValueError("HDF5: huge/tiny fractal-heap objects "
                             "unsupported")
        hoff = int.from_bytes(hid[1:1 + off_size], "little")
        hlen = int.from_bytes(hid[1 + off_size:], "little")
        body = buf[root_addr + hoff:root_addr + hoff + hlen]
        nm, a2 = _parse_link_body(body)
        out[nm] = a2
    return out


def _apply_message(info: dict, mtype: int, body: bytes) -> None:
    if mtype == 0x0001:
        info["shape"] = _parse_dataspace(body)
    elif mtype == 0x0003:
        info["dtype"] = _parse_datatype(body)
    elif mtype == 0x0008:
        lver, lclass = body[0], body[1]
        if (lver, lclass) == (4, 2):
            # v4 chunked layout (HDF5 1.10+/libver latest): rank dims
            # of encoded width, then a chunk-index type
            rank = body[3]
            enc = body[4]
            p2 = 5
            dims = []
            for _ in range(rank):
                dims.append(int.from_bytes(body[p2:p2 + enc],
                                           "little"))
                p2 += enc
            itype = body[p2]
            p2 += 1
            info["layout"] = "chunked"
            info["chunk"] = tuple(dims)
            if itype == 3:          # fixed array
                info["fa_page_bits"] = body[p2]
                p2 += 1
                info["fa_addr"] = struct.unpack(
                    "<Q", body[p2:p2 + 8])[0]
            elif itype == 4:        # extensible array
                info["ea_params"] = tuple(body[p2:p2 + 5])
                p2 += 5
                info["ea_addr"] = struct.unpack(
                    "<Q", body[p2:p2 + 8])[0]
            elif itype == 5:        # v2 B-tree
                p2 += 6             # node size u32 + split + merge
                info["bt2_addr"] = struct.unpack(
                    "<Q", body[p2:p2 + 8])[0]
            else:
                raise ValueError(
                    f"HDF5: v4 chunk index type {itype} unsupported "
                    "(fixed array / extensible array / v2 B-tree)")
            return
        if lver != 3 or lclass not in (1, 2):
            raise ValueError(
                "HDF5: only version-3/4 contiguous/chunked data "
                f"layout supported (got v{lver} class {lclass})")
        if lclass == 1:
            info["layout"] = "contiguous"
            info["data_addr"], info["data_size"] = struct.unpack(
                "<QQ", body[2:18])
        else:
            ndim = body[2]          # rank + 1 (element-size dim)
            info["layout"] = "chunked"
            info["chunk_btree"] = struct.unpack("<Q", body[3:11])[0]
            dims = struct.unpack(f"<{ndim}I",
                                 body[11:11 + 4 * ndim])
            info["chunk"] = tuple(int(d) for d in dims[:-1])
    elif mtype == 0x000B:
        fver, nf = body[0], body[1]
        if fver != 1:
            raise ValueError(f"HDF5: filter pipeline v{fver} "
                             "unsupported")
        p2, fids = 8, []
        for _k in range(nf):
            fid, nlen, _fl, ncv = struct.unpack(
                "<HHHH", body[p2:p2 + 8])
            p2 += 8 + nlen + (-nlen % 8) + 4 * ncv
            if ncv % 2:
                p2 += 4     # v1 pads odd client-value counts
            fids.append(fid)
        if fids not in ([], [1], [2], [2, 1]):
            raise ValueError(f"HDF5: filters {fids} unsupported "
                             "(shuffle/deflate only)")
        info["filters"] = fids
    elif mtype == 0x0011:
        info["btree_addr"], info["heap_addr"] = struct.unpack(
            "<QQ", body[0:16])
    elif mtype == 0x000C:
        ver = body[0]
        if ver != 1:
            raise ValueError(f"HDF5: attribute message v{ver} "
                             "unsupported")
        nsz, dtsz, spsz = struct.unpack("<HHH", body[2:8])
        p2 = 8
        aname = body[p2:p2 + nsz].split(b"\x00")[0].decode()
        p2 += nsz + (-nsz % 8)
        dt_raw = body[p2:p2 + dtsz]
        p2 += dtsz + (-dtsz % 8)
        sp_raw = body[p2:p2 + spsz]
        p2 += spsz + (-spsz % 8)
        dims = _parse_dataspace(sp_raw)
        if dt_raw[0] & 0x0F == 3:           # string class
            size = struct.unpack("<I", dt_raw[4:8])[0]
            val = body[p2:p2 + size].split(b"\x00")[0].decode()
        else:
            dt = _parse_datatype(dt_raw)
            count = int(np.prod(dims, dtype=np.int64)) if dims else 1
            arr = np.frombuffer(body, dt, count, p2)
            val = arr.copy() if dims else arr[0]
        info.setdefault("attrs", {})[aname] = val
    elif mtype == 0x0010:
        raise ValueError("HDF5: object header continuation blocks "
                         "unsupported")


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
    sbver = buf[8]
    if sbver == 0:
        if buf[13] != 8 or buf[14] != 8:
            raise ValueError(
                "HDF5: only 8-byte offsets/lengths supported")
        root_hdr_addr = struct.unpack("<Q", buf[64:72])[0]
    elif sbver in (2, 3):
        # superblock v2/v3 (1.8+/libver latest): sig, ver, sizeoff,
        # sizelen, flags, base, ext, eof, root OHDR addr, checksum
        if buf[9] != 8 or buf[10] != 8:
            raise ValueError(
                "HDF5: only 8-byte offsets/lengths supported")
        stored = struct.unpack("<I", buf[44:48])[0]
        if stored != _lookup3(buf[0:44]):
            raise ValueError("HDF5: superblock checksum mismatch")
        root_hdr_addr = struct.unpack("<Q", buf[36:44])[0]
    else:
        raise ValueError(f"HDF5: superblock version {sbver} unsupported")
    root = _parse_object_header(buf, root_hdr_addr)
    if "btree_addr" not in root and "links" not in root:
        raise ValueError("HDF5: root group has neither a symbol-table "
                         "nor a link-info message")
    datasets: dict = {}
    group_attrs: dict = {}

    def group_links(ginfo: dict) -> dict:
        """{name: header addr} for either group flavor."""
        if "btree_addr" in ginfo:               # old-style SNOD walk
            out = {}
            for snod in _walk_btree(buf, ginfo["btree_addr"]):
                if buf[snod:snod + 4] != b"SNOD":
                    raise ValueError(
                        f"HDF5: SNOD signature missing at {snod}")
                nsym = struct.unpack("<H", buf[snod + 6:snod + 8])[0]
                for k in range(nsym):
                    e = snod + 8 + 40 * k
                    noff, haddr = struct.unpack("<QQ", buf[e:e + 16])
                    out[_heap_name(buf, ginfo["heap_addr"],
                                   noff)] = haddr
            return out
        links = dict(ginfo.get("links", {}))
        if "dense_fheap" in ginfo:              # 1.8+ dense storage
            links.update(_dense_links(buf, ginfo["dense_fheap"],
                                      ginfo["dense_bt2"]))
        return links

    def walk_group(ginfo: dict, prefix: str, depth: int):
        if depth > 32:
            raise ValueError("HDF5: group nesting > 32 (cycle?)")
        for lname, haddr in sorted(group_links(ginfo).items()):
            name = prefix + lname
            info = _parse_object_header(buf, haddr)
            if "btree_addr" in info or "links" in info:  # child GROUP
                if info.get("attrs"):
                    group_attrs[name] = info["attrs"]
                walk_group(info, name + "/", depth + 1)
            elif "shape" in info and "dtype" in info:
                datasets[name] = info
            else:
                raise ValueError(
                    f"HDF5: {name!r} is neither a dataset nor a "
                    "group (unsupported link)")
    walk_group(root, "", 0)
    return {"datasets": datasets, "attrs": root.get("attrs", {}),
            "group_attrs": group_attrs}


def _walk_chunk_btree(buf: bytes, addr: int, rank: int):
    """v1 chunk B-tree (node type 1) -> (offsets, nbytes, address)
    per chunk (recurses internal levels)."""
    if buf[addr:addr + 4] != b"TREE":
        raise ValueError(f"HDF5: TREE signature missing at {addr}")
    ntype, level = buf[addr + 4], buf[addr + 5]
    if ntype != 1:
        raise ValueError(f"HDF5: expected chunk B-tree, got type {ntype}")
    used = struct.unpack("<H", buf[addr + 6:addr + 8])[0]
    keysize = 8 + 8 * (rank + 1)
    out = []
    p = addr + 24
    for _ in range(used):
        size, _mask = struct.unpack("<II", buf[p:p + 8])
        offs = struct.unpack(f"<{rank + 1}Q",
                             buf[p + 8:p + 8 + 8 * (rank + 1)])
        child = struct.unpack(
            "<Q", buf[p + keysize:p + keysize + 8])[0]
        if level == 0:
            out.append((tuple(int(o) for o in offs[:-1]), size, child))
        else:
            out.extend(_walk_chunk_btree(buf, child, rank))
        p += keysize + 8
    return out


def _walk_fixed_array(buf: bytes, v: dict, shape) -> list:
    """Fixed-array chunk index (HDF5 1.10 "FAHD"/"FADB") ->
    (offsets, nbytes, address) per chunk in canonical row-major chunk
    order.  Client 0 = unfiltered (size = full chunk bytes), client
    1 = filtered (per-element stored size + filter mask)."""
    addr = v["fa_addr"]
    if buf[addr:addr + 4] != b"FAHD":
        raise ValueError(f"HDF5: FAHD signature missing at {addr}")
    client = buf[addr + 5]
    entry_size = buf[addr + 6]
    page_bits = buf[addr + 7]
    nelem = struct.unpack("<Q", buf[addr + 8:addr + 16])[0]
    db_addr = struct.unpack("<Q", buf[addr + 16:addr + 24])[0]
    stored = struct.unpack("<I", buf[addr + 24:addr + 28])[0]
    if stored != _lookup3(buf[addr:addr + 24]):
        raise ValueError("HDF5: FAHD checksum mismatch")
    if buf[db_addr:db_addr + 4] != b"FADB":
        raise ValueError(f"HDF5: FADB signature missing at {db_addr}")
    if buf[db_addr + 5] != client:
        raise ValueError("HDF5: FADB client id mismatch")
    p = db_addr + 4 + 1 + 1 + 8
    ck = v["chunk"]
    grid = _chunk_grid(shape, ck)
    if len(grid) != nelem:
        raise ValueError(f"HDF5: fixed array has {nelem} elements "
                         f"for {len(grid)} chunks")
    dt_size = v["dtype"].itemsize
    full = int(np.prod(ck, dtype=np.int64)) * dt_size

    def parse(e: bytes):
        caddr = struct.unpack("<Q", e[:8])[0]
        if client == 0:
            return caddr, full
        return caddr, int.from_bytes(e[8:entry_size - 4], "little")

    elems: list[tuple] = []
    page = 1 << page_bits
    if nelem > page:
        # PAGED data block (elements exceed one page): page bitmap
        # after the header, then per-page element runs each closed by
        # its own checksum (the 1.10 paged fixed-array layout)
        npages = -(-nelem // page)
        bitmap = buf[p:p + (npages + 7) // 8]
        p += len(bitmap)
        p += 4                                  # header checksum
        for pg in range(npages):
            if not (bitmap[pg // 8] >> (pg % 8)) & 1:
                raise ValueError(
                    "HDF5: paged fixed array has an uninitialized "
                    "page")
            n_here = min(page, nelem - pg * page)
            for _ in range(n_here):
                elems.append(parse(buf[p:p + entry_size]))
                p += entry_size
            p += 4                              # page checksum
    else:
        for _ in range(nelem):
            elems.append(parse(buf[p:p + entry_size]))
            p += entry_size
    out = []
    for k in range(nelem):
        caddr, csize = elems[k]
        out.append((grid[k], csize, caddr))
    return out


def _walk_ext_array(buf: bytes, v: dict, shape) -> list:
    """Extensible-array chunk index ("EAHD"/"EAIB"/"EADB") ->
    (offsets, nbytes, address) per chunk in row-major order.
    Handles index-block elements + directly-addressed data blocks
    (the layout for every array the writer emits and for modest
    resizable datasets); secondary blocks error loudly."""
    addr = v["ea_addr"]
    if buf[addr:addr + 4] != b"EAHD":
        raise ValueError(f"HDF5: EAHD signature missing at {addr}")
    client = buf[addr + 5]
    esize = buf[addr + 6]
    max_bits = buf[addr + 7]
    idx_elems = buf[addr + 8]
    dblk_min = buf[addr + 9]
    sblk_min_ptrs = buf[addr + 10]
    stored = struct.unpack("<I", buf[addr + 68:addr + 72])[0]
    if stored != _lookup3(buf[addr:addr + 68]):
        raise ValueError("HDF5: EAHD checksum mismatch")
    ib_addr = struct.unpack("<Q", buf[addr + 60:addr + 68])[0]
    if buf[ib_addr:ib_addr + 4] != b"EAIB":
        raise ValueError(f"HDF5: EAIB signature missing at {ib_addr}")
    if buf[ib_addr + 5] != client:
        raise ValueError("HDF5: EAIB client id mismatch")
    ck = v["chunk"]
    grid = _chunk_grid(shape, ck)
    n = len(grid)
    dt_size = v["dtype"].itemsize
    full = int(np.prod(ck, dtype=np.int64)) * dt_size

    def parse_elem(p: int):
        caddr = struct.unpack("<Q", buf[p:p + 8])[0]
        if client == 0:
            return caddr, full
        csize = struct.unpack("<I", buf[p + 8:p + 12])[0]
        return caddr, csize

    # index-block direct elements
    elems = []
    p = ib_addr + 4 + 1 + 1 + 8
    for _ in range(min(idx_elems, n)):
        elems.append(parse_elem(p))
        p += esize
    p = ib_addr + 4 + 1 + 1 + 8 + idx_elems * esize
    # data-block schedule (spec: sblk s holds 2^(s//2) blocks of
    # dblk_min * 2^((s+1)//2) elements; blocks stay in the index
    # block while 2^(s//2) < sblk_min_data_ptrs)
    sizes = []
    s = 0
    while (1 << (s // 2)) < sblk_min_ptrs:
        sizes += [dblk_min * (1 << ((s + 1) // 2))] * (1 << (s // 2))
        s += 1
    off_bytes = (max_bits + 7) // 8

    def read_dblk(db_addr: int, nel: int, k: int) -> None:
        if buf[db_addr:db_addr + 4] != b"EADB":
            raise ValueError(
                f"HDF5: EADB signature missing at {db_addr}")
        boff = int.from_bytes(
            buf[db_addr + 14:db_addr + 14 + off_bytes], "little")
        if boff != k:
            raise ValueError(f"HDF5: EADB block offset {boff} != "
                             f"expected element index {k}")
        q = db_addr + 14 + off_bytes
        for _ in range(min(nel, n - len(elems))):
            elems.append(parse_elem(q))
            q += esize

    k = idx_elems
    for nel in sizes:
        if len(elems) >= n:
            break
        db_addr = struct.unpack("<Q", buf[p:p + 8])[0]
        p += 8
        if db_addr == _UNDEF_ADDR:
            raise ValueError("HDF5: extensible array needs an "
                             "unallocated data block")
        read_dblk(db_addr, nel, k)
        k += nel
    # SECONDARY blocks: index-block sblk addresses -> EASB (its full
    # data-block address slot list) -> data blocks
    p = ib_addr + 4 + 1 + 1 + 8 + idx_elems * esize + len(sizes) * 8
    ss = s
    while len(elems) < n:
        sb_addr = struct.unpack("<Q", buf[p:p + 8])[0]
        p += 8
        if sb_addr == _UNDEF_ADDR:
            raise ValueError(
                f"HDF5: extensible array covers {len(elems)} of {n} "
                "chunks — secondary block unallocated")
        if buf[sb_addr:sb_addr + 4] != b"EASB":
            raise ValueError(
                f"HDF5: EASB signature missing at {sb_addr}")
        if buf[sb_addr + 5] != client:
            raise ValueError("HDF5: EASB client id mismatch")
        boff = int.from_bytes(
            buf[sb_addr + 14:sb_addr + 14 + off_bytes], "little")
        if boff != k:
            raise ValueError(f"HDF5: EASB block offset {boff} != "
                             f"expected element index {k}")
        ndb = 1 << (ss // 2)
        nel = dblk_min * (1 << ((ss + 1) // 2))
        q = sb_addr + 14 + off_bytes
        for j in range(ndb):
            if len(elems) >= n:
                break
            db_addr = struct.unpack("<Q", buf[q:q + 8])[0]
            q += 8
            if db_addr == _UNDEF_ADDR:
                raise ValueError("HDF5: extensible array needs an "
                                 "unallocated data block")
            read_dblk(db_addr, nel, boff + j * nel)
        k = boff + ndb * nel               # full capacity advances
        ss += 1
    out = []
    for kk in range(n):
        caddr, csize = elems[kk]
        if caddr == _UNDEF_ADDR:
            continue                      # unallocated chunk -> zeros
        out.append((grid[kk], csize, caddr))
    return out


def _walk_bt2_chunks(buf: bytes, v: dict, shape) -> list:
    """v2 B-tree chunk index (record type 10, non-filtered) ->
    (offsets, nbytes, address) per chunk.  Single-leaf trees (depth
    0); filtered records (type 11) and deeper trees error loudly."""
    addr = v["bt2_addr"]
    if buf[addr:addr + 4] != b"BTHD":
        raise ValueError(f"HDF5: BTHD signature missing at {addr}")
    rtype = buf[addr + 5]
    if rtype != 10:
        raise ValueError(f"HDF5: v2 B-tree record type {rtype} "
                         "unsupported for chunks (type 10 only)")
    rec_size = struct.unpack("<H", buf[addr + 10:addr + 12])[0]
    depth = struct.unpack("<H", buf[addr + 12:addr + 14])[0]
    if depth != 0:
        raise ValueError("HDF5: multi-level v2 B-tree chunk indexes "
                         "unsupported")
    leaf_addr = struct.unpack("<Q", buf[addr + 16:addr + 24])[0]
    nrec = struct.unpack("<H", buf[addr + 24:addr + 26])[0]
    if buf[leaf_addr:leaf_addr + 4] != b"BTLF":
        raise ValueError(f"HDF5: BTLF signature missing at {leaf_addr}")
    ck = v["chunk"]
    rank = len(ck)
    if rec_size != 8 + 8 * rank:
        raise ValueError(f"HDF5: v2 B-tree chunk record size "
                         f"{rec_size} != {8 + 8 * rank}")
    dt_size = v["dtype"].itemsize
    full = int(np.prod(ck, dtype=np.int64)) * dt_size
    out = []
    p = leaf_addr + 6
    for _ in range(nrec):
        caddr = struct.unpack("<Q", buf[p:p + 8])[0]
        scaled = struct.unpack(f"<{rank}Q", buf[p + 8:p + rec_size])
        p += rec_size
        offs = tuple(int(s * c) for s, c in zip(scaled, ck))
        out.append((offs, full, caddr))
    return out


def _chunk_entries(buf: bytes, v: dict, shape) -> list:
    """(offsets, nbytes, address) per chunk for any chunk-index
    flavor (v1 B-tree, 1.10 fixed array, extensible array, or v2
    B-tree)."""
    if "fa_addr" in v:
        return _walk_fixed_array(buf, v, shape)
    if "ea_addr" in v:
        return _walk_ext_array(buf, v, shape)
    if "bt2_addr" in v:
        return _walk_bt2_chunks(buf, v, shape)
    return _walk_chunk_btree(buf, v["chunk_btree"], len(shape))


def read_hdf5(path: str, name: str) -> np.ndarray:
    """Read one dataset fully (driver-side; contiguous or chunked,
    deflate-compressed chunks inflated)."""
    import zlib

    info = hdf5_info(path)["datasets"]
    if name not in info:
        raise ValueError(f"no dataset {name!r}; have {sorted(info)}")
    v = info[name]
    with open(path, "rb") as fh:
        buf = fh.read()
    if v["layout"] == "contiguous":
        raw = buf[v["data_addr"]:v["data_addr"] + v["data_size"]]
        return np.frombuffer(raw, v["dtype"]).reshape(v["shape"]).copy()
    shape, ck, dt = v["shape"], v["chunk"], v["dtype"]
    filters = v.get("filters", [])
    out = np.zeros(shape, dt)
    for offs, size, addr in _chunk_entries(buf, v, shape):
        raw = buf[addr:addr + size]
        if 1 in filters:
            raw = zlib.decompress(raw)
        if 2 in filters:
            raw = _unshuffle(raw, dt.itemsize)
        blk = np.frombuffer(raw, dt).reshape(ck)
        sl = tuple(slice(o, min(o + c, s))
                   for o, c, s in zip(offs, ck, shape))
        out[sl] = blk[tuple(slice(0, s.stop - s.start) for s in sl)]
    return out


def read_hdf5_mdim(path: str, name: str, *, slab: int = 0,
                   parallelism: int = 16):
    """Ray Dataset of mdim chunk rows over one dataset (the
    sources.netcdf.read_netcdf contract).  Contiguous layout splits
    into first-axis slabs (one ranged read per task); CHUNKED layout
    serves the file's own chunks as the mdim grain — each task
    ranged-reads and (when deflated) inflates its chunks, cropping
    edge padding to the dataset extent."""
    import ray.data as rd

    from ..stages.mdim import MDSpec, _emit, _row

    v = hdf5_info(path)["datasets"]
    if name not in v:
        raise ValueError(f"no dataset {name!r}; have {sorted(v)}")
    v = v[name]
    shape, dt = v["shape"], v["dtype"]
    if not shape:
        raise ValueError(f"{name} is a scalar; mdim needs >= 1 dim")
    if v["layout"] == "chunked":
        import zlib

        with open(path, "rb") as fh:
            buf = fh.read()
        entries = _chunk_entries(buf, v, shape)
        ck = v["chunk"]
        filters = v.get("filters", [])
        spec = MDSpec(shape, ck, dt.name)

        def fetch_chunks(t):
            rows = []
            with open(path, "rb") as fh:
                for i in t.column("id").to_pylist():
                    offs, size, addr = entries[int(i)]
                    fh.seek(addr)
                    raw = fh.read(size)
                    if 1 in filters:
                        raw = zlib.decompress(raw)
                    if 2 in filters:
                        raw = _unshuffle(raw, dt.itemsize)
                    blk = np.frombuffer(raw, dt).reshape(ck)
                    idx = tuple(o // c for o, c in zip(offs, ck))
                    want = spec.chunk_shape(idx)
                    blk = blk[tuple(slice(0, s) for s in want)]
                    rows.append(_row(idx, np.ascontiguousarray(blk)))
            return _emit(rows)

        ids = rd.range(len(entries),
                       override_num_blocks=min(parallelism,
                                               len(entries)))
        return ids.map_batches(fetch_chunks,
                               batch_format="pyarrow"), spec
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
