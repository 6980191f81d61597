"""FlatGeobuf vector source / sink with packed-Hilbert-R-tree bbox
pushdown.

Reference analog: the OGR FlatGeobuf driver
(ogr/ogrsf_frmts/flatgeobuf/): magic bytes 'fgb' 0x03 'fgb' 0x01
(ogr_flatgeobuf.h:38), size-prefixed FlatBuffers Header then the
packed Hilbert R-tree then size-prefixed Feature records; tree layout
and search per packedrtree.h:78-120 / packedrtree.cpp (40-byte
NodeItem = 4 doubles + uint64 offset, bottom-up levels stored
top-down, leaf offsets = feature byte offsets, internal offsets =
child node indices, Hilbert sort of the 16-bit-quantized bbox
centers); geometry tables per geometryreader.cpp (flat xy vector,
cumulative vertex-count ring `ends`, nested `parts` for multi types).

The FlatBuffers wire layer here is a minimal from-scratch
encoder/decoder of the public format (uoffset/soffset/vtable
conventions) — enough for the FlatGeobuf Header/Feature schemas; no
external flatbuffers dependency.

Like GeoJSON/GPKG this is an interop boundary format around the
engine's WKB-column convention.  The WRITE side is single-file
(features must be Hilbert-ordered and their byte offsets known before
the index can be emitted, so the writer materializes the feature
block).  The READ side is where scale lives: the index prunes to
matching feature ranges without touching the feature block, and the
matched byte ranges fan out across Ray tasks, each seeking into the
file independently.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from ..functions import geom as G

MAGIC = bytes([0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x01])
NODE_SIZE_DEFAULT = 16
_NODE_FMT = "<4dQ"  # minx, miny, maxx, maxy, offset — 40 bytes
_NODE_BYTES = 40

# ColumnType enum (FlatGeobuf spec / header_generated.h)
_CT_BOOL, _CT_LONG, _CT_DOUBLE, _CT_STRING, _CT_BINARY = 2, 7, 10, 11, 14


# ------------------------------------------------ minimal FlatBuffers
#
# Build back-to-front: children are prepended first (end up at higher
# addresses), parents later; positions are distances from the buffer
# END to the object's start, so uoffset = field_pos - target_pos.


class _FBuilder:
    def __init__(self):
        self._buf = bytearray()

    def _prepend(self, data: bytes, align: int = 1) -> int:
        pad = (-(len(self._buf) + len(data))) % align
        if pad:
            self._buf[:0] = b"\x00" * pad
        self._buf[:0] = data
        return len(self._buf)

    def _counted(self, payload: bytes, n: int, elem_align: int) -> int:
        """Prepend [uint32 count][payload] keeping them adjacent; the
        count field lands 4-aligned and the payload elem-aligned."""
        base = len(self._buf) + 4 + len(payload)
        pad = ((4 - base) % 8) if elem_align == 8 else ((-base) % 4)
        self._buf[:0] = struct.pack("<I", n) + payload + b"\x00" * pad
        return len(self._buf)

    def string(self, s: str) -> int:
        raw = s.encode("utf-8")
        return self._counted(raw + b"\x00", len(raw), 1)

    def vector_scalar(self, fmt: str, values, elem_size: int) -> int:
        n = len(values)
        return self._counted(struct.pack(f"<{n}{fmt}", *values), n,
                             max(elem_size, 1))

    def vector_offsets(self, positions: list[int]) -> int:
        n = len(positions)
        # vector start pos after prepending len + slots:
        pad = (-(len(self._buf) + 4 + 4 * n)) % 4
        pos_vec = len(self._buf) + pad + 4 + 4 * n
        out = bytearray(struct.pack("<I", n))
        for i, p in enumerate(positions):
            slot_pos = pos_vec - 4 - 4 * i
            out += struct.pack("<I", slot_pos - p)
        self._buf[:0] = out + b"\x00" * pad
        return len(self._buf)

    def table(self, fields: list[tuple]) -> int:
        """fields: (slot, kind, value) with kind in
        {'u8','u16','i32','u64','f64','offset'}; absent fields omitted.
        Scalars at their default must be omitted by the caller."""
        sizes = {"u8": 1, "u16": 2, "i32": 4, "u64": 8, "f64": 8,
                 "offset": 4}
        fmts = {"u8": "B", "u16": "H", "i32": "i", "u64": "Q", "f64": "d"}
        max_slot = max(s for s, _, _ in fields) if fields else -1
        # inline layout: descending size then slot order (any layout is
        # valid — the vtable records the actual offsets)
        order = sorted(fields, key=lambda f: (-sizes[f[1]], f[0]))
        off = 4  # after the int32 soffset
        slot_off = [0] * (max_slot + 1)
        layout = []
        for slot, kind, value in order:
            sz = sizes[kind]
            off = (off + sz - 1) // sz * sz
            slot_off[slot] = off
            layout.append((off, kind, value))
            off += sz
        table_size = (off + 3) // 4 * 4
        body = bytearray(table_size)
        for o, kind, value in layout:
            if kind != "offset":
                struct.pack_into(f"<{fmts[kind]}", body, o, value)
        # prepend table body (aligned 8 if any 8-byte field), patch
        # uoffsets afterwards (we then know the table position)
        align = 8 if any(k in ("u64", "f64") for _, k, _ in fields) else 4
        pos_table = self._prepend(bytes(body), align)
        for o, kind, value in layout:
            if kind == "offset":
                field_pos = pos_table - o
                idx = len(self._buf) - field_pos
                struct.pack_into("<I", self._buf, idx, field_pos - value)
        # vtable
        vt_bytes = 4 + 2 * (max_slot + 1)
        vt = bytearray(struct.pack("<HH", vt_bytes, table_size))
        for s in range(max_slot + 1):
            vt += struct.pack("<H", slot_off[s])
        pos_vt = self._prepend(bytes(vt), 2)
        # patch the table's soffset (vtable is at a LOWER address)
        idx = len(self._buf) - pos_table
        struct.pack_into("<i", self._buf, idx, pos_vt - pos_table)
        return pos_table

    def finish(self, root_pos: int) -> bytes:
        pad = (-(len(self._buf) + 4)) % 8
        total = len(self._buf) + pad + 4
        return (struct.pack("<I", total - root_pos) + b"\x00" * pad
                + bytes(self._buf))


class _FTable:
    """Decoder view of one table at absolute address `pos`."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        (soff,) = struct.unpack_from("<i", buf, pos)
        self._vt = pos - soff
        (self._vt_size,) = struct.unpack_from("<H", buf, self._vt)

    def _field(self, slot: int) -> int:
        o = 4 + 2 * slot
        if o + 2 > self._vt_size:
            return 0
        (off,) = struct.unpack_from("<H", buf := self.buf, self._vt + o)
        del buf
        return self.pos + off if off else 0

    def scalar(self, slot: int, fmt: str, default):
        a = self._field(slot)
        if not a:
            return default
        return struct.unpack_from(f"<{fmt}", self.buf, a)[0]

    def _indirect(self, slot: int) -> int:
        a = self._field(slot)
        if not a:
            return 0
        (u,) = struct.unpack_from("<I", self.buf, a)
        return a + u

    def string(self, slot: int) -> str | None:
        a = self._indirect(slot)
        if not a:
            return None
        (n,) = struct.unpack_from("<I", self.buf, a)
        return self.buf[a + 4:a + 4 + n].decode("utf-8")

    def vector(self, slot: int, fmt: str, elem: int) -> np.ndarray | None:
        a = self._indirect(slot)
        if not a:
            return None
        (n,) = struct.unpack_from("<I", self.buf, a)
        return np.frombuffer(self.buf, f"<{fmt}", n, a + 4).copy()

    def table_vector(self, slot: int) -> list["_FTable"]:
        a = self._indirect(slot)
        if not a:
            return []
        (n,) = struct.unpack_from("<I", self.buf, a)
        out = []
        for i in range(n):
            s = a + 4 + 4 * i
            (u,) = struct.unpack_from("<I", self.buf, s)
            out.append(_FTable(self.buf, s + u))
        return out

    def table(self, slot: int) -> "_FTable | None":
        a = self._indirect(slot)
        return _FTable(self.buf, a) if a else None


# ------------------------------------------------------ Hilbert curve


def hilbert_u16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Hilbert index of 16-bit (x, y) — the branchless form the
    reference uses (packedrtree.cpp:73, from rawrunprotected's
    hilbert_curves), vectorized over uint32 arrays."""
    x = x.astype(np.uint32)
    y = y.astype(np.uint32)
    M = np.uint32(0xFFFF)
    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)
    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = c ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = d ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))
    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = c ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = d ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))
    a, b, c, d = A, B, C, D
    C = c ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = d ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))
    for sh, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333),
                  (1, 0x55555555)):
        i0 = (i0 | (i0 << np.uint32(sh))) & np.uint32(m)
        i1 = (i1 | (i1 << np.uint32(sh))) & np.uint32(m)
    return (i1 << np.uint32(1)) | i0


def _hilbert_of_boxes(boxes: np.ndarray, extent) -> np.ndarray:
    minx, miny, maxx, maxy = extent
    w = (maxx - minx) or 1.0
    h = (maxy - miny) or 1.0
    hm = (1 << 16) - 1
    x = np.floor(hm * ((boxes[:, 0] + boxes[:, 2]) / 2 - minx) / w)
    y = np.floor(hm * ((boxes[:, 1] + boxes[:, 3]) / 2 - miny) / h)
    return hilbert_u16(x.astype(np.uint32), y.astype(np.uint32))


# -------------------------------------------------- packed R-tree


def _level_bounds(num_items: int, node_size: int):
    """Bottom-up node counts stored top-down (packedrtree.cpp:219)."""
    level_num = []
    n = num_items
    num_nodes = n
    level_num.append(n)
    while n != 1:
        n = -(-n // node_size)
        num_nodes += n
        level_num.append(n)
    offs = []
    n = num_nodes
    for size in level_num:
        n -= size
        offs.append(n)
    return [(offs[i], offs[i] + level_num[i])
            for i in range(len(level_num))], num_nodes


def build_rtree(boxes: np.ndarray, feat_offsets: np.ndarray,
                node_size: int = NODE_SIZE_DEFAULT) -> bytes:
    """Packed Hilbert R-tree over ALREADY-SORTED leaf boxes.  Leaf
    node offsets are feature byte offsets; internal node offsets are
    child node indices (packedrtree.cpp generateNodes)."""
    num = len(boxes)
    bounds, num_nodes = _level_bounds(num, node_size)
    nodes = np.zeros((num_nodes, 5), np.float64)
    leaf0 = num_nodes - num
    nodes[leaf0:, :4] = boxes
    offs = np.zeros(num_nodes, np.uint64)
    offs[leaf0:] = feat_offsets
    for lev in range(len(bounds) - 1):
        lo, hi = bounds[lev]
        newpos = bounds[lev + 1][0]
        pos = lo
        while pos < hi:
            end = min(pos + node_size, hi)
            nodes[newpos, 0] = nodes[pos:end, 0].min()
            nodes[newpos, 1] = nodes[pos:end, 1].min()
            nodes[newpos, 2] = nodes[pos:end, 2].max()
            nodes[newpos, 3] = nodes[pos:end, 3].max()
            offs[newpos] = pos
            newpos += 1
            pos = end
    out = bytearray()
    for i in range(num_nodes):
        out += struct.pack(_NODE_FMT, nodes[i, 0], nodes[i, 1],
                           nodes[i, 2], nodes[i, 3], int(offs[i]))
    return bytes(out)


def rtree_search(read_at, num_items: int, node_size: int, bbox):
    """Stream search (packedrtree.cpp:356): visits only intersecting
    nodes via `read_at(byte_off, nbytes)` over the index section;
    returns feature (byte_offset, leaf_index) pairs."""
    bounds, num_nodes = _level_bounds(num_items, node_size)
    leaf0 = bounds[0][0]
    minx, miny, maxx, maxy = bbox
    queue = [(0, len(bounds) - 1)]
    hits = []
    while queue:
        node_index, level = queue.pop(0)
        is_leaf = node_index >= num_nodes - num_items
        end = min(node_index + node_size, bounds[level][1])
        raw = read_at(node_index * _NODE_BYTES,
                      (end - node_index) * _NODE_BYTES)
        arr = np.frombuffer(raw, np.float64).reshape(-1, 5)
        offs = np.frombuffer(raw, np.uint64).reshape(-1, 5)[:, 4]
        ok = ~((arr[:, 2] < minx) | (arr[:, 3] < miny)
               | (arr[:, 0] > maxx) | (arr[:, 1] > maxy))
        for k in np.nonzero(ok)[0]:
            if is_leaf:
                hits.append((int(offs[k]), node_index + int(k) - leaf0))
            else:
                queue.append((int(offs[k]), level - 1))
        queue.sort()
    return hits


# ----------------------------------------- geometry <-> FGB tables


def _wkb_to_fgb(builder: _FBuilder, wkb: bytes) -> tuple[int, int]:
    """WKB -> (geometry table pos, FGB geometry type code)."""
    kind, payload = G.parse_wkb(wkb)
    if kind == "point":
        xy = builder.vector_scalar("d", [payload[0], payload[1]], 8)
        return builder.table([(1, "offset", xy), (6, "u8", 1)]), 1
    if kind == "linestring":
        a = np.asarray(payload, np.float64).ravel()
        xy = builder.vector_scalar("d", a.tolist(), 8)
        return builder.table([(1, "offset", xy), (6, "u8", 2)]), 2
    if kind == "polygon":
        rings = payload
        flat = np.vstack(rings)
        ends = np.cumsum([len(r) for r in rings]).tolist()
        xy = builder.vector_scalar("d", flat.ravel().tolist(), 8)
        fields = [(1, "offset", xy), (6, "u8", 3)]
        if len(rings) > 1:
            fields.insert(0, (0, "offset",
                              builder.vector_scalar("I", ends, 4)))
        return builder.table(fields), 3
    if kind == "multipolygon":
        parts = []
        for poly in payload:
            pos, _ = _wkb_to_fgb(builder, G.wkb_polygon(list(poly)))
            parts.append(pos)
        pv = builder.vector_offsets(parts)
        return builder.table([(6, "u8", 6), (7, "offset", pv)]), 6
    raise ValueError(f"flatgeobuf writer: unsupported geometry {kind!r}")


def _fgb_to_wkb(g: _FTable, gtype: int) -> bytes:
    t = g.scalar(6, "B", 0) or gtype
    if t == 1:
        xy = g.vector(1, "d", 8)
        return struct.pack("<BIdd", 1, 1, xy[0], xy[1])
    if t == 2:
        xy = g.vector(1, "d", 8).reshape(-1, 2)
        return (struct.pack("<BII", 1, 2, len(xy))
                + xy.astype("<f8").tobytes())
    if t == 3:
        xy = g.vector(1, "d", 8).reshape(-1, 2)
        ends = g.vector(0, "I", 4)
        if ends is None:
            rings = [xy]
        else:
            rings, prev = [], 0
            for e in ends:
                rings.append(xy[prev:e])
                prev = int(e)
        return G.wkb_polygon(rings)
    if t == 6:
        polys = []
        for part in g.table_vector(7):
            pw = _fgb_to_wkb(part, 3)
            k, rings = G.parse_wkb(pw)
            polys.append(rings)
        return G.wkb_multipolygon(polys)
    raise ValueError(f"flatgeobuf reader: unsupported geometry type {t}")


# ------------------------------------------------------- properties


def _column_plan(schema: pa.Schema, geometry_col: str):
    plan = []
    for f in schema:
        if f.name == geometry_col:
            continue
        if pa.types.is_boolean(f.type):
            ct = _CT_BOOL
        elif pa.types.is_integer(f.type):
            ct = _CT_LONG
        elif pa.types.is_floating(f.type):
            ct = _CT_DOUBLE
        elif pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type):
            ct = _CT_BINARY
        else:
            ct = _CT_STRING
        plan.append((f.name, ct))
    return plan


def _encode_props(plan, values: list) -> bytes:
    out = bytearray()
    for i, ((_, ct), v) in enumerate(zip(plan, values)):
        if v is None:
            continue  # absent column index == null (spec)
        out += struct.pack("<H", i)
        if ct == _CT_BOOL:
            out += struct.pack("<B", 1 if v else 0)
        elif ct == _CT_LONG:
            out += struct.pack("<q", int(v))
        elif ct == _CT_DOUBLE:
            out += struct.pack("<d", float(v))
        else:
            raw = v if isinstance(v, bytes) else str(v).encode("utf-8")
            out += struct.pack("<I", len(raw)) + raw
    return bytes(out)


def _decode_props(plan, raw: bytes) -> list:
    vals = [None] * len(plan)
    pos = 0
    while pos < len(raw):
        (idx,) = struct.unpack_from("<H", raw, pos)
        pos += 2
        ct = plan[idx][1]
        if ct == _CT_BOOL:
            vals[idx] = bool(raw[pos])
            pos += 1
        elif ct == _CT_LONG:
            (vals[idx],) = struct.unpack_from("<q", raw, pos)
            pos += 8
        elif ct == _CT_DOUBLE:
            (vals[idx],) = struct.unpack_from("<d", raw, pos)
            pos += 8
        else:
            (n,) = struct.unpack_from("<I", raw, pos)
            pos += 4
            b = raw[pos:pos + n]
            vals[idx] = b if ct == _CT_BINARY else b.decode("utf-8")
            pos += n
    return vals


# ----------------------------------------------------------- writer


def write_flatgeobuf(ds, path: str, layer: str = "layer",
                     geometry_col: str = "geometry",
                     node_size: int = NODE_SIZE_DEFAULT,
                     srs_code: int = 4326) -> int:
    """Write a Ray Dataset or pyarrow Table as one FlatGeobuf file
    (Hilbert-ordered features + packed R-tree index).  Single-file
    interop sink; see module docstring."""
    if not isinstance(ds, pa.Table):
        ds = pa.concat_tables(
            list(ds.iter_batches(batch_format="pyarrow", batch_size=8192)),
            promote_options="default")
    plan = _column_plan(ds.schema, geometry_col)
    wkbs = ds.column(geometry_col).to_pylist()
    n = len(wkbs)
    if n == 0:
        raise ValueError("write_flatgeobuf: empty input")
    attr_vals = [ds.column(name).to_pylist() for name, _ in plan]
    boxes = np.array([G.envelope_wkb(w) for w in wkbs], np.float64)
    extent = (boxes[:, 0].min(), boxes[:, 1].min(),
              boxes[:, 2].max(), boxes[:, 3].max())
    hv = _hilbert_of_boxes(boxes, extent)
    # the reference comparator is ha > hb — DESCENDING Hilbert order
    # (packedrtree.cpp:148-165); stable to keep ties deterministic
    order = np.argsort(-hv.astype(np.int64), kind="stable")

    feats = []
    gtypes = set()
    for i in order:
        b = _FBuilder()
        gpos, gt = _wkb_to_fgb(b, wkbs[i])
        gtypes.add(gt)
        props = _encode_props(plan, [attr_vals[c][i]
                                     for c in range(len(plan))])
        fields = [(0, "offset", gpos)]
        if props:
            fields.append((1, "offset",
                           b.vector_scalar("B", list(props), 1)))
        raw = b.finish(b.table(fields))
        feats.append(struct.pack("<I", len(raw)) + raw)
    sizes = np.array([len(f) for f in feats], np.uint64)
    feat_offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    tree = build_rtree(boxes[order], feat_offsets, node_size)

    # header
    b = _FBuilder()
    col_pos = []
    for name, ct in plan:
        npos = b.string(name)
        col_pos.append(b.table([(0, "offset", npos), (1, "u8", ct)]
                               if ct else [(0, "offset", npos)]))
    cols_vec = b.vector_offsets(col_pos) if col_pos else 0
    crs_pos = b.table([(0, "offset", b.string("EPSG")),
                       (1, "i32", srs_code)])
    name_pos = b.string(layer)
    env_pos = b.vector_scalar("d", list(extent), 8)
    gtype = gtypes.pop() if len(gtypes) == 1 else 0
    fields = [(0, "offset", name_pos), (1, "offset", env_pos),
              (8, "u64", n), (10, "offset", crs_pos)]
    if gtype:
        fields.append((2, "u8", gtype))
    if cols_vec:
        fields.append((7, "offset", cols_vec))
    if node_size != 16:
        fields.append((9, "u16", node_size))
    header = b.finish(b.table(fields))

    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(MAGIC)
        fh.write(struct.pack("<I", len(header)))
        fh.write(header)
        fh.write(tree)
        for f in feats:
            fh.write(f)
    os.replace(tmp, path)
    return n


# ----------------------------------------------------------- reader


def read_header(path: str) -> dict:
    with open(path, "rb") as fh:
        if fh.read(8) != MAGIC:
            raise ValueError(f"{path}: not a FlatGeobuf file")
        (hlen,) = struct.unpack("<I", fh.read(4))
        raw = fh.read(hlen)
    (u,) = struct.unpack_from("<I", raw, 0)
    h = _FTable(raw, u)
    cols = [(c.string(0), c.scalar(1, "B", 0)) for c in h.table_vector(7)]
    num = h.scalar(8, "Q", 0)
    node_size = h.scalar(9, "H", 16)
    crs = h.table(10)
    _, tree_nodes = _level_bounds(num, node_size) if num else (None, 0)
    return {
        "name": h.string(0),
        "envelope": (h.vector(1, "d", 8).tolist()
                     if h.vector(1, "d", 8) is not None else None),
        "geometry_type": h.scalar(2, "B", 0),
        "columns": cols,
        "features_count": num,
        "index_node_size": node_size,
        "srs_code": crs.scalar(1, "i", 0) if crs else 0,
        "header_len": 8 + 4 + hlen,
        "index_len": tree_nodes * _NODE_BYTES,
    }


def _parse_features(path: str, meta: dict, clusters) -> pa.Table:
    """Parse the features whose byte offsets are listed in `clusters`
    (each cluster = sorted offsets read with ONE ranged read; features
    between matched offsets are skipped via their size prefixes)."""
    plan = meta["columns"]
    feat0 = meta["header_len"] + meta["index_len"]
    wkbs, cols = [], {name: [] for name, _ in plan}
    with open(path, "rb") as fh:
        for offsets in clusters:
            keep = set(offsets)
            # one 4-byte peek bounds the cluster's last feature
            fh.seek(feat0 + offsets[-1])
            (last_len,) = struct.unpack("<I", fh.read(4))
            start = offsets[0]
            end = offsets[-1] + 4 + last_len
            fh.seek(feat0 + start)
            raw = fh.read(end - start)
            pos = 0
            while pos < len(raw):
                (flen,) = struct.unpack_from("<I", raw, pos)
                if start + pos in keep:
                    buf = raw[pos + 4:pos + 4 + flen]
                    (u,) = struct.unpack_from("<I", buf, 0)
                    f = _FTable(buf, u)
                    g = f.table(0)
                    wkbs.append(_fgb_to_wkb(g, meta["geometry_type"]))
                    props = f.vector(1, "B", 1)
                    vals = _decode_props(
                        plan, props.tobytes() if props is not None else b"")
                    for (name, _), v in zip(plan, vals):
                        cols[name].append(v)
                pos += 4 + flen
    out = {"geometry": pa.array(wkbs, pa.binary())}
    ct_types = {_CT_BOOL: pa.bool_(), _CT_LONG: pa.int64(),
                _CT_DOUBLE: pa.float64(), _CT_BINARY: pa.binary(),
                _CT_STRING: pa.string()}
    for name, ct in plan:
        out[name] = pa.array(cols[name], ct_types[ct])
    return pa.table(out)


def search_bbox(path: str, bbox, meta: dict | None = None):
    """Index-only bbox search: returns sorted feature byte offsets —
    touches ONLY the R-tree section (streamSearch read pattern)."""
    meta = meta or read_header(path)
    idx0 = meta["header_len"]
    with open(path, "rb") as fh:
        def read_at(off, nbytes):
            fh.seek(idx0 + off)
            return fh.read(nbytes)

        hits = rtree_search(read_at, meta["features_count"],
                            meta["index_node_size"], bbox)
    return sorted(h[0] for h in hits)


def read_flatgeobuf(path: str, bbox=None, parallelism: int = 16):
    """Ray Dataset over a FlatGeobuf file in the WKB convention.
    With `bbox`, the packed R-tree prunes to matching features (index
    pages only) and ONLY those byte ranges are read; matched offsets
    coalesce into contiguous runs that fan out across tasks."""
    import ray.data as rd

    meta = read_header(path)
    if bbox is None:
        # whole-file read: split the feature block at feature
        # boundaries via the leaf offsets in the index
        offs = search_bbox(path, (-np.inf, -np.inf, np.inf, np.inf), meta)
    else:
        offs = search_bbox(path, bbox, meta)
    if not offs:
        empty = {"geometry": pa.array([], pa.binary())}
        ct_types = {_CT_BOOL: pa.bool_(), _CT_LONG: pa.int64(),
                    _CT_DOUBLE: pa.float64(), _CT_BINARY: pa.binary(),
                    _CT_STRING: pa.string()}
        for name, ct in meta["columns"]:
            empty[name] = pa.array([], ct_types[ct])
        return rd.from_arrow(pa.table(empty))
    # cluster matched offsets so each cluster is ONE ranged read; a
    # gap above the threshold starts a new cluster (skipped bytes
    # inside a cluster are cheaper than an extra seek+read below it)
    GAP = 1 << 20
    clusters: list[list[int]] = [[offs[0]]]
    for o in offs[1:]:
        if o - clusters[-1][-1] > GAP:
            clusters.append([o])
        else:
            clusters[-1].append(o)
    chunks = np.array_split(np.arange(len(clusters)),
                            min(parallelism, len(clusters)))
    items = [{"lo": int(c[0]), "hi": int(c[-1])} for c in chunks if len(c)]

    def fetch(t: pa.Table) -> pa.Table:
        parts = []
        for lo, hi in zip(t.column("lo").to_pylist(),
                          t.column("hi").to_pylist()):
            parts.append(_parse_features(path, meta, clusters[lo:hi + 1]))
        return pa.concat_tables(parts, promote_options="default")

    return rd.from_items(items).map_batches(fetch, batch_format="pyarrow")
