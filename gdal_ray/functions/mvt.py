"""Mapbox Vector Tile (MVT) encoding/decoding — minimal protobuf codec.

Implements the public MVT 2.1 spec (protobuf wire format hand-rolled —
no protobuf dependency): Tile > Layer > Feature with zigzag-delta
geometry commands (MoveTo/LineTo/ClosePath) in tile-local integer
coordinates.  Reference analog: the OGR MVT writer
(ogr/ogrsf_frmts/mvt/ogrmvtdataset.cpp:3323 OGRMVTWriterDataset) which
buckets features into z/x/y tiles and encodes protobuf per tile — here
the bucketing is the engine's groupby(cell) and this module is the
per-tile encode step.  A decoder is included as the round-trip oracle.
"""

from __future__ import annotations

import numpy as np

# wire types
_VARINT = 0
_LEN = 2


def _varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _key(field, _LEN) + _varint(len(payload)) + payload


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _key(7, _VARINT) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _key(6, _VARINT) + _varint(_zigzag(v))
    if isinstance(v, float):
        import struct

        return _key(3, 1) + struct.pack("<d", v)
    return _len_field(1, str(v).encode("utf-8"))


GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3


def _encode_geometry(gtype: int, parts: list[np.ndarray]) -> list[int]:
    """parts: list of (N, 2) int arrays (tile-local coords).  Polygons:
    rings (auto-closed with ClosePath); linestrings: paths; points: one
    part of N points."""
    cmds: list[int] = []
    cx = cy = 0
    for part in parts:
        part = np.asarray(part, dtype=np.int64)
        if gtype == GEOM_POINT:
            cmds.append((len(part) << 3) | 1)  # MoveTo xN
            for x, y in part:
                cmds.append(_zigzag(int(x) - cx))
                cmds.append(_zigzag(int(y) - cy))
                cx, cy = int(x), int(y)
            continue
        n = len(part)
        if gtype == GEOM_POLYGON and n > 1 and (part[0] == part[-1]).all():
            part = part[:-1]
            n -= 1
        cmds.append((1 << 3) | 1)  # MoveTo x1
        cmds.append(_zigzag(int(part[0, 0]) - cx))
        cmds.append(_zigzag(int(part[0, 1]) - cy))
        cx, cy = int(part[0, 0]), int(part[0, 1])
        cmds.append(((n - 1) << 3) | 2)  # LineTo x(n-1)
        for x, y in part[1:]:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        if gtype == GEOM_POLYGON:
            cmds.append((1 << 3) | 7)  # ClosePath
    return cmds


def encode_tile(
    layer_name: str,
    features: list[dict],
    extent: int = 4096,
) -> bytes:
    """features: [{"id": int, "type": 1|2|3, "parts": [(N,2) int arrays],
    "tags": {k: v}}] -> MVT tile bytes."""
    keys: list[str] = []
    values: list = []
    kidx: dict[str, int] = {}
    vidx: dict = {}
    feats = []
    for f in features:
        tag_ints: list[int] = []
        for k, v in (f.get("tags") or {}).items():
            if k not in kidx:
                kidx[k] = len(keys)
                keys.append(k)
            vk = (type(v).__name__, v)
            if vk not in vidx:
                vidx[vk] = len(values)
                values.append(v)
            tag_ints += [kidx[k], vidx[vk]]
        body = b""
        if "id" in f:
            body += _key(1, _VARINT) + _varint(int(f["id"]))
        if tag_ints:
            payload = b"".join(_varint(t) for t in tag_ints)
            body += _len_field(2, payload)
        body += _key(3, _VARINT) + _varint(int(f["type"]))
        geom = _encode_geometry(f["type"], f["parts"])
        body += _len_field(4, b"".join(_varint(g) for g in geom))
        feats.append(body)
    layer = b""
    layer += _key(15, _VARINT) + _varint(2)  # version
    layer += _len_field(1, layer_name.encode("utf-8"))
    for fb in feats:
        layer += _len_field(2, fb)
    for k in keys:
        layer += _len_field(3, k.encode("utf-8"))
    for v in values:
        layer += _len_field(4, _encode_value(v))
    layer += _key(5, _VARINT) + _varint(extent)
    return _len_field(3, layer)


# ----------------------------------------------------------- decoder


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def decode_tile(data: bytes) -> dict:
    """MVT bytes -> {layer_name: {"extent": e, "features": [...]}} with
    decoded geometry parts (absolute int coords)."""
    layers = {}
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if field == 3 and wire == _LEN:
            ln, pos = _read_varint(data, pos)
            layer = _decode_layer(data[pos : pos + ln])
            layers[layer["name"]] = layer
            pos += ln
        else:
            pos = _skip(data, pos, wire)
    return layers


def _skip(buf: bytes, pos: int, wire: int) -> int:
    if wire == _VARINT:
        _, pos = _read_varint(buf, pos)
    elif wire == _LEN:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire == 1:
        pos += 8
    elif wire == 5:
        pos += 4
    return pos


def _decode_layer(buf: bytes) -> dict:
    name = ""
    extent = 4096
    feats = []
    keys: list[str] = []
    values: list = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == _LEN:
            ln, pos = _read_varint(buf, pos)
            name = buf[pos : pos + ln].decode()
            pos += ln
        elif field == 2 and wire == _LEN:
            ln, pos = _read_varint(buf, pos)
            feats.append(_decode_feature(buf[pos : pos + ln]))
            pos += ln
        elif field == 3 and wire == _LEN:
            ln, pos = _read_varint(buf, pos)
            keys.append(buf[pos : pos + ln].decode())
            pos += ln
        elif field == 4 and wire == _LEN:
            ln, pos = _read_varint(buf, pos)
            values.append(_decode_value(buf[pos : pos + ln]))
            pos += ln
        elif field == 5:
            extent, pos = _read_varint(buf, pos)
        elif field == 15:
            _, pos = _read_varint(buf, pos)
        else:
            pos = _skip(buf, pos, wire)
    for f in feats:
        f["tags"] = {
            keys[f["tag_ints"][i]]: values[f["tag_ints"][i + 1]]
            for i in range(0, len(f["tag_ints"]), 2)
        }
        del f["tag_ints"]
    return {"name": name, "extent": extent, "features": feats}


def _decode_value(buf: bytes):
    import struct

    pos = 0
    tag, pos = _read_varint(buf, pos)
    field, wire = tag >> 3, tag & 7
    if field == 1:
        ln, pos = _read_varint(buf, pos)
        return buf[pos : pos + ln].decode()
    if field == 3:
        return struct.unpack_from("<d", buf, pos)[0]
    if field == 6:
        v, _ = _read_varint(buf, pos)
        return _unzigzag(v)
    if field == 7:
        v, _ = _read_varint(buf, pos)
        return bool(v)
    v, _ = _read_varint(buf, pos)
    return v


def _decode_feature(buf: bytes) -> dict:
    fid = None
    gtype = 0
    tag_ints: list[int] = []
    parts: list[np.ndarray] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1:
            fid, pos = _read_varint(buf, pos)
        elif field == 2 and wire == _LEN:
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            while pos < end:
                v, pos = _read_varint(buf, pos)
                tag_ints.append(v)
        elif field == 3:
            gtype, pos = _read_varint(buf, pos)
        elif field == 4 and wire == _LEN:
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            cx = cy = 0
            cur: list[tuple[int, int]] = []
            while pos < end:
                cmd, pos = _read_varint(buf, pos)
                cid, cnt = cmd & 7, cmd >> 3
                if cid == 1:  # MoveTo
                    if cur:
                        parts.append(np.asarray(cur, dtype=np.int64))
                        cur = []
                    for _ in range(cnt):
                        dx, pos = _read_varint(buf, pos)
                        dy, pos = _read_varint(buf, pos)
                        cx += _unzigzag(dx)
                        cy += _unzigzag(dy)
                        cur.append((cx, cy))
                elif cid == 2:  # LineTo
                    for _ in range(cnt):
                        dx, pos = _read_varint(buf, pos)
                        dy, pos = _read_varint(buf, pos)
                        cx += _unzigzag(dx)
                        cy += _unzigzag(dy)
                        cur.append((cx, cy))
                elif cid == 7:  # ClosePath
                    if cur:
                        cur.append(cur[0])
            if cur:
                parts.append(np.asarray(cur, dtype=np.int64))
        else:
            pos = _skip(buf, pos, wire)
    return {"id": fid, "type": gtype, "parts": parts, "tag_ints": tag_ints}
