"""GRIB2 (WMO FM 92 GRIB Edition 2) source/sink, from the published
spec — the reference reads this family through ``frmts/grib`` (a
degrib/g2clib vendoring); this is a from-scratch implementation of the
message layout itself.

Supported surface:

- Section 0 indicator (discipline, edition 2, 8-byte total length),
  section 1 identification (centre, reference time), section 3 grid
  definition template 3.0 (equidistant lat/lon grid, scanning modes
  0x00 north-to-south and 0x40 south-to-north), section 4 product
  definition template 4.0 (parameter category/number, forecast hour),
  section 5 data representation templates 5.0 (simple packing:
  ``Y = (R + X * 2^E) / 10^D`` with float32 reference R, sign-magnitude
  int16 binary/decimal scale factors), 5.2 (complex packing: grouped
  values with per-group reference/width and described group lengths)
  and 5.3 (complex packing + first/second-order spatial differencing —
  the operational NCEP packing), section 6 bitmap (indicator 0 =
  bitmap present, 255 = none; NaN cells round-trip through the bitmap),
  section 7 packed data (big-endian MSB-first bit stream), section 8
  ``7777`` terminator.  Multiple messages per file (the operational
  concatenated-file convention).
- All multi-byte integers big-endian; NEGATIVE values (latitudes,
  scale factors) in GRIB sign-and-magnitude form (high bit = sign),
  NOT two's complement.

Vectorized pack/unpack (np.packbits over an (n, nbits) bit matrix).
"""

from __future__ import annotations

import os
import struct

import numpy as np

_EDITION = 2


def _sm_bytes(v: int, width: int) -> bytes:
    """Signed int -> GRIB sign-and-magnitude big-endian bytes."""
    neg = v < 0
    mag = -v if neg else v
    top = 1 << (8 * width - 1)
    if mag >= top:
        raise ValueError(f"magnitude {mag} too large for {width} bytes")
    return int(mag | (top if neg else 0)).to_bytes(width, "big")


def _sm_read(b: bytes) -> int:
    """GRIB sign-and-magnitude bytes -> signed int."""
    v = int.from_bytes(b, "big")
    top = 1 << (8 * len(b) - 1)
    return -(v & (top - 1)) if v & top else v


def _pack_bits(x: np.ndarray, nbits: int) -> bytes:
    """Big-endian MSB-first packing of unsigned ints at nbits each."""
    if nbits == 0 or len(x) == 0:
        return b""
    shifts = np.arange(nbits - 1, -1, -1, dtype=np.uint32)
    bits = ((x[:, None].astype(np.uint64) >> shifts) & 1).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _unpack_bits(buf: bytes, n: int, nbits: int) -> np.ndarray:
    if nbits == 0 or n == 0:
        return np.zeros(n, np.int64)
    bits = np.unpackbits(np.frombuffer(buf, np.uint8),
                         count=n * nbits).reshape(n, nbits)
    powers = (np.int64(1) << np.arange(nbits - 1, -1, -1,
                                       dtype=np.int64))
    return bits.astype(np.int64) @ powers


def _png_pack(x: np.ndarray, ni: int, nj: int, depth: int,
              full_grid: bool) -> bytes:
    """Template 5.41 PNG stream: scaled non-negative ints -> a PNG
    image per the g2clib pngpack.c channel mapping (depth 8 = 8-bit
    gray, 16 = 16-bit gray big-endian, 24 = RGB, 32 = RGBA; width x
    height = ni x nj for bitmap-less grids, ndpts x 1 otherwise),
    filter 0 rows, one zlib IDAT — through the engine's own PNG
    plumbing (functions.codecs chunk writer)."""
    import zlib as _zlib

    from ..functions.codecs import _PNG_SIG, _chunk

    w, h = (ni, nj) if full_grid else (int(x.size), 1)
    if depth == 8:
        ctype, bd, spp = 0, 8, 1
        px = x.astype(">u1").reshape(h, w)
        row_bytes = px.reshape(h, w)
    elif depth == 16:
        ctype, bd, spp = 0, 16, 1
        row_bytes = x.astype(">u2").reshape(h, w).view(np.uint8)             .reshape(h, 2 * w)
    elif depth == 24:
        ctype, bd, spp = 2, 8, 3
        b = np.empty((h, w, 3), np.uint8)
        xv = x.reshape(h, w)
        b[:, :, 0] = (xv >> 16) & 0xFF
        b[:, :, 1] = (xv >> 8) & 0xFF
        b[:, :, 2] = xv & 0xFF
        row_bytes = b.reshape(h, 3 * w)
    else:  # 32
        ctype, bd, spp = 6, 8, 4
        b = np.empty((h, w, 4), np.uint8)
        xv = x.reshape(h, w)
        b[:, :, 0] = (xv >> 24) & 0xFF
        b[:, :, 1] = (xv >> 16) & 0xFF
        b[:, :, 2] = (xv >> 8) & 0xFF
        b[:, :, 3] = xv & 0xFF
        row_bytes = b.reshape(h, 4 * w)
    raw = np.empty((h, 1 + row_bytes.shape[1]), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = row_bytes
    ihdr = struct.pack(">IIBBBBB", w, h, bd, ctype, 0, 0, 0)
    idat = _zlib.compress(raw.tobytes(), 6)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _png_unpack(data: bytes, n: int) -> np.ndarray:
    """Template 5.41 inverse: PNG stream -> int64 scaled values (the
    g2clib pngunpack.c channel mapping; filter-0 rows as written by
    _png_pack)."""
    import zlib as _zlib

    from ..functions.codecs import _PNG_SIG

    if data[:8] != _PNG_SIG:
        raise ValueError("GRIB2 5.41: section 7 is not a PNG stream")
    pos = 8
    idat = []
    w = h = bd = ctype = None
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bd, ctype = struct.unpack_from(">IIBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(_zlib.decompress(b"".join(idat)), np.uint8)
    spp = {0: 1, 2: 3, 6: 4}[ctype]
    stride = 1 + w * spp * (bd // 8)
    raw = raw.reshape(h, stride)
    if raw[:, 0].any():
        raise ValueError("GRIB2 5.41: only filter-0 PNG rows supported")
    body = raw[:, 1:]
    if ctype == 0 and bd == 8:
        x = body.reshape(-1).astype(np.int64)
    elif ctype == 0 and bd == 16:
        x = body.reshape(h, w, 2).astype(np.int64)
        x = (x[:, :, 0] << 8) | x[:, :, 1]
        x = x.reshape(-1)
    elif ctype == 2:
        x = body.reshape(h, w, 3).astype(np.int64)
        x = (x[:, :, 0] << 16) | (x[:, :, 1] << 8) | x[:, :, 2]
        x = x.reshape(-1)
    else:
        x = body.reshape(h, w, 4).astype(np.int64)
        x = ((x[:, :, 0] << 24) | (x[:, :, 1] << 16)
             | (x[:, :, 2] << 8) | x[:, :, 3])
        x = x.reshape(-1)
    if x.size != n:
        raise ValueError(f"GRIB2 5.41: {x.size} pixels != {n} points")
    return x


def _microdeg(v: float) -> int:
    return int(round(v * 1_000_000))


def _byte_align(bits: list[bytes]) -> bytes:
    """Each packed sub-stream of a complex-packing data section starts
    on an octet boundary (_pack_bits already pads each to bytes)."""
    return b"".join(bits)


def _complex_pack(x: np.ndarray, ref: float, d_scale: int,
                  packing: int, order: int, group_size: int):
    """Templates 5.2 (complex) / 5.3 (complex + spatial differencing):
    returns (section 5 bytes, section 7 payload).

    The encoder's group splitting is fixed-size (``group_size`` values,
    shorter last group) — any splitting is spec-legal; the stream
    describes its own groups.  For 5.3 the field is differenced at
    ``order`` (1 or 2), the first ``order`` values ride the section-7
    prologue as sign-magnitude ints together with the overall minimum
    of the differences (the template's extra-descriptor octets), and
    the first ``order`` packed positions hold zeros (the g2clib
    convention).  Group reference values / widths / lengths / data
    each start on an octet boundary."""
    n = int(x.size)
    if packing == 3:
        if order not in (1, 2):
            raise ValueError("diff_order must be 1 or 2")
        if n <= order:
            raise ValueError("field too small for spatial differencing")
        d = x.astype(np.int64)
        if order == 1:
            h = np.concatenate([[0], np.diff(d)])
            init = [int(d[0])]
        else:
            h = np.concatenate([[0, 0],
                                d[2:] - 2 * d[1:-1] + d[:-2]])
            init = [int(d[0]), int(d[1])]
        gmin = int(h[order:].min())
        work = h.copy()
        work[order:] -= gmin
        work[:order] = 0
        extras = init + [gmin]
        extra_octets = max(
            (max(abs(v) for v in extras).bit_length() + 8) // 8, 1)
    else:
        work = x.astype(np.int64)
        extras, extra_octets, gmin = [], 0, 0
    # fixed-size group split
    ng = -(-n // group_size)
    last_len = n - (ng - 1) * group_size
    grefs = np.empty(ng, np.int64)
    gwidths = np.empty(ng, np.int64)
    datas = []
    for g in range(ng):
        seg = work[g * group_size:(g + 1) * group_size]
        lo = int(seg.min())
        grefs[g] = lo
        rel = seg - lo
        w = int(rel.max()).bit_length()
        gwidths[g] = w
        datas.append((rel.astype(np.uint64), w))
    ref_bits = max(1, int(grefs.max()).bit_length())
    wmin = int(gwidths.min())
    wbits = max(int((gwidths - wmin).max()).bit_length(), 1)
    sec5 = (struct.pack(">IBIH", 47 + (2 if packing == 3 else 0),
                        5, n, packing)
            + struct.pack(">f", ref)
            + _sm_bytes(0, 2)                   # binary scale E = 0
            + _sm_bytes(d_scale, 2)
            + struct.pack(">BB", ref_bits, 0)
            + struct.pack(">BB", 1, 0)          # general split, no MV
            + struct.pack(">II", 0, 0)          # missing substitutes
            + struct.pack(">I", ng)
            + struct.pack(">BB", wmin, wbits)
            + struct.pack(">IB", group_size, 1)  # len ref, len inc
            + struct.pack(">I", last_len)
            + struct.pack(">B", 0))             # scaled lens: 0 bits
    if packing == 3:
        sec5 += struct.pack(">BB", order, extra_octets)
    streams = []
    if packing == 3:
        streams.append(b"".join(_sm_bytes(v, extra_octets)
                                for v in extras))
    streams.append(_pack_bits(grefs.astype(np.uint64), ref_bits))
    streams.append(_pack_bits((gwidths - wmin).astype(np.uint64),
                              wbits))
    streams.append(b"")                          # scaled lengths: 0 bits
    streams.append(b"".join(_pack_bits(rel, w) for rel, w in datas))
    return sec5, _byte_align(streams)


def _complex_unpack(s5: bytes, payload: bytes, n: int,
                    packing: int) -> np.ndarray:
    """Inverse of :func:`_complex_pack` -> float64 values (pre-bitmap
    scatter)."""
    ref = struct.unpack(">f", s5[11:15])[0]
    e_scale = _sm_read(s5[15:17])
    d_scale = _sm_read(s5[17:19])
    ref_bits = s5[19]
    split, mv = s5[21], s5[22]
    if split != 1 or mv != 0:
        raise ValueError("GRIB2 complex packing: only general group "
                         "splitting without missing-value management")
    ng = struct.unpack(">I", s5[31:35])[0]
    wmin, wbits = s5[35], s5[36]
    len_ref = struct.unpack(">I", s5[37:41])[0]
    len_inc = s5[41]
    last_len = struct.unpack(">I", s5[42:46])[0]
    lbits = s5[46]
    pos = 0
    if packing == 3:
        order, extra_octets = s5[47], s5[48]
        extras = [_sm_read(payload[k * extra_octets:
                                   (k + 1) * extra_octets])
                  for k in range(order + 1)]
        pos = (order + 1) * extra_octets
    grefs = _unpack_bits(payload[pos:], ng, ref_bits)
    pos += (ng * ref_bits + 7) // 8
    gw = _unpack_bits(payload[pos:], ng, wbits) + wmin
    pos += (ng * wbits + 7) // 8
    glen = _unpack_bits(payload[pos:], ng, lbits) * len_inc + len_ref
    pos += (ng * lbits + 7) // 8
    glen[-1] = last_len
    if int(glen.sum()) != n:
        raise ValueError("GRIB2 complex packing: group lengths != n")
    out = np.empty(n, np.int64)
    at = 0
    for g in range(ng):
        ln, w = int(glen[g]), int(gw[g])
        vals = _unpack_bits(payload[pos:], ln, w) + grefs[g]
        pos += (ln * w + 7) // 8
        out[at:at + ln] = vals
        at += ln
    if packing == 3:
        out[order:] += extras[-1]               # + gmin
        if order == 1:
            out[0] = extras[0]
            out = np.cumsum(out)
        else:                                   # integrate twice
            first = np.concatenate(
                [[extras[1] - extras[0]], out[2:]]).cumsum()
            out = np.concatenate([[np.int64(extras[0])],
                                  extras[0] + first.cumsum()])
    return (ref + out.astype(np.float64) * 2.0 ** e_scale) \
        / 10.0 ** d_scale


def write_grib2(path: str, messages: list[dict]) -> None:
    """Write a multi-message GRIB2 file.

    Each message dict: ``values`` (nj, ni) float array in SCAN ORDER
    (row 0 = first scanned row; NaN cells become bitmap-absent),
    ``lat1``/``lon1`` (degrees of the first grid point), ``di``/``dj``
    (positive degree increments), ``scan`` (0x00 = rows scan W->E top
    lat first going south, 0x40 = going north; default 0x00), plus
    optional ``discipline`` (0), ``param_category`` (0),
    ``param_number`` (0), ``forecast_hours`` (0), ``decimal_scale`` D
    (0), ``ref_time`` (2020,1,1,0,0,0), ``centre`` (255).
    """
    out = []
    for msg in messages:
        vals = np.asarray(msg["values"], np.float64)
        if vals.ndim != 2:
            raise ValueError("GRIB2 values must be 2-D (nj, ni)")
        nj, ni = vals.shape
        n = ni * nj
        scan = int(msg.get("scan", 0x00))
        if scan not in (0x00, 0x40):
            raise ValueError(f"unsupported scanning mode 0x{scan:02x} "
                             "(0x00 / 0x40)")
        d_scale = int(msg.get("decimal_scale", 0))
        flat = vals.ravel()
        present = np.isfinite(flat)
        has_bitmap = not present.all()
        data = flat[present]
        if data.size == 0:
            raise ValueError("GRIB2 message with no present data points")
        scaled = np.round(data * (10.0 ** d_scale))
        if np.abs(scaled).max() >= 2 ** 53:
            raise ValueError("values overflow the packing range at "
                             f"decimal scale {d_scale}")
        packing = int(msg.get("packing", 0))
        if packing not in (0, 2, 3, 41):
            raise ValueError(f"data template 5.{packing} unsupported "
                             "(0 simple / 2 complex / 3 complex+diff / "
                             "41 PNG)")
        ref = float(scaled.min())
        x = (scaled - ref).astype(np.int64)
        xmax = int(x.max())
        nbits = max(1, xmax.bit_length())
        # --- section 1: identification
        yy, mo, dd, hh, mi, ss = msg.get("ref_time",
                                         (2020, 1, 1, 0, 0, 0))
        sec1 = (struct.pack(">IB", 21, 1)
                + struct.pack(">HHBBB", int(msg.get("centre", 255)),
                              0, 2, 1, 1)
                + struct.pack(">HBBBBB", yy, mo, dd, hh, mi, ss)
                + struct.pack(">BB", 0, 1))
        # --- section 3: grid definition template 3.0 (lat/lon)
        earth = (struct.pack(">B", 6)          # shape of earth: sphere
                 + b"\xff" + b"\xff\xff\xff\xff"  # radius n/a
                 + b"\xff" + b"\xff\xff\xff\xff"  # major n/a
                 + b"\xff" + b"\xff\xff\xff\xff")  # minor n/a
        ps = msg.get("polar_stereo")
        if ps is not None:
            # grid template 3.20: polar stereographic — first point
            # geographic, Dx/Dy in millimetres at latitude LaD
            tmpl3 = (earth
                     + struct.pack(">II", ni, nj)
                     + _sm_bytes(_microdeg(float(ps["la1"])), 4)
                     + _sm_bytes(_microdeg(float(ps["lo1"]) % 360.0),
                                 4)
                     + struct.pack(">B", 0x30)
                     + _sm_bytes(_microdeg(float(ps["lad"])), 4)
                     + _sm_bytes(_microdeg(float(ps["lov"]) % 360.0),
                                 4)
                     + struct.pack(">II",
                                   int(round(ps["dx_m"] * 1000.0)),
                                   int(round(ps["dy_m"] * 1000.0)))
                     + struct.pack(">B", 0x80 if ps.get("south")
                                   else 0)
                     + struct.pack(">B", scan))
            sec3 = (struct.pack(">IBBIBBH", 14 + len(tmpl3), 3, 0, n,
                                0, 0, 20) + tmpl3)
            assert len(sec3) == 65
            lam = None
        elif (lam := msg.get("lambert")) is not None:
            # grid template 3.30: Lambert conformal (the NAM/HRRR-class
            # operational grid) — first point geographic, regular
            # Dx/Dy (millimetres) spacing in the LCC plane
            tmpl3 = (earth
                     + struct.pack(">II", ni, nj)
                     + _sm_bytes(_microdeg(float(lam["la1"])), 4)
                     + _sm_bytes(_microdeg(float(lam["lo1"]) % 360.0),
                                 4)
                     + struct.pack(">B", 0x30)
                     + _sm_bytes(_microdeg(float(lam["lad"])), 4)
                     + _sm_bytes(_microdeg(float(lam["lov"]) % 360.0),
                                 4)
                     + struct.pack(">II",
                                   int(round(lam["dx_m"] * 1000.0)),
                                   int(round(lam["dy_m"] * 1000.0)))
                     + struct.pack(">B", 0)      # projection centre: N
                     + struct.pack(">B", scan)
                     + _sm_bytes(_microdeg(float(lam["latin1"])), 4)
                     + _sm_bytes(_microdeg(float(lam["latin2"])), 4)
                     + _sm_bytes(_microdeg(-90.0), 4)
                     + struct.pack(">I", 0))     # southern pole
            sec3 = (struct.pack(">IBBIBBH", 14 + len(tmpl3), 3, 0, n,
                                0, 0, 30) + tmpl3)
            assert len(sec3) == 81
        else:
            lat1 = float(msg["lat1"])
            lon1 = float(msg["lon1"])
            di = float(msg["di"])
            dj = float(msg["dj"])
            sgn_j = 1.0 if scan == 0x40 else -1.0
            lat2 = lat1 + sgn_j * dj * (nj - 1)
            lon2 = lon1 + di * (ni - 1)
            tmpl3 = (earth
                     + struct.pack(">II", ni, nj)
                     + struct.pack(">II", 0, 0)    # basic angle
                     + _sm_bytes(_microdeg(lat1), 4)
                     + _sm_bytes(_microdeg(lon1 % 360.0), 4)
                     + struct.pack(">B", 0x30)     # increments given
                     + _sm_bytes(_microdeg(lat2), 4)
                     + _sm_bytes(_microdeg(lon2 % 360.0), 4)
                     + struct.pack(">II", _microdeg(di), _microdeg(dj))
                     + struct.pack(">B", scan))
            sec3 = (struct.pack(">IBBIBBH", 72, 3, 0, n, 0, 0, 0)
                    + tmpl3)
            assert len(sec3) == 72
        # --- section 4: product definition template 4.0
        tmpl4 = struct.pack(
            ">BBBBBHBBiBbIBbI",
            int(msg.get("param_category", 0)),
            int(msg.get("param_number", 0)),
            0, 255, 0, 0, 0,
            1,                                  # time unit: hours
            int(msg.get("forecast_hours", 0)),
            1, 0, 0,                            # first surface: ground
            255, 0, 0)                          # second surface: none
        sec4 = struct.pack(">IBHH", 9 + len(tmpl4), 4, 0, 0) + tmpl4
        # --- sections 5 + 7: data representation + packed data
        if packing == 0:                        # template 5.0: simple
            sec5 = (struct.pack(">IBIH", 21, 5, int(data.size), 0)
                    + struct.pack(">f", ref)
                    + _sm_bytes(0, 2)           # binary scale E = 0
                    + _sm_bytes(d_scale, 2)
                    + struct.pack(">BB", nbits, 0))
            packed = _pack_bits(x.astype(np.uint64), nbits)
        elif packing == 41:                     # template 5.41: PNG
            depth = next(d for d in (8, 16, 24, 32) if nbits <= d)
            sec5 = (struct.pack(">IBIH", 21, 5, int(data.size), 41)
                    + struct.pack(">f", ref)
                    + _sm_bytes(0, 2)           # binary scale E = 0
                    + _sm_bytes(d_scale, 2)
                    + struct.pack(">BB", depth, 0))
            packed = _png_pack(x, ni, nj, depth, not has_bitmap)
        else:                                   # templates 5.2 / 5.3
            order = int(msg.get("diff_order", 2)) if packing == 3 else 0
            sec5, packed = _complex_pack(
                x, ref, d_scale, packing, order,
                int(msg.get("group_size", 32)))
        # --- section 6: bitmap
        if has_bitmap:
            bm = np.packbits(present.astype(np.uint8)).tobytes()
            sec6 = struct.pack(">IBB", 6 + len(bm), 6, 0) + bm
        else:
            sec6 = struct.pack(">IBB", 6, 6, 255)
        sec7 = struct.pack(">IB", 5 + len(packed), 7) + packed
        body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
        total = 16 + len(body) + 4
        sec0 = (b"GRIB" + b"\x00\x00"
                + struct.pack(">BB", int(msg.get("discipline", 0)),
                              _EDITION)
                + struct.pack(">Q", total))
        out.append(sec0 + body + b"7777")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(b"".join(out))
    os.replace(tmp, path)


def scan_grib2(path: str) -> list[tuple[int, int]]:
    """Cheap index pass: (offset, length) of every message in the file
    (reads only the 16-byte indicator sections)."""
    spans = []
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        pos = 0
        while pos < size:
            fh.seek(pos)
            head = fh.read(16)
            if len(head) < 16 or head[:4] != b"GRIB":
                raise ValueError(f"GRIB2: bad indicator at offset {pos}")
            if head[7] != _EDITION:
                raise ValueError(f"GRIB2: edition {head[7]} unsupported")
            length = struct.unpack(">Q", head[8:16])[0]
            spans.append((pos, int(length)))
            pos += length
    return spans


def _decode_message(buf: bytes) -> dict:
    """Decode ONE message (buf = the full GRIB..7777 span)."""
    if buf[:4] != b"GRIB" or buf[-4:] != b"7777":
        raise ValueError("GRIB2: message framing broken")
    msg = {"discipline": buf[6], "edition": buf[7]}
    pos = 16
    sections: dict[int, bytes] = {}
    while pos < len(buf) - 4:
        ln = struct.unpack(">I", buf[pos:pos + 4])[0]
        num = buf[pos + 4]
        sections[num] = buf[pos:pos + ln]
        pos += ln
    for need in (1, 3, 4, 5, 6, 7):
        if need not in sections:
            raise ValueError(f"GRIB2: missing section {need}")
    s1 = sections[1]
    msg["centre"] = struct.unpack(">H", s1[5:7])[0]
    msg["ref_time"] = struct.unpack(">HBBBBB", s1[12:19])
    # section 3: lat/lon template
    s3 = sections[3]
    tnum = struct.unpack(">H", s3[12:14])[0]
    if tnum not in (0, 20, 30):
        raise ValueError(f"GRIB2: grid template 3.{tnum} unsupported "
                         "(3.0 lat/lon / 3.20 polar stereo / "
                         "3.30 Lambert)")
    t = s3[14:]
    ni, nj = struct.unpack(">II", t[16:24])
    msg["ni"], msg["nj"] = ni, nj
    if tnum == 20:
        msg["polar_stereo"] = {
            "la1": _sm_read(t[24:28]) / 1e6,
            "lo1": _sm_read(t[28:32]) / 1e6,
            "lad": _sm_read(t[33:37]) / 1e6,
            "lov": _sm_read(t[37:41]) / 1e6,
            "dx_m": struct.unpack(">I", t[41:45])[0] / 1000.0,
            "dy_m": struct.unpack(">I", t[45:49])[0] / 1000.0,
            "south": bool(t[49] & 0x80),
        }
        scan = t[50]
    elif tnum == 30:
        msg["lambert"] = {
            "la1": _sm_read(t[24:28]) / 1e6,
            "lo1": _sm_read(t[28:32]) / 1e6,
            "lad": _sm_read(t[33:37]) / 1e6,
            "lov": _sm_read(t[37:41]) / 1e6,
            "dx_m": struct.unpack(">I", t[41:45])[0] / 1000.0,
            "dy_m": struct.unpack(">I", t[45:49])[0] / 1000.0,
            "latin1": _sm_read(t[51:55]) / 1e6,
            "latin2": _sm_read(t[55:59]) / 1e6,
        }
        scan = t[50]
    else:
        msg["lat1"] = _sm_read(t[32:36]) / 1e6
        msg["lon1"] = _sm_read(t[36:40]) / 1e6
        msg["lat2"] = _sm_read(t[41:45]) / 1e6
        msg["lon2"] = _sm_read(t[45:49]) / 1e6
        msg["di"] = struct.unpack(">I", t[49:53])[0] / 1e6
        msg["dj"] = struct.unpack(">I", t[53:57])[0] / 1e6
        scan = t[57]
    if scan not in (0x00, 0x40):
        raise ValueError(f"GRIB2: scanning mode 0x{scan:02x} unsupported")
    msg["scan"] = scan
    # section 4: product template 4.0
    s4 = sections[4]
    ptnum = struct.unpack(">H", s4[7:9])[0]
    if ptnum != 0:
        raise ValueError(f"GRIB2: product template 4.{ptnum} unsupported")
    msg["param_category"] = s4[9]
    msg["param_number"] = s4[10]
    msg["forecast_hours"] = struct.unpack(">i", s4[18:22])[0]
    # section 5: data representation
    s5 = sections[5]
    n_packed = struct.unpack(">I", s5[5:9])[0]
    dtnum = struct.unpack(">H", s5[9:11])[0]
    if dtnum not in (0, 2, 3, 41):
        raise ValueError(f"GRIB2: data template 5.{dtnum} unsupported "
                         "(5.0 simple / 5.2 complex / 5.3 +diff / "
                         "5.41 PNG)")
    msg["packing"] = dtnum
    # section 6: bitmap
    s6 = sections[6]
    ind = s6[5]
    n = ni * nj
    if ind == 0:
        present = np.unpackbits(np.frombuffer(s6[6:], np.uint8),
                                count=n).astype(bool)
    elif ind == 255:
        present = np.ones(n, bool)
    else:
        raise ValueError(f"GRIB2: bitmap indicator {ind} unsupported")
    if int(present.sum()) != n_packed:
        raise ValueError("GRIB2: bitmap count != packed data count")
    # section 7: packed data
    if dtnum in (0, 41):
        ref = struct.unpack(">f", s5[11:15])[0]
        e_scale = _sm_read(s5[15:17])
        d_scale = _sm_read(s5[17:19])
        nbits = s5[19]
        if dtnum == 41:
            x = _png_unpack(sections[7][5:], n_packed)
        else:
            x = _unpack_bits(sections[7][5:], n_packed, nbits)
        y = (ref + x.astype(np.float64) * 2.0 ** e_scale) \
            / 10.0 ** d_scale
    else:
        y = _complex_unpack(s5, sections[7][5:], n_packed, dtnum)
    flat = np.full(n, np.nan)
    flat[present] = y
    msg["values"] = flat.reshape(nj, ni)
    return msg


def read_grib2(path: str) -> list[dict]:
    """Read every message in a GRIB2 file (driver-side; for the
    distributed form use :func:`read_grib2_rows`)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    return [_decode_message(buf[off:off + ln])
            for off, ln in scan_grib2(path)]


def grid_xy_stereo(msg: dict):
    """Projected x/y axes (meters, SCAN ORDER) + the engine polar-
    stereographic transform of a template-3.20 message (LaD is the
    standard parallel, LoV the orientation longitude; the projection-
    centre flag selects the south variant)."""
    from ..functions.proj import PolarStereographic

    ps = msg.get("polar_stereo")
    if ps is None:
        raise ValueError("not a polar-stereo (template 3.20) message")
    lov = ps["lov"]
    if lov > 180.0:
        lov -= 360.0
    prj = PolarStereographic(ps["lad"], lov, 0.0, 0.0,
                             south=ps["south"])
    lo1 = ps["lo1"]
    if lo1 > 180.0:
        lo1 -= 360.0
    x0, y0 = prj.fwd(np.array([lo1]), np.array([ps["la1"]]))
    sgn = 1.0 if msg["scan"] == 0x40 else -1.0
    xs = x0[0] + ps["dx_m"] * np.arange(msg["ni"])
    ys = y0[0] + sgn * ps["dy_m"] * np.arange(msg["nj"])
    return xs, ys, prj


def grid_xy_lambert(msg: dict):
    """Projected x/y axes (meters, SCAN ORDER) + the engine LCC
    transform of a template-3.30 message: the first grid point's
    geographic (la1, lo1) forward-projects to the grid origin, rows/
    columns step by Dy/Dx in the LCC plane.  Grids declare
    (latin1, latin2, lad, lov) which parameterize
    functions.proj.LambertConformalConic directly."""
    from ..functions.proj import LambertConformalConic

    lam = msg.get("lambert")
    if lam is None:
        raise ValueError("not a Lambert (template 3.30) message")
    lov = lam["lov"]
    if lov > 180.0:
        lov -= 360.0          # grids carry 0..360 longitudes
    prj = LambertConformalConic(lam["latin1"], lam["latin2"],
                                lam["lad"], lov, 0.0, 0.0)
    lo1 = lam["lo1"]
    if lo1 > 180.0:
        lo1 -= 360.0
    x0, y0 = prj.fwd(np.array([lo1]), np.array([lam["la1"]]))
    sgn = 1.0 if msg["scan"] == 0x40 else -1.0
    xs = x0[0] + lam["dx_m"] * np.arange(msg["ni"])
    ys = y0[0] + sgn * lam["dy_m"] * np.arange(msg["nj"])
    return xs, ys, prj


def grid_lats_lons(msg: dict) -> tuple[np.ndarray, np.ndarray]:
    """Per-row latitudes / per-column longitudes of a decoded
    LAT/LON-grid message in SCAN ORDER (row j of values is at
    lats[j]); Lambert / polar-stereo messages use
    :func:`grid_xy_lambert` / :func:`grid_xy_stereo`."""
    if "lambert" in msg:
        raise ValueError("Lambert grid: use grid_xy_lambert")
    if "polar_stereo" in msg:
        raise ValueError("polar-stereo grid: use grid_xy_stereo")
    sgn = 1.0 if msg["scan"] == 0x40 else -1.0
    lats = msg["lat1"] + sgn * msg["dj"] * np.arange(msg["nj"])
    lons = msg["lon1"] + msg["di"] * np.arange(msg["ni"])
    return lats, lons


def read_grib2_rows(path: str, parallelism: int = 16):
    """Ray Dataset over a (multi-message) GRIB2 file: the driver scans
    only the 16-byte indicators for message spans; each task ranged-
    reads and decodes its own messages (messages are the natural block
    grain of operational GRIB files).  Rows: msg_id, discipline,
    param_category, param_number, forecast_hours, grid_template, ni,
    nj, lat1, lon1, di, dj, scan, values (row-major float64 bytes,
    NaN = bitmap absent).  Lambert (template 3.30) messages carry NaN
    lat/lon-grid fields — recover their axes via
    :func:`grid_xy_lambert` on the decoded message."""
    import pyarrow as pa
    import ray.data as rd

    spans = scan_grib2(path)

    def fetch(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in
                ("msg_id", "discipline", "param_category", "param_number",
                 "forecast_hours", "grid_template", "ni", "nj", "lat1",
                 "lon1", "di", "dj", "scan", "values")}
        with open(path, "rb") as fh:
            for i in t.column("id").to_pylist():
                off, ln = spans[int(i)]
                fh.seek(off)
                m = _decode_message(fh.read(ln))
                cols["msg_id"].append(int(i))
                for k in ("discipline", "param_category", "param_number",
                          "forecast_hours", "ni", "nj", "scan"):
                    cols[k].append(int(m[k]))
                cols["grid_template"].append(
                    30 if "lambert" in m
                    else (20 if "polar_stereo" in m else 0))
                for k in ("lat1", "lon1", "di", "dj"):
                    cols[k].append(float(m.get(k, float("nan"))))
                cols["values"].append(
                    np.ascontiguousarray(m["values"]).tobytes())
        return pa.table(
            {k: pa.array(v, pa.binary() if k == "values" else
                         (pa.float64() if k in ("lat1", "lon1", "di",
                                                "dj") else pa.int64()))
             for k, v in cols.items()})

    ids = rd.range(len(spans),
                   override_num_blocks=min(parallelism, len(spans)))
    return ids.map_batches(fetch, batch_format="pyarrow")


def read_grib2_mdim(path: str, msg: int = 0, *, slab: int = 0,
                    parallelism: int = 16):
    """One GRIB2 message as mdim chunk rows + MDSpec (the
    sources.netcdf.read_netcdf contract): the (nj, ni) field splits
    into first-axis slabs, each task decoding the message once and
    emitting its slab rows.  Composes with the whole mdim step
    algebra."""
    import ray.data as rd

    from ..stages.mdim import MDSpec, _emit, _row

    spans = scan_grib2(path)
    if not (0 <= msg < len(spans)):
        raise ValueError(f"message {msg} out of range ({len(spans)})")
    off, ln = spans[msg]
    with open(path, "rb") as fh:
        fh.seek(off)
        head = _decode_message(fh.read(ln))
    nj, ni = head["nj"], head["ni"]
    if slab <= 0:
        slab = max(1, -(-nj // parallelism))
    spec = MDSpec((nj, ni), (slab, ni), "float64")
    n_slabs = -(-nj // slab)

    def fetch(t):
        with open(path, "rb") as fh:
            fh.seek(off)
            vals = _decode_message(fh.read(ln))["values"]
        rows = []
        for i in t.column("id").to_pylist():
            r0 = int(i) * slab
            chunk = np.ascontiguousarray(vals[r0:r0 + slab])
            rows.append(_row((r0 // slab, 0), chunk))
        return _emit(rows)

    ids = rd.range(n_slabs, override_num_blocks=min(parallelism, n_slabs))
    return ids.map_batches(fetch, batch_format="pyarrow"), spec
