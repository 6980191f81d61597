"""NITF 2.1 (MIL-STD-2500C / NSIF 1.0) source/sink — the reference's
``frmts/nitf`` driver family, reimplemented from the published spec for
the uncompressed interchange core:

- file header (``NITF02.10``), fixed-width space-padded ASCII fields,
  the 167-byte security block, FL/HL byte accounting, per-segment
  LISH/LI length table;
- image segments: uncompressed (``IC=NC``), 8-bit (``NBPP=08``,
  ``PVTYPE=INT``), MONO or RGB (``IREP``), band-interleaved-by-block
  (``IMODE=B``) or pixel-interleaved (``IMODE=P``), an NBPR x NBPC
  block grid of fixed NPPBH x NPPBV blocks with zero-padded partial
  edge blocks;
- geographic corners: ``ICORDS=G`` with the 60-byte ``IGEOLO``
  ddmmssXdddmmssY corner string (0,0 / 0,maxcol / maxrow,maxcol /
  maxrow,0 order), or ``ICORDS=' '`` for none;
- multiple image segments per file; image comments.

IC=C3 (baseline JPEG, MIL-STD-188-198A) reads and writes through the
in-engine T.81 codec (functions.jpegc): one complete JPEG stream per
block, MONO 1-component or RGB 3-component (IMODE=P).  Remaining
compressed IC codes (C8 = J2K, M* masked) are rejected
explicitly.
"""

from __future__ import annotations

import os
import struct

import numpy as np


def _a(value, width: int) -> bytes:
    """BCS-A field: left-justified, space-padded ASCII."""
    b = str(value).encode("ascii")
    if len(b) > width:
        raise ValueError(f"NITF field {value!r} exceeds {width} bytes")
    return b.ljust(width)


def _n(value: int, width: int) -> bytes:
    """BCS-N positive integer field: right-justified, zero-filled."""
    s = str(int(value))
    if len(s) > width:
        raise ValueError(f"NITF numeric {value} exceeds {width} digits")
    return s.zfill(width).encode("ascii")


# 167-byte security block (FSCLAS..FSCTLN / ISCLAS..ISCTLN), all
# defaulted to unclassified/empty
def _security(clas: str = "U") -> bytes:
    return (_a(clas, 1) + _a("", 2) + _a("", 11) + _a("", 2)
            + _a("", 20) + _a("", 2) + _a("", 8) + _a("", 4)
            + _a("", 1) + _a("", 8) + _a("", 43) + _a("", 1)
            + _a("", 40) + _a("", 1) + _a("", 8) + _a("", 15))


_SECURITY_LEN = 167


def _dms_lat(deg: float) -> bytes:
    h = b"S" if deg < 0 else b"N"
    v = abs(deg)
    d = int(v)
    m = int((v - d) * 60.0)
    s = int(round(((v - d) * 60.0 - m) * 60.0))
    if s == 60:
        s = 0
        m += 1
    if m == 60:
        m = 0
        d += 1
    return _n(d, 2) + _n(m, 2) + _n(s, 2) + h


def _dms_lon(deg: float) -> bytes:
    h = b"W" if deg < 0 else b"E"
    v = abs(deg)
    d = int(v)
    m = int((v - d) * 60.0)
    s = int(round(((v - d) * 60.0 - m) * 60.0))
    if s == 60:
        s = 0
        m += 1
    if m == 60:
        m = 0
        d += 1
    return _n(d, 3) + _n(m, 2) + _n(s, 2) + h


def _parse_dms(b: bytes, lon: bool) -> float:
    dw = 3 if lon else 2
    d = int(b[:dw])
    m = int(b[dw:dw + 2])
    s = int(b[dw + 2:dw + 4])
    hemi = chr(b[dw + 4])
    v = d + m / 60.0 + s / 3600.0
    return -v if hemi in ("S", "W") else v


def _igeolo(corners) -> bytes:
    """corners: 4 (lat, lon) pairs in the 2500C order (0,0), (0,max
    col), (maxrow, maxcol), (maxrow, 0)."""
    out = b""
    for lat, lon in corners:
        out += _dms_lat(lat) + _dms_lon(lon)
    if len(out) != 60:
        raise ValueError("IGEOLO needs exactly 4 corners")
    return out


def _blocks(arr: np.ndarray, nppbh: int, nppbv: int):
    """(nbpr, nbpc, padded blocks) of one band, zero-padded edges."""
    rows, cols = arr.shape
    nbpc = -(-rows // nppbv)  # blocks per column direction (vertical)
    nbpr = -(-cols // nppbh)  # blocks per row direction (horizontal)
    pad = np.zeros((nbpc * nppbv, nbpr * nppbh), arr.dtype)
    pad[:rows, :cols] = arr
    return nbpr, nbpc, pad


def write_nitf(path: str, images: list[dict], *,
               ostaid: str = "GDALRAY", ftitle: str = "",
               fdt: str = "20200101000000") -> None:
    """Write a NITF 2.1 file.

    Each image dict: ``values`` — (rows, cols) uint8 for MONO or
    (rows, cols, 3) uint8 for RGB; optional ``iid1`` (10-char id),
    ``idatim``, ``imode`` ('B' block-band-sequential, default, or 'P'
    pixel-interleaved), ``nppbh``/``nppbv`` (block size, default 256),
    ``corners`` (4 (lat, lon) pairs -> ICORDS=G + IGEOLO), ``icom``
    (list of <=80-char comment strings).
    """
    seg_headers: list[bytes] = []
    seg_datas: list[bytes] = []
    for k, im in enumerate(images):
        arr = np.asarray(im["values"])
        if arr.dtype != np.uint8:
            raise ValueError("NITF writer: only 8-bit (uint8) samples")
        if arr.ndim == 2:
            bands = [arr]
            irep = "MONO"
        elif arr.ndim == 3 and arr.shape[2] == 3:
            bands = [arr[:, :, b] for b in range(3)]
            irep = "RGB"
        else:
            raise ValueError("NITF writer: values must be (r, c) or "
                             "(r, c, 3)")
        rows, cols = bands[0].shape
        imode = im.get("imode", "B")
        if imode not in ("B", "P"):
            raise ValueError(f"IMODE {imode!r} unsupported (B / P)")
        nppbh = int(im.get("nppbh", 256))
        nppbv = int(im.get("nppbv", 256))
        ic = im.get("ic", "NC")
        if ic not in ("NC", "C3", "NM", "M3"):
            raise ValueError(f"IC {ic!r} unsupported (NC / C3 / NM / "
                             "M3)")
        masked = ic in ("NM", "M3")
        if ic in ("C3", "M3") and irep == "RGB" and imode != "P":
            # MIL-STD-188-198A: a 3-band JPEG block is one interleaved
            # 3-component stream — band-sequential C3 RGB undefined
            raise ValueError(f"IC={ic} RGB requires IMODE=P")
        if masked and irep == "RGB" and imode != "P":
            # one mask record per BLOCK: multiband needs the pixel-
            # interleaved layout (per-band mask grids out of scope)
            raise ValueError(f"IC={ic} RGB requires IMODE=P")
        blank = int(im.get("blank_value", 0)) if masked else None
        planes = [_blocks(b, nppbh, nppbv) for b in bands]
        nbpr, nbpc, _ = planes[0]
        chunks = []
        for bj in range(nbpc):
            for bi in range(nbpr):
                r0, c0 = bj * nppbv, bi * nppbh
                blocks = [p[2][r0:r0 + nppbv, c0:c0 + nppbh]
                          for p in planes]
                if masked and all((blk == blank).all()
                                  for blk in blocks):
                    chunks.append(None)       # blocked out of the file
                    continue
                if ic in ("C3", "M3"):
                    # one complete baseline-JPEG stream per block
                    # (frmts/nitf JPEG path; streams concatenate with
                    # no offset table for mask-less C3; M3 records
                    # per-block offsets in the mask table)
                    from ..functions.jpegc import (encode_jpeg,
                                                   encode_jpeg_gray)

                    q = int(im.get("quality", 90))
                    if irep == "MONO":
                        chunks.append(encode_jpeg_gray(blocks[0], q))
                    else:
                        chunks.append(encode_jpeg(
                            np.stack(blocks, axis=-1), q))
                elif imode == "B":
                    for blk in blocks:  # band-sequential inside block
                        chunks.append(blk.tobytes())
                else:  # P: pixel interleaved inside block
                    chunks.append(np.stack(blocks, axis=-1).tobytes())
        if masked:
            # Image Data Mask table (MIL-STD-2500C 5.4.3.2): IMDATOFF
            # (4-byte binary length of the mask table itself), BMRLNTH
            # =4 (block mask records present), TMRLNTH=0, TPXCDLNTH=0,
            # then one 4-byte big-endian offset per block — measured
            # from the first byte FOLLOWING the mask table;
            # 0xFFFFFFFF marks a blocked-out block.
            n_blocks = nbpr * nbpc
            imdatoff = 4 + 2 + 2 + 2 + 4 * n_blocks
            offs_tbl = []
            pos_d = 0
            for c in chunks:
                if c is None:
                    offs_tbl.append(0xFFFFFFFF)
                else:
                    offs_tbl.append(pos_d)
                    pos_d += len(c)
            data = (struct.pack(">IHHH", imdatoff, 4, 0, 0)
                    + b"".join(struct.pack(">I", o) for o in offs_tbl)
                    + b"".join(c for c in chunks if c is not None))
        else:
            data = b"".join(chunks)
        corners = im.get("corners")
        sub = (
            _a("IM", 2)
            + _a(im.get("iid1", f"IMG{k:03d}"), 10)
            + _a(im.get("idatim", fdt), 14)
            + _a("", 17)                      # TGTID
            + _a(im.get("iid2", ""), 80)
            + _security()
            + _a("0", 1)                      # ENCRYP
            + _a("", 42)                      # ISORCE
            + _n(rows, 8) + _n(cols, 8)
            + _a("INT", 3)                    # PVTYPE
            + _a(irep, 8)
            + _a("VIS", 8)                    # ICAT
            + _n(8, 2)                        # ABPP
            + _a("R", 1)                      # PJUST
            + (_a("G", 1) + _igeolo(corners) if corners
               else _a(" ", 1))
        )
        icom = im.get("icom", [])
        sub += _n(len(icom), 1)
        for c in icom:
            sub += _a(c, 80)
        sub += _a(ic, 2)                      # IC
        if ic in ("C3", "M3"):
            # COMRAT: achieved bits per pixel per band, NN.N
            bpp = 8.0 * len(data) / (rows * cols * len(bands))
            sub += _a(f"{min(bpp, 99.9):04.1f}", 4)
        sub += _n(len(bands), 1)              # NBANDS
        for bi, _b in enumerate(bands):
            rep = "M " if irep == "MONO" else ("R", "G", "B")[bi] + " "
            sub += (_a(rep, 2) + _a("", 6) + _a("N", 1) + _a("", 3)
                    + _n(0, 1))               # IREPBAND..NLUTS
        sub += (_n(0, 1)                      # ISYNC
                + _a(imode, 1)
                + _n(nbpr, 4) + _n(nbpc, 4)
                + _n(nppbh, 4) + _n(nppbv, 4)
                + _n(8, 2)                    # NBPP
                + _n(k + 1, 3)                # IDLVL
                + _n(0, 3)                    # IALVL
                + _a("0000000000", 10)        # ILOC
                + _a("1.0 ", 4))              # IMAG
        tres = im.get("tres", [])
        if tres:
            blob = b"".join(_a(tag, 6) + _n(len(data), 5) + data
                            for tag, data in tres)
            # IXSHDL includes the 3-byte IXSOFL overflow field
            sub += _n(0, 5) + _n(len(blob) + 3, 5) + _n(0, 3) + blob
        else:
            sub += _n(0, 5) + _n(0, 5)        # UDIDL, IXSHDL
        seg_headers.append(sub)
        seg_datas.append(data)

    numi = len(images)
    # file header length: fixed part + 16 bytes (LISH+LI) per image
    hl = (4 + 5 + 2 + 4 + 10 + 14 + 80 + _SECURITY_LEN + 5 + 5 + 1 + 3
          + 24 + 18 + 12 + 6 + 3 + numi * 16 + 3 + 3 + 3 + 3 + 3
          + 5 + 5)
    fl = hl + sum(len(h) + len(d)
                  for h, d in zip(seg_headers, seg_datas))
    head = (
        _a("NITF", 4) + _a("02.10", 5)
        + _n(3, 2)                            # CLEVEL
        + _a("BF01", 4)                       # STYPE
        + _a(ostaid, 10)
        + _a(fdt, 14)
        + _a(ftitle, 80)
        + _security()
        + _n(0, 5) + _n(0, 5)                 # FSCOP, FSCPYS
        + _a("0", 1)                          # ENCRYP
        + b"\x00\x00\x00"                     # FBKGC (binary RGB)
        + _a("", 24) + _a("", 18)             # ONAME, OPHONE
        + _n(fl, 12) + _n(hl, 6)
        + _n(numi, 3)
    )
    for h, d in zip(seg_headers, seg_datas):
        head += _n(len(h), 6) + _n(len(d), 10)
    head += (_n(0, 3) + _n(0, 3) + _n(0, 3) + _n(0, 3) + _n(0, 3)
             + _n(0, 5) + _n(0, 5))           # NUMS NUMX NUMT NUMDES
    assert len(head) == hl, (len(head), hl)   # NUMRES UDHDL XHDL
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(head)
        for h, d in zip(seg_headers, seg_datas):
            fh.write(h)
            fh.write(d)
    os.replace(tmp, path)


def _parse_image_subheader(buf: bytes, pos: int):
    """Parse one image subheader at pos -> (meta dict, data offset)."""
    m: dict = {}
    if buf[pos:pos + 2] != b"IM":
        raise ValueError(f"NITF: image subheader magic missing at {pos}")
    m["iid1"] = buf[pos + 2:pos + 12].decode().strip()
    m["idatim"] = buf[pos + 12:pos + 26].decode().strip()
    m["iid2"] = buf[pos + 43:pos + 123].decode().strip()
    p = pos + 123 + _SECURITY_LEN + 1 + 42     # skip security/ENCRYP/ISORCE
    m["rows"] = int(buf[p:p + 8])
    m["cols"] = int(buf[p + 8:p + 16])
    m["pvtype"] = buf[p + 16:p + 19].decode().strip()
    m["irep"] = buf[p + 19:p + 27].decode().strip()
    p += 27 + 8 + 2 + 1                        # ICAT, ABPP, PJUST
    icords = chr(buf[p])
    p += 1
    if icords != " ":
        if icords != "G":
            raise ValueError(f"NITF: ICORDS {icords!r} unsupported")
        geo = buf[p:p + 60]
        m["corners"] = [
            (_parse_dms(geo[i * 15:i * 15 + 7], False),
             _parse_dms(geo[i * 15 + 7:i * 15 + 15], True))
            for i in range(4)
        ]
        p += 60
    nicom = int(buf[p:p + 1])
    p += 1
    m["icom"] = [buf[p + i * 80:p + (i + 1) * 80].decode().rstrip()
                 for i in range(nicom)]
    p += nicom * 80
    ic = buf[p:p + 2].decode()
    if ic not in ("NC", "C3", "NM", "M3"):
        raise ValueError(f"NITF: compression {ic!r} unsupported "
                         "(NC / C3 / NM / M3)")
    p += 2
    m["ic"] = ic
    if ic in ("C3", "M3"):
        m["comrat"] = buf[p:p + 4].decode().strip()
        p += 4
    nbands = int(buf[p:p + 1])
    p += 1 + nbands * 13                       # band descriptors
    p += 1                                     # ISYNC
    m["imode"] = chr(buf[p])
    if m["imode"] not in ("B", "P"):
        raise ValueError(f"NITF: IMODE {m['imode']!r} unsupported "
                         "(B / P)")
    p += 1
    m["nbpr"] = int(buf[p:p + 4])
    m["nbpc"] = int(buf[p + 4:p + 8])
    m["nppbh"] = int(buf[p + 8:p + 12])
    m["nppbv"] = int(buf[p + 12:p + 16])
    m["nbpp"] = int(buf[p + 16:p + 18])
    p += 18 + 3 + 3 + 10 + 4                   # IDLVL..IMAG
    udidl = int(buf[p:p + 5])
    ixshdl = int(buf[p + 5:p + 10])
    p += 10
    m["tres"] = []

    def _parse_tres(blob: bytes):
        q = 0
        while q + 11 <= len(blob):
            tag = blob[q:q + 6].decode().strip()
            ln = int(blob[q + 6:q + 11])
            m["tres"].append((tag, blob[q + 11:q + 11 + ln]))
            q += 11 + ln

    if udidl > 0:
        _parse_tres(buf[p + 3:p + udidl])      # skip UDOFL
    p += udidl
    if ixshdl > 0:
        _parse_tres(buf[p + 3:p + ixshdl])     # skip IXSOFL
    p += ixshdl
    m["nbands"] = nbands
    return m, p


def read_nitf(path: str) -> list[dict]:
    """Read a NITF 2.1 file -> one dict per image segment: ``values``
    ((rows, cols) or (rows, cols, 3) uint8), ids, ``corners`` (4
    (lat, lon) pairs when ICORDS=G), comments, block geometry."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:9] != b"NITF02.10":
        raise ValueError("not a NITF 2.1 file")
    fl = int(buf[342:354])
    hl = int(buf[354:360])
    if fl != len(buf):
        raise ValueError(f"NITF: FL {fl} != file size {len(buf)}")
    numi = int(buf[360:363])
    lish, li = [], []
    p = 363
    for _ in range(numi):
        lish.append(int(buf[p:p + 6]))
        li.append(int(buf[p + 6:p + 16]))
        p += 16
    out = []
    pos = hl
    for k in range(numi):
        seg = buf[pos:pos + lish[k] + li[k]]
        m, dpos = _parse_image_subheader(seg, 0)
        if dpos != lish[k]:
            raise ValueError(
                f"NITF: subheader length {dpos} != LISH {lish[k]}")
        if m["nbpp"] != 8 or m["pvtype"] != "INT":
            raise ValueError("NITF: only 8-bit INT samples supported")
        if m.get("ic") == "NC":
            expect = (m["nbpr"] * m["nbpc"] * m["nppbh"] * m["nppbv"]
                      * m["nbands"])
            if expect != li[k]:
                raise ValueError(
                    f"NITF: block data {expect} != LI {li[k]}")
        m["values"] = _decode_segment(seg, m, dpos)
        out.append(m)
        pos += lish[k] + li[k]
    return out


def read_nitf_rows(path: str, parallelism: int = 8):
    """Ray Dataset over a NITF file's image segments: the driver
    parses only the file header length table; each task ranged-reads
    its own segments (subheader + blocked data).  Rows: seg_id, iid1,
    rows, cols, nbands, imode, corner lat/lons (NaN when absent),
    values (row-major uint8 bytes, band-interleaved-by-pixel for
    multiband)."""
    import pyarrow as pa
    import ray.data as rd

    with open(path, "rb") as fh:
        head = fh.read(512)
        if head[:9] != b"NITF02.10":
            raise ValueError("not a NITF 2.1 file")
        hl = int(head[354:360])
        if hl > len(head):
            head += fh.read(hl - len(head))
    numi = int(head[360:363])
    spans = []
    p, pos = 363, hl
    for _ in range(numi):
        lish = int(head[p:p + 6])
        li = int(head[p + 6:p + 16])
        spans.append((pos, lish + li))
        pos += lish + li
        p += 16

    def fetch(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("seg_id", "iid1", "rows", "cols",
                                "nbands", "imode", "lat_ul", "lon_ul",
                                "values")}
        with open(path, "rb") as fh:
            for i in t.column("id").to_pylist():
                off, ln = spans[int(i)]
                fh.seek(off)
                seg = fh.read(ln)
                m, dpos = _parse_image_subheader(seg, 0)
                sub = _decode_segment(seg, m, dpos)
                cols["seg_id"].append(int(i))
                cols["iid1"].append(m["iid1"])
                cols["rows"].append(m["rows"])
                cols["cols"].append(m["cols"])
                cols["nbands"].append(m["nbands"])
                cols["imode"].append(m["imode"])
                c = m.get("corners")
                cols["lat_ul"].append(c[0][0] if c else float("nan"))
                cols["lon_ul"].append(c[0][1] if c else float("nan"))
                cols["values"].append(np.ascontiguousarray(sub).tobytes())
        return pa.table({
            "seg_id": pa.array(cols["seg_id"], pa.int64()),
            "iid1": pa.array(cols["iid1"], pa.string()),
            "rows": pa.array(cols["rows"], pa.int64()),
            "cols": pa.array(cols["cols"], pa.int64()),
            "nbands": pa.array(cols["nbands"], pa.int64()),
            "imode": pa.array(cols["imode"], pa.string()),
            "lat_ul": pa.array(cols["lat_ul"], pa.float64()),
            "lon_ul": pa.array(cols["lon_ul"], pa.float64()),
            "values": pa.array(cols["values"], pa.binary()),
        })

    ids = rd.range(numi, override_num_blocks=min(parallelism, numi))
    return ids.map_batches(fetch, batch_format="pyarrow")


def _decode_segment(seg: bytes, m: dict, dpos: int) -> np.ndarray:
    """Decode one segment's blocked data (seg = subheader + data)."""
    nbands = m["nbands"]
    rows, cols = m["rows"], m["cols"]
    nppbh, nppbv = m["nppbh"], m["nppbv"]
    nbpr, nbpc = m["nbpr"], m["nbpc"]
    full = np.zeros((nbands, nbpc * nppbv, nbpr * nppbh), np.uint8)
    if m.get("ic") in ("NM", "M3"):
        # masked ICs: Image Data Mask table first (IMDATOFF, BMRLNTH,
        # TMRLNTH, TPXCDLNTH, then 4-byte block offsets; 0xFFFFFFFF =
        # blocked out — filled with zeros on read)
        imdatoff, bmrlnth, tmrlnth, _tp = struct.unpack(
            ">IHHH", seg[dpos:dpos + 10])
        if bmrlnth != 4:
            raise ValueError(
                f"NITF: masked IC needs 4-byte block mask records "
                f"(BMRLNTH={bmrlnth})")
        if tmrlnth not in (0,):
            raise ValueError("NITF: pad-pixel mask records "
                             "unsupported (TMRLNTH must be 0)")
        n_blocks = nbpr * nbpc
        offs = struct.unpack(f">{n_blocks}I",
                             seg[dpos + 10:dpos + 10 + 4 * n_blocks])
        base = dpos + imdatoff
        bsz = nppbh * nppbv
        if m["ic"] == "M3":
            from ..functions.jpegc import decode_jpeg

            # stream lengths from the sorted present offsets
            present = sorted((o, i) for i, o in enumerate(offs)
                             if o != 0xFFFFFFFF)
            ends = {}
            for j, (o, i) in enumerate(present):
                nxt = (present[j + 1][0] if j + 1 < len(present)
                       else len(seg) - base)
                ends[i] = nxt
        k2 = 0
        for bj in range(nbpc):
            for bi in range(nbpr):
                o = offs[k2]
                r0, c0 = bj * nppbv, bi * nppbh
                if o != 0xFFFFFFFF:
                    if m["ic"] == "M3":
                        blk = decode_jpeg(seg[base + o:base + ends[k2]])
                    else:
                        nb_blk = bsz * (nbands if m["imode"] == "P"
                                        else 1)
                        raw = np.frombuffer(seg, np.uint8, nb_blk,
                                            base + o)
                        if m["imode"] == "P" and nbands > 1:
                            blk = raw.reshape(nppbv, nppbh, nbands)
                        else:
                            blk = raw.reshape(nppbv, nppbh)
                    if nbands == 1:
                        full[0, r0:r0 + nppbv, c0:c0 + nppbh] = blk
                    else:
                        for b in range(nbands):
                            full[b, r0:r0 + nppbv,
                                 c0:c0 + nppbh] = blk[:, :, b]
                k2 += 1
        vals = full[:, :rows, :cols]
        return (vals[0] if nbands == 1
                else np.ascontiguousarray(np.moveaxis(vals, 0, -1)))
    if m.get("ic") == "C3":
        # each block is one complete baseline-JPEG stream (MONO 1-comp
        # or RGB 3-comp interleaved), concatenated in block-raster
        # order with no offset table (mask-less C3)
        from ..functions.jpegc import decode_jpeg, split_jpeg_streams

        streams = split_jpeg_streams(seg[dpos:])
        if len(streams) != nbpr * nbpc:
            raise ValueError(
                f"NITF C3: {len(streams)} JPEG streams for "
                f"{nbpr * nbpc} blocks")
        k = 0
        for bj in range(nbpc):
            for bi in range(nbpr):
                blk = decode_jpeg(streams[k])
                k += 1
                r0, c0 = bj * nppbv, bi * nppbh
                if nbands == 1:
                    full[0, r0:r0 + nppbv, c0:c0 + nppbh] = blk
                else:
                    for b in range(nbands):
                        full[b, r0:r0 + nppbv,
                             c0:c0 + nppbh] = blk[:, :, b]
        vals = full[:, :rows, :cols]
        return (vals[0] if nbands == 1
                else np.ascontiguousarray(np.moveaxis(vals, 0, -1)))
    q = dpos
    bsz = nppbh * nppbv
    for bj in range(nbpc):
        for bi in range(nbpr):
            r0, c0 = bj * nppbv, bi * nppbh
            if m["imode"] == "B":
                for b in range(nbands):
                    full[b, r0:r0 + nppbv, c0:c0 + nppbh] = np.frombuffer(
                        seg, np.uint8, bsz, q).reshape(nppbv, nppbh)
                    q += bsz
            else:
                blk = np.frombuffer(seg, np.uint8, bsz * nbands,
                                    q).reshape(nppbv, nppbh, nbands)
                for b in range(nbands):
                    full[b, r0:r0 + nppbv, c0:c0 + nppbh] = blk[:, :, b]
                q += bsz * nbands
    vals = full[:, :rows, :cols]
    return (vals[0] if nbands == 1
            else np.ascontiguousarray(np.moveaxis(vals, 0, -1)))


# ------------------------------------------------------- RPC00B TRE


def _f_rpc(v: float) -> bytes:
    """RPC00B coefficient field: sign, 1 digit, '.', 6 digits, 'E',
    sign, 1 digit (12 chars, single-digit exponent)."""
    s = f"{v:+1.6E}"                   # +1.234567E+01
    mant, exp = s.split("E")
    e = int(exp)
    if not -9 <= e <= 9:
        raise ValueError(f"RPC00B: exponent {e} out of the 1-digit "
                         "field range")
    return f"{mant}E{'+' if e >= 0 else '-'}{abs(e)}".encode()


def _p_rpc(b: bytes) -> float:
    return float(b.decode())


def rpc_to_rpc00b(m: dict) -> bytes:
    """RPC model dict (the functions.rpc.RPCModel keyword layout) ->
    the 1041-byte RPC00B TRE data field (MIL-STD-2500C appendix E /
    STDI-0002).  Offsets/scales quantize to the fixed-width decimal
    fields; coefficients to 7 significant digits."""
    out = (b"1"                                   # SUCCESS
           + b"0000.00" + b"0000.00"              # ERR_BIAS/RAND
           + b"%06d" % round(m["line_off"])
           + b"%05d" % round(m["samp_off"])
           + f"{m['lat_off']:+08.4f}".encode()
           + f"{m['long_off']:+09.4f}".encode()
           + f"{m['height_off']:+05.0f}".encode()
           + b"%06d" % round(m["line_scale"])
           + b"%05d" % round(m["samp_scale"])
           + f"{m['lat_scale']:+08.4f}".encode()
           + f"{m['long_scale']:+09.4f}".encode()
           + f"{m['height_scale']:+05.0f}".encode())
    for key in ("line_num", "line_den", "samp_num", "samp_den"):
        coefs = list(m[key])
        if len(coefs) != 20:
            raise ValueError(f"RPC00B: {key} needs 20 coefficients")
        out += b"".join(_f_rpc(float(c)) for c in coefs)
    if len(out) != 1041:
        raise AssertionError(len(out))
    return out


def rpc00b_to_rpc(data: bytes) -> dict:
    """RPC00B TRE data field -> the RPCModel keyword dict."""
    if len(data) != 1041:
        raise ValueError(f"RPC00B: expected 1041 bytes, got {len(data)}")
    m = {
        "line_off": float(data[15:21]),
        "samp_off": float(data[21:26]),
        "lat_off": float(data[26:34]),
        "long_off": float(data[34:43]),
        "height_off": float(data[43:48]),
        "line_scale": float(data[48:54]),
        "samp_scale": float(data[54:59]),
        "lat_scale": float(data[59:67]),
        "long_scale": float(data[67:76]),
        "height_scale": float(data[76:81]),
    }
    pos = 81
    for key in ("line_num", "line_den", "samp_num", "samp_den"):
        m[key] = [_p_rpc(data[pos + 12 * i:pos + 12 * (i + 1)])
                  for i in range(20)]
        pos += 240
    return m


def rpc_model_of_segment(seg_meta: dict):
    """Build the engine's RPC transformer from a segment's RPC00B TRE
    (the gdal NITF RPC metadata path -> alg/gdal_rpc.cpp)."""
    from ..functions.rpc import RPCModel

    for tag, data in seg_meta.get("tres", []):
        if tag == "RPC00B":
            return RPCModel(**rpc00b_to_rpc(data))
    raise ValueError("segment carries no RPC00B TRE")
