"""Classic small raster interchange formats, from their published
layouts: Arc/Info ASCII Grid (the reference's ``frmts/aaigrid``), ENVI
flat binary + .hdr (``frmts/envi``/``frmts/raw``), and Windows BMP
(``frmts/bmp``).

Each is write + read with the conventions a reference user relies on:

- AAIGrid: ``ncols/nrows/xllcorner/yllcorner/cellsize`` (or
  ``xllcenter``/``yllcenter``), optional ``NODATA_value`` mapped to
  NaN, first data row = NORTH row;
- ENVI: ``samples/lines/bands/data type/interleave/byte order`` header
  keys, the ENVI data-type code table, BSQ/BIL/BIP interleaves, and
  ``map info`` georeferencing (UL corner + pixel sizes);
- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit BGR and 8-bit
  paletted variants, BOTTOM-UP rows padded to 4 bytes.
"""

from __future__ import annotations

import os
import struct

import numpy as np

# ------------------------------------------------------------ AAIGrid


def write_aaigrid(path: str, grid: np.ndarray, *, xll: float = 0.0,
                  yll: float = 0.0, cellsize: float = 1.0,
                  nodata: float | None = None,
                  corner: bool = True) -> None:
    """Write an Arc/Info ASCII grid; NaN cells become NODATA_value
    (required when the grid holds NaN)."""
    a = np.asarray(grid)
    if a.ndim != 2:
        raise ValueError("AAIGrid is single-band 2-D")
    has_nan = bool(np.isnan(a.astype(np.float64)).any())
    if has_nan and nodata is None:
        raise ValueError("grid holds NaN: pass nodata=")
    lines = [
        f"ncols {a.shape[1]}",
        f"nrows {a.shape[0]}",
        f"{'xllcorner' if corner else 'xllcenter'} {xll!r}",
        f"{'yllcorner' if corner else 'yllcenter'} {yll!r}",
        f"cellsize {cellsize!r}",
    ]
    if nodata is not None:
        lines.append(f"NODATA_value {nodata!r}")
    if np.issubdtype(a.dtype, np.integer):
        body = "\n".join(" ".join(str(int(v)) for v in row)
                         for row in a)
    else:
        f = a.astype(np.float64)
        if nodata is not None:
            f = np.where(np.isnan(f), float(nodata), f)
        body = "\n".join(" ".join(repr(float(v)) for v in row)
                         for row in f)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n" + body + "\n")
    os.replace(tmp, path)


def read_aaigrid(path: str) -> dict:
    """-> dict(grid float64 (nrows, ncols) with NODATA as NaN, xll,
    yll, cellsize, corner, nodata)."""
    with open(path) as fh:
        txt = fh.read().split()
    meta: dict = {"nodata": None, "corner": True}
    pos = 0
    n_header = 0
    keys = {"ncols": int, "nrows": int, "xllcorner": float,
            "xllcenter": float, "yllcorner": float, "yllcenter": float,
            "cellsize": float, "nodata_value": float}
    while pos + 1 < len(txt):
        k = txt[pos].lower()
        if k not in keys:
            break
        v = keys[k](txt[pos + 1])
        if k in ("xllcorner", "xllcenter"):
            meta["xll"] = v
            meta["corner"] = k == "xllcorner"
        elif k in ("yllcorner", "yllcenter"):
            meta["yll"] = v
        elif k == "nodata_value":
            meta["nodata"] = v
        else:
            meta[k] = v
        pos += 2
        n_header += 1
    if "ncols" not in meta or "nrows" not in meta:
        raise ValueError("AAIGrid: ncols/nrows header missing")
    n = meta["ncols"] * meta["nrows"]
    vals = np.array(txt[pos:pos + n], np.float64)
    if vals.size != n:
        raise ValueError(f"AAIGrid: expected {n} values, got {vals.size}")
    if meta["nodata"] is not None:
        vals = np.where(vals == meta["nodata"], np.nan, vals)
    meta["grid"] = vals.reshape(meta["nrows"], meta["ncols"])
    return meta


# --------------------------------------------------------------- ENVI

_ENVI_DT = {1: np.uint8, 2: np.int16, 3: np.int32, 4: np.float32,
            5: np.float64, 12: np.uint16, 13: np.uint32, 14: np.int64,
            15: np.uint64}
_ENVI_DT_INV = {np.dtype(v): k for k, v in _ENVI_DT.items()}


def write_envi(path: str, img: np.ndarray, *, interleave: str = "bsq",
               map_info: tuple | None = None) -> None:
    """Write ENVI raw binary + ``.hdr``; img (bands, lines, samples)
    or (lines, samples).  ``map_info`` = (ulx, uly, xsize, ysize)."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[None]
    if a.ndim != 3:
        raise ValueError("ENVI img must be (lines, samples) or "
                         "(bands, lines, samples)")
    if a.dtype not in _ENVI_DT_INV:
        raise ValueError(f"ENVI: dtype {a.dtype} unsupported")
    if interleave not in ("bsq", "bil", "bip"):
        raise ValueError("interleave must be bsq|bil|bip")
    nb, nl, ns = a.shape
    if interleave == "bsq":
        raw = a
    elif interleave == "bil":
        raw = np.moveaxis(a, 0, 1)              # (lines, bands, samples)
    else:
        raw = np.moveaxis(a, 0, 2)              # (lines, samples, bands)
    hdr = [
        "ENVI",
        f"samples = {ns}",
        f"lines = {nl}",
        f"bands = {nb}",
        "header offset = 0",
        "file type = ENVI Standard",
        f"data type = {_ENVI_DT_INV[a.dtype]}",
        f"interleave = {interleave}",
        "byte order = 0",
    ]
    if map_info is not None:
        ulx, uly, xs, ys = map_info
        hdr.append("map info = {Arbitrary, 1, 1, "
                   f"{ulx!r}, {uly!r}, {xs!r}, {ys!r}}}")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(np.ascontiguousarray(raw).tobytes())
    os.replace(tmp, path)
    with open(path + ".hdr", "w") as fh:
        fh.write("\n".join(hdr) + "\n")


def read_envi(path: str) -> dict:
    """Read raw + .hdr -> dict(img (bands, lines, samples), interleave,
    map_info or None)."""
    hdr_path = path + ".hdr"
    if not os.path.exists(hdr_path):
        raise ValueError(f"ENVI: missing header {hdr_path}")
    kv: dict[str, str] = {}
    with open(hdr_path) as fh:
        first = fh.readline().strip()
        if first != "ENVI":
            raise ValueError("ENVI: header must start with 'ENVI'")
        for line in fh:
            if "=" in line:
                k, v = line.split("=", 1)
                kv[k.strip().lower()] = v.strip()
    ns = int(kv["samples"])
    nl = int(kv["lines"])
    nb = int(kv["bands"])
    off = int(kv.get("header offset", "0"))
    dt_code = int(kv["data type"])
    if dt_code not in _ENVI_DT:
        raise ValueError(f"ENVI: data type {dt_code} unsupported")
    if int(kv.get("byte order", "0")) != 0:
        raise ValueError("ENVI: big-endian files unsupported")
    inter = kv.get("interleave", "bsq").lower()
    dt = np.dtype(_ENVI_DT[dt_code])
    with open(path, "rb") as fh:
        fh.seek(off)
        raw = np.frombuffer(fh.read(nb * nl * ns * dt.itemsize), dt)
    if inter == "bsq":
        img = raw.reshape(nb, nl, ns)
    elif inter == "bil":
        img = np.moveaxis(raw.reshape(nl, nb, ns), 1, 0)
    elif inter == "bip":
        img = np.moveaxis(raw.reshape(nl, ns, nb), 2, 0)
    else:
        raise ValueError(f"ENVI: interleave {inter!r} unsupported")
    out = {"img": np.ascontiguousarray(img), "interleave": inter,
           "map_info": None}
    if "map info" in kv:
        parts = [p.strip() for p in
                 kv["map info"].strip("{}").split(",")]
        out["map_info"] = (float(parts[3]), float(parts[4]),
                           float(parts[5]), float(parts[6]))
    return out


# ---------------------------------------------------------------- BMP


def _rle8_encode_row(row: np.ndarray) -> bytes:
    """One scanline to BI_RLE8 encoded-mode runs (+EOL)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        v = row[i]
        run = 1
        while i + run < n and run < 255 and row[i + run] == v:
            run += 1
        out += bytes((run, int(v)))
        i += run
    out += b"\x00\x00"                         # end of line
    return bytes(out)


def _rle8_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 -> (h, w) bottom-up index rows (encoded + absolute
    modes, EOL/EOB/delta escapes per the BITMAPINFOHEADER spec)."""
    img = np.zeros((h, w), np.uint8)
    x = y = 0
    i = 0
    while i + 1 < len(data):
        c, v = data[i], data[i + 1]
        i += 2
        if c:                                   # encoded run
            img[y, x:x + c] = v
            x += c
        elif v == 0:                            # EOL
            x, y = 0, y + 1
            if y >= h:
                break
        elif v == 1:                            # end of bitmap
            break
        elif v == 2:                            # delta
            x += data[i]
            y += data[i + 1]
            i += 2
        else:                                   # absolute mode
            img[y, x:x + v] = np.frombuffer(data, np.uint8, v, i)
            x += v
            i += v + (v & 1)                    # word-aligned
    return img


def write_bmp(path: str, img: np.ndarray, *, rle: bool = False) -> None:
    """Write a BMP: (h, w, 3) uint8 -> 24-bit BGR; (h, w) uint8 ->
    8-bit with a grayscale palette (``rle=True`` compresses it with
    BI_RLE8 — the run-length mode the reference's frmts/bmp driver
    reads).  Rows bottom-up, padded to 4."""
    a = np.asarray(img)
    if rle and a.ndim != 2:
        raise ValueError("BMP RLE8 applies to 8-bit (h, w) images")
    if a.dtype != np.uint8:
        raise ValueError("BMP: uint8 only")
    if a.ndim == 3 and a.shape[2] == 3:
        h, w = a.shape[:2]
        bpp = 24
        row = np.ascontiguousarray(a[::-1, :, ::-1])   # bottom-up BGR
        stride = (w * 3 + 3) & ~3
        body = np.zeros((h, stride), np.uint8)
        body[:, :w * 3] = row.reshape(h, w * 3)
        palette = b""
    elif a.ndim == 2:
        h, w = a.shape
        bpp = 8
        stride = (w + 3) & ~3
        body = np.zeros((h, stride), np.uint8)
        body[:, :w] = a[::-1]
        palette = b"".join(struct.pack("<BBBB", i, i, i, 0)
                           for i in range(256))
    else:
        raise ValueError("BMP: (h, w) or (h, w, 3) uint8")
    comp = 0
    if rle:
        comp = 1                                # BI_RLE8
        enc = bytearray()
        for r in range(h):                      # body is bottom-up
            enc += _rle8_encode_row(body[r, :w])
        enc = enc[:-2] + b"\x00\x01"            # last EOL -> EOB
        payload = bytes(enc)
    else:
        payload = body.tobytes()
    data_off = 14 + 40 + len(palette)
    size = data_off + len(payload)
    head = (struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                          len(payload), 2835, 2835,
                          256 if bpp == 8 else 0, 0))
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(head + palette + payload)
    os.replace(tmp, path)


def read_bmp(path: str) -> np.ndarray:
    """Read a 24-bit BGR or 8-bit paletted BMP -> (h, w, 3) or (h, w)
    uint8 (grayscale palettes collapse to single-band)."""
    buf = open(path, "rb").read()
    if buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack("<I", buf[10:14])[0]
    hsz, w, h, _planes, bpp = struct.unpack("<IiiHH", buf[14:30])
    if hsz < 40:
        raise ValueError(f"BMP: header size {hsz} unsupported")
    comp = struct.unpack("<I", buf[30:34])[0]
    if comp not in (0, 1):
        raise ValueError(f"BMP: compression {comp} unsupported "
                         "(uncompressed / BI_RLE8)")
    flip = h > 0
    h = abs(h)
    if bpp == 24:
        if comp == 1:
            raise ValueError("BMP: RLE8 requires 8-bit images")
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(buf, np.uint8, h * stride,
                             data_off).reshape(h, stride)
        img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
        return np.ascontiguousarray(img[::-1] if flip else img)
    if bpp == 8:
        ncolors = struct.unpack("<I", buf[46:50])[0] or 256
        pal = np.frombuffer(buf, np.uint8, ncolors * 4,
                            14 + hsz).reshape(ncolors, 4)[:, :3][:, ::-1]
        if comp == 1:
            rows = _rle8_decode(buf[data_off:], w, h)
        else:
            stride = (w + 3) & ~3
            rows = np.frombuffer(buf, np.uint8, h * stride,
                                 data_off).reshape(h, stride)[:, :w]
        idx = rows[::-1] if flip else rows
        if (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1]
                                               == pal[:, 2]).all():
            return np.ascontiguousarray(pal[idx, 0])
        return np.ascontiguousarray(pal[idx])
    raise ValueError(f"BMP: {bpp}-bit unsupported (8/24)")


# ---------------------------------------------------------------- PNM


def write_pnm(path: str, img: np.ndarray, *, ascii_: bool = False,
              maxval: int | None = None) -> None:
    """Netpbm PGM/PPM (the reference's ``frmts/pnm``): (h, w) ->
    PGM (P5 binary / P2 ASCII), (h, w, 3) -> PPM (P6 / P3); uint8 or
    uint16 (16-bit binary samples big-endian per the spec)."""
    a = np.asarray(img)
    if a.dtype not in (np.uint8, np.uint16):
        raise ValueError("PNM: uint8 or uint16 only")
    if a.ndim == 2:
        magic = "P2" if ascii_ else "P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = "P3" if ascii_ else "P6"
    else:
        raise ValueError("PNM: (h, w) or (h, w, 3)")
    h, w = a.shape[:2]
    mv = int(maxval if maxval is not None
             else (255 if a.dtype == np.uint8 else 65535))
    if not (0 < mv < 65536) or int(a.max(initial=0)) > mv:
        raise ValueError(f"PNM: maxval {mv} out of range or exceeded")
    head = f"{magic}\n{w} {h}\n{mv}\n".encode()
    if ascii_:
        body = "\n".join(" ".join(str(int(v)) for v in row.ravel())
                         for row in a).encode() + b"\n"
    elif mv < 256:
        body = a.astype(np.uint8).tobytes()
    else:
        body = a.astype(">u2").tobytes()
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(head + body)
    os.replace(tmp, path)


def read_pnm(path: str) -> np.ndarray:
    """Read P2/P3/P5/P6 (comments allowed in the header) -> (h, w) or
    (h, w, 3) uint8/uint16."""
    buf = open(path, "rb").read()
    if buf[:1] != b"P" or buf[1:2] not in b"2356":
        raise ValueError("not a supported PNM file (P2/P3/P5/P6)")
    magic = buf[:2].decode()
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":                # comment line
            pos = buf.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    w, h, mv = fields
    nb = 3 if magic in ("P3", "P6") else 1
    n = w * h * nb
    if magic in ("P2", "P3"):
        vals = np.array(buf[pos:].split()[:n], np.int64)
        if vals.size != n:
            raise ValueError("PNM: truncated ASCII samples")
    else:
        pos += 1                                    # single whitespace
        dt = np.dtype(">u2") if mv > 255 else np.uint8
        vals = np.frombuffer(buf, dt, n, pos).astype(np.int64)
    out = vals.astype(np.uint16 if mv > 255 else np.uint8)
    return out.reshape((h, w, 3) if nb == 3 else (h, w))
