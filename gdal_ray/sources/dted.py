"""DTED (Digital Terrain Elevation Data, MIL-PRF-89020B) source/sink
— the reference's ``frmts/dted`` driver, reimplemented from the
published layout:

- 80-byte ASCII UHL (``UHL1``, DDDMMSSH origin fields, intervals in
  TENTHS of arc-seconds, line/point counts);
- 648-byte DSI and 2700-byte ACC blocks (sentinel + space padding —
  the georeferencing the reference reads lives in the UHL);
- one data record per LONGITUDE column, west to east: 0xAA sentinel,
  3-byte block count, 2-byte lon/lat counts, elevations SOUTH to
  NORTH as big-endian SIGN-MAGNITUDE int16, and a 4-byte checksum
  (the 32-bit sum of every preceding byte of the record);
- void/undefined cells as -32767 mapped to NaN.
"""

from __future__ import annotations

import os
import struct

import numpy as np

_VOID = -32767


def _ddmmssh(deg: float, lon: bool) -> bytes:
    """8-byte DDDMMSSH origin field (the UHL uses 3-digit degrees for
    BOTH axes — latitudes zero-padded, e.g. ``0390000N``)."""
    hemi = (b"W" if deg < 0 else b"E") if lon else (
        b"S" if deg < 0 else b"N")
    v = abs(deg)
    d = int(v)
    m = int((v - d) * 60.0)
    s = int(round(((v - d) * 60.0 - m) * 60.0))
    if s == 60:
        s, m = 0, m + 1
    if m == 60:
        m, d = 0, d + 1
    return b"%03d%02d%02d" % (d, m, s) + hemi


def _parse_ddmmssh(b: bytes) -> float:
    v = int(b[:3]) + int(b[3:5]) / 60.0 + int(b[5:7]) / 3600.0
    return -v if b[7:8] in (b"W", b"S") else v


def write_dted(path: str, elev: np.ndarray, *, lon0: float,
               lat0: float, lon_interval_ds: int = 300,
               lat_interval_ds: int = 300) -> None:
    """Write one DTED cell.  ``elev``: (nlat, nlon) with row 0 =
    SOUTH row (the DTED convention); NaN cells become the -32767
    void value.  ``lon0``/``lat0`` = SW corner degrees; intervals in
    TENTHS of arc-seconds, max 9999 per the 4-char UHL field (default
    300 = the DTED level-0 30-arcsecond post spacing)."""
    if not (0 < lon_interval_ds <= 9999 and 0 < lat_interval_ds <= 9999):
        raise ValueError("intervals are 4-char tenths-of-arcsecond "
                         "fields (1..9999)")
    a = np.asarray(elev, np.float64)
    if a.ndim != 2:
        raise ValueError("DTED elevation must be 2-D (nlat, nlon)")
    nlat, nlon = a.shape
    ints = np.where(np.isnan(a), _VOID, np.round(a)).astype(np.int64)
    if (np.abs(ints) > 32767).any():
        raise ValueError("DTED elevations exceed 16-bit magnitude")
    uhl = (b"UHL1"
           + _ddmmssh(lon0, True) + _ddmmssh(lat0, False)
           + b"%04d" % lon_interval_ds + b"%04d" % lat_interval_ds
           + b"NA  "                       # absolute vertical accuracy
           + b"U  " + b" " * 12
           + b"%04d" % nlon + b"%04d" % nlat
           + b"0" + b" " * 24)
    if len(uhl) != 80:
        raise AssertionError(len(uhl))
    dsi = (b"DSI" + b"U" + b" " * 644)
    acc = (b"ACC" + b" " * 2697)
    recs = []
    for c in range(nlon):                  # west -> east columns
        col = ints[:, c]                   # south -> north already
        body = bytearray()
        body.append(0xAA)
        body += struct.pack(">I", c)[1:]   # 3-byte data block count
        body += struct.pack(">HH", c, 0)   # lon count, lat count
        for v in col:
            mag = int(-v) | 0x8000 if v < 0 else int(v)
            body += struct.pack(">H", mag)
        body += struct.pack(">I", sum(body) & 0xFFFFFFFF)
        recs.append(bytes(body))
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(uhl + dsi + acc + b"".join(recs))
    os.replace(tmp, path)


def read_dted(path: str) -> dict:
    """-> dict(elev (nlat, nlon) float64 row 0 = SOUTH, NaN voids,
    lon0, lat0, lon_interval_ds, lat_interval_ds).  Verifies every
    column record's sentinel and checksum."""
    buf = open(path, "rb").read()
    if buf[:4] != b"UHL1":
        raise ValueError("not a DTED file (UHL1 missing)")
    lon0 = _parse_ddmmssh(buf[4:12])
    lat0 = _parse_ddmmssh(buf[12:20])
    lon_int = int(buf[20:24])
    lat_int = int(buf[24:28])
    nlon = int(buf[47:51])
    nlat = int(buf[51:55])
    if buf[80:83] != b"DSI":
        raise ValueError("DTED: DSI block missing")
    if buf[728:731] != b"ACC":
        raise ValueError("DTED: ACC block missing")
    pos = 728 + 2700
    rec_len = 8 + 2 * nlat + 4
    out = np.empty((nlat, nlon), np.float64)
    for c in range(nlon):
        rec = buf[pos:pos + rec_len]
        if len(rec) != rec_len or rec[0] != 0xAA:
            raise ValueError(f"DTED: bad column record {c}")
        want = struct.unpack(">I", rec[-4:])[0]
        got = sum(rec[:-4]) & 0xFFFFFFFF
        if want != got:
            raise ValueError(f"DTED: checksum mismatch in column {c} "
                             f"({got} != {want})")
        raw = np.frombuffer(rec, ">u2", nlat, 8).astype(np.int64)
        vals = np.where(raw & 0x8000, -(raw & 0x7FFF), raw)
        out[:, c] = np.where(vals == _VOID, np.nan, vals)
        pos += rec_len
    return {"elev": out, "lon0": lon0, "lat0": lat0,
            "lon_interval_ds": lon_int, "lat_interval_ds": lat_int}


# ------------------------------------------------- XYZ ascii raster


def write_xyz(path: str, grid: np.ndarray, *, x0: float = 0.0,
              y0: float = 0.0, dx: float = 1.0, dy: float = 1.0) -> None:
    """ASCII XYZ raster (frmts/xyz): one ``x y z`` line per cell in
    row-major grid order, row 0 = NORTH row at pixel centers
    (``y0`` = top-row center)."""
    a = np.asarray(grid, np.float64)
    if a.ndim != 2:
        raise ValueError("XYZ grid must be 2-D")
    h, w = a.shape
    lines = []
    for r in range(h):
        y = y0 - r * dy
        for c in range(w):
            lines.append(f"{x0 + c * dx!r} {y!r} {a[r, c]!r}")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, path)


def read_xyz(path: str) -> dict:
    """Read a regular-grid XYZ file (constant dx/dy inferred from the
    coordinate columns, like the reference's driver) -> dict(grid,
    x0, y0, dx, dy)."""
    data = np.loadtxt(path, dtype=np.float64, ndmin=2)
    if data.shape[1] != 3:
        raise ValueError("XYZ: expected 3 columns")
    xs = np.unique(data[:, 0])
    ys = np.unique(data[:, 1])[::-1]
    w, h = len(xs), len(ys)
    if w * h != len(data):
        raise ValueError("XYZ: not a complete regular grid")
    dxs = np.diff(xs)
    dys = np.diff(ys)
    if w > 1 and not np.allclose(dxs, dxs[0]):
        raise ValueError("XYZ: irregular x spacing")
    if h > 1 and not np.allclose(dys, dys[0]):
        raise ValueError("XYZ: irregular y spacing")
    ix = np.searchsorted(xs, data[:, 0])
    iy = np.searchsorted(-ys, -data[:, 1])
    grid = np.full((h, w), np.nan)
    grid[iy, ix] = data[:, 2]
    return {"grid": grid, "x0": float(xs[0]), "y0": float(ys[0]),
            "dx": float(dxs[0]) if w > 1 else 1.0,
            "dy": float(-dys[0]) if h > 1 else 1.0}
