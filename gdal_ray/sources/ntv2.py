"""NTv2 datum-shift grid (.gsb) reader/writer.

The reference ships an NTv2 raster driver (``frmts/ntv2/ntv2dataset.cpp``
reads the grid as a 4-band float32 raster) and reaches the TRANSFORM
use of these grids through PROJ (``ogr/ogrct.cpp:1018`` —
``+nadgrids=``/horizontal grid correction).  This module implements the
published binary layout from scratch (the Canadian Geodetic Survey
NTv2 Developer's Guide format, as also documented in the PROJ and GDAL
public docs):

- the file is a sequence of 16-byte records: an 8-byte space-padded
  ASCII name followed by an 8-byte value (8-char ASCII, float64, or
  int32 + 4 pad bytes);
- an 11-record overview header (``NUM_OREC``/``NUM_SREC``/``NUM_FILE``/
  ``GS_TYPE``/``VERSION``/``SYSTEM_F``/``SYSTEM_T``/``MAJOR_F``/
  ``MINOR_F``/``MAJOR_T``/``MINOR_T``);
- per subgrid an 11-record header (``SUB_NAME``/``PARENT``/``CREATED``/
  ``UPDATED``/``S_LAT``/``N_LAT``/``E_LONG``/``W_LONG``/``LAT_INC``/
  ``LONG_INC``/``GS_COUNT``) followed by GS_COUNT 16-byte nodes of four
  float32s: latitude shift, longitude shift, latitude accuracy,
  longitude accuracy — all in arc-seconds, longitudes POSITIVE WEST;
- node order: latitude rows south to north, within a row from E_LONG
  toward W_LONG (increasing positive-west longitude);
- an ``END`` record terminates the file.

Endianness is auto-detected on read from the NUM_OREC value (== 11).
"""

from __future__ import annotations

import os
import struct

import numpy as np

_OVERVIEW_NAMES = (
    "NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_TYPE ", "VERSION ",
    "SYSTEM_F", "SYSTEM_T", "MAJOR_F ", "MINOR_F ", "MAJOR_T ",
    "MINOR_T ",
)
_SUB_NAMES = (
    "SUB_NAME", "PARENT  ", "CREATED ", "UPDATED ", "S_LAT   ",
    "N_LAT   ", "E_LONG  ", "W_LONG  ", "LAT_INC ", "LONG_INC",
    "GS_COUNT",
)


def _pad8(s: str) -> bytes:
    b = s.encode("ascii")
    if len(b) > 8:
        raise ValueError(f"NTv2 field {s!r} exceeds 8 bytes")
    return b.ljust(8)


def _rec_str(name: str, val: str, bo: str) -> bytes:
    return _pad8(name) + _pad8(val)


def _rec_int(name: str, val: int, bo: str) -> bytes:
    return _pad8(name) + struct.pack(bo + "i", val) + b"\x00\x00\x00\x00"


def _rec_dbl(name: str, val: float, bo: str) -> bytes:
    return _pad8(name) + struct.pack(bo + "d", val)


def grid_dims(sub: dict) -> tuple[int, int]:
    """(nrows, ncols) of a subgrid from its bounds/increments."""
    nrows = int(round((sub["n_lat"] - sub["s_lat"]) / sub["lat_inc"])) + 1
    ncols = int(round((sub["w_long"] - sub["e_long"]) / sub["long_inc"])) + 1
    return nrows, ncols


def write_ntv2(path: str, subgrids: list[dict], *,
               system_f: str = "NAD27", system_t: str = "NAD83",
               major_f: float = 6378206.4, minor_f: float = 6356583.8,
               major_t: float = 6378137.0, minor_t: float = 6356752.314,
               version: str = "NTv2.0", byteorder: str = "<") -> None:
    """Write an NTv2 .gsb file.

    Each subgrid dict carries: ``name``, ``parent`` (None for
    top-level), ``s_lat``/``n_lat``/``e_long``/``w_long`` (arc-seconds,
    longitudes positive west), ``lat_inc``/``long_inc`` (arc-seconds),
    ``lat_shift``/``lon_shift`` ((nrows, ncols) arrays, arc-seconds,
    row 0 = S_LAT, col 0 = E_LONG) and optional ``lat_acc``/``lon_acc``
    accuracy arrays (default zeros).
    """
    bo = byteorder
    if bo not in ("<", ">"):
        raise ValueError("byteorder must be '<' or '>'")
    out = [
        _rec_int("NUM_OREC", 11, bo),
        _rec_int("NUM_SREC", 11, bo),
        _rec_int("NUM_FILE", len(subgrids), bo),
        _rec_str("GS_TYPE ", "SECONDS", bo),
        _rec_str("VERSION ", version, bo),
        _rec_str("SYSTEM_F", system_f, bo),
        _rec_str("SYSTEM_T", system_t, bo),
        _rec_dbl("MAJOR_F ", major_f, bo),
        _rec_dbl("MINOR_F ", minor_f, bo),
        _rec_dbl("MAJOR_T ", major_t, bo),
        _rec_dbl("MINOR_T ", minor_t, bo),
    ]
    f32 = np.dtype(bo + "f4")
    for sub in subgrids:
        nrows, ncols = grid_dims(sub)
        la = np.ascontiguousarray(sub["lat_shift"], dtype=np.float32)
        lo = np.ascontiguousarray(sub["lon_shift"], dtype=np.float32)
        if la.shape != (nrows, ncols) or lo.shape != (nrows, ncols):
            raise ValueError(
                f"subgrid {sub['name']!r}: shift arrays must be "
                f"({nrows}, {ncols}), got {la.shape} / {lo.shape}")
        aa = np.ascontiguousarray(
            sub.get("lat_acc", np.zeros((nrows, ncols))), dtype=np.float32)
        ao = np.ascontiguousarray(
            sub.get("lon_acc", np.zeros((nrows, ncols))), dtype=np.float32)
        out += [
            _rec_str("SUB_NAME", sub["name"], bo),
            _rec_str("PARENT  ", sub.get("parent") or "NONE", bo),
            _rec_str("CREATED ", sub.get("created", ""), bo),
            _rec_str("UPDATED ", sub.get("updated", ""), bo),
            _rec_dbl("S_LAT   ", float(sub["s_lat"]), bo),
            _rec_dbl("N_LAT   ", float(sub["n_lat"]), bo),
            _rec_dbl("E_LONG  ", float(sub["e_long"]), bo),
            _rec_dbl("W_LONG  ", float(sub["w_long"]), bo),
            _rec_dbl("LAT_INC ", float(sub["lat_inc"]), bo),
            _rec_dbl("LONG_INC", float(sub["long_inc"]), bo),
            _rec_int("GS_COUNT", nrows * ncols, bo),
        ]
        nodes = np.empty((nrows * ncols, 4), dtype=f32)
        nodes[:, 0] = la.astype(f32).ravel()
        nodes[:, 1] = lo.astype(f32).ravel()
        nodes[:, 2] = aa.astype(f32).ravel()
        nodes[:, 3] = ao.astype(f32).ravel()
        out.append(nodes.tobytes())
    out.append(_pad8("END") + b"\x00" * 8)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(b"".join(out))
    os.replace(tmp, path)


def read_ntv2(path: str) -> dict:
    """Read an NTv2 .gsb file -> overview fields + ``subgrids`` list
    (float32 shift/accuracy arrays, row 0 = S_LAT, col 0 = E_LONG).
    Detects byte order from the NUM_OREC record."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if len(buf) < 16 or buf[0:8] != b"NUM_OREC":
        raise ValueError("not an NTv2 file (missing NUM_OREC)")
    bo = "<"
    if struct.unpack("<i", buf[8:12])[0] != 11:
        if struct.unpack(">i", buf[8:12])[0] != 11:
            raise ValueError("NTv2: NUM_OREC != 11 in either byte order")
        bo = ">"
    pos = 0

    def rec():
        nonlocal pos
        name = buf[pos:pos + 8].decode("ascii", "replace").strip()
        val = buf[pos + 8:pos + 16]
        pos += 16
        return name, val

    def want(expect: str):
        name, val = rec()
        if name != expect.strip():
            raise ValueError(f"NTv2: expected {expect.strip()!r} record, "
                             f"got {name!r}")
        return val

    as_i = lambda v: struct.unpack(bo + "i", v[:4])[0]  # noqa: E731
    as_d = lambda v: struct.unpack(bo + "d", v)[0]  # noqa: E731
    as_s = lambda v: v.decode("ascii", "replace").strip()  # noqa: E731

    if as_i(want("NUM_OREC")) != 11:
        raise ValueError("NTv2: NUM_OREC != 11")
    if as_i(want("NUM_SREC")) != 11:
        raise ValueError("NTv2: NUM_SREC != 11")
    n_file = as_i(want("NUM_FILE"))
    meta = {
        "gs_type": as_s(want("GS_TYPE ")),
        "version": as_s(want("VERSION ")),
        "system_f": as_s(want("SYSTEM_F")),
        "system_t": as_s(want("SYSTEM_T")),
        "major_f": as_d(want("MAJOR_F ")),
        "minor_f": as_d(want("MINOR_F ")),
        "major_t": as_d(want("MAJOR_T ")),
        "minor_t": as_d(want("MINOR_T ")),
        "byteorder": bo,
        "subgrids": [],
    }
    if meta["gs_type"] != "SECONDS":
        raise ValueError(f"NTv2: unsupported GS_TYPE {meta['gs_type']!r} "
                         "(only SECONDS)")
    f32 = np.dtype(bo + "f4")
    for _ in range(n_file):
        sub = {
            "name": as_s(want("SUB_NAME")),
            "parent": as_s(want("PARENT  ")),
            "created": as_s(want("CREATED ")),
            "updated": as_s(want("UPDATED ")),
            "s_lat": as_d(want("S_LAT   ")),
            "n_lat": as_d(want("N_LAT   ")),
            "e_long": as_d(want("E_LONG  ")),
            "w_long": as_d(want("W_LONG  ")),
            "lat_inc": as_d(want("LAT_INC ")),
            "long_inc": as_d(want("LONG_INC")),
        }
        if sub["parent"] == "NONE":
            sub["parent"] = None
        count = as_i(want("GS_COUNT"))
        nrows, ncols = grid_dims(sub)
        if count != nrows * ncols:
            raise ValueError(
                f"NTv2 subgrid {sub['name']!r}: GS_COUNT {count} != "
                f"{nrows}*{ncols} from bounds/increments")
        nodes = np.frombuffer(
            buf, dtype=f32, count=count * 4, offset=pos).reshape(count, 4)
        pos += count * 16
        sub["lat_shift"] = np.ascontiguousarray(
            nodes[:, 0].reshape(nrows, ncols)).astype(np.float32)
        sub["lon_shift"] = np.ascontiguousarray(
            nodes[:, 1].reshape(nrows, ncols)).astype(np.float32)
        sub["lat_acc"] = np.ascontiguousarray(
            nodes[:, 2].reshape(nrows, ncols)).astype(np.float32)
        sub["lon_acc"] = np.ascontiguousarray(
            nodes[:, 3].reshape(nrows, ncols)).astype(np.float32)
        meta["subgrids"].append(sub)
    name, _val = rec()
    if name != "END":
        raise ValueError(f"NTv2: expected END record, got {name!r}")
    return meta

# ------------------------------------------------------------- GTX
#
# NOAA/VDatum .gtx vertical (geoid) grids — the format PROJ's
# +geoidgrids= / vgridshift step consumes (the reference reaches it
# through ogr/ogrct.cpp 3-D transforms; frmts has no dedicated driver
# because PROJ owns it).  Header: 4 float64 big-endian (lat of the SW
# corner, lon of the SW corner in 0..360 east-positive, delta lat,
# delta lon) + 2 int32 big-endian (nrows, ncols); then nrows*ncols
# float32 big-endian undulation values, row-major, row 0 = the SOUTH
# edge, col 0 = the WEST edge.


def write_gtx(path: str, lat0: float, lon0: float, dlat: float,
              dlon: float, values: "np.ndarray") -> None:
    """Write a .gtx geoid grid: ``values`` (nrows, ncols) metres of
    geoid undulation N, row 0 = south edge."""
    import numpy as np

    v = np.ascontiguousarray(values, dtype=">f4")
    if v.ndim != 2:
        raise ValueError("GTX values must be 2-D (nrows, ncols)")
    nrows, ncols = v.shape
    hdr = struct.pack(">4d2i", float(lat0), float(lon0) % 360.0,
                      float(dlat), float(dlon), nrows, ncols)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(hdr)
        fh.write(v.tobytes())
    os.replace(tmp, path)


def read_gtx(path: str) -> dict:
    """Read a .gtx geoid grid -> dict(lat0, lon0, dlat, dlon,
    values) with lon0 normalized to [-180, 180)."""
    import numpy as np

    with open(path, "rb") as fh:
        hdr = fh.read(40)
        if len(hdr) != 40:
            raise ValueError("GTX: truncated header")
        lat0, lon0, dlat, dlon, nrows, ncols = struct.unpack(
            ">4d2i", hdr)
        if not (0 < nrows < 100000 and 0 < ncols < 100000):
            raise ValueError(f"GTX: implausible grid {nrows}x{ncols}")
        data = fh.read(4 * nrows * ncols)
    if len(data) != 4 * nrows * ncols:
        raise ValueError("GTX: truncated data")
    v = np.frombuffer(data, ">f4").reshape(nrows, ncols).astype(
        np.float64)
    if lon0 >= 180.0:
        lon0 -= 360.0
    return {"lat0": lat0, "lon0": lon0, "dlat": dlat, "dlon": dlon,
            "values": v}


# ----------------------------------------------------------- BYN

def write_byn(path: str, grid: np.ndarray, *,
              south: float, west: float,
              dlat: float, dlon: float,
              factor: float = 1000.0,
              vdatum: int = 2) -> None:
    """NRCan geoid BYN grid (``frmts/raw/byndataset.h:126-176`` field
    table, ``byndataset.cpp:462-490`` offsets): 80-byte little-endian
    header — i32 south/north/west/east boundaries (arcseconds), i16
    DLat/DLon spacings, data factor f64 at 24, SizeOf at 32, byte
    order flag at 48 (1 = LSB) — then int16 rows NORTH FIRST with
    ``height = stored / factor``.  ``grid`` is (rows, cols) float
    geoid heights, north-first; ``south``/``west`` in degrees,
    spacings in arcseconds.  XSize = (east-west+1)/dlon + 1 per the
    reference's size formula, so east/north are derived."""
    a = np.asarray(grid, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("BYN grids are single-band 2-D")
    ny, nx = a.shape
    s = int(round(south * 3600.0))
    w = int(round(west * 3600.0))
    idlat = int(round(dlat))
    idlon = int(round(dlon))
    # reference size formula xsize = (east - west + 1)/dlon + 1
    # inverted: east = west + (xsize - 1)*dlon - 1
    e = w + (nx - 1) * idlon - 1
    n = s + (ny - 1) * idlat - 1
    q = np.clip(np.floor(a * factor + 0.5), -32768, 32767).astype(
        "<i2")
    hdr = bytearray(80)
    struct.pack_into("<iiii", hdr, 0, s, n, w, e)
    struct.pack_into("<hhhh", hdr, 16, idlat, idlon, 0, 1)
    struct.pack_into("<d", hdr, 24, float(factor))
    struct.pack_into("<hh", hdr, 32, 2, int(vdatum))
    struct.pack_into("<hhhh", hdr, 40, 0, 0, 0, 0)
    struct.pack_into("<hh", hdr, 48, 1, 0)      # LSB, unscaled
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(bytes(hdr))
        fh.write(np.ascontiguousarray(q).tobytes())
    os.replace(tmp, path)


def read_byn(path: str) -> dict:
    """-> dict(grid north-first float64 geoid heights, south, west,
    dlat, dlon arcsec, factor, vdatum).  int16 and int32 payloads,
    LSB/MSB flag, x1000 scaled boundaries."""
    with open(path, "rb") as fh:
        hdr = fh.read(80)
        s, n, w, e = struct.unpack_from("<iiii", hdr, 0)
        dlat, dlon, _glob, _typ = struct.unpack_from("<hhhh", hdr, 16)
        factor = struct.unpack_from("<d", hdr, 24)[0]
        sizeof, vdatum = struct.unpack_from("<hh", hdr, 32)
        byteorder, scale = struct.unpack_from("<hh", hdr, 48)
        if scale == 1:
            s /= 1000.0
            n /= 1000.0
            w /= 1000.0
            e /= 1000.0
            dlat /= 1000.0
            dlon /= 1000.0
        if sizeof not in (2, 4):
            raise ValueError(f"{path}: BYN SizeOf {sizeof} "
                             "unsupported")
        if dlat == 0 or dlon == 0:
            raise ValueError(f"{path}: zero spacing")
        nx = int((e - w + 1.0) / dlon + 1.0)
        ny = int((n - s + 1.0) / dlat + 1.0)
        dt = np.dtype(f"{'<' if byteorder == 1 else '>'}i{sizeof}")
        raw = np.frombuffer(fh.read(nx * ny * sizeof), dt)
    if raw.size != nx * ny:
        raise ValueError(f"{path}: truncated BYN payload")
    grid = raw.reshape(ny, nx).astype(np.float64)
    if factor not in (0.0, 1.0):
        grid = grid / factor
    return {"grid": grid, "south": s / 3600.0, "west": w / 3600.0,
            "dlat": float(dlat), "dlon": float(dlon),
            "factor": float(factor), "vdatum": int(vdatum)}
