"""Terrain / grid interchange formats, from their published layouts:
SRTM ``.hgt`` height tiles (the reference's ``frmts/srtmhgt/
srtmhgtdataset.cpp``), Golden Software Surfer grids — ASCII ``DSAA``
and binary-6 ``DSBB`` (``frmts/gsg/gsbgdataset.cpp``), ESRI EHdr
``.bil``+``.hdr`` flat binary (``frmts/raw/ehdrdataset.cpp``), and
SAGA GIS ``.sdat``+``.sgrd`` binary grids (``frmts/saga/
sagadataset.cpp``).

Conventions a reference user relies on:

- SRTMHGT: the filename carries the SOUTH-WEST corner
  (``N51E000.hgt``); the payload is N*N big-endian int16 samples,
  FIRST ROW = NORTH edge, void value -32768
  (``srtmhgtdataset.cpp:25,334-449``); legal sizes 1201 (3") and
  3601 (1") square;
- Surfer DSAA/DSBB: 4-byte magic, nx/ny, x/y/z min-max header
  (cell-CENTER registration), rows stored SOUTH FIRST (bottom-up);
  blank value 1.701410009187828e+38 (``gsbgdataset.cpp:70,704``);
  DSBB payload is little-endian float32;
- EHdr: ``NROWS/NCOLS/NBANDS/NBITS/BYTEORDER/LAYOUT/ULXMAP/ULYMAP/
  XDIM/YDIM/NODATA/PIXELTYPE`` keys in ``.hdr``
  (``ehdrdataset.cpp:1073-1083,1724-1740``), data in ``.bil`` with
  BIL/BIP/BSQ interleave, ULXMAP/ULYMAP at the CENTER of the
  upper-left pixel;
- SAGA: tab-separated ``.sgrd`` keys ``DATAFORMAT/BYTEORDER_BIG/
  POSITION_XMIN/POSITION_YMIN/CELLCOUNT_X/CELLCOUNT_Y/CELLSIZE/
  NODATA_VALUE/TOPTOBOTTOM`` (``sagadataset.cpp:503-519,799-829``),
  POSITION_* at the LOWER-LEFT cell center; TOPTOBOTTOM=FALSE means
  the ``.sdat`` rows run south to north.

All writers are atomic (tmp + rename) like the sibling modules, so a
partially-written file never shadows a finished one under resume.
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np

SRTM_NODATA = -32768
SURFER_NODATA = 1.701410009187828e+38

# ------------------------------------------------------------ SRTMHGT

_HGT_NAME = re.compile(r"([NS])(\d{1,2})([EW])(\d{1,3})\.hgt$",
                       re.IGNORECASE)


def hgt_corner(path: str) -> tuple[int, int]:
    """(lat, lon) of the SOUTH-WEST corner from the filename, per
    ``srtmhgtdataset.cpp`` Open()."""
    m = _HGT_NAME.search(os.path.basename(path))
    if not m:
        raise ValueError(
            f"{path}: not an SRTM tile name (want e.g. N51E000.hgt)")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    return lat, lon


def write_srtmhgt(path: str, grid: np.ndarray) -> None:
    """Write an SRTM height tile. ``grid`` is (N, N) int16-compatible
    with FIRST ROW = NORTH; NaN becomes the -32768 void. The filename
    must carry the SW corner (validated)."""
    hgt_corner(path)
    a = np.asarray(grid)
    if a.ndim != 2 or a.shape[0] != a.shape[1] or a.shape[0] not in (
            1201, 3601):
        raise ValueError(
            f"SRTMHGT tiles are 1201x1201 or 3601x3601, got {a.shape}")
    if np.issubdtype(a.dtype, np.floating):
        f = a.astype(np.float64)
        out = np.where(np.isnan(f), SRTM_NODATA,
                       np.rint(f)).astype(np.int16)
    else:
        out = a.astype(np.int16)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(out.astype(">i2").tobytes())
    os.replace(tmp, path)


def read_srtmhgt(path: str) -> dict:
    """-> dict(grid float64 with voids as NaN, raw int16 grid,
    lat/lon of SW corner, n, cellsize deg).  Size is inferred from the
    byte length exactly as the reference does
    (``srtmhgtdataset.cpp:334-449``)."""
    lat, lon = hgt_corner(path)
    size = os.path.getsize(path)
    n2 = size // 2
    n = int(round(n2 ** 0.5))
    if size != n * n * 2 or n not in (1201, 3601):
        raise ValueError(
            f"{path}: size {size} is not a 1201^2 or 3601^2 int16 tile")
    raw = np.fromfile(path, dtype=">i2").reshape(n, n).astype(np.int16)
    grid = raw.astype(np.float64)
    grid[raw == SRTM_NODATA] = np.nan
    return {"grid": grid, "raw": raw, "lat": lat, "lon": lon, "n": n,
            "cellsize": 1.0 / (n - 1)}


# ------------------------------------------- Surfer DSAA / DSBB grids


def _surfer_extents(a: np.ndarray, xmin: float, ymin: float,
                    cellsize: float) -> tuple:
    ny, nx = a.shape
    xmax = xmin + cellsize * (nx - 1)
    ymax = ymin + cellsize * (ny - 1)
    finite = a[np.isfinite(a)]
    zmin = float(finite.min()) if finite.size else 0.0
    zmax = float(finite.max()) if finite.size else 0.0
    return xmax, ymax, zmin, zmax


def write_gsag(path: str, grid: np.ndarray, *, xmin: float = 0.0,
               ymin: float = 0.0, cellsize: float = 1.0) -> None:
    """Surfer ASCII grid (DSAA). ``grid`` rows are NORTH FIRST (numpy
    image convention); the file stores south first, so rows are
    flipped on write. NaN becomes the 1.70141e38 blank value."""
    a = np.asarray(grid, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("Surfer grids are single-band 2-D")
    ny, nx = a.shape
    xmax, ymax, zmin, zmax = _surfer_extents(a, xmin, ymin, cellsize)
    body_rows = []
    for row in a[::-1]:                      # south first on disk
        vals = np.where(np.isnan(row), SURFER_NODATA, row)
        body_rows.append(" ".join(repr(float(v)) for v in vals))
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("DSAA\n")
        fh.write(f"{nx} {ny}\n")
        fh.write(f"{xmin!r} {xmax!r}\n")
        fh.write(f"{ymin!r} {ymax!r}\n")
        fh.write(f"{zmin!r} {zmax!r}\n")
        fh.write("\n".join(body_rows) + "\n")
    os.replace(tmp, path)


def read_gsag(path: str) -> dict:
    with open(path) as fh:
        toks = fh.read().split()
    if not toks or toks[0] != "DSAA":
        raise ValueError(f"{path}: missing DSAA magic")
    nx, ny = int(toks[1]), int(toks[2])
    xmin, xmax, ymin, ymax, zmin, zmax = (float(t) for t in toks[3:9])
    vals = np.array([float(t) for t in toks[9:9 + nx * ny]])
    if vals.size != nx * ny:
        raise ValueError(f"{path}: expected {nx * ny} values, "
                         f"got {vals.size}")
    grid = vals.reshape(ny, nx)[::-1].copy()   # back to north-first
    grid[grid >= SURFER_NODATA * (1 - 1e-7)] = np.nan
    cell = (xmax - xmin) / (nx - 1) if nx > 1 else 1.0
    return {"grid": grid, "xmin": xmin, "ymin": ymin, "xmax": xmax,
            "ymax": ymax, "zmin": zmin, "zmax": zmax, "cellsize": cell}


def write_gsbg(path: str, grid: np.ndarray, *, xmin: float = 0.0,
               ymin: float = 0.0, cellsize: float = 1.0) -> None:
    """Surfer binary-6 grid (DSBB): 56-byte header (magic + int16
    nx/ny + 6 doubles) then little-endian float32 rows SOUTH FIRST
    (``gsbgdataset.cpp:692-760``)."""
    a = np.asarray(grid, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("Surfer grids are single-band 2-D")
    ny, nx = a.shape
    if nx > 32767 or ny > 32767:
        raise ValueError("DSBB dimensions are int16 (max 32767)")
    xmax, ymax, zmin, zmax = _surfer_extents(a, xmin, ymin, cellsize)
    body = np.where(np.isnan(a[::-1]), SURFER_NODATA,
                    a[::-1]).astype("<f4")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(b"DSBB")
        fh.write(struct.pack("<hh", nx, ny))
        fh.write(struct.pack("<6d", xmin, xmax, ymin, ymax, zmin, zmax))
        fh.write(body.tobytes())
    os.replace(tmp, path)


def read_gsbg(path: str) -> dict:
    with open(path, "rb") as fh:
        head = fh.read(56)
        if head[:4] != b"DSBB":
            raise ValueError(f"{path}: missing DSBB magic")
        nx, ny = struct.unpack("<hh", head[4:8])
        xmin, xmax, ymin, ymax, zmin, zmax = struct.unpack(
            "<6d", head[8:56])
        vals = np.frombuffer(fh.read(nx * ny * 4), dtype="<f4")
    if vals.size != nx * ny:
        raise ValueError(f"{path}: truncated DSBB payload")
    grid = vals.reshape(ny, nx)[::-1].astype(np.float64)
    grid[grid >= SURFER_NODATA * (1 - 1e-7)] = np.nan
    cell = (xmax - xmin) / (nx - 1) if nx > 1 else 1.0
    return {"grid": grid, "xmin": xmin, "ymin": ymin, "xmax": xmax,
            "ymax": ymax, "zmin": zmin, "zmax": zmax, "cellsize": cell}


# ------------------------------------------------------- ESRI EHdr

_EHDR_PIXELTYPE = {
    (8, "UNSIGNEDINT"): np.uint8, (8, "SIGNEDINT"): np.int8,
    (16, "UNSIGNEDINT"): np.uint16, (16, "SIGNEDINT"): np.int16,
    (32, "UNSIGNEDINT"): np.uint32, (32, "SIGNEDINT"): np.int32,
    (32, "FLOAT"): np.float32, (64, "FLOAT"): np.float64,
}
_EHDR_INV = {np.dtype(v): k for k, v in _EHDR_PIXELTYPE.items()}


def write_ehdr(path: str, img: np.ndarray, *, layout: str = "bil",
               ul_map: tuple[float, float] | None = None,
               dims: tuple[float, float] = (1.0, 1.0),
               nodata: float | None = None,
               byteorder: str = "I") -> None:
    """ESRI EHdr flat binary. ``path`` is the data file (commonly
    ``.bil``); the ``.hdr`` sidecar is written next to it. ``img`` is
    (bands, rows, cols) or (rows, cols); ``ul_map`` is the CENTER of
    the upper-left pixel (``ehdrdataset.cpp:640-649``)."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[None]
    if a.ndim != 3:
        raise ValueError("EHdr wants (bands, rows, cols)")
    key = _EHDR_INV.get(a.dtype)
    if key is None:
        raise ValueError(f"EHdr: unsupported dtype {a.dtype} "
                         f"(supported: {sorted(str(k) for k in _EHDR_INV)})")
    nbits, pixeltype = key
    layout = layout.lower()
    if layout not in ("bil", "bip", "bsq"):
        raise ValueError("layout must be bil/bip/bsq")
    if byteorder not in ("I", "M"):
        raise ValueError("BYTEORDER is I (little) or M (big)")
    nb, ny, nx = a.shape
    order = {"bsq": a,                           # band, row, col
             "bil": a.transpose(1, 0, 2),        # row, band, col
             "bip": a.transpose(1, 2, 0)}[layout]
    buf = np.ascontiguousarray(order)
    if byteorder == "M":
        buf = buf.astype(buf.dtype.newbyteorder(">"))
    else:
        buf = buf.astype(buf.dtype.newbyteorder("<"))
    hdr_lines = [
        f"BYTEORDER      {byteorder}",
        f"LAYOUT         {layout.upper()}",
        f"NROWS          {ny}",
        f"NCOLS          {nx}",
        f"NBANDS         {nb}",
        f"NBITS          {nbits}",
        f"BANDROWBYTES   {nx * nbits // 8}",
        f"TOTALROWBYTES  {nb * nx * nbits // 8}",
        f"PIXELTYPE      {pixeltype}",
    ]
    if ul_map is not None:
        hdr_lines += [
            f"ULXMAP         {ul_map[0]!r}",
            f"ULYMAP         {ul_map[1]!r}",
            f"XDIM           {dims[0]!r}",
            f"YDIM           {dims[1]!r}",
        ]
    if nodata is not None:
        hdr_lines.append(f"NODATA         {nodata!r}")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(buf.tobytes())
    os.replace(tmp, path)
    hdr = os.path.splitext(path)[0] + ".hdr"
    tmp = hdr + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(hdr_lines) + "\n")
    os.replace(tmp, hdr)


def read_ehdr(path: str) -> dict:
    """Read an EHdr data file via its ``.hdr`` sidecar -> dict(img
    (bands, rows, cols), layout, ul_map, dims, nodata)."""
    hdr = os.path.splitext(path)[0] + ".hdr"
    if not os.path.exists(hdr):
        raise ValueError(f"{path}: missing {hdr} sidecar")
    kv: dict[str, str] = {}
    with open(hdr) as fh:
        for ln in fh:
            parts = ln.split()
            if len(parts) >= 2:
                kv[parts[0].upper()] = parts[1]
    ny = int(kv["NROWS"])
    nx = int(kv["NCOLS"])
    nb = int(kv.get("NBANDS", "1"))
    nbits = int(kv.get("NBITS", "8"))
    pixeltype = kv.get("PIXELTYPE", "UNSIGNEDINT").upper()
    dt = _EHDR_PIXELTYPE.get((nbits, pixeltype))
    if dt is None:
        raise ValueError(f"{hdr}: NBITS={nbits} PIXELTYPE={pixeltype} "
                         "unsupported")
    bo = kv.get("BYTEORDER", "I").upper()
    dtype = np.dtype(dt).newbyteorder(">" if bo == "M" else "<")
    layout = kv.get("LAYOUT", "BIL").upper()
    raw = np.fromfile(path, dtype=dtype)
    if raw.size != nb * ny * nx:
        raise ValueError(f"{path}: expected {nb * ny * nx} samples, "
                         f"got {raw.size}")
    if layout == "BSQ":
        img = raw.reshape(nb, ny, nx)
    elif layout == "BIL":
        img = raw.reshape(ny, nb, nx).transpose(1, 0, 2)
    elif layout == "BIP":
        img = raw.reshape(ny, nx, nb).transpose(2, 0, 1)
    else:
        raise ValueError(f"{hdr}: LAYOUT {layout} unsupported")
    out = {"img": np.ascontiguousarray(
        img.astype(img.dtype.newbyteorder("="))), "layout": layout,
        "nodata": float(kv["NODATA"]) if "NODATA" in kv else None,
        "ul_map": None, "dims": None}
    if "ULXMAP" in kv:
        out["ul_map"] = (float(kv["ULXMAP"]), float(kv["ULYMAP"]))
        out["dims"] = (float(kv.get("XDIM", "1")),
                       float(kv.get("YDIM", "1")))
    return out


# ------------------------------------------------------------- SAGA

_SAGA_FMT = {
    np.dtype(np.uint8): "BYTE_UNSIGNED",
    np.dtype(np.int16): "SHORTINT",
    np.dtype(np.uint16): "SHORTINT_UNSIGNED",
    np.dtype(np.int32): "INTEGER",
    np.dtype(np.uint32): "INTEGER_UNSIGNED",
    np.dtype(np.float32): "FLOAT",
    np.dtype(np.float64): "DOUBLE",
}
_SAGA_FMT_INV = {v: k for k, v in _SAGA_FMT.items()}


def write_saga(path: str, grid: np.ndarray, *, xmin: float = 0.0,
               ymin: float = 0.0, cellsize: float = 1.0,
               nodata: float = -99999.0, name: str = "grid") -> None:
    """SAGA binary grid. ``path`` is the ``.sdat`` data file; the
    ``.sgrd`` header is written beside it. ``grid`` rows are NORTH
    FIRST in memory; TOPTOBOTTOM=FALSE is written, so rows are flipped
    to south-first on disk (``sagadataset.cpp:519,549``).
    ``xmin``/``ymin`` are the LOWER-LEFT cell center."""
    a = np.asarray(grid)
    if a.ndim != 2:
        raise ValueError("SAGA grids are single-band 2-D")
    fmt = _SAGA_FMT.get(a.dtype)
    if fmt is None:
        raise ValueError(f"SAGA: unsupported dtype {a.dtype}")
    if np.issubdtype(a.dtype, np.floating):
        body = np.where(np.isnan(a), nodata, a).astype(a.dtype)
    else:
        body = a
    ny, nx = a.shape
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(np.ascontiguousarray(
            body[::-1].astype(body.dtype.newbyteorder("<"))).tobytes())
    os.replace(tmp, path)
    sgrd = os.path.splitext(path)[0] + ".sgrd"
    lines = [
        f"NAME\t= {name}",
        "DESCRIPTION\t= ",
        "UNIT\t= ",
        f"DATAFILE_OFFSET\t= 0",
        f"DATAFORMAT\t= {fmt}",
        "BYTEORDER_BIG\t= FALSE",
        f"POSITION_XMIN\t= {xmin!r}",
        f"POSITION_YMIN\t= {ymin!r}",
        f"CELLCOUNT_X\t= {nx}",
        f"CELLCOUNT_Y\t= {ny}",
        f"CELLSIZE\t= {cellsize!r}",
        "Z_FACTOR\t= 1.000000",
        f"NODATA_VALUE\t= {nodata!r}",
        "TOPTOBOTTOM\t= FALSE",
    ]
    tmp = sgrd + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, sgrd)


def read_saga(path: str) -> dict:
    """Read a SAGA ``.sdat`` via its ``.sgrd`` -> dict(grid
    north-first with float nodata as NaN, raw, xmin, ymin, cellsize,
    nodata)."""
    sgrd = os.path.splitext(path)[0] + ".sgrd"
    if not os.path.exists(sgrd):
        raise ValueError(f"{path}: missing {sgrd} sidecar")
    kv: dict[str, str] = {}
    with open(sgrd) as fh:
        for ln in fh:
            if "=" in ln:
                k, v = ln.split("=", 1)
                kv[k.strip().upper()] = v.strip()
    fmt = kv.get("DATAFORMAT", "FLOAT").upper()
    dt = _SAGA_FMT_INV.get(fmt)
    if dt is None:
        raise ValueError(f"{sgrd}: DATAFORMAT {fmt} unsupported "
                         f"(supported: {sorted(_SAGA_FMT_INV)})")
    big = kv.get("BYTEORDER_BIG", "FALSE").upper() == "TRUE"
    top = kv.get("TOPTOBOTTOM", "FALSE").upper() == "TRUE"
    nx = int(kv["CELLCOUNT_X"])
    ny = int(kv["CELLCOUNT_Y"])
    off = int(kv.get("DATAFILE_OFFSET", "0"))
    dtype = np.dtype(dt).newbyteorder(">" if big else "<")
    with open(path, "rb") as fh:
        fh.seek(off)
        raw = np.frombuffer(fh.read(nx * ny * dtype.itemsize),
                            dtype=dtype)
    if raw.size != nx * ny:
        raise ValueError(f"{path}: truncated payload")
    raw = raw.reshape(ny, nx)
    if not top:
        raw = raw[::-1]                      # back to north-first
    raw = np.ascontiguousarray(raw.astype(raw.dtype.newbyteorder("=")))
    nodata = float(kv.get("NODATA_VALUE", "-99999"))
    if np.issubdtype(raw.dtype, np.floating):
        grid = raw.astype(np.float64)
        grid[raw == nodata] = np.nan
    else:
        grid = raw.astype(np.float64)
    return {"grid": grid, "raw": raw, "nodata": nodata,
            "xmin": float(kv.get("POSITION_XMIN", "0")),
            "ymin": float(kv.get("POSITION_YMIN", "0")),
            "cellsize": float(kv.get("CELLSIZE", "1"))}


# ------------------------------------------------------------- ERS

_ERS_CELLTYPES = {
    np.dtype(np.uint8): "Unsigned8BitInteger",
    np.dtype(np.int8): "Signed8BitInteger",
    np.dtype(np.uint16): "Unsigned16BitInteger",
    np.dtype(np.int16): "Signed16BitInteger",
    np.dtype(np.uint32): "Unsigned32BitInteger",
    np.dtype(np.int32): "Signed32BitInteger",
    np.dtype(np.float32): "IEEE4ByteReal",
    np.dtype(np.float64): "IEEE8ByteReal",
}
_ERS_CELLTYPES_INV = {v: k for k, v in _ERS_CELLTYPES.items()}


def write_ers(path: str, img: np.ndarray, *,
              registration: tuple[float, float] | None = None,
              dims: tuple[float, float] = (1.0, 1.0),
              byteorder: str = "LSBFirst") -> None:
    """ERMapper ERS: ``path`` is the ``.ers`` header; the flat binary
    companion (BIL interleave, the format's fixed layout) is the same
    name without the extension (``ersdataset.cpp:1348-1453``).
    ``img`` is (bands, rows, cols) or (rows, cols); ``registration``
    = (eastings, northings) of the top-left corner."""
    if not path.endswith(".ers"):
        raise ValueError("ERS header path must end in .ers")
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[None]
    if a.ndim != 3:
        raise ValueError("ERS wants (bands, rows, cols)")
    ct = _ERS_CELLTYPES.get(a.dtype)
    if ct is None:
        raise ValueError(f"ERS: unsupported dtype {a.dtype} "
                         f"(supported: {sorted(map(str, _ERS_CELLTYPES))})")
    if byteorder not in ("LSBFirst", "MSBFirst"):
        raise ValueError("ByteOrder is LSBFirst or MSBFirst")
    nb, ny, nx = a.shape
    bil = np.ascontiguousarray(a.transpose(1, 0, 2)).astype(
        a.dtype.newbyteorder("<" if byteorder == "LSBFirst" else ">"))
    bin_path = path[:-4]
    tmp = bin_path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(bil.tobytes())
    os.replace(tmp, bin_path)
    lines = [
        "DatasetHeader Begin",
        '\tVersion\t\t = "6.0"',
        f'\tName\t\t= "{os.path.basename(path)}"',
        "\tDataSetType\t= ERStorage",
        "\tDataType\t= Raster",
        f"\tByteOrder\t= {byteorder}",
        "\tRasterInfo Begin",
        f"\t\tCellType\t= {ct}",
        f"\t\tNrOfLines\t= {ny}",
        f"\t\tNrOfCellsPerLine\t= {nx}",
        f"\t\tNrOfBands\t= {nb}",
    ]
    if registration is not None:
        lines += [
            "\t\tCellInfo Begin",
            f"\t\t\tXdimension\t= {dims[0]!r}",
            f"\t\t\tYdimension\t= {dims[1]!r}",
            "\t\tCellInfo End",
            "\t\tRegistrationCoord Begin",
            f"\t\t\tEastings\t= {registration[0]!r}",
            f"\t\t\tNorthings\t= {registration[1]!r}",
            "\t\tRegistrationCoord End",
        ]
    lines += ["\tRasterInfo End", "DatasetHeader End"]
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, path)


def _ers_header(path: str) -> dict[str, str]:
    """Flatten the nested Begin/End blocks to the dotted keys the
    reference uses ('RasterInfo.NrOfLines', ...)."""
    kv: dict[str, str] = {}
    stack: list[str] = []
    with open(path) as fh:
        for ln in fh:
            s = ln.strip()
            if not s:
                continue
            if s.endswith("Begin"):
                name = s[:-5].strip()
                if name != "DatasetHeader":
                    stack.append(name)
                continue
            if s.endswith("End"):
                if stack:
                    stack.pop()
                continue
            if "=" in s:
                k, v = s.split("=", 1)
                key = ".".join(stack + [k.strip()])
                kv[key] = v.strip().strip('"')
    return kv


def read_ers(path: str) -> dict:
    """Read the ``.ers`` header + BIL companion -> dict(img (bands,
    rows, cols), registration, dims, celltype)."""
    kv = _ers_header(path)
    for need in ("RasterInfo.NrOfLines", "RasterInfo.NrOfCellsPerLine",
                 "RasterInfo.NrOfBands"):
        if need not in kv:
            raise ValueError(f"{path}: missing {need}")
    ny = int(kv["RasterInfo.NrOfLines"])
    nx = int(kv["RasterInfo.NrOfCellsPerLine"])
    nb = int(kv["RasterInfo.NrOfBands"])
    ct = kv.get("RasterInfo.CellType", "Unsigned8BitInteger")
    dt = _ERS_CELLTYPES_INV.get(ct)
    if dt is None:
        raise ValueError(f"{path}: CellType {ct!r} unsupported")
    lsb = kv.get("ByteOrder", "LSBFirst") == "LSBFirst"
    dtype = np.dtype(dt).newbyteorder("<" if lsb else ">")
    raw = np.fromfile(path[:-4], dtype=dtype)
    if raw.size != nb * ny * nx:
        raise ValueError(f"{path[:-4]}: expected {nb * ny * nx} "
                         f"samples, got {raw.size}")
    img = raw.reshape(ny, nb, nx).transpose(1, 0, 2)
    out = {"img": np.ascontiguousarray(
        img.astype(img.dtype.newbyteorder("="))), "celltype": ct,
        "registration": None, "dims": None}
    if "RasterInfo.RegistrationCoord.Eastings" in kv:
        out["registration"] = (
            float(kv["RasterInfo.RegistrationCoord.Eastings"]),
            float(kv["RasterInfo.RegistrationCoord.Northings"]))
        out["dims"] = (
            float(kv.get("RasterInfo.CellInfo.Xdimension", "1")),
            float(kv.get("RasterInfo.CellInfo.Ydimension", "1")))
    return out


# ------------------------------------------------------------- ZMap

def write_zmap(path: str, grid: np.ndarray, *, xmin: float = 0.0,
               ymax: float = 0.0, cellsize: float = 1.0,
               nodata: float = 1.0e30,
               values_per_line: int = 4) -> None:
    """ZMap Plus ASCII grid (``frmts/zmap/zmapdataset.cpp:596-700``):
    '!' comments, '@<name>, GRID, n' header, field-size/nodata/
    decimals line, rows/cols/extent line, '0.0, 0.0, 0.0', '@', then
    COLUMN-ORIENTED data — for each column west->east the values run
    NORTH to SOUTH, ``values_per_line`` per line with an EOL at the
    end of every column (the reference's default)."""
    a = np.asarray(grid, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("ZMap grids are single-band 2-D")
    ny, nx = a.shape
    fs, nd = 20, 7
    xmax = xmin + cellsize * nx
    ymin = ymax - cellsize * ny

    def rj(v, width, dec=None):
        s = (f"{v:.{dec}f}" if dec is not None else str(v))
        return s.rjust(width)

    lines = [
        "!", "! Created by gdal_ray.", "!",
        f"@GRID FILE, GRID, {values_per_line}",
        f"{rj(fs, 10)},{rj(nodata, fs, nd)},{rj('', 10)},"
        f"{rj(nd, 10)},{rj(1, 10)}",
        f"{rj(ny, 10)},{rj(nx, 10)},{rj(xmin, 14, 7)},"
        f"{rj(xmax, 14, 7)},{rj(ymin, 14, 7)},{rj(ymax, 14, 7)}",
        "0.0, 0.0, 0.0",
        "@",
    ]
    body = np.where(np.isnan(a), nodata, a)
    for x in range(nx):
        col = body[:, x]                 # north to south
        for s in range(0, ny, values_per_line):
            chunk = col[s:s + values_per_line]
            lines.append("".join(rj(v, fs, nd) for v in chunk))
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, path)


def read_zmap(path: str) -> dict:
    """-> dict(grid north-first float64 with nodata as NaN, xmin,
    ymax, cellsize, nodata)."""
    with open(path) as fh:
        raw = [ln for ln in fh.read().splitlines()
               if not ln.lstrip().startswith("!")]
    if not raw or not raw[0].lstrip().startswith("@"):
        raise ValueError(f"{path}: missing @GRID header")
    hdr1 = raw[0].split(",")
    if len(hdr1) < 3 or hdr1[1].strip().upper() != "GRID":
        raise ValueError(f"{path}: not a ZMap GRID header")
    hdr2 = raw[1].split(",")
    nodata = float(hdr2[1])
    hdr3 = raw[2].split(",")
    ny, nx = int(hdr3[0]), int(hdr3[1])
    xmin, xmax, ymin, ymax = (float(v) for v in hdr3[2:6])
    at = 3
    while at < len(raw) and raw[at].strip() != "@":
        at += 1
    vals: list[float] = []
    for ln in raw[at + 1:]:
        vals += [float(v) for v in ln.split()]
    if len(vals) != nx * ny:
        raise ValueError(f"{path}: expected {nx * ny} values, "
                         f"got {len(vals)}")
    grid = np.array(vals).reshape(nx, ny).T.copy()   # columns -> rows
    grid[grid == nodata] = np.nan
    cell = (xmax - xmin) / nx if nx else 1.0
    return {"grid": grid, "xmin": xmin, "ymax": ymax,
            "cellsize": cell, "nodata": nodata}


# -------------------------------------------------------- Idrisi RST

_RST_TYPES = {
    np.dtype(np.uint8): "byte",
    np.dtype(np.int16): "integer",
    np.dtype(np.float32): "real",
}
_RST_TYPES_INV = {v: k for k, v in _RST_TYPES.items()}


def write_rst(path: str, img: np.ndarray, *,
              extent: tuple[float, float, float, float] | None = None,
              ref_system: str = "plane") -> None:
    """Idrisi raster (``frmts/idrisi/IdrisiDataset.cpp``): ``.rst``
    little-endian row-major binary (north row first) + the fixed
    12-char-key ``.rdc`` document sidecar.  ``img`` (rows, cols) of
    uint8/int16/float32, or (rows, cols, 3) uint8 -> ``rgb24``
    (stored BGR per the reference's band order).  ``extent`` =
    (min_x, max_x, min_y, max_y)."""
    if not path.endswith(".rst"):
        raise ValueError("Idrisi raster path must end in .rst")
    a = np.asarray(img)
    if a.ndim == 3:
        if a.shape[2] != 3 or a.dtype != np.uint8:
            raise ValueError("RST rgb24 wants (rows, cols, 3) uint8")
        dtype_name = "rgb24"
        payload = a[:, :, ::-1]          # BGR on disk
        ny, nx = a.shape[:2]
        mn, mx = float(a.min()), float(a.max())
    else:
        if a.ndim != 2:
            raise ValueError("RST wants (rows, cols)")
        dtype_name = _RST_TYPES.get(a.dtype)
        if dtype_name is None:
            raise ValueError(f"RST: unsupported dtype {a.dtype} "
                             "(byte/integer/real/rgb24)")
        payload = a
        ny, nx = a.shape
        mn, mx = float(a.min()), float(a.max())
    if extent is None:
        extent = (0.0, float(nx), 0.0, float(ny))
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(np.ascontiguousarray(
            payload.astype(payload.dtype.newbyteorder("<"))).tobytes())
    os.replace(tmp, path)
    rdc = path[:-4] + ".rdc"
    lines = [
        "file format : Idrisi Raster A.1",
        f"file title  : {os.path.basename(path)}",
        f"data type   : {dtype_name}",
        "file type   : binary",
        f"columns     : {nx}",
        f"rows        : {ny}",
        f"ref. system : {ref_system}",
        "ref. units  : m",
        "unit dist.  : 1.0000000",
        f"min. X      : {extent[0]!r}",
        f"max. X      : {extent[1]!r}",
        f"min. Y      : {extent[2]!r}",
        f"max. Y      : {extent[3]!r}",
        "pos'n error : unknown",
        "resolution  : unknown",
        f"min. value  : {mn!r}",
        f"max. value  : {mx!r}",
        f"display min : {mn!r}",
        f"display max : {mx!r}",
        "value units : unspecified",
        "value error : unknown",
        "flag value  : none",
        "flag def'n  : none",
        "legend cats : 0",
    ]
    tmp = rdc + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, rdc)


def read_rst(path: str) -> dict:
    """Read ``.rst`` via its ``.rdc`` -> dict(img (rows, cols) or
    (rows, cols, 3) for rgb24, dtype_name, extent)."""
    rdc = path[:-4] + ".rdc" if path.endswith(".rst") else None
    if rdc is None or not os.path.exists(rdc):
        raise ValueError(f"{path}: missing .rdc sidecar")
    kv: dict[str, str] = {}
    with open(rdc) as fh:
        for ln in fh:
            if ":" in ln:
                k, v = ln.split(":", 1)
                kv[k.strip()] = v.strip()
    nx = int(kv["columns"])
    ny = int(kv["rows"])
    dtype_name = kv.get("data type", "byte")
    extent = tuple(float(kv[k]) for k in
                   ("min. X", "max. X", "min. Y", "max. Y")) \
        if "min. X" in kv else None
    if dtype_name == "rgb24":
        raw = np.fromfile(path, dtype=np.uint8)
        if raw.size != ny * nx * 3:
            raise ValueError(f"{path}: truncated rgb24 payload")
        img = raw.reshape(ny, nx, 3)[:, :, ::-1].copy()   # BGR -> RGB
    else:
        dt = _RST_TYPES_INV.get(dtype_name)
        if dt is None:
            raise ValueError(f"{rdc}: data type {dtype_name!r} "
                             "unsupported")
        raw = np.fromfile(path, dtype=np.dtype(dt).newbyteorder("<"))
        if raw.size != ny * nx:
            raise ValueError(f"{path}: truncated payload")
        img = np.ascontiguousarray(
            raw.reshape(ny, nx).astype(np.dtype(dt)))
    return {"img": img, "dtype_name": dtype_name, "extent": extent}


# -------------------------------------------------------- USGS DEM

def _dfmt(v: float, width: int) -> str:
    """Fortran D-notation float right-justified to ``width`` chars
    (the USGS DEM A/B-record real format the reference converts via
    D->E, ``usgsdemdataset.cpp:252-282``)."""
    dec = 15 if width >= 24 else 5
    s = f"{v:.{dec}E}".replace("E", "D")
    if len(s) > width:
        raise ValueError(f"D-float {s!r} wider than {width}")
    return s.rjust(width)


def write_usgsdem(path: str, grid: np.ndarray, *,
                  sw_lon: float, sw_lat: float,
                  cell_arcsec: float = 3.0,
                  name: str = "GDAL_RAY DEM") -> None:
    """Classic (old-format) USGS DEM, geographic arc-second grid with
    integer-meter elevations — the layout the reference detects via
    the 1/1 profile anchor at byte 864 (``usgsdemdataset.cpp:639``):
    864-byte A record (coord system at 156, ground/elev unit codes at
    528, SW/NW/NE/SE corners in arc-seconds at 546 as D24.15 pairs,
    dx/dy/vres at 816 as D12.6, profile count at 858), then one
    column-major B record per profile (row 1, col i+1, point count,
    x/y start + offset + min/max as D24.15, I6 elevations).  ``grid``
    rows are NORTH FIRST; NaN -> the -32767 void."""
    a = np.asarray(grid)
    if a.ndim != 2:
        raise ValueError("USGS DEM is single-band 2-D")
    if np.issubdtype(a.dtype, np.floating):
        f = a.astype(np.float64)
        elev = np.where(np.isnan(f), -32767,
                        np.rint(f)).astype(np.int32)
    else:
        elev = a.astype(np.int32)
    ny, nx = a.shape
    x0 = sw_lon * 3600.0
    y0 = sw_lat * 3600.0
    dx = dy = float(cell_arcsec)
    xmax = x0 + dx * (nx - 1)
    ymax = y0 + dy * (ny - 1)
    finite = elev[elev != -32767]
    emin = float(finite.min()) if finite.size else 0.0
    emax = float(finite.max()) if finite.size else 0.0

    hdr = bytearray(b" " * 864)

    def put(off: int, text: str) -> None:
        hdr[off:off + len(text)] = text.encode("ascii")

    put(0, name[:135])
    put(150, f"{1:6d}")                       # DEM level
    put(156, f"{0:6d}")                       # coord system: geographic
    put(162, f"{0:6d}")                       # zone
    put(528, f"{3:6d}")                       # ground units: arc-sec
    put(534, f"{2:6d}")                       # elevation units: meters
    put(540, f"{4:6d}")                       # 4 corners
    corners = [(x0, y0), (x0, ymax), (xmax, ymax), (xmax, y0)]
    pos = 546
    for cx, cy in corners:                    # SW, NW, NE, SE
        put(pos, _dfmt(cx, 24))
        put(pos + 24, _dfmt(cy, 24))
        pos += 48
    put(738, _dfmt(emin, 24))
    put(762, _dfmt(emax, 24))
    put(786, _dfmt(0.0, 24))                  # rotation angle
    put(810, f"{0:6d}")                       # accuracy code
    put(816, _dfmt(dx, 12))
    put(828, _dfmt(dy, 12))
    put(840, _dfmt(1.0, 12))                  # vertical resolution
    put(852, f"{1:6d}")                       # rows (always 1)
    put(858, f"{nx:6d}")                      # profile count

    body = []
    for i in range(nx):
        col = elev[::-1, i]                   # south-to-north points
        head = (f"{1:6d}{i + 1:6d}{ny:6d}{1:6d}"
                + _dfmt(x0 + i * dx, 24) + _dfmt(y0, 24)
                + _dfmt(0.0, 24)              # elevation offset
                + _dfmt(float(col[col != -32767].min())
                        if (col != -32767).any() else 0.0, 24)
                + _dfmt(float(col[col != -32767].max())
                        if (col != -32767).any() else 0.0, 24))
        vals = "".join(f"{int(v):6d}" for v in col)
        body.append(head + vals)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(bytes(hdr))
        fh.write("".join(body).encode("ascii"))
    os.replace(tmp, path)


def read_usgsdem(path: str) -> dict:
    """Read a classic USGS DEM (the reference's tokenizing reader
    restated: A-record fields at their fixed offsets, then
    whitespace-tokenized column profiles) -> dict(grid float64
    north-first with voids as NaN, sw_lon, sw_lat, cell_arcsec)."""
    with open(path, "rb") as fh:
        data = fh.read()
    txt = data.decode("ascii", "replace")

    def rint(off: int) -> int:
        return int(txt[off:off + 6])

    def rd(off: int, width: int) -> float:
        return float(txt[off:off + width].replace("D", "E"))

    coord = rint(156)
    if coord != 0:
        raise ValueError(f"{path}: coordinate system {coord} "
                         "unsupported (geographic only)")
    gunit = rint(528)
    if gunit != 3:
        raise ValueError(f"{path}: ground unit {gunit} unsupported "
                         "(arc-seconds only)")
    x0 = rd(546, 24)
    y0 = rd(570, 24)
    dx = rd(816, 12)
    dy = rd(828, 12)
    nprof = rint(858)
    # profiles read with the reference's CHARACTER-LEVEL int scanner
    # (USGSDEMReadIntFromBuffer): fields may abut with no separator
    # when a negative value fills its I6 width, so whitespace
    # splitting mis-tokenizes; doubles are FIXED 24-char reads
    body = txt[864:]
    cur = 0

    def scan_int() -> int:
        nonlocal cur
        while cur < len(body) and body[cur] in " \t\r\n":
            cur += 1
        start = cur
        if cur < len(body) and body[cur] in "+-":
            cur += 1
        while cur < len(body) and body[cur].isdigit():
            cur += 1
        return int(body[start:cur])

    def scan_d24() -> float:
        nonlocal cur
        s = body[cur:cur + 24]
        cur += 24
        return float(s.replace("D", "E"))

    cols = []
    ny = None
    for i in range(nprof):
        rowno = scan_int(); colno = scan_int()
        npts = scan_int(); ncols = scan_int()
        if rowno != 1 or colno != i + 1 or ncols != 1:
            raise ValueError(f"{path}: unexpected profile header "
                             f"({rowno},{colno},{ncols}) at {i}")
        if ny is None:
            ny = npts
        elif npts != ny:
            raise ValueError(f"{path}: ragged profiles unsupported")
        scan_d24()                            # x start
        scan_d24()                            # y start
        off = scan_d24()                      # elevation offset
        scan_d24(); scan_d24()                # min / max
        vals = np.array([scan_int() for _ in range(npts)], np.float64)
        vals = np.where(vals == -32767, np.nan, vals + off)
        cols.append(vals)
    grid = np.column_stack(cols)[::-1]        # to north-first rows
    return {"grid": grid, "sw_lon": x0 / 3600.0, "sw_lat": y0 / 3600.0,
            "cell_arcsec": dx, "dy_arcsec": dy}


# ------------------------------------------------------------- GXF

def write_gxf(path: str, grid: np.ndarray, *, xorigin: float = 0.0,
              yorigin: float = 0.0, cellsize: float = 1.0,
              dummy: float = -1e12, title: str = "grid") -> None:
    """Geosoft Grid eXchange File (the reference's ``frmts/gxf``):
    '#KEYWORD' header lines each followed by a value line —
    #POINTS/#ROWS/#PTSEPARATION/#RWSEPARATION/#XORIGIN/#YORIGIN/
    #DUMMY/#SENSE (``gxfopen.c:225-339``) — then '#GRID' and the
    values.  SENSE 1 (GXFS_LL_RIGHT, the format default,
    ``gxfopen.c:212``): first data row is the SOUTH row, values
    left-to-right.  ``grid`` rows are NORTH FIRST in memory; NaN
    becomes the #DUMMY value; ``(xorigin, yorigin)`` is the
    lower-left corner."""
    a = np.asarray(grid, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("GXF grids are single-band 2-D")
    ny, nx = a.shape
    body = np.where(np.isnan(a), dummy, a)
    lines = [
        "#TITLE", title,
        "#POINTS", str(nx),
        "#ROWS", str(ny),
        "#PTSEPARATION", repr(float(cellsize)),
        "#RWSEPARATION", repr(float(cellsize)),
        "#XORIGIN", repr(float(xorigin)),
        "#YORIGIN", repr(float(yorigin)),
        "#DUMMY", repr(float(dummy)),
        "#SENSE", "1",
        "#GRID",
    ]
    for row in body[::-1]:                   # south row first
        lines.append(" ".join(repr(float(v)) for v in row))
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, path)


def read_gxf(path: str) -> dict:
    """-> dict(grid north-first with #DUMMY as NaN, xorigin, yorigin,
    cellsize).  SENSE 1 only (the default; others error loudly
    naming the code)."""
    with open(path) as fh:
        lines = fh.read().splitlines()
    kv: dict[str, list[str]] = {}
    grid_at = None
    i = 0
    while i < len(lines):
        ln = lines[i].strip()
        if ln.upper().startswith("#GRID"):
            grid_at = i + 1
            break
        if ln.startswith("#"):
            key = ln[1:].split()[0].upper()[:4]
            vals = []
            i += 1
            while i < len(lines) and not lines[i].strip().startswith("#"):
                vals.append(lines[i].strip())
                i += 1
            kv[key] = vals
            continue
        i += 1
    if grid_at is None:
        raise ValueError(f"{path}: no #GRID section")
    nx = int(kv["POIN"][0])
    ny = int(kv["ROWS"][0])
    sense = int(kv.get("SENS", ["1"])[0])
    if sense != 1:
        raise ValueError(f"{path}: #SENSE {sense} unsupported "
                         "(GXFS_LL_RIGHT only)")
    dummy = float(kv.get("DUMM", ["-1e12"])[0])
    vals: list[float] = []
    for ln in lines[grid_at:]:
        vals += [float(v) for v in ln.split()]
    if len(vals) != nx * ny:
        raise ValueError(f"{path}: expected {nx * ny} values, "
                         f"got {len(vals)}")
    grid = np.array(vals).reshape(ny, nx)[::-1].copy()
    grid[grid == dummy] = np.nan
    return {"grid": grid,
            "xorigin": float(kv.get("XORI", ["0"])[0]),
            "yorigin": float(kv.get("YORI", ["0"])[0]),
            "cellsize": float(kv.get("PTSE", ["1"])[0]),
            "dummy": dummy}


# -------------------------------------------------------- Erdas LAN

def write_lan(path: str, img: np.ndarray, *,
              ul: tuple[float, float] | None = None,
              pixel: tuple[float, float] = (1.0, 1.0),
              coord_sys: int = 0) -> None:
    """Erdas 7.x LAN/GIS raster (``frmts/raw/landataset.cpp:25-46``,
    the HEAD74 layout): 128-byte header — magic, pixel type (0=8-bit,
    2=16-bit), band count, int32 width/height at 16/20, coord system
    at 88, UL-corner X/Y float32 at 112/116, pixel width/height at
    120/124 — then BIL-interleaved samples.  ``img`` is (bands, rows,
    cols) or (rows, cols) of uint8/int16, little-endian."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[None]
    if a.ndim != 3:
        raise ValueError("LAN wants (bands, rows, cols)")
    if a.dtype == np.uint8:
        ptype = 0
    elif a.dtype == np.int16:
        ptype = 2
    else:
        raise ValueError(f"LAN: unsupported dtype {a.dtype} "
                         "(uint8/int16)")
    nb, ny, nx = a.shape
    hdr = bytearray(128)
    hdr[0:6] = b"HEAD74"
    struct.pack_into("<hh", hdr, 6, ptype, nb)
    struct.pack_into("<ii", hdr, 16, nx, ny)
    struct.pack_into("<ii", hdr, 24, 0, 0)
    struct.pack_into("<h", hdr, 88, coord_sys)
    if ul is not None:
        struct.pack_into("<f", hdr, 112, ul[0])
        struct.pack_into("<f", hdr, 116, ul[1])
    struct.pack_into("<f", hdr, 120, pixel[0])
    struct.pack_into("<f", hdr, 124, pixel[1])
    bil = np.ascontiguousarray(
        a.transpose(1, 0, 2).astype(a.dtype.newbyteorder("<")))
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(bytes(hdr))
        fh.write(bil.tobytes())
    os.replace(tmp, path)


def read_lan(path: str) -> dict:
    """-> dict(img (bands, rows, cols), ul, pixel, coord_sys).
    HEAD74 and HEADER magics; 4-bit packing errors loudly like the
    reference's -1 pixel-offset path is its own branch there."""
    with open(path, "rb") as fh:
        hdr = fh.read(128)
        if hdr[:6] not in (b"HEAD74", b"HEADER"):
            raise ValueError(f"{path}: not an Erdas LAN header")
        ptype, nb = struct.unpack_from("<hh", hdr, 6)
        if hdr[:6] == b"HEADER":
            nx = int(struct.unpack_from("<f", hdr, 16)[0])
            ny = int(struct.unpack_from("<f", hdr, 20)[0])
        else:
            nx, ny = struct.unpack_from("<ii", hdr, 16)
        if ptype == 0:
            dt = np.dtype("u1")
        elif ptype == 2:
            dt = np.dtype("<i2")
        elif ptype == 1:
            raise ValueError(f"{path}: 4-bit LAN packing unsupported")
        else:
            raise ValueError(f"{path}: pixel type {ptype} unsupported")
        coord_sys = struct.unpack_from("<h", hdr, 88)[0]
        ulx, uly = struct.unpack_from("<ff", hdr, 112)
        pw, ph = struct.unpack_from("<ff", hdr, 120)
        raw = np.frombuffer(fh.read(nb * ny * nx * dt.itemsize), dt)
    if raw.size != nb * ny * nx:
        raise ValueError(f"{path}: truncated LAN payload")
    img = raw.reshape(ny, nb, nx).transpose(1, 0, 2)
    return {"img": np.ascontiguousarray(
        img.astype(img.dtype.newbyteorder("="))),
        "ul": (float(ulx), float(uly)), "pixel": (float(pw), float(ph)),
        "coord_sys": int(coord_sys)}


# ------------------------------------------------------- Terragen

def write_terragen(path: str, grid_m: np.ndarray, *,
                   scal: float = 30.0,
                   height_scale: int = 256) -> None:
    """Terragen .ter heightfield (``frmts/terragen/
    terragendataset.cpp:440-530``): 16-byte 'TERRAGENTERRAIN ' magic,
    then 4-char tags — SIZE (int16 min(n)-1 + pad), XPTS/YPTS for
    non-square fields, SCAL (3 float32 gridpost distances), ALTW
    (int16 heightScale, int16 baseHeight, int16 elevations with
    ``h_meters = SCAL * (base + hv * hscale / 65536)``) — and
    'EOF '.  First stored row is the SOUTH row (Terragen's y-up
    convention); ``grid_m`` rows are NORTH FIRST in memory."""
    a = np.asarray(grid_m, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("Terragen heightfields are 2-D")
    ny, nx = a.shape
    hpx = a / float(scal)
    hv = np.clip(np.floor(hpx * 65536.0 / height_scale + 0.5),
                 -32768, 32767).astype("<i2")
    parts = [b"TERRAGENTERRAIN "]
    parts.append(b"SIZE" + struct.pack("<hxx", min(nx, ny) - 1))
    if nx != ny:
        parts.append(b"XPTS" + struct.pack("<hxx", nx))
        parts.append(b"YPTS" + struct.pack("<hxx", ny))
    parts.append(b"SCAL" + struct.pack("<fff", scal, scal, scal))
    parts.append(b"ALTW" + struct.pack("<hh", height_scale, 0))
    parts.append(hv[::-1].tobytes())          # south row first
    parts.append(b"EOF ")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(b"".join(parts))
    os.replace(tmp, path)


def read_terragen(path: str) -> dict:
    """-> dict(grid_m north-first float64, scal, height_scale,
    base_height) via the tag walk the reference performs
    (``terragendataset.cpp:691-763``)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:16] != b"TERRAGENTERRAIN ":
        raise ValueError(f"{path}: not a Terragen heightfield")
    pos = 16
    nx = ny = None
    scal = 30.0
    hscale = base = None
    hv = None
    while pos + 4 <= len(data):
        tag = data[pos:pos + 4]
        pos += 4
        if tag == b"SIZE":
            n = struct.unpack_from("<h", data, pos)[0] + 1
            nx = ny = n
            pos += 4
        elif tag == b"XPTS":
            nx = struct.unpack_from("<h", data, pos)[0]
            pos += 4
        elif tag == b"YPTS":
            ny = struct.unpack_from("<h", data, pos)[0]
            pos += 4
        elif tag == b"SCAL":
            scal = struct.unpack_from("<fff", data, pos)[0]
            pos += 12
        elif tag == b"ALTW":
            hscale, base = struct.unpack_from("<hh", data, pos)
            pos += 4
            if nx is None or ny is None:
                raise ValueError(f"{path}: ALTW before SIZE")
            hv = np.frombuffer(data, "<i2", count=nx * ny,
                               offset=pos).reshape(ny, nx)
            pos += 2 * nx * ny
        elif tag == b"EOF ":
            break
        else:
            raise ValueError(f"{path}: unknown Terragen tag {tag!r}")
    if hv is None:
        raise ValueError(f"{path}: no ALTW elevation chunk")
    grid = float(scal) * (base + hv[::-1].astype(np.float64)
                          * hscale / 65536.0)
    return {"grid_m": grid, "scal": float(scal),
            "height_scale": int(hscale), "base_height": int(base)}


# -------------------------------------------------------------- HF2

def write_hf2(path: str, grid: np.ndarray, *,
              tile_size: int = 256, vert_pres: float = 0.01,
              horiz_scale: float = 1.0) -> None:
    """HF2 height field (``frmts/hf2/hf2dataset.cpp:110-230,400-460``):
    28-byte header ('HF2\\0' + u16 version, u32 width/height, u16
    tile size, f32 vertical precision, f32 horizontal scale, u32
    extended-header length) then tiles BOTTOM-LEFT FIRST, each tile =
    f32 scale + f32 offset and per tile line (bottom-up): u8 word
    size, i32 first quantized value, (width-1) signed deltas of that
    word size.  Values quantize to multiples of ``vert_pres``
    (scale = vert_pres, offset = 0 — the writer convention)."""
    a = np.asarray(grid, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("HF2 height fields are 2-D")
    ny, nx = a.shape
    ts = int(tile_size)
    q = np.floor(a / vert_pres + 0.5).astype(np.int64)
    if np.abs(q).max(initial=0) > 2**31 - 1:
        raise ValueError("HF2: values exceed int32 at this "
                         "vertical precision")
    bottom_up = q[::-1]                       # row 0 = south
    parts = [b"HF2\x00" + struct.pack("<HIIH", 0, nx, ny, ts)
             + struct.pack("<ffI", vert_pres, horiz_scale, 0)]
    nxt = -(-nx // ts)
    nyt = -(-ny // ts)
    for j in range(nyt):                      # tile rows, bottom-up
        for i in range(nxt):
            tile = bottom_up[j * ts:(j + 1) * ts,
                             i * ts:(i + 1) * ts]
            body = bytearray(struct.pack("<ff", vert_pres, 0.0))
            for line in tile:                 # bottom-up lines
                first = int(line[0])
                deltas = np.diff(line)
                amax = int(np.abs(deltas).max(initial=0))
                if amax <= 127:
                    ws, dt = 1, "<i1"
                elif amax <= 32767:
                    ws, dt = 2, "<i2"
                else:
                    ws, dt = 4, "<i4"
                body += struct.pack("<bi", ws, first)
                body += deltas.astype(dt).tobytes()
            parts.append(bytes(body))
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(b"".join(parts))
    os.replace(tmp, path)


def read_hf2(path: str) -> dict:
    """-> dict(grid north-first float64, vert_pres, horiz_scale,
    tile_size).  Walks the tiles in file order exactly as the
    reference's block map does (tile 0 bottom-left)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != b"HF2\x00":
        raise ValueError(f"{path}: not an HF2 height field")
    _ver, nx, ny, ts = struct.unpack_from("<HIIH", data, 4)
    vert_pres, horiz_scale, ext = struct.unpack_from("<ffI", data, 16)
    pos = 28 + ext
    grid_bu = np.empty((ny, nx), np.float64)
    nxt = -(-nx // ts)
    nyt = -(-ny // ts)
    for j in range(nyt):
        th = min(ts, ny - j * ts)
        for i in range(nxt):
            tw = min(ts, nx - i * ts)
            scale, off = struct.unpack_from("<ff", data, pos)
            pos += 8
            for y in range(th):
                ws = struct.unpack_from("<b", data, pos)[0]
                if ws not in (1, 2, 4):
                    raise ValueError(f"{path}: unexpected word size "
                                     f"{ws}")
                first = struct.unpack_from("<i", data, pos + 1)[0]
                pos += 5
                deltas = np.frombuffer(
                    data, dtype=f"<i{ws}", count=tw - 1, offset=pos
                ).astype(np.int64)
                pos += ws * (tw - 1)
                vals = np.empty(tw, np.int64)
                vals[0] = first
                if tw > 1:
                    vals[1:] = first + np.cumsum(deltas)
                grid_bu[j * ts + y, i * ts:i * ts + tw] = \
                    vals * float(scale) + float(off)
    return {"grid": grid_bu[::-1].copy(), "vert_pres": float(vert_pres),
            "horiz_scale": float(horiz_scale), "tile_size": int(ts)}


# -------------------------------------------------------------- KRO

_KRO_DEPTHS = {np.dtype(np.uint8): 8, np.dtype(np.uint16): 16,
               np.dtype(np.float32): 32}


def write_kro(path: str, img: np.ndarray) -> None:
    """KOLOR KRO raw raster (``frmts/raw/krodataset.cpp``): 'KRO\\x01'
    magic then BIG-ENDIAN u32 width / height / depth(bits) /
    component count, pixel-interleaved big-endian samples.  ``img``
    is (rows, cols) or (rows, cols, comps) of uint8/uint16/float32."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3:
        raise ValueError("KRO wants (rows, cols[, comps])")
    depth = _KRO_DEPTHS.get(a.dtype)
    if depth is None:
        raise ValueError(f"KRO: unsupported dtype {a.dtype} "
                         "(uint8/uint16/float32)")
    ny, nx, nc = a.shape
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(b"KRO\x01")
        fh.write(struct.pack(">IIII", nx, ny, depth, nc))
        fh.write(np.ascontiguousarray(
            a.astype(a.dtype.newbyteorder(">"))).tobytes())
    os.replace(tmp, path)


def read_kro(path: str) -> dict:
    with open(path, "rb") as fh:
        hdr = fh.read(20)
        if hdr[:4] != b"KRO\x01":
            raise ValueError(f"{path}: not a KRO raster")
        nx, ny, depth, nc = struct.unpack(">IIII", hdr[4:20])
        dt = {8: ">u1", 16: ">u2", 32: ">f4"}.get(depth)
        if dt is None:
            raise ValueError(f"{path}: depth {depth} unsupported")
        raw = np.frombuffer(fh.read(ny * nx * nc
                                    * np.dtype(dt).itemsize), dt)
    if raw.size != ny * nx * nc:
        raise ValueError(f"{path}: truncated KRO payload")
    img = np.ascontiguousarray(
        raw.reshape(ny, nx, nc).astype(np.dtype(dt).newbyteorder("=")))
    return {"img": img if nc > 1 else img[:, :, 0]}


# --------------------------------------------------------- Leveller

def _lev_tag(name: str, payload: bytes) -> bytes:
    return (bytes([len(name)]) + name.encode("ascii")
            + struct.pack("<I", len(payload)) + payload)


def write_leveller(path: str, grid: np.ndarray, *,
                   elev_scale: float = 1.0,
                   elev_base: float = 0.0) -> None:
    """Leveller .ter heightfield (``frmts/leveller/
    levellerdataset.cpp:709-800,915-1020``): 'trrn' + version byte 7,
    then length-prefixed tags (u8 name length, name, u32 LE data
    length, data) — ``hf_w``/``hf_b`` i32 dimensions, ``csclass`` 0
    (raster coordinates), optional ``coordsys_em_scale``/``_base``
    f64, and ``hf_data`` float32 LE samples, first row NORTH (the
    band reader addresses line y directly)."""
    a = np.asarray(grid, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("Leveller heightfields are 2-D")
    ny, nx = a.shape
    hf = ((a - elev_base) / elev_scale).astype("<f4")
    parts = [b"trrn\x07",
             _lev_tag("hf_w", struct.pack("<i", nx)),
             _lev_tag("hf_b", struct.pack("<i", ny)),
             _lev_tag("csclass", struct.pack("<i", 0))]
    if elev_scale != 1.0 or elev_base != 0.0:
        parts.append(_lev_tag("coordsys_em_scale",
                              struct.pack("<d", elev_scale)))
        parts.append(_lev_tag("coordsys_em_base",
                              struct.pack("<d", elev_base)))
    parts.append(_lev_tag("hf_data", np.ascontiguousarray(hf)
                          .tobytes()))
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(b"".join(parts))
    os.replace(tmp, path)


def read_leveller(path: str) -> dict:
    """-> dict(grid north-first float64 world units, elev_scale,
    elev_base) via the tag walk the reference's locate_data
    performs."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != b"trrn":
        raise ValueError(f"{path}: not a Leveller heightfield")
    tags: dict[str, bytes] = {}
    pos = 5
    while pos < len(data):
        nl = data[pos]
        if nl == 0 or nl > 64:
            raise ValueError(f"{path}: bad tag descriptor at {pos}")
        name = data[pos + 1:pos + 1 + nl].decode("ascii")
        (dlen,) = struct.unpack_from("<I", data, pos + 1 + nl)
        start = pos + 1 + nl + 4
        tags[name] = data[start:start + dlen]
        pos = start + dlen
    for need in ("hf_w", "hf_b", "hf_data"):
        if need not in tags:
            raise ValueError(f"{path}: missing {need} tag")
    nx = struct.unpack("<i", tags["hf_w"])[0]
    ny = struct.unpack("<i", tags["hf_b"])[0]
    hf = np.frombuffer(tags["hf_data"], "<f4")
    if hf.size != nx * ny:
        raise ValueError(f"{path}: hf_data carries {hf.size} samples "
                         f"for {nx}x{ny}")
    scale = (struct.unpack("<d", tags["coordsys_em_scale"])[0]
             if "coordsys_em_scale" in tags else 1.0)
    base = (struct.unpack("<d", tags["coordsys_em_base"])[0]
            if "coordsys_em_base" in tags else 0.0)
    grid = base + scale * hf.reshape(ny, nx).astype(np.float64)
    return {"grid": grid, "elev_scale": scale, "elev_base": base}


# ------------------------------------------------------ Surfer 7 (DSRB)

def write_gs7bg(path: str, grid: np.ndarray, *, xmin: float = 0.0,
                ymin: float = 0.0, cellsize: float = 1.0) -> None:
    """Surfer 7 binary grid (``frmts/gsg/gs7bgdataset.cpp:880-1030``):
    'DSRB' header section (u32 size 4, u32 version 1), 'GRID' section
    (u32 size 72: i32 ny/nx, f64 xLL/yLL/dx/dy/zmin/zmax/rotation/
    blank-value), 'DATA' section (u32 byte size, float64 rows SOUTH
    FIRST).  NaN becomes the 1.70141e38 blank value."""
    a = np.asarray(grid, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("Surfer grids are single-band 2-D")
    ny, nx = a.shape
    _xmax, _ymax, zmin, zmax = _surfer_extents(a, xmin, ymin, cellsize)
    body = np.where(np.isnan(a[::-1]), SURFER_NODATA, a[::-1])
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(b"DSRB" + struct.pack("<II", 4, 1))
        fh.write(b"GRID" + struct.pack("<I", 72))
        fh.write(struct.pack("<ii", ny, nx))
        fh.write(struct.pack("<8d", xmin, ymin, cellsize, cellsize,
                             zmin, zmax, 0.0, SURFER_NODATA))
        fh.write(b"DATA" + struct.pack("<I", nx * ny * 8))
        fh.write(np.ascontiguousarray(body.astype("<f8")).tobytes())
    os.replace(tmp, path)


def read_gs7bg(path: str) -> dict:
    """Section walk exactly like the reference's open path (skip
    unknown sections until GRID, then DATA)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != b"DSRB":
        raise ValueError(f"{path}: missing DSRB magic")
    (hsize,) = struct.unpack_from("<I", data, 4)
    pos = 8 + hsize
    grid_info = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        pos += 8
        if tag == b"GRID":
            ny, nx = struct.unpack_from("<ii", data, pos)
            (xmin, ymin, dx, dy, zmin, zmax, rot, blank) = \
                struct.unpack_from("<8d", data, pos + 8)
            grid_info = (ny, nx, xmin, ymin, dx, dy, blank)
            pos += size
        elif tag == b"DATA":
            if grid_info is None:
                raise ValueError(f"{path}: DATA before GRID section")
            ny, nx, xmin, ymin, dx, dy, blank = grid_info
            vals = np.frombuffer(data, "<f8", count=nx * ny,
                                 offset=pos)
            g = vals.reshape(ny, nx)[::-1].copy()
            g[g >= blank * (1 - 1e-7)] = np.nan
            return {"grid": g, "xmin": xmin, "ymin": ymin,
                    "cellsize": dx, "dy": dy, "blank": blank}
        else:
            pos += size
    raise ValueError(f"{path}: no DATA section")


# -------------------------------------------------------------- ACE2

_ACE2_RES = {"_5M": (180, 5.0 / 60), "_30S": (1800, 30.0 / 3600),
             "_9S": (6000, 9.0 / 3600), "_3S": (18000, 3.0 / 3600)}
_ACE2_NAME = re.compile(
    r"(\d{1,2})([NS])(\d{1,3})([EW])(_CONF|_QUALITY|_SOURCE)?"
    r"(_5M|_30S|_9S|_3S)\.ACE2(\.gz)?$", re.IGNORECASE)


def ace2_params(path: str) -> dict:
    """Tile parameters from the filename (``frmts/raw/
    ace2dataset.cpp:219-300``): SW corner ``<lat><NS><lon><EW>``,
    resolution suffix -> size/pixel table, ``_CONF/_QUALITY/_SOURCE``
    aux layers int16, elevation float32; tiles span 15 deg."""
    m = _ACE2_NAME.search(os.path.basename(path))
    if not m:
        raise ValueError(f"{path}: not an ACE2 tile name "
                         "(want e.g. 30S120W_5M.ACE2)")
    lat = int(m.group(1)) * (1 if m.group(2).upper() == "N" else -1)
    lon = int(m.group(3)) * (1 if m.group(4).upper() == "E" else -1)
    n, pix = _ACE2_RES[m.group(6).upper()]
    aux = m.group(5) is not None
    return {"sw_lat": lat, "sw_lon": lon, "n": n, "pixel": pix,
            "dtype": np.dtype("<i2") if aux else np.dtype("<f4")}


def write_ace2(path: str, grid: np.ndarray) -> None:
    """``grid`` = (N, N) rows NORTH FIRST matching the filename's
    resolution suffix; float32 elevation or int16 aux layers."""
    p = ace2_params(path)
    a = np.asarray(grid)
    if a.shape != (p["n"], p["n"]):
        raise ValueError(f"{path}: grid {a.shape} != tile size "
                         f"{p['n']}")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(np.ascontiguousarray(a.astype(p["dtype"])).tobytes())
    os.replace(tmp, path)


def read_ace2(path: str) -> dict:
    """Plain and ``.ACE2.gz`` tiles (the distribution form the
    reference also opens, ``ace2dataset.cpp:193-194``)."""
    p = ace2_params(path)
    if path.lower().endswith(".gz"):
        import gzip

        with gzip.open(path, "rb") as fh:
            raw = np.frombuffer(fh.read(), dtype=p["dtype"])
    else:
        raw = np.fromfile(path, dtype=p["dtype"])
    if raw.size != p["n"] * p["n"]:
        raise ValueError(f"{path}: expected {p['n']}^2 samples, "
                         f"got {raw.size}")
    grid = np.ascontiguousarray(
        raw.reshape(p["n"], p["n"]).astype(
            p["dtype"].newbyteorder("=")))
    return {"grid": grid.astype(np.float64), "raw": grid, **{
        k: p[k] for k in ("sw_lat", "sw_lon", "n", "pixel")}}
