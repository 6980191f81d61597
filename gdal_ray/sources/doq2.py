"""USGS DOQ (new-style / DOQ2) quadrangle rasters — the reference's
``frmts/raw/doq2dataset.cpp`` surface, from the published USGS DOQ
standard keyword header.

Layout: an ASCII keyword header opened by ``BEGIN_USGS_DOQ_HEADER``
and closed by ``END_USGS_DOQ_HEADER`` — ``SAMPLES_AND_LINES``,
``BYTE_COUNT`` (the data offset), ``XY_ORIGIN``,
``HORIZONTAL_RESOLUTION``, ``BAND_ORGANIZATION`` (BIP),
``BAND_CONTENT`` one line per band, ``BITS_PER_PIXEL`` 8
(``doq2dataset.cpp:156-275``) — then pixel-interleaved uint8 samples
at the ``BYTE_COUNT`` offset."""

from __future__ import annotations

import os

import numpy as np


def write_doq2(path: str, img: np.ndarray, *,
               xy_origin: tuple[float, float] = (0.0, 0.0),
               resolution: float = 1.0,
               quad_name: str = "QUAD") -> None:
    """``img`` = (rows, cols) grayscale or (rows, cols, 3) RGB
    uint8."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.dtype != np.uint8:
        raise ValueError("DOQ2 wants (rows, cols[, bands]) uint8")
    ny, nx, nb = a.shape
    contents = (["BLACK&WHITE"] if nb == 1
                else ["RED", "GREEN", "BLUE"] if nb == 3
                else None)
    if contents is None:
        raise ValueError("DOQ2 supports 1 or 3 bands")
    lines = [
        "BEGIN_USGS_DOQ_HEADER",
        f'QUADRANGLE_NAME "{quad_name}"',
        f"SAMPLES_AND_LINES {nx} {ny}",
        "BYTE_COUNT @BC@",
        f"XY_ORIGIN {xy_origin[0]!r} {xy_origin[1]!r}",
        f"HORIZONTAL_RESOLUTION {resolution!r}",
        "BAND_ORGANIZATION BIP",
        *[f"BAND_CONTENT {c}" for c in contents],
        "BITS_PER_PIXEL 8",
        "END_USGS_DOQ_HEADER",
    ]
    hdr = "\n".join(lines) + "\n"
    bc = len(hdr.replace("@BC@", "0000000000"))
    hdr = hdr.replace("@BC@", f"{bc:010d}")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(hdr.encode("ascii"))
        fh.write(np.ascontiguousarray(a).tobytes())
    os.replace(tmp, path)


def read_doq2(path: str) -> dict:
    with open(path, "rb") as fh:
        head = fh.read(32768).decode("ascii", "replace")
        if "BEGIN_USGS_DOQ_HEADER" not in head.split("\n", 1)[0]:
            raise ValueError(f"{path}: not a DOQ2 header")
        nx = ny = None
        skip = 0
        xy = (0.0, 0.0)
        res = 1.0
        nb = 0
        for ln in head.splitlines():
            toks = ln.replace('"', " ").split()
            if not toks:
                continue
            k = toks[0]
            if k == "END_USGS_DOQ_HEADER":
                break
            if k == "SAMPLES_AND_LINES":
                nx, ny = int(toks[1]), int(toks[2])
            elif k == "BYTE_COUNT":
                skip = int(toks[1])
            elif k == "XY_ORIGIN":
                xy = (float(toks[1]), float(toks[2]))
            elif k == "HORIZONTAL_RESOLUTION":
                res = float(toks[1])
            elif k == "BAND_CONTENT":
                nb += 1
            elif k == "BAND_ORGANIZATION":
                if toks[1].upper() != "BIP":
                    raise ValueError(f"{path}: BAND_ORGANIZATION "
                                     f"{toks[1]} unsupported (BIP)")
            elif k == "BITS_PER_PIXEL":
                if int(toks[1]) != 8:
                    raise ValueError(f"{path}: {toks[1]} bits/pixel "
                                     "unsupported (8)")
        if nx is None or skip == 0 or nb == 0:
            raise ValueError(f"{path}: incomplete DOQ2 header")
        fh.seek(skip)
        raw = np.frombuffer(fh.read(ny * nx * nb), np.uint8)
    if raw.size != ny * nx * nb:
        raise ValueError(f"{path}: truncated DOQ2 payload")
    img = raw.reshape(ny, nx, nb)
    return {"img": img[:, :, 0] if nb == 1 else img.copy(),
            "xy_origin": xy, "resolution": res}
