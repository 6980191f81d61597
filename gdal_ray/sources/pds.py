"""NASA PDS3 labelled rasters — the reference's ``frmts/pds``
driver surface (``pdsdataset.cpp``), from the published ODL / PDS3
standard, not the reference's code.

Covered (the attached-label core a planetary user relies on):

- ODL labels: ``KEY = VALUE`` lines, ``OBJECT = IMAGE`` /
  ``END_OBJECT`` nesting, quoted strings, ``END`` terminator;
- ``RECORD_BYTES`` fixed records with the ``^IMAGE = <n>`` record
  pointer (1-based) or ``^IMAGE = <n> <BYTES>`` byte form
  (``pdsdataset.cpp:794-800``);
- IMAGE object keys ``LINES`` / ``LINE_SAMPLES`` / ``BANDS`` /
  ``SAMPLE_BITS`` / ``SAMPLE_TYPE`` with the reference's byte-order
  table (MSB default; LSB_/PC_ prefixes little-endian,
  ``pdsdataset.cpp:998-1029``) and ``BAND_STORAGE_TYPE =
  BAND_SEQUENTIAL``;
- detached labels, VAX reals and prefix/suffix bytes stay loud
  errors naming the limitation.
"""

from __future__ import annotations

import os

import numpy as np

_SAMPLE_TYPES = {
    # (sample_type, bits) -> numpy dtype
    ("MSB_INTEGER", 16): ">i2", ("MSB_INTEGER", 32): ">i4",
    ("MSB_UNSIGNED_INTEGER", 8): "u1",
    ("MSB_UNSIGNED_INTEGER", 16): ">u2",
    ("LSB_INTEGER", 16): "<i2", ("LSB_INTEGER", 32): "<i4",
    ("LSB_UNSIGNED_INTEGER", 8): "u1",
    ("LSB_UNSIGNED_INTEGER", 16): "<u2",
    ("UNSIGNED_INTEGER", 8): "u1",
    ("IEEE_REAL", 32): ">f4", ("IEEE_REAL", 64): ">f8",
    ("PC_REAL", 32): "<f4", ("PC_REAL", 64): "<f8",
}


def _sample_type_of(dtype: np.dtype) -> tuple[str, int]:
    dt = np.dtype(dtype)
    bits = dt.itemsize * 8
    if dt.kind == "f":
        return ("IEEE_REAL" if dt.byteorder != "<" else "PC_REAL",
                bits)
    if dt.kind == "u":
        return ("MSB_UNSIGNED_INTEGER" if bits > 8
                else "UNSIGNED_INTEGER", bits)
    if dt.kind == "i":
        return ("MSB_INTEGER", bits)
    raise ValueError(f"PDS3: unsupported dtype {dt}")


def write_pds(path: str, img: np.ndarray, *,
              record_bytes: int = 512,
              target: str = "UNKNOWN") -> None:
    """Attached-label PDS3: ODL label padded to whole
    ``RECORD_BYTES`` records, ``^IMAGE`` record pointer, then
    BAND_SEQUENTIAL samples.  ``img`` is (rows, cols) or (bands,
    rows, cols); integer types write MSB (the PDS default), floats
    IEEE_REAL big-endian."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[None]
    if a.ndim != 3:
        raise ValueError("PDS3 wants (bands, rows, cols)")
    if a.dtype.kind == "i":
        body = a.astype(a.dtype.newbyteorder(">"))
    elif a.dtype.kind == "u" and a.dtype.itemsize > 1:
        body = a.astype(a.dtype.newbyteorder(">"))
    elif a.dtype.kind == "f":
        body = a.astype(a.dtype.newbyteorder(">"))
    else:
        body = a
    st, bits = _sample_type_of(body.dtype)
    nb, ny, nx = a.shape
    lines = [
        "PDS_VERSION_ID = PDS3",
        f"RECORD_TYPE = FIXED_LENGTH",
        f"RECORD_BYTES = {record_bytes}",
        f'TARGET_NAME = "{target}"',
        "^IMAGE = @IMGREC@",
        "OBJECT = IMAGE",
        f"  LINES = {ny}",
        f"  LINE_SAMPLES = {nx}",
        f"  BANDS = {nb}",
        "  BAND_STORAGE_TYPE = BAND_SEQUENTIAL",
        f"  SAMPLE_BITS = {bits}",
        f"  SAMPLE_TYPE = {st}",
        "END_OBJECT = IMAGE",
        "END",
    ]
    # label must fit whole records; ^IMAGE is 1-based record index
    label = "\r\n".join(lines) + "\r\n"
    nrec = -(-len(label) // record_bytes)
    while True:
        final = label.replace("@IMGREC@", str(nrec + 1))
        need = -(-len(final) // record_bytes)
        if need <= nrec:
            break
        nrec = need
    final = final.ljust(nrec * record_bytes)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(final.encode("ascii"))
        fh.write(np.ascontiguousarray(body).tobytes())
    os.replace(tmp, path)


def _parse_odl(text: str) -> dict[str, str]:
    """Flatten ODL to dotted keys ('IMAGE.LINES') like the
    reference's keyword handler."""
    kv: dict[str, str] = {}
    stack: list[str] = []
    for raw in text.splitlines():
        ln = raw.strip()
        if not ln or ln.startswith("/*"):
            continue
        if ln == "END":
            break
        if "=" not in ln:
            continue
        k, v = (s.strip() for s in ln.split("=", 1))
        if k == "OBJECT":
            stack.append(v)
            continue
        if k == "END_OBJECT":
            if stack:
                stack.pop()
            continue
        kv[".".join(stack + [k])] = v.strip().strip('"')
    return kv


def read_pds(path: str) -> dict:
    """-> dict(img (bands, rows, cols) native-endian, label dict).
    Attached labels only (detached '^IMAGE = "file"' errors loudly
    with the file name)."""
    with open(path, "rb") as fh:
        data = fh.read()
    head = data[:32768].decode("ascii", "replace")
    if "PDS_VERSION_ID" not in head.split("=")[0]:
        if not head.lstrip().startswith("PDS_VERSION_ID"):
            raise ValueError(f"{path}: no PDS_VERSION_ID label")
    kv = _parse_odl(head)
    ptr = kv.get("^IMAGE")
    if ptr is None:
        raise ValueError(f"{path}: no ^IMAGE pointer")
    if '"' in ptr or ptr.strip().startswith("("):
        raise ValueError(f"{path}: detached-label ^IMAGE {ptr!r} "
                         "unsupported (attached labels only)")
    if "<BYTES>" in ptr:
        offset = int(ptr.replace("<BYTES>", "").strip()) - 1
    else:
        record_bytes = int(kv.get("RECORD_BYTES", "0"))
        if record_bytes <= 0:
            raise ValueError(f"{path}: record pointer without "
                             "RECORD_BYTES")
        offset = (int(ptr) - 1) * record_bytes
    ny = int(kv["IMAGE.LINES"])
    nx = int(kv["IMAGE.LINE_SAMPLES"])
    nb = int(kv.get("IMAGE.BANDS", "1"))
    storage = kv.get("IMAGE.BAND_STORAGE_TYPE", "BAND_SEQUENTIAL")
    if nb > 1 and storage != "BAND_SEQUENTIAL":
        raise ValueError(f"{path}: BAND_STORAGE_TYPE {storage} "
                         "unsupported (BAND_SEQUENTIAL only)")
    bits = int(kv.get("IMAGE.SAMPLE_BITS", "8"))
    st = kv.get("IMAGE.SAMPLE_TYPE", "MSB_UNSIGNED_INTEGER")
    dts = _SAMPLE_TYPES.get((st, bits))
    if dts is None:
        raise ValueError(
            f"{path}: SAMPLE_TYPE {st}/{bits} unsupported "
            f"(supported: {sorted(set(k for k, _ in _SAMPLE_TYPES))})")
    dt = np.dtype(dts)
    count = nb * ny * nx
    arr = np.frombuffer(data, dtype=dt, count=count, offset=offset)
    img = np.ascontiguousarray(
        arr.reshape(nb, ny, nx).astype(dt.newbyteorder("=")))
    return {"img": img, "label": kv}


# ------------------------------------------------------------ ISIS2

_ISIS2_TYPES = {
    # (core_item_type upper, bytes) -> numpy dtype
    ("SUN_INTEGER", 2): ">i2", ("SUN_INTEGER", 4): ">i4",
    ("SUN_UNSIGNED_INTEGER", 1): "u1",
    ("SUN_UNSIGNED_INTEGER", 2): ">u2",
    ("MSB_INTEGER", 2): ">i2",
    ("MSB_UNSIGNED_INTEGER", 1): "u1",
    ("UNSIGNED_INTEGER", 1): "u1",
    ("PC_INTEGER", 2): "<i2", ("PC_INTEGER", 4): "<i4",
    ("PC_UNSIGNED_INTEGER", 1): "u1",
    ("PC_UNSIGNED_INTEGER", 2): "<u2",
    ("IEEE_REAL", 4): ">f4", ("IEEE_REAL", 8): ">f8",
    ("SUN_REAL", 4): ">f4", ("SUN_REAL", 8): ">f8",
    ("PC_REAL", 4): "<f4", ("PC_REAL", 8): "<f8",
}


def write_isis2(path: str, img: np.ndarray, *,
                record_bytes: int = 512,
                core_base: float = 0.0,
                core_multiplier: float = 1.0) -> None:
    """ISIS2 cube (the reference's ``frmts/pds/isis2dataset.cpp``):
    ODL label with a QUBE object — AXIS_NAME = (SAMPLE,LINE,BAND),
    CORE_ITEMS = (ns, nl, nb), CORE_ITEM_BYTES / CORE_ITEM_TYPE,
    SUFFIX_ITEMS = (0,0,0) (no side planes), CORE_BASE /
    CORE_MULTIPLIER scaling — and the 1-based ``^QUBE`` record
    pointer; BSQ core samples follow.  Integer cores write MSB
    (SUN_*), float cores IEEE big-endian."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[None]
    if a.ndim != 3:
        raise ValueError("ISIS2 wants (bands, rows, cols)")
    if a.dtype.kind == "f":
        body = a.astype(a.dtype.newbyteorder(">"))
        ct = "SUN_REAL"
    elif a.dtype.kind == "u" and a.dtype.itemsize == 1:
        body = a
        ct = "SUN_UNSIGNED_INTEGER"
    elif a.dtype.kind in "iu":
        body = a.astype(a.dtype.newbyteorder(">"))
        ct = ("SUN_UNSIGNED_INTEGER" if a.dtype.kind == "u"
              else "SUN_INTEGER")
    else:
        raise ValueError(f"ISIS2: unsupported dtype {a.dtype}")
    nb, ny, nx = a.shape
    lines = [
        "CCSD3ZF0000100000001NJPL3IF0PDS200000001 = SFDU_LABEL",
        f"RECORD_TYPE = FIXED_LENGTH",
        f"RECORD_BYTES = {record_bytes}",
        "^QUBE = @REC@",
        "OBJECT = QUBE",
        "  AXES = 3",
        "  AXIS_NAME = (SAMPLE,LINE,BAND)",
        f"  CORE_ITEMS = ({nx},{ny},{nb})",
        f"  CORE_ITEM_BYTES = {a.dtype.itemsize}",
        f"  CORE_ITEM_TYPE = {ct}",
        f"  CORE_BASE = {core_base!r}",
        f"  CORE_MULTIPLIER = {core_multiplier!r}",
        "  SUFFIX_ITEMS = (0,0,0)",
        "END_OBJECT = QUBE",
        "END",
    ]
    label = "\r\n".join(lines) + "\r\n"
    nrec = -(-len(label) // record_bytes)
    while True:
        final = label.replace("@REC@", str(nrec + 1))
        need = -(-len(final) // record_bytes)
        if need <= nrec:
            break
        nrec = need
    final = final.ljust(nrec * record_bytes)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(final.encode("ascii"))
        fh.write(np.ascontiguousarray(body).tobytes())
    os.replace(tmp, path)


def read_isis2(path: str) -> dict:
    """-> dict(img (bands, rows, cols) native-endian with
    CORE_BASE/CORE_MULTIPLIER applied when non-identity, raw, label).
    Detached cubes and SUFFIX_ITEMS side planes error loudly
    (``isis2dataset.cpp:192-253``)."""
    with open(path, "rb") as fh:
        data = fh.read()
    head = data[:32768].decode("ascii", "replace")
    kv = _parse_odl(head)
    ptr = kv.get("^QUBE")
    if ptr is None:
        raise ValueError(f"{path}: no ^QUBE pointer")
    if '"' in ptr or ptr.strip().startswith("("):
        raise ValueError(f"{path}: detached ^QUBE {ptr!r} unsupported")
    record_bytes = int(kv.get("RECORD_BYTES", "0"))
    if "<BYTES>" in ptr:
        offset = int(ptr.replace("<BYTES>", "").strip()) - 1
    else:
        if record_bytes <= 0:
            raise ValueError(f"{path}: record pointer without "
                             "RECORD_BYTES")
        offset = (int(ptr) - 1) * record_bytes
    suffix = kv.get("QUBE.SUFFIX_ITEMS", "(0,0,0)")
    if suffix.replace(" ", "") != "(0,0,0)":
        raise ValueError(f"{path}: SUFFIX_ITEMS {suffix} unsupported "
                         "(no side planes)")
    axes = kv.get("QUBE.AXIS_NAME", "(SAMPLE,LINE,BAND)")
    if axes.replace(" ", "").upper() != "(SAMPLE,LINE,BAND)":
        raise ValueError(f"{path}: AXIS_NAME {axes} unsupported "
                         "(BSQ only)")
    items = kv["QUBE.CORE_ITEMS"].strip("() ").split(",")
    nx, ny, nb = (int(v) for v in items)
    ib = int(kv.get("QUBE.CORE_ITEM_BYTES", "1"))
    ct = kv.get("QUBE.CORE_ITEM_TYPE", "SUN_UNSIGNED_INTEGER").upper()
    dts = _ISIS2_TYPES.get((ct, ib))
    if dts is None:
        raise ValueError(f"{path}: CORE_ITEM_TYPE {ct}/{ib} "
                         "unsupported")
    dt = np.dtype(dts)
    raw = np.frombuffer(data, dtype=dt, count=nb * ny * nx,
                        offset=offset)
    raw = np.ascontiguousarray(
        raw.reshape(nb, ny, nx).astype(dt.newbyteorder("=")))
    base = float(kv.get("QUBE.CORE_BASE", "0.0"))
    mult = float(kv.get("QUBE.CORE_MULTIPLIER", "1.0"))
    img = raw if (base == 0.0 and mult == 1.0) else \
        base + mult * raw.astype(np.float64)
    return {"img": img, "raw": raw, "label": kv}
