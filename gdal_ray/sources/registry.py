"""Driver registry: format sniffing + dispatch — the `GDALOpenEx` /
`GDALIdentifyDriver` front door (`gcore/gdaldataset.cpp`,
`gcore/gdaldrivermanager.cpp`).  The engine's per-format modules stay
the real drivers; this module answers "what is this file?" from magic
bytes (extension only where the format has none) and routes to the
right reader, so a user can open anything the engine writes without
knowing the module map.

``identify(path)`` -> driver name; ``open_raster(path)`` -> a dict
with ``driver`` plus the driver's natural payload (``img`` for
single-raster formats, ``datasets``/``segments``/``messages`` for
containers); ``open_vector(path)`` -> a Ray Dataset of WKB-convention
feature rows.  Unknown content raises a loud error listing the
registered drivers.
"""

from __future__ import annotations

import os
import struct

RASTER_DRIVERS = (
    "gtiff png jpeg webp gif bmp pnm hdf5 netcdf grib2 nitf dted "
    "aaigrid envi xyz zarr zarr3 ntv2 gtx mbtiles "
    "srtmhgt gsag gsbg ehdr saga ers zmap rst usgsdem gxf pds lan terragen isis2 hf2 kro leveller bsb byn gs7bg doq2 ace2"
).split()
VECTOR_DRIVERS = (
    "shapefile geojson gpkg flatgeobuf kml gpx csvwkt geoparquet "
    "mif gml dxf"
).split()


def _sniff_sqlite(path: str) -> str | None:
    import sqlite3

    try:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        names = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        con.close()
    except Exception:
        return None
    if "gpkg_contents" in names:
        return "gpkg"
    if {"tiles", "metadata"} & names:
        return "mbtiles"
    return None


def identify(path: str) -> str:
    """Driver name for a file or directory (magic bytes first, the
    extension only where the format has none)."""
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "zarr.json")):
            return "zarr3"
        if os.path.exists(os.path.join(path, ".zarray")):
            return "zarr"
        import glob

        pq = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if pq:
            import pyarrow.parquet as _pq

            md = _pq.read_schema(pq[0]).metadata or {}
            if b"geo" in md:
                return "geoparquet"
        raise ValueError(f"{path}: unrecognized directory layout")
    with open(path, "rb") as fh:
        head = fh.read(512)
    if head[:4] in (b"II*\x00", b"MM\x00*", b"II+\x00"):
        return "gtiff"
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if head[:2] == b"\xff\xd8":
        return "jpeg"
    if head[:4] == b"RIFF" and head[8:12] == b"WEBP":
        return "webp"
    if head[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if head[:2] == b"BM":
        return "bmp"
    if head[:2] in (b"P2", b"P3", b"P5", b"P6") and head[2:3] in (
            b"\n", b" ", b"\t", b"\r"):
        return "pnm"
    if head[:8] == b"\x89HDF\r\n\x1a\n":
        return "hdf5"
    if head[:3] == b"CDF":
        return "netcdf"
    if head[:4] == b"GRIB":
        return "grib2"
    if head[:9] == b"NITF02.10":
        return "nitf"
    if head[:8] == b"NUM_OREC":
        return "ntv2"
    if head[:4] == b"UHL1":
        return "dted"
    if head[:6] in (b"HEAD74", b"HEADER"):
        return "lan"
    if head[:16] == b"TERRAGENTERRAIN ":
        return "terragen"
    if head[:4] == b"HF2\x00":
        return "hf2"
    if head[:4] == b"KRO\x01":
        return "kro"
    if head[:4] == b"trrn":
        return "leveller"
    if head[:16] == b"SQLite format 3\x00":
        kind = _sniff_sqlite(path)
        if kind:
            return kind
        raise ValueError(f"{path}: SQLite file is neither GPKG nor "
                         "MBTiles")
    if len(head) >= 4 and head[:4] == struct.pack(">i", 9994):
        return "shapefile"
    if head[:3] == b"fgb" or head[:8].startswith(b"fgb"):
        return "flatgeobuf"
    low = head.lstrip()[:64].lower()
    if low.startswith(b"{"):
        return "geojson"
    if low.startswith(b"<?xml") or low.startswith(b"<kml") \
            or low.startswith(b"<gpx"):
        body = head.lower()
        if b"<gpx" in body:
            return "gpx"
        if b"<kml" in body:
            return "kml"
        if b"featurecollection" in body or b"featuremember" in body \
                or b"opengis.net/gml" in body:
            return "gml"
        raise ValueError(f"{path}: XML is neither KML, GPX nor GML")
    if low.startswith(b"ncols"):
        return "aaigrid"
    if low.startswith(b"version") and os.path.exists(
            os.path.splitext(path)[0] + ".mid"):
        return "mif"
    if low.startswith(b"datasetheader begin"):
        return "ers"
    if low.startswith(b"pds_version_id"):
        return "pds"
    if low.startswith(b"begin_usgs_doq_header"):
        return "doq2"
    if low.startswith(b"ccsd3zf") or b"sfdu_label" in low:
        return "isis2"
    if low.startswith(b"ver/") or low.startswith(b"bsb/") or (
            low.startswith(b"!") and b"bsb/" in head.lower()):
        return "bsb"
    if low.startswith(b"#title") or low.startswith(b"#points") \
            or low.startswith(b"#grid"):
        return "gxf"
    if low.startswith(b"!") or low.startswith(b"@"):
        # ZMap: '!' comments then '@<name>, GRID, n'
        body = head.replace(b"\r", b"").split(b"\n")
        for bl in body:
            bs = bl.strip()
            if not bs or bs.startswith(b"!"):
                continue
            if bs.startswith(b"@") and b"grid" in bs.lower():
                return "zmap"
            break
    # ASCII DXF: the first group-code pair is "0"/"SECTION"
    if low[:1] == b"0" and b"section" in low.replace(b"\r", b""):
        return "dxf"
    if head[:4] == b"DSAA":
        return "gsag"
    if head[:4] == b"DSBB":
        return "gsbg"
    if head[:4] == b"DSRB":
        return "gs7bg"
    ext = os.path.splitext(path)[1].lower()
    if ext == ".dem":
        return "usgsdem"
    if ext == ".ace2" or path.lower().endswith(".ace2.gz"):
        from .terrain_rasters import ace2_params

        ace2_params(path)         # loud if the name carries no tile
        return "ace2"
    if ext == ".hgt":
        from .terrain_rasters import hgt_corner

        hgt_corner(path)          # loud if the name carries no corner
        return "srtmhgt"
    if ext == ".sdat" and os.path.exists(
            os.path.splitext(path)[0] + ".sgrd"):
        return "saga"
    if ext == ".rst" and os.path.exists(
            os.path.splitext(path)[0] + ".rdc"):
        return "rst"
    if ext == ".gtx":
        return "gtx"
    if ext == ".byn":
        return "byn"
    if ext == ".mif":
        return "mif"
    if ext == ".dxf":
        return "dxf"
    if ext == ".gml":
        return "gml"
    if ext == ".csv":
        return "csvwkt"
    if ext == ".xyz":
        return "xyz"
    if ext in (".bil", ".bsq", ".bip", ".envi", ".img") \
            or os.path.exists(path + ".hdr") \
            or os.path.exists(os.path.splitext(path)[0] + ".hdr"):
        # ENVI headers start with the literal "ENVI"; EHdr sidecars
        # carry NROWS/NCOLS key-value lines (ehdrdataset.cpp:1073).
        for hp in (path + ".hdr", os.path.splitext(path)[0] + ".hdr"):
            if os.path.exists(hp):
                with open(hp) as fh:
                    txt = fh.read(512)
                if txt.lstrip().upper().startswith("ENVI"):
                    return "envi"
                if "NROWS" in txt.upper():
                    return "ehdr"
        return "envi"
    raise ValueError(
        f"{path}: no driver recognizes this content (registered: "
        f"{RASTER_DRIVERS + VECTOR_DRIVERS})")


def open_raster(path: str) -> dict:
    """Open a raster file through its sniffed driver.  Returns a dict
    with ``driver`` plus the driver's natural payload: ``img``
    (numpy array) for single-raster formats, ``datasets`` metadata
    for HDF5/netCDF/Zarr containers, ``segments`` for NITF,
    ``messages`` for GRIB2, ``subgrids`` for NTv2, ``grid`` for
    GTX."""
    drv = identify(path)
    if drv == "gtiff":
        from .gtiff import read_cog

        out = read_cog(path)
        out["driver"] = drv
        return out
    if drv in ("png", "jpeg", "webp"):
        data = open(path, "rb").read()
        if drv == "png":
            from ..functions.codecs import decode_png

            img = decode_png(data)
        elif drv == "jpeg":
            from ..functions.jpegc import decode_jpeg

            img = decode_jpeg(data)
        else:
            from ..functions.webp import decode_webp

            img = decode_webp(data)[:, :, :3]
        return {"driver": drv, "img": img}
    if drv == "gif":
        from .gif import read_gif

        return {"driver": drv, "img": read_gif(path)}
    if drv == "bmp":
        from .simple_rasters import read_bmp

        return {"driver": drv, "img": read_bmp(path)}
    if drv == "pnm":
        from .simple_rasters import read_pnm

        return {"driver": drv, "img": read_pnm(path)}
    if drv == "aaigrid":
        from .simple_rasters import read_aaigrid

        return {"driver": drv, **read_aaigrid(path)}
    if drv == "envi":
        from .simple_rasters import read_envi

        return {"driver": drv, **read_envi(path)}
    if drv == "ehdr":
        from .terrain_rasters import read_ehdr

        return {"driver": drv, **read_ehdr(path)}
    if drv == "srtmhgt":
        from .terrain_rasters import read_srtmhgt

        return {"driver": drv, **read_srtmhgt(path)}
    if drv == "gsag":
        from .terrain_rasters import read_gsag

        return {"driver": drv, **read_gsag(path)}
    if drv == "gsbg":
        from .terrain_rasters import read_gsbg

        return {"driver": drv, **read_gsbg(path)}
    if drv == "saga":
        from .terrain_rasters import read_saga

        return {"driver": drv, **read_saga(path)}
    if drv == "ers":
        from .terrain_rasters import read_ers

        return {"driver": drv, **read_ers(path)}
    if drv == "zmap":
        from .terrain_rasters import read_zmap

        return {"driver": drv, **read_zmap(path)}
    if drv == "rst":
        from .terrain_rasters import read_rst

        return {"driver": drv, **read_rst(path)}
    if drv == "usgsdem":
        from .terrain_rasters import read_usgsdem

        return {"driver": drv, **read_usgsdem(path)}
    if drv == "gxf":
        from .terrain_rasters import read_gxf

        return {"driver": drv, **read_gxf(path)}
    if drv == "pds":
        from .pds import read_pds

        return {"driver": drv, **read_pds(path)}
    if drv == "lan":
        from .terrain_rasters import read_lan

        return {"driver": drv, **read_lan(path)}
    if drv == "terragen":
        from .terrain_rasters import read_terragen

        return {"driver": drv, **read_terragen(path)}
    if drv == "isis2":
        from .pds import read_isis2

        return {"driver": drv, **read_isis2(path)}
    if drv == "hf2":
        from .terrain_rasters import read_hf2

        return {"driver": drv, **read_hf2(path)}
    if drv == "kro":
        from .terrain_rasters import read_kro

        return {"driver": drv, **read_kro(path)}
    if drv == "leveller":
        from .terrain_rasters import read_leveller

        return {"driver": drv, **read_leveller(path)}
    if drv == "bsb":
        from .bsb import read_bsb

        out = read_bsb(path)
        return {"driver": drv, "img": out.pop("rgb"), **out}
    if drv == "byn":
        from .ntv2 import read_byn

        return {"driver": drv, **read_byn(path)}
    if drv == "gs7bg":
        from .terrain_rasters import read_gs7bg

        return {"driver": drv, **read_gs7bg(path)}
    if drv == "doq2":
        from .doq2 import read_doq2

        return {"driver": drv, **read_doq2(path)}
    if drv == "ace2":
        from .terrain_rasters import read_ace2

        return {"driver": drv, **read_ace2(path)}
    if drv == "xyz":
        from .dted import read_xyz

        return {"driver": drv, **read_xyz(path)}
    if drv == "dted":
        from .dted import read_dted

        return {"driver": drv, **read_dted(path)}
    if drv == "hdf5":
        from .hdf5 import hdf5_info

        return {"driver": drv, **hdf5_info(path)}
    if drv == "netcdf":
        from .netcdf import netcdf_info

        return {"driver": drv, **netcdf_info(path)}
    if drv == "zarr":
        from .zarr import zarr_info

        return {"driver": drv, **zarr_info(path)}
    if drv == "zarr3":
        from .zarr import zarr3_info

        return {"driver": drv, "meta": zarr3_info(path)}
    if drv == "grib2":
        from .grib2 import read_grib2

        return {"driver": drv, "messages": read_grib2(path)}
    if drv == "nitf":
        from .nitf import read_nitf

        return {"driver": drv, "segments": read_nitf(path)}
    if drv == "ntv2":
        from .ntv2 import read_ntv2

        return {"driver": drv, **read_ntv2(path)}
    if drv == "gtx":
        from .ntv2 import read_gtx

        return {"driver": drv, "grid": read_gtx(path)}
    if drv == "mbtiles":
        import sqlite3

        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            meta = dict(con.execute(
                "SELECT name, value FROM metadata"))
            zr = con.execute(
                "SELECT MIN(zoom_level), MAX(zoom_level), COUNT(*) "
                "FROM tiles").fetchone()
        finally:
            con.close()
        return {"driver": drv, "metadata": meta,
                "min_zoom": zr[0], "max_zoom": zr[1],
                "n_tiles": zr[2]}
    raise ValueError(f"{path}: {drv} is a vector driver — use "
                     "open_vector")


def open_vector(path: str):
    """Open a vector file through its sniffed driver -> a Ray Dataset
    of WKB-convention feature rows (fid, geometry/wkb, attrs)."""
    drv = identify(path)
    if drv == "shapefile":
        from .shapefile import read_shapefile

        return read_shapefile(path)
    if drv == "geojson":
        from .geojson import read_geojson

        return read_geojson(path)
    if drv == "gpkg":
        from .gpkg import read_gpkg

        return read_gpkg(path)
    if drv == "flatgeobuf":
        from .flatgeobuf import read_flatgeobuf

        return read_flatgeobuf(path)
    if drv in ("kml", "gpx", "csvwkt"):
        import ray.data as rd

        from . import textvec

        if drv == "gpx":
            return rd.from_arrow(textvec.read_gpx(path)["waypoints"])
        fn = (textvec.read_kml if drv == "kml"
              else textvec.read_csv_features)
        return rd.from_arrow(fn(path))
    if drv == "geoparquet":
        from .geoparquet import read_geoparquet

        return read_geoparquet(path)[0]
    if drv in ("mif", "gml", "dxf"):
        import ray.data as rd

        if drv == "mif":
            from .mif import read_mif as fn
        elif drv == "gml":
            from .gml import read_gml as fn
        else:
            from .dxf import read_dxf as fn
        return rd.from_arrow(fn(path))
    raise ValueError(f"{path}: {drv} is a raster driver — use "
                     "open_raster")


def describe(path: str) -> str:
    """Human-readable dataset report — the ``gdalinfo`` / ``ogrinfo``
    front-door analog (``apps/gdalinfo_lib.cpp`` /
    ``apps/ogrinfo_lib.cpp``): driver, dimensions, bands, dtype,
    georeferencing and per-driver extras, from the same sniff +
    dispatch as open_raster/open_vector."""
    drv = identify(path)
    lines = [f"Driver: {drv}", f"File: {path}"]
    if drv in VECTOR_DRIVERS:
        ds = open_vector(path)
        n = ds.count()
        names = ds.schema().names
        lines.append(f"Feature Count: {n}")
        lines.append(f"Fields: {', '.join(c for c in names)}")
        if "geometry" in names or "wkb" in names:
            gcol = "geometry" if "geometry" in names else "wkb"
            from ..functions.geom import envelope_wkb, parse_wkb

            kinds: dict[str, int] = {}
            minx = miny = float("inf")
            maxx = maxy = float("-inf")
            for row in ds.take(1000):
                b = row.get(gcol)
                if not b:
                    continue
                k = parse_wkb(b)[0]
                kinds[k] = kinds.get(k, 0) + 1
                x0, y0, x1, y1 = envelope_wkb(b)
                minx, miny = min(minx, x0), min(miny, y0)
                maxx, maxy = max(maxx, x1), max(maxy, y1)
            if kinds:
                lines.append("Geometry: " + ", ".join(
                    f"{k} ({v})" for k, v in sorted(kinds.items())))
                lines.append(f"Extent: ({minx:.6g}, {miny:.6g}) - "
                             f"({maxx:.6g}, {maxy:.6g})"
                             + (" [first 1000 features]"
                                if n > 1000 else ""))
        return "\n".join(lines)

    out = open_raster(path)
    import numpy as np

    arr = out.get("img")
    if arr is None:
        for k in ("grid", "grid_m", "raw"):
            if k in out and isinstance(out[k], np.ndarray):
                arr = out[k]
                break
    if arr is not None:
        a = np.asarray(arr)
        if a.ndim == 2:
            lines.append(f"Size: {a.shape[1]} x {a.shape[0]} x 1")
        elif a.ndim == 3 and a.shape[0] <= 16:
            lines.append(
                f"Size: {a.shape[2]} x {a.shape[1]} x {a.shape[0]}")
        else:
            lines.append(f"Size: {a.shape[1]} x {a.shape[0]} x "
                         f"{a.shape[2]}")
        lines.append(f"Type: {a.dtype}")
        finite = a[np.isfinite(a)] if np.issubdtype(
            a.dtype, np.floating) else a
        if finite.size:
            lines.append(f"Min/Max: {finite.min():.6g} / "
                         f"{finite.max():.6g}")
    for key in ("datasets", "segments", "messages", "subgrids",
                "meta"):
        if key in out:
            v = out[key]
            lines.append(f"{key.capitalize()}: "
                         f"{len(v) if hasattr(v, '__len__') else v}")
    for key in ("ul_map", "registration", "cellsize", "dims",
                "xmin", "ymax", "lat", "lon", "sw_lon", "sw_lat",
                "xorigin", "yorigin", "nodata", "label"):
        if key in out and out[key] is not None and key != "label":
            lines.append(f"{key}: {out[key]}")
    if "label" in out:
        lines.append(f"Label keys: {len(out['label'])}")
    return "\n".join(lines)
