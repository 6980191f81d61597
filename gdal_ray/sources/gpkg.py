"""GeoPackage (GPKG) vector source / sink over stdlib sqlite3.

Reference analog: the OGR GeoPackage driver
(ogr/ogrsf_frmts/gpkg/ogrgeopackagedatasource.cpp — pragma
application_id 'GPKG' / user_version, required metadata tables;
ogrgeopackagetablelayer.cpp — feature tables; the GeoPackage Binary
geometry header per OGC 12-128r18 §2.1.3 and
ogr/ogrsf_frmts/gpkg/ogrgeopackageutility.cpp GPkgHeaderFromWKB /
GPkgGeometryToWKB).  Test model: autotest/ogr/ogr_gpkg.py.

The engine's at-rest vector convention is a WKB `geometry` column plus
attribute columns (GeoParquet-shaped), so GPKG — like GeoJSON and
Shapefile — is an interop boundary format.  A GeoPackage is a single
SQLite file and therefore a single-writer artifact by design (the
reference serializes feature writes the same way); the sink streams
Dataset blocks through `iter_batches` into chunked transactions
(bounded memory, no full materialization).  READS parallelize: the
reader splits the layer's rowid span into ranges and each Ray task
opens the file read-only for its slice, so a large layer fans out
across the cluster like any other partitioned source.

GeoPackage Binary blob layout (OGC 12-128r18 §2.1.3):
  magic 'GP' | version 0x00 | flags | srs_id int32 | envelope | WKB
  flags bit0 = header byte order (1 = little-endian), bits 1-3 =
  envelope indicator (0 = none, 1 = [minx,maxx,miny,maxy] doubles),
  bit5 = empty-geometry flag.
"""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pyarrow as pa

from ..functions import geom as G

GPKG_APPLICATION_ID = 0x47504B47  # 'GPKG'
GPKG_USER_VERSION = 10301  # GeoPackage 1.3.1

_WKB_TYPE_NAMES = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON",
    4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION", 8: "CIRCULARSTRING", 9: "COMPOUNDCURVE",
    10: "CURVEPOLYGON",
}

# ------------------------------------------------- GP binary header


def gp_wrap(wkb: bytes, srs_id: int = 4326, envelope: bool = True) -> bytes:
    """Wrap ISO WKB in the GeoPackage Binary header (little-endian
    header, envelope indicator 1 when requested)."""
    if envelope:
        minx, miny, maxx, maxy = G.envelope_wkb(wkb)
        flags = 0b0000_0011  # little-endian + envelope indicator 1
        env = struct.pack("<4d", minx, maxx, miny, maxy)
    else:
        flags = 0b0000_0001
        env = b""
    return b"GP" + struct.pack("<BBi", 0, flags, srs_id) + env + wkb


def gp_unwrap(blob: bytes) -> tuple[bytes, int]:
    """GeoPackage Binary blob -> (ISO WKB, srs_id).  Validates magic,
    version and the envelope-indicator-sized header skip."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage Binary blob (bad magic)")
    version, flags = blob[2], blob[3]
    if version != 0:
        raise ValueError(f"unsupported GeoPackage Binary version {version}")
    bo = "<" if flags & 1 else ">"
    (srs_id,) = struct.unpack_from(f"{bo}i", blob, 4)
    env_ind = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_ind)
    if env_len is None:
        raise ValueError(f"invalid envelope indicator {env_ind}")
    return blob[8 + env_len:], srs_id


# ------------------------------------------------- metadata bootstrap


def _init_gpkg(con: sqlite3.Connection) -> None:
    con.execute(f"PRAGMA application_id = {GPKG_APPLICATION_ID}")
    con.execute(f"PRAGMA user_version = {GPKG_USER_VERSION}")
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
        organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)"""
    )
    # the three rows the spec requires (ogrgeopackagedatasource.cpp)
    con.executemany(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        [
            ("Undefined Cartesian SRS", -1, "NONE", -1, "undefined", None),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
            ("WGS 84 geodetic", 4326, "EPSG", 4326,
             'GEOGCS["WGS 84",DATUM["WGS_1984",'
             'SPHEROID["WGS 84",6378137,298.257223563]],'
             'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
             "longitude/latitude on WGS 84"),
        ],
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_contents (
        table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME NOT NULL DEFAULT
          (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
        min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
        srs_id INTEGER)"""
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
        table_name TEXT NOT NULL, column_name TEXT NOT NULL,
        geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
        z TINYINT NOT NULL, m TINYINT NOT NULL,
        CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
    )


def _ensure_srs(con: sqlite3.Connection, srs_id: int) -> None:
    if srs_id in (-1, 0, 4326):
        return
    if srs_id == 3857:
        con.execute(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            ("WGS 84 / Pseudo-Mercator", 3857, "EPSG", 3857,
             'PROJCS["WGS 84 / Pseudo-Mercator",GEOGCS["WGS 84",'
             'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]]],'
             'PROJECTION["Mercator_1SP"],UNIT["metre",1]]',
             "WebMercator meters"),
        )
        return
    con.execute(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        (f"EPSG:{srs_id}", srs_id, "EPSG", srs_id, "undefined", None),
    )


def _sql_affinity(field: pa.DataType) -> str:
    if pa.types.is_boolean(field):
        return "BOOLEAN"
    if pa.types.is_integer(field):
        return "INTEGER"
    if pa.types.is_floating(field):
        return "DOUBLE"
    if pa.types.is_binary(field) or pa.types.is_large_binary(field):
        return "BLOB"
    return "TEXT"


# ----------------------------------------------------------- writer


class GpkgWriter:
    """Streaming single-file GPKG writer: open once, append table
    blocks per layer, finalize extents on close."""

    def __init__(self, path: str):
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            os.unlink(tmp)
        self._path = path
        self._tmp = tmp
        self._con = sqlite3.connect(tmp)
        _init_gpkg(self._con)
        # layer -> [attr columns, srs_id, geometry type codes seen,
        #           running extent]
        self._layers: dict[str, dict] = {}

    def write_table(self, t: pa.Table, layer: str, srs_id: int = 4326,
                    geometry_col: str = "geometry",
                    fid_col: str | None = None) -> int:
        con = self._con
        attrs = [c for c in t.column_names
                 if c not in (geometry_col, fid_col)]
        if layer not in self._layers:
            _ensure_srs(con, srs_id)
            cols = ", ".join(
                f'"{c}" {_sql_affinity(t.schema.field(c).type)}'
                for c in attrs
            )
            con.execute(
                f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY'
                f"{', ' if cols else ''}{cols}, geom BLOB)"
            )
            self._layers[layer] = {
                "attrs": attrs, "srs_id": srs_id, "types": set(),
                "extent": [np.inf, np.inf, -np.inf, -np.inf],
            }
        st = self._layers[layer]
        if attrs != st["attrs"]:
            raise ValueError(
                f"layer {layer!r}: attribute columns {attrs} != "
                f"first block's {st['attrs']}"
            )
        wkbs = t.column(geometry_col).to_pylist()
        fids = (t.column(fid_col).to_pylist() if fid_col
                else [None] * len(wkbs))
        rows = []
        ext = st["extent"]
        for i, wkb in enumerate(wkbs):
            minx, miny, maxx, maxy = G.envelope_wkb(wkb)
            ext[0] = min(ext[0], minx)
            ext[1] = min(ext[1], miny)
            ext[2] = max(ext[2], maxx)
            ext[3] = max(ext[3], maxy)
            (code,) = struct.unpack_from("<I", wkb, 1)
            st["types"].add(code)
            row = [fids[i]]
            row.extend(t.column(c)[i].as_py() for c in st["attrs"])
            row.append(gp_wrap(wkb, srs_id))
            rows.append(row)
        ph = ", ".join("?" * (len(st["attrs"]) + 2))
        with con:  # one transaction per block
            con.executemany(f'INSERT INTO "{layer}" VALUES ({ph})', rows)
        return len(rows)

    def close(self) -> None:
        con = self._con
        for layer, st in self._layers.items():
            types = st["types"]
            name = (_WKB_TYPE_NAMES[next(iter(types))]
                    if len(types) == 1 else "GEOMETRY")
            ext = st["extent"]
            with con:
                con.execute(
                    "INSERT INTO gpkg_contents (table_name, data_type, "
                    "identifier, min_x, min_y, max_x, max_y, srs_id) "
                    "VALUES (?, 'features', ?, ?, ?, ?, ?, ?)",
                    (layer, layer, ext[0], ext[1], ext[2], ext[3],
                     st["srs_id"]),
                )
                con.execute(
                    "INSERT INTO gpkg_geometry_columns VALUES "
                    "(?, 'geom', ?, ?, 0, 0)",
                    (layer, name, st["srs_id"]),
                )
        con.close()
        os.replace(self._tmp, self._path)


def write_gpkg(ds, path: str, layer: str = "layer", srs_id: int = 4326,
               geometry_col: str = "geometry",
               fid_col: str | None = None) -> int:
    """Write a Ray Dataset (or a pyarrow Table) as one GPKG layer.
    Dataset blocks stream through iter_batches — bounded memory, single
    writer (a GeoPackage is one SQLite file; see module docstring)."""
    w = GpkgWriter(path)
    n = 0
    if isinstance(ds, pa.Table):
        n += w.write_table(ds, layer, srs_id, geometry_col, fid_col)
    else:
        for t in ds.iter_batches(batch_format="pyarrow",
                                 batch_size=4096):
            n += w.write_table(t, layer, srs_id, geometry_col, fid_col)
    w.close()
    return n


def _registered_geom_col(con, layer: str) -> str:
    row = con.execute(
        "SELECT column_name FROM gpkg_geometry_columns "
        "WHERE table_name = ?", (layer,)).fetchone()
    if row is None:
        raise ValueError(f"no geometry column registered for {layer!r}")
    return row[0]


def create_spatial_index(path: str, layer: str = "layer",
                         geometry_col: str | None = None) -> int:
    """Create the GPKG R-tree spatial index for a layer (the
    ``gpkg_rtree_index`` extension the reference's GPKG driver
    creates, ogr/ogrsf_frmts/gpkg): an SQLite ``rtree_<t>_<g>``
    virtual table populated from the feature envelopes, registered in
    ``gpkg_extensions``, with the six spec triggers keeping it in
    sync.  Returns the number of indexed features."""
    con = sqlite3.connect(path)
    try:
        if geometry_col is None:
            geometry_col = _registered_geom_col(con, layer)
        rt = f"rtree_{layer}_{geometry_col}"
        con.execute(f'CREATE VIRTUAL TABLE "{rt}" USING rtree('
                    "id, minx, maxx, miny, maxy)")
        rows = con.execute(
            f'SELECT fid, "{geometry_col}" FROM "{layer}"').fetchall()
        recs = []
        for fid, blob in rows:
            wkb, _srs = gp_unwrap(blob)
            minx, miny, maxx, maxy = G.envelope_wkb(wkb)
            recs.append((fid, minx, maxx, miny, maxy))
        con.executemany(
            f'INSERT INTO "{rt}" VALUES (?, ?, ?, ?, ?)', recs)
        con.execute(
            """CREATE TABLE IF NOT EXISTS gpkg_extensions (
                 table_name TEXT, column_name TEXT,
                 extension_name TEXT NOT NULL,
                 definition TEXT NOT NULL, scope TEXT NOT NULL,
                 CONSTRAINT ge_tce UNIQUE (table_name, column_name,
                                           extension_name))""")
        con.execute(
            "INSERT OR REPLACE INTO gpkg_extensions VALUES "
            "(?, ?, 'gpkg_rtree_index', "
            "'http://www.geopackage.org/spec120/#extension_rtree', "
            "'write-only')", (layer, geometry_col))
        # the six sync triggers required by the extension spec
        t, g = layer, geometry_col
        con.executescript(f"""
CREATE TRIGGER "{rt}_insert" AFTER INSERT ON "{t}"
  WHEN (new."{g}" NOT NULL AND NOT ST_IsEmpty(NEW."{g}"))
BEGIN
  INSERT OR REPLACE INTO "{rt}" VALUES (NEW.fid,
    ST_MinX(NEW."{g}"), ST_MaxX(NEW."{g}"),
    ST_MinY(NEW."{g}"), ST_MaxY(NEW."{g}"));
END;
CREATE TRIGGER "{rt}_update1" AFTER UPDATE OF "{g}" ON "{t}"
  WHEN OLD.fid = NEW.fid AND
       (NEW."{g}" NOTNULL AND NOT ST_IsEmpty(NEW."{g}"))
BEGIN
  INSERT OR REPLACE INTO "{rt}" VALUES (NEW.fid,
    ST_MinX(NEW."{g}"), ST_MaxX(NEW."{g}"),
    ST_MinY(NEW."{g}"), ST_MaxY(NEW."{g}"));
END;
CREATE TRIGGER "{rt}_update2" AFTER UPDATE OF "{g}" ON "{t}"
  WHEN OLD.fid = NEW.fid AND
       (NEW."{g}" ISNULL OR ST_IsEmpty(NEW."{g}"))
BEGIN
  DELETE FROM "{rt}" WHERE id = OLD.fid;
END;
CREATE TRIGGER "{rt}_update3" AFTER UPDATE ON "{t}"
  WHEN OLD.fid != NEW.fid AND
       (NEW."{g}" NOTNULL AND NOT ST_IsEmpty(NEW."{g}"))
BEGIN
  DELETE FROM "{rt}" WHERE id = OLD.fid;
  INSERT OR REPLACE INTO "{rt}" VALUES (NEW.fid,
    ST_MinX(NEW."{g}"), ST_MaxX(NEW."{g}"),
    ST_MinY(NEW."{g}"), ST_MaxY(NEW."{g}"));
END;
CREATE TRIGGER "{rt}_update4" AFTER UPDATE ON "{t}"
  WHEN OLD.fid != NEW.fid AND
       (NEW."{g}" ISNULL OR ST_IsEmpty(NEW."{g}"))
BEGIN
  DELETE FROM "{rt}" WHERE id IN (OLD.fid, NEW.fid);
END;
CREATE TRIGGER "{rt}_delete" AFTER DELETE ON "{t}"
  WHEN old."{g}" NOT NULL
BEGIN
  DELETE FROM "{rt}" WHERE id = OLD.fid;
END;
""")
        con.commit()
        return len(recs)
    finally:
        con.close()


def has_spatial_index(path: str, layer: str,
                      geometry_col: str | None = None) -> bool:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        if geometry_col is None:
            geometry_col = _registered_geom_col(con, layer)
        row = con.execute(
            "SELECT 1 FROM sqlite_master WHERE type = 'table' AND "
            "name = ?", (f"rtree_{layer}_{geometry_col}",)).fetchone()
        return row is not None
    finally:
        con.close()


# ----------------------------------------------------------- reader


def list_layers(path: str) -> list[dict]:
    """gpkg_contents feature layers with their geometry metadata."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            """SELECT c.table_name, c.min_x, c.min_y, c.max_x, c.max_y,
                      c.srs_id, g.column_name, g.geometry_type_name
               FROM gpkg_contents c
               JOIN gpkg_geometry_columns g USING (table_name)
               WHERE c.data_type = 'features'
               ORDER BY c.table_name"""
        ).fetchall()
    finally:
        con.close()
    return [
        {"layer": r[0], "extent": (r[1], r[2], r[3], r[4]),
         "srs_id": r[5], "geometry_col": r[6], "geometry_type": r[7]}
        for r in rows
    ]


# ----------------------------------------------------- raster tiles
#
# The GPKG raster half (ogr/ogrsf_frmts/gpkg/ tiled gridded coverage:
# gpkg_tile_matrix_set + gpkg_tile_matrix + a tile pyramid table keyed
# (zoom_level, tile_column, tile_row) — GPKG rows are XYZ-oriented,
# unlike MBTiles' TMS).  WebMercator matrix: 2^z x 2^z tiles of 256px
# at the gdal2tiles initial resolution.

_WM = 20037508.342789244
_INITIAL_RES = 156543.03392804097


def write_gpkg_tiles(ds, path: str, table: str = "tiles",
                     srs_id: int = 3857,
                     tile_format: str = "png") -> int:
    """Stream XYZ tile rows (z, x, y, tile_bytes) into a GPKG tile
    pyramid table with the WebMercator tile matrix metadata.  Appends
    to an existing GeoPackage or creates one.  Returns tile count.

    ``tile_format``: 'png' or 'jpeg' (the core GPKG tile encodings)
    need no declaration; 'webp' registers the ``gpkg_webp`` extension
    row the spec requires (OGC GPKG §F.4, extension_tiles_webp) —
    tile_data blobs themselves are caller-encoded either way."""
    if tile_format not in ("png", "jpeg", "webp"):
        raise ValueError(
            f"tile_format must be png/jpeg/webp, got {tile_format!r}")
    exists = os.path.exists(path)
    work = path if exists else path + ".tmp"
    con = sqlite3.connect(work)
    if exists:
        (dup,) = con.execute(
            "SELECT COUNT(*) FROM sqlite_master WHERE type='table' "
            "AND name=?", (table,)).fetchone()
        if dup:
            con.close()
            raise ValueError(
                f"{path}: tile table {table!r} already exists — GPKG "
                "tile pyramids are write-once (pass a new table name)")
    _init_gpkg(con)
    _ensure_srs(con, srs_id)
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_tile_matrix_set (
        table_name TEXT PRIMARY KEY, srs_id INTEGER NOT NULL,
        min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE)"""
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_tile_matrix (
        table_name TEXT NOT NULL, zoom_level INTEGER NOT NULL,
        matrix_width INTEGER, matrix_height INTEGER,
        tile_width INTEGER, tile_height INTEGER,
        pixel_x_size DOUBLE, pixel_y_size DOUBLE,
        CONSTRAINT pk_tm PRIMARY KEY (table_name, zoom_level))"""
    )
    con.execute(
        f"""CREATE TABLE "{table}" (
        id INTEGER PRIMARY KEY AUTOINCREMENT,
        zoom_level INTEGER NOT NULL, tile_column INTEGER NOT NULL,
        tile_row INTEGER NOT NULL, tile_data BLOB NOT NULL,
        UNIQUE (zoom_level, tile_column, tile_row))"""
    )
    if tile_format == "webp":
        con.execute(
            """CREATE TABLE IF NOT EXISTS gpkg_extensions (
            table_name TEXT, column_name TEXT,
            extension_name TEXT NOT NULL, definition TEXT NOT NULL,
            scope TEXT NOT NULL,
            CONSTRAINT ge_tce UNIQUE (table_name, column_name,
            extension_name))"""
        )
        con.execute(
            "INSERT INTO gpkg_extensions VALUES (?, ?, ?, ?, ?)",
            (table, "tile_data", "gpkg_webp",
             "http://www.geopackage.org/spec120/#extension_tiles_webp",
             "read-write"))
    n = 0
    zooms: set[int] = set()

    def insert(t: pa.Table):
        nonlocal n
        rows = list(zip(
            (int(v) for v in t.column("z").to_pylist()),
            (int(v) for v in t.column("x").to_pylist()),
            (int(v) for v in t.column("y").to_pylist()),
            t.column("tile_bytes").to_pylist()))
        with con:
            con.executemany(
                f'INSERT INTO "{table}" (zoom_level, tile_column, '
                "tile_row, tile_data) VALUES (?, ?, ?, ?)", rows)
        zooms.update(r[0] for r in rows)
        n += len(rows)

    if isinstance(ds, pa.Table):
        insert(ds)
    else:
        for t in ds.iter_batches(batch_format="pyarrow", batch_size=512):
            insert(t)
    with con:
        con.execute(
            "INSERT OR REPLACE INTO gpkg_tile_matrix_set VALUES "
            "(?, ?, ?, ?, ?, ?)",
            (table, srs_id, -_WM, -_WM, _WM, _WM))
        for z in sorted(zooms):
            res = _INITIAL_RES / (1 << z)
            con.execute(
                "INSERT OR REPLACE INTO gpkg_tile_matrix VALUES "
                "(?, ?, ?, ?, ?, ?, ?, ?)",
                (table, z, 1 << z, 1 << z, 256, 256, res, res))
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents (table_name, "
            "data_type, identifier, min_x, min_y, max_x, max_y, srs_id)"
            " VALUES (?, 'tiles', ?, ?, ?, ?, ?, ?)",
            (table, table, -_WM, -_WM, _WM, _WM, srs_id))
    con.close()
    if not exists:
        os.replace(work, path)
    return n


def read_gpkg_tiles(path: str, table: str = "tiles",
                    zoom: int | None = None, parallelism: int = 16):
    """Ray Dataset of XYZ tile rows from a GPKG tile pyramid table."""
    import ray.data as rd

    where = "" if zoom is None else f" WHERE zoom_level = {int(zoom)}"
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute(
            f'SELECT MIN(id), MAX(id) FROM "{table}"{where}').fetchone()
    finally:
        con.close()
    if lo is None:
        return rd.from_arrow(pa.table({
            "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
            "y": pa.array([], pa.int32()),
            "tile_bytes": pa.array([], pa.binary())}))
    edges = np.unique(np.linspace(lo, hi + 1, parallelism + 1)
                      .astype(np.int64))
    items = [{"lo": int(edges[i]), "hi": int(edges[i + 1] - 1)}
             for i in range(len(edges) - 1)]

    def fetch(t: pa.Table) -> pa.Table:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        zs, xs, ys, bs = [], [], [], []
        try:
            for lo_, hi_ in zip(t.column("lo").to_pylist(),
                                t.column("hi").to_pylist()):
                cond = f"id >= {lo_} AND id <= {hi_}"
                if zoom is not None:
                    cond += f" AND zoom_level = {int(zoom)}"
                for z, x, y, d in con.execute(
                    "SELECT zoom_level, tile_column, tile_row, "
                    f'tile_data FROM "{table}" WHERE {cond}'
                ):
                    zs.append(z)
                    xs.append(x)
                    ys.append(y)
                    bs.append(d)
        finally:
            con.close()
        return pa.table({
            "z": pa.array(zs, pa.int32()), "x": pa.array(xs, pa.int32()),
            "y": pa.array(ys, pa.int32()),
            "tile_bytes": pa.array(bs, pa.binary())})

    return rd.from_items(items).map_batches(fetch, batch_format="pyarrow")


def _read_range(path: str, layer: str, geom_col: str, attrs: list[str],
                lo: int, hi: int, bbox=None,
                where: str | None = None) -> pa.Table:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        sel = ", ".join(["fid", *(f'"{c}"' for c in attrs),
                         f'"{geom_col}"'])
        cond = "fid >= ? AND fid <= ?"
        params: list = [lo, hi]
        if where:
            cond += f" AND ({where})"
        if bbox is not None:
            rt = f"rtree_{layer}_{geom_col}"
            has_rt = con.execute(
                "SELECT 1 FROM sqlite_master WHERE type = 'table' "
                "AND name = ?", (rt,)).fetchone()
            if has_rt:
                # INDEX PUSHDOWN: candidate fids come from the R-tree
                # virtual table (the reference's m_bUseSpatialIndex
                # path); the exact envelope re-check below still runs
                cond += (f' AND fid IN (SELECT id FROM "{rt}" WHERE '
                         "maxx >= ? AND minx <= ? AND "
                         "maxy >= ? AND miny <= ?)")
                params += [bbox[0], bbox[2], bbox[1], bbox[3]]
        rows = con.execute(
            f'SELECT {sel} FROM "{layer}" WHERE {cond} ORDER BY fid',
            params,
        ).fetchall()
    finally:
        con.close()
    fids, wkbs, srs = [], [], []
    cols: dict[str, list] = {c: [] for c in attrs}
    for r in rows:
        wkb, srs_id = gp_unwrap(r[-1])
        if bbox is not None:
            minx, miny, maxx, maxy = G.envelope_wkb(wkb)
            if (maxx < bbox[0] or minx > bbox[2]
                    or maxy < bbox[1] or miny > bbox[3]):
                continue
        fids.append(r[0])
        for c, v in zip(attrs, r[1:-1]):
            cols[c].append(v)
        wkbs.append(wkb)
        srs.append(srs_id)
    out = {"fid": pa.array(fids, pa.int64()),
           "geometry": pa.array(wkbs, pa.binary()),
           "srs_id": pa.array(srs, pa.int32())}
    for c in attrs:
        out[c] = pa.array(cols[c])
    return pa.table(out)


def read_gpkg(path: str, layer: str | None = None, bbox=None,
              where: str | None = None, parallelism: int = 16):
    """Ray Dataset over one GPKG feature layer in the engine's WKB
    convention (fid, geometry, srs_id, attrs...).  The layer's rowid
    span splits into `parallelism` fid ranges; each range is one task
    opening the file read-only — a large layer fans out like any
    partitioned source.  `bbox = (minx, miny, maxx, maxy)` prunes by
    feature envelope inside each task; `where` is an attribute filter
    pushed into the per-range SQL (the OGR SetAttributeFilter analog —
    the file opens read-only, so the expression cannot mutate it)."""
    import ray.data as rd

    meta = list_layers(path)
    if layer is None:
        if len(meta) != 1:
            raise ValueError(
                f"{path} has {len(meta)} layers; pass layer=..."
            )
        layer = meta[0]["layer"]
    info = next((m for m in meta if m["layer"] == layer), None)
    if info is None:
        raise ValueError(f"no such layer {layer!r} in {path}")
    geom_col = info["geometry_col"]
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute(
            f'SELECT MIN(fid), MAX(fid) FROM "{layer}"'
        ).fetchone()
        attrs = [
            r[1] for r in con.execute(f'PRAGMA table_info("{layer}")')
            if r[1] not in ("fid", geom_col)
        ]
    finally:
        con.close()
    if lo is None:
        return rd.from_arrow(
            pa.table({"fid": pa.array([], pa.int64()),
                      "geometry": pa.array([], pa.binary()),
                      "srs_id": pa.array([], pa.int32())})
        )
    edges = np.unique(np.linspace(lo, hi + 1, parallelism + 1)
                      .astype(np.int64))
    ranges = [{"lo": int(edges[i]), "hi": int(edges[i + 1] - 1)}
              for i in range(len(edges) - 1)]

    def fetch(t: pa.Table) -> pa.Table:
        parts = [
            _read_range(path, layer, geom_col, attrs, lo_, hi_, bbox,
                        where)
            for lo_, hi_ in zip(t.column("lo").to_pylist(),
                                t.column("hi").to_pylist())
        ]
        return pa.concat_tables(parts, promote_options="default")

    return rd.from_items(ranges).map_batches(fetch, batch_format="pyarrow")
