"""WebMercatorQuad tile math — the engine's spatial partition key.

Vectorized numpy reimplementation of the reference's ``GlobalMercator``
(reference: swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:315-530 —
LatLonToMeters :422, MetersToLatLon :431, MetersToPixels :452,
PixelsToTile :460, MetersToTile :473, TileBounds :479, Resolution :497)
and the TMS<->XYZ y flip (gdal2tiles.py ``getYTile``).

The packed (z, x, y) tile id doubles as the engine's partition ``cell``
key (plays the H3/S2 role): ``cell = (z << 58) | (x << 29) | y`` fits
int64 for z <= 28.  All functions accept scalars or numpy arrays.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0
TILE_SIZE = 256
ORIGIN_SHIFT = 2.0 * np.pi * EARTH_RADIUS / 2.0  # 20037508.342789244
INITIAL_RESOLUTION = 2.0 * np.pi * EARTH_RADIUS / TILE_SIZE  # 156543.03392804097

MAX_CELL_Z = 28


def resolution(zoom):
    """Meters per pixel at zoom (gdal2tiles.py:497)."""
    return INITIAL_RESOLUTION / (2.0 ** np.asarray(zoom, dtype=np.float64))


def lat_lon_to_meters(lat, lon):
    """EPSG:4326 -> EPSG:3857 (gdal2tiles.py:422-429)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    mx = lon * ORIGIN_SHIFT / 180.0
    my = np.log(np.tan((90.0 + lat) * np.pi / 360.0)) / (np.pi / 180.0)
    my = my * ORIGIN_SHIFT / 180.0
    return mx, my


def meters_to_lat_lon(mx, my):
    """EPSG:3857 -> EPSG:4326 (gdal2tiles.py:431-441)."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = (mx / ORIGIN_SHIFT) * 180.0
    lat = (my / ORIGIN_SHIFT) * 180.0
    lat = (
        180.0
        / np.pi
        * (2.0 * np.arctan(np.exp(lat * np.pi / 180.0)) - np.pi / 2.0)
    )
    return lat, lon


def meters_to_pixels(mx, my, zoom):
    """EPSG:3857 meters -> global pixel coords at zoom (gdal2tiles.py:452-457)."""
    res = resolution(zoom)
    px = (np.asarray(mx, dtype=np.float64) + ORIGIN_SHIFT) / res
    py = (np.asarray(my, dtype=np.float64) + ORIGIN_SHIFT) / res
    return px, py


def pixels_to_tile(px, py):
    """Pixel coords -> TMS tile covering them (gdal2tiles.py:460-464).

    Matches the reference exactly: ``tx = int(ceil(px / tile_size) - 1)``
    (a point exactly on a tile's left/bottom edge belongs to the tile
    to its left/below, except clamped at 0).
    """
    tx = np.ceil(np.asarray(px, dtype=np.float64) / float(TILE_SIZE)) - 1
    ty = np.ceil(np.asarray(py, dtype=np.float64) / float(TILE_SIZE)) - 1
    tx = np.maximum(tx, 0).astype(np.int64)
    ty = np.maximum(ty, 0).astype(np.int64)
    return tx, ty


def meters_to_tile(mx, my, zoom):
    """EPSG:3857 meters -> TMS tile at zoom (gdal2tiles.py:473-477)."""
    px, py = meters_to_pixels(mx, my, zoom)
    return pixels_to_tile(px, py)


def tile_bounds(tx, ty, zoom):
    """Bounds of a TMS tile in EPSG:3857 meters (gdal2tiles.py:479-486)."""
    res = resolution(zoom)
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    minx = tx * TILE_SIZE * res - ORIGIN_SHIFT
    miny = ty * TILE_SIZE * res - ORIGIN_SHIFT
    maxx = (tx + 1) * TILE_SIZE * res - ORIGIN_SHIFT
    maxy = (ty + 1) * TILE_SIZE * res - ORIGIN_SHIFT
    return minx, miny, maxx, maxy


def tms_to_xyz(ty, zoom):
    """TMS y -> XYZ (slippy-map) y and back; involution (gdal2tiles getYTile)."""
    return (1 << np.asarray(zoom, dtype=np.int64)) - 1 - np.asarray(ty, dtype=np.int64)


xyz_to_tms = tms_to_xyz


def pack_cell(z, x, y):
    """Pack (z, x, y) into one int64 cell id: (z << 58) | (x << 29) | y."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (z << 58) | (x << 29) | y


def unpack_cell(cell):
    """Inverse of :func:`pack_cell` -> (z, x, y)."""
    cell = np.asarray(cell, dtype=np.int64)
    z = cell >> 58
    x = (cell >> 29) & ((1 << 29) - 1)
    y = cell & ((1 << 29) - 1)
    return z, x, y


def cell_of_points(mx, my, zoom):
    """Partition cell id for EPSG:3857 points at zoom."""
    tx, ty = meters_to_tile(mx, my, zoom)
    return pack_cell(np.full_like(tx, zoom), tx, ty)


def cells_of_envelope(minx, miny, maxx, maxy, zoom):
    """All cells a single envelope covers at ``zoom`` (python ints).

    Used to replicate rows (polygons / chips) into every cell they touch
    before a cell co-partitioned join.  Scalar envelope -> list of cells.
    """
    tminx, tminy = meters_to_tile(minx, miny, zoom)
    tmaxx, tmaxy = meters_to_tile(maxx, maxy, zoom)
    n = 1 << int(zoom)
    xs = np.arange(int(tminx), min(int(tmaxx), n - 1) + 1, dtype=np.int64)
    ys = np.arange(int(tminy), min(int(tmaxy), n - 1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return pack_cell(np.full(gx.size, zoom, dtype=np.int64), gx.ravel(), gy.ravel())


def cover_cells_batch(minx, miny, maxx, maxy, zoom):
    """Vectorized envelope -> covering-cell expansion for a whole batch.

    Returns (row_idx, cell) arrays: ``row_idx[i]`` is the input row that
    covers ``cell[i]``.  Envelope spanning k tiles emits k pairs.
    """
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    tminx, tminy = meters_to_tile(minx, miny, zoom)
    tmaxx, tmaxy = meters_to_tile(maxx, maxy, zoom)
    n = 1 << int(zoom)
    tmaxx = np.minimum(tmaxx, n - 1)
    tmaxy = np.minimum(tmaxy, n - 1)
    nx = tmaxx - tminx + 1
    ny = tmaxy - tminy + 1
    counts = nx * ny
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(minx), dtype=np.int64), counts)
    # local offset within each row's tile rectangle
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    nxr = np.repeat(nx, counts)
    dx = local % nxr
    dy = local // nxr
    cx = np.repeat(tminx, counts) + dx
    cy = np.repeat(tminy, counts) + dy
    cells = pack_cell(np.full(total, zoom, dtype=np.int64), cx, cy)
    return row_idx, cells
