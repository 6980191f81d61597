"""Tile math vs an independent scalar port of the reference formulas
(gdal2tiles.py GlobalMercator :315-530)."""

import math

import numpy as np

from gdal_ray.functions import mercator as M


def scalar_meters_to_tile(mx, my, zoom, tile_size=256):
    res = 2 * math.pi * 6378137 / tile_size / (2**zoom)
    px = (mx + 2 * math.pi * 6378137 / 2.0) / res
    py = (my + 2 * math.pi * 6378137 / 2.0) / res
    tx = int(math.ceil(px / float(tile_size)) - 1)
    ty = int(math.ceil(py / float(tile_size)) - 1)
    return max(tx, 0), max(ty, 0)


def test_meters_to_tile_matches_scalar_reference():
    rng = np.random.RandomState(42)
    mx = rng.uniform(-2e7, 2e7, 500)
    my = rng.uniform(-2e7, 2e7, 500)
    for z in (0, 4, 8, 12):
        tx, ty = M.meters_to_tile(mx, my, z)
        for i in range(len(mx)):
            assert (tx[i], ty[i]) == scalar_meters_to_tile(mx[i], my[i], z)


def test_latlon_roundtrip():
    lat = np.linspace(-85, 85, 50)
    lon = np.linspace(-179, 179, 50)
    mx, my = M.lat_lon_to_meters(lat, lon)
    lat2, lon2 = M.meters_to_lat_lon(mx, my)
    assert np.allclose(lat, lat2, atol=1e-9)
    assert np.allclose(lon, lon2, atol=1e-9)


def test_tile_bounds_contains_center():
    for z in (3, 9):
        tx, ty = 2, 3
        minx, miny, maxx, maxy = M.tile_bounds(tx, ty, z)
        cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
        tx2, ty2 = M.meters_to_tile(cx, cy, z)
        assert (int(tx2), int(ty2)) == (tx, ty)


def test_boundary_pixel_belongs_to_lower_tile():
    # the reference rule (gdal2tiles.py:460): tx = ceil(px/256) - 1, so a
    # pixel coordinate exactly on a tile edge belongs to the lower tile
    tx, ty = M.pixels_to_tile(np.array([1024.0, 1024.5]), np.array([1280.0, 0.0]))
    assert tx.tolist() == [3, 4]
    assert ty.tolist() == [4, 0]


def test_pack_unpack_roundtrip():
    z = np.array([0, 5, 12, 28])
    x = np.array([0, 17, 4000, (1 << 28) - 1])
    y = np.array([0, 3, 1234, (1 << 28) - 1])
    z2, x2, y2 = M.unpack_cell(M.pack_cell(z, x, y))
    assert (z2 == z).all() and (x2 == x).all() and (y2 == y).all()


def test_tms_xyz_involution():
    y = np.array([0, 1, 100])
    assert (M.tms_to_xyz(M.tms_to_xyz(y, 9), 9) == y).all()


def test_cover_cells_batch_matches_scalar():
    minx = np.array([0.0, 1e6])
    miny = np.array([0.0, 1e6])
    maxx = np.array([5e5, 1.4e6])
    maxy = np.array([5e5, 1.2e6])
    ri, cells = M.cover_cells_batch(minx, miny, maxx, maxy, 8)
    for row in (0, 1):
        want = set(M.cells_of_envelope(minx[row], miny[row], maxx[row], maxy[row], 8).tolist())
        got = set(cells[ri == row].tolist())
        assert got == want
