"""Parity of the incremental (walk + cavity BFS) Delaunay construction
against the original vectorized every-triangle scan.

Both paths share the exact strict-incircle / containment contract, so
the output canonical triangulation must be BIT-IDENTICAL — including on
adversarial fixtures full of cocircular quadruples (integer grids) and
collinear runs."""

import numpy as np
import pytest

from gdal_ray.functions.delaunay import delaunay_triangles, grid_linear


def _parity(px, py):
    a = delaunay_triangles(px, py, method="scan")
    b = delaunay_triangles(px, py, method="incremental")
    np.testing.assert_array_equal(a, b)
    return a


def test_parity_random_uniform():
    rng = np.random.default_rng(42)
    for n in (3, 7, 50, 300):
        px = rng.uniform(0, 100, n)
        py = rng.uniform(0, 100, n)
        _parity(px, py)


def test_parity_integer_grid_cocircular():
    # every unit square's 4 corners are cocircular — the tie-handling
    # (strict incircle, insertion-order diagonal choice) must agree
    gx, gy = np.meshgrid(np.arange(9.0), np.arange(9.0))
    t = _parity(gx.ravel(), gy.ravel())
    assert len(t) == 2 * 8 * 8  # each unit cell splits into 2 triangles


def test_parity_collinear_and_duplicates():
    # collinear runs + exact duplicates (first-wins dedupe in both)
    px = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 2.0, 1.0, 3.0, 0.0, 2.0])
    py = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0])
    _parity(px, py)


def test_parity_clustered_skew():
    rng = np.random.default_rng(7)
    px = np.concatenate([rng.normal(0, 1e-3, 200), rng.uniform(0, 50, 100)])
    py = np.concatenate([rng.normal(0, 1e-3, 200), rng.uniform(0, 50, 100)])
    _parity(px, py)


def test_parity_cocircular_ring():
    # many points exactly on one circle (dyadic-ish angles): worst case
    # for incircle ties
    k = np.arange(16)
    px = np.round(np.cos(2 * np.pi * k / 16), 6)
    py = np.round(np.sin(2 * np.pi * k / 16), 6)
    _parity(px, py)


def test_grid_linear_unchanged_by_method():
    rng = np.random.default_rng(3)
    px, py = rng.uniform(0, 10, 120), rng.uniform(0, 10, 120)
    pv = rng.uniform(-5, 5, 120)
    xs, ys = np.linspace(0, 10, 33), np.linspace(0, 10, 29)
    out = grid_linear(px, py, pv, xs, ys, nodata=-1.0)
    assert out.shape == (29, 33)
    assert (out != -1.0).sum() > 400  # interior mostly interpolated


@pytest.mark.parametrize("n", [2000])
def test_incremental_is_fast(n):
    import time

    rng = np.random.default_rng(11)
    px, py = rng.uniform(0, 1000, n), rng.uniform(0, 1000, n)
    t0 = time.perf_counter()
    t = delaunay_triangles(px, py)
    dt = time.perf_counter() - t0
    assert len(t) > n  # ~2n triangles
    assert dt < 10.0
