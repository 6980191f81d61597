"""Sum-preserving warp (GWKSumPreserving, alg/gdalwarpkernel.cpp:7969):
the defining property is exact conservation of the global sum in the
float path; the banded scatter must agree with the dense
overlap-matrix formulation and be bit-deterministic."""

import numpy as np

from gdal_ray.stages.warp import WarpChipsSum, overlap_weights


def _chip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(64, 128, 3), dtype=np.uint8)
    minx, miny = 1_000_000.0, 5_000_000.0
    return img, minx, miny, minx + 128 * 30, miny + 64 * 30


def test_sum_conserved():
    img, *env = _chip()
    out, _ = WarpChipsSum()._warp_sum_float(img, *env)
    assert abs(out.sum() - img.astype(np.float64).sum()) < 1e-6 * img.sum()


def test_banded_scatter_matches_dense_matrices():
    img, minx, miny, maxx, maxy = _chip()
    st = WarpChipsSum()
    out, _ = st._warp_sum_float(img, minx, miny, maxx, maxy)
    h, w = img.shape[:2]
    dminx, dminy, dmaxx, dmaxy = st.tr.src_bbox_to_dst(minx, miny, maxx, maxy)
    ex = st.tr.src_x_to_dst_x(minx + np.arange(w + 1) * (maxx - minx) / w)
    ey = st.tr.src_y_to_dst_y(maxy - np.arange(h + 1) * (maxy - miny) / h)
    ax = overlap_weights((np.asarray(ex) - dminx) / ((dmaxx - dminx) / w), w)
    ay = overlap_weights((dmaxy - np.asarray(ey)) / ((dmaxy - dminy) / h), h)
    ref = np.einsum("ij,jkb,lk->ilb", ay, img.astype(np.float64), ax)
    assert np.abs(out - ref).max() < 1e-9
    # every dense scatter column (one source pixel) sums to 1
    assert np.allclose(ax.sum(axis=0), 1.0) and np.allclose(ay.sum(axis=0), 1.0)


def test_deterministic_across_calls():
    img, *env = _chip()
    a, _ = WarpChipsSum()._warp_sum_float(img, *env)
    b, _ = WarpChipsSum()._warp_sum_float(img, *env)
    assert np.array_equal(a, b)


def test_identity_transform_limit():
    """A chip spanning a tiny extent warps nearly 1:1 — the scatter
    must then be (close to) a permutation and preserve values."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    minx, miny = 0.0, 0.0  # equator: mercator locally isometric
    out, _ = WarpChipsSum()._warp_sum_float(img, minx, miny, 32 * 10.0, 32 * 10.0)
    assert np.abs(out - img.astype(np.float64)).max() < 1.0
