import numpy as np

from gdal_ray.functions import kernels as K
from gdal_ray.state.strtree import STRtree


def test_identity_sampling_all_kernels():
    img = (np.arange(16 * 16 * 3) % 251).reshape(16, 16, 3).astype(np.uint8)
    sx = np.arange(16, dtype=float)
    sy = np.arange(16, dtype=float)
    for m in ("near", "bilinear", "cubic", "lanczos"):
        out = K.resample_separable(img, sx, sy, m)
        assert np.array_equal(out, img), m


def test_near_half_offsets_round_down():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = K.resample_separable(img, np.array([0.5]), np.array([0.5]), "near")
    assert (out[0, 0] == img[1, 1]).all()  # floor(0.5+0.5) = 1


def test_downsample2x_average_exact():
    img = np.array(
        [[[0], [2]], [[4], [6]]], dtype=np.uint8
    ).repeat(3, axis=2)
    out = K.downsample2x_average(img)
    assert out.shape == (1, 1, 3)
    assert (out == 3).all()  # (0+2+4+6+2)//4 = 3


def test_masked_average_ignores_invalid():
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = 100
    mask = np.zeros((2, 2), bool)
    mask[0, 0] = True
    out, om = K.downsample2x_masked_average(img, mask)
    assert om[0, 0] and (out[0, 0] == 100).all()


def test_mode_tie_lowest():
    v = np.array([[3, 3, 5, 5, 1]])
    assert K.mode_reduce(v)[0] == 3


def test_bilinear_midpoint():
    img = np.zeros((1, 2, 1), np.uint8)
    img[0, 0, 0] = 10
    img[0, 1, 0] = 20
    out = K.resample_separable(img, np.array([0.5]), np.array([0.0]), "bilinear")
    assert out[0, 0, 0] == 15


def test_strtree_matches_bruteforce():
    rng = np.random.RandomState(0)
    n = 500
    minx = rng.uniform(0, 100, n)
    miny = rng.uniform(0, 100, n)
    maxx = minx + rng.uniform(0, 10, n)
    maxy = miny + rng.uniform(0, 10, n)
    tree = STRtree(minx, miny, maxx, maxy)
    for _ in range(50):
        qx0, qy0 = rng.uniform(0, 100, 2)
        qx1, qy1 = qx0 + rng.uniform(0, 20), qy0 + rng.uniform(0, 20)
        want = set(
            np.flatnonzero(
                (minx <= qx1) & (maxx >= qx0) & (miny <= qy1) & (maxy >= qy0)
            ).tolist()
        )
        got = set(tree.query(qx0, qy0, qx1, qy1).tolist())
        assert got == want


def test_strtree_empty_and_single():
    assert len(STRtree([], [], [], []).query(0, 0, 1, 1)) == 0
    t = STRtree([1.0], [1.0], [2.0], [2.0])
    assert t.query(0, 0, 3, 3).tolist() == [0]
    assert t.query(5, 5, 6, 6).tolist() == []
