"""Tile pyramid + warp: invariants, golden checksums, resume
(golden cases 2/3/7/8, FIXTURES.md)."""

import json
import os

import numpy as np
import pytest

from gdal_ray.functions import checksum, codecs
from gdal_ray.stages.warp import Transform3857To4326, WarpChips, approx_1d
from gdal_ray.synth.make_table import chip_pixels

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def pyramid(ray_session, smoke_fixtures):
    import ray.data as rd

    from gdal_ray.stages.tiles import build_pyramid

    imgs = rd.read_parquet(smoke_fixtures["images"])
    return build_pyramid(imgs, z_max=10, z_min=8, resampling="near")


def test_tile_counts_and_golden_checksums(pyramid):
    from gdal_ray.stages.tiles import tiles_checksum

    cs = (
        tiles_checksum(pyramid[10])
        .to_pandas()
        .sort_values(["z", "x", "y"])
        .reset_index(drop=True)
    )
    got = {
        f"{r.z}/{r.x}/{r.y}": [int(r.cs_r), int(r.cs_g), int(r.cs_b)]
        for r in cs.head(25).itertuples()
    }
    path = os.path.join(GOLDEN, "tiles_z10.json")
    want = json.load(open(path))
    assert got == want["tiles"]
    assert len(cs) == want["count_z10"]


def test_parent_equals_masked_average_of_children(pyramid):
    from gdal_ray.functions import kernels
    from gdal_ray.stages.tiles import _unpack_mask

    kids = pyramid[10].to_pandas()
    parents = pyramid[9].to_pandas()
    p = parents.iloc[0]
    sel = kids[(kids.x // 2 == p.x) & (kids.y // 2 == p.y)]
    assert 1 <= len(sel) <= 4
    canvas = np.zeros((512, 512, 3), np.uint8)
    mask = np.zeros((512, 512), bool)
    for r in sel.itertuples():
        dx, dy = r.x - 2 * p.x, r.y - 2 * p.y
        row0, col0 = (1 - dy) * 256, dx * 256
        canvas[row0 : row0 + 256, col0 : col0 + 256] = codecs.decode_png(r.tile_bytes)
        mask[row0 : row0 + 256, col0 : col0 + 256] = _unpack_mask(r.mask_bytes)
    want, wmask = kernels.downsample2x_masked_average(canvas, mask)
    assert np.array_equal(codecs.decode_png(p.tile_bytes), want)
    assert _unpack_mask(p.mask_bytes).sum() == wmask.sum() == p.n_valid


def test_pyramid_resume_skips_done_levels(ray_session, smoke_fixtures, tmp_path):
    import ray.data as rd

    from gdal_ray.stages.tiles import build_pyramid

    imgs = rd.read_parquet(smoke_fixtures["images"])
    ck = str(tmp_path / "ck")
    lv1 = build_pyramid(imgs, z_max=9, z_min=8, resampling="near", checkpoint_dir=ck)
    c1 = {z: ds.count() for z, ds in lv1.items()}
    mtimes = {
        z: os.path.getmtime(os.path.join(ck, f"z={z}", "_SUCCESS")) for z in (9, 8)
    }
    # rerun: completed levels must be read back, not rebuilt
    lv2 = build_pyramid(imgs, z_max=9, z_min=8, resampling="near", checkpoint_dir=ck)
    c2 = {z: ds.count() for z, ds in lv2.items()}
    assert c1 == c2
    for z in (9, 8):
        assert os.path.getmtime(os.path.join(ck, f"z={z}", "_SUCCESS")) == mtimes[z]


def test_warp_golden_checksums():
    img = chip_pixels(0, 20, 20)  # the byte.tif-analog 20x20 chip
    env = (1_000_000.0, 2_000_000.0, 1_000_000.0 + 20 * 38.0, 2_000_000.0 + 20 * 38.0)
    want = json.load(open(os.path.join(GOLDEN, "warp_20x20.json")))
    for method, cs_want in want.items():
        w = WarpChips(resampling=method)
        out, _ = w._warp_one(img, *env)
        assert checksum.checksum_image(out) == cs_want, method


def test_approx_transformer_contract():
    tr = Transform3857To4326()
    ys = np.linspace(-80, 80, 777)
    exact = tr.dst_y_to_src_y(ys)
    for thr in (0.125, 0.5):
        ap = approx_1d(lambda a: tr.dst_y_to_src_y(a), ys, thr, 38.0)
        assert np.abs(ap - exact).max() / 38.0 <= thr


def test_warp_roundtrip_identity():
    img = chip_pixels(5, 32, 32)
    env = (500_000.0, 700_000.0, 500_000.0 + 32 * 10.0, 700_000.0 + 32 * 10.0)
    fwd = WarpChips("EPSG:3857", "EPSG:4326", resampling="near", use_approx=False)
    bwd = WarpChips("EPSG:4326", "EPSG:3857", resampling="near", use_approx=False)
    mid, denv = fwd._warp_one(img, *env)
    back, env2 = bwd._warp_one(mid, *denv)
    assert np.allclose(env2, env)
    assert (back == img).mean() > 0.99


def test_caption_carrythrough_and_lossless(ray_session, smoke_fixtures):
    """Captions byte-identical + decoded pixels exact (lossless) /
    PSNR>=40dB (qraw) after the warp pipeline (golden case 7)."""
    import ray.data as rd

    from gdal_ray.stages.warp import warp_images
    from gdal_ray.synth.make_table import caption_of, chip_pixels, dup_src

    # NOTE: chaining two actor pools of concurrency 2 on a 4-CPU session
    # starves the read stage (pool reserves every CPU) — size pools so
    # read/write still get CPUs (ray_guide 'Stateful stages').
    imgs = rd.read_parquet(smoke_fixtures["images"]).limit(60)
    fwd = warp_images(imgs, "EPSG:3857", "EPSG:4326", "near", concurrency=1)
    out = warp_images(
        fwd.materialize(), "EPSG:4326", "EPSG:3857", "near", concurrency=1
    ).to_pandas()
    for r in out.itertuples():
        i = int(r.image_id[3:])
        assert r.caption == caption_of(i)
        src, _ = dup_src(i)
        orig = chip_pixels(i, r.w, r.h)
        dec = codecs.decode(r.bytes, r.w, r.h, r.fmt)
        if r.fmt in ("raw", "png"):
            assert (dec == orig).mean() > 0.98
        else:
            assert codecs.psnr(orig, dec) >= 38.0


# ----------------------------------------------------------------- TPS


def test_tps_interpolates_gcps_exactly():
    """TPS is an interpolator: it reproduces its GCPs (up to the 2^-16
    coefficient quantization)."""
    import numpy as np

    from gdal_ray.functions.tps import TPSTransformer

    rng = np.random.default_rng(5)
    px = np.array([0.0, 32.0, 64.0] * 3)
    pl = np.repeat([0.0, 32.0, 64.0], 3)
    gx = 1000.0 + 3.0 * px + 0.5 * pl + rng.uniform(-4, 4, 9).round(3)
    gy = 2000.0 - 0.25 * px + 2.0 * pl + rng.uniform(-4, 4, 9).round(3)
    tr = TPSTransformer(list(zip(px, pl)), list(zip(gx, gy)))
    X, Y = tr.fwd(px, pl)
    # accuracy bound: 2^-16 coefficient quantization x dst half-range
    assert np.allclose(X, gx, atol=5e-2)
    assert np.allclose(Y, gy, atol=5e-2)
    # inverse spline round-trips the GCPs too
    bx, by = tr.inv(gx, gy)
    assert np.allclose(bx, px, atol=5e-2)
    assert np.allclose(by, pl, atol=5e-2)


def test_tps_bends_nonaffinely():
    import numpy as np

    from gdal_ray.functions.tps import TPS2D

    px = np.array([0.0, 32.0, 64.0] * 3)
    pl = np.repeat([0.0, 32.0, 64.0], 3)
    gx = px.copy()
    gx[4] += 10.0  # center control point pulled sideways
    tps = TPS2D(list(zip(px, pl)), list(zip(gx, pl)))
    # midway between GCPs the bump decays but is nonzero (not affine)
    X, _ = tps(np.array([32.0]), np.array([16.0]))
    assert 0.5 < float(X[0]) - 32.0 < 10.0


def test_tps_rejects_too_few_points():
    import numpy as np
    import pytest

    from gdal_ray.functions.tps import TPS2D

    with pytest.raises(ValueError):
        TPS2D([(0.0, 0.0), (1.0, 1.0)], [(0.0, 0.0), (1.0, 1.0)])


# ----------------------------------------------------------------- RPC


def test_rpc_forward_inverse_roundtrip():
    """RPC inverse (affine-seeded fixed-point iteration) converges to
    the 0.1-px threshold on corner points for the fixture family."""
    import numpy as np

    from gdal_ray.functions.rpc import RPCModel, synth_rpc

    for i in (0, 7, 123, 999):
        m = RPCModel(**synth_rpc(i, 20, 20))
        px = np.array([0.0, 20.0, 20.0, 0.0])
        ln = np.array([0.0, 0.0, 20.0, 20.0])
        lon, lat, ok = m.inverse(px, ln)
        assert ok.all()
        bp, bl = m.forward(lon, lat)
        assert max(np.abs(bp - px).max(), np.abs(bl - ln).max()) < 0.1


def test_rpc_vectorized_matches_scalar_bitwise():
    """The engine's vectorized forward is bit-identical to a scalar
    loop evaluating the documented 20-term sequence."""
    import numpy as np

    from gdal_ray.functions.rpc import RPCModel, rpc_terms, synth_rpc

    m = RPCModel(**synth_rpc(5, 20, 20))
    X = np.linspace(m.long_off - 0.05, m.long_off + 0.05, 7)
    Y = np.linspace(m.lat_off - 0.05, m.lat_off + 0.05, 7)
    XX, YY = np.meshgrid(X, Y)
    P, L = m.forward(XX, YY)
    for a in range(7):
        for b in range(7):
            Ln = (XX[a, b] - m.long_off) / m.long_scale
            Pn = (YY[a, b] - m.lat_off) / m.lat_scale
            t = rpc_terms(np.float64(Ln), np.float64(Pn), np.float64(0.0))

            def poly(c):
                acc = c[0] * t[0]
                for k in range(1, 20):
                    acc = acc + c[k] * t[k]
                return acc

            sp = (poly(m.samp_num) / poly(m.samp_den)) * m.samp_scale + m.samp_off
            sl = (poly(m.line_num) / poly(m.line_den)) * m.line_scale + m.line_off
            assert sp == P[a, b] and sl == L[a, b]


# -------------------------------------------------------------- geoloc


def test_geoloc_forward_inverse_roundtrip():
    """Geoloc Newton inverse round-trips the forward bilinear mapping
    to well under the 0.125-px approx contract."""
    import numpy as np

    from gdal_ray.functions.geoloc import GeolocTransformer, synth_geoloc

    for i in (0, 5, 123, 999):
        glx, gly = synth_geoloc(i, 20, 20, 0.0, 0.0, 2000.0, 2000.0)
        tr = GeolocTransformer(glx, gly)
        px = np.array([0.0, 20.0, 20.0, 0.0])
        ln = np.array([0.0, 0.0, 20.0, 20.0])
        X, Y = tr.forward(px, ln)
        bp, bl = tr.inverse(X, Y)
        assert max(np.abs(bp - px).max(), np.abs(bl - ln).max()) < 1e-6
        gx = np.linspace(X.min() + 1, X.max() - 1, 9)
        gy = np.linspace(Y.min() + 1, Y.max() - 1, 9)
        XX, YY = np.meshgrid(gx, gy)
        sp, sl = tr.inverse(XX, YY)
        fx, fy = tr.forward(sp, sl)
        # residual in pixel units (gsd = 100 geo units / px)
        res = max(np.abs(fx - XX).max(), np.abs(fy - YY).max()) / 100.0
        assert res < 0.01


def test_geoloc_forward_matches_reference_bilinear():
    """Forward is the exact PixelLineToXY nested bilinear (spot check
    against direct per-point evaluation)."""
    import numpy as np

    from gdal_ray.functions.geoloc import GeolocTransformer, synth_geoloc

    glx, gly = synth_geoloc(3, 16, 16, 0.0, 0.0, 1600.0, 1600.0)
    tr = GeolocTransformer(glx, gly)
    for p, l in ((0.0, 0.0), (7.3, 2.9), (16.0, 16.0), (15.9, 0.1)):
        gp, gl = p / 4.0, l / 4.0
        iX = min(int(min(max(0.0, gp), glx.shape[1] - 1)), glx.shape[1] - 2)
        iY = min(int(min(max(0.0, gl), glx.shape[0] - 1)), glx.shape[0] - 2)
        fx, fy = gp - iX, gl - iY
        wx = (1 - fy) * (glx[iY, iX] + fx * (glx[iY, iX + 1] - glx[iY, iX])
             ) + fy * (glx[iY + 1, iX] + fx * (
                 glx[iY + 1, iX + 1] - glx[iY + 1, iX]))
        X, Y = tr.forward(np.array([p]), np.array([l]))
        assert X[0] == wx


def test_rpc_dem_inverse_roundtrip():
    """DEM-backed RPC inverse (full state machine: oscillation mean,
    boost, 20 iters) round-trips through the DEM-aware forward."""
    import numpy as np

    from gdal_ray.functions.rpc import (
        RPCModel,
        rpc_forward_dem,
        rpc_inverse_dem,
        synth_dem,
        synth_rpc_dem,
    )

    for i in (0, 7, 123, 999):
        m = RPCModel(**synth_rpc_dem(i, 20, 20))
        dem = synth_dem(i)
        px = np.array([0.0, 20.0, 20.0, 0.0])
        ln = np.array([0.0, 0.0, 20.0, 20.0])
        lon, lat, ok = rpc_inverse_dem(m, dem, px, ln)
        assert ok.all()
        bp, bl = rpc_forward_dem(m, dem, lon, lat)
        assert max(np.abs(bp - px).max(), np.abs(bl - ln).max()) < 0.1


# ------------------------------------------------------- GCP auto-order


def test_gcp_auto_order_rule():
    """order=0 auto-selection mirrors alg/gdal_crs.cpp:202-210: order 2
    from 6 GCPs up, else 1; never 3."""
    from gdal_ray.functions.gcp import auto_order

    assert auto_order(3) == 1
    assert auto_order(5) == 1
    assert auto_order(6) == 2
    assert auto_order(100) == 2


def test_gcp_order0_fits_quadratic():
    import numpy as np

    from gdal_ray.functions.gcp import GCPTransformer

    px = np.array([0.0, 16.0, 32.0, 48.0, 64.0] * 3)
    pl = np.repeat([0.0, 32.0, 64.0], 5)
    gx = 100.0 + 2.0 * px + 0.1 * pl + 0.01 * px * px
    gy = 50.0 - 0.5 * px + 3.0 * pl + 0.02 * pl * pl
    tr = GCPTransformer(list(zip(px, pl)), list(zip(gx, gy)), order=0)
    assert tr.order == 2
    X, Y = tr.fwd(px, pl)
    assert np.allclose(X, gx, atol=0.05)
    assert np.allclose(Y, gy, atol=0.05)


def test_gcp_two_corner_synthesis():
    """Two GCPs forming opposite rectangle corners synthesize a third
    (alg/gdal_crs.cpp:223-237) so the affine fit is determined."""
    import numpy as np

    from gdal_ray.functions.gcp import GCPTransformer

    tr = GCPTransformer(
        [(0.0, 0.0), (64.0, 64.0)], [(1000.0, 2000.0), (1640.0, 1360.0)],
        order=1,
    )
    assert tr.n_used == 3
    X, Y = tr.fwd(np.array([32.0]), np.array([32.0]))
    assert float(X[0]) == pytest.approx(1320.0, abs=0.1)
    assert float(Y[0]) == pytest.approx(1680.0, abs=0.1)


def test_gcp_refine_drops_outlier():
    """refine=True removes the one corrupted GCP (remove_outliers /
    worst_outlier loop) and restores the clean affine fit."""
    import numpy as np

    from gdal_ray.functions.gcp import GCPTransformer

    px = np.array([0.0, 16.0, 32.0, 48.0, 64.0] * 3)
    pl = np.repeat([0.0, 32.0, 64.0], 5)
    gx = 100.0 + 2.0 * px + 0.1 * pl
    gy = 50.0 - 0.5 * px + 3.0 * pl
    gx_bad = gx.copy()
    gx_bad[7] += 500.0  # one corrupted GCP
    pts_p = list(zip(px, pl))
    pts_g = list(zip(gx_bad, gy))
    dirty = GCPTransformer(pts_p, pts_g, order=1)
    clean = GCPTransformer(pts_p, pts_g, order=1, refine=True, tolerance=1.0)
    assert clean.n_dropped == 1 and clean.n_used == len(px) - 1
    X, Y = clean.fwd(px, pl)
    assert np.allclose(X, gx, atol=0.05)
    assert np.allclose(Y, gy, atol=0.05)
    Xd, _ = dirty.fwd(px, pl)
    assert np.abs(Xd - gx).max() > 5.0
