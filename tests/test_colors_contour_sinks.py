"""Median cut / dither, marching squares, tile tree sink."""

import os

import numpy as np

from gdal_ray.functions import colors, contour_ms
from gdal_ray.synth.make_table import chip_pixels


def test_median_cut_and_quantize():
    img = chip_pixels(3, 32, 32)
    pal = colors.median_cut_palette(img, 16)
    assert pal.shape == (16, 3)
    idx = colors.quantize(img, pal)
    rec = colors.apply_palette(idx, pal)
    err = np.abs(rec.astype(int) - img.astype(int)).mean()
    assert err < 40  # quantization error bounded
    # determinism
    assert np.array_equal(pal, colors.median_cut_palette(img, 16))


def test_dither_reduces_mean_error():
    img = chip_pixels(5, 24, 24)
    pal = colors.median_cut_palette(img, 8)
    plain = colors.apply_palette(colors.quantize(img, pal), pal)
    dith = colors.apply_palette(colors.dither_floyd_steinberg(img, pal), pal)
    # dithering preserves local mean better than plain quantization
    def block_mean_err(out):
        a = img.astype(np.float64).reshape(6, 4, 6, 4, 3).mean(axis=(1, 3))
        b = out.astype(np.float64).reshape(6, 4, 6, 4, 3).mean(axis=(1, 3))
        return np.abs(a - b).mean()

    assert block_mean_err(dith) <= block_mean_err(plain) + 1e-9


def test_marching_squares_circle():
    yy, xx = np.mgrid[0:32, 0:32]
    g = np.hypot(yy - 16, xx - 16)
    segs = contour_ms.marching_squares(g, 8.0)
    assert len(segs) > 0
    # every segment endpoint lies (by interpolation) close to the circle
    for x0, y0, x1, y1 in segs:
        for x, y in ((x0, y0), (x1, y1)):
            assert abs(np.hypot(y - 16, x - 16) - 8.0) < 0.75
    # total perimeter approximates 2*pi*r
    length = sum(np.hypot(x1 - x0, y1 - y0) for x0, y0, x1, y1 in segs)
    assert abs(length - 2 * np.pi * 8) / (2 * np.pi * 8) < 0.05


def test_contour_levels():
    g = np.array([[0.0, 10.0], [20.0, 30.0]])
    assert contour_ms.contour_levels(g, 10.0) == [10.0, 20.0]


def test_tile_tree_sink_roundtrip(ray_session, smoke_fixtures, tmp_path):
    import ray.data as rd

    from gdal_ray.sources.sinks import read_tile_tree, write_tile_tree
    from gdal_ray.stages.tiles import build_base_tiles

    imgs = rd.read_parquet(smoke_fixtures["images"]).limit(200)
    tiles = build_base_tiles(imgs, zoom=8, resampling="near").materialize()
    out = str(tmp_path / "tree")
    c1 = write_tile_tree(tiles, out, xyz=True).to_pandas()
    n = tiles.count()
    assert c1.written.sum() == n and c1.skipped.sum() == 0
    # resume: second write skips everything
    c2 = write_tile_tree(tiles, out, xyz=True).to_pandas()
    assert c2.written.sum() == 0 and c2.skipped.sum() == n
    # XYZ layout on disk: y flipped vs TMS rows
    row = tiles.take(1)[0]
    from gdal_ray.functions import mercator

    y_xyz = int(mercator.tms_to_xyz(np.int64(row["y"]), np.int64(row["z"])))
    assert os.path.exists(os.path.join(out, str(row["z"]), str(row["x"]), f"{y_xyz}.png"))
    # read back: identical (z, x, y TMS, bytes)
    back = read_tile_tree(out, xyz=True).to_pandas()
    assert len(back) == n
    orig = tiles.to_pandas()
    a = {(r.z, r.x, r.y): r.tile_bytes for r in orig.itertuples()}
    b = {(r.z, r.x, r.y): r.tile_bytes for r in back.itertuples()}
    assert a == b


def test_dither_wavefront_bitwise_equal():
    import numpy as np

    from gdal_ray.functions import colors

    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (2, 5), (16, 16), (13, 29), (40, 7)]:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        pal = colors.median_cut_palette(img, 16)
        a = colors.dither_floyd_steinberg(img, pal)
        b = colors.dither_floyd_steinberg_wavefront(img, pal)
        assert np.array_equal(a, b), (h, w)


def test_dither_batch_bitwise_equal():
    import numpy as np

    from gdal_ray.functions import colors

    rng = np.random.RandomState(4)
    B = 7
    imgs = rng.randint(0, 256, (B, 16, 16, 3)).astype(np.uint8)
    pals = np.stack([colors.median_cut_palette(imgs[i], 16) for i in range(B)])
    batch = colors.dither_floyd_steinberg_batch(imgs, pals)
    for i in range(B):
        assert np.array_equal(batch[i], colors.dither_floyd_steinberg(imgs[i], pals[i]))
