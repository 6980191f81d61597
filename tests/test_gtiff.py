"""GTiff/COG tiled writer + reader (sources/gtiff.py)."""

import numpy as np
import pytest

from gdal_ray.sources.gtiff import (
    _downsample2x,
    _parse_ifds,
    _tag_values,
    read_cog,
    validate_cog_layout,
    write_cog,
    write_tiff,
)


def _img(h=300, w=500, nb=3, seed=3):
    rng = np.random.default_rng(seed)
    if nb == 1:
        return rng.integers(0, 256, (h, w), np.uint8)
    return rng.integers(0, 256, (h, w, nb), np.uint8)


def test_roundtrip_rgb_deflate(tmp_path):
    img = _img()
    p = str(tmp_path / "a.tif")
    st = write_cog(p, img, envelope=(0.0, 0.0, 500.0, 300.0))
    r = read_cog(p)
    assert np.array_equal(r["img"], img)
    assert r["envelope"] == (0.0, 0.0, 500.0, 300.0)
    assert r["cog_layout"]
    assert st["levels"] == r["levels"] >= 2


def test_roundtrip_gray_uncompressed(tmp_path):
    img = _img(nb=1)
    p = str(tmp_path / "g.tif")
    write_cog(p, img, compress="none")
    r = read_cog(p)
    assert np.array_equal(r["img"], img)


def test_roundtrip_float32(tmp_path):
    img = (np.arange(200 * 130, dtype=np.float32) / 7.0).reshape(130, 200)
    p = str(tmp_path / "f.tif")
    write_cog(p, img)
    r = read_cog(p)
    assert r["img"].dtype == np.float32
    assert np.array_equal(r["img"], img)


def test_overview_levels_and_content(tmp_path):
    img = _img(512, 512)
    p = str(tmp_path / "o.tif")
    st = write_cog(p, img, overview_min=128)
    # 512 -> 256 -> 128: 3 levels
    assert st["levels"] == 3
    lvl1 = read_cog(p, level=1)["img"]
    assert lvl1.shape[:2] == (256, 256)
    assert np.array_equal(lvl1, _downsample2x(img))


def test_cog_layout_contract(tmp_path):
    img = _img(600, 700)
    p = str(tmp_path / "c.tif")
    write_cog(p, img)
    v = validate_cog_layout(p)
    assert v["valid"], v


def test_ghost_area_markers(tmp_path):
    p = str(tmp_path / "gh.tif")
    write_cog(p, _img(64, 64))
    head = open(p, "rb").read(4096)
    assert b"GDAL_STRUCTURAL_METADATA_SIZE=" in head
    assert b"LAYOUT=IFDS_BEFORE_DATA" in head
    assert b"BLOCK_TRAILER=LAST_4_BYTES_REPEATED" in head
    assert b"KNOWN_INCOMPATIBLE_EDITION=NO\n " in head


def test_rejects_bad_input(tmp_path):
    with pytest.raises(ValueError):
        write_cog(str(tmp_path / "x.tif"), np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        write_cog(str(tmp_path / "x.tif"), np.zeros((4, 4), np.int32))


def test_sink_resume(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.functions import codecs
    from gdal_ray.sources.gtiff import write_cog_sink

    imgs = [_img(40, 40, seed=i) for i in range(4)]
    t = pa.table(
        {
            "image_id": pa.array([f"im{i}" for i in range(4)], pa.string()),
            "bytes": pa.array([codecs.encode(im, "raw") for im in imgs], pa.binary()),
            "w": pa.array([40] * 4, pa.int32()),
            "h": pa.array([40] * 4, pa.int32()),
            "fmt": pa.array(["raw"] * 4, pa.string()),
            "minx": pa.array([0.0] * 4),
            "miny": pa.array([0.0] * 4),
            "maxx": pa.array([40.0] * 4),
            "maxy": pa.array([40.0] * 4),
        }
    )
    out = str(tmp_path / "cogs")
    m1 = write_cog_sink(rd.from_arrow(t), out).to_pandas()
    assert len(m1) == 4 and (m1.levels == 1).all()
    r = read_cog(m1.path.iloc[0])
    assert r["envelope"] == (0.0, 0.0, 40.0, 40.0)
    # second run: everything skipped via resume
    m2 = write_cog_sink(rd.from_arrow(t), out).to_pandas()
    assert (m2.levels == -1).all()
    # pixel equality across the sink boundary
    for i in range(4):
        got = read_cog(str(tmp_path / "cogs" / f"im{i}.tif"))["img"]
        assert np.array_equal(got, imgs[i])


# ---------------------------------------- strip / BigTIFF / predictor=2


def test_strip_roundtrip_classic_deflate(tmp_path):
    from gdal_ray.sources.gtiff import write_tiff

    img = _img(h=130, w=97)
    p = str(tmp_path / "s.tif")
    st = write_tiff(p, img, envelope=(0.0, 0.0, 97.0, 130.0),
                    rows_per_strip=48)
    assert st["strips"] == 3 and not st["bigtiff"]
    r = read_cog(p)
    assert np.array_equal(r["img"], img)
    assert r["envelope"] == (0.0, 0.0, 97.0, 130.0)
    assert not r["cog_layout"]


def test_strip_predictor2_smaller_and_exact(tmp_path):
    from gdal_ray.sources.gtiff import write_tiff

    # smooth gradient: horizontal differencing should shrink deflate
    y, x = np.mgrid[0:200, 0:300]
    img = ((x + y) % 256).astype(np.uint8)
    p1 = str(tmp_path / "p1.tif")
    p2 = str(tmp_path / "p2.tif")
    s1 = write_tiff(p1, img, predictor=1)
    s2 = write_tiff(p2, img, predictor=2)
    assert np.array_equal(read_cog(p2)["img"], img)
    assert s2["size"] < s1["size"]


def test_strip_predictor2_rgb_wraparound(tmp_path):
    from gdal_ray.sources.gtiff import write_tiff

    img = _img(h=64, w=64, nb=3, seed=9)  # random: differences wrap mod 256
    p = str(tmp_path / "w.tif")
    write_tiff(p, img, predictor=2, rows_per_strip=17)
    assert np.array_equal(read_cog(p)["img"], img)


def test_bigtiff_roundtrip(tmp_path):
    from gdal_ray.sources.gtiff import write_tiff

    img = _img(h=150, w=200)
    p = str(tmp_path / "b.tif")
    st = write_tiff(p, img, envelope=(1.0, 2.0, 201.0, 152.0),
                    bigtiff=True, predictor=2)
    assert st["bigtiff"]
    with open(p, "rb") as f:
        assert f.read(4) == b"II\x2b\x00"  # magic 43
    r = read_cog(p)
    assert np.array_equal(r["img"], img)
    assert r["envelope"] == (1.0, 2.0, 201.0, 152.0)


def test_strip_float32_roundtrip(tmp_path):
    from gdal_ray.sources.gtiff import write_tiff

    img = np.linspace(0, 1, 80 * 60, dtype=np.float32).reshape(80, 60)
    p = str(tmp_path / "f.tif")
    write_tiff(p, img, rows_per_strip=33)
    assert np.array_equal(read_cog(p)["img"], img)


def test_write_tiff_rejects_bad_combo(tmp_path):
    from gdal_ray.sources.gtiff import write_tiff

    img = np.zeros((8, 8), np.float32)
    with pytest.raises(ValueError):
        write_tiff(str(tmp_path / "x.tif"), img, predictor=2)


def test_read_tiff_source_roundtrip(ray_session, tmp_path):
    from gdal_ray.sources.gtiff import read_tiff_source, write_tiff

    imgs = {f"chip{i}": _img(h=40, w=50, seed=i) for i in range(4)}
    for name, img in imgs.items():
        write_tiff(str(tmp_path / f"{name}.tif"), img,
                    envelope=(0.0, 0.0, 50.0, 40.0),
                    bigtiff=(hash(name) % 2 == 0), predictor=2)
    out = read_tiff_source(str(tmp_path)).take_all()
    assert len(out) == 4
    for row in out:
        img = imgs[row["image_id"]]
        got = np.frombuffer(row["bytes"], np.uint8).reshape(40, 50, 3)
        assert np.array_equal(got, img)
        assert row["minx"] == 0.0 and row["maxy"] == 40.0


def test_uint16_strip_roundtrip_predictor2(tmp_path):
    from gdal_ray.sources.gtiff import write_tiff

    rng = np.random.default_rng(4)
    img = rng.integers(0, 65536, (90, 70), np.uint16)
    p = str(tmp_path / "u16.tif")
    write_tiff(p, img, predictor=2, rows_per_strip=37)
    r = read_cog(p)
    assert r["img"].dtype == np.uint16
    assert np.array_equal(r["img"], img)


def test_planar2_band_sequential_roundtrip(tmp_path):
    from gdal_ray.sources.gtiff import write_tiff

    img = _img(h=75, w=101, nb=3, seed=12)
    p = str(tmp_path / "pl2.tif")
    st = write_tiff(p, img, planar=2, rows_per_strip=32, predictor=2)
    assert st["strips"] == 3 * 3  # ceil(75/32)=3 strips x 3 planes
    assert np.array_equal(read_cog(p)["img"], img)


def test_planar2_uint16_bigtiff(tmp_path):
    from gdal_ray.sources.gtiff import write_tiff

    rng = np.random.default_rng(5)
    img = rng.integers(0, 65536, (40, 55, 3), np.uint16)
    p = str(tmp_path / "pl2b.tif")
    write_tiff(p, img, planar=2, bigtiff=True, predictor=2,
               envelope=(0.0, 0.0, 55.0, 40.0))
    r = read_cog(p)
    assert np.array_equal(r["img"], img)
    assert r["envelope"] == (0.0, 0.0, 55.0, 40.0)


def test_cog_webp_compression_round_trip(tmp_path):
    """COMPRESSION=50001 (WEBP, the common COG choice in the
    reference's ecosystem) through the in-engine VP8L codec: lossless
    round trip, overview levels decoded, single-band/strip rejections."""
    import numpy as np

    from gdal_ray.sources.gtiff import read_cog, write_cog

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (300, 520, 3), np.uint8)
    p = str(tmp_path / "w.tif")
    info = write_cog(p, img, envelope=(0.0, 0.0, 5200.0, 3000.0),
                     compress="webp")
    assert info["levels"] == 3
    back = read_cog(p)
    assert (back["img"] == img).all()
    assert back["envelope"] == (0.0, 0.0, 5200.0, 3000.0)
    ov = read_cog(p, level=1)
    assert ov["img"].shape == (150, 260, 3)
    # each tile blob is a RIFF container
    raw = open(p, "rb").read()
    assert raw.count(b"RIFF") == info["tiles"]
    with pytest.raises(ValueError, match="uint8 3-band"):
        write_cog(str(tmp_path / "b.tif"), img[:, :, 0], compress="webp")
    with pytest.raises(ValueError, match="uint8 3-band"):
        write_cog(str(tmp_path / "f.tif"),
                  img.astype(np.float32), compress="webp")


# ------------------------------------------- JPEG-in-TIFF (COMPRESSION=7)


def _smoothj(h, w):
    x = np.linspace(0.0, 6.0, w)
    y = np.linspace(0.0, 4.0, h)
    return (np.sin(x)[None, :] * np.cos(y)[:, None] * 100.0 + 128.0)


def _psnrj(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10.0 * np.log10(255.0 ** 2 / mse)


def test_jpeg_cog_tiles_roundtrip(tmp_path):
    """COMPRESSION=7 (TIFF 6.0 TechNote 2 new-style JPEG): one
    complete baseline JFIF stream per tile through the in-engine T.81
    codec; PHOTOMETRIC=YCbCr (6) per the GDAL/libtiff RGB-JPEG
    convention; PSNR >= 40 round trip incl. overview levels."""
    base = _smoothj(420, 700)
    rgb = np.stack([base, base * 0.8 + 20.0, 255.0 - base],
                   axis=-1).clip(0, 255).astype(np.uint8)
    p = str(tmp_path / "j.tif")
    st = write_cog(p, rgb, envelope=(0.0, 0.0, 700.0, 420.0),
                   compress="jpeg", quality=90)
    r = read_cog(p)
    assert r["img"].shape == rgb.shape
    assert _psnrj(r["img"], rgb) >= 40.0
    assert st["levels"] >= 2
    ov = read_cog(p, level=1)["img"]
    assert ov.shape[:2] == (210, 350)
    # tag anchors: COMPRESSION=7, PHOTOMETRIC=6, tile data starts SOI
    buf = open(p, "rb").read()
    ifds, big, _ = _parse_ifds(buf)
    comp = _tag_values(buf, ifds[0], 259, big)[0]
    photo = _tag_values(buf, ifds[0], 262, big)[0]
    assert comp == 7 and photo == 6
    off = _tag_values(buf, ifds[0], 324, big)[0]
    assert buf[off:off + 2] == b"\xff\xd8"


def test_jpeg_tiff_strips_and_mono(tmp_path):
    base = _smoothj(200, 260)
    mono = base.clip(0, 255).astype(np.uint8)
    p = str(tmp_path / "jm.tif")
    write_tiff(p, mono, compress="jpeg", rows_per_strip=64)
    r = read_cog(p)
    assert r["img"].shape == mono.shape
    assert _psnrj(r["img"], mono) >= 40.0
    buf = open(p, "rb").read()
    ifds, big, _ = _parse_ifds(buf)
    assert _tag_values(buf, ifds[0], 262, big)[0] == 1  # mono stays 1


def test_jpeg_model_exact_interior_tile(tmp_path):
    """Decoded interior tile equals the codec's jpeg_model (Huffman is
    lossless) — the oracle contract carried into the container."""
    from gdal_ray.functions.jpegc import jpeg_model

    base = _smoothj(256, 256)
    rgb = np.stack([base, base, base], axis=-1).clip(0, 255).astype(np.uint8)
    p = str(tmp_path / "je.tif")
    write_cog(p, rgb, compress="jpeg", quality=90, overview_min=1024)
    dec = read_cog(p)["img"]
    assert np.array_equal(dec, np.asarray(jpeg_model(rgb, 90)))


def test_jpeg_guards(tmp_path):
    f32 = np.zeros((32, 32), np.float32)
    with pytest.raises(ValueError, match="uint8"):
        write_cog(str(tmp_path / "x.tif"), f32, compress="jpeg")
    u8 = np.zeros((32, 32), np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        write_tiff(str(tmp_path / "x.tif"), u8, compress="jpeg",
                   predictor=2)
