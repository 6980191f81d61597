import numpy as np
import pytest

from gdal_ray.functions import checksum, codecs
from gdal_ray.synth.make_table import chip_pixels


@pytest.fixture
def img():
    return chip_pixels(7, 33, 21)


def test_raw_roundtrip(img):
    assert np.array_equal(codecs.decode(codecs.encode(img, "raw"), 33, 21, "raw"), img)


def test_png_roundtrip(img):
    data = codecs.encode(img, "png")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(codecs.decode(data, 33, 21, "png"), img)


def test_png_deterministic(img):
    assert codecs.encode(img, "png") == codecs.encode(img, "png")


def test_qraw_psnr_over_40(img):
    out = codecs.decode(codecs.encode(img, "qraw"), 33, 21, "qraw")
    assert codecs.psnr(img, out) >= 40.0


def test_png_filter_decoding():
    # exercise Sub/Up/Average/Paeth reconstruction paths
    import struct
    import zlib

    h, w = 4, 3
    img = chip_pixels(3, w, h)
    raw = bytearray()
    prev = np.zeros(w * 3, np.int32)
    flat = img.reshape(h, w * 3).astype(np.int32)
    for y, f in zip(range(h), (1, 2, 3, 4)):
        line = flat[y]
        enc = np.zeros(w * 3, np.int32)
        for i in range(w * 3):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
            enc[i] = (line[i] - pred) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(data), img)


def test_checksum_matches_direct_formula():
    primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    img = chip_pixels(1, 20, 20)
    band = img[:, :, 0]
    want = 0
    for p, v in enumerate(band.reshape(-1)):
        want += int(v) % primes[p % 11]
        want &= 0xFFFF
    assert checksum.checksum_band(band) == want


def test_checksum_float_path():
    # IntFromDouble: add 0.5 then floor -> 1.4->1, 1.5->2, -2.6->-3
    # truncating C % : 1%7=1, 2%11=2, -3%13=-3 -> sum 0 -> & 0xffff = 0
    a = np.array([[1.4, 1.5, -2.6]])
    assert checksum.checksum_float_band(a) == 0
    b = np.array([[np.inf, np.nan, 0.0]])
    assert checksum.checksum_float_band(b) == checksum.checksum_float_band(b)


def test_jpeg_roundtrip_psnr_and_model():
    import numpy as np

    from gdal_ray.functions import codecs, jpegc
    from gdal_ray.synth.make_table import chip_pixels

    for i, (w, h) in enumerate([(16, 20), (20, 64), (64, 64)]):
        img = chip_pixels(i * 31 + 5, w, h)
        data = codecs.encode(img, "jpeg")
        dec = codecs.decode(data, w, h, "jpeg")
        # Huffman is lossless: decode equals the DCT-quantization model
        assert np.array_equal(dec, jpegc.jpeg_model(img, codecs.JPEG_QUALITY))
        assert codecs.psnr(img, dec) >= 40.0  # BASELINE.md lossy-parity gate
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"


def test_jpeg_odd_sizes_and_flat():
    import numpy as np

    from gdal_ray.functions import jpegc

    flat = np.full((10, 13, 3), 77, np.uint8)
    dec = jpegc.decode_jpeg(jpegc.encode_jpeg(flat, 90))
    assert dec.shape == flat.shape
    assert np.abs(dec.astype(int) - 77).max() <= 2


def test_jpeg_vectorized_scan_matches_block_loop():
    """The vectorized emission-stream entropy coder (_encode_scan) is
    bit-identical to the per-block T.81 F.1.2 reference loop
    (_encode_block + _BitWriter) — fuzz across sparse/dense/all-zero
    blocks, long zero runs (ZRL chains) and coefs at coef 63 (no EOB)."""
    import numpy as np

    from gdal_ray.functions import jpegc as J

    def scan_ref(zzs, tabs):
        bw = J._BitWriter()
        preds = [0, 0, 0]
        for m in range(zzs[0].shape[0]):
            for ci, (dc_tab, ac_tab) in enumerate(tabs):
                preds[ci] = J._encode_block(
                    bw, zzs[ci][m], preds[ci], dc_tab, ac_tab
                )
        return bw.flush()

    dc_l, dc_c = J._huff_codes(*J._DC_L), J._huff_codes(*J._DC_C)
    ac_l, ac_c = J._huff_codes(*J._AC_L), J._huff_codes(*J._AC_C)
    tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    rng = np.random.default_rng(7)
    for trial in range(25):
        n_mcu = int(rng.integers(1, 30))
        zzs = []
        for _ in range(3):
            z = np.zeros((n_mcu, 64), np.int32)
            for m in range(n_mcu):
                nnz = int(rng.integers(0, 12))
                pos = rng.choice(64, nnz, replace=False)
                z[m, pos] = rng.integers(-1023, 1024, nnz)
                if rng.random() < 0.2:
                    z[m] = 0  # all-zero block: immediate EOB
                if rng.random() < 0.2:
                    z[m, 63] = int(rng.integers(-255, 256)) or 1  # no EOB
            zzs.append(z)
        assert scan_ref(zzs, tabs) == J._encode_scan(zzs, tabs), trial


def test_jpeg_420_model_exact_and_fuzz():
    """4:2:0 baseline JPEG (the libjpeg-default real-world layout):
    decoded pixels equal jpeg_model_420 (Huffman losslessness over
    the 4-Y+Cb+Cr MCU interleave), across sizes that exercise every
    MCU edge case."""
    from gdal_ray.functions import jpegc

    rng = np.random.default_rng(42)
    for h, w in ((16, 16), (8, 8), (17, 33), (48, 31), (120, 200)):
        x = np.linspace(0.0, 5.0, w)
        y = np.linspace(0.0, 3.0, h)
        base = np.sin(x)[None, :] * np.cos(y)[:, None] * 90.0 + 128.0
        img = np.stack([base, base * 0.7 + 30.0, 255.0 - base],
                       axis=-1)
        img = (img + rng.normal(0.0, 6.0, img.shape)).clip(
            0, 255).astype(np.uint8)
        dec = jpegc.decode_jpeg(jpegc.encode_jpeg_420(img, 90))
        assert dec.shape == img.shape
        assert np.array_equal(dec, jpegc.jpeg_model_420(img, 90)), \
            (h, w)


def test_jpeg_420_psnr_and_size():
    from gdal_ray.functions import jpegc

    x = np.linspace(0.0, 6.0, 400)
    y = np.linspace(0.0, 4.0, 300)
    base = np.sin(x)[None, :] * np.cos(y)[:, None] * 100.0 + 128.0
    rgb = np.stack([base, base * 0.8 + 20.0, 255.0 - base],
                   axis=-1).clip(0, 255).astype(np.uint8)
    enc420 = jpegc.encode_jpeg_420(rgb, 90)
    enc444 = jpegc.encode_jpeg(rgb, 90)
    assert len(enc420) < 0.8 * len(enc444)     # chroma halved
    dec = jpegc.decode_jpeg(enc420)
    mse = np.mean((dec.astype(float) - rgb.astype(float)) ** 2)
    assert 10.0 * np.log10(255.0 ** 2 / mse) >= 40.0


def test_jpeg_decoder_sof_guards():
    from gdal_ray.functions import jpegc

    img = np.zeros((16, 16, 3), np.uint8)
    data = bytearray(jpegc.encode_jpeg(img, 90))
    # flip SOF0 marker to SOF2 (progressive) -> loud error
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="baseline"):
        jpegc.decode_jpeg(bytes(data))


def test_jpeg_420_in_cog(tmp_path):
    from gdal_ray.sources.gtiff import read_cog, write_cog

    x = np.linspace(0.0, 6.0, 520)
    y = np.linspace(0.0, 4.0, 300)
    base = np.sin(x)[None, :] * np.cos(y)[:, None] * 100.0 + 128.0
    rgb = np.stack([base, base, base], axis=-1).clip(
        0, 255).astype(np.uint8)
    p = str(tmp_path / "j420.tif")
    write_cog(p, rgb, compress="jpeg", quality=90, subsampling="420")
    dec = read_cog(p)["img"]
    mse = np.mean((dec.astype(float) - rgb.astype(float)) ** 2)
    assert 10.0 * np.log10(255.0 ** 2 / mse) >= 40.0


def test_png_gray_16bit_palette_variants():
    """PNG color-surface parity with the reference PNG driver
    (frmts/png): grayscale 8, grayscale 16 (big-endian samples —
    byte anchor), RGBA, and palette (PLTE) expansion."""
    import struct as st

    from gdal_ray.functions import codecs

    rng = np.random.default_rng(42)
    g8 = rng.integers(0, 255, (15, 25), dtype=np.uint8)
    assert np.array_equal(
        codecs.decode_png(codecs.encode_png_gray(g8)), g8)
    g16 = rng.integers(0, 65535, (12, 17), dtype=np.uint16)
    data = codecs.encode_png_gray(g16)
    # IHDR anchor: depth 16, ctype 0
    assert data[8:16] == st.pack(">I", 13) + b"IHDR"
    w, h, depth, ctype = st.unpack_from(">IIBB", data, 16)
    assert (w, h, depth, ctype) == (17, 12, 16, 0)
    d16 = codecs.decode_png(data)
    assert d16.dtype == np.uint16 and np.array_equal(d16, g16)
    # first sample stored big-endian
    import zlib as _z

    idat_off = data.find(b"IDAT") + 4
    ln = st.unpack(">I", data[data.find(b"IDAT") - 4:
                              data.find(b"IDAT")])[0]
    raw = _z.decompress(data[idat_off:idat_off + ln])
    assert raw[1] == (int(g16[0, 0]) >> 8)
    assert raw[2] == (int(g16[0, 0]) & 0xFF)
    pal = rng.integers(0, 255, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (10, 14), dtype=np.uint8)
    dp = codecs.decode_png(codecs.encode_png_palette(idx, pal))
    assert np.array_equal(dp, pal[idx])


def test_jpeg_restart_interval_decode():
    """DRI/RSTn support (T.81 F.2.1.3.1): a hand-assembled stream
    with an 8-MCU restart interval — segments byte-aligned, DC
    predictors reset at each RST marker — decodes model-exactly."""
    import struct as st

    from gdal_ray.functions import jpegc

    g = (np.linspace(0.0, 255.0, 48 * 64).reshape(48, 64)).astype(
        np.uint8)
    strips = [g[r:r + 8] for r in range(0, 48, 8)]
    parts = []
    for strip in strips:
        data = jpegc.encode_jpeg_gray(strip, 90)
        i = data.find(b"\xff\xda")
        ln = st.unpack(">H", data[i + 2:i + 4])[0]
        parts.append(data[i + 2 + ln:-2])
    full = jpegc.encode_jpeg_gray(g, 90)
    i = full.find(b"\xff\xda")
    ln = st.unpack(">H", full[i + 2:i + 4])[0]
    dri = st.pack(">HHH", 0xFFDD, 4, 8)      # 8 MCUs per segment
    body = b""
    for k, sc in enumerate(parts):
        body += sc
        if k < len(parts) - 1:
            body += bytes([0xFF, 0xD0 + (k % 8)])
    stream = full[:i] + dri + full[i:i + 2 + ln] + body + b"\xff\xd9"
    dec = jpegc.decode_jpeg(stream)
    want = np.vstack([jpegc.jpeg_model_gray(s_, 90) for s_ in strips])
    assert np.array_equal(dec, want)
    # truncated segment list fails loudly
    bad = full[:i] + dri + full[i:i + 2 + ln] + parts[0] + b"\xff\xd9"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="restart"):
        jpegc.decode_jpeg(bad)


def test_jpeg_422_model_exact_and_fuzz():
    """4:2:2 baseline JPEG (broadcast/DV layout, 16x8 MCUs of
    2 Y + Cb + Cr, chroma halved horizontally only): decoded pixels
    equal jpeg_model_422, across MCU edge cases; SOF carries the
    0x21 luma sampling byte."""
    from gdal_ray.functions import jpegc

    rng = np.random.default_rng(7)
    for h, w in ((8, 16), (8, 8), (17, 33), (40, 31), (120, 200)):
        x = np.linspace(0.0, 5.0, w)
        y = np.linspace(0.0, 3.0, h)
        base = np.sin(x)[None, :] * np.cos(y)[:, None] * 90.0 + 128.0
        img = np.stack([base, base * 0.7 + 30.0, 255.0 - base],
                       axis=-1)
        img = (img + rng.normal(0.0, 6.0, img.shape)).clip(
            0, 255).astype(np.uint8)
        enc = jpegc.encode_jpeg_422(img, 90)
        i = enc.find(b"\xff\xc0")
        assert enc[i + 11] == 0x21          # Y h=2, v=1
        dec = jpegc.decode_jpeg(enc)
        assert dec.shape == img.shape
        assert np.array_equal(dec, jpegc.jpeg_model_422(img, 90)), \
            (h, w)


def test_jpeg_422_size_between_444_and_420():
    from gdal_ray.functions import jpegc

    x = np.linspace(0.0, 6.0, 400)
    y = np.linspace(0.0, 4.0, 300)
    base = np.sin(x)[None, :] * np.cos(y)[:, None] * 100.0 + 128.0
    rgb = np.stack([base, base * 0.8 + 20.0, 255.0 - base],
                   axis=-1).clip(0, 255).astype(np.uint8)
    e444 = jpegc.encode_jpeg(rgb, 90)
    e422 = jpegc.encode_jpeg_422(rgb, 90)
    e420 = jpegc.encode_jpeg_420(rgb, 90)
    assert len(e420) < len(e422) < len(e444)
    dec = jpegc.decode_jpeg(e422)
    mse = np.mean((dec.astype(float) - rgb.astype(float)) ** 2)
    assert 10.0 * np.log10(255.0 ** 2 / mse) >= 40.0


def test_png_adam7_interlaced_decode():
    """Adam7 interlaced PNG (spec 8.2): an interlaced file assembled
    INDEPENDENTLY in this test (pass lattice sliced straight from the
    pixel array, filter-0 scanlines, and a filter-2 variant) decodes
    identical to the same pixels' non-interlaced encoding; RGB and
    grayscale; degenerate tiny images where some passes are empty."""
    import struct
    import zlib

    from gdal_ray.functions import codecs

    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    def chunk(tag, payload):
        body = tag + payload
        return (struct.pack(">I", len(payload)) + body
                + struct.pack(">I", zlib.crc32(body)))

    def build_interlaced(img, up_filter=False):
        if img.ndim == 2:
            ctype, spp = 0, 1
            a = img[:, :, None]
        else:
            ctype, spp = 2, 3
            a = img
        h, w = a.shape[:2]
        stream = bytearray()
        for x0, y0, dx, dy in passes:
            sub = a[y0::dy, x0::dx]
            hp, wp = sub.shape[:2]
            if hp == 0 or wp == 0:
                continue
            flat = sub.reshape(hp, wp * spp).astype(np.int32)
            for j in range(hp):
                if up_filter and j > 0:
                    stream.append(2)
                    stream += bytes(((flat[j] - flat[j - 1]) & 0xFF)
                                    .astype(np.uint8).tobytes())
                else:
                    stream.append(0)
                    stream += bytes(flat[j].astype(np.uint8).tobytes())
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
        sig = b"\x89PNG\r\n\x1a\n"
        return (sig + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(stream)))
                + chunk(b"IEND", b""))

    rng = np.random.default_rng(5)
    for shape in ((13, 21, 3), (8, 8, 3), (3, 2), (1, 1), (20, 5)):
        img = rng.integers(0, 255, shape).astype(np.uint8)
        for up in (False, True):
            dec = codecs.decode_png(build_interlaced(img, up))
            np.testing.assert_array_equal(dec, img), (shape, up)
