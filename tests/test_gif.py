"""GIF87a source/sink (sources.gif) + the GIF-variant LZW
(functions.lzw): byte anchors against the published layout, exact and
median-cut palette paths, sub-block framing, extension skipping.

Reference behavior: frmts/gif (giflib-linked; ours is from scratch).
"""

import struct

import numpy as np
import pytest

from gdal_ray.functions.lzw import gif_lzw_decode, gif_lzw_encode
from gdal_ray.sources.gif import read_gif, write_gif


def test_gif_lzw_hand_anchor():
    """mcs=2 stream built bit-by-bit (LSB-first): Clear(4) + 0 + 6
    (KwKwK) + 6 + EOI decodes to five zeros; the encoder emits exactly
    that canonical stream."""
    enc = gif_lzw_encode(bytes(5), 2)
    # codes 4,0,6 at 3 bits then 6,5 at 4 bits, LSB-first
    acc = 4 | (0 << 3) | (6 << 6) | (6 << 9) | (5 << 13)
    want = bytes([acc & 0xFF, (acc >> 8) & 0xFF, (acc >> 16) & 0xFF])
    assert enc == want
    assert gif_lzw_decode(enc, 2) == bytes(5)


def test_gif_lzw_matrix():
    rng = np.random.default_rng(8)
    for mcs, hi in ((2, 4), (4, 16), (8, 256)):
        for data in (b"", bytes(1), bytes([1, 0] * 150000),
                     bytes(rng.integers(0, hi, 120000).astype(np.uint8))):
            assert gif_lzw_decode(gif_lzw_encode(data, mcs), mcs) == data
    with pytest.raises(ValueError, match="symbol"):
        gif_lzw_encode(b"\x09", 2)


def test_gif_byte_anchors(tmp_path):
    p = str(tmp_path / "a.gif")
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [10, 20, 30]], np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    write_gif(p, pal[idx])
    buf = open(p, "rb").read()
    assert buf[:6] == b"GIF87a"
    w, h, packed, bg, ar = struct.unpack("<HHBBB", buf[6:13])
    assert (w, h) == (4, 2)
    assert packed & 0x80                          # global color table
    n = 2 << (packed & 0x07)
    assert n == 4                                 # 2-bit table
    # image descriptor after the table
    off = 13 + n * 3
    assert buf[off] == 0x2C
    assert struct.unpack("<HHHH", buf[off + 1:off + 9]) == (0, 0, 4, 2)
    assert buf[-1] == 0x3B and buf[-2] == 0x00    # trailer + terminator
    got = read_gif(p)
    np.testing.assert_array_equal(got, pal[idx])


def test_gif_exact_and_quantized(tmp_path):
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (200, 3)).astype(np.uint8)
    img = pal[rng.integers(0, 200, (40, 50))]
    p = str(tmp_path / "e.gif")
    write_gif(p, img)
    np.testing.assert_array_equal(read_gif(p), img)     # exact path
    tc = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    p2 = str(tmp_path / "q.gif")
    write_gif(p2, tc, n_colors=256, dither=True)
    got = read_gif(p2)
    assert got.shape == tc.shape
    assert np.abs(got.astype(int) - tc.astype(int)).mean() < 24


def test_gif_subblocks_and_extension_skip(tmp_path):
    """> 255-byte LZW payloads split into sub-blocks; a GIF89a
    extension block before the image descriptor is skipped."""
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (80, 90)).astype(np.uint8)
    p = str(tmp_path / "s.gif")
    write_gif(p, img)
    buf = bytearray(open(p, "rb").read())
    # splice a Graphic Control Extension before the image descriptor
    off = 13 + 256 * 3
    assert buf[off] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(buf[:off]) + gce + bytes(buf[off:])
    patched = b"GIF89a" + patched[6:]
    p2 = str(tmp_path / "s89.gif")
    open(p2, "wb").write(patched)
    np.testing.assert_array_equal(read_gif(p2),
                                  np.repeat(img[:, :, None], 3, 2))
    with pytest.raises(ValueError, match="not a GIF"):
        read_gif(__file__)
