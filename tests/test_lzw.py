"""TIFF-flavor LZW codec (functions.lzw) + its GTiff integration
(compression id 5, strips and COG tiles, predictor 2 composition).

Reference behavior: frmts/gtiff via libtiff's tif_lzw.c (TIFF 6.0
section 13 with the de-facto "early change" convention).
"""

import numpy as np
import pytest

from gdal_ray.functions.lzw import lzw_decode, lzw_encode


def _bits_to_bytes(bits: str) -> bytes:
    bits = bits + "0" * (-len(bits) % 8)
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


def test_hand_assembled_anchor():
    """A stream built BIT BY BIT from the spec decodes correctly:
    Clear(256) + 'H'(72) + 'i'(105) + EOI(257) at 9 bits each."""
    bits = "{:09b}{:09b}{:09b}{:09b}".format(256, 72, 105, 257)
    assert lzw_decode(_bits_to_bytes(bits)) == b"Hi"
    # and the encoder produces exactly that canonical stream
    assert lzw_encode(b"Hi") == _bits_to_bytes(bits)


def test_repeat_run_uses_table():
    """'ababab...' packs through string-table hits (KwKwK case on
    decode)."""
    data = b"ab" * 50
    enc = lzw_encode(data)
    assert len(enc) < len(data) // 2
    assert lzw_decode(enc) == data


def test_width_boundaries_and_reset():
    """Streams long enough to cross the 9->10->11->12-bit boundaries
    and force full-table Clear resets round-trip exactly."""
    rng = np.random.default_rng(7)
    for data in (
        bytes(rng.integers(0, 256, 120_000).astype(np.uint8)),
        bytes(rng.integers(0, 5, 400_000).astype(np.uint8)),
        b"\x00" * 700_000,
        bytes(range(256)) * 400,
    ):
        assert lzw_decode(lzw_encode(data)) == data


def test_decode_guards():
    with pytest.raises(ValueError, match="literal"):
        lzw_decode(_bits_to_bytes("{:09b}{:09b}".format(256, 300)))
    data = b"xyz" * 1000
    with pytest.raises(ValueError, match="exceeds"):
        lzw_decode(lzw_encode(data), max_out=10)


def test_gtiff_lzw_roundtrips(tmp_path):
    """LZW in both GTiff layouts: COG tiles (with overviews) and
    classic strips with predictor 2; compression tag anchored to 5."""
    import struct

    from gdal_ray.sources.gtiff import read_cog, write_cog, write_tiff

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (300, 340, 3)).astype(np.uint8)
    p = str(tmp_path / "c.tif")
    write_cog(p, img, envelope=(0.0, 0.0, 340.0, 300.0),
              compress="lzw")
    got = read_cog(p)
    np.testing.assert_array_equal(got["img"], img)
    assert struct.pack("<HHI", 259, 3, 1) + struct.pack(
        "<HH", 5, 0) in open(p, "rb").read()   # COMPRESSION=5 entry

    g = rng.integers(0, 65535, (100, 90)).astype(np.uint16)
    p2 = str(tmp_path / "s.tif")
    write_tiff(p2, g, compress="lzw", predictor=2)
    np.testing.assert_array_equal(read_cog(p2)["img"], g)

    # predictor 2 under LZW wins big on smooth rasters
    import os

    sm = (np.arange(200)[:, None] + np.arange(240)[None, :]).astype(
        np.uint16)
    p3 = str(tmp_path / "p1.tif")
    p4 = str(tmp_path / "p2.tif")
    write_tiff(p3, sm, compress="lzw", predictor=1)
    write_tiff(p4, sm, compress="lzw", predictor=2)
    assert os.path.getsize(p4) < os.path.getsize(p3) // 4
    np.testing.assert_array_equal(read_cog(p4)["img"], sm)

    # write_tiff rejects webp (tile-only) loudly now
    with pytest.raises(ValueError, match="tile-only"):
        write_tiff(str(tmp_path / "x.tif"), img, compress="webp")
