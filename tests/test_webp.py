"""WebP lossless (VP8L) codec: raw-bit anchors + round trips.

No libwebp/PIL exists in this container, so (as with the netCDF
driver) correctness is gated by hand-computed header/bit anchors
against the public spec plus exhaustive option-matrix round trips.
Reference driver: frmts/webp/webpdataset.cpp (libwebp delegate);
VP8L signature sniff webpdrivercore.cpp:32.
"""

import numpy as np
import pytest

from gdal_ray.functions.webp import (
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _code_to_dist,
    _dist_lut,
    _limited_lengths,
    _lz77_prefix,
    _lz77_value,
    decode_webp,
    encode_webp,
    webp_info,
)


def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

def test_bitwriter_lsb_first_layout():
    bw = _BitWriter()
    bw.put(0b1, 1)
    bw.put(0b01, 2)       # bits 1,0
    bw.put(0b10110, 5)    # bits 0,1,1,0,1
    data = bw.tobytes()
    # stream bits in order: 1, 1,0, 0,1,1,0,1 -> byte LSB-first
    assert data == bytes([0b10110011])


def test_bitreader_round_trip():
    bw = _BitWriter()
    fields = [(5, 3), (0, 1), (16383, 14), (1, 1), (255, 8), (0, 0), (9, 4)]
    for v, n in fields:
        bw.put(v, n)
    br = _BitReader(bw.tobytes())
    for v, n in fields:
        assert br.read(n) == v


def test_bitwriter_array_segments_equal_scalar():
    vals = [3, 0, 7, 1, 255]
    bits = [2, 1, 3, 1, 8]
    a = _BitWriter()
    for v, n in zip(vals, bits):
        a.put(v, n)
    b = _BitWriter()
    b.put(vals[0], bits[0])
    b.put_arrays(np.array(vals[1:4], np.uint64), np.array(bits[1:4], np.int64))
    b.put(vals[4], bits[4])
    assert a.tobytes() == b.tobytes()


# ---------------------------------------------------------------------------
# prefix-code machinery
# ---------------------------------------------------------------------------

def test_canonical_codes_deflate_example():
    # RFC 1951 §3.2.2 example: lengths (3,3,3,3,3,2,4,4)
    lengths = np.array([3, 3, 3, 3, 3, 2, 4, 4])
    codes = _canonical_codes(lengths)
    assert list(codes) == [0b010, 0b011, 0b100, 0b101, 0b110,
                           0b00, 0b1110, 0b1111]


def test_limited_lengths_kraft_complete():
    r = rng()
    for n, L in ((300, 15), (40, 7), (19, 7), (2328, 15)):
        freqs = r.zipf(1.3, n).astype(np.int64)
        lens = _limited_lengths(freqs, L)
        assert lens.max() <= L and lens.min() >= 1
        assert sum(1 << (L - l) for l in lens) == 1 << L  # complete


def test_limited_lengths_skewed_needs_limit():
    # fibonacci-ish counts force unlimited depth > 15
    f = [1, 1]
    while len(f) < 24:
        f.append(f[-1] + f[-2])
    lens = _limited_lengths(np.array(f, np.int64), 15)
    assert lens.max() == 15
    assert sum(1 << (15 - l) for l in lens) == 1 << 15


def test_lz77_prefix_round_trip():
    for v in list(range(1, 70)) + [127, 128, 4096, 50000, 1 << 20]:
        code, ev, eb = _lz77_prefix(v)
        assert 0 <= code < 40
        bw = _BitWriter()
        if eb:
            bw.put(ev, eb)
        br = _BitReader(bw.tobytes() or b"\x00")
        assert _lz77_value(code, br) == v


def test_distance_map_round_trip():
    for xsize in (1, 7, 64, 256):
        lut = _dist_lut(xsize)
        for dist, code in lut.items():
            assert _code_to_dist(code, xsize) == dist
        # plain distances beyond the neighborhood
        assert _code_to_dist(121, xsize) == 1
        assert _code_to_dist(120 + 999, xsize) == 999


# ---------------------------------------------------------------------------
# container / header anchors
# ---------------------------------------------------------------------------

def test_riff_container_layout():
    img = np.array([[[1, 2, 3]]], np.uint8)
    d = encode_webp(img, subtract_green=False)
    assert d[:4] == b"RIFF" and d[8:12] == b"WEBP" and d[12:16] == b"VP8L"
    size = int.from_bytes(d[4:8], "little")
    assert size + 8 == len(d)
    chunk_size = int.from_bytes(d[16:20], "little")
    assert d[20] == 0x2F  # VP8L signature byte
    assert len(d) == 20 + chunk_size + (chunk_size & 1)


def test_header_bits_1x1():
    # 1x1 image: w-1 = h-1 = 0 -> 14+14 zero bits, alpha=0, version=000
    # -> the first 4 payload bytes after the signature are exactly zero
    img = np.array([[[1, 2, 3]]], np.uint8)
    d = encode_webp(img, subtract_green=False)
    payload = d[21:]
    assert payload[:4] == b"\x00\x00\x00\x00"


def test_header_dims_anchor():
    # w=258 -> w-1 = 257 = 0b100000001 (14 bits LSB-first)
    img = np.zeros((3, 258, 3), np.uint8)
    d = encode_webp(img)
    br = _BitReader(d[21:])
    assert br.read(14) == 257
    assert br.read(14) == 2
    assert br.read(1) == 0  # alpha hint
    assert br.read(3) == 0  # version
    assert br.read(1) == 1  # transform present
    assert br.read(2) == 2  # SUBTRACT_GREEN


def test_webp_info():
    img = rng().integers(0, 256, (5, 9, 4), np.uint8)
    d = encode_webp(img, cache_bits=3)
    info = webp_info(d)
    assert info == {"w": 9, "h": 5, "alpha_hint": True, "version": 0,
                    "transforms": ["subtract-green"]}


def test_simple_code_bit_layout():
    # constant-color 2x2, no subtract-green: each channel tree is a
    # 1-symbol simple code; spec layout: 1 (simple), 0 (1 symbol),
    # first8, sym. Verify green tree bits for green=200 (needs 8 bits).
    img = np.full((2, 2, 3), 200, np.uint8)
    d = encode_webp(img, subtract_green=False, use_lz77=False)
    br = _BitReader(d[21:])
    br.read(14 + 14 + 1 + 3)  # header
    assert br.read(1) == 0    # no transform
    assert br.read(1) == 0    # no color cache
    assert br.read(1) == 0    # no meta prefix
    assert br.read(1) == 1    # green: simple
    assert br.read(1) == 0    # one symbol
    assert br.read(1) == 1    # 8-bit first symbol
    assert br.read(8) == 200


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("lz", [False, True])
@pytest.mark.parametrize("sg", [False, True])
@pytest.mark.parametrize("cb", [0, 4])
def test_round_trip_option_matrix(lz, sg, cb):
    r = rng()
    for shape in ((1, 1, 3), (7, 13, 3), (16, 16, 4), (33, 5, 4)):
        img = r.integers(0, 256, shape, np.uint8)
        d = encode_webp(img, use_lz77=lz, subtract_green=sg, cache_bits=cb)
        out = decode_webp(d)
        assert out.shape == (shape[0], shape[1], 4)
        assert (out[:, :, :shape[2]] == img).all()
        if shape[2] == 3:
            assert (out[:, :, 3] == 255).all()


def test_lz77_compresses_repetitive():
    r = rng()
    tile = r.integers(0, 256, (8, 8, 4), np.uint8)
    img = np.tile(tile, (16, 16, 1))
    lit = encode_webp(img, use_lz77=False)
    lz = encode_webp(img, use_lz77=True, cache_bits=8)
    assert len(lz) < len(lit) // 10
    assert (decode_webp(lz) == img).all()
    assert (decode_webp(lit) == img).all()


def test_overlapping_copy():
    # two identical adjacent rows force dist=w copies; a run of one
    # repeated pixel forces dist=1 overlapping copies
    img = np.zeros((4, 50, 3), np.uint8)
    img[:, :, 0] = 7
    d = encode_webp(img, use_lz77=True)
    assert (decode_webp(d)[:, :, :3] == img).all()


def test_gradient_round_trip():
    y, x = np.mgrid[0:64, 0:96]
    img = np.stack([(x * 2).astype(np.uint8), (y * 3).astype(np.uint8),
                    ((x + y)).astype(np.uint8)], axis=-1)
    for kw in (dict(), dict(use_lz77=False), dict(cache_bits=8)):
        assert (decode_webp(encode_webp(img, **kw))[:, :, :3] == img).all()


def test_fast_path_equals_loop_path_bits():
    # the vectorized literal path (use_lz77=False, cache_bits=0) and
    # the token-loop path (cache_bits>0 forces the loop; with
    # cache_bits=1 on 256-valued noise the 2-entry cache almost never
    # hits, but bitstreams differ by the cache header) must both decode
    # to the same pixels; determinism is anchored byte-exact
    r = rng()
    img = r.integers(0, 256, (17, 19, 3), np.uint8)
    a = encode_webp(img, use_lz77=False, cache_bits=0)
    assert a == encode_webp(img, use_lz77=False, cache_bits=0)
    b = encode_webp(img, use_lz77=False, cache_bits=1)
    assert (decode_webp(a) == decode_webp(b)).all()


def test_alpha_hint_header():
    img = np.zeros((2, 2, 4), np.uint8)
    img[:, :, 3] = 255
    assert webp_info(encode_webp(img))["alpha_hint"] is False
    img[0, 0, 3] = 4
    assert webp_info(encode_webp(img))["alpha_hint"] is True


# ---------------------------------------------------------------------------
# predictor transform
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sg", [False, True])
@pytest.mark.parametrize("lz", [False, True])
def test_predictor_round_trip(sg, lz):
    r = rng()
    for shape in ((1, 1, 3), (7, 13, 3), (16, 16, 4), (33, 5, 4)):
        img = r.integers(0, 256, shape, np.uint8)
        d = encode_webp(img, predictor=True, subtract_green=sg, use_lz77=lz)
        out = decode_webp(d)
        assert (out[:, :, :shape[2]] == img).all()


def test_predictor_compresses_gradient():
    y, x = np.mgrid[0:128, 0:128]
    img = np.stack([(x * 2).astype(np.uint8), (y * 2).astype(np.uint8),
                    (x + y).astype(np.uint8)], axis=-1)
    lit = encode_webp(img, use_lz77=False)
    pred = encode_webp(img, predictor=True)
    assert len(pred) < len(lit) // 10
    assert (decode_webp(pred)[:, :, :3] == img).all()


@pytest.mark.parametrize("pb", [2, 5, 9])
def test_predictor_block_sizes(pb):
    img = rng().integers(0, 256, (19, 37, 4), np.uint8)
    d = encode_webp(img, predictor=True, predictor_bits=pb)
    assert (decode_webp(d) == img).all()


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_every_mode_inverts(mode):
    # forward residual with a FORCED single mode must invert exactly —
    # covers all 14 spec predictors on both sides incl. the rightmost-
    # column TR rule and the Select/ClampAddSubtract arithmetic
    from gdal_ray.functions.webp import _predictions, _predictor_inverse
    r = rng()
    h, w, bits = 13, 21, 3
    P = r.integers(0, 256, (4, h, w)).astype(np.int32)
    preds = _predictions(P, w, h)
    res = (P - preds[mode]) & 0xFF
    subh, subw = (h + 7) >> 3, (w + 7) >> 3
    modes = np.full((subh, subw), mode, np.uint8)
    a, rr, g, b = _predictor_inverse(
        res[0].ravel(), res[1].ravel(), res[2].ravel(), res[3].ravel(),
        w, h, bits, modes)
    got = np.stack([a.reshape(h, w), rr.reshape(h, w),
                    g.reshape(h, w), b.reshape(h, w)]).astype(np.int32)
    assert (got == P).all()


def test_predictor_transform_order_in_header():
    img = rng().integers(0, 256, (8, 8, 3), np.uint8)
    info = webp_info(encode_webp(img, predictor=True))
    assert info["transforms"] == ["subtract-green", "predictor"]


# ---------------------------------------------------------------------------
# color-indexing transform
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ncol", [1, 2, 3, 4, 5, 16, 17, 200, 256])
def test_palette_round_trip_all_bundle_tiers(ncol):
    r = rng()
    pal = r.integers(0, 256, (ncol, 4), np.uint8)
    idx = r.integers(0, ncol, (11, 23))
    img = pal[idx]
    for lz in (False, True):
        for cb in (0, 4):
            d = encode_webp(img, palette=True, use_lz77=lz, cache_bits=cb)
            out = decode_webp(d)
            assert (out == img).all(), (ncol, lz, cb)


def test_palette_bundles_and_compresses():
    r = rng()
    img = (r.integers(0, 2, (64, 64, 1))
           * np.array([255, 128, 0], np.uint8)[None, None, :]).astype(np.uint8)
    plain = encode_webp(img, use_lz77=False)
    pal = encode_webp(img, palette=True, use_lz77=False)
    assert len(pal) < len(plain)  # 8 px/byte bundling
    assert (decode_webp(pal)[:, :, :3] == img).all()


def test_palette_header_bits():
    img = np.zeros((4, 4, 3), np.uint8)
    img[0, 0] = 7  # 2 colors
    d = encode_webp(img, palette=True)
    br = _BitReader(d[21:])
    br.read(14 + 14 + 1 + 3)
    assert br.read(1) == 1  # transform present
    assert br.read(2) == 3  # COLOR_INDEXING
    assert br.read(8) == 1  # table size - 1
    info = webp_info(d)
    assert info["transforms"] == ["color-indexing"]


def test_palette_width_not_multiple_of_bundle():
    # w=13 with 4 colors -> 2 bits/px, 4 px/byte, packed w=4 with
    # 3 padding subpixels in the last byte of every row
    r = rng()
    pal = r.integers(0, 256, (4, 3), np.uint8)
    img = pal[r.integers(0, 4, (5, 13))]
    d = encode_webp(img, palette=True)
    assert (decode_webp(d)[:, :, :3] == img).all()


def test_palette_rejects_too_many_colors():
    img = rng().integers(0, 256, (32, 32, 3), np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_webp(img, palette=True)


# ---------------------------------------------------------------------------
# meta prefix codes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mb", [2, 4])
@pytest.mark.parametrize("sg", [False, True])
def test_meta_prefix_round_trip(mb, sg):
    r = rng()
    for shape in ((8, 8, 3), (33, 47, 3), (17, 5, 4)):
        y, _ = np.mgrid[0:shape[0], 0:shape[1]]
        img = r.integers(0, 256, shape, np.uint8)
        img[:, :, 1] = np.where(y < shape[0] // 2,
                                img[:, :, 1] // 4, img[:, :, 1])
        d = encode_webp(img, meta_bits=mb, subtract_green=sg)
        out = decode_webp(d)
        assert (out[:, :, :shape[2]] == img).all()


def test_meta_composes_with_transforms():
    img = rng().integers(0, 256, (32, 48, 3), np.uint8)
    d = encode_webp(img, meta_bits=3, predictor=True, cross_color=True)
    assert (decode_webp(d)[:, :, :3] == img).all()


def test_meta_compresses_banded_content():
    r = rng()
    y, _ = np.mgrid[0:128, 0:128]
    img = np.where((y < 64)[:, :, None],
                   r.integers(0, 16, (128, 128, 3)),
                   r.integers(128, 256, (128, 128, 3))).astype(np.uint8)
    plain = encode_webp(img, use_lz77=False, subtract_green=False)
    meta = encode_webp(img, meta_bits=5, subtract_green=False)
    assert len(meta) < len(plain)
    assert (decode_webp(meta)[:, :, :3] == img).all()


def test_meta_header_bits():
    # meta bit follows the (absent) color-cache bit in the main stream
    img = rng().integers(0, 256, (16, 16, 3), np.uint8)
    d = encode_webp(img, meta_bits=3, subtract_green=False)
    br = _BitReader(d[21:])
    br.read(14 + 14 + 1 + 3)
    assert br.read(1) == 0  # no transforms
    assert br.read(1) == 0  # no color cache
    assert br.read(1) == 1  # meta prefix codes present
    assert br.read(3) == 1  # meta_bits - 2


def test_meta_rejected_outside_main_image_and_guards():
    img = rng().integers(0, 256, (16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="cache_bits"):
        encode_webp(img, meta_bits=4, cache_bits=3)
    with pytest.raises(ValueError, match="palette"):
        encode_webp(np.zeros((8, 8, 3), np.uint8), meta_bits=4,
                    palette=True)


# ---------------------------------------------------------------------------
# error paths
# ---------------------------------------------------------------------------

def test_rejects_lossy_vp8():
    fake = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 "
            + (4).to_bytes(4, "little") + b"\x00\x00\x00\x00")
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(fake)


def test_rejects_duplicate_transform():
    bw = _BitWriter()
    bw.put(0, 14)
    bw.put(0, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(1, 1)   # transform present
    bw.put(2, 2)   # SUBTRACT_GREEN
    bw.put(1, 1)   # another transform
    bw.put(2, 2)   # SUBTRACT_GREEN again
    from gdal_ray.functions.webp import _wrap_riff
    with pytest.raises(ValueError, match="duplicate"):
        decode_webp(_wrap_riff(b"\x2f" + bw.tobytes()))


# ---------------------------------------------------------------------------
# cross-color transform
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sg", [False, True])
@pytest.mark.parametrize("pred", [False, True])
def test_cross_color_round_trip(sg, pred):
    r = rng()
    for shape in ((1, 1, 3), (7, 13, 3), (16, 16, 4), (33, 5, 4)):
        img = r.integers(0, 256, shape, np.uint8)
        d = encode_webp(img, cross_color=True, subtract_green=sg,
                        predictor=pred)
        out = decode_webp(d)
        assert (out[:, :, :shape[2]] == img).all()


def test_cross_color_delta_semantics():
    # forward/inverse must mirror the spec's int8 3.5 fixed-point
    # arithmetic exactly, including negative multipliers and the
    # recovered-red dependency of blue
    from gdal_ray.functions.webp import (_cross_color_forward,
                                         _cross_color_inverse)
    r = rng()
    h, w = 9, 14
    argb = (np.uint32(0xFF000000)
            | (r.integers(0, 1 << 24, h * w).astype(np.uint32)))
    out, elem, subw, subh = _cross_color_forward(argb, w, h, 2)
    a = (out >> 24) & 0xFF
    rr = (out >> 16) & 0xFF
    g = (out >> 8) & 0xFF
    b = out & 0xFF
    a2, r2, g2, b2 = _cross_color_inverse(a, rr, g, b, w, h, 2, elem)
    back = (a2 << 24) | (r2 << 16) | (g2 << 8) | b2
    assert (back.astype(np.uint32) == argb).all()
    assert elem.shape == (subh, subw) == (3, 4)


def test_cross_color_header():
    img = rng().integers(0, 256, (8, 8, 3), np.uint8)
    info = webp_info(encode_webp(img, cross_color=True))
    assert "cross-color" in info["transforms"]


def test_rejects_truncated():
    img = np.full((4, 4, 3), 10, np.uint8)
    d = encode_webp(img)
    with pytest.raises(ValueError):
        decode_webp(d[:24])


def test_rejects_bad_dims():
    with pytest.raises(ValueError):
        encode_webp(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_webp(np.zeros((4, 4, 2), np.uint8))
