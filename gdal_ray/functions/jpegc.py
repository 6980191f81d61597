"""Baseline JPEG (JFIF) codec — pure numpy/python, no external libs.

Reference analog: frmts/jpeg/ (the reference wraps libjpeg;
gtiffdataset_read.cpp:988 streams JPEG-in-TIFF tiles through it).  The
container has no image libraries, so this implements the public
ITU-T T.81 baseline sequential process directly: 4:4:4 (no chroma
subsampling), standard Annex-K Huffman tables, IJG-style
quality-scaled quantization tables.  The DCT/quantization path is
vectorized over all 8x8 blocks; only the entropy coding walks symbols.

Design contract for the oracle: Huffman coding is lossless, so the
decoded pixels equal ``jpeg_model(img, quality)`` — forward transform,
quantize, dequantize, inverse transform — which an independent
reference can compute without touching the bitstream.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

_QL = np.array([  # Annex K luminance
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_QC = np.array([  # Annex K chrominance
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

_ZIG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K Huffman tables: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _huff_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} (T.81 C.2)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix() -> np.ndarray:
    k = np.arange(8, dtype=np.float64)
    mat = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16.0)
    mat[0] *= np.sqrt(1.0 / 8.0)
    mat[1:] *= np.sqrt(2.0 / 8.0)
    return mat


_C = _dct_matrix()


def quant_tables(quality: int = 90):
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_QL * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


def _to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _from_ycbcr(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1] - 128.0
    cr = ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _blocks(chan: np.ndarray):
    """(H8, W8) channel -> (n, 8, 8) blocks in raster MCU order."""
    h, w = chan.shape
    return (
        chan.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _unblocks(blocks: np.ndarray, h: int, w: int):
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


def _fwd_quant(chan: np.ndarray, q: np.ndarray) -> np.ndarray:
    b = _blocks(chan) - 128.0
    f = np.einsum("ij,njk,lk->nil", _C, b, _C)
    return np.round(f / q[None, :, :]).astype(np.int32)


def _dequant_inv(coef: np.ndarray, q: np.ndarray, h: int, w: int) -> np.ndarray:
    f = coef.astype(np.float64) * q[None, :, :]
    b = np.einsum("ji,njk,kl->nil", _C, f, _C) + 128.0
    return _unblocks(b, h, w)


def jpeg_model(img: np.ndarray, quality: int = 90) -> np.ndarray:
    """Expected decoded pixels WITHOUT entropy coding (the oracle
    contract: Huffman is lossless)."""
    h, w = img.shape[:2]
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(img, ((0, H - h), (0, W - w), (0, 0)), mode="edge")
    ycc = _to_ycbcr(pad)
    ql, qc = quant_tables(quality)
    out = np.empty((H, W, 3))
    for c, q in ((0, ql), (1, qc), (2, qc)):
        out[:, :, c] = _dequant_inv(_fwd_quant(ycc[:, :, c], q), q, H, W)
    return _from_ycbcr(out)[:h, :w]


# --------------------------------------------------------- bit plumbing


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)

    def flush(self):
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed
                else:
                    byte = 0  # marker: feed zeros (we stop at EOB anyway)
                    self.pos -= 1
                    self.acc = (self.acc << 8)
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        if self.n < k:
            self.acc <<= (k - self.n)
            self.n = k
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        return v


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _mag_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int, dc_tab, ac_tab) -> int:
    """Entropy-code one zigzagged 64-coef block; returns the new DC
    predictor (the single shared copy of the T.81 F.1.2 loop)."""
    dc = int(blk[0])
    diff = dc - pred
    cat = _category(diff)
    code, ln = dc_tab[cat]
    bw.put(code, ln)
    if cat:
        bw.put(_mag_bits(diff, cat), cat)
    run = 0
    nz = np.flatnonzero(blk[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            bw.put(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = ac_tab[(run << 4) | cat]
        bw.put(code, ln)
        bw.put(_mag_bits(v, cat), cat)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]
        bw.put(code, ln)
    return dc


def _tab_arrays(tab: dict) -> tuple[np.ndarray, np.ndarray]:
    """{symbol: (code, len)} -> (code[256], len[256]) lookup arrays."""
    code = np.zeros(256, np.uint32)
    ln = np.zeros(256, np.uint8)
    for s, (c, l) in tab.items():
        code[s] = c
        ln[s] = l
    return code, ln


def _bitlen(a: np.ndarray) -> np.ndarray:
    """Vectorized |v|.bit_length() for |v| < 2^24 (exact via frexp)."""
    return np.frexp(np.abs(a).astype(np.float64))[1].astype(np.int64)


def _encode_scan(zzs: list, tabs: list, keys: list | None = None) -> bytes:
    """Vectorized entropy coder for the whole interleaved scan — the
    emission-stream form of the per-block T.81 F.1.2 loop
    (:func:`_encode_block`, kept as the tested reference): every
    (huff-code, magnitude-bits) emission across all MCUs/components is
    materialized as (value, nbits) records with a total-order key
    (mcu, component, in-block position), lexsorted, bit-packed with
    one np.packbits, then 0xFF-stuffed.  Bit-identical to the loop.

    zzs: per-component (n_mcu, 64) zigzagged coefs;
    tabs: per-component (dc_tab, ac_tab) symbol dicts."""
    recs_m, recs_c, recs_seq, recs_val, recs_nb = [], [], [], [], []

    def add(m, c, seq, val, nb):
        m = np.asarray(m, np.int64)
        recs_m.append(m)
        recs_c.append(np.full(m.shape, c, np.int64))
        recs_seq.append(np.broadcast_to(np.asarray(seq, np.int64), m.shape))
        recs_val.append(np.asarray(val, np.uint32))
        recs_nb.append(np.broadcast_to(np.asarray(nb, np.int64), m.shape))

    for ci, (zz, (dc_tab, ac_tab)) in enumerate(zip(zzs, tabs)):
        n_mcu = zz.shape[0]
        # slot key per zz row: the interleave position in the scan
        # (identity for one-block-per-MCU 4:4:4; explicit for the
        # 4-Y-blocks-per-MCU 4:2:0 schedule)
        K = (np.asarray(keys[ci], np.int64) if keys is not None
             else np.arange(n_mcu, dtype=np.int64))
        dc_code, dc_len = _tab_arrays(dc_tab)
        ac_code, ac_len = _tab_arrays(ac_tab)
        # ---- DC: diff vs previous block of the SAME component
        dc = zz[:, 0].astype(np.int64)
        diff = np.empty(n_mcu, np.int64)
        diff[0] = dc[0]
        diff[1:] = dc[1:] - dc[:-1]
        cat = _bitlen(diff)
        ms = np.arange(n_mcu, dtype=np.int64)
        add(K[ms], ci, 0, dc_code[cat], dc_len[cat])
        mag = np.where(diff >= 0, diff, diff + (1 << cat) - 1)
        add(K[ms], ci, 1, mag.astype(np.uint32), cat)  # nbits==0 dropped later
        # ---- AC: zero runs between nonzeros, in zigzag order
        m_idx, k0 = np.nonzero(zz[:, 1:])
        k = (k0 + 1).astype(np.int64)
        v = zz[m_idx, k].astype(np.int64)
        starts = np.empty(len(k), bool)
        if len(k):
            starts[0] = True
            starts[1:] = m_idx[1:] != m_idx[:-1]
        prev_k = np.empty_like(k)
        prev_k[1:] = k[:-1]
        prev_k[starts] = 0
        run = k - prev_k - 1
        zrl, leftover = run >> 4, run & 15
        acat = _bitlen(v)
        sym = (leftover << 4) | acat
        f0c, f0l = ac_tab[0xF0]
        for j in range(int(zrl.max()) if len(zrl) else 0):
            sel = zrl > j
            add(K[m_idx[sel]], ci, k[sel] * 8 + j,
                np.full(int(sel.sum()), f0c, np.uint32), f0l)
        add(K[m_idx], ci, k * 8 + 5, ac_code[sym], ac_len[sym])
        amag = np.where(v >= 0, v, v + (1 << acat) - 1)
        add(K[m_idx], ci, k * 8 + 6, amag.astype(np.uint32), acat)
        # ---- EOB for blocks whose last nonzero is before coef 63
        last = np.zeros(n_mcu, np.int64)
        if len(k):
            np.maximum.at(last, m_idx, k)
        eob = np.flatnonzero(last < 63)
        ec, el = ac_tab[0x00]
        add(K[eob], ci, 64 * 8, np.full(len(eob), ec, np.uint32),
            np.full(len(eob), el, np.int64))

    m = np.concatenate(recs_m)
    c = np.concatenate(recs_c)
    seq = np.concatenate(recs_seq)
    val = np.concatenate(recs_val)
    nb = np.concatenate(recs_nb)
    order = np.lexsort((seq, c, m))
    val, nb = val[order], nb[order]
    keep = nb > 0
    val, nb = val[keep], nb[keep]
    # ---- bit packing: MSB-first expansion, row-major valid-bit select
    j = np.arange(16, dtype=np.int64)
    shifts = nb[:, None] - 1 - j[None, :]
    bits = ((val[:, None].astype(np.int64) >> np.maximum(shifts, 0)) & 1)
    flat = bits[shifts >= 0].astype(np.uint8)
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.ones(pad, np.uint8)])  # 1-padded
    packed = np.packbits(flat)
    stuff_at = np.flatnonzero(packed == 0xFF) + 1
    if len(stuff_at):
        packed = np.insert(packed, stuff_at, 0)
    return packed.tobytes()


def _decode_tables(tabs):
    """{symbol: (code, len)} -> decode dict {(code, len): symbol}."""
    return {(c, l): s for s, (c, l) in tabs.items()}


def _read_symbol(br: _BitReader, dec) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bits(1)
        s = dec.get((code, ln))
        if s is not None:
            return s
    raise ValueError("bad huffman code")


def _decode_lut(tab: dict) -> tuple[np.ndarray, np.ndarray]:
    """{symbol: (code, len)} -> 16-bit-lookahead LUT (sym[2^16],
    len[2^16]): every 16-bit window starting with a code maps to its
    symbol and code length — one array index decodes one symbol."""
    sym = np.zeros(1 << 16, np.uint8)
    ln = np.zeros(1 << 16, np.uint8)
    for s, (c, l) in tab.items():
        lo = c << (16 - l)
        ln[lo : lo + (1 << (16 - l))] = l
        sym[lo : lo + (1 << (16 - l))] = s
    return sym, ln


def _bit_windows(scan: bytes) -> np.ndarray:
    """Unstuff the entropy scan and precompute, per BYTE offset, the
    24-bit big-endian window w24[i] = bytes i, i+1, i+2 — the 16 bits
    at any bit position p are (w24[p >> 3] >> (8 - (p & 7))) & 0xFFFF.
    Trailing zero bytes extend the stream (same as the marker-feed
    behavior of :class:`_BitReader`)."""
    b = np.frombuffer(scan, np.uint8)
    if len(b):
        stuffed = np.flatnonzero((b[:-1] == 0xFF) & (b[1:] == 0x00)) + 1
        if len(stuffed):
            b = np.delete(b, stuffed)
    b = np.concatenate([b, np.zeros(4, np.uint8)]).astype(np.uint32)
    return (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 -> baseline JFIF bytes (4:4:4)."""
    h, w = img.shape[:2]
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(img, ((0, H - h), (0, W - w), (0, 0)), mode="edge")
    ycc = _to_ycbcr(pad)
    ql, qc = quant_tables(quality)
    coefs = [
        _fwd_quant(ycc[:, :, 0], ql),
        _fwd_quant(ycc[:, :, 1], qc),
        _fwd_quant(ycc[:, :, 2], qc),
    ]
    dc_l, dc_c = _huff_codes(*_DC_L), _huff_codes(*_DC_C)
    ac_l, ac_c = _huff_codes(*_AC_L), _huff_codes(*_AC_C)
    # interleaved 4:4:4 MCU = one block per component; whole scan
    # entropy-coded vectorized (bit-identical to the _encode_block
    # loop — fuzz-asserted in tests/test_codecs_checksum.py)
    zzs = [c.reshape(-1, 64)[:, _ZIG] for c in coefs]
    scan = _encode_scan(zzs, [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)])

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(idx, q):
        return seg(0xFFDB, bytes([idx]) + bytes(int(v) for v in q.reshape(-1)[_ZIG]))

    def dht(cls, idx, bits, values):
        return seg(
            0xFFC4,
            bytes([(cls << 4) | idx]) + bytes(bits) + bytes(values),
        )

    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8" + app0 + dqt(0, ql) + dqt(1, qc)
        + dht(0, 0, *_DC_L) + dht(1, 0, *_AC_L)
        + dht(0, 1, *_DC_C) + dht(1, 1, *_AC_C)
        + sof + sos + scan + b"\xff\xd9"
    )


def _box2(c: np.ndarray) -> np.ndarray:
    """2x2 box average (the 4:2:0 chroma downsample model)."""
    return (c[0::2, 0::2] + c[0::2, 1::2]
            + c[1::2, 0::2] + c[1::2, 1::2]) / 4.0


def _mcu_perm(H: int, W: int, ch: int, cv: int) -> np.ndarray:
    """Permutation mapping MCU-interleave position -> raster 8x8
    block index for a component plane of (H, W) samples carrying
    ch x cv blocks per MCU (T.81 A.2.3 interleave order)."""
    mcux, mcuy = W // (8 * ch), H // (8 * cv)
    bpr = W // 8
    out = np.empty(mcux * mcuy * ch * cv, np.int64)
    i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(cv):
                for bx in range(ch):
                    out[i] = (cv * my + by) * bpr + (ch * mx + bx)
                    i += 1
    return out


def _y_mcu_perm(H: int, W: int) -> np.ndarray:
    """Luma permutation of the 4:2:0 layout (2x2 blocks per MCU)."""
    return _mcu_perm(H, W, 2, 2)


def encode_jpeg_420(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 -> baseline JFIF with 4:2:0 chroma subsampling
    — the layout real-world encoders (libjpeg default, cameras)
    produce: 16x16 MCUs of four Y blocks + one Cb + one Cr, chroma
    box-downsampled 2x2.  Decoded pixels equal
    :func:`jpeg_model_420` (Huffman losslessness contract)."""
    h, w = img.shape[:2]
    H, W = (h + 15) // 16 * 16, (w + 15) // 16 * 16
    pad = np.pad(img, ((0, H - h), (0, W - w), (0, 0)), mode="edge")
    ycc = _to_ycbcr(pad)
    ql, qc = quant_tables(quality)
    ycoef = _fwd_quant(ycc[:, :, 0], ql)
    cbco = _fwd_quant(_box2(ycc[:, :, 1]), qc)
    crco = _fwd_quant(_box2(ycc[:, :, 2]), qc)
    dc_l, dc_c = _huff_codes(*_DC_L), _huff_codes(*_DC_C)
    ac_l, ac_c = _huff_codes(*_AC_L), _huff_codes(*_AC_C)
    perm = _y_mcu_perm(H, W)
    yzz = ycoef.reshape(-1, 64)[:, _ZIG][perm]   # MCU scan order
    cbzz = cbco.reshape(-1, 64)[:, _ZIG]
    crzz = crco.reshape(-1, 64)[:, _ZIG]
    n_mcu = len(cbzz)
    jj = np.arange(4 * n_mcu, dtype=np.int64)
    keys = [
        (jj // 4) * 6 + (jj % 4),                # Y0..Y3 per MCU
        np.arange(n_mcu, dtype=np.int64) * 6 + 4,  # Cb
        np.arange(n_mcu, dtype=np.int64) * 6 + 5,  # Cr
    ]
    scan = _encode_scan([yzz, cbzz, crzz],
                        [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)],
                        keys)

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(idx, q):
        return seg(0xFFDB, bytes([idx])
                   + bytes(int(v) for v in q.reshape(-1)[_ZIG]))

    def dht(cls, idx, bits, values):
        return seg(0xFFC4,
                   bytes([(cls << 4) | idx]) + bytes(bits)
                   + bytes(values))

    sof = seg(0xFFC0,
              struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (b"\xff\xd8" + app0 + dqt(0, ql) + dqt(1, qc)
            + dht(0, 0, *_DC_L) + dht(1, 0, *_AC_L)
            + dht(0, 1, *_DC_C) + dht(1, 1, *_AC_C)
            + sof + sos + scan + b"\xff\xd9")


def jpeg_model_420(img: np.ndarray, quality: int = 90) -> np.ndarray:
    """Expected 4:2:0 decoded pixels WITHOUT entropy coding: Y at
    full resolution, chroma box-downsampled, quantized, and
    nearest-upsampled (the engine's documented 2x2-replication
    upsample — deterministic, unlike libjpeg's 'fancy' triangular
    filter)."""
    h, w = img.shape[:2]
    H, W = (h + 15) // 16 * 16, (w + 15) // 16 * 16
    pad = np.pad(img, ((0, H - h), (0, W - w), (0, 0)), mode="edge")
    ycc = _to_ycbcr(pad)
    ql, qc = quant_tables(quality)
    out = np.empty((H, W, 3))
    out[:, :, 0] = _dequant_inv(_fwd_quant(ycc[:, :, 0], ql), ql, H, W)
    for c in (1, 2):
        dq = _dequant_inv(
            _fwd_quant(_box2(ycc[:, :, c]), qc), qc, H // 2, W // 2)
        out[:, :, c] = np.repeat(np.repeat(dq, 2, 0), 2, 1)
    return _from_ycbcr(out)[:h, :w]


def _box2h(c: np.ndarray) -> np.ndarray:
    """2x1 horizontal box average (the 4:2:2 chroma downsample)."""
    return (c[:, 0::2] + c[:, 1::2]) / 2.0


def encode_jpeg_422(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 -> baseline JFIF with 4:2:2 chroma subsampling
    (broadcast/DV-style layout): 16x8 MCUs of two Y blocks + one Cb +
    one Cr, chroma box-downsampled horizontally only.  Decoded pixels
    equal :func:`jpeg_model_422`."""
    h, w = img.shape[:2]
    H, W = (h + 7) // 8 * 8, (w + 15) // 16 * 16
    pad = np.pad(img, ((0, H - h), (0, W - w), (0, 0)), mode="edge")
    ycc = _to_ycbcr(pad)
    ql, qc = quant_tables(quality)
    ycoef = _fwd_quant(ycc[:, :, 0], ql)
    cbco = _fwd_quant(_box2h(ycc[:, :, 1]), qc)
    crco = _fwd_quant(_box2h(ycc[:, :, 2]), qc)
    dc_l, dc_c = _huff_codes(*_DC_L), _huff_codes(*_DC_C)
    ac_l, ac_c = _huff_codes(*_AC_L), _huff_codes(*_AC_C)
    perm = _mcu_perm(H, W, 2, 1)
    yzz = ycoef.reshape(-1, 64)[:, _ZIG][perm]   # MCU scan order
    cbzz = cbco.reshape(-1, 64)[:, _ZIG]
    crzz = crco.reshape(-1, 64)[:, _ZIG]
    n_mcu = len(cbzz)
    jj = np.arange(2 * n_mcu, dtype=np.int64)
    keys = [
        (jj // 2) * 4 + (jj % 2),                  # Y0, Y1 per MCU
        np.arange(n_mcu, dtype=np.int64) * 4 + 2,  # Cb
        np.arange(n_mcu, dtype=np.int64) * 4 + 3,  # Cr
    ]
    scan = _encode_scan([yzz, cbzz, crzz],
                        [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)],
                        keys)

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(idx, q):
        return seg(0xFFDB, bytes([idx])
                   + bytes(int(v) for v in q.reshape(-1)[_ZIG]))

    def dht(cls, idx, bits, values):
        return seg(0xFFC4,
                   bytes([(cls << 4) | idx]) + bytes(bits)
                   + bytes(values))

    sof = seg(0xFFC0,
              struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x21, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (b"\xff\xd8" + app0 + dqt(0, ql) + dqt(1, qc)
            + dht(0, 0, *_DC_L) + dht(1, 0, *_AC_L)
            + dht(0, 1, *_DC_C) + dht(1, 1, *_AC_C)
            + sof + sos + scan + b"\xff\xd9")


def jpeg_model_422(img: np.ndarray, quality: int = 90) -> np.ndarray:
    """Expected 4:2:2 decoded pixels WITHOUT entropy coding: Y at
    full resolution, chroma horizontally box-downsampled, quantized,
    and 2x-replicated back (the engine's deterministic upsample)."""
    h, w = img.shape[:2]
    H, W = (h + 7) // 8 * 8, (w + 15) // 16 * 16
    pad = np.pad(img, ((0, H - h), (0, W - w), (0, 0)), mode="edge")
    ycc = _to_ycbcr(pad)
    ql, qc = quant_tables(quality)
    out = np.empty((H, W, 3))
    out[:, :, 0] = _dequant_inv(_fwd_quant(ycc[:, :, 0], ql), ql, H, W)
    for c in (1, 2):
        dq = _dequant_inv(
            _fwd_quant(_box2h(ycc[:, :, c]), qc), qc, H, W // 2)
        out[:, :, c] = np.repeat(dq, 2, 1)
    return _from_ycbcr(out)[:h, :w]


def encode_jpeg_gray(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w) uint8 -> 1-component (grayscale) baseline JFIF bytes —
    the T.81 single-component sequential process (NITF IC=C3 MONO
    segments, MIL-STD-188-198A; the reference streams these through
    libjpeg in frmts/nitf)."""
    h, w = img.shape[:2]
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(img, ((0, H - h), (0, W - w)), mode="edge")
    ql, _ = quant_tables(quality)
    coefs = _fwd_quant(pad.astype(np.float64), ql)
    dc_l = _huff_codes(*_DC_L)
    ac_l = _huff_codes(*_AC_L)
    zz = coefs.reshape(-1, 64)[:, _ZIG]
    scan = _encode_scan([zz], [(dc_l, ac_l)])

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB,
              bytes([0]) + bytes(int(v) for v in ql.reshape(-1)[_ZIG]))
    dht_d = seg(0xFFC4, bytes([0x00]) + bytes(_DC_L[0]) + bytes(_DC_L[1]))
    dht_a = seg(0xFFC4, bytes([0x10]) + bytes(_AC_L[0]) + bytes(_AC_L[1]))
    sof = seg(0xFFC0,
              struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (b"\xff\xd8" + app0 + dqt + dht_d + dht_a + sof + sos
            + scan + b"\xff\xd9")


def jpeg_model_gray(img: np.ndarray, quality: int = 90) -> np.ndarray:
    """Grayscale analog of :func:`jpeg_model` (oracle contract)."""
    h, w = img.shape[:2]
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(img, ((0, H - h), (0, W - w)), mode="edge")
    ql, _ = quant_tables(quality)
    out = _dequant_inv(_fwd_quant(pad.astype(np.float64), ql), ql, H, W)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)[:h, :w]


def split_jpeg_streams(data: bytes) -> list[bytes]:
    """Split concatenated baseline JPEG streams on their EOI markers.
    Valid for baseline streams: inside entropy-coded data every 0xFF
    is stuffed as FF00 (or is a restart FFD0-D7), so FFD9 occurs only
    as a true EOI."""
    out = []
    start = 0
    while start < len(data):
        if data[start:start + 2] != b"\xff\xd8":
            raise ValueError("concatenated JPEG: missing SOI")
        end = data.find(b"\xff\xd9", start + 2)
        if end < 0:
            raise ValueError("concatenated JPEG: missing EOI")
        out.append(data[start:end + 2])
        start = end + 2
    return out


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline 4:4:4 JFIF bytes (as produced here) -> (h, w, 3)
    uint8; 1-component streams decode to (h, w)."""
    pos = 2  # skip SOI
    qts = {}
    hts = {}
    h = w = None
    scan = None
    dri = 0
    while pos < len(data):
        marker, ln = struct.unpack_from(">HH", data, pos)
        payload = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xFFDB:
            idx = payload[0]
            tbl = np.zeros(64, dtype=np.int32)
            tbl[_ZIG] = np.frombuffer(payload[1:65], dtype=np.uint8)
            qts[idx] = tbl.reshape(8, 8)
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                cls_idx = payload[p]
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                values = list(payload[p + 17 : p + 17 + n])
                hts[(cls_idx >> 4, cls_idx & 0xF)] = _decode_lut(
                    _huff_codes(bits, values)
                )
                p += 17 + n
        elif marker == 0xFFC0:
            _, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            comps = []                      # (id, hsamp, vsamp, tq)
            for ci in range(ncomp):
                cid, hv, tq = struct.unpack_from(
                    ">BBB", payload, 6 + 3 * ci)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("only baseline sequential JPEG (SOF0) "
                             "is supported")
        elif marker == 0xFFDD:
            (dri,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xFFDA:
            # per-component entropy table selectors
            ns = payload[0]
            sos_tabs = {}
            for ci in range(ns):
                cid, td_ta = payload[1 + 2 * ci], payload[2 + 2 * ci]
                sos_tabs[cid] = (td_ta >> 4, td_ta & 0xF)
            scan = data[pos : len(data) - 2]  # up to EOI
            break
    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    for cid, ch, cv, _tq in comps:
        if (ch, cv) not in ((1, 1), (2, 2), (2, 1), (1, 2)):
            raise ValueError(
                f"sampling factors {ch}x{cv} unsupported "
                "(4:4:4, 4:2:0, 4:2:2 and 4:4:0 only)")
    mcu_w, mcu_h = 8 * maxh, 8 * maxv
    mcux = (w + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h
    n_mcu = mcux * mcuy
    # per-component blocks-per-MCU and table pairs
    bper = [c[1] * c[2] for c in comps]
    comp_tabs = []
    for (cid, _ch, _cv, _tq) in comps:
        td, ta = sos_tabs[cid]
        comp_tabs.append((hts[(0, td)], hts[(1, ta)]))
    # 16-bit-lookahead Huffman decode: one LUT index per symbol, one
    # window fetch per magnitude read (no per-bit Python).  Restart
    # intervals (DRI) split the scan at RST0-7 markers; each segment
    # is byte-aligned and resets every DC predictor (T.81 F.2.1.3.1).
    if dri:
        import re as _re

        segments = _re.split(b"\xff[\xd0-\xd7]", scan)
    else:
        segments = [scan]
    coefs = [np.zeros((n_mcu * bper[ci], 64), dtype=np.int32)
             for ci in range(ncomp)]
    preds = [0] * ncomp
    sched = [(ci,) * bper[ci] for ci in range(ncomp)]
    sched = [ci for grp in sched for ci in grp]  # MCU interleave
    counters = [0] * ncomp
    seg_i = 0
    w24 = _bit_windows(segments[0]).tolist()
    pos = 0
    for m in range(n_mcu):
        if dri and m and m % dri == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("JPEG: fewer restart segments than "
                                 "the DRI interval requires")
            w24 = _bit_windows(segments[seg_i]).tolist()
            pos = 0
            preds = [0] * ncomp
        for ci in sched:
            (dsym, dlen), (asym, alen) = comp_tabs[ci]
            blk = coefs[ci][counters[ci]]
            counters[ci] += 1
            win = (w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
            cat = int(dsym[win])
            pos += int(dlen[win])
            if cat:
                win = (w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
                bits = win >> (16 - cat)
                pos += cat
                # inline _extend (hot loop)
                preds[ci] += bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1
            blk[0] = preds[ci]
            k = 1
            while k < 64:
                win = (w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
                s = int(asym[win])
                pos += int(alen[win])
                if s == 0x00:
                    break
                if s == 0xF0:
                    k += 16
                    continue
                k += s >> 4
                cat = s & 0xF
                win = (w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
                bits = win >> (16 - cat)
                blk[k] = bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1
                pos += cat
                k += 1
    # ---- reconstruct per-component planes at their native sampling
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        pw, ph = mcux * 8 * ch, mcuy * 8 * cv
        dez = np.zeros((n_mcu * bper[ci], 64), dtype=np.int32)
        dez[:, _ZIG] = coefs[ci]
        if bper[ci] > 1:
            # blocks arrived in MCU-interleave order; permute back to
            # plane raster order (inverse of _mcu_perm)
            perm = _mcu_perm(ph, pw, ch, cv)
            inv = np.empty_like(perm)
            inv[perm] = np.arange(len(perm))
            dez = dez[inv]
        plane = _dequant_inv(dez.reshape(-1, 8, 8), qts[tq], ph, pw)
        if ch < maxh or cv < maxv:
            plane = np.repeat(np.repeat(plane, maxv // cv, 0),
                              maxh // ch, 1)
        planes.append(plane)
    H, W = mcuy * mcu_h, mcux * mcu_w
    if ncomp == 1:
        g = planes[0]
        return np.clip(np.round(g), 0, 255).astype(np.uint8)[:h, :w]
    out = np.stack(planes, axis=2)
    return _from_ycbcr(out)[:h, :w]
