"""WebP lossless (VP8L) codec — from-scratch, spec-derived.

The reference's WebP driver (``frmts/webp/webpdataset.cpp:893`` — the
``sConfig.lossless`` path, ``webpdrivercore.cpp:32`` VP8L signature
sniff) delegates to libwebp; this module implements the public "WebP
Lossless Bitstream Specification" directly so the engine can carry
``fmt='webp'`` chips without external libraries.

Scope (encoder AND decoder, symmetric):
- RIFF/WEBP container with a single VP8L chunk.
- LSB-first bitstream, canonical (DEFLATE-style) prefix codes in both
  the simple (1-2 symbol) and full (code-length-coded) serializations.
- The 5-tree entropy image (green+length+cache / red / blue / alpha /
  distance), LZ77 backward references with the 120-entry close-neighbor
  distance mapping, and the optional color cache.
- The subtract-green transform.

Not implemented (decode raises, matching the engine's declared-guard
convention): the predictor / cross-color / color-indexing transforms
and meta prefix codes — none are ever emitted by this encoder, and no
external WebP files exist in this environment to decode.

Interop caveat: with no libwebp in the container the bit-exactness of
this implementation against other decoders is validated by raw-bit
anchor tests (header fields, simple-code layout) plus round trips, not
by a third-party golden.
"""

from __future__ import annotations

import struct

import numpy as np

# Order in which code-length-code lengths are stored (spec §"Prefix
# code serialization"; same table as libwebp kCodeLengthCodeOrder).
_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_MAX_CODE_LEN = 15  # main trees
_MAX_CL_LEN = 7     # code-length tree (3-bit length fields)
_MAX_LZ_LEN = 4096  # longest length expressible by length code 23

# 120 close-neighbor (dx, dy) offsets for distance codes 1..120
# (spec §"Decoding of distances"). dist = dy*xsize + dx, clamped to 1.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (7, 1), (-7, 1), (2, 7), (-2, 7),
    (7, 2), (-7, 2), (4, 6), (-4, 6), (6, 4), (-6, 4), (5, 5), (-5, 5),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)

_CACHE_MUL = 0x1E35A7BD  # color-cache hash multiplier (spec)


# ---------------------------------------------------------------------------
# LSB-first bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    """Collects (value, nbits) emissions; vectorized LSB-first pack.

    Scalar ``put`` calls buffer into Python lists; ``put_arrays`` takes
    whole numpy emission arrays zero-loop (the vectorized literal path
    emits one (n*4,) array for the entire pixel stream)."""

    def __init__(self):
        self._pv: list = []   # pending scalar values
        self._pb: list = []   # pending scalar nbits
        self._segs: list = []  # ordered (vals uint64, nbits int64) arrays

    def _flush_pending(self) -> None:
        if self._pv:
            self._segs.append((np.asarray(self._pv, dtype=np.uint64),
                               np.asarray(self._pb, dtype=np.int64)))
            self._pv, self._pb = [], []

    def put(self, value: int, nbits: int) -> None:
        self._pv.append(value)
        self._pb.append(nbits)

    def put_arrays(self, vals: np.ndarray, nbits: np.ndarray) -> None:
        self._flush_pending()
        self._segs.append((vals.astype(np.uint64, copy=False),
                           nbits.astype(np.int64, copy=False)))

    def tobytes(self) -> bytes:
        self._flush_pending()
        if not self._segs:
            return b""
        vals = np.concatenate([s[0] for s in self._segs])
        nb = np.concatenate([s[1] for s in self._segs])
        total = int(nb.sum())
        if total == 0:
            return b""
        out = np.zeros(total, dtype=np.uint8)
        ends = np.cumsum(nb)
        starts = ends - nb
        # chunk so the (M, maxb) expansion stays small
        step = 1 << 17
        for lo in range(0, len(nb), step):
            hi = min(lo + step, len(nb))
            v, b, s = vals[lo:hi], nb[lo:hi], starts[lo:hi]
            maxb = int(b.max()) if len(b) else 0
            if maxb == 0:
                continue
            k = np.arange(maxb, dtype=np.uint64)
            mat = ((v[:, None] >> k[None, :]) & 1).astype(np.uint8)
            pos = s[:, None] + np.arange(maxb)[None, :]
            mask = np.arange(maxb)[None, :] < b[:, None]
            out[pos[mask]] = mat[mask]
        return np.packbits(out, bitorder="little").tobytes()


class _BitReader:
    """LSB-first reader over a byte buffer (8-byte window peeks)."""

    def __init__(self, data: bytes):
        self.data = bytes(data) + b"\x00" * 8
        self.limit = len(data) * 8
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.limit:
            raise ValueError("VP8L: bitstream truncated")
        self.pos = p + n
        word = int.from_bytes(self.data[p >> 3:(p >> 3) + 8], "little")
        return (word >> (p & 7)) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        p = self.pos
        word = int.from_bytes(self.data[p >> 3:(p >> 3) + 8], "little")
        return (word >> (p & 7)) & ((1 << n) - 1)


# ---------------------------------------------------------------------------
# Canonical prefix codes
# ---------------------------------------------------------------------------

def _rev_bits(code: int, length: int) -> int:
    r = 0
    for _ in range(length):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


_REV8 = np.array([_rev_bits(i, 8) for i in range(256)], dtype=np.int64)


def _rev_bits_vec(codes: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized within-length bit reversal (lengths <= 16)."""
    rev16 = (_REV8[codes & 0xFF] << 8) | _REV8[(codes >> 8) & 0xFF]
    return rev16 >> (16 - lengths)


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """DEFLATE canonical code assignment (increasing within a length)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    maxlen = int(lengths.max()) if lengths.size else 0
    bl_count = np.bincount(lengths, minlength=maxlen + 1)
    bl_count[0] = 0
    codes = np.zeros(len(lengths), dtype=np.int64)
    next_code = 0
    first = np.zeros(maxlen + 1, dtype=np.int64)
    for l in range(1, maxlen + 1):
        next_code = (next_code + int(bl_count[l - 1])) << 1
        first[l] = next_code
    counters = first.copy()
    for sym in range(len(lengths)):
        l = int(lengths[sym])
        if l:
            codes[sym] = counters[l]
            counters[l] += 1
    return codes


def _plain_huffman_lengths(freqs: np.ndarray) -> np.ndarray:
    """Unlimited Huffman code lengths for positive ``freqs`` (n >= 2).

    Two-queue construction (leaves sorted once, merged nodes emerge in
    nondecreasing weight order), then depths via parent pointers.
    Deterministic: ties prefer the leaf queue, then lower index."""
    n = len(freqs)
    order = np.lexsort((np.arange(n), np.asarray(freqs)))
    leaf_w = [int(freqs[i]) for i in order]
    li = 0                      # leaf queue head
    node_w: list[int] = []      # merged-node weights (FIFO)
    ni = 0
    parent = [0] * (2 * n - 1)  # tree ids: leaves 0..n-1, merges follow
    nxt = n

    def pop_min():
        nonlocal li, ni
        if li < n and (ni >= len(node_w) or leaf_w[li] <= node_w[ni]):
            li += 1
            return leaf_w[li - 1], int(order[li - 1])
        ni += 1
        return node_w[ni - 1], n + ni - 1

    for _ in range(n - 1):
        wa, a = pop_min()
        wb, b = pop_min()
        parent[a] = nxt
        parent[b] = nxt
        node_w.append(wa + wb)
        nxt += 1
    # depths: root (last merge) depth 0, children = parent depth + 1
    depth = [0] * (2 * n - 1)
    for node in range(2 * n - 3, -1, -1):
        depth[node] = depth[parent[node]] + 1
    lengths = np.maximum(np.array(depth[:n], dtype=np.int64), 1)
    return lengths


def _limited_lengths(freqs: np.ndarray, maxlen: int) -> np.ndarray:
    """Length-limited code lengths (zlib-style Kraft repair)."""
    lengths = _plain_huffman_lengths(freqs)
    if lengths.max() <= maxlen:
        return lengths
    lengths = np.minimum(lengths, maxlen)
    count = np.bincount(lengths, minlength=maxlen + 1).astype(np.int64)
    count[0] = 0
    kraft = int(np.sum(count[1:] * (1 << (maxlen - np.arange(1, maxlen + 1)))))
    full = 1 << maxlen
    # demote (lengthen) from the longest length < maxlen: smallest steps
    while kraft > full:
        l = maxlen - 1
        while l > 0 and count[l] == 0:
            l -= 1
        if l == 0:
            raise AssertionError("VP8L: Kraft repair failed")
        count[l] -= 1
        count[l + 1] += 1
        kraft -= 1 << (maxlen - l - 1)
    # promote (shorten) to land exactly on a complete code
    while kraft < full:
        slack = full - kraft
        l = maxlen
        while l > 1 and ((1 << (maxlen - l + 1)) - (1 << (maxlen - l)) > slack
                         or count[l] == 0):
            l -= 1
        if count[l] == 0:
            raise AssertionError("VP8L: Kraft repair failed")
        count[l] -= 1
        count[l - 1] += 1
        kraft += 1 << (maxlen - l)
    # redistribute: most frequent symbols get the shortest lengths
    order = np.lexsort((np.arange(len(freqs)), -np.asarray(freqs)))
    out = np.zeros(len(freqs), dtype=np.int64)
    pos = 0
    for l in range(1, maxlen + 1):
        for _ in range(int(count[l])):
            out[order[pos]] = l
            pos += 1
    assert pos == len(freqs)
    return out


class _PrefixCode:
    """Decoder side: single-level LUT over ``maxlen`` peeked bits."""

    __slots__ = ("lut", "maxlen", "single", "max_sym")

    def __init__(self, lengths: np.ndarray | None, single: int | None = None):
        self.single = single
        if single is not None:
            self.lut = None
            self.maxlen = 0
            self.max_sym = single
            return
        lengths = np.asarray(lengths, dtype=np.int64)
        used = np.nonzero(lengths)[0]
        if used.size == 0:
            raise ValueError("VP8L: empty prefix code")
        maxlen = int(lengths[used].max())
        if maxlen > _MAX_CODE_LEN:
            raise ValueError("VP8L: code length > 15")
        kraft = int(np.sum(1 << (maxlen - lengths[used])))
        if kraft != (1 << maxlen) and used.size > 1:
            raise ValueError("VP8L: invalid (incomplete/oversubscribed) code")
        self.maxlen = maxlen
        codes = _canonical_codes(lengths)
        lut = np.full(1 << maxlen, -1, dtype=np.int64)
        revs = _rev_bits_vec(codes[used], lengths[used])
        entries = (used << 4) | lengths[used]
        # fill grouped by code length: <=15 vectorized scatters
        for l in np.unique(lengths[used]):
            sel = lengths[used] == l
            fill = (np.arange(1 << (maxlen - l), dtype=np.int64) << l)
            idx = revs[sel][:, None] + fill[None, :]
            lut[idx.ravel()] = np.repeat(entries[sel], len(fill))
        self.lut = lut
        self.max_sym = int(used.max())

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        e = int(self.lut[br.peek(self.maxlen)])
        if e < 0:
            raise ValueError("VP8L: invalid prefix code word")
        br.pos += e & 15
        return e >> 4


class _EncCode:
    """Encoder side: per-symbol (reversed code, length) LUTs."""

    __slots__ = ("codes", "lengths", "simple_syms")

    def __init__(self, lengths: np.ndarray | None,
                 simple_syms: list | None = None):
        self.simple_syms = simple_syms
        if simple_syms is not None:
            n = max(simple_syms) + 1
            self.codes = np.zeros(n, dtype=np.int64)
            self.lengths = np.zeros(n, dtype=np.int64)
            if len(simple_syms) == 2:
                self.codes[simple_syms[0]] = 0
                self.codes[simple_syms[1]] = 1
                self.lengths[simple_syms[0]] = 1
                self.lengths[simple_syms[1]] = 1
            # 1 symbol: zero bits — codes/lengths stay 0
            return
        lengths = np.asarray(lengths, dtype=np.int64)
        canon = _canonical_codes(lengths)
        rev = np.zeros(len(lengths), dtype=np.int64)
        used = np.nonzero(lengths)[0]
        rev[used] = _rev_bits_vec(canon[used], lengths[used])
        self.codes = rev
        self.lengths = lengths


# ---------------------------------------------------------------------------
# Prefix-code (de)serialization
# ---------------------------------------------------------------------------

def _emit_prefix_code(bw: _BitWriter, hist: np.ndarray,
                      alphabet: int) -> _EncCode:
    """Serialize one prefix code for ``hist`` and return the emit LUT."""
    used = np.nonzero(hist)[0]
    if used.size == 0:
        used = np.array([0])  # never-read tree: 1-symbol placeholder
    if used.size <= 2 and int(used.max()) <= 255:
        # simple form
        bw.put(1, 1)                      # simple
        bw.put(used.size - 1, 1)          # num_symbols - 1
        s0 = int(used[0])
        first8 = 1 if s0 > 1 else 0
        bw.put(first8, 1)
        bw.put(s0, 8 if first8 else 1)
        if used.size == 2:
            bw.put(int(used[1]), 8)
        return _EncCode(None, simple_syms=[int(s) for s in used])

    if used.size == 1:
        lengths = np.zeros(alphabet, dtype=np.int64)
        lengths[used[0]] = 1
    elif used.size == 2:
        lengths = np.zeros(alphabet, dtype=np.int64)
        lengths[used] = 1
    else:
        lengths = np.zeros(alphabet, dtype=np.int64)
        lengths[used] = _limited_lengths(hist[used], _MAX_CODE_LEN)

    # RLE-tokenize the length array (DEFLATE-style 16/17/18 repeats)
    tokens: list[tuple[int, int, int]] = []  # (symbol, extra_val, extra_bits)
    i, n = 0, alphabet
    prev_nz = -1
    while i < n:
        l = int(lengths[i])
        if l == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                tokens.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                tokens.append((17, r - 3, 3))
                run -= r
            tokens.extend((0, 0, 0) for _ in range(run))
            i = j
        else:
            tokens.append((l, 0, 0))
            prev_nz = l
            i += 1
            run = 0
            while i + run < n and lengths[i + run] == prev_nz:
                run += 1
            emitted = 0
            while run - emitted >= 3:
                r = min(run - emitted, 6)
                tokens.append((16, r - 3, 2))
                emitted += r
            i += emitted  # leftover (<3) re-enter the loop as literals

    cl_hist = np.zeros(19, dtype=np.int64)
    for sym, _, _ in tokens:
        cl_hist[sym] += 1
    cl_used = np.nonzero(cl_hist)[0]
    cl_lengths = np.zeros(19, dtype=np.int64)
    if cl_used.size == 1:
        cl_lengths[cl_used[0]] = 1
    elif cl_used.size == 2:
        cl_lengths[cl_used] = 1
    else:
        cl_lengths[cl_used] = _limited_lengths(cl_hist[cl_used], _MAX_CL_LEN)

    # trim trailing zeros in _ORDER ordering (min 4 entries)
    num_cl = 19
    while num_cl > 4 and cl_lengths[_ORDER[num_cl - 1]] == 0:
        num_cl -= 1

    bw.put(0, 1)            # full form
    bw.put(num_cl - 4, 4)
    for k in range(num_cl):
        bw.put(int(cl_lengths[_ORDER[k]]), 3)
    bw.put(0, 1)            # use_max_symbol = 0: full token coverage

    cl_code = _EncCode(cl_lengths)
    for sym, ev, eb in tokens:
        bw.put(int(cl_code.codes[sym]), int(cl_code.lengths[sym]))
        if eb:
            bw.put(ev, eb)
    return _EncCode(lengths)


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first8 = br.read(1)
        s0 = br.read(8 if first8 else 1)
        if num_symbols == 1:
            return _PrefixCode(None, single=s0)
        s1 = br.read(8)
        lengths = np.zeros(alphabet, dtype=np.int64)
        if s0 >= alphabet or s1 >= alphabet:
            raise ValueError("VP8L: simple-code symbol out of range")
        lengths[s0] = 1
        lengths[s1] = 1
        # canonical assignment: s0 must get code 0 — DEFLATE canonical
        # gives code 0 to the smaller symbol index, so reorder via an
        # explicit two-symbol table instead when s0 > s1.
        if s0 < s1:
            return _PrefixCode(lengths)
        pc = _PrefixCode.__new__(_PrefixCode)
        pc.single = None
        pc.maxlen = 1
        pc.lut = np.array([(s0 << 4) | 1, (s1 << 4) | 1], dtype=np.int64)
        pc.max_sym = max(s0, s1)
        return pc

    num_cl = 4 + br.read(4)
    cl_lengths = np.zeros(19, dtype=np.int64)
    for k in range(num_cl):
        cl_lengths[_ORDER[k]] = br.read(3)
    cl_used = np.nonzero(cl_lengths)[0]
    if cl_used.size == 0:
        raise ValueError("VP8L: empty code-length code")
    # a single used symbol is serialized with length 1 (our encoder's
    # convention): each token read consumes one 0 bit
    cl_code = _PrefixCode(cl_lengths)

    use_max = br.read(1)
    if use_max:
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet

    lengths = np.zeros(alphabet, dtype=np.int64)
    sym = 0
    prev_nz = 8
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(br)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len:
                prev_nz = code_len
        else:
            if code_len == 16:
                repeat = br.read(2) + 3
                fill = prev_nz
            elif code_len == 17:
                repeat = br.read(3) + 3
                fill = 0
            else:
                repeat = br.read(7) + 11
                fill = 0
            if sym + repeat > alphabet:
                raise ValueError("VP8L: code-length repeat overflow")
            lengths[sym:sym + repeat] = fill
            sym += repeat
    used = np.nonzero(lengths)[0]
    if used.size == 1:
        # our encoder writes a single used symbol with length 1: reading
        # consumes 1 bit (code 0) per symbol
        pass
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix-coded integers (lengths and distance codes)
# ---------------------------------------------------------------------------

def _lz77_prefix(v: int) -> tuple[int, int, int]:
    """value >= 1 -> (prefix_code, extra_val, extra_bits)."""
    u = v - 1
    if u < 4:
        return u, 0, 0
    n = u.bit_length() - 1
    code = 2 * n + ((u >> (n - 1)) & 1)
    extra_bits = n - 1
    return code, u & ((1 << extra_bits) - 1), extra_bits


def _lz77_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _dist_to_code(dist: int, xsize: int,
                  lut: dict[int, int] | None) -> tuple[int, int, int]:
    code = dist + 120
    if lut is not None:
        code = lut.get(dist, code)
    return _lz77_prefix(code)


def _dist_lut(xsize: int) -> dict[int, int]:
    lut: dict[int, int] = {}
    for i, (dx, dy) in enumerate(_DIST_MAP):
        d = dy * xsize + dx
        if d >= 1 and d not in lut:
            lut[d] = i + 1
    return lut


def _code_to_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(dy * xsize + dx, 1)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _tokenize(argb: np.ndarray, xsize: int, use_lz77: bool,
              cache_bits: int) -> tuple[list, np.ndarray, np.ndarray,
                                        np.ndarray, np.ndarray, np.ndarray]:
    """Greedy LZ77 + color-cache tokenizer over the ARGB pixel stream.

    Returns (tokens, green_hist, red_hist, blue_hist, alpha_hist,
    dist_hist). Token shapes: ('lit', argb) / ('cache', idx) /
    ('copy', len, dist_code_tuple).
    """
    n = len(argb)
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_hist = np.zeros(_NUM_LITERALS + _NUM_LENGTH_CODES + cache_size,
                          dtype=np.int64)
    red_hist = np.zeros(256, dtype=np.int64)
    blue_hist = np.zeros(256, dtype=np.int64)
    alpha_hist = np.zeros(256, dtype=np.int64)
    dist_hist = np.zeros(_NUM_DISTANCE_CODES, dtype=np.int64)
    tokens: list = []
    p = argb
    dlut = _dist_lut(xsize) if use_lz77 else None
    cache = np.full(cache_size, -1, dtype=np.int64) if cache_size else None

    def cache_idx(px: int) -> int:
        return ((_CACHE_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)

    i = 0
    table: dict[tuple, int] = {}
    while i < n:
        if use_lz77 and i + 3 <= n:
            key = (int(p[i]), int(p[i + 1]), int(p[i + 2]))
            j = table.get(key, -1)
            table[key] = i
            if 0 <= j and i - j <= 0xFFF00:  # distance-code-39 ceiling
                dist = i - j
                length = 3
                maxl = min(_MAX_LZ_LEN, n - i)
                while length < maxl and p[j + length] == p[i + length]:
                    length += 1
                lc, lev, leb = _lz77_prefix(length)
                dc, dev, deb = _dist_to_code(dist, xsize, dlut)
                tokens.append(("copy", length, (lc, lev, leb),
                               (dc, dev, deb)))
                green_hist[_NUM_LITERALS + lc] += 1
                dist_hist[dc] += 1
                if cache is not None:
                    for k in range(i, i + length):
                        cache[cache_idx(int(p[k]))] = int(p[k])
                for k in range(i + 1, min(i + length, n - 2)):
                    table[(int(p[k]), int(p[k + 1]), int(p[k + 2]))] = k
                i += length
                continue
        px = int(p[i])
        if cache is not None:
            ci = cache_idx(px)
            if cache[ci] == px:
                tokens.append(("cache", ci))
                green_hist[_NUM_LITERALS + _NUM_LENGTH_CODES + ci] += 1
                i += 1
                continue
            cache[ci] = px
        a = (px >> 24) & 0xFF
        r = (px >> 16) & 0xFF
        g = (px >> 8) & 0xFF
        b = px & 0xFF
        tokens.append(("lit", px))
        green_hist[g] += 1
        red_hist[r] += 1
        blue_hist[b] += 1
        alpha_hist[a] += 1
        i += 1
    return tokens, green_hist, red_hist, blue_hist, alpha_hist, dist_hist


# ---------------------------------------------------------------------------
# Color-indexing transform (spec §"Color indexing transform")
# ---------------------------------------------------------------------------

def _palette_width_bits(n_colors: int) -> int:
    """Sub-pixel packing: <=2 colors -> 8 px/byte, <=4 -> 4, <=16 -> 2."""
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _palette_forward(argb: np.ndarray, w: int,
                     h: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Map pixels to palette indices and bundle.

    Returns (packed green-channel image flat uint32, table uint32
    ascending, packed width).  Raises if more than 256 distinct colors.
    """
    table = np.unique(argb)
    if len(table) > 256:
        raise ValueError(
            f"palette encoding needs <= 256 distinct colors, got "
            f"{len(table)}")
    idx = np.searchsorted(table, argb).astype(np.uint32)
    wb = _palette_width_bits(len(table))
    if wb == 0:
        packed = idx
        pw = w
    else:
        ppb = 1 << wb            # pixels per packed byte
        bits_pp = 8 >> wb        # bits per pixel
        pw = (w + ppb - 1) >> wb
        grid = np.zeros((h, pw * ppb), dtype=np.uint32)
        grid[:, :w] = idx.reshape(h, w)
        sub = grid.reshape(h, pw, ppb)
        shifts = (np.arange(ppb, dtype=np.uint32) * bits_pp)[None, None, :]
        packed = (sub << shifts).sum(axis=2, dtype=np.uint32).ravel()
    out = np.uint32(0xFF000000) | (packed << 8)
    return out, table, pw


def _palette_inverse(a, r, g, b, w: int, h: int, table: np.ndarray,
                     pw: int):
    """Expand bundled indices and look up the palette (out-of-range
    indices map to 0x00000000, the libwebp convention)."""
    wb = _palette_width_bits(len(table))
    green = g.reshape(h, pw).astype(np.uint32)
    if wb == 0:
        idx = green
    else:
        bits_pp = 8 >> wb
        mask = (1 << bits_pp) - 1
        x = np.arange(w, dtype=np.int64)
        src = green[:, x >> wb]
        shift = ((x & ((1 << wb) - 1)) * bits_pp).astype(np.uint32)
        idx = (src >> shift[None, :]) & mask
    safe = idx < len(table)
    px = np.where(safe, table[np.minimum(idx, len(table) - 1)],
                  np.uint32(0))
    return ((px >> 24) & 0xFF).ravel(), ((px >> 16) & 0xFF).ravel(), \
        ((px >> 8) & 0xFF).ravel(), (px & 0xFF).ravel()


def _emit_palette_table(bw: _BitWriter, table: np.ndarray) -> None:
    """Palette entries are stored component-delta-coded (uint8 wrap vs
    the previous entry) as a width=n, height=1 entropy image."""
    t = table.astype(np.uint32)
    prev = np.zeros(len(t), dtype=np.uint32)
    prev[1:] = t[:-1]
    delta = np.uint32(0)
    comps = []
    for sh in (24, 16, 8, 0):
        d = (((t >> sh) & 0xFF) - ((prev >> sh) & 0xFF)) & 0xFF
        comps.append(d << sh)
    delta = comps[0] | comps[1] | comps[2] | comps[3]
    _emit_entropy_stream(bw, delta, len(t), True, 0)


def _read_palette_table(br: _BitReader, n: int) -> np.ndarray:
    delta = _decode_entropy_stream(br, n, 1)
    comps = []
    for sh in (24, 16, 8, 0):
        c = np.cumsum((delta >> sh) & 0xFF).astype(np.uint32) & 0xFF
        comps.append(c << sh)
    return comps[0] | comps[1] | comps[2] | comps[3]


# ---------------------------------------------------------------------------
# Cross-color transform (spec §"Color transform")
# ---------------------------------------------------------------------------
#
# Per block, three signed 3.5 fixed-point multipliers decorrelate the
# channels:  red'  = red  - (g2r*green)>>5
#            blue' = blue - (g2b*green)>>5 - (r2b*red)>>5   [orig red]
# Inverse adds the deltas back (blue uses the RECOVERED red).  All
# same-pixel arithmetic -> both directions fully vectorized.  The
# element is stored as a subresolution pixel: b=g2r, g=g2b, r=r2b.

_XC_CANDIDATES = np.array(
    [-96, -64, -48, -32, -24, -16, -8, -4, 0, 4, 8, 16, 24, 32, 48, 64, 96],
    dtype=np.int64)


def _xc_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(int8 multiplier * int8 channel) >> 5, C arithmetic-shift."""
    c8 = np.where(c > 127, c - 256, c)  # uint8 channel as int8
    return (t * c8) >> 5


def _xc_cost(res: np.ndarray) -> np.ndarray:
    """Wrap-distance residual cost, summed over the block axis."""
    return np.minimum(res, 256 - res).sum(axis=-1)


def _cross_color_forward(argb: np.ndarray, w: int, h: int,
                         bits: int) -> tuple[np.ndarray, np.ndarray,
                                             int, int]:
    """Greedy per-block multiplier choice from a fixed candidate set
    (g2r on red; then g2b with r2b=0; then r2b given g2b — each step
    vectorized over candidates x blocks)."""
    bs = 1 << bits
    subw = (w + bs - 1) >> bits
    subh = (h + bs - 1) >> bits
    A = argb.reshape(h, w)
    g = ((A >> 8) & 0xFF).astype(np.int64)
    r = ((A >> 16) & 0xFF).astype(np.int64)
    b = (A & 0xFF).astype(np.int64)

    # group pixels by block: pad to block multiples then reshape
    def blocks(ch):
        p = np.zeros((subh * bs, subw * bs), dtype=np.int64)
        p[:h, :w] = ch
        return (p.reshape(subh, bs, subw, bs).transpose(0, 2, 1, 3)
                .reshape(subh * subw, bs * bs))

    gb, rb, bb = blocks(g), blocks(r), blocks(b)
    # mask padding out of costs (padding pixels are 0 -> residual 0
    # for any multiplier, so they never bias the argmin)
    cand = _XC_CANDIDATES[:, None, None]
    res_r = (rb[None, :, :] - _xc_delta(cand, gb[None, :, :])) & 0xFF
    g2r = _XC_CANDIDATES[np.argmin(_xc_cost(res_r), axis=0)]
    res_b1 = (bb[None, :, :] - _xc_delta(cand, gb[None, :, :])) & 0xFF
    g2b = _XC_CANDIDATES[np.argmin(_xc_cost(res_b1), axis=0)]
    b_after_g = (bb - _xc_delta(g2b[:, None], gb)) & 0xFF
    res_b2 = (b_after_g[None, :, :] - _xc_delta(cand, rb[None, :, :])) & 0xFF
    r2b = _XC_CANDIDATES[np.argmin(_xc_cost(res_b2), axis=0)]

    # apply per-pixel with the block maps
    bmap_y = np.minimum(np.arange(h) >> bits, subh - 1)
    bmap_x = np.minimum(np.arange(w) >> bits, subw - 1)
    bidx = (bmap_y[:, None] * subw + bmap_x[None, :])
    g2r_p = g2r[bidx]
    g2b_p = g2b[bidx]
    r2b_p = r2b[bidx]
    new_r = (r - _xc_delta(g2r_p, g)) & 0xFF
    new_b = (b - _xc_delta(g2b_p, g) - _xc_delta(r2b_p, r)) & 0xFF
    out = ((A & np.uint32(0xFF00FF00))
           | (new_r.astype(np.uint32) << 16) | new_b.astype(np.uint32))
    # element pixels: a=255, r=r2b, g=g2b, b=g2r (signed bytes as uint8)
    elem = (np.uint32(0xFF000000)
            | ((r2b & 0xFF).astype(np.uint32) << 16)
            | ((g2b & 0xFF).astype(np.uint32) << 8)
            | (g2r & 0xFF).astype(np.uint32)).reshape(subh, subw)
    return out.ravel(), elem, subw, subh


def _cross_color_inverse(a, r, g, b, w: int, h: int, bits: int,
                         elem: np.ndarray):
    """Vectorized inverse: red first, then blue with the recovered red."""
    subw = elem.shape[1]
    subh = elem.shape[0]
    bmap_y = np.minimum(np.arange(h) >> bits, subh - 1)
    bmap_x = np.minimum(np.arange(w) >> bits, subw - 1)
    E = elem[bmap_y[:, None], bmap_x[None, :]]

    def s8(x):
        return np.where(x > 127, x - 256, x).astype(np.int64)

    g2r = s8((E) & 0xFF)
    g2b = s8((E >> 8) & 0xFF)
    r2b = s8((E >> 16) & 0xFF)
    G = g.reshape(h, w).astype(np.int64)
    R = r.reshape(h, w).astype(np.int64)
    B = b.reshape(h, w).astype(np.int64)
    R = (R + _xc_delta(g2r, G)) & 0xFF
    B = (B + _xc_delta(g2b, G) + _xc_delta(r2b, R)) & 0xFF
    return a, R.ravel().astype(np.uint32), g, B.ravel().astype(np.uint32)


# ---------------------------------------------------------------------------
# Predictor transform (spec §"Predictor transform": 14 modes, per-block)
# ---------------------------------------------------------------------------

def _avg2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return (x + y) >> 1


def _predictions(P: np.ndarray, w: int, h: int) -> np.ndarray:
    """All 14 mode predictions, vectorized.

    ``P``: (4, h, w) int32 channels (a, r, g, b).  Returns (14, 4, h, w).
    Edge rules (applied to every mode so block modes are irrelevant
    there): (0,0) predicts BLACK, row 0 predicts L, column 0 predicts
    T.  TR on the rightmost column is the current row's leftmost pixel
    (the contiguous-buffer rule libwebp inherits and the spec keeps).
    """
    L = np.zeros_like(P)
    L[:, :, 1:] = P[:, :, :-1]
    T = np.zeros_like(P)
    T[:, 1:, :] = P[:, :-1, :]
    TL = np.zeros_like(P)
    TL[:, 1:, 1:] = P[:, :-1, :-1]
    TR = np.zeros_like(P)
    if w > 1:
        TR[:, 1:, :-1] = P[:, :-1, 1:]
    TR[:, 1:, -1] = P[:, 1:, 0]

    black = np.zeros_like(P)
    black[0] = 255  # alpha channel of 0xff000000

    sel_p = L + T - TL
    pL = np.abs(sel_p - L).sum(axis=0)
    pT = np.abs(sel_p - T).sum(axis=0)
    select = np.where((pL < pT)[None, :, :], L, T)

    clamp_full = np.clip(L + T - TL, 0, 255)
    av = _avg2(L, T)
    d = av - TL
    half = np.sign(d) * (np.abs(d) >> 1)  # C trunc-toward-zero /2
    clamp_half = np.clip(av + half, 0, 255)

    preds = np.stack([
        black, L, T, TR, TL,
        _avg2(_avg2(L, TR), T), _avg2(L, TL), _avg2(L, T),
        _avg2(TL, T), _avg2(T, TR), _avg2(_avg2(L, TL), _avg2(T, TR)),
        select, clamp_full, clamp_half,
    ])
    # edge overrides (same for every mode)
    preds[:, :, 0, 1:] = L[None, :, 0, 1:]
    preds[:, :, 1:, 0] = T[None, :, 1:, 0]
    preds[:, :, 0, 0] = black[None, :, 0, 0]
    return preds


def _predictor_forward(argb: np.ndarray, w: int, h: int,
                       bits: int) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Residual-encode ``argb`` (flat uint32) with per-block best modes.

    Returns (residual flat uint32, modes (subh, subw) uint8, subw, subh).
    """
    bs = 1 << bits
    subw = (w + bs - 1) >> bits
    subh = (h + bs - 1) >> bits
    P = np.empty((4, h, w), dtype=np.int32)
    A = argb.reshape(h, w)
    P[0] = (A >> 24) & 0xFF
    P[1] = (A >> 16) & 0xFF
    P[2] = (A >> 8) & 0xFF
    P[3] = A & 0xFF
    preds = _predictions(P, w, h)
    res = (P[None, :, :, :] - preds) & 0xFF           # (14, 4, h, w)
    cost_pix = np.minimum(res, 256 - res).sum(axis=1)  # (14, h, w)
    ycut = np.arange(0, h, bs)
    xcut = np.arange(0, w, bs)
    cost_blk = np.add.reduceat(
        np.add.reduceat(cost_pix, ycut, axis=1), xcut, axis=2)
    modes = np.argmin(cost_blk, axis=0).astype(np.uint8)  # (subh, subw)

    mode_pix = np.repeat(np.repeat(modes, bs, axis=0), bs, axis=1)[:h, :w]
    out = np.empty((4, h, w), dtype=np.int32)
    for m in np.unique(mode_pix):
        mask = mode_pix == m
        out[:, mask] = res[m][:, mask]
    flat = ((out[0].astype(np.uint32) << 24)
            | (out[1].astype(np.uint32) << 16)
            | (out[2].astype(np.uint32) << 8)
            | out[3].astype(np.uint32)).ravel()
    return flat, modes, subw, subh


def _predictor_inverse(a, r, g, b, w: int, h: int, bits: int,
                       modes: np.ndarray):
    """Sequential inverse predictor (decoded pixels feed later
    predictions).  Row segments whose mode needs no L neighbor are
    vectorized; L-dependent modes run the per-pixel loop."""
    res = np.empty((4, h, w), dtype=np.int32)
    res[0] = a.reshape(h, w)
    res[1] = r.reshape(h, w)
    res[2] = g.reshape(h, w)
    res[3] = b.reshape(h, w)
    out = np.zeros((4, h, w), dtype=np.int32)
    bs = 1 << bits
    # row 0: (0,0) = BLACK + residual, then L-prediction -> cumsum
    row = res[:, 0, :].copy()
    row[0, 0] = (row[0, 0] + 255) & 0xFF
    out[:, 0, :] = np.cumsum(row, axis=1) & 0xFF

    for y in range(1, h):
        top = out[:, y - 1, :]
        # column 0: T prediction
        out[:, y, 0] = (res[:, y, 0] + top[:, 0]) & 0xFF
        by = (y >> bits)
        for bx in range((w + bs - 1) >> bits):
            x0 = max(bx << bits, 1)
            x1 = min((bx + 1) << bits, w)
            if x0 >= x1:
                continue
            m = int(modes[by, bx])
            seg = res[:, y, x0:x1]
            if m == 0:
                pred = np.zeros((4, x1 - x0), dtype=np.int32)
                pred[0] = 255
                out[:, y, x0:x1] = (seg + pred) & 0xFF
            elif m == 2:
                out[:, y, x0:x1] = (seg + top[:, x0:x1]) & 0xFF
            elif m == 4:
                out[:, y, x0:x1] = (seg + top[:, x0 - 1:x1 - 1]) & 0xFF
            elif m in (3, 8, 9):
                tr = np.empty((4, x1 - x0), dtype=np.int32)
                if x1 < w:
                    tr[:] = top[:, x0 + 1:x1 + 1]
                else:
                    tr[:, :-1] = top[:, x0 + 1:]
                    tr[:, -1] = out[:, y, 0]  # rightmost-column TR rule
                if m == 3:
                    pred = tr
                elif m == 8:
                    pred = _avg2(top[:, x0 - 1:x1 - 1], top[:, x0:x1])
                else:
                    pred = _avg2(top[:, x0:x1], tr)
                out[:, y, x0:x1] = (seg + pred) & 0xFF
            elif m == 1:
                # L prediction = running sum seeded by the left neighbor
                carry = out[:, y, x0 - 1][:, None]
                out[:, y, x0:x1] = (np.cumsum(seg, axis=1) + carry) & 0xFF
            else:
                # L-dependent modes: per-pixel
                for x in range(x0, x1):
                    lpx = out[:, y, x - 1]
                    tpx = top[:, x]
                    tlpx = top[:, x - 1]
                    trpx = top[:, x + 1] if x + 1 < w else out[:, y, 0]
                    if m == 5:
                        pred = _avg2(_avg2(lpx, trpx), tpx)
                    elif m == 6:
                        pred = _avg2(lpx, tlpx)
                    elif m == 7:
                        pred = _avg2(lpx, tpx)
                    elif m == 10:
                        pred = _avg2(_avg2(lpx, tlpx), _avg2(tpx, trpx))
                    elif m == 11:
                        p = lpx + tpx - tlpx
                        pred = (lpx if int(np.abs(p - lpx).sum())
                                < int(np.abs(p - tpx).sum()) else tpx)
                    elif m == 12:
                        pred = np.clip(lpx + tpx - tlpx, 0, 255)
                    elif m == 13:
                        av = _avg2(lpx, tpx)
                        dd = av - tlpx
                        pred = np.clip(av + np.sign(dd) * (np.abs(dd) >> 1),
                                       0, 255)
                    else:
                        raise ValueError(f"VP8L: bad predictor mode {m}")
                    out[:, y, x] = (res[:, y, x] + pred) & 0xFF
    return (out[0].ravel().astype(np.uint32),
            out[1].ravel().astype(np.uint32),
            out[2].ravel().astype(np.uint32),
            out[3].ravel().astype(np.uint32))


def _emit_meta_literal_stream(bw: _BitWriter, argb: np.ndarray, w: int,
                              h: int, meta_bits: int,
                              max_groups: int = 4) -> None:
    """Main-image entropy stream WITH meta prefix codes: tiles of
    ``1 << meta_bits`` pixels are clustered into up to ``max_groups``
    entropy groups (deterministic equal-count split of the tiles
    ranked by mean green value — brightness-banded statistics), each
    group carrying its own 5 prefix codes.  Literal-only emission
    (the spec permits LZ77/cache with meta; this encoder keeps the
    vectorized literal path)."""
    bs = 1 << meta_bits
    mw = (w + bs - 1) >> meta_bits
    mh = (h + bs - 1) >> meta_bits
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF

    # tile rank by mean green -> equal-count group split
    G = np.zeros((mh * bs, mw * bs), dtype=np.int64)
    G[:h, :w] = g.reshape(h, w)
    cnt = np.zeros((mh * bs, mw * bs), dtype=np.int64)
    cnt[:h, :w] = 1
    tsum = G.reshape(mh, bs, mw, bs).sum(axis=(1, 3))
    tcnt = cnt.reshape(mh, bs, mw, bs).sum(axis=(1, 3))
    tmean = (tsum / np.maximum(tcnt, 1)).ravel()
    n_tiles = mh * mw
    k = min(max_groups, n_tiles)
    rank = np.empty(n_tiles, dtype=np.int64)
    rank[np.lexsort((np.arange(n_tiles), tmean))] = np.arange(n_tiles)
    groups = (rank * k // n_tiles).astype(np.int64)  # equal-count split

    bw.put(0, 1)              # no color cache
    bw.put(1, 1)              # meta prefix codes present
    bw.put(meta_bits - 2, 3)
    meta_img = (np.uint32(0xFF000000)
                | ((groups >> 8).astype(np.uint32) << 16)
                | ((groups & 0xFF).astype(np.uint32) << 8))
    _emit_entropy_stream(bw, meta_img, mw, True, 0)

    # per-pixel group map
    gy = np.minimum(np.arange(h) >> meta_bits, mh - 1)
    gx = np.minimum(np.arange(w) >> meta_bits, mw - 1)
    gpix = groups.reshape(mh, mw)[gy[:, None], gx[None, :]].ravel()

    n = h * w
    vals = np.empty((n, 4), dtype=np.uint64)
    nbits = np.empty((n, 4), dtype=np.int64)
    galpha = _NUM_LITERALS + _NUM_LENGTH_CODES
    for gi in range(k):
        sel = gpix == gi
        gh_ = np.bincount(g[sel], minlength=galpha)
        rh_ = np.bincount(r[sel], minlength=256)
        bh_ = np.bincount(b[sel], minlength=256)
        ah_ = np.bincount(a[sel], minlength=256)
        gcode = _emit_prefix_code(bw, gh_, galpha)
        rcode = _emit_prefix_code(bw, rh_, 256)
        bcode = _emit_prefix_code(bw, bh_, 256)
        acode = _emit_prefix_code(bw, ah_, 256)
        _emit_prefix_code(bw, np.zeros(_NUM_DISTANCE_CODES, np.int64),
                          _NUM_DISTANCE_CODES)
        for col, (code, chan) in enumerate(
                ((gcode, g), (rcode, r), (bcode, b), (acode, a))):
            vals[sel, col] = code.codes[chan[sel]]
            nbits[sel, col] = code.lengths[chan[sel]]
    bw.put_arrays(vals.ravel(), nbits.ravel())


def _emit_entropy_stream(bw: _BitWriter, argb: np.ndarray, xsize: int,
                         use_lz77: bool, cache_bits: int) -> None:
    """Emit one entropy-coded image: cache header, meta bit, 5 prefix
    codes, symbol stream.  Used for the main image and for transform
    subresolution images (spec: both share this exact layout)."""
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    bw.put(0, 1)      # no meta prefix codes

    if not use_lz77 and not cache_bits:
        # fully vectorized literal path: bincount histograms, LUT code
        # lookup, one interleaved (n*4,) emission array — no pixel loop
        a = (argb >> 24) & 0xFF
        r = (argb >> 16) & 0xFF
        g = (argb >> 8) & 0xFF
        b = argb & 0xFF
        gh = np.bincount(g, minlength=_NUM_LITERALS + _NUM_LENGTH_CODES)
        rh = np.bincount(r, minlength=256)
        bh = np.bincount(b, minlength=256)
        ah = np.bincount(a, minlength=256)
        gcode = _emit_prefix_code(bw, gh, len(gh))
        rcode = _emit_prefix_code(bw, rh, 256)
        bcode = _emit_prefix_code(bw, bh, 256)
        acode = _emit_prefix_code(bw, ah, 256)
        _emit_prefix_code(bw, np.zeros(_NUM_DISTANCE_CODES, np.int64),
                          _NUM_DISTANCE_CODES)
        n = len(argb)
        vals = np.empty((n, 4), dtype=np.uint64)
        nbits = np.empty((n, 4), dtype=np.int64)
        for col, (code, chan) in enumerate(
                ((gcode, g), (rcode, r), (bcode, b), (acode, a))):
            vals[:, col] = code.codes[chan]
            nbits[:, col] = code.lengths[chan]
        bw.put_arrays(vals.ravel(), nbits.ravel())
        return

    tokens, gh, rh, bh, ah, dh = _tokenize(argb, xsize, use_lz77, cache_bits)
    gcode = _emit_prefix_code(bw, gh, len(gh))
    rcode = _emit_prefix_code(bw, rh, 256)
    bcode = _emit_prefix_code(bw, bh, 256)
    acode = _emit_prefix_code(bw, ah, 256)
    dcode = _emit_prefix_code(bw, dh, _NUM_DISTANCE_CODES)

    gc, gl = gcode.codes, gcode.lengths
    for tok in tokens:
        kind = tok[0]
        if kind == "lit":
            px = tok[1]
            aa = (px >> 24) & 0xFF
            rr = (px >> 16) & 0xFF
            gg = (px >> 8) & 0xFF
            bb = px & 0xFF
            bw.put(int(gc[gg]), int(gl[gg]))
            bw.put(int(rcode.codes[rr]), int(rcode.lengths[rr]))
            bw.put(int(bcode.codes[bb]), int(bcode.lengths[bb]))
            bw.put(int(acode.codes[aa]), int(acode.lengths[aa]))
        elif kind == "cache":
            s = _NUM_LITERALS + _NUM_LENGTH_CODES + tok[1]
            bw.put(int(gc[s]), int(gl[s]))
        else:  # copy
            _, _, (lc, lev, leb), (dc, dev, deb) = tok
            s = _NUM_LITERALS + lc
            bw.put(int(gc[s]), int(gl[s]))
            if leb:
                bw.put(lev, leb)
            bw.put(int(dcode.codes[dc]), int(dcode.lengths[dc]))
            if deb:
                bw.put(dev, deb)


def encode_webp(img: np.ndarray, *, use_lz77: bool = True,
                cache_bits: int = 0, subtract_green: bool = True,
                predictor: bool = False,
                predictor_bits: int = 4,
                cross_color: bool = False,
                cross_color_bits: int = 4,
                palette: bool = False,
                meta_bits: int | None = None) -> bytes:
    """Encode (h, w, 3|4) uint8 -> lossless WebP (RIFF/VP8L) bytes.

    ``predictor=True`` adds the spatial predictor transform (per-block
    best of the 14 spec modes, block size ``1 << predictor_bits``) —
    much smaller output on smooth content; decode of predicted files
    runs a sequential per-pixel inverse (encode stays vectorized).

    ``cross_color=True`` adds the cross-color transform (per-block
    g2r/g2b/r2b signed 3.5 fixed-point channel decorrelation, greedy
    candidate-set selection) — vectorized both directions.

    ``palette=True`` uses the color-indexing transform (<= 256
    distinct colors required; <= 16 colors additionally bundle 2-8
    pixels per byte) — it is the SOLE transform in that mode
    (subtract-green/predictor are skipped: they would operate on
    index bytes, which only hurts).
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("encode_webp needs (h, w, 3|4) uint8")
    h, w = img.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be 1..16384")
    if not 0 <= cache_bits <= 11:
        raise ValueError("cache_bits must be 0..11")
    if not 2 <= predictor_bits <= 9:
        raise ValueError("predictor_bits must be 2..9")
    if not 2 <= cross_color_bits <= 9:
        raise ValueError("cross_color_bits must be 2..9")
    if meta_bits is not None:
        if not 2 <= meta_bits <= 9:
            raise ValueError("meta_bits must be 2..9")
        if palette:
            raise ValueError("meta prefix codes cannot combine with "
                             "palette bundling in this encoder")
        if cache_bits:
            raise ValueError("meta prefix codes use the literal-only "
                             "emission path (cache_bits must be 0)")
        # use_lz77 is ignored with meta: emission is literal-only
    r = img[:, :, 0].astype(np.uint32).ravel()
    g = img[:, :, 1].astype(np.uint32).ravel()
    b = img[:, :, 2].astype(np.uint32).ravel()
    if img.shape[2] == 4:
        a = img[:, :, 3].astype(np.uint32).ravel()
    else:
        a = np.full(h * w, 255, dtype=np.uint32)
    alpha_used = bool(np.any(a != 255))
    if subtract_green and not palette:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    argb = (a << 24) | (r << 16) | (g << 8) | b

    bw = _BitWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(1 if alpha_used else 0, 1)
    bw.put(0, 3)  # version
    # forward transforms are applied in write order; the decoder undoes
    # them in reverse read order (subtract-green first, predictor last)
    if palette:
        argb, table, pw = _palette_forward(argb, w, h)
        bw.put(1, 1)
        bw.put(3, 2)  # COLOR_INDEXING
        bw.put(len(table) - 1, 8)
        _emit_palette_table(bw, table)
        bw.put(0, 1)  # no more transforms
        _emit_entropy_stream(bw, argb, pw, use_lz77, cache_bits)
        return _wrap_riff(b"\x2f" + bw.tobytes())
    if subtract_green:
        bw.put(1, 1)
        bw.put(2, 2)  # SUBTRACT_GREEN
    if cross_color:
        argb, elem, subw, subh = _cross_color_forward(argb, w, h,
                                                      cross_color_bits)
        bw.put(1, 1)
        bw.put(1, 2)  # CROSS_COLOR
        bw.put(cross_color_bits - 2, 3)
        _emit_entropy_stream(bw, elem.ravel(), subw, True, 0)
    if predictor:
        argb, modes, subw, subh = _predictor_forward(argb, w, h,
                                                     predictor_bits)
        bw.put(1, 1)
        bw.put(0, 2)  # PREDICTOR
        bw.put(predictor_bits - 2, 3)
        mode_img = (np.uint32(0xFF000000)
                    | (modes.astype(np.uint32) << 8)).ravel()
        _emit_entropy_stream(bw, mode_img, subw, True, 0)
    bw.put(0, 1)      # no more transforms
    if meta_bits is not None:
        _emit_meta_literal_stream(bw, argb, w, h, meta_bits)
    else:
        _emit_entropy_stream(bw, argb, w, use_lz77, cache_bits)
    return _wrap_riff(b"\x2f" + bw.tobytes())


def _wrap_riff(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _vp8l_payload(data: bytes) -> bytes:
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        pos = 12
        while pos + 8 <= len(data):
            tag = data[pos:pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body = data[pos + 8:pos + 8 + size]
            if tag == b"VP8L":
                return body
            if tag == b"VP8 " or tag == b"VP8X":
                raise NotImplementedError(
                    "WebP: lossy VP8 / extended VP8X not supported "
                    "(lossless VP8L only)")
            pos += 8 + size + (size & 1)
        raise ValueError("WebP: no VP8L chunk found")
    if data[:1] == b"\x2f":
        return data
    raise ValueError("not a WebP (RIFF/WEBP or raw VP8L) buffer")


def decode_webp(data: bytes) -> np.ndarray:
    """Decode lossless WebP bytes -> (h, w, 4) uint8 RGBA."""
    payload = _vp8l_payload(bytes(data))
    if payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    version = br.read(3)
    if version != 0:
        raise ValueError(f"VP8L: unsupported version {version}")

    transforms: list[tuple] = []
    eff_w = w
    while br.read(1):
        t = br.read(2)
        if any(t == seen for seen, _ in transforms):
            raise ValueError("VP8L: duplicate transform")
        if t == 0:  # predictor: size bits + subresolution mode image
            bits = br.read(3) + 2
            subw = (w + (1 << bits) - 1) >> bits
            subh = (h + (1 << bits) - 1) >> bits
            mode_img = _decode_entropy_stream(br, subw, subh)
            modes = ((mode_img >> 8) & 0xFF).astype(np.uint8)
            transforms.append((0, (bits, modes.reshape(subh, subw))))
        elif t == 1:  # cross-color: size bits + element image
            bits = br.read(3) + 2
            subw = (w + (1 << bits) - 1) >> bits
            subh = (h + (1 << bits) - 1) >> bits
            elem = _decode_entropy_stream(br, subw, subh)
            transforms.append((1, (bits, elem.reshape(subh, subw))))
        elif t == 3:  # color indexing: palette + bundled width
            n = br.read(8) + 1
            table = _read_palette_table(br, n)
            wb = _palette_width_bits(n)
            eff_w = (w + (1 << wb) - 1) >> wb
            transforms.append((3, table))
        else:
            transforms.append((2, None))
    if any(t == 3 for t, _ in transforms) and len(transforms) > 1:
        # our encoder emits color indexing alone; mixing it with
        # width-changing siblings needs the spec's staged-width rules
        raise NotImplementedError(
            "VP8L: color indexing combined with other transforms is "
            "not supported")

    argb = _decode_entropy_stream(br, eff_w, h, allow_meta=True)

    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    for t, payload_t in reversed(transforms):
        if t == 2:  # inverse subtract-green
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
        elif t == 0:  # inverse predictor
            bits, modes = payload_t
            a, r, g, b = _predictor_inverse(a, r, g, b, w, h, bits, modes)
        elif t == 1:  # inverse cross-color
            bits, elem = payload_t
            a, r, g, b = _cross_color_inverse(a, r, g, b, w, h, bits, elem)
        elif t == 3:  # inverse color indexing
            a, r, g, b = _palette_inverse(a, r, g, b, w, h, payload_t,
                                          eff_w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[:, :, 0] = r.reshape(h, w)
    rgba[:, :, 1] = g.reshape(h, w)
    rgba[:, :, 2] = b.reshape(h, w)
    rgba[:, :, 3] = a.reshape(h, w)
    return rgba


def _decode_entropy_stream(br: _BitReader, w: int, h: int,
                           allow_meta: bool = False) -> np.ndarray:
    """Decode one entropy-coded image -> flat uint32 ARGB array."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color-cache bits")
    meta_codes = None
    meta_bits = 0
    mw = 0
    num_groups = 1
    if br.read(1):
        if not allow_meta:
            raise ValueError(
                "VP8L: meta prefix codes are only valid in the main image")
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_stream(br, mw, mh)
        meta_codes = ((((meta_img >> 16) & 0xFF) << 8)
                      | ((meta_img >> 8) & 0xFF)).astype(np.int64)
        num_groups = int(meta_codes.max()) + 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    group_codes = []
    for _ in range(num_groups):
        group_codes.append((
            _read_prefix_code(
                br, _NUM_LITERALS + _NUM_LENGTH_CODES + cache_size),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, _NUM_DISTANCE_CODES),
        ))
    gcode, rcode, bcode, acode, dcode = group_codes[0]

    n = w * h
    if (meta_codes is None and cache_bits == 0
            and gcode.max_sym < _NUM_LITERALS):
        # pure literal stream (the vectorized-encoder common case): no
        # copies or cache symbols can appear, so decode with the tight
        # one-window-per-pixel loop (~4x the generic symbol loop)
        return _decode_literal_stream(br, n, gcode, rcode, bcode, acode)
    # generic loop (LZ77 / color cache / meta groups), windowed: the
    # worst-case symbol group — green code 15 + length extras 10 +
    # distance code 15 + distance extras 18 = 58 bits — fits ONE
    # 64-bit window load; Python-list LUTs avoid numpy scalar boxing
    def mk(code: _PrefixCode) -> tuple[list, int]:
        if code.single is not None:
            return [code.single << 4], 0
        return code.lut.tolist(), (1 << code.maxlen) - 1

    tables = [tuple(mk(c) for c in grp) for grp in group_codes]
    (glut, gmask), (rlut, rmask), (blut, bmask), (alut, amask), \
        (dlut, dmask) = tables[0]
    out = np.zeros(n, dtype=np.uint32)
    cache = np.zeros(cache_size, dtype=np.uint32) if cache_size else None
    pos = 0
    cache_shift = 32 - cache_bits if cache_bits else 0
    meta_list = meta_codes.tolist() if meta_codes is not None else None
    d = br.data
    bitpos = br.pos
    bitlimit = br.limit
    frombytes = int.from_bytes
    while pos < n:
        if meta_list is not None:
            y, x = divmod(pos, w)
            gi = meta_list[(y >> meta_bits) * mw + (x >> meta_bits)]
            (glut, gmask), (rlut, rmask), (blut, bmask), (alut, amask), \
                (dlut, dmask) = tables[gi]
        if bitpos > bitlimit:
            raise ValueError("VP8L: bitstream truncated")
        w64 = frombytes(d[bitpos >> 3:(bitpos >> 3) + 8],
                        "little") >> (bitpos & 7)
        e = glut[w64 & gmask]
        if e < 0:
            raise ValueError("VP8L: invalid prefix code word")
        s = e >> 4
        l = e & 15
        w64 >>= l
        used = l
        if s < _NUM_LITERALS:
            e = rlut[w64 & rmask]
            rr = e >> 4
            l = e & 15
            w64 >>= l
            used += l
            e = blut[w64 & bmask]
            bb = e >> 4
            l = e & 15
            w64 >>= l
            used += l
            e = alut[w64 & amask]
            aa = e >> 4
            used += e & 15
            if rr < 0 or bb < 0 or aa < 0:
                raise ValueError("VP8L: invalid prefix code word")
            bitpos += used
            px = (aa << 24) | (rr << 16) | (s << 8) | bb
            out[pos] = px
            if cache is not None:
                cache[((_CACHE_MUL * px) & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
        elif s < _NUM_LITERALS + _NUM_LENGTH_CODES:
            lc = s - _NUM_LITERALS
            if lc < 4:
                length = lc + 1
            else:
                eb = (lc - 2) >> 1
                length = (((2 + (lc & 1)) << eb)
                          + (w64 & ((1 << eb) - 1)) + 1)
                w64 >>= eb
                used += eb
            e = dlut[w64 & dmask]
            if e < 0:
                raise ValueError("VP8L: invalid prefix code word")
            dc0 = e >> 4
            l = e & 15
            w64 >>= l
            used += l
            if dc0 < 4:
                dc = dc0 + 1
            else:
                eb = (dc0 - 2) >> 1
                dc = (((2 + (dc0 & 1)) << eb)
                      + (w64 & ((1 << eb) - 1)) + 1)
                used += eb
            bitpos += used
            dist = _code_to_dist(dc, w)
            if dist > pos:
                raise ValueError("VP8L: backward reference before start")
            if pos + length > n:
                raise ValueError("VP8L: backward reference past end")
            if dist >= length:
                out[pos:pos + length] = out[pos - dist:pos - dist + length]
            else:
                for k in range(length):  # overlapping copy
                    out[pos + k] = out[pos - dist + k]
            if cache is not None:
                # batch cache update: last-write-wins equals the
                # sequential per-pixel insertion order
                seg = out[pos:pos + length]
                idx = ((_CACHE_MUL * seg.astype(np.uint64))
                       & 0xFFFFFFFF) >> cache_shift
                cache[idx.astype(np.int64)] = seg
            pos += length
        else:
            ci = s - _NUM_LITERALS - _NUM_LENGTH_CODES
            if cache is None or ci >= cache_size:
                raise ValueError("VP8L: cache symbol without color cache")
            bitpos += used
            out[pos] = cache[ci]
            pos += 1
    br.pos = bitpos
    return out


def _decode_literal_stream(br: _BitReader, n: int, gcode: _PrefixCode,
                           rcode: _PrefixCode, bcode: _PrefixCode,
                           acode: _PrefixCode) -> np.ndarray:
    """Literal-only symbol stream: one 64-bit window load decodes all
    four channel codes of a pixel (4 codes x <=15 bits <= 60 bits).
    Python-list LUTs avoid numpy scalar boxing in the hot loop."""
    def mk(code: _PrefixCode) -> tuple[list, int]:
        if code.single is not None:
            return [code.single << 4], 0  # 0-bit code: mask 0 -> idx 0
        return code.lut.tolist(), (1 << code.maxlen) - 1

    glut, gmask = mk(gcode)
    rlut, rmask = mk(rcode)
    blut, bmask = mk(bcode)
    alut, amask = mk(acode)
    d = br.data
    pos = br.pos
    limit = br.limit + 64  # padded tail tolerates the final window load
    gs = [0] * n
    rs = [0] * n
    bs = [0] * n
    as_ = [0] * n
    frombytes = int.from_bytes
    for i in range(n):
        if pos + 60 > limit:
            raise ValueError("VP8L: bitstream truncated")
        w64 = frombytes(d[pos >> 3:(pos >> 3) + 8], "little") >> (pos & 7)
        e = glut[w64 & gmask]
        if e < 0:
            raise ValueError("VP8L: invalid prefix code word")
        l = e & 15
        gs[i] = e >> 4
        w64 >>= l
        c = l
        e = rlut[w64 & rmask]
        if e < 0:
            raise ValueError("VP8L: invalid prefix code word")
        l = e & 15
        rs[i] = e >> 4
        w64 >>= l
        c += l
        e = blut[w64 & bmask]
        if e < 0:
            raise ValueError("VP8L: invalid prefix code word")
        l = e & 15
        bs[i] = e >> 4
        w64 >>= l
        c += l
        e = alut[w64 & amask]
        if e < 0:
            raise ValueError("VP8L: invalid prefix code word")
        as_[i] = e >> 4
        pos += c + (e & 15)
    br.pos = pos
    return ((np.array(as_, dtype=np.uint32) << 24)
            | (np.array(rs, dtype=np.uint32) << 16)
            | (np.array(gs, dtype=np.uint32) << 8)
            | np.array(bs, dtype=np.uint32))


def webp_info(data: bytes) -> dict:
    """Parse header fields without decoding pixels."""
    payload = _vp8l_payload(bytes(data))
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha = br.read(1)
    version = br.read(3)
    transforms = []
    while br.read(1):
        t = br.read(2)
        transforms.append(
            ["predictor", "cross-color", "subtract-green",
             "color-indexing"][t])
        if t != 2:
            break  # other transforms carry data we do not parse
    return {"w": w, "h": h, "alpha_hint": bool(alpha), "version": version,
            "transforms": transforms}
