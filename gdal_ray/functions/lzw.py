"""TIFF-flavor LZW codec (TIFF 6.0 section 13 + the "early change"
convention every mainstream writer uses) — the reference reaches this
through libtiff (``frmts/gtiff``); this is from scratch.

Conventions implemented:

- MSB-first bit packing; initial code width 9 bits;
- codes 0..255 literal bytes, 256 = ClearCode, 257 = EndOfInformation,
  first assignable code 258;
- EARLY CHANGE: the code width increments when the next code to be
  assigned reaches ``2^width - 1`` (one code earlier than generic LZW
  — the historical off-by-one that became the de-facto TIFF standard);
- at the 12-bit table limit the encoder emits ClearCode and starts a
  fresh table;
- every strip/tile begins with ClearCode and ends with EOI.
"""

from __future__ import annotations

CLEAR = 256
EOI = 257
FIRST = 258
MAX_BITS = 12


def lzw_encode(data: bytes) -> bytes:
    """Encode one strip/tile's bytes."""
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, bits: int):
        nonlocal acc, nacc
        acc = (acc << bits) | code
        nacc += bits
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)

    bits = 9
    nextcode = FIRST
    table: dict[tuple[int, int], int] = {}
    emit(CLEAR, bits)
    prefix = -1
    for b in data:
        if prefix < 0:
            prefix = b
            continue
        key = (prefix, b)
        code = table.get(key)
        if code is not None:
            prefix = code
            continue
        emit(prefix, bits)
        table[key] = nextcode
        nextcode += 1
        if nextcode == (1 << bits) - 1:          # early change
            if bits == MAX_BITS:
                emit(CLEAR, bits)
                table.clear()
                bits = 9
                nextcode = FIRST
            else:
                bits += 1
        prefix = b
    if prefix >= 0:
        emit(prefix, bits)
        # the flush emission assigns no entry, but the EOI width still
        # follows the early-change count (mirrored by the decoder's
        # post-read check)
        nextcode += 1
        if nextcode == (1 << bits) - 1 and bits < MAX_BITS:
            bits += 1
    emit(EOI, bits)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def lzw_decode(buf: bytes, max_out: int | None = None) -> bytes:
    """Decode one strip/tile; ``max_out`` guards runaway streams."""
    pos = 0
    acc = 0
    nacc = 0
    n = len(buf)

    def read(bits: int) -> int:
        nonlocal pos, acc, nacc
        while nacc < bits:
            if pos >= n:
                return EOI                      # truncated: stop
            acc = (acc << 8) | buf[pos]
            pos += 1
            nacc += 8
        nacc -= bits
        return (acc >> nacc) & ((1 << bits) - 1)

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bits = 9
    prev = -1
    while True:
        code = read(bits)
        if code == EOI:
            break
        if code == CLEAR:
            del table[FIRST:]
            bits = 9
            prev = -1
            continue
        if prev < 0:
            if code >= 256:
                raise ValueError("LZW: first code after clear must be "
                                 "a literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):            # the KwKwK case
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError(f"LZW: code {code} beyond table "
                                 f"({len(table)})")
            table.append(table[prev] + entry[:1])
        out += entry
        prev = code
        # mirror the encoder: ITS next assignment is len(table)+1 when
        # the entry for the code just read is still pending there
        if len(table) + 1 == (1 << bits) - 1 and bits < MAX_BITS:
            bits += 1
        if max_out is not None and len(out) > max_out:
            raise ValueError("LZW: output exceeds expected size")
    return bytes(out)


# --------------------------------------------- GIF-variant LZW


def gif_lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW (GIF87a appendix F): LSB-first bit packing,
    Clear = 2^min, EOI = Clear + 1, first assignable Clear + 2,
    initial width min+1, width increments when the next assignable
    code reaches 2^width (NO early change), 12-bit limit with
    Clear-and-reset."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, bits: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += bits
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    bits = min_code_size + 1
    nextcode = clear + 2
    table: dict[tuple[int, int], int] = {}
    emit(clear, bits)
    prefix = -1
    for b in data:
        if b >= clear:
            raise ValueError(f"GIF LZW: symbol {b} >= clear code "
                             f"{clear}")
        if prefix < 0:
            prefix = b
            continue
        code = table.get((prefix, b))
        if code is not None:
            prefix = code
            continue
        emit(prefix, bits)
        table[(prefix, b)] = nextcode
        nextcode += 1
        if nextcode == (1 << bits):
            if bits == MAX_BITS:
                emit(clear, bits)
                table.clear()
                bits = min_code_size + 1
                nextcode = clear + 2
            else:
                bits += 1
        prefix = b
    if prefix >= 0:
        emit(prefix, bits)
    emit(eoi, bits)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_lzw_decode(buf: bytes, min_code_size: int,
                   max_out: int | None = None) -> bytes:
    """Inverse of :func:`gif_lzw_encode`."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nacc = 0
    n = len(buf)

    def read(bits: int) -> int:
        nonlocal pos, acc, nacc
        while nacc < bits:
            if pos >= n:
                return eoi
            acc |= buf[pos] << nacc
            pos += 1
            nacc += 8
        v = acc & ((1 << bits) - 1)
        acc >>= bits
        nacc -= bits
        return v

    out = bytearray()
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    bits = min_code_size + 1
    prev = -1
    while True:
        code = read(bits)
        if code == eoi:
            break
        if code == clear:
            table = list(base)
            bits = min_code_size + 1
            prev = -1
            continue
        if prev < 0:
            if code >= clear:
                raise ValueError("GIF LZW: first code after clear must "
                                 "be a literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError(f"GIF LZW: code {code} beyond table")
            table.append(table[prev] + entry[:1])
        out += entry
        prev = code
        # the encoder is one assignment ahead (its entry for the code
        # just read is still pending here): bump when len(table)+1
        # fills the current width — no early change
        if len(table) + 1 == (1 << bits) and bits < MAX_BITS:
            bits += 1
        if max_out is not None and len(out) > max_out:
            raise ValueError("GIF LZW: output exceeds expected size")
    return bytes(out)
