"""GDAL image checksum — the golden-compare oracle aggregate.

Faithful vectorized reimplementation of ``GDALChecksumImage``
(reference: alg/gdalchecksum.cpp:48-260): per pixel value v at flat
position p (row-major over the full window, complex parts interleaved),
checksum += v % primes[p % 11], result masked to 16 bits.  Because all
our pixel data is non-negative uint8, the C truncating ``%`` equals
numpy's ``%`` here; the iterative ``&= 0xffff`` equals a final
``sum % 65536``.
"""

from __future__ import annotations

import numpy as np

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def checksum_band(a: np.ndarray) -> int:
    """Checksum of one 2-D band (any integer dtype, non-negative)."""
    a = np.ascontiguousarray(a)
    flat = a.reshape(-1).astype(np.int64)
    idx = np.arange(flat.size, dtype=np.int64) % 11
    return int((flat % _PRIMES[idx]).sum() & 0xFFFF)


def checksum_image(a: np.ndarray) -> list[int]:
    """Per-band checksums of an (h, w) or (h, w, bands) uint8 array."""
    if a.ndim == 2:
        return [checksum_band(a)]
    return [checksum_band(a[:, :, b]) for b in range(a.shape[2])]


def checksum_float_band(a: np.ndarray) -> int:
    """Checksum of a floating-point band (gdalchecksum.cpp float path):
    values are converted to int32 with GDALCopyWords rounding
    (add 0.5, floor, clamp to +-2147483647, non-finite -> INT_MIN)."""
    v = np.asarray(a, dtype=np.float64).reshape(-1) + 0.5
    n = np.floor(v)
    n = np.clip(n, -2147483647.0, 2147483647.0)
    out = n.astype(np.int64)
    out[~np.isfinite(v)] = np.iinfo(np.int32).min
    idx = np.arange(out.size, dtype=np.int64) % 11
    # C truncating % for negatives: emulate via fmod-style remainder
    rem = np.fmod(out, _PRIMES[idx])
    return int(rem.sum() & 0xFFFF)
