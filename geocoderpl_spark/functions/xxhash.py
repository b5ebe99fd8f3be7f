"""Pure-python XXH64 for a single 64-bit value — the driver-side twin of
Spark's ``xxhash64(longCol)`` (seed 42), used to compute posting-bucket ids
without a Spark job (query-time partition pruning). Parity with the JVM
implementation is asserted in tests/test_xxhash.py.

Algorithm: standard XXH64 for an 8-byte little-endian input (one 8-byte
block, no tail), per the public xxHash specification.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxhash64_long_np(values, seed: int = 42):
    """Vectorized :func:`xxhash64_long`: XXH64 of each int64 in a numpy
    array, returned as SIGNED int64 (identical to Spark's ``xxhash64`` over
    a LongType column — parity asserted in tests/test_xxhash.py). Used by
    the posting-encode kernel to recompute term buckets so the bucket
    column never rides the build's biggest exchange."""
    import numpy as np

    with np.errstate(over="ignore"):
        v = np.asarray(values, dtype=np.int64).astype(np.uint64)
        h = np.uint64((seed + _P5 + 8) & _M)
        k1 = v * np.uint64(_P2)
        k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
        k1 = k1 * np.uint64(_P1)
        h = h ^ k1
        h = (h << np.uint64(27)) | (h >> np.uint64(37))
        h = h * np.uint64(_P1) + np.uint64(_P4)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(_P2)
        h = h ^ (h >> np.uint64(29))
        h = h * np.uint64(_P3)
        h = h ^ (h >> np.uint64(32))
    return h.view(np.int64)


def xxhash64_long(value: int, seed: int = 42) -> int:
    """XXH64 of one int64 value (as Spark hashes a LongType column).

    Returns the SIGNED 64-bit result like Spark does, so
    ``xxhash64_long(v) % n`` equals Spark's ``pmod(xxhash64(v), n)`` for
    positive n (python % already yields a non-negative remainder).
    """
    v = value & _M  # two's-complement bytes of the long
    h = (seed + _P5 + 8) & _M
    k1 = (v * _P2) & _M
    k1 = _rotl(k1, 31)
    k1 = (k1 * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    # avalanche
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    # to signed
    return h - (1 << 64) if h >= (1 << 63) else h
