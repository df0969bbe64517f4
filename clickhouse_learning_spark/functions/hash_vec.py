"""Vectorized (numpy) fixed-width integer paths for the exact CH hash
family (xxHash64/32, MurmurHash3 32/64/128, sipHash64).

The Arrow-batched hash UDFs hash strings per value (inherently ragged)
but INTEGER columns arrive as fixed-width numpy arrays — a W-byte
input makes every algorithm a FIXED sequence of arithmetic ops, so the
whole batch runs as numpy uint32/uint64 expressions (unsigned numpy
arithmetic wraps mod 2^32 / 2^64, exactly the spec's masking). This
closes the VERDICT r8 "per-value loop is the slow lane" note for the
sharding/fingerprinting use (hash of an id column).

Correctness: every function here is property-tested bit-for-bit
against the scalar spec implementations (functions/xxh.py,
functions/murmur.py, functions/siphash.py) over random values and
width edges in tests/test_hash_vec.py — the scalar code carries the
decisive public-vector verification, this module only re-expresses it
batch-wise.
"""

from __future__ import annotations

import numpy as np

_U32 = np.uint64(0xFFFFFFFF)


def _u(vals: np.ndarray, width: int) -> np.ndarray:
    """Unsigned value of each element's W-byte two's-complement form
    (the little-endian byte view the scalar paths hash)."""
    x = vals.astype(np.int64).astype(np.uint64)
    if width < 8:
        x = x & np.uint64((1 << (8 * width)) - 1)
    return x


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    x = x & _U32
    return ((x << np.uint64(r)) | (x >> np.uint64(32 - r))) & _U32


# ---------------------------------------------------------------- xxh64
_XP1 = np.uint64(0x9E3779B185EBCA87)
_XP2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XP3 = np.uint64(0x165667B19E3779F9)
_XP4 = np.uint64(0x85EBCA77C2B2AE63)
_XP5 = np.uint64(0x27D4EB2F165667C5)


def _xxh64_avalanche(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _XP2
    h = h ^ (h >> np.uint64(29))
    h = h * _XP3
    h = h ^ (h >> np.uint64(32))
    return h


def xxh64_int_vec(vals: np.ndarray, width: int,
                  seed: int = 0) -> np.ndarray:
    """XXH64 of each element's W-byte LE form (W in 1/2/4/8)."""
    x = _u(vals, width)
    h = np.uint64(seed) + _XP5 + np.uint64(width)
    h = np.broadcast_to(h, x.shape).copy()
    if width == 8:
        k1 = _rotl64(x * _XP2, 31) * _XP1
        h = h ^ k1
        h = _rotl64(h, 27) * _XP1 + _XP4
    elif width == 4:
        h = h ^ (x * _XP1)
        h = _rotl64(h, 23) * _XP2 + _XP3
    else:  # 1 or 2 bytes: per-byte steps
        for i in range(width):
            b = (x >> np.uint64(8 * i)) & np.uint64(0xFF)
            h = h ^ (b * _XP5)
            h = _rotl64(h, 11) * _XP1
    return _xxh64_avalanche(h)


# ---------------------------------------------------------------- xxh32
_YP1 = np.uint64(0x9E3779B1)
_YP2 = np.uint64(0x85EBCA77)
_YP3 = np.uint64(0xC2B2AE3D)
_YP4 = np.uint64(0x27D4EB2F)
_YP5 = np.uint64(0x165667B1)


def xxh32_int_vec(vals: np.ndarray, width: int,
                  seed: int = 0) -> np.ndarray:
    """XXH32 of each element's W-byte LE form (W in 1/2/4/8);
    math in uint64 lanes masked to 32 bits (wraps match uint32)."""
    x = _u(vals, width)
    h = (np.uint64(seed) + _YP5 + np.uint64(width)) & _U32
    h = np.broadcast_to(h, x.shape).copy()
    n4 = width // 4
    for i in range(n4):
        lane = (x >> np.uint64(32 * i)) & _U32
        h = (h + ((lane * _YP3) & _U32)) & _U32
        h = (_rotl32(h, 17) * _YP4) & _U32
    for i in range(4 * n4, width):
        b = (x >> np.uint64(8 * i)) & np.uint64(0xFF)
        h = (h + ((b * _YP5) & _U32)) & _U32
        h = (_rotl32(h, 11) * _YP1) & _U32
    h = h ^ (h >> np.uint64(15))
    h = (h * _YP2) & _U32
    h = h ^ (h >> np.uint64(13))
    h = (h * _YP3) & _U32
    h = h ^ (h >> np.uint64(16))
    return h


# ------------------------------------------------------------- murmur3
_MC1_32 = np.uint64(0xCC9E2D51)
_MC2_32 = np.uint64(0x1B873593)


def murmur32_int_vec(vals: np.ndarray, width: int,
                     seed: int = 0) -> np.ndarray:
    """Murmur3 x86_32 of each element's W-byte LE form."""
    x = _u(vals, width)
    h = np.broadcast_to(np.uint64(seed) & _U32, x.shape).copy()
    n4 = width // 4
    for i in range(n4):
        k = (x >> np.uint64(32 * i)) & _U32
        k = (k * _MC1_32) & _U32
        k = _rotl32(k, 15)
        k = (k * _MC2_32) & _U32
        h = h ^ k
        h = _rotl32(h, 13)
        h = (h * np.uint64(5) + np.uint64(0xE6546B64)) & _U32
    t = width % 4
    if t:
        k = (x >> np.uint64(32 * n4)) & np.uint64((1 << (8 * t)) - 1)
        k = (k * _MC1_32) & _U32
        k = _rotl32(k, 15)
        k = (k * _MC2_32) & _U32
        h = h ^ k
    h = h ^ np.uint64(width)
    h = h ^ (h >> np.uint64(16))
    h = (h * np.uint64(0x85EBCA6B)) & _U32
    h = h ^ (h >> np.uint64(13))
    h = (h * np.uint64(0xC2B2AE35)) & _U32
    h = h ^ (h >> np.uint64(16))
    return h


_MC1_64 = np.uint64(0x87C37B91114253D5)
_MC2_64 = np.uint64(0x4CF5AD432745937F)


def _fmix64_vec(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


def murmur128_int_vec(vals: np.ndarray, width: int,
                      seed: int = 0
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Murmur3 x64_128 (h1, h2) of each element's W-byte LE form
    (W <= 8 — tail-only: k2 never fires)."""
    x = _u(vals, width)
    h1 = np.broadcast_to(np.uint64(seed), x.shape).copy()
    h2 = h1.copy()
    if width:
        k1 = x * _MC1_64
        k1 = _rotl64(k1, 31)
        k1 = k1 * _MC2_64
        h1 = h1 ^ k1
    h1 = h1 ^ np.uint64(width)
    h2 = h2 ^ np.uint64(width)
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64_vec(h1)
    h2 = _fmix64_vec(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


def murmur64_int_vec(vals: np.ndarray, width: int) -> np.ndarray:
    """ClickHouse murmurHash3_64 (XOR-fold of x64_128) at seed 0."""
    h1, h2 = murmur128_int_vec(vals, width, 0)
    return h1 ^ h2


# ------------------------------------------------------------- siphash
_SV0 = np.uint64(0x736F6D6570736575)
_SV1 = np.uint64(0x646F72616E646F6D)
_SV2 = np.uint64(0x6C7967656E657261)
_SV3 = np.uint64(0x7465646279746573)


def _sip_rounds(n, v0, v1, v2, v3):
    for _ in range(n):
        v0 = v0 + v1
        v1 = _rotl64(v1, 13)
        v1 = v1 ^ v0
        v0 = _rotl64(v0, 32)
        v2 = v2 + v3
        v3 = _rotl64(v3, 16)
        v3 = v3 ^ v2
        v0 = v0 + v3
        v3 = _rotl64(v3, 21)
        v3 = v3 ^ v0
        v2 = v2 + v1
        v1 = _rotl64(v1, 17)
        v1 = v1 ^ v2
        v2 = _rotl64(v2, 32)
    return v0, v1, v2, v3


def siphash64_int_vec(vals: np.ndarray, width: int) -> np.ndarray:
    """SipHash-2-4 at key (0,0) of each element's W-byte LE form."""
    x = _u(vals, width)
    shape = x.shape
    v0 = np.broadcast_to(_SV0, shape).copy()
    v1 = np.broadcast_to(_SV1, shape).copy()
    v2 = np.broadcast_to(_SV2, shape).copy()
    v3 = np.broadcast_to(_SV3, shape).copy()
    if width == 8:
        m = x
        v3 = v3 ^ m
        v0, v1, v2, v3 = _sip_rounds(2, v0, v1, v2, v3)
        v0 = v0 ^ m
        b = np.broadcast_to(np.uint64(8) << np.uint64(56), shape)
    else:
        b = x | (np.uint64(width) << np.uint64(56))
    v3 = v3 ^ b
    v0, v1, v2, v3 = _sip_rounds(2, v0, v1, v2, v3)
    v0 = v0 ^ b
    v2 = v2 ^ np.uint64(0xFF)
    v0, v1, v2, v3 = _sip_rounds(4, v0, v1, v2, v3)
    return v0 ^ v1 ^ v2 ^ v3
