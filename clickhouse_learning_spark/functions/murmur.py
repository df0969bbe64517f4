"""Exact MurmurHash3 — x86_32 and x64_128 variants, seed-parametric.

From the public-domain specification (Austin Appleby, smhasher's
MurmurHash3.cpp — placed in the public domain by its author; the
constants and the block/tail/finalize structure are the spec).
ClickHouse binds this family as murmurHash3_32 / murmurHash3_64 /
murmurHash3_128 at seed 0 over the value's byte form (reference:
ClickHouse src/Functions/FunctionsHashing.h MurmurHash3Impl32/64/128;
the 64-bit form folds x64_128's two output words with XOR).

Verification strategy (tests/test_murmur.py), same play as
functions/xxh.py r8:

1. smhasher's own VerificationTest constants — hash keys {0..i-1} for
   i in 0..255 at seed 256-i, hash the concatenated outputs at seed 0,
   and the first 4 LE bytes must equal the PUBLISHED table values
   (0xB0F57EE3 for x86_32, 0x6384BA69 for x64_128). One constant
   pins every length class 0..255 and 256 distinct seeds at once.
2. Bit-for-bit cross-check against Spark's builtin ``hash()`` — which
   IS Murmur3 x86_32 at seed 42 — over inputs whose UTF-8 length is a
   multiple of 4 (Spark's hashUnsafeBytes mixes tail bytes
   one-at-a-time, deliberately diverging from the spec for non-aligned
   lengths; aligned lengths exercise the identical block machinery).
3. Published single-input vectors for the tail paths.

Pure Python on purpose: runs inside Arrow-batched pandas UDFs
(functions/dialect.py binds ch_murmur3_*), no native dependency.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF

_C1_32 = 0xCC9E2D51
_C2_32 = 0x1B873593

_C1_64 = 0x87C37B91114253D5
_C2_64 = 0x4CF5AD432745937F


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix32(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3_x86_32 → unsigned 32-bit int."""
    h1 = seed & _M32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k1 = (k1 * _C1_32) & _M32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * _C2_32) & _M32
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _M32
    # tail
    tail = data[nblocks * 4 :]
    k1 = 0
    t = len(tail)
    if t >= 3:
        k1 ^= tail[2] << 16
    if t >= 2:
        k1 ^= tail[1] << 8
    if t >= 1:
        k1 ^= tail[0]
        k1 = (k1 * _C1_32) & _M32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * _C2_32) & _M32
        h1 ^= k1
    h1 ^= n
    return _fmix32(h1)


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3_x64_128 → (h1, h2), each unsigned 64-bit; the
    canonical 16-byte output is h1 LE then h2 LE."""
    h1 = seed & _M64
    h2 = seed & _M64
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o : o + 8], "little")
        k2 = int.from_bytes(data[o + 8 : o + 16], "little")
        k1 = (k1 * _C1_64) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2_64) & _M64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2_64) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1_64) & _M64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    # tail
    tail = data[nblocks * 16 :]
    t = len(tail)
    k1 = 0
    k2 = 0
    for j in range(min(t, 15), 8, -1):  # bytes 8..14 → k2
        k2 ^= tail[j - 1] << ((j - 9) * 8)
    if t > 8:
        k2 = (k2 * _C2_64) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1_64) & _M64
        h2 ^= k2
    for j in range(min(t, 8), 0, -1):  # bytes 0..7 → k1
        k1 ^= tail[j - 1] << ((j - 1) * 8)
    if t > 0:
        k1 = (k1 * _C1_64) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2_64) & _M64
        h1 ^= k1
    # finalize
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def murmur3_x64_128_bytes(data: bytes, seed: int = 0) -> bytes:
    """The canonical 16-byte output (h1 LE ++ h2 LE) — ClickHouse's
    murmurHash3_128 FixedString(16) form."""
    h1, h2 = murmur3_x64_128(data, seed)
    return h1.to_bytes(8, "little") + h2.to_bytes(8, "little")


def ch_murmur3_64(data: bytes) -> int:
    """ClickHouse murmurHash3_64: XOR-fold of x64_128's two output
    words at seed 0 (FunctionsHashing.h MurmurHash3Impl64 loads the 16
    output bytes as two UInt64 and returns their XOR)."""
    h1, h2 = murmur3_x64_128(data, 0)
    return h1 ^ h2
