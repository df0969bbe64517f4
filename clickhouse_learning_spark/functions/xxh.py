"""Pure-Python XXH64 / XXH32 (Yann Collet's public xxHash spec).

ClickHouse's ``xxHash64``/``xxHash32`` are XXH64/XXH32 with **seed 0**
over the argument's byte representation (UTF-8 bytes for strings,
little-endian bytes for integers). Spark's builtin ``xxhash64`` is the
same XXH64 algorithm pinned to **seed 42** — which the r7 surface
audit flagged as the case-insensitive resolution trap (``xxHash64``
would silently bind to it). This module lifts that gate with an exact
implementation instead:

- seed is a parameter, entering ONLY the accumulator initialization —
  so the round/merge/tail/avalanche machinery exercised by the
  seed-42 law below is the same machinery that runs at CH's seed 0;
- **verification** (tests/test_xxh.py): the canonical empty-input
  vectors (XXH64("")=0xEF46DB3751D8E999, XXH32("")=0x02CC5D05), and a
  decisive cross-check of ``xxh64(bytes, seed=42)`` against Spark's
  builtin over random strings of every length class (covering the
  32-byte stripe loop, the 8/4/1-byte tails, and UTF-8 multibyte) and
  random int64s (Spark hashes LongType as 8 little-endian bytes — the
  same form CH uses for UInt64/Int64 columns).

Reference: github.com/Cyan4973/xxHash (BSD-2) — implemented from the
published specification document, not ported code.
"""

from __future__ import annotations

import struct

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1

P64_1 = 0x9E3779B185EBCA87
P64_2 = 0xC2B2AE3D27D4EB4F
P64_3 = 0x165667B19E3779F9
P64_4 = 0x85EBCA77C2B2AE63
P64_5 = 0x27D4EB2F165667C5

P32_1 = 0x9E3779B1
P32_2 = 0x85EBCA77
P32_3 = 0xC2B2AE3D
P32_4 = 0x27D4EB2F
P32_5 = 0x165667B1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _round64(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * P64_2) & _M64, 31) * P64_1) & _M64


def _merge64(acc: int, lane: int) -> int:
    acc ^= _round64(0, lane)
    return (acc * P64_1 + P64_4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 digest as an unsigned 64-bit int."""
    n = len(data)
    pos = 0
    if n >= 32:
        a1 = (seed + P64_1 + P64_2) & _M64
        a2 = (seed + P64_2) & _M64
        a3 = seed & _M64
        a4 = (seed - P64_1) & _M64
        end = n - 32
        while pos <= end:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, pos)
            a1 = _round64(a1, l1)
            a2 = _round64(a2, l2)
            a3 = _round64(a3, l3)
            a4 = _round64(a4, l4)
            pos += 32
        acc = (
            _rotl64(a1, 1) + _rotl64(a2, 7) + _rotl64(a3, 12)
            + _rotl64(a4, 18)
        ) & _M64
        acc = _merge64(acc, a1)
        acc = _merge64(acc, a2)
        acc = _merge64(acc, a3)
        acc = _merge64(acc, a4)
    else:
        acc = (seed + P64_5) & _M64
    acc = (acc + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        acc ^= _round64(0, lane)
        acc = (_rotl64(acc, 27) * P64_1 + P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc ^= (lane * P64_1) & _M64
        acc = (_rotl64(acc, 23) * P64_2 + P64_3) & _M64
        pos += 4
    while pos < n:
        acc ^= (data[pos] * P64_5) & _M64
        acc = (_rotl64(acc, 11) * P64_1) & _M64
        pos += 1
    acc ^= acc >> 33
    acc = (acc * P64_2) & _M64
    acc ^= acc >> 29
    acc = (acc * P64_3) & _M64
    acc ^= acc >> 32
    return acc


def _round32(acc: int, lane: int) -> int:
    return (_rotl32((acc + lane * P32_2) & _M32, 13) * P32_1) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 digest as an unsigned 32-bit int."""
    n = len(data)
    pos = 0
    if n >= 16:
        a1 = (seed + P32_1 + P32_2) & _M32
        a2 = (seed + P32_2) & _M32
        a3 = seed & _M32
        a4 = (seed - P32_1) & _M32
        end = n - 16
        while pos <= end:
            l1, l2, l3, l4 = struct.unpack_from("<IIII", data, pos)
            a1 = _round32(a1, l1)
            a2 = _round32(a2, l2)
            a3 = _round32(a3, l3)
            a4 = _round32(a4, l4)
            pos += 16
        acc = (
            _rotl32(a1, 1) + _rotl32(a2, 7) + _rotl32(a3, 12)
            + _rotl32(a4, 18)
        ) & _M32
    else:
        acc = (seed + P32_5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (acc + lane * P32_3) & _M32
        acc = (_rotl32(acc, 17) * P32_4) & _M32
        pos += 4
    while pos < n:
        acc = (acc + data[pos] * P32_5) & _M32
        acc = (_rotl32(acc, 11) * P32_1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * P32_2) & _M32
    acc ^= acc >> 13
    acc = (acc * P32_3) & _M32
    acc ^= acc >> 16
    return acc


def xxh64_int64_le(v: int, seed: int = 0) -> int:
    """XXH64 of an int64's 8 little-endian bytes — the form CH uses
    for UInt64/Int64 columns (and Spark for LongType)."""
    return xxh64(struct.pack("<q", v), seed)
