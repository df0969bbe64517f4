"""Exact SipHash-2-4 — key-parametric, from the public specification
(Aumasson & Bernstein, "SipHash: a fast short-input PRF"; reference
implementation released CC0/public domain).

ClickHouse's ``sipHash64`` is SipHash-2-4 with the fixed key
(k0, k1) = (0, 0) over the value's byte form (src/Common/SipHash.h —
default-constructed SipHash, i.e. both key words zero).

Verification (tests/test_siphash.py):
- the paper's Appendix-A worked example — key 000102…0f, 15-byte
  message 000102…0e → 0xa129ca6149be45e5 — which exercises one full
  8-byte compression block, a 7-byte tail, and the length byte;
- the first entry of the reference implementation's vectors_sip64
  table (empty message, same key) → 0x726fdb47dd0e0e31, which
  exercises initialization + finalization alone;
- incremental-vs-whole self-consistency over every length 0..64.

The two published vectors between them cover every code path
(init, block rounds, tail packing, length byte, finalization) with
independent known answers; the key enters only the v0..v3 init, so
the machinery verified at the paper key is the machinery that runs
at ClickHouse's (0, 0).

``sipHash128`` stays GATED in the dialect: ClickHouse's 128-bit
variant is historically NON-standard (its docs point users to
sipHash128Reference because the original diverged from the reference
finalization), and neither convention is pinned offline.
"""

from __future__ import annotations

_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def siphash24(data: bytes, k0: int = 0, k1: int = 0) -> int:
    """SipHash-2-4 → unsigned 64-bit int."""
    v0 = (0x736F6D6570736575 ^ k0) & _M64
    v1 = (0x646F72616E646F6D ^ k1) & _M64
    v2 = (0x6C7967656E657261 ^ k0) & _M64
    v3 = (0x7465646279746573 ^ k1) & _M64

    def rounds(n, v0, v1, v2, v3):
        for _ in range(n):
            v0 = (v0 + v1) & _M64
            v1 = _rotl(v1, 13)
            v1 ^= v0
            v0 = _rotl(v0, 32)
            v2 = (v2 + v3) & _M64
            v3 = _rotl(v3, 16)
            v3 ^= v2
            v0 = (v0 + v3) & _M64
            v3 = _rotl(v3, 21)
            v3 ^= v0
            v2 = (v2 + v1) & _M64
            v1 = _rotl(v1, 17)
            v1 ^= v2
            v2 = _rotl(v2, 32)
        return v0, v1, v2, v3

    n = len(data)
    nblocks = n // 8
    for i in range(nblocks):
        m = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = rounds(2, v0, v1, v2, v3)
        v0 ^= m
    # tail: remaining bytes little-endian, length in the top byte
    b = (n & 0xFF) << 56
    tail = data[nblocks * 8 :]
    for j, byte in enumerate(tail):
        b |= byte << (8 * j)
    v3 ^= b
    v0, v1, v2, v3 = rounds(2, v0, v1, v2, v3)
    v0 ^= b
    v2 ^= 0xFF
    v0, v1, v2, v3 = rounds(4, v0, v1, v2, v3)
    return v0 ^ v1 ^ v2 ^ v3


def ch_siphash64(data: bytes) -> int:
    """ClickHouse sipHash64: SipHash-2-4 at key (0, 0)."""
    return siphash24(data, 0, 0)
