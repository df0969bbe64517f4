"""Native FLAC codec (operators/flac.py).

Round-trips pin the encoder/decoder pair bit-exactly (FLAC is
lossless); the decode-only paths the fixture encoder never emits —
LPC subframes, escape (raw) residual partitions, multi-partition
Rice, stereo decorrelation — are exercised by HAND-BUILT streams
whose expected sample values are recomputed independently in the
test body, so the decoder cannot self-confirm."""
from __future__ import annotations

import struct

import numpy as np

from clickhouse_learning_spark.operators import flac as FL


def _streaminfo(sr=8000, nch=1, bps=16, total=0, last=True):
    w = FL._BitW()
    w.write(16, 16)
    w.write(65535, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sr, 20)
    w.write(nch - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    body = w.bytes() + b"\x00" * 16
    flag = 0x80 if last else 0x00
    return bytes([flag]) + struct.pack(">I", len(body))[1:] + body


def _frame(body_bits: FL._BitW, blocksize: int, sr=8000, ch_code=0,
           ss_code=4, frame_no=0) -> bytes:
    h = FL._BitW()
    h.write(0x3FFE, 14)
    h.write(0, 1)
    h.write(0, 1)
    h.write(7, 4)   # 16-bit blocksize-1 follows
    h.write(13, 4)  # 16-bit Hz follows
    h.write(ch_code, 4)
    h.write(ss_code, 3)
    h.write(0, 1)
    hb = h.bytes() + FL._utf8_encode(frame_no) \
        + struct.pack(">H", blocksize - 1) + struct.pack(">H", sr)
    hb += bytes([FL._crc8(hb)])
    body_bits.align()
    fr = hb + body_bits.bytes()
    return fr + struct.pack(">H", FL._crc16(fr))


def test_roundtrip_exact_various():
    rng = np.random.default_rng(5)
    for n, block in [(1, 4096), (9000, 4096), (5000, 1024), (4096, 4096)]:
        pcm = rng.integers(-32768, 32768, size=n).astype(np.int16)
        r = FL.decode_flac(FL.encode_flac(pcm, 44100, block=block))
        assert r is not None and np.array_equal(
            r[1][0], pcm.astype(np.int64)
        ), (n, block)
    # tonal signal (FIXED predictors + rice actually compress)
    t = np.arange(16000) / 8000.0
    pcm = (0.7 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    pay = FL.encode_flac(pcm, 8000)
    assert len(pay) < pcm.nbytes * 0.8  # really compressing
    r = FL.decode_flac(pay)
    assert np.array_equal(r[1][0], pcm.astype(np.int64))


def test_crc_integrity_rejects_corruption():
    t = np.arange(4000) / 8000.0
    pcm = (0.5 * np.sin(2 * np.pi * 300 * t) * 32767).astype(np.int16)
    pay = bytearray(FL.encode_flac(pcm, 8000))
    for pos in (len(pay) // 3, len(pay) - 10):
        p = bytearray(pay)
        p[pos] ^= 0x55
        assert FL.decode_flac(bytes(p)) is None


def test_lpc_subframe_hand_built():
    # order-2 LPC: s[i] = ((c0*s[i-1] + c1*s[i-2]) >> shift) + r[i]
    warm = [1000, -700]
    coef = [1843, -820]  # precision 12, shift 10
    shift = 10
    res = [5, -3, 0, 7, -2, 1]
    blocksize = len(warm) + len(res)
    # independent expected reconstruction
    s = list(warm)
    for r in res:
        p = (coef[0] * s[-1] + coef[1] * s[-2]) >> shift
        s.append(p + r)

    b = FL._BitW()
    b.write(0, 1)
    b.write(32 + 1, 6)  # LPC order 2 -> 100001
    b.write(0, 1)
    for w in warm:
        b.write(w & 0xFFFF, 16)
    b.write(12 - 1, 4)  # precision 12
    b.write(shift & 0x1F, 5)
    for c in coef:
        b.write(c & 0xFFF, 12)
    b.write(0, 2)  # rice, 4-bit params
    b.write(0, 4)  # partition order 0
    b.write(3, 4)  # rice parameter 3
    for v in res:
        u = (v << 1) ^ (-1 if v < 0 else 0)
        q = u >> 3
        b.write(0, q) if q else None
        b.write(1, 1)
        b.write(u & 7, 3)
    pay = b"fLaC" + _streaminfo(total=blocksize) + _frame(b, blocksize)
    r = FL.decode_flac(pay)
    assert r is not None
    assert list(r[1][0]) == s


def test_escape_partition_and_multi_partition():
    # partition order 1 (two partitions): first escape/raw, second rice
    blocksize = 8
    order = 0
    first = [-12000, 30000, 5, -1]      # raw 17-bit
    second = [2, -2, 0, 1]              # rice p=1
    b = FL._BitW()
    b.write(0, 1)
    b.write(8, 6)  # FIXED order 0
    b.write(0, 1)
    b.write(0, 2)
    b.write(1, 4)  # partition order 1
    b.write(15, 4)  # escape
    b.write(17, 5)  # 17 raw bits
    for v in first:
        b.write(v & 0x1FFFF, 17)
    b.write(1, 4)  # rice param 1
    for v in second:
        u = (v << 1) ^ (-1 if v < 0 else 0)
        q = u >> 1
        b.write(0, q) if q else None
        b.write(1, 1)
        b.write(u & 1, 1)
    pay = b"fLaC" + _streaminfo(total=blocksize) + _frame(b, blocksize)
    r = FL.decode_flac(pay)
    assert r is not None
    assert list(r[1][0]) == first + second


def test_stereo_decorrelation_modes():
    L = [100, 120, 90, 100]
    R = [40, 60, 35, 50]
    n = len(L)

    def const_sub(b, v, bits):
        b.write(0, 1)
        b.write(0, 6)  # CONSTANT
        b.write(0, 1)
        b.write(v & ((1 << bits) - 1), bits)

    def verb_sub(b, vals, bits):
        b.write(0, 1)
        b.write(1, 6)  # VERBATIM
        b.write(0, 1)
        for v in vals:
            b.write(v & ((1 << bits) - 1), bits)

    # left/side: ch0 = left, ch1 = left - right (side, 17 bit)
    b = FL._BitW()
    verb_sub(b, L, 16)
    verb_sub(b, [l - r for l, r in zip(L, R)], 17)
    pay = b"fLaC" + _streaminfo(nch=2, total=n) + _frame(b, n, ch_code=8)
    r = FL.decode_flac(pay)
    assert r is not None and list(r[1][0]) == L and list(r[1][1]) == R

    # right/side: ch0 = side, ch1 = right
    b = FL._BitW()
    verb_sub(b, [l - r for l, r in zip(L, R)], 17)
    verb_sub(b, R, 16)
    pay = b"fLaC" + _streaminfo(nch=2, total=n) + _frame(b, n, ch_code=9)
    r = FL.decode_flac(pay)
    assert r is not None and list(r[1][0]) == L and list(r[1][1]) == R

    # mid/side: mid = (L+R)>>1, side = L-R
    b = FL._BitW()
    verb_sub(b, [(l + r) >> 1 for l, r in zip(L, R)], 16)
    verb_sub(b, [l - r for l, r in zip(L, R)], 17)
    pay = b"fLaC" + _streaminfo(nch=2, total=n) + _frame(b, n, ch_code=10)
    r = FL.decode_flac(pay)
    assert r is not None and list(r[1][0]) == L and list(r[1][1]) == R


def test_wasted_bits_and_constant():
    # CONSTANT subframe with 2 wasted bits: stored value 25 -> 25 << 2
    n = 6
    b = FL._BitW()
    b.write(0, 1)
    b.write(0, 6)
    b.write(1, 1)     # wasted-bits flag
    b.write(0, 1)     # unary 1 -> one extra zero? unary(): count zeros
    b.write(1, 1)     # => wasted = 1 + 1 = 2
    b.write(25, 14)   # bps 16 - 2 wasted
    pay = b"fLaC" + _streaminfo(total=n) + _frame(b, n)
    r = FL.decode_flac(pay)
    assert r is not None and list(r[1][0]) == [100] * n


def test_truncation_and_garbage():
    t = np.arange(5000) / 8000.0
    pcm = (0.4 * np.sin(2 * np.pi * 200 * t) * 32767).astype(np.int16)
    pay = FL.encode_flac(pcm, 8000, block=1024)
    for cut in (5, len(pay) // 2, len(pay) - 3):
        out = FL.decode_flac(pay[:cut])
        assert out is None or len(out[1][0]) <= len(pcm)
    assert FL.decode_flac(b"not flac at all") is None
    assert FL.decode_flac(None) is None
