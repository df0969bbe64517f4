"""Arithmetic-coded JPEG (operators/jparith.py) — QM coder + models.

Verification strategy (no external JPEG codec in this container):

1. the raw QM coder round-trips randomized decision sequences across
   shared adaptive bins (encoder and decoder walk T.81 Table D.3
   independently — a transition error on either side desynchronizes
   the stream within a few symbols);
2. whole images encoded arithmetically must decode IDENTICALLY to the
   Huffman encoding of the same image: both fixture encoders share the
   quantization/DCT front end, so the pixel-exact equality pins the
   entropy layer in isolation against the independently-tested Huffman
   path (which itself is golden-checked against tools/ref_jpeg.py);
3. DAC conditioning, restart resync, truncation and corruption paths.
"""
from __future__ import annotations

import random

import numpy as np
import pytest

from clickhouse_learning_spark.operators import jparith as JA
from clickhouse_learning_spark.operators import jpeg as J


def _destuff(b: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(b):
        out.append(b[i])
        i += 2 if (b[i] == 0xFF and i + 1 < len(b) and b[i + 1] == 0) else 1
    return bytes(out)


def _rand_img(rng, h, w, smooth=True):
    if smooth:
        base = rng.integers(0, 256, size=(-(-h // 8), -(-w // 8), 3))
        img = np.kron(base.astype(np.float64), np.ones((8, 8, 1)))[:h, :w]
        img = img + rng.normal(0, 10, img.shape)
    else:
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.float64)
    return np.clip(img, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Table D.3 structural sanity
# ---------------------------------------------------------------------------


def test_qe_table_structure():
    assert len(JA._QE) == 114  # 113 adaptive states + the fixed sign bin
    for i, (qe, nmps, nlps, sw) in enumerate(JA._QE):
        assert 0 < qe < 0x8000
        assert 0 <= nmps < 114 and 0 <= nlps < 114
        assert sw in (0, 1)
        # SWITCH only ever set near Qe ~ 0.5 (the MPS sense can only
        # flip when the two symbols are about equiprobable)
        if sw:
            assert qe > 0x5000
    # fast-attack chain: states 0..13 halve Qe roughly each step
    for i in range(13):
        assert JA._QE[i][0] > JA._QE[i + 1][0]
    # the fixed bin never leaves itself
    assert JA._QE[JA._FIXED][1] == JA._FIXED
    assert JA._QE[JA._FIXED][2] == JA._FIXED


# ---------------------------------------------------------------------------
# Raw coder
# ---------------------------------------------------------------------------


def test_raw_coder_roundtrip_random():
    random.seed(20260815)
    for _ in range(300):
        n = random.randint(1, 800)
        bins = random.randint(1, 8)
        p = random.random()
        seq = [
            (random.randrange(bins), int(random.random() < p))
            for _ in range(n)
        ]
        enc = JA.ArithEncoder()
        st_e = bytearray(bins)
        for b, d in seq:
            enc.encode(st_e, b, d)
        data = _destuff(enc.finish())
        dec = JA.ArithDecoder(data)
        st_d = bytearray(bins)
        for i, (b, d) in enumerate(seq):
            assert dec.decode(st_d, b) == d, f"symbol {i}/{n}"
        assert st_d == st_e  # both sides walked identical state paths


def test_raw_coder_carry_and_stuffing():
    # long runs of the improbable symbol drive C upward → carries and
    # 0xFF output bytes; the stuffed stream must round-trip
    enc = JA.ArithEncoder()
    st = bytearray(1)
    seq = [1, 0] * 40 + [1] * 30 + [0] * 200 + [1]
    for d in seq:
        enc.encode(st, 0, d)
    stuffed = enc.finish()
    assert 0xFF in stuffed  # the stuffing path actually ran
    for i, b in enumerate(stuffed[:-1]):
        if b == 0xFF:
            assert stuffed[i + 1] == 0x00
    dec = JA.ArithDecoder(_destuff(stuffed))
    st_d = bytearray(1)
    assert [dec.decode(st_d, 0) for _ in seq] == seq


def test_decoder_zero_fed_tail():
    # decoding past the data keeps returning symbols (zero-fed tail)
    # and flags exhaustion instead of raising
    dec = JA.ArithDecoder(b"\x55")
    st = bytearray(1)
    for _ in range(400):
        assert dec.decode(st, 0) in (0, 1)
    assert dec.exhausted()


# ---------------------------------------------------------------------------
# Whole-image: arithmetic == Huffman (same coefficients)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "h,w,quality,restart",
    [(16, 16, 90, 0), (20, 22, 80, 0), (33, 17, 60, 1),
     (48, 40, 95, 3), (8, 8, 40, 0), (24, 24, 75, 2)],
)
def test_arith_equals_huffman_decode(h, w, quality, restart):
    rng = np.random.default_rng(h * 1000 + w * 10 + quality)
    img = _rand_img(rng, h, w)
    da = J.decode_baseline(
        JA.encode_arith_sequential(img, quality=quality, restart=restart)
    )
    dh = J.decode_baseline(J.encode_baseline(img, quality=quality))
    assert da is not None and dh is not None
    assert np.array_equal(da, dh)


def test_arith_high_contrast_large_magnitudes():
    # checkerboard at high quality forces the X1/X2 magnitude ladders
    # (categories well beyond the first two decisions) on DC and AC
    rng = np.random.default_rng(3)
    img = (np.indices((32, 32)).sum(axis=0) % 2 * 255).astype(np.uint8)
    img = np.repeat(img[:, :, None], 3, axis=2)
    img = np.clip(
        img.astype(int) + rng.integers(-10, 10, img.shape), 0, 255
    ).astype(np.uint8)
    da = J.decode_baseline(JA.encode_arith_sequential(img, quality=97))
    dh = J.decode_baseline(J.encode_baseline(img, quality=97))
    assert np.array_equal(da, dh)


def test_dac_conditioning_variants():
    # non-default conditioning changes the bitstream but not the result
    rng = np.random.default_rng(11)
    img = _rand_img(rng, 24, 24)
    ref = J.decode_baseline(J.encode_baseline(img, quality=85))
    payloads = set()
    for (L, U), kx in [((0, 1), 5), ((0, 2), 1), ((2, 4), 13), ((1, 3), 63)]:
        pay = JA.encode_arith_sequential(
            img, quality=85, dc_cond=(L, U), ac_kx=kx
        )
        payloads.add(pay)
        assert np.array_equal(J.decode_baseline(pay), ref), (L, U, kx)
    assert len(payloads) == 4  # conditioning actually reached the coder


def test_restart_resync_and_stats_reset():
    # restart=1 resets coder + statistics every MCU; equality with the
    # non-restart stream proves the reset is complete on both sides
    rng = np.random.default_rng(5)
    img = _rand_img(rng, 40, 40)
    a = J.decode_baseline(JA.encode_arith_sequential(img, 85, restart=1))
    b = J.decode_baseline(JA.encode_arith_sequential(img, 85, restart=0))
    assert np.array_equal(a, b)


def test_truncation_keeps_prefix_no_crash():
    rng = np.random.default_rng(9)
    img = _rand_img(rng, 32, 32)
    pay = JA.encode_arith_sequential(img, quality=85)
    for cut in (len(pay) // 4, len(pay) // 2, len(pay) - 3):
        out = J.decode_baseline(pay[:cut])
        assert out is None or out.shape == (32, 32, 3)


def test_corruption_never_raises():
    rng = np.random.default_rng(13)
    img = _rand_img(rng, 24, 24)
    pay = bytearray(JA.encode_arith_sequential(img, quality=85, restart=2))
    random.seed(7)
    for _ in range(40):
        p = bytearray(pay)
        for _ in range(random.randint(1, 6)):
            p[random.randrange(len(p))] = random.randrange(256)
        out = J.decode_baseline(bytes(p))
        assert out is None or out.dtype == np.uint8


def test_compression_beats_huffman_on_smooth_images():
    # not a conformance check — a sanity check that the adaptive coder
    # is actually modeling (QM typically wins ~5-10% on photographic
    # data; a broken estimator would balloon the stream instead)
    rng = np.random.default_rng(21)
    img = _rand_img(rng, 64, 64)
    a = len(JA.encode_arith_sequential(img, quality=85))
    hf = len(J.encode_baseline(img, quality=85))
    assert a < hf * 1.05


# ---------------------------------------------------------------------------
# Progressive arithmetic (SOF10)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "h,w,quality", [(16, 16, 90), (33, 17, 60), (40, 48, 95), (8, 8, 40)]
)
def test_progressive_arith_equals_huffman_decode(h, w, quality):
    # all 14 scan kinds (interleaved DC first Al=1, DC refine, AC band
    # first scans, AC refinements) reconstruct the same coefficients
    # the single-scan Huffman stream carries
    rng = np.random.default_rng(h * 77 + w + quality)
    img = _rand_img(rng, h, w)
    dp = J.decode_baseline(JA.encode_arith_progressive(img, quality=quality))
    dh = J.decode_baseline(J.encode_baseline(img, quality=quality))
    assert dp is not None and np.array_equal(dp, dh)


def test_progressive_arith_equals_progressive_huffman():
    rng = np.random.default_rng(42)
    img = _rand_img(rng, 24, 32)
    dp = J.decode_baseline(JA.encode_arith_progressive(img, quality=85))
    dhp = J.decode_baseline(J.encode_progressive(img, quality=85))
    assert np.array_equal(dp, dhp)


def test_progressive_arith_truncation_no_crash():
    rng = np.random.default_rng(17)
    img = _rand_img(rng, 32, 32)
    pay = JA.encode_arith_progressive(img, quality=85)
    for cut in (len(pay) // 6, len(pay) // 3, len(pay) // 2, len(pay) - 4):
        out = J.decode_baseline(pay[:cut])
        assert out is None or out.shape == (32, 32, 3)


def test_progressive_arith_corruption_never_raises():
    rng = np.random.default_rng(19)
    img = _rand_img(rng, 24, 24)
    pay = bytearray(JA.encode_arith_progressive(img, quality=85))
    random.seed(23)
    for _ in range(30):
        p = bytearray(pay)
        for _ in range(random.randint(1, 5)):
            p[random.randrange(len(p))] = random.randrange(256)
        out = J.decode_baseline(bytes(p))
        assert out is None or out.dtype == np.uint8


# ---------------------------------------------------------------------------
# 12-bit extended sequential (SOF1 Huffman / SOF9 arithmetic)
# ---------------------------------------------------------------------------


def _rand_img12(rng, h, w):
    base = rng.integers(0, 4096, size=(-(-h // 8), -(-w // 8), 3))
    img = np.kron(base.astype(np.float64), np.ones((8, 8, 1)))[:h, :w]
    img = img + rng.normal(0, 100, img.shape)
    return np.clip(img, 0, 4095).astype(np.uint16)


@pytest.mark.parametrize("h,w,quality", [(16, 16, 90), (28, 37, 75),
                                         (8, 8, 95)])
def test_12bit_huffman_and_arith_identical(h, w, quality):
    img12 = _rand_img12(np.random.default_rng(h + w + quality), h, w)
    dh = J.decode_baseline(J.encode_extended12(img12, quality, arith=False))
    da = J.decode_baseline(J.encode_extended12(img12, quality, arith=True))
    assert dh is not None and da is not None
    assert np.array_equal(dh, da)  # same coefficients, two entropy layers
    # lossy but faithful: output approximates the 12->8-bit reference
    ref = img12 / 16.0
    assert np.abs(dh.astype(float) - ref).mean() < 8.0


def test_12bit_magnitudes_exceed_8bit_categories():
    # DC diffs in a 12-bit stream reach categories the 8-bit Annex K
    # tables cannot code — this pins that the wide tables and the QM
    # magnitude ladders actually carry >11-bit values
    rng = np.random.default_rng(2)
    img12 = (np.indices((16, 16)).sum(axis=0) % 2 * 4095).astype(np.uint16)
    img12 = np.repeat(img12[:, :, None], 3, axis=2)
    dh = J.decode_baseline(J.encode_extended12(img12, 97, arith=False))
    da = J.decode_baseline(J.encode_extended12(img12, 97, arith=True))
    assert np.array_equal(dh, da)
    # checkerboard survives: extremes map near 0 / 255
    assert dh.max() > 200 and dh.min() < 55


def test_12bit_baseline_sof0_rejected():
    # precision 12 is illegal in the baseline process (B.2.2): a forged
    # SOF0 with precision 12 must be rejected, not half-decoded
    img12 = _rand_img12(np.random.default_rng(4), 16, 16)
    pay = bytearray(J.encode_extended12(img12, 90, arith=False))
    i = pay.index(b"\xff\xc1")
    pay[i + 1] = 0xC0
    assert J.decode_baseline(bytes(pay)) is None
