"""VP8L (lossless WebP) codec — operators/vp8l.py.

Coverage:
- pixel-exact encoder/decoder roundtrips over random + formula images
  (subtract-green, color cache, LZ77 runs, palette with width-bundling,
  simple + normal prefix-code representations);
- decode-only paths the encoder doesn't emit, via hand-built streams
  with INDEPENDENT forward transforms computed in the test: all 14
  predictor modes, the color (cross-channel) transform, meta-prefix
  tile dispatch with distinct per-group codes, and the near-distance
  map's (0,1) entry;
- container/negative cases.
"""

from __future__ import annotations

import numpy as np
import pytest
from struct import error as struct_error

from clickhouse_learning_spark.operators.vp8l import (
    _argb_add,
    _argb_sub,
    _BitWriter,
    _cdelta,
    _encode_spatial,
    _predict,
    _wrap_riff,
    _write_code_lengths,
    _canonical_codes,
    decode_vp8l,
    encode_vp8l,
    webp_image,
)


def _rgb_to_argb_list(img):
    a = (
        (np.uint32(0xFF) << 24)
        | (img[..., 0].astype(np.uint32) << 16)
        | (img[..., 1].astype(np.uint32) << 8)
        | img[..., 2].astype(np.uint32)
    ).reshape(-1)
    return [int(p) for p in a]


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def test_roundtrip_random_images():
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (2, 3), (7, 7), (16, 16), (31, 45)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for kwargs in (
            {},
            {"use_cache_bits": 0},
            {"use_subtract_green": False},
            {"use_lz77": False},
            {"use_cache_bits": 10},
        ):
            dec = decode_vp8l(encode_vp8l(img, **kwargs))
            assert dec is not None and (dec == img).all(), (h, w, kwargs)


def test_roundtrip_palette_paths():
    rng = np.random.default_rng(5)
    for nc in (2, 3, 4, 5, 16, 17, 120):
        colors = rng.integers(0, 256, size=(nc, 3), dtype=np.uint8)
        idx = rng.integers(0, nc, size=(9, 14))
        img = colors[idx]
        dec = decode_vp8l(encode_vp8l(img, use_palette=True))
        assert dec is not None and (dec == img).all(), nc
    # odd width exercises the partial last bundle
    img = colors[rng.integers(0, nc, size=(5, 7))]
    assert (decode_vp8l(encode_vp8l(img, use_palette=True)) == img).all()


def test_roundtrip_lz77_runs():
    img = np.zeros((6, 40, 3), dtype=np.uint8)
    img[:, 20:] = [10, 200, 30]
    img[3, 7] = [1, 2, 3]
    dec = decode_vp8l(encode_vp8l(img))
    assert (dec == img).all()


def test_fixture_formula():
    p = webp_image(42, 20, 14)
    d = decode_vp8l(p)
    idx = np.arange(20 * 14 * 3, dtype=np.uint64)
    px = (
        (np.uint64(42) * np.uint64(2654435761) + idx * np.uint64(40503))
        & np.uint64(0xFF)
    ).astype(np.uint8).reshape(14, 20, 3)
    assert (d == px).all()


def test_container_negative():
    assert decode_vp8l(b"") is None
    assert decode_vp8l(b"RIFFxxxxWEBPVP8 ....") is None  # lossy tag
    assert decode_vp8l(None) is None


# --------------------------------------------------------------- predictor
def _forward_predictor(pix, w, h, mode):
    """Independent forward predictor (single tile covering the image):
    residual[i] = pix[i] - predict(mode) with the spec border rules."""
    out = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]
            elif x == 0:
                pred = pix[i - w]
            else:
                l = pix[i - 1]  # noqa: E741
                t = pix[i - w]
                tl = pix[i - w - 1]
                tr = pix[i - w + 1]  # last column: current row's first
                pred = _predict(mode, l, t, tr, tl)
            out.append(_argb_sub(pix[i], pred))
    return out


@pytest.mark.parametrize("mode", range(14))
def test_predictor_modes_decode(mode):
    rng = np.random.default_rng(100 + mode)
    h, w = 6, 9
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    pix = _rgb_to_argb_list(img)
    residuals = _forward_predictor(pix, w, h, mode)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bits = 6  # one tile covers the 9x6 image
    bw.write(bits - 2, 3)
    tile = [0xFF000000 | (mode << 8)]
    _encode_spatial(bw, tile, 0, False, False)
    bw.write(0, 1)  # no more transforms
    _encode_spatial(bw, residuals, 0, False, True)
    dec = decode_vp8l(_wrap_riff(bw))
    assert dec is not None and (dec == img).all(), mode


def test_predictor_multi_tile_decode():
    """Two tiles with different modes: per-tile dispatch must hold."""
    rng = np.random.default_rng(77)
    h, w = 4, 8
    bits = 2  # tile = 4x4 -> two tiles horizontally
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    pix = _rgb_to_argb_list(img)
    modes = [1, 2]  # left tile L, right tile T
    out = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]
            elif x == 0:
                pred = pix[i - w]
            else:
                mode = modes[x >> bits]
                l = pix[i - 1]  # noqa: E741
                t = pix[i - w]
                tl = pix[i - w - 1]
                tr = pix[i - w + 1]
                pred = _predict(mode, l, t, tr, tl)
            out.append(_argb_sub(pix[i], pred))
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)
    bw.write(bits - 2, 3)
    tiles = [0xFF000000 | (modes[0] << 8), 0xFF000000 | (modes[1] << 8)]
    _encode_spatial(bw, tiles, 0, False, False)
    bw.write(0, 1)
    _encode_spatial(bw, out, 0, False, True)
    dec = decode_vp8l(_wrap_riff(bw))
    assert dec is not None and (dec == img).all()


# --------------------------------------------------------------- color tf
def test_color_transform_decode():
    rng = np.random.default_rng(9)
    h, w = 5, 6
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    pix = _rgb_to_argb_list(img)
    g2r, g2b, r2b = 0x12, 0xF3, 0x07  # one element for the whole image
    residuals = []
    for p in pix:
        g = (p >> 8) & 0xFF
        r = (p >> 16) & 0xFF
        b = p & 0xFF
        rp = (r - _cdelta(g2r, g)) & 0xFF
        bp = (b - _cdelta(g2b, g) - _cdelta(r2b, r)) & 0xFF
        residuals.append((p & 0xFF00FF00) | (rp << 16) | bp)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR
    bw.write(6 - 2, 3)  # one tile
    cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    _encode_spatial(bw, [cte], 0, False, False)
    bw.write(0, 1)
    _encode_spatial(bw, residuals, 0, False, True)
    dec = decode_vp8l(_wrap_riff(bw))
    assert dec is not None and (dec == img).all()


# --------------------------------------------------------------- meta
def test_meta_prefix_group_dispatch():
    """Left half pixel A via group 0's codes, right half pixel B via
    group 1's — the groups have DISJOINT literal alphabets, so a wrong
    tile lookup decodes the wrong color."""
    w, h = 8, 4
    A = (0xFF, 11, 22, 33)  # a r g b
    B = (0xFF, 44, 55, 66)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix!
    meta_bits = 2  # 4x4 tiles -> 2x1 entropy image
    bw.write(meta_bits - 2, 3)
    # entropy image pixels: group id in (red<<8)|green -> groups 0,1
    _encode_spatial(
        bw, [0xFF000000 | 0, 0xFF000000 | (1 << 8)], 0, False, False
    )

    def simple_single(sym):
        # emit a 1-symbol simple code for an 8-bit symbol
        bw.write(1, 1)
        bw.write(0, 1)  # one symbol
        bw.write(1, 1)  # 8-bit
        bw.write(sym, 8)

    for _a, _r, _g, _b in (A, B):
        simple_single(_g)  # green code: single literal -> 0 bits/pixel
        simple_single(_r)
        simple_single(_b)
        simple_single(_a)
        simple_single(0)  # distance (unused)
    # body: every pixel decodes via its group's 0-bit codes — no bits!
    dec = decode_vp8l(_wrap_riff(bw))
    assert dec is not None
    left = dec[:, :4]
    right = dec[:, 4:]
    assert (left == np.array([A[1], A[2], A[3]])).all()
    assert (right == np.array([B[1], B[2], B[3]])).all()


# --------------------------------------------------------------- distances
def test_near_distance_map_row_copy():
    """Distance code 1 = (0,1) = one row up: a copy of the whole first
    row must reproduce it."""
    w, h = 4, 2
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green code: literal 5 and length-prefix 3 (value 4)
    green_lengths = [0] * (256 + 24)
    green_lengths[5] = 1
    green_lengths[256 + 3] = 1
    _write_code_lengths(bw, green_lengths)
    gcodes = _canonical_codes(green_lengths)

    def simple_single(sym):
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)

    simple_single(7)  # red
    simple_single(9)  # blue
    simple_single(255)  # alpha
    simple_single(0)  # distance: prefix 0 -> value 1 -> code 1 -> (0,1)

    def emit(sym):
        code, n = gcodes[sym]
        for i in range(n - 1, -1, -1):
            bw.write((code >> i) & 1, 1)

    for _ in range(4):
        emit(5)  # 4 literals: argb(255,7,5,9)
    emit(256 + 3)  # copy length 4, distance code 1 -> distance = w
    dec = decode_vp8l(_wrap_riff(bw))
    assert dec is not None
    assert (dec == np.array([7, 5, 9], dtype=np.uint8)).all()
    assert dec.shape == (2, 4, 3)


def test_argb_helpers_inverse():
    rng = np.random.default_rng(1)
    for _ in range(50):
        a = int(rng.integers(0, 2**32))
        b = int(rng.integers(0, 2**32))
        assert _argb_add(_argb_sub(a, b), b) == a


def test_corrupted_streams_fail_cleanly():
    """Random byte corruptions must either still decode (untouched
    regions), return a (possibly wrong) image, or raise a normal
    exception quickly — never hang or crash the interpreter. The decode
    loop always makes progress (literal/cache advance 1, copies >= 1),
    so corruption cannot loop forever."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(12, 17, 3), dtype=np.uint8)
    good = bytearray(encode_vp8l(img))
    for trial in range(60):
        bad = bytearray(good)
        for _ in range(rng.integers(1, 4)):
            bad[int(rng.integers(20, len(bad)))] = int(rng.integers(0, 256))
        try:
            out = decode_vp8l(bytes(bad))
            assert out is None or out.ndim == 3
        except (ValueError, IndexError, KeyError, struct_error):
            pass


def test_truncated_streams_fail_cleanly():
    img = np.arange(9 * 9 * 3, dtype=np.uint8).reshape(9, 9, 3)
    good = encode_vp8l(img)
    for cut in (21, 25, len(good) // 2, len(good) - 3):
        try:
            decode_vp8l(good[:cut] )
        except (ValueError, IndexError, struct_error):
            pass
