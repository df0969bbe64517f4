"""Property-based round-trips for the round-3 pure-python codecs:
random inputs through encode→decode must be identity (PNG, GIF,
portable roaring) or within quantization error (JPEG). No Spark
session needed — these are the codec kernels the mapInPandas stages
call per Arrow batch."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    ft=st.integers(0, 4),
)
def test_png_roundtrip_random(w, h, seed, ft):
    from clickhouse_learning_spark.operators import multimodal as MM

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # encode by hand through png_image's machinery: reuse the filter
    # logic by writing raw IDAT ourselves via the public encoder with a
    # chosen filter is id-pattern-bound, so build the PNG directly
    import struct
    import zlib

    raw = px.reshape(h, w * 3).astype(np.int16)
    prior = np.zeros(w * 3, dtype=np.int16)
    lines = []
    for y in range(h):
        line = raw[y]
        left = np.concatenate([np.zeros(3, dtype=np.int16), line[:-3]])
        ul = np.concatenate([np.zeros(3, dtype=np.int16), prior[:-3]])
        if ft == 0:
            filt = line
        elif ft == 1:
            filt = line - left
        elif ft == 2:
            filt = line - prior
        elif ft == 3:
            filt = line - (left + prior) // 2
        else:
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            filt = line - pred
        lines.append(bytes([ft]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prior = line
    png = (
        b"\x89PNG\r\n\x1a\n"
        + MM._png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + MM._png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + MM._png_chunk(b"IEND", b"")
    )
    got = MM._png_decode(png)
    assert got is not None and np.array_equal(got, px)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 2000),
    seed=st.integers(0, 2**31 - 1),
    dense=st.booleans(),
)
def test_portable_roaring_roundtrip_random(n, seed, dense):
    from clickhouse_learning_spark.functions import roaring as RB

    rng = np.random.default_rng(seed)
    if dense:
        # force a bitmap container: >4096 values in one 64k block
        base = rng.integers(0, 4, size=1) * 65536
        vals = base + rng.choice(65536, size=min(60000, 4097 + n), replace=False)
    else:
        vals = rng.integers(0, 2**32, size=n, dtype=np.uint64)
    vals = np.unique(vals.astype(np.uint32))
    internal = RB.serialize(vals)
    back = RB.from_portable(RB.to_portable(internal))
    assert np.array_equal(RB.deserialize(back), vals)
    assert RB.cardinality(back) == len(vals)


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(8, 32),
    h=st.integers(8, 32),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_smooth_random(w, h, seed):
    """Smooth random fields (low-frequency) must survive encode/decode
    within a small quantization bound at quality 95."""
    from clickhouse_learning_spark.operators import jpeg as J

    rng = np.random.default_rng(seed)
    # random plane + bilinear-ish smoothness via cumulative means
    base = rng.integers(60, 196, size=3)
    yy, xx = np.mgrid[0:h, 0:w]
    slopes = rng.uniform(-1.5, 1.5, size=(3, 2))
    img = np.stack(
        [
            np.clip(base[c] + slopes[c, 0] * xx + slopes[c, 1] * yy, 0, 255)
            for c in range(3)
        ],
        axis=2,
    ).astype(np.uint8)
    dec = J.decode_baseline(J.encode_baseline(img, quality=95))
    assert dec is not None and dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6


@settings(max_examples=12, deadline=None)
@given(
    w=st.integers(4, 40),
    h=st.integers(4, 40),
    seed=st.integers(0, 2**31 - 1),
    quality=st.sampled_from([50, 75, 90]),
)
def test_jpeg_progressive_equals_baseline_random(w, h, seed, quality):
    """Progressive (SOF2: spectral selection + successive approximation
    on DC and AC) carries the SAME quantized coefficients as baseline,
    so both decodes must reconstruct the IDENTICAL image — a single
    differing pixel anywhere means a scan kind mis-decoded (round 4,
    operators/jpeg.py)."""
    from clickhouse_learning_spark.operators import jpeg as J

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    base = J.decode_baseline(J.encode_baseline(img, quality=quality))
    prog_payload = J.encode_progressive(img, quality=quality)
    prog = J.decode_baseline(prog_payload)
    assert prog is not None and base is not None
    assert prog_payload[3] != 0xC0  # really SOF2 after SOI+DQT
    assert np.array_equal(prog, base)


def test_jpeg_progressive_through_pixels_gate():
    """operators/multimodal._pixels must decode a progressive payload
    natively (no Pillow in this container)."""
    from clickhouse_learning_spark.operators import jpeg as J
    from clickhouse_learning_spark.operators.multimodal import _pixels

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17, 3)).astype(np.uint8)
    payload = J.encode_progressive(img, quality=90)
    got = _pixels(payload)
    assert got is not None
    assert np.array_equal(got, J.decode_baseline(J.encode_baseline(img, quality=90)))


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 30),
    h=st.integers(1, 30),
    ncol=st.integers(2, 64),
    seed=st.integers(0, 2**31 - 1),
    interlace=st.booleans(),
)
def test_gif_roundtrip_random(w, h, ncol, seed, interlace):
    """Random palettes/index fields through the in-test spec encoder
    (see test_pipeline_ops.test_gif_decode_native) and _gif_decode."""
    from tests.test_pipeline_ops import test_gif_decode_native  # noqa: F401
    from clickhouse_learning_spark.operators import multimodal as MM

    rng = np.random.default_rng(seed)
    pal = [tuple(int(x) for x in rng.integers(0, 256, size=3)) for _ in range(ncol)]
    idx = rng.integers(0, ncol, size=w * h).tolist()

    # reuse the independent encoder from the unit test module
    import struct as _struct

    def lzw_encode(indices, min_code):
        clear, end = 1 << min_code, (1 << min_code) + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code, width = end + 1, min_code + 1
        out_bits = []
        out_bits.append((clear, width))
        cur = bytes([indices[0]])
        for c in indices[1:]:
            ext = cur + bytes([c])
            if ext in table:
                cur = ext
                continue
            out_bits.append((table[cur], width))
            table[ext] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
            cur = bytes([c])
        out_bits.append((table[cur], width))
        out_bits.append((end, width))
        big, pos = 0, 0
        for code, wd in out_bits:
            big |= code << pos
            pos += wd
        return big.to_bytes((pos + 7) // 8, "little")

    rows = np.asarray(idx, dtype=np.uint8).reshape(h, w)
    send = rows
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        send = rows[order]
    pbits = max(1, (ncol - 1).bit_length()) - 1
    pal_bytes = np.asarray(pal, dtype=np.uint8).tobytes()
    pal_bytes += b"\x00" * (3 * (2 << pbits) - len(pal_bytes))
    min_code = max(2, (ncol - 1).bit_length())
    data = lzw_encode(send.reshape(-1).tolist(), min_code)
    blocks = b"".join(
        bytes([len(data[i : i + 255])]) + data[i : i + 255]
        for i in range(0, len(data), 255)
    ) + b"\x00"
    gif = (
        b"GIF89a" + _struct.pack("<HH", w, h)
        + bytes([0x80 | pbits, 0, 0]) + pal_bytes
        + bytes([0x2C]) + _struct.pack("<HHHH", 0, 0, w, h)
        + bytes([0x40 if interlace else 0])
        + bytes([min_code]) + blocks + b"\x3B"
    )
    got = MM._gif_decode(gif)
    assert got is not None
    assert np.array_equal(got, np.asarray(pal, dtype=np.uint8)[rows])


def _png_encode_spec(px, bit_depth=8, color_type=2, interlace=0):
    """In-test PNG spec encoder (filter 0 rows; 8/16-bit gray or RGB,
    optional Adam7) — independent of the production decoder, like the
    GIF in-test encoder."""
    import struct
    import zlib

    from clickhouse_learning_spark.operators.multimodal import _ADAM7

    h, w = px.shape[:2]

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def rows(img):
        out = bytearray()
        for y in range(img.shape[0]):
            out.append(0)  # filter: None
            if bit_depth == 8:
                out += img[y].astype(np.uint8).tobytes()
            else:
                out += img[y].astype(">u2").tobytes()
        return out

    if interlace == 0:
        raw = rows(px)
    else:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += rows(sub)
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    interlace=st.sampled_from([0, 1]),
)
def test_png_16bit_decode(w, h, seed, interlace):
    """16-bit PNGs decode natively (round 4): samples reduce by the
    high byte, interlaced or not."""
    from clickhouse_learning_spark.operators.multimodal import _png_decode

    rng = np.random.default_rng(seed)
    px16 = rng.integers(0, 65536, size=(h, w, 3), dtype=np.uint16)
    payload = _png_encode_spec(px16, bit_depth=16, interlace=interlace)
    got = _png_decode(payload)
    assert got is not None
    assert np.array_equal(got, (px16 >> 8).astype(np.uint8))


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_adam7_8bit_decode(w, h, seed):
    """Adam7-interlaced 8-bit PNGs reassemble exactly (round 4) —
    every pass geometry hit across random shapes incl. < 8px edges."""
    from clickhouse_learning_spark.operators.multimodal import _png_decode

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = _png_decode(_png_encode_spec(px, bit_depth=8, interlace=1))
    assert got is not None
    assert np.array_equal(got, px)


def test_png_16bit_gray_decode():
    from clickhouse_learning_spark.operators.multimodal import _png_decode

    rng = np.random.default_rng(3)
    g16 = rng.integers(0, 65536, size=(11, 7, 1), dtype=np.uint16)
    payload = _png_encode_spec(g16, bit_depth=16, color_type=0, interlace=1)
    got = _png_decode(payload)
    assert got is not None
    want = np.repeat((g16 >> 8).astype(np.uint8), 3, axis=2)
    assert np.array_equal(got, want)


def test_lossless_jpeg_exact_roundtrip():
    """SOF3 is LOSSLESS: decode must reproduce the source pixels
    bit-exactly for every predictor (Table H.1)."""
    import numpy as np

    from clickhouse_learning_spark.operators import jpeg as J

    for pred in range(1, 8):
        rng = np.random.default_rng(100 + pred)
        img = rng.integers(0, 256, size=(13, 17, 3)).astype(np.uint8)
        out = J.decode_baseline(J.encode_lossless(img, predictor=pred))
        assert out is not None and np.array_equal(out, img), pred


def test_lossless_jpeg_variants():
    import numpy as np

    from clickhouse_learning_spark.operators import jpeg as J

    rng = np.random.default_rng(7)
    # 16-bit grayscale rescales to the 8-bit contract
    g = rng.integers(0, 65536, size=(9, 11)).astype(np.uint16)
    out = J.decode_baseline(J.encode_lossless(g, predictor=4, prec=16))
    assert np.array_equal(out[:, :, 0], (g / 256).astype(np.uint8))
    img = rng.integers(0, 256, size=(10, 12, 3)).astype(np.uint8)
    # restart intervals resync and reset the first prediction
    out = J.decode_baseline(J.encode_lossless(img, predictor=6, restart=5))
    assert np.array_equal(out, img)
    # point transform drops the low bit on both sides
    out = J.decode_baseline(
        J.encode_lossless(img, predictor=2, point_transform=1)
    )
    assert np.array_equal(out, (img >> 1) << 1)
    # truncation keeps the decoded prefix without raising
    pay = J.encode_lossless(img, predictor=4)
    cut = J.decode_baseline(pay[: len(pay) // 2])
    assert cut is None or cut.shape == (10, 12, 3)


def test_hierarchical_jpeg_composition_law():
    """Hierarchical (Annex J) decode equals the composition of the
    standalone primitives: quantize/IDCT the coarse frame, EXP-upsample
    (out[2i]=in[i], out[2i+1]=(a+b+1)>>1), add the decoded differential
    coefficients — recomputed here independently of the codec's own
    reference bookkeeping."""
    import numpy as np

    from clickhouse_learning_spark.operators import jpeg as J

    rng = np.random.default_rng(11)
    img = (
        np.kron(
            rng.integers(0, 256, (2, 2, 3)).astype(float),
            np.ones((8, 8, 1)),
        )[:16, :16]
    ).astype(np.uint8)
    pay = J.encode_hierarchical(img, quality=90, levels=2)
    out = J.decode_baseline(pay)
    assert out is not None and out.shape == (16, 16, 3)

    f = img.astype(np.float64)
    planes0 = [
        np.round(0.299 * f[:, :, 0] + 0.587 * f[:, :, 1]
                 + 0.114 * f[:, :, 2]),
        np.round(-0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1]
                 + 0.5 * f[:, :, 2] + 128),
        np.round(0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1]
                 - 0.081312 * f[:, :, 2] + 128),
    ]
    q = J._quant_table(90)
    sim = []
    for p in (pp.astype(np.int64) for pp in planes0):
        small = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
                 + p[1::2, 1::2] + 2) // 4
        coef = np.round(J._fdct2(small.astype(float) - 128) / q)
        rec = np.clip(np.round(J._idct2(coef * q) + 128), 0, 255)
        up = J._exp_upsample(rec.astype(np.int64), 1, 1)
        d = p - up
        acc = np.zeros((16, 16), dtype=np.int64)
        for by in range(2):
            for bx in range(2):
                db = d[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                dc = np.round(J._fdct2(db.astype(float)) / q)
                acc[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    up[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    + np.round(J._idct2(dc * q)).astype(np.int64)
                )
        sim.append(np.clip(acc, 0, 255).astype(np.float64))
    want = J._to_rgb(sim)
    assert np.array_equal(out, want)


def test_hierarchical_jpeg_levels_and_robustness():
    import numpy as np

    from clickhouse_learning_spark.operators import jpeg as J

    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, size=(5, 4, 3)).astype(np.float64)
    img = np.clip(
        np.kron(base, np.ones((8, 8, 1)))[:37, :27]
        + rng.normal(0, 8, (37, 27, 3)),
        0, 255,
    ).astype(np.uint8)
    for levels in (1, 2, 3):
        out = J.decode_baseline(
            J.encode_hierarchical(img, quality=90, levels=levels)
        )
        assert out is not None and out.shape == (37, 27, 3)
        # refinement keeps full-image quality at every pyramid depth
        assert np.abs(out.astype(float) - img).mean() < 8.0
    pay = J.encode_hierarchical(img, quality=90, levels=2)
    for cut in (len(pay) // 3, len(pay) // 2, len(pay) - 5):
        t = J.decode_baseline(pay[:cut])
        assert t is None or t.dtype == np.uint8
    import random

    random.seed(5)
    for _ in range(25):
        p = bytearray(pay)
        for _ in range(random.randint(1, 5)):
            p[random.randrange(len(p))] = random.randrange(256)
        t = J.decode_baseline(bytes(p))
        assert t is None or t.dtype == np.uint8
