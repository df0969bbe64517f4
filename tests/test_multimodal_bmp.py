"""BMP (Windows DIB) decode (operators/multimodal.py): roundtrips
across the three layout variants, hand-built header checks, corrupt
rejection, and the Spark channel-sums path."""

from __future__ import annotations

import struct

import numpy as np

from clickhouse_learning_spark.operators import multimodal as MM


def _formula_px(m, w, h):
    idx = np.arange(w * h * 3, dtype=np.uint64)
    return (
        (np.uint64(m) * np.uint64(2654435761) + idx * np.uint64(40503))
        & np.uint64(0xFF)
    ).astype(np.uint8).reshape(h, w, 3)


def test_variant_roundtrips():
    for m in range(9):  # covers all three layouts, odd widths
        w, h = m % 5 + 3, m % 4 + 2
        px = _formula_px(m, w, h)
        got = MM._bmp_decode(MM.bmp_image(m, w, h))
        assert got is not None and (got == px).all(), (m, m % 3)


def test_header_fields():
    b = MM.bmp_image(0, 5, 4)  # 24-bit bottom-up, stride-padded
    assert b[:2] == b"BM"
    (off,) = struct.unpack_from("<I", b, 10)
    assert off == 54
    bi, w, h = struct.unpack_from("<Iii", b, 14)
    assert (bi, w, h) == (40, 5, 4)
    planes, bpp, comp = struct.unpack_from("<HHI", b, 26)
    assert (planes, bpp, comp) == (1, 24, 0)
    stride = (3 * 5 + 3) & ~3
    assert len(b) == 54 + stride * 4
    b2 = MM.bmp_image(1, 5, 4)  # top-down
    _, _, h2 = struct.unpack_from("<Iii", b2, 14)
    assert h2 == -4
    b3 = MM.bmp_image(2, 5, 4)  # 32-bit
    assert struct.unpack_from("<HHI", b3, 26)[1] == 32


def test_rejects_unsupported():
    good = MM.bmp_image(0, 4, 4)
    assert MM._bmp_decode(None) is None
    assert MM._bmp_decode(b"XX" + good[2:]) is None
    assert MM._bmp_decode(good[:40]) is None
    rle = bytearray(good)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8 compression
    assert MM._bmp_decode(bytes(rle)) is None


def test_spark_channel_sums(spark):
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(18)
    rows = MM.image_channel_sums(
        MM.build_media_table(spark, docs, fmt="bmp")
    ).collect()
    assert len(rows) == 18
    for r in rows:
        m = r["media_id"]
        px = _formula_px(m, m % 64 + 16, m % 48 + 16).reshape(-1, 3)
        px = px.astype(np.int64)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (
            int(px[:, 0].sum()), int(px[:, 1].sum()), int(px[:, 2].sum()),
        )
