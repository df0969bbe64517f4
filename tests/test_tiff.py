"""TIFF 6.0 codec (operators/tiff.py): the spec's own PackBits worked
example, an INDEPENDENT spec-pseudocode LZW decoder cross-check (so the
production encode/decode pair cannot hide a matched bug), early-change
width boundaries, predictor/byte-order/strip matrix, corrupt-payload
rejection, and the Spark decode path."""

from __future__ import annotations

import numpy as np
import pytest

from clickhouse_learning_spark.operators import tiff as TF


def test_packbits_spec_example():
    """TIFF 6.0 specification §9's worked example, byte for byte."""
    unpacked = bytes.fromhex(
        "AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA"
    )
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert TF.packbits_encode(unpacked) == packed
    assert TF.packbits_decode(packed, len(unpacked)) == unpacked


def test_packbits_roundtrip_fuzz():
    import random

    rng = random.Random(0xF1FF)
    for _ in range(60):
        n = rng.randint(0, 400)
        # runs + noise mix: the shapes RLE has to get right
        data = bytearray()
        while len(data) < n:
            if rng.random() < 0.5:
                data += bytes([rng.randrange(256)]) * rng.randint(1, 200)
            else:
                data += bytes(rng.randrange(256) for _ in range(rng.randint(1, 20)))
        data = bytes(data[:n])
        assert TF.packbits_decode(TF.packbits_encode(data), n) == data


def _ref_lzw_decode(data: bytes, expected: int) -> bytes:
    """Independent decoder written directly from the TIFF §13
    pseudocode: string table as dict, GetNextCode as a closure, the
    spec's OldCode/StringFromCode recurrence — no structure shared
    with the production list-table decoder."""
    table: dict[int, bytes] = {}

    def init():
        table.clear()
        for i in range(256):
            table[i] = bytes([i])

    bitpos = 0

    def get(width: int) -> int:
        nonlocal bitpos
        val = 0
        for _ in range(width):
            byte = data[bitpos >> 3]
            val = (val << 1) | ((byte >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return val

    out = bytearray()
    init()
    width = 9
    nxt = 258
    old: bytes | None = None
    while len(out) < expected:
        code = get(width)
        if code == 257:  # EOI
            break
        if code == 256:  # Clear
            init()
            width, nxt, old = 9, 258, None
            continue
        if old is None:
            s = table[code]
        elif code in table:
            s = table[code]
            table[nxt] = old + s[:1]
            nxt += 1
        else:
            s = old + old[:1]
            table[nxt] = s
            nxt += 1
        out.extend(s)
        old = s
        # early change: the reader's next-assignable code trails the
        # writer's by one, so widen at 510/1022/2046
        if nxt == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def test_lzw_against_independent_spec_decoder():
    import random

    rng = random.Random(0x12F)
    for n in (0, 1, 5, 300, 1200, 5000):
        data = bytes(rng.randrange(256) for _ in range(n // 2)) + bytes(
            [rng.randrange(8)] * (n - n // 2)
        )
        enc = TF.lzw_encode(data)
        assert TF.lzw_decode(enc, n) == data
        assert _ref_lzw_decode(enc, n) == data


def test_lzw_crosses_width_bumps():
    """Enough distinct strings to cross the 9->10->11-bit early-change
    boundaries; both decoders must stay in sync with the encoder."""
    data = bytes((i * 7 + (i >> 3)) & 0xFF for i in range(20_000))
    enc = TF.lzw_encode(data)
    assert TF.lzw_decode(enc, len(data)) == data
    assert _ref_lzw_decode(enc, len(data)) == data


@pytest.mark.parametrize("comp,pred", [("none", 1), ("packbits", 1),
                                       ("lzw", 1), ("lzw", 2)])
@pytest.mark.parametrize("bo", ["<", ">"])
def test_tiff_matrix_roundtrip(comp, pred, bo):
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(21, 17, 3)).astype(np.uint8)
    payload = TF.encode_tiff(px, compression=comp, byte_order=bo,
                             predictor=pred, rows_per_strip=5)
    got = TF.decode_tiff(payload)
    assert got is not None and (got == px).all()


@pytest.mark.parametrize("bo", ["<", ">"])
def test_decode_unsorted_ifd(bo):
    """TIFF 6.0 only RECOMMENDS ascending tag order in the IFD; a
    foreign writer may emit any order. Reversing the 12-byte entries
    must not change the decode — in particular the packed-multi-SHORT
    value fields (BitsPerSample) must be read at each entry's own
    offset, not an offset re-derived from sorted key order
    (ADVICE r6)."""
    import struct

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(9, 7, 3)).astype(np.uint8)
    payload = bytearray(TF.encode_tiff(px, byte_order=bo,
                                       rows_per_strip=5))  # 2 strips
    (ifd,) = struct.unpack_from(bo + "I", payload, 4)
    (cnt,) = struct.unpack_from(bo + "H", payload, ifd)
    entries = []
    for i in range(cnt):
        off = ifd + 2 + 12 * i
        tag, typ, n = struct.unpack_from(bo + "HHI", payload, off)
        if tag in (273, 279) and typ == 4 and n == 2:
            # foreign-writer shape: 2 strip LONGs via aux pointer
            # rewritten as 2 SHORTs PACKED into the value field — the
            # branch the sorted-index bug corrupted
            (ptr,) = struct.unpack_from(bo + "I", payload, off + 8)
            a, b = struct.unpack_from(bo + "2I", payload, ptr)
            assert a < 0x10000 and b < 0x10000
            entries.append(struct.pack(bo + "HHIHH", tag, 3, 2, a, b))
        else:
            entries.append(bytes(payload[off: off + 12]))
    assert cnt >= 2
    for i, e in enumerate(reversed(entries)):
        payload[ifd + 2 + 12 * i: ifd + 2 + 12 * (i + 1)] = e
    got = TF.decode_tiff(bytes(payload))
    assert got is not None and (got == px).all()


def test_decode_rejects_corrupt():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = TF.encode_tiff(px, compression="lzw")
    assert TF.decode_tiff(None) is None
    assert TF.decode_tiff(b"XX" + good[2:]) is None
    assert TF.decode_tiff(good[:20]) is None
    # flip a strip byte: either decodes to wrong-length (None) or at
    # minimum never crashes
    bad = bytearray(good)
    bad[12] ^= 0xFF
    TF.decode_tiff(bytes(bad))


def test_spark_channel_sums_match_formula(spark):
    from clickhouse_learning_spark.operators import multimodal as MM
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(24)
    media = MM.build_media_table(spark, docs, fmt="tiff")
    rows = {r["media_id"]: r for r in MM.image_channel_sums(media).collect()}
    for m, r in rows.items():
        w, h = m % 64 + 16, m % 48 + 16
        idx = np.arange(w * h * 3, dtype=np.uint64)
        px = (
            (np.uint64(m) * np.uint64(2654435761) + idx * np.uint64(40503))
            & np.uint64(0xFF)
        ).astype(np.int64).reshape(-1, 3)
        assert (r["sum_r"], r["sum_g"], r["sum_b"], r["n_px"]) == (
            int(px[:, 0].sum()), int(px[:, 1].sum()), int(px[:, 2].sum()),
            w * h,
        )
