"""MPEG-1 Layer III header walk (operators/mp3.py): hand-assembled
frame headers pin the bit layout independently of the fixture writer;
ID3v2 skip, padding-bit frame sizing, VBR mean, quarantine."""

from __future__ import annotations

import struct

import pytest

from clickhouse_learning_spark.operators import mp3 as M


def _hdr(bidx, ridx, padding=0, midx=0):
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
        | (bidx << 12) | (ridx << 10) | (padding << 9) | (midx << 6)
    return struct.pack(">I", h)


def _frame(bidx, ridx, padding=0, midx=0):
    kbps = M._BITRATES[bidx]
    sr = M._RATES[ridx]
    ln = 144 * kbps * 1000 // sr + padding
    return _hdr(bidx, ridx, padding, midx) + b"\x00" * (ln - 4)


def test_hand_assembled_frames():
    """Two 128 kbps 44.1 kHz stereo frames: 417 bytes unpadded, 418
    padded — the textbook numbers."""
    data = _frame(9, 0) + _frame(9, 0, padding=1)
    assert len(data) == 417 + 418
    m = M.parse_mp3_meta(data)
    assert m["n_frames"] == 2 and m["bitrate_kbps"] == 128.0
    assert m["sample_rate"] == 44100 and m["mode"] == "stereo"
    assert m["duration_s"] == pytest.approx(2 * 1152 / 44100)


def test_vbr_mean_and_mono():
    data = _frame(9, 1, midx=3) + _frame(13, 1, midx=3)  # 128 + 256
    m = M.parse_mp3_meta(data)
    assert m["bitrate_kbps"] == 192.0 and m["mode"] == "mono"
    assert m["sample_rate"] == 48000


def test_id3v2_skip():
    body = _frame(11, 2)
    tag = b"hello world tag!"
    id3 = b"ID3\x03\x00\x00" + bytes([0, 0, len(tag) >> 7,
                                      len(tag) & 0x7F]) + tag
    m = M.parse_mp3_meta(id3 + body)
    assert m["n_frames"] == 1 and m["sample_rate"] == 32000


def test_error_gates():
    with pytest.raises(ValueError, match="sync"):
        M.parse_mp3_meta(b"\x12\x34\x56\x78")
    with pytest.raises(ValueError, match="truncated mid-frame"):
        M.parse_mp3_meta(_frame(9, 0)[:-10])
    with pytest.raises(ValueError, match="variable sample rate"):
        M.parse_mp3_meta(_frame(9, 0) + _frame(9, 1))
    with pytest.raises(ValueError, match="free-form"):
        M.parse_mp3_meta(_hdr(0, 0) + b"\x00" * 400)
    # MPEG-2 (version bits 0b10) rejected by the MPEG-1 gate
    h = (0x7FF << 21) | (2 << 19) | (1 << 17) | (9 << 12)
    with pytest.raises(ValueError, match="MPEG-1"):
        M.parse_mp3_meta(struct.pack(">I", h) + b"\x00" * 100)


def test_mp3_metadata_quarantines(spark):
    import pandas as pd

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["id"],
                "content": [
                    M.build_fixture_mp3(int(i)) if i % 2 == 0
                    else b"junkjunk" for i in pdf["id"]
                ],
            })

    payloads = spark.range(8).mapInPandas(
        build, "media_id long, content binary")
    rows = {r.media_id: r for r in M.mp3_metadata(payloads).collect()}
    assert rows[0].mp3_error is None and rows[0].mode == "stereo"
    assert rows[1].mp3_error is not None and rows[1].n_frames is None
    assert rows[2].bitrate_kbps == 256.0  # id 2 -> [128,192,256][2]
