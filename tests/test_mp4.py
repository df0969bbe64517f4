"""ISO-BMFF metadata walk (operators/mp4.py): hand-built boxes pin
the layouts independently of the fixture writer; version-1 (64-bit)
paths, unknown-box skipping, quarantine behavior."""

from __future__ import annotations

import struct

import pytest

from clickhouse_learning_spark.operators import mp4 as M


def _box(t, payload):
    return struct.pack(">I", 8 + len(payload)) + t + payload


def test_hand_built_minimal_tree():
    """mvhd v0 written by hand from ISO 14496-12 (not via the fixture
    writer): timescale 600, duration 1200 -> 2.0 s."""
    mvhd = _box(b"mvhd", b"\x00\x00\x00\x00"
                + struct.pack(">II", 0, 0)        # ctime mtime
                + struct.pack(">II", 600, 1200)   # timescale duration
                + b"\x00" * (4 + 2 + 2 + 8 + 36 + 24 + 4))
    data = _box(b"ftyp", b"isom\x00\x00\x00\x00") + _box(b"moov", mvhd)
    meta = M.parse_mp4_meta(data)
    assert meta["duration_s"] == 2.0 and meta["timescale"] == 600
    assert meta["n_tracks"] == 0


def test_version1_mvhd_64bit():
    mvhd = _box(b"mvhd", b"\x01\x00\x00\x00"
                + struct.pack(">QQ", 0, 0)
                + struct.pack(">I", 1000)
                + struct.pack(">Q", 4500)
                + b"\x00" * 80)
    data = _box(b"ftyp", b"isom\x00\x00\x00\x00") + _box(b"moov", mvhd)
    assert M.parse_mp4_meta(data)["duration_s"] == 4.5


def test_largesize_and_unknown_boxes_skip():
    mvhd = _box(b"mvhd", b"\x00\x00\x00\x00"
                + struct.pack(">IIII", 0, 0, 100, 250)
                + b"\x00" * 80)
    junk_payload = b"\x00" * 20
    large_junk = (struct.pack(">I", 1) + b"skip"
                  + struct.pack(">Q", 16 + len(junk_payload))
                  + junk_payload)
    data = (_box(b"ftyp", b"isom\x00\x00\x00\x00") + large_junk
            + _box(b"moov", _box(b"free", b"xx") + mvhd))
    assert M.parse_mp4_meta(data)["duration_s"] == 2.5


def test_fixture_roundtrip_formulas():
    for mid in (0, 2, 3, 11, 49, 150):
        meta = M.parse_mp4_meta(M.build_fixture_mp4(mid))
        vid = [t for t in meta["tracks"] if t["kind"] == "vide"][0]
        assert meta["duration_s"] == (mid % 97 + 1) * 0.5
        assert vid["width"] == 320 + 16 * (mid % 8)
        assert vid["height"] == 240 + 16 * (mid % 5)
        assert vid["n_samples"] == mid % 50 + 10
        assert meta["n_tracks"] == (2 if mid % 3 == 0 else 1)


def test_error_gates():
    with pytest.raises(ValueError, match="ftyp"):
        M.parse_mp4_meta(b"RIFF1234WAVE")
    with pytest.raises(ValueError, match="bad box size"):
        M.parse_mp4_meta(M.build_fixture_mp4(1)[:50])
    with pytest.raises(ValueError, match="no moov"):
        M.parse_mp4_meta(_box(b"ftyp", b"isom\x00\x00\x00\x00")
                         + _box(b"mdat", b"x"))


def test_mp4_metadata_quarantines(spark):
    import pandas as pd

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["id"],
                "content": [
                    M.build_fixture_mp4(int(i)) if i % 2 == 0
                    else b"garbage" for i in pdf["id"]
                ],
            })

    payloads = spark.range(10).mapInPandas(
        build, "media_id long, content binary")
    rows = {r.media_id: r for r in M.mp4_metadata(payloads).collect()}
    assert rows[0].mp4_error is None and rows[0].video_codec == "avc1"
    assert rows[1].mp4_error is not None and rows[1].duration_s is None
    assert rows[3].mp4_error is not None
    assert rows[4].video_frames == 4 % 50 + 10


def test_version1_tkhd_offsets():
    """v1 tkhd hand-built from ISO 14496-12: 64-bit times, the 4-byte
    reserved after track_ID, width/height at body offset 84."""
    tkhd = _box(b"tkhd", b"\x01\x00\x00\x07"
                + struct.pack(">QQ", 0, 0)       # ctime mtime
                + struct.pack(">II", 9, 0)       # track_id reserved
                + struct.pack(">Q", 1000)        # duration
                + b"\x00" * 8                    # reserved
                + b"\x00" * 8                    # layer/alt/vol/res
                + b"\x00" * 36                   # matrix
                + struct.pack(">II", 1920 << 16, 1080 << 16))
    mvhd = _box(b"mvhd", b"\x00\x00\x00\x00"
                + struct.pack(">IIII", 0, 0, 1000, 2000)
                + b"\x00" * 80)
    data = (_box(b"ftyp", b"isom\x00\x00\x00\x00")
            + _box(b"moov", mvhd + _box(b"trak", tkhd)))
    meta = M.parse_mp4_meta(data)
    t = meta["tracks"][0]
    assert t["track_id"] == 9
    assert (t["width"], t["height"]) == (1920, 1080)
