"""EBML/Matroska metadata walk (operators/mkv.py): hand-assembled
elements pin the varint and element layouts independently of the
fixture writer; default-timescale rule, unknown-element skip,
quarantine."""

from __future__ import annotations

import struct

import pytest

from clickhouse_learning_spark.operators import mkv as K


def test_varint_forms():
    """RFC 8794: 1-byte 0x81 = 1; 2-byte 0x4001 = 1; marker stripped
    for sizes, kept for IDs."""
    assert K._read_varint(b"\x81", 0, keep_marker=False) == (1, 1)
    assert K._read_varint(b"\x40\x01", 0, keep_marker=False) == (1, 2)
    assert K._read_varint(b"\x81", 0, keep_marker=True) == (0x81, 1)
    assert K._read_varint(b"\x2a\xd7\xb1", 0, keep_marker=True) \
        == (0x2AD7B1, 3)
    with pytest.raises(ValueError, match="first byte 0"):
        K._read_varint(b"\x00\x01", 0, keep_marker=False)


def test_hand_assembled_minimal_webm():
    """Built from raw bytes (not via the fixture writer): default
    TimestampScale (element omitted) -> 1e6 ns, Duration 1500 ticks
    = 1.5 s; one V_VP8 video track 640x360."""
    def el(i, body):
        return K._varint_id(i) + K._varint_size(len(body)) + body

    header = el(K._EBML_HEADER, el(K._DOCTYPE, b"webm"))
    info = el(K._INFO, el(K._DURATION, struct.pack(">f", 1500.0)))
    video = el(K._TRACK_ENTRY,
               el(K._TRACK_TYPE, b"\x01") + el(K._CODEC_ID, b"V_VP8")
               + el(K._VIDEO, el(K._PIXEL_W, b"\x02\x80")   # 640
                     + el(K._PIXEL_H, b"\x01\x68")))        # 360
    junk = el(0xEC, b"\x00" * 9)  # Void element — must be skipped
    seg = el(K._SEGMENT, junk + info + el(K._TRACKS, video))
    m = K.parse_mkv_meta(header + seg)
    assert m["doctype"] == "webm"
    assert m["duration_s"] == pytest.approx(1.5)
    assert m["tracks"][0] == {
        "kind": "video", "codec": "V_VP8", "width": 640,
        "height": 360, "sample_rate": None, "channels": None,
    }


def test_custom_timescale():
    def el(i, body):
        return K._varint_id(i) + K._varint_size(len(body)) + body

    header = el(K._EBML_HEADER, el(K._DOCTYPE, b"matroska"))
    # 100_000 ns per tick, 40_000 ticks -> 4.0 s
    info = el(K._INFO, el(K._TS_SCALE, (100_000).to_bytes(3, "big"))
              + el(K._DURATION, struct.pack(">d", 40_000.0)))
    m = K.parse_mkv_meta(header + el(K._SEGMENT, info))
    assert m["duration_s"] == pytest.approx(4.0)
    assert m["doctype"] == "matroska" and m["n_tracks"] == 0


def test_fixture_roundtrip_formulas():
    for mid in (0, 1, 5, 88, 127, 333):
        m = K.parse_mkv_meta(K.build_fixture_mkv(mid))
        vid = [t for t in m["tracks"] if t["kind"] == "video"][0]
        assert m["duration_s"] == pytest.approx((mid % 89 + 1) * 0.25)
        assert vid["width"] == 426 + 2 * (mid % 128)
        assert vid["height"] == 240 + 2 * (mid % 60)
        assert m["n_tracks"] == (2 if mid % 2 == 0 else 1)


def test_error_gates():
    with pytest.raises(ValueError, match="empty"):
        K.parse_mkv_meta(b"")
    with pytest.raises(ValueError):
        K.parse_mkv_meta(b"RIFF1234WEBP")
    with pytest.raises(ValueError, match="no Segment/Info"):
        K.parse_mkv_meta(K._el(K._EBML_HEADER,
                               K._el(K._DOCTYPE, b"webm")))
    with pytest.raises(ValueError):
        K.parse_mkv_meta(K.build_fixture_mkv(4)[:25])


def test_mkv_metadata_quarantines(spark):
    import pandas as pd

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["id"],
                "content": [
                    K.build_fixture_mkv(int(i)) if i % 3 != 1
                    else b"brokenwebm" for i in pdf["id"]
                ],
            })

    payloads = spark.range(9).mapInPandas(
        build, "media_id long, content binary")
    rows = {r.media_id: r for r in K.mkv_metadata(payloads).collect()}
    assert rows[0].video_codec == "V_VP9" and rows[0].mkv_error is None
    assert rows[1].mkv_error is not None and rows[1].duration_s is None
    assert rows[2].audio_codec == "A_OPUS"  # id 2 even -> audio track
    assert rows[3].audio_codec is None      # id 3 odd -> video only
