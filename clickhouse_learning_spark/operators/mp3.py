"""MPEG-1 audio (MP3) frame-header metadata walk.

The audio twin of operators/mp4.py's pre-decode filter: before any
expensive transcription/feature pass over a crawled audio corpus, the
pipeline filters by duration / bitrate / sample rate / channel mode —
all of which live in the 4-byte frame headers, not the audio payload.
This walks every frame header (ISO 11172-3 layout, the published
tables below), skips a leading ID3v2 container, and reports stream
totals. Huffman AUDIO decode is deliberately out of scope (the
codebook tables aren't reproducible here) — the header layer is fully
specified and verifiable:

- sync: 11 set bits; version (MPEG-1 = 0b11), layer (III = 0b01);
- bitrate index -> kbps (MPEG-1 Layer III table:
  32,40,48,56,64,80,96,112,128,160,192,224,256,320);
- sample-rate index -> 44100/48000/32000 Hz;
- frame size = 144 * bitrate / sample_rate + padding; 1152
  samples/frame -> duration = frames * 1152 / sample_rate.

Scale shape: map-only Arrow pass, malformed payloads quarantined in
``mp3_error`` (same contract as mp4_metadata).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320]  # MPEG-1 Layer III, kbps; index 0 = free, 15 bad
_RATES = [44100, 48000, 32000]
_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    # syncsafe 28-bit size after the 10-byte header
    size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
        | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
    return 10 + size


def parse_mp3_meta(data: bytes) -> dict:
    """Walk every MPEG-1 Layer III frame: ``{n_frames, duration_s,
    bitrate_kbps (mean), sample_rate, mode}``. Raises on anything that
    is not a clean frame chain (constant sample rate required)."""
    pos = _skip_id3v2(data)
    n = len(data)
    frames = 0
    kbps_total = 0
    rate = None
    mode = None
    while pos + 4 <= n:
        h = struct.unpack_from(">I", data, pos)[0]
        if (h >> 21) != 0x7FF:
            raise ValueError(f"lost frame sync at byte {pos}")
        version = (h >> 19) & 3
        layer = (h >> 17) & 3
        if version != 3 or layer != 1:
            raise ValueError("only MPEG-1 Layer III streams handled")
        bidx = (h >> 12) & 0xF
        ridx = (h >> 10) & 3
        padding = (h >> 9) & 1
        midx = (h >> 6) & 3
        if bidx in (0, 15) or ridx == 3:
            raise ValueError("free-form/invalid bitrate or rate index")
        kbps = _BITRATES[bidx]
        sr = _RATES[ridx]
        if rate is None:
            rate, mode = sr, _MODES[midx]
        elif sr != rate:
            raise ValueError("variable sample rate stream")
        frame_len = 144 * kbps * 1000 // sr + padding
        frames += 1
        kbps_total += kbps
        pos += frame_len
    if frames == 0:
        raise ValueError("no MPEG audio frames")
    if pos > n:
        raise ValueError("truncated mid-frame")
    if pos != n:
        raise ValueError("trailing bytes after last frame")
    return {
        "n_frames": frames,
        "duration_s": frames * 1152 / rate,
        "bitrate_kbps": kbps_total / frames,
        "sample_rate": rate,
        "mode": mode,
    }


MP3_META_SCHEMA = T.StructType([
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("bitrate_kbps", T.DoubleType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("mode", T.StringType()),
    T.StructField("mp3_error", T.StringType()),
])


def mp3_metadata(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Map-only Arrow pass; malformed payloads quarantine."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    m = parse_mp3_meta(bytes(blob))
                    rows.append((int(mid), m["n_frames"],
                                 m["duration_s"], m["bitrate_kbps"],
                                 m["sample_rate"], m["mode"], None))
                except Exception as exc:
                    rows.append((int(mid), None, None, None, None,
                                 None, str(exc)[:200]))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_frames", "duration_s",
                               "bitrate_kbps", "sample_rate", "mode",
                               "mp3_error"])

    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), *MP3_META_SCHEMA.fields]
    )
    return df.select(id_col, content_col).mapInPandas(gen, schema)


# -- deterministic fixture writer (headers real, payload silence) ----

def build_fixture_mp3(media_id: int, with_id3: bool | None = None) -> bytes:
    """(media_id % 40 + 5) frames of 128/192/256 kbps (id % 3) at
    44100/48000/32000 Hz (id % 3 rotated), stereo/mono by id % 2,
    zero-filled payloads, optional ID3v2 shell (default id % 4 == 0)."""
    mid = int(media_id)
    bidx = [9, 11, 13][mid % 3]          # 128, 192, 256 kbps
    ridx = [0, 1, 2][(mid + 1) % 3]      # 44100, 48000, 32000
    midx = 0 if mid % 2 == 0 else 3      # stereo / mono
    n_frames = mid % 40 + 5
    kbps = _BITRATES[bidx]
    sr = _RATES[ridx]
    out = bytearray()
    if with_id3 if with_id3 is not None else mid % 4 == 0:
        tag = b"TAG PAYLOAD %d" % mid
        out += b"ID3\x04\x00\x00" + bytes([
            (len(tag) >> 21) & 0x7F, (len(tag) >> 14) & 0x7F,
            (len(tag) >> 7) & 0x7F, len(tag) & 0x7F,
        ]) + tag
    for _ in range(n_frames):
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
            | (bidx << 12) | (ridx << 10) | (midx << 6)
        frame_len = 144 * kbps * 1000 // sr  # padding bit 0
        out += struct.pack(">I", h) + b"\x00" * (frame_len - 4)
    return bytes(out)
