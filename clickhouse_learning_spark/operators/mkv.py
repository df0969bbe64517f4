"""Matroska / WebM (EBML, RFC 8794) container metadata extraction.

Completes the container-metadata family (MP4: operators/mp4.py, MP3:
operators/mp3.py) for the third container that dominates crawled
video: WebM is Matroska. Same contract — the metadata-only first
pass of a video curation pipeline, walking the structure and never
touching codec payloads (VP8/VP9/AV1 decode is out of scope by
design).

EBML primer (RFC 8794): every element is (varint id, varint size,
body). Varints carry their length in leading zeros of the first byte;
element IDs keep the marker bit, sizes strip it. Elements read here
(IDs from the published Matroska/WebM spec):

- EBML header ``0x1A45DFA3`` (with DocType ``0x4282`` — 'matroska' /
  'webm');
- ``Segment 0x18538067`` → ``Info 0x1549A966``:
  ``TimestampScale 0x2AD7B1`` (ns per tick, default 1,000,000) and
  ``Duration 0x4489`` (float ticks);
- ``Tracks 0x1654AE6B`` → ``TrackEntry 0xAE``: ``TrackType 0x83``
  (1 = video, 2 = audio), ``CodecID 0x86``, ``Video 0xE0``
  (``PixelWidth 0xB0`` / ``PixelHeight 0xBA``), ``Audio 0xE1``
  (``SamplingFrequency 0xB5`` float / ``Channels 0x9F``).

Unknown elements skip by size; map-only Arrow pass with quarantine
(same contract as mp4_metadata).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_AUDIO = 0xE1
_SAMPLE_FREQ = 0xB5
_CHANNELS = 0x9F
_DOCTYPE = 0x4282

_CONTAINERS = {_SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _AUDIO}


def _read_varint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    if pos >= len(buf):
        raise ValueError("EBML varint past end of buffer")
    first = buf[pos]
    if first == 0:
        raise ValueError("invalid EBML varint (first byte 0)")
    length = 1
    mask = 0x80
    while not first & mask:
        length += 1
        mask >>= 1
    if pos + length > len(buf):
        raise ValueError("truncated EBML varint")
    value = first if keep_marker else first & (mask - 1)
    for i in range(1, length):
        value = (value << 8) | buf[pos + i]
    return value, pos + length


def _walk(buf: bytes, start: int, end: int):
    pos = start
    while pos < end:
        eid, pos = _read_varint(buf, pos, keep_marker=True)
        size, pos = _read_varint(buf, pos, keep_marker=False)
        if pos + size > end:
            raise ValueError(f"EBML element 0x{eid:X} overruns scope")
        yield eid, pos, pos + size
        pos += size


def _uint(buf: bytes, a: int, b: int) -> int:
    out = 0
    for i in range(a, b):
        out = (out << 8) | buf[i]
    return out


def _float(buf: bytes, a: int, b: int) -> float:
    n = b - a
    if n == 4:
        return struct.unpack(">f", buf[a:b])[0]
    if n == 8:
        return struct.unpack(">d", buf[a:b])[0]
    raise ValueError(f"EBML float of width {n}")


def parse_mkv_meta(data: bytes) -> dict:
    """``{doctype, duration_s, n_tracks, tracks: [{kind, codec,
    width, height, sample_rate, channels}]}``."""
    it = _walk(data, 0, len(data))
    try:
        eid, b0, b1 = next(it)
    except StopIteration:
        raise ValueError("empty stream") from None
    if eid != _EBML_HEADER:
        raise ValueError("not an EBML stream (no leading header)")
    doctype = None
    for hid, h0, h1 in _walk(data, b0, b1):
        if hid == _DOCTYPE:
            doctype = data[h0:h1].decode("latin-1").rstrip("\x00")
    ts_scale = 1_000_000  # spec default: ns per tick
    duration_ticks = None
    tracks: list[dict] = []
    for eid, b0, b1 in it:
        if eid != _SEGMENT:
            continue
        for sid, s0, s1 in _walk(data, b0, b1):
            if sid == _INFO:
                for iid, i0, i1 in _walk(data, s0, s1):
                    if iid == _TS_SCALE:
                        ts_scale = _uint(data, i0, i1)
                    elif iid == _DURATION:
                        duration_ticks = _float(data, i0, i1)
            elif sid == _TRACKS:
                for tid, t0, t1 in _walk(data, s0, s1):
                    if tid == _TRACK_ENTRY:
                        tracks.append(_parse_track(data, t0, t1))
    if duration_ticks is None:
        raise ValueError("no Segment/Info/Duration element")
    return {
        "doctype": doctype,
        "duration_s": duration_ticks * ts_scale / 1e9,
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


def _parse_track(data: bytes, start: int, end: int) -> dict:
    out = {"kind": None, "codec": None, "width": None, "height": None,
           "sample_rate": None, "channels": None}
    for eid, b0, b1 in _walk(data, start, end):
        if eid == _TRACK_TYPE:
            t = _uint(data, b0, b1)
            out["kind"] = {1: "video", 2: "audio"}.get(t, str(t))
        elif eid == _CODEC_ID:
            out["codec"] = data[b0:b1].decode("latin-1").rstrip("\x00")
        elif eid == _VIDEO:
            for vid, v0, v1 in _walk(data, b0, b1):
                if vid == _PIXEL_W:
                    out["width"] = _uint(data, v0, v1)
                elif vid == _PIXEL_H:
                    out["height"] = _uint(data, v0, v1)
        elif eid == _AUDIO:
            for aid, a0, a1 in _walk(data, b0, b1):
                if aid == _SAMPLE_FREQ:
                    out["sample_rate"] = int(_float(data, a0, a1))
                elif aid == _CHANNELS:
                    out["channels"] = _uint(data, a0, a1)
    return out


MKV_META_SCHEMA = T.StructType([
    T.StructField("doctype", T.StringType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("n_tracks", T.IntegerType()),
    T.StructField("video_codec", T.StringType()),
    T.StructField("video_w", T.IntegerType()),
    T.StructField("video_h", T.IntegerType()),
    T.StructField("audio_codec", T.StringType()),
    T.StructField("audio_rate", T.IntegerType()),
    T.StructField("mkv_error", T.StringType()),
])


def mkv_metadata(
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
                    m = parse_mkv_meta(bytes(blob))
                    vid = next((t for t in m["tracks"]
                                if t["kind"] == "video"), None)
                    aud = next((t for t in m["tracks"]
                                if t["kind"] == "audio"), None)
                    rows.append((
                        int(mid), m["doctype"], m["duration_s"],
                        m["n_tracks"],
                        vid["codec"] if vid else None,
                        vid["width"] if vid else None,
                        vid["height"] if vid else None,
                        aud["codec"] if aud else None,
                        aud["sample_rate"] if aud else None, None,
                    ))
                except Exception as exc:
                    rows.append((int(mid), None, None, None, None,
                                 None, None, None, None,
                                 str(exc)[:200]))
            yield pd.DataFrame(
                rows, columns=[id_col, "doctype", "duration_s",
                               "n_tracks", "video_codec", "video_w",
                               "video_h", "audio_codec", "audio_rate",
                               "mkv_error"])

    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), *MKV_META_SCHEMA.fields]
    )
    return df.select(id_col, content_col).mapInPandas(gen, schema)


# -- deterministic fixture writer -------------------------------------

def _varint_id(eid: int) -> bytes:
    out = []
    v = eid
    while v:
        out.append(v & 0xFF)
        v >>= 8
    return bytes(reversed(out))


def _varint_size(n: int) -> bytes:
    # smallest marker-bit encoding
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            v = n | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise ValueError("size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _varint_id(eid) + _varint_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    n = max((v.bit_length() + 7) // 8, 1)
    return _el(eid, v.to_bytes(n, "big"))


def build_fixture_mkv(media_id: int) -> bytes:
    """Deterministic WebM shell: duration (id%89+1)*250 ms at the
    default 1e6 timescale, VP9 video (w,h) = (426+2*(id%128),
    240+2*(id%60)), plus an Opus 48 kHz stereo track when id%2==0."""
    mid = int(media_id)
    dur_ms = (mid % 89 + 1) * 250.0
    w = 426 + 2 * (mid % 128)
    h = 240 + 2 * (mid % 60)
    header = _el(_EBML_HEADER, _el(_DOCTYPE, b"webm"))
    info = _el(_INFO, _el_uint(_TS_SCALE, 1_000_000)
               + _el(_DURATION, struct.pack(">d", dur_ms)))
    video_tr = _el(_TRACK_ENTRY,
                   _el_uint(_TRACK_TYPE, 1)
                   + _el(_CODEC_ID, b"V_VP9")
                   + _el(_VIDEO, _el_uint(_PIXEL_W, w)
                         + _el_uint(_PIXEL_H, h)))
    tracks = video_tr
    if mid % 2 == 0:
        tracks += _el(_TRACK_ENTRY,
                      _el_uint(_TRACK_TYPE, 2)
                      + _el(_CODEC_ID, b"A_OPUS")
                      + _el(_AUDIO,
                            _el(_SAMPLE_FREQ,
                                struct.pack(">f", 48000.0))
                            + _el_uint(_CHANNELS, 2)))
    segment = _el(_SEGMENT, info + _el(_TRACKS, tracks))
    return header + segment
