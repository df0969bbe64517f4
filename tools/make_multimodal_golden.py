"""Generate the committed golden feature values for the two lossy/
float multimodal queries (round-4, VERDICT r3 #3), upgrading them from
rows-only to full hash-checked oracles.

Every value is derived INDEPENDENTLY of the engine's decode path:

- ``multimodal_features``: image channel means recomputed from the
  fixture pixel formula directly (never touching the PPM byte parser),
  audio duration/RMS recomputed from the fixture waveform formula
  (never touching the WAV parser), sampled-frame counts from the
  sampling arithmetic;
- ``multimodal_jpeg_features``: payloads re-encoded with the fixture
  encoder, then decoded by the from-scratch reference decoder in
  tools/ref_jpeg.py (bit-walk Huffman + direct-formula IDCT — disjoint
  implementation from operators/jpeg.py). The script cross-checks the
  two decoders pixel-for-pixel and refuses to write goldens on any
  mismatch, so the committed values are agreed by two independent
  implementations of the specification.
- ``audio_spectral``: features recomputed by tools/ref_audio.py —
  formula-derived PCM and a from-scratch radix-2 FFT (no np.fft). The
  script asserts the production WAV generator+parser round-trip to the
  identical samples and that the reference FFT agrees with pocketfft
  before writing anything.

The fixtures are pure functions of doc_id, and the documents table
carries ids 0..499 at every shipped SF, so one golden set serves all
scale factors. Output: clickhouse_learning_spark/golden_multimodal.py
(tuple lists the oracle SQL embeds as VALUES).

Run from the repo root:  python tools/make_multimodal_golden.py
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_learning_spark.operators.jpeg import (  # noqa: E402
    decode_baseline,
    encode_baseline,
)
from clickhouse_learning_spark.operators.multimodal import (  # noqa: E402
    _parse_wav,
    wav_audio,
)
from tools import ref_audio, ref_jpeg  # noqa: E402

DOC_IDS = range(500)  # documents.parquet carries 0..499 at every SF


def fixture_pixels(doc_id: int) -> np.ndarray:
    """The multimodal fixture's pixel formula (build_media_table)."""
    w, h = doc_id % 64 + 16, doc_id % 48 + 16
    idx = np.arange(w * h * 3, dtype=np.uint64)
    return (
        (np.uint64(doc_id) * np.uint64(2654435761) + idx * np.uint64(40503))
        & np.uint64(0xFF)
    ).astype(np.uint8).reshape(h, w, 3)


def audio_rms(doc_id: int) -> tuple[float, float]:
    """duration_s / RMS from the waveform formula (wav_audio), not from
    WAV bytes."""
    sr = 8000
    n = doc_id % 5 * 2000 + 2000
    t = np.arange(n, dtype=np.float64) / sr
    f1 = 110.0 + (doc_id % 40) * 10.0
    wave = 0.6 * np.sin(2 * math.pi * f1 * t) + 0.3 * np.sin(
        2 * math.pi * (2.0 * f1) * t
    )
    pcm = (wave * 32767).astype("<i2").astype(np.float64) / 32768.0
    return round(n / sr, 4), round(float(np.sqrt((pcm * pcm).mean())), 4)


def check_audio_roundtrip(did: int) -> None:
    """The golden PCM comes from the waveform formula; assert the
    production WAV generator + parser round-trip to the identical
    samples, so a byte-path bug can't hide behind a formula golden."""
    sr_ref, pcm_ref = ref_audio.fixture_pcm(did)
    payload = wav_audio(did, 8000, did % 5 * 2000 + 2000)
    sr, n, off = _parse_wav(payload)
    pcm = np.frombuffer(payload, dtype="<i2", count=n, offset=off).astype(
        np.float64
    ) / 32768.0
    if sr != sr_ref or not np.array_equal(pcm, pcm_ref):
        sys.exit(f"WAV round-trip mismatch doc_id={did} — goldens NOT written")


def main() -> None:
    feat_rows = []
    jpeg_rows = []
    audio_rows = []
    mismatches = 0
    # transform sanity: the from-scratch radix-2 FFT must agree with
    # pocketfft to float noise before any golden is derived from it
    probe = np.cos(np.arange(512) * 0.37) + 0.1
    assert (
        np.abs(ref_audio.fft_radix2(probe) - np.fft.fft(probe)).max() < 1e-9
    ), "radix-2 reference FFT disagrees with pocketfft"
    for did in DOC_IDS:
        check_audio_roundtrip(did)
        audio_rows.append((did, *ref_audio.spectral_features(did)))
        px = fixture_pixels(did)
        means = px.reshape(-1, 3).mean(axis=0)
        dur, rms = audio_rms(did)
        feat_rows.append(
            (
                did,
                round(float(means[0]), 4),
                round(float(means[1]), 4),
                round(float(means[2]), 4),
                dur,
                rms,
                3,  # frames 0,3,6 of 9 at every=3
            )
        )

        payload = encode_baseline(px, quality=90)
        ref = ref_jpeg.decode(payload)
        prod = decode_baseline(payload)
        if ref is None or prod is None or not np.array_equal(ref, prod):
            mismatches += 1
            print(f"DECODER MISMATCH doc_id={did}", file=sys.stderr)
            continue
        m = ref.reshape(-1, 3).mean(axis=0)
        jpeg_rows.append(
            (
                did,
                round(float(m[0]), 4),
                round(float(m[1]), 4),
                round(float(m[2]), 4),
            )
        )
    if mismatches:
        sys.exit(f"{mismatches} reference/production decode mismatches — "
                 "goldens NOT written")

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "clickhouse_learning_spark",
        "golden_multimodal.py",
    )
    with open(out, "w") as fh:
        fh.write(
            '"""Golden multimodal feature values — GENERATED by\n'
            "tools/make_multimodal_golden.py (do not edit): every value is\n"
            "recomputed independently of the engine's decoders (pixel/\n"
            "waveform formulas; the from-scratch JPEG reference decoder,\n"
            "cross-checked pixel-exact against the production decoder at\n"
            'generation time). The oracle SQL embeds these as VALUES."""\n\n'
        )
        fh.write("# (media_id, mean_r, mean_g, mean_b, duration_s, rms, "
                 "sampled_frames)\n")
        fh.write("MULTIMODAL_FEATURES = [\n")
        for r in feat_rows:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\n# (media_id, mean_r, mean_g, mean_b)\n")
        fh.write("JPEG_FEATURES = [\n")
        for r in jpeg_rows:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\n# (media_id, dominant_hz, spectral_centroid, "
                 "spectral_bandwidth, rolloff_85, zcr)\n")
        fh.write("AUDIO_SPECTRAL = [\n")
        for r in audio_rows:
            fh.write(f"    {r!r},\n")
        fh.write("]\n")
    print(f"wrote {out}: {len(feat_rows)} feature rows, "
          f"{len(jpeg_rows)} jpeg rows, {len(audio_rows)} audio rows")


if __name__ == "__main__":
    main()
