"""Independent reference implementation of the audio spectral features
(golden generation for ``audio_spectral`` — same pattern as
tools/ref_jpeg.py): the PCM comes straight from the fixture's waveform
FORMULA (never touching the WAV byte generator or parser) and the
transform is a from-scratch iterative radix-2 DIT FFT (explicit bit
reversal + butterfly passes — no ``np.fft`` anywhere), so a bug in the
production path's WAV round-trip, framing, windowing or pocketfft call
breaks the golden match rather than being baked into it.

Feature definitions follow the documented contract of
``operators/multimodal.audio_spectral_features`` (peak bin of the
frame-averaged magnitude spectrum; magnitude²-weighted centroid/
bandwidth; 85% energy rolloff; zero-crossing rate per second), each
rounded to 2dp like the production output.
"""

from __future__ import annotations

import math

import numpy as np


def fixture_pcm(doc_id: int) -> tuple[int, np.ndarray]:
    """(sample_rate, float64 PCM in [-1, 1]) from the waveform formula
    (wav_audio's two seeded harmonics), including the int16 quantization
    the WAV round-trip applies."""
    sr = 8000
    n = doc_id % 5 * 2000 + 2000
    t = np.arange(n, dtype=np.float64) / sr
    f1 = 110.0 + (doc_id % 40) * 10.0
    wave = 0.6 * np.sin(2 * math.pi * f1 * t) + 0.3 * np.sin(
        2 * math.pi * (2.0 * f1) * t
    )
    return sr, (wave * 32767).astype("<i2").astype(np.float64) / 32768.0


def fft_radix2(frames: np.ndarray) -> np.ndarray:
    """Iterative radix-2 decimation-in-time FFT over the last axis
    (length must be a power of two). Vectorized numpy arithmetic, but
    the algorithm — bit-reversal permutation + log2(N) butterfly passes
    with per-stage twiddles — is implemented here from the textbook
    recurrence, independent of pocketfft."""
    n = frames.shape[-1]
    levels = n.bit_length() - 1
    assert 1 << levels == n, "radix-2 FFT needs a power-of-two length"
    # bit-reversal permutation
    rev = np.zeros(n, dtype=np.int64)
    for i in range(n):
        r = 0
        x = i
        for _ in range(levels):
            r = (r << 1) | (x & 1)
            x >>= 1
        rev[i] = r
    a = frames[..., rev].astype(np.complex128)
    half = 1
    while half < n:
        tw = np.exp(-2j * math.pi * np.arange(half) / (2 * half))
        a = a.reshape(*a.shape[:-1], n // (2 * half), 2 * half)
        even = a[..., :half]
        odd = a[..., half:] * tw
        a = np.concatenate([even + odd, even - odd], axis=-1)
        a = a.reshape(*a.shape[:-2], n)
        half *= 2
    return a


def spectral_features(
    doc_id: int, n_fft: int = 512
) -> tuple[float, float, float, float, float]:
    """(dominant_hz, centroid, bandwidth, rolloff_85, zcr), 2dp."""
    sr, pcm = fixture_pcm(doc_id)
    n = pcm.shape[0]
    hop = n_fft // 2
    # Hann window from the formula (np.hanning's definition)
    k = np.arange(n_fft, dtype=np.float64)
    window = 0.5 - 0.5 * np.cos(2 * math.pi * k / (n_fft - 1))
    n_frames = 1 + (n - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = fft_radix2(pcm[idx] * window)[:, : n_fft // 2 + 1]
    mag = np.abs(spec).mean(axis=0)
    freqs = np.arange(n_fft // 2 + 1, dtype=np.float64) * sr / n_fft
    power = mag * mag
    total = power.sum()
    centroid = float((freqs * power).sum() / total)
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * power).sum() / total))
    cum = np.cumsum(power)
    rolloff = float(freqs[int(np.argmax(cum >= 0.85 * total))])
    sb = np.signbit(pcm)
    zcr = float(np.mean((sb[1:] != sb[:-1]).astype(np.float64)) * sr)
    return (
        round(float(freqs[int(power.argmax())]), 2),
        round(centroid, 2),
        round(bandwidth, 2),
        round(rolloff, 2),
        round(zcr, 2),
    )
