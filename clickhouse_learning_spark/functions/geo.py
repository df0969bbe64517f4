"""Geohash encode/decode — vectorized numpy pandas UDFs.

The geohash algorithm is fully public (Niemeyer 2008): alternate
longitude/latitude interval bisection MSB-first (even bit positions =
longitude), 5 bits per character through the base-32 alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``.  ClickHouse's geohashEncode
(longitude, latitude[, precision=12]) emits that standard form;
geohashDecode returns the CELL CENTER as a (longitude, latitude)
tuple.

Both directions are numpy-vectorized over Arrow batches (the dialect's
UDF contract — no per-row Python), grouped by distinct precision /
string length so the bit loops run at most 12 iterations per batch.
Anchored in tests to the published example hashes ("ezs42",
"u4pruydqqvj") plus encode/decode round-trip properties.
"""
from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_ALPHA = np.array(list(BASE32))
_LUT = np.full(128, -1, dtype=np.int64)
for _i, _c in enumerate(BASE32):
    _LUT[ord(_c)] = _i


def encode_fixed(lon: np.ndarray, lat: np.ndarray, p: int) -> list[str]:
    """Encode float64 arrays at one precision (1..12)."""
    nbits = 5 * p
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lonq = np.clip(
        np.floor((lon + 180.0) / 360.0 * (1 << nlon)), 0, (1 << nlon) - 1
    ).astype(np.uint64)
    latq = np.clip(
        np.floor((lat + 90.0) / 180.0 * (1 << nlat)), 0, (1 << nlat) - 1
    ).astype(np.uint64)
    val = np.zeros(len(lon), dtype=np.uint64)
    for i in range(nbits):
        val <<= np.uint64(1)
        if i % 2 == 0:
            val |= (lonq >> np.uint64(nlon - 1 - i // 2)) & np.uint64(1)
        else:
            val |= (latq >> np.uint64(nlat - 1 - i // 2)) & np.uint64(1)
    idx = np.empty((len(lon), p), dtype=np.int64)
    for k in range(p):
        idx[:, k] = ((val >> np.uint64(5 * (p - 1 - k)))
                     & np.uint64(31)).astype(np.int64)
    chars = _ALPHA[idx]
    return ["".join(row) for row in chars]


def decode_fixed(vals: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode base-32 digit matrices (n, p) back to cell centers."""
    nbits = 5 * p
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    acc = np.zeros(vals.shape[0], dtype=np.uint64)
    for k in range(p):
        acc = (acc << np.uint64(5)) | vals[:, k].astype(np.uint64)
    lonq = np.zeros_like(acc)
    latq = np.zeros_like(acc)
    for i in range(nbits):
        bit = (acc >> np.uint64(nbits - 1 - i)) & np.uint64(1)
        if i % 2 == 0:
            lonq = (lonq << np.uint64(1)) | bit
        else:
            latq = (latq << np.uint64(1)) | bit
    lon = (lonq.astype(np.float64) + 0.5) / (1 << nlon) * 360.0 - 180.0
    lat = (latq.astype(np.float64) + 0.5) / (1 << nlat) * 180.0 - 90.0
    return lon, lat


def make_geohash_encode_udf():
    from pyspark.sql.functions import pandas_udf

    def _f(lon, lat, prec):
        import pandas as pd

        null = lon.isna().to_numpy() | lat.isna().to_numpy()
        lo = lon.fillna(0.0).to_numpy(dtype=np.float64)
        la = lat.fillna(0.0).to_numpy(dtype=np.float64)
        pr = np.clip(prec.fillna(12).to_numpy(dtype=np.int64), 1, 12)
        out = np.empty(len(lo), dtype=object)
        for p in np.unique(pr):
            m = pr == p
            out[m] = encode_fixed(lo[m], la[m], int(p))
        out[null] = None
        return pd.Series(out)

    return pandas_udf(_f, "string")


def make_geohash_decode_udf():
    from pyspark.sql.functions import pandas_udf

    def _f(s):
        import pandas as pd

        n = len(s)
        lon = np.full(n, np.nan)
        lat = np.full(n, np.nan)
        raw = s.to_numpy(dtype=object)
        lens = np.array(
            [len(x) if isinstance(x, str) else 0 for x in raw], dtype=np.int64
        )
        for p in np.unique(lens):
            if p < 1 or p > 12:
                continue
            m = np.where(lens == p)[0]
            digits = np.empty((len(m), p), dtype=np.int64)
            bad = np.zeros(len(m), dtype=bool)
            for j, i in enumerate(m):
                for k, ch in enumerate(raw[i].lower()):
                    d = _LUT[ord(ch)] if ord(ch) < 128 else -1
                    if d < 0:
                        bad[j] = True
                        break
                    digits[j, k] = d
            ok = m[~bad]
            if len(ok):
                lo, la = decode_fixed(digits[~bad], int(p))
                lon[ok] = lo
                lat[ok] = la
        return pd.DataFrame({"col1": lon, "col2": lat})

    return pandas_udf(_f, "struct<col1: double, col2: double>")
