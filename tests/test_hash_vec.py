"""Vectorized-integer hash paths ≡ the spec-verified scalar code
(functions/hash_vec.py vs xxh.py / murmur.py / siphash.py), bit for
bit, over random values and the two's-complement width edges. The
scalar side carries the public-vector verification (smhasher
constants, Spark-builtin cross-checks, paper vectors); this law makes
the numpy fast lane exactly that code."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from clickhouse_learning_spark.functions import hash_vec as HV
from clickhouse_learning_spark.functions.murmur import (
    ch_murmur3_64,
    murmur3_x64_128,
    murmur3_x86_32,
)
from clickhouse_learning_spark.functions.siphash import ch_siphash64
from clickhouse_learning_spark.functions.xxh import xxh32, xxh64

_FMT = {1: "<b", 2: "<h", 4: "<i", 8: "<q"}
_NPT = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}


def _samples(width: int) -> np.ndarray:
    lo = -(1 << (8 * width - 1))
    hi = (1 << (8 * width - 1)) - 1
    r = random.Random(1000 + width)
    vals = [0, -1, 1, lo, hi, lo + 1, hi - 1]
    vals += [r.randint(lo, hi) for _ in range(500)]
    return np.array(vals, dtype=_NPT[width])


@pytest.mark.parametrize("width", [1, 2, 4, 8])
def test_all_vec_paths_match_scalar(width):
    vals = _samples(width)
    packed = [struct.pack(_FMT[width], int(v)) for v in vals]

    got = HV.xxh64_int_vec(vals, width)
    want = [xxh64(p, 0) for p in packed]
    assert [int(g) for g in got] == want, "xxh64"

    got = HV.xxh32_int_vec(vals, width)
    want = [xxh32(p, 0) for p in packed]
    assert [int(g) for g in got] == want, "xxh32"

    got = HV.murmur32_int_vec(vals, width)
    want = [murmur3_x86_32(p, 0) for p in packed]
    assert [int(g) for g in got] == want, "murmur32"

    g1, g2 = HV.murmur128_int_vec(vals, width)
    want = [murmur3_x64_128(p, 0) for p in packed]
    assert [(int(a), int(b)) for a, b in zip(g1, g2)] == want, "m128"

    got = HV.murmur64_int_vec(vals, width)
    want = [ch_murmur3_64(p) for p in packed]
    assert [int(g) for g in got] == want, "murmur64"

    got = HV.siphash64_int_vec(vals, width)
    want = [ch_siphash64(p) for p in packed]
    assert [int(g) for g in got] == want, "siphash64"


def test_seed_parametric_paths_match_scalar():
    vals = _samples(8)
    packed = [struct.pack("<q", int(v)) for v in vals]
    for seed in (42, 0x9747B28C):
        assert [int(g) for g in HV.xxh64_int_vec(vals, 8, seed)] == [
            xxh64(p, seed) for p in packed
        ]
        assert [int(g) for g in HV.murmur32_int_vec(vals, 8, seed)] == [
            murmur3_x86_32(p, seed) for p in packed
        ]
