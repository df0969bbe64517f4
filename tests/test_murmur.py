"""MurmurHash3 exactness laws (functions/murmur.py) — the r9 lift of
the murmurHash3_32/_64/_128 dialect gates, the same verification play
as r8's xxHash lift (tests/test_xxh.py).

Decisive instruments:
- smhasher's OWN VerificationTest constants (published in smhasher's
  main.cpp): hashing keys {0..i-1} at seed 256-i for i in 0..255 and
  then hashing the concatenated outputs at seed 0 must reproduce
  0xB0F57EE3 (x86_32) / 0x6384BA69 (x64_128). One constant pins every
  length class 0..255 and 256 seeds.
- Spark's builtin ``hash()`` IS Murmur3 x86_32 at seed 42 for inputs
  whose byte length is a multiple of 4 (its hashUnsafeBytes mixes
  unaligned tails one byte at a time — a documented deliberate
  divergence), giving an independent bit-for-bit cross-check of the
  block machinery; the seed enters only the accumulator init, so the
  machinery verified at 42 is the machinery that runs at CH's seed 0.
- Published single-input vectors for the tail paths (the widely
  mirrored Appleby/smhasher-era test set) and mmh3's canonical
  ('foo', seed 0) x64_128 pair.
"""

from __future__ import annotations

import random

import pytest

from clickhouse_learning_spark.functions.murmur import (
    ch_murmur3_64,
    murmur3_x64_128,
    murmur3_x64_128_bytes,
    murmur3_x86_32,
)


def _smhasher_verification(hash_bytes_fn) -> int:
    key = bytes(range(256))
    buf = b""
    for i in range(256):
        buf += hash_bytes_fn(key[:i], 256 - i)
    return int.from_bytes(hash_bytes_fn(buf, 0)[:4], "little")


def test_smhasher_verification_x86_32():
    got = _smhasher_verification(
        lambda d, s: murmur3_x86_32(d, s).to_bytes(4, "little")
    )
    assert got == 0xB0F57EE3, hex(got)


def test_smhasher_verification_x64_128():
    got = _smhasher_verification(murmur3_x64_128_bytes)
    assert got == 0x6384BA69, hex(got)


def test_published_vectors_x86_32():
    cases = [
        (b"", 0, 0x00000000),
        (b"", 1, 0x514E28B7),
        (b"", 0xFFFFFFFF, 0x81F16F39),
        (b"\x00\x00\x00\x00", 0, 0x2362F9DE),
        (b"a", 0x9747B28C, 0x7FA09EA6),
        (b"aa", 0x9747B28C, 0x5D211726),
        (b"aaa", 0x9747B28C, 0x283E0130),
        (b"aaaa", 0x9747B28C, 0x5A97808A),
        (b"ab", 0x9747B28C, 0x74875592),
        (b"abc", 0x9747B28C, 0xC84A62DD),
        (b"abcd", 0x9747B28C, 0xF0478627),
        (b"Hello, world!", 0x9747B28C, 0x24884CBA),
        ("ππππππππ".encode("utf-8"), 0x9747B28C, 0xD58063C1),
    ]
    for data, seed, want in cases:
        assert murmur3_x86_32(data, seed) == want, (data, seed)


def test_published_vector_x64_128_foo():
    # mmh3.hash64('foo') — the canonical signed pair, and its
    # hash128 little-endian composition
    h1, h2 = murmur3_x64_128(b"foo", 0)
    signed = lambda u: u - (1 << 64) if u >= (1 << 63) else u  # noqa: E731
    assert (signed(h1), signed(h2)) == (
        -2129773440516405919, 9128664383759220103
    )
    assert h1 + (h2 << 64) == 168394135621993849475852668931176482145
    # empty input at seed 0 is exactly (0, 0) by construction
    assert murmur3_x64_128(b"", 0) == (0, 0)


def test_spark_builtin_cross_check_aligned_lengths(spark):
    """Spark hash() = Murmur3 x86_32 seed 42; equal bit-for-bit on
    every 4-byte-aligned input (the block machinery is shared; tails
    are Spark's documented divergence and excluded)."""
    from pyspark.sql import functions as F

    rng = random.Random(9417)
    strs = ["", "abcd", "aaaabbbb", "x1y2z3w4" * 5]
    for _ in range(40):
        n = rng.choice([4, 8, 12, 16, 20, 64, 256])
        strs.append(
            "".join(chr(rng.randint(32, 126)) for _ in range(n))
        )
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    rows = df.select("s", F.hash("s").alias("h")).collect()

    def signed32(u):
        return u - (1 << 32) if u >= (1 << 31) else u

    for r in rows:
        assert r["h"] == signed32(
            murmur3_x86_32(r["s"].encode("utf-8"), 42)
        ), r["s"]


def test_ch_fold_and_bytes_form():
    """murmurHash3_64 = XOR of x64_128's two output words (ClickHouse
    FunctionsHashing.h MurmurHash3Impl64); murmurHash3_128's
    FixedString(16) = h1 LE ++ h2 LE. Pinned as explicit
    relationships so the fold convention is auditable in one line."""
    for data in (b"", b"foo", b"0123456789abcdef", bytes(range(100))):
        h1, h2 = murmur3_x64_128(data, 0)
        assert ch_murmur3_64(data) == h1 ^ h2
        raw = murmur3_x64_128_bytes(data, 0)
        assert raw == h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
        assert len(raw) == 16


def test_dialect_binding_semantics(spark):
    """The pasted CH names reach the exact implementation at seed 0:
    strings hash UTF-8 bytes, integer columns their width-matched LE
    bytes, floats raise, bare integer literals gate (the xxHash
    literal-width rule), and murmurHash3_128 surfaces CH's
    FixedString(16) as BINARY whose hex() is the CH rendering."""
    import struct

    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT murmurHash3_32('foo') AS m32s, "
        "murmurHash3_64('foo') AS m64s, "
        "hex(murmurHash3_128('foo')) AS m128s, "
        "murmurHash3_32(CAST(42 AS BIGINT)) AS m32i, "
        "murmurHash3_64(CAST(-7 AS INT)) AS m64i"
    )).collect()[0]
    assert r["m32s"] == murmur3_x86_32(b"foo", 0)
    signed = lambda u: u - (1 << 64) if u >= (1 << 63) else u  # noqa: E731
    assert r["m64s"] == signed(ch_murmur3_64(b"foo"))
    assert r["m128s"] == murmur3_x64_128_bytes(b"foo", 0).hex().upper()
    assert r["m32i"] == murmur3_x86_32(struct.pack("<q", 42), 0)
    assert r["m64i"] == signed(ch_murmur3_64(struct.pack("<i", -7)))
    for bad in ("murmurHash3_32(42)", "murmurHash3_64(-7)",
                "murmurHash3_128(0)"):
        with pytest.raises(ValueError, match="NARROWEST"):
            translate(f"SELECT {bad}")
    # float columns raise inside the UDF (ambiguous byte form)
    spark.createDataFrame([(1.5,)], "x double") \
        .createOrReplaceTempView("mm_float_in")
    with pytest.raises(Exception, match="float|ambiguous"):
        spark.sql(translate(
            "SELECT murmurHash3_32(x) FROM mm_float_in"
        )).collect()
