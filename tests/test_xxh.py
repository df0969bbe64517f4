"""XXH64/XXH32 exactness laws (functions/xxh.py — lifts the r7 audit's
xxHash64 seed-trap gate with an exact implementation).

Verification strategy (no xxhash lib in the container):

1. canonical empty-input vectors from the published spec;
2. the DECISIVE cross-check: Spark's builtin ``xxhash64`` IS XXH64 at
   seed 42 — over random strings of every length class (0..100 bytes:
   covers the 32-byte stripe loop, the 8/4/1-byte tails and UTF-8
   multibyte sequences) and random int64s (Spark hashes LongType as 8
   little-endian bytes, CH's form for UInt64/Int64 columns), our
   ``xxh64(..., seed=42)`` must agree bit-for-bit. The seed enters
   ONLY the accumulator init, so the machinery verified at seed 42 is
   the machinery the dialect runs at CH's seed 0.
"""

from __future__ import annotations

import random
import struct

from clickhouse_learning_spark.functions.xxh import (
    xxh32,
    xxh64,
    xxh64_int64_le,
)


def test_known_vectors():
    # published spec vectors (xxHash reference repository)
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh32(b"", 0) == 0x02CC5D05


def test_seed_only_enters_init():
    # different seeds give different digests over identical machinery
    data = b"the quick brown fox jumps over the lazy dog" * 3
    assert xxh64(data, 0) != xxh64(data, 42)
    assert xxh32(data, 0) != xxh32(data, 7)
    # determinism
    assert xxh64(data, 0) == xxh64(data, 0)


def _rand_strings(n=300):
    r = random.Random(0xC0FFEE)
    alpha = "abcdefgh 0123456789_ éß日本語🙂"
    out = []
    for i in range(n):
        ln = i % 101  # every length 0..100, multiple passes
        out.append("".join(r.choice(alpha) for _ in range(ln)))
    return out


def test_xxh64_matches_spark_builtin_on_strings(spark):
    """xxh64(utf8, seed=42) == Spark xxhash64(string) — bit-for-bit."""
    strs = _rand_strings()
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.selectExpr("s", "xxhash64(s) AS h").collect()
    }
    for s in strs:
        u = xxh64(s.encode("utf-8"), 42)
        signed = u - (1 << 64) if u >= (1 << 63) else u
        assert signed == got[s], f"mismatch on {s!r} (len {len(s)})"


def test_xxh64_matches_spark_builtin_on_int64(spark):
    r = random.Random(1234)
    vals = [0, 1, -1, 2**63 - 1, -(2**63)] + [
        r.randint(-(2**63), 2**63 - 1) for _ in range(100)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r_["v"]: r_["h"]
        for r_ in df.selectExpr("v", "xxhash64(v) AS h").collect()
    }
    for v in vals:
        u = xxh64_int64_le(v, 42)
        signed = u - (1 << 64) if u >= (1 << 63) else u
        assert signed == got[v], f"mismatch on {v}"


def test_dialect_binding(spark):
    """xxHash64/xxHash32 translate to the seed-0 UDFs; strings and
    integer widths hash CH's byte forms; the remaining hash families
    stay gated."""
    import pytest

    from clickhouse_learning_spark.functions.dialect import translate

    row = spark.sql(translate(
        "SELECT xxHash64('') AS e64, xxHash32('') AS e32, "
        "xxHash64('foo') AS s64, "
        "xxHash64(CAST(7 AS BIGINT)) AS i64"
    )).collect()[0]
    # seed-0 canonical vectors through the full SQL path
    signed_empty = 0xEF46DB3751D8E999 - (1 << 64)
    assert row["e64"] == signed_empty
    assert row["e32"] == 0x02CC5D05
    u = xxh64(b"foo", 0)
    assert row["s64"] == (u - (1 << 64) if u >= (1 << 63) else u)
    u = xxh64(struct.pack("<q", 7), 0)
    assert row["i64"] == (u - (1 << 64) if u >= (1 << 63) else u)
    # NULL hashes to NULL
    nrow = spark.sql(translate(
        "SELECT xxHash64(CAST(NULL AS STRING)) AS n"
    )).collect()[0]
    assert nrow["n"] is None
    # the unpinned families still gate
    with pytest.raises(ValueError, match="hash family"):
        translate("SELECT cityHash64('x')")
    with pytest.raises(ValueError, match="hash family"):
        translate("SELECT xxHash3('x')")
