"""RowBinary source/sink (sources/rowbinary.py): hand-built golden
byte streams pin the format independently of the writer; roundtrips
cover every supported type; the Spark reader distributes per file."""

from __future__ import annotations

import datetime as dt
import os
import struct

import pytest

from clickhouse_learning_spark.sources import rowbinary as RB


def _s(x: str) -> bytes:  # LEB128 String
    b = x.encode()
    return bytes([len(b)]) + b


def test_golden_bytes_with_names_and_types():
    """A two-column stream written BY HAND from the spec (not via the
    encoder): UInt32 id + String name, WithNamesAndTypes header."""
    buf = (
        bytes([2])                       # column count
        + _s("id") + _s("name")          # names
        + _s("UInt32") + _s("String")    # types
        + struct.pack("<I", 7) + _s("alpha")
        + struct.pack("<I", 4294967295) + _s("")
    )
    names, types, rows = RB.parse_rowbinary(buf)
    assert names == ["id", "name"] and types == ["UInt32", "String"]
    assert rows == [(7, "alpha"), (4294967295, "")]


def test_golden_bytes_nullable_array_dates_enum():
    buf = (
        # Nullable(Int64): NULL then -5
        b"\x01" + b"\x00" + struct.pack("<q", -5)
        # Array(UInt16): [1, 300]
        + bytes([2]) + struct.pack("<H", 1) + struct.pack("<H", 300)
        # Date: 2020-01-01 = 18262 days
        + struct.pack("<H", 18262)
        # DateTime: 2020-01-01 00:00:05 UTC
        + struct.pack("<I", 1577836805)
        # DateTime64(3): same second + 250 ms
        + struct.pack("<q", 1577836805250)
        # Enum8('a'=1,'b'=2): b
        + struct.pack("<b", 2)
        # FixedString(4): 'ab' zero-padded
        + b"ab\x00\x00"
    )
    types = ["Nullable(Int64)", "Nullable(Int64)", "Array(UInt16)",
             "Date", "DateTime", "DateTime64(3)",
             "Enum8('a' = 1, 'b' = 2)", "FixedString(4)"]
    _, _, rows = RB.parse_rowbinary(buf, types)
    (row,) = rows
    assert row[0] is None and row[1] == -5
    assert row[2] == [1, 300]
    assert row[3] == dt.date(2020, 1, 1)
    assert row[4] == dt.datetime(2020, 1, 1, 0, 0, 5)
    assert row[5] == dt.datetime(2020, 1, 1, 0, 0, 5, 250000)
    assert row[6] == "b" and row[7] == "ab"


def test_varint_lengths_and_uint64_wrap():
    long_str = "x" * 300  # forces a 2-byte LEB128 length
    enc = RB._TypeCodec("String").encode(long_str)
    assert enc[:2] == bytes([0xAC, 0x02])  # 300 = 0x12C
    v, pos = RB._TypeCodec("String").decode(enc, 0)
    assert v == long_str and pos == len(enc)
    # UInt64 top half wraps to negative LongType (repo convention)
    c = RB._TypeCodec("UInt64")
    raw = struct.pack("<Q", (1 << 64) - 2)
    v, _ = c.decode(raw, 0)
    assert v == -2
    assert c.encode(-2) == raw


def test_unsupported_types_gate():
    for t in ("Decimal(76, 2)",
              "AggregateFunction(sum, UInt64)", "Int128"):
        with pytest.raises(ValueError,
                           match="not supported|38-digit"):
            RB._TypeCodec(t)
    with pytest.raises(ValueError, match="mid-row"):
        RB.parse_rowbinary(struct.pack("<H", 1)[:1], ["UInt16"])


def test_low_cardinality_unwraps():
    c = RB._TypeCodec("LowCardinality(Nullable(String))")
    assert c.nullable and c.kind == "String"
    assert c.decode(c.encode(None), 0)[0] is None
    assert c.decode(c.encode("hi"), 0)[0] == "hi"


def test_spark_roundtrip(spark, tmp_path):
    types = ["Int64", "Nullable(String)", "Float64", "Date",
             "Array(Int32)", "LowCardinality(String)"]
    rows = [
        (1, "a", 1.5, dt.date(2021, 3, 4), [1, 2], "x"),
        (2, None, -0.25, dt.date(1999, 12, 31), [], "y"),
        (3, "c", 0.0, dt.date(1970, 1, 1), [7], "x"),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, s string, f double, d date, a array<int>, lc string",
    ).repartition(2)
    out = str(tmp_path / "rb")
    nfiles = RB.write_rowbinary(df, out, types)
    assert 1 <= nfiles <= 2
    back = RB.read_rowbinary(spark, out)
    assert back.columns == ["id", "s", "f", "d", "a", "lc"]
    got = sorted((tuple(r) for r in back.collect()))
    assert [tuple(x) for x in got] == sorted(
        (a, b, c, d, tuple(e) if False else e, f)
        for a, b, c, d, e, f in rows
    )


def test_headerless_read(spark, tmp_path):
    types = ["UInt8", "String"]
    df = spark.createDataFrame([(1, "u"), (2, "v")], "k int, s string")
    out = str(tmp_path / "rb2")
    RB.write_rowbinary(df.coalesce(1), out, types, with_header=False)
    back = RB.read_rowbinary(spark, out, ch_types=types,
                             names=["k", "s"])
    assert sorted(tuple(r) for r in back.collect()) == \
        [(1, "u"), (2, "v")]
    with pytest.raises(ValueError, match="both names and ch_types"):
        RB.read_rowbinary(spark, out, ch_types=types)


def test_property_roundtrip_fuzz():
    """Hypothesis-style seeded fuzz (plain random — keeps the suite
    deterministic): every supported codec round-trips arbitrary
    values, including type-boundary integers."""
    import datetime as dt
    import random

    rng = random.Random(20260815)
    cases = {
        "UInt8": lambda: rng.randint(0, 255),
        "Int8": lambda: rng.randint(-128, 127),
        "UInt16": lambda: rng.randint(0, 65535),
        "Int16": lambda: rng.randint(-32768, 32767),
        "UInt32": lambda: rng.randint(0, 2**32 - 1),
        "Int32": lambda: rng.randint(-2**31, 2**31 - 1),
        "Int64": lambda: rng.randint(-2**63, 2**63 - 1),
        "Float64": lambda: rng.uniform(-1e12, 1e12),
        "String": lambda: "".join(
            rng.choice("abc ABC 123 é中") for _ in
            range(rng.randint(0, 50))),
        "Date": lambda: dt.date(1970, 1, 1) + dt.timedelta(
            days=rng.randint(0, 40000)),
        "DateTime": lambda: dt.datetime(1970, 1, 1) + dt.timedelta(
            seconds=rng.randint(0, 2**31)),
        "DateTime64(6)": lambda: dt.datetime(1970, 1, 1) + dt.timedelta(
            seconds=rng.randint(0, 2**31),
            microseconds=rng.randint(0, 999999)),
        "Array(Int32)": lambda: [rng.randint(-1000, 1000) for _ in
                                 range(rng.randint(0, 20))],
        "Nullable(Float32)": lambda: None if rng.random() < 0.3
        else round(rng.uniform(-100, 100), 2),
    }
    for t, gen in cases.items():
        c = RB._TypeCodec(t)
        for _ in range(60):
            v = gen()
            enc = c.encode(v)
            got, pos = c.decode(enc, 0)
            assert pos == len(enc), (t, v)
            if t == "Nullable(Float32)" and v is not None:
                assert got == pytest.approx(v, rel=1e-6), (t, v)
            else:
                assert got == v, (t, v, got)
    # boundary values explicitly
    for t, vals in {
        "UInt64": [0, 1, 2**63 - 1, -1, -2**63],  # wrapped negatives
        "Int64": [-2**63, 2**63 - 1, 0],
        "UInt8": [0, 255],
    }.items():
        c = RB._TypeCodec(t)
        for v in vals:
            got, _ = c.decode(c.encode(v), 0)
            assert got == v, (t, v, got)


def test_datetime64_pre_epoch_roundtrip():
    """ADVICE r5 regression: int(ts.timestamp())*scale truncates toward
    zero, so pre-epoch sub-second values encoded the fractional part
    with the wrong sign (1969-12-31 23:59:59.5 → +0.5s ticks) and broke
    the decode roundtrip. Encode now floors total integer microseconds;
    divmod on decode already floored."""
    import datetime as dt

    for scale_t, vals in {
        "DateTime64(3)": [
            dt.datetime(1969, 12, 31, 23, 59, 59, 500000),
            dt.datetime(1969, 12, 31, 23, 59, 59, 1000),
            dt.datetime(1969, 6, 1, 12, 0, 0, 250000),
            dt.datetime(1970, 1, 1, 0, 0, 0, 500000),  # post-epoch ctrl
        ],
        "DateTime64(6)": [
            dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
            dt.datetime(1900, 1, 1, 0, 0, 0, 123456),
        ],
    }.items():
        c = RB._TypeCodec(scale_t)
        for v in vals:
            got, pos = c.decode(c.encode(v), 0)
            assert got == v, (scale_t, v, got)
    # the exact ADVICE vector: -0.5 s must encode as -500 ms ticks
    import struct as _s

    (ticks,) = _s.unpack(
        "<q",
        RB._TypeCodec("DateTime64(3)").encode(
            dt.datetime(1969, 12, 31, 23, 59, 59, 500000)
        ),
    )
    assert ticks == -500


def test_decimal_codecs(spark, tmp_path):
    """Decimal(P,S) = scaled little-endian integer, 4/8/16 bytes by
    precision; golden bytes hand-packed; Spark roundtrip keeps exact
    DecimalType values; Decimal256 gates."""
    from decimal import Decimal as D

    c32 = RB._TypeCodec("Decimal(9, 2)")
    assert c32.dec_width == 4
    # 123.45 -> raw 12345 LE
    assert c32.encode(D("123.45")) == struct.pack("<i", 12345)
    assert c32.decode(struct.pack("<i", -12345), 0)[0] == D("-123.45")
    c64 = RB._TypeCodec("Decimal64(4)")
    assert c64.dec_width == 8 and c64.dec_prec == 18
    assert c64.decode(struct.pack("<q", 31415926), 0)[0] == \
        D("3141.5926")
    c128 = RB._TypeCodec("Decimal(38, 10)")
    big = D("12345678901234567890.0123456789")
    enc = c128.encode(big)
    assert len(enc) == 16 and c128.decode(enc, 0)[0] == big
    with pytest.raises(ValueError, match="38-digit"):
        RB._TypeCodec("Decimal(76, 2)")

    df = spark.createDataFrame(
        [(1, D("10.25")), (2, D("-0.01")), (3, None)],
        "id long, amt decimal(12,2)",
    )
    out = str(tmp_path / "rbdec")
    RB.write_rowbinary(df.coalesce(1), out,
                       ["Int64", "Nullable(Decimal(12, 2))"])
    back = {r.id: r.amt for r in RB.read_rowbinary(spark, out).collect()}
    assert back == {1: D("10.25"), 2: D("-0.01"), 3: None}


def test_uuid_codec_golden_bytes():
    """CH serializes UUID as two little-endian UInt64 words, high
    half first (the public clickhouse-driver layout): canonical
    00112233-4455-6677-8899-aabbccddeeff pins the byte order."""
    c = RB._TypeCodec("UUID")
    canon = "00112233-4455-6677-8899-aabbccddeeff"
    golden = bytes([0x77, 0x66, 0x55, 0x44, 0x33, 0x22, 0x11, 0x00,
                    0xFF, 0xEE, 0xDD, 0xCC, 0xBB, 0xAA, 0x99, 0x88])
    assert c.encode(canon) == golden
    v, pos = c.decode(golden, 0)
    assert v == canon and pos == 16
    # roundtrip a few arbitrary uuids
    import uuid as _u
    for i in range(5):
        u = str(_u.uuid5(_u.NAMESPACE_DNS, f"probe{i}"))
        assert c.decode(c.encode(u), 0)[0] == u


def test_map_tuple_ip_codecs(spark, tmp_path):
    """Map = LEB128 count + pairs, Tuple = element sequence, IPv6 =
    16 network-order bytes, IPv4 = LE UInt32 — golden bytes by hand,
    nested forms, and a Spark roundtrip with map/struct columns."""
    c = RB._TypeCodec("Map(String, UInt8)")
    golden = bytes([1]) + _s("k") + bytes([7])
    assert c.encode({"k": 7}) == golden
    assert c.decode(golden, 0)[0] == {"k": 7}
    t = RB._TypeCodec("Tuple(UInt16, String)")
    assert t.encode((300, "ab")) == struct.pack("<H", 300) + _s("ab")
    i6 = RB._TypeCodec("IPv6")
    assert i6.encode("::1") == b"\x00" * 15 + b"\x01"
    i4 = RB._TypeCodec("IPv4")
    assert i4.encode("1.2.3.4") == bytes([4, 3, 2, 1])  # LE UInt32
    nested = RB._TypeCodec("Map(String, Array(Nullable(Int32)))")
    v = {"a": [1, None, 3]}
    assert nested.decode(nested.encode(v), 0)[0] == v

    df = spark.createDataFrame(
        [(1, {"x": 2}, (7, "s"), "10.0.0.1")],
        "id long, m map<string,int>, t struct<col1:int,col2:string>, "
        "ip string",
    )
    out = str(tmp_path / "rbmt")
    RB.write_rowbinary(df.coalesce(1), out,
                       ["Int64", "Map(String, Int32)",
                        "Tuple(Int32, String)", "IPv4"])
    back = RB.read_rowbinary(spark, out).collect()[0]
    assert back.id == 1 and dict(back.m) == {"x": 2}
    assert (back.t.col1, back.t.col2) == (7, "s")
    assert back.ip == "10.0.0.1"


def test_corruption_fuzz_no_hangs():
    """Seeded corruption sweep over every binary walker in the repo:
    truncations, bit flips, and crafted huge LEB128 counts must
    either parse or raise promptly — never hang or loop."""
    import random

    from clickhouse_learning_spark.operators import mkv as K
    from clickhouse_learning_spark.operators import mp3 as M3
    from clickhouse_learning_spark.operators import mp4 as M4
    from clickhouse_learning_spark.sources import warc as W

    rng = random.Random(20260815)
    fixtures = [
        (lambda b: RB.parse_rowbinary(b),
         RB._TypeCodec("Array(Int32)").encode([1, 2, 3])
         + b""),  # headerless garbage for the header parser
        (lambda b: RB.parse_rowbinary(b, ["Array(Int32)", "String"]),
         RB._TypeCodec("Array(Int32)").encode([1, 2])
         + RB._TypeCodec("String").encode("xy")),
        (M4.parse_mp4_meta, M4.build_fixture_mp4(7)),
        (K.parse_mkv_meta, K.build_fixture_mkv(7)),
        (M3.parse_mp3_meta, M3.build_fixture_mp3(7)),
        (W.parse_warc, W.build_fixture_warc(7, gzipped=False)),
    ]
    for parse, good in fixtures:
        for _ in range(120):
            mode = rng.random()
            b = bytearray(good)
            if mode < 0.4 and len(b) > 2:        # truncate
                b = b[:rng.randrange(1, len(b))]
            elif mode < 0.8:                      # flip bytes
                for _ in range(rng.randrange(1, 4)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:                                 # splice huge varint
                pos = rng.randrange(len(b))
                b[pos:pos] = b"\xff\xff\xff\xff\xff\xff\xff\xff\x7f"
            try:
                parse(bytes(b))
            except Exception:
                pass  # prompt failure is the contract
    # crafted Array count = 2^60 must raise, not loop
    import struct as _st
    evil = b"\xff\xff\xff\xff\xff\xff\xff\xff\x0f" + _st.pack("<i", 1)
    with pytest.raises(ValueError, match="exceeds remaining"):
        RB._TypeCodec("Array(Int32)").decode(evil, 0)
