"""ClickHouse Native-format source/sink (sources/native.py):
hand-built golden byte blocks pin the columnar layout independently of
the writer (counts, per-column name/type/data interleave, null masks,
cumulative Array/Map offsets, Tuple element columns), roundtrips cover
the codec surface incl. multi-block files, and the LowCardinality gate
plus schema-drift errors are asserted."""

from __future__ import annotations

import datetime as dt
import struct

import pytest

from clickhouse_learning_spark.sources import native as NV


def _s(x: str) -> bytes:
    b = x.encode()
    return bytes([len(b)]) + b


def test_golden_block_scalar_and_string():
    buf = (
        bytes([2, 3])  # 2 cols, 3 rows
        + _s("c1") + _s("Int32") + struct.pack("<3i", 1, 2, 3)
        + _s("c2") + _s("String") + b"\x01a\x02bb\x00"
    )
    names, types, rows = NV.parse_native(buf)
    assert names == ["c1", "c2"] and types == ["Int32", "String"]
    assert rows == [(1, "a"), (2, "bb"), (3, "")]
    # writer reproduces the identical bytes (same block framing)
    col1 = NV._NativeCol("Int32")
    col2 = NV._NativeCol("String")
    rebuilt = (
        bytes([2, 3])
        + _s("c1") + _s("Int32") + col1.encode_column([1, 2, 3])
        + _s("c2") + _s("String") + col2.encode_column(["a", "bb", ""])
    )
    assert rebuilt == buf


def test_golden_nullable_mask_first():
    buf = (
        bytes([1, 3])
        + _s("v") + _s("Nullable(Int8)")
        + b"\x00\x01\x00"  # null mask
        + b"\x05\x00\xff"  # values (default under the mask)
    )
    _, _, rows = NV.parse_native(buf)
    assert [r[0] for r in rows] == [5, None, -1]
    assert NV._NativeCol("Nullable(Int8)").encode_column(
        [5, None, -1]
    ) == b"\x00\x01\x00\x05\x00\xff"


def test_golden_array_cumulative_offsets():
    buf = (
        bytes([1, 3])
        + _s("a") + _s("Array(Int8)")
        + struct.pack("<3Q", 2, 2, 3)  # CUMULATIVE offsets
        + b"\x01\x02\x03"
    )
    _, _, rows = NV.parse_native(buf)
    assert [list(r[0]) for r in rows] == [[1, 2], [], [3]]


def test_roundtrip_type_matrix():
    cases = {
        "Int64": [0, -5, 2**62],
        "UInt64": [0, 1, -1, -2**63],  # wrapped negatives
        "Float64": [1.5, -2.25, 0.0],
        "String": ["", "héllo", "x" * 300],
        "FixedString(4)": ["ab", "abcd", ""],
        "Date": [dt.date(1970, 1, 1), dt.date(2024, 5, 6)],
        "DateTime64(3)": [
            dt.datetime(1969, 12, 31, 23, 59, 59, 500000),
            dt.datetime(2024, 1, 1, 12, 0, 0, 250000),
        ],
        "Nullable(String)": ["a", None, ""],
        "Nullable(Float64)": [None, 3.5, None],
        "Array(Int32)": [[1, 2, 3], [], [-9]],
        "Array(Nullable(Int8))": [[1, None], [], [None, None, 3]],
        "Array(Array(Int8))": [[[1], [2, 3]], [], [[]]],
        "Map(String, Int64)": [{"a": 1, "b": 2}, {}, {"z": -1}],
        "Tuple(Int64, String)": [(1, "x"), (2, ""), (-3, "yz")],
        "Enum8('a' = 1, 'b' = 2)": ["a", "b", "a"],
        "IPv4": ["1.2.3.4", "0.0.0.0", "255.255.255.255"],
        "UUID": ["0f8fad5b-d9cb-469f-a165-70867728950e"],
    }
    for t, vals in cases.items():
        c = NV._NativeCol(t)
        enc = c.encode_column(vals)
        got, pos = c.decode_column(enc, 0, len(vals))
        assert pos == len(enc), t
        norm = [list(v) if isinstance(v, (list, tuple)) and
                not isinstance(v, str) else v for v in vals]
        gotn = [list(v) if isinstance(v, (list, tuple)) and
                not isinstance(v, str) else v for v in got]
        if t == "UInt64":
            pass  # wrapped two's-complement both ways
        if t.startswith("Tuple"):
            norm = [list(v) for v in vals]
        if t == "FixedString(4)":
            norm = ["ab", "abcd", ""]  # zero-pad strips on decode
        assert gotn == norm, (t, got, vals)


def test_multiblock_and_schema_drift():
    c = NV._NativeCol("Int64")
    b1 = bytes([1, 2]) + _s("v") + _s("Int64") + c.encode_column([1, 2])
    b2 = bytes([1, 1]) + _s("v") + _s("Int64") + c.encode_column([3])
    _, _, rows = NV.parse_native(b1 + b2)
    assert [r[0] for r in rows] == [1, 2, 3]
    drift = bytes([1, 1]) + _s("w") + _s("Int64") + c.encode_column([9])
    with pytest.raises(ValueError, match="schema"):
        NV.parse_native(b1 + drift)


def test_lowcardinality_gate():
    with pytest.raises(ValueError, match="LowCardinality"):
        NV._NativeCol("LowCardinality(String)")


def test_truncated_stream_raises():
    c = NV._NativeCol("Int64")
    good = bytes([1, 2]) + _s("v") + _s("Int64") + c.encode_column([1, 2])
    with pytest.raises(Exception):
        NV.parse_native(good[:-3])


def test_spark_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("x"),
        F.when(F.col("id") % 3 == 0, F.col("id").cast("string"))
        .alias("s"),
        F.array((F.col("id") % 5).cast("int"),
                (F.col("id") % 11).cast("int")).alias("a"),
    )
    out = str(tmp_path / "native_rt")
    n = NV.write_native(df.repartition(4), out,
                        ["Int64", "Float64", "Nullable(String)",
                         "Array(Int32)"], block_rows=100)
    assert n == 4
    back = NV.read_native(spark, out)
    assert back.schema.simpleString() == (
        "struct<k:bigint,x:double,s:string,a:array<int>>"
    )
    a = sorted(tuple(r) if r[2] is not None else (r[0], r[1], None, r[3])
               for r in df.collect())
    b = sorted(tuple(r) if r[2] is not None else (r[0], r[1], None, r[3])
               for r in back.collect())
    assert a == b


def test_block_spans_cover_stream():
    """The skip walk's spans tile the file exactly and each span start
    is a decodable block boundary (block framing repeats names/types,
    so any span grouping is an independent stream)."""
    import pandas as pd  # noqa: F401

    cols = {
        "k": ("Int64", list(range(50))),
        "s": ("Nullable(String)",
              [None if i % 4 == 0 else f"v{i}" for i in range(50)]),
        "a": ("Array(Int64)", [[i, i + 1] for i in range(50)]),
        "m": ("Map(String, Int64)", [{"x": i} for i in range(50)]),
    }
    blocks = []
    for lo in range(0, 50, 10):  # 5 blocks of 10 rows
        chunk = NV._write_leb128(len(cols)) + NV._write_leb128(10)
        for name, (tp, vals) in cols.items():
            chunk += (NV._write_string(name) + NV._write_string(tp)
                      + NV._NativeCol(tp).encode_column(vals[lo:lo + 10]))
        blocks.append(chunk)
    buf = b"".join(blocks)
    spans = list(NV._block_spans(buf))
    assert spans[0][0] == 0 and spans[-1][1] == len(buf)
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    assert len(spans) == 5
    # every span start parses as its own stream
    for s, e in spans:
        _, _, rows = NV.parse_native(buf[s:e])
        assert len(rows) == 10
    with pytest.raises(ValueError, match="overruns|truncated|ended"):
        list(NV._block_spans(buf[:-3]))


def test_read_native_split_parity(spark, tmp_path):
    """read_native_split == read_native row-for-row, with chunk_bytes
    small enough to force many chunks per file (the few-huge-exports
    layout the split reader exists for), across the composite types."""
    from pyspark.sql import functions as F

    df = spark.range(3000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("x"),
        F.when(F.col("id") % 3 == 0, F.col("id").cast("string"))
        .alias("s"),
        F.array((F.col("id") % 5).cast("int"),
                (F.col("id") % 11).cast("int")).alias("a"),
    )
    out = str(tmp_path / "native_split")
    NV.write_native(df.repartition(2), out,
                    ["Int64", "Float64", "Nullable(String)",
                     "Array(Int32)"], block_rows=100)

    def key(t):
        return tuple((x is None, str(x)) for x in t)

    base = sorted((tuple(r) for r in
                   NV.read_native(spark, out).collect()), key=key)
    split_df = NV.read_native_split(spark, out, chunk_bytes=4096)
    assert split_df.schema == NV.read_native(spark, out).schema
    split = sorted((tuple(r) for r in split_df.collect()), key=key)
    assert base == split
    assert len(base) == 3000
