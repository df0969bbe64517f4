"""Avro OCF source/sink laws (sources/avro.py — CH FORMAT Avro).

The spec's own worked examples pin the wire encoding (no avro library
ships in this container, so the independent second implementation is a
minimal test-side decoder plus a hand-assembled container file)."""

from __future__ import annotations

import datetime as dt
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.sources import avro as AV


def test_zigzag_spec_vectors():
    """Avro spec 'Binary Encoding' table: 0→00, -1→01, 1→02, -2→03,
    2→04, -64→7f, 64→80 01; plus the string example 'foo' →
    06 66 6f 6f."""
    vec = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
           2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    for n, b in vec.items():
        assert AV.zigzag_encode(n) == b, n
        assert AV.zigzag_decode(b, 0) == (n, len(b)), n
    assert AV._wstr("foo") == b"\x06foo"
    # 64-bit extremes roundtrip
    for n in (2**63 - 1, -(2**63), 12345678901234, -987654321098):
        got, pos = AV.zigzag_decode(AV.zigzag_encode(n), 0)
        assert got == n


def test_hand_assembled_container_decodes():
    """A container file built BYTE BY BYTE from the spec rules (magic,
    metadata map, sync, one deflate block of two records) — the
    reader must decode it; this pins the container framing
    independently of the writer."""
    schema = (b'{"type":"record","name":"r","fields":'
              b'[{"name":"k","type":"long"},'
              b'{"name":"s","type":["null","string"]}]}')
    sync = bytes(range(16))
    hdr = bytearray(b"Obj\x01")
    hdr += AV.zigzag_encode(2)
    hdr += AV.zigzag_encode(11) + b"avro.schema"
    hdr += AV.zigzag_encode(len(schema)) + schema
    hdr += AV.zigzag_encode(10) + b"avro.codec"
    hdr += AV.zigzag_encode(7) + b"deflate"
    hdr += AV.zigzag_encode(0)
    hdr += sync
    # two records: (7, "hi"), (-3, null)
    payload = (AV.zigzag_encode(7) + AV.zigzag_encode(1)
               + AV.zigzag_encode(2) + b"hi"
               + AV.zigzag_encode(-3) + AV.zigzag_encode(0))
    comp = zlib.compress(payload, 6)[2:-4]
    blob = (bytes(hdr) + AV.zigzag_encode(2)
            + AV.zigzag_encode(len(comp)) + comp + sync)
    sch, codec, got_sync, _ = AV.parse_header(blob)
    assert codec == "deflate" and got_sync == sync
    spans = list(AV.block_spans(blob))
    assert len(spans) == 1 and spans[0][0] == 2
    cnt, _, s, e = spans[0]
    rows = AV._decode_block(blob[s:e], codec, cnt, AV._decoder(sch))
    assert rows == [(7, "hi"), (-3, None)]


def _mk(spark):
    return spark.range(2500).select(
        F.col("id").alias("k"),
        (F.col("id") % 9).cast("double").alias("x"),
        F.when(F.col("id") % 3 == 0, F.concat(F.lit("héllo\n"),
               F.col("id").cast("string"))).alias("s"),
        (F.col("id") % 2 == 0).alias("b"),
        F.date_add(F.lit("1969-11-01").cast("date"),
                   (F.col("id") % 900).cast("int")).alias("d"),  # pre-epoch too
        F.timestamp_micros(F.col("id") * 1_000_003 - F.lit(10**9)).alias("ts"),
        F.array((F.col("id") % 5).cast("int"),
                (F.col("id") % 11).cast("int")).alias("a"),
        F.create_map(F.lit("n"), F.col("id") % 7).alias("m"),
        F.struct(F.col("id").alias("u"),
                 (F.col("id") % 4).cast("string").alias("v")).alias("st"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("raw"),
    )


def _key(t):
    return tuple((x is None, str(x)) for x in t)


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_spark_roundtrip_type_matrix(spark, tmp_path, codec):
    df = _mk(spark)
    out = str(tmp_path / codec)
    n = AV.write_avro(df.repartition(3), out, codec=codec,
                      block_rows=200)
    assert n == 3
    back = AV.read_avro(spark, out)
    assert back.schema == df.schema
    a = sorted((tuple(r) for r in df.collect()), key=_key)
    b = sorted((tuple(r) for r in back.collect()), key=_key)
    assert a == b


def test_split_parity(spark, tmp_path):
    df = _mk(spark)
    out = str(tmp_path / "split")
    AV.write_avro(df.repartition(2), out, block_rows=100)
    base = sorted((tuple(r) for r in
                   AV.read_avro(spark, out).collect()), key=_key)
    split = sorted((tuple(r) for r in AV.read_avro_split(
        spark, out, rows_per_chunk=300).collect()), key=_key)
    assert base == split and len(base) == 2500


def test_unsupported_gates(spark):
    dec = spark.range(1).select(
        F.col("id").cast("decimal(10,2)").alias("d"))
    with pytest.raises(ValueError, match="binary paths"):
        AV.schema_to_avro_json(dec.schema)
    intmap = spark.range(1).select(
        F.create_map(F.col("id"), F.col("id")).alias("m"))
    with pytest.raises(ValueError, match="STRING"):
        AV.schema_to_avro_json(intmap.schema)


def test_corrupt_gates():
    with pytest.raises(ValueError, match="not an Avro"):
        AV.parse_header(b"PAR1xxxx")


def test_timestamp_micros_is_utc_relative():
    """ADVICE r7: the spec's timestamp-micros is a UTC instant. The
    encoder must emit true-UTC micros for aware datetimes of ANY zone
    and for the naive OS-local values df.rdd hands the writer; the
    decoder returns aware-UTC so downstream re-interpretation cannot
    shift the instant under a non-UTC session timezone."""
    import datetime as dt

    from clickhouse_learning_spark.sources import avro as AV

    sch = {"type": "long", "logicalType": "timestamp-micros"}
    enc, dec = AV._encoder(sch), AV._decoder(sch)
    tz5 = dt.timezone(dt.timedelta(hours=5))
    aware = dt.datetime(2001, 2, 3, 4, 5, 6, 789, tzinfo=tz5)
    micros, _ = AV.zigzag_decode(enc(aware), 0)
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    assert micros == (aware - epoch) // dt.timedelta(microseconds=1)
    # UTC+5 wall time 04:05 is 23:05 the previous UTC day
    assert micros == int(
        dt.datetime(2001, 2, 2, 23, 5, 6, tzinfo=dt.timezone.utc)
        .timestamp()
    ) * 10**6 + 789
    back, _ = dec(enc(aware), 0)
    assert back.tzinfo == dt.timezone.utc and back == aware
    # naive input = OS-local wall time (TimestampType.fromInternal)
    naive = dt.datetime(2001, 2, 3, 4, 5, 6, 789)
    back2, _ = dec(enc(naive), 0)
    assert back2 == naive.astimezone().astimezone(dt.timezone.utc)


def test_vec_encode_byte_parity():
    """Optimization r10: the vectorized flat-record encoder
    (sources/avro_vec.py) must be BYTE-IDENTICAL to the scalar
    per-value encoder over every supported kind, ["null", T] unions,
    zigzag edge values, empty/multibyte strings and pre-epoch
    date/timestamps — plus exact per-row end offsets (the container
    writer cuts blocks on them)."""
    import numpy as np
    import pyarrow as pa

    from clickhouse_learning_spark.sources import avro_vec as V

    sch = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"},
        {"name": "i", "type": ["null", "int"]},
        {"name": "x", "type": "double"},
        {"name": "f", "type": ["null", "float"]},
        {"name": "b", "type": "boolean"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "raw", "type": "bytes"},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": ["null", {
            "type": "long", "logicalType": "timestamp-micros"}]},
    ]}
    kinds = V.field_kinds(sch)
    assert kinds is not None
    rng = np.random.default_rng(42)
    n = 500
    utc = dt.timezone.utc
    ks = [0, -1, 1, 2**63 - 1, -(2**63), 63, 64, -64, -65] + [
        int(v) for v in rng.integers(-10**15, 10**15, n - 9)]
    is_ = [None if rng.random() < 0.2 else int(v) % 2**31 - 2**30
           for v in rng.integers(0, 2**31, n)]
    xs = [0.0, -0.0, float("inf"), 1e-300] + [
        float(v) for v in rng.random(n - 4)]
    fs = [None if rng.random() < 0.3 else
          float(np.float32(v)) for v in rng.random(n)]
    bs = [bool(v % 2) for v in range(n)]
    ss = [None, "", "héllo\nwörld", "字"] + [
        None if rng.random() < 0.25 else "s" * int(v % 40)
        for v in rng.integers(0, 100, n - 4)]
    raws = [b"", b"\x00\xff"] + [
        bytes(rng.integers(0, 256, int(v % 30), dtype=np.uint8))
        for v in rng.integers(0, 100, n - 2)]
    ds = [dt.date(1969, 11, 1) + dt.timedelta(days=int(v))
          for v in rng.integers(0, 2000, n)]
    tss = [None if rng.random() < 0.2 else
           dt.datetime(1970, 1, 1, tzinfo=utc)
           + dt.timedelta(microseconds=int(v))
           for v in rng.integers(-10**12, 10**15, n)]
    batch = pa.record_batch(
        [pa.array(ks, pa.int64()), pa.array(is_, pa.int32()),
         pa.array(xs, pa.float64()), pa.array(fs, pa.float32()),
         pa.array(bs, pa.bool_()), pa.array(ss, pa.string()),
         pa.array(raws, pa.binary()), pa.array(ds, pa.date32()),
         pa.array(tss, pa.timestamp("us", tz="UTC"))],
        names=[f["name"] for f in sch["fields"]])
    pay, row_end = V.encode_batch(kinds, list(batch.columns))
    enc = AV._encoder(sch)
    want = b""
    offs = []
    for row in zip(ks, is_, xs, fs, bs, ss, raws, ds, tss):
        want += enc(dict(zip(
            [f["name"] for f in sch["fields"]], row)))
        offs.append(len(want))
    assert pay == want
    assert row_end.tolist() == offs


def test_vec_write_lane_engages_and_matches_scalar(spark, tmp_path):
    """A flat primitive schema must take the vectorized write lane
    (field_kinds != None) and produce a container the reader decodes
    to exactly what the forced-scalar writer produces — same rows,
    same block framing at the same block_rows."""
    from clickhouse_learning_spark.sources import avro_vec as V

    df = spark.range(3000).select(
        F.col("id").alias("k"),
        (F.col("id") % 9).cast("double").alias("x"),
        F.when(F.col("id") % 3 == 0,
               F.concat(F.lit("v"), F.col("id").cast("string"))
               ).alias("s"),
    )
    sch = __import__("json").loads(AV.schema_to_avro_json(df.schema))
    assert V.field_kinds(sch) is not None
    out_v = str(tmp_path / "vec")
    AV.write_avro(df.repartition(2), out_v, block_rows=700)
    real = V.field_kinds
    try:
        V.field_kinds = lambda s: None
        out_s = str(tmp_path / "scal")
        AV.write_avro(df.repartition(2), out_s, block_rows=700)
    finally:
        V.field_kinds = real
    a = sorted((tuple(r) for r in
                AV.read_avro(spark, out_v).collect()), key=_key)
    b = sorted((tuple(r) for r in
                AV.read_avro(spark, out_s).collect()), key=_key)
    assert a == b and len(a) == 3000
    # same framing: per-file block row counts match across lanes
    import glob
    def framing(d):
        counts = []
        for p in sorted(glob.glob(d + "/part-*.avro")):
            blob = open(p, "rb").read()
            counts.append([c for c, _, _, _ in AV.block_spans(blob)])
        return sorted(counts)
    assert framing(out_v) == framing(out_s)
