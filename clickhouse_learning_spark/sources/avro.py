"""Avro Object Container File source + sink (pure Python, no jars).

Avro is the remaining interchange format ClickHouse speaks natively
(``FORMAT Avro`` — CH docs list it beside Arrow/Parquet/ORC) that this
repo's export family did not cover; Spark's own reader lives in the
``spark-avro`` jar, which this container does not ship, so the codec
here is implemented from the public Avro 1.11 specification directly
(the OCF layout and the binary encoding are both in the spec's
"Object Container Files" / "Binary Encoding" sections, including the
worked varint examples the tests pin):

- header: magic ``Obj\\x01``, a metadata MAP (``avro.schema`` = the
  JSON schema, ``avro.codec`` = ``null``/``deflate``), a random
  16-byte sync marker;
- each block: row count (zigzag varint long), payload byte size
  (zigzag long), the payload (raw-DEFLATE when codec=deflate), then
  the sync marker again — which is what makes the SPLIT reader below
  possible without decoding payloads;
- values: zigzag varint ints/longs, little-endian IEEE float/double,
  length-prefixed UTF-8 strings / bytes, 1-byte booleans, unions as
  branch-index + value (nullables are ``["null", T]``), arrays/maps
  as count-prefixed blocks with a 0 terminator, records as their
  fields in order; logical types ``date`` (int days) and
  ``timestamp-micros`` (long) for Spark's DATE/TIMESTAMP.

Scale shape: one file per partition out, one file per task in;
:func:`read_avro_split` walks block headers only (count + size +
sync check — no payload decode) and fans the blocks out as range-read
chunks, the ``read_warc_split`` pattern on Avro's own framing.
Unsupported Spark types (decimal, nested maps with non-string keys)
raise with a pointer to the binary paths that carry them exactly.
"""

from __future__ import annotations

import io
import json
import os
import re
import struct
import uuid as _uuid
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
_EPOCH_D = None  # set lazily (datetime import kept out of executors' hot loop)


# ------------------------------------------------------------ primitives
def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag — ``(n << 1) ^ (n >> 63)`` on two's-complement
    longs — then base-128 varint, little-endian groups."""
    u = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    n = (u >> 1) ^ -(u & 1)
    return n, pos


def _wstr(s: str) -> bytes:
    b = s.encode("utf-8")
    return zigzag_encode(len(b)) + b


def _rbytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = zigzag_decode(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("Avro bytes length overruns the buffer")
    return buf[pos:pos + n], pos + n


# ------------------------------------------------------------ schema map
def _avro_schema(dt: T.DataType):
    import pyspark.sql.types as ST

    if isinstance(dt, ST.LongType):
        return "long"
    if isinstance(dt, ST.IntegerType):
        return "int"
    if isinstance(dt, ST.DoubleType):
        return "double"
    if isinstance(dt, ST.FloatType):
        return "float"
    if isinstance(dt, ST.StringType):
        return "string"
    if isinstance(dt, ST.BinaryType):
        return "bytes"
    if isinstance(dt, ST.BooleanType):
        return "boolean"
    if isinstance(dt, ST.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, (ST.TimestampType, ST.TimestampNTZType)):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, ST.ArrayType):
        return {"type": "array", "items": _nullable(dt.elementType, True)}
    if isinstance(dt, ST.MapType):
        if not isinstance(dt.keyType, ST.StringType):
            raise ValueError(
                "Avro maps key on STRING only; re-export non-string-"
                "keyed maps via the binary paths (sources/rowbinary.py)"
            )
        return {"type": "map", "values": _nullable(dt.valueType, True)}
    if isinstance(dt, ST.StructType):
        return {
            "type": "record",
            "name": f"r{abs(hash(tuple(f.name for f in dt.fields))) % 10**8}",
            "fields": [
                {"name": f.name,
                 "type": _nullable(f.dataType, f.nullable)}
                for f in dt.fields
            ],
        }
    raise ValueError(
        f"Spark type {dt.simpleString()} has no Avro mapping here; "
        "use the binary paths (sources/rowbinary.py, native.py) for "
        "decimals and exotic types"
    )


def _nullable(dt: T.DataType, nullable: bool):
    s = _avro_schema(dt)
    return ["null", s] if nullable else s


def schema_to_avro_json(schema: T.StructType) -> str:
    top = {
        "type": "record",
        "name": "spark_export",
        "fields": [
            {"name": f.name, "type": _nullable(f.dataType, f.nullable)}
            for f in schema.fields
        ],
    }
    return json.dumps(top)


# ------------------------------------------------------------ value codec
def _encoder(sch):
    """encode(value) -> bytes for a parsed Avro schema node."""
    import datetime as dt

    if isinstance(sch, list):  # union (only ["null", T] is emitted)
        inner = _encoder(sch[1])

        def enc_u(v):
            if v is None:
                return zigzag_encode(0)
            return zigzag_encode(1) + inner(v)

        return enc_u
    if isinstance(sch, dict):
        t = sch["type"]
        lt = sch.get("logicalType")
        if t == "int" and lt == "date":
            epoch = dt.date(1970, 1, 1)
            return lambda v: zigzag_encode((v - epoch).days)
        if t == "long" and lt == "timestamp-micros":
            # ADVICE r7: the spec says timestamp-micros is UTC-relative.
            # Values arriving from df.rdd are NAIVE datetimes that
            # TimestampType.fromInternal built with fromtimestamp() in
            # the OS-local zone — astimezone() re-attaches that same
            # zone, so subtracting the AWARE UTC epoch yields the true
            # instant whatever the host/session timezone is (the one
            # residual: the annual DST-fold hour under a non-UTC OS tz,
            # where naive local time is genuinely ambiguous).
            epoch_utc = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)

            def enc_ts(v):
                if v.tzinfo is None:
                    v = v.astimezone()
                return zigzag_encode(
                    (v - epoch_utc) // dt.timedelta(microseconds=1)
                )

            return enc_ts
        if t == "array":
            item = _encoder(sch["items"])

            def enc_a(v):
                if not len(v):
                    return zigzag_encode(0)
                return (zigzag_encode(len(v))
                        + b"".join(item(x) for x in v)
                        + zigzag_encode(0))

            return enc_a
        if t == "map":
            val = _encoder(sch["values"])

            def enc_m(v):
                items = v.items() if isinstance(v, dict) else list(v)
                items = list(items)
                if not items:
                    return zigzag_encode(0)
                return (zigzag_encode(len(items))
                        + b"".join(_wstr(k) + val(x) for k, x in items)
                        + zigzag_encode(0))

            return enc_m
        if t == "record":
            fields = [(f["name"], _encoder(f["type"]))
                      for f in sch["fields"]]

            def enc_r(v):
                get = v.__getitem__ if not isinstance(v, dict) else v.get
                return b"".join(e(get(n)) for n, e in fields)

            return enc_r
        return _encoder(t)  # {"type": "long"} plain wrapper
    return {
        "long": zigzag_encode,
        "int": zigzag_encode,
        "double": lambda v: struct.pack("<d", float(v)),
        "float": lambda v: struct.pack("<f", float(v)),
        "boolean": lambda v: b"\x01" if v else b"\x00",
        "string": _wstr,
        "bytes": lambda v: zigzag_encode(len(v)) + bytes(v),
        "null": lambda v: b"",
    }[sch]


def _decoder(sch):
    """decode(buf, pos) -> (value, pos)."""
    import datetime as dt

    if isinstance(sch, list):
        branches = [_decoder(b) for b in sch]
        nulls = {i for i, b in enumerate(sch) if b == "null"}

        def dec_u(buf, pos):
            i, pos = zigzag_decode(buf, pos)
            if i in nulls:
                return None, pos
            return branches[i](buf, pos)

        return dec_u
    if isinstance(sch, dict):
        t = sch["type"]
        lt = sch.get("logicalType")
        if t == "int" and lt == "date":
            epoch = dt.date(1970, 1, 1)

            def dec_d(buf, pos):
                n, pos = zigzag_decode(buf, pos)
                return epoch + dt.timedelta(days=n), pos

            return dec_d
        if t == "long" and lt == "timestamp-micros":
            # Decode to AWARE UTC datetimes (micros are UTC per spec;
            # ADVICE r7): pandas/Arrow then carries the true instant
            # into Spark's TimestampType under ANY session timezone,
            # where naive values would be re-interpreted as session-
            # local wall time.
            epoch_utc = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)

            def dec_ts(buf, pos):
                n, pos = zigzag_decode(buf, pos)
                return epoch_utc + dt.timedelta(microseconds=n), pos

            return dec_ts
        if t == "array":
            item = _decoder(sch["items"])

            def dec_a(buf, pos):
                out = []
                while True:
                    n, pos = zigzag_decode(buf, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:  # block with byte size (spec-legal)
                        _, pos = zigzag_decode(buf, pos)
                        n = -n
                    for _ in range(n):
                        v, pos = item(buf, pos)
                        out.append(v)

            return dec_a
        if t == "map":
            val = _decoder(sch["values"])

            def dec_m(buf, pos):
                out = {}
                while True:
                    n, pos = zigzag_decode(buf, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:
                        _, pos = zigzag_decode(buf, pos)
                        n = -n
                    for _ in range(n):
                        k, pos = _rbytes(buf, pos)
                        v, pos = val(buf, pos)
                        out[k.decode("utf-8")] = v

            return dec_m
        if t == "record":
            fields = [_decoder(f["type"]) for f in sch["fields"]]

            def dec_r(buf, pos):
                vals = []
                for d in fields:
                    v, pos = d(buf, pos)
                    vals.append(v)
                return tuple(vals), pos

            return dec_r
        return _decoder(t)

    def dec_long(buf, pos):
        return zigzag_decode(buf, pos)

    def dec_double(buf, pos):
        return struct.unpack_from("<d", buf, pos)[0], pos + 8

    def dec_float(buf, pos):
        return struct.unpack_from("<f", buf, pos)[0], pos + 4

    def dec_bool(buf, pos):
        return buf[pos] == 1, pos + 1

    def dec_str(buf, pos):
        b, pos = _rbytes(buf, pos)
        return b.decode("utf-8"), pos

    def dec_bytes(buf, pos):
        b, pos = _rbytes(buf, pos)
        return bytearray(b), pos

    def dec_null(buf, pos):
        return None, pos

    return {
        "long": dec_long, "int": dec_long, "double": dec_double,
        "float": dec_float, "boolean": dec_bool, "string": dec_str,
        "bytes": dec_bytes, "null": dec_null,
    }[sch]


# ------------------------------------------------------------ container
def _write_header(schema_json: str, codec: str, sync: bytes) -> bytes:
    out = bytearray(MAGIC)
    out += zigzag_encode(2)  # metadata map: one block of 2 entries
    out += _wstr("avro.schema") + _wstr(schema_json)
    out += _wstr("avro.codec") + _wstr(codec)
    out += zigzag_encode(0)  # map terminator
    out += sync
    return bytes(out)


def parse_header(data: bytes) -> tuple[dict, str, bytes, int]:
    """(schema, codec, sync, pos_after_header)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta = {}
    while True:
        n, pos = zigzag_decode(data, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = zigzag_decode(data, pos)
            n = -n
        for _ in range(n):
            k, pos = _rbytes(data, pos)
            v, pos = _rbytes(data, pos)
            meta[k.decode()] = v
    sync = data[pos:pos + 16]
    pos += 16
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"Avro codec {codec!r} not supported "
                         "(null/deflate per the spec's required set)")
    schema = json.loads(meta["avro.schema"].decode())
    return schema, codec, sync, pos


def block_spans(data: bytes):
    """Yield (row_count, header_start, payload_start, payload_end) per
    block by walking HEADERS only (no payload decode) — the split
    reader's index pass. ``header_start`` is where the block's count
    varint begins (a valid chunk boundary); the sync marker trails
    ``payload_end`` by 16 bytes."""
    _, _, sync, pos = parse_header(data)
    n = len(data)
    while pos < n:
        hstart = pos
        cnt, pos = zigzag_decode(data, pos)
        size, pos = zigzag_decode(data, pos)
        if size < 0 or pos + size + 16 > n:
            raise ValueError("Avro block overruns the file")
        yield cnt, hstart, pos, pos + size
        pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError("Avro sync marker mismatch")
        pos += 16


def _decode_block(payload: bytes, codec: str, cnt: int, dec):
    if codec == "deflate":
        payload = zlib.decompress(payload, wbits=-15)
    rows, pos = [], 0
    for _ in range(cnt):
        v, pos = dec(payload, pos)
        rows.append(v)
    if pos != len(payload):
        raise ValueError("Avro block decoded short")
    return rows


def write_avro(
    df: DataFrame,
    out_dir: str,
    *,
    codec: str = "deflate",
    block_rows: int = 4096,
) -> int:
    """One ``part-*.avro`` OCF per partition; returns files written.

    Flat primitive schemas take the VECTORIZED encode lane
    (optimization r10, guide §4.2): Arrow batches arrive via
    ``mapInArrow`` and whole columns are varint/IEEE-encoded in numpy
    (``sources/avro_vec.py``, byte-identical to the per-value encoder
    — parity-pinned in tests), then interleaved row-major so blocks
    cut at exact ``block_rows`` boundaries. Nested schemas keep the
    per-value path below."""
    if codec not in ("null", "deflate"):
        raise ValueError("codec must be null or deflate")
    os.makedirs(out_dir, exist_ok=True)
    schema_json = schema_to_avro_json(df.schema)
    sch = json.loads(schema_json)

    from clickhouse_learning_spark.sources import avro_vec as _vec

    kinds = _vec.field_kinds(sch)
    if kinds is not None:
        def write_part_vec(it):
            import pyarrow as pa

            sync = _uuid.uuid4().bytes
            buf = io.BytesIO()
            started = False
            pend: list[bytes] = []
            pend_rows = 0

            def flush(payload: bytes, nrows: int) -> None:
                if not nrows:
                    return
                if codec == "deflate":
                    payload = zlib.compress(payload, 6)[2:-4]
                buf.write(zigzag_encode(nrows))
                buf.write(zigzag_encode(len(payload)))
                buf.write(payload)
                buf.write(sync)

            for batch in it:
                if not started:
                    buf.write(_write_header(schema_json, codec, sync))
                    started = True
                pay, row_end = _vec.encode_batch(
                    kinds, list(batch.columns)
                )
                nrows = len(row_end)
                off = 0
                while pend_rows + (nrows - off) >= block_rows:
                    need = block_rows - pend_rows
                    b0 = int(row_end[off - 1]) if off else 0
                    b1 = int(row_end[off + need - 1])
                    flush(b"".join(pend) + pay[b0:b1], block_rows)
                    pend, pend_rows = [], 0
                    off += need
                if off < nrows:
                    b0 = int(row_end[off - 1]) if off else 0
                    pend.append(pay[b0:])
                    pend_rows += nrows - off
            flush(b"".join(pend), pend_rows)
            if started:
                fname = os.path.join(
                    out_dir, f"part-{_uuid.uuid4().hex}.avro"
                )
                with open(fname, "wb") as f:
                    f.write(buf.getvalue())
                yield pa.record_batch(
                    [pa.array([fname], pa.string())], names=["fname"]
                )

        return df.mapInArrow(write_part_vec, "fname string").count()

    def write_part(it):
        enc = _encoder(sch)
        sync = _uuid.uuid4().bytes
        buf = io.BytesIO()
        started = False
        batch: list[bytes] = []

        def flush():
            if not batch:
                return
            payload = b"".join(batch)
            if codec == "deflate":
                payload = zlib.compress(payload, 6)[2:-4]  # raw DEFLATE
            buf.write(zigzag_encode(len(batch)))
            buf.write(zigzag_encode(len(payload)))
            buf.write(payload)
            buf.write(sync)
            batch.clear()

        for row in it:
            if not started:
                buf.write(_write_header(schema_json, codec, sync))
                started = True
            batch.append(enc(row))
            if len(batch) >= block_rows:
                flush()
        flush()
        if not started:
            return iter(())
        fname = os.path.join(out_dir, f"part-{_uuid.uuid4().hex}.avro")
        with open(fname, "wb") as f:
            f.write(buf.getvalue())
        return iter((fname,))

    return len(df.rdd.mapPartitions(write_part).collect())


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """One file per task; schema from the first file's header."""
    import pandas as pd

    binf = spark.read.format("binaryFile").load(path)
    head = binf.select("content").head()
    if head is None:
        raise ValueError(f"no Avro files under {path}")
    schema, _, _, _ = parse_header(bytes(head["content"]))
    spark_schema = _spark_schema(schema)
    names = [f.name for f in spark_schema.fields]
    sch_bc = schema

    def gen(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                data = bytes(blob)
                fsch, codec, _, _ = parse_header(data)
                if fsch != sch_bc:
                    raise ValueError("Avro file schema drift")
                dec = _decoder(fsch)
                for cnt, _, s, e in block_spans(data):
                    rows.extend(_decode_block(data[s:e], codec, cnt, dec))
            yield pd.DataFrame(rows, columns=names)

    return binf.select("content").mapInPandas(gen, spark_schema)


def read_avro_split(
    spark: SparkSession,
    path: str,
    rows_per_chunk: int = 65536,
) -> DataFrame:
    """Straggler-resistant reader: phase 1 walks block HEADERS (count +
    size + sync — payloads untouched) and groups blocks into
    ~rows_per_chunk ranges; phase 2 range-reads each span and decodes
    it with the broadcast schema/codec. Parity with read_avro is
    law-tested."""
    import pandas as pd

    binf = spark.read.format("binaryFile").load(path)
    head = binf.select("content").head()
    if head is None:
        raise ValueError(f"no Avro files under {path}")
    schema, _, _, _ = parse_header(bytes(head["content"]))
    spark_schema = _spark_schema(schema)
    names = [f.name for f in spark_schema.fields]
    sch_bc = schema

    idx_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("rows", T.LongType()),
    ])

    def index(batches):
        for pdf in batches:
            out = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                spans = list(block_spans(data))
                lo = None
                acc = 0
                for cnt, hstart, _, e in spans:
                    if lo is None:
                        lo = hstart
                    acc += cnt
                    if acc >= rows_per_chunk:
                        out.append((p, lo, e + 16, acc))  # incl. sync
                        lo, acc = None, 0
                if lo is not None:
                    out.append((p, lo, spans[-1][3] + 16, acc))
            yield pd.DataFrame(
                out, columns=[f.name for f in idx_schema.fields])

    chunks = binf.select("path", "content").mapInPandas(index, idx_schema)
    chunks = chunks.repartition(
        spark.sparkContext.defaultParallelism, "path", "start"
    )

    def extract(batches):
        for pdf in batches:
            rows = []
            for p, s, e in zip(pdf["path"], pdf["start"], pdf["end"]):
                local = re.sub(r"^file:/*", "/", str(p))
                with open(local, "rb") as fh:
                    # header re-read per task: schema/codec/sync live
                    # there; tiny vs the data range
                    header = fh.read(4096)
                    while True:
                        try:
                            fsch, codec, sync, _ = parse_header(header)
                            break
                        except (IndexError, ValueError):
                            more = fh.read(4096)
                            if not more:
                                raise
                            header += more
                    fh.seek(int(s))
                    data = fh.read(int(e) - int(s))
                dec = _decoder(sch_bc)
                pos, n = 0, len(data)
                while pos < n:
                    cnt, pos = zigzag_decode(data, pos)
                    size, pos = zigzag_decode(data, pos)
                    rows.extend(_decode_block(
                        data[pos:pos + size], codec, cnt, dec))
                    pos += size + 16  # skip sync
            yield pd.DataFrame(rows, columns=names)

    return chunks.mapInPandas(extract, spark_schema)


def _spark_schema(sch: dict) -> T.StructType:
    def one(s, nullable=False):
        if isinstance(s, list):
            non_null = [x for x in s if x != "null"]
            if len(non_null) != 1:
                raise ValueError("only [null, T] unions are supported")
            t, _ = one(non_null[0])
            return t, True
        if isinstance(s, dict):
            t, lt = s["type"], s.get("logicalType")
            if t == "int" and lt == "date":
                return T.DateType(), nullable
            if t == "long" and lt == "timestamp-micros":
                return T.TimestampType(), nullable
            if t == "array":
                et, en = one(s["items"])
                return T.ArrayType(et, en), nullable
            if t == "map":
                vt, vn = one(s["values"])
                return T.MapType(T.StringType(), vt, vn), nullable
            if t == "record":
                flds = []
                for f in s["fields"]:
                    ft, fn = one(f["type"])
                    flds.append(T.StructField(f["name"], ft, fn))
                return T.StructType(flds), nullable
            return one(t, nullable)
        prim = {
            "long": T.LongType(), "int": T.IntegerType(),
            "double": T.DoubleType(), "float": T.FloatType(),
            "boolean": T.BooleanType(), "string": T.StringType(),
            "bytes": T.BinaryType(),
        }
        if s not in prim:
            raise ValueError(f"Avro type {s!r} unsupported")
        return prim[s], nullable

    if not (isinstance(sch, dict) and sch.get("type") == "record"):
        raise ValueError("top-level Avro schema must be a record")
    fields = []
    for f in sch["fields"]:
        t, n = one(f["type"])
        fields.append(T.StructField(f["name"], t, n))
    return T.StructType(fields)
