"""ClickHouse Native-format source + sink (column-oriented blocks).

Native is ClickHouse's own columnar serialization — what
``SELECT ... INTO OUTFILE '...' FORMAT Native`` writes and
``clickhouse-client``/``clickhouse-local`` exchange — and the most
efficient offboarding container a CH deployment can produce (no
row-pivot, no text render). Layout per the public format description
and the open-source drivers that implement it (clickhouse-driver,
ch-go): a stream is a sequence of BLOCKS, each

    num_columns: LEB128 varint
    num_rows:    LEB128 varint
    per column:  name (LEB128 len + UTF-8), type (same), then the
                 COLUMN data for num_rows values

with column data sharing RowBinary's per-value little-endian
encodings (sources/rowbinary.py's codecs are reused verbatim) except
for the columnar composites:

- ``Nullable(T)`` — a null MASK first (num_rows bytes, 1 = NULL),
  then num_rows inner values (NULL slots carry the type's default);
- ``Array(T)`` — num_rows UInt64 CUMULATIVE offsets, then the
  flattened inner column (recursively columnar);
- ``Map(K, V)`` — offsets like Array, then the flattened keys column,
  then the flattened values column;
- ``Tuple(T1..Tn)`` — each element column in sequence.

Framing note: this module reads/writes the revision-0 FILE form (no
client-protocol BlockInfo between the counts — the framing
``clickhouse-local``'s file output uses). ``LowCardinality(T)`` is
gated: its Native serialization carries a real dictionary state
(version header, key-width flags, shared-dictionary modes) — a wrong
walk would desync every following column, so re-export those columns
as plain T (CH casts implicitly) or use the RowBinary path, where LC
serializes as the inner type.

Scale shape: :func:`read_native` is one export file = one task (CH
exports are per-shard / per-chunk); :func:`read_native_split` (r7)
re-chunks big exports on BLOCK boundaries so parallelism is
total-bytes / chunk_bytes — use it when a crawl ships as a few huge
files. Inside a task the scalar columns decode via single
``struct.unpack_from`` batch calls rather than per-value loops;
the split index pass skip-walks blocks without building values.
"""

from __future__ import annotations

import os
import re
import struct
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession

from clickhouse_learning_spark.sources.rowbinary import (
    _SCALARS,
    _TypeCodec,
    _read_leb128,
    _write_leb128,
    spark_schema,
)


def _default_value(c: _TypeCodec):
    """The type's default (what CH writes under a NULL mask slot)."""
    import datetime as dt

    k = c.kind
    if k in _SCALARS:
        return 0.0 if k.startswith("Float") else 0
    if k == "String":
        return ""
    if k == "FixedString":
        return "\x00" * 0  # encoder zero-pads
    if k == "Date" or k == "Date32":
        return dt.date(1970, 1, 1)
    if k in ("DateTime", "DateTime64"):
        return dt.datetime(1970, 1, 1)
    if k == "Decimal":
        return 0
    if k == "UUID":
        return "00000000-0000-0000-0000-000000000000"
    if k == "IPv4":
        return "0.0.0.0"
    if k == "IPv6":
        return "::"
    if k == "Enum":
        return c.enum_map[min(c.enum_map)]
    if k == "Array":
        return []
    if k == "Map":
        return {}
    if k == "Tuple":
        return tuple(_default_value(e) for e in c.tuple_of)
    raise ValueError(f"no default for {c.ch_type}")


class _NativeCol:
    """Columnar codec: decode_column(buf, pos, n) -> (values, pos);
    encode_column(values) -> bytes."""

    def __init__(self, ch_type: str):
        self.ch_type = ch_type
        t = ch_type.strip()
        if re.fullmatch(r"LowCardinality\(.*\)", t):
            raise ValueError(
                "LowCardinality has a dictionary-state Native "
                "serialization this reader does not walk; re-export the "
                "column as its inner type (CH casts implicitly) or use "
                "the RowBinary path (sources/rowbinary.py), where "
                "LowCardinality serializes as plain T"
            )
        self.nullable = False
        nul = re.fullmatch(r"Nullable\((.*)\)", t)
        if nul:
            self.nullable = True
            t = nul.group(1).strip()
        arr = re.fullmatch(r"Array\((.*)\)", t)
        mp = re.fullmatch(r"Map\((.*)\)", t)
        tup = re.fullmatch(r"Tuple\((.*)\)", t)
        self.kind = "scalar"
        if arr:
            self.kind = "Array"
            self.inner = _NativeCol(arr.group(1).strip())
        elif mp:
            from clickhouse_learning_spark.sources.rowbinary import (
                _split_types,
            )

            kt, vt = _split_types(mp.group(1))
            self.kind = "Map"
            self.key_col = _NativeCol(kt)
            self.val_col = _NativeCol(vt)
        elif tup:
            from clickhouse_learning_spark.sources.rowbinary import (
                _split_types,
            )

            self.kind = "Tuple"
            self.elems = [
                _NativeCol(x) for x in _split_types(tup.group(1), n=None)
            ]
        else:
            self.codec = _TypeCodec(t)
            if self.codec.kind == "Array":  # unreachable, but explicit
                raise AssertionError
        # row-level codec only used for spark_type on composites
        self._rb = _TypeCodec(ch_type)

    def spark_type(self):
        return self._rb.spark_type()

    # -- decode ------------------------------------------------------
    def decode_column(self, buf: bytes, pos: int, n: int):
        if self.nullable:
            mask = buf[pos:pos + n]
            if len(mask) < n:
                raise ValueError("Native stream ended in a null mask")
            pos += n
            vals, pos = self._decode_inner(buf, pos, n)
            return (
                [None if mask[i] else vals[i] for i in range(n)],
                pos,
            )
        return self._decode_inner(buf, pos, n)

    def _decode_inner(self, buf: bytes, pos: int, n: int):
        if self.kind == "Array":
            offs = struct.unpack_from(f"<{n}Q", buf, pos)
            pos += 8 * n
            total = offs[-1] if n else 0
            flat, pos = self.inner.decode_column(buf, pos, int(total))
            out, prev = [], 0
            for o in offs:
                out.append(flat[prev:int(o)])
                prev = int(o)
            return out, pos
        if self.kind == "Map":
            offs = struct.unpack_from(f"<{n}Q", buf, pos)
            pos += 8 * n
            total = int(offs[-1]) if n else 0
            ks, pos = self.key_col.decode_column(buf, pos, total)
            vs, pos = self.val_col.decode_column(buf, pos, total)
            out, prev = [], 0
            for o in offs:
                out.append(dict(zip(ks[prev:int(o)], vs[prev:int(o)])))
                prev = int(o)
            return out, pos
        if self.kind == "Tuple":
            cols = []
            for e in self.elems:
                vals, pos = e.decode_column(buf, pos, n)
                cols.append(vals)
            return [tuple(vs) for vs in zip(*cols)] if n else [], pos
        c = self.codec
        if c.kind in _SCALARS:
            fmt, width = _SCALARS[c.kind]
            vals = list(struct.unpack_from(f"<{n}{fmt[1:]}", buf, pos))
            pos += width * n
            if c.kind == "UInt64":
                # >= 2^63 wraps to negative LongType — the repo-wide
                # documented stand-in for CH's unsigned top half
                vals = [v - 2**64 if v >= 2**63 else v for v in vals]
            return vals, pos
        vals = []
        for _ in range(n):
            v, pos = c.decode(buf, pos)
            vals.append(v)
        return vals, pos

    # -- skip (split-reader index pass) --------------------------------
    def skip_column(self, buf: bytes, pos: int, n: int) -> int:
        """Advance past ``n`` values WITHOUT materializing Python
        objects where the layout allows — fixed-width scalar columns
        are one pointer bump; var-width columns walk their length
        prefixes. This is the cheap walk :func:`_block_spans` runs so
        the split reader's index pass prices like decompression, not
        like a full decode."""
        if self.nullable:
            if pos + n > len(buf):
                raise ValueError("Native stream ended in a null mask")
            pos += n
        return self._skip_inner(buf, pos, n)

    def _skip_inner(self, buf: bytes, pos: int, n: int) -> int:
        if self.kind in ("Array", "Map"):
            total = (
                int(struct.unpack_from("<Q", buf, pos + 8 * (n - 1))[0])
                if n else 0
            )
            pos += 8 * n
            if self.kind == "Array":
                return self.inner.skip_column(buf, pos, total)
            pos = self.key_col.skip_column(buf, pos, total)
            return self.val_col.skip_column(buf, pos, total)
        if self.kind == "Tuple":
            for e in self.elems:
                pos = e.skip_column(buf, pos, n)
            return pos
        c = self.codec
        if c.kind in _SCALARS:
            end = pos + _SCALARS[c.kind][1] * n
            if end > len(buf):
                raise ValueError("Native column data overruns the file")
            return end
        for _ in range(n):  # var-width (String etc.): length walk
            _, pos = c.decode(buf, pos)
        return pos

    # -- encode ------------------------------------------------------
    def encode_column(self, values) -> bytes:
        if self.nullable:
            mask = bytes(1 if v is None else 0 for v in values)
            inner_default = None
            filled = []
            for v in values:
                if v is None:
                    if inner_default is None:
                        inner_default = _default_value(
                            _TypeCodec(
                                re.fullmatch(
                                    r"Nullable\((.*)\)",
                                    self.ch_type.strip(),
                                ).group(1)
                            )
                        )
                    filled.append(inner_default)
                else:
                    filled.append(v)
            return mask + self._encode_inner(filled)
        return self._encode_inner(values)

    def _encode_inner(self, values) -> bytes:
        if self.kind == "Array":
            offs, flat, total = [], [], 0
            for v in values:
                total += len(v)
                offs.append(total)
                flat.extend(v)
            return (
                struct.pack(f"<{len(values)}Q", *offs)
                + self.inner.encode_column(flat)
            )
        if self.kind == "Map":
            offs, ks, vs, total = [], [], [], 0
            for v in values:
                items = v.items() if isinstance(v, dict) else list(v)
                total += len(items)
                offs.append(total)
                for kk, vv in items:
                    ks.append(kk)
                    vs.append(vv)
            return (
                struct.pack(f"<{len(values)}Q", *offs)
                + self.key_col.encode_column(ks)
                + self.val_col.encode_column(vs)
            )
        if self.kind == "Tuple":
            return b"".join(
                e.encode_column([v[i] for v in values])
                for i, e in enumerate(self.elems)
            )
        c = self.codec
        if c.kind in _SCALARS and not c.kind.startswith("Float"):
            fmt, _ = _SCALARS[c.kind]
            if c.kind == "UInt64":
                vals = [v & (2**64 - 1) for v in values]
            else:
                vals = values
            return struct.pack(f"<{len(vals)}{fmt[1:]}", *vals)
        return b"".join(c.encode(v) for v in values)


def _read_string(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = _read_leb128(buf, pos)
    return buf[pos:pos + n].decode("utf-8"), pos + n


def _write_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return _write_leb128(len(b)) + b


def parse_native(buf: bytes):
    """All blocks of a Native stream. Returns (names, ch_types, rows);
    every block must carry the same column set in the same order."""
    pos, end = 0, len(buf)
    names = types = cols_codecs = None
    rows: list[tuple] = []
    while pos < end:
        ncols, pos = _read_leb128(buf, pos)
        nrows, pos = _read_leb128(buf, pos)
        bnames, btypes, data = [], [], []
        for ci in range(ncols):
            # per the format, each column is (name, type, data)
            nm, pos = _read_string(buf, pos)
            tp, pos = _read_string(buf, pos)
            bnames.append(nm)
            btypes.append(tp)
            if cols_codecs is None or ci >= len(cols_codecs):
                codec = _NativeCol(tp)
            else:
                codec = cols_codecs[ci]
            vals, pos = codec.decode_column(buf, pos, nrows)
            data.append(vals)
        if names is None:
            names, types = bnames, btypes
            cols_codecs = [_NativeCol(t) for t in types]
        elif bnames != names or btypes != types:
            raise ValueError(
                f"Native block schema {list(zip(bnames, btypes))} != "
                f"first block's {list(zip(names, types))}"
            )
        rows.extend(zip(*data) if nrows else [])
    if names is None:
        raise ValueError("empty Native stream")
    return names, types, rows


def read_native(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory/glob of Native files: schema from the first
    file's first block on the driver, then one file per task via
    mapInPandas over binaryFile — the per-shard-export shape."""
    import pandas as pd

    binf = spark.read.format("binaryFile").load(path)
    head = binf.select("content").head()
    if head is None:
        raise ValueError(f"no Native files under {path}")
    names, types, _ = parse_native(bytes(head["content"]))
    schema = spark_schema(names, types)
    names_bc, types_bc = list(names), list(types)

    def gen(batches):
        for pdf in batches:
            out_rows = []
            for blob in pdf["content"]:
                ns, ts, rows = parse_native(bytes(blob))
                if ts != types_bc:
                    raise ValueError(
                        f"file types {ts} != expected {types_bc}"
                    )
                out_rows.extend(rows)
            yield pd.DataFrame(out_rows, columns=names_bc)

    return binf.select("content").mapInPandas(gen, schema=schema)


def _block_spans(buf: bytes):
    """Yield ``(start, end)`` per Native block via the skip walk. Any
    block boundary is a valid stream start — every block repeats its
    (name, type) pairs — so spans can be regrouped into arbitrary
    chunk ranges for the split reader."""
    pos, end = 0, len(buf)
    while pos < end:
        start = pos
        ncols, pos = _read_leb128(buf, pos)
        nrows, pos = _read_leb128(buf, pos)
        for _ in range(ncols):
            _, pos = _read_string(buf, pos)
            tp, pos = _read_string(buf, pos)
            pos = _NativeCol(tp).skip_column(buf, pos, nrows)
        if pos > end:
            raise ValueError("Native block overruns the file")
        yield start, pos


def read_native_split(
    spark: SparkSession,
    path: str,
    chunk_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Straggler-resistant :func:`read_native` — the same two-phase
    shape as ``sources/warc.read_warc_split`` (the block framing maps
    onto it almost verbatim): phase 1 indexes BLOCK boundaries per file
    (distributed skip walk — fixed-width columns advance by pointer
    arithmetic, no Python values built) and groups them into
    ~``chunk_bytes`` ranges; phase 2 range-reads each chunk (an
    S3/HDFS range GET at cluster scale) and decodes it as an
    independent Native stream. Parallelism becomes total-bytes /
    chunk_bytes instead of file count — the fix for few-huge-exports
    layouts, where the one-file-per-task reader serializes on the
    biggest file. Same STRICT error convention as read_native
    (schema comes from real CH exports; a malformed file is a job
    error, not a quarantine row). Parity with read_native is
    law-tested (tests/test_native.py)."""
    import pandas as pd

    from clickhouse_learning_spark.sources.warc import _chunk_ranges

    binf = spark.read.format("binaryFile").load(path)
    head = binf.select("content").head()
    if head is None:
        raise ValueError(f"no Native files under {path}")
    names, types, _ = parse_native(bytes(head["content"]))
    schema = spark_schema(names, types)
    names_bc, types_bc = list(names), list(types)

    from pyspark.sql import types as T

    idx_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
    ])

    def index(batches):
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                offs = [s for s, _ in _block_spans(data)]
                offs.append(len(data))
                for s, e in _chunk_ranges(offs, chunk_bytes):
                    rows.append((p, s, e))
            yield pd.DataFrame(
                rows, columns=[f.name for f in idx_schema.fields])

    chunks = binf.select("path", "content").mapInPandas(index, idx_schema)
    # explicit COUNT, same reason as read_warc_split: chunk rows are
    # bytes-sized, AQE would coalesce a column-only repartition to one
    # partition and re-serialize the decode stage
    chunks = chunks.repartition(
        spark.sparkContext.defaultParallelism, "path", "start"
    )

    def extract(batches):
        for pdf in batches:
            out_rows = []
            for p, s, e in zip(pdf["path"], pdf["start"], pdf["end"]):
                local = re.sub(r"^file:/*", "/", p)
                with open(local, "rb") as fh:  # range GET at scale
                    fh.seek(int(s))
                    data = fh.read(int(e) - int(s))
                ns, ts, rows = parse_native(data)
                if ts != types_bc:
                    raise ValueError(
                        f"chunk types {ts} != expected {types_bc}"
                    )
                out_rows.extend(rows)
            yield pd.DataFrame(out_rows, columns=names_bc)

    return chunks.mapInPandas(extract, schema=schema)


def write_native(
    df: DataFrame,
    out_dir: str,
    ch_types: list[str],
    *,
    block_rows: int = 65_409,
) -> int:
    """Write each partition as one ``part-*.native`` file of
    ``block_rows``-row blocks (65 409 = CH's default block size).
    Returns the number of files written."""
    names = df.columns
    if len(ch_types) != len(names):
        raise ValueError("ch_types must match df.columns")
    os.makedirs(out_dir, exist_ok=True)
    types_local = list(ch_types)
    names_local = list(names)

    def write_part(it):
        cols = [_NativeCol(t) for t in types_local]
        chunks: list[bytes] = []
        batch: list[tuple] = []

        def flush():
            if not batch:
                return
            chunks.append(_write_leb128(len(cols)))
            chunks.append(_write_leb128(len(batch)))
            # names/types repeat per block, per the format
            for i, c in enumerate(cols):
                chunks.append(_write_string(names_local[i]))
                chunks.append(_write_string(types_local[i]))
                chunks.append(c.encode_column([r[i] for r in batch]))
            batch.clear()

        for row in it:
            batch.append(tuple(row))
            if len(batch) >= block_rows:
                flush()
        flush()
        if not chunks:
            return iter(())
        fname = os.path.join(out_dir, f"part-{_uuid.uuid4().hex}.native")
        with open(fname, "wb") as f:
            f.write(b"".join(chunks))
        return iter((fname,))

    files = df.rdd.mapPartitions(write_part).collect()
    return len(files)
