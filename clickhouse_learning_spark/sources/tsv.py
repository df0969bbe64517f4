"""ClickHouse TabSeparated (TSV) source + sink — the text member of
the CH export family (RowBinary = binary rows, Native = binary
columns, TabSeparated = text rows; ``FORMAT TSV`` /
``TSVWithNamesAndTypes`` in CH docs).

CH TSV is NOT csv: values are never quoted. Instead a fixed escape set
applies inside values — ``\\\\  \\t  \\n  \\r  \\b  \\f  \\0  \\'`` —
rows end with ``\\n``, and a SQL NULL renders as ``\\N``. The
WithNamesAndTypes form prepends two header rows (escaped names, then
CH type names). Scalar types render as CH does: integers plain,
floats in shortest-roundtrip form, Date ``YYYY-MM-DD``, DateTime
``YYYY-MM-DD hh:mm:ss``, DateTime64 with the scale's fractional
digits.

Composite types (Array/Map/Tuple) use CH's quoted-literal TEXT forms
in TSV and are deliberately gated here with a pointer — the binary
paths (sources/rowbinary.py, sources/native.py) carry them exactly,
and a text re-parse of nested quoted literals is where silent data
corruption lives. Scalars + Nullable cover the dimension/fact export
shapes TSV is actually used for.

Scale shape: one export file = one task (binaryFile), identical to the
RowBinary reader; writing emits one file per partition.
"""

from __future__ import annotations

import os
import re
import uuid as _uuid
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_ESCAPES = {
    "\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r",
    "\b": "\\b", "\f": "\\f", "\0": "\\0", "'": "\\'",
}
_UNESCAPES = {
    "\\": "\\", "t": "\t", "n": "\n", "r": "\r",
    "b": "\b", "f": "\f", "0": "\0", "'": "'", "N": None,
}


_TRANS = str.maketrans(_ESCAPES)
# one C regex scan decides whether a column needs the escape walk at
# all (r10 writer fast path) — exactly the _ESCAPES key set
_NEEDS_ESCAPE_RE = r"[\\\t\n\r\x08\x0c\x00']"


def escape_value(s: str) -> str:
    return s.translate(_TRANS)


def _split_row(line: str) -> list[str | None]:
    """Split one TSV row on UNESCAPED tabs and unescape each field;
    a field that is exactly ``\\N`` is NULL."""
    fields: list[str | None] = []
    cur: list[str] = []
    is_null = False
    i, n = 0, len(line)
    start = True
    while i < n:
        ch = line[i]
        if ch == "\\" and i + 1 < n:
            nxt = line[i + 1]
            if nxt == "N" and start and (i + 2 == n or line[i + 2] == "\t"):
                is_null = True
                i += 2
                start = False
                continue
            if nxt in _UNESCAPES and nxt != "N":
                cur.append(_UNESCAPES[nxt])
                i += 2
                start = False
                continue
            # unknown escape: CH keeps the char
            cur.append(nxt)
            i += 2
            start = False
            continue
        if ch == "\t":
            fields.append(None if is_null else "".join(cur))
            cur, is_null, start = [], False, True
            i += 1
            continue
        cur.append(ch)
        start = False
        i += 1
    fields.append(None if is_null else "".join(cur))
    return fields


class _TsvType:
    """CH-type ↔ text value converter for the scalar TSV surface."""

    _GATED = re.compile(r"^(Array|Map|Tuple|AggregateFunction)\(")

    def __init__(self, ch_type: str):
        t = ch_type.strip()
        low = re.fullmatch(r"LowCardinality\((.*)\)", t)
        if low:
            t = low.group(1).strip()
        self.nullable = False
        nul = re.fullmatch(r"Nullable\((.*)\)", t)
        if nul:
            self.nullable = True
            t = nul.group(1).strip()
        if self._GATED.match(t):
            raise ValueError(
                f"TSV type {ch_type!r}: composite types use CH's "
                "quoted-literal text forms — export them via the exact "
                "binary paths instead (sources/rowbinary.py or "
                "sources/native.py)"
            )
        self.ch_type = ch_type
        dt64 = re.fullmatch(r"DateTime64\((\d+)(?:\s*,.*)?\)", t)
        self.scale = int(dt64.group(1)) if dt64 else None
        if dt64:
            self.base = "DateTime64"
        elif re.fullmatch(r"DateTime(\(.*\))?", t):
            self.base = "DateTime"
        elif re.fullmatch(r"FixedString\(\d+\)", t):
            self.base = "String"
        elif t in ("Date", "Date32"):
            self.base = "Date"
        elif t.startswith("Float"):
            self.base = "Float"
        elif re.fullmatch(r"U?Int(8|16|32|64)", t):
            self.base = "Int"
            self.signed64 = t == "UInt64"
        elif t == "String":
            self.base = "String"
        else:
            raise ValueError(
                f"TSV type {ch_type!r} is not supported here; use the "
                "binary paths for exotic types"
            )

    def spark_type(self) -> T.DataType:
        return {
            "Int": T.LongType(), "Float": T.DoubleType(),
            "String": T.StringType(), "Date": T.DateType(),
            "DateTime": T.TimestampType(), "DateTime64": T.TimestampType(),
        }[self.base]

    def render(self, v) -> str:
        if v is None:
            return "\\N"
        if self.base == "Int":
            return str(int(v))
        if self.base == "Float":
            return repr(float(v))  # shortest roundtrip, like CH
        if self.base == "String":
            return escape_value(str(v))
        if self.base == "Date":
            return v.isoformat()
        if self.base == "DateTime":
            return v.strftime("%Y-%m-%d %H:%M:%S")
        # DateTime64: exactly `scale` fractional digits, like CH text
        # output. Spark timestamps carry microseconds, so scales 7-9
        # zero-pad on the right (ADVICE r6: truncating at 6 digits was
        # self-consistent but not CH text parity).
        frac = f"{v.microsecond:06d}"[: self.scale].ljust(self.scale, "0")
        base = v.strftime("%Y-%m-%d %H:%M:%S")
        return f"{base}.{frac}" if self.scale else base

    def render_array(self, col, null_token: str):
        """Whole-column render of one Arrow array (r10, guide §4.3) —
        returns a pyarrow string array with ``null_token`` substituted
        for NULLs. Int formats as an Arrow C cast (plain decimal,
        byte-identical to ``str(int(v))`` — edge-pinned in
        tests/test_tsv.py); Float walks a ``repr`` loop (Python's
        shortest-roundtrip text IS the format contract); String escapes
        only when an escapable character is present anywhere in the
        column (one C regex scan decides); Date/DateTime walk
        :meth:`render`, the semantics source of truth."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if self.base == "Int":
            return pc.fill_null(pc.cast(col, pa.string()), null_token)
        if self.base == "Float":
            out = pa.array(
                [None if v is None else repr(v) for v in col.to_pylist()],
                type=pa.string(),
            )
            return pc.fill_null(out, null_token)
        if self.base == "String":
            hits = pc.match_substring_regex(col, _NEEDS_ESCAPE_RE)
            if pc.any(hits).as_py():
                out = pa.array(
                    [None if v is None else escape_value(v) for v in col.to_pylist()],
                    type=pa.string(),
                )
            else:
                out = col
            return pc.fill_null(out, null_token)
        out = pa.array(
            [None if v is None else self.render(v) for v in col.to_pylist()],
            type=pa.string(),
        )
        return pc.fill_null(out, null_token)

    def parse(self, s: str | None):
        if s is None:
            return None
        if self.base == "Int":
            return int(s)
        if self.base == "Float":
            return float(s)
        if self.base == "String":
            return s
        if self.base == "Date":
            return date.fromisoformat(s)
        if self.base in ("DateTime", "DateTime64"):
            if "." in s:
                head, frac = s.split(".", 1)
                micros = int(frac.ljust(6, "0")[:6])
            else:
                head, micros = s, 0
            return datetime.strptime(
                head, "%Y-%m-%d %H:%M:%S"
            ).replace(microsecond=micros)
        raise AssertionError


def parse_tsv(
    text: str, ch_types: list[str] | None = None
) -> tuple[list[str] | None, list[str], list[tuple]]:
    """Decode one TSVWithNamesAndTypes stream (or headerless TSV when
    ``ch_types`` is given). Returns (names, types, rows)."""
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    names = None
    if ch_types is None:
        if len(lines) < 2:
            raise ValueError("TSVWithNamesAndTypes needs two header rows")
        names = [f or "" for f in _split_row(lines[0])]
        ch_types = [f or "" for f in _split_row(lines[1])]
        lines = lines[2:]
    convs = [_TsvType(t) for t in ch_types]
    rows = []
    for ln in lines:
        fields = _split_row(ln)
        if len(fields) != len(convs):
            raise ValueError(
                f"TSV row has {len(fields)} fields, expected {len(convs)}"
            )
        rows.append(tuple(c.parse(f) for c, f in zip(convs, fields)))
    return names, ch_types, rows


def _unescape_field(s: str):
    """Exact field-level form of :func:`_split_row`'s escape handling:
    a field that is exactly ``\\N`` is NULL; otherwise every
    ``\\<ch>`` pair maps through ``_UNESCAPES`` (unknown escapes keep
    the char, the CH convention). Fields arrive already tab-split —
    raw tabs are always separators in CH TSV because literal tabs are
    escaped on output."""
    if s == "\\N":
        return None
    return re.sub(
        r"\\(.)",
        lambda m: (
            _UNESCAPES.get(m.group(1), m.group(1))
            if m.group(1) != "N" else "N"
        ),
        s,
    )


def _tsv_pdf(text: str, ch_types: list[str], names: list[str]):
    """Columnar decode of a headerless TSV chunk (optimization r10,
    guide §4.2): CH TSV escapes every control character on output, so
    a RAW tab is always a field separator and a RAW newline always a
    row boundary — which makes the chunk exactly one
    ``pandas.read_csv`` C-tokenizer call (QUOTE_NONE, ``\\n``
    terminator, no NA filtering). Only fields carrying a backslash can
    hold an escape or a ``\\N`` NULL; those are fixed per value with
    :func:`_unescape_field`. Any structural surprise (field-count
    drift, blank-line skips, unparsable numerics) falls the whole
    chunk back to the scalar :func:`parse_tsv`, which stays the
    semantics (and error-message) source of truth."""
    import io as _io

    import numpy as np
    import pandas as pd

    convs = [_TsvType(t) for t in ch_types]
    try:
        if not text or not text.strip("\n"):
            return pd.DataFrame(
                {n: pd.Series([], dtype=object) for n in names}
            )
        n_rows = text.count("\n") + (0 if text.endswith("\n") else 1)
        df = pd.read_csv(
            _io.StringIO(text),
            sep="\t",
            header=None,
            dtype=str,
            na_filter=False,
            quoting=3,  # csv.QUOTE_NONE
            lineterminator="\n",
            skip_blank_lines=False,
        )
        if len(df) != n_rows or df.shape[1] != len(convs):
            raise ValueError("row/field count drift — scalar path decides")
        # na_filter=False means real data never yields NaN; any NaN is
        # the C parser padding a SHORT row — the scalar path must rule
        if df.isna().to_numpy().any():
            raise ValueError("short row padded — scalar path decides")
        out = {}
        for i, (name, c) in enumerate(zip(names, convs)):
            col = df[i]
            esc = col.str.contains("\\", regex=False)
            fixed = None
            if esc.any():
                fixed = col[esc].map(_unescape_field)
            if c.base == "Int":
                vals = col.to_numpy(dtype=object)
                if fixed is None:
                    out[name] = vals.astype(np.int64)
                    continue
            elif c.base == "Float":
                vals = col.to_numpy(dtype=object)
                if fixed is None:
                    out[name] = vals.astype(np.float64)
                    continue
            elif c.base == "String":
                vals = col.to_numpy(dtype=object)
                if fixed is not None:
                    vals = vals.copy()
                    vals[esc.to_numpy()] = fixed.to_numpy(dtype=object)
                out[name] = vals
                continue
            elif c.base == "Date":
                from datetime import date as _date

                if fixed is None:
                    out[name] = np.array(
                        [_date.fromisoformat(x) for x in col],
                        dtype=object,
                    )
                    continue
                vals = col.to_numpy(dtype=object)
            else:  # DateTime / DateTime64
                if fixed is None:
                    fmt = (
                        "%Y-%m-%d %H:%M:%S.%f"
                        if c.scale
                        else "%Y-%m-%d %H:%M:%S"
                    )
                    out[name] = pd.to_datetime(col, format=fmt)
                    continue
                vals = col.to_numpy(dtype=object)
            # escape-carrying non-string column: per-value codec on the
            # unescaped fields (NULLs included), vectorized elsewhere
            vals = vals.copy()
            vals[esc.to_numpy()] = fixed.to_numpy(dtype=object)
            out[name] = np.array(
                [None if x is None else c.parse(x) for x in vals],
                dtype=object,
            )
        return pd.DataFrame(out)
    except ValueError:
        _, _, rows = parse_tsv(text, ch_types)
        return pd.DataFrame(rows, columns=names)
    except pd.errors.ParserError:
        _, _, rows = parse_tsv(text, ch_types)
        return pd.DataFrame(rows, columns=names)


def read_tsv(
    spark: SparkSession,
    path: str,
    ch_types: list[str] | None = None,
    names: list[str] | None = None,
) -> DataFrame:
    """Read a directory/glob of TSVWithNamesAndTypes files (or
    headerless TSV with explicit names + ch_types); one file per
    task."""
    import pandas as pd

    if (ch_types is None) != (names is None):
        raise ValueError("pass both names and ch_types, or neither")
    binf = spark.read.format("binaryFile").load(path)
    expect_header = ch_types is None
    if expect_header:
        head = binf.select("content").head()
        if head is None:
            raise ValueError(f"no TSV files under {path}")
        names, ch_types, _ = parse_tsv(
            bytes(head["content"]).decode("utf-8")
        )
    fields = [
        T.StructField(n, _TsvType(t).spark_type(), True)
        for n, t in zip(names, ch_types)
    ]
    schema = T.StructType(fields)
    names_bc, types_bc = list(names), list(ch_types)

    def gen(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                txt = bytes(blob).decode("utf-8")
                if expect_header:
                    nl1 = txt.find("\n")
                    nl2 = txt.find("\n", nl1 + 1)
                    if nl1 < 0 or nl2 < 0:
                        raise ValueError(
                            "TSVWithNamesAndTypes needs two header rows"
                        )
                    ts = [f or "" for f in _split_row(txt[nl1 + 1:nl2])]
                    if ts != types_bc:
                        raise ValueError(
                            f"file types {ts} != expected {types_bc}"
                        )
                    txt = txt[nl2 + 1:]
                yield _tsv_pdf(txt, types_bc, names_bc)

    return binf.select("content").mapInPandas(gen, schema=schema)


def read_tsv_split(
    spark: SparkSession,
    path: str,
    ch_types: list[str] | None = None,
    names: list[str] | None = None,
    chunk_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Straggler-resistant :func:`read_tsv` (two-phase, like
    ``warc.read_warc_split``). CH TSV never carries a RAW newline
    inside a value — the escape set rewrites it to ``\\n`` — so EVERY
    ``\\n`` byte is a row boundary and chunking is a byte scan: phase 1
    records, per file, the header end plus ~``chunk_bytes`` ranges
    snapped forward to the next newline; phase 2 range-reads each
    chunk and parses its lines with the broadcast type row. Parity
    with read_tsv is law-tested (tests/test_tsv.py)."""
    import pandas as pd

    if (ch_types is None) != (names is None):
        raise ValueError("pass both names and ch_types, or neither")
    binf = spark.read.format("binaryFile").load(path)
    expect_header = ch_types is None
    if expect_header:
        head = binf.select("content").head()
        if head is None:
            raise ValueError(f"no TSV files under {path}")
        names, ch_types, _ = parse_tsv(
            bytes(head["content"]).decode("utf-8")
        )
    fields = [
        T.StructField(n, _TsvType(t).spark_type(), True)
        for n, t in zip(names, ch_types)
    ]
    schema = T.StructType(fields)
    names_bc, types_bc = list(names), list(ch_types)
    skip_header = expect_header

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
                n = len(data)
                pos = 0
                if skip_header:  # two header lines belong to no chunk
                    for _ in range(2):
                        nl = data.find(b"\n", pos)
                        if nl < 0:
                            raise ValueError(
                                f"{p}: missing TSV header rows")
                        pos = nl + 1
                while pos < n:
                    end = min(pos + chunk_bytes, n)
                    if end < n:
                        nl = data.find(b"\n", end)
                        end = n if nl < 0 else nl + 1
                    rows.append((p, pos, end))
                    pos = end
            yield pd.DataFrame(
                rows, columns=[f.name for f in idx_schema.fields])

    chunks = binf.select("path", "content").mapInPandas(index, idx_schema)
    # explicit COUNT (same as warc/native split): AQE would coalesce
    # the bytes-sized chunk rows into one partition
    chunks = chunks.repartition(
        spark.sparkContext.defaultParallelism, "path", "start"
    )

    def extract(batches):
        for pdf in batches:
            for p, s, e in zip(pdf["path"], pdf["start"], pdf["end"]):
                local = re.sub(r"^file:/*", "/", p)
                with open(local, "rb") as fh:  # range GET at scale
                    fh.seek(int(s))
                    data = fh.read(int(e) - int(s))
                yield _tsv_pdf(data.decode("utf-8"), types_bc, names_bc)

    return chunks.mapInPandas(extract, schema=schema)


def write_tsv(
    df: DataFrame,
    out_dir: str,
    ch_types: list[str],
    *,
    with_header: bool = True,
) -> int:
    """One ``part-*.tsv`` per partition; returns the file count."""
    names = df.columns
    if len(ch_types) != len(names):
        raise ValueError("ch_types must match df.columns")
    os.makedirs(out_dir, exist_ok=True)
    types_local = list(ch_types)
    header = ""
    if with_header:
        header = (
            "\t".join(escape_value(n) for n in names) + "\n"
            + "\t".join(escape_value(t) for t in ch_types) + "\n"
        )

    # mapInArrow writer (r10, guide §1.4/§4.3): the former
    # df.rdd.mapPartitions path pickled every row out to Python; Arrow
    # batches + whole-column rendering write the byte-identical files
    # (parity pinned in tests/test_tsv.py)
    def write_part(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        convs = [_TsvType(t) for t in types_local]
        chunks = []
        for b in batches:
            if b.num_rows == 0:
                continue
            cols = [
                c.render_array(b.column(j), "\\N") for j, c in enumerate(convs)
            ]
            chunks.append(
                pc.binary_join_element_wise(*cols, "\t")
                if len(cols) > 1
                else cols[0]
            )
        if not chunks:
            return
        lines = pa.concat_arrays(chunks)
        # one C-side join of the whole partition; the trailing "\n"
        # keeps the file byte-identical to the per-line writer
        la = pa.ListArray.from_arrays(
            pa.array([0, len(lines)], type=pa.int32()), lines
        )
        body = pc.binary_join(la, "\n")[0].as_py()
        fname = os.path.join(out_dir, f"part-{_uuid.uuid4().hex}.tsv")
        with open(fname, "w", encoding="utf-8", newline="") as f:
            if header:
                f.write(header)
            f.write(body)
            f.write("\n")
        yield pa.RecordBatch.from_arrays(
            [pa.array([fname], type=pa.string())], names=["fname"]
        )

    return len(df.mapInArrow(write_part, "fname string").collect())
