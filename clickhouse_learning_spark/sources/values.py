"""ClickHouse ``Values`` format source + sink — the INSERT wire form
(``INSERT INTO t VALUES (…),(…)``; ``SELECT … FORMAT Values``), the
fourth text/binary member of the CH export family next to RowBinary
(binary rows), Native (binary columns) and TabSeparated (text rows).

Rendering per CH's text output: rows are parenthesized tuples
separated by commas; strings/dates/datetimes are SINGLE-QUOTED with
backslash escapes (``\\\\ \\' \\n \\t \\r \\b \\f \\0``) — the reader
additionally accepts SQL doubled-quote escaping (``''`` inside a
literal = one quote), which CH's INSERT-wire Values parser allows
(ADVICE r8) — SQL NULL is
the bare literal ``NULL``, integers plain, floats shortest-roundtrip
(``inf``/``-inf``/``nan`` spelled like CH), Date ``'YYYY-MM-DD'``,
DateTime ``'YYYY-MM-DD hh:mm:ss'``, DateTime64 with the scale's
fractional digits. One-level ``Array(scalar)`` uses the natural
bracket form (``[1,2,3]``, ``['a','b']``); nested
arrays/Map/Tuple/AggregateFunction gate with a pointer to the exact
binary paths (sources/rowbinary.py, sources/native.py) — quoted-
literal re-parsing of deep nesting is where silent corruption lives.

Framing: CH's Values stream has NO header, so the reader takes
(names, ch_types) explicitly — the same contract as headerless
``read_tsv``. The writer emits one row per line (``(…),``), and
because every control character inside strings is backslash-escaped a
raw newline can never appear inside a value — which is what makes
:func:`read_values_split` safe to snap byte ranges to ``\\n(``
boundaries (the read_tsv_split guarantee).

Scale shape: write = one file per partition (mapPartitions, no
driver staging); plain read = one file per task (binaryFile); split
read = byte-range chunks snapped to row starts, parallelism =
bytes/chunk instead of file count.
"""

from __future__ import annotations

import os
import re
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from clickhouse_learning_spark.sources.tsv import _TsvType

_ESCAPES = {
    "\\": "\\\\", "'": "\\'", "\n": "\\n", "\t": "\\t",
    "\r": "\\r", "\b": "\\b", "\f": "\\f", "\0": "\\0",
}
_UNESCAPES = {
    "\\": "\\", "'": "'", "n": "\n", "t": "\t",
    "r": "\r", "b": "\b", "f": "\f", "0": "\0",
}


_TRANS = str.maketrans(_ESCAPES)
# one C regex scan decides whether a column needs the escape walk at
# all (r10 writer fast path) — exactly the _ESCAPES key set
_NEEDS_ESCAPE_RE = r"[\\\t\n\r\x08\x0c\x00']"


def _quote(s: str) -> str:
    return "'" + s.translate(_TRANS) + "'"


def _unquote(s: str) -> str:
    if len(s) < 2 or s[0] != "'" or s[-1] != "'":
        raise ValueError(f"Values: expected quoted literal, got {s!r}")
    out = []
    i, n = 1, len(s) - 1
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n:
            nxt = s[i + 1]
            # unknown escape keeps the char (the TSV/CH convention)
            out.append(_UNESCAPES.get(nxt, nxt))
            i += 2
            continue
        if ch == "'" and i + 1 < n and s[i + 1] == "'":
            # SQL doubled-quote escape — CH's Values (INSERT wire)
            # parser accepts '' inside a literal alongside \' (ADVICE
            # r8: 'x''y' must decode to x'y, not x''y)
            out.append("'")
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


class _ValuesType:
    """CH-type ↔ Values-literal converter. Scalars delegate to the TSV
    converter's type core; quoting/escaping is Values-specific; one
    level of Array(scalar) is native to the format."""

    _DEEP = re.compile(r"^(Map|Tuple|AggregateFunction)\(")

    def __init__(self, ch_type: str):
        t = ch_type.strip()
        if self._DEEP.match(t):
            raise ValueError(
                f"Values type {ch_type!r}: Map/Tuple use CH's nested "
                "quoted-literal forms — export them via the exact "
                "binary paths instead (sources/rowbinary.py or "
                "sources/native.py)"
            )
        arr = re.fullmatch(r"Array\((.*)\)", t)
        self.inner = None
        if arr:
            inner = arr.group(1).strip()
            if re.match(r"^(Array|Map|Tuple|AggregateFunction)\(", inner):
                raise ValueError(
                    f"Values type {ch_type!r}: nested composites use "
                    "CH's recursive quoted-literal forms — export them "
                    "via the exact binary paths instead "
                    "(sources/rowbinary.py or sources/native.py)"
                )
            self.inner = _ValuesType(inner)
            self.core = None
        else:
            self.core = _TsvType(t)
        self.ch_type = ch_type

    def spark_type(self) -> T.DataType:
        if self.inner is not None:
            return T.ArrayType(self.inner.spark_type())
        return self.core.spark_type()

    def render(self, v) -> str:
        if v is None:
            return "NULL"
        if self.inner is not None:
            return "[" + ",".join(self.inner.render(x) for x in v) + "]"
        c = self.core
        if c.base == "Int":
            return str(int(v))
        if c.base == "Float":
            return repr(float(v))  # shortest roundtrip; inf/nan like CH
        if c.base == "String":
            return _quote(str(v))
        # Date/DateTime/DateTime64 reuse the TSV digits, quoted
        return "'" + c.render(v) + "'"

    def render_array(self, col, null_token: str = "NULL"):
        """Whole-column render of one Arrow array (r10, guide §4.3) —
        returns a pyarrow string array. Int/Float delegate to the
        shared Arrow lanes (:meth:`_TsvType.render_array`, identical
        text forms); String quote-wraps in C, paying the escape walk
        only when one regex scan finds an escapable character; dates
        and composites walk :meth:`render`, the semantics source of
        truth."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if self.inner is None and self.core.base in ("Int", "Float"):
            return self.core.render_array(col, null_token)
        if self.inner is None and self.core.base == "String":
            hits = pc.match_substring_regex(col, _NEEDS_ESCAPE_RE)
            if pc.any(hits).as_py():
                out = pa.array(
                    [None if v is None else _quote(v) for v in col.to_pylist()],
                    type=pa.string(),
                )
            else:
                out = pc.binary_join_element_wise("'", col, "'", "")
            return pc.fill_null(out, null_token)
        out = pa.array(
            [null_token if v is None else self.render(v) for v in col.to_pylist()],
            type=pa.string(),
        )
        return out

    def parse(self, raw: str):
        raw = raw.strip()
        if raw == "NULL":
            return None
        if self.inner is not None:
            if not (raw.startswith("[") and raw.endswith("]")):
                raise ValueError(f"Values: expected array, got {raw!r}")
            body = raw[1:-1].strip()
            if not body:
                return []
            return [self.inner.parse(f) for f in _split_fields(body)]
        c = self.core
        if c.base in ("String", "Date", "DateTime", "DateTime64"):
            return c.parse(_unquote(raw))
        return c.parse(raw)


def _split_fields(body: str) -> list[str]:
    """Split on top-level commas (quote- and bracket-aware)."""
    fields, cur = [], []
    depth = 0
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch == "'":
            cur.append(ch)
            i += 1
            while i < n:
                d = body[i]
                cur.append(d)
                if d == "\\" and i + 1 < n:
                    cur.append(body[i + 1])
                    i += 2
                    continue
                i += 1
                if d == "'":
                    if i < n and body[i] == "'":
                        # SQL '' escape: still inside the literal
                        cur.append(body[i])
                        i += 1
                        continue
                    break
            continue
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    fields.append("".join(cur).strip())
    return fields


def parse_values(text: str, ch_types: list[str]) -> list[tuple]:
    """Decode one Values stream: ``(…) , (…) …`` with arbitrary
    whitespace/newlines (and a trailing ``;``) between rows."""
    conv = [_ValuesType(t) for t in ch_types]
    rows: list[tuple] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in " \t\r\n,;":
            i += 1
            continue
        if ch != "(":
            raise ValueError(
                f"Values: expected '(' at offset {i}, found {ch!r}"
            )
        i += 1
        # single fused walk: fields split at top-level commas while
        # scanning for the row's closing paren
        fields: list[str] = []
        cur: list[str] = []
        depth = 0
        while True:
            if i >= n:
                raise ValueError("Values: unterminated row")
            c = text[i]
            if c == "'":
                cur.append(c)
                i += 1
                while True:
                    if i >= n:
                        raise ValueError("Values: unterminated string")
                    d = text[i]
                    cur.append(d)
                    if d == "\\":
                        if i + 1 >= n:
                            raise ValueError("Values: dangling escape")
                        cur.append(text[i + 1])
                        i += 2
                        continue
                    i += 1
                    if d == "'":
                        if i < n and text[i] == "'":
                            # SQL '' escape: still inside the literal
                            cur.append(text[i])
                            i += 1
                            continue
                        break
                continue
            if c == "[":
                depth += 1
            elif c == "]":
                depth -= 1
            elif c == "," and depth == 0:
                fields.append("".join(cur).strip())
                cur = []
                i += 1
                continue
            elif c == ")" and depth == 0:
                fields.append("".join(cur).strip())
                i += 1
                break
            cur.append(c)
            i += 1
        if len(fields) != len(conv):
            raise ValueError(
                f"Values: row has {len(fields)} fields, schema has "
                f"{len(conv)}"
            )
        rows.append(tuple(cv.parse(f) for cv, f in zip(conv, fields)))
    return rows


def _values_pdf(text: str, ch_types: list[str], names: list[str]):
    """Fast columnar decode of a WRITER-SHAPED Values stream, or None
    when the stream needs the general scalar walk (optimization r10,
    guide §4.2: one C-regex pass over the whole chunk + numpy column
    casts instead of a per-character Python scanner — same grammar, and
    ANY line the row regex does not fully match falls the whole chunk
    back to :func:`parse_values`, so irregular CH streams and every
    escape corner keep the exact scalar semantics).

    Fast-path scope: scalar-only schemas (arrays carry top-level commas
    and brackets, so they stay on the bracket-aware walk) and
    one-row-per-line layout (what :func:`write_values` emits; raw
    newlines cannot occur inside values because the writer escapes
    every control character)."""
    import re as _re

    import numpy as np
    import pandas as pd

    conv = [_ValuesType(t) for t in ch_types]
    if any(c.inner is not None for c in conv):
        return None
    tok = r"('(?:[^'\\]|\\.|'')*'|[^,()']*)"
    row_re = _re.compile(r"\(" + ",".join([tok] * len(conv)) + r"\)")
    # one C pass extracts every row's fields; a second C pass proves
    # COVERAGE — if anything beyond row separators survives the sub,
    # the stream is not writer-shaped and the scalar walk decides
    groups = row_re.findall(text)
    if _re.sub(row_re, "", text).strip(" \t\r\n,;"):
        return None
    if len(conv) == 1:
        groups = [(g,) for g in groups]
    if not groups:
        return pd.DataFrame({n: [] for n in names})
    cols = list(zip(*groups))
    out = {}
    for name, c, raw in zip(names, conv, cols):
        toks = np.asarray(raw, dtype=object)
        null_mask = toks == "NULL"
        any_null = bool(null_mask.any())
        base = c.core.base
        if base == "Int" and not any_null:
            out[name] = np.asarray(raw).astype(np.int64)
            continue
        if base == "Float" and not any_null:
            out[name] = np.asarray(raw).astype(np.float64)
            continue
        if base == "String" and not any_null:
            s = pd.Series(toks, dtype=object)
            plain = s.str[1:-1]
            # unescape only where an escape can occur (backslash or
            # SQL '' doubling inside the literal)
            esc = s.str.contains("\\", regex=False) | plain.str.contains(
                "''", regex=False
            )
            if esc.any():
                plain[esc] = s[esc].map(_unquote)
            out[name] = plain.to_numpy(dtype=object)
            continue
        vals = np.empty(len(toks), dtype=object)
        for i, t in enumerate(toks):
            if t == "NULL":
                vals[i] = None
            elif base == "Int":
                vals[i] = int(t)
            elif base == "Float":
                vals[i] = float(t)
            elif base == "String":
                # quoted by the grammar; unescape only when an escape
                # can occur (backslash or SQL '' doubling present)
                vals[i] = (
                    _unquote(t) if "\\" in t or "''" in t[1:-1]
                    else t[1:-1]
                )
            else:  # Date/DateTime/DateTime64 — quoted digits
                vals[i] = c.core.parse(t[1:-1])
        out[name] = vals
    return pd.DataFrame(out)


def _schema(names: list[str], ch_types: list[str]) -> T.StructType:
    return T.StructType([
        T.StructField(nm, _ValuesType(t).spark_type(), True)
        for nm, t in zip(names, ch_types)
    ])


def read_values(
    spark: SparkSession,
    path: str,
    names: list[str],
    ch_types: list[str],
) -> DataFrame:
    """One file per task; Values carries no header, so the schema is
    explicit (the headerless read_tsv contract)."""
    if len(names) != len(ch_types):
        raise ValueError("names and ch_types must align")
    schema = _schema(names, ch_types)
    binf = spark.read.format("binaryFile").load(path).select("content")
    if binf.head() is None:
        raise ValueError(f"no Values files under {path}")

    def gen(batches):
        import pandas as pd

        for b in batches:
            for blob in b["content"]:
                txt = bytes(blob).decode("utf-8")
                pdf = _values_pdf(txt, ch_types, names)
                if pdf is None:
                    pdf = pd.DataFrame(
                        parse_values(txt, ch_types), columns=names
                    )
                yield pdf

    return binf.mapInPandas(gen, schema)


def read_values_split(
    spark: SparkSession,
    path: str,
    names: list[str],
    ch_types: list[str],
    chunk_bytes: int = 4 << 20,
) -> DataFrame:
    """Byte-range split reader: chunks snap forward to the next
    ``\\n(`` row start (safe: the writer backslash-escapes every
    control character, so raw newlines never occur inside values).
    Parallelism = total bytes / chunk_bytes instead of file count."""
    if len(names) != len(ch_types):
        raise ValueError("names and ch_types must align")
    schema = _schema(names, ch_types)
    binf = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    if binf.head() is None:
        raise ValueError(f"no Values files under {path}")

    def index(batches):
        import pandas as pd

        for b in batches:
            out = []
            for p, blob in zip(b["path"], b["content"]):
                size = len(blob)
                lo = 0
                while lo < size:
                    out.append((p, lo, min(lo + chunk_bytes, size)))
                    lo += chunk_bytes
            yield pd.DataFrame(out, columns=["path", "lo", "hi"])

    chunks = binf.mapInPandas(
        index, "path string, lo long, hi long"
    ).repartition("path", "lo")

    def extract(batches):
        import pandas as pd

        for b in batches:
            for p, lo, hi in zip(b["path"], b["lo"], b["hi"]):
                with open(p.replace("file:", ""), "rb") as fh:
                    data = fh.read()
                # a chunk owns the rows whose row-head '(' byte index
                # lies in [lo, hi); row heads are byte 0 or any "\n("
                if lo == 0:
                    start = 0
                else:
                    pos = data.find(b"\n(", lo - 1)
                    if pos < 0 or pos + 1 >= hi:
                        continue
                    start = pos + 1
                pos = data.find(b"\n(", max(hi - 1, start))
                end = len(data) if pos < 0 else pos + 1
                txt = data[start:end].decode("utf-8")
                pdf = _values_pdf(txt, ch_types, names)
                if pdf is None:
                    pdf = pd.DataFrame(
                        parse_values(txt, ch_types), columns=names
                    )
                yield pdf

    return chunks.mapInPandas(extract, schema)


def write_values(
    df: DataFrame,
    out_dir: str,
    ch_types: list[str],
) -> int:
    """One ``part-*.values`` per partition, one row per line
    (``(…),`` — the last row of a file carries no trailing comma);
    returns files written."""
    if len(ch_types) != len(df.columns):
        raise ValueError("ch_types must match df.columns")
    conv = [_ValuesType(t) for t in ch_types]
    os.makedirs(out_dir, exist_ok=True)

    # mapInArrow writer (r10, guide §1.4/§4.3): the former
    # df.rdd.mapPartitions path pickled every row out to Python; Arrow
    # batches + whole-column rendering write the byte-identical files
    # (parity pinned in tests/test_values.py)
    def write_part(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        chunks = []
        for b in batches:
            if b.num_rows == 0:
                continue
            cols = [c.render_array(b.column(j)) for j, c in enumerate(conv)]
            body = (
                pc.binary_join_element_wise(*cols, ",")
                if len(cols) > 1
                else cols[0]
            )
            chunks.append(pc.binary_join_element_wise("(", body, ")", ""))
        if not chunks:
            return
        lines = pa.concat_arrays(chunks)
        la = pa.ListArray.from_arrays(
            pa.array([0, len(lines)], type=pa.int32()), lines
        )
        fname = os.path.join(out_dir, f"part-{_uuid.uuid4().hex}.values")
        with open(fname, "w", encoding="utf-8") as fh:
            fh.write(pc.binary_join(la, ",\n")[0].as_py())
            fh.write("\n")
        yield pa.RecordBatch.from_arrays(
            [pa.array([fname], type=pa.string())], names=["fname"]
        )

    return len(df.mapInArrow(write_part, "fname string").collect())
