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


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the WARC convention of
    one member per record)."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed
    return b"".join(out)


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
    pass, one archive per task; a malformed FILE yields a single
    quarantine row naming the error instead of killing the task."""
    import pandas as pd

    binf = spark.read.format("binaryFile").load(path)
    want = tuple(record_types)

    def gen(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                try:
                    for rec in parse_warc(bytes(blob)):
                        h = rec["headers"]
                        rtype = h.get("warc-type", "")
                        if rtype not in want:
                            continue
                        status = None
                        ctype = h.get("content-type")
                        text = None
                        if rtype == "response":
                            st, hh, body = parse_http_response(
                                rec["payload"])
                            status = st
                            ctype = hh.get("content-type", ctype)
                            if ctype and "html" in ctype:
                                text = html_to_text(body)
                            else:
                                text = body.decode("utf-8", "replace")
                        rows.append((
                            h.get("warc-target-uri"),
                            h.get("warc-date"), rtype, status,
                            ctype, text, None,
                        ))
                except Exception as exc:
                    rows.append((None, None, None, None, None, None,
                                 str(exc)[:200]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields])

    return binf.select("content").mapInPandas(gen, WARC_SCHEMA)


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


def build_fixture_warc(i: int, gzipped: bool = True) -> bytes:
    """One warcinfo record + one HTML response per id: the url,
    date, status and page text all derive from ``i``."""
    i = int(i)
    j = i * 7 % 100
    html_body = _HTML_TEMPLATE.format(i=i, j=j).encode()
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
