"""WARC source + HTML extraction (sources/warc.py): hand-built
records pin the ISO 28500 layout independently of the fixture writer;
gzip member concatenation, HTTP split, extraction rules, quarantine."""

from __future__ import annotations

import gzip
import io

import pytest

from clickhouse_learning_spark.sources import warc as W


def _rec(headers, payload):
    head = [b"WARC/1.0"]
    head += [f"{k}: {v}".encode() for k, v in headers]
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def test_hand_built_records_and_header_case():
    data = (_rec([("WARC-Type", "request"),
                  ("WARC-Target-URI", "http://x/1")], b"GET / HTTP/1.1")
            + _rec([("warc-type", "response"),
                    ("WARC-TARGET-URI", "http://x/2")], b"HTTP..."))
    recs = W.parse_warc(data)
    assert [r["headers"]["warc-type"] for r in recs] == \
        ["request", "response"]
    assert recs[1]["headers"]["warc-target-uri"] == "http://x/2"
    assert recs[0]["payload"] == b"GET / HTTP/1.1"


def test_gzip_member_concatenation():
    raw1 = _rec([("WARC-Type", "metadata")], b"a: 1")
    raw2 = _rec([("WARC-Type", "metadata")], b"b: 2")
    out = io.BytesIO()
    for r in (raw1, raw2):
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as f:
            f.write(r)
    recs = W.parse_warc(out.getvalue())
    assert [r["payload"] for r in recs] == [b"a: 1", b"b: 2"]


def test_http_response_split():
    st, hh, body = W.parse_http_response(
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n"
        b"X-Other: y\r\n\r\nmissing!")
    assert st == 404 and hh["content-type"] == "text/plain"
    assert body == b"missing!"
    with pytest.raises(ValueError, match="HTTP"):
        W.parse_http_response(b"not http at all")


def test_html_to_text_rules():
    html = (b"<html><script>ignore();</script><style>x{}</style>"
            b"<!-- gone --><p>one &lt;two&gt;</p><div>three</div>"
            b"<span>four</span> five</html>")
    assert W.html_to_text(html) == "one <two>\nthree\nfour five"
    # nested/self-closing block tags become line breaks, tags vanish
    assert W.html_to_text(b"a<br/>b<h2 class='x'>c</h2>d") == \
        "a\nb\nc\nd"
    assert W.html_to_text(b"") == ""


def test_error_gates():
    with pytest.raises(ValueError, match="WARC/ version"):
        W.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        W.parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\npayload")
    good = W.build_fixture_warc(1, gzipped=False)
    with pytest.raises(ValueError, match="overruns"):
        W.parse_warc(good[:len(good) - 40])


def test_read_warc_quarantines(spark, tmp_path):
    for i in range(4):
        p = tmp_path / f"f{i}.warc.gz"
        if i == 2:
            p.write_bytes(b"\x1f\x8bbroken gzip")
        else:
            p.write_bytes(W.build_fixture_warc(i))
    rows = W.read_warc(spark, str(tmp_path)).collect()
    good = [r for r in rows if r.warc_error is None]
    bad = [r for r in rows if r.warc_error is not None]
    assert len(good) == 3 and len(bad) == 1
    by_url = {r.url: r for r in good}
    assert by_url["http://site0.example/p/0"].text == \
        W.fixture_expected_text(0)
    assert all(r.http_status == 200 for r in good)
