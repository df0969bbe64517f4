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


def test_member_boundaries_and_chunking():
    """Boundary index: one offset per gzip member (2 per fixture id) /
    per record when uncompressed; chunk spans cover the stream exactly
    and start on boundaries."""
    gz = b"".join(W.build_fixture_warc(i) for i in range(5))
    offs = W._member_boundaries(gz)
    assert offs[0] == 0 and offs[-1] == len(gz)
    assert len(offs) == 5 * 2 + 1  # warcinfo + response per id
    for o in offs[:-1]:
        assert gz[o:o + 2] == b"\x1f\x8b"
    raw = b"".join(W.build_fixture_warc(i, gzipped=False)
                   for i in range(5))
    offs_r = W._member_boundaries(raw)
    assert len(offs_r) == 5 * 2 + 1
    for o in offs_r[:-1]:
        assert raw.startswith(b"WARC/", o)
    # chunking: contiguous, boundary-aligned, covers everything
    ch = W._chunk_ranges(offs, 1500)
    assert ch[0][0] == 0 and ch[-1][1] == len(gz)
    assert all(a[1] == b[0] for a, b in zip(ch, ch[1:]))
    assert len(ch) > 1
    assert set(c[0] for c in ch) <= set(offs)


@pytest.mark.parametrize("gzipped", [True, False])
def test_read_warc_split_parity(spark, tmp_path, gzipped):
    """The straggler-resistant two-phase range read must produce
    row-identical output to the one-file-per-task walk — with a
    chunk size small enough to force many chunks per file (the
    adversarial few-big-archives layout), and the same quarantine
    behavior for a corrupt file."""
    sub = tmp_path / ("gz" if gzipped else "raw")
    sub.mkdir()
    for f in range(3):
        blob = b"".join(
            W.build_fixture_warc(f * 20 + i, gzipped=gzipped)
            for i in range(20)
        )
        (sub / f"f{f}.warc{'.gz' if gzipped else ''}").write_bytes(blob)
    (sub / "broken.warc.gz").write_bytes(b"\x1f\x8bbroken gzip")

    def key(t):
        return tuple((x is None, str(x)) for x in t)

    base = sorted(
        (tuple(r) for r in W.read_warc(spark, str(sub)).collect()),
        key=key,
    )
    split = sorted(
        (tuple(r) for r in W.read_warc_split(
            spark, str(sub), chunk_bytes=2048).collect()),
        key=key,
    )
    # quarantine messages may differ in wording between the walk and
    # the index pass; compare good rows exactly and bad rows by count
    bad_b = [r for r in base if r[-1] is not None]
    bad_s = [r for r in split if r[-1] is not None]
    assert len(bad_b) == len(bad_s) == 1
    assert [r for r in base if r[-1] is None] == \
        [r for r in split if r[-1] is None]
    assert len([r for r in base if r[-1] is None]) == 60


@pytest.mark.parametrize("gzipped", [True, False])
def test_salvage_parity_one_malformed_record(spark, tmp_path, gzipped):
    """ADVICE r6: a file that decompresses cleanly but contains ONE
    malformed record must salvage identically through both readers —
    good rows from every healthy unit plus exactly one quarantine row
    for the broken unit, with the SAME error message (both paths run
    the shared _rows_from_stream salvage)."""
    import gzip as _gz

    sub = tmp_path / "d"
    sub.mkdir()
    bad_unit = b"NOT-A-WARC-RECORD\r\n\r\n"
    if gzipped:
        blob = (W.build_fixture_warc(0) + _gz.compress(bad_unit)
                + W.build_fixture_warc(1))
    else:
        # plain stream: the header walk dies AT the malformed record,
        # so the good record BEFORE it salvages; the one after is part
        # of the unreadable tail on both sides
        blob = (W.build_fixture_warc(0, gzipped=False) + bad_unit
                + W.build_fixture_warc(1, gzipped=False))
    (sub / f"f.warc{'.gz' if gzipped else ''}").write_bytes(blob)

    def key(t):
        return tuple((x is None, str(x)) for x in t)

    base = sorted((tuple(r) for r in
                   W.read_warc(spark, str(sub)).collect()), key=key)
    split = sorted((tuple(r) for r in W.read_warc_split(
        spark, str(sub), chunk_bytes=512).collect()), key=key)
    assert base == split  # full rows INCLUDING the error message
    good = [r for r in base if r[-1] is None]
    bad = [r for r in base if r[-1] is not None]
    assert len(bad) == 1
    # gzip: units are members, both flanking records survive; plain:
    # the walk can't resync past the malformed bytes, prefix only
    assert len(good) == (2 if gzipped else 1)


def test_salvage_parity_truncated_gzip_tail(spark, tmp_path):
    """A stream whose gzip walk dies mid-file salvages the walkable
    PREFIX through both readers: the split index emits chunks for the
    walked members plus one tail-quarantine row, matching the unsplit
    per-member salvage row-for-row."""
    sub = tmp_path / "d"
    sub.mkdir()
    good = W.build_fixture_warc(3)
    (sub / "f.warc.gz").write_bytes(good + b"\x1f\x8btruncated tail")

    def key(t):
        return tuple((x is None, str(x)) for x in t)

    base = sorted((tuple(r) for r in
                   W.read_warc(spark, str(sub)).collect()), key=key)
    split = sorted((tuple(r) for r in W.read_warc_split(
        spark, str(sub), chunk_bytes=512).collect()), key=key)
    assert base == split
    assert len([r for r in base if r[-1] is None]) == 1  # the response
    assert len([r for r in base if r[-1] is not None]) == 1
