"""Blocklist filtering laws (operators/text.py r5-late): the
literal-array and semi-join paths agree, the literal path is
shuffle-free, phrases match across word boundaries, NULL text is
clean."""

from pyspark.sql import functions as F

def test_blocklist_flags_and_join_path_agree(spark):
    """Literal-array and semi-join blocklist paths flag identically;
    the literal path is shuffle-free; phrases hit across word
    boundaries."""
    from clickhouse_learning_spark.operators import text as TX

    docs = spark.createDataFrame(
        [
            (1, "a slow scan of the table"),   # word + phrase
            (2, "all good here"),
            (3, "Fail FAST and DROP it"),      # two words, case-folded
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in TX.blocklist_flags(
        docs, ["slow", "fail", "drop"], ["slow scan"]).collect()}
    assert out[1].bad_word_hits == 1 and out[1].has_bad_phrase
    assert out[2].keep and out[2].bad_word_hits == 0
    assert out[3].bad_word_hits == 2 and not out[3].has_bad_phrase
    assert not out[3].keep
    assert out[4].bad_word_hits == 0 and out[4].keep

    plan = TX.blocklist_flags(docs, ["slow"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # map-only

    words_df = spark.createDataFrame(
        [("slow",), ("fail",), ("drop",)], "w string")
    joined = {r.doc_id: r for r in TX.blocklist_filter_join(
        docs, words_df).collect()}
    for d in (1, 2, 3, 4):
        assert joined[d].bad_word_hits == out[d].bad_word_hits
        # join path has no phrase channel; keep = word rule only
        assert joined[d].keep == (out[d].bad_word_hits == 0)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least one word"):
        TX.blocklist_flags(docs, [])


def test_canonical_url_rules(spark):
    """c14n rules one by one: case, default ports, fragments,
    tracking params, param sort, trailing slash, bare host, NULL."""
    from clickhouse_learning_spark.operators.text import canonical_url

    cases = [
        ("HTTP://WWW.Ex.COM:80/A/B/", "http://www.ex.com/A/B"),
        ("https://ex.com:443/x?b=2&a=1", "https://ex.com/x?a=1&b=2"),
        ("https://ex.com:8443/x", "https://ex.com:8443/x"),  # kept
        ("http://ex.com/p?utm_source=a&q=1&gclid=z&ref=t",
         "http://ex.com/p?q=1"),
        ("http://ex.com/p?utm_source=only", "http://ex.com/p"),
        ("http://EX.com", "http://ex.com/"),
        ("http://ex.com/#frag", "http://ex.com/"),
        ("http://ex.com/deep/path/?x=1#y", "http://ex.com/deep/path?x=1"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, u string")
    got = {r.i: r.c for r in
           df.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i], want)


def test_canonical_url_vs_urllib_reference(spark):
    """Seeded sweep vs an INDEPENDENT reference built on
    urllib.parse (different machinery from the regex pipeline)."""
    import random
    from urllib.parse import urlsplit

    def ref(url):
        sp = urlsplit(url)
        scheme = sp.scheme.lower()
        host = sp.netloc.lower()
        # the op drops :80/:443 regardless of scheme (documented
        # simplification) — mirror that
        if host.endswith(":80") or host.endswith(":443"):
            host = host.rsplit(":", 1)[0]
        path = sp.path or "/"
        if len(path) > 1 and path.endswith("/"):
            path = path[:-1]
        params = [p for p in sp.query.split("&") if p]
        # the op strips tracking params in NAME=value form only
        kept = [p for p in params if "=" not in p or not (
            p.split("=", 1)[0].startswith("utm_")
            or p.split("=", 1)[0] in ("gclid", "fbclid", "ref"))]
        q = "&".join(sorted(kept))
        return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")

    rng = random.Random(42)
    hosts = ["Ex.COM", "a.b.example", "X9.net:80", "s.example:443",
             "odd.example:8080"]
    paths = ["", "/", "/A/b", "/A/b/", "/x%20y/"]
    queries = ["", "?b=2&a=1", "?utm_source=m&q=1", "?gclid=1",
               "?z=9&utm_campaign=c&y=8", "?ref=t&k=v"]
    frags = ["", "#top"]
    urls = []
    for _ in range(150):
        scheme = rng.choice(["http", "HTTPS"])
        u = (scheme + "://" + rng.choice(hosts) + rng.choice(paths)
             + rng.choice(queries) + rng.choice(frags))
        urls.append(u)
    from clickhouse_learning_spark.operators.text import canonical_url

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, u string")
    got = {r.i: r.c for r in df.select(
        "i", canonical_url(F.col("u")).alias("c")).collect()}
    for i, u in enumerate(urls):
        # the op treats :80/:443 as default regardless of scheme —
        # mirror that (documented simplification)
        assert got[i] == ref(u), (u, got[i], ref(u))


# ------------------------------------------------------------- mojibake
def test_mojibake_single_and_double_repair(spark):
    from clickhouse_learning_spark.operators import text as TX

    orig = "café — naïve résumé 中文 ok"
    rows = [
        (1, TX.make_mojibake(orig, 1)),
        (2, TX.make_mojibake(orig, 2)),
        (3, orig),                      # already correct: untouched
        (4, "plain ascii stays"),       # ascii: untouched
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["fixed"], r["n_passes"])
           for r in TX.fix_mojibake(df).collect()}
    assert got[1] == (orig, 1)
    assert got[2] == (orig, 2)
    assert got[3] == (orig, 0)
    assert got[4] == ("plain ascii stays", 0)
    assert got[5] == (None, 0)


def test_mojibake_cp1252_curly_quote_range(spark):
    """The 0x80-0x9F range: curly quotes / em-dash corrupt into cp1252
    punctuation (â€™ â€” etc.) — the branch Latin-1 alone can't
    reverse when the corrupting reader was cp1252."""
    from clickhouse_learning_spark.operators import text as TX

    orig = "it’s fine — really…"
    bad = orig.encode("utf-8").decode("cp1252")
    assert "â€™" in bad
    df = spark.createDataFrame([(1, bad)], "doc_id long, text string")
    [r] = TX.fix_mojibake(df).collect()
    assert (r["fixed"], r["n_passes"]) == (orig, 1)


def test_mojibake_no_false_positive_on_stray_high_bytes(spark):
    """A lone é (an invalid UTF-8 byte sequence when re-encoded) must
    NOT be 'repaired'; the documented ambiguity case (text that
    legitimately spells valid UTF-8 in Latin-1 chars) IS repaired."""
    from clickhouse_learning_spark.operators import text as TX

    df = spark.createDataFrame(
        [(1, "café plain"), (2, "literally Ã© here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["fixed"], r["n_passes"])
           for r in TX.fix_mojibake(df).collect()}
    assert got[1] == ("café plain", 0)
    assert got[2] == ("literally é here", 1)  # inherent ambiguity
