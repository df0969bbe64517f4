"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in Catalyst functions (JVM-side,
codegen-able) — no Python UDFs — so they vectorize over 100 TB of
documents exactly like any other column expression:

- tokenization: ``regexp_extract_all`` with an RE2/Java-compatible
  pattern (kept engine-portable so the DuckDB oracle matches);
- token counting: whitespace tokens + a BPE-ish subword estimate;
- quality scoring: length / punctuation ratio / stopword ratio /
  mean word length, the standard pre-training quality heuristics;
- language ID: stopword-hit voting over per-language function words;
- fingerprinting: md5 content fingerprint over normalized text plus a
  shingle-based rolling fingerprint for near-dup blocking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# word-token pattern; identical semantics in Java regex (Spark) and RE2
# (DuckDB) — no lookarounds, no unicode classes.
TOKEN_RE = "[A-Za-z0-9]+"

# BPE-ish subword unit: runs of letters up to 4 chars count ~1 token each;
# approximates byte-pair tokenizers' ~4 chars/token on English text.
BPE_CHARS_PER_TOKEN = 4.0

# tiny per-language function-word lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "en", "por", "que"),
}


def normalize(text: Column) -> Column:
    """Whitespace-collapse + lowercase — the canonical form used by
    fingerprints and exact dedup."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def tokens(text: Column) -> Column:
    """array<string> of word tokens."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def token_count(text: Column) -> Column:
    """Whitespace-ish word-token count."""
    return F.size(tokens(text))


def bpe_token_estimate(text: Column) -> Column:
    """Deterministic BPE-style token-count estimate: ceil(chars/4) per
    word, so short words cost 1 and long words split."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / BPE_CHARS_PER_TOKEN).cast("long"),
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, "[A-Za-z0-9 ]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(0.0)


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """Count of tokens (with multiplicity) that are function words of
    ``lang`` — the core signal for both quality and language ID."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def mean_word_len(text: Column) -> Column:
    t = tokens(text)
    total = F.aggregate(t, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long"))
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: reward stopword presence and
    normal word lengths, penalize very short docs and punctuation noise.
    Deterministic; weights documented, not learned."""
    n_tok = token_count(text)
    sw_ratio = F.when(n_tok > 0, stopword_hits(text) / n_tok).otherwise(0.0)
    len_ok = F.least(n_tok / F.lit(20.0), F.lit(1.0))  # saturates at 20 tokens
    wl = mean_word_len(text)
    wl_ok = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(0.5)
    p = punct_ratio(text)
    p_ok = F.greatest(F.lit(0.0), F.lit(1.0) - p * 4)
    return F.round(
        0.35 * F.least(sw_ratio * 3, F.lit(1.0)) + 0.25 * len_ok + 0.2 * wl_ok + 0.2 * p_ok, 6
    )


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_hits(text, lang)) for lang in STOPWORDS]


def lang_id(text: Column) -> Column:
    """Pick the language whose function words hit most (ties: first in
    declaration order → 'en'), 'unknown' when nothing hits."""
    scores = lang_scores(text)
    best_lang = F.lit("unknown")
    best_score = F.lit(0).cast("int")
    # fold right-to-left so earlier languages win ties with >=
    for lang, score in reversed(scores):
        take = score >= best_score
        # strict improvement required against later langs, so reversed
        # iteration + >= gives first-declared-wins tie semantics
        best_lang = F.when(score >= best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("unknown"))


def content_fingerprint(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of the normalized text (engine-portable
    — DuckDB md5 produces the identical hex)."""
    return F.md5(normalize(text))


def shingles(text: Column, k: int = 5) -> Column:
    """Character k-shingle array over normalized text (for MinHash /
    Jaccard). Built with sequence+transform — pure Catalyst, no UDF."""
    norm = normalize(text)
    n = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(norm, i, k))


def rolling_fingerprint(text: Column, k: int = 8) -> Column:
    """Near-dup blocking fingerprint: min of the 64-bit hashes of the
    k-shingle set (a 1-permutation MinHash). Documents sharing long runs
    of text collide; cheap first-pass blocking key at scale."""
    return F.array_min(F.transform(shingles(text, k), lambda s: F.xxhash64(s)))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document feature frame (the pre-training 'document
    quality table')."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_token_estimate(t).alias("n_bpe_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(mean_word_len(t), 6).alias("mean_word_len"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        content_fingerprint(t).alias("fingerprint"),
    )


# PII redaction patterns: RE2-safe (no lookarounds) so the same pattern
# string runs in Spark (Java regex), DuckDB (RE2) and most downstream
# engines. Conservative by design — a training-data scrub favors
# over-matching an address-like token over leaking one.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d\- ]{7,}\d",
}


def pii_counts(text: Column) -> list[Column]:
    """One count column per PII class (pure Catalyst regex)."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace each PII class with its placeholder token and attach
    per-class match counts — the standard pre-training scrub stage.
    Entirely Catalyst regex (codegen, no UDF): at 100 TB this is a
    map-only pass with zero shuffle."""
    t = F.col(text_col)
    red = t
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select(
        "*",
        *pii_counts(t),
        red.alias(f"{text_col}_redacted"),
    )


def vocab_top(df: DataFrame, text_col: str = "text", size: int = 1000) -> DataFrame:
    """Corpus vocabulary: the ``size`` most frequent tokens (ties break
    alphabetically so the vocab is deterministic across engines and
    cluster layouts). One token-count shuffle; the rank/limit is an
    ``orderBy().limit()`` which Spark plans as TakeOrderedAndProject —
    each partition keeps only its local top-``size``, so the distinct
    token set (O(billions) at web scale: typos, URLs, hashes) is never
    funneled through a single-partition window sort."""
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("t"))
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    return counts.orderBy(F.col("c").desc(), F.col("t")).limit(size).select("t", "c")


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary token fraction against ``vocab``
    (from :func:`vocab_top`) — the coverage gate run before committing
    to a tokenizer. The vocab broadcasts (≤ a few MB even at 100k
    entries); the corpus sees one explode + doc_id re-aggregation."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("t")
    )
    marked = tok.join(
        F.broadcast(vocab.select(F.col("t"), F.lit(1).alias("_in"))), "t", "left"
    )
    return marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("oov_rate"),
    )


def gopher_rules(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1 —
    the standard pre-training repetition/shape gates), all pure
    Catalyst expressions over whitespace words:

    - word count within [min_words, max_words] (50..100k in the paper;
      the thresholds are columns here so the gate is auditable),
    - mean word length within [3, 10],
    - symbol-to-word ratio (#, ellipsis) below 0.1,
    - >= 80% of words contain at least one alphabetic character,
    - >= 2 distinct English stopwords present.

    Emits the measured values AND the per-rule booleans plus the
    overall pass flag — the curation report shape, so downstream can
    tune thresholds without recomputing the scan."""
    text = F.col(text_col)
    words = F.split(F.trim(text), r"\s+")
    n_words = F.size(words)
    mean_wl = F.round(
        F.aggregate(
            words,
            F.lit(0).cast("long"),
            lambda acc, w: acc + F.length(w),
        )
        / F.greatest(n_words, F.lit(1)),
        4,
    )
    n_sym = (
        F.length(text)
        - F.length(F.regexp_replace(text, r"#", ""))
        + F.size(F.regexp_extract_all(text, F.lit(r"\.\.\.|…"), 0))
    )
    symbol_ratio = F.round(n_sym / F.greatest(n_words, F.lit(1)), 4)
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.round(alpha_words / F.greatest(n_words, F.lit(1)), 4)
    sw = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    sw_hits = F.size(
        F.filter(sw, lambda s: F.array_contains(tokens(text), s))
    )
    r_words = (n_words >= 50) & (n_words <= 100_000)
    r_wl = (mean_wl >= 3) & (mean_wl <= 10)
    r_sym = symbol_ratio < 0.1
    r_alpha = alpha_frac >= 0.8
    r_sw = sw_hits >= 2
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        sw_hits.cast("int").alias("stopword_hits"),
        r_words.alias("rule_words"),
        r_wl.alias("rule_word_len"),
        r_sym.alias("rule_symbols"),
        r_alpha.alias("rule_alpha"),
        r_sw.alias("rule_stopwords"),
        (r_words & r_wl & r_sym & r_alpha & r_sw).alias("keep"),
    )


def lexical_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Type/token diversity metrics — the duplication-adjacent curation
    signals (low diversity ⇒ boilerplate/templated text):

    - type_token_ratio = |distinct words| / |words|,
    - hapax_frac = fraction of TYPES occurring exactly once,
    - top_share = most frequent word's share of all tokens.

    One sorted-array run-length fold per document (O(n log n) sort +
    O(n) fold, all codegen — no per-type rescans, no Python)."""
    text = F.col(text_col)
    w = F.sort_array(tokens(text))
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("types"),
        F.lit(0).cast("long").alias("hapax"),
        F.lit(0).cast("long").alias("maxrun"),
    )

    def step(acc, x):
        same = acc.run > 0
        is_cont = same & (x == acc.prev)
        # close the previous run when the word changes
        closed_types = F.when(is_cont, acc.types).otherwise(
            acc.types + F.when(same, 1).otherwise(0)
        )
        closed_hapax = F.when(is_cont, acc.hapax).otherwise(
            acc.hapax + F.when(same & (acc.run == 1), 1).otherwise(0)
        )
        closed_max = F.when(is_cont, acc.maxrun).otherwise(
            F.greatest(acc.maxrun, acc.run)
        )
        new_run = F.when(is_cont, acc.run + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            closed_types.alias("types"),
            closed_hapax.alias("hapax"),
            closed_max.alias("maxrun"),
        )

    def fin(acc):
        # close the final run
        types = acc.types + F.when(acc.run > 0, 1).otherwise(0)
        hapax = acc.hapax + F.when(acc.run == 1, 1).otherwise(0)
        maxrun = F.greatest(acc.maxrun, acc.run)
        return F.struct(
            types.alias("types"), hapax.alias("hapax"), maxrun.alias("maxrun")
        )

    agg = F.aggregate(w, zero, step, fin)
    n = F.size(w)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        agg.types.alias("n_types"),
        F.round(agg.types / F.greatest(n, F.lit(1)), 4).alias(
            "type_token_ratio"
        ),
        F.round(
            agg.hapax / F.greatest(agg.types, F.lit(1)), 4
        ).alias("hapax_frac"),
        F.round(agg.maxrun / F.greatest(n, F.lit(1)), 4).alias("top_share"),
    )


def _fix_mojibake_once(s: str) -> str | None:
    """One reversal of the UTF-8-bytes-mis-decoded-as-Latin-1/cp1252
    defect (the ftfy core case, a public heuristic): if the text
    encodes back to a single-byte charset AND those bytes are valid
    UTF-8 that actually collapses multibyte sequences, the mis-decode
    is reversed; otherwise None. cp1252 is tried first (real crawls'
    curly-quote range 0x80-0x9F), Latin-1 second (covers the C1
    control points cp1252 leaves unmapped)."""
    for enc in ("cp1252", "latin-1"):
        try:
            b = s.encode(enc)
        except UnicodeEncodeError:
            continue
        try:
            d = b.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if len(d) < len(s):  # at least one multibyte char collapsed
            return d
    return None


def fix_mojibake(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fixed",
    passes_col: str | None = "n_passes",
    max_passes: int = 3,
) -> DataFrame:
    """Repair double-encoded text ('mojibake': UTF-8 bytes mis-decoded
    as Latin-1/cp1252 somewhere upstream — the single most common
    encoding defect in web crawls; ftfy's core transformation). Up to
    ``max_passes`` reversals handle double- and triple-encoded text.
    Plain ASCII and already-correct text pass through unchanged (the
    reversal condition is unsatisfiable for them). Inherent ambiguity
    is documented rather than hidden: text that LEGITIMATELY spells a
    valid-UTF-8 byte sequence in Latin-1 characters (e.g. a document
    ABOUT mojibake) is indistinguishable from the defect and will be
    'repaired' — the same ambiguity every repair heuristic carries.

    Map-only Arrow-batched pandas UDF; zero shuffles at any scale."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(f"struct<{out_col}: string, np: int>")
    def fx(texts):
        def one(s):
            if s is None:
                return (None, 0)
            n = 0
            while n < max_passes:
                d = _fix_mojibake_once(s)
                if d is None:
                    break
                s = d
                n += 1
            return (s, n)

        rows = [one(t) for t in texts]
        return pd.DataFrame(rows, columns=[out_col, "np"])

    out = df.withColumn("_fx", fx(F.col(text_col)))
    cols = [c for c in df.columns if c != text_col]
    sel = [*cols, F.col(f"_fx.{out_col}").alias(out_col)]
    if passes_col:
        sel.append(F.col("_fx.np").alias(passes_col))
    return out.select(*sel)


def make_mojibake(s: str, passes: int = 1) -> str:
    """Fixture helper: apply the defect itself (UTF-8 bytes read back
    as Latin-1) ``passes`` times — what a mis-configured reader does."""
    for _ in range(passes):
        s = s.encode("utf-8").decode("latin-1")
    return s


def c4_clean(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2 — the
    published Colossal Clean Crawled Corpus rules), pure Catalyst over
    ``split(text, '\\n')`` with array HOFs (no UDF, map-only):

    line rules — a line is RETAINED iff it
      - ends in a terminal punctuation mark (. ! ? "),
      - has at least 5 whitespace words,
      - does not contain the word "javascript" (case-insensitive);

    page rules — the cleaned document is KEPT iff it
      - still contains at least 3 sentences (terminal-mark count),
      - contains neither "lorem ipsum" (case-insensitive) nor "{".

    Emits the cleaned text plus the audit counters (lines in/kept,
    sentence count, page flag) so thresholds stay tunable downstream
    without re-scanning — the same report shape as gopher_rules.

    Scale: one projection; the line fold is per-row compute inside
    whole-stage codegen, no shuffle, no driver involvement."""
    text = F.col(text_col)
    lines = F.split(text, "\n")
    terminal = lambda l: l.rlike(r'[.!?"]\s*$')  # noqa: E731
    wc5 = lambda l: F.size(F.split(F.trim(l), r"\s+")) >= 5  # noqa: E731
    no_js = lambda l: ~F.lower(l).contains("javascript")  # noqa: E731
    kept = F.filter(
        lines, lambda l: terminal(l) & wc5(l) & no_js(l)
    )
    cleaned = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(cleaned, F.lit(r"[.!?]"), 0))
    page_keep = (
        (n_sent >= 3)
        & ~F.lower(cleaned).contains("lorem ipsum")
        & ~cleaned.contains("{")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        cleaned.alias("cleaned_text"),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_lines_kept"),
        n_sent.cast("int").alias("n_sentences"),
        page_keep.alias("keep_page"),
    )


def blocklist_flags(
    df: DataFrame,
    words: list[str],
    phrases: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style blocklist document filtering (Raffel et al. 2020 §2.2
    drops any page containing a word from a public blocklist; the
    list itself is the caller's input). Pure Catalyst, map-only:
    distinct-token intersection against a literal array for words,
    plus ONE compiled case-insensitive regex alternation for multi-
    word phrases. Emits per-doc ``bad_word_hits`` (distinct blocked
    tokens present), ``has_bad_phrase``, and ``keep``.

    This is the <=~10k-entry path (the literal array broadcasts with
    the plan); for web-scale lists use :func:`blocklist_filter_join`.
    """
    import re as _re

    words_l = sorted({w.lower() for w in words})
    if not words_l:
        raise ValueError("blocklist_flags needs at least one word")
    txt = F.coalesce(F.col(text_col), F.lit(""))  # NULL text = clean
    arr = F.array(*[F.lit(w) for w in words_l])
    hits = F.size(F.array_intersect(F.array_distinct(tokens(txt)), arr))
    if phrases:
        pat = "(?i)" + "|".join(
            _re.escape(p.lower()) for p in sorted(set(phrases))
        )
        phrase_hit = txt.rlike(pat)
    else:
        phrase_hit = F.lit(False)
    return df.select(
        id_col,
        hits.cast("int").alias("bad_word_hits"),
        phrase_hit.alias("has_bad_phrase"),
        ((hits == 0) & ~phrase_hit).alias("keep"),
    )


def blocklist_filter_join(
    df: DataFrame,
    words_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Web-scale blocklist path: the list arrives as a DataFrame
    (column ``w``, pre-lowercased); docs explode to distinct tokens
    and LEFT join the de-duplicated list with a hit marker (AQE
    broadcasts it while it fits, falls back to a shuffle join beyond
    that); ONE per-doc aggregation counts the hits. explode_outer
    keeps a sentinel row per token-less doc, so every document is
    covered without the docs-side join-back the semi-join shape
    needed (optimization r10, guide §2.4). One keyed join, no
    driver-side list materialization — survives lists that would blow
    the literal-array plan."""
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(tokens(F.col(text_col)))
        ).alias("w"),
    )
    marked = toks.join(
        words_df.select("w").distinct().withColumn("_hit", F.lit(1)),
        "w",
        "left",
    )
    return (
        marked.groupBy(id_col)
        .agg(F.count("_hit").alias("_hits"))
        .select(
            id_col,
            F.col("_hits").cast("int").alias("bad_word_hits"),
            (F.col("_hits") == 0).alias("keep"),
        )
    )


def canonical_url(url: Column) -> Column:
    """Canonical URL key for crawl dedup/grouping (the near-universal
    c14n rules: scheme+host lowercase, default :80/:443 ports and
    fragments dropped, tracking parameters — utm_*, gclid, fbclid,
    ref — removed, remaining query parameters SORTED, trailing slash
    trimmed off non-root paths, a bare host gets '/'). Pure Catalyst,
    map-only; NULL stays NULL."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    path_q = F.regexp_replace(rest, r"^[^/?]+", "")
    path = F.regexp_extract(path_q, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", "$1")
    )
    query = F.regexp_extract(path_q, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="),
    )
    qs = F.array_join(F.array_sort(kept), "&")
    return F.when(
        url.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            scheme, F.lit("://"), host, path,
            F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
        )
    )
