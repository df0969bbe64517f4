"""WordPiece tokenizer laws (operators/wordpiece.py): greedy
longest-match-first encoding, whole-word [UNK] semantics, the
likelihood merge rule verified by brute force, merge convergence,
and layout-independent training."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from clickhouse_learning_spark.operators import wordpiece as WP


def test_greedy_longest_match_first():
    vocab = {"un", "##able", "##a", "##b", "##l", "##e", "u", "##n", "a"}
    # longest prefix "un" wins over "u"; longest continuation "##able"
    # wins over the char ladder
    assert WP.encode_word("unable", vocab) == ["un", "##able"]
    # falls back to shorter pieces when the long ones miss
    assert WP.encode_word("ua", vocab) == ["u", "##a"]
    assert WP.encode_word("aa", vocab) == ["a", "##a"]


def test_unk_is_whole_word():
    vocab = {"a", "##b"}
    assert WP.encode_word("abz", vocab) == [WP.UNK]  # z uncoverable
    assert WP.encode_word("zab", vocab) == [WP.UNK]  # initial z too
    assert WP.encode_word("ab", vocab) == ["a", "##b"]


def test_first_merge_maximizes_likelihood(spark):
    """Brute-force the likelihood score over the initial symbolization
    and check the trainer's first merge picks its argmax (exact
    fractions, lexicographic ties)."""
    from fractions import Fraction

    rows = [("low low low lower newest newest newest widest",)]
    df = spark.createDataFrame(rows, "text string")
    vocab = WP.train_wordpiece(df, n_merges=1)
    learned = vocab[-1]  # the single merge's output symbol

    words = Counter(rows[0][0].split())
    syms_c: Counter = Counter()
    pair_c: Counter = Counter()
    for w, c in words.items():
        syms = WP._word_symbols(w)
        for s in syms:
            syms_c[s] += c
        for p in zip(syms, syms[1:]):
            pair_c[p] += c
    best_score = max(
        Fraction(c, syms_c[a] * syms_c[b]) for (a, b), c in pair_c.items()
    )
    best = min(
        p for p, c in pair_c.items()
        if Fraction(c, syms_c[p[0]] * syms_c[p[1]]) == best_score
    )
    assert learned == WP._merge_symbol(*best)


def test_full_merge_budget_roundtrips_words(spark):
    """With a generous merge budget every frequent training word
    becomes ONE piece, and encoding reproduces the word."""
    df = spark.createDataFrame(
        [("alpha beta alpha beta gamma alpha",)], "text string"
    )
    vocab = WP.train_wordpiece(df, n_merges=50)
    vset = set(vocab)
    for w in ("alpha", "beta", "gamma"):
        assert WP.encode_word(w, vset) == [w]


def test_spark_encode_matches_python(spark):
    df = spark.createDataFrame(
        [(i, f"alpha beta{i % 3} gamma delta epsilon{i}") for i in range(40)],
        "doc_id long, text string",
    )
    vocab = WP.train_wordpiece(df, n_merges=10)
    out = {r["id"]: r for r in WP.wordpiece_encode(df, vocab).collect()}
    vset = set(vocab)
    import re

    tok = re.compile("[A-Za-z0-9]+")
    for i in range(40):
        words = tok.findall(f"alpha beta{i % 3} gamma delta epsilon{i}")
        pieces = []
        unk = 0
        for w in words:
            got = WP.encode_word(w, vset)
            pieces.extend(got)
            unk += got == [WP.UNK]
        r = out[i]
        assert (r["n_words"], r["n_subwords"], r["n_unk"]) == (
            len(words), len(pieces), unk,
        )
        assert r["subwords"] == " ".join(pieces)


def test_training_layout_independent(spark):
    rows = [(i, f"tok{i % 7} shared words tok{i % 5} more shared",)
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    v1 = WP.train_wordpiece(df.repartition(1), n_merges=15)
    v2 = WP.train_wordpiece(df.repartition(13), n_merges=15)
    assert v1 == v2


def test_golden_module_matches_registered_oracle():
    """The committed golden module must load and carry one row per
    sf0.01 document with the UNK column all-zero (train==encode corpus
    shares its alphabet) — a cheap standing sanity on the artifact."""
    from clickhouse_learning_spark import golden_wordpiece as G

    rows = G.WORDPIECE_SUBWORD_STATS
    assert len(rows) == 500
    assert all(len(r) == 5 for r in rows)
    assert all(r[3] == 0 for r in rows)
    assert all(r[2] >= r[1] > 0 for r in rows)
