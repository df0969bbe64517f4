"""Interpolated Kneser–Ney trigram LM laws (operators/kn_lm.py)."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from clickhouse_learning_spark.operators import kn_lm as KN

D = 0.75


def _ref_score(train_texts, test_text):
    """Independent pure-python interpolated-KN implementation (dict
    counters, no Spark/SQL structure shared with the operator)."""
    tok = lambda s: re.findall(r"[A-Za-z0-9]+", s.lower())  # noqa: E731
    tri, bi = Counter(), set()
    vocab = set()
    for s in train_texts:
        t = tok(s)
        vocab.update(t)
        for i in range(len(t) - 2):
            tri[(t[i], t[i + 1], t[i + 2])] += 1
        for i in range(len(t) - 1):
            bi.add((t[i], t[i + 1]))
    cctx, n3d, mid, midctx = Counter(), Counter(), Counter(), Counter()
    for (w1, w2, w3), c in tri.items():
        cctx[(w1, w2)] += c
        n3d[(w1, w2)] += 1
        mid[(w2, w3)] += 1
        midctx[w2] += 1
    nfol, npre = Counter(), Counter()
    for w1, w2 in bi:
        nfol[w1] += 1
        npre[w2] += 1
    nbi, v = float(len(bi)), float(len(vocab))

    def pcont(w3):
        return (npre.get(w3, 0) + 1.0) / (nbi + v + 1.0)

    def pbi(w2, w3):
        if midctx.get(w2, 0) == 0:
            return pcont(w3)
        np_ = float(midctx[w2])
        return (max(mid.get((w2, w3), 0) - D, 0.0) / np_) + (
            (D * nfol.get(w2, 0)) / np_
        ) * pcont(w3)

    def p(w1, w2, w3):
        if cctx.get((w1, w2), 0) == 0:
            return pbi(w2, w3)
        cc = float(cctx[(w1, w2)])
        return (max(tri.get((w1, w2, w3), 0) - D, 0.0) / cc) + (
            (D * n3d[(w1, w2)]) / cc
        ) * pbi(w2, w3)

    t = tok(test_text)
    lpm = [round(math.log10(p(t[i], t[i + 1], t[i + 2])) * 1e6)
           for i in range(len(t) - 2)]
    if not lpm:
        return 0, 0.0
    return len(lpm), round(sum(lpm) / len(lpm) / 1e6, 2)


_TRAIN = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log",
    "the dog ate the bone and the cat watched",
]
_TESTS = [
    "the cat sat on the log",        # mix of seen/unseen trigrams
    "the fish ate the dog",          # seen words, mostly new contexts
    "quantum flux capacitors hum",   # all-OOV
    "the cat",                       # < 3 tokens -> n_tri 0
]


def test_matches_independent_reference(spark):
    """Spark scores == the dict-counter reference on every fixture doc
    (seen trigram, backoff level, continuation floor, all-OOV, and the
    too-short document)."""
    train = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_TRAIN)], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_TESTS)], "doc_id long, text string"
    )
    model = KN.train_kn_trigram(train)
    got = {r["doc_id"]: (r["n_tri"], r["avg_logp10"])
           for r in KN.score_kn(test, model).collect()}
    for i, s in enumerate(_TESTS):
        assert got[i] == _ref_score(_TRAIN, s), (i, s, got[i])


def test_seen_better_than_oov(spark):
    """Sanity direction: a test doc made of training text must outscore
    an all-OOV doc under the same model."""
    train = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_TRAIN)], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [(0, _TRAIN[0]), (1, "zzz qqq xxx www yyy")],
        "doc_id long, text string",
    )
    model = KN.train_kn_trigram(train)
    got = {r["doc_id"]: r["avg_logp10"]
           for r in KN.score_kn(test, model).collect()}
    assert got[0] > got[1]


def test_probabilities_sum_le_one_for_seen_context(spark):
    """For a SEEN context (w1, w2), Σ_w3∈vocab p(w3|w1w2) must be ≤ 1
    + the continuation floor's bounded excess (the +1/(nbi+V+1) floor
    adds at most λ·V/(nbi+V+1) of mass) — the discount never creates
    probability. Checked via the independent reference."""
    # reference-only law (no Spark needed beyond fixture parity above)
    tok = lambda s: re.findall(r"[A-Za-z0-9]+", s.lower())  # noqa: E731
    vocab = sorted({w for s in _TRAIN for w in tok(s)})
    total = 0.0
    for w3 in vocab + ["UNSEEN"]:
        n, sc = _ref_score(_TRAIN, f"the cat {w3}")
        assert n == 1
        total += 10.0 ** sc if w3 in vocab else 0.0
    assert total <= 1.05, total
