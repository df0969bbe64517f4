"""Naive-Bayes classifier (operators/classifier.py): hand-computed
posterior odds on a tiny corpus, label-swap antisymmetry, OOV and
zero-token edges. The graded query nb_quality_scores replays the full
train+score path against a DuckDB oracle."""

from __future__ import annotations

import math

import pytest

from clickhouse_learning_spark.operators import classifier as NB


def _score_map(docs, model):
    return {
        r["doc_id"]: (r["n_tok"], r["score"], r["pred"])
        for r in NB.score_nb(docs, model).collect()
    }


def test_hand_computed_posterior(spark):
    """pos corpus: 'good good fun', neg corpus: 'bad sad'.
    Counts: good=2p/0n, fun=1p/0n, bad=0p/1n, sad=0p/1n; V=4,
    n_pos=3, n_neg=2. Scoring 'good bad zzz' (zzz is OOV):
    llr(good) = log10(3/7) - log10(1/6)
    llr(bad)  = log10(1/7) - log10(2/6)
    oov_llr   = log10(1/7) - log10(1/6)
    prior_llr = log10(1) - log10(1) = 0."""
    train = spark.createDataFrame(
        [(True, "good good fun"), (False, "bad sad")], "label boolean, text string"
    )
    model = NB.train_nb(train)
    docs = spark.createDataFrame(
        [(1, "good bad zzz"), (2, "")], "doc_id long, text string"
    )
    got = _score_map(docs, model)
    want = (
        (math.log10(3 / 7) - math.log10(1 / 6))
        + (math.log10(1 / 7) - math.log10(2 / 6))
        + (math.log10(1 / 7) - math.log10(1 / 6))
    )
    assert got[1][0] == 3
    assert got[1][1] == pytest.approx(round(want, 2), abs=1e-9)
    assert got[1][2] == (1 if want > 0 else 0)
    # zero-token doc scores the bare prior (0 here), pred = 0
    assert got[2] == (0, 0.0, 0)


def test_label_swap_negates_scores(spark):
    """Swapping the class labels exactly negates every log-odds score
    (Laplace smoothing is symmetric) and flips strict-positive preds."""
    train = spark.createDataFrame(
        [
            (True, "alpha beta beta gamma"),
            (True, "alpha alpha delta"),
            (False, "omega psi psi"),
            (False, "omega chi"),
        ],
        "label boolean, text string",
    )
    docs = spark.createDataFrame(
        [(1, "alpha omega new"), (2, "beta beta psi"), (3, "chi delta")],
        "doc_id long, text string",
    )
    fwd = _score_map(docs, NB.train_nb(train))
    rev = _score_map(
        docs,
        NB.train_nb(
            train.selectExpr("NOT label AS label", "text")
        ),
    )
    for k in fwd:
        assert fwd[k][1] == pytest.approx(-rev[k][1], abs=0.011)
        assert fwd[k][0] == rev[k][0]


def test_discriminates_held_out_corpora(spark):
    """Two synthetic dialects with partially-overlapping vocabularies:
    the classifier must classify every HELD-OUT document correctly.
    (The sf fixture's `lang` label carries no lexical signal — its text
    is drawn from one shared vocabulary — so discrimination is tested
    on a corpus where the signal exists; the graded query
    nb_quality_scores hash-checks the arithmetic on the fixture.)"""
    wiki = "citation reference notable infobox category the of"
    spam = "click buy cheap winner free the of"
    rows = []
    for i in range(30):
        # vary token multiplicity deterministically so docs differ
        k = i % 3 + 1
        rows.append((2 * i, True, (wiki + " ") * k + f"page{i} history"))
        rows.append((2 * i + 1, False, (spam + " ") * k + f"offer{i} now"))
    df = spark.createDataFrame(rows, "doc_id long, label boolean, text string")
    train = df.filter("doc_id % 4 < 2").select("label", "text")
    test = df.filter("doc_id % 4 >= 2")
    scored = NB.score_nb(test, NB.train_nb(train)).join(
        test.select("doc_id", "label"), "doc_id"
    )
    bad = scored.filter("(pred = 1) != label").count()
    assert bad == 0
