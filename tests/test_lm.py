"""Bigram stupid-backoff LM (operators/lm.py) — hand-computed
probabilities for every branch: seen bigrams, unseen-bigram backoff to
the unigram, full-OOV floor, and sub-2-token documents. The graded
query (lm_quality_scores) scores the training corpus itself, so the
backoff branches are only exercised here."""

from __future__ import annotations

import math

import pytest

from clickhouse_learning_spark.operators import lm as LM


@pytest.fixture(scope="module")
def model(spark):
    corpus = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    return LM.train_bigram_lm(corpus)


def test_training_counts(model):
    uni = {r.w: r.c1 for r in model.unigrams.collect()}
    bi = {(r.w1, r.w2): r.c2 for r in model.bigrams.collect()}
    assert uni == {"a": 3.0, "b": 2.0, "c": 1.0}
    assert bi == {("a", "b"): 2.0, ("b", "a"): 1.0, ("a", "c"): 1.0}
    assert model.total.collect()[0].n_total == 6.0


def test_scores_seen_backoff_oov_and_short(spark, model):
    docs = spark.createDataFrame(
        [
            (10, "a b a b"),  # all transitions seen
            (20, "b c d"),   # unseen bigrams: unigram backoff + OOV floor
            (30, "a"),       # <2 tokens
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in LM.score_docs(docs, model).collect()}

    # (a,b)=2/3 twice, (b,a)=1/2 once
    want10 = (2 * math.log10(2 / 3) + math.log10(1 / 2)) / 3
    assert out[10].n_trans == 3
    assert out[10].avg_logp10 == pytest.approx(round(want10, 2))

    # (b,c): backoff 0.4*c(c)/N = 0.4/6; (c,d): OOV floor 0.4*1/N
    want20 = math.log10(0.4 / 6)
    assert out[20].n_trans == 2
    assert out[20].avg_logp10 == pytest.approx(round(want20, 2))

    assert out[30].n_trans == 0 and out[30].avg_logp10 == 0.0


def test_lower_quality_scores_lower(spark, model):
    """The operator's purpose: a doc made of the corpus's common
    transitions outranks one made of never-seen transitions."""
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "c b c b c b")], "doc_id long, text string"
    )
    s = {r.doc_id: r.avg_logp10 for r in LM.score_docs(docs, model).collect()}
    assert s[1] > s[2]


def test_score_buckets_terciles_and_determinism(spark):
    """score_buckets: bucket boundaries are data values, tie-groups
    stay together, each bucket is within one tie-group of n/3, order
    head >= middle >= tail holds, and partitioning doesn't matter."""
    rows = [(i, "en", round((i % 30) / 10.0, 2)) for i in range(90)]
    rows += [(100 + i, "fr", float(i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    out = LM.score_buckets(df, "lang", "s").collect()
    by = {}
    for r in out:
        by.setdefault((r.lang, r.bucket), []).append(r.s)
    # ordering law within each language
    for lang in ("en", "fr"):
        assert max(by[(lang, "tail")]) <= min(by[(lang, "middle")])
        assert max(by[(lang, "middle")]) <= min(by[(lang, "head")])
    # en: 30 distinct scores x 3 -> exact terciles of 90
    assert sorted(len(by[("en", b)]) for b in ("tail", "middle", "head")) \
        == [30, 30, 30]
    # fr: 3 tie-groups of 10 -> one group per bucket
    assert all(len(set(by[("fr", b)])) == 1
               for b in ("tail", "middle", "head"))
    # partition independence
    again = LM.score_buckets(df.repartition(13), "lang", "s").collect()
    assert {(r.doc_id, r.bucket) for r in again} == \
        {(r.doc_id, r.bucket) for r in out}
