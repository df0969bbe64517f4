"""Unigram-LM tokenizer laws (operators/unigram.py): hand-computed
Viterbi segmentations, coverage floor, OOV handling, pruning target,
and partition-independent training."""

from __future__ import annotations

import math

import pytest

from clickhouse_learning_spark.operators import unigram as U


def test_viterbi_hand_computed():
    """Two pieces tie-break and probability arithmetic checked by
    hand: vocab {ab: 0.4, a: 0.3, b: 0.2, abc-pieces...}."""
    logp = {p: math.log(v) for p, v in
            {"ab": 0.4, "a": 0.3, "b": 0.2, "c": 0.1}.items()}
    # 'ab' one piece (0.4) beats a+b (0.06)
    assert U.viterbi_segment("ab", logp, 4) == ["ab"]
    # 'abc': ab+c (0.04) beats a+b+c (0.006)
    assert U.viterbi_segment("abc", logp, 4) == ["ab", "c"]
    # 'ba' has no 'ba' piece: b+a
    assert U.viterbi_segment("ba", logp, 4) == ["b", "a"]


def test_viterbi_tie_prefers_longer_last_piece():
    """p(xy)=p(x)p(y) exactly -> equal scores; the longer last piece
    (earlier start) must win deterministically."""
    logp = {p: math.log(v) for p, v in
            {"x": 0.25, "y": 0.25, "xy": 0.0625}.items()}
    assert U.viterbi_segment("xy", logp, 4) == ["xy"]


def test_viterbi_oov_chars_become_unk():
    logp = {"a": math.log(0.5)}
    segs = U.viterbi_segment("aqa", logp, 4)
    assert segs == ["a", "q", "a"]
    assert "q" not in logp  # counted as unk by the encoder


def test_max_piece_len_respected():
    logp = {"abcdef": 0.0, "abc": math.log(0.4), "def": math.log(0.4)}
    logp.update({c: math.log(0.01) for c in "abcdef"})
    # window of 3 cannot use the 6-char piece even though it scores 1
    assert U.viterbi_segment("abcdef", logp, 3) == ["abc", "def"]


def test_train_targets_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "resting rested rests unrest arrest forest " * 2)
         for i in range(30)]
        + [(50 + i, "zebra quartz fjord ") for i in range(10)],
        "doc_id long, text string",
    )
    m1 = U.train_unigram(docs, vocab_size=30, max_piece_len=5,
                         max_words=10_000)
    m2 = U.train_unigram(docs.repartition(11), vocab_size=30,
                         max_piece_len=5, max_words=10_000)
    assert m1.logp == m2.logp  # exact: integer counts everywhere
    chars = {p for p in m1.logp if len(p) == 1}
    multi = {p for p in m1.logp if len(p) > 1}
    # every character of the corpus survives pruning (coverage floor)
    seen = set("".join(w for w in
               "resting rested rests unrest arrest forest zebra quartz fjord".split()))
    assert seen <= chars
    assert len(multi) <= max(30 - len(chars), 0)
    # probabilities normalize
    assert abs(sum(math.exp(v) for v in m1.logp.values()) - 1.0) < 1e-9
    # the shared stem should have been learned as a piece
    assert any("rest" in p for p in multi)


def test_encode_counts(spark):
    logp = {p: math.log(v) for p, v in
            {"ab": 0.4, "a": 0.3, "b": 0.2, "c": 0.1}.items()}
    m = U.UnigramModel(logp=logp, max_piece_len=4)
    docs = spark.createDataFrame(
        [(1, "ab abc ba"), (2, "qq"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in U.unigram_encode(docs, m).collect()}
    # ab -> [ab]; abc -> [ab, c]; ba -> [b, a]  => 5 pieces, 0 unk
    assert (rows[1]["n_words"], rows[1]["n_pieces"], rows[1]["n_unk"]) \
        == (3, 5, 0)
    assert (rows[2]["n_pieces"], rows[2]["n_unk"]) == (2, 2)
    assert rows[3]["n_words"] == 0
