"""Benchmark decontamination (operators/decontamination.py)."""

from __future__ import annotations

import pytest

from clickhouse_learning_spark.operators.decontamination import (
    contamination_report,
    decontaminate,
    word_ngram_rows,
)


@pytest.fixture(scope="module")
def corpus(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap at all here"),
            (3, "short doc"),
            # shares exactly the 5-gram "quick brown fox jumps over"
            (4, "a quick brown fox jumps over something else entirely today"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over a fence")],
        "doc_id long, text string",
    )
    return train, eval_df


def test_report_finds_exact_overlaps(spark, corpus):
    train, eval_df = corpus
    got = {r["doc_id"]: r["n_shared"] for r in contamination_report(train, eval_df).collect()}
    # doc 1 shares "the quick brown fox jumps", "quick brown fox jumps over";
    # doc 4 shares "quick brown fox jumps over"; docs 2, 3 are clean
    assert got == {1: 2, 4: 1}


def test_decontaminate_thresholds(spark, corpus):
    train, eval_df = corpus
    kept = sorted(r["doc_id"] for r in decontaminate(train, eval_df).collect())
    assert kept == [2, 3]
    kept2 = sorted(
        r["doc_id"] for r in decontaminate(train, eval_df, min_shared=2).collect()
    )
    assert kept2 == [2, 3, 4]  # single-gram hit tolerated


def test_short_docs_emit_full_sequence_gram(spark):
    df = spark.createDataFrame([(1, "short doc")], "doc_id long, text string")
    rows = word_ngram_rows(df, n=5).collect()
    assert len(rows) == 1  # fewer than n tokens → one gram
    match = spark.createDataFrame([(9, "also short doc")], "doc_id long, text string")
    # "short doc" != "also short doc" → no contamination from substrings
    assert contamination_report(df, match, n=5).count() == 0


def test_shuffle_path_equals_broadcast(spark, corpus):
    train, eval_df = corpus
    a = sorted(map(tuple, contamination_report(train, eval_df).collect()))
    b = sorted(
        map(
            tuple,
            contamination_report(train, eval_df, broadcast_eval=False).collect(),
        )
    )
    assert a == b
