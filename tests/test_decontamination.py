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


def test_bloom_path_equals_broadcast_path(spark):
    """bloom_contamination_report must be EXACTLY contamination_report
    (the verify join removes Bloom false positives) — including under
    an adversarially TINY filter where nearly every gram is a false
    positive (the prefilter then saves nothing, but correctness holds)."""
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.operators import decontamination as DC
    from clickhouse_learning_spark.schemas import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    tr = docs.filter(F.col("doc_id") % 17 != 0)
    want = sorted(
        (r["doc_id"], r["n_shared"])
        for r in DC.contamination_report(tr, ev).collect()
    )
    got = sorted(
        (r["doc_id"], r["n_shared"])
        for r in DC.bloom_contamination_report(tr, ev).collect()
    )
    assert got == want and len(want) > 0
    tiny = sorted(
        (r["doc_id"], r["n_shared"])
        for r in DC.bloom_contamination_report(
            tr, ev, bits=256, hashes=2
        ).collect()
    )
    assert tiny == want


def test_bloom_build_is_distributed_and_small(spark):
    """The Bloom build collects bits/64 longs — never the gram set."""
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.operators import decontamination as DC

    ev = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon zeta "),
                 F.col("id").cast("string")).alias("text"),
    )
    arr = DC.build_gram_bloom(ev, bits=1 << 12, hashes=3)
    assert arr.shape == (64,)  # 4096 bits / 64
    assert int((arr != 0).sum()) > 0


def test_bloom_build_with_precomputed_grams_identical(spark):
    """build_gram_bloom(grams=...) (optimization r10: the report passes
    its persisted eval gram frame so the eval corpus is tokenized once)
    must produce the bit-identical filter the self-derived path builds."""
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.operators import decontamination as DC

    ev = spark.range(150).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("kappa lambda mu nu xi omicron "),
                 (F.col("id") % 7).cast("string")).alias("text"),
    )
    arr_self = DC.build_gram_bloom(ev, bits=1 << 12, hashes=3)
    eg = DC.word_ngram_rows(ev).select("g").distinct()
    arr_pre = DC.build_gram_bloom(ev, bits=1 << 12, hashes=3, grams=eg)
    assert (arr_self == arr_pre).all()
