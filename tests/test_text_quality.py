"""Blocklist filtering laws (operators/text.py r5-late): the
literal-array and semi-join paths agree, the literal path is
shuffle-free, phrases match across word boundaries, NULL text is
clean."""

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
