"""Paragraph-level exact dedup laws (operators/dedup.py r5-late:
paragraph_dedup — the Dolma/CCNet sub-document step)."""

def test_paragraph_dedup_first_occurrence_wins(spark):
    """Corpus-wide first (doc, pos) keeps the paragraph; later copies
    (across docs AND within one doc) are cut; fully-duplicated docs
    come back empty, not missing; text order is by position."""
    from clickhouse_learning_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, ["alpha beta", "gamma", "alpha beta"]),  # self-dup
            (2, ["gamma", "delta"]),                     # gamma copied
            (3, ["alpha beta", "gamma"]),                # all copies
            (4, []),
        ],
        "doc_id long, paras array<string>",
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert out[1].clean_text == "alpha beta gamma"
    assert (out[1].n_paras, out[1].n_dropped) == (3, 1)
    assert out[2].clean_text == "delta"
    assert (out[2].n_paras, out[2].n_dropped) == (2, 1)
    assert out[3].clean_text == "" and out[3].n_dropped == 2
    assert out[4].clean_text == "" and out[4].n_paras == 0

    # partition independence: winners keyed by (doc, pos) min
    again = {r.doc_id: r for r in
             paragraph_dedup(docs.repartition(7)).collect()}
    for k in out:
        assert again[k].clean_text == out[k].clean_text
