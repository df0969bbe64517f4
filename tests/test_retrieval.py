"""RRF hybrid-retrieval laws (operators/retrieval.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.operators import retrieval as R


def _rk(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank int")


def test_rrf_hand_computed(spark):
    """Two 3-deep rankings, fused by hand: doc 10 (ranks 1+3), doc 11
    (2+1), doc 12 (3+-), doc 13 (-+2). k=60 nano contributions:
    r1→16393443, r2→16129032, r3→15873016."""
    a = _rk(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    b = _rk(spark, [(1, 11, 1), (1, 13, 2), (1, 10, 3)])
    out = {r["doc_id"]: (r["rrf_nano"], r["n_lists"], r["rank"])
           for r in R.rrf_fuse([a, b], k=60, top_k=10).collect()}
    c1, c2, c3 = (round(1e9 / 61), round(1e9 / 62), round(1e9 / 63))
    assert out[10] == (c1 + c3, 2, 2)
    assert out[11] == (c2 + c1, 2, 1)  # highest fused mass
    assert out[12] == (c3, 1, 4)
    assert out[13] == (c2, 1, 3)


def test_rrf_tie_breaks_on_id(spark):
    """Identical contributions → rank order follows doc id."""
    a = _rk(spark, [(1, 20, 1), (1, 7, 1)])  # impossible in one list,
    # but legal across callers — the fuse only contracts on columns
    out = [r["doc_id"] for r in
           R.rrf_fuse([a], top_k=10).orderBy("rank").collect()]
    assert out == [7, 20]


def test_rrf_needs_rankings():
    with pytest.raises(ValueError, match="at least one"):
        R.rrf_fuse([])


def test_bm25_rank_agrees_with_graded_query(spark):
    """bm25_rank(top_k=10) must reproduce the long-green bm25_topk
    graded query exactly (the factored operator is the same plan)."""
    import __spark_entry__ as entry_mod
    from clickhouse_learning_spark.queries_pipeline import _BM25_QUERIES
    from clickhouse_learning_spark.schemas import load_table

    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    qt = spark.createDataFrame(
        [(i, t) for i, q in _BM25_QUERIES for t in q.split()],
        "query_id int, term string",
    )
    mine = sorted(
        tuple(r) for r in R.bm25_rank(docs, qt, top_k=10).collect()
    )
    graded = sorted(
        tuple(r) for r in
        entry_mod.queries()["bm25_topk"](spark, SF_SMOKE).collect()
    )
    assert mine == graded
