"""Connected components / transitive-closure dedup (operators/components.py).

Correctness bar: exact agreement with a driver-side union-find on
arbitrary hypothesis-generated graphs, plus the specific case where the
single-pass lower-id-wins dedup differs from the true closure.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_learning_spark.operators.components import (
    connected_components,
    dedup_cluster_representatives,
)

EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)
    ),
    min_size=1,
    max_size=20,
)


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress: component = min id reachable
    comp = {}
    for x in list(parent):
        comp[x] = find(x)
    return comp


@given(edges=EDGES)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == union_find(edges)


def test_closure_beats_single_pass_dedup(spark):
    """Pairs (2,3) and (1,3): lower-id-wins removes only 3 and keeps
    BOTH 1 and 2, though they are transitively similar; the closure
    keeps exactly the min of the component."""
    docs = spark.createDataFrame([(1,), (2,), (3,), (9,)], "doc_id long")
    pairs = spark.createDataFrame([(2, 3), (1, 3)], "id_a long, id_b long")
    kept = sorted(
        r["doc_id"]
        for r in dedup_cluster_representatives(docs, pairs).collect()
    )
    assert kept == [1, 9]  # min of {1,2,3}, plus the untouched singleton


def test_diameter_cap_raises(spark):
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="max_iter"):
        connected_components(chain, max_iter=2)
    # and converges with an adequate cap
    got = {r["id"]: r["comp"] for r in connected_components(chain).collect()}
    assert set(got.values()) == {0}


def test_all_nodes_labeled_and_stable_under_edge_direction(spark):
    pairs = spark.createDataFrame(
        [(5, 2), (2, 8), (10, 11)], "id_a long, id_b long"
    )
    got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {2: 2, 5: 2, 8: 2, 10: 10, 11: 10}
