"""PageRank laws (operators/graph.py): hand-computed fixed points,
weight handling, dangling behavior, partition independence."""

from __future__ import annotations

import pytest

from clickhouse_learning_spark.operators.graph import pagerank


def test_two_node_cycle_fixed_point(spark):
    """a<->b: the uniform rank 1.0 is the exact fixed point of
    r = 0.15 + 0.85*r, reached immediately and held."""
    e = spark.createDataFrame([("a", "b"), ("b", "a")],
                              "src string, dst string")
    out = {r.node: r.rank for r in pagerank(e, iters=7).collect()}
    assert out["a"] == pytest.approx(1.0) and \
        out["b"] == pytest.approx(1.0)


def test_star_hand_computed(spark):
    """x,y,z -> hub, hub dangling. After iteration 1: leaves 0.15,
    hub 0.15 + 0.85*3 = 2.7; iteration 2: hub 0.15 + 0.85*0.45."""
    e = spark.createDataFrame(
        [("x", "h"), ("y", "h"), ("z", "h")], "src string, dst string")
    one = {r.node: r.rank for r in pagerank(e, iters=1).collect()}
    assert one["h"] == pytest.approx(0.15 + 0.85 * 3)
    assert one["x"] == pytest.approx(0.15)
    two = {r.node: r.rank for r in pagerank(e, iters=2).collect()}
    assert two["h"] == pytest.approx(0.15 + 0.85 * 3 * 0.15)
    # dangling hub's mass is NOT redistributed (pinned variant)
    assert two["x"] == pytest.approx(0.15)


def test_weights_split_shares(spark):
    """a sends 3/4 of its mass to b, 1/4 to c (weights 3 and 1)."""
    e = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0)],
        "src string, dst string, w double")
    out = {r.node: r.rank for r in
           pagerank(e, weight="w", iters=1).collect()}
    assert out["b"] == pytest.approx(0.15 + 0.85 * 0.75)
    assert out["c"] == pytest.approx(0.15 + 0.85 * 0.25)


def test_partition_independent(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(40), rng.randrange(40)) for _ in range(400)]
    e = spark.createDataFrame(rows, "src long, dst long")
    a = sorted((r.node, round(r.rank, 9)) for r in
               pagerank(e, iters=4).collect())
    b = sorted((r.node, round(r.rank, 9)) for r in
               pagerank(e.repartition(13), iters=4).collect())
    assert a == b
