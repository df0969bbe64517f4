"""topk (heavy hitters) metric kind — ClickHouse topK(k) semantics.

State = value→count pairs capped at ``reserve`` (Space-Saving
truncation). Correctness bar: exact top-k with deterministic
(count desc, value asc) ordering whenever per-group distinct counts
stay under reserve, at every compaction state; bounded-k results and
mergeability even past the cap.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.metrics import MetricSpec
from clickhouse_learning_spark.mv.engine import MaterializedView
from clickhouse_learning_spark.tables import Table


def exact_topk(values, k):
    c = Counter(values)
    return [v for v, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]]


ROWS = (
    ["a"] * 7 + ["b"] * 5 + ["c"] * 5 + ["d"] * 2 + ["e"] * 1
)  # b/c tie on 5 → 'b' first


def test_partial_merge_finalize_exact(spark):
    spec = MetricSpec("top", "topk", "v", k=3)
    df = spark.createDataFrame([(g, v) for g in (1, 2) for v in ROWS], "g int, v string")
    # split into two arbitrary "batches", state each, merge across
    b1 = df.filter(F.crc32("v") % 2 == 0).groupBy("g").agg(spec.partial())
    b2 = df.filter(F.crc32("v") % 2 == 1).groupBy("g").agg(spec.partial())
    got = {
        r["g"]: r["top"]
        for r in b1.unionByName(b2).groupBy("g").agg(spec.merged_finalized()).collect()
    }
    assert got == {1: exact_topk(ROWS, 3), 2: exact_topk(ROWS, 3)}
    assert got[1] == ["a", "b", "c"]  # tie b/c broken on smaller value


def test_conditional_topk_and_empty_groups(spark):
    spec = MetricSpec("top", "topk", "v", cond="flag", k=2)
    df = spark.createDataFrame(
        [(1, "x", True), (1, "x", True), (1, "y", True), (1, "z", False), (2, "q", False)],
        "g int, v string, flag boolean",
    )
    states = df.groupBy("g").agg(spec.partial())
    got = {r["g"]: r["top"] for r in states.groupBy("g").agg(spec.merged_finalized()).collect()}
    assert got[1] == ["x", "y"]
    assert got[2] == []  # no row passed the -If condition → empty array


def test_truncation_keeps_k_results_bounded(spark):
    # 60 distinct values, reserve of 8 → approximate regime: still returns
    # exactly k values, and the unambiguous heavy hitter survives
    spec = MetricSpec("top", "topk", "v", k=2, reserve=8)
    rows = [(1, f"v{i:02d}") for i in range(60)] + [(1, "hot")] * 50
    df = spark.createDataFrame(rows, "g int, v string")
    states = df.groupBy("g", F.crc32("v").alias("salt")).agg(spec.partial())
    got = states.groupBy("g").agg(spec.merged_finalized()).collect()[0]["top"]
    assert len(got) == 2
    assert got[0] == "hot"


def test_mv_engine_topk_lifecycle(spark, tmp_path):
    """Relational pre-count write path + merge-on-read + compaction
    invariance, alongside a non-topk metric."""
    mv = MaterializedView(
        name="t",
        dims=("day",),
        metrics=(
            MetricSpec("cnt", "count", "1"),
            MetricSpec("top_users", "topk", "uid", k=2),
        ),
        storage=Table(path=str(tmp_path / "state"), partition_by=("day",)),
    )
    batch = lambda rows: spark.createDataFrame(rows, "day string, uid bigint")
    mv.append_batch(batch([("d1", 10)] * 3 + [("d1", 20)] * 2 + [("d1", 30)]))
    mv.append_batch(batch([("d1", 30)] * 4 + [("d2", 7)]))

    def read():
        out = {
            r["day"]: (r["top_users"], r["cnt"])
            for r in mv.merge_query(spark, ["day"]).collect()
        }
        return out

    # d1 totals: 30→5, 10→3, 20→2 → top2 = [30, 10]
    assert read() == {"d1": ([30, 10], 10), "d2": ([7], 1)}
    mv.compact(spark)
    assert read() == {"d1": ([30, 10], 10), "d2": ([7], 1)}
    # post-compaction the state holds one entry per distinct value
    st = mv.storage.read(spark).filter(F.col("day") == "d1").collect()[0]
    assert sorted((e["v"], e["c"]) for e in st["top_users"]) == [(10, 3), (20, 2), (30, 5)]


def test_topk_numeric_values_and_k_larger_than_distinct(spark):
    spec = MetricSpec("top", "topk", "v", k=10)
    df = spark.createDataFrame([(1, 5), (1, 5), (1, 9)], "g int, v int")
    got = (
        df.groupBy("g")
        .agg(spec.partial())
        .groupBy("g")
        .agg(spec.merged_finalized())
        .collect()[0]["top"]
    )
    assert got == [5, 9]


def test_bad_k_rejected():
    with pytest.raises(ValueError):
        MetricSpec("t", "topk", "v", k=0)


def test_topk_weighted(spark):
    """topKWeighted: weights reorder the result vs plain counts — 'b'
    appears once with weight 100 and must beat 'a' (3 plain rows)."""
    from clickhouse_learning_spark.functions.metrics import MetricSpec, build_states

    df = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 1), (1, "a", 1), (1, "b", 100), (1, "c", 2)],
        "g int, t string, w long",
    )
    plain = MetricSpec("m", "topk", "t", k=2, value_type="string")
    weighted = MetricSpec("m", "topk", "t", k=2, weight="w", value_type="string")

    def run(spec):
        st = build_states(df, ("g",), (spec,))
        return st.groupBy("g").agg(spec.merged_finalized()).collect()[0]["m"]

    assert run(plain) == ["a", "b"]  # b/c tie at 1 → smaller value wins
    assert run(weighted) == ["b", "a"]
    # one-expression partial path agrees with the relational path
    direct = (
        df.groupBy("g").agg(weighted.partial()).groupBy("g")
        .agg(weighted.merged_finalized()).collect()[0]["m"]
    )
    assert direct == ["b", "a"]
