"""As-of join: equivalence to the naive inequality-join formulation,
direction/tolerance semantics, and plan shape (no nested-loop join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_learning_spark.operators.asof import asof_join
from tests.conftest import SF_SMOKE


def _sides(spark, n_keys=7, n_left=200, n_right=150):
    # deterministic interleaved timelines with repeated timestamps
    left = spark.range(n_left).select(
        (F.col("id") % n_keys).alias("k"),
        ((F.col("id") * 37) % 1000).alias("t"),
        F.col("id").alias("lid"),
    )
    right = spark.range(n_right).select(
        (F.col("id") % n_keys).alias("k"),
        ((F.col("id") * 53) % 1000).alias("t"),
        F.col("id").alias("rid"),
        (F.col("id") * 2).alias("payload"),
    )
    return left, right


def _naive(left, right, direction):
    cmp = right.t <= left.t if direction == "backward" else right.t >= left.t
    j = left.join(right, (left.k == right.k) & cmp, "left").select(
        left.k, left.t, "lid", right.t.alias("rt"), "rid", "payload"
    )
    # best = nearest t, then max (rt, rid, payload) struct — mirrors the
    # operator's "last under ascending payload sort" tie-break
    best_t = F.max("rt") if direction == "backward" else F.min("rt")
    w = j.groupBy("lid").agg(best_t.alias("bt"))
    return (
        j.join(w, "lid")
        .filter(F.col("rt").eqNullSafe(F.col("bt")))
        .groupBy("k", "t", "lid")
        .agg(F.max(F.struct("rt", "rid", "payload")).alias("m"))
        .select("k", "t", "lid", "m.rt", "m.rid", "m.payload")
    )


def _unmatched(left, naive_matched):
    return left.join(naive_matched, "lid", "left_anti").select(
        "k",
        "t",
        "lid",
        F.lit(None).cast("long").alias("rt"),
        F.lit(None).cast("long").alias("rid"),
        F.lit(None).cast("long").alias("payload"),
    )


def test_backward_equals_naive(spark):
    left, right = _sides(spark)
    got = asof_join(left, right, on="k", left_time="t", right_time="t").select(
        "k", "t", "lid", F.col("t_asof").alias("rt"), "rid", "payload"
    )
    naive = _naive(left, right, "backward")
    want = naive.unionByName(_unmatched(left, naive))
    assert sorted(got.collect()) == sorted(want.collect())


def test_forward_equals_naive(spark):
    left, right = _sides(spark)
    got = asof_join(
        left, right, on="k", left_time="t", right_time="t", direction="forward"
    ).select("k", "t", "lid", F.col("t_asof").alias("rt"), "rid", "payload")
    naive = _naive(left, right, "forward")
    want = naive.unionByName(_unmatched(left, naive))
    assert sorted(got.collect()) == sorted(want.collect())


def test_tolerance_nulls_far_matches(spark):
    left, right = _sides(spark)
    tol = asof_join(
        left, right, on="k", left_time="t", right_time="t", tolerance=F.lit(50)
    )
    full = asof_join(left, right, on="k", left_time="t", right_time="t")
    # tolerance only ever nulls out rows, never changes a kept match
    f = {r["lid"]: r for r in full.collect()}
    for r in tol.collect():
        if r["rid"] is None:
            base = f[r["lid"]]
            assert base["rid"] is None or base["t"] - base["t_asof"] > 50
        else:
            assert r["t"] - r["t_asof"] <= 50
            assert (r["rid"], r["payload"]) == (
                f[r["lid"]]["rid"],
                f[r["lid"]]["payload"],
            )


def test_events_attribution_no_nested_loop(spark):
    from clickhouse_learning_spark.queries_streaming import asof_attribution

    df = asof_attribution(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert df.count() > 0
    # every attributed click precedes (or ties) its purchase
    assert df.filter((F.col("click_id") != -1) & (F.col("gap_s") < 0)).count() == 0
