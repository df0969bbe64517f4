"""Theta-sketch distinct states (uniq_theta) and KLL rank sketches
(quantile_kll): ε-accuracy vs exact, split/merge behavior through the
MV engine, and the approximate funnel vs the exact bitmap funnel."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.metrics import MetricSpec
from clickhouse_learning_spark.mv.engine import MaterializedView
from clickhouse_learning_spark.queries import QUERIES, _events
from clickhouse_learning_spark.tables import Table
from tests.conftest import SF_SMOKE


def test_theta_mv_estimate_within_epsilon(spark, tmp_path):
    """uniq_theta through the full MV path (two batches, merge-on-read)
    estimates exact distinct counts within 5% (default lgK=12 theta
    error is ~1-2% at these cardinalities)."""
    ev = _events(spark, SF_SMOKE)
    mv = MaterializedView(
        "theta_uv",
        ("day",),
        (MetricSpec("uv", "uniq_theta", "uid"),),
        Table(str(tmp_path / "state"), ("day",)),
    )
    mv.append_batch(ev.filter("uid % 2 = 0"))
    mv.append_batch(ev.filter("uid % 2 = 1"))
    got = {str(r["day"]): r["uv"] for r in mv.merge_query(spark, ["day"]).collect()}
    want = {
        str(r["day"]): r["uv"]
        for r in ev.groupBy("day").agg(F.count_distinct("uid").alias("uv")).collect()
    }
    for d, exact in want.items():
        assert abs(got[d] - exact) <= max(3, 0.05 * exact), (d, got[d], exact)


def test_theta_funnel_tracks_exact_bitmap_funnel(spark):
    """Every stage of the theta funnel is within 5% of the exact bitmap
    funnel (intersection compounds error — still ≤5% at 2 stages deep
    here)."""
    exact = {
        r["day"]: (r["stage_view"], r["stage_click"], r["stage_purchase"])
        for r in QUERIES["bitmap_funnel"](spark, SF_SMOKE)
        .select("day", "stage_view", "stage_click", "stage_purchase")
        .collect()
    }
    approx = {
        r["day"]: (r["stage_view"], r["stage_click"], r["stage_purchase"])
        for r in QUERIES["theta_funnel_approx"](spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx)
    for d in exact:
        for e, a in zip(exact[d], approx[d]):
            assert abs(a - e) <= max(3, 0.05 * e), (d, exact[d], approx[d])


def test_kll_quantile_within_rank_epsilon(spark, tmp_path):
    """quantile_kll through split/merge: the p50/p99 estimates land
    within KLL's rank error of the exact quantiles (default k=200 →
    ~1.65% rank error; 3% margin here)."""
    ev = _events(spark, SF_SMOKE)
    p50 = MetricSpec("v50", "quantile_kll", "value", level=0.5)
    p99 = MetricSpec("v99", "quantile_kll", "value", level=0.99)
    states = ev.groupBy("day", "hour").agg(p50.partial(), p99.partial())
    got = (
        states.groupBy("day")
        .agg(p50.merged_finalized(), p99.merged_finalized())
        .collect()
    )
    exact = {
        str(r["day"]): (r["e50"], r["e99"])
        for r in ev.groupBy("day")
        .agg(
            F.expr("percentile(value, 0.5)").alias("e50"),
            F.expr("percentile(value, 0.99)").alias("e99"),
        )
        .collect()
    }
    # compare by RANK: the KLL answer's true rank must be near the target
    vals = {
        str(r["day"]): sorted(x["value"] for x in ev.filter(F.col("day") == r["day"]).select("value").collect())
        for r in got
    }
    import bisect

    for r in got:
        d = str(r["day"])
        n = len(vals[d])
        margin = 0.0165 + 2.0 / n  # KLL k=200 rank error + discrete granularity
        for col, target in (("v50", 0.5), ("v99", 0.99)):
            lo = bisect.bisect_left(vals[d], r[col]) / n
            hi = bisect.bisect_right(vals[d], r[col]) / n
            assert lo - margin <= target <= hi + margin, (d, col, r[col], lo, hi)
