"""MetricRouter: state-table routing vs raw fallback equivalence + the
rows-scanned advantage that motivates routing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.mv.mainpage import mainpage_mv, prepare_events
from clickhouse_learning_spark.mv.router import MetricRouter

from .conftest import SF_SMOKE

EXACT = ["view_cnt", "click_cnt", "value_sum", "event_cnt"]


@pytest.fixture(scope="module")
def router(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("router") / "state")
    mv = mainpage_mv(path)
    mv.append_batch(prepare_events(spark, SF_SMOKE))
    r = MetricRouter(raw_source=lambda s: prepare_events(s, SF_SMOKE))
    r.register(mv)
    return r


def rows(df, keys, metrics):
    return {
        tuple(str(r[k]) for k in keys): tuple(r[m] for m in metrics)
        for r in df.collect()
    }


def test_routes_to_state_table_when_eligible(spark, router):
    assert router.routed_source(["day"], EXACT) == "mainpage_stat_mv"
    # coarser grain than the MV dims still routes (states re-merge)
    assert router.routed_source(["segment"], ["event_cnt"]) == "mainpage_stat_mv"


def test_falls_back_on_non_dim_filter_or_unknown_grain(spark, router):
    # filter on a raw column the states no longer carry → raw
    assert router.routed_source(["day"], ["event_cnt"], {"event_type": "view"}) == "raw"
    # group-by a non-dim column → raw
    assert router.routed_source(["event_type"], ["event_cnt"]) == "raw"


def test_routed_equals_fallback_equals_direct(spark, router):
    keys = ["day", "segment"]
    routed = rows(router.query(spark, keys, EXACT), keys, EXACT)
    # force the raw path for the same request
    raw = rows(router._raw_query(spark, keys, EXACT, {}), keys, EXACT)
    assert routed == raw
    direct = rows(
        prepare_events(spark, SF_SMOKE)
        .groupBy(*keys)
        .agg(
            F.coalesce(F.sum(F.when(F.col("event_type") == "view", 1)), F.lit(0)).alias("view_cnt"),
            F.coalesce(F.sum(F.when(F.col("event_type") == "click", 1)), F.lit(0)).alias("click_cnt"),
            F.sum(F.expr("CAST(value*1000 AS BIGINT)")).alias("value_sum"),
            F.count(F.lit(1)).alias("event_cnt"),
        ),
        keys,
        EXACT,
    )
    assert routed == direct


def test_dim_filter_routes_and_prunes(spark, router):
    mv = router.views[0]
    one_day = mv.storage.read(spark).select("day").distinct().limit(1).collect()[0]["day"]
    got = router.query(spark, ["segment"], ["event_cnt"], {"day": str(one_day)})
    want = rows(
        prepare_events(spark, SF_SMOKE)
        .filter(F.col("day") == F.lit(str(one_day)))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("event_cnt")),
        ["segment"],
        ["event_cnt"],
    )
    assert rows(got, ["segment"], ["event_cnt"]) == want


def test_state_table_scans_fewer_rows(spark, router):
    mv = router.views[0]
    state_rows = mv.storage.read(spark).count()
    raw_rows = prepare_events(spark, SF_SMOKE).count()
    assert state_rows < raw_rows
