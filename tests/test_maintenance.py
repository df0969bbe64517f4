"""Maintainer sweep: TTL + compaction with reconciliation; multi-arg
uniq tuple hashing."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.metrics import MetricSpec, uniq_tuple
from clickhouse_learning_spark.maintenance import Maintainer
from clickhouse_learning_spark.mv.mainpage import mainpage_mv, prepare_events

from .conftest import SF_SMOKE


def test_maintainer_sweep(spark, tmp_path):
    ev = prepare_events(spark, SF_SMOKE)
    mv = mainpage_mv(str(tmp_path / "state"))
    for i in range(3):
        mv.append_batch(ev.filter(F.col("event_id") % 3 == i))

    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    now = days[-1] + dt.timedelta(days=1)
    horizon = dt.timedelta(days=10)

    answers_before = sorted(
        map(str, mv.merge_query(spark, ["day"], ["event_cnt", "value_sum"])
            .filter(F.col("day") >= now - horizon).collect())
    )

    m = Maintainer()
    m.register(mv, ttl=horizon)
    report = m.run_once(spark, now=now)
    entry = report["mainpage_stat_mv"]
    assert entry["state_rows_after"] <= entry["state_rows_before"]
    assert entry["ttl_partitions_kept"] > 0

    answers_after = sorted(
        map(str, mv.merge_query(spark, ["day"], ["event_cnt", "value_sum"]).collect())
    )
    assert answers_before == answers_after  # maintenance never changes answers


def test_uniq_tuple_multi_arg(spark):
    """uniqCombined(uid, event_type) — tuple-hash distinct equals the
    exact distinct pair count (exact kind; HLL kind within ε)."""
    ev = prepare_events(spark, SF_SMOKE)
    spec = MetricSpec("pairs", "uniq_exact", uniq_tuple("uid", "event_type"))
    got = {
        str(r["day"]): r["pairs"]
        for r in ev.groupBy("day").agg(spec.partial()).select(
            "day", spec.finalize()
        ).collect()
    }
    want = {
        str(r["day"]): r["n"]
        for r in ev.select("day", "uid", "event_type")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
