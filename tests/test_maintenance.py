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


def test_bloom_filter_skip_index(spark, tmp_path):
    """bloom_filter_cols (ClickHouse `INDEX ... TYPE bloom_filter`
    analog): files written with the bloom option carry the extra filter
    bytes (this pyarrow/duckdb can't surface the offset directly), and
    point lookups still answer exactly."""
    import glob
    import os

    from pyspark.sql import functions as F

    from clickhouse_learning_spark.tables import Table

    df = spark.range(100_000).selectExpr(
        "CAST(id % 3 AS INT) AS day", "id * 7919 % 1000003 AS uid", "id AS v"
    )

    def total(path):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(str(path) + "/day=*/*.parquet")
        )

    plain = Table(str(tmp_path / "plain"), partition_by=("day",), sort_key=("uid",))
    plain.append(df)
    bloomed = Table(
        str(tmp_path / "bloomed"),
        partition_by=("day",),
        sort_key=("uid",),
        bloom_filter_cols=("uid",),
        bloom_filter_ndv={"uid": 40_000},
    )
    bloomed.append(df)
    # the bloom filter is real bytes in the footer region (~5-50% here)
    assert total(tmp_path / "bloomed") > total(tmp_path / "plain") * 1.05

    probe = df.filter("id = 1234").collect()[0]["uid"]
    got = bloomed.read(spark).filter(F.col("uid") == probe).collect()
    assert any(r["v"] == 1234 for r in got)
