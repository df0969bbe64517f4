"""Day-in-the-life integration: one wide MV carrying EVERY metric-kind
family, fed in four batches, then compacted, row-deleted, and
TTL-expired — the merged answers must track a direct raw-log
aggregation at every step (the reference's OPTIMIZE-FINAL invariance,
docs/…md:934-996, extended to the full maintenance lifecycle)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.metrics import MetricSpec
from clickhouse_learning_spark.mv.engine import MaterializedView
from clickhouse_learning_spark.queries import _events
from clickhouse_learning_spark.tables import Table
from tests.conftest import SF_SMOKE


def _mv(path) -> MaterializedView:
    return MaterializedView(
        "lifecycle",
        ("day",),
        (
            MetricSpec("uv", "uniq_exact", "uid"),
            MetricSpec("purchase_uv", "bitmap", "uid", "event_type = 'purchase'",
                       representation="roaring"),
            MetricSpec("cents", "sum", "CAST(floor(value * 100) AS BIGINT)"),
            MetricSpec("cents_med", "median", "CAST(floor(value * 100) AS BIGINT)"),
            MetricSpec("top_types", "topk", "event_type", k=2, value_type="string"),
            MetricSpec("type_cents", "summap", "event_type",
                       weight="CAST(floor(value * 100) AS BIGINT)"),
            MetricSpec("peak_uid", "argmax", "uid", order_by="value",
                       order_type="double"),
            MetricSpec("cnt", "count", "1"),
        ),
        Table(str(path), ("day",)),
    )


def _raw_answers(ev):
    per_type = (
        ev.groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.expr("CAST(floor(value*100) AS BIGINT)")).alias("s"),
        )
    )
    topk = {
        str(r["day"]): tuple(r["tv"])
        for r in per_type.groupBy("day")
        .agg(
            F.expr(
                "transform(slice(array_sort(collect_list(struct(-c AS nc, event_type AS v))), 1, 2), s -> s.v)"
            ).alias("tv")
        )
        .collect()
    }
    summap = {
        str(r["day"]): r["m"]
        for r in per_type.groupBy("day")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("event_type").alias("k"), F.col("s").alias("c")))
                    ),
                    lambda s: F.concat_ws(":", s["k"], s["c"]),
                ),
                "|",
            ).alias("m")
        )
        .collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("day").orderBy(F.desc("value"), F.desc("uid"))
    peak = {
        str(r["day"]): r["uid"]
        for r in ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    }
    base = {
        str(r["day"]): (r["uv"], r["puv"], r["cents"], r["med"], r["cnt"])
        for r in ev.groupBy("day")
        .agg(
            F.count_distinct("uid").alias("uv"),
            F.count_distinct(F.when(F.col("event_type") == "purchase", F.col("uid"))).alias("puv"),
            F.sum(F.expr("CAST(floor(value*100) AS BIGINT)")).alias("cents"),
            F.median(F.expr("CAST(floor(value*100) AS BIGINT)")).alias("med"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    }
    return {
        d: (*base[d], topk[d], summap[d], peak[d]) for d in base
    }


def _mv_answers(spark, mv):
    return {
        str(r["day"]): (
            r["uv"],
            r["purchase_uv"],
            r["cents"],
            r["cents_med"],
            r["cnt"],
            tuple(r["top_types"]),
            r["type_cents"],
            r["peak_uid"],
        )
        for r in mv.merge_query(
            spark,
            ["day"],
            ["uv", "purchase_uv", "cents", "cents_med", "cnt", "top_types",
             "type_cents", "peak_uid"],
        ).collect()
    }


def test_full_lifecycle_every_kind(spark, tmp_path):
    ev = _events(spark, SF_SMOKE)
    mv = _mv(tmp_path / "state")

    # 1. four insert batches (hash-split, so every day spans batches)
    for i in range(4):
        mv.append_batch(ev.filter(F.pmod(F.col("event_id"), F.lit(4)) == i))
    want = _raw_answers(ev)
    assert _mv_answers(spark, mv) == want

    # 2. background compaction: answers invariant, state rows shrink
    pre_rows = mv.storage.read(spark).count()
    mv.compact(spark)
    assert mv.storage.read(spark).count() < pre_rows
    assert _mv_answers(spark, mv) == want

    # 3. row-level DELETE of one day from the STATE table (mutation)
    days = sorted(want)
    drop_day = days[0]
    mv.storage.delete_where(spark, f"day = DATE'{drop_day}'")
    got = _mv_answers(spark, mv)
    assert drop_day not in got
    assert got == {d: v for d, v in want.items() if d != drop_day}

    # 4. TTL: keep only the most recent 10 days (metadata-only drop)
    cutoff_now = dt.date.fromisoformat(days[-1]) + dt.timedelta(days=1)
    kept = mv.storage.apply_ttl(spark, keep=dt.timedelta(days=10), now=cutoff_now)
    survivors = {
        d for d in days[1:] if dt.date.fromisoformat(d) >= cutoff_now - dt.timedelta(days=10)
    }
    assert kept == len(survivors)
    assert set(_mv_answers(spark, mv)) == survivors
