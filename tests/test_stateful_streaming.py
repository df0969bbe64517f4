"""Custom stateful streaming operators: first-seen dedup and running
totals across micro-batches, plus built-in streaming dropDuplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_learning_spark.mv.mainpage import prepare_events
from clickhouse_learning_spark.streaming.ingest import parquet_stream
from clickhouse_learning_spark.streaming.stateful import (
    streaming_first_seen,
    streaming_running_totals,
)

from .conftest import SF_SMOKE


def _land(spark, tmp_path, n_files=4):
    ev = prepare_events(spark, SF_SMOKE).drop("insert_second")
    landing = str(tmp_path / "landing")
    ev.repartition(n_files).write.parquet(landing)
    return ev, landing


def _run_to_memory(stream_df, name, mode):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_first_seen_dedup(spark, tmp_path):
    ev, landing = _land(spark, tmp_path)
    stream = parquet_stream(spark, landing, ev.schema, max_files_per_trigger=1)
    _run_to_memory(streaming_first_seen(stream), "first_seen_out", "append")
    out = spark.sql("SELECT * FROM first_seen_out").collect()
    uids = [r["uid"] for r in out]
    # exactly one row per distinct uid across ALL micro-batches
    assert len(uids) == len(set(uids)) == ev.select("uid").distinct().count()


def test_streaming_running_totals(spark, tmp_path):
    ev, landing = _land(spark, tmp_path)
    stream = parquet_stream(spark, landing, ev.schema, max_files_per_trigger=1)
    _run_to_memory(streaming_running_totals(stream), "totals_out", "update")
    # last update per uid == the full batch aggregate
    out = spark.sql(
        """
        SELECT uid, max_by(n_events, n_events) AS n_events,
               max_by(value_sum, n_events) AS value_sum
        FROM totals_out GROUP BY uid
        """
    ).collect()
    got = {r["uid"]: (r["n_events"], round(r["value_sum"], 3)) for r in out}
    want = {
        r["uid"]: (r["n"], round(r["s"], 3))
        for r in ev.groupBy("uid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_builtin_streaming_drop_duplicates(spark, tmp_path):
    """Built-in stateful dedup (dropDuplicates with state) — the simple
    path when no payload is needed."""
    ev, landing = _land(spark, tmp_path)
    stream = parquet_stream(spark, landing, ev.schema, max_files_per_trigger=1)
    dedup = stream.select("uid").dropDuplicates(["uid"])
    _run_to_memory(dedup, "dd_out", "append")
    n = spark.sql("SELECT count(*) c FROM dd_out").collect()[0]["c"]
    assert n == ev.select("uid").distinct().count()


def test_streaming_funnel_equals_batch_funnel(spark, tmp_path):
    """Dual-path: the incremental stateful funnel, fed the log as 6
    micro-batches in hash order (NOT time order), converges to exactly
    the batch funnel_levels answer — arrival-order independence of the
    first-chance chain state."""
    from clickhouse_learning_spark.functions import funnel as FN
    from clickhouse_learning_spark.streaming.stateful import streaming_funnel_levels

    ev, landing = _land(spark, tmp_path, n_files=6)
    conds = ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"]
    stream = parquet_stream(spark, landing, ev.schema, max_files_per_trigger=1)
    _run_to_memory(
        streaming_funnel_levels(stream, conds, window_s=86400, ts_col="second"),
        "funnel_out",
        "update",
    )
    got = {
        r["uid"]: r["level"]
        for r in spark.sql(
            "SELECT uid, max_by(level, updates) AS level FROM funnel_out GROUP BY uid"
        ).collect()
    }
    want = {
        r["uid"]: r["level"]
        for r in FN.funnel_levels(ev, "uid", "second", conds, window_s=86400).collect()
    }
    assert got == want


def test_streaming_topk_exact_when_uncapped(spark, tmp_path):
    """streaming_topk with capacity >= a shard's distinct items is
    EXACT: the merged final counter tables equal the batch counts, and
    topk_merge equals the batch top-k."""
    from clickhouse_learning_spark.streaming.stateful import (
        streaming_topk,
        topk_merge,
    )

    ev, landing = _land(spark, tmp_path)
    ev = ev.select(F.concat(F.lit("u"), (F.col("uid") % 97)).alias("item"))
    landing2 = str(tmp_path / "items")
    ev.repartition(4).write.parquet(landing2)
    stream = parquet_stream(
        spark, landing2, ev.schema, max_files_per_trigger=1
    )
    _run_to_memory(
        streaming_topk(stream, shards=4, capacity=1000), "topk_out", "update"
    )
    # last emission per (shard, item) — multiple micro-batches update
    final = spark.sql(
        """
        SELECT item, max(cnt) AS cnt, max(err) AS err FROM topk_out
        GROUP BY item
        """
    )
    got = {r["item"]: (r["cnt"], r["err"]) for r in final.collect()}
    want = {
        r["item"]: r["n"]
        for r in ev.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    assert all(e == 0 for _, e in got.values())
    top = topk_merge(final, 5).collect()
    want_top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["item"], r["cnt"]) for r in top] == want_top


def test_streaming_topk_capped_error_bound(spark, tmp_path):
    """With a tight capacity the Space-Saving bound holds per shard:
    true <= cnt <= true + err, and every surviving count's
    over-estimation err stays <= that shard's row count / capacity *
    capacity... the canonical guarantee: err <= (shard rows) /
    capacity is per-increment amortized — assert the weaker but exact
    invariants cnt - err <= true <= cnt for surviving items."""
    from clickhouse_learning_spark.streaming.stateful import streaming_topk

    ev, landing = _land(spark, tmp_path)
    ev = ev.select(F.concat(F.lit("u"), (F.col("uid") % 211)).alias("item"))
    landing2 = str(tmp_path / "items_capped")
    ev.repartition(4).write.parquet(landing2)
    stream = parquet_stream(
        spark, landing2, ev.schema, max_files_per_trigger=1
    )
    _run_to_memory(
        streaming_topk(stream, shards=2, capacity=8), "topk_cap_out", "update"
    )
    final = spark.sql(
        "SELECT item, max(cnt) AS cnt, max(err) AS err FROM topk_cap_out "
        "GROUP BY item"
    ).collect()
    true = {
        r["item"]: r["n"]
        for r in ev.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len(final) > 0
    for r in final:
        t = true[r["item"]]
        assert r["cnt"] - r["err"] <= t <= r["cnt"], (r, t)


def test_streaming_dd_sketch_equals_batch_histogram(spark, tmp_path):
    """streaming_dd_sketch's final state equals the batch bucket
    histogram exactly (counts are integers; merge-order invariant),
    across multiple micro-batches and keys."""
    from clickhouse_learning_spark.functions.metrics import dd_bucket
    from clickhouse_learning_spark.streaming.stateful import (
        streaming_dd_sketch,
    )

    ev, _ = _land(spark, tmp_path)
    vals = ev.select(
        F.concat(F.lit("k"), (F.col("uid") % 3)).alias("k"),
        dd_bucket((F.col("uid") % 50).cast("double") / 7.0 + 0.01, 0.01)
        .alias("bucket"),
    )
    landing = str(tmp_path / "ddq")
    vals.repartition(5).write.parquet(landing)
    stream = parquet_stream(spark, landing, vals.schema,
                            max_files_per_trigger=1)
    _run_to_memory(streaming_dd_sketch(stream), "ddq_out", "update")
    final = spark.sql(
        "SELECT k, bucket, max(cnt) AS cnt FROM ddq_out GROUP BY k, bucket"
    )
    got = {(r["k"], r["bucket"]): r["cnt"] for r in final.collect()}
    want = {
        (r["k"], r["bucket"]): r["n"]
        for r in vals.groupBy("k", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
