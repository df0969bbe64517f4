"""MV/state-path laws under the ADVERSARIAL layouts the 100 TB design
point actually faces (VERDICT r5 task 5): hot-key skew, two concurrent
wide-table writers, and queries landing mid-compaction. The friendly
uniform layout is covered by test_mv_engine.py; these tests pin that

- a heavily skewed key distribution changes NOTHING about answers
  (partial/final hash aggregation absorbs the hot group map-side —
  the reason the MV write path needs no explicit salting for
  algebraic and sketch states), under different shuffle widths;
- two writers filling disjoint metric columns of one wide state table
  stay correct when a query lands between their appends, after a
  PARTIAL compaction (some partitions merged, others still multi-row),
  and after a post-compaction append — the merge-on-read invariant the
  reference proves pre/post OPTIMIZE FINAL (docs/物化视图…md:934-996).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.metrics import MetricSpec
from clickhouse_learning_spark.mv.engine import MaterializedView
from clickhouse_learning_spark.tables import Table


def _skewed_events(spark, n=200_000, hot_frac=10):
    """Synthetic log where ~90% of rows land on one (day, etype) key
    (and the hot group still has high uid cardinality — the HLL-state
    stress case)."""
    return spark.range(n).select(
        (F.col("id") % 50_000).alias("uid"),
        F.when(F.col("id") % hot_frac < hot_frac - 1, F.lit("2024-01-01"))
        .otherwise(
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                (F.col("id") % 7).cast("int"),
            ).cast("string")
        )
        .cast("date")
        .alias("day"),
        F.when(F.col("id") % hot_frac < hot_frac - 1, F.lit(0))
        .otherwise(F.col("id") % 5)
        .alias("etype"),
        (F.col("id") % 1000).alias("val"),
    )


_METRICS = (
    MetricSpec("uv", "uniq_exact", "uid"),
    MetricSpec("val_sum", "sum", "val"),
    MetricSpec("cnt", "count", "1"),
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hotkey_mv_layout_independent(spark, tmp_path):
    """Materialize + merge over the skewed log must produce identical
    rows under adversarially different shuffle widths AND equal the
    direct from-raw aggregation — no salting needed on the write path
    because every state kind here is partial-aggregation-combinable."""
    ev = _skewed_events(spark)
    want = _rows(
        ev.groupBy("day").agg(
            F.count_distinct("uid").alias("uv"),
            F.sum("val").alias("val_sum"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    got = {}
    for parts in ("3", "64"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            mv = MaterializedView(
                f"skew{parts}",
                ("day", "etype"),
                _METRICS,
                Table(str(tmp_path / f"skew{parts}"), ("day",)),
            )
            mv.append_batch(ev.repartition(int(parts)))
            got[parts] = _rows(
                mv.merge_query(spark, ["day"], ["uv", "val_sum", "cnt"])
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert got["3"] == got["64"] == want


def test_two_writer_mid_compaction_correct(spark, tmp_path):
    """Two writers append disjoint metric columns (neutral-filled via
    union_merge) in interleaved batches; a PARTIAL compaction merges
    only some day-partitions; a third append lands after it. The
    merge-on-read answer must equal the from-raw oracle at EVERY
    intermediate point — correctness may never depend on compaction
    state."""
    ev = _skewed_events(spark, n=60_000)
    m_all = (
        MetricSpec("even_sum", "sum", "val", "etype % 2 = 0"),
        MetricSpec("odd_cnt", "sum", "1", "etype % 2 = 1"),
    )
    mv = MaterializedView(
        "wide2w", ("day",), m_all, Table(str(tmp_path / "wide2w"), ("day",))
    )

    def writer_a(batch):  # fills only even_sum
        s = batch.filter("etype % 2 = 0").groupBy("day").agg(
            m_all[0].partial()
        )
        mv.storage.append(mv.union_merge(s))

    def writer_b(batch):  # fills only odd_cnt
        s = batch.filter("etype % 2 = 1").groupBy("day").agg(
            m_all[1].partial()
        )
        mv.storage.append(mv.union_merge(s))

    def oracle(upto):
        return _rows(
            ev.filter(F.col("id_mod") < upto)
            .groupBy("day")
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("etype") % 2 == 0, F.col("val"))),
                    F.lit(0),
                ).alias("even_sum"),
                F.coalesce(
                    F.sum(F.when(F.col("etype") % 2 == 1, 1)), F.lit(0)
                ).alias("odd_cnt"),
            )
        )

    ev = ev.withColumn("id_mod", F.monotonically_increasing_id() % 3).cache()

    # batch 0 from both writers, interleaved
    writer_a(ev.filter("id_mod = 0"))
    writer_b(ev.filter("id_mod = 0"))
    assert _rows(mv.merge_query(spark, ["day"])) == oracle(1)

    # batch 1 — then compact only HALF the partitions (mid-compaction)
    writer_b(ev.filter("id_mod = 1"))
    writer_a(ev.filter("id_mod = 1"))
    days = sorted(
        r[0] for r in mv.storage.read(spark).select("day").distinct().collect()
    )
    mv.compact(spark, partitions=[(d,) for d in days[: len(days) // 2]])
    assert _rows(mv.merge_query(spark, ["day"])) == oracle(2)

    # batch 2 appends AFTER the partial compaction
    writer_a(ev.filter("id_mod = 2"))
    writer_b(ev.filter("id_mod = 2"))
    assert _rows(mv.merge_query(spark, ["day"])) == oracle(3)

    # full compaction is a pure space optimization: answers unchanged,
    # rows collapse to one per (day)
    before = _rows(mv.merge_query(spark, ["day"]))
    mv.compact(spark)
    assert _rows(mv.merge_query(spark, ["day"])) == before
    per_key = (
        mv.storage.read(spark).groupBy("day").count().agg(F.max("count"))
    ).collect()[0][0]
    assert per_key == 1
