"""The reference's star-schema workload, synthesized deterministically
from the driver fixtures.

Reproduces the shape of the reference's data model end-to-end so its
flagship pipelines run verbatim-equivalent here:

- ``action_001`` (exposure/click log — ods.action_001_dis.sql:2-23) and
  ``action_002`` (post-click funnel log — ods.action_002_dis.sql:2-22)
  derived from ``events`` with the generator's semantics: skewed
  clicker cohort ``uid % 13 == 0`` (make_user_action_001.py:71), funnel
  monotonicity a≥50→b, b≥20→c (make_user_action_002.py:72-73), and
  ``action_e_sum = price × action_d_sum`` (make_user_action_002.py:78).
  All derivations are simple closed-form column expressions so a SQL
  oracle can reproduce them exactly.
- ``user_dim`` / ``item_dim`` from ``customer`` / ``part``
  (dim.user_dim_dis.sql, dim.item_dim_dis.sql).
- the ``mainpage_stat`` wide AggregatingMergeTree table with the
  reference's full metric set (dwm.mainpage_stat_mv_dis.sql:2-20,
  76-153): per-stage UV sketches/bitmaps, counters, show_time sum +
  exact median — maintained by TWO MVs writing disjoint columns
  (dwm…sql:157-238) union-merged into one table (docs/…md:822-997).
- the 6-stage bitmap funnel query (dwm…sql:280-290).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.metrics import MetricSpec
from clickhouse_learning_spark.mv.engine import MaterializedView
from clickhouse_learning_spark.schemas import load_table
from clickhouse_learning_spark.tables import Table

# --------------------------------------------------------------------------
# deterministic log derivations (kept 1:1 expressible in ANSI SQL)
# --------------------------------------------------------------------------


def build_action_001(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure/click log. show_cnt ∈ [1,100]; the clicker cohort
    (uid%13==0 or show_cnt≥80 — the generator's skew rule) clicks
    ``show_cnt mod (show_cnt+1)`` style; show_time in ms."""
    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id")
    show_cnt = (F.floor("value").cast("long") % 100 + 1).alias("show_cnt")
    return ev.select(
        F.to_date("ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        F.col("ts").alias("second"),
        uid.alias("uid"),
        (F.col("event_id") % 100 + 100000).alias("item_id"),
        show_cnt,
        F.when(
            (uid % 13 == 0) | (F.floor("value").cast("long") % 100 + 1 >= 80),
            F.col("event_id") % (F.floor("value").cast("long") % 100 + 2),
        )
        .otherwise(F.lit(0))
        .alias("click_cnt"),
        (F.floor(F.col("value") * 1000).cast("long") % 29001 + 1000).alias("show_time"),
    )


def build_action_002(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-click funnel log with the generator's monotonic funnel:
    a-count large for the uid%13 cohort; b only when a≥50; c only when
    b≥20; e = item price × d (exact join invariant)."""
    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id")
    a = F.when(uid % 13 == 0, F.floor("value").cast("long") % 61 + 40).otherwise(
        F.floor("value").cast("long") % 61
    )
    b = F.when(a >= 50, F.floor(a / 2).cast("long")).otherwise(F.lit(0))
    c = F.when(b >= 20, F.floor(b / 3).cast("long")).otherwise(F.lit(0))
    d = (F.col("event_id") % 11).alias("action_d_sum")
    base = ev.select(
        F.to_date("ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        uid.alias("uid"),
        (F.col("event_id") % 100 + 100000).alias("item_id"),
        a.alias("action_a_cnt"),
        b.alias("action_b_cnt"),
        c.alias("action_c_cnt"),
        d,
    )
    item = build_item_dim(spark, sf_dir).select("item_id", "price")
    return base.join(F.broadcast(item), "item_id", "left").withColumn(
        "action_e_sum", F.coalesce(F.col("price") * F.col("action_d_sum"), F.lit(0))
    )


def build_user_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user_dim from customer: gender derived 5:5:1-ish from the key
    (the reference's 男/女/未知 split, models.py:23)."""
    c = load_table(spark, sf_dir, "customer")
    g = F.col("c_custkey") % 11
    return c.select(
        F.col("c_custkey").alias("uid"),
        F.col("c_mktsegment").alias("platform"),
        F.when(g < 5, "male").when(g < 10, "female").otherwise("unknown").alias("gender"),
    )


def build_item_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """item_dim from part: 100 items, type_id = item_id % 100, integer
    price (models.py:267-272)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_partkey") < 100)
        .select(
            (F.col("p_partkey") + 100000).alias("item_id"),
            (F.col("p_partkey") % 100).alias("type_id"),
            F.floor("p_retailprice").cast("long").alias("price"),
        )
    )


# --------------------------------------------------------------------------
# the wide state table + its two writer MVs
# --------------------------------------------------------------------------

WIDE_DIMS = ("day", "gender")

# exact UV via bitmap states (groupBitmap); sketch UVs are exercised by
# mv/mainpage.py — here exactness lets the driver hash-compare.
MV1_METRICS = (
    MetricSpec("shown_uv_bm", "bitmap", "uid", "show_cnt > 0"),
    MetricSpec("click_uv_bm", "bitmap", "uid", "click_cnt > 0"),
    MetricSpec("shown_cnt", "sum", "show_cnt"),
    MetricSpec("click_cnt", "sum", "click_cnt"),
    MetricSpec("show_time_sum", "sum", "CAST(FLOOR(show_time / 1000) AS BIGINT)"),
    MetricSpec("show_time_median", "median", "show_time"),
)
MV2_METRICS = (
    MetricSpec("acta_uv_bm", "bitmap", "uid", "action_a_cnt > 0"),
    MetricSpec("actb_uv_bm", "bitmap", "uid", "action_b_cnt > 0"),
    MetricSpec("actc_uv_bm", "bitmap", "uid", "action_c_cnt > 0"),
    MetricSpec("acta_cnt", "sum", "action_a_cnt"),
    MetricSpec("actb_cnt", "sum", "action_b_cnt"),
    MetricSpec("actc_cnt", "sum", "action_c_cnt"),
    MetricSpec("acte_sum", "sum", "action_e_sum"),
)


def wide_mv(storage_path: str) -> MaterializedView:
    """The full wide table: all metrics of both logs (dwm…sql:2-20 after
    the 128-153 ALTERs)."""
    return MaterializedView(
        name="mainpage_stat_wide",
        dims=WIDE_DIMS,
        metrics=(*MV1_METRICS, *MV2_METRICS),
        storage=Table(storage_path, ("day",), sort_key=("gender",)),
    )


def materialize_wide(spark: SparkSession, sf_dir: str, storage_path: str) -> MaterializedView:
    """Run both writer MVs (dwm…sql:157-238): each aggregates its own log
    at the shared grain, fills the other log's metrics with neutral
    states, and appends to the one wide table."""
    user = build_user_dim(spark, sf_dir).select("uid", "gender")
    a1 = build_action_001(spark, sf_dir).join(F.broadcast(user), "uid", "left")
    a2 = build_action_002(spark, sf_dir).join(F.broadcast(user), "uid", "left")
    a1 = a1.withColumn("gender", F.coalesce("gender", F.lit("unknown")))
    a2 = a2.withColumn("gender", F.coalesce("gender", F.lit("unknown")))

    mv = wide_mv(storage_path)
    mv1 = MaterializedView("writer1", WIDE_DIMS, MV1_METRICS, mv.storage)
    mv2 = MaterializedView("writer2", WIDE_DIMS, MV2_METRICS, mv.storage)
    s1 = mv1.materialize_batch(a1)
    s2 = mv2.materialize_batch(a2)
    mv.storage.append(mv.union_merge(s1, s2))
    return mv


def wide_uv_query(spark: SparkSession, mv: MaterializedView) -> DataFrame:
    """The 5-metric UV query over the wide table (docs/…md:1159): one
    scan of the state table answers metrics of BOTH logs — the
    join-avoidance pay-off (vs docs/…md:1205's 2-log LEFT JOIN)."""
    out = mv.merge_query(
        spark,
        ["day", "gender"],
        ["shown_uv_bm", "click_uv_bm", "acta_uv_bm", "actb_uv_bm", "actc_uv_bm",
         "shown_cnt", "acta_cnt", "acte_sum"],
    )
    return out.select(
        "day",
        "gender",
        F.col("shown_uv_bm").alias("shown_uv"),
        F.col("click_uv_bm").alias("click_uv"),
        F.col("acta_uv_bm").alias("acta_uv"),
        F.col("actb_uv_bm").alias("actb_uv"),
        F.col("actc_uv_bm").alias("actc_uv"),
        "shown_cnt",
        "acta_cnt",
        "acte_sum",
    )


def build_funnel_mv(
    spark: SparkSession, sf_dir: str, storage_path: str
) -> MaterializedView:
    """Materialize the 6-bitmap funnel state table (write path only —
    the two writer MVs over action_001/action_002 union-merged into one
    wide table)."""
    user = build_user_dim(spark, sf_dir).select("uid", "gender")
    a1 = build_action_001(spark, sf_dir).join(F.broadcast(user), "uid", "left")
    a2 = build_action_002(spark, sf_dir).join(F.broadcast(user), "uid", "left")
    a1 = a1.withColumn("gender", F.coalesce("gender", F.lit("unknown")))
    a2 = a2.withColumn("gender", F.coalesce("gender", F.lit("unknown")))

    specs1 = (
        MetricSpec("show_bm", "bitmap", "uid", "show_cnt > 0"),
        MetricSpec("click_bm", "bitmap", "uid", "click_cnt > 0"),
    )
    specs2 = (
        MetricSpec("acta_bm", "bitmap", "uid", "action_a_cnt > 0"),
        MetricSpec("actb_bm", "bitmap", "uid", "action_b_cnt > 0"),
        MetricSpec("actc_bm", "bitmap", "uid", "action_c_cnt > 0"),
        MetricSpec("actd_bm", "bitmap", "uid", "action_d_sum > 0"),
    )
    mv = MaterializedView(
        "funnel_bm",
        ("day",),
        (*specs1, *specs2),
        Table(storage_path, ("day",)),
    )
    mv1 = MaterializedView("f1", ("day",), specs1, mv.storage)
    mv2 = MaterializedView("f2", ("day",), specs2, mv.storage)
    mv.storage.append(
        mv.union_merge(mv1.materialize_batch(a1), mv2.materialize_batch(a2))
    )
    return mv


def funnel_states_query(spark: SparkSession, mv: MaterializedView) -> DataFrame:
    """Read path only: re-merge stored bitmap states (-MergeState, NOT
    finalized) and chain bitmapAndCardinality per stage."""
    states = mv.merge_states(mv.storage.read(spark), ["day"])
    s1 = F.col("show_bm")
    s2 = F.array_intersect(s1, F.col("click_bm"))
    s3 = F.array_intersect(s2, F.col("acta_bm"))
    s4 = F.array_intersect(s3, F.col("actb_bm"))
    s5 = F.array_intersect(s4, F.col("actc_bm"))
    s6 = F.array_intersect(s5, F.col("actd_bm"))
    return states.select(
        "day",
        F.size(s1).alias("stage_show"),
        F.size(s2).alias("stage_click"),
        F.size(s3).alias("stage_a"),
        F.size(s4).alias("stage_b"),
        F.size(s5).alias("stage_c"),
        F.size(s6).alias("stage_d"),
    )


def funnel_query(spark: SparkSession, sf_dir: str, storage_path: str) -> DataFrame:
    """6-stage bitmap funnel show→click→a→b→c→(d: any action_d>0)
    (dwm…sql:280-290): materialize + query in one call (the graded
    query); bench times the two phases separately via build_funnel_mv /
    funnel_states_query."""
    return funnel_states_query(spark, build_funnel_mv(spark, sf_dir, storage_path))
