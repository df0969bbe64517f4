"""The flagship wide state table, mapped onto the driver's ``events`` data.

Reference: ``dwm.mainpage_stat_mv`` — a 6-key AggregatingMergeTree wide
table fed by insert-trigger MVs, holding HLL UV sketches, partial sums,
an exact-median state and uid bitmaps
(/root/reference/scripts/sql/dwm.mainpage_stat_mv_dis.sql:2-20,76-153),
including a per-row dictGet enrichment inside the MV (dwm…sql:108).

On the driver fixtures the role mapping (FIXTURES.md §B) is:

- dims: ``day``/``hour`` (DDL default expressions over ``ts``) and
  ``segment`` — the customer market segment broadcast-joined from the
  ``customer`` table by uid, standing in for the reference's
  dictGet-enriched ``gender``/``platform`` dims.
- per-event-type conditional metrics (the -If combinator, dwm…sql:46-48):
  ``view_uv = uniqCombinedStateIf(uid, event_type='view')`` etc., one
  (uv sketch, count, uid-bitmap) triple per funnel stage — standing in
  for shown/click/action_a..c.
- ``value_sum``/``value_median`` stand in for show_time_sum /
  show_time_median (dwm…sql:50,83,114) including the ms→s style integer
  rescale (dwm…sql:50).
- the per-stage uid bitmaps drive the funnel query (dwm…sql:280-290).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.metrics import MetricSpec
from clickhouse_learning_spark.mv.engine import MaterializedView
from clickhouse_learning_spark.schemas import load_table
from clickhouse_learning_spark.sources.ingest import events_as_action_log
from clickhouse_learning_spark.tables import Table

# The funnel ordering we impose on the driver's event_type values
# (view → click → signup → purchase; 'error' tracked by totals only).
FUNNEL_STAGES = ("view", "click", "signup", "purchase")

DIMS = ("day", "hour", "segment")


def prepare_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-log ingest: default-expression columns + broadcast dictionary
    enrichment (the reference enriches inside the MV via dictGet,
    dwm…sql:108; dictGet ≡ broadcast join per docs/…md:663-747)."""
    ev = events_as_action_log(load_table(spark, sf_dir, "events"))
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("uid"), F.col("c_mktsegment").alias("segment")
    )
    return ev.join(F.broadcast(dim), "uid", "left").withColumn(
        "segment", F.coalesce("segment", F.lit("UNKNOWN"))
    )


def mainpage_metrics() -> tuple[MetricSpec, ...]:
    ms: list[MetricSpec] = []
    for t in FUNNEL_STAGES:
        ms.append(MetricSpec(f"{t}_uv", "uniq", "uid", f"event_type = '{t}'"))
        ms.append(MetricSpec(f"{t}_cnt", "sum", "1", f"event_type = '{t}'"))
        ms.append(MetricSpec(f"{t}_bm", "bitmap", "uid", f"event_type = '{t}'"))
    # value is a double; states store integer milli-units the way the
    # reference stores integer seconds from ms (dwm…sql:50)
    ms.append(MetricSpec("value_sum", "sum", "CAST(value * 1000 AS BIGINT)"))
    ms.append(MetricSpec("value_median", "median", "CAST(value * 1000 AS BIGINT)"))
    ms.append(MetricSpec("event_cnt", "count", "1"))
    return tuple(ms)


def mainpage_mv(storage_path: str) -> MaterializedView:
    return MaterializedView(
        name="mainpage_stat_mv",
        dims=DIMS,
        metrics=mainpage_metrics(),
        storage=Table(
            path=storage_path,
            partition_by=("day",),
            # ORDER BY analog: cluster state rows for row-group skipping
            sort_key=("hour", "segment"),
        ),
    )
