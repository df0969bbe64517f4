"""Metric-query router: answer from the state table when possible.

The reference's core optimization is querying the (orders-of-magnitude
smaller) pre-aggregated state table instead of raw logs — its docs show
48.7k vs 360k rows processed for the same answer
(/root/reference/docs/物化视图的实战经验分享.md:1159 vs :1205). OSS Spark
has no automatic MV rewrite, so SURVEY §4 calls for a thin routing API:
given a metric request, decide whether a registered MV can answer it
and emit the merge/finalize query; otherwise aggregate the raw log.

Eligibility for MV routing (standard MV-containment rules):

- requested group-by dims ⊆ MV dims (coarser grains re-merge states);
- requested metrics ⊆ MV metrics (by name);
- filters reference only MV dim columns (a filter on a non-dim raw
  column would need rows the states no longer distinguish).

A full Catalyst rewrite rule (intercepting arbitrary logical plans) is
the documented stretch; this explicit router covers the reference's
actual usage pattern, where queries are metric requests, not ad-hoc
SQL over raw logs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_learning_spark.mv.engine import MaterializedView


@dataclass
class MetricRouter:
    """Routes (dims, metrics, filters) requests to the best source."""

    raw_source: object  # callable: spark -> DataFrame (the raw log)
    views: list[MaterializedView] = field(default_factory=list)

    def register(self, mv: MaterializedView) -> None:
        self.views.append(mv)

    # -- eligibility ---------------------------------------------------------
    def eligible(
        self,
        mv: MaterializedView,
        group_by: list[str],
        metric_names: list[str],
        filter_cols: set[str],
    ) -> bool:
        dims = set(mv.dims)
        names = {m.name for m in mv.metrics}
        return (
            set(group_by) <= dims
            and set(metric_names) <= names
            and filter_cols <= dims
        )

    def choose(
        self, group_by: list[str], metric_names: list[str], filter_cols: set[str]
    ) -> MaterializedView | None:
        """Pick the eligible MV with the fewest dims (coarsest state →
        fewest state rows scanned)."""
        cands = [
            mv
            for mv in self.views
            if self.eligible(mv, group_by, metric_names, filter_cols)
        ]
        return min(cands, key=lambda mv: len(mv.dims)) if cands else None

    # -- query ---------------------------------------------------------------
    def query(
        self,
        spark: SparkSession,
        group_by: list[str],
        metric_names: list[str],
        where: dict[str, object] | None = None,
    ) -> DataFrame:
        """``where`` is {dim_col: value} equality filters (the reference's
        query surface — day/platform pins, SURVEY P3)."""
        where = where or {}
        mv = self.choose(group_by, metric_names, set(where))
        if mv is not None:
            cond = None
            for k, v in where.items():
                c = F.col(k) == F.lit(v)
                cond = c if cond is None else (cond & c)
            return mv.merge_query(spark, group_by, metric_names, where=cond)
        return self._raw_query(spark, group_by, metric_names, where)

    def routed_source(
        self, group_by: list[str], metric_names: list[str], where: dict | None = None
    ) -> str:
        mv = self.choose(group_by, metric_names, set(where or {}))
        return mv.name if mv is not None else "raw"

    def _raw_query(
        self,
        spark: SparkSession,
        group_by: list[str],
        metric_names: list[str],
        where: dict[str, object],
    ) -> DataFrame:
        """Fallback: compute partial→finalize in one pass over the raw
        log (every MetricSpec knows its raw-source expression, so the
        fallback is generated, not hand-written)."""
        specs = {}
        for mv in self.views:
            for m in mv.metrics:
                specs.setdefault(m.name, m)
        missing = [n for n in metric_names if n not in specs]
        if missing:
            raise KeyError(f"no known definition for metrics {missing}")
        df = self.raw_source(spark)
        for k, v in where.items():
            df = df.filter(F.col(k) == F.lit(v))
        partials = df.groupBy(*group_by).agg(
            *[specs[n].partial() for n in metric_names]
        )
        return partials.select(
            *group_by, *[specs[n].finalize() for n in metric_names]
        )
