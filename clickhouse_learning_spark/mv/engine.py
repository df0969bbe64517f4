"""Materialized-view engine: incremental pre-aggregation over mergeable states.

Reproduces the reference's MV pipeline
(/root/reference/scripts/sql/dwm.mainpage_stat_mv_dis.sql:28-57, semantics
at /root/reference/docs/物化视图的实战经验分享.md:298-316):

1. Every ingested batch is aggregated *by itself* into partial states
   (:meth:`MaterializedView.materialize_batch` ≈ the insert-trigger MV —
   it never recomputes history).
2. States append to a wide AggregatingMergeTree-style state table
   (:attr:`MaterializedView.storage`).
3. A background :meth:`compact` lazily re-merges equal-key state rows —
   a pure space optimization, exactly like ClickHouse background merges.
4. Queries ALWAYS re-merge + finalize (:meth:`merge_query`), so results
   are correct at any compaction state (the reference proves this
   invariant pre/post OPTIMIZE FINAL at docs/…md:934-996, and shows the
   negative case — reading states without -Merge is wrong — at
   docs/…md:327-415).

Scale design: ``materialize_batch`` is one shuffle (the groupBy) over
just the new batch; ``merge_query`` scans the (orders-of-magnitude
smaller) state table with partition pruning on ``day`` and does one
partial/final aggregation — the same two-level shard→initiator merge the
Distributed engine performs (docs/…md:272-294), handled natively by
Spark's partial/final hash aggregation. The state table is
day-partitioned so TTL and compaction are per-partition jobs that
parallelize across the cluster.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.metrics import MetricSpec
from clickhouse_learning_spark.tables import Table


@dataclass
class MaterializedView:
    """``CREATE MATERIALIZED VIEW ... TO storage`` (compute/storage split,
    docs/物化视图的实战经验分享.md:199-207)."""

    name: str
    dims: tuple[str, ...]
    metrics: tuple[MetricSpec, ...]
    storage: Table

    def metric(self, name: str) -> MetricSpec:
        for m in self.metrics:
            if m.name == name:
                return m
        raise KeyError(f"{self.name}: no metric {name!r}")

    # -- write path ------------------------------------------------------------
    def materialize_batch(self, batch: DataFrame) -> DataFrame:
        """Aggregate ONE insert batch to partial states (insert-trigger MV
        semantics: docs/…md:298-301). One shuffle, map-side partials;
        value→count state kinds (topk / quantile / quantile_sketch) take
        the relational pre-count side path — see
        :func:`~clickhouse_learning_spark.functions.metrics.build_states`."""
        from clickhouse_learning_spark.functions.metrics import build_states

        return build_states(batch, self.dims, self.metrics)

    def append_batch(self, batch: DataFrame) -> None:
        self.storage.append(self.materialize_batch(batch))

    # -- read path ---------------------------------------------------------------
    def merge_query(
        self,
        spark: SparkSession,
        group_by: tuple[str, ...] | list[str],
        metric_names: list[str] | None = None,
        where: Column | str | None = None,
    ) -> DataFrame:
        """Query the state table: filter (partition-pruned on day) →
        re-merge states per requested grouping → finalize. Equivalent of
        ``SELECT dims, uniqCombinedMerge(uv), sum(cnt) FROM state GROUP BY
        dims`` (dwm.mainpage_stat_mv_dis.sql:60-70)."""
        names = metric_names or [m.name for m in self.metrics]
        df = self.storage.read(spark)
        if where is not None:
            df = df.filter(F.expr(where) if isinstance(where, str) else where)
        aggs = [self.metric(n).merged_finalized() for n in names]
        return df.groupBy(*group_by).agg(*aggs)

    def merge_states(self, df: DataFrame, group_by: list[str]) -> DataFrame:
        """Re-merge states WITHOUT finalizing (the -MergeState combinator,
        dwm.mainpage_stat_mv_dis.sql:282-287) — for funnel algebra over
        bitmap states or for compaction."""
        return df.groupBy(*group_by).agg(*[m.merge() for m in self.metrics])

    # -- maintenance ---------------------------------------------------------------
    def compact(self, spark: SparkSession, partitions: list | None = None) -> None:
        """Re-merge equal-key rows in storage (background merge / OPTIMIZE
        FINAL). Per-partition re-aggregation; pure space optimization.

        ``partitions``: storage partition values (tuples, or scalars for
        a 1-column key) to compact — ClickHouse's ``OPTIMIZE TABLE …
        PARTITION p``. At 100 TB this is the only sane form: merges are
        per-partition (recent days churn, history is already merged),
        so the sweep reads and rewrites ONLY the named partitions via
        dynamic partition overwrite. ``None`` = whole table (small
        state tables / tests). Pick candidates with
        :meth:`partitions_needing_compaction`.

        Guard: refuses to run from a view definition older than the
        stored schema — compacting with a stale metric set would project
        away columns added by with_metric (data loss)."""
        stored = self.storage.read(spark)
        if partitions is not None:
            if not partitions:
                return
            import functools
            import operator as _op

            pcols = self.storage.partition_by
            tuples = [
                tuple(p) if isinstance(p, (tuple, list)) else (p,)
                for p in partitions
            ]
            cond = functools.reduce(
                _op.or_,
                [
                    functools.reduce(
                        _op.and_,
                        [F.col(c) == v for c, v in zip(pcols, t)],
                    )
                    for t in tuples
                ],
            )
            stored = stored.filter(cond)
        known = set(self.dims) | {m.name for m in self.metrics}
        unknown = [c for c in stored.columns if c not in known]
        if unknown:
            raise ValueError(
                f"{self.name}: storage has columns {unknown} not in this view "
                "definition — compact with the newest (evolved) view to avoid "
                "dropping them"
            )
        merged = self.merge_states(stored, list(self.dims))
        qnames = [
            m.name for m in self.metrics if m.kind in ("quantile", "quantile_sketch")
        ]
        if qnames:
            # quantile states also deduplicate by value here, shrinking
            # them to O(distinct values) — O(occupied buckets) for the
            # sketch kind (metrics.compress_quantile_states)
            from clickhouse_learning_spark.functions.metrics import (
                compress_quantile_states,
            )

            merged = compress_quantile_states(merged, list(self.dims), qnames)
        tspecs = [m for m in self.metrics if m.kind == "topk"]
        if tspecs:
            # topk states re-sum per value and re-truncate to reserve
            from clickhouse_learning_spark.functions.metrics import (
                compress_topk_states,
            )

            merged = compress_topk_states(merged, list(self.dims), tspecs)
        mspecs = [m for m in self.metrics if m.kind == "summap"]
        if mspecs:
            # summap states re-sum per key (one entry per distinct key)
            from clickhouse_learning_spark.functions.metrics import (
                compress_summap_states,
            )

            merged = compress_summap_states(merged, list(self.dims), mspecs)
        if partitions is not None:
            # dynamic overwrite: only the partitions present in `merged`
            # (= exactly the named ones) are replaced
            self.storage.overwrite_partitions(merged)
        else:
            self.storage._rewrite(merged)

    def partitions_needing_compaction(
        self, spark: SparkSession, max_files: int = 1
    ) -> list[tuple]:
        """Partition values whose file count exceeds ``max_files`` — the
        MergeTree 'too many parts' trigger, from the parts-stats
        metadata scan (no data read beyond file names)."""
        rows = (
            self.storage.stats(spark)
            .filter(F.col("files") > max_files)
            .select(*self.storage.partition_by)
            .collect()
        )
        return [tuple(r) for r in rows]

    # -- schema evolution (D5/D6) ---------------------------------------------
    def with_metric(self, spec: MetricSpec) -> "MaterializedView":
        """ALTER TABLE ... ADD COLUMN for an aggregate metric
        (dwm.mainpage_stat_mv_dis.sql:83-85,128-153): returns a view with
        the extra metric. Existing state files simply lack the column —
        reads mergeSchema it in as NULL, which is every kind's neutral
        state, so history needs no rewrite (neutral backfill)."""
        return MaterializedView(
            self.name, self.dims, (*self.metrics, spec), self.storage
        )

    def with_dimension(self, dim: str) -> "MaterializedView":
        """ALTER ... ADD COLUMN dimension + MODIFY ORDER BY
        (dwm…sql:76-79): new batches aggregate at the finer grain; old
        state rows carry NULL for the new dim (a distinct 'unknown'
        group, exactly like ClickHouse's default-value backfill)."""
        return MaterializedView(
            self.name, (*self.dims, dim), self.metrics, self.storage
        )

    # -- multi-writer wide tables -------------------------------------------------
    def union_merge(self, *state_dfs: DataFrame) -> DataFrame:
        """Union-merge state batches that fill disjoint metric columns
        (the reference's join-avoidance pattern: two MVs from two logs
        write one wide table, docs/…md:822-828,831-997). Missing columns
        are filled with the neutral state so rows merge away."""
        filled = []
        for df in state_dfs:
            cols = set(df.columns)
            missing = [m.neutral() for m in self.metrics if m.name not in cols]
            filled.append(df.select("*", *missing) if missing else df)
        out = filled[0]
        for df in filled[1:]:
            out = out.unionByName(df, allowMissingColumns=False)
        return out


def rollup_ttl(
    mv: "MaterializedView",
    spark: SparkSession,
    keep,
    coarse_dims: list[str],
    now=None,
    day_col: str = "day",
) -> int:
    """ClickHouse's ``TTL … GROUP BY k SET v = …`` — age-based ROLLUP
    instead of deletion: state partitions older than ``now − keep``
    are re-aggregated at ``coarse_dims`` (dropping the finer
    dimensions' detail) and rewritten in place, so history keeps its
    aggregate truth at a fraction of the rows. Recent partitions are
    untouched — the sweep reads and rewrites ONLY expired partitions
    (dynamic partition overwrite), the same scoping rule as
    partition-scoped compaction.

    The dropped fine dimensions are retained as columns with NULL (the
    schema stays stable for readers; NULL = the 'rolled-up' marker,
    exactly like with_dimension's backfill convention).

    Returns the number of partitions rolled up.
    """
    import datetime as _dt

    from pyspark.sql import functions as _F

    cutoff = (now or _dt.date.today()) - keep
    stored = mv.storage.read(spark)
    expired = stored.filter(_F.col(day_col) < _F.lit(cutoff))
    parts = [r[0] for r in expired.select(day_col).distinct().collect()]
    if not parts:
        return 0
    group = coarse_dims if day_col in coarse_dims else [day_col, *coarse_dims]
    merged = mv.merge_states(expired, group)
    # keep the schema stable: dropped fine dims come back as typed NULL
    types = dict(stored.dtypes)
    fine = [d for d in mv.dims if d not in group]
    for d in fine:
        merged = merged.withColumn(d, _F.lit(None).cast(types[d]))
    mv.storage.overwrite_partitions(merged.select(*stored.columns))
    return len(parts)
