"""Background maintenance orchestration (SURVEY T2/T5/D8 + §5.2).

The reference relies on ClickHouse background threads (state merges,
TTL expiry) and an ops script with reconciliation checks
(/root/reference/scripts/python/data_rebalance.py:192-347). Here the
same duties are explicit, schedulable jobs over registered tables/MVs,
each guarded by the rebalancer's invariant: per-partition row totals
must reconcile before/after (for compaction, the MERGED row totals —
i.e. every query answer — must be unchanged; for TTL, only partitions
past the horizon may disappear).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from clickhouse_learning_spark.mv.engine import MaterializedView


@dataclass
class MaintenanceJob:
    mv: MaterializedView
    ttl: dt.timedelta | None = None


@dataclass
class Maintainer:
    jobs: list[MaintenanceJob] = field(default_factory=list)

    def register(self, mv: MaterializedView, ttl: dt.timedelta | None = None) -> None:
        self.jobs.append(MaintenanceJob(mv, ttl))

    def run_once(self, spark: SparkSession, now: dt.date | None = None) -> dict[str, dict]:
        """One maintenance sweep: TTL then compaction per table, with
        reconciliation. Returns a per-table report."""
        report: dict[str, dict] = {}
        for job in self.jobs:
            mv, entry = job.mv, {}
            if job.ttl is not None:
                before = {
                    r["day"]: r["rows"]
                    for r in mv.storage.stats(spark).collect()
                }
                kept = mv.storage.apply_ttl(spark, job.ttl, now=now)
                after = {
                    r["day"]: r["rows"] for r in mv.storage.stats(spark).collect()
                }
                cutoff = (now or dt.date.today()) - job.ttl
                # reconciliation: surviving partitions untouched
                assert all(before.get(d) == n for d, n in after.items()), (
                    mv.name,
                    "TTL modified surviving partitions",
                )
                assert all(d >= cutoff for d in after), (mv.name, "TTL kept expired")
                entry["ttl_partitions_kept"] = kept
            # compaction, PARTITION-SCOPED: only partitions whose file
            # count exceeds the threshold are re-merged (the MergeTree
            # "too many parts" trigger) — at 100 TB the sweep never
            # rewrites already-merged history. Merged answers must be
            # invariant.
            key_rows_before = (
                mv.merge_states(mv.storage.read(spark), list(mv.dims)).count()
            )
            raw_before = mv.storage.read(spark).count()
            need = mv.partitions_needing_compaction(spark, max_files=1)
            mv.compact(spark, partitions=need)
            raw_after = mv.storage.read(spark).count()
            assert raw_after == key_rows_before, (
                mv.name,
                "compaction row count != merged key count",
            )
            entry["state_rows_before"] = raw_before
            entry["state_rows_after"] = raw_after
            entry["partitions_compacted"] = len(need)
            report[mv.name] = entry
        return report
