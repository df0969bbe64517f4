"""Behavioral-analytics aggregates — ClickHouse ``windowFunnel`` /
``retention`` / ``sequenceMatch`` analogs (beyond-reference freebies:
the reference builds its funnels from bitmap states,
/root/reference/scripts/sql/dwm.mainpage_stat_mv_dis.sql:280-290; these
are the event-sequence versions ClickHouse users reach for next).

Semantics note — deterministic "first-chance" chains: stage 1 anchors at
the user's EARLIEST stage-1 event; stage k is the earliest stage-k event
strictly after stage k-1 (and, for ``funnel_levels``, within ``window_s``
of the stage-1 anchor). ClickHouse's ``windowFunnel`` scans every
candidate chain start, so it can report a deeper level when a *later*
stage-1 event opens a better window; the first-chance rule is the common
product-analytics definition, is O(events-per-user) instead of
O(chains×events), and — unlike the multi-chain scan — has a direct
ANSI-SQL oracle, which keeps these queries inside the correctness gate.
(CH's exact multi-chain base mode IS also available: the dialect
translates ``windowFunnel`` to a single fold expression —
``dialect._window_funnel_sql``, graded via ``ch_window_funnel_dialect``
against a recursive-CTE replay oracle.)

Scale design: ONE shuffle (groupBy user) collecting per-stage epoch
arrays; the chain walk is codegen array HOFs (array_min / filter) over
per-user arrays, so cost is bounded by events-per-user, never
all-pairs. Timestamps are floored to whole epoch seconds on both the
Spark and oracle sides so comparisons are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.scalar import epoch_seconds


def _as_col(c: str | Column) -> Column:
    return F.expr(c) if isinstance(c, str) else c


def _stage_chain(g: DataFrame, n: int, window_s: int | None) -> Column:
    """Funnel level from per-stage sorted epoch arrays ``_t0.._t{n-1}``:
    t1 = min(_t0); t_k = min(x in _t{k-1} : x > t_{k-1} and (no window |
    x <= t1 + window_s)). Level = number of reached stages."""
    t_first = F.array_min(F.col("_t0"))
    level = F.when(t_first.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    t_prev = t_first
    def make_cond(tp: Column, tf: Column):
        if window_s is None:
            return lambda x: x > tp
        return lambda x: (x > tp) & (x <= tf + F.lit(int(window_s)))

    for k in range(1, n):
        t_k = F.array_min(F.filter(F.col(f"_t{k}"), make_cond(t_prev, t_first)))
        level = F.when(t_k.isNotNull(), F.lit(k + 1)).otherwise(level)
        t_prev = t_k
    return level.alias("level")


def _per_stage_arrays(
    ev: DataFrame, group_cols: list[str], ts_col: str, conds: list[str | Column]
) -> DataFrame:
    secs = epoch_seconds(ts_col)
    # collect_set: the chain walk only reads min/filter over the epochs,
    # so duplicate seconds are pure state bloat — dedup caps a hot key's
    # (bot's) per-stage array at distinct-seconds instead of event count
    aggs = [
        F.collect_set(F.when(_as_col(c), secs)).alias(f"_t{i}")
        for i, c in enumerate(conds)
    ]
    return ev.groupBy(*group_cols).agg(*aggs)


def funnel_levels(
    ev: DataFrame,
    user_col: str,
    ts_col: str,
    conds: list[str | Column],
    window_s: int,
) -> DataFrame:
    """windowFunnel(window_s)(ts, cond1..condN) per user → (user, level).

    One shuffle; per-user arrays + codegen HOF walk (module docstring
    for the first-chance semantics)."""
    g = _per_stage_arrays(ev, [user_col], ts_col, conds)
    return g.select(user_col, _stage_chain(g, len(conds), window_s))


def sequence_match(
    ev: DataFrame,
    group_cols: list[str],
    ts_col: str,
    conds: list[str | Column],
) -> DataFrame:
    """sequenceMatch('(?1).*(?2)...')(ts, cond1..condN) per group →
    (*group_cols, matched): do events satisfying the conditions occur in
    strict timestamp order within the group? ``group_cols`` is typically
    ``[user]`` or ``[user, day]``. Chain-pattern subset of ClickHouse's
    regex-like pattern language (no time-bound ``(?t<=N)`` operators —
    that is :func:`funnel_levels`)."""
    g = _per_stage_arrays(ev, group_cols, ts_col, conds)
    lvl = _stage_chain(g, len(conds), None)
    return g.select(*group_cols, (lvl == len(conds)).alias("matched"))


def retention_flags(
    ev: DataFrame, group_cols: list[str], conds: list[str | Column]
) -> DataFrame:
    """ClickHouse ``retention(cond1, .., condN)``: r1 = cond1 ever held;
    r_k = cond1 AND cond_k (k ≥ 2). One row per ``group_cols`` key with
    boolean columns r1..rN — finalize by summing over a cohort. Pure
    conditional max aggregates: fully codegen, one shuffle."""
    flags = [
        F.max(F.when(_as_col(c), F.lit(1)).otherwise(F.lit(0))).alias(f"_f{i}")
        for i, c in enumerate(conds)
    ]
    g = ev.groupBy(*group_cols).agg(*flags)
    out = [(F.col("_f0") == 1).alias("r1")]
    for k in range(1, len(conds)):
        out.append(((F.col("_f0") == 1) & (F.col(f"_f{k}") == 1)).alias(f"r{k + 1}"))
    return g.select(*group_cols, *out)
