"""As-of (time-travel) join — match each left row to the nearest right
row at-or-before (backward) / at-or-after (forward) its timestamp,
per key.

The reference has no as-of join (funnels are bitmap algebra,
/root/reference/scripts/sql/dwm.mainpage_stat_mv_dis.sql:280-290), but
event-analytics workloads on its schema need one constantly:
attribution ("credit each purchase to the latest prior click"),
point-in-time dimension lookup, sensor alignment.

Scale design — union + ordered carry, NOT an inequality join:
the naive form ``left.join(right, key & (r.ts <= l.ts))`` + argmax is
a per-key cross product (O(|L|·|R|) per key — quadratic on hot keys,
and Spark plans non-equi conditions as BroadcastNestedLoopJoin when
either side is small and a full cartesian-per-key otherwise). Instead
we tag both sides, union them, and run ONE hash shuffle on the key with
a sort within partitions; a running ``last(..., ignorenulls)`` window
carries the most recent right payload forward onto each left row. Cost
is a single exchange + sort of |L|+|R| rows regardless of match
fan-out — the same merge-scan every purpose-built as-of engine
(kdb+, QuestDB, pandas ``merge_asof``) performs, expressed in pure
Catalyst operators (window aggregation stays whole-stage-codegen'd;
no Python, no UDF).

Skew note: keys hot enough to overflow one task's sort spill to disk
rather than OOM (ExternalSorter); for pathological single-key streams,
pre-split by coarse time bucket and as-of join within buckets, passing
the previous bucket's tail as seed rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_time: str = "ts",
    right_time: str = "ts",
    direction: str = "backward",
    tolerance: Column | None = None,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_time`` <= ``left_time`` (backward; ties inclusive) or the
    least ``right_time`` >= ``left_time`` (forward), matching on key
    columns ``on``. Unmatched left rows keep NULLs (left-outer).

    ``right_cols``: right payload columns to carry (default: all except
    key/time). Carried columns are renamed ``<name><suffix>`` when they
    collide with a left column; the match timestamp always lands in
    ``<right_time><suffix>``.

    ``tolerance``: max allowed |left_time - match_time| as an interval
    column (e.g. ``F.expr("INTERVAL 7 DAYS")``); matches farther away
    are nulled out (pandas ``merge_asof`` semantics).

    Among equal-timestamp right candidates the carried row is the last
    under an ascending sort of the payload struct — deterministic, but
    callers needing a specific tie-break should pre-dedup the right
    side (e.g. ``argmax`` by event id per (key, ts)).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_time)]
    taken = set(left.columns)
    out_names = {
        c: (c + suffix if c in taken else c) for c in (right_time, *right_cols)
    }

    payload = F.struct(
        F.col(right_time).alias(out_names[right_time]),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )
    r = right.select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    l = left.select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.struct(*left.columns).alias("_l"),
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))

    # backward: sort asc, right-before-left at equal ts, carry last seen.
    # forward: sort desc — "nearest following" becomes "last seen" again.
    asc = direction == "backward"
    order = [
        F.col("_t").asc() if asc else F.col("_t").desc(),
        F.col("_side").asc(),  # right first at equal ts → ties inclusive
        F.col("_p").asc_nulls_first(),
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_p", ignorenulls=True).over(w)

    out = (
        l.unionByName(r)
        .withColumn("_m", carried)
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        ok = (
            F.col("_t") - F.col(f"_m.{out_names[right_time]}") <= tolerance
            if asc
            else F.col(f"_m.{out_names[right_time]}") - F.col("_t") <= tolerance
        )
        out = out.withColumn("_m", F.when(ok, F.col("_m")))
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{out_names[c]}").alias(out_names[c]) for c in (right_time, *right_cols)],
    )
