"""Stream-stream interval joins (event-time, watermark-bounded state).

Beyond-reference streaming surface: the reference's funnels correlate
event streams in batch (bitmap algebra over day-partitioned logs,
dwm.mainpage_stat_mv_dis.sql:280-290); a streaming engine also needs
the ONLINE form — match two live streams within an event-time window,
e.g. "credit each purchase to clicks at most 1 hour earlier".

Spark-first shape: Structured Streaming's stream-stream join with a
time-range condition. Both sides carry event-time watermarks; the range
condition (``click_ts ∈ [purchase_ts − within, purchase_ts]``) lets the
engine compute, from each side's watermark, exactly how long a row can
still find partners — state for older rows is evicted. Inner matches
emit eagerly (no watermark wait); outer rows emit once the watermark
proves no partner can arrive. At 100 TB/day the state held is
O(traffic × within), not O(stream history) — the watermark IS the
memory bound.

The same function works on batch DataFrames (no watermark, plain range
join) — which is what makes the streamed result oracle-checkable:
stream == batch == SQL, asserted in tests/test_streaming.py and the
``stream_click_attribution`` graded query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_pairs(
    purchases: DataFrame,
    clicks: DataFrame,
    within: str = "1 hour",
    purchase_watermark: str = "1 hour",
    click_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Pair every purchase with the same user's clicks at most
    ``within`` before it (inclusive both ends).

    Inputs: ``purchases`` (purchase_id, user_id, ts), ``clicks``
    (click_id, user_id, ts) — streaming or batch, independently.
    Output: one row per qualifying (purchase, click) pair with both
    timestamps; ``how='left_outer'`` keeps unmatched purchases (emitted
    on watermark passage when streaming).

    ``click_watermark`` should be ≥ ``purchase_watermark`` + ``within``
    so a click is never evicted while an in-watermark purchase could
    still match it; correctness-exact tests use watermarks wider than
    the data span (nothing dropped), production uses tight ones."""
    p = purchases.select(
        "purchase_id",
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("purchase_ts"),
    )
    c = clicks.select(
        "click_id",
        F.col("user_id").alias("c_uid"),
        F.col("ts").alias("click_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", purchase_watermark)
    if c.isStreaming:
        c = c.withWatermark("click_ts", click_watermark)
    cond = (
        (F.col("p_uid") == F.col("c_uid"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {within}"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
    )
    return p.join(c, cond, how).select(
        "purchase_id",
        F.col("p_uid").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )
