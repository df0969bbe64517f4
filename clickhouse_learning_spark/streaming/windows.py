"""Event-time windowed aggregation + sessionization.

Beyond-reference streaming surface (the reference has no watermark
concept — SURVEY T3): tumbling/sliding event-time windows with
watermarked state expiry, and session windows. Exposed both as
streaming transformations and as batch equivalents (same expressions),
so results are testable against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.scalar import epoch_seconds


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_extra: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling (or sliding) event-time window counts. On a stream the
    watermark bounds state; on a batch DataFrame the same expression is
    a plain aggregation."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return src.groupBy(win.alias("w"), *group_extra).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct("user_id").alias("uv"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *group_extra,
        "cnt",
        "uv",
    )


def sessionize_batch(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``. Classic
    lag + running-sum window composition — one shuffle on user."""
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(F.col(ts_col))
    gap_s = gap_minutes * 60
    with_flag = events.select(
        user_col,
        ts_col,
        F.when(
            epoch_seconds(ts_col) - F.lag(epoch_seconds(ts_col)).over(w)
            > gap_s,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = W.partitionBy(user_col).orderBy(F.col(ts_col)).rowsBetween(
        W.unboundedPreceding, 0
    )
    return with_flag.withColumn("session_id", F.sum("new_session").over(w2))


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session count + mean session length (events)."""
    s = sessionize_batch(events, gap_minutes=gap_minutes)
    per_session = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(epoch_seconds("ts")) - F.min(epoch_seconds("ts"))
        ).alias("duration_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.round(F.avg("duration_s"), 2).alias("avg_session_s"),
    )


def sessionize_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming sessionization via the built-in session_window (state
    expires with the watermark)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, f"{gap_minutes} minutes").alias("sw"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
