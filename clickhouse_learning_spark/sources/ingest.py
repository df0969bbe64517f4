"""Ingest helpers: default-expression columns + batched insert sinks.

The reference's tables materialize server-side default expressions at
insert time (``day Date default toDate(second)``, ``hour ... default
toStartOfHour(second)``, ``insert_second ... default now()`` —
/root/reference/scripts/sql/ods.action_001_dis.sql:3-6). In Spark the
ingest path applies the same derivations with ``withColumn`` before the
write (SURVEY.md P7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_default_columns(df: DataFrame, ts_col: str = "second") -> DataFrame:
    """Materialize the reference's default-expression columns."""
    out = df
    if "day" not in df.columns:
        out = out.withColumn("day", F.to_date(ts_col))
    if "hour" not in df.columns:
        out = out.withColumn("hour", F.date_trunc("hour", ts_col))
    if "insert_second" not in df.columns:
        out = out.withColumn("insert_second", F.current_timestamp())
    return out


def events_as_action_log(events: DataFrame) -> DataFrame:
    """Adapt the driver's ``events`` table (FIXTURES.md §B) to the
    reference's action-log shape: ``ts``→``second``, ``user_id``→``uid``,
    and derive day/hour the way the DDL defaults do. ``event_type``
    plays the conditional-metric role (the reference keys conditions on
    show/click counts, ods.action_001_dis.sql:13-15)."""
    return with_default_columns(
        events.withColumnsRenamed({"ts": "second", "user_id": "uid"}), "second"
    )
