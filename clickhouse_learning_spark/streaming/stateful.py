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
from pyspark.sql import functions as F
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


def streaming_funnel_levels(
    events: DataFrame,
    conds: list[str],
    window_s: int,
    user_col: str = "uid",
    ts_col: str = "ts",
) -> DataFrame:
    """Incremental ``windowFunnel`` — the streaming twin of
    ``functions.funnel.funnel_levels``, same deterministic first-chance
    semantics, ARRIVAL-ORDER INDEPENDENT: per-key state holds the
    distinct matching epoch-seconds per stage (exactly the batch
    operator's per-stage arrays), so a late stage-1 event correctly
    re-anchors the window and may lower the level. State size is
    bounded by distinct event-seconds per stage per user — the same
    bound the batch shuffle carries. Emits (user, level, updates) each
    micro-batch touching the key; take ``max_by(level, updates)`` for
    the current value."""
    from clickhouse_learning_spark.functions.scalar import epoch_seconds

    n = len(conds)
    proj = events.select(
        F.col(user_col),
        epoch_seconds(ts_col).alias("_s"),
        *[F.expr(c).cast("boolean").alias(f"_c{i}") for i, c in enumerate(conds)],
    )
    state_schema = ", ".join(f"t{i} array<bigint>" for i in range(n)) + ", upd long"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            *arrs, upd = state.get
            sets = [set(a) if a is not None else set() for a in arrs]
        else:
            sets = [set() for _ in range(n)]
            upd = 0
        for pdf in pdfs:
            s = pdf["_s"]
            for i in range(n):
                mask = pdf[f"_c{i}"].fillna(False).astype(bool)
                sets[i].update(int(x) for x in s[mask])
        upd += 1
        state.update((*[sorted(x) for x in sets], upd))
        if not sets[0]:
            level = 0
        else:
            t1 = min(sets[0])
            level, t_prev = 1, t1
            for k in range(1, n):
                cands = [x for x in sets[k] if t_prev < x <= t1 + window_s]
                if not cands:
                    break
                t_prev = min(cands)
                level = k + 1
        yield pd.DataFrame(
            {user_col: [key[0]], "level": [level], "updates": [upd]}
        )

    return proj.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=f"{user_col} long, level int, updates long",
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_topk(
    events: DataFrame,
    item_col: str = "item",
    shards: int = 16,
    capacity: int = 1024,
) -> DataFrame:
    """Streaming heavy hitters: per-shard Space-Saving counters
    (Metwally et al. 2005 — ClickHouse's own ``topK`` sketch) held in
    keyed state. Items route to ``shards`` state groups by hash, each
    group maintaining at most ``capacity`` (item, count, err) counters:
    a new item evicts the current minimum and inherits its count as
    error (the classic admit rule), so per-shard counts obey
    true ≤ count ≤ true + err with err ≤ shard_N/capacity. Emits every
    shard's full counter table each batch (update mode); merge the
    final micro-batch's rows with :func:`topk_merge` for the global
    top-k. With ``capacity`` ≥ a shard's distinct items the counts are
    EXACT — the dual-path test's equality case.

    Scale: state is O(shards × capacity), independent of stream length;
    each item crosses into Python once per micro-batch via Arrow,
    pre-reduced by pandas value_counts (so state updates are per
    DISTINCT item per batch, not per row)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (items, counts, errs) = state.get
            tbl = {i: (c, e) for i, c, e in zip(items, counts, errs)}
        else:
            tbl = {}
        for pdf in pdfs:
            for item, w in pdf[item_col].value_counts().items():
                w = int(w)
                if item in tbl:
                    c, e = tbl[item]
                    tbl[item] = (c + w, e)
                elif len(tbl) < capacity:
                    tbl[item] = (w, 0)
                else:
                    # evict the minimum counter; the newcomer inherits
                    # its count as over-estimation error
                    victim = min(tbl, key=lambda k: tbl[k][0])
                    mc = tbl[victim][0]
                    del tbl[victim]
                    tbl[item] = (mc + w, mc)
        items = list(tbl)
        state.update(
            (items, [tbl[i][0] for i in items], [tbl[i][1] for i in items])
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(items),
                "item": items,
                "cnt": [tbl[i][0] for i in items],
                "err": [tbl[i][1] for i in items],
            }
        )

    routed = events.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(shards)).alias("_shard"),
        F.col(item_col).alias(item_col),
    )
    return routed.groupBy("_shard").applyInPandasWithState(
        fn,
        outputStructType="shard long, item string, cnt long, err long",
        stateStructType=(
            "items array<string>, counts array<long>, errs array<long>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def topk_merge(counters: DataFrame, k: int) -> DataFrame:
    """Global top-k from the LAST emitted per-shard counter tables:
    shards partition the item space (each item lives in exactly one
    shard), so the merge is a plain orderBy-limit over the union —
    TakeOrderedAndProject, no re-aggregation needed."""
    return counters.orderBy(
        F.col("cnt").desc(), F.col("item").asc()
    ).limit(k)


def streaming_dd_sketch(
    events: DataFrame, key_col: str = "k", bucket_col: str = "bucket"
) -> DataFrame:
    """Streaming DDSketch histograms in keyed state: the input carries
    PRE-BUCKETED values (functions/metrics.dd_bucket computed in
    Catalyst before entering state — no float math crosses the Arrow
    boundary, so the state is exact integer counts and the whole run
    is hash-deterministic). Each key's state is the bucket→count table,
    size O(log(value range)/α) independent of stream length; every
    micro-batch pre-reduces via pandas value_counts, so state updates
    are per DISTINCT bucket per batch. Emits the full histogram per
    batch (update mode; counts are monotone, so max-per-bucket
    downstream recovers the final table). Quantiles come later from
    the bucket midpoints — the batch MV DDSketch's exact finalize rule
    (the stream≡batch law tests/test_stateful_streaming.py pins)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bs, cs = state.get
            tbl = dict(zip(bs, cs))
        else:
            tbl = {}
        for pdf in pdfs:
            for b, w in pdf[bucket_col].value_counts().items():
                b = int(b)
                tbl[b] = tbl.get(b, 0) + int(w)
        bs = list(tbl)
        state.update((bs, [tbl[b] for b in bs]))
        yield pd.DataFrame(
            {
                "k": [key[0]] * len(bs),
                "bucket": bs,
                "cnt": [tbl[b] for b in bs],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="k string, bucket long, cnt long",
        stateStructType="buckets array<long>, counts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
