"""windowFunnel / retention / sequenceMatch semantics on hand-built
event chains (functions/funnel.py first-chance chain rules)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from clickhouse_learning_spark.functions import funnel as FN


def _ev(spark, rows):
    """rows: (uid, epoch_s, etype) → DataFrame(uid, ts, event_type)."""
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    data = [
        (uid, base + dt.timedelta(seconds=s), et) for uid, s, et in rows
    ]
    return spark.createDataFrame(data, "uid long, ts timestamp, event_type string")


CONDS = ["event_type = 'a'", "event_type = 'b'", "event_type = 'c'"]


def test_funnel_levels_chain_rules(spark):
    ev = _ev(
        spark,
        [
            # uid 1: full in-order chain inside the window → 3
            (1, 0, "a"), (1, 100, "b"), (1, 200, "c"),
            # uid 2: c arrives outside the window anchored at first a → 2
            (2, 0, "a"), (2, 100, "b"), (2, 5000, "c"),
            # uid 3: b before a (never strictly after) → 1
            (3, 500, "a"), (3, 100, "b"),
            # uid 4: no a at all → 0 (b/c alone never open a chain)
            (4, 100, "b"), (4, 200, "c"),
            # uid 5: same-second b (not strictly after a) → 1
            (5, 0, "a"), (5, 0, "b"),
        ],
    )
    got = {
        r["uid"]: r["level"]
        for r in FN.funnel_levels(ev, "uid", "ts", CONDS, window_s=1000).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1, 4: 0, 5: 1}


def test_funnel_anchor_is_first_stage1_event(spark):
    """First-chance rule: the window anchors at the EARLIEST 'a' even if
    a later 'a' would admit a deeper chain (documented divergence from
    ClickHouse's multi-chain scan)."""
    ev = _ev(
        spark,
        [(7, 0, "a"), (7, 2000, "a"), (7, 2100, "b"), (7, 2200, "c")],
    )
    got = FN.funnel_levels(ev, "uid", "ts", CONDS, window_s=1000).collect()[0]["level"]
    assert got == 1  # b@2100 is outside [0, 1000] from the first anchor


def test_sequence_match_strict_order(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "a"), (1, 10, "b"), (1, 99999, "c"),  # no window bound → match
            (2, 0, "c"), (2, 10, "b"), (2, 20, "a"),     # reversed → no
            (3, 0, "a"), (3, 10, "c"),                   # missing b → no
        ],
    )
    got = {
        r["uid"]: r["matched"]
        for r in FN.sequence_match(ev, ["uid"], "ts", CONDS).collect()
    }
    assert got == {1: True, 2: False, 3: False}


def test_retention_flags(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "a"), (1, 10, "b"),            # r1, r2, not r3
            (2, 0, "b"), (2, 10, "c"),            # no a → all false
            (3, 0, "a"), (3, 1, "c"),             # r1, r3
        ],
    )
    got = {
        r["uid"]: (r["r1"], r["r2"], r["r3"])
        for r in FN.retention_flags(ev, ["uid"], CONDS).collect()
    }
    # retention: r_k (k>=2) requires cond1 too
    assert got == {
        1: (True, True, False),
        2: (False, False, False),
        3: (True, False, True),
    }


def test_funnel_single_shuffle_plan(spark):
    """Scale contract: one Exchange (the uid groupBy); the chain walk is
    array expressions, not a join cascade or a second shuffle."""
    ev = _ev(spark, [(1, 0, "a")])
    plan = FN.funnel_levels(
        ev, "uid", "ts", CONDS, window_s=1000
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
