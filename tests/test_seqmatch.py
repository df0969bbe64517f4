"""Full-grammar sequenceMatch/sequenceCount (functions/seqmatch.py):
strict adjacency, (?t…) time guards, '.' wildcards. Verified three
ways — hand cases from the ClickHouse docs' own examples, a randomized
sweep against an independent brute-force enumerator of every index
assignment, and end-to-end through the dialect's grouped-agg Pandas
UDF path in Spark SQL."""

from __future__ import annotations

import random

import pytest

from clickhouse_learning_spark.functions.dialect import translate
from clickhouse_learning_spark.functions.seqmatch import (
    _guards_ok,
    compile_pattern,
    seq_count,
    seq_match,
)


def _brute_matches(events, pat):
    """Every valid (first_index, end_index) of a full-pattern match —
    plain recursive enumeration, no memoization, no pruning."""
    items, m = pat.items, len(events)
    out = []

    def rec(j, prev_i, first_i):
        if j == len(items):
            end = prev_i + pat.trail_dots
            if end < m:
                out.append((first_i, end))
            return
        it = items[j]
        if j == 0:
            lo, hi = it.dots, m - 1
        else:
            lo = prev_i + 1 + it.dots
            hi = m - 1 if it.star else min(lo, m - 1)
        for i in range(lo, hi + 1):
            if i >= m:
                break
            t, mask = events[i]
            if not mask & (1 << (it.cond - 1)):
                continue
            if j > 0 and not _guards_ok(it.guards, t - events[prev_i][0]):
                continue
            rec(j + 1, i, first_i if j else i)

    rec(0, None, None)
    return out


def _brute_match(events, pat):
    return 1 if _brute_matches(events, pat) else 0


def _brute_count(events, pat):
    cnt, s = 0, 0
    while s < len(events):
        ms = _brute_matches(events[s:], pat)
        if not ms:
            break
        cnt += 1
        s += min(e for _, e in ms) + 1
    return cnt


def test_docs_examples():
    """The ClickHouse docs' sequencematch walkthrough: untracked events
    are invisible (pattern sees only condition-matching rows), tracked
    intervening events break adjacency."""
    # rows (t=1,n=1) (t=2,n=3) (t=3,n=2); conds number=1, number=2:
    # the n=3 row matches nothing -> invisible -> (?1)(?2) matches
    pat = compile_pattern("(?1)(?2)", 2)
    assert seq_match([(1, 1), (3, 2)], pat) == 1
    # same rows, conds number=1, number=2, number=3: n=3 is now
    # tracked and sits between -> adjacency broken
    pat3 = compile_pattern("(?1)(?2)", 3)
    assert seq_match([(1, 1), (2, 4), (3, 2)], pat3) == 0
    # but the subsequence form still matches
    assert seq_match(
        [(1, 1), (2, 4), (3, 2)], compile_pattern("(?1).*(?2)", 3)
    ) == 1
    # time guard: (?1)(?t>1800)(?2)
    g = compile_pattern("(?1)(?t>1800)(?2)", 2)
    assert seq_match([(0, 1), (1801, 2)], g) == 1
    assert seq_match([(0, 1), (1800, 2)], g) == 0


def test_grammar_details():
    # '.' consumes exactly one tracked event
    dot = compile_pattern("(?1).(?2)", 2)
    assert seq_match([(0, 1), (1, 1), (2, 2)], dot) == 1
    assert seq_match([(0, 1), (1, 2)], dot) == 0
    # unanchored: leading/trailing tracked events don't matter
    adj = compile_pattern("(?1)(?2)", 2)
    assert seq_match([(0, 2), (1, 1), (2, 2), (3, 1)], adj) == 1
    # chained guards on one edge AND together
    both = compile_pattern("(?1)(?t>5)(?t<10)(?2)", 2)
    assert seq_match([(0, 1), (7, 2)], both) == 1
    assert seq_match([(0, 1), (4, 2)], both) == 0
    assert seq_match([(0, 1), (12, 2)], both) == 0
    # == guard
    eq = compile_pattern("(?1)(?t==4)(?2)", 2)
    assert seq_match([(0, 1), (4, 2)], eq) == 1
    assert seq_match([(0, 1), (5, 2)], eq) == 0
    # one event satisfying several conditions can serve either item
    multi = compile_pattern("(?1)(?2)", 2)
    assert seq_match([(0, 3), (1, 3)], multi) == 1
    # non-overlapping count restarts after the earliest completion
    cnt = compile_pattern("(?1)(?2)", 2)
    assert seq_count([(0, 1), (1, 2), (2, 1), (3, 2)], cnt) == 2
    assert seq_count([(0, 1), (1, 2), (2, 2)], cnt) == 1
    # bad patterns raise
    with pytest.raises(ValueError, match="only 2 conditions"):
        compile_pattern("(?3)", 2)
    with pytest.raises(ValueError, match="guard before the first"):
        compile_pattern("(?t>5)(?1)", 2)
    with pytest.raises(ValueError, match="trailing .* guard"):
        compile_pattern("(?1)(?t>5)", 2)
    with pytest.raises(ValueError, match="unparsed pattern"):
        compile_pattern("(?1)x(?2)", 2)


def test_randomized_vs_bruteforce():
    """400 random (pattern, stream) pairs: the memoized DFS must agree
    with the exhaustive enumerator on both match and count."""
    rng = random.Random(0x5E9)
    seps = ["", ".*", ".", "..", ".*.", ".", ""]
    ops = ["<", "<=", ">", ">=", "=="]
    for trial in range(400):
        k = rng.randint(1, 3)
        parts = []
        for j in range(k):
            if j:
                parts.append(rng.choice(seps))
                if rng.random() < 0.4:
                    parts.append(
                        f"(?t{rng.choice(ops)}{rng.randint(0, 12)})"
                    )
            parts.append(f"(?{rng.randint(1, 3)})")
        if rng.random() < 0.2:
            parts.insert(0, rng.choice([".", ".*"]))
        if rng.random() < 0.2:
            parts.append(rng.choice([".", ".*"]))
        pattern = "".join(parts)
        pat = compile_pattern(pattern, 3)
        evs = sorted(
            (rng.randint(0, 18), rng.randint(1, 7))
            for _ in range(rng.randint(0, 9))
        )
        assert seq_match(evs, pat) == _brute_match(evs, pat), (
            f"match {pattern!r} {evs}"
        )
        assert seq_count(evs, pat) == _brute_count(evs, pat), (
            f"count {pattern!r} {evs}"
        )


def test_dialect_udf_path_end_to_end(spark):
    """Full-grammar patterns through translate(): the emitted
    grouped-agg Pandas UDF computes per-user match/count matching the
    (brute-verified) Python matcher; untracked rows are invisible."""
    rng = random.Random(0xABD)
    rows, streams = [], {}
    for uid in range(40):
        evs = []
        for _ in range(rng.randint(0, 10)):
            t, lv = rng.randint(0, 20), rng.randint(1, 4)
            evs.append((t, lv))
            rows.append((uid, t, lv))
        streams[uid] = sorted(evs)
    spark.createDataFrame(
        rows, "uid int, t long, lv int"
    ).createOrReplaceTempView("ch_seq_full")
    q = translate(
        "SELECT uid, "
        "sequenceMatch('(?1)(?t>=3)(?2)')(t, lv = 1, lv = 2) AS m1, "
        "sequenceMatch('(?1).(?2)')(t, lv = 1, lv = 2) AS m2, "
        "sequenceCount('(?1)(?2)')(t, lv = 1, lv = 2) AS c1 "
        "FROM ch_seq_full GROUP BY uid"
    )
    assert "ch_seq_match_" in q and "ch_seq_count_" in q
    out = {r.uid: (r.m1, r.m2, r.c1) for r in spark.sql(q).collect()}
    p1 = compile_pattern("(?1)(?t>=3)(?2)", 2)
    p2 = compile_pattern("(?1).(?2)", 2)
    p3 = compile_pattern("(?1)(?2)", 2)
    for uid, evs in streams.items():
        if uid not in out:
            assert not evs
            continue
        tracked = sorted(
            (t, (1 if lv == 1 else 0) | (2 if lv == 2 else 0))
            for t, lv in evs
            if lv in (1, 2)
        )
        want = (
            seq_match(tracked, p1),
            seq_match(tracked, p2),
            seq_count(tracked, p3),
        )
        assert out[uid] == want, f"uid {uid}: {out[uid]} != {want} {evs}"
