"""Full-grammar ClickHouse sequenceMatch/sequenceCount matcher.

The dialect's fast path translates the guard-free ``.*``-separated
subsequence form to a JVM fold (dialect._sequence_match_sql). This
module is the COMPLETE grammar — strict adjacency ``(?1)(?2)``, time
guards ``(?t op N)``, single-event wildcards ``.`` — which cannot be a
bounded-state fold (a guard edge needs the exact timestamp of the
previous matched item across backtracking alternatives). It runs as a
grouped-aggregate Pandas UDF: per group the tracked events (rows
matching >= 1 condition — untracked rows are invisible to the pattern,
per the ClickHouse docs' own example) cross into Python once via
Arrow, then a memoized DFS answers match/count. This is the documented
slow-but-complete path; the event sets are per-group (per user), so
the transfer is bounded by the group size, not the table.

Semantics (ClickHouse docs, SQL-reference/aggregate-functions
sequencematch; reference repo uses only the plain form —
docs/user_action_100m.md funnels):

- the pattern is UNANCHORED: implicit ``.*`` at both ends;
- ``(?N)`` matches a tracked event whose N-th condition holds; one
  event may satisfy several conditions (bitmask);
- adjacency (no separator) means consecutive IN THE TRACKED STREAM;
  ``.`` consumes exactly one tracked event; ``.*`` any number;
- ``(?t op sec)`` constrains the time between the two NEAREST
  ENCLOSING ``(?N)`` items (ops: < <= > >= ==; several guards on one
  edge AND together); events consumed by ``.``/``.*`` between them are
  not guard-relevant; a guard must sit between two ``(?N)`` items;
- events sort by (timestamp, condition bitmask) — same-second events
  are "undefined order" in CH, the bitmask tiebreak makes ours
  deterministic (and matches the fold's array_sort order);
- sequenceCount counts non-overlapping matches left to right: the
  earliest-ending match is taken, then the search restarts strictly
  after its last consumed event (earliest-completion is the classic
  optimal non-overlapping strategy, same rule as the fold path).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_TOK = re.compile(r"\(\?t\s*(<=|>=|==|<|>)\s*(\d+)\s*\)|\(\?(\d+)\)|\.\*|\.")


@dataclass
class Item:
    """One ``(?N)`` pattern item plus its separator from the previous
    item: at least ``dots`` tracked events in between, exactly that
    many unless ``star``; ``guards`` = [(op, seconds)] vs the previous
    item's timestamp."""

    cond: int
    dots: int = 0
    star: bool = False
    guards: list[tuple[str, int]] = field(default_factory=list)


@dataclass
class Pattern:
    items: list[Item]
    trail_dots: int = 0
    trail_star: bool = False


def compile_pattern(pattern: str, n_conds: int, fn: str = "sequenceMatch") -> Pattern:
    s = pattern.strip()
    if s and s[0] in "'\"" and s[-1] == s[0]:
        s = s[1:-1]
    items: list[Item] = []
    dots, star, guards = 0, False, []
    pos = 0
    for m in _TOK.finditer(s):
        if m.start() != pos:
            raise ValueError(
                f"{fn}: unparsed pattern text {s[pos:m.start()]!r}"
            )
        pos = m.end()
        tok = m.group(0)
        if tok == ".*":
            star = True
        elif tok == ".":
            dots += 1
        elif m.group(3) is not None:
            idx = int(m.group(3))
            if not 1 <= idx <= n_conds:
                raise ValueError(
                    f"{fn}: pattern references (?{idx}) but only "
                    f"{n_conds} conditions given"
                )
            if guards and not items:
                raise ValueError(f"{fn}: (?t…) guard before the first (?N)")
            items.append(Item(idx, dots, star, guards))
            dots, star, guards = 0, False, []
        else:
            guards = guards + [(m.group(1), int(m.group(2)))]
    if pos != len(s):
        raise ValueError(f"{fn}: unparsed pattern text {s[pos:]!r}")
    if guards:
        raise ValueError(f"{fn}: trailing (?t…) guard has no following (?N)")
    if not items:
        raise ValueError(f"{fn}: pattern has no (?N) items")
    # the ends are unanchored (implicit .*): leading separator keeps
    # only its minimum-count dots; star there is a no-op
    items[0].star = True
    return Pattern(items, dots, star)


def _guards_ok(guards: list[tuple[str, int]], dt: int) -> bool:
    for op, sec in guards:
        if op == "<" and not dt < sec:
            return False
        if op == "<=" and not dt <= sec:
            return False
        if op == ">" and not dt > sec:
            return False
        if op == ">=" and not dt >= sec:
            return False
        if op == "==" and not dt == sec:
            return False
    return True


def _min_end(events, pat: Pattern, start: int) -> int | None:
    """Minimal index of the last consumed event of a match whose first
    consumed event is at index >= ``start`` (None if no match).
    Memoized DFS over (item_idx, event_idx)."""
    m = len(events)
    items = pat.items
    memo: dict[tuple[int, int], int | None] = {}

    def after(j: int, i: int) -> int | None:
        """item j matched at event i; minimal end index of the rest."""
        if j == len(items) - 1:
            end = i + pat.trail_dots
            return end if end < m else None
        key = (j, i)
        if key in memo:
            return memo[key]
        nxt = items[j + 1]
        lo = i + 1 + nxt.dots
        hi = m - 1 if nxt.star else min(lo, m - 1)
        best: int | None = None
        for i2 in range(lo, hi + 1):
            t2, mask2 = events[i2]
            if not mask2 & (1 << (nxt.cond - 1)):
                continue
            if not _guards_ok(nxt.guards, t2 - events[i][0]):
                continue
            got = after(j + 1, i2)
            if got is not None and (best is None or got < best):
                best = got
        memo[key] = best
        return best

    first = items[0]
    best: int | None = None
    for i in range(start + first.dots, m):
        if not events[i][1] & (1 << (first.cond - 1)):
            continue
        got = after(0, i)
        if got is not None and (best is None or got < best):
            best = got
    return best


def seq_match(events: list[tuple[int, int]], pat: Pattern) -> int:
    """1 if the tracked-event stream contains the pattern, else 0.
    ``events`` = [(epoch_seconds, condition_bitmask)], pre-sorted."""
    return 1 if _min_end(events, pat, 0) is not None else 0


def seq_count(events: list[tuple[int, int]], pat: Pattern) -> int:
    """Non-overlapping earliest-completion match count."""
    cnt, s = 0, 0
    while s < len(events):
        end = _min_end(events, pat, s)
        if end is None:
            break
        cnt += 1
        s = end + 1
    return cnt


def make_sequence_udf(pattern: str, n_conds: int, kind: str):
    """Build the grouped-aggregate Pandas UDF for one compiled pattern
    (``kind`` in {'match', 'count'}). The UDF takes (ts_seconds,
    cond_1, …, cond_N) series for one group and returns a BIGINT."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    pat = compile_pattern(pattern, n_conds)
    score = seq_match if kind == "match" else seq_count

    def _agg(ts, *conds):
        evs = []
        for k in range(len(ts)):
            t = ts.iloc[k]
            if t is None or t != t:
                continue
            mask = 0
            for b, c in enumerate(conds):
                v = c.iloc[k]
                if v is not None and v == v and bool(v):
                    mask |= 1 << b
            if mask:
                evs.append((int(t), mask))
        evs.sort()
        return score(evs, pat)

    # pandas_udf needs an exact arity for SQL registration
    args = ", ".join(f"c{i}" for i in range(n_conds))
    ns = {"_agg": _agg}
    exec(  # noqa: S102 — arity shim over the local _agg closure only
        f"def _shim(ts, {args}):\n    return _agg(ts, {args})\n", ns
    )
    return pandas_udf(ns["_shim"], "bigint", PandasUDFType.GROUPED_AGG)
