"""Standing doc-count law (VERDICT r8 What's-wrong #1).

README.md states the driver-contract headline counts ("N queries, M
with exact DuckDB oracles") in three places; round 8 shipped with one
of them stale (220/218 vs the registered 222/220). This test derives
the true counts from the registry itself and fails on ANY numeric claim
in README that disagrees, so the sites can never drift again.
"""

from __future__ import annotations

import os
import re

import __spark_entry__ as entry

_README = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "README.md")


def test_readme_counts_match_registry():
    n_q = len(entry.queries())
    n_o = len(entry.oracle_sql())
    text = open(_README, encoding="utf-8").read()

    # every "<N> queries, <M> with exact DuckDB oracles" claim
    pairs = re.findall(r"(\d+) queries,\s*(\d+) with exact DuckDB", text)
    assert pairs, "README lost its driver-contract count claims"
    for q, o in pairs:
        assert (int(q), int(o)) == (n_q, n_o), (
            f"README claims {q}/{o}, registry has {n_q}/{n_o}"
        )

    # the validation section's "(<N> registered, <M> exact-hash green" site
    for q, o in re.findall(r"\((\d+) registered,\s*(\d+) exact-hash", text):
        assert (int(q), int(o)) == (n_q, n_o), (
            f"README claims {q} registered/{o} exact-hash, "
            f"registry has {n_q}/{n_o}"
        )

    # the rows-only remainder must be consistent too
    assert n_q - n_o == 2, (
        "rows-only query count changed — update README's '2 rows-only' "
        "prose and this law together"
    )
