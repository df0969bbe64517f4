"""Pin: the committed _INTHASH_ORACLE constant is exactly what
tools/make_inthash_oracle.py generates (machine-derived oracle; hand
edits would detach it from the documented derivation)."""

from __future__ import annotations


def test_committed_oracle_matches_generator():
    from clickhouse_learning_spark.queries_reference import (
        _INTHASH_ORACLE,
    )
    from tools.make_inthash_oracle import generate

    assert _INTHASH_ORACLE == generate()
