"""Pin: the committed _SIPHASH_ORACLE constant is exactly what
tools/make_siphash_oracle.py generates (the oracle was machine-derived
— hand edits would silently detach it from the documented
derivation)."""

from __future__ import annotations


def test_committed_oracle_matches_generator():
    from clickhouse_learning_spark.queries_reference import (
        _SIPHASH_ORACLE,
    )
    from tools.make_siphash_oracle import generate

    assert _SIPHASH_ORACLE == generate()
