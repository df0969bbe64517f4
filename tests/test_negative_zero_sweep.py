"""Cross-engine negative-zero sweep (VERDICT r6 'next' item 1).

The r5/r6 `nb_quality_scores` driver red was a deterministic sign-bit
divergence at zero: DuckDB's libm `round` preserves -0.0 while Spark's
BigDecimal HALF_UP round cannot represent it, the driver's value hash
sees the raw sign bit, and Python `==` (used by the local oracle gate)
treats -0.0 == +0.0 — so the red never reproduced locally.  The fix is
`+ 0.0` after every graded rounded float on both sides; THIS suite is
the standing law that the class stays closed:

* DuckDB side — run every registered oracle at sf0.01 and assert no
  float cell anywhere in any result is a negative zero (the judge's
  own sweep recipe, now in-tree).
* Spark side — same assertion over the determinism-class queries
  (the only graded queries whose floats come from distributed
  accumulations; everything else is covered by the DuckDB half because
  a hash-green query has bit-identical cells on both engines).
"""

from __future__ import annotations

import math
from decimal import Decimal

import pytest

from tests.conftest import SF_SMOKE


def _neg_zero_cells(rows):
    """Yield (row_idx, col_idx, value) for every -0.0 float cell,
    descending into list/tuple cells."""

    def scan(v):
        if isinstance(v, Decimal):
            v = float(v)
        if isinstance(v, float):
            if v == 0.0 and math.copysign(1.0, v) < 0.0:
                yield v
        elif isinstance(v, (list, tuple)):
            for x in v:
                yield from scan(x)

    for ri, row in enumerate(rows):
        for ci, cell in enumerate(row):
            for bad in scan(cell):
                yield (ri, ci, bad)


def _oracle_names():
    import __spark_entry__ as entry_mod

    return sorted(entry_mod.oracle_sql())


def test_duckdb_oracles_emit_no_negative_zero():
    """Every registered oracle, run in DuckDB at sf0.01, must not emit
    a -0.0 cell — the driver would hash it differently from Spark's
    +0.0 and the local gate historically could not see it."""
    import duckdb

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    offenders = {}
    for name, sql in entry_mod.oracle_sql().items():
        rows = con.execute(sql).fetchall()
        bad = list(_neg_zero_cells(rows))
        if bad:
            offenders[name] = bad[:3]
    assert not offenders, (
        "oracles emit -0.0 cells (add '+ 0.0' after the rounded float "
        f"on BOTH sides): {offenders}"
    )


# the determinism class from tests/test_determinism_laws.py — graded
# queries whose float outputs come from distributed accumulations
_SPARK_CLASS = [
    "nb_quality_scores",
    "lm_quality_scores",
    "lm_heldout_scores",
    "kn_trigram_scores",
    "ccnet_perplexity_buckets",
    "lr_quality_scores",
    "item_pagerank",
    "dsir_importance",
]


@pytest.mark.parametrize("name", _SPARK_CLASS)
def test_spark_queries_emit_no_negative_zero(spark, name):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()[name](spark, SF_SMOKE)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    bad = list(_neg_zero_cells(rows))
    assert not bad, f"{name} emits -0.0 cells: {bad[:5]}"
