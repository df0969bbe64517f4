"""Standing graded-output SHAPE law (VERDICT r7 item 1).

Round 6's lesson was value canonicalization (the −0.0 sign bit); round
7's was the same class one level up: the driver's pandas canonicalizer
runs ``sort_values`` over every output column of a graded query, and
list/dict/struct cells are unhashable there — so ``native_typed_
roundtrip``, whose graded projection kept a raw ``Array(Int64)``
column, errored in the harness (``TypeError: unhashable type: 'list'``)
before any row/schema/hash comparison happened. The local gate
(``tools/check_oracle.py``) happily normalized list cells, so the gap
could never reproduce locally.

This law closes the class structurally: EVERY registered query's output
schema must contain only atomic top-level columns — no ArrayType,
MapType, or StructType. The check is a lazy ``df.schema`` walk; no
``collect()`` is issued (builders that do eager side-effect work —
format roundtrips, tokenizer training, streaming ingest — still run
their build step, which is why this suite runs at sf0.001).

Typed composite fidelity stays asserted where it belongs (e.g.
``tests/test_native.py`` asserts the Array/Tuple/Map columns of the
Native codec); the GRADED projection serializes them (``concat_ws`` /
``to_json`` on the Spark side, ``array_to_string`` / ``to_json`` in
the DuckDB oracle).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _registered_names():
    import __spark_entry__ as entry_mod

    return list(entry_mod.queries())


@pytest.mark.parametrize("name", _registered_names())
def test_graded_output_columns_are_atomic(spark, name):
    import __spark_entry__ as entry_mod

    sys_path_probe = entry_mod.queries()[name]
    df = sys_path_probe(spark, SF_SMOKE)
    from tools.check_oracle import non_atomic_columns

    bad = non_atomic_columns(df.schema)
    assert not bad, (
        f"{name}: graded output has non-atomic columns {bad}; the "
        "driver's pandas canonicalizer cannot sort list/struct cells "
        "(TypeError: unhashable type) — serialize them for grading "
        "(concat_ws/to_json in Spark, array_to_string/to_json in the "
        "oracle) and keep the typed assertions in unit tests"
    )


def test_local_gate_rejects_non_atomic(spark):
    """The gate helper itself flags each composite kind (meta-law: the
    local gate stays at-least-as-strict as the driver)."""
    from pyspark.sql import functions as F

    from tools.check_oracle import non_atomic_columns

    df = spark.range(3).select(
        F.col("id"),
        F.array(F.lit(1), F.lit(2)).alias("a"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("x")).alias("s"),
    )
    assert non_atomic_columns(df.schema) == ["a", "m", "s"]
    ok = df.select("id", F.concat_ws(",", F.col("a").cast("array<string>")).alias("a"))
    assert non_atomic_columns(ok.schema) == []
