"""Property-based laws of the mergeable-metric algebra (hypothesis).

The whole MV design rests on one algebraic fact: for every metric kind,
    finalize(merge(partial(A), partial(B))) == finalize(partial(A ∪ B))
for ANY partition of the rows into batches A, B (the reference proves
instances of this informally at docs/…md:934-996; here it's a law).
Hypothesis generates arbitrary small datasets and split points.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.metrics import MetricSpec

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),      # group key
        st.integers(min_value=-1000, max_value=1000),  # value
        st.booleans(),                               # condition flag
    ),
    min_size=1,
    max_size=60,
)

KINDS = [
    "uniq",
    "uniq_theta",
    "quantile_kll",
    "uniq_exact",
    "sum",
    "count",
    "min",
    "max",
    "avg",
    "median",
    "bitmap",
    "quantile",
]


def _one_level(spark, df, spec):
    return (
        df.groupBy("g")
        .agg(spec.partial())
        .select("g", spec.finalize())
        .collect()
    )


def _two_level(spark, df, spec, split_col="s"):
    partials = df.groupBy("g", split_col).agg(spec.partial())
    return (
        partials.groupBy("g")
        .agg(spec.merge())
        .select("g", spec.finalize())
        .collect()
    )


@pytest.mark.parametrize("kind", KINDS)
@given(rows=ROWS, split_mod=st.integers(min_value=2, max_value=4))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_split_merge_invariance(spark, kind, rows, split_mod):
    df = spark.createDataFrame(
        [(g, v, c, i % split_mod) for i, (g, v, c) in enumerate(rows)],
        "g int, v long, c boolean, s int",
    )
    spec = MetricSpec("m", kind, "v", cond=F.col("c") if kind != "avg" else None)
    _assert_invariant(spark, df, spec)


@given(rows=ROWS, split_mod=st.integers(min_value=2, max_value=4))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_split_merge_invariance_argmax(spark, rows, split_mod):
    df = spark.createDataFrame(
        [(g, v, c, i % split_mod, i) for i, (g, v, c) in enumerate(rows)],
        "g int, v long, c boolean, s int, rid long",
    )
    for kind in ("argmax", "argmin"):
        spec = MetricSpec("m", kind, "rid", cond=F.col("c"), order_by=F.col("v"))
        _assert_invariant(spark, df, spec)


def _assert_invariant(spark, df, spec):
    one = {r["g"]: r["m"] for r in _one_level(spark, df, spec)}
    two = {r["g"]: r["m"] for r in _two_level(spark, df, spec)}
    assert set(one) == set(two)
    for g in one:
        a, b = one[g], two[g]
        if a is None or b is None:
            assert a == b, (g, a, b)
        elif isinstance(a, float):
            assert a == pytest.approx(b, rel=1e-12), (g, a, b)
        else:
            assert a == b, (g, a, b)


@given(rows=ROWS, split_mod=st.integers(min_value=2, max_value=4))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_split_merge_invariance_summap(spark, rows, split_mod):
    """sumMap states: per-key sums are split/merge-invariant (keys from
    a small alphabet so batches genuinely overlap on keys)."""
    df = spark.createDataFrame(
        [
            (g, f"k{abs(v) % 3}", v, c, i % split_mod)
            for i, (g, v, c) in enumerate(rows)
        ],
        "g int, k string, v long, c boolean, s int",
    )
    spec = MetricSpec("m", "summap", "k", cond=F.col("c"), weight=F.col("v"))
    _assert_invariant(spark, df, spec)
