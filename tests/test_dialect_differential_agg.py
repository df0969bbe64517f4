"""Differential property-fuzz of the dialect's AGGREGATE mappings vs
DuckDB (round-6, VERDICT r5 task 4 — every ADVICE round so far found
dialect-semantics defects; grouped aggregates were the unswept family).

Same contract as test_dialect_differential.py, lifted to GROUP BY: a
seeded random table (variable group sizes including a 1-row and a 2-row
group, NULLs, negative values, duplicate keys inside map arrays) runs
each ClickHouse aggregate expression through ``translate`` in Spark and
a hand-written DuckDB form of the ClickHouse-documented semantics, then
compares per-group results.

Two duck-side styles:
- MIRROR forms (plain CASE-WHEN / builtin renames) — fuzz the
  translation machinery itself: argument order, condition placement,
  combinator arity, NULL handling;
- INDEPENDENT derivations (power-sum moments, unnest-based map/array
  aggregates, window-rank Spearman, exact-quantile index rule, delta
  sums via lag) — fuzz the SEMANTIC rules with a second implementation
  that shares no structure with the dialect's HOF folds.

Deliberately out of scope (asserted elsewhere or undefined): anything
approximate (uniq/uniqCombined/quantileTDigest/GK — ε-tested),
insertion-order-dependent results (groupArray bare, topK, anyHeavy tie
picks), and the empty-match type-default divergence (CH returns 0/NaN
where the dialect's documented stand-in is NULL — pinned in the grid
tests; fuzz cases avoid all-empty matches for those or accept NULL on
both sides).
"""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest

from clickhouse_learning_spark.functions.dialect import translate

# ------------------------------------------------------------------ data
_R = random.Random(0xA66)
_ROWS = []  # (k, v, n, f, g, w, t, a, ka, va)


def _gen_rows():
    t = 0
    for k in range(7):
        size = {0: 1, 1: 2}.get(k, _R.randint(3, 10))
        for _ in range(size):
            t += 1
            _ROWS.append(
                (
                    k,
                    _R.randint(-9, 9),
                    None if _R.random() < 0.3 else _R.randint(-9, 9),
                    _R.randint(-80, 80) / 4.0,
                    _R.randint(-80, 80) / 4.0,
                    _R.randint(1, 5),
                    t,
                    [_R.randint(-5, 5) for _ in range(_R.randint(1, 4))],
                    (ks := [_R.randint(1, 4) for _ in range(_R.randint(1, 3))]),
                    [_R.randint(1, 9) for _ in range(len(ks))],
                )
            )


_gen_rows()


def _render_row(row, spark_side: bool):
    k, v, n, f, g, w, t, a, ka, va = row
    arr = (lambda xs: "array(" + ", ".join(map(str, xs)) + ")") if spark_side \
        else (lambda xs: "[" + ", ".join(map(str, xs)) + "]")
    nn = "NULL" if n is None else str(n)
    return (
        f"({k}, {v}, {nn}, CAST({f!r} AS DOUBLE), CAST({g!r} AS DOUBLE), "
        f"{w}, {t}, {arr(a)}, {arr(ka)}, {arr(va)})"
    )


_COLS = "k, v, n, f, g, w, t, a, ka, va"


# ------------------------------------------------------------------ cases
class A:
    """name, CH aggregate expr, DuckDB form; full=True means `duck` is a
    complete query producing (k, r); where filters BOTH sides; tol
    compares floats with relative tolerance."""

    def __init__(self, name, ch, duck, *, full=False, where=None, tol=None):
        self.name, self.ch, self.duck = name, ch, duck
        self.full, self.where, self.tol = full, where, tol


def _qx6(p):  # Hyndman-Fan R-6 mirror: rank = p*(n+1), clamped
    h = f"(({p}) * (count(f) + 1))"
    lst = "list(CAST(f AS DOUBLE) ORDER BY f)"
    fl = f"CAST(floor({h}) AS INT)"
    return (
        f"(CASE WHEN {h} < 1 THEN {lst}[1] "
        f"WHEN {h} >= count(f) THEN {lst}[count(f)] "
        f"ELSE {lst}[{fl}] + ({h} - floor({h})) "
        f"* ({lst}[{fl} + 1] - {lst}[{fl}]) END)"
    )


def _qe(p):  # CH quantileExact index rule: 0-based floor(p*n), clamped
    return (
        f"list_sort(list(v))[least(CAST(floor({p} * count(v)) AS INT), "
        f"CAST(count(v) AS INT) - 1) + 1]"
    )


# power sums for independent moment derivations (population central
# moments expanded in raw sums; CH -Samp forms divide by (n-1))
_N = "CAST(count(f) AS DOUBLE)"
_M = f"(sum(f) / {_N})"
_M2 = f"(sum(f*f)/{_N} - {_M}*{_M})"
_M3 = f"(sum(f*f*f)/{_N} - 3*{_M}*sum(f*f)/{_N} + 2*{_M}*{_M}*{_M})"
_M4 = (
    f"(sum(f*f*f*f)/{_N} - 4*{_M}*sum(f*f*f)/{_N} "
    f"+ 6*{_M}*{_M}*sum(f*f)/{_N} - 3*{_M}*{_M}*{_M}*{_M})"
)

CASES = [
    # ---- plain + -If combinators (mirror: machinery fuzz) ------------
    A("sum", "sum(v)", "sum(v)"),
    A("count_bare", "count()", "count(*)"),
    A("count_col", "count(n)", "count(n)"),
    A("avg", "avg(v)", "avg(CAST(v AS DOUBLE))", tol=1e-9),
    A("min", "min(v)", "min(v)"),
    A("max", "max(v)", "max(v)"),
    A("sumIf", "sumIf(v, v > 3)",
      "coalesce(sum(CASE WHEN v > 3 THEN v END), 0)"),
    A("countIf", "countIf(v < 0)", "count(CASE WHEN v < 0 THEN 1 END)"),
    A("avgIf", "avgIf(v, v > 0)",
      "avg(CASE WHEN v > 0 THEN CAST(v AS DOUBLE) END)", tol=1e-9),
    A("minIf", "minIf(v, v % 2 = 0)", "min(CASE WHEN v % 2 = 0 THEN v END)"),
    A("maxIf", "maxIf(v, abs(v) > 2)",
      "max(CASE WHEN abs(v) > 2 THEN v END)"),
    A("sumDistinct", "sumDistinct(v)", "sum(DISTINCT v)"),
    A("uniqExact", "uniqExact(v)", "count(DISTINCT v)"),
    A("uniqExact_nulls", "uniqExact(n)", "count(DISTINCT n)"),
    A("uniqExactIf", "uniqExactIf(v, v > 0)",
      "count(DISTINCT CASE WHEN v > 0 THEN v END)"),
    A("uniqUpTo", "uniqUpTo(3)(v)", "least(count(DISTINCT v), 4)"),
    A("groupBitmap", "groupBitmap(v)", "count(DISTINCT v)"),
    # ---- arg pickers (t is unique per row -> deterministic) ----------
    A("argMin", "argMin(v, t)", "arg_min(v, t)"),
    A("argMax", "argMax(v, t)", "arg_max(v, t)"),
    A("argMinIf", "argMinIf(v, t, v > 0)",
      "arg_min(CASE WHEN v > 0 THEN v END, CASE WHEN v > 0 THEN t END)"),
    A("argMaxIf", "argMaxIf(v, t, v < 0)",
      "arg_max(CASE WHEN v < 0 THEN v END, CASE WHEN v < 0 THEN t END)"),
    # ---- collected arrays (sorted -> order-independent) --------------
    A("groupArray_sorted", "arraySort(groupArray(v))",
      "list_sort(list(v))"),
    A("groupUniqArray_sorted", "arraySort(groupUniqArray(v))",
      "list_sort(list_distinct(list(v)))"),
    # ---- moments: mirror builtins ------------------------------------
    A("varPop", "varPop(f)", "var_pop(f)", tol=1e-9),
    A("stddevPop", "stddevPop(f)", "stddev_pop(f)", tol=1e-9),
    A("varSamp", "varSamp(f)", "var_samp(f)", where="k >= 1", tol=1e-9),
    A("stddevSamp", "stddevSamp(f)", "stddev_samp(f)", where="k >= 1",
      tol=1e-9),
    A("covarPop", "covarPop(f, g)", "covar_pop(f, g)", tol=1e-9),
    A("covarSamp", "covarSamp(f, g)", "covar_samp(f, g)", where="k >= 1",
      tol=1e-9),
    A("corr", "corr(f, g)", "corr(f, g)", where="k >= 1", tol=1e-6),
    # ---- moments: INDEPENDENT power-sum derivations of CH's formulas -
    A("skewPop_powersums", "skewPop(f)",
      f"({_M3}) / pow({_M2}, 1.5)", where="k >= 1", tol=1e-6),
    A("kurtPop_powersums", "kurtPop(f)",
      f"({_M4}) / (({_M2}) * ({_M2}))", where="k >= 1", tol=1e-6),
    # CH Moments.h -Samp rule: POPULATION central moment over SAMPLE
    # variance (getMoment3() / getSampleVariance()^1.5) — verified
    # against the n/(n-1) ratio this sweep itself exposed
    A("skewSamp_powersums", "skewSamp(f)",
      f"({_M3}) / pow(({_N}) * ({_M2}) / ({_N} - 1), 1.5)",
      where="k >= 1", tol=1e-6),
    A("kurtSamp_powersums", "kurtSamp(f)",
      f"({_M4}) / pow(({_N}) * ({_M2}) / ({_N} - 1), 2.0)",
      where="k >= 1", tol=1e-6),
    # ---- weighted / paired (independent closed forms) ----------------
    A("avgWeighted", "avgWeighted(f, w)",
      "(sum(f * w) / CAST(sum(w) AS DOUBLE))", tol=1e-9),
    A("sumCount", "sumCount(v)",
      "{'col1': sum(v), 'col2': count(v)}"),
    A("simpleLinearRegression", "simpleLinearRegression(f, g)",
      # slope/intercept from raw sums (Cramer on the 2x2 normal eqs) —
      # independent of Spark's regr_slope/regr_intercept
      "{'col1': (count(*) * sum(f*g) - sum(f) * sum(g)) "
      "/ (count(*) * sum(f*f) - sum(f) * sum(f)), "
      "'col2': (sum(g) - ((count(*) * sum(f*g) - sum(f) * sum(g)) "
      "/ (count(*) * sum(f*f) - sum(f) * sum(f))) * sum(f)) / count(*)}",
      where="k >= 1", tol=1e-6),
    A("boundingRatio", "boundingRatio(t, f)",
      "((arg_max(f, t) - arg_min(f, t)) "
      "/ CAST(max(t) - min(t) AS DOUBLE))", where="k >= 1", tol=1e-9),
    # ---- exact quantiles: CH's 0-based floor(level*n) clamped rule ---
    A("quantileExact_0", "quantileExact(0)(v)", _qe("0.0")),
    A("quantileExact_25", "quantileExact(0.25)(v)", _qe("0.25")),
    A("quantileExact_50", "quantileExact(0.5)(v)", _qe("0.5")),
    A("quantileExact_90", "quantileExact(0.9)(v)", _qe("0.9")),
    A("quantileExact_100", "quantileExact(1)(v)", _qe("1.0")),
    A("medianExact", "medianExact(v)", _qe("0.5")),
    A("quantilesExact", "quantilesExact(0.25, 0.75)(v)",
      f"[{_qe('0.25')}, {_qe('0.75')}]"),
    # r9: Excel-style plurals. Inclusive is Hyndman-Fan R-7 — DuckDB's
    # quantile_cont IS an independent R-7 implementation; Exclusive is
    # R-6 (rank = p(n+1) clamped), mirrored over a sorted list
    A("quantileExactInclusive", "quantileExactInclusive(0.3)(f)",
      "quantile_cont(f, 0.3)", tol=1e-9),
    A("quantilesExactInclusive",
      "quantilesExactInclusive(0.25, 0.75)(f)",
      "quantile_cont(f, [0.25, 0.75])", tol=1e-9),
    A("quantilesExactExclusive",
      "quantilesExactExclusive(0.25, 0.75)(f)",
      f"[{_qx6('0.25')}, {_qx6('0.75')}]", tol=1e-9),
    # ---- entropy: unnest/window derivation vs the dialect's HOF fold -
    A("entropy", "entropy(v)",
      "SELECT k, -sum(p * log2(p)) AS r FROM ("
      "  SELECT k, CAST(count(*) AS DOUBLE) "
      "         / (sum(count(*)) OVER (PARTITION BY k)) AS p "
      "  FROM diff_agg GROUP BY k, v) sub GROUP BY k",
      full=True, tol=1e-9),
    # ---- Spearman: window average-ranks vs the dialect's HOF ranks ---
    A("rankCorr", "rankCorr(f, g)",
      "SELECT k, corr(rx, ry) AS r FROM ("
      "  SELECT k, "
      "    rank() OVER (PARTITION BY k ORDER BY f) "
      "      + (count(*) OVER (PARTITION BY k, f) - 1) / 2.0 AS rx, "
      "    rank() OVER (PARTITION BY k ORDER BY g) "
      "      + (count(*) OVER (PARTITION BY k, g) - 1) / 2.0 AS ry "
      "  FROM diff_agg WHERE k >= 1) sub GROUP BY k",
      full=True, where="k >= 1", tol=1e-6),
    # ---- array-argument aggregates: unnest derivations ----------------
    A("sumArray", "sumArray(a)",
      "SELECT k, sum(u) AS r FROM "
      "(SELECT k, unnest(a) AS u FROM diff_agg) sub GROUP BY k",
      full=True),
    A("avgArray", "avgArray(a)",
      "SELECT k, avg(CAST(u AS DOUBLE)) AS r FROM "
      "(SELECT k, unnest(a) AS u FROM diff_agg) sub GROUP BY k",
      full=True, tol=1e-9),
    A("uniqArray", "uniqArray(a)",
      "SELECT k, count(DISTINCT u) AS r FROM "
      "(SELECT k, unnest(a) AS u FROM diff_agg) sub GROUP BY k",
      full=True),
    # ---- map aggregates: unnest+regroup vs the dialect's sorted fold -
    A("sumMap", "sumMap(ka, va)",
      "SELECT k, {'col1': list(mk ORDER BY mk), "
      "'col2': list(sv ORDER BY mk)} AS r FROM ("
      "  SELECT k, mk, sum(mv) AS sv FROM ("
      "    SELECT k, unnest(ka) AS mk, unnest(va) AS mv FROM diff_agg)"
      "  GROUP BY k, mk) sub GROUP BY k",
      full=True),
    A("minMap", "minMap(ka, va)",
      "SELECT k, {'col1': list(mk ORDER BY mk), "
      "'col2': list(sv ORDER BY mk)} AS r FROM ("
      "  SELECT k, mk, min(mv) AS sv FROM ("
      "    SELECT k, unnest(ka) AS mk, unnest(va) AS mv FROM diff_agg)"
      "  GROUP BY k, mk) sub GROUP BY k",
      full=True),
    A("maxMap", "maxMap(ka, va)",
      "SELECT k, {'col1': list(mk ORDER BY mk), "
      "'col2': list(sv ORDER BY mk)} AS r FROM ("
      "  SELECT k, mk, max(mv) AS sv FROM ("
      "    SELECT k, unnest(ka) AS mk, unnest(va) AS mv FROM diff_agg)"
      "  GROUP BY k, mk) sub GROUP BY k",
      full=True),
    # ---- order-free delta sum: lag-window derivation vs sorted fold --
    A("deltaSumTimestamp", "deltaSumTimestamp(v, t)",
      "SELECT k, sum(CASE WHEN pv IS NULL OR v <= pv THEN 0 "
      "ELSE CAST(v - pv AS DOUBLE) END) AS r FROM ("
      "  SELECT k, v, lag(v) OVER (PARTITION BY k ORDER BY t) AS pv "
      "  FROM diff_agg) sub GROUP BY k",
      full=True, tol=1e-9),
]


# ---- r7 (VERDICT r6 item 4): -Resample bucket edges on NON-step-
# divisible ranges. CH drops keys >= end outright, so the LAST bucket
# clamps to end (the r6 ADVICE fix, until now pinned only point-wise);
# the DuckDB side re-derives every bucket as an independent CASE-WHEN
# aggregate — no shared structure with the dialect's HOF fold. Ranges
# chosen to hit: negative starts, end mid-bucket, step > range (one
# clamped bucket), and an all-below-start tail.
def _resample_duck(agg: str, start: int, end: int, step: int) -> str:
    nb = -(-(end - start) // step)
    parts = []
    for b in range(nb):
        lo, hi = start + b * step, min(start + (b + 1) * step, end)
        cond = f"v >= {lo} AND v < {hi}"
        parts.append({
            "sum": f"coalesce(sum(CASE WHEN {cond} THEN "
                   f"CAST(v AS DOUBLE) END), 0)",
            "count": f"CAST(count(CASE WHEN {cond} THEN 1 END) AS BIGINT)",
            "min": f"min(CASE WHEN {cond} THEN CAST(v AS DOUBLE) END)",
            "max": f"max(CASE WHEN {cond} THEN CAST(v AS DOUBLE) END)",
            "avg": f"avg(CASE WHEN {cond} THEN CAST(v AS DOUBLE) END)",
            "uniqExact": f"CAST(count(DISTINCT CASE WHEN {cond} "
                         f"THEN v END) AS BIGINT)",
        }[agg])
    return "[" + ", ".join(parts) + "]"


for _st, _en, _sp in [(-7, 8, 4), (0, 7, 3), (-9, 10, 5), (-8, -1, 3),
                      (2, 3, 5)]:
    for _agg in ("sum", "count", "min", "max", "avg", "uniqExact"):
        _args = "(v)" if _agg == "count" else "(v, v)"
        CASES.append(A(
            f"{_agg}Resample_{_st}_{_en}_{_sp}",
            f"{_agg}Resample({_st}, {_en}, {_sp}){_args}",
            _resample_duck(_agg, _st, _en, _sp),
            tol=1e-9,
        ))


# ------------------------------------------------------------------ run
def _norm(v):
    from decimal import Decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, dict):  # duckdb struct
        return tuple(_norm(x) for x in v.values())
    if isinstance(v, (dt.datetime, dt.date)):
        return str(v)
    if isinstance(v, (list, tuple)):  # incl. pyspark Row
        return tuple(_norm(x) for x in v)
    return v


def _approx_eq(a, b, tol):
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            _approx_eq(x, y, tol) for x, y in zip(a, b)
        )
    if tol and isinstance(a, float) and isinstance(b, float):
        return a == pytest.approx(b, rel=tol, abs=tol)
    return a == b


@pytest.fixture(scope="module")
def engines(spark):
    import duckdb

    rows_s = ",\n".join(_render_row(r, True) for r in _ROWS)
    rows_d = ",\n".join(_render_row(r, False) for r in _ROWS)
    spark.sql(
        f"CREATE OR REPLACE TEMP VIEW diff_agg AS "
        f"SELECT * FROM VALUES {rows_s} AS dat({_COLS})"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW diff_agg AS "
        f"SELECT * FROM (VALUES {rows_d}) dat({_COLS})"
    )
    return spark, con


@pytest.mark.parametrize("case", CASES, ids=lambda c: c.name)
def test_aggregate_differential(engines, case):
    spark, con = engines
    wh = f" WHERE {case.where}" if case.where else ""
    s_sql = translate(
        f"SELECT k, {case.ch} AS r FROM diff_agg{wh} GROUP BY k"
    )
    got = {r["k"]: _norm(r["r"]) for r in spark.sql(s_sql).collect()}
    if case.full:
        d_sql = case.duck
    else:
        d_sql = f"SELECT k, {case.duck} AS r FROM diff_agg{wh} GROUP BY k"
    want = {r[0]: _norm(r[1]) for r in con.execute(d_sql).fetchall()}
    assert set(got) == set(want), (case.name, sorted(got), sorted(want))
    bad = {
        k: (got[k], want[k])
        for k in got
        if not _approx_eq(got[k], want[k], case.tol)
    }
    assert not bad, f"{case.name}: {bad}"


def test_aggregate_case_count():
    """Standing bar: the aggregate sweep must keep >= 30 distinct
    aggregate mappings covered (VERDICT r5 task 4's done-bar, together
    with the >= 200-mapping total asserted in the scalar sweep file)."""
    import re

    fns = set()
    for c in CASES:
        fns.update(re.findall(r"[A-Za-z_][A-Za-z0-9_]*(?=\()", c.ch))
    fns -= {"abs"}
    assert len(fns) >= 30, sorted(fns)
