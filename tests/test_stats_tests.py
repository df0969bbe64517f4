"""Two-sample hypothesis-test aggregates (functions/stats_tests.py +
dialect mappings) — verification stack:

1. the from-scratch regularized incomplete beta vs an INDEPENDENT
   adaptive-Simpson integration of the beta density (different
   algorithm entirely — the ref_audio/pocketfft golden methodology,
   in-test since scipy isn't available here);
2. ClickHouse's published doc-example tuples pinned end-to-end through
   ``translate`` (welchTTest and mannWhitneyUTest('greater') — these
   pin the sign convention, the Welch-Satterthwaite df, U-of-first-
   sample, the default continuity correction and the tie rules);
3. hand-computed small cases for the pooled t and midrank ties.
"""

from __future__ import annotations

import math

import pytest

from clickhouse_learning_spark.functions.dialect import translate
from clickhouse_learning_spark.functions.stats_tests import (
    ibeta,
    mann_whitney,
    t_two_sided_p,
)


def _simpson(f, lo, hi, n=4096):
    h = (hi - lo) / n
    s = f(lo) + f(hi)
    for i in range(1, n):
        s += f(lo + i * h) * (4 if i % 2 else 2)
    return s * h / 3.0


def ref_ibeta(a: float, b: float, x: float) -> float:
    """Independent reference: direct numerical integration of the beta
    density (no continued fraction anywhere)."""
    lnb = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)

    def dens(t: float) -> float:
        if t <= 0.0 or t >= 1.0:
            return 0.0
        return math.exp((a - 1) * math.log(t) + (b - 1) * math.log1p(-t) - lnb)

    return _simpson(dens, 0.0, x)


def test_ibeta_matches_independent_integration():
    # Simpson handles the smooth interior (a, b > 1); endpoint
    # singularities are covered by the closed forms below
    grid = [
        (2.0, 3.0, 0.5),
        (5.0, 1.5, 0.8),
        (7.5, 7.5, 0.5),
        (3.0, 2.5, 0.2),
        (12.0, 4.0, 0.7),
        (2.5, 9.0, 0.1),
    ]
    for a, b, x in grid:
        got = ibeta(a, b, x)
        want = ref_ibeta(a, b, x)
        assert got == pytest.approx(want, abs=1e-7), (a, b, x)
    # closed forms (independent of both implementations):
    # I_x(1/2, 1/2) = (2/pi) asin(sqrt x); I_x(a, 1) = x^a;
    # I_x(1, b) = 1 - (1-x)^b
    for x in (0.1, 0.3, 0.7, 0.95):
        assert ibeta(0.5, 0.5, x) == pytest.approx(
            2.0 / math.pi * math.asin(math.sqrt(x)), abs=1e-10
        )
        assert ibeta(3.0, 1.0, x) == pytest.approx(x**3, abs=1e-12)
        assert ibeta(1.0, 4.0, x) == pytest.approx(
            1.0 - (1.0 - x) ** 4, abs=1e-12
        )
    # exact identities
    assert ibeta(1.0, 1.0, 0.3) == pytest.approx(0.3, abs=1e-12)
    assert ibeta(2.0, 2.0, 0.5) == pytest.approx(0.5, abs=1e-12)
    assert ibeta(4.0, 9.0, 0.0) == 0.0 and ibeta(4.0, 9.0, 1.0) == 1.0


def test_t_pvalue_against_t_table():
    # classic two-sided critical values: t_{0.025, df} -> p = 0.05
    for t, df in ((12.706, 1), (2.776, 4), (2.228, 10), (2.086, 20)):
        assert t_two_sided_p(t, df) == pytest.approx(0.05, abs=5e-4), (t, df)
    assert t_two_sided_p(0.0, 7) == pytest.approx(1.0, abs=1e-12)


def test_welch_doc_example_end_to_end(spark):
    """ClickHouse's welchTTest documentation example: sample
    [20.3,22.1,21.9] vs [18.9,20.3,19] must give the published tuple
    (2.7988719532211235, 0.051807360348581945)."""
    sql = translate(
        "SELECT tupleElement(welchTTest(v, g), 1) AS t_stat, "
        "tupleElement(welchTTest(v, g), 2) AS p_value "
        "FROM (VALUES (20.3, 0), (22.1, 0), (21.9, 0), "
        "(18.9, 1), (20.3, 1), (19.0, 1)) AS s(v, g)"
    )
    r = spark.sql(sql).collect()[0]
    assert r.t_stat == pytest.approx(2.7988719532211235, rel=1e-9)
    assert r.p_value == pytest.approx(0.051807360348581945, rel=1e-9)


def test_student_ttest_end_to_end(spark):
    """Pooled-variance t on a hand-computed case: a=[1,2,3] b=[2,3,4]
    -> t = -1/sqrt(2/3) = -1.224744871, df=4; p checked against the
    independent integration reference."""
    sql = translate(
        "SELECT studentTTest(v, g) AS r "
        "FROM (VALUES (1.0, 0), (2.0, 0), (3.0, 0), "
        "(2.0, 1), (3.0, 1), (4.0, 1)) AS s(v, g)"
    )
    r = spark.sql(sql).collect()[0].r
    t = -1.0 / math.sqrt(2.0 / 3.0)
    assert r.col1 == pytest.approx(t, rel=1e-12)
    # p = I_{df/(df+t^2)}(df/2, 1/2), via the independent integrator
    want_p = ref_ibeta(2.0, 0.5, 4.0 / (4.0 + t * t))
    assert r.col2 == pytest.approx(want_p, abs=1e-6)


def test_mann_whitney_doc_example_end_to_end(spark):
    """ClickHouse's mannWhitneyUTest doc example with
    alternative='greater': first sample [10,11,12] vs [1,2,3] ->
    (9, 0.04042779918503192); pins U-of-first-sample, the default
    continuity correction, and the one-sided tail direction."""
    sql = translate(
        "SELECT mannWhitneyUTest('greater')(v, g) AS r "
        "FROM (VALUES (10.0, 0), (11.0, 0), (12.0, 0), "
        "(1.0, 1), (2.0, 1), (3.0, 1)) AS s(v, g)"
    )
    r = spark.sql(sql).collect()[0].r
    assert r.col1 == pytest.approx(9.0, abs=1e-12)
    assert r.col2 == pytest.approx(0.04042779918503192, rel=1e-9)
    # default (two-sided) form through the plain mapping
    sql2 = translate(
        "SELECT mannWhitneyUTest(v, g) AS r "
        "FROM (VALUES (10.0, 0), (11.0, 0), (12.0, 0), "
        "(1.0, 1), (2.0, 1), (3.0, 1)) AS s(v, g)"
    )
    r2 = spark.sql(sql2).collect()[0].r
    assert r2.col1 == pytest.approx(9.0, abs=1e-12)
    assert r2.col2 == pytest.approx(2 * 0.04042779918503192, rel=1e-9)


def test_mann_whitney_ties_midranks():
    """Ties: [1, 2, 2] vs [2, 3]; midranks -> r1 = 1 + 3 + 3 = 7,
    u1 = 7 - 6 = 1; sigma uses the tie-corrected variance
    n1*n2/12 * ((n+1) - sum(t^3-t)/(n(n-1))) with one run of three 2s."""
    u, p = mann_whitney([1, 2, 2, 2, 3], [0, 0, 0, 1, 1], "two-sided", True)
    assert u == pytest.approx(1.0, abs=1e-12)
    sig2 = 3 * 2 / 12.0 * (6 - (27 - 3) / (5 * 4.0))
    z = (abs(1.0 - 3.0) - 0.5) / math.sqrt(sig2)
    assert p == pytest.approx(math.erfc(z / math.sqrt(2)), rel=1e-12)


def test_mann_whitney_less_and_no_continuity():
    u_g, p_g = mann_whitney([5, 6], [0, 1], "greater", False)
    u_l, p_l = mann_whitney([5, 6], [0, 1], "less", False)
    # one-sided tails are complementary without ties/cc
    assert u_g == u_l == 0.0
    assert p_g + p_l == pytest.approx(1.0, abs=1e-12)


def test_parameter_gates():
    with pytest.raises(ValueError, match="alternative"):
        translate("SELECT mannWhitneyUTest('sideways')(v, g) FROM t")
    with pytest.raises(ValueError, match="confidence"):
        translate("SELECT studentTTest(0.95)(v, g) FROM t")
    with pytest.raises(ValueError, match="confidence"):
        translate("SELECT welchTTest(0.9)(v, g) FROM t")


def test_probit_and_kolmogorov_q():
    from clickhouse_learning_spark.functions.stats_tests import (
        kolmogorov_q,
        probit,
    )

    # textbook normal quantiles
    assert probit(0.975) == pytest.approx(1.959963984540054, abs=1e-12)
    assert probit(0.995) == pytest.approx(2.5758293035489004, abs=1e-12)
    assert probit(0.5) == pytest.approx(0.0, abs=1e-12)
    # probit inverts the erfc CDF exactly
    for p in (0.01, 0.2, 0.7, 0.999):
        z = probit(p)
        assert math.erfc(-z / math.sqrt(2)) / 2 == pytest.approx(p, abs=1e-13)
    # Kolmogorov limit: the classic Q(1.0) ~ 0.27 and monotonicity
    assert kolmogorov_q(1.0) == pytest.approx(0.26999967, abs=1e-6)
    assert kolmogorov_q(0.0) == 1.0
    qs = [kolmogorov_q(x / 10) for x in range(1, 30)]
    assert all(a >= b for a, b in zip(qs, qs[1:]))


def test_ks_statistic_hand_cases():
    from clickhouse_learning_spark.functions.stats_tests import ks_test

    # disjoint supports -> D = 1
    d, p = ks_test([1, 2, 3, 10, 11, 12], [0, 0, 0, 1, 1, 1])
    assert d == 1.0
    # identical samples -> D = 0, p = 1
    d, p = ks_test([5, 6, 7, 5, 6, 7], [0, 0, 0, 1, 1, 1])
    assert d == 0.0 and p == 1.0
    # hand case with ties across samples:
    # x0=[1,2], x1=[2,3]: at 1 F0=.5 F1=0; at 2 F0=1 F1=.5; at 3 1,1
    d, p = ks_test([1, 2, 2, 3], [0, 0, 1, 1])
    assert d == pytest.approx(0.5)


def test_ks_end_to_end(spark):
    sql = translate(
        "SELECT kolmogorovSmirnovTest(v, g) AS r "
        "FROM (VALUES (1.0, 0), (2.0, 0), (3.0, 0), "
        "(10.0, 1), (11.0, 1), (12.0, 1)) AS s(v, g)"
    )
    r = spark.sql(sql).collect()[0].r
    assert r.col1 == pytest.approx(1.0)
    from clickhouse_learning_spark.functions.stats_tests import kolmogorov_q

    assert r.col2 == pytest.approx(kolmogorov_q(math.sqrt(1.5)), rel=1e-12)
    with pytest.raises(ValueError, match="two-sided"):
        translate("SELECT kolmogorovSmirnovTest('greater')(v, g) FROM t")
    with pytest.raises(ValueError, match="exact"):
        translate(
            "SELECT kolmogorovSmirnovTest('two-sided', 'exact')(v, g) FROM t"
        )


def test_mean_z_test_end_to_end(spark):
    """z-test with known population variances 1.0: a=[1,2,3] b=[2,3,4]
    -> z = -1/sqrt(2/3); CI bounds from the bisection probit."""
    from clickhouse_learning_spark.functions.stats_tests import probit

    sql = translate(
        "SELECT meanZTest(1.0, 1.0, 0.95)(v, g) AS r "
        "FROM (VALUES (1.0, 0), (2.0, 0), (3.0, 0), "
        "(2.0, 1), (3.0, 1), (4.0, 1)) AS s(v, g)"
    )
    r = spark.sql(sql).collect()[0].r
    se = math.sqrt(2.0 / 3.0)
    assert r.col1 == pytest.approx(-1.0 / se, rel=1e-12)
    assert r.col2 == pytest.approx(math.erfc((1.0 / se) / math.sqrt(2)), rel=1e-12)
    zc = probit(0.975)
    assert r.col3 == pytest.approx(-1.0 - zc * se, rel=1e-12)
    assert r.col4 == pytest.approx(-1.0 + zc * se, rel=1e-12)
    with pytest.raises(ValueError, match="meanZTest"):
        translate("SELECT meanZTest(1.0)(v, g) FROM t")


def test_mann_whitney_vectorized_midranks_match_run_walk():
    """r10: the whole-array midrank computation must stay bit-identical
    to the per-run walk it replaced — heavy ties, no ties, and NaN
    values (each NaN its own run, both ways)."""
    import numpy as np

    def reference(values, idx, alternative, cc):
        v = np.asarray(values, dtype=np.float64)
        g = np.asarray(idx)
        first = g == 0
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(len(v), dtype=np.float64)
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        return float(ranks[first].sum())

    rng = np.random.default_rng(31)
    for trial in range(60):
        n = int(rng.integers(2, 300))
        kind = trial % 3
        if kind == 0:
            v = rng.integers(0, 8, n).astype(float)
        elif kind == 1:
            v = rng.normal(size=n)
        else:
            v = rng.integers(0, 5, n).astype(float)
            v[rng.random(n) < 0.15] = np.nan
        g = rng.integers(0, 2, n)
        if (g == 0).sum() in (0, n):
            continue
        n1 = int((g == 0).sum())
        r1 = reference(v, g, "two-sided", True)
        u_ref = r1 - n1 * (n1 + 1) / 2.0
        u, _ = mann_whitney(v.tolist(), g.tolist())
        assert u == u_ref, (trial, u, u_ref)
