"""Two-sample hypothesis-test aggregates (round-5, VERDICT r4 task 5).

ClickHouse's ``studentTTest`` / ``welchTTest`` / ``mannWhitneyUTest``
(reference workload class: A/B readouts over event logs) return a
``(statistic, p_value)`` tuple. The statistics are plain conditional
aggregates, fully Catalyst-expressible; only the p-value needs special
functions Spark SQL lacks:

- Student-t two-sided p-value ``= I_{df/(df+t^2)}(df/2, 1/2)`` — the
  regularized incomplete beta, implemented from scratch below with the
  public Numerical-Recipes-class algorithm (log-beta prefactor +
  modified-Lentz continued fraction, Press et al. §6.4 — the same
  algorithm every numeric library documents);
- normal tail ``= erfc(|z|/sqrt 2)/2`` — ``math.erfc`` (stdlib).

Verification (tests/test_stats_tests.py): ``ibeta`` is cross-checked
against an INDEPENDENT adaptive-Simpson integration of the beta
density, the Welch pair is pinned to ClickHouse's published doc-example
tuple, and Mann-Whitney's conventions (U of the first sample, default
continuity correction, tie-corrected sigma) are pinned to the doc
example's ``('greater')`` p-value.

The Mann-Whitney U needs combined-sample ranks, which no bounded SQL
aggregate expresses — it ships as a grouped-agg pandas UDF (the
seqmatch/LTTB pattern: Arrow-batched, state bounded by group size)
returning ``[u1, p]``.
"""

from __future__ import annotations

import math

_MAXIT = 300
_EPS = 3e-15
_FPMIN = 1e-300


def _betacf(a: float, b: float, x: float) -> float:
    """Modified-Lentz continued fraction for the incomplete beta
    (public NR-class algorithm)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def ibeta(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_two_sided_p(t: float, df: float) -> float:
    """Two-sided Student-t p-value: I_{df/(df+t^2)}(df/2, 1/2)."""
    if df <= 0 or math.isnan(t) or math.isnan(df):
        return float("nan")
    if math.isinf(t):
        return 0.0
    return ibeta(df / 2.0, 0.5, df / (df + t * t))


def normal_two_sided_p(z: float) -> float:
    return math.erfc(abs(z) / math.sqrt(2.0))


def normal_upper_p(z: float) -> float:
    """P(Z > z)."""
    return math.erfc(z / math.sqrt(2.0)) / 2.0


def mann_whitney(
    values,
    idx,
    alternative: str = "two-sided",
    continuity_correction: bool = True,
) -> tuple[float, float]:
    """Mann-Whitney U test over one group's combined sample.

    Conventions (pinned to ClickHouse's documented example in
    tests/test_stats_tests.py): the statistic is U1 — the U of the
    FIRST sample (``idx = 0``); the p-value is the normal approximation
    with midranks, tie-corrected sigma and (by default) a 0.5
    continuity correction; ``alternative`` is ``two-sided`` /
    ``greater`` / ``less`` with 'greater' meaning the first sample is
    stochastically greater."""
    import numpy as np

    v = np.asarray(values, dtype=np.float64)
    g = np.asarray(idx)
    first = g == 0
    n1 = int(first.sum())
    n2 = int(len(v) - n1)
    if n1 == 0 or n2 == 0:
        return float("nan"), float("nan")
    # midranks: average rank over each tie run. Whole-array run
    # detection (r10, guide §4.2): the former per-run Python walk cost
    # O(distinct values) interpreted iterations per group; the
    # adjacent-inequality form computes the identical (i + j)/2 + 1
    # midranks — including the loop's NaN behavior, since NaN != NaN
    # makes every NaN its own run both ways.
    order = np.argsort(v, kind="mergesort")
    sv = v[order]
    n_all = len(sv)
    newrun = np.empty(n_all, dtype=bool)
    newrun[0] = True
    np.not_equal(sv[1:], sv[:-1], out=newrun[1:])
    starts = np.flatnonzero(newrun)
    ends = np.append(starts[1:], n_all) - 1
    mid = (starts + ends) / 2.0 + 1.0
    ranks = np.empty(n_all, dtype=np.float64)
    ranks[order] = mid[np.cumsum(newrun) - 1]
    r1 = float(ranks[first].sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    n = n1 + n2
    # tie correction: sigma^2 = n1 n2/12 * ((n+1) - sum(t^3-t)/(n(n-1)))
    _, counts = np.unique(sv, return_counts=True)
    tie = float((counts.astype(np.float64) ** 3 - counts).sum())
    sig2 = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1))) if n > 1 else 0.0
    if sig2 <= 0:
        return u1, float("nan")
    sigma = math.sqrt(sig2)
    cc = 0.5 if continuity_correction else 0.0
    if alternative == "two-sided":
        z = max(abs(u1 - mu) - cc, 0.0) / sigma
        p = normal_two_sided_p(z)
    elif alternative == "greater":
        z = (u1 - mu - cc) / sigma
        p = normal_upper_p(z)
    elif alternative == "less":
        z = (u1 - mu + cc) / sigma
        p = normal_upper_p(-z)
    else:  # pragma: no cover - gated at translate time
        raise ValueError(f"unsupported alternative {alternative!r}")
    return u1, min(max(p, 0.0), 1.0)


def make_t_pvalue_udf():
    """Scalar pandas UDF ``ch_t_pvalue(t, df) -> double`` (runs
    post-aggregation — one row per group, never in a hot path)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: the plain Series->Series scalar form (hint
    # inference can't resolve the lazily-imported pandas names)
    def _f(t, df):
        out = [
            float("nan")
            if (a is None or b is None)
            else t_two_sided_p(float(a), float(b))
            for a, b in zip(t, df)
        ]
        return pd.Series(out, dtype="float64")

    return pandas_udf(_f, "double")


def make_mann_whitney_udf(
    alternative: str = "two-sided", continuity_correction: bool = True
):
    """Grouped-agg pandas UDF ``(values, idx) -> array<double> [u1, p]``
    (the seqmatch/LTTB slow-complete pattern: Arrow-batched, bounded by
    group size; ranks genuinely need the whole combined sample)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _f(v, g) -> list:
        u, p = mann_whitney(
            v.to_numpy(), g.to_numpy(), alternative, continuity_correction
        )
        return [float(u), float(p)]

    return pandas_udf(_f, "array<double>", PandasUDFType.GROUPED_AGG)


def make_normal_pvalue_udf():
    """Scalar pandas UDF ``ch_normal_two_sided_p(z) -> double``."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _f(z):
        out = [
            float("nan") if a is None else normal_two_sided_p(float(a))
            for a in z
        ]
        return pd.Series(out, dtype="float64")

    return pandas_udf(_f, "double")


def probit(p: float) -> float:
    """Inverse standard-normal CDF, solved by BISECTION on the erfc
    identity Phi(z) = erfc(-z/sqrt 2)/2 — no rational approximation,
    accurate to ~1e-15 (used for z-test confidence intervals; the
    confidence level is a translate-time literal, so this runs once in
    Python, never per row)."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"probit needs p in (0,1), got {p}")
    lo, hi = -40.0, 40.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if math.erfc(-mid / math.sqrt(2.0)) / 2.0 < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def kolmogorov_q(lam: float) -> float:
    """Kolmogorov limit distribution tail Q(lambda) =
    2 * sum_{k>=1} (-1)^(k-1) exp(-2 k^2 lambda^2)."""
    if lam <= 0:
        return 1.0
    s = 0.0
    for k in range(1, 101):
        term = math.exp(-2.0 * k * k * lam * lam)
        s += term if k % 2 else -term
        if term < 1e-18:
            break
    return min(max(2.0 * s, 0.0), 1.0)


def ks_test(values, idx) -> tuple[float, float]:
    """Two-sample Kolmogorov-Smirnov: D = sup |F0 - F1| over the
    combined sample (ECDFs evaluated after each tie run), asymptotic
    two-sided p = Q(sqrt(n0 n1/(n0+n1)) * D).

    Convention note: the statistic is exact and engine-portable; the
    p-value uses the PLAIN Kolmogorov limit (no small-sample
    continuity refinement), which is the standard 'asymptotic' method.
    The exact small-n method is gated at translate time."""
    import numpy as np

    v = np.asarray(values, dtype=np.float64)
    g = np.asarray(idx)
    x0 = np.sort(v[g == 0])
    x1 = np.sort(v[g != 0])
    n0, n1 = len(x0), len(x1)
    if n0 == 0 or n1 == 0:
        return float("nan"), float("nan")
    allv = np.unique(np.concatenate([x0, x1]))
    f0 = np.searchsorted(x0, allv, side="right") / n0
    f1 = np.searchsorted(x1, allv, side="right") / n1
    d = float(np.abs(f0 - f1).max())
    ne = n0 * n1 / (n0 + n1)
    return d, kolmogorov_q(math.sqrt(ne) * d)


def make_ks_udf():
    """Grouped-agg pandas UDF ``(values, idx) -> array<double> [d, p]``
    (same slow-complete pattern as Mann-Whitney: the ECDF sup needs the
    whole combined sample; state bounded by group size)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _f(v, g) -> list:
        d, p = ks_test(v.to_numpy(), g.to_numpy())
        return [float(d), float(p)]

    return pandas_udf(_f, "array<double>", PandasUDFType.GROUPED_AGG)
