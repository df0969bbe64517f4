"""Golden generator for ``ch_ztest_ks_dialect`` (round-5, staged r6).

Independent derivation chain — nothing from the production path:

- cohort moments via DuckDB SQL;
- z-test p by Simpson integration of the NORMAL DENSITY tail (vs the
  production math.erfc);
- the 0.95 critical value by bisection on that same density INTEGRAL
  (vs the production bisection on erfc);
- Kolmogorov-Smirnov D by a plain two-pointer merge walk over the two
  sorted samples (vs the production np.searchsorted ECDFs); the
  asymptotic Q series is the standard public formula on both sides.

Refuse-to-write gate: the production Spark query must match every row
exactly after its own 6-decimal rounding.

Usage: python tools/make_ztest_ks_golden.py [sf_dir]  (default sf0.01).
"""

from __future__ import annotations

import math
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POP_VX = 1.0
POP_VY = 1.0
CONF = 0.95


def spark_round(x: float, scale: int) -> float:
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-scale), ROUND_HALF_UP
        )
    )


def normal_upper_by_integration(z: float) -> float:
    """P(Z > z) by Simpson over the density (smooth, fast decay)."""
    lo = z
    hi = z + 50.0
    n = 200_000

    def dens(x: float) -> float:
        return math.exp(-x * x / 2.0) / math.sqrt(2.0 * math.pi)

    h = (hi - lo) / n
    s = dens(lo) + dens(hi)
    for i in range(1, n):
        s += dens(lo + i * h) * (4 if i % 2 else 2)
    return s * h / 3.0


def z_crit_by_integration(conf: float) -> float:
    """Solve P(Z > z) = (1-conf)/2 by bisection on the integral."""
    target = (1.0 - conf) / 2.0
    lo, hi = 0.0, 10.0
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if normal_upper_by_integration(mid) > target:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def ks_merge_walk(x0: list[float], x1: list[float]) -> float:
    """D = sup |F0 - F1| via a two-pointer walk (independent of the
    production searchsorted ECDF evaluation)."""
    a = sorted(x0)
    b = sorted(x1)
    n0, n1 = len(a), len(b)
    i = j = 0
    d = 0.0
    while i < n0 or j < n1:
        if j >= n1 or (i < n0 and a[i] <= b[j]):
            v = a[i]
        else:
            v = b[j]
        while i < n0 and a[i] == v:
            i += 1
        while j < n1 and b[j] == v:
            j += 1
        d = max(d, abs(i / n0 - j / n1))
    return d


def kolmogorov_q(lam: float) -> float:
    if lam <= 0:
        return 1.0
    s = 0.0
    for k in range(1, 101):
        term = math.exp(-2.0 * k * k * lam * lam)
        s += term if k % 2 else -term
        if term < 1e-18:
            break
    return min(max(2.0 * s, 0.0), 1.0)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    con = duckdb.connect()
    ev = os.path.join(sf, "events.parquet")
    moments = con.execute(
        f"""
        SELECT event_type,
               count(CASE WHEN user_id % 2 = 0 THEN value END) AS n0,
               avg(CASE WHEN user_id % 2 = 0 THEN value END) AS m0,
               count(CASE WHEN user_id % 2 <> 0 THEN value END) AS n1,
               avg(CASE WHEN user_id % 2 <> 0 THEN value END) AS m1
        FROM '{ev}'
        WHERE value IS NOT NULL AND user_id IS NOT NULL
        GROUP BY event_type ORDER BY event_type
        """
    ).fetchall()
    raw = con.execute(
        f"""
        SELECT event_type, value, user_id % 2 AS g FROM '{ev}'
        WHERE value IS NOT NULL AND user_id IS NOT NULL
        """
    ).fetchall()
    by_type: dict[str, tuple[list, list]] = {}
    for et, v, g in raw:
        by_type.setdefault(et, ([], []))[0 if int(g) == 0 else 1].append(
            float(v)
        )

    zc = z_crit_by_integration(CONF)
    golden = []
    for et, n0, m0, n1, m1 in moments:
        se = math.sqrt(POP_VX / n0 + POP_VY / n1)
        z = (m0 - m1) / se
        p = 2.0 * normal_upper_by_integration(abs(z))
        diff = m0 - m1
        x0, x1 = by_type[et]
        d = ks_merge_walk(x0, x1)
        ne = len(x0) * len(x1) / (len(x0) + len(x1))
        ks_p = kolmogorov_q(math.sqrt(ne) * d)
        golden.append(
            (
                et,
                spark_round(z, 6),
                spark_round(p, 6),
                spark_round(diff - zc * se, 6),
                spark_round(diff + zc * se, 6),
                spark_round(d, 6),
                spark_round(ks_p, 6),
            )
        )
    golden.sort()

    from clickhouse_learning_spark import get_spark
    from clickhouse_learning_spark.queries import QUERIES
    import clickhouse_learning_spark.queries_reference  # noqa: F401

    spark = get_spark(app_name="make_ztest_ks_golden")
    rows = QUERIES["ch_ztest_ks_dialect"](spark, sf).collect()
    prod = sorted(
        (
            r.event_type,
            float(r.z_stat),
            float(r.z_p),
            float(r.ci_lo),
            float(r.ci_hi),
            float(r.ks_d),
            float(r.ks_p),
        )
        for r in rows
    )
    if prod != golden:
        print("MISMATCH — refusing to write golden.")
        for g, p_ in zip(golden, prod):
            if g != p_:
                print("  golden:    ", g)
                print("  production:", p_)
        return 1

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "clickhouse_learning_spark",
        "golden_ztest_ks.py",
    )
    with open(out, "w") as fh:
        fh.write(
            '"""Golden z-test/KS rows for the sf0.01 grading corpus —\n'
            "generated by tools/make_ztest_ks_golden.py from an INDEPENDENT\n"
            "chain (DuckDB moments, normal-density tail integration,\n"
            "density-integral bisection critical value, two-pointer merge-walk\n"
            "KS), cross-checked row-exact against the production Spark query\n"
            "before writing (refuse-on-mismatch).\n"
            '"""\n\n'
            f"# corpus: {sf}; cohorts = user_id %% 2; pop vars = 1.0; "
            f"conf = {CONF}\n"
            "# rows: (event_type, z_stat, z_p, ci_lo, ci_hi, ks_d, ks_p)\n"
            "CH_ZTEST_KS = [\n"
        )
        for r in golden:
            fh.write(f"    {r!r},\n")
        fh.write("]\n")
    print(f"wrote {out}: {len(golden)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
