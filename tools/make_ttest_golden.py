"""Golden generator for ``ch_ttest_dialect`` (round-5, VERDICT r4
task 5).

Derives the expected per-event_type hypothesis-test rows with an
INDEPENDENT computation chain — nothing from the production path:

- sample moments via DuckDB SQL (count/avg/var_samp per cohort);
- Student/Welch p-values by DIRECT Simpson integration of the
  t-density tail (smooth, no endpoint singularity — a different
  algorithm from the production continued-fraction incomplete beta);
- Mann-Whitney via pure-Python bisect midranks (vs the production
  numpy argsort), z/erfc with the same pinned conventions.

Refuse-to-write gate: the production Spark query must match every row
exactly (after the query's own 6-decimal rounding) or nothing is
written.

Usage: python tools/make_ttest_golden.py [sf_dir]  (default sf0.01).
"""

from __future__ import annotations

import math
import os
import sys
from bisect import bisect_left, bisect_right
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spark_round(x: float, scale: int) -> float:
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-scale), ROUND_HALF_UP
        )
    )


def t_two_sided_p_by_integration(t: float, df: float) -> float:
    """2 * P(T > |t|) via Simpson over the (smooth) t density."""
    t = abs(t)
    lognorm = (
        math.lgamma((df + 1) / 2.0)
        - math.lgamma(df / 2.0)
        - 0.5 * math.log(df * math.pi)
    )

    def dens(x: float) -> float:
        return math.exp(lognorm - (df + 1) / 2.0 * math.log1p(x * x / df))

    hi = t + 60.0  # density is numerically zero far before this
    n = 200_000
    h = (hi - t) / n
    s = dens(t) + dens(hi)
    for i in range(1, n):
        s += dens(t + i * h) * (4 if i % 2 else 2)
    return 2.0 * s * h / 3.0


def mw_python(pairs: list[tuple[float, int]]) -> tuple[float, float]:
    """Pure-Python Mann-Whitney (midranks via bisect), two-sided,
    continuity correction on — the pinned conventions."""
    n = len(pairs)
    svals = sorted(v for v, _ in pairs)

    def midrank(v: float) -> float:
        lo = bisect_left(svals, v)
        hi = bisect_right(svals, v)
        return (lo + hi - 1) / 2.0 + 1.0

    n1 = sum(1 for _, g in pairs if g == 0)
    n2 = n - n1
    r1 = sum(midrank(v) for v, g in pairs if g == 0)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    tie = sum(c**3 - c for c in Counter(svals).values())
    sig2 = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = max(abs(u1 - n1 * n2 / 2.0) - 0.5, 0.0) / math.sqrt(sig2)
    return u1, math.erfc(z / math.sqrt(2.0))


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
               var_samp(CASE WHEN user_id % 2 = 0 THEN value END) AS s0,
               count(CASE WHEN user_id % 2 <> 0 THEN value END) AS n1,
               avg(CASE WHEN user_id % 2 <> 0 THEN value END) AS m1,
               var_samp(CASE WHEN user_id % 2 <> 0 THEN value END) AS s1
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
    by_type: dict[str, list[tuple[float, int]]] = {}
    for et, v, g in raw:
        by_type.setdefault(et, []).append((float(v), int(g)))

    golden = []
    for et, n0, m0, s0, n1, m1, s1 in moments:
        # pooled t
        sp2 = ((n0 - 1) * s0 + (n1 - 1) * s1) / (n0 + n1 - 2)
        st_t = (m0 - m1) / math.sqrt(sp2 * (1.0 / n0 + 1.0 / n1))
        st_p = t_two_sided_p_by_integration(st_t, n0 + n1 - 2)
        # welch
        se0, se1 = s0 / n0, s1 / n1
        we_t = (m0 - m1) / math.sqrt(se0 + se1)
        we_df = (se0 + se1) ** 2 / (se0**2 / (n0 - 1) + se1**2 / (n1 - 1))
        we_p = t_two_sided_p_by_integration(we_t, we_df)
        mw_u, mw_p = mw_python(by_type[et])
        golden.append(
            (
                et,
                spark_round(st_t, 6),
                spark_round(st_p, 6),
                spark_round(we_t, 6),
                spark_round(we_p, 6),
                spark_round(mw_u, 1),
                spark_round(mw_p, 6),
            )
        )
    golden.sort()

    # --- production cross-check gate --------------------------------
    from clickhouse_learning_spark import get_spark
    from clickhouse_learning_spark.queries import QUERIES
    import clickhouse_learning_spark.queries_reference  # noqa: F401

    spark = get_spark(app_name="make_ttest_golden")
    rows = QUERIES["ch_ttest_dialect"](spark, sf).collect()
    prod = sorted(
        (
            r.event_type,
            float(r.st_t),
            float(r.st_p),
            float(r.we_t),
            float(r.we_p),
            float(r.mw_u),
            float(r.mw_p),
        )
        for r in rows
    )
    if prod != golden:
        print("MISMATCH — refusing to write golden.")
        for g, p in zip(golden, prod):
            if g != p:
                print("  golden:    ", g)
                print("  production:", p)
        return 1

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "clickhouse_learning_spark",
        "golden_ttest.py",
    )
    with open(out, "w") as fh:
        fh.write(
            '"""Golden hypothesis-test rows for the sf0.01 grading corpus —\n'
            "generated by tools/make_ttest_golden.py from an INDEPENDENT\n"
            "chain (DuckDB moments + direct t-density tail integration +\n"
            "pure-Python midranks; none of the production incomplete-beta /\n"
            "numpy code), cross-checked row-exact against the production\n"
            "Spark query before writing (refuse-on-mismatch).\n"
            '"""\n\n'
            f"# corpus: {sf}; cohorts = user_id %% 2 per event_type\n"
            "# rows: (event_type, st_t, st_p, we_t, we_p, mw_u, mw_p)\n"
            "CH_TTEST = [\n"
        )
        for r in golden:
            fh.write(f"    {r!r},\n")
        fh.write("]\n")
    print(f"wrote {out}: {len(golden)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
