"""Print the optimized plan of any registered driver query.

    python tools/explain.py <query_name> [formatted|extended|codegen|cost]

Plan-inspection entry point for auditing pushdown/broadcast/partial-agg
shapes (the properties tests/test_plans.py asserts).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        import __spark_entry__ as m

        print("usage: python tools/explain.py <query_name> [mode]\n\nqueries:")
        for name in sorted(m.queries()):
            print(" ", name)
        return 1
    name = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "formatted"
    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

    import __spark_entry__ as m
    from clickhouse_learning_spark import get_spark

    spark = get_spark(app_name="explain", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = m.queries()
    if name not in qs:
        print(f"unknown query {name!r}; run with no args to list")
        return 1
    qs[name](spark, sf).explain(mode=mode)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
