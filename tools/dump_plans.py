"""Dump .explain('formatted') for registered queries to plans/<tag>/.

    python tools/dump_plans.py <tag> [suffix] [name ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
With no names, dumps every registered query. Plan-only — builds the
DataFrame at $SPARK_GRAFT_ORACLE_SF (default sf0.01) and prints the
formatted physical plan without executing it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r10"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

    import __spark_entry__ as m
    from clickhouse_learning_spark import get_spark

    spark = get_spark(
        app_name="dump_plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = m.queries()
    if not names:
        names = list(qs)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"SKIP unknown {name}")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = qs[name](spark, sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            plan = f"ERROR building plan: {e}\n"
            print(f"ERR   {name}: {e}")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
