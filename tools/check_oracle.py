"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 (or $SPARK_GRAFT_SF_DIR) and
compares against ``oracle_sql()`` via DuckDB: row count, column names,
and an order-insensitive multiset of normalized values (floats rounded;
dates/timestamps stringified). Usage:

    python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def non_atomic_columns(schema) -> list[str]:
    """Graded-output SHAPE contract (VERDICT r7): the driver's pandas
    canonicalizer sorts every output column with ``sort_values``; list/
    dict/struct cells are unhashable there, so a registered query whose
    output schema contains Array/Map/Struct columns errors in the
    harness BEFORE any comparison (native_typed_roundtrip, r7). The
    local gate must therefore be at least as strict: reject non-atomic
    top-level columns. Pure schema walk — no execution."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style tolerance: round to 6 significant-ish decimals
        r = round(v, 6)
        # Sign-faithful zero: the driver's value hash sees the raw sign
        # bit, so -0.0 must NOT collapse into +0.0 here (Python == says
        # -0.0 == 0.0, which hid the r5/r6 nb_quality_scores red from
        # this local gate two rounds running — VERDICT_r6).
        if r == 0.0 and math.copysign(1.0, r) < 0:
            return "-0.0"
        return r
    if isinstance(v, (dt.datetime, dt.date)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # None-safe sort key: rows with NULL cells must still compare
    # (sort by (is-null, stringified value) per cell)
    def key(row):
        return tuple((v is None, str(v)) for v in row)

    out = sorted(
        (tuple(norm_cell(r[i]) for i in order) for r in rows), key=key
    )
    return [cols[i] for i in order], out


def main(only: list[str]) -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from clickhouse_learning_spark import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = only or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            bad = non_atomic_columns(df.schema)
            if bad:
                failures.append(name)
                print(
                    f"FAIL  {name}: non-atomic graded columns {bad} — the "
                    "driver's canonicalizer cannot sort list/struct cells "
                    "(serialize with concat_ws/to_json for grading)"
                )
                continue
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) — no oracle")
            if not srows:
                failures.append(name)
                print(f"FAIL  {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            ok = False
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
        elif len(srows) != len(drows):
            ok = False
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
        else:
            _, ns = norm_rows(scols, srows)
            _, ndk = norm_rows(dcols, drows)
            if ns != ndk:
                ok = False
                diff = [(a, b) for a, b in zip(ns, ndk) if a != b][:5]
                print(f"FAIL  {name}: value mismatch; first diffs: {diff}")
        if ok:
            print(f"OK    {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
