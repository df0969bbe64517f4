"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (MV materialize → state
table → merge/finalize query — the reference's
dwm.mainpage_stat_mv_dis.sql:28-70 end-to-end) on sf0.001.

``queries()`` / ``oracle_sql()`` cover SURVEY.md §2's operator inventory;
every SQL-expressible operator has a DuckDB oracle with identically
aliased columns. Approximate/sketch-based and streaming operators omit
the oracle (rows-only check) — their correctness is asserted with
ε-bounds and dual-path tests in tests/.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import clickhouse_learning_spark.queries_pipeline  # noqa: F401  (registers pipeline queries)
import clickhouse_learning_spark.queries_reference  # noqa: F401  (registers reference-workload queries)
import clickhouse_learning_spark.queries_streaming  # noqa: F401  (registers streaming queries)
import clickhouse_learning_spark.queries_tpch  # noqa: F401  (registers multi-join analytics queries)
from clickhouse_learning_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ingest events → MV partial states → merged+finalized
    day/segment rollup (reference dwm…sql:60-70)."""
    from clickhouse_learning_spark.mv.mainpage import mainpage_mv, prepare_events

    sf_dir = "/root/testdata/sf0.001"
    ev = prepare_events(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="mainpage_stat_")
    mv = mainpage_mv(d + "/state")
    mv.append_batch(ev)
    return mv.merge_query(
        spark,
        ["day", "segment"],
        ["view_uv", "view_cnt", "click_uv", "click_cnt", "value_sum", "value_median", "event_cnt"],
    ).orderBy("day", "segment")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
