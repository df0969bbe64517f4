"""Automatic MV rewrite of raw-log SQL (mv/sql_rewrite.py).

Correctness bar: for every supported query shape the routed answer is
row-identical to ``spark.sql`` over the raw log, the routed plan reads
the state table (not the log), and every unsupported shape falls back
to the raw path — rewrite-or-fallback, never rewrite-or-fail.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.metrics import MetricSpec
from clickhouse_learning_spark.mv.engine import MaterializedView
from clickhouse_learning_spark.mv.mainpage import mainpage_mv, prepare_events
from clickhouse_learning_spark.mv.router import MetricRouter
from clickhouse_learning_spark.mv.sql_rewrite import SqlRewriter
from clickhouse_learning_spark.tables import Table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rewriter(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sqlrw")
    mv = mainpage_mv(str(d / "state"))
    ev = prepare_events(spark, SF)
    mv.append_batch(ev)
    router = MetricRouter(raw_source=lambda s: prepare_events(s, SF))
    router.register(mv)
    ev.createOrReplaceTempView("raw_events")
    return SqlRewriter(router, "raw_events")


ROUTED = {
    "if_sum_where_order": """
        SELECT day, segment,
               coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0) AS view_cnt,
               sum(CAST(value * 1000 AS BIGINT)) AS value_sum,
               count(*) AS event_cnt
        FROM raw_events WHERE segment = 'BUILDING'
        GROUP BY day, segment ORDER BY day""",
    "filter_where_combinator": """
        SELECT day, coalesce(sum(1) FILTER (WHERE event_type = 'click'), 0) AS click_cnt
        FROM raw_events GROUP BY day""",
    "coarser_grain_remerge": """
        SELECT segment, count(*) AS event_cnt FROM raw_events GROUP BY segment""",
}

FALLBACK = {
    # SQL NULL-on-empty vs MV 0 — must not rewrite
    "uncoalesced_if_sum": """
        SELECT day, sum(CASE WHEN event_type = 'view' THEN 1 END) AS view_cnt
        FROM raw_events GROUP BY day""",
    # filter on a non-dim column
    "raw_column_filter": """
        SELECT day, count(*) AS event_cnt FROM raw_events WHERE uid = 5 GROUP BY day""",
    # metric not in the MV (uniq_exact vs the MV's HLL uniq)
    "unknown_metric": """
        SELECT day, count(DISTINCT uid) AS uv FROM raw_events GROUP BY day""",
    # grouping column outside MV dims
    "unknown_dim": """
        SELECT event_type, count(*) AS cnt FROM raw_events GROUP BY event_type""",
}


@pytest.mark.parametrize("name", list(ROUTED))
def test_routed_matches_raw(spark, rewriter, name):
    q = ROUTED[name]
    assert rewriter.explain_route(spark, q).startswith("mv:")
    got = sorted(map(tuple, rewriter.sql(spark, q).collect()))
    want = sorted(map(tuple, spark.sql(q).collect()))
    assert got == want


@pytest.mark.parametrize("name", list(FALLBACK))
def test_fallback_matches_raw(spark, rewriter, name):
    q = FALLBACK[name]
    assert rewriter.explain_route(spark, q).startswith("raw:")
    got = sorted(map(tuple, rewriter.sql(spark, q).collect()))
    want = sorted(map(tuple, spark.sql(q).collect()))
    assert got == want


def test_routed_plan_reads_state_table_not_log(spark, rewriter):
    df = rewriter.sql(spark, ROUTED["if_sum_where_order"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    mv = rewriter.router.views[0]
    assert mv.storage.path in plan
    assert "events.parquet" not in plan


def test_approx_uv_routes_and_is_close(spark, rewriter):
    """approx_count_distinct routes onto the HLL metric; both sides are
    approximate (HLL++ vs Datasketches) so assert ε-closeness."""
    q = """
        SELECT day, approx_count_distinct(CASE WHEN event_type = 'view' THEN uid END) AS view_uv
        FROM raw_events GROUP BY day"""
    assert rewriter.explain_route(spark, q).startswith("mv:")
    got = {r["day"]: r["view_uv"] for r in rewriter.sql(spark, q).collect()}
    exact = {
        r["day"]: r["uv"]
        for r in spark.sql(
            "SELECT day, count(DISTINCT CASE WHEN event_type = 'view' THEN uid END) AS uv "
            "FROM raw_events GROUP BY day"
        ).collect()
    }
    assert set(got) == set(exact)
    for day, uv in exact.items():
        assert got[day] == pytest.approx(uv, rel=0.05, abs=2)


def test_argmax_routes_via_max_by(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("a", 3, 20), ("b", 4, 5)],
        "g string, v long, o long",
    )
    mv = MaterializedView(
        "argmv",
        dims=("g",),
        metrics=(MetricSpec("best_v", "argmax", "v", order_by="o"),),
        storage=Table(str(tmp_path / "state"), partition_by=()),
    )
    mv.append_batch(df)
    router = MetricRouter(raw_source=lambda s: df)
    router.register(mv)
    rw = SqlRewriter(router, "argsrc")
    q = "SELECT g, max_by(v, o) AS best_v FROM argsrc GROUP BY g"
    assert rw.explain_route(spark, q).startswith("mv:")
    got = sorted(map(tuple, rw.sql(spark, q).collect()))
    df.createOrReplaceTempView("argsrc")
    assert got == sorted(map(tuple, spark.sql(q).collect()))


def test_coarsest_eligible_mv_wins(spark, tmp_path):
    df = spark.createDataFrame(
        [("2024-01-01", "x", 1), ("2024-01-01", "y", 2), ("2024-01-02", "x", 3)],
        "day string, k string, v long",
    )
    fine = MaterializedView(
        "fine",
        dims=("day", "k"),
        metrics=(MetricSpec("s", "sum", "v"),),
        storage=Table(str(tmp_path / "fine"), partition_by=()),
    )
    coarse = MaterializedView(
        "coarse",
        dims=("day",),
        metrics=(MetricSpec("s", "sum", "v"),),
        storage=Table(str(tmp_path / "coarse"), partition_by=()),
    )
    fine.append_batch(df)
    coarse.append_batch(df)
    router = MetricRouter(raw_source=lambda s: df)
    router.register(fine)
    router.register(coarse)
    rw = SqlRewriter(router, "src")
    assert rw.explain_route(spark, "SELECT day, sum(v) AS s FROM src GROUP BY day") == "mv:coarse"
    assert (
        rw.explain_route(spark, "SELECT day, k, sum(v) AS s FROM src GROUP BY day, k")
        == "mv:fine"
    )


def test_run_clickhouse_routes_pasted_query_to_mv(spark):
    """A query written in ClickHouse SQL against the RAW log routes to
    the MV state table (dialect translate → SqlRewriter), matching the
    direct raw aggregation exactly — the reference's implicit
    query-the-MV usage for a user who never leaves ClickHouse syntax."""
    import tempfile

    from clickhouse_learning_spark.mv.mainpage import mainpage_mv, prepare_events
    from clickhouse_learning_spark.mv.router import MetricRouter
    from clickhouse_learning_spark.mv.sql_rewrite import SqlRewriter, run_clickhouse
    from tests.conftest import SF_SMOKE

    mv = mainpage_mv(tempfile.mkdtemp(prefix="runch_") + "/state")
    mv.append_batch(prepare_events(spark, SF_SMOKE))
    router = MetricRouter(raw_source=lambda s: prepare_events(s, SF_SMOKE))
    router.register(mv)
    rw = SqlRewriter(router, "raw_events")

    ch = """
        SELECT day,
               sumIf(1, event_type = 'view') AS view_cnt,
               count(*) AS event_cnt
        FROM raw_events GROUP BY day
    """
    from clickhouse_learning_spark.functions.dialect import translate

    assert rw.explain_route(spark, translate(ch)).startswith("mv:")
    got = {
        str(r["day"]): (r["view_cnt"], r["event_cnt"])
        for r in run_clickhouse(spark, ch, rewriter=rw).collect()
    }
    direct = prepare_events(spark, SF_SMOKE).groupBy("day").agg(
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "view", 1)), F.lit(0)
        ).alias("view_cnt"),
        F.count(F.lit(1)).alias("event_cnt"),
    )
    want = {
        str(r["day"]): (r["view_cnt"], r["event_cnt"]) for r in direct.collect()
    }
    assert got == want


def test_ch_mv_routed_dialect_plan_drops_raw_scan(spark):
    """The graded routing query (queries_reference.ch_mv_routed_dialect)
    must answer from the MV state table: the physical plan scans the
    routed state directory and the raw events parquet is GONE."""
    import io
    from contextlib import redirect_stdout

    import clickhouse_learning_spark.queries_reference  # noqa: F401
    from clickhouse_learning_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    df = QUERIES["ch_mv_routed_dialect"](spark, SF_SMOKE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "ch_mv_routed_" in plan, plan
    assert "events.parquet" not in plan, plan
