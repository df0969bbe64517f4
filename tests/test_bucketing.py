"""Bucketed co-located joins (SURVEY §1.3 / the guide's shuffle
discipline): two tables bucketed on the join key join WITHOUT a shuffle
exchange — the Spark analog of co-locating by shard key."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.schemas import load_table

from .conftest import SF_SMOKE


@pytest.fixture()
def warehouse(spark):
    yield spark
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(warehouse, tmp_path):
    spark = warehouse
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    # external bucketed tables at explicit paths (warehouse.dir is a
    # static conf — cannot be repointed per-test)
    (
        orders.write.mode("overwrite")
        .option("path", str(tmp_path / "b_orders"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .option("path", str(tmp_path / "b_lineitem"))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain(mode="formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        # and it actually computes
        n = j.count()
        assert n == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
