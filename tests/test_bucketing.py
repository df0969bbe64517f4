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


def test_zorder_clustering_prunes_both_dimensions(spark, tmp_path):
    """Z-order sort key: file-level min/max ranges cover BOTH columns,
    so a selective filter on either dimension rules out most files —
    vs a plain 1-column sort where the second column's per-file range
    spans everything. Verified against the actual parquet footer
    statistics the scan pruner uses."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.functions.layout import zorder_key

    n = 200_000
    df = spark.range(n).select(
        (F.xxhash64("id") % 65536).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 65536).alias("b"),
    ).selectExpr("abs(a) % 65536 AS a", "abs(b) % 65536 AS b")

    def write(path, sort_cols):
        (
            df.repartition(1)
            .sortWithinPartitions(*sort_cols)
            .write.option("parquet.block.size", 64 * 1024)
            .parquet(str(path))
        )

    write(tmp_path / "xsort", [F.col("a")])
    write(tmp_path / "zsort", [zorder_key(F.col("a"), F.col("b"))])

    def candidate_rowgroups(path, col, probe):
        total = cand = 0
        for f in glob.glob(str(path) + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = md.schema.to_arrow_schema().names
            ci = names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                total += 1
                if st.min <= probe <= st.max:
                    cand += 1
        return cand, total

    probe = 12345
    zc, zt = candidate_rowgroups(tmp_path / "zsort", "b", probe)
    xc, xt = candidate_rowgroups(tmp_path / "xsort", "b", probe)
    assert zt == xt and zt >= 8  # same data, several row groups
    # plain a-sort leaves b unsorted: essentially every row group is a
    # candidate; the z-order layout prunes a solid majority
    assert xc >= 0.9 * xt
    assert zc <= 0.6 * zt
    # and the a-dimension still prunes under z-order (not sacrificed)
    za, _ = candidate_rowgroups(tmp_path / "zsort", "a", probe)
    assert za <= 0.6 * zt
