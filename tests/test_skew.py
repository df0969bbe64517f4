from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_learning_spark.operators.skew import salted_join
from clickhouse_learning_spark.schemas import load_table

from .conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    ev = load_table(spark, SF_SMOKE, "events").withColumnRenamed("user_id", "uid")
    dim = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("uid"), "c_mktsegment"
    )
    plain = (
        ev.join(dim, "uid")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
    )
    salted = (
        salted_join(ev, dim, "uid", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
    )
    a = {r["c_mktsegment"]: (r["n"], r["s"]) for r in plain.collect()}
    b = {r["c_mktsegment"]: (r["n"], r["s"]) for r in salted.collect()}
    assert a == b


def test_salted_left_join_preserves_unmatched(spark):
    ev = load_table(spark, SF_SMOKE, "events").withColumnRenamed("user_id", "uid")
    dim = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(F.col("c_custkey").alias("uid"), "c_mktsegment")
    )
    plain = ev.join(dim, "uid", "left")
    salted = salted_join(ev, dim, "uid", n_salts=8, how="left")
    assert salted.count() == plain.count() == ev.count()
    assert (
        salted.filter(F.col("c_mktsegment").isNull()).count()
        == plain.filter(F.col("c_mktsegment").isNull()).count()
    )
