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


def test_targeted_salted_join_equals_plain_join(spark):
    from clickhouse_learning_spark.operators.skew import targeted_salted_join

    ev = load_table(spark, SF_SMOKE, "events").withColumnRenamed("user_id", "uid")
    dim = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("uid"), "c_mktsegment"
    )
    plain = (
        ev.join(dim, "uid")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
    )
    # explicit hot keys
    hot = [r.uid for r in ev.groupBy("uid").count().orderBy(F.desc("count")).limit(5).collect()]
    salted = (
        targeted_salted_join(ev, dim, "uid", n_salts=8, hot_keys=hot)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
    )
    a = {r["c_mktsegment"]: (r["n"], r["s"]) for r in plain.collect()}
    b = {r["c_mktsegment"]: (r["n"], r["s"]) for r in salted.collect()}
    assert a == b


def test_targeted_salted_left_join_preserves_unmatched(spark):
    from clickhouse_learning_spark.operators.skew import targeted_salted_join

    ev = load_table(spark, SF_SMOKE, "events").withColumnRenamed("user_id", "uid")
    dim = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(F.col("c_custkey").alias("uid"), "c_mktsegment")
    )
    plain = ev.join(dim, "uid", "left")
    salted = targeted_salted_join(
        ev, dim, "uid", n_salts=8, how="left", hot_keys=[1, 2, 3]
    )
    assert salted.count() == plain.count() == ev.count()
    assert (
        salted.filter(F.col("c_mktsegment").isNull()).count()
        == plain.filter(F.col("c_mktsegment").isNull()).count()
    )


def test_detect_hot_keys_finds_planted_skew(spark):
    from clickhouse_learning_spark.operators.skew import detect_hot_keys

    # half the traffic on uid 777, rest uniform over 100k keys
    df = spark.range(200_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(777))
        .otherwise(F.col("id") % 100_000)
        .alias("uid")
    )
    hot = detect_hot_keys(df, "uid", sample_fraction=0.05, min_sampled_count=50)
    assert hot == [777]


def test_targeted_salted_join_no_hot_keys_falls_back(spark):
    from clickhouse_learning_spark.operators.skew import targeted_salted_join

    ev = load_table(spark, SF_SMOKE, "events").withColumnRenamed("user_id", "uid")
    dim = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("uid"), "c_mktsegment"
    )
    out = targeted_salted_join(ev, dim, "uid", hot_keys=[])
    assert out.count() == ev.join(dim, "uid").count()
    assert "__salt" not in out.columns
