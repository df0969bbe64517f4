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


def test_salted_agg_law_equals_single_phase(spark):
    """salted_agg(keys, metrics) must equal the plain single-phase
    finalized aggregate for every algebraic metric kind used (sum,
    count, min, max, avg) — the partial/merge law under an arbitrary
    salt split."""
    from clickhouse_learning_spark.functions.metrics import MetricSpec
    from clickhouse_learning_spark.operators.skew import salted_agg

    ev = load_table(spark, SF_SMOKE, "events").select(
        (F.col("user_id") % 7).alias("g"),
        F.col("event_id").alias("v"),
        F.col("value"),
    )
    metrics = (
        MetricSpec("v_sum", "sum", "v"),
        MetricSpec("n", "count", "1"),
        MetricSpec("v_min", "min", "v"),
        MetricSpec("v_max", "max", "v"),
        MetricSpec("val_avg", "avg", "value"),
    )
    plain = ev.groupBy("g").agg(*[m.finalize(m.partial()) for m in metrics])
    salted = salted_agg(ev, "g", metrics, n_salts=8)

    def norm(df):
        return {
            r["g"]: (
                r["v_sum"], r["n"], r["v_min"], r["v_max"],
                round(r["val_avg"], 9),
            )
            for r in df.collect()
        }

    assert norm(plain) == norm(salted)


def test_salted_apply_agg_equals_plain_apply(spark):
    """salted_apply_agg partial/merge around applyInPandas must equal
    the single-group applyInPandas result (the path with no map-side
    combine — the genuinely skew-broken shape)."""
    import pandas as pd

    from clickhouse_learning_spark.operators.skew import salted_apply_agg

    ev = load_table(spark, SF_SMOKE, "events").select(
        (F.col("user_id") % 5).alias("g"), F.col("event_id").alias("v")
    )

    def plain_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "g": [pdf["g"].iloc[0]],
                "n": [len(pdf)],
                "mean_v": [float(pdf["v"].mean())],
            }
        )

    def partial_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "g": [pdf["g"].iloc[0]],
                "pn": [len(pdf)],
                "psum": [float(pdf["v"].sum())],
            }
        )

    def merge_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf["pn"].sum())
        return pd.DataFrame(
            {
                "g": [pdf["g"].iloc[0]],
                "n": [n],
                "mean_v": [float(pdf["psum"].sum()) / max(n, 1)],
            }
        )

    plain = ev.groupBy("g").applyInPandas(
        plain_stats, schema="g long, n long, mean_v double"
    )
    salted = salted_apply_agg(
        ev,
        "g",
        partial_stats,
        "g long, pn long, psum double",
        merge_stats,
        "g long, n long, mean_v double",
        n_salts=8,
    )
    a = {r["g"]: (r["n"], round(r["mean_v"], 9)) for r in plain.collect()}
    b = {r["g"]: (r["n"], round(r["mean_v"], 9)) for r in salted.collect()}
    assert a == b
