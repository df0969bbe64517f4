"""Dictionary enrichment (J5/D3) and state-table schema evolution (D5/D6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.dictionary import Dictionary
from clickhouse_learning_spark.functions.metrics import MetricSpec
from clickhouse_learning_spark.mv.mainpage import mainpage_mv, prepare_events
from clickhouse_learning_spark.schemas import load_table

from .conftest import SF_SMOKE


def _user_dict(spark):
    return Dictionary(
        load_fn=lambda: load_table(spark, SF_SMOKE, "customer").select(
            F.col("c_custkey").alias("uid"), "c_mktsegment", "c_acctbal"
        ),
        key="uid",
    )


def test_dict_get_equals_broadcast_join(spark):
    """The reference's own validation: dictGet and JOIN produce identical
    results (docs/物化视图的实战经验分享.md:663-747)."""
    d = _user_dict(spark)
    ev = load_table(spark, SF_SMOKE, "events").withColumnRenamed("user_id", "uid")

    via_join = (
        d.enrich(ev, ["c_mktsegment"], fact_key="uid")
        .groupBy(F.coalesce("c_mktsegment", F.lit("?")).alias("seg"))
        .agg(F.count_distinct("uid").alias("uv"))
    )
    via_dict_get = (
        ev.withColumn("seg", F.coalesce(d.dict_get(spark, "c_mktsegment", F.col("uid")), F.lit("?")))
        .groupBy("seg")
        .agg(F.count_distinct("uid").alias("uv"))
    )
    a = {r["seg"]: r["uv"] for r in via_join.collect()}
    b = {r["seg"]: r["uv"] for r in via_dict_get.collect()}
    assert a == b and a


def test_dictionary_declared_defaults_on_missing_key(spark):
    """ClickHouse attribute DEFAULT semantics (dim.dict_user_dim.sql:2-12):
    a key absent from the dictionary yields the declared default through
    both access paths; attributes without a declared default keep NULL."""
    d = Dictionary(
        load_fn=lambda: load_table(spark, SF_SMOKE, "customer").select(
            F.col("c_custkey").alias("uid"), "c_mktsegment", "c_acctbal"
        ),
        key="uid",
        defaults={"c_mktsegment": ""},
    )
    missing = d.df().agg(F.max("uid")).collect()[0][0] + 10_000
    probe = spark.range(1).select(F.lit(missing).alias("uid"))

    via_join = d.enrich(probe, ["c_mktsegment", "c_acctbal"], fact_key="uid")
    row = via_join.collect()[0]
    assert row["c_mktsegment"] == ""  # declared default
    assert row["c_acctbal"] is None  # no declared default → NULL

    got = probe.select(
        d.dict_get(spark, "c_mktsegment", F.col("uid")).alias("seg")
    ).collect()[0]
    assert got["seg"] == ""

    # a present key is untouched by the default fill
    some = d.df().select("uid", "c_mktsegment").limit(1).collect()[0]
    hit = d.enrich(
        spark.range(1).select(F.lit(some["uid"]).alias("uid")),
        ["c_mktsegment"],
        fact_key="uid",
    ).collect()[0]
    assert hit["c_mktsegment"] == some["c_mktsegment"]


def test_dictionary_lifetime_refresh(spark):
    calls = []

    def loader():
        calls.append(1)
        return load_table(spark, SF_SMOKE, "customer").select(
            F.col("c_custkey").alias("uid"), "c_mktsegment"
        )

    d = Dictionary(load_fn=loader, key="uid", lifetime_s=0.0)  # always stale
    d.df()
    d.df()
    assert len(calls) == 2  # reloaded past LIFETIME
    d.lifetime_s = 3600
    d.refresh()
    n = len(calls)
    d.df()
    assert len(calls) == n  # fresh → no reload


def test_add_metric_neutral_backfill(spark, tmp_path):
    """ALTER ADD COLUMN metric (D6): batches written before the new
    metric existed read as NULL states and contribute the neutral
    element — totals over old+new batches stay correct."""
    ev = prepare_events(spark, SF_SMOKE)
    b1 = ev.filter("event_id % 2 = 0")
    b2 = ev.filter("event_id % 2 = 1")

    mv = mainpage_mv(str(tmp_path / "state"))
    mv.append_batch(b1)

    mv2 = mv.with_metric(MetricSpec("error_cnt", "sum", "1", "event_type = 'error'"))
    mv2.append_batch(b2)

    got = {
        str(r["day"]): (r["event_cnt"], r["error_cnt"])
        for r in mv2.merge_query(spark, ["day"], ["event_cnt", "error_cnt"]).collect()
    }
    want = {
        str(r["day"]): (r["total"], r["err"])
        for r in ev.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("total"),
            # only b2's errors are counted — b1 predates the metric
            F.coalesce(
                F.sum(F.when((F.col("event_type") == "error") & (F.col("event_id") % 2 == 1), 1)),
                F.lit(0),
            ).alias("err"),
        )
        .collect()
    }
    assert got == want


def test_add_dimension_unknown_group(spark, tmp_path):
    """ALTER ADD dimension (D5): old state rows group under NULL for the
    new dim; new batches aggregate at the finer grain."""
    ev = prepare_events(spark, SF_SMOKE)
    b1 = ev.filter("event_id % 2 = 0")
    b2 = ev.filter("event_id % 2 = 1")

    mv = mainpage_mv(str(tmp_path / "state"))
    mv.append_batch(b1)
    mv2 = mv.with_dimension("event_type")
    mv2.append_batch(b2)

    out = mv2.merge_query(spark, ["event_type"], ["event_cnt"]).collect()
    by_type = {r["event_type"]: r["event_cnt"] for r in out}
    assert by_type[None] == b1.count()  # pre-evolution history
    assert sum(v for k, v in by_type.items() if k is not None) == b2.count()


def test_parts_metadata_scan(spark, tmp_path):
    """system.parts analog (SURVEY S8; data_rebalance.py:116-205):
    file-level introspection via input_file_name — rows per physical
    file per partition, the reconciliation input the rebalancer uses."""
    mv = mainpage_mv(str(tmp_path / "state"))
    ev = prepare_events(spark, SF_SMOKE)
    mv.append_batch(ev.filter("event_id % 2 = 0"))
    mv.append_batch(ev.filter("event_id % 2 = 1"))
    parts = (
        mv.storage.read(spark)
        .select("day", F.input_file_name().alias("part"))
        .groupBy("day", "part")
        .agg(F.count(F.lit(1)).alias("rows"))
    )
    rows = parts.collect()
    assert rows and all(r["rows"] > 0 for r in rows)
    per_day = parts.groupBy("day").agg(F.count_distinct("part").alias("n_parts")).collect()
    assert all(r["n_parts"] >= 2 for r in per_day)  # two insert batches → ≥2 parts
