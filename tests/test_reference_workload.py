"""Reference-workload invariants (the generator rules the reference's
own informal tests rely on, SURVEY §5.3 / FIXTURES.md §A)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_learning_spark.workload import reference_star as R

from .conftest import SF_SMOKE


def test_funnel_monotonicity(spark, tmp_path):
    """uv(show) ≥ uv(click) ≥ uv(a) ≥ uv(b) ≥ uv(c) ≥ uv(d) per day
    (docs/…md:1226-1233)."""
    out = R.funnel_query(spark, SF_SMOKE, str(tmp_path / "state")).collect()
    assert out
    for r in out:
        seq = [r["stage_show"], r["stage_click"], r["stage_a"], r["stage_b"], r["stage_c"], r["stage_d"]]
        assert seq == sorted(seq, reverse=True), r
        assert seq[0] > 0


def test_action_e_equals_price_times_d(spark):
    """action_e_sum = price × action_d_sum exactly (make_user_action_002
    .py:78) — the join-check invariant."""
    a2 = R.build_action_002(spark, SF_SMOKE)
    item = R.build_item_dim(spark, SF_SMOKE).select("item_id", F.col("price").alias("p2"))
    chk = a2.join(item, "item_id", "left").filter(
        F.col("action_e_sum") != F.coalesce(F.col("p2") * F.col("action_d_sum"), F.lit(0))
    )
    assert chk.count() == 0


def test_funnel_b_requires_a50_c_requires_b20(spark):
    a2 = R.build_action_002(spark, SF_SMOKE)
    assert a2.filter((F.col("action_b_cnt") > 0) & (F.col("action_a_cnt") < 50)).count() == 0
    assert a2.filter((F.col("action_c_cnt") > 0) & (F.col("action_b_cnt") < 20)).count() == 0


def test_clicker_cohort_skew(spark):
    """uid%13==0 users click on every event (the generator's heavy
    cohort); other users only via the show_cnt≥80 path."""
    a1 = R.build_action_001(spark, SF_SMOKE)
    cohort = a1.filter(F.col("uid") % 13 == 0)
    others = a1.filter((F.col("uid") % 13 != 0) & (F.col("show_cnt") < 80))
    assert others.filter(F.col("click_cnt") > 0).count() == 0
    assert cohort.count() > 0


def test_wide_table_rows_scanned_advantage(spark, tmp_path):
    """The reference's headline IO ratio (BASELINE.md): the state table
    holds far fewer rows than the raw logs it answers for."""
    mv = R.materialize_wide(spark, SF_SMOKE, str(tmp_path / "state"))
    state_rows = mv.storage.read(spark).count()
    raw_rows = R.build_action_001(spark, SF_SMOKE).count() + R.build_action_002(
        spark, SF_SMOKE
    ).count()
    assert state_rows * 5 < raw_rows, (state_rows, raw_rows)
