"""Roaring bitmap state representation (reference groupBitmap form,
dwm.mainpage_stat_mv_dis.sql:134-139): codec roundtrip, set algebra,
equality vs the default array representation, wide-table neutral states,
and the state-size advantage that motivates the format."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions import metrics as M
from clickhouse_learning_spark.functions import roaring as R
from clickhouse_learning_spark.functions.metrics import MetricSpec
from clickhouse_learning_spark.mv.engine import MaterializedView
from clickhouse_learning_spark.queries import _events
from clickhouse_learning_spark.schemas import load_table
from clickhouse_learning_spark.tables import Table
from tests.conftest import SF_SMOKE


# -- pure codec ----------------------------------------------------------------


def test_codec_roundtrip_sparse_and_dense():
    rng = np.random.default_rng(7)
    sparse = np.unique(rng.integers(0, 2**32, 5000))  # array containers
    dense = np.arange(100_000, 170_000)  # bitmap containers (>4096/container)
    mixed = np.unique(np.concatenate([sparse, dense]))
    for vals in (sparse, dense, mixed, np.array([], dtype=np.int64), np.array([0, 2**32 - 1])):
        b = R.serialize(vals)
        back = R.deserialize(b)
        assert np.array_equal(back, np.unique(vals).astype(np.uint32))
        assert R.cardinality(b) == np.unique(vals).size


def test_codec_rejects_out_of_range():
    with pytest.raises(ValueError, match="2\\^32"):
        R.serialize([-1])
    with pytest.raises(ValueError, match="2\\^32"):
        R.serialize([2**32])


def test_union_and_size_advantage():
    a = np.arange(0, 1_000_000)  # fully dense range
    b = np.arange(500_000, 1_500_000)
    u = R.union_bytes([R.serialize(a), R.serialize(b), None])
    assert R.cardinality(u) == 1_500_000
    # dense million-id set: roaring ~1 bit/value vs 8 B/value as long[]
    assert len(R.serialize(a)) < 1_000_000  # < 1 B/value (vs 8_000_000)


# -- Spark paths ---------------------------------------------------------------


def _funnel(spark, sf_dir, representation):
    ev = _events(spark, sf_dir)
    stage = lambda t: MetricSpec(
        f"{t}_bm", "bitmap", "uid", f"event_type = '{t}'", representation=representation
    )
    specs = [stage(t) for t in ("view", "click", "purchase")]
    bm = ev.groupBy("day").agg(*[s.partial() for s in specs])
    mod = R if representation == "roaring" else M
    s1 = F.col("view_bm")
    s2 = mod.bitmap_and(s1, F.col("click_bm"))
    s3 = mod.bitmap_and(s2, F.col("purchase_bm"))
    return (
        bm.select(
            "day",
            mod.bitmap_cardinality(s1).alias("stage_view"),
            mod.bitmap_cardinality(s2).alias("stage_click"),
            mod.bitmap_cardinality(s3).alias("stage_purchase"),
        )
        .orderBy("day")
    )


def test_roaring_funnel_equals_array_funnel(spark):
    got = _funnel(spark, SF_SMOKE, "roaring").collect()
    want = _funnel(spark, SF_SMOKE, "array").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_roaring_mv_merge_compact_equals_array(spark, tmp_path):
    """Full MV lifecycle on roaring states: per-batch materialize →
    append → merge_query, then compact() and re-query — equal to the
    array representation and to exact distinct counts throughout."""
    ev = _events(spark, SF_SMOKE)
    mvs = {}
    for rep in ("array", "roaring"):
        mv = MaterializedView(
            f"bm_{rep}",
            ("day",),
            (
                MetricSpec("uv", "bitmap", "uid", representation=rep),
                MetricSpec("cnt", "count", "1"),
            ),
            Table(str(tmp_path / rep), ("day",)),
        )
        # two disjoint batches exercise the merge path
        mv.append_batch(ev.filter("uid % 2 = 0"))
        mv.append_batch(ev.filter("uid % 2 = 1"))
        mvs[rep] = mv

    def result(mv):
        return {
            str(r["day"]): (r["uv"], r["cnt"])
            for r in mv.merge_query(spark, ["day"]).collect()
        }

    want = {
        str(r["day"]): (r["uv"], r["cnt"])
        for r in ev.groupBy("day")
        .agg(F.count_distinct("uid").alias("uv"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert result(mvs["roaring"]) == want
    assert result(mvs["array"]) == want

    mvs["roaring"].compact(spark)
    assert result(mvs["roaring"]) == want
    # compaction merged equal-key rows: one state row per day
    days = mvs["roaring"].storage.read(spark).count()
    assert days == len(want)


def test_roaring_neutral_in_wide_table(spark, tmp_path):
    """Multi-writer wide table with a roaring metric: the neutral fill is
    a typed NULL binary that merges away (docs/…md:822-828)."""
    ev = _events(spark, SF_SMOKE)
    mv = MaterializedView(
        "wide_roaring",
        ("day",),
        (
            MetricSpec("view_uv", "bitmap", "uid", "event_type = 'view'", representation="roaring"),
            MetricSpec("click_cnt", "sum", "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END"),
        ),
        Table(str(tmp_path / "wide"), ("day",)),
    )
    s1 = mv.materialize_batch(ev.filter("event_type = 'view'")).select(
        "day", "view_uv"
    )
    s2 = mv.materialize_batch(ev.filter("event_type = 'click'")).select(
        "day", "click_cnt"
    )
    wide = mv.union_merge(s1, s2)
    got = {
        str(r["day"]): (r["view_uv"], r["click_cnt"])
        for r in wide.groupBy("day")
        .agg(*[m.merged_finalized() for m in mv.metrics])
        .collect()
    }
    want = {
        str(r["day"]): (r["uv"], r["c"])
        for r in ev.groupBy("day")
        .agg(
            F.count_distinct(F.when(F.col("event_type") == "view", F.col("uid"))).alias("uv"),
            F.coalesce(F.sum(F.when(F.col("event_type") == "click", 1)), F.lit(0)).alias("c"),
        )
        .collect()
    }
    assert got == want


def test_roaring_state_smaller_than_array_at_density(spark, tmp_path):
    """The representation's reason to exist: at dense per-group
    cardinality the roaring state files are much smaller than long-array
    states (reference stores groupBitmap roaring for the same reason)."""
    big = spark.range(400_000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("uid")
    )
    paths = {}
    for rep in ("array", "roaring"):
        spec = MetricSpec("uv", "bitmap", "uid", representation=rep)
        out = str(tmp_path / f"sz_{rep}")
        big.groupBy("g").agg(spec.partial()).write.parquet(out)
        paths[rep] = out
    import os

    def du(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    # dense 100k-per-group sets: roaring ≈ 1-2 bit/uid, long array ≈ 8 B
    # (parquet encoding narrows the gap; 3× is conservative)
    assert du(paths["roaring"]) * 3 < du(paths["array"])


def test_codec_roundtrip_property():
    """Hypothesis: serialize∘deserialize is identity on arbitrary uint32
    sets; cardinality header always matches; union distributes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vals = st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=300)

    @settings(max_examples=200, deadline=None)
    @given(a=vals, b=vals)
    def check(a, b):
        sa, sb = R.serialize(a), R.serialize(b)
        assert np.array_equal(R.deserialize(sa), np.unique(np.asarray(a, dtype=np.int64)).astype(np.uint32))
        assert R.cardinality(sa) == len(set(a))
        u = R.union_bytes([sa, sb])
        assert set(R.deserialize(u).tolist()) == set(a) | set(b)

    check()


def test_portable_roundtrip_and_golden_bytes():
    """to_portable emits spec-exact no-run-form bytes (golden blob built
    by hand from RoaringFormatSpec) and from_portable inverts it for
    array, bitmap and mixed container layouts."""
    import struct

    import numpy as np

    from clickhouse_learning_spark.functions import roaring as RB

    # golden: {1, 5, 65536} → containers key0 {1,5}, key1 {0}
    blob = RB.to_portable(RB.serialize([1, 5, 65536]))
    expected = (
        struct.pack("<II", 12346, 2)            # cookie, 2 containers
        + struct.pack("<HH", 0, 1)              # key 0, card-1 = 1
        + struct.pack("<HH", 1, 0)              # key 1, card-1 = 0
        + struct.pack("<II", 24, 28)            # offsets: 8+8+8=24, +4
        + struct.pack("<HH", 1, 5)              # container 0 values
        + struct.pack("<H", 0)                  # container 1 values
    )
    assert blob == expected
    assert np.array_equal(
        RB.deserialize(RB.from_portable(blob)), np.array([1, 5, 65536])
    )

    # dense container (> 4096 values) → 8 KiB bitmap container
    dense = np.arange(0, 60000, 3, dtype=np.uint32)  # 20k values, key 0
    mixed = np.concatenate([dense, np.array([1 << 20], dtype=np.uint32)])
    blob2 = RB.to_portable(RB.serialize(mixed))
    # size field, container count, bitmap container length visible
    assert struct.unpack_from("<II", blob2)[0] == 12346
    assert len(blob2) == 8 + 2 * 4 + 2 * 4 + 8192 + 2
    assert np.array_equal(RB.deserialize(RB.from_portable(blob2)), mixed)

    # run-form decode: {10..20, 100} as one run container, hand-built
    run_blob = (
        struct.pack("<HH", 12347, 0)            # run cookie, n-1 = 0
        + bytes([0b1])                          # container 0 is a run
        + struct.pack("<HH", 0, 11)             # key 0, card-1 (12 vals)
        # size < 4 → NO offset header in the run form
        + struct.pack("<H", 2)                  # 2 runs
        + struct.pack("<HH", 10, 10)            # 10..20
        + struct.pack("<HH", 100, 0)            # 100
    )
    got = RB.deserialize(RB.from_portable(run_blob))
    assert np.array_equal(got, np.concatenate([np.arange(10, 21), [100]]))


def test_portable_udf_roundtrip(spark):
    """Column-level export→import round-trip preserves the state and
    its cardinality."""
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.functions import roaring as RB

    df = spark.range(200).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") * 37 % 100_000).alias("uid"),
    )
    states = df.groupBy("g").agg(
        RB.roaring_from_array(F.collect_list("uid")).alias("st")
    )
    back = states.select(
        "g",
        RB.bitmap_cardinality(F.col("st")).alias("card"),
        RB.bitmap_cardinality(
            RB.roaring_from_portable(RB.roaring_to_portable(F.col("st")))
        ).alias("card_rt"),
    )
    rows = back.collect()
    assert rows and all(r.card == r.card_rt == 50 for r in rows)
