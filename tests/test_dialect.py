"""ClickHouse-dialect shim (functions/dialect.py): the reference's own
query shapes, pasted in ClickHouse SQL, translated and executed against
this engine — results compared to the native DataFrame formulations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.dialect import translate
from clickhouse_learning_spark.workload import reference_star as R
from tests.conftest import SF_SMOKE


def test_translate_scalars_and_combinators():
    assert translate("toDate(second)") == "to_date(second)"
    assert translate("toStartOfHour(ts)") == "date_trunc('HOUR', ts)"
    assert translate("toUInt64(t1.uid)") == "CAST(t1.uid AS BIGINT)"
    assert (
        translate("sumIf(show_cnt, show_cnt > 0)")
        == "coalesce(sum(CASE WHEN show_cnt > 0 THEN show_cnt END), 0)"
    )
    assert (
        translate("uniqCombinedIf(uid, click_cnt>0)")
        == "approx_count_distinct(CASE WHEN click_cnt>0 THEN uid END)"
    )
    # nested translation inside arguments
    assert (
        translate("uniqCombined(toUInt64(uid))")
        == "approx_count_distinct(CAST(uid AS BIGINT))"
    )
    # multi-arg uniq hashes the tuple
    assert (
        translate("uniqCombined(uid, platform)")
        == "approx_count_distinct(struct(uid, platform))"
    )
    assert (
        translate("multiIf(a > 1, 'x', b > 2, 'y', 'z')")
        == "CASE WHEN a > 1 THEN 'x' WHEN b > 2 THEN 'y' ELSE 'z' END"
    )
    assert translate("arrayJoin(tags)") == "explode(tags)"
    # unknown functions and string literals pass through untouched
    assert (
        translate("concat('toDate(x)', lower(name))")
        == "concat('toDate(x)', lower(name))"
    )


def test_translate_rejects_unregistered_dictionary():
    with pytest.raises(ValueError, match="not registered"):
        translate("dictGet('dim.user', 'gender', toUInt64(uid))")


def test_translate_points_behavioral_aggregates_at_engine_paths():
    """As of r5 the whole behavioral surface translates: windowFunnel
    (base + strict modes) and the .*-separated sequenceMatch/Count
    grammar as JVM fold expressions; full-grammar sequence patterns
    (strict adjacency, (?t…) guards, '.') as the seqmatch.py
    grouped-agg UDF (test_seqmatch.py). retention is order-free and
    translates to conditional-max products — see
    test_translate_retention_executes."""
    assert "aggregate(" in translate(
        "windowFunnel(3600)(ts, etype = 'view', etype = 'click')"
    )
    assert "aggregate(" in translate(
        "sequenceMatch('(?1).*(?2)')(ts, a = 1, b = 1)"
    )
    assert "ch_seq_match_" in translate(
        "sequenceMatch('(?1)(?2)')(ts, a = 1, b = 1)"
    )
    # time-guard patterns route to the grouped-agg UDF as well
    # (they need backtracking the greedy fold can't express)
    assert "ch_seq_count_" in translate(
        "sequenceCount('(?1)(?t<=10)(?2)')(ts, a = 1, b = 1)"
    )


def test_translate_retention_executes(spark):
    """retention(cond1..condN): r1 = cond1 ever held in the group;
    rk = cond1 AND condk (independently, any rows) — matches
    functions.funnel.retention_flags semantics."""
    spark.createDataFrame(
        [
            (1, "2024-01-01"), (1, "2024-01-02"),          # d1, d2 → [1,1,0]
            (2, "2024-01-02"), (2, "2024-01-03"),          # no d1  → [0,0,0]
            (3, "2024-01-01"), (3, "2024-01-03"),          # d1, d3 → [1,0,1]
        ],
        "uid int, day string",
    ).createOrReplaceTempView("ch_ret")
    rows = spark.sql(
        translate(
            "SELECT uid, retention(day='2024-01-01', day='2024-01-02', "
            "day='2024-01-03') AS r FROM ch_ret GROUP BY uid"
        )
    ).collect()
    got = {r.uid: list(r.r) for r in rows}
    assert got == {1: [1, 1, 0], 2: [0, 0, 0], 3: [1, 0, 1]}


@pytest.fixture(scope="module")
def star_views(spark):
    a1 = R.build_action_001(spark, SF_SMOKE)
    user = R.build_user_dim(spark, SF_SMOKE).select("uid", "gender")
    a1.createOrReplaceTempView("ch_a1")
    user.createOrReplaceTempView("ch_user_dim")
    return a1, user


def test_dictget_query_matches_broadcast_join(spark, star_views):
    """The reference's dictGet UV query (dim.dict_user_dim.sql:24-27),
    verbatim shape, vs the broadcast-join formulation — the reference
    itself proves these equivalent (docs/…md:663-747)."""
    a1, user = star_views
    # the reference aliases the fact table and keys dictGet on t1.uid
    # (dim.dict_user_dim.sql:24-27) — required here too, else the
    # subquery's own uid column shadows the outer reference
    ch = """
        SELECT dictGet('dim.dict_user_dim', 'gender', toUInt64(t1.uid)) AS gender,
               uniqExact(t1.uid) AS uv
        FROM ch_a1 t1 GROUP BY gender
    """
    got = spark.sql(
        translate(ch, dictionaries={"dim.dict_user_dim": ("ch_user_dim", "uid")})
    )
    want = (
        a1.join(F.broadcast(user), "uid", "left")
        .groupBy("gender")
        .agg(F.count_distinct("uid").alias("uv"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_dictget_missing_key_returns_declared_default(spark, star_views):
    """ClickHouse dictGet on a missing key yields the attribute's
    declared default (dim.dict_user_dim.sql:2-12: ``platform String
    default ''``, ``age Int16 default -1``) — not NULL. The dialect
    registry carries the DDL defaults as a third tuple slot."""
    _, user = star_views
    dicts = {
        "dim.dict_user_dim": ("ch_user_dim", "uid", {"gender": "", "age": -1})
    }
    missing = user.agg(F.max("uid")).collect()[0][0] + 10_000
    sql = translate(
        f"SELECT dictGet('dim.dict_user_dim', 'gender', toUInt64({missing})) AS g",
        dictionaries=dicts,
    )
    assert "coalesce" in sql and "''" in sql
    assert spark.sql(sql).collect()[0]["g"] == ""
    # attribute without a declared default keeps NULL-on-miss — the
    # user_dim view has no 'age', so register a no-default attr instead
    sql2 = translate(
        f"SELECT dictGet('dim.dict_user_dim', 'gender', toUInt64({missing})) AS g",
        dictionaries={"dim.dict_user_dim": ("ch_user_dim", "uid")},
    )
    assert spark.sql(sql2).collect()[0]["g"] is None
    # present keys are unaffected by the coalesce wrapper
    present = user.select("uid", "gender").limit(1).collect()[0]
    sql3 = translate(
        f"SELECT dictGet('dim.dict_user_dim', 'gender', toUInt64({present['uid']})) AS g",
        dictionaries=dicts,
    )
    assert spark.sql(sql3).collect()[0]["g"] == present["gender"]


def test_state_merge_roundtrip_through_views(spark, star_views):
    """-State aggregation into a view, -Merge query over it (the
    dwm…sql:28-70 pipeline in pasted ClickHouse SQL): exact metrics
    match the direct query exactly; the HLL UV is within epsilon."""
    a1, _ = star_views
    states = spark.sql(
        translate(
            """
            SELECT day, hour,
                   uniqCombinedStateIf(uid, show_cnt > 0) AS shown_uv,
                   sumIf(show_cnt, show_cnt > 0)          AS shown_cnt,
                   groupBitmapStateIf(uid, click_cnt > 0) AS click_bm,
                   medianExactState(show_time)            AS st_med
            FROM ch_a1 GROUP BY day, hour
            """
        )
    )
    states.createOrReplaceTempView("ch_states")
    merged = spark.sql(
        translate(
            """
            SELECT day,
                   uniqCombinedMerge(shown_uv)                        AS shown_uv,
                   sum(shown_cnt)                                     AS shown_cnt,
                   bitmapCardinality(groupBitmapMergeState(click_bm)) AS click_uv,
                   medianExactMerge(st_med)                           AS st_median
            FROM ch_states GROUP BY day
            """
        )
    )
    got = {r["day"]: r for r in merged.collect()}
    direct = a1.groupBy("day").agg(
        F.count_distinct(F.when(F.col("show_cnt") > 0, F.col("uid"))).alias("uv"),
        F.coalesce(
            F.sum(F.when(F.col("show_cnt") > 0, F.col("show_cnt"))), F.lit(0)
        ).alias("cnt"),
        F.count_distinct(F.when(F.col("click_cnt") > 0, F.col("uid"))).alias(
            "click_uv"
        ),
        F.sort_array(F.collect_list("show_time")).alias("st_sorted"),
    )
    for r in direct.collect():
        g = got[r["day"]]
        assert g["shown_cnt"] == r["cnt"]
        assert g["click_uv"] == r["click_uv"]
        # ClickHouse medianExact = upper-middle element, no interpolation
        vals = r["st_sorted"]
        assert g["st_median"] == vals[len(vals) // 2]
        assert abs(g["shown_uv"] - r["uv"]) <= max(3, 0.05 * r["uv"])


def test_bitmap_funnel_in_dialect(spark, star_views):
    """Chained bitmapAnd funnel (dwm…sql:280-290 shape)."""
    a1, _ = star_views
    spark.sql(
        translate(
            """
            SELECT day,
                   groupBitmapStateIf(uid, show_cnt > 0)  AS s_bm,
                   groupBitmapStateIf(uid, click_cnt > 0) AS c_bm
            FROM ch_a1 GROUP BY day
            """
        )
    ).createOrReplaceTempView("ch_funnel_states")
    got = {
        r["day"]: (r["stage_show"], r["stage_click"])
        for r in spark.sql(
            translate(
                """
                SELECT day,
                       bitmapCardinality(groupBitmapMergeState(s_bm)) AS stage_show,
                       bitmapAndCardinality(groupBitmapMergeState(s_bm),
                                            groupBitmapMergeState(c_bm)) AS stage_click
                FROM ch_funnel_states GROUP BY day
                """
            )
        ).collect()
    }
    want = {
        r["day"]: (r["s"], r["sc"])
        for r in a1.groupBy("day")
        .agg(
            F.count_distinct(F.when(F.col("show_cnt") > 0, F.col("uid"))).alias("s"),
            F.count_distinct(
                F.when((F.col("show_cnt") > 0) & (F.col("click_cnt") > 0), F.col("uid"))
            ).alias("sc"),
        )
        .collect()
    }
    assert got == want


def test_translate_if_variants_and_casts(spark, star_views):
    a1, _ = star_views
    got = spark.sql(
        translate(
            """
            SELECT day,
                   minIf(show_time, show_cnt > 0)   AS min_st,
                   maxIf(show_time, show_cnt > 0)   AS max_st,
                   uniqExactIf(uid, click_cnt > 0)  AS click_uv,
                   toInt64(countIf(click_cnt > 0))  AS clicks
            FROM ch_a1 GROUP BY day
            """
        )
    )
    want = a1.groupBy("day").agg(
        F.min(F.when(F.col("show_cnt") > 0, F.col("show_time"))).alias("min_st"),
        F.max(F.when(F.col("show_cnt") > 0, F.col("show_time"))).alias("max_st"),
        F.count_distinct(F.when(F.col("click_cnt") > 0, F.col("uid"))).alias("click_uv"),
        F.count(F.when(F.col("click_cnt") > 0, 1)).alias("clicks"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_parameterized_quantile_family(spark, star_views):
    """ClickHouse name(params)(args) syntax: quantile/quantiles/
    quantileExact — executed and compared to ground truth."""
    a1, _ = star_views
    assert (
        translate("quantile(0.5)(x)") == "percentile(x, 0.5)"
    )
    assert (
        translate("quantiles(0.5, 0.9)(x)") == "percentile(x, array(0.5, 0.9))"
    )
    rows = spark.sql(
        translate(
            """
            SELECT day,
                   quantile(0.5)(show_time)          AS st_p50,
                   quantiles(0.25, 0.75)(show_time)  AS st_iqr,
                   quantileExact(0.5)(show_time)     AS st_p50_exact
            FROM ch_a1 GROUP BY day
            """
        )
    ).collect()
    truth = {
        r["day"]: sorted(r["v"])
        for r in a1.groupBy("day")
        .agg(F.collect_list("show_time").alias("v"))
        .collect()
    }
    for r in rows:
        vals = truth[r["day"]]
        n = len(vals)
        # ClickHouse quantileExact: sorted[min(floor(p*n), n-1)] (0-based)
        # — quantileExact(0.5) over 0..9 is element 5, matching
        # medianExact's upper-middle rule.
        assert r["st_p50_exact"] == vals[min(n // 2, n - 1)]
        assert r["st_iqr"][0] <= r["st_p50"] <= r["st_iqr"][1]
        assert min(vals) <= r["st_p50"] <= max(vals)


def test_translate_extended_scalar_and_aggregate_surface(spark):
    """The widened function table: spot-check translations compile AND
    compute correct values in Spark SQL."""
    assert translate("argMax(uid, value)") == "max_by(uid, value)"
    assert translate("groupUniqArray(x)") == "collect_set(x)"
    # separator is literal, not regex (r3b: '.' would split on all chars)
    assert translate("splitByChar(',', s)") == (
        "split(s, concat('\\\\Q', ',', '\\\\E'))"
    )
    assert translate("has(tags, 'a')") == "array_contains(tags, 'a')"
    row = spark.sql(
        "SELECT "
        + translate("toYYYYMM(toDate('2024-03-07'))") + " AS ym, "
        + translate("toDayOfWeek(toDate('2024-03-04'))") + " AS dow_mon, "
        + translate("toDayOfWeek(toDate('2024-03-10'))") + " AS dow_sun, "
        + translate("arrayStringConcat(array('a','b'), '-')") + " AS joined, "
        + translate("empty(array())") + " AS e, "
        + translate("toStartOfDay(toDateTime('2024-03-07 13:45:00'))") + " AS sod"
    ).collect()[0]
    assert row["ym"] == 202403
    assert row["dow_mon"] == 1 and row["dow_sun"] == 7  # ClickHouse Mon=1..Sun=7
    assert row["joined"] == "a-b"
    assert row["e"] is True
    assert str(row["sod"]).startswith("2024-03-07 00:00:00")
    agg = spark.sql(
        "SELECT " + translate("argMax(a, b)") + " AS am, "
        + translate("groupArray(a)") + " AS ga "
        "FROM VALUES (1, 10), (2, 30), (3, 20) AS t(a, b)"
    ).collect()[0]
    assert agg["am"] == 2 and sorted(agg["ga"]) == [1, 2, 3]


def test_translate_sample_and_limit_by_clauses(spark, star_views):
    """Clause-level rewrites: fractional SAMPLE becomes TABLESAMPLE and
    actually executes; LIMIT BY and row-count SAMPLE raise with the
    engine's alternatives; literals are never rewritten."""
    sql = translate("SELECT count(*) AS n FROM ch_a1 SAMPLE 0.5")
    assert "TABLESAMPLE (50 PERCENT)" in sql
    total = spark.sql("SELECT count(*) AS n FROM ch_a1").collect()[0]["n"]
    n = spark.sql(sql).collect()[0]["n"]
    assert 0 < n < total
    assert translate("SELECT 'SAMPLE 0.5' AS s") == "SELECT 'SAMPLE 0.5' AS s"
    with pytest.raises(ValueError, match="dialect.run"):
        translate("SELECT count(*) FROM t SAMPLE 1000")


def test_run_sample_rows_form(spark):
    """Round-4: ``SAMPLE n`` (row-count form) through dialect.run — the
    runner resolves the table's row count and rewrites to a percentage
    TABLESAMPLE, so ClickHouse's approximate-row-target semantics hold:
    the sampled count lands near n (Bernoulli spread), never the full
    table. Literals and the fractional form are untouched."""
    from clickhouse_learning_spark.functions.dialect import (
        _substitute_sample_rows,
        run,
    )

    spark.range(10_000).selectExpr(
        "id", "id % 7 AS g"
    ).createOrReplaceTempView("smp_t")
    n = run(spark, "SELECT count() AS n FROM smp_t SAMPLE 500").collect()[0].n
    assert 250 < n < 1000  # ~500 ± binomial spread, far from 10 000

    # n >= table size clamps to 100% (every row)
    n2 = run(
        spark, "SELECT count() AS n FROM smp_t SAMPLE 99999"
    ).collect()[0].n
    assert n2 == 10_000

    # the rewrite itself: pct derived from the actual count; strings safe
    s = _substitute_sample_rows(
        spark, "SELECT 'FROM x SAMPLE 5' AS lit, count(*) "
        "FROM smp_t SAMPLE 100"
    )
    assert "TABLESAMPLE (1.00000000 PERCENT)" in s
    assert "'FROM x SAMPLE 5'" in s


def test_translate_limit_by(spark):
    """ClickHouse LIMIT [offset,] n BY → row_number window rewrite,
    matching ClickHouse evaluation order ORDER BY → LIMIT BY → LIMIT."""
    spark.createDataFrame(
        [(g, v) for g in ("a", "b") for v in (5, 3, 9, 1)], "g string, v int"
    ).createOrReplaceTempView("ch_lb")

    rows = spark.sql(
        translate("SELECT g, v FROM ch_lb ORDER BY v DESC LIMIT 2 BY g")
    ).collect()
    got = sorted((r["g"], r["v"]) for r in rows)
    assert got == [("a", 5), ("a", 9), ("b", 5), ("b", 9)]

    # offset form: skip the top row per group, take the next 2
    rows = spark.sql(
        translate("SELECT g, v FROM ch_lb ORDER BY v DESC LIMIT 1, 2 BY g")
    ).collect()
    got = sorted((r["g"], r["v"]) for r in rows)
    assert got == [("a", 3), ("a", 5), ("b", 3), ("b", 5)]

    # equivalent OFFSET keyword spelling: LIMIT n OFFSET off BY
    rows = spark.sql(
        translate(
            "SELECT g, v FROM ch_lb ORDER BY v DESC LIMIT 2 OFFSET 1 BY g"
        )
    ).collect()
    assert sorted((r["g"], r["v"]) for r in rows) == got

    # GLOBAL IN strips like GLOBAL JOIN (distribution hint only)
    rows = spark.sql(
        translate(
            "SELECT g, v FROM ch_lb WHERE v GLOBAL IN "
            "(SELECT v FROM ch_lb WHERE v > 5)"
        )
    ).collect()
    assert sorted((r["g"], r["v"]) for r in rows) == \
        [("a", 9), ("b", 9)]

    # trailing LIMIT applies after LIMIT BY; final order preserved
    rows = spark.sql(
        translate("SELECT g, v FROM ch_lb ORDER BY v DESC, g LIMIT 1 BY g LIMIT 1")
    ).collect()
    assert [(r["g"], r["v"]) for r in rows] == [("a", 9)]

    # no ORDER BY: deterministic fallback ordering by the BY exprs;
    # group sizes still honored and ClickHouse functions still rewrite
    rows = spark.sql(
        translate("SELECT g, toInt64(v) AS v2 FROM ch_lb LIMIT 3 BY g")
    ).collect()
    from collections import Counter

    assert Counter(r["g"] for r in rows) == {"a": 3, "b": 3}

    # nested LIMIT BY (round-3b): subquery and CTE bodies rewrite too
    rows = spark.sql(
        translate(
            "SELECT g, count(*) AS n FROM "
            "(SELECT g, v FROM ch_lb ORDER BY v DESC LIMIT 2 BY g) q "
            "GROUP BY g"
        )
    ).collect()
    assert {(r.g, r.n) for r in rows} == {("a", 2), ("b", 2)}
    rows = spark.sql(
        translate(
            "WITH top AS (SELECT g, v FROM ch_lb ORDER BY v DESC "
            "LIMIT 1 BY g) SELECT sum(v) AS s FROM top"
        )
    ).collect()
    assert rows[0].s == 18  # 9 + 9


def test_translate_weighted_aggregate_gates():
    with pytest.raises(ValueError, match="quantile_weighted_state"):
        translate("quantileExactWeighted(0.9)(latency, calls)")
    # the single-argument Map-column form still gates; the canonical
    # (keys, values) two-array form translates as of round 5
    with pytest.raises(ValueError, match="two arrays"):
        translate("sumMap(m)")


def test_translate_map_aggregates_execute(spark):
    """Round-5: sumMap/minMap/maxMap(keys, values) as run-length folds
    — keys ascend, values combine per key, result is the CH tuple
    (col1 keys, col2 values) so tupleElement access works; NULL keys
    skipped; empty group → empty arrays."""
    rows = [
        (1, [1, 2], [10, 20]),
        (1, [2, 3], [5, 7]),
        (2, [None, 4], [99, 1]),
        (3, [], []),
    ]
    spark.createDataFrame(
        rows, "g int, ks array<int>, vs array<int>"
    ).createOrReplaceTempView("ch_summap")
    out = {
        r.g: r
        for r in spark.sql(
            translate(
                "SELECT g, sumMap(ks, vs) AS s, minMap(ks, vs) AS mn, "
                "maxMap(ks, vs) AS mx, tupleElement(sumMap(ks, vs), 1) "
                "AS just_keys FROM ch_summap GROUP BY g"
            )
        ).collect()
    }
    assert out[1].s.col1 == [1, 2, 3] and out[1].s.col2 == [10, 25, 7]
    assert out[1].mn.col2 == [10, 5, 7] and out[1].mx.col2 == [10, 20, 7]
    assert out[1].just_keys == [1, 2, 3]
    assert out[2].s.col1 == [4] and out[2].s.col2 == [1]
    assert out[3].s.col1 == [] and out[3].s.col2 == []


def test_interval_aggregates(spark):
    """Round-5: maxIntersections / maxIntersectionsPosition /
    intervalLengthSum sweep-line folds. Touching intervals do not
    intersect (ends sort before starts at the same point — CH's pair
    order); reversed/NULL segments are skipped; position is where the
    maximum is first reached."""
    import random

    rows = [
        (1, 0.0, 10.0), (1, 2.0, 5.0), (1, 4.0, 8.0),
        (2, 0.0, 5.0), (2, 5.0, 10.0),
        (3, 5.0, 2.0), (3, None, 4.0), (3, 1.0, 3.0),
    ]
    spark.createDataFrame(
        rows, "g int, s double, e double"
    ).createOrReplaceTempView("ch_iv")
    out = {
        r.g: r
        for r in spark.sql(
            translate(
                "SELECT g, maxIntersections(s, e) AS mi, "
                "maxIntersectionsPosition(s, e) AS mip, "
                "intervalLengthSum(s, e) AS ils "
                "FROM ch_iv GROUP BY g"
            )
        ).collect()
    }
    assert (out[1].mi, out[1].mip, out[1].ils) == (3, 4.0, 10.0)
    assert (out[2].mi, out[2].ils) == (1, 10.0)
    assert (out[3].mi, out[3].mip, out[3].ils) == (1, 1.0, 2.0)

    # randomized sweep vs a pure-Python reference
    rng = random.Random(0x1E1)
    rrows, want = [], {}
    for g in range(60):
        ivs = []
        for _ in range(rng.randint(0, 8)):
            s = rng.randint(0, 20)
            e = s + rng.randint(0, 10)
            ivs.append((float(s), float(e)))
            rrows.append((g, float(s), float(e)))
        evs = sorted(
            [(s, 1) for s, _ in ivs] + [(e, -1) for _, e in ivs],
            key=lambda x: (x[0], x[1]),
        )
        cur = best = 0
        pos = None
        for p, d in evs:
            if d == 1 and cur + 1 > best:
                best = cur + 1
                pos = p
            cur += d
        tot, depth, last = 0.0, 0, 0.0
        for p, d in evs:
            if depth > 0:
                tot += p - last
            last, depth = p, depth + d
        want[g] = (best, pos, tot)
    if rrows:
        spark.createDataFrame(
            rrows, "g int, s double, e double"
        ).createOrReplaceTempView("ch_iv_fuzz")
        got = {
            r.g: (r.mi, r.mip, r.ils)
            for r in spark.sql(
                translate(
                    "SELECT g, maxIntersections(s, e) AS mi, "
                    "maxIntersectionsPosition(s, e) AS mip, "
                    "intervalLengthSum(s, e) AS ils "
                    "FROM ch_iv_fuzz GROUP BY g"
                )
            ).collect()
        }
        bad = {g: (got[g], want[g]) for g in got if got[g] != want[g]}
        assert not bad, f"mismatches: {dict(list(bad.items())[:5])}"


def test_translate_topk(spark):
    """Round-4: ``topK(k)(x)`` / ``topKWeighted(k)(x, w)`` translate to
    a single JVM-side expression (sorted collect → run-length fold →
    order by (-cnt, val) → slice k). ClickHouse's SpaceSaving result is
    approximate by contract; this form is exact, with val as the
    deterministic tiebreak. NULL x is skipped in both forms; an
    all-NULL group yields an empty array."""
    spark.createDataFrame(
        [("a", "x", 1), ("a", "x", 1), ("a", "y", 9), ("a", "z", 2),
         ("a", "z", 2), ("b", "q", 5), ("b", None, 7)],
        "g string, v string, w int",
    ).createOrReplaceTempView("ch_topk")

    rows = spark.sql(
        translate(
            "SELECT g, topK(2)(v) AS top2 FROM ch_topk GROUP BY g "
            "ORDER BY g"
        )
    ).collect()
    assert [(r.g, r.top2) for r in rows] == [
        ("a", ["x", "z"]), ("b", ["q"]),  # x ties z at 2 → val tiebreak
    ]

    # weights flip the order: y carries weight 9 over x's 2 and z's 4
    rows2 = spark.sql(
        translate(
            "SELECT g, topKWeighted(2)(v, w) AS top2 FROM ch_topk "
            "GROUP BY g ORDER BY g"
        )
    ).collect()
    assert [(r.g, r.top2) for r in rows2] == [
        ("a", ["y", "z"]), ("b", ["q"]),
    ]

    # all-NULL group → empty array, no error
    spark.createDataFrame(
        [("c", None, 1)], "g string, v string, w int"
    ).createOrReplaceTempView("ch_topk_null")
    r3 = spark.sql(
        translate("SELECT topKWeighted(3)(v, w) AS t FROM ch_topk_null")
    ).collect()[0].t
    assert r3 == []


def test_translate_array_functions(spark):
    got = spark.sql(
        "SELECT "
        + translate("arraySum(arraySlice(arraySort(arrayDistinct(array(3,1,2,1))), 1, 2))")
        + " AS s, "
        + translate("indexOf(array('a','b'), 'b')") + " AS i, "
        + translate("arrayReverse(array(1,2,3))") + " AS r"
    ).collect()[0]
    assert got["s"] == 3 and got["i"] == 2 and got["r"] == [3, 2, 1]


def test_translate_array_join_clause(spark):
    """ClickHouse ARRAY JOIN → LATERAL VIEW explode: the reference's
    verbatim MV insert-test idiom (docs/物化视图的实战经验分享.md:340-346 —
    tuple arrays fanned out from system.one), plus bracket literals,
    1-based indexing, numbers(), and multi-array zip semantics."""
    ref = """
        SELECT a.1 AS platform, a.2 AS ver, a.3 AS uid
        FROM system.one
        ARRAY JOIN [('android', '1.1', 1001), ('android', '1.1', 1002),
                    ('ios', '1.2', 1003)] AS a
    """
    rows = spark.sql(translate(ref)).collect()
    assert [(r.platform, r.ver, r.uid) for r in rows] == [
        ("android", "1.1", 1001),
        ("android", "1.1", 1002),
        ("ios", "1.2", 1003),
    ]

    # bracket literal + 1-based indexing (Spark's bare [] is 0-based)
    r = spark.sql(
        translate("SELECT arr[2] AS second FROM (SELECT [10,20,30] AS arr) t")
    ).collect()[0]
    assert r.second == 20

    # numbers(N) table function → range with ClickHouse's column name
    rows = spark.sql(translate("SELECT number FROM numbers(3)")).collect()
    assert [r.number for r in rows] == [0, 1, 2]

    # multiple arrays zip positionally (NOT a cross product)
    rows = spark.sql(
        translate(
            "SELECT x, y FROM (SELECT [1,2] AS xs, [10,20] AS ys) t "
            "ARRAY JOIN xs AS x, ys AS y"
        )
    ).collect()
    assert sorted((r.x, r.y) for r in rows) == [(1, 10), (2, 20)]

    # LEFT ARRAY JOIN uses explode_outer
    assert "OUTER" in translate("SELECT x FROM t LEFT ARRAY JOIN xs AS x")

    # tuple()/tupleElement() map to struct fields
    r = spark.sql(translate("SELECT tupleElement(tuple(7, 'z'), 2) AS e")).collect()[0]
    assert r.e == "z"

    # bare ARRAY JOIN (no AS) is ambiguous in Spark and gates
    with pytest.raises(ValueError, match="AS <alias>"):
        translate("SELECT xs FROM t ARRAY JOIN xs")

    # computed-expression indexing can't be made 1-based textually
    with pytest.raises(ValueError, match="element_at"):
        translate("SELECT split(s, ',')[1] FROM t")


def test_translate_totals_prewhere_final(spark):
    """WITH TOTALS → GROUPING SETS ((keys), ()); PREWHERE → WHERE
    (pushdown is Spark's job); FINAL gates at merge_query."""
    spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "g string, v int"
    ).createOrReplaceTempView("ch_tot")
    rows = spark.sql(
        translate("SELECT g, sum(v) AS s FROM ch_tot GROUP BY g WITH TOTALS")
    ).collect()
    got = {r.g: r.s for r in rows}
    assert got == {"a": 3, "b": 5, None: 8}  # NULL-keyed totals row

    rows = spark.sql(
        translate("SELECT g, v FROM ch_tot PREWHERE v > 1")
    ).collect()
    assert sorted((r.g, r.v) for r in rows) == [("a", 2), ("b", 5)]

    # PREWHERE + WHERE merge into one conjunction, parenthesized so an
    # OR in either predicate keeps its meaning
    rows = spark.sql(
        translate(
            "SELECT g, v FROM ch_tot PREWHERE v > 1 WHERE g = 'a' OR g = 'b'"
        )
    ).collect()
    assert sorted((r.g, r.v) for r in rows) == [("a", 2), ("b", 5)]
    assert (
        translate("SELECT * FROM t PREWHERE a WHERE b OR c GROUP BY g")
        == "SELECT * FROM t WHERE (a) AND (b OR c) GROUP BY g"
    )
    # subquery PREWHERE merges within its own span; UNION branches keep
    # their own clauses
    assert (
        translate("SELECT * FROM (SELECT x FROM t PREWHERE a WHERE b) s WHERE c")
        == "SELECT * FROM (SELECT x FROM t WHERE (a) AND (b) ) s WHERE c"
    )
    assert (
        translate("SELECT a FROM t PREWHERE x=1 UNION ALL SELECT a FROM u WHERE y=2")
        == "SELECT a FROM t WHERE x=1 UNION ALL SELECT a FROM u WHERE y=2"
    )
    with pytest.raises(ValueError, match="merge_query"):
        translate("SELECT * FROM t FINAL")
    # a column named final is untouched
    assert translate("SELECT final FROM t") == "SELECT final FROM t"


def test_translate_join_strictness(spark):
    """ClickHouse join modifiers: GLOBAL/ALL dropped, SEMI/ANTI LEFT →
    Spark LEFT SEMI/ANTI, ANY JOIN USING dedupes the right side
    per-key (first-match semantics), ASOF translates (see
    test_translate_asof_join), trailing SETTINGS dropped."""
    spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k int, l string"
    ).createOrReplaceTempView("ch_l")
    spark.createDataFrame(
        [(1, "r1"), (1, "r2"), (2, "r3")], "k int, r string"
    ).createOrReplaceTempView("ch_r")

    # ANY LEFT JOIN: exactly one right match per left row (the smallest
    # by key order — deterministic), unmatched keys keep NULL
    rows = spark.sql(
        translate("SELECT k, l, r FROM ch_l ANY LEFT JOIN ch_r USING (k)")
    ).collect()
    assert len(rows) == 3
    got = {r.k: r.r for r in rows}
    assert got[1] in ("r1", "r2") and got[2] == "r3" and got[3] is None

    # GLOBAL + ALL are dropped; plain join multiplicity kept (2 rows for k=1)
    rows = spark.sql(
        translate("SELECT k, r FROM ch_l GLOBAL ALL INNER JOIN ch_r USING (k)")
    ).collect()
    assert len(rows) == 3

    # SEMI / ANTI
    rows = spark.sql(
        translate("SELECT k FROM ch_l SEMI LEFT JOIN ch_r USING (k)")
    ).collect()
    assert sorted(r.k for r in rows) == [1, 2]
    rows = spark.sql(
        translate("SELECT k FROM ch_l ANTI LEFT JOIN ch_r USING (k)")
    ).collect()
    assert [r.k for r in rows] == [3]

    # trailing SETTINGS dropped
    rows = spark.sql(
        translate("SELECT count(*) AS n FROM ch_l SETTINGS max_threads = 8, join_use_nulls = 1")
    ).collect()
    assert rows[0].n == 3

    # ASOF JOIN now TRANSLATES (round 3, _rewrite_asof_join) — the
    # mechanical ON form becomes an intervalized equi-join
    t = translate("SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t")
    assert "lead(t)" in t and "__ch_asof_end" in t

    # ANY JOIN … ON (round-3b): plain column equalities identify the
    # right-side first-match key, dedup subquery + verbatim ON
    rows = spark.sql(
        translate("SELECT l.k, l.l, r.r FROM ch_l l ANY LEFT JOIN ch_r r ON l.k = r.k")
    ).collect()
    assert len(rows) == 3
    got = {r.k: r.r for r in rows}
    assert got[1] in ("r1", "r2") and got[2] == "r3" and got[3] is None
    # unaliased right table qualifies by bare name
    rows = spark.sql(
        translate("SELECT l.k, ch_r.r FROM ch_l l ANY JOIN ch_r ON l.k = ch_r.k")
    ).collect()
    assert sorted(r.k for r in rows) == [1, 2]
    # non-equality conjuncts still gate
    with pytest.raises(ValueError, match="column equalities"):
        translate("SELECT * FROM a l ANY LEFT JOIN b r ON l.k = r.k AND l.t >= r.t")
    with pytest.raises(ValueError, match="swap"):
        translate("SELECT * FROM a SEMI RIGHT JOIN b USING (k)")


def test_translate_theta_and_approx_quantiles(spark):
    """uniqTheta family → Datasketches theta agg (state/merge round-trip
    exact at small cardinality); quantileTDigest/Timing → Spark
    approx_percentile (same fast-approximate contract)."""
    spark.range(1000).selectExpr(
        "id % 10 AS g", "id % 137 AS u", "CAST(id AS DOUBLE) AS v"
    ).createOrReplaceTempView("ch_th")

    r = spark.sql(
        translate("SELECT uniqTheta(u) AS u FROM ch_th")
    ).collect()[0]
    assert r.u == 137  # theta is exact below sketch capacity

    states = spark.sql(
        translate("SELECT g, uniqThetaState(u) AS s FROM ch_th GROUP BY g")
    )
    states.createOrReplaceTempView("ch_th_states")
    merged = spark.sql(
        translate("SELECT uniqThetaMerge(s) AS u FROM ch_th_states")
    ).collect()[0]
    assert merged.u == 137

    q = spark.sql(
        translate("SELECT quantileTDigest(0.5)(v) AS med, "
                  "quantileTiming(0.9)(v) AS p90 FROM ch_th")
    ).collect()[0]
    assert abs(q.med - 499.5) < 25 and abs(q.p90 - 899) < 45


def test_translate_quantile_exact_low_high(spark):
    """quantileExactLow/High == Python statistics.median_low/high at
    level 0.5, and follow ClickHouse's index rules at other levels."""
    import statistics

    even = [10, 20, 30, 40]
    odd = [10, 20, 30, 40, 50]
    for vals in (even, odd):
        spark.createDataFrame([(v,) for v in vals], "v int").createOrReplaceTempView(
            "ch_q"
        )
        r = spark.sql(
            translate(
                "SELECT quantileExactLow(0.5)(v) AS lo, "
                "quantileExactHigh(0.5)(v) AS hi FROM ch_q"
            )
        ).collect()[0]
        assert r.lo == statistics.median_low(vals)
        assert r.hi == statistics.median_high(vals)
    # level boundaries: 0 → first element, 1 → last, both variants
    r = spark.sql(
        translate(
            "SELECT quantileExactLow(0)(v) AS l0, quantileExactLow(1)(v) AS l1, "
            "quantileExactHigh(0)(v) AS h0, quantileExactHigh(1)(v) AS h1 FROM ch_q"
        )
    ).collect()[0]
    assert (r.l0, r.l1, r.h0, r.h1) == (10, 50, 10, 50)


def test_translate_higher_order_array_functions(spark):
    """ClickHouse lambda-first HOFs → Spark array-first equivalents;
    the lambda syntax is shared, so only name/arg order changes."""
    row = spark.sql(
        "SELECT "
        + translate("arrayMap(x -> x * 2, [1, 2, 3])") + " AS doubled, "
        + translate("arrayFilter(x -> x > 1, [1, 2, 3])") + " AS big, "
        + translate("arrayExists(x -> x = 2, [1, 2, 3])") + " AS has2, "
        + translate("arrayAll(x -> x > 0, [1, 2, 3])") + " AS allpos, "
        + translate("arrayCount(x -> x > 1, [1, 2, 3])") + " AS n, "
        + translate("arrayFirst(x -> x > 1, [1, 2, 3])") + " AS fst, "
        + translate("arrayFirstIndex(x -> x > 1, [1, 2, 3])") + " AS idx, "
        + translate("arrayMap((x, y) -> x + y, [1, 2], [10, 20])") + " AS zipped"
    ).collect()[0]
    assert row.doubled == [2, 4, 6]
    assert row.big == [2, 3]
    assert row.has2 is True and row.allpos is True
    assert row.n == 2 and row.fst == 2 and row.idx == 2
    assert row.zipped == [11, 22]
    # no match: arrayFirst → NULL (ClickHouse: the type default — the
    # one intentional difference), arrayFirstIndex → 0 (same as CH)
    r = spark.sql(
        "SELECT " + translate("arrayFirst(x -> x > 9, [1])") + " AS fst, "
        + translate("arrayFirstIndex(x -> x > 9, [1])") + " AS idx"
    ).collect()[0]
    assert r.fst is None and r.idx == 0


def test_translate_window_and_block_order_functions(spark):
    """lagInFrame/leadInFrame map to lag/lead; block-order functions
    (neighbor, runningDifference, …) gate with the window form."""
    spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20)], "k int, v int"
    ).createOrReplaceTempView("ch_w")
    rows = spark.sql(
        translate(
            "SELECT k, v - lagInFrame(v, 1, 0) OVER (ORDER BY k) AS diff FROM ch_w"
        )
    ).collect()
    assert [(r.k, r.diff) for r in rows] == [(1, 10), (2, 20), (3, -10)]
    for fn in ("neighbor(v, 1)", "runningDifference(v)", "runningAccumulate(s)"):
        with pytest.raises(ValueError, match="block order"):
            translate(f"SELECT {fn} FROM t")


def test_reference_docs_queries_translate_and_parse(spark):
    """Every SELECT statement in the reference's own docs (clickhouse
    console transcripts, 物化视图的实战经验分享.md) runs through translate()
    and parses in Spark's SQL parser — the 'paste your existing
    queries' guarantee, measured against the reference's actual
    queries rather than hand-picked shapes."""
    import glob
    import os
    import re

    docs = glob.glob("/root/reference/docs/*.md")
    if not docs:
        pytest.skip("reference checkout not available")

    stmts = []
    for p in docs:
        for block in re.findall(r"```(?:sql)?\n(.*?)```", open(p).read(), re.S):
            for s in re.split(r";\s*\n|\n\n(?=SELECT|WITH)", block):
                # cut clickhouse-client transcript noise off the tail
                s = re.split(r"\nQuery id:|\nOk\.|\n\d+ rows? in set", s)[0]
                s = s.strip().rstrip(";").strip()
                if re.match(r"(?is)^(select|with)\b", s) and len(s) > 20:
                    stmts.append((os.path.basename(p), s))
    assert len(stmts) >= 10  # the doc's console transcripts

    parser = spark._jsparkSession.sessionState().sqlParser()
    dicts = {
        "dim.dict_user_dim": ("user_dim", "uid"),
        "dim.dict_item_dim": ("item_dim", "item_id"),
    }
    gated, failures = [], []
    for src, s in stmts:
        try:
            t = translate(s, dictionaries=dicts)
        except ValueError as e:
            gated.append((src, s[:60], str(e)[:60]))  # actionable gate = OK
            continue
        try:
            parser.parsePlan(t)
        except Exception as e:  # pragma: no cover - failure reporting
            failures.append((src, s[:80], str(e)[:120]))
    assert not failures, failures
    # the reference docs use no gated construct today; if the docs grow
    # one, the gate must still be the actionable-error kind (asserted
    # by the ValueError catch above), so just record the count
    assert len(gated) == 0


def test_translate_minmax_count_avg_state_merge(spark):
    """State/Merge combinators for the self-representing aggregates
    (min/max = own value, count merges by sum, avg = (sum,count) pair,
    uniqExact = sorted id-set): two-phase through a view equals the
    direct single-phase query exactly."""
    spark.range(1000).selectExpr(
        "id % 7 AS g", "id % 10 AS sub", "CAST(id % 101 AS BIGINT) AS v"
    ).createOrReplaceTempView("ch_sm")
    states = spark.sql(
        translate(
            """
            SELECT g, sub, minState(v) AS mn, maxState(v) AS mx,
                   countState() AS cnt, avgState(v) AS av,
                   uniqExactState(v) AS uq
            FROM ch_sm GROUP BY g, sub
            """
        )
    )
    states.createOrReplaceTempView("ch_sm_states")
    merged = spark.sql(
        translate(
            """
            SELECT g, minMerge(mn) AS mn, maxMerge(mx) AS mx,
                   countMerge(cnt) AS cnt, avgMerge(av) AS av,
                   uniqExactMerge(uq) AS uq
            FROM ch_sm_states GROUP BY g
            """
        )
    )
    direct = spark.sql(
        "SELECT g, min(v) AS mn, max(v) AS mx, count(*) AS cnt, "
        "avg(v) AS av, count(DISTINCT v) AS uq FROM ch_sm GROUP BY g"
    )
    got = {r.g: r for r in merged.collect()}
    for r in direct.collect():
        m_ = got[r.g]
        assert (m_.mn, m_.mx, m_.cnt, m_.uq) == (r.mn, r.mx, r.cnt, r.uq)
        assert abs(m_.av - r.av) < 1e-9


def test_translate_with_fill_gate():
    # bare translate() still gates (fill values need the result schema);
    # the message points at the round-3 schema-aware runner
    with pytest.raises(ValueError, match="dialect.run"):
        translate("SELECT d, sum(v) FROM t GROUP BY d ORDER BY d WITH FILL")


def test_translate_leaves_string_literals_untouched():
    """Structural passes are string-literal-safe: clause keywords,
    brackets and table refs INSIDE literals never rewrite."""
    cases = [
        "SELECT 'LIMIT 3 BY g' AS s FROM t",
        "SELECT 'ARRAY JOIN xs AS x' AS s FROM t",
        "SELECT '[1, 2, 3]' AS s FROM t",
        "SELECT 'arr[1]' AS s FROM t",
        "SELECT 'system.one numbers(5)' AS s FROM t",
        "SELECT 'GROUP BY x WITH TOTALS' AS s FROM t",
        "SELECT 'PREWHERE a SEMI LEFT JOIN b' AS s FROM t",
        "SELECT 'SETTINGS max_threads = 8' AS s FROM t",
    ]
    for sql in cases:
        assert translate(sql) == sql, sql


def test_translate_datetime_and_string_scalars(spark):
    """Everyday scalar breadth: date parts/arithmetic, dateDiff units,
    null handling, literal-safe splitByString, truncating intDiv."""
    r = spark.sql(
        "SELECT "
        + translate("toYear(toDate('2024-03-07'))") + " AS y, "
        + translate("toQuarter(toDate('2024-05-07'))") + " AS q, "
        + translate("toStartOfQuarter(toDate('2024-05-07'))") + " AS sq, "
        + translate("addDays(toDate('2024-01-31'), 1)") + " AS ad, "
        + translate("dateDiff('day', toDate('2024-01-01'), toDate('2024-02-01'))") + " AS dd, "
        + translate("dateDiff('month', toDate('2024-01-15'), toDate('2024-04-20'))") + " AS dm, "
        + translate("ifNull(NULL, 7)") + " AS inl, "
        + translate("splitByString('||', 'a||b.c||d')") + " AS sp, "
        + translate("startsWith('spark', 'sp')") + " AS sw, "
        + translate("position('clickhouse', 'house')") + " AS pos, "
        + translate("intDiv(-7, 2)") + " AS idn, "
        + translate("intDiv(7, 2)") + " AS idp, "
        + translate("intDivOrZero(7, 0)") + " AS idz, "
        + translate("toUnixTimestamp(toDateTime('1970-01-01 00:01:00'))") + " AS ut"
    ).collect()[0]
    assert (r.y, r.q) == (2024, 2)
    assert str(r.sq) == "2024-04-01"
    assert str(r.ad) == "2024-02-01"
    assert (r.dd, r.dm) == (31, 3)
    assert r.inl == 7
    assert r.sp == ["a", "b.c", "d"]  # '||' split literally, '.' kept
    assert r.sw is True and r.pos == 6
    assert (r.idn, r.idp, r.idz) == (-3, 3, 0)  # truncation, not floor
    assert r.ut == 60


def test_translate_array_utility_functions(spark):
    r = spark.sql(
        "SELECT "
        + translate("arrayFlatten([[1,2],[3]])") + " AS fl, "
        + translate("arrayUniq([1,2,2,3])") + " AS au, "
        + translate("arrayEnumerate(['a','b','c'])") + " AS en, "
        + translate("arrayDifference([1,4,9,16])") + " AS ad, "
        + translate("arrayCumSum([1,2,3])") + " AS cs, "
        + translate("sequence(0, 3)") + " AS rg, "
        + translate("uniqUpTo(2)(x)") + " AS uu "
        "FROM (SELECT explode(array(1,2,3,4)) AS x)"
    ).collect()[0]
    assert r.fl == [1, 2, 3]
    assert r.au == 3
    assert r.en == [1, 2, 3]
    assert r.ad == [0, 3, 5, 7]
    assert r.cs == [1, 3, 6]
    assert r.rg == [0, 1, 2, 3]
    assert r.uu == 3  # 4 distinct capped at N+1 = 3
    with pytest.raises(ValueError, match="value_histogram"):
        translate("histogram(10)(v)")


def test_translate_url_and_json_functions(spark):
    r = spark.sql(
        "SELECT "
        + translate("domain('https://spark.apache.org/docs/latest?x=1#frag')") + " AS d, "
        + translate("path('https://a.io/p/q?x=1')") + " AS p, "
        + translate("extractURLParameter('https://a.io/p?x=1&y=2', 'y')") + " AS y, "
        + translate("""JSONExtractString('{"a": "hi", "n": 3}', 'a')""") + " AS js, "
        + translate("""JSONExtractInt('{"a": "hi", "n": 3}', 'n')""") + " AS jn, "
        + translate("""JSONHas('{"a": 1}', 'b')""") + " AS jh"
    ).collect()[0]
    assert r.d == "spark.apache.org"
    assert r.p == "/p/q"
    assert r.y == "2"
    assert (r.js, r.jn, r.jh) == ("hi", 3, False)
    # computed JSON key concats the path
    assert "concat('$.'" in translate("JSONExtractString(j, k)")


def test_translate_passthrough_property():
    """Property: ANSI-only SQL with no ClickHouse construct is returned
    byte-identical (hypothesis-generated identifiers, literals and
    clause mixes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
        lambda s: s.upper()
        not in ("FROM", "AS", "BY", "ON", "OR", "AND", "IN", "IS", "ALL", "ANY")
    )
    lit = st.one_of(
        st.integers(-1000, 1000).map(str),
        st.from_regex(r"[a-z ]{0,12}", fullmatch=True).map(lambda s: f"'{s}'"),
    )

    @settings(max_examples=150, deadline=None)
    @given(cols=st.lists(ident, min_size=1, max_size=4), t=ident, v=lit, w=ident)
    def run(cols, t, v, w):
        sql = (
            f"SELECT {', '.join(cols)} FROM {t} "
            f"WHERE {w} = {v} GROUP BY {cols[0]} ORDER BY {cols[0]} LIMIT 7"
        )
        assert translate(sql) == sql

    run()


def test_translate_regex_string_family(spark):
    r = spark.sql(
        "SELECT "
        + translate("match('abc123', '[a-z]+\\\\d+')") + " AS m, "
        + translate("extract('key=value', 'key=([a-z]+)')") + " AS e1, "
        + translate("extract('abc123', '\\\\d+')") + " AS e0, "
        + translate("extractAll('a1 b2 c3', '\\\\d')") + " AS ea, "
        + translate("replaceRegexpAll('a1b2', '\\\\d', '#')") + " AS rr, "
        + translate("replaceAll('x.y.z', '.', '-')") + " AS ra, "
        + translate("countSubstrings('abcabcab', 'ab')") + " AS cs, "
        + translate("trimBoth('  hi  ')") + " AS tb"
    ).collect()[0]
    assert r.m is True
    assert r.e1 == "value" and r.e0 == "123"
    assert r.ea == ["1", "2", "3"]
    assert r.rr == "a#b#"
    assert r.ra == "x-y-z"  # literal replace, '.' not a regex
    assert r.cs == 3
    assert r.tb == "hi"
    # replaceOne maps as of r5 (instr splice): first occurrence only
    ro = spark.sql(
        "SELECT " + translate("replaceOne('banana', 'an', 'X')") + " AS v"
    ).collect()[0].v
    assert ro == "bXana"


def test_translate_bit_round_encode_ip(spark):
    r = spark.sql(
        "SELECT "
        + translate("bitAnd(12, 10)") + " AS ba, "
        + translate("bitXor(12, 10)") + " AS bx, "
        + translate("bitTest(5, 2)") + " AS bt, "
        + translate("roundBankers(2.5)") + " AS rb, "
        + translate("base64Decode(base64Encode('hi'))") + " AS b64, "
        + translate("IPv4NumToString(IPv4StringToNum('10.0.255.1'))") + " AS ip, "
        + translate("IPv4StringToNum('1.2.3.4')") + " AS ipn"
    ).collect()[0]
    assert (r.ba, r.bx, r.bt) == (8, 6, True)
    assert r.rb == 2.0  # banker's, not half-up
    assert r.b64 == "hi"
    assert r.ip == "10.0.255.1"
    assert r.ipn == 16909060


def test_translate_parameterized_uniq_combined_precision(spark):
    spark.range(5000).selectExpr(
        "id % 1371 AS u", "CAST(id AS DOUBLE) AS v"
    ).createOrReplaceTempView("ch_ucp")
    r = spark.sql(
        "SELECT " + translate("uniqCombined(14)(u)") + " AS u, "
        + translate("quantileDeterministic(0.5)(v, u)") + " AS q FROM ch_ucp"
    ).collect()[0]
    assert abs(r.u - 1371) <= 0.05 * 1371
    assert r.q == 2499.5
    with pytest.raises(ValueError, match="integer literal"):
        translate("uniqCombined(k)(u)")


def test_translate_statistical_aggregates(spark):
    spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.1), (3.0, 5.9), (4.0, 8.0), (2.0, 4.0)],
        "x double, y double",
    ).createOrReplaceTempView("ch_st")
    r = spark.sql(
        "SELECT "
        + translate("varPop(x)") + " AS vp, "
        + translate("stddevSamp(x)") + " AS ss, "
        + translate("covarPop(x, y)") + " AS cv, "
        + translate("anyHeavy(x)") + " AS ah, "
        + translate("simpleLinearRegression(x, y)") + " AS lr "
        "FROM ch_st"
    ).collect()[0]
    import statistics

    xs = [1.0, 2.0, 3.0, 4.0, 2.0]
    assert abs(r.vp - statistics.pvariance(xs)) < 1e-9
    assert abs(r.ss - statistics.stdev(xs)) < 1e-9
    assert r.ah == 2.0  # the modal value
    assert abs(r.lr.col1 - 1.98) < 0.05  # slope ≈ 2
    assert abs(r.cv - 2.06) < 1e-9  # population covariance
    with pytest.raises(ValueError, match="block order"):
        translate("deltaSum(x)")


def test_translate_dict_get_or_default(spark, star_views):
    _, user = star_views
    dicts = {"dim.dict_user_dim": ("ch_user_dim", "uid")}
    missing = user.agg(F.max("uid")).collect()[0][0] + 10_000
    r = spark.sql(
        translate(
            f"SELECT dictGetOrDefault('dim.dict_user_dim', 'gender', "
            f"toUInt64({missing}), 'n/a') AS g",
            dictionaries=dicts,
        )
    ).collect()[0]
    assert r.g == "n/a"


def test_translate_misc_late_additions(spark):
    """Regression net for the mappings added late in round 2:
    quantilesExact plural, median alias, exp2/intExp2/intExp10,
    toYYYYMMDDhhmmss, ClickHouse transform() value remapping,
    sumCount, avgWeighted, parameterized uniqCombined fallback."""
    spark.range(10).selectExpr(
        "CAST(id AS BIGINT) AS v", "CAST(id % 3 + 1 AS DOUBLE) AS w"
    ).createOrReplaceTempView("ch_misc")
    r = spark.sql(
        "SELECT "
        + translate("quantilesExact(0.5, 0.9)(v)") + " AS qx, "
        + translate("median(v)") + " AS med, "
        + translate("intExp2(10)") + " AS e2, "
        + translate("intExp10(6)") + " AS e10, "
        + translate("toYYYYMMDDhhmmss(toDateTime('2024-03-07 13:45:06'))") + " AS ymd, "
        + translate("transform('b', ['a','b'], ['A','B'], '?')") + " AS tr, "
        + translate("transform('z', ['a','b'], ['A','B'])") + " AS trk, "
        + translate("sumCount(v)") + " AS sc, "
        + translate("avgWeighted(v, w)") + " AS aw "
        "FROM ch_misc"
    ).collect()[0]
    assert r.qx == [5, 9] and r.med == 4.5
    assert (r.e2, r.e10, r.ymd) == (1024, 1000000, 20240307134506)
    assert (r.tr, r.trk) == ("B", "z")
    assert r.sc.col1 == 45 and r.sc.col2 == 10
    assert abs(r.aw - 87 / 19) < 1e-9


def test_translate_datediff_counts_boundary_crossings(spark):
    """ADVICE r2: CH dateDiff counts unit-BOUNDARY crossings, not
    complete elapsed units — sub-unit offsets across a boundary must
    still count 1 (and 0 within the same unit)."""
    r = spark.sql(
        "SELECT "
        + translate(
            "dateDiff('day', toDateTime('2024-01-01 23:59:00'), "
            "toDateTime('2024-01-02 00:01:00'))"
        ) + " AS d1, "
        + translate(
            "dateDiff('day', toDateTime('2024-01-02 00:01:00'), "
            "toDateTime('2024-01-02 23:59:00'))"
        ) + " AS d0, "
        + translate(
            "dateDiff('month', toDateTime('2024-01-31 12:00:00'), "
            "toDateTime('2024-02-01 00:00:01'))"
        ) + " AS m1, "
        + translate(
            "dateDiff('hour', toDateTime('2024-01-01 10:59:59'), "
            "toDateTime('2024-01-01 11:00:01'))"
        ) + " AS h1, "
        + translate(
            "dateDiff('week', toDate('2024-03-03'), toDate('2024-03-04'))"
        ) + " AS w1, "
        + translate(
            "dateDiff('year', toDate('2023-12-31'), toDate('2024-01-01'))"
        ) + " AS y1"
    ).collect()[0]
    # 2024-03-03 is a Sunday, 03-04 a Monday: CH weeks are Monday-start
    assert (r.d1, r.d0, r.m1, r.h1, r.w1, r.y1) == (1, 0, 1, 1, 1, 1)


def test_translate_toweek_mode0(spark):
    """ADVICE r2: CH toWeek defaults to MySQL mode 0 (Sunday-start,
    weeks 0–53, week 1 = first week containing a Sunday) — compare a
    full year of dates against a pure-Python mode-0 oracle."""
    import datetime as dt

    def week_mode0(d: dt.date) -> int:
        jan1 = d.replace(month=1, day=1)
        # Python: Monday=0..Sunday=6 → day-of-year of first Sunday
        fsd = 1 + (6 - jan1.weekday()) % 7
        doy = d.timetuple().tm_yday
        return (doy - fsd + 7) // 7

    expr = translate("toWeek(d)")
    rows = spark.sql(
        f"SELECT d, {expr} AS w FROM "
        "(SELECT explode(sequence(DATE '2023-01-01', DATE '2024-12-31')) AS d)"
    ).collect()
    for r in rows:
        assert r.w == week_mode0(r.d), (r.d, r.w, week_mode0(r.d))
    # ISO week stays on weekofyear
    iso = spark.sql(
        "SELECT " + translate("toISOWeek(toDate('2024-01-01'))") + " AS w"
    ).collect()[0]
    assert iso.w == 1


def test_translate_array_difference_cumsum_empty(spark):
    """ADVICE r2: arrayDifference/arrayCumSum on an empty array must
    return [] (CH behavior), not a negative-slice runtime error."""
    r = spark.sql(
        "SELECT "
        + translate("arrayDifference(arraySlice([1,2], 1, 0))") + " AS ad, "
        + translate("arrayCumSum(arraySlice([1,2], 1, 0))") + " AS cs, "
        + translate("arrayDifference([5])") + " AS ad1, "
        + translate("arrayCumSum([5])") + " AS cs1"
    ).collect()[0]
    assert r.ad == [] and r.cs == []
    assert r.ad1 == [0] and r.cs1 == [5]


def test_translate_asof_join(spark):
    """Round-3: `ASOF [LEFT] JOIN … ON` translates to the intervalized
    equi-join — results must equal operators.asof.asof_join on every
    inequality direction, inner form must drop unmatched rows, and
    unsupported shapes must still gate with a pointer."""
    import datetime as _dt

    from clickhouse_learning_spark.operators.asof import asof_join

    t0 = _dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(u, t0 + _dt.timedelta(minutes=m), i)
         for i, (u, m) in enumerate([(1, 5), (1, 10), (1, 2), (2, 7), (3, 1)])],
        "uid long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(u, t0 + _dt.timedelta(minutes=m), i * 10)
         for i, (u, m) in enumerate([(1, 3), (1, 5), (1, 9), (2, 8), (4, 0)])],
        "uid long, ts timestamp, rid long",
    )
    left.createOrReplaceTempView("asof_l")
    right.createOrReplaceTempView("asof_r")

    # backward >= : every left row vs operator
    got = spark.sql(translate(
        "SELECT l.lid, r.rid FROM asof_l l "
        "ASOF LEFT JOIN asof_r r ON l.uid = r.uid AND l.ts >= r.ts"
    ))
    exp = asof_join(left, right, on="uid").select("lid", "rid")
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in exp.collect()}

    # forward <= (flipped operand order exercises normalization)
    got_f = spark.sql(translate(
        "SELECT l.lid, r.rid FROM asof_l l "
        "ASOF LEFT JOIN asof_r r ON l.uid = r.uid AND r.ts >= l.ts"
    ))
    exp_f = asof_join(left, right, on="uid", direction="forward").select(
        "lid", "rid"
    )
    assert {tuple(r) for r in got_f.collect()} == {tuple(r) for r in exp_f.collect()}

    # inner ASOF drops unmatched left rows
    got_i = spark.sql(translate(
        "SELECT l.lid, r.rid FROM asof_l l "
        "ASOF JOIN asof_r r ON l.uid = r.uid AND l.ts >= r.ts"
    ))
    matched = {tuple(r) for r in got.collect() if r.rid is not None}
    assert {tuple(r) for r in got_i.collect()} == matched

    # strict > : a left row exactly at a right ts must match the PRIOR row
    got_s = {
        (r.lid, r.rid)
        for r in spark.sql(translate(
            "SELECT l.lid, r.rid FROM asof_l l "
            "ASOF LEFT JOIN asof_r r ON l.uid = r.uid AND l.ts > r.ts"
        )).collect()
    }
    # left (1, 5min, lid=0): rows at 3,5 exist; strict excludes 5 → rid=0
    assert (0, 0) in got_s
    # non-strict picked rid=10 (the 5-minute row) for the same left row
    assert (0, 10) in {(r.lid, r.rid) for r in got.collect()}

    # USING form (round-3b): equality on the leading columns, implicit
    # backward >= on the LAST column; result must equal the ON form,
    # and the output carries ONE copy of each USING column (CH dedup)
    got_u = spark.sql(translate(
        "SELECT l.lid, r.rid FROM asof_l l "
        "ASOF LEFT JOIN asof_r r USING (uid, ts)"
    ))
    assert {tuple(x) for x in got_u.collect()} == {
        tuple(x) for x in got.collect()
    }
    star = spark.sql(translate(
        "SELECT * FROM asof_l l ASOF JOIN asof_r r USING (uid, ts)"
    ))
    assert star.columns.count("uid") == 1 and star.columns.count("ts") == 1
    # unaliased right table: its bare name qualifies
    got_b = spark.sql(translate(
        "SELECT l.lid, asof_r.rid FROM asof_l l "
        "ASOF JOIN asof_r USING (uid, ts)"
    ))
    assert {tuple(x) for x in got_b.collect()} == {
        tuple(x) for x in got.collect() if x.rid is not None
    }

    # gates
    with pytest.raises(ValueError, match="ASOF JOIN"):
        translate(
            "SELECT * FROM a ASOF JOIN b ON toDate(a.d) = b.d AND a.t >= b.t"
        )
    with pytest.raises(ValueError, match="asof column"):
        translate("SELECT * FROM a ASOF JOIN b USING (t)")


def test_with_fill_runner(spark):
    """Round-3 dialect.run: ORDER BY … WITH FILL strips to the
    schema-aware with_fill operator — type-default fills (CH semantics,
    not NULL), exclusive TO, preserved out-of-range rows, date step,
    and gates for multi-key / INTERPOLATE."""
    import datetime as dt

    from clickhouse_learning_spark.functions.dialect import run, with_fill

    spark.createDataFrame(
        [(1, 10, "a"), (4, 40, "d"), (7, 70, "g")], "k int, v long, s string"
    ).createOrReplaceTempView("wf_t")

    rows = run(
        spark, "SELECT k, sum(v) AS v, max(s) AS s FROM wf_t GROUP BY k "
        "ORDER BY k WITH FILL"
    ).collect()
    assert [(r.k, r.v, r.s) for r in rows] == [
        (1, 10, "a"), (2, 0, ""), (3, 0, ""), (4, 40, "d"),
        (5, 0, ""), (6, 0, ""), (7, 70, "g"),
    ]

    # FROM/TO/STEP: TO exclusive, originals outside the grid preserved
    rows2 = run(
        spark, "SELECT k, sum(v) AS v FROM wf_t GROUP BY k "
        "ORDER BY k WITH FILL FROM 0 TO 10 STEP 2"
    ).collect()
    assert [(r.k, r.v) for r in rows2] == [
        (0, 0), (1, 10), (2, 0), (4, 40), (6, 0), (7, 70), (8, 0),
    ]

    # date key: default step = 1 day
    spark.createDataFrame(
        [(dt.date(2024, 1, 1), 5), (dt.date(2024, 1, 4), 7)],
        "day date, cnt long",
    ).createOrReplaceTempView("wf_d")
    rows3 = run(
        spark,
        "SELECT day, sum(cnt) AS cnt FROM wf_d GROUP BY day "
        "ORDER BY day WITH FILL",
    ).collect()
    assert [(str(r.day), r.cnt) for r in rows3] == [
        ("2024-01-01", 5), ("2024-01-02", 0), ("2024-01-03", 0),
        ("2024-01-04", 7),
    ]

    # no WITH FILL → plain translate+run
    assert run(spark, "SELECT count() AS n FROM wf_t").collect()[0].n == 3

    # gates
    with pytest.raises(ValueError, match="single simple sort key"):
        run(spark, "SELECT k, v FROM wf_t ORDER BY k, v WITH FILL")
    # bare translate still gates with the run() pointer
    with pytest.raises(ValueError, match="dialect.run"):
        translate("SELECT k FROM wf_t ORDER BY k WITH FILL")

    # operator form with explicit Column bounds
    df = spark.createDataFrame([(2, 9)], "k int, v long")
    got = with_fill(df, "k", start=F.lit(0), stop=F.lit(4))
    assert [(r.k, r.v) for r in got.collect()] == [
        (0, 0), (1, 0), (2, 9), (3, 0),
    ]


def test_with_fill_interpolate(spark):
    """Round-4: ``WITH FILL … INTERPOLATE (c [AS expr])``. ClickHouse
    evaluates expr from the PREVIOUS row for each inserted row, so
    ``v AS v + 1`` compounds across consecutive gaps; a bare column
    carries forward; columns NOT listed keep the type-default fill.
    Leading fill rows (before any original) keep the default — there is
    nothing to interpolate from. Non-linear expressions gate."""
    from clickhouse_learning_spark.functions.dialect import run, with_fill

    spark.createDataFrame(
        [(1, 10, 100), (4, 40, 400), (6, 60, 600)],
        "k int, v long, w long",
    ).createOrReplaceTempView("wf_i")

    # carry-forward (bare column) + untouched default column
    rows = run(
        spark, "SELECT k, sum(v) AS v, sum(w) AS w FROM wf_i GROUP BY k "
        "ORDER BY k WITH FILL INTERPOLATE (v)"
    ).collect()
    assert [(r.k, r.v, r.w) for r in rows] == [
        (1, 10, 100), (2, 10, 0), (3, 10, 0), (4, 40, 400),
        (5, 40, 0), (6, 60, 600),
    ]

    # linear accumulation: v + 5 per inserted row (CH docs' `inter + 1`
    # shape), chained over the 2-row gap
    rows2 = run(
        spark, "SELECT k, sum(v) AS v FROM wf_i GROUP BY k "
        "ORDER BY k WITH FILL INTERPOLATE (v AS v + 5)"
    ).collect()
    assert [(r.k, r.v) for r in rows2] == [
        (1, 10), (2, 15), (3, 20), (4, 40), (5, 45), (6, 60),
    ]

    # leading fill rows before the first original keep the default
    rows3 = run(
        spark, "SELECT k, sum(v) AS v FROM wf_i GROUP BY k "
        "ORDER BY k WITH FILL FROM -1 INTERPOLATE (v AS v + 5)"
    ).collect()
    assert [(r.k, r.v) for r in rows3][:3] == [(-1, 0), (0, 0), (1, 10)]

    # multiplicative form + explicit AS-self carry, parsed together
    rows4 = run(
        spark, "SELECT k, sum(v) AS v, sum(w) AS w FROM wf_i GROUP BY k "
        "ORDER BY k WITH FILL INTERPOLATE (v AS v * 2, w AS w)"
    ).collect()
    assert [(r.k, r.v, r.w) for r in rows4] == [
        (1, 10, 100), (2, 20, 100), (3, 40, 100), (4, 40, 400),
        (5, 80, 400), (6, 60, 600),
    ]

    # FROM/TO/STEP compose with INTERPOLATE
    rows5 = run(
        spark, "SELECT k, sum(v) AS v FROM wf_i GROUP BY k "
        "ORDER BY k WITH FILL FROM 1 TO 8 STEP 2 INTERPOLATE (v)"
    ).collect()
    assert [(r.k, r.v) for r in rows5] == [
        (1, 10), (3, 10), (4, 40), (5, 40), (6, 60), (7, 60),
    ]

    # gates: non-linear expression, unknown column, the fill key itself
    df = spark.createDataFrame([(1, 10)], "k int, v long")
    with pytest.raises(ValueError, match="linear"):
        with_fill(df, "k", stop=F.lit(4), interpolate={"v": "v * v"})
    with pytest.raises(ValueError, match="unknown column"):
        with_fill(df, "k", stop=F.lit(4), interpolate={"z": None})
    with pytest.raises(ValueError, match="fill key"):
        with_fill(df, "k", stop=F.lit(4), interpolate={"k": None})


def test_translate_week_start_functions(spark):
    """toStartOfWeek defaults to SUNDAY-start in ClickHouse (mode 0);
    toMonday is the Monday round-down. Verified over two full years
    against pure-Python date arithmetic."""
    import datetime as dt

    rows = spark.sql(
        "SELECT d, "
        + translate("toStartOfWeek(d)") + " AS sun, "
        + translate("toMonday(d)") + " AS mon FROM "
        "(SELECT explode(sequence(DATE '2023-01-01', DATE '2024-12-31')) AS d)"
    ).collect()
    for r in rows:
        # Python weekday(): Monday=0..Sunday=6
        exp_sun = r.d - dt.timedelta(days=(r.d.weekday() + 1) % 7)
        exp_mon = r.d - dt.timedelta(days=r.d.weekday())
        assert r.sun == exp_sun, (r.d, r.sun, exp_sun)
        assert r.mon == exp_mon, (r.d, r.mon, exp_mon)


def test_translate_format_datetime(spark):
    """formatDateTime %-codes → date_format patterns (CH 21.3
    semantics: %M is minute), literal letter runs pattern-quoted,
    ISO-week codes and timezone arg gated."""
    r = spark.sql(
        "SELECT "
        + translate(
            "formatDateTime(toDateTime('2024-03-07 13:45:06'), "
            "'%Y-%m-%d %H:%M:%S')"
        ) + " AS iso, "
        + translate(
            "formatDateTime(toDateTime('2024-03-07 13:45:06'), "
            "'%d/%m/%y at %Hh')"
        ) + " AS lit, "
        + translate(
            "formatDateTime(toDate('2024-03-07'), '%F week %a %% %j')"
        ) + " AS mix, "
        + translate(
            "formatDateTimeInJodaSyntax(toDateTime('2024-03-07 13:45:06'), "
            "'yyyy/MM/dd HH:mm')"
        ) + " AS joda"
    ).collect()[0]
    assert r.iso == "2024-03-07 13:45:06"
    assert r.lit == "07/03/24 at 13h"
    assert r.mix == "2024-03-07 week Thu % 067"
    assert r.joda == "2024/03/07 13:45"
    with pytest.raises(ValueError, match="ISO-week"):
        translate("formatDateTime(d, '%V')")
    with pytest.raises(ValueError, match="timezone"):
        translate("formatDateTime(d, '%Y', 'UTC')")
    with pytest.raises(ValueError, match="literal format"):
        translate("formatDateTime(d, f)")


def test_translate_limit_with_ties(spark):
    """LIMIT n WITH TIES (round-3b): the first n rows in sort order plus
    every row tied with the n-th on the sort key — rank() <= n. Spark's
    parser rejects WITH TIES, so passthrough would break at execution."""
    spark.createDataFrame(
        [("a", 9), ("b", 9), ("c", 5), ("d", 5), ("e", 3)], "g string, v int"
    ).createOrReplaceTempView("ch_ties")
    rows = spark.sql(
        translate("SELECT g, v FROM ch_ties ORDER BY v DESC LIMIT 1 WITH TIES")
    ).collect()
    assert sorted((r.g, r.v) for r in rows) == [("a", 9), ("b", 9)]
    rows = spark.sql(
        translate("SELECT g, v FROM ch_ties ORDER BY v DESC LIMIT 3 WITH TIES")
    ).collect()
    assert sorted((r.g, r.v) for r in rows) == [
        ("a", 9), ("b", 9), ("c", 5), ("d", 5)
    ]
    # nested form rewrites inside its own span
    rows = spark.sql(
        translate(
            "SELECT count(*) AS n FROM "
            "(SELECT g, v FROM ch_ties ORDER BY v DESC LIMIT 1 WITH TIES) q"
        )
    ).collect()
    assert rows[0].n == 2
    with pytest.raises(ValueError, match="ORDER BY"):
        translate("SELECT g FROM ch_ties LIMIT 2 WITH TIES")


def test_translate_time_bucket_functions(spark):
    """Fixed-width bucket floors (round-3b): five/ten/fifteen-minute,
    timeSlot (30 min), toStartOfInterval with literal intervals (epoch
    anchored; week anchors Monday like CH; month/year return dates),
    toTime (time-of-day on 1970-01-02), toRelative*Num (whole units
    since the epoch). splitByChar treats the separator as a literal."""
    r = spark.sql("SELECT TIMESTAMP'2024-03-15 13:47:29' AS ts").selectExpr(
        translate("toStartOfFiveMinute(ts)") + " AS m5",
        translate("timeSlot(ts)") + " AS slot",
        translate("toStartOfInterval(ts, INTERVAL 10 MINUTE)") + " AS i10",
        translate("toStartOfInterval(ts, INTERVAL 1 WEEK)") + " AS w1",
        translate("toStartOfInterval(ts, INTERVAL 3 MONTH)") + " AS mo3",
        translate("toTime(ts)") + " AS tt",
        translate("toRelativeDayNum(ts)") + " AS rd",
        translate("splitByChar('.', 'a.b.c')") + " AS sc",
        translate("alphaTokens('ab1cd')") + " AS at",
    ).collect()[0]
    assert str(r.m5) == "2024-03-15 13:45:00"
    assert str(r.slot) == "2024-03-15 13:30:00"
    assert str(r.i10) == "2024-03-15 13:40:00"
    assert str(r.w1) == "2024-03-11 00:00:00"  # Monday anchor
    assert str(r.mo3) == "2024-01-01"
    assert str(r.tt) == "1970-01-02 13:47:29"
    assert r.rd == 19797
    assert r.sc == ["a", "b", "c"] and r.at == ["ab", "cd"]
    with pytest.raises(ValueError, match="INTERVAL"):
        translate("toStartOfInterval(ts, x)")


def test_translate_json_extract_type_defaults(spark):
    """CH JSONExtract* returns the TYPE DEFAULT on missing keys or
    wrong-typed values ('' / 0 / 0.0 / false), never NULL (round-3b:
    coalesce + try_cast — correct in ANSI and legacy sessions)."""
    r = spark.sql(
        "SELECT "
        + translate("""JSONExtractString('{"a": "x"}', 'b')""") + " AS s, "
        + translate("""JSONExtractInt('{"a": 7}', 'b')""") + " AS i, "
        + translate("""JSONExtractInt('{"a": "str"}', 'a')""") + " AS iw, "
        + translate("""JSONExtractFloat('{"a": 1.5}', 'a')""") + " AS f, "
        + translate("""JSONExtractBool('{"a": true}', 'b')""") + " AS b"
    ).collect()[0]
    assert r.s == "" and r.i == 0 and r.iw == 0 and r.b is False
    assert abs(r.f - 1.5) < 1e-9


def test_translate_orzero_ornull_casts_and_maps(spark):
    """to<T>OrZero/OrNull (round-3b): unparseable input becomes the CH
    type default / NULL via try_cast (ANSI-safe); accurateCastOrNull
    takes the type name as a literal; Map functions map to Spark's."""
    r = spark.sql(
        "SELECT "
        + translate("toInt32OrZero('abc')") + " AS z, "
        + translate("toInt32OrZero('42')") + " AS v, "
        + translate("toInt64OrNull('xy')") + " AS n, "
        + translate("toDateOrZero('nope')") + " AS d, "
        + translate("accurateCastOrNull('9', 'Int64')") + " AS ac, "
        + translate("mapKeys(map('a', 1))") + " AS mk, "
        + translate("mapContains(map('a', 1), 'b')") + " AS mc"
    ).collect()[0]
    assert r.z == 0 and r.v == 42 and r.n is None
    assert str(r.d) == "1970-01-01" and r.ac == 9
    assert r.mk == ["a"] and r.mc is False
    with pytest.raises(ValueError, match="unmapped target type"):
        translate("accurateCastOrNull(x, 'Array(Int64)')")


def test_translate_date_arithmetic_and_geo(spark):
    """Round-3b: dateAdd/dateSub with unit keyword or string, age()
    (complete elapsed units — the complement of dateDiff's boundary
    crossings), toLastDayOfMonth, yesterday, month/date names, and the
    haversine greatCircleDistance; geoDistance/pointInPolygon gate."""
    r = spark.sql(
        "SELECT "
        + translate("dateAdd('day', 3, DATE'2024-01-01')") + " AS da, "
        + translate("dateSub(MONTH, 1, DATE'2024-03-15')") + " AS ds, "
        + translate("toLastDayOfMonth(DATE'2024-02-10')") + " AS ld, "
        + translate("age('month', DATE'2024-01-31', DATE'2024-03-01')") + " AS ag, "
        + translate("dateDiff('month', DATE'2024-01-31', DATE'2024-03-01')") + " AS dd, "
        + translate("monthName(DATE'2024-02-10')") + " AS mn, "
        + translate("dateName('weekday', DATE'2024-02-10')") + " AS wd, "
        + translate("greatCircleDistance(-0.1278, 51.5074, 2.3522, 48.8566)") + " AS gc"
    ).collect()[0]
    assert str(r.da).startswith("2024-01-04")
    assert str(r.ds).startswith("2024-02-15")
    assert str(r.ld) == "2024-02-29"
    assert r.ag == 1 and r.dd == 2  # age: complete months; dateDiff: boundaries
    assert r.mn == "February" and r.wd == "Saturday"
    assert abs(r.gc - 343_653) < 1000  # London-Paris
    with pytest.raises(ValueError, match="greatCircleDistance"):
        translate("geoDistance(0.0, 0.0, 1.0, 1.0)")
    # r5: pointInPolygon is a real mapping now (even-odd ray cast;
    # semantics pinned in test_dialect_semantics.py) — the 1-arg form
    # still gates
    with pytest.raises(ValueError, match="pointInPolygon"):
        translate("pointInPolygon((1,2))")


def test_translate_format_readable(spark):
    """formatReadableSize/Quantity (round-3b): CH's two-decimal
    human-readable forms; toTypeName gates (CH type names have no Spark
    equivalents); currentDatabase maps."""
    r = spark.sql(
        "SELECT "
        + translate("formatReadableSize(1536)") + " AS k, "
        + translate("formatReadableSize(3221225472)") + " AS g, "
        + translate("formatReadableSize(512)") + " AS b, "
        + translate("formatReadableQuantity(1234567)") + " AS q, "
        + translate("currentDatabase()") + " AS db"
    ).collect()[0]
    assert r.k == "1.50 KiB" and r.g == "3.00 GiB" and r.b == "512.00 B"
    assert r.q == "1.23 million" and r.db == "default"
    # toTypeName introspects with Spark's type vocabulary (the
    # reference docs use it on state columns; the purpose — what type
    # is this — is served, the names differ by design)
    assert translate("toTypeName(x)") == "typeof(x)"
    assert spark.sql("SELECT " + translate("toTypeName(1)") + " AS t").collect()[0].t == "int"


def test_translate_window_funnel(spark):
    """Round-4: windowFunnel(w)(ts, conds…) translates to a single
    fold expression with ClickHouse's exact base-mode semantics — in
    particular the multi-chain scan: a LATER cond-1 event can open a
    deeper chain (u1 below is the case where the deliberate
    first-chance rule of funnel.funnel_levels reports 2 but CH
    reports 3). Window is inclusive and counts from the CHAIN START,
    not the previous stage (u7); unknown modes raise (strict modes
    translate as of round 5 — see
    test_window_funnel_strict_modes_match_python_reference)."""
    import pytest as _pytest

    rows = [
        # u1: first chain dies (c never within 10 of t=0); chain at
        # t=100 completes all three stages
        (1, 0, "a"), (1, 1, "b"), (1, 100, "a"), (1, 101, "b"), (1, 102, "c"),
        (2, 0, "a"), (2, 10, "b"),   # boundary inclusive -> 2
        (3, 0, "a"), (3, 11, "b"),   # boundary exceeded -> 1
        (4, 0, "b"), (4, 5, "a"),    # out of order -> 1
        (5, 3, "z"),                 # nothing matches -> 0
        (6, 7, "a"), (6, 7, "b"),    # same-second tie, level order -> 2
        (7, 0, "a"), (7, 8, "b"), (7, 12, "c"),  # 12 > 0+10 -> 2
    ]
    spark.createDataFrame(
        rows, "uid int, t long, etype string"
    ).createOrReplaceTempView("ch_wf")
    out = spark.sql(
        translate(
            "SELECT uid, windowFunnel(10)(t, etype = 'a', etype = 'b', "
            "etype = 'c') AS level FROM ch_wf GROUP BY uid"
        )
    ).collect()
    got = {r.uid: r.level for r in out}
    assert got == {1: 3, 2: 2, 3: 1, 4: 1, 5: 0, 6: 2, 7: 2}
    with _pytest.raises(ValueError, match="unknown mode"):
        translate("SELECT windowFunnel(10, 'nonsense')(t, x = 1) FROM ch_wf")


def test_rollup_cube_passthrough(spark):
    """``GROUP BY … WITH ROLLUP / WITH CUBE``: ClickHouse and Spark
    share the syntax, so translate() passes it through — pinned here so
    a future clause rewrite can't break it. Subtotal rows carry NULL
    keys in Spark where ClickHouse uses type defaults (0/''): the same
    documented divergence as the WITH TOTALS mapping."""
    spark.createDataFrame(
        [(1, "x", 2), (1, "y", 3), (2, "x", 4)], "a int, b string, v int"
    ).createOrReplaceTempView("ch_rollup")
    r = spark.sql(
        translate(
            "SELECT a, b, sum(v) AS s FROM ch_rollup "
            "GROUP BY a, b WITH ROLLUP ORDER BY a, b"
        )
    ).collect()
    assert (r[0].a, r[0].b, r[0].s) == (None, None, 9)  # grand total
    assert (r[1].a, r[1].b, r[1].s) == (1, None, 5)     # a=1 subtotal
    c = spark.sql(
        translate(
            "SELECT a, b, sum(v) AS s FROM ch_rollup "
            "GROUP BY a, b WITH CUBE ORDER BY a, b"
        )
    ).collect()
    assert len(c) == 8  # cube adds the b-only slices


def test_translate_sequence_functions(spark):
    """Round-4: sequenceMatch/sequenceCount translate for the
    .*-separated subsequence grammar — sequenceMatch is the
    windowFunnel fold with an infinite window (greedy subsequence
    existence), sequenceCount adds a completion counter that resets the
    chain (CH's non-overlapping 'search next after match' rule).
    Pattern indices may reference conditions in any order."""
    rows = [
        (1, 0, "a"), (1, 5, "b"), (1, 10, "a"), (1, 20, "b"),  # 2 chains
        (2, 0, "b"), (2, 5, "a"),                              # wrong order
        (3, 0, "a"), (3, 1, "a"), (3, 2, "b"),                 # overlap: 1
        (6, 0, "a"), (6, 1, "b"), (6, 2, "a"),
        (6, 3, "b"), (6, 4, "a"), (6, 5, "b"),                 # 3 chains
    ]
    spark.createDataFrame(
        rows, "uid int, t long, etype string"
    ).createOrReplaceTempView("ch_seq")
    m = {
        r.uid: r.m
        for r in spark.sql(
            translate(
                "SELECT uid, sequenceMatch('(?1).*(?2)')(t, etype='a', "
                "etype='b') AS m FROM ch_seq GROUP BY uid"
            )
        ).collect()
    }
    assert m == {1: 1, 2: 0, 3: 1, 6: 1}
    c = {
        r.uid: r.c
        for r in spark.sql(
            translate(
                "SELECT uid, sequenceCount('(?1).*(?2)')(t, etype='a', "
                "etype='b') AS c FROM ch_seq GROUP BY uid"
            )
        ).collect()
    }
    assert c == {1: 2, 2: 0, 3: 1, 6: 3}
    # reversed pattern refs: (?2).*(?1) = b then a
    rev = {
        r.uid: r.m
        for r in spark.sql(
            translate(
                "SELECT uid, sequenceMatch('(?2).*(?1)')(t, etype='a', "
                "etype='b') AS m FROM ch_seq GROUP BY uid"
            )
        ).collect()
    }
    assert rev == {1: 1, 2: 1, 3: 0, 6: 1}
    # single-condition count = plain conditional count
    c1 = {
        r.uid: r.c
        for r in spark.sql(
            translate(
                "SELECT uid, sequenceCount('(?1)')(t, etype='a') AS c "
                "FROM ch_seq GROUP BY uid"
            )
        ).collect()
    }
    assert c1 == {1: 2, 2: 1, 3: 2, 6: 3}
    with pytest.raises(ValueError, match="only .* conditions given"):
        translate("SELECT sequenceMatch('(?3).*(?1)')(t, a=1, b=1) FROM ch_seq")


def test_window_funnel_and_sequence_count_match_python_reference(spark):
    """Round-4 bulk randomized check: 300 random per-user event sets
    (timestamp collisions and overlapping conditions included) run
    through the translated windowFunnel / sequenceCount folds must
    match a direct pure-Python implementation of the algorithms
    (entries sorted by (t, level); windowFunnel propagates chain-start
    timestamps, sequenceCount resets on completion)."""
    import random

    rng = random.Random(0xC4)
    rows, want_wf, want_sc = [], {}, {}
    W, N = 10, 3
    for uid in range(300):
        n_ev = rng.randint(0, 12)
        evs = []
        for _ in range(n_ev):
            t = rng.randint(0, 40)
            lv = rng.randint(1, N)
            evs.append((t, lv))
            rows.append((uid, t, lv))
        evs.sort()
        # reference windowFunnel fold
        et = [None] * N
        for t, e in evs:
            if e == 1:
                et[0] = t
            elif et[e - 2] is not None and t <= et[e - 2] + W:
                et[e - 1] = et[e - 2]
        want_wf[uid] = sum(1 for x in et if x is not None)
        # reference sequenceCount fold (no window, reset on completion)
        et2, cnt = [None] * N, 0
        for t, e in evs:
            if e == 1:
                if N == 1:
                    cnt += 1
                else:
                    et2[0] = t
            elif et2[e - 2] is not None:
                if e == N:
                    cnt += 1
                    et2 = [None] * N
                else:
                    et2[e - 1] = et2[e - 2]
        want_sc[uid] = cnt
    spark.createDataFrame(
        rows, "uid int, t long, lv int"
    ).createOrReplaceTempView("ch_wf_fuzz")
    out = spark.sql(
        translate(
            f"SELECT uid, windowFunnel({W})(t, lv = 1, lv = 2, lv = 3) "
            "AS wf, sequenceCount('(?1).*(?2).*(?3)')(t, lv = 1, lv = 2, "
            "lv = 3) AS sc FROM ch_wf_fuzz GROUP BY uid"
        )
    ).collect()
    got_wf = {r.uid: r.wf for r in out}
    got_sc = {r.uid: r.sc for r in out}
    bad_wf = {u: (got_wf[u], want_wf[u]) for u in got_wf if got_wf[u] != want_wf[u]}
    bad_sc = {u: (got_sc[u], want_sc[u]) for u in got_sc if got_sc[u] != want_sc[u]}
    assert not bad_wf, f"windowFunnel mismatches: {dict(list(bad_wf.items())[:5])}"
    assert not bad_sc, f"sequenceCount mismatches: {dict(list(bad_sc.items())[:5])}"
    # users with zero events don't appear in the grouped output — the
    # graded query's GROUP BY user over the full table covers level 0


def _ref_window_funnel(evs, window, preds, so=False, sd=False, si=False):
    """Pure-Python replay of ClickHouse's windowFunnel state machine
    (AggregateFunctionWindowFunnel.h getEventLevel, public source):
    entries sorted by (t, level); per level (chain_start, last_matched)
    timestamps; early returns for full completion,
    strict_deduplication's repeat interrupt (returns the repeated
    level), strict_order's out-of-order / untracked-event interrupts
    (untracked rows become sentinel level-0 entries)."""
    n = len(preds)
    entries = []
    for t, v in evs:
        matched = [i + 1 for i, p in enumerate(preds) if p(v)]
        entries.extend((t, e) for e in matched)
        if so and not matched:
            entries.append((t, 0))
    entries.sort()
    ets = [None] * n
    fe = False
    for t, e in entries:
        if e == 0:
            if fe:
                break
            continue
        if e == 1:
            ets[0] = (t, t)
            fe = True
        elif sd and ets[e - 1] is not None:
            return e
        elif so and fe and ets[e - 2] is None:
            return sum(1 for x in ets if x is not None)
        elif ets[e - 2] is not None:
            ok = t <= ets[e - 2][0] + window
            if si:
                ok = ok and ets[e - 2][1] < t
            if ok:
                ets[e - 1] = (ets[e - 2][0], t)
                if e == n:
                    return n
    return sum(1 for x in ets if x is not None)


def test_window_funnel_strict_modes_match_python_reference(spark):
    """Round-5: every strict-mode combination of the translated
    windowFunnel fold vs the pure-Python CH state machine, over 200
    random per-user event streams including timestamp collisions,
    untracked events (lv = 4 matches no condition — strict_order's
    sentinel path) and overlapping conditions (lv <= 2 overlaps
    lv = 1)."""
    import random

    rng = random.Random(0x5F1C7)
    rows = []
    streams = {}
    for uid in range(200):
        evs = []
        for _ in range(rng.randint(1, 14)):
            t = rng.randint(0, 30)
            lv = rng.randint(1, 4)
            evs.append((t, lv))
            rows.append((uid, t, lv))
        streams[uid] = sorted(evs)
    spark.createDataFrame(
        rows, "uid int, t long, lv int"
    ).createOrReplaceTempView("ch_wf_strict_fuzz")
    W = 8
    preds = [lambda v: v == 1, lambda v: v <= 2, lambda v: v == 3]
    conds = "lv = 1, lv <= 2, lv = 3"
    combos = [
        ("'strict_order'", dict(so=True)),
        ("'strict_deduplication'", dict(sd=True)),
        ("'strict_increase'", dict(si=True)),
        ("'strict_order', 'strict_deduplication'", dict(so=True, sd=True)),
        ("'strict_order', 'strict_increase'", dict(so=True, si=True)),
        ("'strict_deduplication', 'strict_increase'", dict(sd=True, si=True)),
        (
            "'strict_order', 'strict_deduplication', 'strict_increase'",
            dict(so=True, sd=True, si=True),
        ),
    ]
    sels = ", ".join(
        f"windowFunnel({W}, {modes})(t, {conds}) AS m{i}"
        for i, (modes, _) in enumerate(combos)
    )
    out = spark.sql(
        translate(
            f"SELECT uid, {sels} FROM ch_wf_strict_fuzz GROUP BY uid"
        )
    ).collect()
    for i, (modes, kw) in enumerate(combos):
        got = {r.uid: r[f"m{i}"] for r in out}
        want = {
            u: _ref_window_funnel(evs, W, preds, **kw)
            for u, evs in streams.items()
        }
        bad = {u: (got[u], want[u]) for u in got if got[u] != want[u]}
        assert not bad, f"[{modes}] mismatches: {dict(list(bad.items())[:5])}"
    # 'strict' is the deprecated CH alias for strict_deduplication
    assert translate(
        f"windowFunnel({W}, 'strict')(t, lv = 1, lv = 2)"
    ) == translate(f"windowFunnel({W}, 'strict_deduplication')(t, lv = 1, lv = 2)")
    with pytest.raises(ValueError, match="unknown mode"):
        translate("windowFunnel(10, 'strictest')(t, lv = 1)")


def test_parameterized_form_on_plain_mapping_raises():
    """Round-4 regression: name(params)(args) where the name has only a
    plain mapping used to translate the params group alone and leave
    the trailing (args) — silent mistranslation (uniqCombined64(12)(x)
    became approx_count_distinct(12)(x)). Registered parameterized
    forms translate; unregistered ones raise."""
    assert translate("uniqCombined64(12)(x)") == (
        "approx_count_distinct(x, 0.016250)"
    )
    with pytest.raises(ValueError, match="parameterized form"):
        translate("toDate(12)(x)")
    # legitimate adjacent-paren shapes are untouched
    assert translate("sum(x) OVER (PARTITION BY g)") == (
        "sum(x) OVER (PARTITION BY g)"
    )


def test_parameterized_if_combinator(spark):
    """Round-4: -If on parameterized aggregates — NameIf(p)(args…, cond)
    wraps every value argument in CASE WHEN cond THEN arg END (all
    parameterized mappings skip NULL inputs, so the wrap IS the row
    filter). quantileExactIf keeps the exact rank rule over the
    filtered rows."""
    spark.createDataFrame(
        [(i, i % 2) for i in range(1, 11)], "x int, p int"
    ).createOrReplaceTempView("ch_pif")
    r = spark.sql(
        translate(
            "SELECT quantileExactIf(0.5)(x, p = 1) AS q, "
            "topKIf(2)(x, x <= 4) AS t, "
            "uniqCombinedIf(12)(x, p = 0) AS u FROM ch_pif"
        )
    ).collect()[0]
    assert r.q == 5  # odds 1,3,5,7,9 -> floor(0.5*5)+1 = 3rd = 5
    assert sorted(r.t) == [1, 2]
    assert r.u == 5
    with pytest.raises(ValueError, match="trailing condition"):
        translate("quantileIf(0.5)(x)")


def test_distinct_and_arg_if_combinators(spark):
    """Round-4: -Distinct combinator (sum/count/avgDistinct) and
    argMaxIf/argMinIf (wrapping the ordering argument is the row
    filter — max_by/min_by skip NULL orderings)."""
    spark.createDataFrame(
        [(1, 10, 0), (2, 20, 1), (3, 30, 1), (2, 5, 1)],
        "x int, o int, p int",
    ).createOrReplaceTempView("ch_dcomb")
    r = spark.sql(
        translate(
            "SELECT sumDistinct(x) AS sd, countDistinct(x) AS cd, "
            "avgDistinct(x) AS ad, argMaxIf(x, o, p = 1) AS amx, "
            "argMinIf(x, o, p = 1) AS amn FROM ch_dcomb"
        )
    ).collect()[0]
    assert (r.sd, r.cd, r.ad, r.amx, r.amn) == (6, 3, 2.0, 3, 2)


def test_topk_matches_python_reference(spark):
    """Round-4 bulk randomized check: 200 random multisets through the
    translated topK/topKWeighted run-length folds must match a direct
    Counter-based reference (frequency descending, value ascending
    tiebreak; weighted form sums weights and skips NULL values)."""
    import random
    from collections import Counter

    rng = random.Random(0x7C)
    rows, want, want_w = [], {}, {}
    for g in range(200):
        vals = [rng.randint(0, 8) for _ in range(rng.randint(1, 15))]
        wts = [rng.randint(1, 5) for _ in vals]
        for v, w in zip(vals, wts):
            rows.append((g, v, w))
        c = Counter(vals)
        want[g] = [v for v, _ in sorted(c.items(), key=lambda t: (-t[1], t[0]))][:3]
        cw = Counter()
        for v, w in zip(vals, wts):
            cw[v] += w
        want_w[g] = [v for v, _ in sorted(cw.items(), key=lambda t: (-t[1], t[0]))][:3]
    spark.createDataFrame(
        rows, "g int, v int, w int"
    ).createOrReplaceTempView("ch_topk_fuzz")
    out = spark.sql(
        translate(
            "SELECT g, topK(3)(v) AS t, topKWeighted(3)(v, w) AS tw "
            "FROM ch_topk_fuzz GROUP BY g"
        )
    ).collect()
    bad = [
        (r.g, r.t, want[r.g])
        for r in out
        if list(r.t) != want[r.g] or list(r.tw) != want_w[r.g]
    ]
    assert not bad, bad[:5]


def test_dialect_udfs_survive_streaming_session_clone(spark, tmp_path):
    """After ANY Structured Streaming query runs, getActiveSession()
    on the main thread returns the micro-batch CLONE — dialect UDF
    registration must still land on the DEFAULT session the caller's
    spark.sql uses (r7: sequenceMatch guard queries failed with
    UNRESOLVED_ROUTINE whenever a streaming query ran earlier in the
    process)."""
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.functions.dialect import translate

    land = str(tmp_path / "land")
    spark.range(10).select(
        F.col("id").alias("u"),
        F.col("id").cast("timestamp").alias("ts"),
        (F.col("id") % 2 == 0).alias("a"),
    ).write.parquet(land)
    def _noop(batch, epoch):
        batch.count()  # touches batch.sparkSession (the clone)

    q = (
        spark.readStream.schema("u long, ts timestamp, a boolean")
        .parquet(land)
        .writeStream.foreachBatch(_noop)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # (whether the clone is left active is version/timing-dependent —
    # the CONTRACT under test is only that the dialect query below
    # resolves on the default session either way)
    spark.range(5).select(
        (F.col("id") % 3).alias("u"),
        F.col("id").cast("timestamp").alias("ts"),
        (F.col("id") % 2 == 0).alias("a"),
        (F.col("id") % 2 == 1).alias("b"),
    ).createOrReplaceTempView("seq_clone_t")
    out = spark.sql(translate(
        "SELECT u, sequenceMatch('(?1)(?t<=10)(?2)')(ts, a, b) AS m "
        "FROM seq_clone_t GROUP BY u"
    )).collect()
    assert len(out) == 3
