"""Behavioral-analytics queries — windowFunnel / retention /
sequenceMatch over the events log (functions/funnel.py; beyond-reference
additions in the spirit of ClickHouse's parametric aggregates — the
reference's own funnel is the bitmap-state variant already covered by
bitmap_funnel / ref_funnel_6stage).

Each query has a full ANSI-SQL oracle: the first-chance chain semantics
(funnel.py module docstring) were chosen precisely so the oracle is a
cascade of min-filter CTE joins rather than an imperative scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions import funnel as FN
from clickhouse_learning_spark.queries import _events, query

_W = 86400  # funnel window: 24h (gives a populated 3-level distribution
# at the fixture's per-user event density; 2h collapses to levels 0-1)


@query(
    "window_funnel_levels",
    f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (SELECT user_id, min(floor(epoch(ts))::BIGINT) AS t1
           FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(floor(epoch(e.ts))::BIGINT) AS t2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click'
             AND floor(epoch(e.ts))::BIGINT > s1.t1
             AND floor(epoch(e.ts))::BIGINT <= s1.t1 + {_W}
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(floor(epoch(e.ts))::BIGINT) AS t3
           FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase'
             AND floor(epoch(e.ts))::BIGINT > s2.t2
             AND floor(epoch(e.ts))::BIGINT <= s1.t1 + {_W}
           GROUP BY e.user_id),
    lv AS (SELECT u.user_id,
                  CASE WHEN s3.user_id IS NOT NULL THEN 3
                       WHEN s2.user_id IS NOT NULL THEN 2
                       WHEN s1.user_id IS NOT NULL THEN 1
                       ELSE 0 END AS level
           FROM u
           LEFT JOIN s1 USING (user_id)
           LEFT JOIN s2 USING (user_id)
           LEFT JOIN s3 USING (user_id))
    SELECT level, CAST(count(*) AS BIGINT) AS users
    FROM lv GROUP BY level
    """,
)
def window_funnel_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel(2h)(ts, view, click, purchase) → users per reached
    level. One shuffle on user_id; chain walk is codegen array HOFs."""
    ev = _events(spark, sf_dir)
    lv = FN.funnel_levels(
        ev,
        "uid",
        "ts",
        ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"],
        window_s=_W,
    )
    return lv.groupBy("level").agg(F.count(F.lit(1)).alias("users"))


@query(
    "retention_cohorts",
    """
    WITH f AS (
      SELECT CAST(ts AS DATE) AS day, user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS f1,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS f2,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS f3
      FROM events GROUP BY day, user_id)
    SELECT day,
           CAST(sum(f1) AS BIGINT)      AS r_view,
           CAST(sum(f1 * f2) AS BIGINT) AS r_view_click,
           CAST(sum(f1 * f3) AS BIGINT) AS r_view_purchase
    FROM f GROUP BY day
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """retention(view, click, purchase) summed per day cohort — the
    ClickHouse retention() output (r1, r1∧r2, r1∧r3) as columns."""
    ev = _events(spark, sf_dir)
    r = FN.retention_flags(
        ev,
        ["day", "uid"],
        ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"],
    )
    return r.groupBy("day").agg(
        F.sum(F.col("r1").cast("long")).alias("r_view"),
        F.sum(F.col("r2").cast("long")).alias("r_view_click"),
        F.sum(F.col("r3").cast("long")).alias("r_view_purchase"),
    )


@query(
    "with_fill_days",
    """
    WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
               FROM events),
    cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
            FROM b),
    a AS (SELECT CAST(ts AS DATE) AS day,
                 CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS val_sum
          FROM events
          WHERE event_type = 'signup' AND user_id % 37 = 0
          GROUP BY day)
    SELECT cal.day,
           CAST(coalesce(cnt, 0) AS BIGINT) AS cnt,
           CAST(coalesce(val_sum, 0) AS BIGINT) AS val_sum
    FROM cal LEFT JOIN a USING (day)
    """,
)
def with_fill_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY day WITH FILL`` — gap-filled daily series:
    a sparse rollup (rare cohort, days genuinely missing) left-joined
    onto the full calendar derived from the log's min/max day
    (``sequence`` of dates, exploded). The calendar side is a 1-row
    aggregate → broadcast; one shuffle total (the rollup's)."""
    ev = _events(spark, sf_dir)
    agg = (
        ev.filter("event_type = 'signup' AND uid % 37 = 0")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("val_sum"),
        )
    )
    cal = (
        ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    return cal.join(agg, "day", "left").select(
        "day",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.coalesce("val_sum", F.lit(0)).alias("val_sum"),
    )


@query(
    "sequence_match_share",
    """
    WITH u AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    s1 AS (SELECT CAST(ts AS DATE) AS day, user_id,
                  min(floor(epoch(ts))::BIGINT) AS t1
           FROM events WHERE event_type = 'view' GROUP BY day, user_id),
    s2 AS (SELECT CAST(e.ts AS DATE) AS day, e.user_id,
                  min(floor(epoch(e.ts))::BIGINT) AS t2
           FROM events e JOIN s1
             ON s1.user_id = e.user_id AND s1.day = CAST(e.ts AS DATE)
           WHERE e.event_type = 'signup'
             AND floor(epoch(e.ts))::BIGINT > s1.t1
           GROUP BY CAST(e.ts AS DATE), e.user_id),
    s3 AS (SELECT CAST(e.ts AS DATE) AS day, e.user_id,
                  min(floor(epoch(e.ts))::BIGINT) AS t3
           FROM events e JOIN s2
             ON s2.user_id = e.user_id AND s2.day = CAST(e.ts AS DATE)
           WHERE e.event_type = 'purchase'
             AND floor(epoch(e.ts))::BIGINT > s2.t2
           GROUP BY CAST(e.ts AS DATE), e.user_id)
    SELECT u.day,
           CAST(count(*) AS BIGINT) AS user_days,
           CAST(count(s3.user_id) AS BIGINT) AS matched
    FROM u LEFT JOIN s3 ON s3.user_id = u.user_id AND s3.day = u.day
    GROUP BY u.day
    """,
)
def sequence_match_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch('(?view).*(?signup).*(?purchase)') per (user, day)
    — active user-days and how many contained the three actions in
    strict timestamp order within that day (no window bound; the
    time-bounded variant is window_funnel_levels)."""
    ev = _events(spark, sf_dir)
    m = FN.sequence_match(
        ev,
        ["day", "uid"],
        "ts",
        ["event_type = 'view'", "event_type = 'signup'", "event_type = 'purchase'"],
    )
    return m.groupBy("day").agg(
        F.count(F.lit(1)).alias("user_days"),
        F.sum(F.col("matched").cast("long")).alias("matched"),
    )


@query(
    "top_event_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS cnt
      FROM seq WHERE e3 IS NOT NULL GROUP BY 1)
    SELECT path, CAST(cnt AS BIGINT) AS cnt FROM (
      SELECT path, cnt,
             row_number() OVER (ORDER BY cnt DESC, path) AS rn
      FROM paths)
    WHERE rn <= 10
    ORDER BY cnt DESC, path
    """,
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the 10 most common 3-step event sequences across
    all users (per-user ts-ordered lead chain — one shuffle on user_id,
    the same n-gram-over-a-window shape as text_repetition; global
    top-10 with alphabetical tie-break so the cut is deterministic).
    Ordering inside a user ties on (ts, event_id) — total, so both
    engines walk identical sequences."""
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)  # user_id arrives renamed to uid
    w = W.partitionBy("uid").orderBy("ts", "event_id")
    seq = ev.select(
        "uid",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # BOUNDED global window: the windowed set is the distinct 3-step
    # paths — at most |event_type|³ rows (5³ = 125 here), O(1) in data
    # size. Do NOT copy this shape for an unbounded set (use
    # orderBy().limit() → TakeOrderedAndProject, as vocab_top does).
    wr = W.orderBy(F.col("cnt").desc(), F.col("path"))
    return (
        paths.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") <= 10)
        .drop("_rn")
        .orderBy(F.col("cnt").desc(), "path")
    )


@query(
    "ch_window_funnel_dialect",
    f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, lvl AS e,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), lvl) AS rn
      FROM (
        SELECT user_id, ts, 1 AS lvl FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, ts, 2 FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, 3 FROM events WHERE event_type = 'purchase')
    ),
    fold AS (
      SELECT user_id, 0 AS rn, CAST(NULL AS BIGINT) AS et0,
             CAST(NULL AS BIGINT) AS et1, CAST(NULL AS BIGINT) AS et2
      FROM (SELECT DISTINCT user_id FROM events)
      UNION ALL
      SELECT f.user_id, e.rn,
             CASE WHEN e.e = 1 THEN e.t ELSE f.et0 END,
             CASE WHEN e.e = 2 AND f.et0 IS NOT NULL
                   AND e.t <= f.et0 + {_W} THEN f.et0 ELSE f.et1 END,
             CASE WHEN e.e = 3 AND f.et1 IS NOT NULL
                   AND e.t <= f.et1 + {_W} THEN f.et1 ELSE f.et2 END
      FROM fold f JOIN ev e ON e.user_id = f.user_id AND e.rn = f.rn + 1
    ),
    last AS (
      SELECT user_id,
             max_by(CASE WHEN et2 IS NOT NULL THEN 3
                         WHEN et1 IS NOT NULL THEN 2
                         WHEN et0 IS NOT NULL THEN 1 ELSE 0 END, rn) AS level
      FROM fold GROUP BY user_id)
    SELECT level, CAST(count(*) AS BIGINT) AS users
    FROM last GROUP BY level
    """,
)
def ch_window_funnel_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel`` pasted verbatim through the dialect
    shim (round-4 translation: the EXACT base-mode multi-chain fold as
    one codegen ``aggregate()`` expression — dialect._window_funnel_sql).
    This is CH's own semantics, unlike window_funnel_levels' deliberate
    first-chance rule; the oracle is an imperative replay of the same
    fold as a DuckDB recursive CTE (state = per-level chain-start
    columns, one step per (t, level)-ordered event). One shuffle on
    user_id; the fold runs inside whole-stage codegen."""
    from clickhouse_learning_spark.functions.dialect import translate
    from clickhouse_learning_spark.schemas import load_table

    load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).createOrReplaceTempView("ch_wf_events")
    ch = f"""
        SELECT level, count(*) AS users
        FROM (
          SELECT user_id,
                 windowFunnel({_W})(ts, event_type = 'view',
                                    event_type = 'click',
                                    event_type = 'purchase') AS level
          FROM ch_wf_events GROUP BY user_id)
        GROUP BY level
    """
    out = spark.sql(translate(ch))
    return out.select("level", F.col("users").cast("long").alias("users"))


@query(
    "ch_funnel_strict_dialect",
    f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
             CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                  WHEN 'purchase' THEN 3 ELSE 0 END AS e,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                        CASE event_type WHEN 'view' THEN 1
                             WHEN 'click' THEN 2
                             WHEN 'purchase' THEN 3 ELSE 0 END,
                        event_id) AS rn
      FROM events
    ),
    fold AS (
      SELECT user_id, 0 AS rn,
             CAST(NULL AS BIGINT) AS f1, CAST(NULL AS BIGINT) AS l1,
             CAST(NULL AS BIGINT) AS f2, CAST(NULL AS BIGINT) AS l2,
             CAST(NULL AS BIGINT) AS f3, CAST(NULL AS BIGINT) AS l3,
             false AS fe, CAST(NULL AS INT) AS done
      FROM (SELECT DISTINCT user_id FROM events)
      UNION ALL
      SELECT user_id, rn,
             CASE WHEN br = 'set1' THEN t ELSE f1 END,
             CASE WHEN br = 'set1' THEN t ELSE l1 END,
             CASE WHEN br = 'adv2' THEN f1 ELSE f2 END,
             CASE WHEN br = 'adv2' THEN t ELSE l2 END,
             CASE WHEN br = 'adv3' THEN f2 ELSE f3 END,
             CASE WHEN br = 'adv3' THEN t ELSE l3 END,
             fe OR br = 'set1',
             CASE WHEN done IS NOT NULL THEN done
                  WHEN br = 'halt' THEN
                    (f1 IS NOT NULL)::INT + (f2 IS NOT NULL)::INT
                    + (f3 IS NOT NULL)::INT
                  WHEN br = 'dedup2' THEN 2
                  WHEN br = 'adv3' THEN 3
                  ELSE CAST(NULL AS INT) END
      FROM (
        SELECT f.user_id, e.rn, e.t, f.f1, f.l1, f.f2, f.l2, f.f3,
               f.l3, f.fe, f.done,
               CASE
                 WHEN f.done IS NOT NULL THEN 'done'
                 WHEN e.e = 0 THEN
                   CASE WHEN f.fe THEN 'halt' ELSE 'skip' END
                 WHEN e.e = 1 THEN 'set1'
                 WHEN e.e = 2 AND f.f2 IS NOT NULL THEN 'dedup2'
                 WHEN e.e = 2 AND f.f1 IS NOT NULL
                      AND e.t <= f.f1 + {_W} AND f.l1 < e.t THEN 'adv2'
                 WHEN e.e = 3 AND f.fe AND f.f2 IS NULL THEN 'halt'
                 WHEN e.e = 3 AND f.f2 IS NOT NULL
                      AND e.t <= f.f2 + {_W} AND f.l2 < e.t THEN 'adv3'
                 ELSE 'skip'
               END AS br
        FROM fold f JOIN ev e ON e.user_id = f.user_id AND e.rn = f.rn + 1
      )
    ),
    last AS (
      SELECT user_id,
             max_by(CAST(coalesce(done,
               (f1 IS NOT NULL)::INT + (f2 IS NOT NULL)::INT
               + (f3 IS NOT NULL)::INT) AS INT), rn) AS level
      FROM fold GROUP BY user_id)
    SELECT level, CAST(count(*) AS BIGINT) AS users
    FROM last GROUP BY level
    """,
)
def ch_funnel_strict_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: ``windowFunnel`` with ALL THREE strict modes pasted
    through the dialect shim (dialect._window_funnel_strict_sql — the
    full CH state machine: per-level first/last timestamps, sentinel
    level-0 entries for untracked event types, early-termination
    ``done`` slot). ``error``/``signup`` rows exercise strict_order's
    untracked-event interrupt; same-second collisions exercise
    strict_increase; repeated clicks exercise strict_deduplication's
    repeat interrupt. The oracle replays the identical state machine
    imperatively as a DuckDB recursive CTE (branch discriminator +
    per-column CASE transitions). One shuffle on user_id; the fold is
    a single codegen aggregate() expression."""
    from clickhouse_learning_spark.functions.dialect import translate
    from clickhouse_learning_spark.schemas import load_table

    load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).createOrReplaceTempView("ch_wf_strict_events")
    ch = f"""
        SELECT level, count(*) AS users
        FROM (
          SELECT user_id,
                 windowFunnel({_W}, 'strict_order',
                              'strict_deduplication', 'strict_increase')(
                     ts, event_type = 'view', event_type = 'click',
                     event_type = 'purchase') AS level
          FROM ch_wf_strict_events GROUP BY user_id)
        GROUP BY level
    """
    out = spark.sql(translate(ch))
    return out.select(
        F.col("level").cast("int").alias("level"),
        F.col("users").cast("long").alias("users"),
    )


@query(
    "ch_sequence_dialect",
    """
    WITH s1 AS (SELECT user_id, CAST(ts AS DATE) AS day,
                       min(CAST(floor(epoch(ts)) AS BIGINT)) AS t1
                FROM events WHERE event_type = 'view'
                GROUP BY user_id, day),
    s2 AS (SELECT e.user_id, s1.day,
                  min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t2
           FROM events e JOIN s1
             ON e.user_id = s1.user_id AND CAST(e.ts AS DATE) = s1.day
           WHERE e.event_type = 'click'
             AND CAST(floor(epoch(e.ts)) AS BIGINT) >= s1.t1
           GROUP BY e.user_id, s1.day),
    s3 AS (SELECT e.user_id, s2.day,
                  min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t3
           FROM events e JOIN s2
             ON e.user_id = s2.user_id AND CAST(e.ts AS DATE) = s2.day
           WHERE e.event_type = 'purchase'
             AND CAST(floor(epoch(e.ts)) AS BIGINT) >= s2.t2
           GROUP BY e.user_id, s2.day),
    u AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    m AS (SELECT u.user_id, u.day,
                 CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END AS matched
          FROM u LEFT JOIN s3
            ON u.user_id = s3.user_id AND u.day = s3.day)
    SELECT day, CAST(sum(matched) AS BIGINT) AS matched_users,
           CAST(count(*) AS BIGINT) AS groups
    FROM m GROUP BY day
    """,
)
def ch_sequence_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')`` pasted verbatim
    through the dialect shim (round-4: the .*-separated subsequence
    grammar translates to the infinite-window fold —
    dialect._sequence_match_sql). Grouped per (user, day) so the
    fixture's outcome actually splits (~2 events per user-day: 56 of
    4006 groups match at sf0.01). The oracle is the greedy-min chain
    walk, EXACT for subsequence existence (greedy earliest match is
    optimal without time guards); non-strict >= mirrors the fold's
    level-ascending same-second tie order. One shuffle; codegen fold."""
    from clickhouse_learning_spark.functions.dialect import translate
    from clickhouse_learning_spark.schemas import load_table

    load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).createOrReplaceTempView("ch_seq_events")
    ch = """
        SELECT day, sum(matched) AS matched_users, count(*) AS groups
        FROM (
          SELECT user_id, toDate(ts) AS day,
                 sequenceMatch('(?1).*(?2).*(?3)')(
                     ts, event_type = 'view', event_type = 'click',
                     event_type = 'purchase') AS matched
          FROM ch_seq_events GROUP BY user_id, toDate(ts))
        GROUP BY day
    """
    out = spark.sql(translate(ch))
    return out.select(
        "day",
        F.col("matched_users").cast("long").alias("matched_users"),
        F.col("groups").cast("long").alias("groups"),
    )


@query(
    "ch_sequence_guard_dialect",
    """
    WITH ev AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
             CASE WHEN event_type = 'view' THEN 1 ELSE 2 END AS mo
      FROM events WHERE event_type IN ('view', 'click')),
    nxt AS (
      SELECT user_id, t, mo,
             lead(t) OVER w AS t2, lead(mo) OVER w AS mo2
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY t, mo)),
    f AS (
      SELECT user_id,
             max(CASE WHEN mo = 1 AND mo2 = 2 THEN 1 ELSE 0 END) AS m1,
             max(CASE WHEN mo = 1 AND mo2 = 2 AND t2 - t <= 3600
                      THEN 1 ELSE 0 END) AS m2,
             max(CASE WHEN mo = 1 AND mo2 = 2 AND t2 - t > 7200
                      THEN 1 ELSE 0 END) AS m3
      FROM nxt GROUP BY user_id),
    allu AS (
      SELECT u.user_id, CAST(coalesce(f.m1, 0) AS INT) AS m1,
             CAST(coalesce(f.m2, 0) AS INT) AS m2,
             CAST(coalesce(f.m3, 0) AS INT) AS m3
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN f ON f.user_id = u.user_id)
    SELECT m1, m2, m3, CAST(count(*) AS BIGINT) AS users
    FROM allu GROUP BY m1, m2, m3
    """,
)
def ch_sequence_guard_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: full-grammar ``sequenceMatch`` — strict adjacency and
    ``(?t op N)`` time guards — pasted through the dialect shim, which
    dispatches these patterns to the seqmatch.py grouped-agg Pandas
    UDF (dialect._sequence_udf_sql; the guard-free subsequence form
    stays on the JVM fold). Adjacency is over the TRACKED stream:
    purchase/error/signup rows match no condition and are invisible,
    per the CH docs' own example. The oracle derives each flag
    independently with a lead() window over the filtered stream —
    adjacent (view, click) pairs, gap-guarded — LEFT JOINed back to
    all users. Tie order (t, bitmask) matches the matcher's sort. One
    shuffle on user_id; the three patterns share one Arrow transfer
    per group."""
    from clickhouse_learning_spark.functions.dialect import translate
    from clickhouse_learning_spark.schemas import load_table

    load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).createOrReplaceTempView("ch_seq_guard_events")
    ch = """
        SELECT m1, m2, m3, count(*) AS users
        FROM (
          SELECT user_id,
                 sequenceMatch('(?1)(?2)')(
                     ts, event_type = 'view', event_type = 'click') AS m1,
                 sequenceMatch('(?1)(?t<=3600)(?2)')(
                     ts, event_type = 'view', event_type = 'click') AS m2,
                 sequenceMatch('(?1)(?t>7200)(?2)')(
                     ts, event_type = 'view', event_type = 'click') AS m3
          FROM ch_seq_guard_events GROUP BY user_id)
        GROUP BY m1, m2, m3
    """
    out = spark.sql(translate(ch))
    return out.select(
        F.col("m1").cast("int").alias("m1"),
        F.col("m2").cast("int").alias("m2"),
        F.col("m3").cast("int").alias("m3"),
        F.col("users").cast("long").alias("users"),
    )
