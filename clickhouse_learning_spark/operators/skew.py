"""Skew-handling utilities: salted joins and salted aggregation.

The reference's data has a deliberately skewed cohort (``uid % 13 == 0``
heavy clickers, make_user_action_001.py:71); at 100 TB a handful of hot
keys can stall a shuffle. The division of labor, benched at the 50M-row
2-hot-uid shape (bench.py):

- **Join skew** → AQE first (skew-split + runtime broadcast beat both
  manual salting forms in the r3 bench); :func:`salted_join` /
  :func:`targeted_salted_join` remain for dims AQE can't rescue.
- **GroupBy skew with algebraic/sketch metrics** → Spark's map-side
  partial aggregation already neutralizes it: every map task pre-merges
  its hot-key rows to ONE partial state, so the exchange carries
  O(tasks) rows per key no matter how hot the key is. AQE plays no part
  (its skew handling is join-only) and none is needed —
  ``skew_agg_plain`` vs the two-phase form shows parity in the bench.
  :func:`salted_agg` exists for the paths that DISABLE that combine
  (partial-aggregation-skip optimizations, pipelines that pre-shuffle
  on the group key).
- **GroupBy skew with custom Pandas aggregations** → the real hazard:
  ``groupBy(...).applyInPandas`` has NO map-side combine — every row of
  a group lands in one task, so a hot key is a straggler and an OOM
  risk. :func:`salted_apply_agg` restores the partial/merge split
  around the UDF: partial states on (keys, salt), merge on keys — the
  hot key fans out over ``n_salts`` tasks and the merge sees
  ``n_salts`` small states, not the raw rows.

Join salting pattern:

- the fact side gets a random salt in [0, n);
- the dimension side is exploded n ways (one copy per salt value);
- the join key becomes (key, salt) — the hot key's rows spread over n
  tasks; results are identical because every fact row still meets
  exactly one copy of its dimension row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with an ``n_salts``-way salt.
    ``dim`` is the replicated (smaller) side — its rows are duplicated
    ``n_salts`` times, so keep it the dimension. Output columns match a
    plain ``fact.join(dim, key, how)``."""
    f = fact.withColumn(SALT_COL, (F.rand(seed=7) * n_salts).cast("int"))
    d = dim.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    # Pin the strategy to a sort-merge join: salting exists for dims too
    # big to broadcast, but Catalyst's size estimate of the exploded
    # side is the PRE-explode size (generators don't scale stats), so
    # left alone it may attempt an n_salts-times-larger broadcast than
    # it planned for — observed as cannotBroadcastTableOverMaxTableBytes
    # on a 3M-row dim at n_salts=32. Merge (not shuffle_hash): the
    # replicated build side is n_salts× the dim and a per-partition hash
    # map of it OOMs under full task concurrency, while SMJ spills.
    return f.join(d.hint("merge"), [key, SALT_COL], how).drop(SALT_COL)


def detect_hot_keys(
    fact: DataFrame,
    key: str,
    sample_fraction: float = 0.001,
    min_sampled_count: int = 50,
    max_hot_keys: int = 1000,
) -> list:
    """Sample-based hot-key detection: keys whose sampled frequency
    exceeds ``min_sampled_count`` (≈ ``min_sampled_count /
    sample_fraction`` full-data rows). The sampled aggregate is tiny
    (one partial-agg pass over 0.1% of the fact) and the result is
    bounded by ``max_hot_keys`` via TakeOrdered, so the driver list
    stays O(1) no matter the fact size — hot keys are few by
    definition; if thousands of keys are "hot" the distribution isn't
    skewed and plain AQE handles it."""
    rows = (
        fact.sample(fraction=sample_fraction, seed=7)
        .groupBy(key)
        .count()
        .filter(F.col("count") >= min_sampled_count)
        .orderBy(F.col("count").desc())
        .limit(max_hot_keys)
        .collect()
    )
    return [r[key] for r in rows]


def targeted_salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    hot_keys: list | None = None,
    sample_fraction: float = 0.001,
    min_sampled_count: int = 50,
) -> DataFrame:
    """``salted_join`` that salts ONLY the hot keys: cold fact rows get
    salt 0 and cold dim rows stay single-copy, so dim replication cost
    drops from ``n_salts × |dim|`` to ``n_salts × |hot|`` (a handful of
    rows) while the hot keys still fan out over ``n_salts`` tasks. One
    join, one plan — the salt expression branches per-row instead of
    splitting hot/cold into a union of two joins, so there is no second
    scan of either input. ``hot_keys`` may be passed when known (e.g.
    from yesterday's stats); otherwise a 0.1% sample detects them."""
    if hot_keys is None:
        hot_keys = detect_hot_keys(
            fact, key, sample_fraction=sample_fraction,
            min_sampled_count=min_sampled_count,
        )
    if not hot_keys:  # nothing skewed — plain join, let AQE do its job
        return fact.join(dim, key, how)
    is_hot = F.col(key).isin(hot_keys)
    f = fact.withColumn(
        SALT_COL,
        F.when(is_hot, (F.rand(seed=7) * n_salts).cast("int")).otherwise(
            F.lit(0)
        ),
    )
    d = dim.withColumn(
        SALT_COL,
        F.explode(
            F.when(
                is_hot, F.array(*[F.lit(i) for i in range(n_salts)])
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    # merge hint for the same reason as salted_join: the exploded-side
    # stats are pre-explode, and the whole point is a non-broadcastable
    # dim. (Replication here is only n_salts × |hot|, but pinning keeps
    # the plan deterministic under AQE re-planning.)
    return f.join(d.hint("merge"), [key, SALT_COL], how).drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys,
    metrics,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation over :class:`MetricSpec` metrics:
    salt → partial states on (keys, salt) → merge+finalize on keys.
    Result equals ``df.groupBy(keys).agg(<finalized metrics>)`` for
    every algebraic/sketch metric kind (law-tested).

    When to use: Spark's own map-side partial aggregation already makes
    single-phase groupBy skew-proof for these metrics (see module
    docstring), so reach for this only where that combine is absent —
    inputs already shuffled on the group key by an upstream stage, or
    partial-aggregation-skip optimizations in play. For custom Pandas
    aggregations (the common genuinely-skew-broken path) use
    :func:`salted_apply_agg`."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn(SALT_COL, (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[m.partial() for m in metrics]
    )
    return partial.groupBy(*keys).agg(
        *[m.merged_finalized() for m in metrics]
    )


def salted_apply_agg(
    df: DataFrame,
    keys,
    partial_fn,
    partial_schema: str,
    merge_fn,
    merge_schema: str,
    n_salts: int = 16,
) -> DataFrame:
    """Salted partial/merge split around ``applyInPandas`` — the custom-
    aggregation path that Spark CANNOT map-side combine: a plain
    ``groupBy(keys).applyInPandas(fn)`` ships every raw row of a group
    to one task, so a hot key is a straggler (and, since the group
    materializes as one pandas frame, an OOM risk at 100 TB).

    - ``partial_fn(pdf) -> pdf``: per-(keys, salt) partial state —
      sees only ~1/n_salts of a hot key's rows; must emit the grouping
      ``keys`` columns plus state columns (``partial_schema``).
    - ``merge_fn(pdf) -> pdf``: per-keys merge of the ≤ n_salts partial
      state rows (``merge_schema``) — O(n_salts) rows however hot the
      key was.

    The salt column is attached before grouping and passed through to
    ``partial_fn`` (drop or ignore it there)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn(SALT_COL, (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, SALT_COL).applyInPandas(
        partial_fn, schema=partial_schema
    )
    return partial.groupBy(*keys).applyInPandas(merge_fn, schema=merge_schema)
