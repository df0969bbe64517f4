"""Skew-handling join utilities.

The reference's data has a deliberately skewed cohort (``uid % 13 == 0``
heavy clickers, make_user_action_001.py:71); at 100 TB a handful of hot
keys can stall a shuffle join. First line of defense is AQE's skew-join
splitting (on by default in session.py); this module adds the explicit
salting pattern for cases AQE can't rescue (e.g. a hot key joining a
non-broadcastable dimension):

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
