"""Graph analytics over edge frames: weighted PageRank by power
iteration.

Curation pipelines use link-graph centrality as a document-quality
prior (Common-Crawl-derived corpora rank hosts by harmonic centrality
/ PageRank — e.g. the public CC web-graph releases); this implements
the standard damped power iteration (Page et al. 1999) in the
no-dangling-redistribution variant:

    rank'(v) = (1 - d) + d * sum over in-edges (u,v) of
               rank(u) * w(u,v) / out_weight(u)

Each iteration is ONE keyed join (edges x current ranks on src) and
ONE map-side-combinable sum keyed on dst — the canonical 2-shuffle
PageRank step; out-weights are computed once. Ranks converge
geometrically, so a fixed small iteration count is the deterministic,
unrollable form (the DuckDB oracle replays every iteration as chained
CTEs). Transitive-closure connected components live in
operators/components.py; this adds the centrality half of the graph
family.

Determinism (r6): ranks are carried as integer NANO-UNITS. The
per-node mass sum would otherwise merge partial double sums in
unpinned shuffle order (FP addition isn't associative), making a
6dp-rounded output flip run-to-run near a boundary. Each edge
contribution ``share * rank_nano`` is one double product of
bit-identical inputs (share = exact-count division) rounded to a
BIGINT; the sum is exact, and the damping step re-quantizes once per
iteration. Quantization error ≤ 0.5e-9 per step — invisible at the
6dp grading precision — and the DuckDB oracle replays the identical
integer recursion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.scalar import round_half_away_long


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iters`` damped power iterations from
    rank = 1. Multi-edges are honored via ``weight`` (None = every
    edge weighs 1); nodes with no out-edges contribute nothing (their mass
    is not redistributed — the variant is pinned so independent
    engines agree exactly). Ranks ride as integer nano-units
    internally (exact sums, shuffle-order-independent); the returned
    ``rank`` is the single final division ``rank_nano / 1e9``."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        w.alias("w"),
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("wout"))
    e_norm = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("wout")).alias("share")
    )
    # The loop below reuses e_norm/nodes every iteration; without a
    # materialization each iteration's lineage re-derives the whole
    # edge build (for item_pagerank: events scan + lead() window +
    # groupBy, 5x over) and the unrolled plan carried 150 Exchange /
    # 44 Window nodes. Checkpoint e_norm once, pre-partitioned on the
    # join key, and derive nodes FROM the checkpointed edges (same
    # node set; avoids a second pass over the raw lineage) so the
    # per-iteration joins and the groupBy(dst) → join(node) chain
    # reuse partitioning instead of re-shuffling (guide §2.4). The
    # materialized normalized edge list is also the right 100 TB
    # shape — one write, five reads, instead of five recomputes.
    sp = edges.sparkSession
    n_part = sp.sparkContext.defaultParallelism
    e_norm = e_norm.repartition(n_part, "src").localCheckpoint(eager=True)
    nodes = (
        e_norm.select(F.col("src").alias("node"))
        .union(e_norm.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(n_part, "node")
        .localCheckpoint(eager=True)
    )
    base_nano = int(round((1.0 - damping) * 1e9))
    ranks = nodes.select(
        "node", F.lit(1_000_000_000).cast("long").alias("rank_nano")
    )
    for _ in range(iters):
        contrib = (
            e_norm.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy("dst")
            .agg(
                F.sum(
                    round_half_away_long(F.col("share") * F.col("rank_nano"))
                ).alias("mass_nano")
            )
        )
        ranks = (
            nodes.join(
                contrib.withColumnRenamed("dst", "node"), "node", "left"
            )
            .select(
                "node",
                (
                    F.lit(base_nano)
                    + round_half_away_long(
                        F.lit(damping)
                        * F.coalesce("mass_nano", F.lit(0))
                    )
                ).alias("rank_nano"),
            )
        )
    return ranks.select(
        "node", (F.col("rank_nano") / 1_000_000_000.0).alias("rank")
    )
