"""Distributed connected components over a pair/edge list.

Near-duplicate detection produces PAIRS (doc_a ~ doc_b); grouping them
into clusters needs the transitive closure — a ~ b and b ~ c puts all
three in one cluster even when a ~ c was never emitted. The single-pass
"drop every doc that pairs with a lower id" representative selection in
:func:`~clickhouse_learning_spark.operators.dedup.minhash_dedup` keeps
its documented miss (b removed for pairing with a, c kept because its
only pair was with b); this module closes that gap.

Algorithm: iterative min-label propagation. Each node starts labeled
with its own id; every round each node takes the min label over itself
and its neighbors; fixpoint = components labeled by their min member
id. Rounds are plain DataFrame joins + groupBy-min — fully codegen'd,
shuffle keyed by node id — and the round count is bounded by graph
diameter, which for near-dup clusters (tiny cliques/chains) is
single-digit: 2-4 rounds in practice. Lineage is cut with
``localCheckpoint`` each round so the plan doesn't grow across
iterations; convergence is detected with one count() action per round.
(For adversarially long-diameter graphs the logarithmic-round
variants — Rastogi et al.'s hash-to-min / two-phase large-star —
replace the one-hop step; not needed for the dedup workload this
serves.)

At 100 TB scale: node/edge frames are id-keyed shuffles; no driver-side
collect of data (only the scalar changed-count per round), no
broadcast of anything proportional to corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id in the connected component.

    ``edges`` is undirected input — each (a, b) row connects both ways.
    Plain propagation moves the min one hop per round, so the round
    count is bounded by the component diameter; raises past
    ``max_iter`` rounds (the error names the knob) rather than looping
    silently. Near-dup clusters are cliques/short chains — single-digit
    diameters — so 25 is generous.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.repartition("u").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # neighbor labels: for node u, the labels of everyone it touches
        neighbor = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .select("u", "comp")
            .groupBy("u")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor.withColumnRenamed("u", "id"), "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("comp", "old"), "id")
            .filter(F.col("comp") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no fixpoint in {max_iter} rounds — "
        "graph diameter exceeds max_iter; raise it"
    )


def dedup_cluster_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Transitive-closure dedup: keep exactly one doc (the min id) per
    near-dup cluster, all singletons untouched. ``pairs`` is any
    (id_a, id_b) frame, e.g. from
    :func:`~clickhouse_learning_spark.operators.dedup.minhash_lsh_pairs`.
    """
    comp = connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
