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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    engines agree exactly)."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        w.alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("wout"))
    e_norm = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("wout")).alias("share")
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iters):
        contrib = (
            e_norm.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("share") * F.col("rank")).alias("mass"))
        )
        ranks = (
            nodes.join(
                contrib.withColumnRenamed("dst", "node"), "node", "left"
            )
            .select(
                "node",
                (F.lit(1.0 - damping)
                 + F.lit(damping) * F.coalesce("mass", F.lit(0.0)))
                .alias("rank"),
            )
        )
    return ranks
