"""Hybrid retrieval: BM25 (sparse) + dense rankings fused with
Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009 — the fusion
every production RAG/retrieval stack reaches for first, because it
needs no score calibration between heterogeneous rankers):

    rrf(d) = Σ_over_rankings 1 / (k + rank_r(d)),  k = 60 by default.

Training-data seat: hybrid retrieval is how eval-set decontamination
and dedup candidate generation catch BOTH lexical near-copies (BM25)
and paraphrases (embeddings) in one candidate list.

Determinism discipline: each ranking's contribution is quantized to
INTEGER nano-units (round(1e9 / (k + rank)) as BIGINT) and summed
exactly — ranks are small ints, so the quantized fusion is
collision-free down to rank differences at k+rank ≈ 31623 (far beyond
any real candidate depth) while staying shuffle-order-independent for
the value hash. Fused ties break on doc id.

Scale shape: fusion is ONE union + one keyed groupBy over the
candidate lists (each already top-N per query, so the shuffle is
queries × N rows, corpus-independent); the per-query final top-k is a
window over candidates only. BM25 ranking reuses the inverted-index
shape of queries_pipeline.bm25_topk (tf/df/dl count shuffles; query
terms and df broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.scalar import round_half_away_long

RRF_K = 60
_NANO = 1_000_000_000.0


def rrf_contribution(rank_col, k: int = RRF_K):
    """Integer nano-unit RRF contribution of one ranked row."""
    return F.round(F.lit(_NANO) / (F.lit(k) + rank_col)).cast("long")


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = RRF_K,
    top_k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked candidate lists (each with ``query_col``, ``id_col``,
    ``rank_col`` 1-based) into the per-query RRF top-k. Returns
    (query_id, doc_id, rrf_nano, n_lists, rank)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(query_col),
            F.col(id_col),
            rrf_contribution(F.col(rank_col), k).alias("_c"),
        )
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionAll(p)
    fused = allr.groupBy(query_col, id_col).agg(
        F.sum("_c").alias("rrf_nano"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_nano"), F.asc(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(query_col, id_col, "rrf_nano", "n_lists",
                F.col("rank").cast("int").alias("rank"))
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k per query — the inverted-index shape of
    queries_pipeline.bm25_topk, factored for reuse: tf/dl/df count
    shuffles over the token stream, query terms + df broadcast,
    per-query window over scored candidates only. ``query_terms`` is
    (query_id, term). Determinism (ADVICE r7): each per-(doc, term)
    contribution is quantized to INTEGER micro-units before the
    distributed sum, so the accumulated score is exact and
    shuffle-order-independent (the rrf_contribution / kn_lm lp_micro
    pattern) — a raw double Σ(idf·tfn) could flip a 1e-6-rounded
    ordering when the order-dependent sum straddled a rounding
    boundary. Ranks order by the integer score with id tie-break.
    Returns (query_id, id_col, bm25, rank)."""
    from clickhouse_learning_spark.operators import text as X

    tok = docs.select(
        F.col(id_col), F.explode(X.tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # doc length = Σ tf per doc: derived from tf instead of a second
    # groupBy over the raw token stream — drops a full re-tokenize +
    # token-row shuffle (guide §2.3); docs with zero tokens are absent
    # from both forms identically (empty explode emits no rows)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfn = (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(query_terms), "term")
        .join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(
            F.sum(
                round_half_away_long((idf * tfn) * F.lit(1e6))
            ).alias("score_micro")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id", id_col,
            # emit at the lattice's OWN scale (6dp): the quotient is a
            # 6-decimal lattice point, so round-to-6 is exact on both
            # engines; rounding to fewer digits would put ~1% of values
            # exactly halfway and expose BigDecimal-vs-libm tie rules
            F.round(F.col("score_micro") / F.lit(1e6), 6).alias("bm25"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
