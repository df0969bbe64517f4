"""Training-data pipeline queries (dedup / similarity / text / multimodal).

These extend the reference's surface with the operators a 100 TB
pre-training data pipeline needs (driver BASELINE.json north star).
Registered into the same QUERIES/ORACLES registry as queries.py.

Oracle notes:
- DuckDB shingling uses scalar generate_series → list_transform →
  unnest (lateral generate_series is unsupported in DuckDB 1.0).
- Cosine similarity oracles compute the dot product manually in DOUBLE
  (``list_cosine_similarity`` works in float32 and diverges from
  Spark's float64 math in the 7th decimal).
- Jaccard/cosine values are round(x, 6) on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_learning_spark.operators import dedup as D
from clickhouse_learning_spark.queries import QUERIES
from clickhouse_learning_spark.operators import multimodal as MM
from clickhouse_learning_spark.operators import similarity as S
from clickhouse_learning_spark.operators import text as X
from clickhouse_learning_spark.queries import query
from clickhouse_learning_spark.functions.scalar import (
    round_half_away_long as _round_half_away_long,
)
from clickhouse_learning_spark.functions.scalar import (
    round_half_away_long as _money_cents,
)
from clickhouse_learning_spark.schemas import load_table

# SQL fragments shared by oracles (kept in exact lockstep with
# operators/text.py — the Python constants are the source of truth).
_TOKENS = "regexp_extract_all(lower(text), '[A-Za-z0-9]+')"
_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_SW = {
    lang: "[" + ", ".join(f"'{w}'" for w in words) + "]"
    for lang, words in X.STOPWORDS.items()
}
_SHINGLES5 = (
    f"list_distinct(list_transform(generate_series(1, greatest(length({_NORM})-4, 1)),"
    f" i -> substr({_NORM}, i::INT, 5)))"
)


# ===========================================================================
# Text analysis
# ===========================================================================


@query(
    "text_token_stats",
    f"""
    SELECT doc_id,
           CAST(len({_TOKENS}) AS INT) AS n_tokens,
           CAST(coalesce(list_sum(list_transform({_TOKENS},
                t -> ceil(length(t)/4.0)::BIGINT)), 0) AS BIGINT) AS n_bpe_tokens,
           round(CASE WHEN length(text) > 0
                 THEN length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                      / length(text) ELSE 0.0 END, 6) AS punct_ratio,
           round(CASE WHEN len({_TOKENS}) > 0
                 THEN CAST(list_sum(list_transform({_TOKENS}, t -> length(t)::BIGINT)) AS BIGINT)
                      / len({_TOKENS}) ELSE 0.0 END, 6) AS mean_word_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace-word + BPE-ish estimate), punctuation
    ratio and mean word length — the per-document feature columns of a
    pre-training quality table. Pure Catalyst expressions."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        X.token_count(t).alias("n_tokens"),
        X.bpe_token_estimate(t).alias("n_bpe_tokens"),
        F.round(X.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(X.mean_word_len(t), 6).alias("mean_word_len"),
    )


def _sw_hits_sql(lang: str) -> str:
    return f"len(list_filter({_TOKENS}, t -> list_contains({_SW[lang]}, t)))"


@query(
    "text_quality_lang",
    f"""
    WITH f AS (
      SELECT doc_id,
             len({_TOKENS}) AS n_tok,
             {_sw_hits_sql("en")} AS h_en,
             {_sw_hits_sql("de")} AS h_de,
             {_sw_hits_sql("fr")} AS h_fr,
             {_sw_hits_sql("es")} AS h_es,
             CASE WHEN length(text) > 0
                  THEN length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) / length(text)
                  ELSE 0.0 END AS p,
             CASE WHEN len({_TOKENS}) > 0
                  THEN CAST(list_sum(list_transform({_TOKENS}, t -> length(t)::BIGINT)) AS BIGINT)
                       / len({_TOKENS}) ELSE 0.0 END AS wl
      FROM documents)
    SELECT doc_id,
           round(0.35 * least((CASE WHEN n_tok > 0 THEN h_en / n_tok ELSE 0.0 END) * 3, 1.0)
                 + 0.25 * least(n_tok / 20.0, 1.0)
                 + 0.2 * (CASE WHEN wl >= 3 AND wl <= 10 THEN 1.0 ELSE 0.5 END)
                 + 0.2 * greatest(0.0, 1.0 - p * 4), 6) AS quality,
           CASE WHEN h_en = 0 AND h_de = 0 AND h_fr = 0 AND h_es = 0 THEN 'unknown'
                WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
                WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
                WHEN h_fr >= h_es THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM f
    """,
)
def text_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (length/punct/stopword/word-length heuristics) and
    stopword-voting language ID."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        X.quality_score(t).alias("quality"),
        X.lang_id(t).alias("lang_pred"),
    )


@query(
    "doc_fingerprint",
    f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting over normalized text (md5; engine-portable).
    The rolling/MinHash blocking fingerprint is exercised by
    dedup_minhash_lsh."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.content_fingerprint(F.col("text")).alias("fingerprint"))


@query(
    "text_repetition",
    f"""
    WITH t AS (SELECT doc_id, {_TOKENS} AS tk FROM documents),
    g2r AS (
      SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                            i -> tk[i] || ' ' || tk[i+1])) AS g2 FROM t),
    g3r AS (
      SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g3
      FROM t),
    c2 AS (SELECT doc_id, g2, count(*) AS c FROM g2r GROUP BY doc_id, g2),
    c3 AS (SELECT doc_id, g3, count(*) AS c FROM g3r GROUP BY doc_id, g3),
    s2 AS (SELECT doc_id, round(max(c) / sum(c), 6) AS top_bigram_share,
                  round(1.0 - count(*) / sum(c), 6) AS dup_bigram_frac
           FROM c2 GROUP BY doc_id),
    s3 AS (SELECT doc_id, round(1.0 - count(*) / sum(c), 6) AS dup_trigram_frac
           FROM c3 GROUP BY doc_id)
    SELECT doc_id, top_bigram_share, dup_bigram_frac, dup_trigram_frac
    FROM s2 JOIN s3 USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: most-frequent-bigram
    share, duplicate-bigram fraction, duplicate-trigram fraction — the
    quality gates that catch boilerplate / degenerate generations.

    posexplode → window lead builds the n-grams in codegen (the HOF
    ``transform`` alternative is interpreted per element); one shuffle
    on doc_id serves the window AND both count aggregations (the grams
    stay co-partitioned), so the whole query is one exchange over the
    token stream. (The DuckDB oracle builds the same grams by list
    index — order-explicit, no reliance on unnest row order.)"""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(X.tokens(F.col("text"))).alias("pos", "t")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    g = tok.select(
        "doc_id",
        F.concat_ws(" ", "t", F.lead("t", 1).over(w)).alias("g2x"),
        F.concat_ws(" ", "t", F.lead("t", 1).over(w), F.lead("t", 2).over(w)).alias("g3x"),
        F.lead("t", 1).over(w).isNotNull().alias("has2"),
        F.lead("t", 2).over(w).isNotNull().alias("has3"),
    )
    c2 = (
        g.filter("has2")
        .groupBy("doc_id", "g2x")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_share"),
            F.round(1.0 - F.count(F.lit(1)) / F.sum("c"), 6).alias("dup_bigram_frac"),
        )
    )
    c3 = (
        g.filter("has3")
        .groupBy("doc_id", "g3x")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.round(1.0 - F.count(F.lit(1)) / F.sum("c"), 6).alias("dup_trigram_frac"))
    )
    return c2.join(c3, "doc_id")


_BM25_QUERIES = [
    (1, "table scan fast"),
    (2, "hash join merge"),
    (3, "window batch customer"),
]
_BM25_K1, _BM25_B = 1.2, 0.75


@query(
    "bm25_topk",
    f"""
    WITH qt AS (
      SELECT query_id, unnest(string_split(qtext, ' ')) AS term
      FROM (VALUES {", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)})
           AS qs(query_id, qtext)),
    tok AS (SELECT doc_id, unnest({_TOKENS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT qt.query_id, tf.doc_id,
             sum(CAST(round((ln(1.0 + (stats.n - dfreq.df + 0.5)
                                       / (dfreq.df + 0.5))
                             * (tf.tf * ({_BM25_K1} + 1.0)
                                / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                                   + {_BM25_B} * dl.dl / stats.avgdl))))
                            * 1000000.0) AS BIGINT)) AS score_micro
      FROM tf JOIN qt USING (term)
      JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
      GROUP BY qt.query_id, tf.doc_id),
    ranked AS (
      SELECT query_id, doc_id,
             round(score_micro / 1000000.0, 6) AS bm25,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, doc_id) AS rank
      FROM scored)
    SELECT query_id, doc_id, bm25, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval: top-10 docs per query (k1=1.2, b=0.75).

    The inverted-index shape a warehouse search runs at scale: tf rides
    a single groupBy(doc, term) over the token stream; query terms and
    the document-frequency table broadcast (vocab is bounded); the final
    per-query top-k is a window over the scored candidates only (docs
    sharing ≥1 query term) — the corpus is never rescanned or shuffled
    per query. Determinism (ADVICE r7): each per-(doc, term)
    contribution quantizes to integer micro-units BEFORE the
    distributed sum (the rrf/kn_lm pattern), so the accumulated score
    is exact and shuffle-order-independent; ranks order by the integer
    score with doc_id tie-break, and bm25 is emitted at the lattice's
    own 6dp scale so the final round is exact on both engines."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    qt = spark.createDataFrame(
        [(i, t) for i, q in _BM25_QUERIES for t in q.split()],
        "query_id int, term string",
    )
    tok = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # dl = Σ tf per doc (see operators/retrieval.py): skips the second
    # tokenize + token-row shuffle
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfn = (
        F.col("tf")
        * (_BM25_K1 + 1.0)
        / (
            F.col("tf")
            + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                _round_half_away_long((idf * tfn) * F.lit(1e6))
            ).alias("score_micro")
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("score_micro") / F.lit(1e6), 6).alias("bm25"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ===========================================================================
# Deduplication
# ===========================================================================


@query(
    "dedup_exact",
    f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0),
    fp AS (SELECT doc_id, md5({_NORM}) AS fingerprint FROM all_docs)
    SELECT fingerprint, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
    FROM fp GROUP BY fingerprint
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy on the content fingerprint (one
    shuffle on a 16-byte key). Input is documents ∪ a re-id'd copy of
    every 5th doc, so the dedup provably removes the planted copies."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    all_docs = docs.unionByName(copies)
    return (
        all_docs.select(
            "doc_id", X.content_fingerprint(F.col("text")).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


_JACCARD5_ORACLE = f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES5}) AS s FROM documents),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b,
           round(i / (sa.n + sb.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i / (sa.n + sb.n - i) >= 0.5
"""


@query("dedup_minhash_lsh", _JACCARD5_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs: 64-hash signatures (single-fold
    Catalyst expression), 16 bands × 4 rows, bucket self-join, exact
    char-5-shingle Jaccard ≥ 0.5 verification. The oracle is the exact
    all-pairs answer — LSH recall at this threshold is 1.0 (verified at
    sf0.001/sf0.01; band math: P(miss | j=0.5) = (1-0.5^4)^16 ≈ 0.34 per
    signature theory, but planted dups here sit at j≥0.8 where
    P(miss) < 0.002)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, threshold=0.5)


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({_TOKENS})) AS t FROM documents),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b, round(i / (sa.n + sb.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i / (sa.n + sb.n - i) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard pairs via inverted-index join (docs meet
    through shared tokens, never a cross join; at web scale add a
    document-frequency cut on hot tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.token_jaccard_pairs(docs, threshold=0.8)


# SimHash oracle: the identical bit-plane majority vote, band join and
# Hamming verification unrolled in SQL. Portable because the token hash
# is the top 60 bits of md5 (operators/dedup.md5_hash60), which DuckDB
# computes bit-identically.
_SH_COUNTERS = ",\n             ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS c{b}" for b in range(60)
)
_SH_FOLD = " + ".join(f"CASE WHEN c{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END" for b in range(60))

_SIMHASH_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS t
      FROM documents),
    th AS (
      SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM tok),
    cnt AS (
      SELECT doc_id,
             {_SH_COUNTERS}
      FROM th GROUP BY doc_id),
    sims AS (SELECT doc_id, ({_SH_FOLD}) AS sim FROM cnt),
    chunks AS (
      SELECT doc_id, sim, c AS chunk, (sim >> (c * 15)) & 32767 AS key
      FROM sims CROSS JOIN unnest([0, 1, 2, 3]) AS u(c)),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             xor(a.sim, b.sim) AS x
      FROM chunks a JOIN chunks b
        ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(bit_count(x) AS INT) AS hamming
    FROM pairs WHERE bit_count(x) <= 8
"""


@query("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 8 over 60-bit token-sign
    fingerprints; 4×15-bit band candidates — complete for Hamming ≤ 3 by
    pigeonhole, heuristic recall above that, identically on both sides).
    The md5-derived token hash makes the whole bit-level pipeline
    SQL-portable, so this has an exact oracle; pytest additionally
    verifies banding against brute-force Hamming pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, max_hamming=8).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


_COS = (
    "list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)


def _cos_sql(a: str, b: str) -> str:
    dot = _COS.format(a=a, b=b)
    na = _COS.format(a=a, b=a)
    nb = _COS.format(a=b, b=b)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


@query(
    "dedup_embedding_cosine",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_cos_sql("a.embedding", "b.embedding")}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_cos_sql("a.embedding", "b.embedding")} >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-similarity pairs at the graded threshold 0.4 via
    the tiled blocked-GEMM operator: the "b" side broadcasts one
    bounded chunk at a time, executors BLAS-multiply partitioned Arrow
    batches against it — distributed compute, O(chunk) driver memory.

    Why not LSH here: the fixture's true pairs live at cos ∈ [0.4, 0.6),
    and at θ ≈ 66° sign-LSH stops pruning — the 64 tables exhaustive
    recall demands union to ≈ all pairs plus 64× tagging overhead
    (measured 10 s vs 0.5 s for this tile at sf0.1; math in
    operators/dedup.embedding_blocked_pairs). Exact low-threshold
    all-pairs is quadratic by definition, so the tiled GEMM *is* the
    scale path for it; :func:`operators.dedup.embedding_lsh_pairs`
    stays the sub-quadratic path for realistic near-dup thresholds
    (≥ 0.85) and is equality-tested against the brute-force baseline in
    tests/test_pipeline_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_blocked_pairs(emb, threshold=0.4)


# ===========================================================================
# Similarity search (ANN)
# ===========================================================================


@query(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id,
             {_cos_sql("c.embedding", "q.qv")} AS sim
      FROM embeddings c, q),
    ranked AS (
      SELECT query_id, vec_id, round(sim, 6) AS cos_sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
      FROM scored)
    SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exact baseline): broadcast the query
    set, score corpus-side (no corpus shuffle), window top-k with
    deterministic tie-break."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.cosine_topk_bruteforce(emb, q, k=10)
    return out.select("query_id", "vec_id", "cos_sim", F.col("rank").cast("int").alias("rank"))


@query(
    "jl_projection_topk",
    f"""
    WITH proj AS (
      SELECT vec_id,
             list_transform(generate_series(1, 16), j ->
               list_sum(list_transform(
                 generate_series(1, len(embedding)), i ->
                 embedding[i]::DOUBLE *
                 (CASE WHEN substr(md5('0_' || (i - 1)::VARCHAR || '_'
                                       || (j - 1)::VARCHAR), 1, 1) < '8'
                       THEN 1.0 ELSE -1.0 END)))
               / sqrt(16.0)) AS v
      FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM proj
          WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, p.vec_id, {_cos_sql("p.v", "q.qv")} AS sim
      FROM proj p, q),
    ranked AS (
      SELECT query_id, vec_id, round(sim, 6) AS cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id ASC) AS rank
      FROM scored)
    SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def jl_projection_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6: Johnson–Lindenstrauss random projection
    (operators/similarity.random_projection — Achlioptas ±1 signs from
    md5, the standard shrink step before candidate search at web
    scale): project 64-dim embeddings to 16 dims, brute-force cosine
    top-k in the PROJECTED space. The sign matrix derives from an
    engine-portable md5 formula, so the DuckDB oracle re-derives the
    matrix in SQL and replays projection + scoring + rank end-to-end —
    a full-pipeline hash gate including the matrix generation itself;
    recall vs the full-precision baseline is asserted in
    tests/test_similarity_sq8.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    proj = S.random_projection(emb, out_dim=16, seed=0)
    base = proj.select("vec_id", F.col("proj").alias("embedding"))
    q = base.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.cosine_topk_bruteforce(base, q, k=10)
    return out.select(
        "query_id", "vec_id", "cos_sim", F.col("rank").cast("int").alias("rank")
    )


@query(
    "sq8_ann_topk",
    f"""
    WITH dims AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings),
    b AS (SELECT i, min(x) AS mn, max(x) AS mx FROM dims GROUP BY i),
    bounds AS (
      SELECT list(mn ORDER BY i) AS mins,
             list(CASE WHEN mx > mn THEN mx - mn ELSE 1.0 END ORDER BY i)
               AS spans
      FROM b),
    codes AS (
      SELECT vec_id,
             list_transform(generate_series(1, len(embedding)),
               i -> CAST(round((embedding[i]::DOUBLE - mins[i]) * 255.0
                               / spans[i]) AS BIGINT)) AS c
      FROM embeddings, bounds),
    deq AS (
      SELECT vec_id,
             list_transform(generate_series(1, len(c)),
               i -> mins[i] + c[i] * spans[i] / 255.0) AS v
      FROM codes, bounds),
    q AS (SELECT vec_id AS query_id, v AS qv FROM deq WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, d.vec_id, {_cos_sql("d.v", "q.qv")} AS sim
      FROM deq d, q),
    ranked AS (
      SELECT query_id, vec_id, round(sim, 6) AS cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id ASC) AS rank
      FROM scored)
    SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def sq8_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6: corpus-calibrated SQ8 scalar quantization (FAISS
    IndexScalarQuantizer form — the third memory story next to IVF's
    per-vector int8 and PQ's m-byte codes): per-dimension min/max
    bounds from ONE tiny posexplode shuffle, pure-Catalyst integer
    encode (≈1 byte/dim after parquet bit-packing — 4× less scan
    bandwidth than float32 at 100 TB), symmetric top-k over the
    dequantized codes. Codes are integers and the reconstruction is
    one fixed float expression, so the DuckDB oracle replays the WHOLE
    pipeline — calibrate, encode, dequantize, rank — with no goldens;
    recall vs the float baseline is asserted in
    tests/test_similarity_sq8.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    mins, spans = S.sq8_calibrate(emb)
    codes = S.sq8_encode(emb, mins, spans)
    q = codes.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "codes"
    )
    out = S.sq8_topk(codes, q, mins, spans, k=10)
    return out.select(
        "query_id", "vec_id", "cos_sim", F.col("rank").cast("int").alias("rank")
    )


_KM_SWEEP = """
s{n} AS (
  SELECT d.vec_id, c.cell,
         sum(d.x * c.cx) / (sqrt(sum(d.x*d.x)) * sqrt(sum(c.cx*c.cx))) AS sim
  FROM dims d JOIN c{p} c ON d.i = c.i GROUP BY d.vec_id, c.cell),
a{n} AS (
  SELECT vec_id, cell, sim FROM (
    SELECT vec_id, cell, sim,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
    FROM s{n}) WHERE rn = 1),
m{n} AS (
  SELECT a.cell, d.i, avg(d.x) AS cx FROM a{n} a JOIN dims d USING (vec_id)
  GROUP BY a.cell, d.i),
c{n} AS (
  SELECT c.cell, c.i, coalesce(m.cx, c.cx) AS cx
  FROM c{p} c LEFT JOIN m{n} m ON m.cell = c.cell AND m.i = c.i)
"""

_KM_ORACLE = f"""
    WITH dims AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings),
    seeds AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
      FROM embeddings ORDER BY vec_id LIMIT 8),
    c0 AS (
      SELECT s.cell, d.i, d.x AS cx FROM seeds s JOIN dims d USING (vec_id)),
    {_KM_SWEEP.format(n=1, p=0)},
    {_KM_SWEEP.format(n=2, p=1)},
    s3 AS (
      SELECT d.vec_id, c.cell,
             sum(d.x * c.cx) / (sqrt(sum(d.x*d.x)) * sqrt(sum(c.cx*c.cx))) AS sim
      FROM dims d JOIN c2 c ON d.i = c.i GROUP BY d.vec_id, c.cell),
    a3 AS (
      SELECT vec_id, cell, sim FROM (
        SELECT vec_id, cell, sim,
               row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
        FROM s3) WHERE rn = 1)
    SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(sim), 4) AS mean_sim
    FROM a3 GROUP BY cell
"""


@query("embedding_kmeans", _KM_ORACLE)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means over the embedding corpus (semantic
    clustering for data curation / diversity sampling): seed with the 8
    lowest-id vectors, 2 assign→mean sweeps, final cosine assignment.
    Every sweep is one broadcast of 8 centroids + one scan — no corpus
    shuffle; only 8×64 means cross the driver per sweep, so the same
    loop runs unchanged over 10¹⁰ vectors. The oracle unrolls the exact
    same sweeps in SQL (long-format centroids), so cluster sizes and
    mean cosine match to 4 decimals."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = S.train_centroids(emb, n_centroids=8, refine_iters=2)
    assigned = S.assign_cells(emb, cents, with_sim=True)
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("sim"), 4).alias("mean_sim"),
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN (16 cells, 4 probes): cluster-pruned candidate scan.
    Approximate vs brute force (pytest measures recall ≥ 0.9), but the
    query itself is DETERMINISTIC — lowest-id seed centroids, fixed
    Lloyd sweeps, pinned probe/top-k tie-breaks — so as of round 5 it
    hash-checks against golden rows derived by an independent numpy
    implementation (tools/make_ivf_golden.py, refuse-on-mismatch)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.ivf_topk(spark, emb, q, k=10, n_centroids=16, n_probes=4)


QUERIES["ann_ivf_topk"] = ann_ivf_topk


def _register_ivf_golden() -> None:
    from clickhouse_learning_spark import golden_ivf as G
    from clickhouse_learning_spark.queries import ORACLES as _ORACLES

    vals = ",\n      ".join(
        "(" + ", ".join(repr(v) for v in r) + ")" for r in G.ANN_IVF_TOPK
    )
    _ORACLES["ann_ivf_topk"] = f"""
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(vec_id AS BIGINT) AS vec_id,
           CAST(cos_sim AS DOUBLE) AS cos_sim,
           CAST(rank AS INT) AS rank
    FROM (VALUES {vals}) AS g(query_id, vec_id, cos_sim, rank)
    """


_register_ivf_golden()


# ===========================================================================
# Multimodal plumbing
# ===========================================================================


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns (payload + typed metadata struct) decoded via
    mapInPandas (Arrow batches). Payloads are REAL binary PPM images —
    decode/feature-extract/resize are genuine numpy implementations;
    only compressed codecs are gated (operators/multimodal.py).
    Rows-only driver check."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.build_media_table(spark, docs)
    dec = MM.decode_image_meta(media)
    return dec.join(
        media.select("media_id", F.col("meta.bytes").alias("payload_bytes")), "media_id"
    ).select("media_id", "width", "height", "ok", "payload_bytes")


QUERIES["multimodal_decode"] = multimodal_decode
# The decode runs a REAL byte-level PPM parse in mapInPandas, but the
# fixture payloads are a deterministic function of doc_id
# (multimodal.build_media_table: w = id%64+16, h = id%48+16; ppm bytes
# = "P6\n{w} {h}\n255\n" + 3·w·h pixels) — so the decoded output has a
# closed-form arithmetic oracle, upgrading this family from rows-only
# to hash-checked: a parser bug (header walk, dims swap, byte count)
# breaks the match.
from clickhouse_learning_spark.queries import ORACLES as _ORACLES

_ORACLES["multimodal_decode"] = """
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(doc_id % 64 + 16 AS INT) AS width,
           CAST(doc_id % 48 + 16 AS INT) AS height,
           true AS ok,
           CAST(3 + length(CAST(doc_id % 64 + 16 AS VARCHAR)) + 1
                  + length(CAST(doc_id % 48 + 16 AS VARCHAR)) + 1 + 4
                  + 3 * (doc_id % 64 + 16) * (doc_id % 48 + 16) AS BIGINT)
               AS payload_bytes
    FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal feature table: per-channel image means (real pixel
    math), audio duration/RMS (real WAV parse) and sampled video frame
    counts, joined on media id — the shape of a pretraining data-mix
    audit. Hash-checked as of round 4: the oracle embeds golden values
    recomputed INDEPENDENTLY of every decode path (pixel/waveform
    formulas — tools/make_multimodal_golden.py), so a parser bug in the
    PPM walk, the WAV chunk scan or the frame sampler breaks the
    match."""
    docs = load_table(spark, sf_dir, "documents")
    img = MM.image_features(MM.build_media_table(spark, docs))
    aud = MM.decode_audio_meta(MM.build_audio_table(spark, docs)).select(
        "media_id", "duration_s", "rms"
    )
    vid = (
        MM.frame_sample(MM.build_video_table(spark, docs, n_frames=9), every=3)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("sampled_frames"))
    )
    return img.join(aud, "media_id").join(vid, "media_id")


QUERIES["multimodal_features"] = multimodal_features


def _values_oracle(rows, cols, casts) -> str:
    """Golden-VALUES oracle: the committed independently-derived rows,
    restricted to the ids present in the graded SF's documents table."""
    vals = ",\n      ".join(
        "(" + ", ".join(repr(v) for v in r) + ")" for r in rows
    )
    proj = ", ".join(
        f"CAST(g.{c} AS {t}) AS {c}" for c, t in zip(cols, casts)
    )
    return f"""
    SELECT {proj}
    FROM (VALUES {vals}) AS g({', '.join(cols)})
    JOIN (SELECT doc_id FROM documents) d ON g.{cols[0]} = d.doc_id
    """


def _register_multimodal_goldens() -> None:
    from clickhouse_learning_spark import golden_multimodal as G

    _ORACLES["multimodal_features"] = _values_oracle(
        G.MULTIMODAL_FEATURES,
        ["media_id", "mean_r", "mean_g", "mean_b", "duration_s", "rms",
         "sampled_frames"],
        ["BIGINT", "DOUBLE", "DOUBLE", "DOUBLE", "DOUBLE", "DOUBLE",
         "BIGINT"],
    )
    _ORACLES["multimodal_jpeg_features"] = _values_oracle(
        G.JPEG_FEATURES,
        ["media_id", "mean_r", "mean_g", "mean_b"],
        ["BIGINT", "DOUBLE", "DOUBLE", "DOUBLE"],
    )
    # progressive + arithmetic carry the same quantized coefficients
    # → same golden
    _ORACLES["multimodal_progressive_jpeg_features"] = _ORACLES[
        "multimodal_jpeg_features"
    ]
    _ORACLES["multimodal_arith_jpeg_features"] = _ORACLES[
        "multimodal_jpeg_features"
    ]
    _ORACLES["multimodal_prog_arith_jpeg_features"] = _ORACLES[
        "multimodal_jpeg_features"
    ]
    _ORACLES["audio_spectral"] = _values_oracle(
        G.AUDIO_SPECTRAL,
        ["media_id", "dominant_hz", "spectral_centroid",
         "spectral_bandwidth", "rolloff_85", "zcr"],
        ["BIGINT", "DOUBLE", "DOUBLE", "DOUBLE", "DOUBLE", "DOUBLE"],
    )
    # FLAC is lossless and carries the same waveform → same golden
    _ORACLES["audio_flac_spectral"] = _ORACLES["audio_spectral"]


def multimodal_pixel_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL byte-level image decode, hash-checked: the mapInPandas PPM
    parse + numpy channel sums must equal the DuckDB arithmetic
    recomputation of the fixture's pixel formula
    (px[i] = (id·2654435761 + i·40503) mod 256) — integer-exact, so a
    single mis-parsed byte anywhere in any payload breaks the match."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_channel_sums(MM.build_media_table(spark, docs))


QUERIES["multimodal_pixel_sums"] = multimodal_pixel_sums
_ORACLES["multimodal_pixel_sums"] = """
    WITH px AS (
      SELECT doc_id,
             unnest(range(0, 3 * (doc_id % 64 + 16) * (doc_id % 48 + 16))) AS i
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(sum(CASE WHEN i % 3 = 0
                    THEN (doc_id * 2654435761 + i * 40503) % 256 END) AS BIGINT)
               AS sum_r,
           CAST(sum(CASE WHEN i % 3 = 1
                    THEN (doc_id * 2654435761 + i * 40503) % 256 END) AS BIGINT)
               AS sum_g,
           CAST(sum(CASE WHEN i % 3 = 2
                    THEN (doc_id * 2654435761 + i * 40503) % 256 END) AS BIGINT)
               AS sum_b,
           CAST((doc_id % 64 + 16) * (doc_id % 48 + 16) AS BIGINT) AS n_px
    FROM px GROUP BY doc_id
"""


def multimodal_png_pixel_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG pixel decode, hash-checked (round 3): payloads are
    genuine zlib-compressed 8-bit RGB PNGs (per-image filter type
    cycles through all five PNG filters), decoded by the stdlib-zlib +
    numpy unfilter path (operators/multimodal._png_decode — no imaging
    library), and the per-channel sums must equal DuckDB's arithmetic
    recomputation of the same pixel formula — integer-exact, so one
    mis-inflated or mis-unfiltered byte in any payload breaks the
    match."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_channel_sums(MM.build_media_table(spark, docs, fmt="png"))


QUERIES["multimodal_png_pixel_sums"] = multimodal_png_pixel_sums
_ORACLES["multimodal_png_pixel_sums"] = _ORACLES["multimodal_pixel_sums"]


def multimodal_webp_pixel_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossless-WebP pixel decode, hash-checked (round 5): payloads
    are genuine VP8L streams built by the from-scratch encoder
    (operators/vp8l.encode_vp8l — subtract-green, color cache, canonical
    Huffman through the full code-length serialization, LZ77 runs),
    decoded by the from-scratch full-spec decoder (decode_vp8l: simple +
    normal prefix codes, color cache, near-distance map, meta prefix,
    all four inverse transforms — the transform paths the fixture
    doesn't exercise are covered by hand-built streams in
    tests/test_vp8l.py). Per-channel sums must equal DuckDB's arithmetic
    recomputation of the shared pixel formula — integer-exact, so one
    wrong bit in either codec direction breaks the hash. Closes the
    WebP half of the Pillow gate (VERDICT r4 task 7)."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_channel_sums(MM.build_media_table(spark, docs, fmt="webp"))


QUERIES["multimodal_webp_pixel_sums"] = multimodal_webp_pixel_sums
_ORACLES["multimodal_webp_pixel_sums"] = _ORACLES["multimodal_pixel_sums"]


def multimodal_bmp_pixel_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP pixel decode, hash-checked (round 6): payloads are
    genuine BI_RGB BMPs rotating per id through 24-bit bottom-up,
    24-bit top-down (negative biHeight) and 32-bit BGRA layouts —
    decoded by the numpy DIB walk (multimodal._bmp_decode: stride-4
    padding, row-order flip, BGR(A) channel swap) and the per-channel
    sums must equal DuckDB's arithmetic recomputation of the shared
    pixel formula, integer-exact."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_channel_sums(MM.build_media_table(spark, docs, fmt="bmp"))


QUERIES["multimodal_bmp_pixel_sums"] = multimodal_bmp_pixel_sums
_ORACLES["multimodal_bmp_pixel_sums"] = _ORACLES["multimodal_pixel_sums"]


def multimodal_tiff_pixel_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF pixel decode, hash-checked (round 6): payloads are
    genuine baseline-RGB TIFF 6.0 files built by the from-scratch
    encoder (operators/tiff.encode_tiff), rotating per id through
    compression none / PackBits / LZW / LZW+Predictor-2 AND both byte
    orders (II and MM), multi-strip — decoded back by the independent
    IFD walk + per-compression inflate (decode_tiff). Per-channel sums
    must equal DuckDB's arithmetic recomputation of the shared pixel
    formula — integer-exact, so one wrong early-change LZW width,
    PackBits run, predictor delta, strip offset or byte-swap anywhere
    breaks the hash. PackBits is additionally pinned on the TIFF
    spec's own worked example and LZW cross-checked against an
    independent spec-pseudocode decoder in tests/test_tiff.py."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_channel_sums(MM.build_media_table(spark, docs, fmt="tiff"))


QUERIES["multimodal_tiff_pixel_sums"] = multimodal_tiff_pixel_sums
_ORACLES["multimodal_tiff_pixel_sums"] = _ORACLES["multimodal_pixel_sums"]


def multimodal_gif_pixel_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF pixel decode, hash-checked: payloads are genuine
    LZW-compressed GIF89a images (operators/multimodal.gif_image:
    256-color palette p → (p, 7p mod 256, 13p mod 256), index stream =
    one lane of the PPM pixel formula), decoded by the pure-python LZW
    path (_gif_decode), and the per-channel sums must equal DuckDB's
    arithmetic recomputation — GIF is lossless, so the match is
    integer-exact: one wrong LZW code width or palette byte anywhere
    breaks it."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_channel_sums(MM.build_media_table(spark, docs, fmt="gif"))


QUERIES["multimodal_gif_pixel_sums"] = multimodal_gif_pixel_sums
_ORACLES["multimodal_gif_pixel_sums"] = """
    WITH px AS (
      SELECT doc_id,
             (doc_id * 2654435761 + unnest(
                 range(0, (doc_id % 64 + 16) * (doc_id % 48 + 16))) * 40503)
                 % 256 AS idx
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(sum(idx) AS BIGINT) AS sum_r,
           CAST(sum((idx * 7) % 256) AS BIGINT) AS sum_g,
           CAST(sum((idx * 13) % 256) AS BIGINT) AS sum_b,
           CAST((doc_id % 64 + 16) * (doc_id % 48 + 16) AS BIGINT) AS n_px
    FROM px GROUP BY doc_id
"""


def bpe_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a real BPE tokenizer on the documents corpus (one
    distributed word-count shuffle + bounded driver merge loop,
    operators/bpe.py) and encode every document with it — per-doc word
    / subword counts plus the compression ratio, the gate run before
    committing to a tokenizer. Hash-checked as of round 5: training is
    deterministic under the pinned tie-break, so the oracle embeds
    golden per-doc stats derived by an INDEPENDENT second
    implementation (different merge loop + encoder strategy,
    tools/make_bpe_golden.py, refuse-on-mismatch at generation time);
    the algorithm is additionally verified against tests/test_bpe.py's
    reference, including the published worked example."""
    from clickhouse_learning_spark.operators import bpe as B

    docs = load_table(spark, sf_dir, "documents")
    # 25 merges: the fixture's vocabulary is ~31 distinct words, so a
    # larger budget fully merges every word and the ratio flatlines at
    # 1.0; a partial budget keeps per-doc variance visible
    merges = B.train_bpe(docs, n_merges=25, max_words=50_000)
    enc = B.bpe_encode(docs, merges, id_col="doc_id")
    return enc.select(
        F.col("id").alias("doc_id"),
        "n_words",
        "n_subwords",
        F.round(
            F.col("n_subwords") / F.greatest(F.col("n_words"), F.lit(1)), 4
        ).alias("subwords_per_word"),
    )


QUERIES["bpe_subword_stats"] = bpe_subword_stats


def _register_bpe_golden() -> None:
    from clickhouse_learning_spark import golden_bpe as G

    _ORACLES["bpe_subword_stats"] = _values_oracle(
        G.BPE_SUBWORD_STATS,
        ["doc_id", "n_words", "n_subwords", "subwords_per_word"],
        ["BIGINT", "BIGINT", "BIGINT", "DOUBLE"],
    )


_register_bpe_golden()


def wordpiece_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6: WordPiece tokenizer (operators/wordpiece.py — the BERT
    tokenizer, completing the BPE/Unigram/WordPiece subword family):
    one distributed word-count shuffle + a bounded driver merge loop
    picking the LIKELIHOOD-best pair count(ab)/(count(a)count(b)) as
    exact integer fractions, then map-only greedy longest-match-first
    encoding of every document. Training is deterministic under the
    pinned fraction/tie rules, so the oracle embeds golden per-doc
    stats from an INDEPENDENT second implementation
    (tools/make_wordpiece_golden.py: from-scratch per-sweep recounts,
    a length-bucketed encoder, refuse-on-mismatch at generation
    time)."""
    from clickhouse_learning_spark.operators import wordpiece as WP

    docs = load_table(spark, sf_dir, "documents")
    # 25 merges for the same reason as bpe_subword_stats: the fixture
    # vocabulary is small, so a partial budget keeps per-doc variance
    vocab = WP.train_wordpiece(docs, n_merges=25, max_words=50_000)
    enc = WP.wordpiece_encode(docs, vocab, id_col="doc_id")
    return enc.select(
        F.col("id").alias("doc_id"),
        "n_words",
        "n_subwords",
        "n_unk",
        F.round(
            F.col("n_subwords") / F.greatest(F.col("n_words"), F.lit(1)), 4
        ).alias("subwords_per_word"),
    )


QUERIES["wordpiece_subword_stats"] = wordpiece_subword_stats


def _register_wordpiece_golden() -> None:
    try:
        from clickhouse_learning_spark import golden_wordpiece as G
    except ImportError:  # pragma: no cover - regenerate via tools/
        return
    _ORACLES["wordpiece_subword_stats"] = _values_oracle(
        G.WORDPIECE_SUBWORD_STATS,
        ["doc_id", "n_words", "n_subwords", "n_unk", "subwords_per_word"],
        ["BIGINT", "BIGINT", "BIGINT", "BIGINT", "DOUBLE"],
    )


_register_wordpiece_golden()


def multimodal_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel feature extraction over REAL baseline JPEG payloads:
    payloads are encoded by operators/jpeg.encode_baseline and decoded
    through the numpy sequential-DCT decoder — no imaging library on
    either side. Hash-checked as of round 4: JPEG is lossy vs the
    SOURCE pixels, but decode itself is deterministic, so the oracle
    embeds golden means derived by a from-scratch reference decoder
    (tools/ref_jpeg.py — independent Huffman walk + direct-formula
    IDCT, cross-checked pixel-exact against the production decoder at
    golden-generation time)."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_features(MM.build_media_table(spark, docs, fmt="jpeg"))


QUERIES["multimodal_jpeg_features"] = multimodal_jpeg_features


def multimodal_progressive_jpeg_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same features over PROGRESSIVE (SOF2) payloads — round-4 native
    multi-scan decode (operators/jpeg.py: spectral selection +
    successive approximation). Both fixture encoders emit the same
    quantized coefficients, so the reconstruction — and therefore the
    golden oracle — is IDENTICAL to the baseline JPEG query: a
    mis-decoded scan kind anywhere breaks the hash."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_features(
        MM.build_media_table(spark, docs, fmt="jpeg_progressive")
    )


QUERIES["multimodal_progressive_jpeg_features"] = (
    multimodal_progressive_jpeg_features
)


def multimodal_arith_jpeg_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same features over ARITHMETIC-CODED (SOF9) payloads — round-5
    native QM-coder decode (operators/jparith.py: T.81 Annex D coder,
    Annex F DC/AC statistical models, DAC conditioning, per-payload
    restart intervals). The fixture encoder shares the quantization /
    DCT front end with encode_baseline, so the reconstruction — and
    therefore the golden oracle derived through the INDEPENDENT
    reference decoder chain (tools/ref_jpeg.py on the Huffman twin) —
    is IDENTICAL to the baseline JPEG query: one wrong QM decision,
    context bin, or restart resync anywhere breaks the hash. Closes
    the arithmetic-JPEG half of the Pillow gate (VERDICT r4 missing
    item 2)."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_features(
        MM.build_media_table(spark, docs, fmt="jpeg_arith")
    )


QUERIES["multimodal_arith_jpeg_features"] = multimodal_arith_jpeg_features


def multimodal_prog_arith_jpeg_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROGRESSIVE ARITHMETIC (SOF10) payloads — all fourteen scan
    kinds of the r5 QM-coder progressive path (interleaved DC first at
    Al=1, fixed-bin DC refinement, per-band AC first scans, AC
    successive-approximation refinements with history-driven EOB
    decisions). Coefficients match the baseline encoder's, so the same
    independent-chain golden oracle applies."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_features(
        MM.build_media_table(spark, docs, fmt="jpeg_arith_progressive")
    )


QUERIES["multimodal_prog_arith_jpeg_features"] = (
    multimodal_prog_arith_jpeg_features
)
_register_multimodal_goldens()


def audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio spectral features (operators/multimodal.py
    audio_spectral_features): numpy-rFFT dominant frequency, spectral
    centroid/bandwidth, 85% rolloff and zero-crossing rate over real
    PCM16 WAV payloads. Hash-checked as of round 4: the oracle embeds
    golden values from tools/ref_audio.py — formula-derived PCM and a
    from-scratch radix-2 FFT (no np.fft), with the WAV byte round-trip
    asserted sample-exact at generation time — so a bug anywhere in
    the generator, parser, framing, windowing or pocketfft call breaks
    the match. pytest additionally asserts the features recover the
    synthesized harmonics (test_pipeline_ops.py)."""
    docs = load_table(spark, sf_dir, "documents")
    audio = MM.build_audio_table(spark, docs)
    return MM.audio_spectral_features(audio).select(
        "media_id",
        "dominant_hz",
        "spectral_centroid",
        "spectral_bandwidth",
        "rolloff_85",
        "zcr",
    )


QUERIES["audio_spectral"] = audio_spectral


def audio_flac_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same spectral features over NATIVE-FLAC payloads (r5 late):
    operators/flac.py — full-surface decoder (CONSTANT / VERBATIM /
    FIXED / LPC subframes, Rice + escape partitions, stereo
    decorrelation, CRC-8/CRC-16 integrity) with a real compressing
    FIXED-predictor encoder. FLAC is LOSSLESS and the fixture carries
    the SAME waveform as the WAV twin, so the independent-chain golden
    oracle (tools/ref_audio.py from-scratch FFT) applies verbatim —
    one wrong Rice parameter, predictor branch or CRC anywhere breaks
    the hash."""
    docs = load_table(spark, sf_dir, "documents")
    audio = MM.build_audio_table(spark, docs, fmt="flac")
    return MM.audio_spectral_features(audio).select(
        "media_id",
        "dominant_hz",
        "spectral_centroid",
        "spectral_bandwidth",
        "rolloff_85",
        "zcr",
    )


QUERIES["audio_flac_spectral"] = audio_flac_spectral


@query(
    "jsonl_dim_roundtrip",
    """
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                      / 100.0, 2) AS DOUBLE) AS acctbal_sum
    FROM customer GROUP BY c_mktsegment
    """,
)
def jsonl_dim_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines dimension source (SURVEY S3; the reference's
    files/user_dim.txt load at make_user_action_001.py:14-19): land the
    customer dim as JSONL, read it back with an explicit schema,
    aggregate. The oracle reads the original table — proving the
    round-trip is lossless."""
    import tempfile

    from pyspark.sql import types as T

    from clickhouse_learning_spark.sources.jsonl import read_jsonl, write_jsonl

    cust = load_table(spark, sf_dir, "customer")
    path = tempfile.mkdtemp(prefix="jsonl_dim_") + "/customer_jsonl"
    write_jsonl(cust, path)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    dim = read_jsonl(spark, path, schema)
    # exact integer-cents sum (r6 determinism discipline): a raw double
    # sum merges in unpinned shuffle order; money columns quantize
    # losslessly to cents
    return dim.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(_money_cents(F.col("c_acctbal") * 100)) / 100.0, 2
        ).alias("acctbal_sum"),
    )


_FMT_ORACLE = """
    SELECT n_nationkey, n_name, CAST(count(*) AS BIGINT) AS suppliers,
           CAST(round(sum(s_acctbal), 2) AS DOUBLE) AS acctbal_sum
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
"""


def _format_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    import tempfile

    sup = load_table(spark, sf_dir, "supplier")
    path = tempfile.mkdtemp(prefix=f"{fmt}_rt_") + f"/supplier_{fmt}"
    writer = sup.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
        back = (
            spark.read.schema(sup.schema).option("header", True).csv(path)
        )
    else:
        writer.orc(path)
        back = spark.read.schema(sup.schema).orc(path)
    nat = load_table(spark, sf_dir, "nation")
    return (
        back.join(F.broadcast(nat), back.s_nationkey == nat.n_nationkey)
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count(F.lit(1)).alias("suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("acctbal_sum"),
        )
    )


@query("csv_roundtrip", _FMT_ORACLE)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink round-trip with an explicit schema (never
    inferSchema in production); oracle reads the original table —
    lossless including doubles."""
    return _format_roundtrip(spark, sf_dir, "csv")


@query("orc_roundtrip", _FMT_ORACLE)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC columnar source/sink round-trip (the second columnar format
    beside parquet; same pushdown machinery)."""
    return _format_roundtrip(spark, sf_dir, "orc")


@query(
    "dedup_clusters",
    f"""
    WITH RECURSIVE
    pairs AS ({_JACCARD5_ORACLE}),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b AS u, id_a AS v FROM pairs),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id)
    SELECT id, min(r) AS component FROM reach GROUP BY id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the near-dup pair list: connected
    components via iterative min-label propagation
    (operators/components.py), components labeled by min member id.
    The oracle computes the same closure with a recursive CTE over the
    exact all-pairs Jaccard edges — a pair missed by LSH or a wrong
    propagation fixpoint breaks the hash match."""
    from clickhouse_learning_spark.operators.components import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    return connected_components(pairs).select("id", F.col("comp").alias("component"))


# ===========================================================================
# Training-batch assembly (operators/packing.py)
# ===========================================================================


@query(
    "sample_stratified",
    """
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT doc_id, lang FROM ranked WHERE rn <= 20
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 20 docs per language, ranked by
    md5(doc_id) — an engine-portable seedable shuffle, so the exact
    same sample reproduces on any engine (packing.sample_per_group)."""
    from clickhouse_learning_spark.operators.packing import sample_per_group

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sample_per_group(docs, ["lang"], 20)


@query(
    "chunk_assignment",
    """
    SELECT doc_id, lang,
           CAST(floor(
             (sum(n_chars) OVER (
                PARTITION BY lang ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) - n_chars) / 1000.0
           ) AS BIGINT) AS chunk_id
    FROM documents
    """,
)
def chunk_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming context-window chunking (straddling allowed): one
    window cumsum per language shard, chunk = floor(cum_before/1000)
    (packing.chunk_assign)."""
    from clickhouse_learning_spark.operators.packing import chunk_assign

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return chunk_assign(docs, ["lang"], "n_chars", 1000).select(
        "doc_id", "lang", "chunk_id"
    )


@query(
    "greedy_pack_bins",
    """
    WITH RECURSIVE ordered AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents),
    walk(lang, rn, doc_id, n_chars, bin_id, used) AS (
      SELECT lang, rn, doc_id, n_chars, CAST(0 AS BIGINT), n_chars
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.lang, o.rn, o.doc_id, o.n_chars,
             CASE WHEN w.used + o.n_chars > 1000 THEN w.bin_id + 1 ELSE w.bin_id END,
             CASE WHEN w.used + o.n_chars > 1000 THEN o.n_chars ELSE w.used + o.n_chars END
      FROM walk w JOIN ordered o ON o.lang = w.lang AND o.rn = w.rn + 1)
    SELECT doc_id, lang, bin_id FROM walk
    """,
)
def greedy_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit sequence packing, no straddling (packing.greedy_pack,
    applyInPandas per language shard). The oracle replays the identical
    sequential walk as a recursive CTE — same bin for every doc or the
    hash breaks. A genuinely non-relational operator WITH an exact
    oracle."""
    from clickhouse_learning_spark.operators.packing import greedy_pack

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return greedy_pack(docs, ["lang"], "n_chars", 1000).select(
        "doc_id", "lang", "bin_id"
    )


@query(
    "contamination_check",
    f"""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len({_TOKENS}) - 4, 1)),
               i -> array_to_string(list_slice({_TOKENS}, i::INT, (i + 4)::INT), ' ')
             ))) AS g
      FROM documents),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0)
    SELECT t.doc_id, count(DISTINCT t.g) AS n_shared
    FROM grams t JOIN eval_grams e USING (g)
    WHERE t.doc_id % 17 <> 0
    GROUP BY t.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontamination.py): train
    docs sharing any word 5-gram with the synthetic eval split
    (doc_id % 17 = 0). Planted near-dups guarantee hits. Spark joins on
    xxhash64(gram) with the eval set broadcast; the oracle joins on the
    gram strings — identical counts up to a ~1e-14 hash-collision
    probability."""
    from clickhouse_learning_spark.operators.decontamination import (
        contamination_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    return contamination_report(train, eval_df, n=5)


@query(
    "training_pipeline",
    f"""
    WITH RECURSIVE train AS (
      SELECT doc_id, lang, n_chars, text FROM documents
      WHERE doc_id % 17 <> 0 AND len({_TOKENS}) >= 30),
    keepers AS (
      SELECT min(doc_id) AS doc_id FROM train GROUP BY md5({_NORM})),
    deduped AS (SELECT t.* FROM train t JOIN keepers USING (doc_id)),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len({_TOKENS}) - 4, 1)),
               i -> array_to_string(list_slice({_TOKENS}, i::INT, (i + 4)::INT), ' ')
             ))) AS g
      FROM documents),
    eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0),
    contaminated AS (
      SELECT DISTINCT t.doc_id FROM grams t JOIN eval_grams e USING (g)
      WHERE t.doc_id % 17 <> 0),
    clean AS (
      SELECT d.* FROM deduped d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)),
    sampled AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS srn
      FROM clean QUALIFY srn <= 15),
    ordered AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM sampled),
    walk(lang, rn, doc_id, n_chars, bin_id, used) AS (
      SELECT lang, rn, doc_id, n_chars, CAST(0 AS BIGINT), n_chars
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.lang, o.rn, o.doc_id, o.n_chars,
             CASE WHEN w.used + o.n_chars > 1000 THEN w.bin_id + 1 ELSE w.bin_id END,
             CASE WHEN w.used + o.n_chars > 1000 THEN o.n_chars ELSE w.used + o.n_chars END
      FROM walk w JOIN ordered o ON o.lang = w.lang AND o.rn = w.rn + 1)
    SELECT doc_id, lang, bin_id FROM walk
    """,
)
def training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data assembly, every stage composed from this
    repo's operators: token-length quality gate → exact content dedup →
    benchmark decontamination (5-gram vs the doc_id%17 eval split) →
    deterministic stratified sample (≤15/lang) → first-fit packing into
    1000-char bins. The oracle replays the whole chain in one SQL
    statement (recursive CTE for the packing walk) — any stage drifting
    breaks the hash."""
    from clickhouse_learning_spark.operators.decontamination import decontaminate
    from clickhouse_learning_spark.operators.packing import (
        greedy_pack,
        sample_per_group,
    )
    from clickhouse_learning_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0).filter(
        token_count(F.col("text")) >= 30
    )
    deduped = D.exact_dedup(train)
    clean = decontaminate(deduped, eval_df, n=5)
    sampled = sample_per_group(
        clean.select("doc_id", "lang", "n_chars"), ["lang"], 15
    )
    return greedy_pack(sampled, ["lang"], "n_chars", 1000).select(
        "doc_id", "lang", "bin_id"
    )


@query(
    "pii_redaction",
    r"""
    WITH injected AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or +1 555-01' || CAST(doc_id % 90 + 10 AS VARCHAR)
                       || '0 host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                  ELSE text END AS text
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(text,
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
           CAST(len(regexp_extract_all(text, '\+\d[\d\- ]{7,}\d')) AS INT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
                '\+\d[\d\- ]{7,}\d', '<PHONE>', 'g')) AS redacted_md5
    FROM injected
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub stage (operators/text.redact_pii): deterministic PII
    injection (both engines inject identically), then regex redaction +
    per-class counts, hash-matched on md5 of the redacted text — a
    regex-semantics divergence (greediness, word boundary, global
    replace) on either side breaks the match. Pure Catalyst regex:
    map-only, zero shuffle at any scale."""
    from clickhouse_learning_spark.operators.text import redact_pii

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"), F.col("doc_id").cast("string"),
                F.lit("@example.com or +1 555-01"),
                (F.col("doc_id") % 90 + 10).cast("string"),
                F.lit("0 host 10.0."), (F.col("doc_id") % 256).cast("string"),
                F.lit(".1"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    red = redact_pii(docs)
    return red.select(
        "doc_id",
        F.col("n_email").cast("int"),
        F.col("n_ipv4").cast("int"),
        F.col("n_phone").cast("int"),
        F.md5(F.col("text_redacted")).alias("redacted_md5"),
    )


@query(
    "dedup_substring_spans",
    f"""
    WITH injected AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 < 2
                  THEN text || ' the quick brown fox jumps over the lazy dog'
                       || ' while seven wizards brew quartz potions beneath the old stone bridge'
                  ELSE text END AS text
      FROM documents),
    t AS (SELECT doc_id, {_TOKENS} AS tk FROM injected),
    w AS (
      SELECT doc_id, unnest(list_transform(range(1, len(tk) - 18),
             i -> array_to_string(list_slice(tk, i, i + 19), ' '))) AS g
      FROM t WHERE len(tk) >= 20),
    sh AS (SELECT g FROM w GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    per AS (SELECT doc_id, count(*) AS n_windows FROM w GROUP BY doc_id),
    hits AS (SELECT doc_id, count(*) AS n_shared FROM w
             WHERE g IN (SELECT g FROM sh) GROUP BY doc_id)
    SELECT p.doc_id AS id,
           CAST(p.n_windows AS BIGINT) AS n_windows,
           CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
           round(coalesce(h.n_shared, 0) / p.n_windows, 6) AS dup_fraction
    FROM per p LEFT JOIN hits h ON p.doc_id = h.doc_id
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication (operators/dedup.substring_duplication
    — the suffix-array dedup signal as fixed 20-token window hashing).
    A deterministic shared paragraph is injected into 20% of documents
    on BOTH engines, so genuinely-shared verbatim runs exist; the
    oracle rebuilds the windows by list slicing and compares the
    window STRINGS (the Spark side's xxhash64 is a shuffle-compactness
    optimization whose collisions are ~1e-6 at this scale)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 < 2,
            F.concat(
                F.col("text"),
                F.lit(
                    " the quick brown fox jumps over the lazy dog"
                    " while seven wizards brew quartz potions beneath"
                    " the old stone bridge"
                ),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return D.substring_duplication(docs, "text", "doc_id", window_tokens=20)


@query(
    "source_mixing",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents),
    quota AS (
      SELECT * FROM (VALUES ('src0', 30), ('src1', 20), ('src2', 10))
               AS q(source, cap)
    )
    SELECT r.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(r.doc_id) AS BIGINT) AS id_sum
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.rn <= q.cap
    GROUP BY r.source
    """,
)
def source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix sampling (operators/packing.mix_sources): a 50/33/17
    recipe over three sources, with src0's 30-doc quota clamped by its
    25-doc availability (no silent upsampling), deterministic md5-rank
    selection. The oracle replays the window formulation and aggregates
    (source, count, id-sum) so a selection difference of even one
    document breaks the hash."""
    from clickhouse_learning_spark.operators.packing import mix_sources

    docs = load_table(spark, sf_dir, "documents")
    picked = mix_sources(
        docs,
        {"src0": 0.5, "src1": 1 / 3, "src2": 1 / 6},
        total=60,
    )
    return picked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


@query(
    "epoch_upsampling",
    """
    WITH e AS (
      SELECT * FROM (VALUES ('src0', 2.5), ('src1', 1.0), ('src2', 0.4))
               AS v(source, e)),
    ranked AS (
      SELECT d.doc_id, d.source, v.e,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn,
             count(*) OVER (PARTITION BY d.source) AS n
      FROM documents d JOIN e v ON d.source = v.source),
    copies AS (
      SELECT doc_id, source,
             CAST(floor(e) AS INT)
             + CASE WHEN rn <= round((e - floor(e)) * n) THEN 1 ELSE 0 END AS c
      FROM ranked)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(doc_id * ep) AS BIGINT) AS weighted_id_sum
    FROM copies, unnest(range(1, c + 1)) AS t(ep)
    WHERE c >= 1
    GROUP BY source
    """,
)
def epoch_upsampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch duplication (operators/packing.epoch_upsample):
    src0 ×2.5 (every doc twice, half a third time), src1 ×1, src2 ×0.4
    (a deterministic 40% subset). The oracle replays the rank/quota
    arithmetic and aggregates count + Σ(doc_id·epoch), so one wrong
    copy or epoch number anywhere breaks the hash."""
    from clickhouse_learning_spark.operators.packing import epoch_upsample

    docs = load_table(spark, sf_dir, "documents")
    up = epoch_upsample(docs, {"src0": 2.5, "src1": 1.0, "src2": 0.4})
    return up.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("doc_id") * F.col("epoch")).alias("weighted_id_sum"),
    )


@query(
    "vocab_oov_rate",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS}) AS t FROM documents),
    counts AS (
      SELECT t, count(*) AS c FROM tok GROUP BY t),
    vocab AS (
      SELECT t FROM (
        SELECT t, row_number() OVER (ORDER BY c DESC, t) AS r FROM counts)
      WHERE r <= 50)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) / count(*), 6)
               AS oov_rate
    FROM tok LEFT JOIN vocab v USING (t)
    GROUP BY doc_id
    """,
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction + coverage gate (operators/text.vocab_top /
    oov_rate): top-50 corpus tokens (count-desc, alphabetical ties —
    deterministic across engines), then per-document OOV fraction via
    a broadcast vocab join. The fixture vocabulary is tiny, so a rank-
    boundary or tie-break divergence flips real rows."""
    from clickhouse_learning_spark.operators.text import oov_rate, vocab_top

    docs = load_table(spark, sf_dir, "documents")
    vocab = vocab_top(docs, size=50)
    return oov_rate(docs, vocab).withColumnRenamed("id", "doc_id")


@query(
    "dedup_report",
    f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5({_NORM})) AS BIGINT) AS n_unique,
           round(1.0 - count(DISTINCT md5({_NORM})) / count(*), 6)
               AS dup_rate
    FROM documents
    GROUP BY source
    """,
)
def dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup health report: per-source document counts, distinct
    normalized-content fingerprints and duplicate rate — the monitoring
    face of the exact-dedup family (the fingerprint is the same
    md5-of-normalized-text identity exact_dedup keys on)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = X.content_fingerprint(F.col("text"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(fp).alias("n_unique"),
        F.round(
            1.0 - F.count_distinct(fp) / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
    )


@query(
    "dedup_incremental_index",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES5}) AS s FROM documents),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    jac AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE i / (sa.n + sb.n - i) >= 0.5),
    adm1 AS (
      SELECT doc_id FROM documents WHERE doc_id % 2 = 0
        AND doc_id NOT IN (SELECT id_b FROM jac
                           WHERE id_a % 2 = 0 AND id_b % 2 = 0)),
    drop2 AS (
      SELECT id_b AS d FROM jac WHERE id_a % 2 = 1 AND id_b % 2 = 1
      UNION
      SELECT id_b FROM jac JOIN adm1 ON jac.id_a = adm1.doc_id
      WHERE id_b % 2 = 1
      UNION
      SELECT id_a FROM jac JOIN adm1 ON jac.id_b = adm1.doc_id
      WHERE id_a % 2 = 1)
    SELECT doc_id, CAST(1 AS BIGINT) AS batch FROM adm1
    UNION ALL
    SELECT doc_id, CAST(2 AS BIGINT) AS batch FROM documents
    WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT d FROM drop2)
    """,
)
def dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash index (operators/dedup.MinHashIndex): build
    the store from the even-id half of the corpus, then admit the
    odd-id half against it — each batch deduped by the documented
    single-pass rule (within batch: lower id wins; across batches: only
    ADMITTED docs suppress). The oracle replays the same rule from
    exact all-pairs shingle Jaccard. Probes are keyed joins against the
    band-partitioned bucket store, never a corpus rescan — the
    continuous-ingestion dedup shape at 100 TB."""
    import tempfile

    from clickhouse_learning_spark.operators.dedup import MinHashIndex

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    idx = MinHashIndex(tempfile.mkdtemp(prefix="mh_idx_"), threshold=0.5)
    a1 = idx.build(b1).select("doc_id", F.lit(1).cast("long").alias("batch"))
    a2 = idx.append(b2).select("doc_id", F.lit(2).cast("long").alias("batch"))
    return a1.unionAll(a2)


@query(
    "lm_quality_scores",
    """
    WITH tk AS (SELECT doc_id,
                       regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS t
                FROM documents),
    uni AS (SELECT u AS w, CAST(count(*) AS DOUBLE) AS c1
            FROM (SELECT unnest(t) AS u FROM tk) GROUP BY u),
    tot AS (SELECT sum(c1) AS n FROM uni),
    pairs AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
              FROM tk, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g),
    bi AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c2
           FROM pairs GROUP BY w1, w2),
    sc AS (SELECT p.doc_id,
                  CAST(round(log10(
                        CASE WHEN b.c2 IS NOT NULL AND u1.c1 IS NOT NULL
                             THEN b.c2 / u1.c1
                             ELSE 0.4 * coalesce(u2.c1, 1.0)
                                  / (SELECT n FROM tot) END)
                      * 1000000.0) AS BIGINT) AS lpm
           FROM pairs p
           LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
           LEFT JOIN uni u1 ON u1.w = p.w1
           LEFT JOIN uni u2 ON u2.w = p.w2),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
                   round(sum(lpm) / count(*) / 1000000.0, 2) AS avg_logp10
            FROM sc GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(a.n_trans, 0) AS BIGINT) AS n_trans,
           coalesce(a.avg_logp10, 0.0) AS avg_logp10
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def lm_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram stupid-backoff LM quality scores (operators/lm.py — the
    CCNet-style perplexity filter): train on the documents corpus, score
    every document by average log10 transition probability. Training =
    two map-side-combinable count shuffles; scoring = two keyed joins +
    per-doc re-aggregation; the corpus total is a 1-row broadcast. The
    oracle replays the identical counts/ratios in DuckDB (same
    tokenization; counts cast DOUBLE so the divisions are bit-equal;
    per-doc mean rounded to 2dp on both sides)."""
    from clickhouse_learning_spark.operators import lm as LM

    docs = load_table(spark, sf_dir, "documents")
    model = LM.train_bigram_lm(docs)
    return LM.score_docs(docs, model)


@query(
    "lm_heldout_scores",
    """
    WITH train AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
    test AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
    tk_tr AS (SELECT regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS t
              FROM train),
    uni AS (SELECT u AS w, CAST(count(*) AS DOUBLE) AS c1
            FROM (SELECT unnest(t) AS u FROM tk_tr) GROUP BY u),
    tot AS (SELECT sum(c1) AS n FROM uni),
    bi AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c2
           FROM (SELECT t[i] AS w1, t[i + 1] AS w2
                 FROM tk_tr,
                      LATERAL (SELECT unnest(generate_series(1, len(t) - 1))
                               AS i) g)
           GROUP BY w1, w2),
    tk_te AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS t
              FROM test),
    pairs AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
              FROM tk_te,
                   LATERAL (SELECT unnest(generate_series(1, len(t) - 1))
                            AS i) g),
    sc AS (SELECT p.doc_id,
                  CAST(round(log10(
                        CASE WHEN b.c2 IS NOT NULL AND u1.c1 IS NOT NULL
                             THEN b.c2 / u1.c1
                             ELSE 0.4 * coalesce(u2.c1, 1.0)
                                  / (SELECT n FROM tot) END)
                      * 1000000.0) AS BIGINT) AS lpm
           FROM pairs p
           LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
           LEFT JOIN uni u1 ON u1.w = p.w1
           LEFT JOIN uni u2 ON u2.w = p.w2),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
                   round(sum(lpm) / count(*) / 1000000.0, 2) AS avg_logp10
            FROM sc GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(a.n_trans, 0) AS BIGINT) AS n_trans,
           coalesce(a.avg_logp10, 0.0) AS avg_logp10
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN agg a USING (doc_id)
    """,
)
def lm_heldout_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out LM scoring (registered for the round-5 window): train
    the bigram stupid-backoff model on even doc_ids, score the odd
    ones — unlike lm_quality_scores (self-scored), this exercises the
    unigram-backoff and OOV-floor branches under the driver's hash
    gate, not just in unit tests. Same join/shuffle shape as
    score_docs; the oracle replays the identical split and ratios."""
    from pyspark.sql import functions as _F

    from clickhouse_learning_spark.operators import lm as LM

    docs = load_table(spark, sf_dir, "documents")
    model = LM.train_bigram_lm(docs.filter(_F.col("doc_id") % 2 == 0))
    return LM.score_docs(docs.filter(_F.col("doc_id") % 2 == 1), model)


@query(
    "semdedup_keep",
    f"""
    WITH c AS (SELECT vec_id AS cell, embedding AS cv
               FROM embeddings WHERE vec_id < 8),
    sc AS (SELECT e.vec_id, c.cell,
                  {_cos_sql("e.embedding", "c.cv")} AS sim
           FROM embeddings e CROSS JOIN c),
    a AS (SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, cell ASC) AS rn
            FROM sc) WHERE rn = 1),
    p AS (SELECT x.vec_id,
                 max({_cos_sql("ex.embedding", "ey.embedding")}) AS best
          FROM a x JOIN a y ON x.cell = y.cell AND y.vec_id < x.vec_id
          JOIN embeddings ex ON ex.vec_id = x.vec_id
          JOIN embeddings ey ON ey.vec_id = y.vec_id
          GROUP BY x.vec_id)
    SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
           (p.best IS NULL OR p.best < 0.4) AS kept,
           round(p.best, 6) AS max_earlier_sim
    FROM a LEFT JOIN p ON p.vec_id = a.vec_id
    """,
)
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: SemDeDup (operators.dedup.semdedup) — semantic dedup by
    clustered cosine: assign each embedding to its argmax-cosine
    centroid (map-only Arrow stage, centroid matrix is a closure
    broadcast), then per cell drop rows with an earlier same-cell
    member at cos >= 0.4 (one shuffle on cell; within-cell GEMM).
    Centroids here are the 8 lowest-id embeddings so the whole
    pipeline is deterministic and the oracle can replay it: argmax
    assignment as a ranked cross join, the drop rule as one
    max-over-earlier-members aggregate. The production path feeds
    kmeans_fit centroids instead (tests/test_pipeline_ops.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ]
    return D.semdedup(emb, cents, threshold=0.4)


@query(
    "dsir_importance",
    """
    WITH docs2 AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(list_concat(t,
               CASE WHEN len(t) < 2 THEN []
                    ELSE list_transform(generate_series(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i + 1])
               END)) AS gram
      FROM docs2),
    feat AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) % 4096
               AS bucket,
             count(*) AS cnt
      FROM grams GROUP BY doc_id, bucket),
    tf AS (SELECT bucket, sum(cnt) AS t FROM feat
           WHERE doc_id % 7 = 0 GROUP BY bucket),
    rf AS (SELECT bucket, sum(cnt) AS r FROM feat
           WHERE doc_id % 7 <> 0 GROUP BY bucket),
    tot AS (SELECT (SELECT coalesce(sum(t), 0) FROM tf) AS tt,
                   (SELECT coalesce(sum(r), 0) FROM rf) AS rt),
    lr AS (SELECT coalesce(tf.bucket, rf.bucket) AS bucket,
                  CAST(round((ln((coalesce(t, 0) + 1.0) / (tt + 1.0 * 4096))
                       - ln((coalesce(r, 0) + 1.0) / (rt + 1.0 * 4096)))
                       * 1000000) AS BIGINT) AS rm
           FROM tf FULL JOIN rf ON tf.bucket = rf.bucket CROSS JOIN tot),
    w AS (SELECT f.doc_id, CAST(sum(f.cnt * lr.rm) AS BIGINT)
                   AS weight_micro
          FROM feat f JOIN lr USING (bucket)
          WHERE f.doc_id % 7 <> 0 GROUP BY f.doc_id)
    SELECT doc_id, weight_micro FROM (
      SELECT doc_id, weight_micro,
             row_number() OVER (ORDER BY weight_micro DESC, doc_id) AS rn
      FROM w)
    WHERE rn <= 200
    """,
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: DSIR data selection (operators/dsir.py — Xie et al.
    2023). Target pool = doc_id % 7 == 0, raw pool = the rest; hashed
    unigram+bigram features (engine-portable md5 bucket hash), smoothed
    per-bucket importance log-ratios rounded to integer MICRO-units so
    per-doc weights are exact integer dot products (no float-sum hash
    divergence), top-200 by (weight desc, id). The oracle replays the
    identical pipeline in DuckDB SQL. Plan: one explode+regroup
    shuffle for features, B-row broadcast for scoring,
    TakeOrderedAndProject for the cut."""
    from clickhouse_learning_spark.operators import dsir as DS

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.filter(F.col("doc_id") % 7 != 0)
    tgt = docs.filter(F.col("doc_id") % 7 == 0)
    return DS.dsir_select(raw, tgt, k=200, buckets=4096)


@query(
    "nb_quality_scores",
    """
    WITH train AS (SELECT lang = 'en' AS pos, text FROM documents
                   WHERE doc_id % 2 = 0),
    tk_tr AS (SELECT pos,
                     unnest(regexp_extract_all(lower(text),
                                               '[A-Za-z0-9]+')) AS w
              FROM train),
    counts AS (SELECT w,
                      CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END)
                           AS DOUBLE) AS c_pos,
                      CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END)
                           AS DOUBLE) AS c_neg
               FROM tk_tr GROUP BY w),
    tot AS (SELECT sum(c_pos) AS n_pos, sum(c_neg) AS n_neg,
                   CAST(count(*) AS DOUBLE) AS v
            FROM counts),
    pri AS (SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END)
                        AS DOUBLE) AS d_pos,
                   CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END)
                        AS DOUBLE) AS d_neg
            FROM train),
    llr AS (SELECT w,
                   CAST(round((log10((c_pos + 1.0) / (n_pos + v))
                               - log10((c_neg + 1.0) / (n_neg + v)))
                              * 1000000.0) AS BIGINT) AS llr_micro
            FROM counts, tot),
    consts AS (SELECT CAST(round((log10(d_pos) - log10(d_neg))
                                 * 1000000.0) AS BIGINT) AS prior_micro,
                      CAST(round((log10(1.0 / (n_pos + v))
                                  - log10(1.0 / (n_neg + v)))
                                 * 1000000.0) AS BIGINT) AS oov_micro
               FROM tot, pri),
    te AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text),
                                            '[A-Za-z0-9]+')) AS w
           FROM documents WHERE doc_id % 2 = 1),
    sc AS (SELECT te.doc_id,
                  coalesce(l.llr_micro,
                           (SELECT oov_micro FROM consts)) AS c
           FROM te LEFT JOIN llr l USING (w)),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
                   sum(c) AS s
            FROM sc GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(a.n_tok, 0) AS BIGINT) AS n_tok,
           round(((SELECT prior_micro FROM consts) + coalesce(a.s, 0))
                 / 1000000.0, 2) + 0.0 AS score,
           CAST(((SELECT prior_micro FROM consts) + coalesce(a.s, 0)) > 0
                AS BIGINT) AS pred
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN agg a USING (doc_id)
    """,
)
def nb_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: multinomial Naive-Bayes quality classifier
    (operators/classifier.py) — train on even doc_ids labeled
    lang='en', score the held-out odd half by log10 posterior odds.
    The counting-only classifier for training-data curation: training
    is ONE map-side-combinable count shuffle (model = O(vocab) word
    log-likelihood ratios + a 1-row consts broadcast), scoring one
    keyed token join + per-doc re-aggregation. The oracle replays the
    identical counts and log-ratio expressions in DuckDB (counts cast
    DOUBLE so the smoothed divisions are bit-equal). Per-token
    contributions are quantized to integer micro-units and summed
    EXACTLY on both sides (r6 determinism hardening — a raw double
    sum merges in unpinned shuffle order and flipped a 2dp round once
    in r5 grading); scores rounded to 2dp on both sides."""
    from clickhouse_learning_spark.operators import classifier as NB

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("lang") == "en").alias("label"), "text"
    )
    model = NB.train_nb(train)
    return NB.score_nb(docs.filter(F.col("doc_id") % 2 == 1), model)


@query(
    "bloom_decontamination",
    f"""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len({_TOKENS}) - 4, 1)),
               i -> array_to_string(list_slice({_TOKENS}, i::INT, (i + 4)::INT), ' ')
             ))) AS g
      FROM documents),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0)
    SELECT t.doc_id, count(DISTINCT t.g) AS n_shared
    FROM grams t JOIN eval_grams e USING (g)
    WHERE t.doc_id % 17 <> 0
    GROUP BY t.doc_id
    """,
)
def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: Bloom-prefiltered decontamination
    (operators/decontamination.bloom_contamination_report) — the scale
    path when the eval gram set is too large to broadcast raw
    (crawl-vs-crawl contamination): the filter is built DISTRIBUTED
    (seeded-xxhash64 positions → bit_or per 64-bit word; the driver
    collects bits/64 longs, independent of eval size), the train side
    drops non-members in a vectorized Arrow UDF, and only surviving
    candidates pay the exact verification join — so the output is
    EXACT and this query shares contamination_check's oracle verbatim
    (Bloom false positives die in the verify join)."""
    from clickhouse_learning_spark.operators.decontamination import (
        bloom_contamination_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    return bloom_contamination_report(train, eval_df)


@query(
    "temperature_mixing",
    """
    WITH cnt AS (SELECT source, count(*) AS n FROM documents
                 GROUP BY source),
    z AS (SELECT sum(pow(n, 0.5)) AS z FROM cnt),
    q AS (SELECT source, CAST(round(200 * pow(n, 0.5) / z) AS BIGINT)
                 AS quota
          FROM cnt, z),
    ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rn
      FROM documents)
    SELECT r.doc_id, r.source
    FROM ranked r JOIN q USING (source)
    WHERE r.rn <= q.quota
    """,
)
def temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: temperature-scaled source mixing
    (operators/packing.temperature_weights → mix_sources) — the
    mT5/PaLM multilingual sampling rule wᵢ ∝ nᵢ^α at α = 0.5, drawing
    ~200 docs: low-resource sources get boosted relative to the
    natural distribution. Selection is the deterministic md5(id) rank
    within each source (one window shuffle); the tiny per-source count
    table is the only driver-side state. The oracle re-derives the
    quotas (√n normalized, rounded) and the rank selection in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    from clickhouse_learning_spark.operators.packing import temperature_mix

    return temperature_mix(docs, alpha=0.5, total=200).select(
        "doc_id", "source"
    )


@query(
    "gopher_quality_rules",
    """
    WITH w AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), '\\s+') AS words,
             regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS toks
      FROM documents)
    SELECT doc_id,
           CAST(len(words) AS INT) AS n_words,
           round(CAST(list_sum(list_transform(words, x -> length(x)))
                      AS DOUBLE) / greatest(len(words), 1), 4)
             AS mean_word_len,
           round(CAST((length(text) - length(replace(text, '#', '')))
                      + len(regexp_extract_all(text, '\\.\\.\\.|…'))
                      AS DOUBLE) / greatest(len(words), 1), 4)
             AS symbol_ratio,
           round(CAST(len(list_filter(words,
                          x -> regexp_matches(x, '[A-Za-z]')))
                      AS DOUBLE) / greatest(len(words), 1), 4)
             AS alpha_word_frac,
           CAST(len(list_filter(['the','a','of','and','to','in','is',
                                 'that','it','for'],
                                s -> list_contains(toks, s))) AS INT)
             AS stopword_hits,
           len(words) >= 50 AND len(words) <= 100000 AS rule_words,
           round(CAST(list_sum(list_transform(words, x -> length(x)))
                      AS DOUBLE) / greatest(len(words), 1), 4)
             BETWEEN 3 AND 10 AS rule_word_len,
           round(CAST((length(text) - length(replace(text, '#', '')))
                      + len(regexp_extract_all(text, '\\.\\.\\.|…'))
                      AS DOUBLE) / greatest(len(words), 1), 4) < 0.1
             AS rule_symbols,
           round(CAST(len(list_filter(words,
                          x -> regexp_matches(x, '[A-Za-z]')))
                      AS DOUBLE) / greatest(len(words), 1), 4) >= 0.8
             AS rule_alpha,
           len(list_filter(['the','a','of','and','to','in','is','that',
                            'it','for'],
                           s -> list_contains(toks, s))) >= 2
             AS rule_stopwords,
           (len(words) >= 50 AND len(words) <= 100000)
             AND (round(CAST(list_sum(list_transform(words,
                    x -> length(x))) AS DOUBLE)
                    / greatest(len(words), 1), 4) BETWEEN 3 AND 10)
             AND (round(CAST((length(text)
                    - length(replace(text, '#', '')))
                    + len(regexp_extract_all(text, '\\.\\.\\.|…'))
                    AS DOUBLE) / greatest(len(words), 1), 4) < 0.1)
             AND (round(CAST(len(list_filter(words,
                    x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                    / greatest(len(words), 1), 4) >= 0.8)
             AND (len(list_filter(['the','a','of','and','to','in','is',
                    'that','it','for'],
                    s -> list_contains(toks, s))) >= 2)
             AS keep
    FROM w
    """,
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: Gopher-style document quality gates (Rae et al. 2021
    §A1.1 — word-count bounds, mean word length, symbol ratio,
    alphabetic-word fraction, stopword presence) as pure Catalyst
    expressions over the documents corpus, emitting measured values +
    per-rule booleans + the overall keep flag (the curation-report
    shape). Map-only — zero shuffles at any scale. The oracle
    re-derives every value with DuckDB list lambdas."""
    docs = load_table(spark, sf_dir, "documents")
    return X.gopher_rules(docs)


@query(
    "lexical_diversity",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text),
                            '[A-Za-z0-9]+')) AS t
      FROM documents),
    tc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
    agg AS (SELECT doc_id, sum(c) AS n, count(*) AS types,
                   sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax,
                   max(c) AS maxc
            FROM tc GROUP BY 1)
    SELECT d.doc_id,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(a.types, 0) AS BIGINT) AS n_types,
           round(CAST(coalesce(a.types, 0) AS DOUBLE)
                 / greatest(coalesce(a.n, 0), 1), 4) AS type_token_ratio,
           round(CAST(coalesce(a.hapax, 0) AS DOUBLE)
                 / greatest(coalesce(a.types, 0), 1), 4) AS hapax_frac,
           round(CAST(coalesce(a.maxc, 0) AS DOUBLE)
                 / greatest(coalesce(a.n, 0), 1), 4) AS top_share
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
)
def lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: type/token diversity metrics (type-token ratio, hapax
    fraction, top-word dominance — the low-diversity/boilerplate
    curation signals). One sorted-array run-length FOLD per document
    (codegen aggregate(), no per-type rescans, no Python, no shuffle);
    the oracle takes the classic unnest + GROUP BY route in DuckDB, so
    the fold's run-length bookkeeping is checked against an independent
    relational derivation."""
    docs = load_table(spark, sf_dir, "documents")
    return X.lexical_diversity(docs)


@query(
    "c4_line_cleaning",
    """
    WITH asm AS (
      SELECT doc_id,
             4 + doc_id % 5 AS sz,
             regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents
    ), built AS (
      SELECT doc_id,
             array_to_string(
               list_transform(
                 generate_series(0, CAST(ceil(CAST(len(words) AS DOUBLE)
                                              / sz) AS BIGINT) - 1),
                 j -> array_to_string(
                        list_slice(words, j * sz + 1, j * sz + sz), ' ')
                      || CASE WHEN (doc_id + j) % 7 = 2
                              THEN ' javascript' ELSE '' END
                      || CASE WHEN (doc_id * 3 + j) % 41 = 5
                              THEN ' {' ELSE '' END
                      || CASE WHEN (doc_id + j) % 3 = 0
                              THEN '' ELSE '.' END),
               chr(10)) AS page
      FROM asm
    ), cleaned AS (
      SELECT doc_id,
             str_split(page, chr(10)) AS lines,
             -- DuckDB's array_to_string of an EMPTY list is NULL;
             -- Spark's array_join is '' - coalesce to match
             coalesce(array_to_string(
               list_filter(str_split(page, chr(10)),
                 l -> regexp_matches(l, '[.!?"]\\s*$')
                      AND len(regexp_split_to_array(trim(l), '\\s+')) >= 5
                      AND NOT contains(lower(l), 'javascript')), chr(10)),
               '') AS ctext,
             len(list_filter(str_split(page, chr(10)),
               l -> regexp_matches(l, '[.!?"]\\s*$')
                    AND len(regexp_split_to_array(trim(l), '\\s+')) >= 5
                    AND NOT contains(lower(l), 'javascript'))) AS n_kept
      FROM built
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           md5(ctext) AS cleaned_md5,
           CAST(length(ctext) AS INT) AS cleaned_len,
           CAST(len(lines) AS INT) AS n_lines,
           CAST(n_kept AS INT) AS n_lines_kept,
           CAST(len(regexp_extract_all(ctext, '[.!?]')) AS INT)
               AS n_sentences,
           (len(regexp_extract_all(ctext, '[.!?]')) >= 3
            AND NOT contains(lower(ctext), 'lorem ipsum')
            AND NOT contains(ctext, '{')) AS keep_page
    FROM cleaned
    """,
)
def c4_line_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) over deterministic
    pseudo-pages: the flat fixture word stream is assembled into lines
    of (4 + doc_id % 5) words with hash-scheduled terminal punctuation,
    'javascript' and '{' injections — so every line AND page rule fires
    on real data — then text.c4_clean applies the published retain/drop
    rules. The oracle re-derives assembly + cleaning with DuckDB list
    lambdas; the cleaned text itself is compared by md5 + length, so a
    single mis-kept line or lost character anywhere breaks the hash.

    Scale: assembly + cleaning are one map-only projection in
    whole-stage codegen — no shuffle, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    sz = (F.lit(4) + F.col("doc_id") % 5).cast("int")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_lines = F.ceil(F.size(words).cast("double") / sz).cast("int")
    line_j = lambda j: F.concat(  # noqa: E731
        F.array_join(F.slice(words, j * sz + 1, sz), " "),
        F.when((F.col("doc_id") + j) % 7 == 2, F.lit(" javascript"))
         .otherwise(F.lit("")),
        F.when((F.col("doc_id") * 3 + j) % 41 == 5, F.lit(" {"))
         .otherwise(F.lit("")),
        F.when((F.col("doc_id") + j) % 3 == 0, F.lit(""))
         .otherwise(F.lit(".")),
    )
    page = F.array_join(
        F.transform(F.sequence(F.lit(0), n_lines - 1), line_j), "\n"
    )
    built = docs.select(F.col("doc_id"), page.alias("text"))
    out = X.c4_clean(built)
    return out.select(
        "doc_id",
        F.md5("cleaned_text").alias("cleaned_md5"),
        F.length("cleaned_text").cast("int").alias("cleaned_len"),
        "n_lines",
        "n_lines_kept",
        "n_sentences",
        "keep_page",
    )


def multimodal_lossless_jpeg_pixel_sums(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL lossless-JPEG (SOF3) pixel decode, hash-checked: payloads
    rotate through all seven Annex H predictors and varied restart
    intervals; the process is LOSSLESS, so per-channel sums must equal
    DuckDB's arithmetic recomputation of the shared pixel formula
    integer-exactly — one wrong predictor branch, modulo wrap or
    restart resync anywhere breaks the hash (r5 late)."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_channel_sums(
        MM.build_media_table(spark, docs, fmt="jpeg_lossless")
    )


QUERIES["multimodal_lossless_jpeg_pixel_sums"] = (
    multimodal_lossless_jpeg_pixel_sums
)
_ORACLES["multimodal_lossless_jpeg_pixel_sums"] = _ORACLES[
    "multimodal_pixel_sums"
]


@query(
    "video_avi_frame_sums",
    """
    WITH fr AS (
      SELECT doc_id,
             unnest([0, 3, 6]) AS frame_idx,
             doc_id % 16 + 8 AS w,
             doc_id % 12 + 8 AS h
      FROM documents
    ), px AS (
      SELECT doc_id, frame_idx, w, h,
             unnest(range(0, 3 * w * h)) AS i
      FROM fr
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(sum(CASE WHEN i % 3 = 0 THEN
                 ((doc_id * 1000 + frame_idx) * 2654435761 + i * 40503)
                 % 256 END) AS BIGINT) AS sum_r,
           CAST(sum(CASE WHEN i % 3 = 1 THEN
                 ((doc_id * 1000 + frame_idx) * 2654435761 + i * 40503)
                 % 256 END) AS BIGINT) AS sum_g,
           CAST(sum(CASE WHEN i % 3 = 2 THEN
                 ((doc_id * 1000 + frame_idx) * 2654435761 + i * 40503)
                 % 256 END) AS BIGINT) AS sum_b
    FROM px GROUP BY 1, 2
    """,
)
def video_avi_frame_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL AVI container decode, hash-checked (r5 late): payloads are
    genuine RIFF/AVI files with uncompressed bottom-up BGR DIB frames
    ('00db', stride padded to 4); frame_sample walks the RIFF chunk
    tree, repacks each sampled frame to PPM, and the per-frame channel
    sums must equal DuckDB's arithmetic recomputation of the fixture
    formula integer-exactly — one wrong stride byte, row flip or BGR
    swap anywhere breaks the hash. Motion-JPEG ('00dc') AVIs ride the
    same walker into the native T.81 decoder (tests)."""
    docs = load_table(spark, sf_dir, "documents")
    vids = MM.build_video_table(spark, docs, n_frames=9, fmt="avi_dib")
    frames = MM.frame_sample(vids, every=3).select(
        "media_id", "frame_idx",
        F.col("frame_payload").alias("payload"),
    )

    def s(batches):
        import numpy as np
        import pandas as pd

        for b in batches:
            out = {"media_id": [], "frame_idx": [], "sum_r": [],
                   "sum_g": [], "sum_b": []}
            for m, fi, p in zip(b["media_id"], b["frame_idx"],
                                b["payload"]):
                parsed = MM._parse_ppm(p)
                if parsed is None:
                    continue
                w, h, off = parsed
                px = np.frombuffer(
                    p, dtype=np.uint8, count=w * h * 3, offset=off
                ).reshape(-1, 3).astype(np.int64)
                out["media_id"].append(m)
                out["frame_idx"].append(fi)
                out["sum_r"].append(int(px[:, 0].sum()))
                out["sum_g"].append(int(px[:, 1].sum()))
                out["sum_b"].append(int(px[:, 2].sum()))
            yield pd.DataFrame(out)

    return frames.mapInPandas(
        s,
        schema="media_id long, frame_idx int, sum_r long, sum_g long,"
               " sum_b long",
    )


QUERIES["video_avi_frame_sums"] = video_avi_frame_sums


# ---- logistic-regression quality classifier (operators/logreg.py) ----

_LR_RIDGE = 0.001
_LR_ITERS = 6
# identical feature expressions on both engines: intercept, chars/400,
# ' the ' occurrences / 3 (an English-ness signal)
_LR_FEATS_DUCK = (
    "1.0 AS x0, n_chars / 400.0 AS x1, "
    "((length(text) - length(replace(text, ' the ', ''))) / 5.0) / 3.0 "
    "AS x2, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y"
)


def _det3(m: list[list[str]]) -> str:
    (a, b, c), (d, e, f), (g, h, i) = m
    return (f"(({a})*(({e})*({i}) - ({f})*({h})) "
            f"- ({b})*(({d})*({i}) - ({f})*({g})) "
            f"+ ({c})*(({d})*({h}) - ({e})*({g})))")


def _duck_irls_sql() -> str:
    """Unrolled ridge-Newton in plain DuckDB SQL: per iteration, one
    aggregate CTE with the 6 Hessian + 3 gradient sums and a 1-row
    weight CTE solving the 3x3 system by Cramer's rule — a fully
    independent re-derivation of train_logreg's math (numpy LU there,
    cofactor expansion here)."""
    lam = repr(_LR_RIDGE)
    parts = [
        f"WITH f AS (SELECT doc_id, {_LR_FEATS_DUCK} FROM documents)",
        "w0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)",
    ]
    for t in range(1, _LR_ITERS + 1):
        p = f"w{t - 1}"
        # r6 determinism: per-row contributions quantized to 1e9 units
        # and summed as exact BIGINTs (mirrors train_logreg quant=1e9)
        qs = "sum(CAST(round({expr}*1000000000.0) AS BIGINT)) / 1000000000.0"
        stats = ", ".join(
            qs.format(expr=e) + f" AS {a}"
            for e, a in [
                ("s*x0*x0", "h00"), ("s*x0*x1", "h01"), ("s*x0*x2", "h02"),
                ("s*x1*x1", "h11"), ("s*x1*x2", "h12"), ("s*x2*x2", "h22"),
                ("(y-mu)*x0", "g0"), ("(y-mu)*x1", "g1"),
                ("(y-mu)*x2", "g2"),
            ]
        )
        parts.append(
            f"s{t} AS (SELECT {stats} FROM ("
            "SELECT x0, x1, x2, y, mu, mu*(1.0-mu) AS s FROM ("
            "SELECT f.*, 1.0/(1.0+exp(-(b0*x0+b1*x1+b2*x2))) AS mu "
            f"FROM f, {p})))"
        )
        hm = [[f"h00+{lam}", "h01", "h02"],
              ["h01", f"h11+{lam}", "h12"],
              ["h02", "h12", f"h22+{lam}"]]
        rhs = [f"(g0-{lam}*b0)", f"(g1-{lam}*b1)", f"(g2-{lam}*b2)"]
        det = _det3(hm)
        deltas = []
        for i in range(3):
            mi = [row[:] for row in hm]
            for r in range(3):
                mi[r][i] = rhs[r]
            deltas.append(f"({_det3(mi)}) / ({det})")
        parts.append(
            f"w{t} AS (SELECT b0 + {deltas[0]} AS b0, "
            f"b1 + {deltas[1]} AS b1, b2 + {deltas[2]} AS b2 "
            f"FROM s{t}, {p})"
        )
    return (
        ",\n".join(parts)
        + f"""
    SELECT doc_id, CAST(y AS BIGINT) AS y,
           round(1.0/(1.0+exp(-(b0*x0+b1*x1+b2*x2))), 4) AS prob
    FROM f, w{_LR_ITERS}
    """
    )


@query("lr_quality_scores", _duck_irls_sql())
def lr_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: gradient-trained linear quality classifier
    (operators/logreg.py) — ridge-Newton logistic regression on
    (chars, ' the '-rate) features, label lang='en', probabilities for
    every document. Each Newton iteration is ONE map-side-combinable
    aggregation down to 9 doubles + a driver-side 3x3 solve, so
    training is deterministic and partition-independent; the oracle
    replays all 6 iterations as unrolled DuckDB CTEs solved by
    Cramer's rule. Scores rounded to 4dp on both sides (the two
    solvers agree to ~1e-10; see tests/test_logreg.py for the
    independent-optimum law)."""
    from clickhouse_learning_spark.operators import logreg as LR

    feats = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / 400.0).alias("x1"),
        F.expr("((length(text) - length(replace(text, ' the ', ''))) "
               "/ 5.0) / 3.0").alias("x2"),
        (F.col("lang") == "en").cast("double").alias("y"),
    )
    w = LR.train_logreg(feats, ["x0", "x1", "x2"], "y",
                        iters=_LR_ITERS, ridge=_LR_RIDGE)
    scored = LR.score_logreg(feats, ["x0", "x1", "x2"], w)
    return scored.select(
        "doc_id",
        F.col("y").cast("long").alias("y"),
        F.round("prob", 4).alias("prob"),
    )


# shared LM-score CTE chain (identical to lm_quality_scores's oracle)
_LM_SCORE_CTES = """
    tk AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS t
           FROM documents),
    uni AS (SELECT u AS w, CAST(count(*) AS DOUBLE) AS c1
            FROM (SELECT unnest(t) AS u FROM tk) GROUP BY u),
    tot AS (SELECT sum(c1) AS n FROM uni),
    pairs AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
              FROM tk, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g),
    bi AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c2
           FROM pairs GROUP BY w1, w2),
    sc AS (SELECT p.doc_id,
                  CAST(round(log10(
                        CASE WHEN b.c2 IS NOT NULL AND u1.c1 IS NOT NULL
                             THEN b.c2 / u1.c1
                             ELSE 0.4 * coalesce(u2.c1, 1.0)
                                  / (SELECT n FROM tot) END)
                      * 1000000.0) AS BIGINT) AS lpm
           FROM pairs p
           LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
           LEFT JOIN uni u1 ON u1.w = p.w1
           LEFT JOIN uni u2 ON u2.w = p.w2),
    agg AS (SELECT doc_id, round(sum(lpm) / count(*) / 1000000.0, 2) AS avg_logp10
            FROM sc GROUP BY doc_id),
    scores AS (SELECT d.doc_id, d.lang,
                      coalesce(a.avg_logp10, 0.0) AS s
               FROM documents d LEFT JOIN agg a USING (doc_id))
"""


@query(
    "ccnet_perplexity_buckets",
    f"""
    WITH {_LM_SCORE_CTES},
    hist AS (SELECT lang, s, count(*) AS c FROM scores GROUP BY lang, s),
    cum AS (SELECT lang, s,
                   sum(c) OVER (PARTITION BY lang ORDER BY s) AS cc,
                   sum(c) OVER (PARTITION BY lang) AS n
            FROM hist),
    thr AS (SELECT lang,
                   min(CASE WHEN 3 * cc >= n THEN s END) AS t1,
                   min(CASE WHEN 3 * cc >= 2 * n THEN s END) AS t2
            FROM cum GROUP BY lang)
    SELECT sc2.doc_id, sc2.lang, sc2.s AS avg_logp10,
           CASE WHEN sc2.s <= thr.t1 THEN 'tail'
                WHEN sc2.s <= thr.t2 THEN 'middle'
                ELSE 'head' END AS bucket
    FROM scores sc2 JOIN thr USING (lang)
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: CCNet head/middle/tail perplexity bucketing
    (Wenzek et al. 2020 §4.4) — bigram-LM scores per document, then
    per-language tercile cutoffs via lm.score_buckets. Thresholds come
    from a (lang, rounded-score) histogram with integer cumulative
    logic (3*cum >= k*n), so both engines pick identical data-valued
    cutoffs — no float interpolation anywhere. The oracle replays the
    LM score chain (same CTEs lm_quality_scores proved bit-equal) plus
    the same histogram walk in DuckDB."""
    from clickhouse_learning_spark.operators import lm as LM

    docs = load_table(spark, sf_dir, "documents")
    model = LM.train_bigram_lm(docs)
    scored = LM.score_docs(docs, model).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    out = LM.score_buckets(scored, "lang", "avg_logp10")
    return out.select(
        "doc_id", "lang", "avg_logp10", "bucket"
    )


@query(
    "rowbinary_roundtrip",
    """
    SELECT o_orderstatus AS status,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      / 100.0, 2) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus, strftime(o_orderdate, '%Y-%m')
    """,
)
def rowbinary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: ClickHouse RowBinaryWithNamesAndTypes source/sink
    (sources/rowbinary.py — the `INTO OUTFILE ... FORMAT RowBinary...`
    migration path): land the orders table as RowBinary (Int64 /
    LowCardinality(String) / Float64 / DateTime / Nullable(String)
    columns exercise the codec surface), read it back through the
    distributed per-file byte-walk, aggregate. The oracle reads the
    ORIGINAL parquet — green means the binary round-trip is lossless
    down to timestamps and floats."""
    import tempfile

    from clickhouse_learning_spark.sources import rowbinary as RB

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    )
    types = ["Int64", "Int64", "LowCardinality(String)", "Float64",
             "DateTime", "Nullable(String)"]
    path = tempfile.mkdtemp(prefix="rowbinary_rt_") + "/orders_rb"
    RB.write_rowbinary(orders.repartition(4), path, types)
    back = RB.read_rowbinary(spark, path)
    # exact integer-cents sum (r6 determinism discipline; the binary
    # roundtrip under test is unchanged — only the grading aggregation
    # is made shuffle-order-proof)
    return back.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(_money_cents(F.col("o_totalprice") * 100)) / 100.0,
            2,
        ).alias("total"),
    )


@query(
    "native_roundtrip",
    """
    SELECT o_orderstatus AS status,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      / 100.0, 2) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus, strftime(o_orderdate, '%Y-%m')
    """,
)
def native_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6: ClickHouse Native-format source/sink
    (sources/native.py — `INTO OUTFILE ... FORMAT Native`, CH's own
    columnar block serialization and its most efficient offboarding
    container): land the orders table as Native blocks (column-wise
    scalars, null-mask Nullable, block framing), read it back through
    the distributed per-file block walk, aggregate with the exact
    integer-cents sum. The oracle reads the ORIGINAL parquet — green
    means the columnar round-trip is lossless down to timestamps and
    floats."""
    import tempfile

    from clickhouse_learning_spark.sources import native as NV

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    )
    types = ["Int64", "Int64", "String", "Float64",
             "DateTime", "Nullable(String)"]
    path = tempfile.mkdtemp(prefix="native_rt_") + "/orders_native"
    NV.write_native(orders.repartition(4), path, types, block_rows=500)
    back = NV.read_native(spark, path)
    return back.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(_money_cents(F.col("o_totalprice") * 100)) / 100.0,
            2,
        ).alias("total"),
    )


@query(
    "mojibake_repair",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN text || ' café naïve — résumé'
                ELSE text END AS fixed,
           CAST(CASE WHEN doc_id % 6 = 0 THEN 2
                     WHEN doc_id % 3 = 0 THEN 1
                     ELSE 0 END AS INT) AS n_passes
    FROM documents
    """,
)
def mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6: encoding repair (operators/text.fix_mojibake — the
    ftfy-core UTF-8-as-Latin-1 reversal, web crawls' most common
    encoding defect). The fixture corpus is ASCII, so every third doc
    gets a non-ASCII suffix appended and is then CORRUPTED by the
    defect itself (every sixth doc twice — the double-encoding case);
    repair runs over ALL docs and must restore the corrupted ones
    byte-exactly while leaving clean docs untouched, reporting the
    pass count. The oracle states the expected text and pass count in
    plain SQL — no goldens, and a false-positive 'repair' of any clean
    document breaks the hash."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from clickhouse_learning_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    @pandas_udf("string")
    def corrupt(ids, texts):
        out = []
        for i, t in zip(ids, texts):
            i = int(i)
            if i % 3 == 0:
                out.append(
                    TX.make_mojibake(
                        t + " café naïve — résumé", 2 if i % 6 == 0 else 1
                    )
                )
            else:
                out.append(t)
        return pd.Series(out)

    dirty = docs.select(
        "doc_id", corrupt(F.col("doc_id"), F.col("text")).alias("text")
    )
    return TX.fix_mojibake(dirty, out_col="fixed").select(
        "doc_id", "fixed", F.col("n_passes").cast("int").alias("n_passes")
    )


@query(
    "tsv_roundtrip",
    """
    SELECT o_orderstatus AS status,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      / 100.0, 2) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus, strftime(o_orderdate, '%Y-%m')
    """,
)
def tsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6: ClickHouse TabSeparated source/sink (sources/tsv.py —
    `FORMAT TSVWithNamesAndTypes`, the text member of the CH export
    family; never-quoted values with the CH escape set, \\N NULLs,
    two-row headers, shortest-roundtrip floats). Completes the format
    trio: RowBinary = binary rows, Native = binary columns, TSV = text
    rows — one graded roundtrip each over the same orders shape with
    the exact integer-cents aggregation, so all three sit under the
    same lossless-roundtrip hash gate."""
    import tempfile

    from clickhouse_learning_spark.sources import tsv as TSV

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    )
    types = ["Int64", "Int64", "String", "Float64",
             "DateTime", "Nullable(String)"]
    path = tempfile.mkdtemp(prefix="tsv_rt_") + "/orders_tsv"
    TSV.write_tsv(orders.repartition(4), path, types)
    back = TSV.read_tsv(spark, path)
    return back.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(_money_cents(F.col("o_totalprice") * 100)) / 100.0,
            2,
        ).alias("total"),
    )


@query(
    "values_roundtrip",
    """
    SELECT o_orderstatus AS status,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      / 100.0, 2) AS DOUBLE) AS total,
           CAST(count(CASE WHEN o_orderkey % 5 <> 0
                           THEN o_orderpriority END) AS BIGINT) AS n_pri,
           CAST(sum(o_orderkey % 7 + o_orderkey % 11) AS BIGINT)
               AS arr_sum
    FROM orders GROUP BY o_orderstatus, strftime(o_orderdate, '%Y-%m')
    """,
)
def values_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8: ClickHouse Values format source/sink
    (sources/values.py — the `INSERT … VALUES` / `FORMAT Values` wire
    form): parenthesized tuple rows, single-quoted backslash-escaped
    strings, bare NULL literals, bracketed Array(scalar) — the fourth
    member of the per-format roundtrip family (RowBinary = binary
    rows, Native = binary columns, TSV = text rows, Values = SQL-text
    rows), graded over the same orders shape with the exact
    integer-cents aggregation PLUS a Nullable column (every 5th
    priority nulled) and a native array column folded element-wise.
    Readback goes through the SPLIT reader (byte ranges snapped to
    `\\n(` row heads) at an adversarially small chunk size, so the
    split walk itself sits under the hash gate. The oracle recomputes
    everything from the ORIGINAL parquet — green = the text
    round-trip loses nothing."""
    import tempfile

    from clickhouse_learning_spark.sources import values as VV

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        F.when(
            F.col("o_orderkey") % 5 != 0, F.col("o_orderpriority")
        ).alias("o_orderpriority"),
        F.array(
            F.col("o_orderkey") % 7, F.col("o_orderkey") % 11
        ).alias("arr"),
    )
    types = ["Int64", "String", "Float64", "DateTime",
             "Nullable(String)", "Array(Int64)"]
    path = tempfile.mkdtemp(prefix="values_rt_") + "/orders_values"
    VV.write_values(orders.repartition(4), path, types)
    back = VV.read_values_split(
        spark, path, orders.columns, types, chunk_bytes=64 * 1024
    )
    return back.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(_money_cents(F.col("o_totalprice") * 100))
            / 100.0, 2,
        ).alias("total"),
        F.count("o_orderpriority").alias("n_pri"),
        F.sum(
            F.aggregate(
                "arr", F.lit(0).cast("long"), lambda a, x: a + x
            )
        ).alias("arr_sum"),
    )


@query(
    "native_typed_roundtrip",
    """
    WITH e AS (SELECT event_id, user_id, value, event_type
               FROM events WHERE event_id % 41 = 0)
    SELECT CAST(event_id AS BIGINT) AS event_id,
           array_to_string([event_id % 7, event_id % 11, event_id % 13],
                           ',') AS arr,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE CAST(round(value * 10000) AS BIGINT) END AS nv,
           CAST(user_id AS BIGINT) AS t_num,
           event_type AS t_str,
           CAST(user_id % 10 AS BIGINT) AS m_val
    FROM e
    """,
)
def native_typed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6: the Native format's COLUMNAR composites end-to-end —
    Array (cumulative UInt64 offsets + flattened inner column),
    Nullable (mask-first), Tuple (element columns in sequence) and
    Map (offsets + keys column + values column) round-trip through
    the block sink/source; the oracle recomputes every value from the
    events table WITHOUT the binary hop, so green = the columnar walk
    inverts the writer exactly. (RowBinary's row-interleaved forms of
    the same types are graded by rowbinary_typed_roundtrip — the two
    serializations share value codecs but not layout.)"""
    import tempfile

    from clickhouse_learning_spark.sources import native as NV

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 41 == 0
    )
    src = ev.select(
        "event_id",
        F.array(
            F.col("event_id") % 7,
            F.col("event_id") % 11,
            F.col("event_id") % 13,
        ).alias("arr"),
        F.when(
            F.col("event_id") % 3 != 0,
            F.round(F.col("value") * 10000).cast("long"),
        ).alias("nv"),
        F.struct(
            F.col("user_id").alias("col1"),
            F.col("event_type").alias("col2"),
        ).alias("t"),
        F.create_map(F.lit("k"), F.col("user_id") % 10).alias("m"),
    )
    types = ["Int64", "Array(Int64)", "Nullable(Int64)",
             "Tuple(Int64, String)", "Map(String, Int64)"]
    path = tempfile.mkdtemp(prefix="native_typed_") + "/typed_native"
    NV.write_native(src.repartition(3), path, types, block_rows=100)
    back = NV.read_native(spark, path)
    # Graded output must be ATOMIC columns only (VERDICT r7: the
    # driver's pandas canonicalizer sort_values dies on list cells —
    # "unhashable type: 'list'" — before any comparison), so the
    # roundtripped array is serialized to a CSV string for grading and
    # the tuple's fields are projected; the typed Array/Tuple/Map
    # columns themselves are asserted in tests/test_native.py. The
    # standing law in tests/test_graded_shape_law.py keeps this class
    # closed for every registered query.
    return back.select(
        "event_id",
        F.concat_ws(",", F.col("arr").cast("array<string>")).alias("arr"),
        "nv",
        F.col("t.col1").alias("t_num"),
        F.col("t.col2").alias("t_str"),
        F.element_at(F.col("m"), "k").alias("m_val"),
    )


def unigram_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: unigram-LM subword tokenizer (Kudo 2018,
    SentencePiece's default trainer — operators/unigram.py) in the
    deterministic hard-EM form: one distributed word-count shuffle +
    bounded driver EM/pruning rounds, then a map-only Arrow encode of
    every document. Hash-checked like bpe_subword_stats: the oracle
    embeds golden per-doc stats derived by an INDEPENDENT second
    implementation (top-down memoized segmenter + rebuild-style EM,
    tools/make_unigram_golden.py, refuse-on-mismatch)."""
    from clickhouse_learning_spark.operators import unigram as UG

    docs = load_table(spark, sf_dir, "documents")
    model = UG.train_unigram(
        docs, vocab_size=300, max_piece_len=6, max_words=50_000
    )
    enc = UG.unigram_encode(docs, model)
    return enc.select(
        F.col("id").alias("doc_id"),
        "n_words", "n_pieces", "n_unk",
        F.round(
            F.col("n_pieces") / F.greatest(F.col("n_words"), F.lit(1)), 4
        ).alias("pieces_per_word"),
    )


QUERIES["unigram_subword_stats"] = unigram_subword_stats


def _register_unigram_golden() -> None:
    try:
        from clickhouse_learning_spark import golden_unigram as G
    except ImportError:  # pre-generation bootstrap
        return
    _ORACLES["unigram_subword_stats"] = _values_oracle(
        G.UNIGRAM_SUBWORD_STATS,
        ["doc_id", "n_words", "n_pieces", "n_unk", "pieces_per_word"],
        ["BIGINT", "BIGINT", "BIGINT", "BIGINT", "DOUBLE"],
    )


_register_unigram_golden()


@query(
    "blocklist_filtering",
    """
    WITH toks AS (
      SELECT doc_id,
             list_distinct(regexp_extract_all(lower(text),
                                              '[A-Za-z0-9]+')) AS t,
             lower(text) AS lt
      FROM documents)
    SELECT doc_id,
           CAST(len(list_intersect(t, ['slow', 'fail', 'drop'])) AS INT)
               AS bad_word_hits,
           regexp_matches(lt, 'slow scan|drop table') AS has_bad_phrase,
           (len(list_intersect(t, ['slow', 'fail', 'drop'])) = 0
            AND NOT regexp_matches(lt, 'slow scan|drop table')) AS keep
    FROM toks
    """,
)
def blocklist_filtering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: C4-style blocklist filtering
    (text.blocklist_flags — Raffel et al. 2020 §2.2's badword page
    drop): distinct-token intersection with a literal word list plus
    one compiled phrase-alternation regex, all map-only Catalyst. The
    blocklist here is drawn from the synthetic corpus's own
    vocabulary so every branch fires; the oracle re-derives with
    DuckDB list_intersect + regexp_matches."""
    from clickhouse_learning_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    return TX.blocklist_flags(
        docs, words=["slow", "fail", "drop"],
        phrases=["slow scan", "drop table"],
    )


@query(
    "paragraph_dedup_clean",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS t
      FROM documents),
    paras AS (
      SELECT doc_id, i AS pos,
             array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' ')
                 AS para
      FROM toks, LATERAL (SELECT unnest(generate_series(0,
               CAST(ceil(len(t) / 10.0) AS INT) - 1)) AS i) g
      WHERE len(t) > 0),
    wins AS (
      SELECT para, min(doc_id * 100000 + pos) AS wk
      FROM paras GROUP BY para),
    kept AS (
      SELECT p.doc_id, p.pos, p.para
      FROM paras p JOIN wins w
        ON p.para = w.para AND p.doc_id * 100000 + p.pos = w.wk),
    agg AS (
      SELECT doc_id,
             string_agg(para, ' ' ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id),
    base AS (
      SELECT doc_id,
             CAST(ceil(len(t) / 10.0) AS INT) AS n_paras
      FROM toks)
    SELECT b.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           CAST(b.n_paras AS INT) AS n_paras,
           CAST(b.n_paras - coalesce(a.n_kept, 0) AS INT) AS n_dropped
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def paragraph_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: paragraph-level exact dedup (dedup.paragraph_dedup
    — the Dolma/CCNet sub-document step: a paragraph survives only at
    its first (doc, position) occurrence corpus-wide). The flat
    synthetic docs are chunked into 10-token windows as paragraphs in
    pure Catalyst; the operator's min-struct winner rule is re-derived
    in DuckDB as min(doc_id*100000 + pos) + ordered string_agg."""
    from clickhouse_learning_spark.operators import dedup as DD

    docs = load_table(spark, sf_dir, "documents")
    with_paras = docs.select(
        "doc_id",
        F.expr(
            "transform(sequence(0, CAST(ceil(size(regexp_extract_all("
            "lower(text), '[A-Za-z0-9]+', 0)) / 10.0) AS INT) - 1, 1), "
            "i -> array_join(slice(regexp_extract_all(lower(text), "
            "'[A-Za-z0-9]+', 0), i * 10 + 1, 10), ' '))"
        ).alias("paras"),
    ).filter(F.size("paras") > 0)
    return DD.paragraph_dedup(with_paras)


@query(
    "video_mp4_metadata",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 199)) AS media_id)
    SELECT CAST(media_id AS BIGINT) AS media_id,
           (media_id % 97 + 1) * 0.5 AS duration_s,
           CAST(1 + CASE WHEN media_id % 3 = 0 THEN 1 ELSE 0 END AS INT)
               AS n_tracks,
           'avc1' AS video_codec,
           CAST(320 + 16 * (media_id % 8) AS INT) AS video_w,
           CAST(240 + 16 * (media_id % 5) AS INT) AS video_h,
           CAST(media_id % 50 + 10 AS INT) AS video_frames,
           CASE WHEN media_id % 3 = 0 THEN 'mp4a' END AS audio_codec
    FROM ids
    """,
)
def video_mp4_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: ISO-BMFF (MP4) container metadata extraction
    (operators/mp4.py) — the metadata-only first pass of a video
    curation pipeline (filter by duration / resolution / codec before
    paying for decode). 200 deterministic fixture MP4s are built
    executor-side from media_id formulas, then parsed back through
    the independent generic box walk; the oracle recomputes every
    field from the same formulas WITHOUT parsing, so green means the
    parser inverts real ISO-BMFF structure exactly."""
    import pandas as pd

    from clickhouse_learning_spark.operators import mp4 as M

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["id"],
                "content": [M.build_fixture_mp4(int(i))
                            for i in pdf["id"]],
            })

    payloads = spark.range(200).repartition(8).mapInPandas(
        build, "media_id long, content binary"
    )
    meta = M.mp4_metadata(payloads)
    return meta.filter(F.col("mp4_error").isNull()).select(
        "media_id", "duration_s", "n_tracks", "video_codec",
        "video_w", "video_h", "video_frames", "audio_codec",
    )


@query(
    "audio_mp3_metadata",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 179)) AS media_id)
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(media_id % 40 + 5 AS INT) AS n_frames,
           round((media_id % 40 + 5) * 1152.0
                 / ([44100, 48000, 32000][(media_id + 1) % 3 + 1]), 4)
               AS duration_s,
           CAST([128, 192, 256][media_id % 3 + 1] AS DOUBLE)
               AS bitrate_kbps,
           CAST([44100, 48000, 32000][(media_id + 1) % 3 + 1] AS INT)
               AS sample_rate,
           CASE WHEN media_id % 2 = 0 THEN 'stereo' ELSE 'mono' END
               AS mode
    FROM ids
    """,
)
def audio_mp3_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: MPEG-1 Layer III frame-header walk
    (operators/mp3.py) — the audio pre-transcription filter
    (duration / bitrate / sample rate / channel mode straight from
    the published 4-byte header tables, ID3v2 shells skipped).
    Fixture streams are built executor-side from media_id formulas
    with REAL frame headers and zero-filled payloads; the oracle
    recomputes every field from the formulas without parsing."""
    import pandas as pd

    from clickhouse_learning_spark.operators import mp3 as M3

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["id"],
                "content": [M3.build_fixture_mp3(int(i))
                            for i in pdf["id"]],
            })

    payloads = spark.range(180).repartition(8).mapInPandas(
        build, "media_id long, content binary"
    )
    meta = M3.mp3_metadata(payloads)
    return meta.filter(F.col("mp3_error").isNull()).select(
        "media_id", "n_frames",
        F.round("duration_s", 4).alias("duration_s"),
        "bitrate_kbps", "sample_rate", "mode",
    )


def _duck_pagerank_sql(iters: int = 5, d: float = 0.85) -> str:
    """Unrolled power iteration in DuckDB CTEs — the independent
    replay of graph.pagerank over the item-transition graph. Mirrors
    the operator's r6 integer nano-unit recursion (exact BIGINT mass
    sums; one double product + round per edge per iteration) so both
    engines are shuffle/merge-order independent."""
    base_nano = int(round((1.0 - d) * 1e9))
    parts = [
        """edges0 AS (
      SELECT (event_id % 500) AS item, user_id, ts, event_id
      FROM events),
    hops AS (
      SELECT item AS src,
             lead(item) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS dst
      FROM edges0),
    e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
          FROM hops WHERE dst IS NOT NULL GROUP BY src, dst),
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM e UNION SELECT dst FROM e)),
    ow AS (SELECT src, sum(w) AS wout FROM e GROUP BY src),
    en AS (SELECT e.src, e.dst, e.w / ow.wout AS share
           FROM e JOIN ow USING (src)),
    r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank_nano
           FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""r{k} AS (
      SELECT n.node,
             {base_nano} + CAST(round(CAST({d} AS DOUBLE)
                                      * coalesce(m.mass_nano, 0))
                                AS BIGINT) AS rank_nano
      FROM nodes n LEFT JOIN (
        SELECT en.dst AS node,
               sum(CAST(round(en.share * r.rank_nano) AS BIGINT))
                 AS mass_nano
        FROM en JOIN r{k - 1} r ON en.src = r.node
        GROUP BY en.dst) m USING (node))"""
        )
    return (
        "WITH " + ",\n    ".join(parts)
        + f"""
    SELECT CAST(node AS BIGINT) AS item,
           round(rank_nano / 1000000000.0, 6) AS rank
    FROM r{iters}
    """
    )


@query("item_pagerank", _duck_pagerank_sql())
def item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: weighted PageRank (operators/graph.py) over the
    item-transition graph (consecutive items per user's event stream,
    multi-edge weights = transition counts) — link-graph centrality
    as a quality prior, the Common-Crawl-web-graph shape. Five damped
    power iterations, each one keyed join + one map-side-combinable
    sum; the oracle unrolls all five as chained DuckDB CTEs."""
    from pyspark.sql import Window

    from clickhouse_learning_spark.operators import graph as G

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") % 500).alias("item"), "user_id", "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = ev.select(
        F.col("item").alias("src"),
        F.lead("item").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    edges = hops.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    ranks = G.pagerank(edges, weight="w", iters=5)
    return ranks.select(
        F.col("node").cast("long").alias("item"),
        F.round("rank", 6).alias("rank"),
    )


@query(
    "video_webm_metadata",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 149)) AS media_id)
    SELECT CAST(media_id AS BIGINT) AS media_id,
           'webm' AS doctype,
           (media_id % 89 + 1) * 0.25 AS duration_s,
           CAST(CASE WHEN media_id % 2 = 0 THEN 2 ELSE 1 END AS INT)
               AS n_tracks,
           'V_VP9' AS video_codec,
           CAST(426 + 2 * (media_id % 128) AS INT) AS video_w,
           CAST(240 + 2 * (media_id % 60) AS INT) AS video_h,
           CASE WHEN media_id % 2 = 0 THEN 'A_OPUS' END AS audio_codec,
           CASE WHEN media_id % 2 = 0 THEN CAST(48000 AS INT) END
               AS audio_rate
    FROM ids
    """,
)
def video_webm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: Matroska/WebM (EBML, RFC 8794) metadata walk
    (operators/mkv.py) — the third container of the pre-decode filter
    family (MP4, MP3, now WebM). Fixture shells built executor-side
    from media_id formulas, parsed back through the independent
    varint/element walk; the oracle recomputes every field from the
    formulas without parsing. VP9/Opus payload decode stays out of
    scope by design."""
    import pandas as pd

    from clickhouse_learning_spark.operators import mkv as KV

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["id"],
                "content": [KV.build_fixture_mkv(int(i))
                            for i in pdf["id"]],
            })

    payloads = spark.range(150).repartition(8).mapInPandas(
        build, "media_id long, content binary"
    )
    meta = KV.mkv_metadata(payloads)
    return meta.filter(F.col("mkv_error").isNull()).select(
        "media_id", "doctype",
        F.round("duration_s", 6).alias("duration_s"),
        "n_tracks", "video_codec", "video_w", "video_h",
        "audio_codec", "audio_rate",
    )


@query(
    "rowbinary_typed_roundtrip",
    """
    WITH e AS (SELECT event_id, user_id, value, event_type
               FROM events WHERE event_id % 53 = 0)
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(round(value, 4) AS DOUBLE) AS dec_v,
           CAST((event_id % 223) AS VARCHAR) || '.' ||
           CAST((event_id % 251) AS VARCHAR) || '.' ||
           CAST((event_id % 17) AS VARCHAR) || '.' ||
           CAST((event_id % 97) AS VARCHAR) AS ip,
           substr(md5(CAST(event_id AS VARCHAR)), 1, 8) || '-' ||
           substr(md5(CAST(event_id AS VARCHAR)), 9, 4) || '-' ||
           substr(md5(CAST(event_id AS VARCHAR)), 13, 4) || '-' ||
           substr(md5(CAST(event_id AS VARCHAR)), 17, 4) || '-' ||
           substr(md5(CAST(event_id AS VARCHAR)), 21, 12) AS uid,
           CAST(user_id % 10 AS BIGINT) AS m_val,
           event_type AS t_str
    FROM e
    """,
)
def rowbinary_typed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: the exotic RowBinary codecs end-to-end —
    Decimal(18,4), IPv4, UUID (md5-derived, so both engines can state
    the expected canonical string), Map(String,Int64) and
    Tuple(Int64,String) columns round-trip through the binary
    sink/source; the oracle recomputes every value from the events
    table WITHOUT the binary hop, so green = the codec walk inverts
    the writer exactly."""
    import tempfile

    from clickhouse_learning_spark.sources import rowbinary as RB

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 53 == 0
    )
    md5 = F.md5(F.col("event_id").cast("string"))
    src = ev.select(
        "event_id",
        F.round("value", 4).cast("decimal(18,4)").alias("dec_v"),
        F.concat_ws(
            ".",
            (F.col("event_id") % 223).cast("string"),
            (F.col("event_id") % 251).cast("string"),
            (F.col("event_id") % 17).cast("string"),
            (F.col("event_id") % 97).cast("string"),
        ).alias("ip"),
        F.concat_ws(
            "-",
            F.substring(md5, 1, 8), F.substring(md5, 9, 4),
            F.substring(md5, 13, 4), F.substring(md5, 17, 4),
            F.substring(md5, 21, 12),
        ).alias("uid"),
        F.create_map(F.lit("k"), F.col("user_id") % 10).alias("m"),
        F.struct(
            F.col("user_id").alias("col1"),
            F.col("event_type").alias("col2"),
        ).alias("t"),
    )
    types = ["Int64", "Decimal(18, 4)", "IPv4", "UUID",
             "Map(String, Int64)", "Tuple(Int64, String)"]
    path = tempfile.mkdtemp(prefix="rowbinary_typed_") + "/typed_rb"
    RB.write_rowbinary(src.repartition(4), path, types)
    back = RB.read_rowbinary(spark, path)
    return back.select(
        "event_id",
        F.col("dec_v").cast("double").alias("dec_v"),
        "ip",
        F.col("uid").alias("uid"),
        F.element_at("m", "k").alias("m_val"),
        F.col("t.col2").alias("t_str"),
    )


@query(
    "warc_text_extraction",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 39)) AS i)
    SELECT 'http://site' || CAST(i % 13 AS VARCHAR) || '.example/p/' ||
               CAST(i AS VARCHAR) AS url,
           '2024-01-' || lpad(CAST(i % 27 + 1 AS VARCHAR), 2, '0') ||
               'T00:00:00Z' AS warc_date,
           CAST(200 AS INT) AS http_status,
           'Doc ' || i || chr(10) || 'Heading ' || i || chr(10) ||
           'alpha beta ' || i || ' & gamma' || chr(10) ||
           'delta epsilon ' || (i * 7 % 100) AS text,
           CAST(length('Doc ' || i || chr(10) || 'Heading ' || i ||
                chr(10) || 'alpha beta ' || i || ' & gamma' ||
                chr(10) || 'delta epsilon ' || (i * 7 % 100)) AS INT)
               AS n_chars
    FROM ids
    """,
)
def warc_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: WARC ingestion + C4-style HTML text extraction
    (sources/warc.py) — the Common-Crawl entry step of the pipeline.
    40 per-record-gzipped WARC files (warcinfo + HTML response each)
    are parsed through the distributed record walk; script/style/
    comment stripping, block-tag newlines and entity decoding must
    invert the page template EXACTLY — the oracle states the full
    expected text per id as a string formula, no parsing involved."""
    import tempfile

    from clickhouse_learning_spark.sources import warc as W

    d = tempfile.mkdtemp(prefix="warc_fixture_")
    for i in range(40):
        with open(f"{d}/crawl-{i:03d}.warc.gz", "wb") as f:
            f.write(W.build_fixture_warc(i))
    out = W.read_warc(spark, d)
    return out.filter(F.col("warc_error").isNull()).select(
        "url", "warc_date", "http_status", "text",
        F.length("text").cast("int").alias("n_chars"),
    )


@query(
    "url_canonicalization",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 199)) AS i)
    SELECT CAST(i AS BIGINT) AS i,
           CASE i % 4
             WHEN 0 THEN 'https://shop' || CAST(i % 7 AS VARCHAR) ||
               '.example/cart?item=' || CAST(i AS VARCHAR)
             WHEN 1 THEN 'http://site' || CAST(i % 7 AS VARCHAR) ||
               '.example/Path' || CAST(i % 5 AS VARCHAR) ||
               '?a=' || CAST(i % 3 AS VARCHAR) || '&z=1'
             WHEN 2 THEN 'http://host' || CAST(i % 7 AS VARCHAR) ||
               '.example/'
             ELSE 'https://news' || CAST(i % 7 AS VARCHAR) ||
               '.example/story' || CAST(i AS VARCHAR)
           END AS canon
    FROM ids
    """,
)
def url_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: URL canonicalization (text.canonical_url — the
    crawl-dedup URL key): scheme/host lowercase, default ports and
    fragments dropped, utm_*/gclid/fbclid/ref parameters removed,
    remaining parameters sorted, trailing slash trimmed off non-root
    paths. Messy fixture URLs are built per id in four shapes; the
    oracle states the canonical result by formula."""
    from clickhouse_learning_spark.operators import text as TX

    messy = spark.range(200).selectExpr(
        "id AS i",
        """CASE CAST(id % 4 AS INT)
             WHEN 0 THEN concat('HTTPS://Shop', id % 7,
               '.Example:443/cart?utm_source=mail&item=', id,
               '&fbclid=abc#top')
             WHEN 1 THEN concat('http://SITE', id % 7,
               '.example:80/Path', id % 5, '?z=1&a=', id % 3,
               '&utm_campaign=x')
             WHEN 2 THEN concat('http://Host', id % 7, '.EXAMPLE')
             ELSE concat('https://News', id % 7, '.example/story',
               id, '/#frag')
           END AS url""",
    )
    return messy.select(
        "i", TX.canonical_url(F.col("url")).alias("canon")
    )


def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 late: product-quantization ANN (operators/pq.py —
    Jégou et al. 2011): per-subspace codebooks trained with the
    deterministic lowest-id-seed Lloyd sweeps, vectors stored as m
    small codes, queries scored over the COMPRESSED codes with
    asymmetric-distance lookup tables (pure Catalyst, no UDF in the
    scan). Top-5 per query for the 4 lowest-id query vectors.
    Hash-checked via independent numpy goldens
    (tools/make_pq_golden.py, refuse-on-mismatch)."""
    from clickhouse_learning_spark.operators import pq as PQ

    emb = load_table(spark, sf_dir, "embeddings")
    books = PQ.train_pq(emb, m=4, k=16)
    codes = PQ.encode_pq(emb, books).select("vec_id", "pq_code")
    codes = codes.persist()
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    out = None
    for qid, qvec in queries:
        top = PQ.adc_topk(codes, qvec, books, top_k=5).select(
            F.lit(qid).alias("query_id"),
            F.col("vec_id"),
            F.round("adc_dist", 5).alias("adc_dist"),
        )
        out = top if out is None else out.unionAll(top)
    return out


QUERIES["pq_ann_topk"] = pq_ann_topk


def _register_pq_golden() -> None:
    try:
        from clickhouse_learning_spark import golden_pq as G
    except ImportError:
        return
    _ORACLES["pq_ann_topk"] = _values_oracle(
        G.PQ_ANN_TOPK,
        ["query_id", "vec_id", "adc_dist"],
        ["BIGINT", "BIGINT", "DOUBLE"],
    )


_register_pq_golden()


def ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7: IVF-PQ residual ANN (operators/pq.py train_ivfpq /
    encode_ivfpq / ivfpq_topk — FAISS IndexIVFPQ, Jégou et al. 2011
    §V): a coarse quantizer (8 cells, the repo's deterministic cosine
    Lloyd) partitions the corpus, PQ codes (m=4, k=16) store each
    vector's RESIDUAL from its cell centroid, and each query probes
    its 4 nearest cells with per-cell ADC tables rebuilt from
    (query − centroid). The memory story of pq_ann_topk plus the
    partition-pruned probe of ann_ivf_topk in one composed index;
    scan is pure Catalyst (CASE over probed cells of element_at
    sums), plan-asserted in tests/test_plans.py. Hash-checked via
    independent numpy goldens (tools/make_ivfpq_golden.py,
    refuse-on-mismatch)."""
    from clickhouse_learning_spark.operators import pq as PQ

    emb = load_table(spark, sf_dir, "embeddings")
    cents, books = PQ.train_ivfpq(emb, n_cells=8, m=4, k=16)
    codes = PQ.encode_ivfpq(emb, cents, books).persist()
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    out = None
    for qid, qvec in queries:
        top = PQ.ivfpq_topk(
            codes, qvec, cents, books, n_probes=4, top_k=5
        ).select(
            F.lit(qid).alias("query_id"),
            F.col("vec_id"),
            F.col("cell").cast("long").alias("cell"),
            F.round("adc_dist", 5).alias("adc_dist"),
        )
        out = top if out is None else out.unionAll(top)
    return out


QUERIES["ivfpq_ann_topk"] = ivfpq_ann_topk


def _register_ivfpq_golden() -> None:
    try:
        from clickhouse_learning_spark import golden_ivfpq as G
    except ImportError:
        return
    _ORACLES["ivfpq_ann_topk"] = _values_oracle(
        G.IVFPQ_ANN_TOPK,
        ["query_id", "vec_id", "cell", "adc_dist"],
        ["BIGINT", "BIGINT", "BIGINT", "DOUBLE"],
    )


_register_ivfpq_golden()


@query(
    "arrow_roundtrip",
    """
    SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
           CAST(strftime(l_shipdate, '%Y') AS VARCHAR) AS year,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      / 100.0, 2) AS DOUBLE) AS revenue,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus, strftime(l_shipdate, '%Y')
    """,
)
def arrow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7: Apache Arrow IPC source/sink (sources/arrow_ipc.py —
    CH `FORMAT Arrow`, the interop member of the export family next
    to RowBinary/Native/TSV): land lineitem as Arrow FILE-format
    parts straight from Spark's internal Arrow batches (mapInArrow,
    no pandas hop), read it back through the footer-indexed SPLIT
    reader (parallelism = record batches / chunk, not file count),
    and aggregate with the exact integer-cents sum. The oracle reads
    the ORIGINAL parquet — green means the IPC round-trip is lossless
    down to dates, floats and nullable ints."""
    import tempfile

    from clickhouse_learning_spark.sources import arrow_ipc as AR

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice", "l_shipdate",
    )
    path = tempfile.mkdtemp(prefix="arrow_rt_") + "/lineitem_arrow"
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
    try:
        AR.write_arrow(li.repartition(4), path)
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    back = AR.read_arrow_split(spark, path, batches_per_chunk=2)
    return back.groupBy(
        F.col("l_returnflag").alias("rflag"),
        F.col("l_linestatus").alias("lstatus"),
        F.date_format("l_shipdate", "yyyy").alias("year"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(_money_cents(F.col("l_extendedprice") * 100))
            / 100.0, 2,
        ).alias("revenue"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
    )


_KN_PCONT = "((coalesce(pr.npre, 0.0) + 1.0) / (tot.nbi + tot.v + 1.0))"
_KN_PBI = (
    "(CASE WHEN mc.npairs IS NOT NULL THEN "
    "(greatest(coalesce(mi.nleft, 0.0) - 0.75, 0.0) / mc.npairs) "
    "+ ((0.75 * coalesce(mc.nfol, 0.0)) / mc.npairs) * " + _KN_PCONT +
    " ELSE " + _KN_PCONT + " END)"
)


@query(
    "kn_trigram_scores",
    f"""
    WITH train AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
    test AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
    tk_tr AS (SELECT regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS t
              FROM train),
    tri_rows AS (SELECT t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
                 FROM tk_tr,
                      LATERAL (SELECT unnest(generate_series(1, len(t) - 2))
                               AS i) g),
    tri AS (SELECT w1, w2, w3, CAST(count(*) AS DOUBLE) AS c3
            FROM tri_rows GROUP BY w1, w2, w3),
    cctx AS (SELECT w1, w2, sum(c3) AS cctx,
                    CAST(count(*) AS DOUBLE) AS n3d
             FROM tri GROUP BY w1, w2),
    mid AS (SELECT w2, w3, CAST(count(*) AS DOUBLE) AS nleft
            FROM tri GROUP BY w2, w3),
    midctx0 AS (SELECT w2, CAST(count(*) AS DOUBLE) AS npairs
                FROM tri GROUP BY w2),
    bi AS (SELECT w1, w2 FROM
             (SELECT t[i] AS w1, t[i + 1] AS w2
              FROM tk_tr,
                   LATERAL (SELECT unnest(generate_series(1, len(t) - 1))
                            AS i) g)
           GROUP BY w1, w2),
    nfol AS (SELECT w1 AS w2, CAST(count(*) AS DOUBLE) AS nfol
             FROM bi GROUP BY w1),
    midctx AS (SELECT m.w2, m.npairs, f.nfol
               FROM midctx0 m LEFT JOIN nfol f USING (w2)),
    pre AS (SELECT w2 AS w3, CAST(count(*) AS DOUBLE) AS npre
            FROM bi GROUP BY w2),
    tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM bi) AS nbi,
                   (SELECT CAST(count(DISTINCT u) AS DOUBLE)
                    FROM (SELECT unnest(t) AS u FROM tk_tr)) AS v),
    tk_te AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS t
              FROM test),
    te AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
           FROM tk_te,
                LATERAL (SELECT unnest(generate_series(1, len(t) - 2))
                         AS i) g),
    sc AS (SELECT te.doc_id,
                  CAST(round(log10(
                    CASE WHEN cc.cctx IS NOT NULL THEN
                      (greatest(coalesce(tr.c3, 0.0) - 0.75, 0.0)
                       / cc.cctx)
                      + ((0.75 * cc.n3d) / cc.cctx) * {_KN_PBI}
                    ELSE {_KN_PBI} END) * 1000000.0) AS BIGINT) AS lpm
           FROM te
           LEFT JOIN tri tr USING (w1, w2, w3)
           LEFT JOIN cctx cc USING (w1, w2)
           LEFT JOIN mid mi USING (w2, w3)
           LEFT JOIN midctx mc USING (w2)
           LEFT JOIN pre pr USING (w3), tot),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
                   round(sum(lpm) / count(*) / 1000000.0, 2) + 0.0
                       AS avg_logp10
            FROM sc GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(a.n_tri, 0) AS BIGINT) AS n_tri,
           coalesce(a.avg_logp10, 0.0) + 0.0 AS avg_logp10
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN agg a USING (doc_id)
    """,
)
def kn_trigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7: interpolated Kneser–Ney trigram LM
    (operators/kn_lm.py — the KenLM-family smoothing CCNet actually
    ships, vs lm.py's stupid-backoff bigram): train on even doc_ids,
    score the held-out odd half by average interpolated-KN log10
    probability over trigram positions. Training = three count
    shuffles + model-sized N1+ re-aggregations; scoring = keyed joins
    against six model tables. The oracle replays the identical counts,
    discounting and continuation formulas in DuckDB with matching
    parenthesization; per-token contributions quantized to integer
    micro-units and summed exactly (determinism class), `+ 0.0` on the
    rounded mean (negative-zero sweep law)."""
    from clickhouse_learning_spark.operators import kn_lm as KN

    docs = load_table(spark, sf_dir, "documents")
    model = KN.train_kn_trigram(docs.filter(F.col("doc_id") % 2 == 0))
    return KN.score_kn(docs.filter(F.col("doc_id") % 2 == 1), model)


@query(
    "avro_roundtrip",
    """
    SELECT o_orderpriority AS priority,
           CAST(strftime(o_orderdate, '%Y') AS VARCHAR) AS year,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      / 100.0, 2) AS DOUBLE) AS total,
           CAST(count(CASE WHEN o_orderkey % 7 <> 0 THEN 1 END)
                AS BIGINT) AS n_status
    FROM orders
    GROUP BY o_orderpriority, strftime(o_orderdate, '%Y')
    """,
)
def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7: Avro Object Container source/sink (sources/avro.py —
    CH `FORMAT Avro`; pure-Python spec codec since the container
    ships no avro jar): land the orders table as deflate-compressed
    OCF blocks (zigzag varints, null unions, date logical type), read
    it back through the block-header-indexed SPLIT reader, aggregate
    with the exact integer-cents sum. The oracle reads the ORIGINAL
    parquet — green means the roundtrip is lossless down to dates,
    floats and nullable strings."""
    import tempfile

    from clickhouse_learning_spark.sources import avro as AV

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice",
        "o_orderdate",
        F.when(F.col("o_orderkey") % 7 != 0, F.col("o_orderstatus"))
        .alias("o_status"),  # exercise the null union
    )
    path = tempfile.mkdtemp(prefix="avro_rt_") + "/orders_avro"
    AV.write_avro(orders.repartition(4), path, block_rows=500)
    back = AV.read_avro_split(spark, path, rows_per_chunk=1500)
    return back.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy").alias("year"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(_money_cents(F.col("o_totalprice") * 100))
            / 100.0, 2,
        ).alias("total"),
        F.count("o_status").alias("n_status"),
    )


@query(
    "hybrid_retrieval_rrf",
    f"""
    WITH qt AS (
      SELECT query_id, unnest(string_split(qtext, ' ')) AS term
      FROM (VALUES {", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)})
           AS qs(query_id, qtext)),
    tok AS (SELECT doc_id, unnest({_TOKENS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
           GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored_b AS (
      SELECT qt.query_id, tf.doc_id,
             sum(CAST(round((ln(1.0 + (stats.n - dfreq.df + 0.5)
                                       / (dfreq.df + 0.5))
                             * (tf.tf * ({_BM25_K1} + 1.0)
                                / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                                   + {_BM25_B} * dl.dl / stats.avgdl))))
                            * 1000000.0) AS BIGINT)) AS score_micro
      FROM tf JOIN qt USING (term)
      JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
      GROUP BY qt.query_id, tf.doc_id),
    ranked_b AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, doc_id)
                 AS rank
      FROM scored_b),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
          WHERE vec_id IN (1, 2, 3)),
    scored_c AS (
      SELECT q.query_id, c.vec_id,
             {_cos_sql("c.embedding", "q.qv")} AS sim
      FROM embeddings c, q),
    ranked_c AS (
      SELECT query_id, vec_id AS doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id ASC) AS rank
      FROM scored_c),
    contrib AS (
      SELECT query_id, doc_id,
             CAST(round(1000000000.0 / (60 + rank)) AS BIGINT) AS c
      FROM ranked_b WHERE rank <= 20
      UNION ALL
      SELECT query_id, doc_id,
             CAST(round(1000000000.0 / (60 + rank)) AS BIGINT) AS c
      FROM ranked_c WHERE rank <= 20),
    fused AS (SELECT query_id, doc_id, sum(c) AS rrf_nano,
                     CAST(count(*) AS BIGINT) AS n_lists
              FROM contrib GROUP BY query_id, doc_id),
    ranked AS (
      SELECT query_id, doc_id, rrf_nano, n_lists,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_nano DESC, doc_id) AS rank
      FROM fused)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(rrf_nano AS BIGINT) AS rrf_nano, n_lists,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7: hybrid sparse+dense retrieval fused with Reciprocal
    Rank Fusion (operators/retrieval.py — Cormack et al. 2009, the
    calibration-free fusion every RAG/dedup candidate generator uses):
    each query carries a TEXT form (BM25 over the documents
    inverted-index shape, top-20) and a DENSE form (its embedding,
    brute-force cosine top-20), fused as Σ 1/(60 + rank) in integer
    nano-units (shuffle-order-independent exact sum), per-query top-10
    with id tie-break. The oracle replays both sub-rankings and the
    fusion in one SQL pipeline."""
    from clickhouse_learning_spark.operators import retrieval as R
    from clickhouse_learning_spark.operators import similarity as S

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qt = spark.createDataFrame(
        [(i, t) for i, q in _BM25_QUERIES for t in q.split()],
        "query_id long, term string",
    )
    sparse = R.bm25_rank(docs, qt, top_k=20)
    qv = emb.filter(F.col("vec_id").isin([1, 2, 3])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dense = S.cosine_topk_bruteforce(emb, qv, k=20).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    return R.rrf_fuse(
        [sparse.select("query_id", "doc_id", "rank"), dense],
        k=60, top_k=10,
    ).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "rrf_nano", "n_lists", "rank",
    )


@query(
    "sequence_packing_spans",
    f"""
    WITH n AS (SELECT doc_id, len({_TOKENS}) + 1 AS t FROM documents),
    pos AS (SELECT doc_id, t,
                   sum(t) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - t AS s
            FROM n),
    spans AS (
      SELECT doc_id, t, s,
             unnest(generate_series(CAST(s // 256 AS BIGINT),
                                    CAST((s + t - 1) // 256 AS BIGINT)))
                 AS seq_id
      FROM pos)
    SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
           CAST(greatest(s, seq_id * 256) - seq_id * 256 AS BIGINT)
               AS seq_off,
           CAST(greatest(s, seq_id * 256) - s AS BIGINT) AS doc_off,
           CAST(least(s + t, (seq_id + 1) * 256)
                - greatest(s, seq_id * 256) AS BIGINT) AS span_len
    FROM spans
    """,
)
def sequence_packing_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7: GPT-style concat-and-chunk sequence packing with span
    metadata (operators/packing.pack_token_spans): documents in id
    order, one EOS each, cut into 256-token windows; one output row per
    (sequence, document) intersection — the provenance/attention-mask
    map. The global prefix sum runs as the distributed two-phase form
    (bucket totals + bounded running offsets + per-bucket windows),
    never a data-proportional single-partition window; the oracle is
    the single-window DuckDB cumsum with the same integer span math."""
    from clickhouse_learning_spark.operators.packing import pack_token_spans
    from clickhouse_learning_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(TX.tokens(F.col("text"))).alias("n_tok")
    )
    return pack_token_spans(docs, seq_len=256, bucket_docs=64)


def byte_bpe_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7: BYTE-level BPE — the GPT-2 production tokenizer base
    (operators/bpe.py train_byte_bpe/byte_bpe_encode): words carry
    their leading space as Ġ through the exact public GPT-2
    byte↔unicode bijection, no </w> marker, arbitrary bytes encodable.
    Same trainer scale shape as char BPE (one count shuffle + bounded
    driver loop; encode map-only Arrow). Hash-checked via goldens from
    an INDEPENDENT second implementation (its own table construction,
    full-recount trainer, sequential-by-rank encoder —
    tools/make_byte_bpe_golden.py, refuse-on-mismatch)."""
    from clickhouse_learning_spark.operators import bpe as B

    docs = load_table(spark, sf_dir, "documents")
    merges = B.train_byte_bpe(docs, n_merges=30, max_words=50_000)
    enc = B.byte_bpe_encode(docs, merges, id_col="doc_id")
    return enc.select(
        F.col("doc_id"),
        "n_words",
        "n_subwords",
        F.round(
            F.col("n_subwords") / F.greatest(F.col("n_words"), F.lit(1)), 4
        ).alias("subwords_per_word"),
    )


QUERIES["byte_bpe_subword_stats"] = byte_bpe_subword_stats


def _register_byte_bpe_golden() -> None:
    try:
        from clickhouse_learning_spark import golden_byte_bpe as G
    except ImportError:
        return
    _ORACLES["byte_bpe_subword_stats"] = _values_oracle(
        G.BYTE_BPE_SUBWORD_STATS,
        ["doc_id", "n_words", "n_subwords", "subwords_per_word"],
        ["BIGINT", "BIGINT", "BIGINT", "DOUBLE"],
    )


_register_byte_bpe_golden()
