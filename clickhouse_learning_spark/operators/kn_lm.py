"""Interpolated Kneser–Ney trigram language model — the KenLM-family
smoothing CCNet actually ships (Wenzek et al. 2020 train KenLM 5-grams;
Chen & Goodman 1999 §3 is the interpolated-KN definition). Extends
operators/lm.py's bigram stupid-backoff with the smoothing that made
count-based LMs competitive: absolute discounting plus CONTINUATION
counts — "how many contexts has this word completed" — instead of raw
frequency at the backoff levels.

Model (fixed discount D = 0.75, the textbook value; exact in every
engine as a dyadic float):

    p(w3 | w1 w2) = max(c3(w1w2w3) − D, 0) / cctx(w1w2)
                    + (D · N1+(w1w2•) / cctx(w1w2)) · p(w3 | w2)
    p(w3 | w2)    = max(N1+(•w2w3) − D, 0) / N1+(•w2•)
                    + (D · N1+(w2•) / N1+(•w2•)) · pcont(w3)
    pcont(w3)     = (N1+(•w3) + 1) / (N1+(••) + V + 1)

where cctx(w1w2) = Σ_w c3(w1w2w) (contexts that HAVE continuations —
the KN-correct denominator, which also makes the "context seen"
branch test exact), N1+ are distinct-continuation counts, V the
unigram vocabulary size, and pcont carries a +1/(…+V+1) floor so every
token — including OOV — scores a finite log-probability (the
documented practical smoothing of the continuation distribution; CCNet
reaches the same end through KenLM's <unk>). An UNSEEN context backs
off a level with weight 1 — mass is not strictly normalized there,
which is irrelevant for quality SCORING and keeps both engines on one
shared closed form.

Scale design (100 TB corpus):
- training = ONE corpus-sized count shuffle (a combined
  (w1, w2|NULL, w3|NULL) gram table — map-side combinable); trigram/
  bigram counts, the vocabulary and every N1+ table are re-aggregations
  of that COUNT table (model-sized, never corpus-sized).
- scoring = keyed left joins of the test trigram stream against six
  model-sized tables + one per-doc re-aggregation; AQE broadcasts
  every side that fits, and the two 1-row totals ride an explicit
  broadcast cross-join.
- per-token log10 contributions are quantized to INTEGER micro-units
  and summed exactly (the repo's determinism discipline — a raw
  double sum merges in unpinned shuffle order); the per-doc mean is
  two final divisions on exact integers, `+ 0.0` to pin the sign of
  zero.

Tokenization matches operators/text.py so the DuckDB oracle replays
it verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.scalar import round_half_away_long
from clickhouse_learning_spark.operators.lm import _tokens

D = 0.75


@dataclass
class KNTrigramLM:
    """Count tables, all DOUBLE-valued so ratios divide identically in
    every engine; each is O(unique grams)."""

    tri: DataFrame        # (w1, w2, w3, c3)
    cctx: DataFrame       # (w1, w2, cctx, n3d)   Σc3 + N1+(w1w2•)
    mid: DataFrame        # (w2, w3, nleft)        N1+(•w2w3)
    midctx: DataFrame     # (w2, npairs, nfol)     N1+(•w2•), N1+(w2•)
    pre: DataFrame        # (w3, npre)             N1+(•w3)
    totals: DataFrame     # 1 row: nbi, v          N1+(••), |vocab|


def train_kn_trigram(corpus: DataFrame, text_col: str = "text") -> KNTrigramLM:
    """ONE corpus-sized count shuffle + model-sized re-aggregations
    (optimization r10, guide §2.1/§2.3). Trigram counts, bigram counts
    and the vocabulary all derive EXACTLY from a single position
    explode over i = 1..max(n-1, 1):

    - row i carries (w1 = t_i, w2 = t_{i+1} | NULL, w3 = t_{i+2} | NULL),
      so rows with w2 non-NULL are precisely the bigram occurrences and
      rows with w3 non-NULL precisely the trigram occurrences;
    - a single-token doc emits one (t_1, NULL, NULL) row, so
      distinct(w1) ∪ distinct(w2) is precisely the token vocabulary.

    The previous shape ran three separate tokenize+explode+shuffle
    passes (trigrams, bigrams, vocab) over the corpus; the combined
    (w1, w2, w3) count table costs one extra row per document versus
    the trigram table alone and every downstream frame re-aggregates
    counts (model-sized). Count values and types are unchanged, so the
    model tables are bit-identical (replay-verified)."""
    src = corpus.select(_tokens(text_col).alias("_ts"))
    grams = (
        src.filter(F.size("_ts") >= 1)
        .select(
            "_ts",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size("_ts") - F.lit(1), F.lit(1)),
                )
            ).alias("_i"),
        )
        .select(
            F.element_at("_ts", F.col("_i")).alias("w1"),
            F.try_element_at("_ts", F.col("_i") + F.lit(1)).alias("w2"),
            F.try_element_at("_ts", F.col("_i") + F.lit(2)).alias("w3"),
        )
    )
    counts = grams.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("_c")
    )
    counts = counts.persist()
    tri = counts.filter(F.col("w3").isNotNull()).select(
        "w1", "w2", "w3", F.col("_c").cast("double").alias("c3")
    )
    cctx = tri.groupBy("w1", "w2").agg(
        F.sum("c3").alias("cctx"),
        F.count(F.lit(1)).cast("double").alias("n3d"),
    )
    mid = tri.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).cast("double").alias("nleft")
    )
    midctx = tri.groupBy("w2").agg(
        F.count(F.lit(1)).cast("double").alias("npairs")
    )
    bi = (
        counts.filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.sum("_c").alias("_cb"))
    )
    bi = bi.persist()
    nfol = bi.groupBy("w1").agg(
        F.count(F.lit(1)).cast("double").alias("nfol")
    ).withColumnRenamed("w1", "w2")
    midctx = midctx.join(nfol, "w2", "left")
    pre = bi.groupBy("w2").agg(
        F.count(F.lit(1)).cast("double").alias("npre")
    ).withColumnRenamed("w2", "w3")
    vocab = (
        counts.select(F.col("w1").alias("w"))
        .union(
            counts.filter(F.col("w2").isNotNull()).select(
                F.col("w2").alias("w")
            )
        )
        .distinct()
    )
    totals = bi.agg(F.count(F.lit(1)).cast("double").alias("nbi")).crossJoin(
        vocab.agg(F.count(F.lit(1)).cast("double").alias("v"))
    )
    return KNTrigramLM(tri=tri, cctx=cctx, mid=mid, midctx=midctx,
                       pre=pre, totals=totals)


def score_kn(
    docs: DataFrame,
    lm: KNTrigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tri, avg_logp10) — average interpolated-KN log10
    probability over the document's trigram positions (tokens with two
    predecessors; documents under three tokens score 0.0 with
    n_tri = 0). Expressions are parenthesized EXACTLY like the DuckDB
    oracle so both engines evaluate the same float dag."""
    # position rows with one _i=NULL sentinel per <3-token doc
    # (explode_outer of a NULL sequence) so the per-doc groupBy covers
    # EVERY document — no docs-side join-back (optimization r10, guide
    # §2.4; same shape as lm.score_docs)
    src = docs.select(
        F.col(id_col).alias("_id"), _tokens(text_col).alias("_ts")
    )
    trigrams = src.select(
        "_id",
        "_ts",
        F.explode_outer(
            F.when(
                F.size("_ts") >= 3,
                F.sequence(F.lit(1), F.size("_ts") - F.lit(2)),
            )
        ).alias("_i"),
    ).select(
        "_id",
        "_i",
        F.element_at("_ts", F.col("_i")).alias("w1"),
        F.element_at("_ts", F.col("_i") + F.lit(1)).alias("w2"),
        F.element_at("_ts", F.col("_i") + F.lit(2)).alias("w3"),
    )
    joined = (
        trigrams
        .join(lm.tri, ["w1", "w2", "w3"], "left")
        .join(lm.cctx, ["w1", "w2"], "left")
        .join(lm.mid, ["w2", "w3"], "left")
        .join(lm.midctx, ["w2"], "left")
        .join(lm.pre, ["w3"], "left")
        .crossJoin(F.broadcast(lm.totals))
    )
    pcont = (F.coalesce(F.col("npre"), F.lit(0.0)) + F.lit(1.0)) / (
        F.col("nbi") + F.col("v") + F.lit(1.0)
    )
    pbi = F.when(
        F.col("npairs").isNotNull(),
        (
            F.greatest(
                F.coalesce(F.col("nleft"), F.lit(0.0)) - F.lit(D),
                F.lit(0.0),
            )
            / F.col("npairs")
        )
        + (
            (F.lit(D) * F.coalesce(F.col("nfol"), F.lit(0.0)))
            / F.col("npairs")
        )
        * pcont,
    ).otherwise(pcont)
    p = F.when(
        F.col("cctx").isNotNull(),
        (
            F.greatest(
                F.coalesce(F.col("c3"), F.lit(0.0)) - F.lit(D),
                F.lit(0.0),
            )
            / F.col("cctx")
        )
        + ((F.lit(D) * F.col("n3d")) / F.col("cctx")) * pbi,
    ).otherwise(pbi)
    # FP half-away quantizer (functions/scalar.py) — see lm.py
    lp_micro = round_half_away_long(F.log10(p) * 1_000_000.0)
    # count/sum over non-sentinel rows only; NULL sum for n_tri = 0
    # coalesces to 0.0 — the same short-doc contract as before
    per_doc = joined.groupBy("_id").agg(
        F.count(F.col("_i")).alias("n_tri"),
        F.sum(F.when(F.col("_i").isNotNull(), lp_micro)).alias(
            "_sum_micro"
        ),
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        F.col("n_tri").cast("long").alias("n_tri"),
        (
            F.coalesce(
                F.round(
                    F.col("_sum_micro") / F.col("n_tri")
                    / 1_000_000.0, 2,
                ),
                F.lit(0.0),
            )
            + F.lit(0.0)  # pin the sign of zero (sweep law)
        ).alias("avg_logp10"),
    )
