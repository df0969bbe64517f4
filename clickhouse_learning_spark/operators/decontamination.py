"""Train/eval contamination detection (benchmark decontamination).

The standard pre-training hygiene step (GPT-3 appendix C / PaLM style):
a training document is contaminated when it shares any word n-gram with
an evaluation/benchmark document; contaminated docs are dropped (or
flagged) before training. At 100 TB this must be a hash join on
compact n-gram keys — never a text scan per (train, eval) pair.

Mechanics mirror the MinHash shingle path (operators/dedup.py):
``explode(sequence(...))`` + ``slice`` + ``array_join`` + ``xxhash64``
are all plain Catalyst expressions — whole-stage codegen, no
interpreted higher-order lambdas in the per-row path (this repo's rule
for hot loops). The train side shuffles only (id, gram-hash) longs;
the eval side (benchmarks are small — thousands of docs) broadcasts,
so the contamination check adds ZERO shuffle over the train corpus
beyond the n-gram fan-out itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_learning_spark.operators.text import tokens


def word_ngram_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """(id, g) — one row per word n-gram, g = xxhash64 of the
    space-joined n-gram. Docs with fewer than n tokens emit their full
    token sequence as one gram (matching the shingle convention for
    short docs)."""
    src = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t"))
    src = src.repartition(df.sparkSession.sparkContext.defaultParallelism, "id")
    return src.select(
        "id",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("t") - F.lit(n - 1), F.lit(1)))
        ).alias("i"),
        "t",
    ).select(
        "id", F.xxhash64(F.array_join(F.slice("t", F.col("i"), n), " ")).alias("g")
    )


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per contaminated train doc: the number of distinct n-grams it
    shares with ANY eval doc. Train docs with zero overlap don't appear.

    ``broadcast_eval``: benchmark suites are tiny next to the corpus —
    broadcast their distinct gram set so the train side never shuffles.
    Set False when the eval side is itself corpus-sized (contamination
    between two crawls): both sides then shuffle on the gram hash.
    """
    tg = word_ngram_rows(train, text_col, id_col, n)
    eg = word_ngram_rows(eval_df, text_col, id_col, n).select("g").distinct()
    if broadcast_eval:
        eg = F.broadcast(eg)
    return (
        tg.join(eg, "g")
        .groupBy("id")
        .agg(F.count_distinct("g").alias("n_shared"))
        .select(F.col("id").alias(id_col), "n_shared")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_shared: int = 1,
    **kwargs,
) -> DataFrame:
    """Drop train docs sharing ≥ ``min_shared`` distinct n-grams with
    the eval set (min_shared > 1 tolerates boilerplate collisions)."""
    hits = contamination_report(train, eval_df, text_col, id_col, n, **kwargs)
    losers = hits.filter(F.col("n_shared") >= min_shared).select(id_col)
    return train.join(losers, id_col, "left_anti")
