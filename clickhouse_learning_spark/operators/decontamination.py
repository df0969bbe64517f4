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


def build_gram_bloom(
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    bits: int = 1 << 20,
    hashes: int = 5,
    grams: DataFrame | None = None,
):
    """Distributed Bloom-filter build over the eval set's n-gram
    hashes: k = ``hashes`` positions per gram via seeded xxhash64
    (hashing the (gram, seed) pair), mapped to (word, or-mask) pairs
    and bit_or-reduced per 64-bit word — the driver collects only
    ``bits/64`` longs, INDEPENDENT of eval size (the raw gram set never
    leaves the executors). Returns a numpy uint64 array.

    ``grams``: an already-computed distinct (g) frame for the eval set —
    callers that also need the gram set for exact verification pass it
    so the eval corpus is tokenized once, not twice (guide §2.1: don't
    recompute what a prior stage holds)."""
    import numpy as np

    eg = (
        grams
        if grams is not None
        else word_ngram_rows(eval_df, text_col, id_col, n).select("g").distinct()
    )
    pos = eg.select(
        F.explode(
            F.array(*[
                F.pmod(F.xxhash64("g", F.lit(i)), F.lit(bits))
                for i in range(hashes)
            ])
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            # SQL shiftleft: the python wrapper only takes a literal
            # bit count, the SQL form shifts by a column fine
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()
    )
    arr = np.zeros(bits // 64, dtype=np.uint64)
    for r in words:
        arr[r["w"]] = np.uint64(np.int64(r["mask"]).view(np.uint64))
    return arr


def bloom_contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    bits: int = 1 << 20,
    hashes: int = 5,
) -> DataFrame:
    """EXACT contamination counts via a Bloom prefilter — the scale
    path when the eval gram set is too large to broadcast raw (contam-
    ination between two crawls): the train side drops every gram the
    ``bits``-wide filter rejects (pure-JVM bit tests, see below —
    false-positive rate (1−e^{−kn/m})^k, ~0.1%% at the defaults for 1M
    grams), and only the tiny surviving candidate set pays the exact
    verification join. Output is identical to
    :func:`contamination_report` (the verify join removes Bloom false
    positives), so the same oracle grades both paths.

    The membership probe is pure JVM codegen (optimization r10, guide
    §4.1 — builtins beat UDFs): the ``bits/64``-long filter rides a
    BROADCAST 1-row relation and each position is tested with
    ``bit_get(element_at(filter, word), bit)``. The previous
    pandas_udf shipped 5 × 8 bytes of hash positions per train gram
    through an ArrowEvalPython round trip just to AND five bit tests.
    A plan-literal array was measured and rejected: ``F.lit(list)``
    builds a 16384-child CreateArray that AQE re-optimizes at every
    stage boundary (~2× end-to-end slowdown, 430 KB plans); the
    broadcast row keeps the filter out of the expression tree entirely
    — one 128 KB row shipped once per executor, O(1) per-row probes."""
    import numpy as np

    # ONE tokenize+explode+distinct pass over the eval corpus: the same
    # persisted gram set feeds the Bloom build (collect of bits/64
    # longs) and the exact-verify join below. Before, build and verify
    # each re-derived it from the raw text (optimization r10, guide
    # §2.1). persist() not unpersist()'d: the frame is model-sized
    # (distinct gram hashes) and the caller's session owns its cache
    # lifetime, same as the minhash signature table.
    eg = word_ngram_rows(eval_df, text_col, id_col, n).select("g").distinct()
    eg = eg.persist()
    arr = build_gram_bloom(
        eval_df, text_col, id_col, n, bits, hashes, grams=eg
    )
    spark = train.sparkSession
    fdf = spark.createDataFrame(
        [([int(x) for x in arr.astype(np.int64)],)], "_bf: array<bigint>"
    )

    tg = word_ngram_rows(train, text_col, id_col, n)
    pcols = [
        F.pmod(F.xxhash64("g", F.lit(i)), F.lit(bits)).alias(f"_p{i}")
        for i in range(hashes)
    ]
    probed = tg.select("id", "g", *pcols).join(F.broadcast(fdf))
    ok = None
    for i in range(hashes):
        p = F.col(f"_p{i}")
        word = F.element_at(
            F.col("_bf"), (F.shiftright(p, 6) + F.lit(1)).cast("int")
        )
        hit = F.bit_get(word, p % 64) == 1
        ok = hit if ok is None else (ok & hit)
    cand = probed.filter(ok).select("id", "g")
    return (
        cand.join(eg, "g")  # exact verify: false positives die here
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
