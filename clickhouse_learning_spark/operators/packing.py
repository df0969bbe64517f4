"""Training-batch assembly: deterministic sampling, chunking, packing.

The last mile of a 100 TB training-data pipeline: after filter/dedup,
documents are (a) down-sampled per stratum, (b) assigned to
fixed-token-budget context windows. Three operators, from fully
SQL-expressible (exact DuckDB oracle) to genuinely sequential
(applyInPandas with property-tested invariants):

- :func:`sample_per_group` — deterministic stratified top-N: order each
  group by ``md5(id)`` (a seedable, engine-portable shuffle) and keep
  the first N. Unlike ``df.sampleBy`` this is reproducible across
  engines AND exact per-group counts, so it doubles as the train/val
  split primitive. One window over a group-partitioned sort.
- :func:`chunk_assign` — streaming chunk ids: cumulative token count
  over a deterministic per-group order, ``chunk = floor(cum/capacity)``.
  Documents may straddle a boundary (the "document-splitting allowed"
  regime, as when packing pretraining rows that are later re-tokenized
  and split); it is one window cumsum — no shuffle beyond the group
  partitioning, SQL-expressible, exact oracle.
- :func:`greedy_pack` — true first-fit packing (no straddling): walk
  each group's docs in deterministic order, open a new bin when the
  current doc doesn't fit. Inherently sequential per group →
  ``applyInPandas`` with Arrow batches; each group must fit one
  executor's memory (groups are shards — e.g. ``pack_key =
  xxhash64(doc_id) % n_shards`` — NOT the whole corpus; the shard
  count, not data size, bounds parallelism). Invariants property-
  tested: no bin over capacity (unless a single doc alone exceeds it),
  every doc in exactly one bin, bin ids dense per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic N-per-group sample: rank by md5(salt || id) within
    each group, keep rank ≤ n. ``salt`` reshuffles (a new epoch's
    sample) without touching the data."""
    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def chunk_assign(
    df: DataFrame,
    group_cols: list[str],
    token_col: str,
    capacity: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """chunk_id per row: cumulative ``token_col`` over the group's
    id-ordered docs, integer-divided by ``capacity``. The id order makes
    it deterministic; the cumsum window is the only extra exchange."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return df.withColumn(
        "chunk_id", F.floor((cum - F.col(token_col)) / F.lit(capacity)).cast("long")
    )


def greedy_pack(
    df: DataFrame,
    group_cols: list[str],
    token_col: str,
    capacity: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """First-fit packing without document splitting: per group (in
    id order) keep a running bin; a doc that would overflow ``capacity``
    opens the next bin. A doc alone larger than ``capacity`` gets its
    own bin. Adds ``bin_id`` (dense per group, 0-based).

    Sequential per group by nature → Arrow-batched ``applyInPandas``;
    the vectorized hot path stays in pandas/numpy, and groups are
    hash shards whose count sets the parallelism.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    # copy: StructType.add mutates in place, and df.schema returns the
    # DataFrame's cached schema object
    out_schema = StructType(df.schema.fields + [StructField("bin_id", LongType())])
    gcols = list(group_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins = []
        bin_id, used = -1, capacity + 1  # force a new bin on first doc
        for t in pdf[token_col].to_numpy():
            if used + t > capacity:
                bin_id += 1
                used = 0
            used += t
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf

    return df.groupBy(*gcols).applyInPandas(pack, schema=out_schema)


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    total: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Domain-mix sampling: draw ~``total`` documents whose source
    distribution matches ``weights`` (a data-mix recipe — '30% web,
    20% code, …'). Per-source quota = round(total·wᵢ), clamped to that
    source's availability (no upsampling here — short sources
    under-fill rather than duplicate; duplication is an explicit epoch
    decision, not a sampling side effect). Selection within a source is
    the deterministic md5(salt‖id) rank, so the same call is
    reproducible on any cluster layout and a new ``salt`` redraws.

    One window shuffle on source — the mix recipe itself (a handful of
    weights) rides in the plan as literals, no driver loop.
    """
    quota = F.lit(None).cast("long")
    for src, w in weights.items():
        quota = F.when(F.col(source_col) == src, F.lit(int(round(total * w)))).otherwise(quota)
    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    win = Window.partitionBy(source_col).orderBy(order, F.col(id_col))
    return (
        df.withColumn("_quota", quota)
        .filter(F.col("_quota").isNotNull())
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_quota", "_rn")
    )


def temperature_weights(
    df: DataFrame, alpha: float, source_col: str = "source"
) -> dict[str, float]:
    """Temperature-scaled mix weights — the multilingual-LLM sampling
    rule (mT5/PaLM style): wᵢ ∝ nᵢ^α, normalized. α = 1 reproduces the
    natural distribution, α → 0 approaches uniform (boosting
    low-resource sources). One tiny count aggregation; the returned
    recipe feeds :func:`mix_sources`."""
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    scaled = {s: float(n) ** alpha for s, n in counts.items()}
    z = sum(scaled.values())
    return {s: v / z for s, v in scaled.items()}


def temperature_mix(
    df: DataFrame,
    alpha: float,
    total: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """:func:`temperature_weights` → :func:`mix_sources`."""
    w = temperature_weights(df, alpha, source_col)
    return mix_sources(df, w, total, source_col, id_col, salt)


def epoch_upsample(
    df: DataFrame,
    epochs: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-source epoch table (the explicit-duplication half of a data
    mix: 'web ×1, books ×2.5'): every document repeats ⌊e⌋ times, and a
    deterministic md5-rank fraction of the source's documents gets one
    extra pass for the fractional remainder — so total volume per
    source is e × |source| to within one document, reproducibly.

    Output adds an ``epoch`` column (1-based pass number). The repeat
    is an ``explode(sequence(…))`` — codegen fan-out, no shuffle; the
    fractional pick is one window over the source (count + rank ride
    the same partition).
    """
    e_col = F.lit(None).cast("double")
    for src, e in epochs.items():
        e_col = F.when(F.col(source_col) == src, F.lit(float(e))).otherwise(e_col)
    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    win = Window.partitionBy(source_col).orderBy(order, F.col(id_col))
    cnt = Window.partitionBy(source_col)
    full = F.floor("_e").cast("int")
    extra_quota = F.round((F.col("_e") - F.floor("_e")) * F.count(F.lit(1)).over(cnt)).cast("long")
    n_copies = full + (F.row_number().over(win) <= extra_quota).cast("int")
    return (
        df.withColumn("_e", e_col)
        .filter(F.col("_e").isNotNull())
        .withColumn("_n", n_copies)
        .filter(F.col("_n") >= 1)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_e", "_n")
    )


def pack_token_spans(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tok",
    id_col: str = "doc_id",
    eos: int = 1,
    bucket_docs: int = 4096,
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing WITH span metadata:
    documents (id order, ``eos`` boundary tokens appended to each) are
    concatenated into one global token stream and cut into fixed
    ``seq_len`` windows; the output is one row per (sequence, document)
    INTERSECTION — exactly the map a document-level attention mask or
    a provenance audit needs:

        (seq_id, doc_id, seq_off, doc_off, span_len)

    where the document's tokens [doc_off, doc_off + span_len) land at
    [seq_off, seq_off + span_len) of sequence seq_id. A document longer
    than ``seq_len`` spans several sequences; a short one shares its
    sequence with neighbors.

    Scale: the global prefix sum is NOT a single-partition window (the
    classic scale-killer) — docs bucket by ``id / bucket_docs``, bucket
    totals aggregate to a BOUNDED table whose running offsets broadcast
    back, and the per-doc cumsum windows only within its bucket. The
    span fan-out is a map-side ``explode(sequence(...))``. Everything
    integer arithmetic — hash-exact on any layout."""
    toks = F.col(token_col) + F.lit(eos)
    b = df.select(
        F.col(id_col),
        toks.alias("_t"),
        F.floor(F.col(id_col) / F.lit(bucket_docs)).alias("_bkt"),
    )
    bucket_tot = b.groupBy("_bkt").agg(F.sum("_t").alias("_bt"))
    wb = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the bucket table is bounded (corpus/bucket_docs rows), so this
    # one tiny ordered window is NOT data-proportional
    bucket_off = bucket_tot.select(
        "_bkt", (F.sum("_bt").over(wb) - F.col("_bt")).alias("_boff")
    )
    wd = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = b.withColumn("_cum", F.sum("_t").over(wd)).join(
        F.broadcast(bucket_off), "_bkt"
    ).select(
        F.col(id_col),
        F.col("_t"),
        (F.col("_boff") + F.col("_cum") - F.col("_t")).alias("_start"),
    )
    start, end = F.col("_start"), F.col("_start") + F.col("_t")
    first_seq = F.floor(start / F.lit(seq_len))
    last_seq = F.floor((end - 1) / F.lit(seq_len))
    spans = pos.select(
        F.col(id_col), "_t", "_start",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    g0 = F.greatest(F.col("_start"), F.col("seq_id") * F.lit(seq_len))
    g1 = F.least(
        F.col("_start") + F.col("_t"),
        (F.col("seq_id") + 1) * F.lit(seq_len),
    )
    return spans.select(
        F.col("seq_id").cast("long"),
        F.col(id_col),
        (g0 - F.col("seq_id") * F.lit(seq_len)).cast("long")
        .alias("seq_off"),
        (g0 - F.col("_start")).cast("long").alias("doc_off"),
        (g1 - g0).cast("long").alias("span_len"),
    )
