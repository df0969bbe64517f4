"""SQ8 scalar quantization (operators/similarity.py sq8_*): code-range
and reconstruction-error bounds, zero-span dimensions, recall vs the
float brute-force baseline, layout-independent calibration."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_learning_spark.operators import similarity as S
from tests.conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_codes_in_range_and_reconstruction_bound(spark):
    emb = _emb(spark)
    mins, spans = S.sq8_calibrate(emb)
    codes = S.sq8_encode(emb, mins, spans)
    r = codes.select(
        F.array_min(F.col("codes")).alias("lo"),
        F.array_max(F.col("codes")).alias("hi"),
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert r["lo"] >= 0 and r["hi"] <= 255
    # per-component reconstruction error <= span/510 (half a code step)
    deq = codes.select(
        "vec_id",
        S.sq8_dequantize_col(F.col("codes"), mins, spans).alias("v"),
        F.col("embedding").alias("e"),
    )
    worst = deq.select(
        F.aggregate(
            F.zip_with(
                "v", "e",
                lambda a, b: F.abs(a - b.cast("double"))
            ),
            F.lit(0.0),
            lambda acc, d: F.greatest(acc, d),
        ).alias("err")
    ).agg(F.max("err")).collect()[0][0]
    assert worst <= max(spans) / 510 + 1e-12


def test_zero_span_dimension(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [1.0, 7.0]), (2, [1.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    mins, spans = S.sq8_calibrate(df)
    assert mins[0] == 1.0 and spans[0] == 1.0  # degenerate dim -> span 1
    rows = S.sq8_encode(df, mins, spans).collect()
    assert all(r["codes"][0] == 0 for r in rows)


def test_recall_vs_float_baseline(spark):
    emb = _emb(spark).cache()
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in S.cosine_topk_bruteforce(emb, q, k=10).collect()
    }
    mins, spans = S.sq8_calibrate(emb)
    codes = S.sq8_encode(emb, mins, spans)
    qc = codes.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "codes"
    )
    approx = {
        (r["query_id"], r["vec_id"])
        for r in S.sq8_topk(codes, qc, mins, spans, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_calibration_layout_independent(spark):
    emb = _emb(spark)
    a = S.sq8_calibrate(emb.repartition(1))
    b = S.sq8_calibrate(emb.repartition(13))
    assert a == b


# ---------------------------------------------------------------- JL
def test_jl_projection_shape_and_determinism(spark):
    emb = _emb(spark)
    p1 = {r["vec_id"]: list(r["proj"]) for r in
          S.random_projection(emb.repartition(1), 16).select(
              "vec_id", "proj").collect()}
    p2 = {r["vec_id"]: list(r["proj"]) for r in
          S.random_projection(emb.repartition(7), 16).select(
              "vec_id", "proj").collect()}
    assert p1 == p2  # literal matrix + per-row fold: layout-free
    assert all(len(v) == 16 for v in p1.values())
    # a different seed yields a different matrix
    p3 = {r["vec_id"]: list(r["proj"]) for r in
          S.random_projection(emb, 16, seed=1).select(
              "vec_id", "proj").collect()}
    assert p3 != p1


def test_jl_sign_matrix_is_balanced():
    """The md5-derived signs should be ~50/50 (sanity on the formula,
    not a statistical claim — fixed seed, fixed count)."""
    import hashlib

    signs = [
        1 if hashlib.md5(f"0_{i}_{j}".encode()).hexdigest()[0] < "8"
        else -1
        for i in range(64) for j in range(16)
    ]
    frac = sum(1 for s in signs if s > 0) / len(signs)
    assert 0.4 < frac < 0.6


def test_jl_candidate_recall_vs_full_precision(spark):
    """The candidate-generation contract: the TRUE top-10 must mostly
    survive inside a wider PROJECTED candidate set (survivors re-rank
    at full precision in the intended pipeline). Measured on the
    fixture — near-random 64-dim vectors, JL's WORST case (all
    pairwise cosines cluster near 0, so neighborhoods sit inside the
    JL distortion ε ≈ √(ln n / d)): 32 dims @ 100 candidates gives
    0.84 here; clustered real-embedding distributions fare far
    better. Top-10-in-top-10 at 16 dims is only ~0.22 on this data —
    asserted as a floor so the docstring's honesty stays pinned."""
    emb = _emb(spark).cache()
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact: dict[int, set] = {}
    for r in S.cosine_topk_bruteforce(emb, q, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(dim: int, k: int) -> float:
        proj = S.random_projection(emb, dim).select(
            "vec_id", F.col("proj").alias("embedding")
        )
        pq = proj.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        cand: dict[int, set] = {}
        for r in S.cosine_topk_bruteforce(proj, pq, k=k).collect():
            cand.setdefault(r["query_id"], set()).add(r["vec_id"])
        hit = sum(len(exact[qid] & cand[qid]) for qid in exact)
        return hit / sum(len(v) for v in exact.values())

    assert recall(32, 100) >= 0.8
    assert recall(16, 10) >= 0.15  # the documented worst-case floor
