"""Product-quantization laws (operators/pq.py): hand-computed argmin
codes, ADC-equals-exact on centroid-aligned vectors, monotone
compression error, partition-independent training, divisibility
gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.operators import pq as PQ


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def test_encode_hand_computed(spark):
    """2 subspaces of dim 2, hand-written codebooks: code = argmin
    L2 per subspace, strict-< ties -> lowest id."""
    books = [
        [[0.0, 0.0], [10.0, 10.0]],
        [[5.0, 5.0], [-5.0, -5.0]],
    ]
    df = _df(spark, [
        (1, [1.0, 1.0, 4.0, 4.0]),    # -> [0, 0]
        (2, [9.0, 9.0, -4.0, -6.0]),  # -> [1, 1]
        (3, [5.0, 5.0, 0.0, 0.0]),    # both ties -> lowest ids [0, 0]
    ])
    got = {r.vec_id: list(r.pq_code) for r in
           PQ.encode_pq(df, books).collect()}
    assert got == {1: [0, 0], 2: [1, 1], 3: [0, 0]}


def test_adc_exact_on_centroid_aligned(spark):
    """A vector equal to a centroid combination scores its own code
    at exactly the true squared distance (ADC is exact when the
    residual is zero)."""
    books = [
        [[0.0, 0.0], [10.0, 10.0]],
        [[5.0, 5.0], [-5.0, -5.0]],
    ]
    df = _df(spark, [
        (1, [0.0, 0.0, 5.0, 5.0]),     # code [0,0]
        (2, [10.0, 10.0, -5.0, -5.0]),  # code [1,1]
    ])
    codes = PQ.encode_pq(df, books)
    q = [0.0, 0.0, 5.0, 5.0]
    top = PQ.adc_topk(codes, q, books, top_k=2).collect()
    assert top[0].vec_id == 1 and top[0].adc_dist == 0.0
    # exact L2^2 between the two centroid combos: 2*100 + 2*100 = 400
    assert top[1].vec_id == 2 and top[1].adc_dist == pytest.approx(400.0)


def test_train_deterministic_and_rounded(spark):
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(60)]
    df = _df(spark, rows)
    b1 = PQ.train_pq(df, m=2, k=4, refine_iters=1)
    b2 = PQ.train_pq(df.repartition(7), m=2, k=4, refine_iters=1)
    assert b1 == b2
    for book in b1:
        for cent in book:
            for x in cent:
                assert x == round(x, 6)


def test_dim_divisibility_gate(spark):
    df = _df(spark, [(1, [1.0, 2.0, 3.0])])
    with pytest.raises(ValueError, match="divisible"):
        PQ.train_pq(df, m=2, k=1)


def test_arrow_encode_agrees_with_catalyst(spark):
    """The BLAS hot path and the Catalyst fold implement one spec;
    where codes differ the distances must be numerically tied (the
    expanded |x|^2 - 2xC + |c|^2 form can flip exact ties)."""
    import math
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(200)]
    df = _df(spark, rows)
    books = PQ.train_pq(df, m=2, k=4, refine_iters=1)
    a = {r.vec_id: list(r.pq_code) for r in
         PQ.encode_pq(df, books).collect()}
    b = {r.vec_id: list(r.pq_code) for r in
         PQ.encode_pq_arrow(df, books).collect()}
    vecs = dict(rows)
    dsub = 4
    for vid in a:
        for s in range(2):
            if a[vid][s] == b[vid][s]:
                continue
            xs = vecs[vid][s * dsub:(s + 1) * dsub]
            d1 = sum((p - q) ** 2 for p, q in
                     zip(xs, books[s][a[vid][s]]))
            d2 = sum((p - q) ** 2 for p, q in
                     zip(xs, books[s][b[vid][s]]))
            assert math.isclose(d1, d2, rel_tol=1e-9), (vid, s, d1, d2)
