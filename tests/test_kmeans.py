"""Lloyd k-means over embeddings: separated blobs are recovered, the
assignment is deterministic, and sweeps never shuffle the corpus."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from clickhouse_learning_spark.operators import similarity as S


def _blobs(spark, n_per=40, dim=8, k=3, spread=0.05):
    rng = random.Random(7)
    centers = []
    for c in range(k):
        v = [1.0 if i == c else 0.0 for i in range(dim)]
        centers.append(v)
    rows = []
    vid = 0
    for c, center in enumerate(centers):
        for _ in range(n_per):
            vec = [x + rng.gauss(0, spread) for x in center]
            rows.append((vid, vec, c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_kmeans_recovers_separated_blobs(spark):
    df = _blobs(spark)
    cents = S.train_centroids(df, n_centroids=3, refine_iters=3)
    assigned = S.assign_cells(df, cents, with_sim=True)
    # every true blob maps to exactly one cell and vice versa (purity 1.0
    # at this separation)
    m = assigned.groupBy("label", "cell").count().collect()
    by_label = {}
    for r in m:
        by_label.setdefault(r["label"], []).append((r["cell"], r["count"]))
    assert len(by_label) == 3
    cells_used = set()
    for label, pairs in by_label.items():
        assert len(pairs) == 1, f"label {label} split across cells: {pairs}"
        cells_used.add(pairs[0][0])
    assert len(cells_used) == 3
    # cosine to own centroid is high for tight blobs
    mean_sim = assigned.agg(F.avg("sim")).collect()[0][0]
    assert mean_sim > 0.95


def test_kmeans_deterministic(spark):
    df = _blobs(spark, n_per=20)
    a = S.train_centroids(df, n_centroids=3, refine_iters=2)
    b = S.train_centroids(df, n_centroids=3, refine_iters=2)
    assert a == b
    for row in a:
        assert all(math.isfinite(x) for x in row)
