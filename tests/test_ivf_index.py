"""Persistent IVF index: recall vs brute force and partition pruning of
non-probed cells."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from clickhouse_learning_spark.operators import similarity as S
from clickhouse_learning_spark.schemas import load_table

from .conftest import SF_SMOKE


def test_ivf_index_recall_and_pruning(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = S.IvfIndex(str(tmp_path / "ivf")).build(emb, n_centroids=16)
    q = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")

    got_df = idx.search(spark, q, k=10, n_probes=6)
    got = {(r.query_id, r.vec_id) for r in got_df.collect()}
    exact = {
        (r.query_id, r.vec_id) for r in S.cosine_topk_bruteforce(emb, q, k=10).collect()
    }
    assert len(got & exact) / len(exact) >= 0.9

    # the probed scan must be partition-pruned on cell
    buf = io.StringIO()
    with redirect_stdout(buf):
        got_df.explain(mode="formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0], plan[:2000]


def test_ivf_index_reload_from_disk(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    S.IvfIndex(str(tmp_path / "ivf")).build(emb, n_centroids=8)
    # fresh object: centroids come from disk, search still works
    idx2 = S.IvfIndex(str(tmp_path / "ivf"))
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    out = idx2.search(spark, q, k=5, n_probes=3).collect()
    assert len(out) == 15
    assert len(idx2.centroids()) == 8


def test_quantized_ivf_recall_and_size(spark, tmp_path):
    """int8-quantized index: ~4x smaller on disk than the float index
    (the 100 TB page-cache argument), recall@10 still >= 0.9, and the
    probed scan stays partition-pruned."""
    import os

    emb = load_table(spark, SF_SMOKE, "embeddings")
    fidx = S.IvfIndex(str(tmp_path / "f")).build(emb, n_centroids=16)
    qidx = S.IvfIndex(str(tmp_path / "q")).build(emb, n_centroids=16, quantized=True)
    assert qidx.quantized and not fidx.quantized

    def du(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p + "/data")
            for f in fs
            if f.endswith(".parquet")
        )

    assert du(qidx.path) * 2 < du(fidx.path)  # >=2x conservative (parquet encoding)

    q = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")
    got = {(r.query_id, r.vec_id) for r in qidx.search(spark, q, k=10, n_probes=6).collect()}
    exact = {
        (r.query_id, r.vec_id) for r in S.cosine_topk_bruteforce(emb, q, k=10).collect()
    }
    assert len(got & exact) / len(exact) >= 0.9

    # reload from disk: quantized flag persisted in the index metadata
    idx2 = S.IvfIndex(str(tmp_path / "q"))
    assert idx2.quantized is True
    out = idx2.search(spark, q.limit(2), k=5, n_probes=3).collect()
    assert len(out) == 10


def test_ivf_index_incremental_append(spark, tmp_path):
    """append(): new vectors assign to the FROZEN centroids and land in
    their cell partitions (no retrain, no resident-cell rewrite — the
    IVF analog of a MergeTree insert part). An appended vector is
    findable; the index built-in-one-shot and built-then-appended give
    identical search answers for the same total corpus."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)

    incremental = S.IvfIndex(str(tmp_path / "inc")).build(first, n_centroids=8)
    cents_before = incremental.centroids()
    incremental.append(rest)
    assert incremental.centroids() == cents_before  # frozen

    q = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r.query_id, r.vec_id)
        for r in incremental.search(spark, q, k=5, n_probes=8).collect()
    }
    # a one-shot index over the same corpus WITH THE SAME centroids
    oneshot = S.IvfIndex(str(tmp_path / "one"))
    import json
    from pathlib import Path

    Path(tmp_path / "one").mkdir()
    Path(tmp_path / "one", "centroids.json").write_text(
        json.dumps({"centroids": cents_before, "quantized": False})
    )
    oneshot.append(emb)  # append into an empty index = full assign
    want = {
        (r.query_id, r.vec_id)
        for r in oneshot.search(spark, q, k=5, n_probes=8).collect()
    }
    assert got == want
    # odd (appended) ids are reachable
    assert any(v % 2 == 1 for _, v in got)


def test_ivf_index_maintain_splits_overgrown_cells(spark, tmp_path):
    """maintain() (the OPTIMIZE analog, round 4): after skewed appends
    the overgrown cells split via cell-local k-means, only their
    partitions are rewritten, the corpus is preserved exactly, and
    search recall does not regress."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = S.IvfIndex(str(tmp_path / "m")).build(emb, n_centroids=8)

    # skewed append: re-land ONLY cell 0's vectors three more times —
    # that cell grows ~4x while the rest stay put, breaching the factor
    cell0 = (
        S.assign_cells(emb, idx.centroids())
        .filter(F.col("cell") == 0)
        .select("vec_id", "embedding")
    )
    for shift in (100_000, 200_000, 300_000):
        idx.append(
            cell0.select(
                (F.col("vec_id") + shift).alias("vec_id"), "embedding"
            )
        )
    data = spark.read.parquet(str(tmp_path / "m") + "/data")
    before = {r["cell"]: r["n"] for r in
              data.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_rows = sum(before.values())
    n_cents_before = len(idx.centroids())

    report = idx.maintain(spark, max_cell_factor=1.5)
    assert report["cells_split"], before
    assert report["n_centroids"] > n_cents_before

    after_df = spark.read.parquet(str(tmp_path / "m") + "/data")
    after = {r["cell"]: r["n"] for r in
             after_df.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    # corpus preserved exactly (every id once), split cells shrank
    assert sum(after.values()) == n_rows
    assert after_df.select("vec_id").distinct().count() == n_rows
    assert max(after.values()) < max(before.values())
    # every split cell is smaller than it was
    for c in report["cells_split"]:
        assert after.get(c, 0) < before[c]

    # recall vs brute force does not regress after the split
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = spark.read.parquet(str(tmp_path / "m") + "/data").select(
        "vec_id", "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk_bruteforce(full, q, k=10).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in idx.search(spark, q, k=10, n_probes=8).collect()
    }
    assert len(got & exact) / len(exact) >= 0.9


def test_ivf_index_maintain_quantized_keeps_payloads(spark, tmp_path):
    """Quantized index maintenance: int8 payloads survive the split
    byte-identically (vectors are dequantized only transiently for the
    re-clustering), and search still works."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = S.IvfIndex(str(tmp_path / "mq")).build(
        emb, n_centroids=4, quantized=True
    )
    cell0 = (
        S.assign_cells(emb, idx.centroids())
        .filter(F.col("cell") == 0)
        .select("vec_id", "embedding")
    )
    for shift in (100_000, 200_000, 300_000):
        idx.append(
            cell0.select(
                (F.col("vec_id") + shift).alias("vec_id"), "embedding"
            )
        )
    path = str(tmp_path / "mq") + "/data"
    before = {r["vec_id"]: bytes(r["qv"])
              for r in spark.read.parquet(path).collect()}
    report = idx.maintain(spark, max_cell_factor=1.2)
    assert report["cells_split"]
    after = {r["vec_id"]: bytes(r["qv"])
             for r in spark.read.parquet(path).collect()}
    assert after == before  # payloads untouched, only cell placement
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert len(idx.search(spark, q, k=5, n_probes=4).collect()) == 15
