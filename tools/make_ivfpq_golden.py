"""Golden generator for ``ivfpq_ann_topk``.

IVF-PQ is deterministic end to end (lowest-id seeds at both quantizer
levels, fixed cosine-Lloyd sweeps, 6-decimal rounding of coarse
centroids AND codebooks, strict-< L2 argmin codes, cosine argmax-first
cell assignment, (dist, id) top-k ties), so the graded result is a
fixed function of the corpus. This tool re-derives it with an
INDEPENDENT plain-numpy implementation — vectorized matrix ops instead
of the production assign_cells / Catalyst folds — and refuses to write
unless every row matches the production Spark path exactly.

Usage: python tools/make_ivfpq_golden.py [sf_dir]  (default sf0.01).
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NCELLS, M, K, REFINE, NPROBE, TOPK, NQ = 8, 4, 16, 2, 4, 5, 4


def ref_lloyd(x: np.ndarray, k: int) -> np.ndarray:
    """Cosine Lloyd, lowest-id seeds, REFINE sweeps, mean update,
    empty cells keep their centroid — mirrors train_centroids."""
    cents = x[:k].astype(np.float64).copy()
    for _ in range(REFINE):
        cn = np.sqrt((cents * cents).sum(axis=1))
        xn = np.sqrt((x * x).sum(axis=1))
        sims = (x @ cents.T) / (xn[:, None] * cn[None, :])
        cell = sims.argmax(axis=1)
        new = cents.copy()
        for c in range(k):
            mask = cell == c
            if mask.any():
                new[c] = x[mask].mean(axis=0)
        cents = new
    return cents


def cos_assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    cn = np.sqrt((cents * cents).sum(axis=1))
    xn = np.sqrt((x * x).sum(axis=1))
    return ((x @ cents.T) / (xn[:, None] * cn[None, :])).argmax(axis=1)


def spark_round(x: float, places: int) -> float:
    q = Decimal(1).scaleb(-places)
    return float(Decimal(repr(x)).quantize(q, ROUND_HALF_UP))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import pyarrow.parquet as pq_

    t = pq_.read_table(os.path.join(sf, "embeddings.parquet"),
                       columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist())
    order = np.argsort(ids)
    ids = ids[order]
    vecs = np.array(t.column("embedding").to_pylist(),
                    dtype=np.float32)[order].astype(np.float64)
    dim = vecs.shape[1]
    dsub = dim // M

    # coarse level: train on full vectors, 6dp-rounded like train_ivfpq
    cents = np.round(ref_lloyd(vecs, NCELLS), 6)
    cell = cos_assign(vecs, cents)
    resid = vecs - cents[cell]

    # PQ level on residuals: per-subspace cosine Lloyd, 6dp rounding
    books = [np.round(ref_lloyd(resid[:, s * dsub:(s + 1) * dsub], K), 6)
             for s in range(M)]
    codes = np.zeros((len(ids), M), dtype=np.int64)
    for s in range(M):
        x = resid[:, s * dsub:(s + 1) * dsub]
        d = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d.argmin(axis=1)  # argmin-first = lowest id

    golden = []
    for qi in range(NQ):
        q = vecs[qi]
        qn = np.sqrt((q * q).sum())
        cn = np.sqrt((cents * cents).sum(axis=1))
        sims = (cents @ q) / (cn * qn)
        probe = sorted(range(NCELLS), key=lambda c: (-sims[c], c))[:NPROBE]
        cand = np.isin(cell, probe)
        score = np.zeros(len(ids))
        for c in probe:
            rq = q - cents[c]
            mask = cand & (cell == c)
            for s in range(M):
                rsub = rq[s * dsub:(s + 1) * dsub]
                table = ((books[s] - rsub[None, :]) ** 2).sum(axis=1)
                table = np.array([round(float(v), 9) for v in table])
                score[mask] += table[codes[mask, s]]
        rank = sorted(
            (float(score[i]), int(ids[i]), int(cell[i]))
            for i in range(len(ids)) if cand[i]
        )[:TOPK]
        for d, vid, cl in rank:
            golden.append((int(ids[qi]), vid, cl, spark_round(d, 5)))

    # --- production cross-check gate --------------------------------
    import clickhouse_learning_spark.queries_pipeline  # noqa: F401
    from clickhouse_learning_spark import get_spark
    from clickhouse_learning_spark.queries import QUERIES

    spark = get_spark(app_name="make_ivfpq_golden")
    rows = QUERIES["ivfpq_ann_topk"](spark, sf).collect()
    prod = sorted(
        (int(r.query_id), int(r.vec_id), int(r.cell), float(r.adc_dist))
        for r in rows
    )
    golden_sorted = sorted(golden)
    if prod != golden_sorted:
        diffs = [(g, p) for g, p in zip(golden_sorted, prod)
                 if g != p][:10]
        print("MISMATCH — refusing to write golden. First diffs:")
        for g, p in diffs:
            print("  golden:", g, " production:", p)
        print(f"rows: golden={len(golden_sorted)} prod={len(prod)}")
        return 1

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "clickhouse_learning_spark", "golden_ivfpq.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""Golden IVF-PQ ADC top-k for the sf0.01 grading corpus '
            "— generated by\ntools/make_ivfpq_golden.py from an "
            "INDEPENDENT plain-numpy implementation\n(vectorized "
            "matrix ops vs the production assign_cells/Catalyst "
            "folds),\ncross-checked row-exact against the production "
            'Spark path before writing\n(refuse-on-mismatch)."""\n\n'
            f"# corpus: {sf}  cells={NCELLS} m={M} k={K} "
            f"refine={REFINE} nprobe={NPROBE} topk={TOPK}\n"
            "# rows: (query_id, vec_id, cell, adc_dist)\n"
            "IVFPQ_ANN_TOPK = [\n"
        )
        for row in golden_sorted:
            f.write(f"    {row!r},\n")
        f.write("]\n")
    print(f"wrote {out} ({len(golden_sorted)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
