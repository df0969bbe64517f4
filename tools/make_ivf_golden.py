"""Golden generator for ``ann_ivf_topk`` (round-5 oracle upgrade,
VERDICT r4 task 4).

The IVF query is deterministic end-to-end: centroids seed from the 16
lowest-id vectors with fixed Lloyd sweeps, probe selection and the
top-k both carry pinned tie-breaks. So its result is a fixed function
of the grading corpus, and the committed golden can hash-check it.

This tool re-derives the expected rows with an INDEPENDENT numpy
implementation (plain loops + np.dot per pair; no reuse of the
production BLAS batch kernel, Catalyst cosine expression, or the
assign/probe code paths), replicating the pinned spec:

- seeds: 16 lowest-``vec_id`` embeddings; 2 Lloyd sweeps of
  argmax-cosine assignment (ties -> lowest cell) + element-wise mean
  (empty cells keep their previous centroid);
- probes: 4 cells by descending query-centroid cosine, ties -> HIGHER
  cell index first (the production array_sort+reverse order);
- top-10 per query by (cosine desc, vec_id asc), cosine rounded to 6
  with Spark's HALF_UP BigDecimal semantics.

Refuse-to-write gate: the production Spark query runs over the same
parquet and every row must match exactly, else nothing is written.

Usage: python tools/make_ivf_golden.py [sf_dir]  (default sf0.01).
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CENTROIDS = 16
N_PROBES = 4
K = 10
REFINE_ITERS = 2


def spark_round(x: float, scale: int) -> float:
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-scale), ROUND_HALF_UP
        )
    )


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.dot(a, b) / (np.sqrt(np.dot(a, a)) * np.sqrt(np.dot(b, b))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf, "embeddings.parquet"), columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    ids = [ids[i] for i in order]
    vecs = [vecs[i] for i in order]

    # --- train: lowest-id seeds + Lloyd sweeps ----------------------
    cents = [vecs[i].copy() for i in range(N_CENTROIDS)]
    for _ in range(REFINE_ITERS):
        sums = [np.zeros_like(cents[0]) for _ in range(N_CENTROIDS)]
        counts = [0] * N_CENTROIDS
        for v in vecs:
            best_c, best_s = 0, -np.inf
            for ci, c in enumerate(cents):
                s = _cos(v, c)
                if s > best_s:  # strict: ties keep the lowest index
                    best_c, best_s = ci, s
            sums[best_c] += v
            counts[best_c] += 1
        cents = [
            sums[ci] / counts[ci] if counts[ci] else cents[ci]
            for ci in range(N_CENTROIDS)
        ]

    # final assignment
    cell_of = []
    for v in vecs:
        best_c, best_s = 0, -np.inf
        for ci, c in enumerate(cents):
            s = _cos(v, c)
            if s > best_s:
                best_c, best_s = ci, s
        cell_of.append(best_c)

    # --- probe + score queries (vec_id < 5) -------------------------
    golden = []
    for qi, (qid, qv) in enumerate(zip(ids, vecs)):
        if qid >= 5:
            continue
        scored_cells = sorted(
            ((_cos(qv, c), ci) for ci, c in enumerate(cents)),
            key=lambda t: (-t[0], -t[1]),  # ties: higher index first
        )
        probes = {ci for _, ci in scored_cells[:N_PROBES]}
        cands = [
            (_cos(qv, vecs[i]), ids[i])
            for i in range(len(ids))
            if cell_of[i] in probes
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rank, (sim, vid) in enumerate(cands[:K], start=1):
            golden.append((int(qid), int(vid), spark_round(sim, 6), rank))
    golden.sort()

    # --- production cross-check gate --------------------------------
    from clickhouse_learning_spark import get_spark
    from clickhouse_learning_spark.queries import QUERIES
    import clickhouse_learning_spark.queries_pipeline  # noqa: F401

    spark = get_spark(app_name="make_ivf_golden")
    rows = QUERIES["ann_ivf_topk"](spark, sf).collect()
    prod = sorted(
        (int(r.query_id), int(r.vec_id), float(r.cos_sim), int(r.rank))
        for r in rows
    )
    if prod != golden:
        only_g = [r for r in golden if r not in prod][:10]
        only_p = [r for r in prod if r not in golden][:10]
        print("MISMATCH — refusing to write golden.")
        print("  golden-only:", only_g)
        print("  production-only:", only_p)
        return 1

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "clickhouse_learning_spark",
        "golden_ivf.py",
    )
    with open(out, "w") as fh:
        fh.write(
            '"""Golden IVF-flat top-k for the sf0.01 grading corpus —\n'
            "generated by tools/make_ivf_golden.py from an INDEPENDENT\n"
            "numpy implementation (plain per-pair loops; none of the\n"
            "production assign/probe/score code), cross-checked row-exact\n"
            "against the production Spark query before writing\n"
            "(refuse-on-mismatch). Regenerate after any change to the IVF\n"
            "spec (seeding, sweeps, probe or top-k tie-breaks) or fixture.\n"
            '"""\n\n'
            f"# corpus: {sf}  centroids={N_CENTROIDS} probes={N_PROBES} "
            f"k={K} sweeps={REFINE_ITERS}\n"
            "# rows: (query_id, vec_id, cos_sim, rank)\n"
            "ANN_IVF_TOPK = [\n"
        )
        for r in golden:
            fh.write(f"    {r!r},\n")
        fh.write("]\n")
    print(f"wrote {out}: {len(golden)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
