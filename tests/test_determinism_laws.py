"""Shuffle-layout determinism laws for hash-graded float queries.

The round-5 driver caught `nb_quality_scores` flipping a 2dp-rounded
score between runs: FP addition is not associative, and Spark does not
pin the order in which partial aggregates merge at shuffle fetch — so
any query whose graded output rounds an order-dependent double
accumulation is one unlucky shuffle away from a hash mismatch. Round 6
quantized every such accumulation to exact integer micro/nano units
(classifier.py, lm.py, logreg.py, graph.py — the dsir.py pattern);
this suite is the standing law that keeps the class closed: each query
in the determinism class runs under two adversarially different
physical layouts (different shuffle-partition counts, different input
split sizes, AQE on/off) and must produce row-identical results — not
approximately equal: IDENTICAL, because that is what the driver's
value-hash demands.

A one-layout-pair check cannot *prove* order-invariance, but exact
integer sums make invariance structural; this test guards against a
future edit reintroducing a raw double sum into a graded output.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

# every graded query whose output contains a rounded float formed from
# a distributed accumulation (the determinism class, VERDICT r5 §wrong
# items 1-2), plus the integer-sum exemplars they were modeled on
_CLASS = [
    "nb_quality_scores",
    "lm_quality_scores",
    "lm_heldout_scores",
    "kn_trigram_scores",  # r7: interpolated-KN trigram (kn_lm.py)
    # r8 (ADVICE r7): BM25 per-(doc,term) contributions quantized to
    # integer micro-units before the distributed sum
    "bm25_topk",
    "hybrid_retrieval_rrf",
    "ccnet_perplexity_buckets",
    "lr_quality_scores",
    "item_pagerank",
    "dsir_importance",
    # money-sum shapes hardened to integer cents / micro-units in r6
    "jsonl_dim_roundtrip",
    "rowbinary_roundtrip",
    "avg_state_merge",
]

_LAYOUTS = [
    {
        "spark.sql.shuffle.partitions": "3",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.files.maxPartitionBytes": "65536",
    },
    {
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.files.maxPartitionBytes": "134217728",
    },
]


def _rows_under(spark, name, conf):
    import __spark_entry__ as entry_mod

    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        df = entry_mod.queries()[name](spark, SF_SMOKE)
        return sorted(
            tuple(r) for r in df.collect()
        )
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


@pytest.mark.parametrize("name", _CLASS)
def test_layout_independent(spark, name):
    a = _rows_under(spark, name, _LAYOUTS[0])
    b = _rows_under(spark, name, _LAYOUTS[1])
    assert len(a) == len(b) and len(a) > 0
    # exact equality, cell by cell — the driver hashes values, so
    # "approximately equal" is a failure
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, f"{name}: {len(diffs)} rows differ; first: {diffs[:3]}"
