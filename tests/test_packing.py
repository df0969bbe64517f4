"""Training-batch assembly invariants (operators/packing.py).

greedy_pack is the one genuinely sequential operator in the repo
(applyInPandas walk); its invariants are property-tested against a
plain-python reference. sample_per_group and chunk_assign additionally
have exact DuckDB oracles at the driver level (sample_stratified,
chunk_assignment, greedy_pack_bins — the last via recursive CTE).
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_learning_spark.operators.packing import (
    chunk_assign,
    greedy_pack,
    sample_per_group,
)

CAP = 100
DOCS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),           # group
        st.integers(min_value=1, max_value=130),  # tokens (some > CAP)
    ),
    min_size=1,
    max_size=40,
)


def ref_pack(tokens, cap=CAP):
    bins, bin_id, used = [], -1, cap + 1
    for t in tokens:
        if used + t > cap:
            bin_id, used = bin_id + 1, 0
        used += t
        bins.append(bin_id)
    return bins


@given(docs=DOCS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_greedy_pack_invariants(spark, docs):
    rows = [(i, g, t) for i, (g, t) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, g string, n long")
    out = greedy_pack(df, ["g"], "n", CAP).collect()
    assert len(out) == len(rows)  # every doc assigned exactly once
    by_group = {}
    for r in out:
        by_group.setdefault(r["g"], []).append((r["doc_id"], r["n"], r["bin_id"]))
    for g, items in by_group.items():
        items.sort()
        # matches the sequential reference walk
        assert [b for _, _, b in items] == ref_pack([n for _, n, _ in items])
        # capacity respected except single-doc-overflow bins
        fill = {}
        for _, n, b in items:
            fill.setdefault(b, []).append(n)
        for b, ns in fill.items():
            assert sum(ns) <= CAP or len(ns) == 1
        # dense 0-based bin ids
        assert sorted(set(fill)) == list(range(len(fill)))


def test_chunk_assign_matches_reference(spark):
    rows = [(i, "g", 30 + (i * 37) % 60) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, g string, n long")
    got = {
        r["doc_id"]: r["chunk_id"]
        for r in chunk_assign(df, ["g"], "n", CAP).collect()
    }
    cum = 0
    for i, _, n in rows:
        assert got[i] == cum // CAP
        cum += n


def test_sample_per_group_exact_deterministic_and_salted(spark):
    rows = [(i, "g%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    s1 = sample_per_group(df, ["g"], 7, id_col="doc_id")
    s2 = sample_per_group(df, ["g"], 7, id_col="doc_id")
    a = sorted(map(tuple, s1.collect()))
    assert a == sorted(map(tuple, s2.collect()))  # deterministic
    per_g = {}
    for doc_id, g in a:
        per_g[g] = per_g.get(g, 0) + 1
    assert per_g == {"g0": 7, "g1": 7, "g2": 7}  # exact counts
    # matches the portable md5 ranking
    for g in per_g:
        members = [i for i, gg in rows if gg == g]
        want = sorted(members, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:7]
        got = sorted(i for i, gg in a if gg == g)
        assert got == sorted(want)
    # a different salt draws a different (but equally sized) sample
    s3 = sorted(map(tuple, sample_per_group(df, ["g"], 7, salt="epoch2").collect()))
    assert s3 != a and len(s3) == len(a)


def test_small_n_groups_keep_all_rows(spark):
    df = spark.createDataFrame([(1, "g"), (2, "g")], "doc_id long, g string")
    assert sample_per_group(df, ["g"], 10).count() == 2


def test_temperature_weights_boost_low_resource(spark):
    """α = 1 reproduces the natural distribution; α = 0 is uniform;
    α = 0.5 sits between (low-resource share strictly rises as α
    falls)."""
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.operators.packing import (
        temperature_weights,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "rare").otherwise("common").alias(
            "source"
        ),
    )
    w1 = temperature_weights(df, 1.0)
    w05 = temperature_weights(df, 0.5)
    w0 = temperature_weights(df, 0.0)
    assert w1["rare"] == pytest.approx(0.1)
    assert w0["rare"] == pytest.approx(0.5)
    assert w1["rare"] < w05["rare"] < w0["rare"]
    assert sum(w05.values()) == pytest.approx(1.0)


def test_pack_token_spans_laws(spark):
    """Span tiling laws for the concat-and-chunk packer: (a) each
    document's spans reconstruct exactly [0, n_tok + eos) in order;
    (b) each sequence's spans tile [0, 256) contiguously (last
    sequence tiles a prefix); (c) bucket size — the distributed
    prefix-sum's only knob — does not change a single row."""
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.operators.packing import pack_token_spans

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        # lengths 0..599, incl. > seq_len docs and empty docs
        ((F.col("id") * 37) % 600).cast("long").alias("n_tok"),
    )
    out = pack_token_spans(docs, seq_len=256, bucket_docs=16).collect()
    by_doc = {}
    by_seq = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_seq.setdefault(r["seq_id"], []).append(r)
    lens = {r["doc_id"]: r["n_tok"] for r in docs.collect()}
    for d, spans in by_doc.items():
        spans.sort(key=lambda r: r["doc_off"])
        assert spans[0]["doc_off"] == 0
        for a, b in zip(spans, spans[1:]):
            assert a["doc_off"] + a["span_len"] == b["doc_off"]
        total = spans[-1]["doc_off"] + spans[-1]["span_len"]
        assert total == lens[d] + 1, d  # +1 = the EOS token
    assert set(by_doc) == set(lens)  # empty docs still carry their EOS
    last_seq = max(by_seq)
    for sid, spans in by_seq.items():
        spans.sort(key=lambda r: r["seq_off"])
        assert spans[0]["seq_off"] == 0
        for a, b in zip(spans, spans[1:]):
            assert a["seq_off"] + a["span_len"] == b["seq_off"]
        width = spans[-1]["seq_off"] + spans[-1]["span_len"]
        assert width == 256 or (sid == last_seq and width <= 256), sid
    # (c) bucket-size independence
    alt = pack_token_spans(docs, seq_len=256, bucket_docs=7).collect()
    key = lambda r: (r["seq_id"], r["doc_id"], r["seq_off"])  # noqa: E731
    assert sorted(map(tuple, alt), key=lambda t: t[:3]) == \
        sorted(map(tuple, out), key=lambda t: t[:3])
