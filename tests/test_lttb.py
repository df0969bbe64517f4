"""largestTriangleThreeBuckets (functions/lttb.py): verification
against an independent numpy implementation of the published algorithm
(Steinarsson 2013), structural properties, and edge cases. The graded
query ch_lttb_dialect hash-checks the dialect path against a DuckDB
recursive-CTE replay."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from clickhouse_learning_spark.functions.lttb import lttb


def _lttb_numpy(xs, ys, n):
    """Independent vectorized reference (np.argmax keeps the FIRST
    maximal area — the same tie rule as the fold)."""
    pts = np.array(sorted(zip(xs, ys)), dtype=float)
    big_n = len(pts)
    if n >= big_n:
        return pts.tolist()
    if n == 1:
        return [pts[0].tolist()]
    if n == 2:
        return [pts[0].tolist(), pts[-1].tolist()]
    every = (big_n - 2) / (n - 2)
    out = [pts[0].tolist()]
    a = 0
    for i in range(n - 2):
        lo = math.floor(i * every) + 1
        hi = math.floor((i + 1) * every) + 1
        av_lo = math.floor((i + 1) * every) + 1
        av_hi = min(math.floor((i + 2) * every) + 1, big_n)
        avg = pts[av_lo:av_hi].mean(axis=0)
        cand = pts[lo:hi]
        areas = np.abs(
            (pts[a, 0] - avg[0]) * (cand[:, 1] - pts[a, 1])
            - (pts[a, 0] - cand[:, 0]) * (avg[1] - pts[a, 1])
        )
        a = lo + int(np.argmax(areas))
        out.append(pts[a].tolist())
    out.append(pts[-1].tolist())
    return out


def test_matches_independent_reference():
    rng = random.Random(42)
    for trial in range(20):
        big_n = rng.randrange(10, 300)
        n = rng.randrange(3, min(big_n, 40))
        xs = rng.sample(range(10 * big_n), big_n)
        ys = [float(rng.randrange(-50, 50)) for _ in range(big_n)]
        got = lttb(list(zip(map(float, xs), ys)), n)
        want = _lttb_numpy(xs, ys, n)
        assert got == want, (trial, big_n, n)


def test_structure_and_edges():
    pts = [(float(i), float((i * 7) % 5)) for i in range(50)]
    out = lttb(pts, 10)
    assert len(out) == 10
    assert out[0] == [0.0, 0.0] and out[-1] == [49.0, float((49 * 7) % 5)]
    xs = [p[0] for p in out]
    assert xs == sorted(xs)
    # n >= N returns everything, sorted
    assert lttb(pts, 50) == [[x, y] for x, y in pts]
    assert lttb(pts, 500) == [[x, y] for x, y in pts]
    # degenerate sizes
    assert lttb(pts, 2) == [[0.0, 0.0], [49.0, 3.0]]
    assert lttb([(5.0, 1.0)], 1) == [[5.0, 1.0]]
    assert lttb([], 1) == []


def test_extremes_survive_downsampling():
    """A lone spike in an otherwise flat series must be kept — the
    whole point of LTTB over uniform sampling."""
    pts = [(float(i), 1.0) for i in range(100)]
    pts[57] = (57.0, 500.0)
    out = lttb(pts, 8)
    assert [57.0, 500.0] in out


def test_udf_agrees_with_python(spark):
    from clickhouse_learning_spark.functions.dialect import translate

    rows = [
        (g, float(i), float((i * 13 + g * 7) % 23))
        for g in (1, 2)
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "g int, x double, y double"
    ).createOrReplaceTempView("ch_lttb_t")
    got = {
        r.g: r.pts
        for r in spark.sql(
            translate(
                "SELECT g, largestTriangleThreeBuckets(7)(x, y) AS pts "
                "FROM ch_lttb_t GROUP BY g"
            )
        ).collect()
    }
    for g in (1, 2):
        want = lttb(
            [(float(i), float((i * 13 + g * 7) % 23)) for i in range(40)], 7
        )
        assert [list(p) for p in got[g]] == want
    with pytest.raises(ValueError, match="positive"):
        translate("largestTriangleThreeBuckets(0)(x, y)")
