"""largestTriangleThreeBuckets(n)(x, y) — ClickHouse's time-series
downsampling aggregate (Steinarsson 2013, "Downsampling Time Series for
Visual Representation"; ClickHouse implements the same published
algorithm and sorts the input by x, which is what makes the aggregate
deterministic and therefore translatable to a distributed engine).

Algorithm (the canonical reference formulation): keep the first and
last points; split the interior into n−2 buckets of fractional width
``every = (N−2)/(n−2)``; walking left to right, from each bucket keep
the point forming the largest triangle with the PREVIOUSLY KEPT point
and the AVERAGE of the next bucket. The previous-selection dependence
makes it a left fold over buckets — a grouped-aggregate Pandas UDF here
(one Arrow crossing per group, bounded by the series length; the
per-bucket argmax vectorizes with numpy for large buckets — the area
expression is per-element IEEE-identical to the scalar loop and
np.argmax keeps the FIRST maximum, so ties break identically; bucket
means stay left-to-right sums to match the DuckDB oracle's list_sum).

Ties in the x sort break by y (ClickHouse leaves same-x order
unspecified; the tiebreak makes ours deterministic). NULL pairs are
dropped. n ≥ N returns the whole sorted series; n = 1 returns the
first point; n ≤ 0 raises at translate time.
"""

from __future__ import annotations

import math

try:
    import numpy as _np
except ImportError:  # pragma: no cover — numpy is baked in
    _np = None


def lttb(points: list[tuple[float, float]], n: int) -> list[list[float]]:
    """Downsample sorted-by-x ``points`` to ``n`` representatives."""
    pts = sorted(points)
    big_n = len(pts)
    if n >= big_n:
        return [[x, y] for x, y in pts]
    if n == 1:
        return [[pts[0][0], pts[0][1]]] if pts else []
    if n == 2:
        return [[pts[0][0], pts[0][1]], [pts[-1][0], pts[-1][1]]]
    every = (big_n - 2) / (n - 2)
    out = [[pts[0][0], pts[0][1]]]
    a = 0
    for i in range(n - 2):
        # average of the NEXT bucket (the last bucket's "next" is the
        # final point's bucket — clamp to N)
        avg_start = math.floor((i + 1) * every) + 1
        avg_end = min(math.floor((i + 2) * every) + 1, big_n)
        if avg_start < avg_end:
            avg_x = sum(p[0] for p in pts[avg_start:avg_end]) / (
                avg_end - avg_start
            )
            avg_y = sum(p[1] for p in pts[avg_start:avg_end]) / (
                avg_end - avg_start
            )
        else:  # degenerate: fall back to the last point
            avg_x, avg_y = pts[-1]
        lo = math.floor(i * every) + 1
        hi = math.floor((i + 1) * every) + 1
        ax, ay = pts[a]
        if hi - lo > 16 and _np is not None:
            # vectorized argmax over twice-the-triangle-areas: each
            # area is the same per-element IEEE expression as the
            # scalar loop (bit-identical), and np.argmax keeps the
            # FIRST maximum — the same tie rule
            cand = _np.asarray(pts[lo:hi], dtype=float)
            areas = _np.abs(
                (ax - avg_x) * (cand[:, 1] - ay)
                - (ax - cand[:, 0]) * (avg_y - ay)
            )
            best = lo + int(_np.argmax(areas))
        else:
            best, best_area = lo, -1.0
            for j in range(lo, hi):
                area = abs(
                    (ax - avg_x) * (pts[j][1] - ay)
                    - (ax - pts[j][0]) * (avg_y - ay)
                )
                if area > best_area:
                    best, best_area = j, area
        out.append([pts[best][0], pts[best][1]])
        a = best
    out.append([pts[-1][0], pts[-1][1]])
    return out


def make_lttb_udf(n: int):
    """Grouped-aggregate Pandas UDF: (x, y) series for one group →
    ARRAY<ARRAY<DOUBLE>> of [x, y] pairs (CH returns Array(Tuple);
    grouped-agg UDFs cannot return structs, so pairs are 2-arrays)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _agg(xs, ys):
        pts = [
            (float(x), float(y))
            for x, y in zip(xs, ys)
            if x is not None and x == x and y is not None and y == y
        ]
        return lttb(pts, n)

    return pandas_udf(_agg, "array<array<double>>", PandasUDFType.GROUPED_AGG)
