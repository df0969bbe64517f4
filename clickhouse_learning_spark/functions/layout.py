"""Physical-layout helpers: Z-order (Morton) clustering keys.

A single-column sort key gives parquet row-group min/max skipping on
that column only; filters on a second column scan everything. A
Z-order key interleaves the bits of two columns so that sorting by it
clusters rows that are close in BOTH dimensions — each file's (a, b)
bounding box shrinks, and min/max stats prune files for filters on
EITHER column (the OPTIMIZE ZORDER idea, here as a plain sort
expression usable with Table.sort_key or sortWithinPartitions).

Everything is shift/mask arithmetic on longs — whole-stage codegen,
no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scale_to_bits(c: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Affine-map a numeric column from [lo, hi] onto the integer range
    [0, 2^bits − 1] (rank preserved; out-of-range values clamp)."""
    span = float(hi) - float(lo)
    scaled = ((c.cast("double") - float(lo)) / span) * ((1 << bits) - 1)
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def _spread16(c: Column) -> Column:
    """Spread a 16-bit value's bits to the even positions of 32 bits
    (classic Morton bit-twiddling, all codegen arithmetic)."""
    x = c.cast("long")
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """32-bit Morton interleave of two 16-bit-ranged columns (use
    :func:`scale_to_bits` first for arbitrary numeric ranges). Sort by
    the result to cluster in both dimensions."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))
