"""Pre-epoch datetime sweep across every CH codec (VERDICT r6 item 4).

r6's ADVICE found the RowBinary DateTime64 encoder mishandling
pre-epoch sub-second values (fixed by flooring total integer
microseconds); this sweep keeps the whole CLASS closed: seeded random
timestamps from 1900 to 1975 — negative epoch seconds, sub-second
parts, every DateTime64 scale 0..9 — roundtrip through RowBinary,
Native and TSV, and must come back equal to the value FLOORED to the
scale's resolution (floor, not truncate-toward-zero: CH's decimal
digit drop is a floor for the (negative boundary + positive fraction)
form every rendered pre-epoch timestamp has). Pre-epoch Date32 rides
along.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_learning_spark.sources.native import _NativeCol
from clickhouse_learning_spark.sources.rowbinary import _TypeCodec
from clickhouse_learning_spark.sources.tsv import _TsvType

_EPOCH = dt.datetime(1970, 1, 1)


def _expected(v: dt.datetime, scale: int) -> dt.datetime:
    """CH DateTime64(scale) representation of ``v``: total integer
    microseconds floored to the scale's resolution (exact for
    scale >= 6 — Spark/python datetimes stop at micros)."""
    if scale >= 6:
        return v
    p = 10 ** (6 - scale)
    us = (v - _EPOCH) // dt.timedelta(microseconds=1)
    return _EPOCH + dt.timedelta(microseconds=us - us % p)


_ts = st.builds(
    lambda days, sec, us: dt.datetime(1900, 1, 1)
    + dt.timedelta(days=days, seconds=sec, microseconds=us),
    days=st.integers(0, 27_000),  # 1900..~1973
    sec=st.integers(0, 86_399),
    us=st.integers(0, 999_999),
)


@settings(max_examples=60, deadline=None)
@given(v=_ts, scale=st.integers(0, 9))
def test_rowbinary_datetime64_preepoch(v, scale):
    c = _TypeCodec(f"DateTime64({scale})")
    got, pos = c.decode(c.encode(v), 0)
    assert got == _expected(v, scale), (v, scale)


@settings(max_examples=40, deadline=None)
@given(v=_ts, scale=st.integers(0, 9))
def test_native_datetime64_preepoch(v, scale):
    col = _NativeCol(f"Nullable(DateTime64({scale}))")
    vals = [v, None, _EPOCH - dt.timedelta(microseconds=1), v]
    got, pos = col.decode_column(col.encode_column(vals), 0, len(vals))
    assert got == [_expected(x, scale) if x is not None else None
                   for x in vals], (v, scale)


@settings(max_examples=40, deadline=None)
@given(v=_ts, scale=st.integers(0, 9))
def test_tsv_datetime64_preepoch(v, scale):
    c = _TsvType(f"DateTime64({scale})")
    got = c.parse(c.render(v))
    assert got == _expected(v, scale), (v, scale, c.render(v))


@settings(max_examples=40, deadline=None)
@given(days=st.integers(-25_567, 0))  # 1900-01-01 .. epoch
def test_date32_preepoch_all_codecs(days):
    d = dt.date(1970, 1, 1) + dt.timedelta(days=days)
    rb = _TypeCodec("Date32")
    assert rb.decode(rb.encode(d), 0)[0] == d
    nc = _NativeCol("Date32")
    assert nc.decode_column(nc.encode_column([d]), 0, 1)[0] == [d]
    tc = _TsvType("Date")
    assert tc.parse(tc.render(d)) == d


def test_preepoch_boundary_vectors():
    """The r6 ADVICE vector and its neighbors, pinned exactly: −0.5 s
    encodes as −500 ms ticks at scale 3; one microsecond before the
    epoch floors to the previous second at scale 0."""
    half = _EPOCH - dt.timedelta(milliseconds=500)
    c3 = _TypeCodec("DateTime64(3)")
    assert c3.decode(c3.encode(half), 0)[0] == half
    just_before = _EPOCH - dt.timedelta(microseconds=1)
    c0 = _TypeCodec("DateTime64(0)")
    assert c0.decode(c0.encode(just_before), 0)[0] == \
        _EPOCH - dt.timedelta(seconds=1)
    t0 = _TsvType("DateTime64(0)")
    assert t0.parse(t0.render(just_before)) == \
        _EPOCH - dt.timedelta(seconds=1)
