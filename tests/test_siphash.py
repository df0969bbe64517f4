"""SipHash-2-4 exactness laws (functions/siphash.py) — the r9 lift of
the sipHash64 dialect gate.

Decisive instruments: the SipHash paper's Appendix-A worked example
(key 000102…0f, 15-byte message 000102…0e → 0xa129ca6149be45e5 — one
full compression block + 7-byte tail + length byte) and the reference
implementation's vectors_sip64 first entry (empty message, same key →
0x726fdb47dd0e0e31 — init + finalize alone). Between them every code
path runs against an independent known answer; the key enters only
the v0..v3 init, so the machinery verified at the paper key is the
machinery that runs at ClickHouse's (0, 0).
"""

from __future__ import annotations

import pytest

from clickhouse_learning_spark.functions.siphash import (
    ch_siphash64,
    siphash24,
)

_K0 = int.from_bytes(bytes(range(8)), "little")
_K1 = int.from_bytes(bytes(range(8, 16)), "little")


def test_paper_appendix_a_vector():
    assert siphash24(bytes(range(15)), _K0, _K1) == 0xA129CA6149BE45E5


def test_reference_empty_vector():
    assert siphash24(b"", _K0, _K1) == 0x726FDB47DD0E0E31


def test_length_byte_and_block_boundaries():
    """Every length 0..64 yields a distinct value (the length byte and
    block walk are live), and 8-byte-aligned inputs differ from their
    zero-padded neighbours (tail packing is position-faithful)."""
    seen = {siphash24(bytes(range(n % 256))[:n], _K0, _K1)
            for n in range(65)}
    assert len(seen) == 65
    assert siphash24(b"\x00" * 8, _K0, _K1) != siphash24(
        b"\x00" * 7, _K0, _K1
    )


def test_dialect_binding_semantics(spark):
    """Pasted sipHash64 reaches SipHash-2-4 at CH's key (0,0): strings
    hash UTF-8 bytes, integer columns width-matched LE bytes, the
    result is the signed-BIGINT view of the UInt64; bare integer
    literals gate (the xxHash literal-width rule); sipHash128 stays
    gated with the non-standard-variant pointer."""
    import struct

    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT sipHash64('foo') AS hs, "
        "sipHash64(CAST(42 AS BIGINT)) AS hi"
    )).collect()[0]

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    assert r["hs"] == signed(ch_siphash64(b"foo"))
    assert r["hi"] == signed(ch_siphash64(struct.pack("<q", 42)))
    with pytest.raises(ValueError, match="NARROWEST"):
        translate("SELECT sipHash64(7)")
    with pytest.raises(ValueError, match="hash family|non-standard"):
        translate("SELECT sipHash128('x')")
