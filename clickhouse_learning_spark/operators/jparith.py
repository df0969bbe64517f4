"""Arithmetic-coded JPEG (ITU-T T.81 Annexes D & F) — entropy layer.

The sequential DCT process with arithmetic coding (SOF9) shares every
stage of the baseline pipeline except the entropy coder: instead of
Huffman codes, DC differences and AC coefficients are coded as binary
decisions through the QM-coder — an adaptive binary arithmetic coder
whose probability estimation walks the 113-state table of T.81
Table D.3 (plus one non-adaptive "fixed" state used for AC signs).

Conventions implemented here, per the T.81 flowcharts:

- interval register ``A`` renormalized into ``[0x8000, 0x10000)``
  (initial value 0x10000 = the full interval);
- the MPS subinterval sits at the BOTTOM of ``[0, A)`` with size
  ``A - Qe``; the LPS occupies the top ``Qe`` — EXCEPT under
  conditional exchange (``A - Qe < Qe``), where the two swap roles
  (D.1.2 / F.2.2 MPS/LPS exchange);
- state transitions: MPS renormalization -> NMPS; LPS -> NLPS with the
  MPS sense flipped when the SWITCH bit is set (Table D.3);
- byte stuffing: a 0x00 byte follows any 0xFF in the entropy-coded
  segment (D.1.6) — the same convention as Huffman scans, so the
  destuffer in :mod:`.jpeg` (``_split_entropy``) is reused verbatim;
- once the terminating marker is reached, the decoder feeds zero bytes
  (F.2.2.3's marker rule), which this module gets for free by
  zero-padding past the destuffed segment's end.

The statistical models are T.81 F.1.4.4.1 (DC: a 5-category context
keyed on the previous diff's magnitude class, S0..S0+3 decision bins,
the X1=20 magnitude-category ladder, one shared mantissa bin per
class) and F.1.4.4.2 (AC: per-k {EOB, zero/nonzero, magnitude} bin
triples, a fixed-probability sign, and low/high-k magnitude ladders at
bins 189/217 split by the Kx conditioning parameter).  Conditioning
defaults L=0, U=1, Kx=5; DAC markers override per table id.

Verification strategy (no external JPEG codec ships in this
container): the coder is exercised by entropy-layer round-trips that
must reproduce the QUANTIZED COEFFICIENTS bit-exactly — the same
coefficient grids are also pushed through the independent Huffman
path, so a modeling error on either side cannot cancel out.  Restart
intervals, DAC overrides, truncation and corruption are covered in
tests/test_jparith.py.

Scale note: decode runs inside the Arrow ``mapInPandas`` image stage
of operators/multimodal.py — per-payload work, no shuffle, no driver
involvement (the same contract as the baseline/progressive decoder).
"""
from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    ZIGZAG,
    _idct2,
    _quant_table,
    _rgb_to_zz,
    _seg,
    _split_entropy,
    _to_rgb,
)

# T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH) for states 0..112; state 113
# is the non-adaptive 0.5-probability bin used for AC signs (F.1.4.4.2:
# "a fixed value of Qe = 0x5A1D with no estimation").
_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
]

_FIXED = 113  # index of the non-adaptive sign state

# statistics-area sizes (T.81 Tables F.4/F.5; 64/256 leave headroom
# over the spec's 49/245 so bin arithmetic never needs bounds checks)
DC_BINS = 64
AC_BINS = 256


class ArithDecoder:
    """QM decoder over one destuffed entropy segment (zero-fed tail).

    ``stats`` arguments are bytearrays where each byte packs a context
    bin as ``MPS << 7 | state_index`` — all-zeros is the spec's initial
    condition (state 0, MPS = 0).
    """

    __slots__ = ("d", "n", "pos", "acc", "nbits", "a", "c", "fed")

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0  # bit reservoir (MSB-first)
        self.nbits = 0
        self.fed = 0  # zero bits fed past the real data
        self.a = 0x10000
        self.c = self._take(16)

    def _take(self, k: int) -> int:
        while self.nbits < k:
            if self.pos < self.n:
                self.acc = (self.acc << 8) | self.d[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8
                self.fed += 8
            self.nbits += 8
        v = (self.acc >> (self.nbits - k)) & ((1 << k) - 1)
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1
        return v

    def exhausted(self) -> bool:
        """True once the decoder is running on fabricated zero bits far
        past the segment (truncation guard for corrupt payloads)."""
        return self.fed > 64

    def decode(self, stats: bytearray, i: int) -> int:
        s = stats[i]
        qe, nmps, nlps, sw = _QE[s & 0x7F]
        mps = s >> 7
        a = self.a - qe
        if self.c < a:
            if a & 0x8000:  # no renormalization: fast path, no update
                self.a = a
                return mps
            if a < qe:  # conditional exchange: bottom region codes LPS
                d = mps ^ 1
                stats[i] = ((mps ^ sw) << 7) | nlps
            else:
                d = mps
                stats[i] = (mps << 7) | nmps
        else:
            self.c -= a
            if a < qe:  # conditional exchange: top region codes MPS
                d = mps
                stats[i] = (mps << 7) | nmps
            else:
                d = mps ^ 1
                stats[i] = ((mps ^ sw) << 7) | nlps
            a = qe
        # batched renormalization: double A up to [0x8000, 0x10000) in
        # one shift, pulling the matching bit count into C
        k = 16 - a.bit_length()
        if k:
            self.c = (self.c << k) | self._take(k)
            a <<= k
        self.a = a
        return d


class ArithEncoder:
    """QM encoder; ``finish()`` returns the stuffed segment bytes."""

    __slots__ = ("bits", "a", "c")

    def __init__(self):
        self.bits: list[int] = []
        self.a = 0x10000
        self.c = 0

    def _carry(self):
        i = len(self.bits) - 1
        while self.bits[i]:
            self.bits[i] = 0
            i -= 1
        self.bits[i] = 1

    def encode(self, stats: bytearray, i: int, d: int):
        s = stats[i]
        qe, nmps, nlps, sw = _QE[s & 0x7F]
        mps = s >> 7
        a = self.a - qe
        if d == mps:
            if a & 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange: code the MPS on top
                self.c += a
                a = qe
            stats[i] = (mps << 7) | nmps
        else:
            if a >= qe:  # no exchange: LPS is the top subinterval
                self.c += a
                a = qe
            stats[i] = ((mps ^ sw) << 7) | nlps
        if self.c >= 0x10000:  # carry out of the 16-bit window
            self._carry()
            self.c -= 0x10000
        # batched renormalization (mirror of the decoder's)
        k = 16 - a.bit_length()
        if k:
            c = self.c << k
            out = c >> 16
            self.bits.extend(
                (out >> j) & 1 for j in range(k - 1, -1, -1)
            )
            self.c = c & 0xFFFF
            a <<= k
        self.a = a

    def finish(self) -> bytes:
        # the interval base itself is a valid code value: emit its 16
        # window bits; the decoder's zero-fed tail keeps the value
        # inside [base, base + A)
        for k in range(15, -1, -1):
            self.bits.append((self.c >> k) & 1)
        bits = self.bits
        while len(bits) % 8:
            bits.append(0)
        raw = bytearray()
        for j in range(0, len(bits), 8):
            b = 0
            for bit in bits[j : j + 8]:
                b = (b << 1) | bit
            raw.append(b)
        while raw and raw[-1] == 0:  # decoder refeeds zeros anyway
            raw.pop()
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:  # D.1.6 byte stuffing
                out.append(0x00)
        return bytes(out)


# ---------------------------------------------------------------------------
# Statistical models (sequential DCT: F.1.4.4.1 / F.1.4.4.2)
# ---------------------------------------------------------------------------


class _DcModel:
    """DC-difference model for one conditioning TABLE.  The statistics
    area is shared by every component selecting the table (F.1.4.4.1),
    but the context category — which of the 5 S0 bases the next diff
    starts from — follows the PREVIOUS DIFF OF THE SAME COMPONENT, so
    callers thread a per-component ``ctx`` value through decode/encode
    (the ``dc_stats[tbl] + dc_context[ci]`` split of Table F.4)."""

    __slots__ = ("stats", "low", "high")

    def __init__(self, L: int = 0, U: int = 1):
        self.stats = bytearray(DC_BINS)
        self.low = (1 << L) >> 1
        self.high = (1 << U) >> 1

    def reset(self):
        self.stats = bytearray(DC_BINS)

    def _classify(self, m: int, sign: int) -> int:
        # F.1.4.4.1.2: zero / small / large diff categories, signed
        if m < self.low:
            return 0
        if m > self.high:
            return 12 + 4 * sign
        return 4 + 4 * sign

    def decode(self, dec: ArithDecoder, ctx: int) -> tuple[int, int]:
        st = ctx
        stats = self.stats
        if dec.decode(stats, st) == 0:
            return 0, 0
        sign = dec.decode(stats, st + 1)
        st += 2 + sign
        m = dec.decode(stats, st)
        if m:
            st = 20  # X1 ladder
            while dec.decode(stats, st):
                m <<= 1
                if m == 0x8000:
                    raise EOFError("corrupt DC magnitude")
                st += 1
        ctx = self._classify(m, sign)
        v = m
        st += 14  # shared mantissa bin for this magnitude class
        while m > 1:
            m >>= 1
            if dec.decode(stats, st):
                v |= m
        v += 1
        return (-v if sign else v), ctx

    def encode(self, enc: ArithEncoder, diff: int, ctx: int) -> int:
        st = ctx
        stats = self.stats
        if diff == 0:
            enc.encode(stats, st, 0)
            return 0
        enc.encode(stats, st, 1)
        if diff > 0:
            sign, v = 0, diff
        else:
            sign, v = 1, -diff
        enc.encode(stats, st + 1, sign)
        st += 2 + sign
        m = 0
        v -= 1
        if v:
            enc.encode(stats, st, 1)
            m = 1
            st = 20
            v2 = v
            while v2 > 1:
                v2 >>= 1
                enc.encode(stats, st, 1)
                m <<= 1
                st += 1
        enc.encode(stats, st, 0)
        ctx = self._classify(m, sign)
        st += 14
        while m > 1:
            m >>= 1
            enc.encode(stats, st, 1 if v & m else 0)
        return ctx


class _AcModel:
    """Per-conditioning-table AC coefficient model."""

    __slots__ = ("stats", "fixed", "kx")

    def __init__(self, kx: int = 5):
        self.stats = bytearray(AC_BINS)
        self.fixed = bytearray([_FIXED])
        self.kx = kx

    def reset(self):
        self.stats = bytearray(AC_BINS)
        self.fixed = bytearray([_FIXED])

    def decode_band(self, dec: ArithDecoder, zz: np.ndarray,
                    ss: int = 1, se: int = 63, al: int = 0):
        """Decode AC coefficients for zig-zag band ``ss..se`` into the
        ZIG-ZAG-indexed ``zz`` (values point-shifted by ``al``).  With
        the defaults this is exactly the sequential model F.1.4.4.2;
        with a band + Al it is the progressive AC-first scan G.1.3.2
        (identical decision structure per the spec)."""
        stats = self.stats
        k = ss
        while k <= se:
            st = 3 * (k - 1)
            if dec.decode(stats, st):
                return  # EOB
            while dec.decode(stats, st + 1) == 0:
                st += 3
                k += 1
                if k > se:
                    raise EOFError("corrupt AC run")
            sign = dec.decode(self.fixed, 0)
            st += 2
            m = dec.decode(stats, st)
            if m:
                if dec.decode(stats, st):
                    m <<= 1
                    st = 189 if k <= self.kx else 217
                    while dec.decode(stats, st):
                        m <<= 1
                        if m == 0x8000:
                            raise EOFError("corrupt AC magnitude")
                        st += 1
            v = m
            st += 14
            while m > 1:
                m >>= 1
                if dec.decode(stats, st):
                    v |= m
            v += 1
            zz[k] = (-v if sign else v) << al
            k += 1

    def encode_band(self, enc: ArithEncoder, zz: np.ndarray,
                    ss: int = 1, se: int = 63, al: int = 0):
        """Mirror of :meth:`decode_band`; ``zz`` is zig-zag indexed and
        holds FULL-precision coefficients (the Al point transform —
        magnitude shift toward zero, per G.1.3.2 — happens here)."""
        stats = self.stats

        def t(k: int) -> int:
            v = int(zz[k])
            return -((-v) >> al) if v < 0 else v >> al

        ke = se
        while ke >= ss and t(ke) == 0:
            ke -= 1
        k = ss
        while k <= ke:
            st = 3 * (k - 1)
            enc.encode(stats, st, 0)  # not EOB yet
            while t(k) == 0:
                enc.encode(stats, st + 1, 0)
                st += 3
                k += 1
            enc.encode(stats, st + 1, 1)
            v = t(k)
            if v > 0:
                sign = 0
            else:
                sign, v = 1, -v
            enc.encode(self.fixed, 0, sign)
            st += 2
            m = 0
            v -= 1
            if v:
                enc.encode(stats, st, 1)
                m = 1
                v2 = v
                if v2 > 1:
                    enc.encode(stats, st, 1)
                    m <<= 1
                    st = 189 if k <= self.kx else 217
                    v2 >>= 1
                    while v2 > 1:
                        v2 >>= 1
                        enc.encode(stats, st, 1)
                        m <<= 1
                        st += 1
            enc.encode(stats, st, 0)
            st += 14
            while m > 1:
                m >>= 1
                enc.encode(stats, st, 1 if v & m else 0)
            k += 1
        if ke < se:
            enc.encode(stats, 3 * (k - 1), 1)  # EOB decision

    def decode_refine(self, dec: ArithDecoder, zz: np.ndarray,
                      ss: int, se: int, al: int):
        """AC successive-approximation refinement (G.1.3.3): correction
        bits through ``st+2`` for history-nonzero coefficients, newly
        nonzero ±1<<Al through ``st+1`` + the fixed sign bin, EOB
        decisions only past the previous stage's end-of-block index."""
        stats = self.stats
        p1 = 1 << al
        kex = se
        while kex >= 1 and zz[kex] == 0:
            kex -= 1
        k = ss
        while k <= se:
            st = 3 * (k - 1)
            if k > kex and dec.decode(stats, st):
                return  # EOB
            while True:
                z = int(zz[k])
                if z:
                    if dec.decode(stats, st + 2):
                        zz[k] = z + (p1 if z > 0 else -p1)
                    break
                if dec.decode(stats, st + 1):
                    zz[k] = -p1 if dec.decode(self.fixed, 0) else p1
                    break
                st += 3
                k += 1
                if k > se:
                    raise EOFError("corrupt AC refine run")
            k += 1

    def encode_refine(self, enc: ArithEncoder, zz: np.ndarray,
                      ss: int, se: int, al: int):
        """Mirror of :meth:`decode_refine` over FULL-precision ``zz``:
        history = magnitude truncated at Al+1, current bit = low bit of
        the magnitude truncated at Al."""
        stats = self.stats

        def t(k: int, sh: int) -> int:
            v = int(zz[k])
            return -((-v) >> sh) if v < 0 else v >> sh

        kex = se
        while kex >= 1 and t(kex, al + 1) == 0:
            kex -= 1
        ke = se
        while ke >= ss and t(ke, al) == 0:
            ke -= 1
        k = ss
        while k <= se:
            st = 3 * (k - 1)
            if k > kex:
                if k > ke:
                    enc.encode(stats, st, 1)  # EOB
                    return
                enc.encode(stats, st, 0)
            while True:
                if t(k, al + 1):
                    enc.encode(stats, st + 2, abs(t(k, al)) & 1)
                    break
                c = t(k, al)
                if c:
                    enc.encode(stats, st + 1, 1)
                    enc.encode(self.fixed, 0, 1 if c < 0 else 0)
                    break
                enc.encode(stats, st + 1, 0)
                st += 3
                k += 1
            k += 1


# ---------------------------------------------------------------------------
# Scan-level decode (wired into jpeg.decode_baseline for SOF9)
# ---------------------------------------------------------------------------


def parse_dac(body: bytes, dac: dict):
    """DAC segment (B.2.4.3): pairs of (Tc<<4 | Tb, conditioning)."""
    for j in range(0, len(body) - 1, 2):
        tc, tb = body[j] >> 4, body[j] & 15
        v = body[j + 1]
        if tc == 0:
            dac[(0, tb)] = (v & 0x0F, v >> 4)  # (L, U)
        else:
            dac[(1, tb)] = v  # Kx


def scan_sequential(payload, start, comps, sel, qt, h, w, restart, dac,
                    prec=8):
    """Sequential arithmetic scan: the MCU walk of jpeg._scan with the
    QM entropy layer.  Restart intervals reset coder AND statistics
    (F.1.4.4: statistics conditioning is reinitialized at RSTn)."""
    if not comps or any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                        for c in comps):
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    ]
    segs = _split_entropy(payload, start)

    def fresh():
        dcm = {}
        acm = {}
        for c in comps:
            td, ta = sel[c["id"]]
            if td not in dcm:
                L, U = dac.get((0, td), (0, 1))
                dcm[td] = _DcModel(L, U)
            if ta not in acm:
                acm[ta] = _AcModel(dac.get((1, ta), 5))
        return dcm, acm

    seg_i = 0
    dec = ArithDecoder(segs[0])
    dcm, acm = fresh()
    preds = [0] * len(comps)
    ctxs = [0] * len(comps)  # per-component DC context category
    mcu_i = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu_i and mcu_i % restart == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise EOFError
                    dec = ArithDecoder(segs[seg_i])
                    dcm, acm = fresh()
                    preds = [0] * len(comps)
                    ctxs = [0] * len(comps)
                mcu_i += 1
                if dec.exhausted():
                    raise EOFError
                for ci, c in enumerate(comps):
                    td, ta = sel[c["id"]]
                    q = qt[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zzc = np.zeros(64)
                            diff, ctxs[ci] = dcm[td].decode(dec, ctxs[ci])
                            preds[ci] += diff
                            zzc[0] = preds[ci]
                            acm[ta].decode_band(dec, zzc)
                            nat = np.zeros(64)
                            nat[ZIGZAG] = zzc
                            block = (_idct2(nat.reshape(8, 8) * q)
                                     + (1 << (prec - 1)))
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    except EOFError:
        pass  # truncated tail: keep what decoded
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        out.append(p[:h, :w] / (1 << (prec - 8)))
    return _to_rgb(out)


# ---------------------------------------------------------------------------
# Encoder (tests / fixtures): 4:4:4 sequential arithmetic (SOF9)
# ---------------------------------------------------------------------------


def encode_arith_sequential(rgb: np.ndarray, quality: int = 90,
                            restart: int = 0,
                            dc_cond: tuple[int, int] = (0, 1),
                            ac_kx: int = 5) -> bytes:
    """Encode RGB as a sequential arithmetic-coded JPEG (SOF9), 4:4:4,
    one shared conditioning table.  Quantization and the DCT front end
    are the SAME helpers the Huffman encoder uses, so both encodings of
    an image carry identical coefficients — the round-trip tests rely
    on that to pin the entropy layer in isolation."""
    h, w = rgb.shape[:2]
    q = _quant_table(quality)
    grids = _rgb_to_zz(rgb, q)
    rows, cols = grids[0].shape[:2]
    L, U = dc_cond

    qz = np.zeros(64, dtype=np.uint8)
    qz[np.arange(64)] = q.reshape(-1)[ZIGZAG]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + qz.tobytes())
    out += _seg(0xC9, bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
                + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0])
                + bytes([3, 0x11, 0]))
    out += _seg(0xCC, bytes([0x00, (U << 4) | L, 0x10, ac_kx]))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    enc = ArithEncoder()
    dcm = _DcModel(L, U)  # one conditioning table shared by all comps
    acm = _AcModel(ac_kx)
    preds = [0, 0, 0]
    ctxs = [0, 0, 0]
    mcu_i = 0
    rst = 0
    for my in range(rows):
        for mx in range(cols):
            if restart and mcu_i and mcu_i % restart == 0:
                out += enc.finish()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                enc = ArithEncoder()
                dcm.reset()
                acm.reset()
                preds = [0, 0, 0]
                ctxs = [0, 0, 0]
            mcu_i += 1
            for ci in range(3):
                zz = grids[ci][my, mx]
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                ctxs[ci] = dcm.encode(enc, diff, ctxs[ci])
                acm.encode_band(enc, zz)
    out += enc.finish()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive arithmetic (SOF10): scan-level decode + fixture encoder
# ---------------------------------------------------------------------------


def progressive_scan_arith(payload, start, comps, scan_comps, sel,
                           h, w, restart, ss, se, ah, al, coefs, dac):
    """Decode ONE progressive arithmetic scan into the zig-zag-indexed
    ``coefs`` grids; returns the payload index of the terminating
    marker.  The four scan kinds of T.81 G.1.3: DC first reuses the
    sequential DC model on point-transformed diffs; DC refinement is
    one fixed-probability decision per block; AC first is the
    sequential AC band model; AC refinement adds correction/newly-
    nonzero decisions with EOB checks past the previous stage's end.
    Statistics initialize fresh per scan and per restart segment."""
    from .jpeg import _comp_blocks, _split_entropy_upto

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    idx = {c["id"]: ci for ci, c in enumerate(comps)}
    segs, end = _split_entropy_upto(payload, start)

    def fresh():
        dcm = {}
        acm = {}
        for cid in scan_comps:
            td, ta = sel[cid]
            if td not in dcm:
                L, U = dac.get((0, td), (0, 1))
                dcm[td] = _DcModel(L, U)
            if ta not in acm:
                acm[ta] = _AcModel(dac.get((1, ta), 5))
        return dcm, acm

    seg_i = 0
    dec = ArithDecoder(segs[0])
    dcm, acm = fresh()
    preds = [0] * len(comps)
    ctxs = [0] * len(comps)
    fixed = bytearray([_FIXED])
    unit_i = 0

    def maybe_restart():
        nonlocal seg_i, dec, dcm, acm, preds, ctxs, fixed
        if restart and unit_i and unit_i % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise EOFError
            dec = ArithDecoder(segs[seg_i])
            dcm, acm = fresh()
            preds = [0] * len(comps)
            ctxs = [0] * len(comps)
            fixed = bytearray([_FIXED])

    def dc_unit(ci, by, bx):
        c = comps[ci]
        td = sel[c["id"]][0]
        if ah == 0:  # first scan: diff of the point-transformed DC
            diff, ctxs[ci] = dcm[td].decode(dec, ctxs[ci])
            preds[ci] += diff
            coefs[ci][by, bx, 0] = preds[ci] << al
        else:  # refinement: one fixed-probability decision per block
            if dec.decode(fixed, 0):
                coefs[ci][by, bx, 0] = int(coefs[ci][by, bx, 0]) | (1 << al)

    try:
        if ss == 0:  # DC scan (may be interleaved)
            order = [idx[cid] for cid in scan_comps]
            if len(order) > 1:
                for my in range(mcuy):
                    for mx in range(mcux):
                        maybe_restart()
                        unit_i += 1
                        if dec.exhausted():
                            raise EOFError
                        for ci in order:
                            c = comps[ci]
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    dc_unit(ci, my * c["v"] + by,
                                            mx * c["h"] + bx)
            else:
                ci = order[0]
                bh_c, bw_c = _comp_blocks(comps[ci], h, w, hmax, vmax)
                for by in range(bh_c):
                    for bx in range(bw_c):
                        maybe_restart()
                        unit_i += 1
                        if dec.exhausted():
                            raise EOFError
                        dc_unit(ci, by, bx)
        else:  # AC scan: always single-component
            ci = idx[scan_comps[0]]
            ta = sel[scan_comps[0]][1]
            bh_c, bw_c = _comp_blocks(comps[ci], h, w, hmax, vmax)
            grid = coefs[ci]
            for by in range(bh_c):
                for bx in range(bw_c):
                    maybe_restart()
                    unit_i += 1
                    if dec.exhausted():
                        raise EOFError
                    if ah == 0:
                        acm[ta].decode_band(dec, grid[by, bx], ss, se, al)
                    else:
                        acm[ta].decode_refine(dec, grid[by, bx], ss, se, al)
    except EOFError:
        pass  # truncated tail: keep what decoded
    return end


def encode_arith_progressive(rgb: np.ndarray, quality: int = 90) -> bytes:
    """4:4:4 PROGRESSIVE arithmetic encoder (SOF10) exercising every
    scan kind progressive_scan_arith implements: interleaved DC first
    (Al=1) + DC refinement, AC spectral bands (1-5 / 6-63) first at
    Al=1 and their Ah=1 -> Al=0 refinements.  Same quantized
    coefficients as encode_baseline / encode_arith_sequential, so all
    encodings reconstruct to the IDENTICAL image."""
    h, w = rgb.shape[:2]
    q = _quant_table(quality)
    grids = _rgb_to_zz(rgb, q)
    rows, cols = grids[0].shape[:2]

    qz = np.zeros(64, dtype=np.uint8)
    qz[np.arange(64)] = q.reshape(-1)[ZIGZAG]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + qz.tobytes())
    out += _seg(0xCA, bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
                + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0])
                + bytes([3, 0x11, 0]))
    out += _seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))  # L=0,U=1 / Kx=5

    def sos_hdr(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, interleaved, Al=1 (arithmetic point transform)
    enc = ArithEncoder()
    dcm = _DcModel()
    preds = [0, 0, 0]
    ctxs = [0, 0, 0]
    for my in range(rows):
        for mx in range(cols):
            for ci in range(3):
                v = int(grids[ci][my, mx, 0]) >> 1
                ctxs[ci] = dcm.encode(enc, v - preds[ci], ctxs[ci])
                preds[ci] = v
    out += sos_hdr([1, 2, 3], 0, 0, 0, 1) + enc.finish()

    # scans 2-7: AC first per component, two spectral bands, Al=1
    for ci, cid in enumerate((1, 2, 3)):
        for ss, se in ((1, 5), (6, 63)):
            enc = ArithEncoder()
            acm = _AcModel()
            for my in range(rows):
                for mx in range(cols):
                    acm.encode_band(enc, grids[ci][my, mx], ss, se, 1)
            out += sos_hdr([cid], ss, se, 0, 1) + enc.finish()

    # scan 8: DC refinement (fixed-probability bit per block)
    enc = ArithEncoder()
    fixed = bytearray([_FIXED])
    for my in range(rows):
        for mx in range(cols):
            for ci in range(3):
                enc.encode(fixed, 0, int(grids[ci][my, mx, 0]) & 1)
    out += sos_hdr([1, 2, 3], 0, 0, 1, 0) + enc.finish()

    # scans 9-14: AC refinement per component and band (Ah=1 -> Al=0)
    for ci, cid in enumerate((1, 2, 3)):
        for ss, se in ((1, 5), (6, 63)):
            enc = ArithEncoder()
            acm = _AcModel()
            for my in range(rows):
                for mx in range(cols):
                    acm.encode_refine(enc, grids[ci][my, mx], ss, se, 0)
            out += sos_hdr([cid], ss, se, 1, 0) + enc.finish()

    out += b"\xff\xd9"
    return bytes(out)
