"""JPEG (ITU-T T.81) decode — pure numpy + stdlib, no imaging library.

Scope: baseline sequential DCT (SOF0), the PROGRESSIVE DCT process
(SOF2: spectral-selection and successive-approximation scans, DC and
AC, with EOB-run accumulation per G.2, r4), the ARITHMETIC processes
(SOF9/SOF10 via the T.81 QM-coder in operators/jparith.py, r5),
12-BIT extended sequential data (SOF1/SOF9, Pq=1 16-bit quantization
tables, r5) and the LOSSLESS predictive process (SOF3, Annex H: all
seven predictors, modulo-65536 reconstruction, 2-16 bit, point
transform, r5 late) and the HIERARCHICAL process (Annex J: DHP frame
header, EXP reference expansion, differential sequential frames with
zero DC prediction, r5 late) — grayscale or YCbCr with sampling
factors 1–2 (4:4:4 / 4:2:2 / 4:2:0), restart markers, byte stuffing.
Every process of the T.81 standard decodes natively.

Everything here is from the public JPEG specification: canonical
Huffman tables from the DHT count/symbol lists, zig-zag coefficient
order, DC prediction with EXTEND sign decoding, per-table
dequantization, the 8×8 type-III DCT as an orthonormal matrix product,
and BT.601 YCbCr→RGB. The encoder half (``encode_baseline`` /
``encode_progressive``) exists so tests can round-trip without Pillow;
it uses the spec's Annex K example Huffman/quantization tables. Both
encoders emit the same quantized coefficients, so their decodes
reconstruct identical images — the progressive test anchor.

Cost model: decode is per-image CPU with no Spark semantics — it runs
inside the same ``mapInPandas`` Arrow streaming as every other media
stage (operators/multimodal.py), so at 100 TB the work distributes with
the payload partitioning; there is nothing relational to push down.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag order: index = zigzag position, value = row-major position
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix: A[k, n] = c_k/2 * cos((2n+1)kπ/16)
_N = np.arange(8)
_DCT = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16) / 2.0
_DCT[0] *= 1 / np.sqrt(2)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _DCT.T @ block @ _DCT


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


class _Huff:
    """Canonical Huffman table from DHT (counts per length, symbols),
    with a 16-bit-prefix lookup table: lut[peek16] packs
    (length << 8) | symbol, so decode is one table index instead of a
    bit-by-bit walk (the decoder's hot path)."""

    def __init__(self, counts, symbols):
        self.map: dict[tuple[int, int], int] = {}
        lut = np.zeros(1 << 16, dtype=np.uint16)
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                sym = symbols[k]
                self.map[(ln, code)] = sym
                lo = code << (16 - ln)
                lut[lo : lo + (1 << (16 - ln))] = (ln << 8) | sym
                code += 1
                k += 1
            code <<= 1
        self.lut = lut
        # encode direction: symbol -> (code, length)
        self.enc = {v: (c, ln) for (ln, c), v in self.map.items()}


def _split_entropy_upto(payload: bytes, start: int):
    """Destuff the entropy-coded stream starting at ``start``: returns
    (segments, end) — the byte segments BETWEEN restart markers
    (0xFF00 → 0xFF inside a segment) and the index of the terminating
    real marker's 0xFF (or len(payload))."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = start, len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker: scan over
            break
    segs.append(bytes(cur))
    return segs, i


def _split_entropy(payload: bytes, start: int):
    return _split_entropy_upto(payload, start)[0]


class _BitReader:
    """MSB-first sliding-window reader over one destuffed segment.
    The tail zero-pads; once more than 16 padded bits have been
    consumed the stream is genuinely exhausted (a truncated tail keeps
    whatever decoded, matching the marker-walk behavior)."""

    __slots__ = ("d", "i", "n", "acc", "nbits", "padded")

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.n = len(data)
        self.acc = 0
        self.nbits = 0
        self.padded = 0

    def _fill(self, want: int):
        acc, nbits, i, d, n = self.acc, self.nbits, self.i, self.d, self.n
        pad = self.padded
        while nbits < want:
            if i < n:
                acc = (acc << 8) | d[i]
                i += 1
            else:
                acc <<= 8
                pad += 8
            nbits += 8
        self.acc, self.nbits, self.i, self.padded = acc, nbits, i, pad

    def huff(self, table: _Huff) -> int:
        if self.padded > 16:
            raise EOFError
        if self.nbits < 16:
            self._fill(16)
        v = int(table.lut[(self.acc >> (self.nbits - 16)) & 0xFFFF])
        ln = v >> 8
        if ln == 0:
            raise EOFError
        self.nbits -= ln
        self.acc &= (1 << self.nbits) - 1
        return v & 0xFF

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        if self.nbits < s:
            self._fill(s)
        v = (self.acc >> (self.nbits - s)) & ((1 << s) - 1)
        self.nbits -= s
        self.acc &= (1 << self.nbits) - 1
        if v < (1 << (s - 1)):  # negative branch of EXTEND
            v -= (1 << s) - 1
        return v

    def bits(self, n: int) -> int:
        """Raw MSB-first bits (progressive refinement / EOB-run path)."""
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)


def decode_baseline(payload: bytes):
    """HxWx3 uint8 RGB (grayscale replicated), or None if not a JPEG
    this path handles. Covers the baseline sequential process (SOF0,
    single scan), the PROGRESSIVE process (SOF2, r4): spectral-selection
    and successive-approximation scans accumulate into per-component
    coefficient arrays, reconstructed once at EOI — the ARITHMETIC
    processes (SOF9 sequential + SOF10 progressive, r5): the T.81
    Annex D QM-coder entropy layer in operators/jparith.py — and
    12-BIT data (r5): SOF1 extended sequential, Pq=1 16-bit
    quantization tables, 2048 level shift, output rescaled to the
    8-bit RGB contract — the LOSSLESS process (SOF3, r5 late):
    predictive Huffman with exact reconstruction — and the
    HIERARCHICAL process (DHP/EXP/differential frames, Annex J, r5
    late): every T.81 process now decodes natively."""
    try:
        if payload is None or payload[:2] != b"\xff\xd8":
            return None
        qt: dict[int, np.ndarray] = {}
        hufftabs: dict[tuple[int, int], _Huff] = {}
        comps = None
        h = w = 0
        restart = 0
        prec = 8
        progressive = False
        arith = False
        lossless = False
        dac: dict = {}  # (class, table) -> conditioning (jparith.parse_dac)
        coefs = None  # per-comp (rows, cols, 64) zig-zag coefficient grids
        i = 2
        n = len(payload)
        while i + 2 <= n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI
                break
            if marker == 0xDE:  # DHP: hierarchical process (Annex J)
                return _decode_hierarchical(payload)
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > n:
                break
            (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
            body = payload[i + 4 : i + 2 + seglen]
            if marker == 0xDB:  # DQT (Pq=1 16-bit tables: 12-bit data)
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 15
                    tbl = np.zeros(64)
                    if pq == 0:
                        tbl[ZIGZAG] = np.frombuffer(
                            body, dtype=np.uint8, count=64, offset=j + 1
                        )
                        j += 65
                    else:
                        tbl[ZIGZAG] = np.frombuffer(
                            body, dtype=">u2", count=64, offset=j + 1
                        )
                        j += 129
                    qt[tq] = tbl.reshape(8, 8)
            elif marker == 0xC4:  # DHT
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 15
                    counts = list(body[j + 1 : j + 17])
                    nsym = sum(counts)
                    syms = list(body[j + 17 : j + 17 + nsym])
                    hufftabs[(tc, th)] = _Huff(counts, syms)
                    j += 17 + nsym
            elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
                # SOF0 baseline / SOF1 extended sequential / SOF2
                # progressive / SOF3 lossless / SOF9 sequential
                # arithmetic / SOF10 progressive arithmetic (the
                # arithmetic entropy layer lives in
                # operators/jparith.py). Precision 12 is legal for
                # every process except baseline SOF0 (B.2.2); the
                # lossless process allows 2..16 (B.2.2 note).
                prec = body[0]
                lossless = marker == 0xC3
                if lossless:
                    if not (2 <= prec <= 16):
                        return None
                elif prec not in (8, 12) or (prec == 12 and marker == 0xC0):
                    return None
                progressive = marker in (0xC2, 0xCA)
                arith = marker in (0xC9, 0xCA)
                h, w = struct.unpack(">HH", body[1:5])
                nc = body[5]
                comps = []
                for c in range(nc):
                    cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                    comps.append(
                        {"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq}
                    )
            elif marker in (0xC5, 0xC6, 0xC7,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline/non-progressive process
            elif marker == 0xCC:  # DAC: arithmetic conditioning
                from .jparith import parse_dac

                parse_dac(body, dac)
            elif marker == 0xDD:  # DRI
                (restart,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS
                ns = body[0]
                scan_comps = []
                sel = {}
                for c in range(ns):
                    cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                    sel[cid] = (tabs >> 4, tabs & 15)
                    scan_comps.append(cid)
                if lossless:
                    ss_pred = body[1 + 2 * ns]
                    ahal_l = body[3 + 2 * ns]
                    return _scan_lossless(
                        payload, i + 2 + seglen, comps, sel, hufftabs,
                        h, w, restart, prec, ss_pred, ahal_l & 15,
                    )
                if not progressive:
                    if arith:
                        from .jparith import scan_sequential

                        return scan_sequential(
                            payload, i + 2 + seglen, comps, sel, qt,
                            h, w, restart, dac, prec,
                        )
                    return _scan(
                        payload, i + 2 + seglen, comps, sel, qt, hufftabs,
                        h, w, restart, prec,
                    )
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                if coefs is None:
                    coefs = _alloc_coefs(comps, h, w)
                    if coefs is None:
                        return None
                if arith:
                    from .jparith import progressive_scan_arith

                    i = progressive_scan_arith(
                        payload, i + 2 + seglen, comps, scan_comps, sel,
                        h, w, restart, ss, se, ahal >> 4, ahal & 15,
                        coefs, dac,
                    )
                else:
                    i = _progressive_scan(
                        payload, i + 2 + seglen, comps, scan_comps, sel,
                        hufftabs, h, w, restart, ss, se, ahal >> 4,
                        ahal & 15, coefs,
                    )
                continue
            i += 2 + seglen
        if progressive and coefs is not None:
            return _reconstruct(comps, coefs, qt, h, w, prec)
        return None
    except Exception:
        return None


def _alloc_coefs(comps, h, w):
    if not comps or any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                        for c in comps):
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    ]


def _progressive_scan(
    payload, start, comps, scan_comps, sel, hufftabs, h, w, restart,
    ss, se, ah, al, coefs,
):
    """Decode ONE progressive scan into ``coefs`` (zig-zag indexed);
    returns the payload index of the terminating marker. Implements the
    four T.81 G.2 scan kinds: DC first / DC refinement (interleaved or
    single-component), AC first / AC refinement (single-component, with
    EOB-run accumulation)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    idx = {c["id"]: ci for ci, c in enumerate(comps)}
    segs, end = _split_entropy_upto(payload, start)
    seg_i = 0
    br = _BitReader(segs[0])
    preds = [0] * len(comps)
    eobrun = 0
    unit_i = 0  # MCU counter (interleaved) / block counter (single-comp)

    def maybe_restart():
        nonlocal seg_i, br, preds, eobrun
        if restart and unit_i and unit_i % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise EOFError
            br = _BitReader(segs[seg_i])
            preds = [0] * len(comps)
            eobrun = 0

    try:
        if ss == 0:  # DC scan (may be interleaved)
            order = [idx[cid] for cid in scan_comps]
            if len(order) > 1:
                units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]
                for my, mx in units:
                    maybe_restart()
                    unit_i += 1
                    for ci in order:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                _dc_unit(
                                    br, hufftabs, sel, comps, ci, preds,
                                    coefs[ci],
                                    my * c["v"] + by, mx * c["h"] + bx,
                                    ah, al,
                                )
            else:
                ci = order[0]
                bh_c, bw_c = _comp_blocks(comps[ci], h, w, hmax, vmax)
                for by in range(bh_c):
                    for bx in range(bw_c):
                        maybe_restart()
                        unit_i += 1
                        _dc_unit(
                            br, hufftabs, sel, comps, ci, preds,
                            coefs[ci], by, bx, ah, al,
                        )
        else:  # AC scan: always single-component
            ci = idx[scan_comps[0]]
            ac_t = hufftabs.get((1, sel[scan_comps[0]][1]))
            bh_c, bw_c = _comp_blocks(comps[ci], h, w, hmax, vmax)
            grid = coefs[ci]
            for by in range(bh_c):
                for bx in range(bw_c):
                    maybe_restart()
                    unit_i += 1
                    if ah == 0:
                        eobrun = _ac_first(
                            br, ac_t, grid[by, bx], ss, se, al, eobrun
                        )
                    else:
                        eobrun = _ac_refine(
                            br, ac_t, grid[by, bx], ss, se, al, eobrun
                        )
    except EOFError:
        pass  # truncated tail: keep what decoded
    return end


def _comp_blocks(c, h, w, hmax, vmax):
    cw = -(-w * c["h"] // hmax)
    ch = -(-h * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _dc_unit(br, hufftabs, sel, comps, ci, preds, grid, by, bx, ah, al):
    if ah == 0:  # first scan: diff of the point-transformed DC
        dc_t = hufftabs.get((0, sel[comps[ci]["id"]][0]))
        t = br.huff(dc_t)
        preds[ci] += br.receive_extend(t)
        grid[by, bx, 0] = preds[ci] << al
    else:  # refinement: one raw bit per block
        if br.bit():
            grid[by, bx, 0] = int(grid[by, bx, 0]) | (1 << al)


def _ac_first(br, ac_t, zz, ss, se, al, eobrun):
    """AC spectral-selection first scan for one block (G.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.huff(ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise EOFError
        zz[k] = br.receive_extend(s) << al
        k += 1
    return eobrun


def _ac_refine(br, ac_t, zz, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block (G.2.3):
    correction bits for history-nonzero coefficients, ±1<<Al insertion
    for newly-nonzero ones, EOB runs counted in BLOCKS INCLUSIVE of the
    current one (unlike the first-scan convention)."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.huff(ac_t)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # r == 15: skip over 16 zero-history coefficients
            else:
                val = p1 if br.bit() else m1
            while k <= se:
                z = int(zz[k])
                if z != 0:
                    if br.bit() and (z & p1) == 0:
                        zz[k] = z + (p1 if z >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = int(zz[k])
            if z != 0 and br.bit() and (z & p1) == 0:
                zz[k] = z + (p1 if z >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(comps, coefs, qt, h, w, prec=8):
    """Dequantize + IDCT the accumulated coefficient grids and finish
    with the same upsample / color-convert tail as the baseline path
    (12-bit data rescales to the 8-bit output range)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for ci, c in enumerate(comps):
        grid = coefs[ci]
        rows, cols = grid.shape[:2]
        q = qt[c["tq"]]
        plane = np.zeros((rows * 8, cols * 8))
        for by in range(rows):
            for bx in range(cols):
                blk = np.zeros(64)
                blk[ZIGZAG] = grid[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct2(blk.reshape(8, 8) * q) + (1 << (prec - 1))
                )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        out.append(plane[:h, :w] / (1 << (prec - 8)))
    return _to_rgb(out)


def _to_rgb(out):
    if len(out) == 1:
        g = np.clip(out[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out[0], out[1] - 128, out[2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _scan(payload, start, comps, sel, qt, hufftabs, h, w, restart, prec=8):
    if not comps or any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                        for c in comps):
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    segs = _split_entropy(payload, start)
    seg_i = 0
    br = _BitReader(segs[0])
    preds = [0] * len(comps)
    mcu_i = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu_i and mcu_i % restart == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise EOFError
                    br = _BitReader(segs[seg_i])
                    preds = [0] * len(comps)
                mcu_i += 1
                for ci, c in enumerate(comps):
                    dc_t = hufftabs.get((0, sel[c["id"]][0]))
                    ac_t = hufftabs.get((1, sel[c["id"]][1]))
                    q = qt[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = np.zeros(64)
                            t = br.huff(dc_t)
                            preds[ci] += br.receive_extend(t)
                            coef[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = br.huff(ac_t)
                                if rs == 0:
                                    break
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                k += rs >> 4
                                if k > 63:
                                    return None
                                coef[ZIGZAG[k]] = br.receive_extend(rs & 15)
                                k += 1
                            block = (_idct2(coef.reshape(8, 8) * q)
                                     + (1 << (prec - 1)))
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    except EOFError:
        pass  # truncated tail: keep what decoded
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w] / (1 << (prec - 8)))
    return _to_rgb(out)


# ---------------------------------------------------------------------------
# Encoder (tests / fixtures): 4:4:4 baseline with the spec's Annex K
# example tables.
# ---------------------------------------------------------------------------

_K_LUM_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

# Annex K example DC/AC luminance Huffman specs (counts, symbols)
_K_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_K_DC_SYMS = list(range(12))
_K_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_K_AC_SYMS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _encode_coef(v: int) -> tuple[int, int]:
    """EXTEND inverse: value → (size, appended bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _quant_table(quality: int) -> np.ndarray:
    scale = (5000 / quality if quality < 50 else 200 - 2 * quality) / 100.0
    return np.clip(np.round(_K_LUM_Q * scale), 1, 255)


def _rgb_to_zz(rgb: np.ndarray, q: np.ndarray):
    """Quantized zig-zag coefficient grids per component:
    [(blocks_y, blocks_x, 64) int64] × 3 (Y, Cb, Cr, 4:4:4)."""
    h, w = rgb.shape[:2]
    rgbf = rgb.astype(np.float64)
    y = 0.299 * rgbf[:, :, 0] + 0.587 * rgbf[:, :, 1] + 0.114 * rgbf[:, :, 2]
    cb = -0.168736 * rgbf[:, :, 0] - 0.331264 * rgbf[:, :, 1] + 0.5 * rgbf[:, :, 2] + 128
    cr = 0.5 * rgbf[:, :, 0] - 0.418688 * rgbf[:, :, 1] - 0.081312 * rgbf[:, :, 2] + 128
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    inv_zz = np.argsort(ZIGZAG).reshape(8, 8).reshape(-1)
    grids = []
    for plane in (y, cb, cr):
        p = np.empty((ph, pw))
        p[:h, :w] = plane
        p[h:, :w] = plane[-1:, :]
        p[:, w:] = p[:, w - 1 : w]
        p -= 128
        grid = np.zeros((ph // 8, pw // 8, 64), dtype=np.int64)
        for by in range(ph // 8):
            for bx in range(pw // 8):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = np.round(_fdct2(block) / q).astype(np.int64)
                zz = np.zeros(64, dtype=np.int64)
                zz[inv_zz] = coef.reshape(-1)
                grid[by, bx] = zz
        grids.append(grid)
    return grids


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _headers(h: int, w: int, q: np.ndarray, sof_marker: int) -> bytes:
    qz = np.zeros(64, dtype=np.uint8)
    qz[np.arange(64)] = q.reshape(-1)[ZIGZAG]
    dqt = _seg(0xDB, bytes([0]) + qz.tobytes())
    sof = _seg(sof_marker, bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
               + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]))
    dht = _seg(0xC4, bytes([0x00]) + bytes(_K_DC_COUNTS) + bytes(_K_DC_SYMS)) \
        + _seg(0xC4, bytes([0x10]) + bytes(_K_AC_COUNTS) + bytes(_K_AC_SYMS))
    return b"\xff\xd8" + dqt + sof + dht


def encode_baseline(rgb: np.ndarray, quality: int = 90) -> bytes:
    """Minimal 4:4:4 baseline encoder (Annex K example tables shared by
    all components) — exists so tests can round-trip decode_baseline
    without an imaging library."""
    h, w = rgb.shape[:2]
    q = _quant_table(quality)
    dc = _Huff(_K_DC_COUNTS, _K_DC_SYMS)
    ac = _Huff(_K_AC_COUNTS, _K_AC_SYMS)
    grids = _rgb_to_zz(rgb, q)

    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(grids[0].shape[0]):
        for mx in range(grids[0].shape[1]):
            for ci in range(3):
                zz = grids[ci][my, mx]
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                s, bits = _encode_coef(diff)
                code, ln = dc.enc[s]
                bw.put(code, ln)
                if s:
                    bw.put(bits, s)
                run = 0
                last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
                for k in range(1, last_nz + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac.enc[0xF0]
                        bw.put(code, ln)
                        run -= 16
                    s, bits = _encode_coef(int(zz[k]))
                    code, ln = ac.enc[(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(bits, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac.enc[0x00]  # EOB
                    bw.put(code, ln)
    bw.flush()
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return _headers(h, w, q, 0xC0) + sos + bytes(bw.out) + b"\xff\xd9"


def encode_progressive(rgb: np.ndarray, quality: int = 90) -> bytes:
    """4:4:4 PROGRESSIVE encoder (SOF2) exercising every scan kind the
    decoder implements — spectral selection (AC bands 1–5 / 6–63) AND
    successive approximation (Al=1 first scans, Ah=1→Al=0 refinements,
    DC and AC). Same quantized coefficients as :func:`encode_baseline`,
    so both encodings reconstruct to the IDENTICAL image — the
    round-trip test in tests/test_codec_properties.py relies on that.
    EOB runs are emitted per block (r=0), which the Annex K AC table
    can code; refinement correction bits follow libjpeg's buffered-bit
    ordering."""
    h, w = rgb.shape[:2]
    q = _quant_table(quality)
    dc = _Huff(_K_DC_COUNTS, _K_DC_SYMS)
    ac = _Huff(_K_AC_COUNTS, _K_AC_SYMS)
    grids = _rgb_to_zz(rgb, q)
    rows, cols = grids[0].shape[:2]
    out = bytearray(_headers(h, w, q, 0xC2))

    def sos_hdr(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC/AC table 0
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(rows):
        for mx in range(cols):
            for ci in range(3):
                v = int(grids[ci][my, mx, 0]) >> 1  # arithmetic point transform
                diff = v - preds[ci]
                preds[ci] = v
                s, bits = _encode_coef(diff)
                code, ln = dc.enc[s]
                bw.put(code, ln)
                if s:
                    bw.put(bits, s)
    bw.flush()
    out += sos_hdr([1, 2, 3], 0, 0, 0, 1) + bytes(bw.out)

    # scans 2-7: AC first per component, two spectral bands, Al=1
    for ci, cid in enumerate((1, 2, 3)):
        for ss, se in ((1, 5), (6, 63)):
            bw = _BitWriter()
            for my in range(rows):
                for mx in range(cols):
                    zz = grids[ci][my, mx]
                    vals = [
                        (1 if zz[k] > 0 else -1) * (abs(int(zz[k])) >> 1)
                        for k in range(ss, se + 1)
                    ]
                    last_nz = max(
                        (j for j, v in enumerate(vals) if v), default=-1
                    )
                    run = 0
                    for j in range(last_nz + 1):
                        if vals[j] == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac.enc[0xF0]
                            bw.put(code, ln)
                            run -= 16
                        s, bits = _encode_coef(vals[j])
                        code, ln = ac.enc[(run << 4) | s]
                        bw.put(code, ln)
                        bw.put(bits, s)
                        run = 0
                    if last_nz < se - ss:
                        code, ln = ac.enc[0x00]  # EOB, run = this block
                        bw.put(code, ln)
            bw.flush()
            out += sos_hdr([cid], ss, se, 0, 1) + bytes(bw.out)

    # scan 8: DC refinement (raw bit per block, interleaved)
    bw = _BitWriter()
    for my in range(rows):
        for mx in range(cols):
            for ci in range(3):
                bw.put(int(grids[ci][my, mx, 0]) & 1, 1)
    bw.flush()
    out += sos_hdr([1, 2, 3], 0, 0, 1, 0) + bytes(bw.out)

    # scans 9-14: AC refinement per component and band (Ah=1 → Al=0)
    for ci, cid in enumerate((1, 2, 3)):
        for ss, se in ((1, 5), (6, 63)):
            bw = _BitWriter()
            for my in range(rows):
                for mx in range(cols):
                    zz = grids[ci][my, mx]
                    absv = [abs(int(zz[k])) for k in range(ss, se + 1)]
                    eob = max(
                        (j for j, t in enumerate(absv) if t == 1), default=-1
                    )
                    run = 0
                    pending: list[int] = []  # buffered correction bits
                    for j, t in enumerate(absv):
                        if t == 0:
                            run += 1
                            continue
                        while run > 15 and j <= eob:
                            code, ln = ac.enc[0xF0]
                            bw.put(code, ln)
                            for b in pending:
                                bw.put(b, 1)
                            pending = []
                            run -= 16
                        if t > 1:  # history-nonzero: correction bit
                            pending.append(t & 1)
                            continue
                        # newly nonzero (|coef| == 1 at this precision)
                        code, ln = ac.enc[(run << 4) | 1]
                        bw.put(code, ln)
                        bw.put(1 if zz[ss + j] > 0 else 0, 1)
                        for b in pending:
                            bw.put(b, 1)
                        pending = []
                        run = 0
                    if run > 0 or pending:
                        code, ln = ac.enc[0x00]  # EOB run of one block
                        bw.put(code, ln)
                        for b in pending:
                            bw.put(b, 1)
            bw.flush()
            out += sos_hdr([cid], ss, se, 1, 0) + bytes(bw.out)

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# 12-bit encoder (tests / fixtures): SOF1 extended sequential, 4:4:4
# ---------------------------------------------------------------------------


def _rgb12_to_zz(rgb12: np.ndarray, q: np.ndarray):
    """Quantized zig-zag grids for 12-bit samples (0..4095): the 8-bit
    pipeline with a 2048 level shift and chroma offset."""
    h, w = rgb12.shape[:2]
    f = rgb12.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = (-0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1]
          + 0.5 * f[:, :, 2] + 2048)
    cr = (0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1]
          - 0.081312 * f[:, :, 2] + 2048)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    inv_zz = np.argsort(ZIGZAG).reshape(8, 8).reshape(-1)
    grids = []
    for plane in (y, cb, cr):
        p = np.empty((ph, pw))
        p[:h, :w] = plane
        p[h:, :w] = plane[-1:, :]
        p[:, w:] = p[:, w - 1 : w]
        p -= 2048
        grid = np.zeros((ph // 8, pw // 8, 64), dtype=np.int64)
        for by in range(ph // 8):
            for bx in range(pw // 8):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = np.round(_fdct2(block) / q).astype(np.int64)
                zz = np.zeros(64, dtype=np.int64)
                zz[inv_zz] = coef.reshape(-1)
                grid[by, bx] = zz
        grids.append(grid)
    return grids


def encode_extended12(rgb12: np.ndarray, quality: int = 90,
                      arith: bool = False) -> bytes:
    """Encode 12-bit RGB (uint16, 0..4095) as extended sequential JPEG:
    SOF1 with Huffman tables wide enough for 12-bit magnitude
    categories (DC sizes 0..15, AC sizes 1..14 — the Annex K 8-bit
    examples only reach 11), Pq=1 16-bit quantization tables, or the
    arithmetic variant (SOF9 precision 12; the QM models are
    magnitude-generic so nothing else changes)."""
    h, w = rgb12.shape[:2]
    q = np.clip(_quant_table(quality) * 16, 1, 65535)
    grids = _rgb12_to_zz(rgb12, q)
    rows, cols = grids[0].shape[:2]

    qz = np.zeros(64, dtype=">u2")
    qz[np.arange(64)] = q.reshape(-1)[ZIGZAG]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x10]) + qz.tobytes())
    sof_marker = 0xC9 if arith else 0xC1
    out += _seg(sof_marker, bytes([12]) + struct.pack(">HH", h, w)
                + bytes([3]) + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0])
                + bytes([3, 0x11, 0]))
    if arith:
        from .jparith import ArithEncoder, _AcModel, _DcModel

        out += _seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))
        out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        enc = ArithEncoder()
        dcm = _DcModel()
        acm = _AcModel()
        preds = [0, 0, 0]
        ctxs = [0, 0, 0]
        for my in range(rows):
            for mx in range(cols):
                for ci in range(3):
                    zz = grids[ci][my, mx]
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    ctxs[ci] = dcm.encode(enc, diff, ctxs[ci])
                    acm.encode_band(enc, zz)
        out += enc.finish() + b"\xff\xd9"
        return bytes(out)

    # flat canonical Huffman tables covering the 12-bit symbol ranges:
    # DC sizes 0..15 at 5 bits; AC (run, size<=14) + EOB + ZRL at 9 bits
    dc_counts = [0, 0, 0, 0, 16] + [0] * 11
    dc_syms = list(range(16))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 15)
    ]
    ac_counts = [0] * 16
    ac_counts[8] = len(ac_syms)
    dc = _Huff(dc_counts, dc_syms)
    ac = _Huff(ac_counts, ac_syms)
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(rows):
        for mx in range(cols):
            for ci in range(3):
                zz = grids[ci][my, mx]
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                s, bits = _encode_coef(diff)
                code, ln = dc.enc[s]
                bw.put(code, ln)
                if s:
                    bw.put(bits, s)
                run = 0
                last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
                for k in range(1, last_nz + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac.enc[0xF0]
                        bw.put(code, ln)
                        run -= 16
                    s, bits = _encode_coef(int(zz[k]))
                    code, ln = ac.enc[(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(bits, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac.enc[0x00]
                    bw.put(code, ln)
    bw.flush()
    return bytes(out + bytes(bw.out) + b"\xff\xd9")


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3, T.81 Annex H): predictive Huffman process
# ---------------------------------------------------------------------------

# predictor formulas (Table H.1), selected by the scan's Ss field
def _predict(mode, ra, rb, rc):
    if mode == 1:
        return ra
    if mode == 2:
        return rb
    if mode == 3:
        return rc
    if mode == 4:
        return ra + rb - rc
    if mode == 5:
        return ra + ((rb - rc) >> 1)
    if mode == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # mode 7


def _scan_lossless(payload, start, comps, sel, hufftabs, h, w, restart,
                   prec, pred_mode, al):
    """One lossless scan (interleaved, sampling factors all 1): each
    sample is a Huffman-coded prediction difference (DC-style category
    + EXTEND bits; category 16 means +32768 with no appended bits),
    modulo-65536 reconstruction per H.1.2.  The first sample of the
    scan AND of each restart interval predicts 2^(P-1-Pt); the rest of
    the first row predicts from Ra, the first column from Rb.  Output
    rescales through the point transform and precision to the 8-bit
    RGB contract (3-component SOF3 is taken as direct RGB — lossless
    JPEG mandates no color transform)."""
    if not comps or any(c["h"] != 1 or c["v"] != 1 for c in comps):
        return None
    if not (1 <= pred_mode <= 7):
        return None
    nc = len(comps)
    planes = [np.zeros((h, w), dtype=np.int64) for _ in range(nc)]
    segs = _split_entropy(payload, start)
    seg_i = 0
    br = _BitReader(segs[0])
    default = 1 << (prec - 1 - al)
    mcu_i = 0
    fresh = True  # next sample uses the default prediction
    try:
        for y in range(h):
            for x in range(w):
                if restart and mcu_i and mcu_i % restart == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise EOFError
                    br = _BitReader(segs[seg_i])
                    fresh = True
                mcu_i += 1
                for ci, c in enumerate(comps):
                    t = hufftabs.get((0, sel[c["id"]][0]))
                    s = br.huff(t)
                    diff = 32768 if s == 16 else br.receive_extend(s)
                    p = planes[ci]
                    if fresh:
                        pred = default
                    elif y == 0:
                        pred = int(p[y, x - 1])
                    elif x == 0:
                        pred = int(p[y - 1, x])
                    else:
                        pred = _predict(
                            pred_mode, int(p[y, x - 1]), int(p[y - 1, x]),
                            int(p[y - 1, x - 1]),
                        )
                    p[y, x] = (pred + diff) & 0xFFFF
                fresh = False
    except EOFError:
        pass  # truncated tail: keep what decoded
    scale = float(1 << al) / (1 << (prec - 8))
    out = [p.astype(np.float64) * scale for p in planes]
    if nc == 1:
        g = np.clip(out[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if nc == 3:  # direct RGB, no YCbCr in the lossless process
        return np.clip(np.stack(out, axis=2), 0, 255).astype(np.uint8)
    return None


def encode_lossless(rgb: np.ndarray, predictor: int = 4,
                    prec: int = 8, point_transform: int = 0,
                    restart: int = 0) -> bytes:
    """Lossless SOF3 fixture encoder (3-component direct RGB or 2-D
    grayscale), wide-category Huffman table (sizes 0..16), optional
    restart intervals. ``rgb`` dtype uint8 for prec=8 or uint16 for
    12/16-bit; decode of the emitted stream reproduces the (point-
    transformed) samples EXACTLY — the round-trip test anchor."""
    if rgb.ndim == 2:
        rgb = rgb[:, :, None]
    h, w, nc = rgb.shape
    al = point_transform
    planes = [
        (rgb[:, :, ci].astype(np.int64) >> al) for ci in range(nc)
    ]
    counts = [0, 0, 0, 0, 17] + [0] * 11  # 17 symbols, 5 bits each
    syms = list(range(17))
    huff = _Huff(counts, syms)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xC3, bytes([prec]) + struct.pack(">HH", h, w) + bytes([nc])
                + b"".join(bytes([ci + 1, 0x11, 0]) for ci in range(nc)))
    out += _seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(syms))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    out += _seg(0xDA, bytes([nc])
                + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc))
                + bytes([predictor, 0, al]))

    bw = _BitWriter()
    default = 1 << (prec - 1 - al)
    segs_out = []
    mcu_i = 0
    rst = 0
    fresh = True
    for y in range(h):
        for x in range(w):
            if restart and mcu_i and mcu_i % restart == 0:
                bw.flush()
                segs_out.append(bytes(bw.out))
                segs_out.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) & 7
                bw = _BitWriter()
                fresh = True
            mcu_i += 1
            for ci in range(nc):
                p = planes[ci]
                if fresh:
                    pred = default
                elif y == 0:
                    pred = int(p[y, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, x])
                else:
                    pred = _predict(
                        predictor, int(p[y, x - 1]), int(p[y - 1, x]),
                        int(p[y - 1, x - 1]),
                    )
                diff = (int(p[y, x]) - pred) & 0xFFFF
                if diff >= 0x8000:  # modulo window → signed
                    diff -= 0x10000
                if diff == -32768:  # category 16, no appended bits
                    code, ln = huff.enc[16]
                    bw.put(code, ln)
                    continue
                s, bits = _encode_coef(diff)
                code, ln = huff.enc[s]
                bw.put(code, ln)
                if s:
                    bw.put(bits, s)
            fresh = False
    bw.flush()
    segs_out.append(bytes(bw.out))
    return bytes(out) + b"".join(segs_out) + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Hierarchical JPEG (T.81 Annex J): DHP / EXP / differential frames
# ---------------------------------------------------------------------------


def _exp_upsample(p: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """J.1.1.2 reference expansion: out[2i] = in[i],
    out[2i+1] = (in[i] + in[i+1] + 1) >> 1 (last column/row repeats),
    applied horizontally and/or vertically on integer samples."""
    q = p.astype(np.int64)
    if eh:
        nxt = np.concatenate([q[:, 1:], q[:, -1:]], axis=1)
        out = np.empty((q.shape[0], q.shape[1] * 2), dtype=np.int64)
        out[:, 0::2] = q
        out[:, 1::2] = (q + nxt + 1) >> 1
        q = out
    if ev:
        nxt = np.concatenate([q[1:, :], q[-1:, :]], axis=0)
        out = np.empty((q.shape[0] * 2, q.shape[1]), dtype=np.int64)
        out[0::2, :] = q
        out[1::2, :] = (q + nxt + 1) >> 1
        q = out
    return q


def _hier_scan(payload, start, comps, sel, qt, hufftabs, fh, fw,
               restart, diff, refs):
    """One hierarchical frame's scan (sequential Huffman, sampling
    factors 1, single interleaved scan). Non-differential frames
    reconstruct level-shifted samples; differential frames decode the
    DIFFERENCE (DC prediction is ZERO — there is no cross-block DC
    prediction in differential frames) and add it to the reference.
    Returns (planes, end_index); planes are integer sample arrays in
    the unsigned domain, clamped like a real sample store."""
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        return None, start
    bh, bw = -(-fh // 8), -(-fw // 8)
    nc = len(comps)
    planes = []
    for ci in range(nc):
        p = np.zeros((bh * 8, bw * 8), dtype=np.int64)
        if diff:
            if refs is None or ci >= len(refs):
                return None, start
            r = refs[ci]
            p[: min(r.shape[0], p.shape[0]), : min(r.shape[1], p.shape[1])] = (
                r[: p.shape[0], : p.shape[1]]
            )
        planes.append(p)
    segs, end = _split_entropy_upto(payload, start)
    seg_i = 0
    br = _BitReader(segs[0])
    preds = [0] * nc
    mcu_i = 0
    try:
        for by in range(bh):
            for bx in range(bw):
                if restart and mcu_i and mcu_i % restart == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise EOFError
                    br = _BitReader(segs[seg_i])
                    preds = [0] * nc
                mcu_i += 1
                for ci, c in enumerate(comps):
                    dc_t = hufftabs.get((0, sel[c["id"]][0]))
                    ac_t = hufftabs.get((1, sel[c["id"]][1]))
                    q = qt[c["tq"]]
                    coef = np.zeros(64)
                    t = br.huff(dc_t)
                    d = br.receive_extend(t)
                    if diff:
                        coef[0] = d  # zero prediction
                    else:
                        preds[ci] += d
                        coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = br.huff(ac_t)
                        if rs == 0:
                            break
                        if rs == 0xF0:
                            k += 16
                            continue
                        k += rs >> 4
                        if k > 63:
                            return None, end
                        coef[ZIGZAG[k]] = br.receive_extend(rs & 15)
                        k += 1
                    sp = _idct2(coef.reshape(8, 8) * q)  # natural order
                    y0, x0 = by * 8, bx * 8
                    if diff:
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] += np.round(
                            sp
                        ).astype(np.int64)
                    else:
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = np.round(
                            sp + 128
                        ).astype(np.int64)
    except EOFError:
        pass  # truncated tail
    planes = [np.clip(p, 0, 255)[:fh, :fw] for p in planes]
    return planes, end


def _decode_hierarchical(payload: bytes):
    """T.81 Annex J hierarchical process: a DHP frame header, then a
    pyramid of frames — a non-differential sequential first frame and
    differential refinement frames, each optionally preceded by an EXP
    marker doubling the reference resolution. Scope: 8-bit, Huffman,
    sampling factors 1, one interleaved scan per frame (the form the
    fixture encoder emits; no mainstream codec ships hierarchical
    support to cross-check against, which this docstring records
    honestly — the composition law tests verify each stage against the
    standalone primitives instead)."""
    try:
        qt: dict[int, np.ndarray] = {}
        hufftabs: dict[tuple[int, int], _Huff] = {}
        H = W = 0
        refs = None
        frame = None  # (comps, fh, fw, diff)
        restart = 0
        i, n = 2, len(payload)
        while i + 2 <= n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xD9:
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > n:
                break
            (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
            body = payload[i + 4 : i + 2 + seglen]
            if marker == 0xDB:
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 15
                    tbl = np.zeros(64)
                    if pq == 0:
                        tbl[ZIGZAG] = np.frombuffer(
                            body, dtype=np.uint8, count=64, offset=j + 1
                        )
                        j += 65
                    else:
                        tbl[ZIGZAG] = np.frombuffer(
                            body, dtype=">u2", count=64, offset=j + 1
                        )
                        j += 129
                    qt[tq] = tbl.reshape(8, 8)
            elif marker == 0xC4:
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 15
                    counts = list(body[j + 1 : j + 17])
                    nsym = sum(counts)
                    hufftabs[(tc, th)] = _Huff(
                        counts, list(body[j + 17 : j + 17 + nsym])
                    )
                    j += 17 + nsym
            elif marker == 0xDE:  # DHP: final dimensions
                if body[0] != 8:
                    return None
                H, W = struct.unpack(">HH", body[1:5])
            elif marker == 0xDF:  # EXP: expand reference
                if refs is None:
                    return None
                eh, ev = body[0] >> 4, body[0] & 15
                refs = [_exp_upsample(p, eh, ev) for p in refs]
            elif marker in (0xC0, 0xC1, 0xC5):
                if body[0] != 8:
                    return None
                fh, fw = struct.unpack(">HH", body[1:5])
                nc = body[5]
                comps = []
                for c in range(nc):
                    cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                    comps.append(
                        {"id": cid, "h": samp >> 4, "v": samp & 15,
                         "tq": tq}
                    )
                frame = (comps, fh, fw, marker == 0xC5)
            elif marker in (0xC2, 0xC3, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                return None  # frame kind outside the supported scope
            elif marker == 0xDD:
                (restart,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:
                if frame is None:
                    return None
                comps, fh, fw, diff = frame
                ns = body[0]
                sel = {}
                for c in range(ns):
                    cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                    sel[cid] = (tabs >> 4, tabs & 15)
                planes, i = _hier_scan(
                    payload, i + 2 + seglen, comps, sel, qt, hufftabs,
                    fh, fw, restart, diff, refs,
                )
                if planes is None:
                    return None
                refs = planes
                continue
            i += 2 + seglen
        if refs is None or H == 0:
            return None
        out = [p.astype(np.float64)[:H, :W] for p in refs]
        return _to_rgb(out)
    except Exception:
        return None


def encode_hierarchical(rgb: np.ndarray, quality: int = 90,
                        levels: int = 2) -> bytes:
    """Hierarchical fixture encoder: a 2x-per-level pyramid — the
    coarsest level as a non-differential sequential frame, then EXP +
    differential frames coding input-minus-reference at each doubling.
    The encoder SIMULATES the decoder (same quantized coefficients,
    same IDCT rounding, same clamps), so the decode is exactly the
    accumulated reconstruction the composition tests recompute from
    the standalone primitives."""
    h, w = rgb.shape[:2]
    q = _quant_table(quality)
    # level-0 YCbCr planes (unsigned domain)
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = (-0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1]
          + 0.5 * f[:, :, 2] + 128)
    cr = (0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1]
          - 0.081312 * f[:, :, 2] + 128)
    full = [np.round(p).astype(np.int64) for p in (y, cb, cr)]
    pyramid = [full]
    for _ in range(levels - 1):
        prev = pyramid[0]
        small = []
        for p in prev:
            ph = (p.shape[0] + 1) // 2
            pw = (p.shape[1] + 1) // 2
            pad = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                         mode="edge")
            small.append(
                (pad[0::2, 0::2] + pad[0::2, 1::2] + pad[1::2, 0::2]
                 + pad[1::2, 1::2] + 2) // 4
            )
            assert small[-1].shape == (ph, pw)
        pyramid.insert(0, small)

    # wide flat Huffman tables shared by every frame
    dc_counts = [0, 0, 0, 0, 17] + [0] * 11
    dc_syms = list(range(17))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 15)
    ]
    ac_counts = [0] * 16
    ac_counts[8] = len(ac_syms)
    dc = _Huff(dc_counts, dc_syms)
    ac = _Huff(ac_counts, ac_syms)

    qz = np.zeros(64, dtype=np.uint8)
    qz[np.arange(64)] = q.reshape(-1)[ZIGZAG]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDE, bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
                + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0])
                + bytes([3, 0x11, 0]))
    out += _seg(0xDB, bytes([0]) + qz.tobytes())
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))

    def emit_frame(planes_in, refs, diff):
        fh, fw = planes_in[0].shape
        bh, bw = -(-fh // 8), -(-fw // 8)
        bw8, bh8 = bw * 8, bh * 8
        sof = 0xC5 if diff else 0xC0
        seg = _seg(sof, bytes([8]) + struct.pack(">HH", fh, fw) + bytes([3])
                   + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0])
                   + bytes([3, 0x11, 0]))
        seg += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        bwtr = _BitWriter()
        preds = [0, 0, 0]
        new_refs = []
        # per-component padded sample/target grids
        src = []
        for ci in range(3):
            t = np.zeros((bh8, bw8), dtype=np.int64)
            p = planes_in[ci]
            t[: p.shape[0], : p.shape[1]] = p
            t[p.shape[0] :, : p.shape[1]] = p[-1:, :]
            t[:, p.shape[1] :] = t[:, p.shape[1] - 1 : p.shape[1]]
            base = np.zeros((bh8, bw8), dtype=np.int64)
            if diff:
                r = refs[ci]
                base[: min(r.shape[0], bh8), : min(r.shape[1], bw8)] = (
                    r[:bh8, :bw8]
                )
            src.append((t, base))
            new_refs.append(base.copy())
        for by in range(bh):
            for bx in range(bw):
                for ci in range(3):
                    t, base = src[ci]
                    y0, x0 = by * 8, bx * 8
                    tgt = t[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64)
                    if diff:
                        tgt = tgt - base[y0 : y0 + 8, x0 : x0 + 8]
                    else:
                        tgt = tgt - 128
                    coef = np.round(_fdct2(tgt) / q).astype(np.int64)
                    zz = np.zeros(64, dtype=np.int64)
                    inv_zz = np.argsort(ZIGZAG)
                    zz[inv_zz.reshape(8, 8).reshape(-1)] = coef.reshape(-1)
                    # entropy-code the block
                    dcv = int(zz[0])
                    d = dcv if diff else dcv - preds[ci]
                    if not diff:
                        preds[ci] = dcv
                    s, bits = _encode_coef(d)
                    code, ln = dc.enc[s]
                    bwtr.put(code, ln)
                    if s:
                        bwtr.put(bits, s)
                    run = 0
                    last_nz = max(
                        (k for k in range(1, 64) if zz[k]), default=0
                    )
                    for k in range(1, last_nz + 1):
                        if zz[k] == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac.enc[0xF0]
                            bwtr.put(code, ln)
                            run -= 16
                        s, bits = _encode_coef(int(zz[k]))
                        code, ln = ac.enc[(run << 4) | s]
                        bwtr.put(code, ln)
                        bwtr.put(bits, s)
                        run = 0
                    if last_nz < 63:
                        code, ln = ac.enc[0x00]
                        bwtr.put(code, ln)
                    # simulate the decoder's reconstruction
                    blk = np.zeros(64)
                    blk[ZIGZAG] = zz
                    sp = _idct2(blk.reshape(8, 8) * q)
                    if diff:
                        new_refs[ci][y0 : y0 + 8, x0 : x0 + 8] = (
                            base[y0 : y0 + 8, x0 : x0 + 8]
                            + np.round(sp).astype(np.int64)
                        )
                    else:
                        new_refs[ci][y0 : y0 + 8, x0 : x0 + 8] = np.round(
                            sp + 128
                        ).astype(np.int64)
        bwtr.flush()
        new_refs = [np.clip(p, 0, 255)[:fh, :fw] for p in new_refs]
        return seg + bytes(bwtr.out), new_refs

    seg, refs = emit_frame(pyramid[0], None, diff=False)
    out += seg
    for lvl in range(1, len(pyramid)):
        out += _seg(0xDF, bytes([0x11]))  # expand both directions
        refs = [_exp_upsample(p, 1, 1) for p in refs]
        tgt = pyramid[lvl]
        refs = [
            r[: t.shape[0], : t.shape[1]] for r, t in zip(refs, tgt)
        ]
        seg, refs = emit_frame(tgt, refs, diff=True)
        out += seg
    out += b"\xff\xd9"
    return bytes(out)
