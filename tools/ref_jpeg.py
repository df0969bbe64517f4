"""Independent baseline-JPEG reference decoder (golden-oracle side).

A from-scratch second implementation of the ITU-T T.81 baseline
sequential process, deliberately structured differently from the
production decoder (clickhouse_learning_spark/operators/jpeg.py) so the
two only agree if both implement the specification correctly:

- marker walk: simple sequential scan (no shared helpers);
- Huffman: bit-by-bit canonical-code walk over a (length, code) dict —
  the production decoder uses a 16-bit prefix LUT;
- entropy stream: inline destuffing inside the bit reader — the
  production decoder pre-splits segments;
- IDCT: direct basis-matrix einsum from the textbook formula
  B[u, y] = c_u/2 · cos((2y+1)uπ/16), pixel = Σ_{u,v} B[u,y]·C[u,v]·B[v,x]
  — the production decoder uses an orthonormal matrix sandwich.

Scope matches what the fixture encoder emits (4:4:4, one scan, no
restart markers, 8-bit tables); anything else returns None. Used only
by tools/make_multimodal_golden.py to derive the committed golden
feature values — never imported by the engine.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag index k → (row, col) in the 8×8 block, per the spec figure
_ZZ_POS = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# direct IDCT basis from the T.81 formula
_BASIS = np.empty((8, 8))
for _u in range(8):
    cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _y in range(8):
        _BASIS[_u, _y] = cu / 2.0 * np.cos((2 * _y + 1) * _u * np.pi / 16)


def _idct(coef: np.ndarray) -> np.ndarray:
    return np.einsum("uy,uv,vx->yx", _BASIS, coef, _BASIS)


class _Bits:
    """MSB-first bit reader with inline 0xFF00 destuffing; stops at any
    real marker."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.cur = 0
        self.nleft = 0
        self.done = False

    def bit(self) -> int:
        if self.nleft == 0:
            if self.done or self.pos >= len(self.d):
                raise EOFError
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos] if self.pos < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    self.done = True
                    raise EOFError
            self.cur = b
            self.nleft = 8
        self.nleft -= 1
        return (self.cur >> self.nleft) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _canonical(counts, symbols):
    """(length, code) → symbol, built straight from the DHT lists."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huff(bits: _Bits, table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode(payload: bytes):
    """HxWx3 uint8 RGB for a 4:4:4 single-scan baseline JPEG, else None."""
    if payload is None or payload[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    w = h = 0
    comps = []
    i = 2
    while i + 2 <= len(payload):
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xD9:
            return None  # EOI before SOS
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        (ln,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + ln]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                if body[j] >> 4:
                    return None
                q = np.zeros((8, 8))
                for k in range(64):
                    r, c = _ZZ_POS[k]
                    q[r, c] = body[j + 1 + k]
                qtables[body[j] & 15] = q
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                counts = list(body[j + 1 : j + 17])
                ns = sum(counts)
                huff[(tc, th)] = _canonical(
                    counts, list(body[j + 17 : j + 17 + ns])
                )
                j += 17 + ns
        elif marker == 0xC0:
            if body[0] != 8:
                return None
            h, w = struct.unpack(">HH", body[1:5])
            for c in range(body[5]):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    return None  # reference scope: 4:4:4 only
                comps.append((cid, tq))
        elif marker == 0xDA:
            sel = {}
            for c in range(body[0]):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 15)
            return _decode_scan(
                payload, i + 2 + ln, w, h, comps, sel, qtables, huff
            )
        elif marker in (0xC2, 0xDD):
            return None  # progressive / restart: out of reference scope
        i += 2 + ln
    return None


def _decode_scan(payload, pos, w, h, comps, sel, qtables, huff):
    bw, bh = -(-w // 8), -(-h // 8)
    planes = [np.zeros((bh * 8, bw * 8)) for _ in comps]
    bits = _Bits(payload, pos)
    preds = [0] * len(comps)
    try:
        for by in range(bh):
            for bx in range(bw):
                for ci, (cid, tq) in enumerate(comps):
                    dc_t = huff[(0, sel[cid][0])]
                    ac_t = huff[(1, sel[cid][1])]
                    coef = np.zeros((8, 8))
                    s = _read_huff(bits, dc_t)
                    preds[ci] += _extend(bits.bits(s), s)
                    coef[0, 0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _read_huff(bits, ac_t)
                        if rs == 0x00:
                            break
                        if rs == 0xF0:
                            k += 16
                            continue
                        k += rs >> 4
                        if k > 63:
                            return None
                        r, c = _ZZ_POS[k]
                        coef[r, c] = _extend(bits.bits(rs & 15), rs & 15)
                        k += 1
                    block = _idct(coef * qtables[tq]) + 128.0
                    planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    except EOFError:
        pass
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        g = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
