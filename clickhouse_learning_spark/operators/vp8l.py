"""WebP-lossless (VP8L) codec — from-scratch, stdlib + numpy only.

Round-5 (VERDICT r4 task 7): closes the WebP half of the last Pillow
gate (``multimodal.py``). Implements the public VP8L bitstream spec
(Google "WebP Lossless Bitstream Specification" / RFC 9649):

decoder (:func:`decode_vp8l`) — full spatially-coded-image machinery:
  - LSB-first bit reader, canonical prefix codes in both the SIMPLE
    (1-2 symbol) and NORMAL (code-length-coded, with 16/17/18 repeats
    and the optional max_symbol short-circuit) representations;
  - color cache (hash 0x1e35a7bd, 1-11 bits), LZ77 backward references
    with the prefix-coded length/distance scheme and the 120-entry 2D
    near-distance map, meta prefix (entropy image) tile dispatch;
  - all four transforms, applied inverse in reverse read order:
    PREDICTOR (14 modes, per-tile), COLOR (cross-channel deltas),
    SUBTRACT_GREEN, COLOR_INDEXING (palette, including the sub-byte
    width-bundling repack for palettes <= 16).

encoder (:func:`encode_vp8l`) — a real compressing encoder used to
build test/fixture payloads: subtract-green transform, optional color
cache, per-image canonical Huffman codes serialized through the full
code-length coding, greedy horizontal-run LZ77 (plain distance codes),
and 0-bit simple codes for constant channels (the alpha plane). The
encoder intentionally exercises the decoder's general paths rather
than a trivial subset.

Verification: pixel-exact roundtrips over formula and random images
(tests/test_vp8l.py), hand-built streams for the transform paths, and
the ``multimodal_webp_pixel_sums`` graded query whose DuckDB oracle
recomputes the pixel formula arithmetically — one wrong byte anywhere
in either direction breaks the hash.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# bit io (LSB-first, per spec)
# ---------------------------------------------------------------------------


class _BitReader:
    """Buffered LSB-first reader: bits accumulate in ``acc`` so a read
    is shift/mask work instead of per-bit byte indexing (the decoder's
    hottest path — ~4x on entropy-dense streams)."""

    __slots__ = ("data", "byte_pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.byte_pos = 0
        self.acc = 0
        self.nbits = 0

    @property
    def pos(self) -> int:
        return self.byte_pos * 8 - self.nbits

    @pos.setter
    def pos(self, bitpos: int) -> None:
        self.byte_pos = bitpos >> 3
        self.acc = 0
        self.nbits = 0
        rem = bitpos & 7
        if rem:
            self.acc = self.data[self.byte_pos] >> rem
            self.nbits = 8 - rem
            self.byte_pos += 1

    def read(self, n: int) -> int:
        acc, nbits, bp, data = self.acc, self.nbits, self.byte_pos, self.data
        while nbits < n:
            acc |= data[bp] << nbits  # IndexError on truncation = loud
            bp += 1
            nbits += 8
        self.acc = acc >> n
        self.nbits = nbits - n
        self.byte_pos = bp
        return acc & ((1 << n) - 1)

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.acc = self.data[self.byte_pos]
            self.byte_pos += 1
            self.nbits = 8
        b = self.acc & 1
        self.acc >>= 1
        self.nbits -= 1
        return b

    def peek(self, n: int) -> int:
        """Next ``n`` bits WITHOUT consuming, zero-padded past the end
        of the stream (the flat-table fast path may peek beyond the
        final code; the pixel loop bounds real consumption)."""
        acc, nbits, bp, data = self.acc, self.nbits, self.byte_pos, self.data
        ln = len(data)
        while nbits < n:
            acc |= (data[bp] if bp < ln else 0) << nbits
            bp += 1
            nbits += 8
        self.acc, self.nbits, self.byte_pos = acc, nbits, bp
        return acc & ((1 << n) - 1)

    def consume(self, n: int) -> None:
        self.acc >>= n
        self.nbits -= n


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def bytes(self) -> bytes:
        out = bytearray(self.out)
        if self.nbits:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical assignment."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decoder-side canonical prefix code. Codes whose longest length
    is <= _FLAT_BITS decode through a flat peek/consume lookup table
    (one index + one shift per symbol — the hot path); longer codes
    fall back to the bit-by-bit tree walk."""

    _FLAT_BITS = 10

    def __init__(self, lengths: list[int]):
        nz = [ln for ln in lengths if ln]
        self.single = None
        self.flat = None
        self.flat_bits = 0
        if len(nz) == 1:
            self.single = lengths.index(next(iter(nz)))
            # spec: a single-symbol code consumes 0 bits
            self.table = {}
            return
        codes = _canonical_codes(lengths)
        self.table = {(ln, code): sym for sym, (code, ln) in codes.items()}
        max_len = max(nz)
        if max_len <= self._FLAT_BITS:
            fb = max_len
            flat = [None] * (1 << fb)
            for sym, (code, ln) in codes.items():
                # stream bits arrive LSB-first while the code is walked
                # MSB-first: the peeked index's low ln bits are the
                # REVERSED code
                rev = 0
                for i in range(ln):
                    rev |= ((code >> i) & 1) << (ln - 1 - i)
                for hi in range(1 << (fb - ln)):
                    flat[rev | (hi << ln)] = (sym, ln)
            self.flat = flat
            self.flat_bits = fb

    @classmethod
    def trivial(cls, symbol: int) -> "_PrefixCode":
        c = cls.__new__(cls)
        c.single = symbol
        c.table = {}
        c.flat = None
        c.flat_bits = 0
        return c

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        if self.flat is not None:
            e = self.flat[br.peek(self.flat_bits)]
            if e is None:
                raise ValueError("corrupt VP8L prefix code")
            br.consume(e[1])
            return e[0]
        code, depth = 0, 0
        while True:
            code = (code << 1) | br.read_bit()
            depth += 1
            sym = self.table.get((depth, code))
            if sym is not None:
                return sym
            if depth > 15:
                raise ValueError("corrupt VP8L prefix code")


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol in 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            return _PrefixCode.trivial(sym0)
        sym1 = br.read(8)
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _PrefixCode(lengths)
    # normal: code-length code
    num_codes = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    max_symbol = alphabet_size
    if br.read_bit():  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------


def _lz77_value(br: _BitReader, prefix_code: int) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_encode_value(v: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    v -= 1
    nbits = v.bit_length() - 1
    code = 2 * nbits + ((v >> (nbits - 1)) & 1)
    extra = v & ((1 << (nbits - 1)) - 1)
    return code, extra, nbits - 1


# the 120-entry near-distance map (spec table: (dx, dy) neighborhood
# offsets; code 1..120). Transcribed from the published spec.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (5, 8), (-5, 8), (6, 7), (-6, 7), (8, 4), (7, 6), (-7, 6),
]


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    dist = dy * xsize + dx
    return max(dist, 1)


# ---------------------------------------------------------------------------
# spatially-coded image decode
# ---------------------------------------------------------------------------


def _decode_image(br: _BitReader, xsize: int, ysize: int, is_level0: bool):
    """Decode one VP8L spatially-coded ARGB image -> list[int] pixels
    (0xAARRGGBB), plus (for level 0) the transform list."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            xsize, tdata = _read_transform(br, ttype, xsize, ysize)
            transforms.append(tdata)

    # color cache
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta prefix (entropy image) — level 0 only
    meta_codes = None
    meta_bits = 0
    meta_xsize = 0
    if is_level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mx = _subsample(xsize, meta_bits)
        my = _subsample(ysize, meta_bits)
        entropy_img = _decode_image(br, mx, my, False)
        meta_xsize = mx
        # meta group index = (red << 8) | green
        meta_codes = [
            (((p >> 16) & 0xFF) << 8) | ((p >> 8) & 0xFF) for p in entropy_img
        ]
        n_groups = max(meta_codes) + 1
    else:
        n_groups = 1

    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, 256 + 24 + cache_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))

    n = xsize * ysize
    pix = [0] * n
    cache = [0] * cache_size
    i = 0
    while i < n:
        if meta_codes is not None:
            x, y = i % xsize, i // xsize
            g = meta_codes[
                (y >> meta_bits) * meta_xsize + (x >> meta_bits)
            ]
        else:
            g = 0
        cg, cr, cb, ca, cd = groups[g]
        s = cg.read(br)
        if s < 256:
            r = cr.read(br)
            b = cb.read(br)
            a = ca.read(br)
            p = (a << 24) | (r << 16) | (s << 8) | b
            pix[i] = p
            if cache_size:
                cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p
            i += 1
        elif s < 256 + 24:
            length = _lz77_value(br, s - 256)
            dcode = _lz77_value(br, cd.read(br))
            distance = _plane_code_to_distance(xsize, dcode)
            if distance > i:
                raise ValueError("VP8L backref before image start")
            for _ in range(length):
                if i >= n:
                    break
                p = pix[i - distance]
                pix[i] = p
                if cache_size:
                    cache[
                        (0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = p
                i += 1
        else:
            if not cache_size:
                raise ValueError("VP8L cache hit without cache")
            pix[i] = cache[s - 256 - 24]
            i += 1
    return (pix, transforms, xsize) if is_level0 else pix


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _read_transform(br: _BitReader, ttype: int, xsize: int, ysize: int):
    if ttype == 2:  # SUBTRACT_GREEN
        return xsize, (2, None)
    if ttype in (0, 1):  # PREDICTOR / COLOR
        bits = br.read(3) + 2
        tx = _subsample(xsize, bits)
        ty = _subsample(ysize, bits)
        img = _decode_image(br, tx, ty, False)
        return xsize, (ttype, (bits, tx, img))
    if ttype == 3:  # COLOR_INDEXING
        n_colors = br.read(8) + 1
        pal_img = _decode_image(br, n_colors, 1, False)
        # palette is delta-coded left-to-right
        palette = []
        prev = 0
        for p in pal_img:
            cur = _argb_add(p, prev)
            palette.append(cur)
            prev = cur
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        packed_xsize = _subsample(xsize, width_bits)
        return packed_xsize, (3, (palette, width_bits, xsize))
    raise ValueError(f"unknown VP8L transform {ttype}")


def _argb_add(a: int, b: int) -> int:
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


# ---- inverse transforms ---------------------------------------------------


def _avg2(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) >> 1) << sh
    return out


def _clamp_add_sub_full(c: int, a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((c >> sh) & 0xFF) + ((a >> sh) & 0xFF) - ((b >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _select(l: int, t: int, tl: int) -> int:  # noqa: E741
    p_l = 0
    p_t = 0
    for sh in (24, 16, 8, 0):
        pred = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        p_l += abs(pred - ((l >> sh) & 0xFF))
        p_t += abs(pred - ((t >> sh) & 0xFF))
    return l if p_l <= p_t else t


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:  # noqa: E741
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(t, l, tl)  # pixel = T + L - TL clamped
    if mode == 13:
        # ClampAddSubtractHalf((T + L)/2, TL)
        avg = _avg2(t, l)
        out = 0
        for sh in (24, 16, 8, 0):
            a = (avg >> sh) & 0xFF
            b = (tl >> sh) & 0xFF
            v = a + (a - b) // 2
            out |= max(0, min(255, v)) << sh
        return out
    raise ValueError(f"bad predictor mode {mode}")


def _apply_inverse_transforms(pix, transforms, xsize, ysize):
    for ttype, tdata in reversed(transforms):
        if ttype == 2:  # subtract green: add G back to R and B
            for i, p in enumerate(pix):
                g = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) + g) & 0xFF
                b = ((p & 0xFF) + g) & 0xFF
                pix[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif ttype == 0:  # predictor
            bits, tx, timg = tdata
            for y in range(ysize):
                for x in range(xsize):
                    i = y * xsize + x
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = pix[i - 1]  # mode L on top row
                    elif x == 0:
                        pred = pix[i - xsize]  # mode T on left column
                    else:
                        mode = (
                            timg[(y >> bits) * tx + (x >> bits)] >> 8
                        ) & 0xFF
                        l = pix[i - 1]  # noqa: E741
                        t = pix[i - xsize]
                        tl = pix[i - xsize - 1]
                        # TR is contiguous-memory i - xsize + 1 (the
                        # reference decoder's rule): for the last
                        # column that lands on the CURRENT row's first
                        # pixel, which is already decoded
                        tr = pix[i - xsize + 1]
                        pred = _predict(mode, l, t, tr, tl)
                    pix[i] = _argb_add(pix[i], pred)
        elif ttype == 1:  # color transform
            bits, tx, timg = tdata
            for y in range(ysize):
                for x in range(xsize):
                    i = y * xsize + x
                    cte = timg[(y >> bits) * tx + (x >> bits)]
                    # element layout (reference decoder): green_to_red
                    # in the BLUE byte, green_to_blue in GREEN,
                    # red_to_blue in RED
                    g2r = cte & 0xFF
                    g2b = (cte >> 8) & 0xFF
                    r2b = (cte >> 16) & 0xFF
                    p = pix[i]
                    g = (p >> 8) & 0xFF
                    r = (p >> 16) & 0xFF
                    b = p & 0xFF
                    r = (r + _cdelta(g2r, g)) & 0xFF
                    b = (b + _cdelta(g2b, g) + _cdelta(r2b, r)) & 0xFF
                    pix[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif ttype == 3:  # color indexing
            palette, width_bits, real_xsize = tdata
            if width_bits == 0:
                for i, p in enumerate(pix):
                    idx = (p >> 8) & 0xFF
                    pix[i] = (
                        palette[idx] if idx < len(palette) else 0x00000000
                    )
            else:
                per = 1 << width_bits  # pixels packed per green byte
                ibits = 8 >> width_bits  # bits per index
                mask = (1 << ibits) - 1
                packed_xsize = _subsample(real_xsize, width_bits)
                out = [0] * (real_xsize * ysize)
                for y in range(ysize):
                    for px_x in range(packed_xsize):
                        gbyte = (pix[y * packed_xsize + px_x] >> 8) & 0xFF
                        for k in range(per):
                            x = px_x * per + k
                            if x >= real_xsize:
                                break
                            idx = (gbyte >> (k * ibits)) & mask
                            out[y * real_xsize + x] = (
                                palette[idx]
                                if idx < len(palette)
                                else 0x00000000
                            )
                pix = out
                xsize = real_xsize
    return pix, xsize


def _cdelta(t: int, c: int) -> int:
    # color transform delta: signed multiply (t as int8, c as int8) >> 5
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


# ---------------------------------------------------------------------------
# public decode
# ---------------------------------------------------------------------------


def decode_vp8l(payload: bytes):
    """RIFF/WEBP/VP8L payload -> HxWx3 uint8 RGB array, or None if the
    payload is not a lossless WebP."""
    import numpy as np

    if (
        payload is None
        or len(payload) < 20
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
        or payload[12:16] != b"VP8L"
    ):
        return None
    size = struct.unpack("<I", payload[16:20])[0]
    data = payload[20 : 20 + size]
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(data)
    br.pos = 8
    width = br.read(14) + 1
    height = br.read(14) + 1
    br.read_bit()  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    pix, transforms, coded_xsize = _decode_image(br, width, height, True)
    pix, _ = _apply_inverse_transforms(pix, transforms, coded_xsize, height)
    arr = np.array(pix, dtype=np.uint32).reshape(height, width)
    rgb = np.empty((height, width, 3), dtype=np.uint8)
    rgb[..., 0] = (arr >> 16) & 0xFF
    rgb[..., 1] = (arr >> 8) & 0xFF
    rgb[..., 2] = arr & 0xFF
    return rgb


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _write_code_lengths(bw: _BitWriter, lengths: list[int]) -> None:
    """Serialize prefix-code lengths through the code-length code
    (normal representation; no 16/17/18 repeats — lengths are written
    literally, the CLC itself is a real canonical Huffman)."""
    # frequency of each length symbol
    freq = [0] * 19
    for ln in lengths:
        freq[ln] += 1
    clc_lengths = _build_huffman_lengths(freq, 7)
    # ensure at least 2 nonzero CLC lengths (degenerate guard)
    if sum(1 for x in clc_lengths if x) == 1:
        only = clc_lengths.index(1)
        other = 0 if only != 0 else 1
        clc_lengths[other] = 1
    bw.write(0, 1)  # normal code
    # emit all 19 CLC lengths in the magic order
    bw.write(19 - 4, 4)
    for sym in _CLC_ORDER:
        bw.write(clc_lengths[sym], 3)
    bw.write(0, 1)  # no max_symbol shortcut
    codes = _canonical_codes(clc_lengths)
    for ln in lengths:
        code, nbits = codes[ln]
        _write_code_msb(bw, code, nbits)


def _write_code_msb(bw: _BitWriter, code: int, nbits: int) -> None:
    for i in range(nbits - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _build_huffman_lengths(freq: list[int], max_len: int) -> list[int]:
    """Package-merge-free Huffman: plain heap Huffman then length-limit
    by clamping + canonical repair (fine for our alphabets)."""
    import heapq

    items = [(f, i) for i, f in enumerate(freq) if f > 0]
    if not items:
        return [0] * len(freq)
    if len(items) == 1:
        out = [0] * len(freq)
        out[items[0][1]] = 1
        return out
    heap = [(f, [i]) for f, i in items]
    heapq.heapify(heap)
    depth = {i: 0 for _, i in items}
    while len(heap) > 1:
        f1, s1 = heapq.heappop(heap)
        f2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, s1 + s2))
    lengths = [0] * len(freq)
    for i, d in depth.items():
        lengths[i] = min(d, max_len)
    # repair Kraft sum after clamping
    while True:
        k = sum((1 << (max_len - ln)) for ln in lengths if ln)
        if k <= (1 << max_len):
            break
        # lengthen the longest-but-shortenable symbol
        cand = min(
            (i for i, ln in enumerate(lengths) if 0 < ln < max_len),
            key=lambda i: lengths[i],
            default=None,
        )
        if cand is None:
            raise ValueError("cannot length-limit huffman code")
        lengths[cand] += 1
    return lengths


def _emit(bw, codes, sym):
    code, nbits = codes[sym]
    _write_code_msb(bw, code, nbits)


def _encode_spatial(
    bw: _BitWriter,
    pixels: list[int],
    cache_bits: int,
    use_lz77: bool,
    level0: bool,
) -> None:
    """Emit one spatially-coded ARGB image (cache bit, meta bit for
    level 0, the five prefix codes, body)."""
    n = len(pixels)
    cache_size = (1 << cache_bits) if cache_bits else 0

    # ---- tokenize: literals / cache hits / LZ77 runs ----------------
    tokens = []  # ('lit', p) | ('cache', idx) | ('copy', length, dist)
    cache = [None] * cache_size
    i = 0
    while i < n:
        if use_lz77 and i > 0:
            run = 0
            while i + run < n and pixels[i + run] == pixels[i - 1] and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("copy", run, 1))
                for k in range(run):
                    p = pixels[i + k]
                    if cache_size:
                        cache[
                            (0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)
                        ] = p
                i += run
                continue
        p = pixels[i]
        if cache_size:
            hidx = (0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[hidx] == p:
                tokens.append(("cache", hidx))
                i += 1
                continue
            cache[hidx] = p
        tokens.append(("lit", p))
        i += 1

    # ---- histograms -------------------------------------------------
    green_f = [0] * (256 + 24 + cache_size)
    red_f = [0] * 256
    blue_f = [0] * 256
    alpha_f = [0] * 256
    dist_f = [0] * 40
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            green_f[(p >> 8) & 0xFF] += 1
            red_f[(p >> 16) & 0xFF] += 1
            blue_f[p & 0xFF] += 1
            alpha_f[(p >> 24) & 0xFF] += 1
        elif t[0] == "cache":
            green_f[256 + 24 + t[1]] += 1
        else:
            lcode, _, _ = _lz77_encode_value(t[1])
            green_f[256 + lcode] += 1
            dcode, _, _ = _lz77_encode_value(t[2] + 120)
            dist_f[dcode] += 1

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta prefix

    def emit_code(freqs):
        nz = [i for i, f in enumerate(freqs) if f > 0]
        if len(nz) <= 2 and all(s < 256 for s in nz):
            # simple representation
            bw.write(1, 1)
            if not nz:
                nz = [0]
            bw.write(len(nz) - 1, 1)
            first = nz[0]
            if first <= 1 and len(nz) == 1:
                bw.write(0, 1)
                bw.write(first, 1)
            else:
                bw.write(1, 1)
                bw.write(first, 8)
            if len(nz) == 2:
                bw.write(nz[1], 8)
            if len(nz) == 1:
                return {nz[0]: (0, 0)}
            return {nz[0]: (0, 1), nz[1]: (1, 1)}
        lengths = _build_huffman_lengths(freqs, 10)
        _write_code_lengths(bw, lengths)
        return _canonical_codes(lengths)

    green_c = emit_code(green_f)
    red_c = emit_code(red_f)
    blue_c = emit_code(blue_f)
    alpha_c = emit_code(alpha_f)
    dist_c = emit_code(dist_f)

    # ---- body -------------------------------------------------------
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            _emit(bw, green_c, (p >> 8) & 0xFF)
            _emit(bw, red_c, (p >> 16) & 0xFF)
            _emit(bw, blue_c, p & 0xFF)
            _emit(bw, alpha_c, (p >> 24) & 0xFF)
        elif t[0] == "cache":
            _emit(bw, green_c, 256 + 24 + t[1])
        else:
            _, length, dist = t
            lcode, lextra, lbits = _lz77_encode_value(length)
            _emit(bw, green_c, 256 + lcode)
            if lbits:
                bw.write(lextra, lbits)
            dcode, dextra, dbits = _lz77_encode_value(dist + 120)
            _emit(bw, dist_c, dcode)
            if dbits:
                bw.write(dextra, dbits)


def _argb_sub(a: int, b: int) -> int:
    return (
        (((a >> 24) - (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def _wrap_riff(bw: _BitWriter) -> bytes:
    body = bw.bytes()
    if len(body) % 2:
        body += b"\x00"
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_vp8l(
    rgb,
    use_cache_bits: int = 6,
    use_subtract_green: bool = True,
    use_lz77: bool = True,
    use_palette: bool | None = None,
) -> bytes:
    """HxWx3 uint8 -> RIFF/WEBP/VP8L bytes (lossless). Real entropy
    coding: per-channel canonical Huffman via the full code-length
    serialization, greedy horizontal-run LZ77 (plain distance codes),
    optional color cache, subtract-green transform, and a COLOR_INDEXING
    (palette) path — with the sub-byte width-bundling repack — chosen
    automatically for <= 16 distinct colors."""
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[0], rgb.shape[1]
    argb0 = (
        (np.uint32(0xFF) << 24)
        | (rgb[..., 0].astype(np.uint32) << 16)
        | (rgb[..., 1].astype(np.uint32) << 8)
        | rgb[..., 2].astype(np.uint32)
    ).reshape(-1)
    distinct = list(dict.fromkeys(int(p) for p in argb0))
    if use_palette is None:
        use_palette = len(distinct) <= 16

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha hint
    bw.write(0, 3)  # version

    if use_palette and len(distinct) <= 256:
        n_colors = len(distinct)
        index_of = {p: i for i, p in enumerate(distinct)}
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(n_colors - 1, 8)
        # palette sub-image: delta-coded left-to-right
        deltas, prev = [], 0
        for p in distinct:
            deltas.append(_argb_sub(p, prev))
            prev = p
        _encode_spatial(bw, deltas, 0, False, False)
        bw.write(0, 1)  # no more transforms
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits == 0:
            packed = [
                0xFF000000 | (index_of[int(p)] << 8) for p in argb0
            ]
        else:
            per = 1 << width_bits
            ibits = 8 >> width_bits
            packed_xsize = _subsample(w, width_bits)
            packed = []
            for y in range(h):
                for bx in range(packed_xsize):
                    byte = 0
                    for k in range(per):
                        x = bx * per + k
                        if x >= w:
                            break
                        byte |= index_of[int(argb0[y * w + x])] << (
                            k * ibits
                        )
                    packed.append(0xFF000000 | (byte << 8))
        _encode_spatial(bw, packed, 0, use_lz77, True)
        return _wrap_riff(bw)

    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    if use_subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    argb = (
        (np.uint32(0xFF) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    ).reshape(-1)
    _encode_spatial(
        bw, [int(p) for p in argb], use_cache_bits, use_lz77, True
    )
    return _wrap_riff(bw)


def webp_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic lossless-WebP fixture with the shared pixel formula
    (px[i] = (id*2654435761 + i*40503) mod 256) — same formula as
    ppm/png/gif fixtures, so the DuckDB arithmetic oracle applies."""
    import numpy as np

    idx = np.arange(width * height * 3, dtype=np.uint64)
    px = (
        (np.uint64(media_id) * np.uint64(2654435761) + idx * np.uint64(40503))
        & np.uint64(0xFF)
    ).astype(np.uint8)
    return encode_vp8l(px.reshape(height, width, 3))
