"""TIFF 6.0 codec — from-scratch encoder + decoder for baseline RGB
(TIFF 6.0 specification, Adobe 1992 — public): II and MM byte orders,
strip layout, and three compressions:

- 1 (none),
- 32773 (PackBits — spec §9's byte-oriented RLE, pinned in tests
  against the specification's own worked example),
- 5 (LZW — spec §13: MSB-first code packing, 9→12-bit widths with the
  spec's EARLY-CHANGE rule: the width bumps one code before the table
  actually overflows — the classic TIFF-LZW interop trap), optionally
  with Predictor 2 (tag 317, per-row horizontal differencing).

Decode is the exact inverse walk (IFD parse in either byte order,
strip concatenation, per-compression inflate, predictor undo). The
test suite cross-checks the LZW decoder against an independent
spec-pseudocode decoder and pins the PackBits example, so the
encode/decode pair cannot hide a matched bug.

Extends the multimodal family (PPM/PNG/GIF/WebP-VP8L/JPEG-complete)
with the remaining ubiquitous container of scanned/scientific corpora;
graded as ``multimodal_tiff_pixel_sums`` against the fixture pixel
formula oracle (same pattern as the GIF/PNG queries).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- PackBits


def packbits_encode(data: bytes) -> bytes:
    """TIFF §9 PackBits: runs of >=2 as (257-n, byte), literals as
    (n-1, bytes). Never breaks a literal to start a 2-run that abuts
    another literal (the spec's packing advice, not required for
    validity)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run & 0xFF)
            out.append(data[i])
            i = j
            continue
        # literal: extend until a run of >= 3 starts (2-runs fold in)
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out.extend(data[i:j])
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c == 128:  # noop
            continue
        if c < 128:
            out.extend(data[i:i + c + 1])
            i += c + 1
        else:
            out.extend(bytes([data[i]]) * (257 - c))
            i += 1
    if len(out) != expected:
        raise ValueError("PackBits strip decoded to the wrong length")
    return bytes(out)


# ---------------------------------------------------------------- LZW

_CLEAR, _EOI = 256, 257


class _BitWriterMSB:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(self.buf)


def lzw_encode(data: bytes) -> bytes:
    """TIFF §13 LZW with the EARLY-CHANGE width rule: the code width
    increases when the NEXT code would not fit — i.e. at table sizes
    511/1023/2047 (one earlier than the table's true capacity), and
    the table resets via ClearCode at 4094."""
    w = _BitWriterMSB()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    w.write(_CLEAR, width)
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        w.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1  # early change: bump while one slot still free
        cur = bytes([byte])
        if next_code >= 4094:
            w.write(table[cur], width)
            w.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            cur = b""
    if cur:
        w.write(table[cur], width)
    w.write(_EOI, width)
    return w.done()


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("LZW strip ended mid-code")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        prev = entry
        # early change, decoder side: the decoder's table trails the
        # encoder's by ONE entry (it learns each string a code later),
        # so it widens at (1<<width)-2 — at 510/1022/2046, the de-facto
        # libtiff rule — to stay in sync with the encoder's bump at
        # next_code == (1<<width)-1
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expected:
        raise ValueError("LZW strip decoded to the wrong length")
    return bytes(out)


# ---------------------------------------------------------------- TIFF

_COMP = {"none": 1, "lzw": 5, "packbits": 32773}


def _predict2(row: bytes, spp: int) -> bytes:
    out = bytearray(row)
    for i in range(len(out) - 1, spp - 1, -1):
        out[i] = (out[i] - out[i - spp]) & 0xFF
    return bytes(out)


def _unpredict2(row: bytearray, spp: int) -> None:
    for i in range(spp, len(row)):
        row[i] = (row[i] + row[i - spp]) & 0xFF


def encode_tiff(
    px,
    compression: str = "none",
    rows_per_strip: int | None = None,
    byte_order: str = "<",
    predictor: int = 1,
) -> bytes:
    """Valid baseline-RGB TIFF from an HxWx3 uint8 array. Multiple
    strips by default (exercises the strip walk); ``byte_order`` is
    '<' (II) or '>' (MM); ``predictor=2`` (LZW only) applies
    horizontal differencing per row."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w, spp = px.shape
    assert spp == 3
    if predictor == 2 and compression != "lzw":
        raise ValueError("Predictor 2 is defined here for LZW strips")
    bo = byte_order
    rps = rows_per_strip or max(h // 3, 1)
    strips = []
    for y0 in range(0, h, rps):
        raw = px[y0:y0 + rps].tobytes()
        if predictor == 2:
            rows = [
                _predict2(raw[r * w * 3:(r + 1) * w * 3], 3)
                for r in range(len(raw) // (w * 3))
            ]
            raw = b"".join(rows)
        if compression == "packbits":
            # PackBits compresses per ROW per spec §9's recommendation
            rows = [
                packbits_encode(raw[r * w * 3:(r + 1) * w * 3])
                for r in range(len(raw) // (w * 3))
            ]
            strips.append(b"".join(rows))
        elif compression == "lzw":
            strips.append(lzw_encode(raw))
        else:
            strips.append(raw)

    # layout: header | strip data | aux arrays | IFD
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    out += b"\x00\x00\x00\x00"  # IFD offset patched below
    strip_offs = []
    for s in strips:
        strip_offs.append(len(out))
        out += s
    if len(out) % 2:
        out += b"\x00"

    aux: list[tuple[int, bytes]] = []

    def _aux(data: bytes) -> int:
        off = len(out) + sum(len(d) for _, d in aux)
        aux.append((off, data))
        return off

    n_strips = len(strips)
    bps_off = _aux(struct.pack(bo + "HHH", 8, 8, 8))
    if n_strips > 1:
        so_off = _aux(struct.pack(bo + f"{n_strips}I", *strip_offs))
        sc_off = _aux(
            struct.pack(bo + f"{n_strips}I", *[len(s) for s in strips])
        )
    entries = [
        (256, 4, 1, w),  # ImageWidth
        (257, 4, 1, h),  # ImageLength
        (258, 3, 3, bps_off),  # BitsPerSample -> offset
        (259, 3, 1, _COMP[compression]),
        (262, 3, 1, 2),  # Photometric = RGB
        (273, 4, n_strips, strip_offs[0] if n_strips == 1 else so_off),
        (277, 3, 1, 3),  # SamplesPerPixel
        (278, 4, 1, rps),  # RowsPerStrip
        (279, 4, n_strips,
         len(strips[0]) if n_strips == 1 else sc_off),
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))
    entries.sort()
    for _, data in aux:
        out += data
    if len(out) % 2:
        out += b"\x00"
    ifd_off = len(out)
    struct.pack_into(bo + "I", out, 4, ifd_off)
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3 and cnt == 1:
            out += struct.pack(bo + "HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack(bo + "HHII", tag, typ, cnt, val)
    out += struct.pack(bo + "I", 0)  # no next IFD
    return bytes(out)


def decode_tiff(payload: bytes):
    """HxWx3 uint8 array for a baseline-RGB TIFF (either byte order,
    compression 1/5/32773, predictor 1/2), else None."""
    import numpy as np

    try:
        if payload is None or len(payload) < 8:
            return None
        if payload[:2] == b"II":
            bo = "<"
        elif payload[:2] == b"MM":
            bo = ">"
        else:
            return None
        if struct.unpack_from(bo + "H", payload, 2)[0] != 42:
            return None
        (ifd,) = struct.unpack_from(bo + "I", payload, 4)
        (cnt,) = struct.unpack_from(bo + "H", payload, ifd)
        tags: dict[int, tuple[int, int, int]] = {}
        # value-field file offset per tag, recorded while walking the
        # IFD — arr() must not re-derive it from sorted key order,
        # since TIFF 6.0 only RECOMMENDS ascending tag order and a
        # foreign writer may violate it (ADVICE r6)
        value_off: dict[int, int] = {}
        for i in range(cnt):
            tag, typ, n = struct.unpack_from(
                bo + "HHI", payload, ifd + 2 + 12 * i
            )
            if typ == 3 and n == 1:
                (val,) = struct.unpack_from(
                    bo + "H", payload, ifd + 2 + 12 * i + 8
                )
            else:
                (val,) = struct.unpack_from(
                    bo + "I", payload, ifd + 2 + 12 * i + 8
                )
            tags[tag] = (typ, n, val)
            value_off[tag] = ifd + 2 + 12 * i + 8

        def arr(tag: int) -> list[int]:
            typ, n, val = tags[tag]
            size = 2 if typ == 3 else 4
            f = "H" if typ == 3 else "I"
            if n * size <= 4:
                if n == 1:
                    return [val]
                # n SHORTs packed into the value field at the entry's
                # recorded offset
                return list(struct.unpack_from(
                    bo + f"{n}{f}", payload, value_off[tag]))
            return list(struct.unpack_from(bo + f"{n}{f}", payload, val))

        w = tags[256][2]
        h = tags[257][2]
        comp = tags.get(259, (3, 1, 1))[2]
        if tags.get(277, (3, 1, 1))[2] != 3 or tags.get(262, (3, 1, 2))[2] != 2:
            return None
        if 258 in tags and arr(258) != [8, 8, 8]:
            return None
        rps = tags.get(278, (4, 1, h))[2]
        offs = arr(273)
        lens = arr(279)
        pred = tags.get(317, (3, 1, 1))[2]
        raw = bytearray()
        for si, (o, ln) in enumerate(zip(offs, lens)):
            rows = min(rps, h - si * rps)
            expected = rows * w * 3
            chunk = payload[o:o + ln]
            if comp == 1:
                if len(chunk) < expected:
                    return None
                raw += chunk[:expected]
            elif comp == 32773:
                raw += packbits_decode(chunk, expected)
            elif comp == 5:
                raw += lzw_decode(chunk, expected)
            else:
                return None
        if pred == 2:
            for r in range(h):
                row = bytearray(raw[r * w * 3:(r + 1) * w * 3])
                _unpredict2(row, 3)
                raw[r * w * 3:(r + 1) * w * 3] = row
        if len(raw) != w * h * 3:
            return None
        return np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, 3)
    except Exception:
        return None


def tiff_image(media_id: int, width: int, height: int) -> bytes:
    """Fixture: the SAME deterministic pixel formula as ppm_image,
    rotating compression (none / PackBits / LZW / LZW+Predictor2) and
    byte order per id so the graded query walks every decode path."""
    import numpy as np

    idx = np.arange(width * height * 3, dtype=np.uint64)
    px = (
        (np.uint64(media_id) * np.uint64(2654435761)
         + idx * np.uint64(40503)) & np.uint64(0xFF)
    ).astype(np.uint8).reshape(height, width, 3)
    comp = ("none", "packbits", "lzw", "lzw")[media_id % 4]
    pred = 2 if media_id % 4 == 3 else 1
    bo = "<" if media_id % 2 == 0 else ">"
    return encode_tiff(px, compression=comp, byte_order=bo, predictor=pred)
