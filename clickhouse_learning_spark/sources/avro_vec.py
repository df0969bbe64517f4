"""Vectorized Avro binary codec for FLAT record schemas (optimization
r10, guide §4.2: hand whole batches to numpy instead of walking bytes
per value in Python).

Scope: a top-level record whose every field is a primitive —
``long/int/double/float/boolean/string/bytes``, the ``date`` /
``timestamp-micros`` logicals, or a ``["null", <primitive>]`` union.
Anything else (arrays, maps, nested records, multi-branch unions) is
rejected by :func:`field_kinds` and stays on the per-value codec in
``sources/avro.py``, which remains the semantics source of truth.

Encode only: one numpy pass per column builds (concatenated bytes,
per-value lengths); a ragged scatter (repeat + cumsum index trick)
interleaves the columns row-major into one buffer with exact per-row
offsets, so the container writer can cut spec-valid blocks at any row
boundary. ~3.5x the scalar encoder at 8k-row block granularity,
byte-identical output (parity-pinned in tests/test_avro.py).

A vectorized DECODE lane was measured and rejected: precomputing
varint length/value tables for every byte offset costs O(bytes x
max-varint-width) passes, which lands at 0.6-1.0x the scalar
decoder's closure walk across block sizes — the read paths keep the
scalar codec.
"""

from __future__ import annotations

import numpy as np

_PRIMS = {"long", "int", "double", "float", "boolean", "string", "bytes"}

# field kinds: varint (long/int), date (days varint), ts (micros
# varint), double, float, boolean, str, bin


def _node_kind(sch):
    nullable = False
    if isinstance(sch, list):
        if len(sch) != 2 or sch[0] != "null":
            return None
        nullable = True
        sch = sch[1]
    if isinstance(sch, dict):
        t, lt = sch.get("type"), sch.get("logicalType")
        if t == "int" and lt == "date":
            return ("date", nullable)
        if t == "long" and lt == "timestamp-micros":
            return ("ts", nullable)
        if isinstance(t, str) and t in _PRIMS and lt is None:
            sch = t
        else:
            return None
    if sch in ("long", "int"):
        return ("varint", nullable)
    if sch in ("double", "float", "boolean"):
        return (sch, nullable)
    if sch == "string":
        return ("str", nullable)
    if sch == "bytes":
        return ("bin", nullable)
    return None


def field_kinds(sch: dict):
    """Per-field (kind, nullable) list for a flat record schema, or
    None when any field is out of the vectorized lane's scope."""
    if not (isinstance(sch, dict) and sch.get("type") == "record"):
        return None
    kinds = []
    for f in sch["fields"]:
        k = _node_kind(f["type"])
        if k is None:
            return None
        kinds.append(k)
    return kinds


# --------------------------------------------------------------- encode
def _zigzag_u(vals: np.ndarray) -> np.ndarray:
    v = vals.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def _varint_bytes(u: np.ndarray):
    """uint64 array → (concatenated little-endian base-128 varints,
    per-value byte lengths) — byte-identical to avro.zigzag_encode's
    output for each value."""
    n = len(u)
    if n == 0:
        return b"", np.zeros(0, np.int64)
    nb = np.ones(n, np.int64)
    for k in range(1, 10):
        nb += (u >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    mat = np.empty((n, 10), np.uint8)
    for k in range(10):
        mat[:, k] = ((u >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(
            np.uint8
        )
    cols = np.arange(10)[None, :]
    mat |= ((cols < (nb[:, None] - 1)) * 0x80).astype(np.uint8)
    return mat[cols < nb[:, None]].tobytes(), nb


def _ragged_concat(srcs: list[bytes], lens: list[np.ndarray]):
    """Interleave per-column encodings row-major: srcs[c] holds column
    c's values back to back, lens[c] its per-row byte lengths. Returns
    (payload bytes, int64 per-row END offsets)."""
    ncols = len(srcs)
    nrows = len(lens[0]) if ncols else 0
    if nrows == 0:
        return b"", np.zeros(0, np.int64)
    L = np.stack(lens, axis=1)  # (rows, cols)
    piece_len = L.reshape(-1)
    total = int(piece_len.sum())
    src_local = np.zeros((nrows, ncols), np.int64)
    if nrows > 1:
        src_local[1:, :] = np.cumsum(L[:-1, :], axis=0)
    bases = np.zeros(ncols, np.int64)
    if ncols > 1:
        bases[1:] = np.cumsum([len(s) for s in srcs[:-1]])
    piece_src = (src_local + bases[None, :]).reshape(-1)
    src_all = np.frombuffer(b"".join(srcs), np.uint8)
    nz = piece_len > 0
    starts = piece_src[nz]
    plens = piece_len[nz]
    dst_start = np.zeros(len(plens), np.int64)
    if len(plens) > 1:
        dst_start[1:] = np.cumsum(plens[:-1])
    ramp = np.arange(total, dtype=np.int64) - np.repeat(dst_start, plens)
    out = src_all[np.repeat(starts, plens) + ramp]
    row_end = np.cumsum(L.sum(axis=1))
    return out.tobytes(), row_end


def _int_vals(arr, kind):
    """Arrow integer-lane column → int64 numpy values with nulls as 0
    (the union prefix suppresses null value bytes later)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    a = arr
    if kind == "ts":
        a = a.cast(pa.int64())
    elif kind == "date":
        a = a.cast(pa.int32())
    if a.null_count:
        a = pc.fill_null(a, 0)
    return a.to_numpy(zero_copy_only=False).astype(np.int64)


def encode_batch(kinds, arrays):
    """Encode one Arrow record batch's columns row-major; returns
    (payload bytes, per-row END offsets)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    srcs: list[bytes] = []
    lens: list[np.ndarray] = []
    nrows = len(arrays[0]) if arrays else 0
    for (kind, nullable), arr in zip(kinds, arrays):
        nulls = None
        if arr.null_count:
            nulls = pc.is_null(arr).to_numpy(zero_copy_only=False)
        if kind in ("varint", "ts", "date"):
            body_b, blen = _varint_bytes(_zigzag_u(_int_vals(arr, kind)))
            body = np.frombuffer(body_b, np.uint8)
        elif kind in ("double", "float"):
            a = pc.fill_null(arr, 0.0) if arr.null_count else arr
            vals = a.to_numpy(zero_copy_only=False)
            f, w = ("<f8", 8) if kind == "double" else ("<f4", 4)
            body = np.frombuffer(vals.astype(f).tobytes(), np.uint8)
            blen = np.full(nrows, w, np.int64)
        elif kind == "boolean":
            a = pc.fill_null(arr, False) if arr.null_count else arr
            body = a.to_numpy(zero_copy_only=False).astype(np.uint8)
            blen = np.ones(nrows, np.int64)
        else:  # str / bin: varint(len) + payload per value
            if arr.null_count:
                enc = [
                    b"" if v is None
                    else (v.encode("utf-8") if isinstance(v, str)
                          else bytes(v))
                    for v in arr.to_pylist()
                ]
                slens = np.asarray([len(b) for b in enc], np.int64)
                data = b"".join(enc)
            elif len(arr) == 0:
                slens = np.zeros(0, np.int64)
                data = b""
            else:
                wide = pa.types.is_large_string(
                    arr.type
                ) or pa.types.is_large_binary(arr.type)
                buf_off = np.frombuffer(
                    arr.buffers()[1], np.int64 if wide else np.int32
                )[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
                data = arr.buffers()[2].to_pybytes()[
                    buf_off[0]: buf_off[-1]
                ]
                slens = np.diff(buf_off)
            pre, plen = _varint_bytes(_zigzag_u(slens))
            body_b, _ = _ragged_concat([pre, data], [plen, slens])
            body = np.frombuffer(body_b, np.uint8)
            blen = plen + slens
        if nullable:
            if nulls is None:
                nulls = np.zeros(nrows, bool)
            # union branch prefix: 0x02 before each non-null value, a
            # lone 0x00 for null (null value bytes suppressed)
            body = body[~np.repeat(nulls, blen)]
            blen = np.where(nulls, 0, blen)
            pref = np.where(nulls, 0x00, 0x02).astype(np.uint8)
            body_b, _ = _ragged_concat(
                [pref.tobytes(), body.tobytes()],
                [np.ones(nrows, np.int64), blen],
            )
            body = np.frombuffer(body_b, np.uint8)
            blen = blen + 1
        srcs.append(body.tobytes())
        lens.append(blen)
    return _ragged_concat(srcs, lens)
