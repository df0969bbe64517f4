"""Raw-slice JSON walking for the ClickHouse JSON*Raw family.

ClickHouse's JSONExtractArrayRaw / JSONExtractKeysAndValuesRaw return
the RAW JSON text of each element/value (strings keep their quotes,
objects their braces) — there is no Spark builtin for that (from_json
coerces, get_json_object addresses one path at a time), so the split
is a small string/escape-aware scanner run inside an Arrow-batched
pandas UDF (the strdist/xxh house class: per-value work with no
builtin equivalent).

Divergence note (documented, pinned in tests): when these operate on
a SUB-document (a path argument), the sub-document is fetched with
``get_json_object``, which re-renders nested structures compactly —
so raw slices of whitespace-formatted inputs come back minified. CH
returns the original bytes. Whitespace-free JSON (the overwhelming
wire form) is byte-identical both ways.
"""

from __future__ import annotations

import json

_WS = " \t\n\r"


def _skip_ws(s: str, i: int) -> int:
    n = len(s)
    while i < n and s[i] in _WS:
        i += 1
    return i


def _scan_string(s: str, i: int) -> int:
    """i points at the opening quote; returns index AFTER the close."""
    n = len(s)
    i += 1
    while i < n:
        c = s[i]
        if c == "\\":
            i += 2
            continue
        if c == '"':
            return i + 1
        i += 1
    raise ValueError("unterminated string")


def _scan_value(s: str, i: int) -> int:
    """Returns the end index (exclusive) of the JSON value at i."""
    n = len(s)
    c = s[i]
    if c == '"':
        return _scan_string(s, i)
    if c in "[{":
        depth = 0
        while i < n:
            ch = s[i]
            if ch == '"':
                i = _scan_string(s, i)
                continue
            if ch in "[{":
                depth += 1
            elif ch in "]}":
                depth -= 1
                if depth == 0:
                    return i + 1
            i += 1
        raise ValueError("unterminated composite")
    # number / true / false / null
    j = i
    while j < n and s[j] not in ",]}" + _WS:
        j += 1
    if j == i:
        raise ValueError(f"empty value at {i}")
    return j


def split_json_array_raw(s: str | None) -> list[str]:
    """Raw element slices of a JSON array; [] when the input is not a
    JSON array (ClickHouse's type-default rule)."""
    if s is None:
        return []
    try:
        i = _skip_ws(s, 0)
        if i >= len(s) or s[i] != "[":
            return []
        i = _skip_ws(s, i + 1)
        out: list[str] = []
        if i < len(s) and s[i] == "]":
            if _skip_ws(s, i + 1) != len(s):
                return []
            return out
        while True:
            end = _scan_value(s, i)
            out.append(s[i:end])
            i = _skip_ws(s, end)
            if i >= len(s):
                return []
            if s[i] == "]":
                if _skip_ws(s, i + 1) != len(s):
                    return []
                return out
            if s[i] != ",":
                return []
            i = _skip_ws(s, i + 1)
    except ValueError:
        return []


def object_keys_values_raw(s: str | None) -> list[tuple[str, str]]:
    """(key, raw value) pairs of a JSON object in document order; []
    when the input is not a JSON object."""
    if s is None:
        return []
    try:
        i = _skip_ws(s, 0)
        if i >= len(s) or s[i] != "{":
            return []
        i = _skip_ws(s, i + 1)
        out: list[tuple[str, str]] = []
        if i < len(s) and s[i] == "}":
            if _skip_ws(s, i + 1) != len(s):
                return []
            return out
        while True:
            if i >= len(s) or s[i] != '"':
                return []
            kend = _scan_string(s, i)
            key = json.loads(s[i:kend])
            i = _skip_ws(s, kend)
            if i >= len(s) or s[i] != ":":
                return []
            i = _skip_ws(s, i + 1)
            vend = _scan_value(s, i)
            out.append((key, s[i:vend]))
            i = _skip_ws(s, vend)
            if i >= len(s):
                return []
            if s[i] == "}":
                if _skip_ws(s, i + 1) != len(s):
                    return []
                return out
            if s[i] != ",":
                return []
            i = _skip_ws(s, i + 1)
    except ValueError:
        return []


def raw_at_key(s: str | None, key: str | None) -> str | None:
    """Raw value slice at a top-level object key (first occurrence in
    document order); None when the input is not a JSON object or the
    key is absent — the dialect applies ClickHouse's ''-default.
    Unlike a parsed extraction, the slice keeps quotes and escape
    sequences exactly as written (CH JSONExtractRaw's contract;
    get_json_object would unquote string scalars)."""
    if s is None or key is None:
        return None
    for k, r in object_keys_values_raw(s):
        if k == key:
            return r
    return None
