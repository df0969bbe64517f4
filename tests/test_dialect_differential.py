"""Differential property-fuzz of the dialect's pure-scalar mappings vs
DuckDB (round-5, VERDICT r4 task 6).

The round-4 semantics grid (test_dialect_semantics.py) is point-wise;
this harness sweeps SEEDED RANDOM inputs through >100 mappings: each
case pairs a ClickHouse expression template (evaluated in Spark through
``translate``) with a hand-written DuckDB expression encoding the
ClickHouse-documented semantics. Any divergence — silent mistranslation,
edge-of-domain crash, boundary rule — fails with the exact inputs.

Families swept here: integer/bit math, modular casts, OrZero/OrNull
parsing, date/time parts + arithmetic + relative nums, string
search/split/trim/pad, array algebra + higher-order forms, base64/hex,
null combinators, IPv4. Families already hash-graded against full
DuckDB oracle queries (URL: ch_url_dialect; vectors: ch_vector_dialect;
bitmap algebra: ch_bitmap_algebra_dialect; hashes: ch_hash_dialect;
quantiles: ch_quantiles_dialect; rounding/banker's: the pinned grid)
are deliberately not duplicated.

Inputs are seeded per-case (reproducible); rendering keeps a shared
literal syntax for both engines (strings avoid quote/backslash — the
escaping rules themselves are pinned in the grid tests).
"""

from __future__ import annotations

import datetime as dt
import math
import random
import zlib

import pytest

from clickhouse_learning_spark.functions.dialect import translate

K = 6  # samples per case


# ---------------------------------------------------------------- domains
def gi(r):  # small signed int
    return r.randint(-50, 50)


def gnz(r):  # small nonzero
    v = r.randint(1, 50)
    return v if r.random() < 0.5 else -v


def gpos(r):
    return r.randint(0, 10**6)


def gbig(r):
    return r.randint(-(2**33), 2**33)


def gsh(r):  # shift amount
    return r.randint(0, 20)


def gf(r):  # float with few decimals, exact-ish
    return r.randint(-20000, 20000) / 100.0


_ALPHA = "abcABC xyz012_-.,"
_UALPHA = _ALPHA + "éß日"


def gs(r):
    return "".join(r.choice(_ALPHA) for _ in range(r.randint(0, 10)))


def gsu(r):
    return "".join(r.choice(_UALPHA) for _ in range(r.randint(0, 10)))


def gw(r):  # word, non-empty, no spaces
    return "".join(r.choice("abcxyz012") for _ in range(r.randint(1, 8)))


def g_uhay_needle(r):
    """(haystack, needle) over the UNICODE alphabet — multi-byte
    chars ahead of the match shift CH's byte offsets off the char
    ones; needle present ~half the time, empty-needle edge kept."""
    h = "".join(r.choice(_UALPHA) for _ in range(r.randint(0, 12)))
    roll = r.random()
    if roll < 0.15:
        n = ""
    elif roll < 0.6 and len(h) >= 2:
        i = r.randint(0, len(h) - 1)
        n = h[i:r.randint(i + 1, len(h))]
    else:
        n = "".join(r.choice(_UALPHA) for _ in range(r.randint(1, 3)))
    return (h, n)


def gd(r):
    return dt.date(1970, 1, 1) + dt.timedelta(days=r.randint(0, 49000))


def gt(r):
    return dt.datetime(1970, 1, 1) + dt.timedelta(
        days=r.randint(0, 49000), seconds=r.randint(0, 86399)
    )


def gia(r):  # int list, may be empty
    return [r.randint(-9, 9) for _ in range(r.randint(0, 6))]


def gia1(r):  # non-empty int list
    return [r.randint(-9, 9) for _ in range(r.randint(1, 6))]


def gsa(r):  # list of words
    return [gw(r) for _ in range(r.randint(0, 4))]


def g_hay_needle(r):
    """(haystack, needle) — needle present ~half the time; includes the
    empty needle edge."""
    h = gs(r)
    roll = r.random()
    if roll < 0.15:
        n = ""
    elif roll < 0.6 and len(h) >= 2:
        i = r.randint(0, len(h) - 1)
        n = h[i : i + r.randint(1, 3)]
    else:
        n = gw(r)
    return (h, n)


def g_hay_word(r):
    """(haystack, non-empty needle)."""
    h, n = g_hay_needle(r)
    return (h, n or gw(r))


def g_replace3(r):
    h, n = g_hay_word(r)
    return (h, n, gw(r) if r.random() < 0.8 else "")


def g_sep_str(r):
    """(sep_char, string-with-separators) incl. trailing/leading/empty."""
    sep = r.choice(",;|.x")
    parts = [gw(r) if r.random() < 0.8 else "" for _ in range(r.randint(0, 4))]
    return (sep, sep.join(parts))


def g_sep_meta(r):
    """(multichar-or-metachar separator, string containing it) for the
    splitByString literal-separator guard."""
    sep = r.choice([".", "|", "[", "(", "*", "?", "..", ".|", "ab", ", "])
    parts = [gw(r) if r.random() < 0.75 else "" for _ in range(r.randint(0, 4))]
    return (sep, sep.join(parts))


def g_ip(r):
    if r.random() < 0.7:
        return ".".join(str(r.randint(0, 255)) for _ in range(4))
    return r.choice(["", "1.2.3", "a.b.c.d", "256.1.2.3.4", "12.34"])


def g_json(r):
    return ('{"k": "' + gw(r) + '", "n": ' + str(r.randint(-99, 99)) + "}",)


def _g_json_value(r, depth):
    """Whitespace-free JSON value text (raw slices are byte-compared,
    so the generator avoids string escapes — those are unit-tested in
    functions/jsonraw.py's own laws)."""
    if depth < 2 and r.random() < 0.35:
        if r.random() < 0.5:
            return "[" + ",".join(
                _g_json_value(r, depth + 1)
                for _ in range(r.randint(0, 3))) + "]"
        return "{" + ",".join(
            f'"n{i}":' + _g_json_value(r, depth + 1)
            for i in range(r.randint(0, 3))) + "}"
    c = r.random()
    if c < 0.3:
        return str(r.randint(-99, 99))
    if c < 0.6:
        return '"' + "".join(
            r.choice("abwxyz09_ -") for _ in range(r.randint(0, 8))
        ) + '"'
    if c < 0.7:
        return "null"
    if c < 0.8:
        return r.choice(["true", "false"])
    return f"{r.randint(-9, 9)}.{r.randint(0, 99)}"


def g_json_arr(r):
    return ("[" + ",".join(
        _g_json_value(r, 0) for _ in range(r.randint(0, 5))) + "]",)


def g_json_obj(r):
    return ("{" + ",".join(
        f'"k{i}":' + _g_json_value(r, 0)
        for i in range(r.randint(0, 4))) + "}",)


# ---------------------------------------------------------------- rendering
def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def render(v) -> str:
    """Shared literal syntax valid in BOTH Spark SQL and DuckDB."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return f"({v})" if v < 0 else str(v)
    if isinstance(v, float):
        return f"(CAST({v!r} AS DOUBLE))"
    if isinstance(v, str):
        return _q(v)
    if isinstance(v, dt.datetime):
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
    if isinstance(v, dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, list):
        if all(isinstance(x, int) for x in v) and v:
            body = ", ".join(render(x) for x in v)
        elif v:
            body = ", ".join(render(x) for x in v)
        else:
            return "__EMPTY__"  # handled per-engine (typed empty array)
        return f"__ARR__({body})"
    raise TypeError(type(v))


def to_engine(txt: str, spark_side: bool, elem: str) -> str:
    if spark_side:
        txt = txt.replace("__EMPTY__", f"CAST(array() AS ARRAY<{elem}>)")
        txt = txt.replace("__ARR__", "array")
    else:
        de = {"BIGINT": "BIGINT[]", "STRING": "VARCHAR[]"}[elem]
        txt = txt.replace("__EMPTY__", f"CAST([] AS {de})")
        txt = txt.replace("__ARR__(", "list_value(")
    return txt


# ---------------------------------------------------------------- cases
class C:
    def __init__(self, name, ch, duck, gens, elem="BIGINT"):
        self.name, self.ch, self.duck, self.elem = name, ch, duck, elem
        self.gens = gens if isinstance(gens, (list, tuple)) else [gens]

    def samples(self):
        r = random.Random(zlib.crc32(self.name.encode()))
        out = []
        for _ in range(K):
            vals = []
            for g in self.gens:
                v = g(r)
                vals.extend(v) if isinstance(v, tuple) else vals.append(v)
            out.append([render(v) for v in vals])
        return out


CASES = [
    # ---- integer / bit math -----------------------------------------
    C("intDiv", "intDiv({0}, {1})",
      "CAST(trunc(({0}) / CAST(({1}) AS DOUBLE)) AS BIGINT)", [gi, gnz]),
    C("intDivOrZero", "intDivOrZero({0}, {1})",
      "CASE WHEN ({1}) = 0 THEN 0 ELSE "
      "CAST(trunc(({0}) / CAST(({1}) AS DOUBLE)) AS BIGINT) END",
      [gi, lambda r: r.randint(-3, 3)]),
    C("modulo", "modulo({0}, {1})", "(({0}) % ({1}))", [gi, gnz]),
    C("bitAnd", "bitAnd({0}, {1})", "(({0}) & ({1}))", [gbig, gbig]),
    C("bitOr", "bitOr({0}, {1})", "(({0}) | ({1}))", [gbig, gbig]),
    C("bitXor", "bitXor({0}, {1})", "xor(({0}), ({1}))", [gbig, gbig]),
    C("bitNot", "bitNot({0})", "(~({0}))", [gbig]),
    C("bitShiftLeft", "bitShiftLeft({0}, {1})", "(({0}) << ({1}))",
      [lambda r: r.randint(0, 50), gsh]),  # duck rejects negative lhs
    C("bitShiftRight", "bitShiftRight({0}, {1})", "(({0}) >> ({1}))",
      [gpos, gsh]),
    C("bitCount", "bitCount({0})", "bit_count(CAST(({0}) AS BIGINT))",
      [gpos]),
    C("bitTest", "bitTest({0}, {1})", "((({0}) >> ({1})) & 1)",
      [gpos, gsh]),
    C("exp2", "exp2({0})", "power(2.0, ({0}))",
      [lambda r: r.randint(-20, 20) / 2.0]),
    C("exp10", "exp10({0})", "power(10.0, ({0}))",
      [lambda r: r.randint(-10, 10) / 2.0]),
    C("intExp2", "intExp2({0})", "CAST(power(2, ({0})) AS BIGINT)",
      [lambda r: r.randint(0, 30)]),
    C("intExp10", "intExp10({0})", "CAST(power(10, ({0})) AS BIGINT)",
      [lambda r: r.randint(0, 9)]),
    # ---- modular casts ----------------------------------------------
    C("toUInt8", "toUInt8({0})", "((({0}) % 256 + 256) % 256)", [gbig]),
    C("toUInt16", "toUInt16({0})", "((({0}) % 65536 + 65536) % 65536)",
      [gbig]),
    C("toUInt32", "toUInt32({0})",
      "((({0}) % 4294967296 + 4294967296) % 4294967296)", [gbig]),
    C("toInt8", "toInt8({0})",
      "(((({0}) + 128) % 256 + 256) % 256 - 128)", [gbig]),
    C("toInt16", "toInt16({0})",
      "(((({0}) + 32768) % 65536 + 65536) % 65536 - 32768)", [gbig]),
    C("toInt32", "toInt32({0})",
      "(((({0}) + 2147483648) % 4294967296 + 4294967296) % 4294967296 "
      "- 2147483648)", [gbig]),
    C("toInt64", "toInt64({0})", "CAST(({0}) AS BIGINT)", [gbig]),
    C("toString_int", "toString({0})", "CAST(({0}) AS VARCHAR)", [gbig]),
    C("toString_date", "toString({0})", "CAST(({0}) AS VARCHAR)", [gd]),
    C("toInt32OrZero", "toInt32OrZero({0})",
      "CASE WHEN regexp_matches(({0}), '^[+-]?[0-9]+$') "
      "THEN coalesce(CASE WHEN abs(TRY_CAST(({0}) AS HUGEINT)) <= "
      "2147483647 OR TRY_CAST(({0}) AS HUGEINT) = -2147483648 "
      "THEN TRY_CAST(({0}) AS INTEGER) END, 0) ELSE 0 END",
      [lambda r: r.choice([
          str(r.randint(-10**10, 10**10)), "12.5", "", "abc", "+7", "-0",
          str(r.randint(-100, 100))])]),
    # whitespace-lenient parse is the engine's DOCUMENTED divergence
    # (r4 grid): try_cast trims, CH rejects — encode the engine rule
    C("toInt64OrNull", "toInt64OrNull({0})",
      "CASE WHEN regexp_matches(({0}), '^ *[+-]?[0-9]+ *$') "
      "THEN TRY_CAST(trim({0}) AS BIGINT) END",
      [lambda r: r.choice([
          str(r.randint(-10**9, 10**9)), "9.1", "", "x1", "42 "])]),
    C("toFloat64OrZero", "toFloat64OrZero({0})",
      "coalesce(TRY_CAST(({0}) AS DOUBLE), 0.0)",
      [lambda r: r.choice([
          repr(r.randint(-9999, 9999) / 100.0), "", "nope", "1e3",
          str(r.randint(-99, 99))])]),
    # ---- null combinators -------------------------------------------
    C("ifNull", "ifNull({0}, {1})", "coalesce(({0}), ({1}))",
      [lambda r: None if r.random() < 0.5 else gi(r), gi]),
    C("nullIf", "nullIf({0}, {1})", "nullif(({0}), ({1}))",
      [lambda r: r.randint(0, 3), lambda r: r.randint(0, 3)]),
    C("isNotNull", "isNotNull({0})", "(({0}) IS NOT NULL)",
      [lambda r: None if r.random() < 0.5 else gi(r)]),
    # ---- date/time parts --------------------------------------------
    C("toYear", "toYear({0})", "year({0})", [gt]),
    C("toMonth", "toMonth({0})", "month({0})", [gt]),
    C("toQuarter", "toQuarter({0})", "quarter({0})", [gt]),
    C("toDayOfMonth", "toDayOfMonth({0})", "day({0})", [gt]),
    C("toDayOfYear", "toDayOfYear({0})", "dayofyear({0})", [gt]),
    C("toDayOfWeek", "toDayOfWeek({0})", "isodow({0})", [gt]),
    C("toHour", "toHour({0})", "hour({0})", [gt]),
    C("toMinute", "toMinute({0})", "minute({0})", [gt]),
    C("toSecond", "toSecond({0})", "second({0})", [gt]),
    C("toISOWeek", "toISOWeek({0})", "week({0})", [gt]),
    C("toISOYear", "toISOYear({0})", "isoyear({0})", [gt]),
    C("toDate", "toDate({0})", "CAST(({0}) AS DATE)", [gt]),
    C("toStartOfMonth", "toStartOfMonth({0})",
      "CAST(date_trunc('month', {0}) AS DATE)", [gt]),
    C("toStartOfQuarter", "toStartOfQuarter({0})",
      "CAST(date_trunc('quarter', {0}) AS DATE)", [gt]),
    C("toStartOfYear", "toStartOfYear({0})",
      "CAST(date_trunc('year', {0}) AS DATE)", [gt]),
    C("toMonday", "toMonday({0})",
      "CAST(date_trunc('week', {0}) AS DATE)", [gt]),
    C("toLastDayOfMonth", "toLastDayOfMonth({0})", "last_day({0})", [gt]),
    C("toStartOfDay", "toStartOfDay({0})",
      "CAST(date_trunc('day', {0}) AS TIMESTAMP)", [gt]),
    C("toStartOfHour", "toStartOfHour({0})", "date_trunc('hour', {0})",
      [gt]),
    C("toStartOfMinute", "toStartOfMinute({0})",
      "date_trunc('minute', {0})", [gt]),
    C("toStartOfFiveMinute", "toStartOfFiveMinute({0})",
      "CAST(to_timestamp(CAST(floor(epoch({0}) / 300) * 300 AS BIGINT)) "
      "AS TIMESTAMP)", [gt]),
    C("toStartOfTenMinutes", "toStartOfTenMinutes({0})",
      "CAST(to_timestamp(CAST(floor(epoch({0}) / 600) * 600 AS BIGINT)) "
      "AS TIMESTAMP)", [gt]),
    C("toStartOfFifteenMinutes", "toStartOfFifteenMinutes({0})",
      "CAST(to_timestamp(CAST(floor(epoch({0}) / 900) * 900 AS BIGINT)) "
      "AS TIMESTAMP)", [gt]),
    C("timeSlot", "timeSlot({0})",
      "CAST(to_timestamp(CAST(floor(epoch({0}) / 1800) * 1800 AS BIGINT)) "
      "AS TIMESTAMP)", [gt]),
    # ---- date arithmetic --------------------------------------------
    C("addDays", "addDays({0}, {1})",
      "CAST(({0}) + ({1}) * INTERVAL 1 DAY AS DATE)", [gd, gi]),
    C("subtractDays", "subtractDays({0}, {1})",
      "CAST(({0}) - ({1}) * INTERVAL 1 DAY AS DATE)", [gd, gi]),
    C("addMonths", "addMonths({0}, {1})",
      "CAST(({0}) + ({1}) * INTERVAL 1 MONTH AS DATE)", [gd, gi]),
    C("subtractMonths", "subtractMonths({0}, {1})",
      "CAST(({0}) - ({1}) * INTERVAL 1 MONTH AS DATE)", [gd, gi]),
    C("addQuarters", "addQuarters({0}, {1})",
      "CAST(({0}) + (3 * ({1})) * INTERVAL 1 MONTH AS DATE)", [gd, gi]),
    C("subtractQuarters", "subtractQuarters({0}, {1})",
      "CAST(({0}) - (3 * ({1})) * INTERVAL 1 MONTH AS DATE)", [gd, gi]),
    C("addHours", "addHours({0}, {1})",
      "(({0}) + ({1}) * INTERVAL 1 HOUR)", [gt, gi]),
    C("dateDiff_day", "dateDiff('day', {0}, {1})",
      "date_diff('day', ({0}), ({1}))", [gt, gt]),
    C("dateDiff_hour", "dateDiff('hour', {0}, {1})",
      "date_diff('hour', ({0}), ({1}))", [gt, gt]),
    C("dateDiff_month", "dateDiff('month', {0}, {1})",
      "date_diff('month', ({0}), ({1}))", [gt, gt]),
    # r8 (VERDICT r7 item 5): the REST of the boundary-crossing unit
    # grid — DuckDB's date_diff counts partition boundaries, an
    # independent implementation of CH's documented rule (week
    # boundaries are Monday in CH, Spark date_trunc('WEEK') and DuckDB
    # alike)
    C("dateDiff_second", "dateDiff('second', {0}, {1})",
      "date_diff('second', ({0}), ({1}))", [gt, gt]),
    C("dateDiff_minute", "dateDiff('minute', {0}, {1})",
      "date_diff('minute', ({0}), ({1}))", [gt, gt]),
    C("dateDiff_week", "dateDiff('week', {0}, {1})",
      "date_diff('week', ({0}), ({1}))", [gt, gt]),
    C("dateDiff_quarter", "dateDiff('quarter', {0}, {1})",
      "date_diff('quarter', ({0}), ({1}))", [gt, gt]),
    C("dateDiff_year", "dateDiff('year', {0}, {1})",
      "date_diff('year', ({0}), ({1}))", [gt, gt]),
    C("date_diff_alias", "date_diff('day', {0}, {1})",
      "date_diff('day', ({0}), ({1}))", [gt, gt]),
    C("dateDiff_mixed_date_ts", "dateDiff('day', {0}, {1})",
      "date_diff('day', CAST(({0}) AS TIMESTAMP), ({1}))", [gd, gt]),
    C("timeDiff", "timeDiff({0}, {1})",
      "date_diff('second', ({0}), ({1}))", [gt, gt]),
    # toStartOfWeek mode 0 = SUNDAY-start (shift through Monday-start
    # trunc), mode 1 = Monday-start; both return Date in CH
    C("toStartOfWeek_mode0", "toStartOfWeek({0})",
      "CAST(date_trunc('week', ({0}) + INTERVAL 1 DAY) "
      "- INTERVAL 1 DAY AS DATE)", [gt]),
    C("toStartOfWeek_mode1", "toStartOfWeek({0}, 1)",
      "CAST(date_trunc('week', {0}) AS DATE)", [gt]),
    C("toStartOfSecond_fz", "toStartOfSecond({0})",
      "date_trunc('second', {0})", [gt]),
    C("toYYYYMM", "toYYYYMM({0})", "CAST(strftime({0}, '%Y%m') AS INT)",
      [gt]),
    C("toYYYYMMDD", "toYYYYMMDD({0})",
      "CAST(strftime({0}, '%Y%m%d') AS INT)", [gt]),
    C("toYYYYMMDDhhmmss", "toYYYYMMDDhhmmss({0})",
      "CAST(strftime({0}, '%Y%m%d%H%M%S') AS BIGINT)", [gt]),
    C("toUnixTimestamp", "toUnixTimestamp({0})",
      "CAST(epoch({0}) AS BIGINT)", [gt]),
    C("fromUnixTimestamp", "fromUnixTimestamp({0})",
      "CAST(to_timestamp({0}) AS TIMESTAMP)",
      [lambda r: r.randint(0, 2**31)]),
    C("toRelativeDayNum", "toRelativeDayNum({0})",
      "CAST(floor(epoch({0}) / 86400) AS BIGINT)", [gt]),
    C("toRelativeHourNum", "toRelativeHourNum({0})",
      "CAST(floor(epoch({0}) / 3600) AS BIGINT)", [gt]),
    C("toRelativeMinuteNum", "toRelativeMinuteNum({0})",
      "CAST(floor(epoch({0}) / 60) AS BIGINT)", [gt]),
    C("toRelativeSecondNum", "toRelativeSecondNum({0})",
      "CAST(epoch({0}) AS BIGINT)", [gt]),
    C("monthName", "monthName({0})", "strftime({0}, '%B')", [gt]),
    C("formatDateTime", "formatDateTime({0}, '%Y-%m-%d %H:%M:%S')",
      "strftime({0}, '%Y-%m-%d %H:%M:%S')", [gt]),
    C("toTime", "toTime({0})",
      "(TIMESTAMP '1970-01-02 00:00:00' + (({0}) - date_trunc('day', "
      "{0})))", [gt]),
    # ---- strings ----------------------------------------------------
    C("lengthUTF8", "lengthUTF8({0})", "length({0})", [gsu]),
    # empty()/notEmpty() are array-form here (documented divergence —
    # the textual translator can't see types; asserted in the grid)
    C("empty", "empty({0})", "(length({0}) = 0)", [gia]),
    C("notEmpty", "notEmpty({0})", "(length({0}) > 0)", [gia]),
    C("trimLeft", "trimLeft({0})", "ltrim({0})",
      [lambda r: " " * r.randint(0, 3) + gs(r) + " " * r.randint(0, 3)]),
    C("trimRight", "trimRight({0})", "rtrim({0})",
      [lambda r: " " * r.randint(0, 3) + gs(r) + " " * r.randint(0, 3)]),
    C("trimBoth", "trimBoth({0})", "trim({0})",
      [lambda r: " " * r.randint(0, 3) + gs(r) + " " * r.randint(0, 3)]),
    C("leftPad", "leftPad({0}, {1}, {2})", "lpad({0}, {1}, {2})",
      [gw, lambda r: r.randint(0, 12), gw]),
    C("rightPad", "rightPad({0}, {1}, {2})", "rpad({0}, {1}, {2})",
      [gw, lambda r: r.randint(0, 12), gw]),
    C("startsWith", "startsWith({0}, {1})", "starts_with({0}, {1})",
      [g_hay_needle]),
    C("endsWith", "endsWith({0}, {1})", "ends_with({0}, {1})",
      [g_hay_needle]),
    # CH position/length are BYTE-based (r10): the ASCII sweep keeps
    # byte == char; the _bytes twins below drive non-ASCII inputs
    # through DuckDB's strlen-prefix byte-offset recomputation
    C("position", "position({0}, {1})",
      "CASE WHEN length({1}) = 0 THEN 1 ELSE strpos({0}, {1}) END",
      [g_hay_needle]),
    C("position_bytes", "position({0}, {1})",
      "CASE WHEN length({1}) = 0 THEN 1 "
      "WHEN strpos({0}, {1}) = 0 THEN 0 "
      "ELSE strlen(substr({0}, 1, strpos({0}, {1}) - 1)) + 1 END",
      [g_uhay_needle]),
    C("locate_bytes", "locate({0}, {1})",
      "CASE WHEN length({1}) = 0 THEN 1 "
      "WHEN strpos({0}, {1}) = 0 THEN 0 "
      "ELSE strlen(substr({0}, 1, strpos({0}, {1}) - 1)) + 1 END",
      [g_uhay_needle]),
    C("length_bytes", "length({0})", "strlen({0})", [gsu]),
    C("positionCaseInsensitive", "positionCaseInsensitive({0}, {1})",
      "CASE WHEN length({1}) = 0 THEN 1 "
      "ELSE strpos(lower({0}), lower({1})) END", [g_hay_needle]),
    C("countSubstrings", "countSubstrings({0}, {1})",
      "CAST((length({0}) - length(replace({0}, {1}, ''))) / length({1}) "
      "AS BIGINT)", [g_hay_word]),
    C("replaceAll", "replaceAll({0}, {1}, {2})",
      "replace({0}, {1}, {2})", [g_replace3]),
    C("replaceOne", "replaceOne({0}, {1}, {2})",
      "CASE WHEN strpos({0}, {1}) = 0 THEN ({0}) ELSE "
      "concat(substring({0}, 1, strpos({0}, {1}) - 1), {2}, "
      "substring({0}, strpos({0}, {1}) + length({1}))) END",
      [g_replace3]),
    C("replaceRegexpAll", "replaceRegexpAll({0}, '[0-9]+', {1})",
      "regexp_replace({0}, '[0-9]+', {1}, 'g')", [gs, gw]),
    C("replaceRegexpOne", "replaceRegexpOne({0}, '[0-9]+', {1})",
      "regexp_replace({0}, '[0-9]+', {1})", [gs, gw]),
    C("splitByChar", "splitByChar({0}, {1})",
      "string_split({1}, {0})", [g_sep_str], elem="STRING"),
    C("splitByString", "splitByString({0}, {1})",
      "string_split({1}, {0})",
      [lambda r: (gw(r)[:2] or "ab", gs(r))], elem="STRING"),
    # r8: regex-metachar separators must stay LITERAL (the \\Q…\\E
    # guard), incl. separators embedded in the haystack
    C("splitByString_meta", "splitByString({0}, {1})",
      "string_split({1}, {0})", [g_sep_meta], elem="STRING"),
    # r8: CH's empty separator = split into single characters, NO
    # empties ('' → []); DuckDB's string_split shares the rule for
    # non-empty input, and the ''-input edge is pinned in the
    # semantics grid
    C("splitByString_empty_sep", "splitByString('', {0})",
      "list_filter(string_split({0}, ''), x -> x <> '')",
      [gw], elem="STRING"),
    C("splitByWhitespace", "splitByWhitespace({0})",
      "list_filter(string_split_regex({0}, ' +'), x -> x <> '')",
      [lambda r: " ".join(gw(r) for _ in range(r.randint(0, 4)))],
      elem="STRING"),
    C("alphaTokens", "alphaTokens({0})",
      "list_filter(string_split_regex({0}, '[^a-zA-Z]+'), x -> x <> '')",
      [gs], elem="STRING"),
    C("arrayStringConcat", "arrayStringConcat({0}, {1})",
      "array_to_string({0}, {1})", [gsa, lambda r: r.choice(",;- ")],
      elem="STRING"),
    C("base64_roundtrip", "base64Decode(base64Encode({0}))", "({0})",
      [gs]),
    C("tryBase64_roundtrip", "tryBase64Decode(base64Encode({0}))",
      "({0})", [gs]),
    C("hex_string", "hex({0})", "upper(hex(encode({0})))", [gw]),
    C("substringUTF8", "substringUTF8({0}, {1}, {2})",
      "substring({0}, {1}, {2})",
      [gsu, lambda r: r.randint(1, 8), lambda r: r.randint(0, 6)]),
    # ---- arrays -----------------------------------------------------
    C("arraySort", "arraySort({0})", "list_sort({0})", [gia]),
    C("arrayReverseSort", "arrayReverseSort({0})",
      "list_reverse_sort({0})", [gia]),
    C("arrayDistinct_sorted", "arraySort(arrayDistinct({0}))",
      "list_sort(list_distinct({0}))", [gia]),
    C("arrayUniq", "arrayUniq({0})", "length(list_distinct({0}))", [gia]),
    C("arrayConcat", "arrayConcat({0}, {1})", "list_concat({0}, {1})",
      [gia, gia]),
    # r5 late: rotate / shift / partial sort
    C("arrayRotateLeft", "arrayRotateLeft({0}, {1})",
      "CASE WHEN len({0}) = 0 THEN {0} ELSE list_concat("
      "list_slice({0}, ((({1}) % len({0})) + len({0})) % len({0}) + 1, "
      "len({0})), "
      "list_slice({0}, 1, ((({1}) % len({0})) + len({0})) % len({0})))"
      " END", [gia, gi]),
    C("arrayRotateRight", "arrayRotateRight({0}, {1})",
      "CASE WHEN len({0}) = 0 THEN {0} ELSE list_concat("
      "list_slice({0}, (((-({1})) % len({0})) + len({0})) % len({0}) + 1, "
      "len({0})), "
      "list_slice({0}, 1, (((-({1})) % len({0})) + len({0})) % len({0})))"
      " END", [gia, gi]),
    C("arrayShiftLeft", "arrayShiftLeft({0}, {1}, {2})",
      "CASE WHEN ({1}) >= 0 THEN list_concat("
      "list_slice({0}, least(abs({1}), len({0})) + 1, len({0})), "
      "[({2}) for __x in range(least(abs({1}), len({0})))]) "
      "ELSE list_concat("
      "[({2}) for __x in range(least(abs({1}), len({0})))], "
      "list_slice({0}, 1, len({0}) - least(abs({1}), len({0})))) END",
      [gia, gi, gi]),
    C("arrayPartialSort", "arrayPartialSort({0}, {1})",
      "list_sort({1})", [lambda r: r.randint(1, 5), gia]),
    C("arrayPushBack", "arrayPushBack({0}, {1})",
      "list_append({0}, {1})", [gia, gi]),
    C("arrayPushFront", "arrayPushFront({0}, {1})",
      "list_prepend({1}, {0})", [gia, gi]),
    C("arrayPopBack", "arrayPopBack({0})",
      "list_slice({0}, 1, greatest(length({0}) - 1, 0))", [gia]),
    C("arrayPopFront", "arrayPopFront({0})",
      "list_slice({0}, 2, length({0}))", [gia]),
    C("arrayReverse", "arrayReverse({0})", "list_reverse({0})", [gia]),
    C("has", "has({0}, {1})", "list_contains({0}, {1})", [gia, gi]),
    C("indexOf", "indexOf({0}, {1})",
      "coalesce(list_position({0}, {1}), 0)",
      [gia, lambda r: r.randint(-9, 9)]),
    C("arraySum", "arraySum({0})", "coalesce(list_sum({0}), 0)", [gia]),
    C("arrayAvg", "arrayAvg({0})",
      "(CAST(list_sum({0}) AS DOUBLE) / length({0}))", [gia1]),
    C("arrayMin", "arrayMin({0})", "list_min({0})", [gia1]),
    C("arrayMax", "arrayMax({0})", "list_max({0})", [gia1]),
    # index 0 / OOB -> NULL (the dialect's documented stand-in for
    # CH's unknowable type default)
    C("arrayElement", "arrayElement({0}, {1})",
      "CASE WHEN ({1}) = 0 THEN NULL ELSE ({0})[{1}] END",
      [gia, lambda r: r.randint(-8, 8)]),
    C("arraySlice_pos", "arraySlice({0}, {1}, {2})",
      "list_slice({0}, {1}, ({1}) + ({2}) - 1)",
      [gia, lambda r: r.randint(1, 7), lambda r: r.randint(0, 5)]),
    C("hasAll", "hasAll({0}, {1})", "list_has_all({0}, {1})",
      [gia, lambda r: [r.randint(-9, 9) for _ in range(r.randint(0, 3))]]),
    C("hasAny", "hasAny({0}, {1})", "list_has_any({0}, {1})",
      [gia, lambda r: [r.randint(-9, 9) for _ in range(r.randint(0, 3))]]),
    C("arrayIntersect_sorted", "arraySort(arrayIntersect({0}, {1}))",
      "list_sort(list_intersect({0}, {1}))", [gia, gia]),
    C("arrayJaccardIndex", "arrayJaccardIndex({0}, {1})",
      "(CAST(length(list_intersect({0}, {1})) AS DOUBLE) / "
      "length(list_distinct(list_concat({0}, {1}))))", [gia1, gia1]),
    # higher-order forms (lambda translation)
    C("arrayMap", "arrayMap(x -> x * 2 + 1, {0})",
      "list_transform({0}, x -> x * 2 + 1)", [gia]),
    C("arrayFilter", "arrayFilter(x -> modulo(x, 2) = 0, {0})",
      "list_filter({0}, x -> (x % 2) = 0)", [gia]),
    C("arrayCount", "arrayCount(x -> x > 0, {0})",
      "length(list_filter({0}, x -> x > 0))", [gia]),
    C("arrayExists", "arrayExists(x -> x > 3, {0})",
      "(length(list_filter({0}, x -> x > 3)) > 0)", [gia]),
    C("arrayAll", "arrayAll(x -> x >= 0, {0})",
      "(length(list_filter({0}, x -> NOT (x >= 0))) = 0)", [gia]),
    # no-match -> NULL (documented stand-in for CH's type default)
    C("arrayFirst", "arrayFirst(x -> x > 2, {0})",
      "list_filter({0}, x -> x > 2)[1]", [gia]),
    C("arrayCumSum", "arrayCumSum({0})",
      "list_transform(generate_series(1, length({0})), i -> "
      "list_sum(list_slice({0}, 1, i)))", [gia1]),
    C("arrayDifference", "arrayDifference({0})",
      "list_transform(generate_series(1, length({0})), i -> "
      "CASE WHEN i = 1 THEN 0 ELSE ({0})[i] - ({0})[i - 1] END)",
      [gia1]),
    # ---- IPv4 / JSON ------------------------------------------------
    C("IPv4NumToString", "IPv4NumToString({0})",
      "concat(CAST((({0}) >> 24) & 255 AS VARCHAR), '.', "
      "CAST((({0}) >> 16) & 255 AS VARCHAR), '.', "
      "CAST((({0}) >> 8) & 255 AS VARCHAR), '.', "
      "CAST(({0}) & 255 AS VARCHAR))",
      [lambda r: r.randint(0, 2**32 - 1)]),
    C("IPv4StringToNum", "IPv4StringToNum({0})",
      "(CAST(string_split({0}, '.')[1] AS BIGINT) * 16777216 + "
      "CAST(string_split({0}, '.')[2] AS BIGINT) * 65536 + "
      "CAST(string_split({0}, '.')[3] AS BIGINT) * 256 + "
      "CAST(string_split({0}, '.')[4] AS BIGINT))",
      [lambda r: ".".join(str(r.randint(0, 255)) for _ in range(4))]),
    C("JSONExtractString", "JSONExtractString({0}, 'k')",
      "json_extract_string({0}, '$.k')", [g_json]),
    C("JSONExtractInt", "JSONExtractInt({0}, 'n')",
      "CAST(json_extract({0}, '$.n') AS BIGINT)", [g_json]),
    # r9 raw-slice family: DuckDB's json_extract returns RAW JSON text
    # (quotes kept on strings, braces on objects) — an independent
    # scanner to differential-check ours against; whitespace-free
    # inputs make raw == minified on both sides
    C("JSONExtractArrayRaw",
      "arrayStringConcat(JSONExtractArrayRaw({0}), '|')",
      # DuckDB maps JSON null -> SQL NULL; the raw text is 'null'
      "coalesce(array_to_string(list_transform("
      "generate_series(0, CAST(json_array_length({0}) AS BIGINT) - 1), "
      "i -> coalesce(CAST(json_extract({0}, '$[' || i || ']') "
      "AS VARCHAR), 'null')), '|'), '')",
      [g_json_arr]),
    C("JSONExtractKeysAndValuesRaw",
      "arrayStringConcat(arrayMap(t -> concat(t.1, '=', t.2), "
      "JSONExtractKeysAndValuesRaw({0})), ';')",
      "coalesce(array_to_string(list_transform(json_keys({0}), "
      "k -> k || '=' || coalesce(CAST(json_extract({0}, '$.' || k) "
      "AS VARCHAR), 'null')), ';'), '')",
      [g_json_obj]),
    # ---- r5-late batch: ladders, MJD, separators --------------------
    C("roundDuration", "roundDuration({0})",
      "(SELECT coalesce(max(v), 0) FROM (VALUES (1), (10), (30), (60), "
      "(120), (180), (240), (300), (600), (1200), (1800), (3600), "
      "(7200), (18000), (36000)) t(v) WHERE v <= ({0}))",
      [lambda r: r.randint(0, 40000)]),
    C("roundAge", "roundAge({0})",
      "(CASE WHEN ({0}) < 1 THEN 0 WHEN ({0}) < 18 THEN 17 "
      "WHEN ({0}) < 25 THEN 18 WHEN ({0}) < 35 THEN 25 "
      "WHEN ({0}) < 45 THEN 35 WHEN ({0}) < 55 THEN 45 ELSE 55 END)",
      [lambda r: r.randint(0, 120)]),
    C("roundToExp2", "roundToExp2({0})",
      # independent derivation: largest power of two <= x via float
      # log2 with an off-by-one guard (safe in DuckDB's domain here)
      "(CASE WHEN ({0}) < 1 THEN 0 ELSE CAST(power(2, CAST(floor("
      "log2(CAST(({0}) AS DOUBLE) + 0.5)) AS INT)) AS BIGINT) END)",
      [lambda r: r.randint(0, 10**6)]),
    C("toModifiedJulianDay", "toModifiedJulianDay(toString({0}))",
      "(CAST(({0}) AS DATE) - DATE '1858-11-17')", [gd]),
    C("fromModifiedJulianDay", "fromModifiedJulianDay({0})",
      "strftime(DATE '1858-11-17' + CAST(({0}) AS INT), '%Y-%m-%d')",
      [lambda r: r.randint(-678575, 2973483)]),
    C("concatWithSeparator",
      "concatWithSeparator('-', toString({0}), toString({1}))",
      "concat(CAST(({0}) AS VARCHAR), '-', CAST(({1}) AS VARCHAR))",
      [gpos, gpos]),
    # ---- r6 batch (VERDICT r5 task 4's ADVICE classes) ----------------
    # negative/zero size-and-index arguments
    C("arrayResize", "arrayResize({0}, {1}, {2})",
      # CH: size >= 0 truncates/pads on the RIGHT, size < 0 keeps the
      # TAIL / pads on the LEFT (the r5 ADVICE left-pad rule)
      "(CASE WHEN ({1}) >= 0 THEN list_concat("
      "list_slice({0}, 1, least({1}, len({0}))), "
      "[({2}) for __x in range(greatest(({1}) - len({0}), 0))]) "
      "ELSE list_concat("
      "[({2}) for __x in range(greatest(-({1}) - len({0}), 0))], "
      "list_slice({0}, greatest(len({0}) + ({1}) + 1, 1), len({0}))) "
      "END)",
      [gia, lambda r: r.randint(-6, 6), gi]),
    C("arraySlice_neg", "arraySlice({0}, {1}, {2})",
      # negative offset indents from the END (kept in-range: |off| <= 4
      # on a fixed 4-element array — the out-of-range rule is pinned in
      # the grid, not fuzzed)
      "list_slice({0}, len({0}) + ({1}) + 1, "
      "len({0}) + ({1}) + ({2}))",
      [lambda r: [r.randint(-9, 9) for _ in range(4)],
       lambda r: r.randint(-4, -1), lambda r: r.randint(0, 4)]),
    C("substring_neg", "substring({0}, {1}, {2})",
      # CH negative start counts from the end (strings are 5-10 chars,
      # start >= -5 stays in range)
      "substring({0}, CAST(length({0}) + ({1}) + 1 AS INT), {2})",
      [lambda r: "".join(r.choice("abcxyz012")
                         for _ in range(r.randint(5, 10))),
       lambda r: r.randint(-5, -1), lambda r: r.randint(0, 4)]),
    C("repeat_zero", "repeat({0}, {1})", "repeat({0}, {1})",
      [gw, lambda r: r.randint(0, 4)]),
    C("left_neg", "left({0}, {1})",
      # CH left(s, -n) = s minus its last n chars
      "(CASE WHEN ({1}) >= 0 THEN substring({0}, 1, {1}) "
      "ELSE substring({0}, 1, greatest(length({0}) + ({1}), 0)) END)",
      [gs, lambda r: r.randint(-6, 6)]),
    C("right_neg", "right({0}, {1})",
      # CH right(s, -n) = s minus its first n chars
      "(CASE WHEN ({1}) >= 0 THEN "
      "substring({0}, greatest(length({0}) - ({1}) + 1, 1)) "
      "ELSE substring({0}, -({1}) + 1) END)",
      [gs, lambda r: r.randint(-6, 6)]),
    # regex-template literals (the r5 ADVICE class: templates carrying
    # regex syntax through the rewriter)
    C("extract_nogroup", "extract({0}, '[0-9]+')",
      "coalesce(regexp_extract({0}, '[0-9]+', 0), '')", [gs]),
    C("extract_group", "extract({0}, '([a-c])[0-9]')",
      "coalesce(regexp_extract({0}, '([a-c])[0-9]', 1), '')", [gs]),
    C("extractAll_nums", "extractAll({0}, '[0-9]+')",
      "regexp_extract_all({0}, '[0-9]+')", [gs], elem="STRING"),
    C("match_re", "match({0}, '[a-c][0-9]')",
      "regexp_matches({0}, '[a-c][0-9]')", [gs]),
    C("countMatches_re", "countMatches({0}, '[0-9]+')",
      "CAST(length(regexp_extract_all({0}, '[0-9]+')) AS BIGINT)", [gs]),
    # OrZero parse fallbacks (r5 ADVICE: toDate32OrZero's zero is the
    # Date32 minimum 1900-01-01; Date's stays 1970-01-01)
    C("toDate32OrZero_fuzz", "toDate32OrZero({0})",
      "coalesce(TRY_CAST(({0}) AS DATE), DATE '1900-01-01')",
      [lambda r: r.choice([
          gd(r).isoformat(), "bogus", "", "2024-13-40",
          gd(r).isoformat()])]),
    C("toDateOrZero_fuzz", "toDateOrZero({0})",
      "coalesce(TRY_CAST(({0}) AS DATE), DATE '1970-01-01')",
      [lambda r: r.choice([
          gd(r).isoformat(), "nope", "", gd(r).isoformat()])]),
    # pandas-UDF mapping roundtrip under non-ASCII input (r5 ADVICE
    # class: UDF boundary encoding)
    C("base58_roundtrip_unicode", "base58Decode(base58Encode({0}))",
      "({0})", [gsu]),
]

# ---- r7 (VERDICT r6 item 4): OrZero/OrNull fallback constants per
# type and DateTime64 scale truncation, incl. PRE-EPOCH inputs --------
def g_ts_whole(r):
    """timestamp string (whole seconds), ~25% pre-epoch, ~25% garbage."""
    roll = r.random()
    if roll < 0.25:
        return r.choice(["nope", "", "2024-13-40 00:00:00", "12:99"])
    base = dt.datetime(1969, 12, 26) if roll < 0.5 else dt.datetime(2024, 1, 1)
    t = base + dt.timedelta(seconds=r.randint(0, 6 * 86400))
    return t.strftime("%Y-%m-%d %H:%M:%S")


def g_ts_frac(r):
    """VALID timestamp string with 0-6 fractional digits, ~40%
    pre-epoch (the floor-vs-truncate hazard class)."""
    base = dt.datetime(1969, 12, 26) if r.random() < 0.4 \
        else dt.datetime(2024, 1, 1)
    t = base + dt.timedelta(seconds=r.randint(0, 6 * 86400),
                            microseconds=r.randint(0, 999_999))
    s = t.strftime("%Y-%m-%d %H:%M:%S")
    nd = r.randint(0, 6)
    return s + ("." + f"{t.microsecond:06d}"[:nd] if nd else "")


def g_ts_frac_or_garbage(r):
    return g_ts_frac(r) if r.random() < 0.7 else \
        r.choice(["nope", "", "2024-13-40 00:00:00"])


def _duck_dt64(x: str, scale: int) -> str:
    """DuckDB form of CH's DateTime64 scale truncation: exact floor on
    integer microseconds (epoch_us is exact; P*floor(x/P) via the
    sign-safe double floor is exact for test-era timestamps)."""
    p = 10 ** (6 - scale)
    if scale >= 6:
        return f"TRY_CAST({x} AS TIMESTAMP)"
    return (f"make_timestamp(CAST(floor(epoch_us(TRY_CAST({x} AS "
            f"TIMESTAMP)) / {p}) * {p} AS BIGINT))")


CASES += [
    # fallback constants: DateTime zero = epoch; DateTime64 zero = the
    # extended-range type minimum 1900-01-01 (same rule family as
    # toDate32OrZero's 1900-01-01, ADVICE r5)
    C("toDateTimeOrNull_fuzz", "toDateTimeOrNull({0})",
      "TRY_CAST({0} AS TIMESTAMP)", [g_ts_whole]),
    C("toDateTimeOrZero_fuzz", "toDateTimeOrZero({0})",
      "coalesce(TRY_CAST({0} AS TIMESTAMP), "
      "TIMESTAMP '1970-01-01 00:00:00')", [g_ts_whole]),
    C("toDateTime64OrNull_s3", "toDateTime64OrNull({0}, 3)",
      _duck_dt64("{0}", 3), [g_ts_frac_or_garbage]),
    C("toDateTime64OrZero_s3", "toDateTime64OrZero({0}, 3)",
      f"coalesce({_duck_dt64('{0}', 3)}, TIMESTAMP '1900-01-01')",
      [g_ts_frac_or_garbage]),
    C("toDateTime64OrZero_s0", "toDateTime64OrZero({0}, 0)",
      f"coalesce({_duck_dt64('{0}', 0)}, TIMESTAMP '1900-01-01')",
      [g_ts_frac_or_garbage]),
]
# scale truncation sweep (valid inputs; every scale 0..6, pre-epoch
# included by the generator — floor must match decimal digit drop)
for _s in range(7):
    CASES.append(C(f"toDateTime64_s{_s}", f"toDateTime64({{0}}, {_s})",
                   _duck_dt64("{0}", _s), [g_ts_frac]))


# ---- r7: string distances (were silent passthroughs; now mapped) ----
# DuckDB's levenshtein is BYTE-level (measured: levenshtein('café',
# 'cafe') = 2), exactly CH editDistance's convention — so the byte
# variant fuzzes over UNICODE too; the UTF8 (codepoint) variant fuzzes
# over ASCII where the two levels coincide. jaro/jaccard: non-empty
# inputs (the empty-string conventions differ between implementations
# and are documented at the dialect mapping, not fuzzable).
CASES += [
    C("editDistance_bytes", "editDistance({0}, {1})",
      "levenshtein({0}, {1})", [gsu, gsu]),
    C("editDistanceUTF8_ascii", "editDistanceUTF8({0}, {1})",
      "levenshtein({0}, {1})", [gs, gs]),
    C("jaroSimilarity_fuzz", "jaroSimilarity({0}, {1})",
      "jaro_similarity({0}, {1})", [gw, gw]),
    C("jaroWinkler_fuzz", "jaroWinklerSimilarity({0}, {1})",
      "jaro_winkler_similarity({0}, {1})", [gw, gw]),
    C("jaroSimilarity_selfish", "jaroSimilarity({0}, {0})",
      "jaro_similarity({0}, {0})", [gw]),
    C("stringJaccardIndex_fuzz", "stringJaccardIndex({0}, {1})",
      "jaccard({0}, {1})", [gw, gw]),
]


# week-mode closed forms re-derived with DuckDB's Sunday-based
# dayofweek by the helper queries_reference._duck_week — independent
# of the Spark-side Monday-convention generation in dialect.py
from clickhouse_learning_spark.queries_reference import _duck_week  # noqa: E402

for _m in (0, 2, 4, 5, 6, 7, 8, 9):
    CASES.append(C(f"toWeek_m{_m}", f"toWeek({{0}}, {_m})",
                   _duck_week("{0}", _m), [gd]))
for _m in (0, 3, 7, 9):
    CASES.append(C(f"toYearWeek_m{_m}", f"toYearWeek({{0}}, {_m})",
                   _duck_week("{0}", _m, yearweek=True), [gd]))
CASES += [
    C("toLastDayOfWeek_sun", "toLastDayOfWeek({0})",
      "(({0}) - CAST(dayofweek({0}) AS INT) + 6)", [gd]),
    C("toLastDayOfWeek_mon", "toLastDayOfWeek({0}, 1)",
      "(({0}) + CAST(7 - isodow({0}) AS INT))", [gd]),
    C("toRelativeWeekNum", "toRelativeWeekNum({0})",
      "((({0}) - DATE '1970-01-01' + 8 - isodow({0})) // 7)", [gd]),
    C("toRelativeMonthNum", "toRelativeMonthNum({0})",
      "(year({0}) * 12 + month({0}))", [gd]),
    C("toDaysSinceYearZero", "toDaysSinceYearZero({0})",
      "((({0}) - DATE '1970-01-01') + 719528)", [gd]),
    C("makeDate_doy", "makeDate({0}, {1})",
      "(make_date({0}, 1, 1) + CAST(({1}) - 1 AS INT))",
      [lambda r: r.randint(1971, 2030), lambda r: r.randint(1, 365)]),
    # valid snowflake domain: 41 bits of ms after 2010-11-04 (~2080);
    # beyond it the << 22 overflows Int64 in ANY engine
    C("snowflake_roundtrip",
      "toUnixTimestamp(snowflakeToDateTime(dateTimeToSnowflake({0})))",
      "CAST(epoch({0}) AS BIGINT)",
      [lambda r: dt.datetime(2011, 1, 1)
       + dt.timedelta(seconds=r.randint(0, 60 * 365 * 86400))]),
]


def _norm(v):
    from decimal import Decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, dt.datetime):
        # sub-second faithful (r7: the toDateTime64 scale-truncation
        # cases are ABOUT the fractional digits)
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def test_differential_sweep(spark):
    import duckdb

    con = duckdb.connect()
    jobs = []  # (case, sample_idx, spark_expr, duck_expr)
    for c in CASES:
        for i, lits in enumerate(c.samples()):
            sp = to_engine(c.ch.format(*lits), True, c.elem)
            du = to_engine(c.duck.format(*lits), False, c.elem)
            jobs.append((c, i, translate(sp), du))

    failures = []
    CHUNK = 200
    for lo in range(0, len(jobs), CHUNK):
        chunk = jobs[lo : lo + CHUNK]
        s_row = spark.sql(
            "SELECT " + ", ".join(
                f"{e} AS c{j}" for j, (_, _, e, _) in enumerate(chunk)
            )
        ).collect()[0]
        d_row = con.execute(
            "SELECT " + ", ".join(
                f"{e} AS c{j}" for j, (_, _, _, e) in enumerate(chunk)
            )
        ).fetchone()
        for j, (c, i, se, de) in enumerate(chunk):
            got, want = _norm(s_row[j]), _norm(d_row[j])
            ok = (
                got == want
                or (
                    isinstance(got, float)
                    and isinstance(want, float)
                    and got == pytest.approx(want, rel=1e-9, abs=1e-9)
                )
            )
            if not ok:
                failures.append((c.name, i, se, got, want))
    assert not failures, "\n".join(
        f"{n}[{i}]: spark={g!r} duck={w!r}  expr: {e}"
        for n, i, e, g, w in failures[:25]
    )


def test_case_table_covers_target():
    """The standing harness must keep covering >= 100 distinct mapped
    functions in the scalar sweep and >= 200 together with the
    aggregate sweep (VERDICT r5 task 4's done-bar)."""
    import re

    from tests.test_dialect_differential_agg import CASES as AGG_CASES

    fns = set()
    for c in CASES:
        fns.update(re.findall(r"[A-Za-z_][A-Za-z0-9_]*(?=\()", c.ch))
    fns -= {"x", "i"}
    assert len(fns) >= 100, sorted(fns)
    both = set(fns)
    for c in AGG_CASES:
        both.update(re.findall(r"[A-Za-z_][A-Za-z0-9_]*(?=\()", c.ch))
    assert len(both) >= 200, (len(both), sorted(both))
