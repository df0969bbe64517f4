"""Differential-semantics audit of the dialect's scalar mappings
(round-4, VERDICT r3 #2): every mapped function family is evaluated
over an edge-case input grid in Spark (through ``translate``) and
compared against ClickHouse's published semantics, hand-computed where
DuckDB diverges too. The classes the driver caught in r1–r3 (quantile
rank rule, dateDiff boundary crossings, toWeek mode 0, empty-array
folds) each keep a regression row here.

Documented (unfixable-textually or deliberately divergent) behaviors
asserted at the bottom: toUInt64's upper half, empty()/notEmpty() on
strings, whitespace-lenient OrZero string parsing, assumeNotNull(NULL).
"""

from __future__ import annotations

import datetime as dt

import pytest

from clickhouse_learning_spark.functions.dialect import translate


def _grid(spark, cases):
    """Evaluate [(ch_expr, expected)] in ONE Spark job; approx-compare
    floats, exact-compare the rest."""
    exprs = ", ".join(
        f"{translate(e)} AS c{i}" for i, (e, _) in enumerate(cases)
    )
    row = spark.sql(f"SELECT {exprs}").collect()[0]
    for i, (e, want) in enumerate(cases):
        got = row[i]
        if isinstance(want, float):
            assert float(got) == pytest.approx(want, rel=1e-9), (e, got, want)
        elif want is None:
            assert got is None, (e, got)
        else:
            # Decimal vs int etc. — compare by value
            assert got == want, (e, got, want)


def test_rounding_is_bankers(spark):
    # CH round() on floats = banker's (half-to-even); ties chosen to be
    # exactly representable in binary so fp noise can't decide them
    _grid(
        spark,
        [
            ("round(2.5)", 2),
            ("round(3.5)", 4),
            ("round(-2.5)", -2),
            ("round(0.5)", 0),
            ("round(1.5)", 2),
            ("round(2.25, 1)", 2.2),
            ("round(2.75, 1)", 2.8),
            ("roundBankers(2.5)", 2),
            ("roundBankers(-0.5)", 0),
        ],
    )


def test_integer_division_and_modulo(spark):
    # CH intDiv truncates toward zero (C++ semantics); modulo keeps the
    # dividend's sign
    _grid(
        spark,
        [
            ("intDiv(7, 2)", 3),
            ("intDiv(-7, 2)", -3),
            ("intDiv(7, -2)", -3),
            ("intDivOrZero(5, 0)", 0),
            ("modulo(7, 2)", 1),
            ("modulo(-7, 2)", -1),
            ("modulo(7, -2)", 1),
        ],
    )


def test_integer_casts_wrap_modularly(spark):
    # CH to(U)IntN are MODULAR casts: out-of-range wraps two's-
    # complement, never errors (Spark ANSI CAST would raise)
    _grid(
        spark,
        [
            ("toUInt8(300)", 44),
            ("toUInt8(-1)", 255),
            ("toUInt16(65536)", 0),
            ("toUInt16(-2)", 65534),
            ("toUInt32(-5)", 4294967291),
            ("toUInt32(4294967296)", 0),
            ("toInt8(200)", -56),
            ("toInt8(-200)", 56),
            ("toInt16(40000)", -25536),
            ("toInt32(2147483648)", -2147483648),
            ("toInt32(3000000000)", -1294967296),
            ("toInt64(5)", 5),
        ],
    )


def test_or_zero_or_null_range_guards(spark):
    # unsigned targets enforce the unsigned domain (ADVICE r3):
    # parseable-but-out-of-range strings/values → 0 / NULL
    _grid(
        spark,
        [
            ("toUInt32OrZero('-5')", 0),
            ("toUInt8OrZero('300')", 0),
            ("toUInt8OrZero('200')", 200),
            ("toUInt32OrNull('-5')", None),
            ("toInt32OrZero('abc')", 0),
            ("toInt32OrZero('2.5')", 0),  # CH: integer grammar only
            ("accurateCastOrNull(300, 'UInt8')", None),
            ("accurateCastOrDefault(300, 'UInt8')", 0),
            ("accurateCastOrNull(200, 'UInt8')", 200),
            ("toFloat64OrZero('1e3')", 1000.0),
            ("toDateOrZero('bogus')", dt.date(1970, 1, 1)),
            ("toDateTimeOrNull('bogus')", None),
        ],
    )


def test_week_and_weekday_conventions(spark):
    # CH toDayOfWeek: Monday=1…Sunday=7 (Spark dayofweek: Sunday=1);
    # toStartOfWeek mode 0 = Sunday-start; toWeek mode 0 = MySQL
    # WEEK(d,0) numbering (r2 regression); toISOWeek = ISO 8601
    _grid(
        spark,
        [
            ("toDayOfWeek(toDate('2024-01-08'))", 1),  # Monday
            ("toDayOfWeek(toDate('2024-01-07'))", 7),  # Sunday
            # r4: explicit mode arguments (CH's documented table)
            ("toDayOfWeek(toDate('2024-01-08'), 1)", 0),  # Mon 0-6
            ("toDayOfWeek(toDate('2024-01-07'), 2)", 1),  # Sun 1-7
            ("toDayOfWeek(toDate('2024-01-06'), 3)", 6),  # Sat, Sun 0-6
            ("toStartOfWeek(toDate('2024-01-10'))", dt.date(2024, 1, 7)),
            ("toStartOfWeek(toDate('2024-01-10'), 1)", dt.date(2024, 1, 8)),
            ("toMonday(toDate('2024-01-10'))", dt.date(2024, 1, 8)),
            ("toWeek(toDate('2021-01-01'))", 0),
            ("toWeek(toDate('2021-01-03'))", 1),  # first Sunday of 2021
            # r4 mode 1: Monday-start, week 1 needs >= 4 days this year
            ("toWeek(toDate('2021-01-01'), 1)", 0),  # Fri: 3-day first week
            ("toWeek(toDate('2021-01-04'), 1)", 1),  # first Monday
            ("toWeek(toDate('2024-01-01'), 1)", 1),  # Monday year start
            ("toWeek(toDate('2024-12-31'), 1)", 53),  # no ISO year wrap
            ("toWeek(toDate('2021-01-01'), 3)", 53),  # mode 3 = ISO
            ("toISOWeek(toDate('2021-01-01'))", 53),
            ("dateName('weekday', toDate('2024-01-08'))", "Monday"),
        ],
    )


def test_date_boundaries_and_buckets(spark):
    # dateDiff counts unit-boundary CROSSINGS (r2 regression); age()
    # counts complete units; epoch-anchored bucket floors
    _grid(
        spark,
        [
            (
                "dateDiff('day', toDateTime('2024-01-01 23:59:59'), "
                "toDateTime('2024-01-02 00:00:01'))",
                1,
            ),
            (
                "age('day', toDateTime('2024-01-01 23:59:59'), "
                "toDateTime('2024-01-02 00:00:01'))",
                0,
            ),
            ("toYYYYMM(toDate('1969-06-15'))", 196906),
            ("toYYYYMMDD(toDate('2024-02-29'))", 20240229),
            ("toLastDayOfMonth(toDate('2024-02-08'))", dt.date(2024, 2, 29)),
            ("toRelativeDayNum(toDate('2024-01-02'))", 19724),
            (
                "toTime(toDateTime('2024-03-05 07:08:09'))",
                dt.datetime(1970, 1, 2, 7, 8, 9),
            ),
            (
                "timeSlot(toDateTime('2024-03-05 07:44:09'))",
                dt.datetime(2024, 3, 5, 7, 30),
            ),
            (
                "toStartOfFifteenMinutes(toDateTime('2024-03-05 07:44:09'))",
                dt.datetime(2024, 3, 5, 7, 30),
            ),
            (
                # CH week intervals anchor on Monday (epoch was Thursday)
                "toStartOfInterval(toDateTime('2024-03-05 07:44:09'), "
                "INTERVAL 2 WEEK)",
                dt.datetime(2024, 2, 26),
            ),
            (
                "toStartOfInterval(toDate('2024-05-05'), INTERVAL 3 MONTH)",
                dt.date(2024, 4, 1),
            ),
            ("toStartOfQuarter(toDate('1969-02-03'))", dt.date(1969, 1, 1)),
        ],
    )


def test_string_functions(spark):
    _grid(
        spark,
        [
            ("position('hello world', 'o')", 5),
            ("position('hello', 'zz')", 0),
            ("countSubstrings('aaaa', 'aa')", 2),  # non-overlapping
            ("substring('abcdef', -3, 2)", "de"),
            ("leftPad('abc', 2, '*')", "ab"),  # pad-to-len truncates
            ("leftPad('abc', 5, '*')", "**abc"),
            ("formatReadableSize(1023)", "1023.00 B"),
            ("formatReadableSize(1024)", "1.00 KiB"),
            ("formatReadableSize(1048576)", "1.00 MiB"),
            ("formatReadableQuantity(1234567)", "1.23 million"),
            ("formatReadableQuantity(2000000000000000)", "2.00 quadrillion"),
            ("trimBoth('  x  ')", "x"),
            ("hex(255)", "FF"),
        ],
    )


def test_array_functions(spark):
    _grid(
        spark,
        [
            ("arraySlice([1,2,3,4,5], 2, 2)", [2, 3]),
            ("arraySlice([1,2,3,4,5], 3)", [3, 4, 5]),  # to-end form
            ("arraySlice([1,2,3,4,5], -3)", [3, 4, 5]),
            ("arraySlice([1,2,3,4,5], -3, 2)", [3, 4]),
            ("indexOf([10,20,30], 30)", 3),
            ("indexOf([10,20,30], 99)", 0),
            ("arrayUniq([1,2,2,3])", 3),
            ("arrayDifference([1, 4, 2])", [0, 3, -2]),
            ("arrayCumSum([1, 2, 3])", [1, 3, 6]),
            ("splitByChar('.', 'a.b.c')", ["a", "b", "c"]),
            ("splitByChar(',', '')", [""]),
            ("arrayStringConcat(['a','b','c'], '-')", "a-b-c"),
        ],
    )


def test_documented_divergences(spark):
    """Behaviors that CANNOT be matched textually — each is pinned here
    so a silent change trips the suite, and each carries the divergence
    note at its mapping site:

    - toUInt64: CH's upper half (2^63…2^64−1) has no Spark integral
      type; negatives pass through signed instead of wrapping.
    - OrZero string parsing: Spark's try_cast accepts surrounding
      whitespace; CH's integer grammar rejects it (' 5' → 0 in CH).
    - assumeNotNull(NULL): CH yields the type default (implementation-
      specific per its own docs); Spark keeps NULL.
    - empty()/notEmpty() map to array size() — CH's string overload
      has no type-dispatched textual form (use x = '' in pasted SQL);
      they raise loudly on strings rather than mistranslating.
    """
    _grid(
        spark,
        [
            ("toUInt64(-5)", -5),
            ("toInt64OrZero(' 5')", 5),
            ("assumeNotNull(CAST(NULL AS INT))", None),
            ("empty([1])", False),
            ("notEmpty([1])", True),
        ],
    )
    from pyspark.sql.utils import AnalysisException

    with pytest.raises(AnalysisException):
        spark.sql(translate("SELECT empty('') AS v")).collect()


def test_url_functions(spark):
    """r4: the CH URL family — parse_url-backed parts, the short-list
    firstSignificantSubdomain rule (effective TLD takes two labels when
    the second-to-last is com/net/org/co), textual cut* forms, and
    percent-encoding fixups (decode leaves '+' alone; encode writes
    '%20', not '+'). Documented divergences: parse_url needs a scheme
    (CH's scheme-less leniency is absent), and java URLEncoder's
    '*'/'~' treatment differs from RFC 3986 for exotic characters."""
    _grid(
        spark,
        [
            ("domain('https://news.clickhouse.com.tr/p?q=1#f')",
             "news.clickhouse.com.tr"),
            ("domainWithoutWWW('https://www.example.com/p')", "example.com"),
            ("topLevelDomain('https://news.clickhouse.com.tr/')", "tr"),
            ("firstSignificantSubdomain('https://news.clickhouse.com.tr/')",
             "clickhouse"),
            ("firstSignificantSubdomain('https://www.example.com/')",
             "example"),
            ("firstSignificantSubdomain('http://localhost/x')", "localhost"),
            ("cutToFirstSignificantSubdomain("
             "'https://news.clickhouse.com.tr/')", "clickhouse.com.tr"),
            ("cutToFirstSignificantSubdomain('https://www.example.com/')",
             "example.com"),
            ("cutQueryString('http://a.com/p?q=1#frag')",
             "http://a.com/p#frag"),
            ("cutFragment('http://a.com/p?q=1#frag')", "http://a.com/p?q=1"),
            ("cutQueryStringAndFragment('http://a.com/p?q=1#frag')",
             "http://a.com/p"),
            ("cutWWW('http://www.example.com/p')", "http://example.com/p"),
            ("netloc('http://u:p@host.com:8080/x')", "u:p@host.com:8080"),
            ("pathFull('http://a.com/p/q?x=1')", "/p/q?x=1"),
            ("extractURLParameter('http://a.com/?x=1&y=2', 'y')", "2"),
            ("decodeURLComponent('a%20b+c')", "a b+c"),
            ("encodeURLComponent('a b')", "a%20b"),
            # documented divergence: scheme-less URLs need the scheme
            ("domain('example.com/path')", None),
            # r8 additions (VERDICT r7 item 5)
            ("port('http://a.com:8080/x')", 8080),
            ("port('http://a.com/x')", 0),
            ("decodeURLFormComponent('a+b%20c')", "a b c"),
            ("encodeURLFormComponent('a b')", "a+b"),
            ("extractURLParameters('http://a.com/?x=1&y=2')",
             ["x=1", "y=2"]),
            ("extractURLParameters('http://a.com/p')", []),
            ("extractURLParameterNames('http://a.com/?x=1&y=2&z')",
             ["x", "y", "z"]),
            # ADVICE r9: CH's param scanner starts at the first '?' OR
            # '#' and splits on '&'/'#' — fragment-borne params count
            ("extractURLParameters('http://a.com/#x=1')", ["x=1"]),
            ("extractURLParameters('http://a.com/?y=2#x=1&z=3')",
             ["y=2", "x=1", "z=3"]),
            ("extractURLParameterNames('http://a.com/#x=1&y')",
             ["x", "y"]),
        ],
    )
    import pytest

    from clickhouse_learning_spark.functions.dialect import translate

    for gated in ("URLHierarchy('http://a.b/c')",
                  "URLPathHierarchy('http://a.b/c')"):
        with pytest.raises(ValueError, match="prefix-list"):
            translate(f"SELECT {gated}")


def test_split_edge_semantics(spark):
    """r8: splitByString's EMPTY separator = split into single
    characters with no empty fragments ('' input → [], per CH's rule
    that empty substrings only arise from NON-empty separators), and
    splitByChar statically rejects separators that are not exactly one
    character (CH raises Illegal separator)."""
    import pytest

    from clickhouse_learning_spark.functions.dialect import translate

    _grid(
        spark,
        [
            ("splitByString('', 'abc')", ["a", "b", "c"]),
            ("splitByString('', '')", []),
            ("splitByString(', ', 'a, b, c')", ["a", "b", "c"]),
            ("splitByString('.', 'a.b')", ["a", "b"]),  # literal dot
            ("splitByString('|', 'a|b')", ["a", "b"]),
            ("splitByChar('.', 'a.b.c')", ["a", "b", "c"]),
            # ADVICE r9: escape-sequence separators are ONE logical
            # character — the static check must not count raw SQL text
            ("splitByChar('\\t', 'a\\tb\\tc')", ["a", "b", "c"]),
            ("splitByChar('\\\\', 'a\\\\b')", ["a", "b"]),
            ("splitByChar('''', 'a''b')", ["a", "b"]),
        ],
    )
    for bad in ("splitByChar('', 'abc')", "splitByChar('ab', 'aabb')",
                "splitByChar('\\t\\t', 'ab')",
                "splitByChar('\\xAB\\xCD', 'ab')"):
        with pytest.raises(ValueError, match="exactly one character"):
            translate(f"SELECT {bad}")


def test_bit_ip_base64_and_math_passthrough(spark):
    """r4: bitCount/isIPv4String/tryBase64Decode mappings, plus pins on
    the name-identical passthrough set (log10/log2/cbrt/pi/unhex/bin
    reach Spark's own functions untranslated — a future rewrite must
    not break them)."""
    _grid(
        spark,
        [
            ("bitCount(255)", 8),
            ("bitCount(0)", 0),
            ("isIPv4String('127.0.0.1')", 1),
            ("isIPv4String('256.1.1.1')", 0),
            ("isIPv4String('1.2.3')", 0),
            ("isIPv4String('a.b.c.d')", 0),
            ("tryBase64Decode('aGk=')", "hi"),
            ("tryBase64Decode('not base64!')", ""),
            ("base64Decode(base64Encode('roundtrip'))", "roundtrip"),
            ("IPv4NumToString(IPv4StringToNum('10.20.30.40'))",
             "10.20.30.40"),
            ("log10(1000)", 3.0),
            ("log2(8)", 3.0),
            ("cbrt(27.0)", 3.0),
            ("pi()", 3.141592653589793),
            ("hex(unhex('4142'))", "4142"),
            ("bitTest(5, 0)", 1),
            ("bitTest(5, 1)", 0),
        ],
    )


def test_array_reduce_and_array_combinator(spark):
    """r4: arrayReduce('agg', arr) scalar forms and the -Array
    combinator aggregates (the aggregate runs over every element of
    every array in the group). median follows the repo's quantileExact
    rank rule; uniqArray maps to the exact form (CH's is approximate —
    strictly stronger, documented)."""
    _grid(
        spark,
        [
            ("arrayReduce('sum', [1, 2, 3])", 6),
            ("arrayReduce('max', [1, 5, 3])", 5),
            ("arrayReduce('avg', [1, 2, 3, 6])", 3.0),
            ("arrayReduce('count', [1, 2, 3])", 3),
            ("arrayReduce('uniqExact', [1, 2, 2, 3])", 3),
            ("arrayReduce('median', [1, 2, 3])", 2),
            ("arrayReduce('anyLast', [7, 8, 9])", 9),
            ("arrayMin([3, 1, 2])", 1),
            ("arrayMax([3, 1, 2])", 3),
            ("arrayAvg([2, 4])", 3.0),
        ],
    )
    spark.createDataFrame(
        [(1, [1, 2]), (1, [2, 3, 4]), (2, [10])], "g int, arr array<int>"
    ).createOrReplaceTempView("ch_arr_agg")
    r = {
        row.g: row
        for row in spark.sql(
            translate(
                "SELECT g, sumArray(arr) AS s, countArray(arr) AS c, "
                "minArray(arr) AS mn, maxArray(arr) AS mx, "
                "avgArray(arr) AS av, uniqExactArray(arr) AS u "
                "FROM ch_arr_agg GROUP BY g"
            )
        ).collect()
    }
    assert (r[1].s, r[1].c, r[1].mn, r[1].mx, r[1].u) == (12, 5, 1, 4, 4)
    assert r[1].av == pytest.approx(2.4)
    assert (r[2].s, r[2].c, r[2].u) == (10, 1, 1)
    with pytest.raises(ValueError, match="no array-expression form"):
        translate("arrayReduce('quantileTiming', [1])")


def test_foreach_and_ornull_combinators(spark):
    """r4: -ForEach runs the aggregate per array position across rows
    (shorter arrays padded — CH's type-default padding becomes the
    aggregate's identity); -OrNull returns NULL instead of the type
    default when nothing aggregates."""
    spark.createDataFrame(
        [(1, [1, 2]), (1, [3, 4, 5]), (2, [10])], "g int, arr array<bigint>"
    ).createOrReplaceTempView("ch_fe")
    r = {
        row.g: row
        for row in spark.sql(
            translate(
                "SELECT g, sumForEach(arr) AS s, minForEach(arr) AS mn, "
                "maxForEach(arr) AS mx FROM ch_fe GROUP BY g"
            )
        ).collect()
    }
    assert r[1].s == [4, 6, 5] and r[1].mn == [1, 2, 5] and r[1].mx == [3, 4, 5]
    assert r[2].s == [10]
    spark.createDataFrame(
        [(1, None)], "g int, x int"
    ).createOrReplaceTempView("ch_ornull")
    row = spark.sql(
        translate(
            "SELECT sumOrNull(x) AS s, maxOrNull(x) AS m, "
            "uniqExactOrNull(x) AS u FROM ch_ornull"
        )
    ).collect()[0]
    assert row.s is None and row.m is None and row.u is None


def test_sum_foreach_int_arrays_and_named_tuple_element(spark):
    """r4 sweep findings: sumForEach over array<int> (the fold's
    accumulator must be BIGINT-typed up front — int + bigint merge
    mismatched an int accumulator) and tupleElement's NAMED-element
    form (used to emit t.col'name')."""
    spark.createDataFrame(
        [(1, [1, 2]), (1, [3, 4, 5])], "g int, arr array<int>"
    ).createOrReplaceTempView("ch_fe_int")
    r = spark.sql(
        translate("SELECT g, sumForEach(arr) AS s FROM ch_fe_int GROUP BY g")
    ).collect()[0]
    assert r.s == [4, 6, 5]
    r2 = spark.sql(
        translate(
            "SELECT tupleElement(named_struct('a', 7), 'a') AS x, "
            "tupleElement(struct(1, 2), 2) AS y"
        )
    ).collect()[0]
    assert (r2.x, r2.y) == (7, 2)


def test_vector_distance_family(spark):
    """r4 late sweep: CH's array-vector functions (dotProduct /
    cosineDistance / Lp distances and norms / normalize*) — every form
    computes in DOUBLE with an index-ordered fold. Values hand-computed:
    a = [1,2,3], b = [4,6,8] → dot = 40, |a|₂ = √14, |b|₂ = √116,
    L1 = 3+4+5 = 12, L2 = √50, Linf = 5."""
    _grid(
        spark,
        [
            ("dotProduct([1,2,3], [4,6,8])", 40.0),
            ("scalarProduct([1,2,3], [4,6,8])", 40.0),
            ("arrayDotProduct([1,2,3], [4,6,8])", 40.0),
            (
                "cosineDistance([1,2,3], [4,6,8])",
                1.0 - 40.0 / (14.0**0.5 * 116.0**0.5),
            ),
            ("L1Distance([1,2,3], [4,6,8])", 12.0),
            ("L2Distance([1,2,3], [4,6,8])", 50.0**0.5),
            ("L2SquaredDistance([1,2,3], [4,6,8])", 50.0),
            ("LinfDistance([1,2,3], [4,6,8])", 5.0),
            ("LpDistance([1,2,3], [4,6,8], 3)", 216.0 ** (1.0 / 3)),
            ("L1Norm([1,-2,3])", 6.0),
            ("L2Norm([3,4])", 5.0),
            ("L2SquaredNorm([3,4])", 25.0),
            ("LinfNorm([1,-7,3])", 7.0),
            ("LpNorm([3,4], 2)", 5.0),
        ],
    )
    # normalize*: element-wise division by the corresponding norm
    row = spark.sql(
        translate(
            "SELECT normalizeL2([3.0,4.0]) AS n2, "
            "normalizeL1([1.0,3.0]) AS n1, "
            "normalizeLinf([2.0,-4.0]) AS ni"
        )
    ).collect()[0]
    assert row.n2 == pytest.approx([0.6, 0.8])
    assert row.n1 == pytest.approx([0.25, 0.75])
    assert row.ni == pytest.approx([0.5, -1.0])


def test_array_set_predicates(spark):
    """hasAll / hasAny / hasSubstr / arrayIntersect /
    arrayJaccardIndex / arrayElement — CH's published examples, plus
    the empty-operand edges (hasAll(a, []) = 1, hasSubstr(a, []) = 1;
    hasSubstr is CONTIGUOUS where hasAll is set-inclusion)."""
    _grid(
        spark,
        [
            ("hasAll([1,2,3,4], [2,4])", True),
            ("hasAll([1,2,3,4], [2,5])", False),
            ("hasAll([1,2], [])", True),
            ("hasAny([1,2,3], [3,5])", True),
            ("hasAny([1,2,3], [4,5])", False),
            ("hasSubstr([1,2,3,4], [2,3])", True),
            ("hasSubstr([1,2,3,4], [2,4])", False),  # not contiguous
            ("hasSubstr([1,2,3,4], [])", True),
            ("hasSubstr([1,2], [1,2,3])", False),
            ("arrayJaccardIndex([1,2,3], [2,3,4])", 0.5),
            ("arrayElement([10,20,30], 2)", 20),
            ("arrayElement([10,20,30], -1)", 30),
            ("arrayElement([10,20,30], 9)", None),  # CH: type default
        ],
    )
    row = spark.sql(
        translate(
            "SELECT arrayIntersect([1,2,3,4], [2,4,5], [4,2]) AS i2"
        )
    ).collect()[0]
    assert sorted(row.i2) == [2, 4]
    with pytest.raises(ValueError, match="at least two"):
        translate("arrayIntersect([1,2])")


def test_delta_sum_timestamp_and_bounding_ratio(spark):
    """deltaSumTimestamp: Σ max(vᵢ − vᵢ₋₁, 0) ordered by the explicit
    timestamp (order-free, unlike gated deltaSum); boundingRatio:
    bounding-box slope. Rows arrive shuffled to prove order
    independence. Series by ts: v = 5, 3, 8, 8, 2, 9 →
    rises 0+5+0+0+7 = 12 (first row contributes nothing).
    boundingRatio: (y@maxx − y@minx)/(maxx − minx) = (9−5)/(60−10)."""
    rows = [(30, 8.0), (10, 5.0), (60, 9.0), (20, 3.0), (50, 2.0), (40, 8.0)]
    spark.createDataFrame(rows, "ts int, v double").createOrReplaceTempView(
        "ch_dst"
    )
    r = spark.sql(
        translate(
            "SELECT deltaSumTimestamp(v, ts) AS ds, "
            "boundingRatio(ts, v) AS br FROM ch_dst"
        )
    ).collect()[0]
    assert r.ds == pytest.approx(12.0)
    assert r.br == pytest.approx((9.0 - 5.0) / 50.0)
    # order-dependent moving aggregates gate with the window pointer
    for bad in (
        "groupArrayMovingSum(v)",
        "groupArrayMovingAvg(2)(v)",
        "exponentialMovingAverage(10)(v, ts)",
    ):
        with pytest.raises(ValueError, match="window"):
            translate(f"SELECT {bad} FROM ch_dst")


def test_association_aggregates(spark):
    """entropy / cramersV(+bias-corrected) / contingency / theilsU /
    rankCorr — hand-computed on tiny tables. 2×3 case (a = p,p,q;
    b = x,y,y): χ² = 0.75 (zero cell contributes its expectation),
    V = √(0.75/3/1) = 0.5. theilsU: H(a) = −⅔ln⅔ − ⅓ln⅓,
    H(a|b) = ⅔ln2 → U = 1 − H(a|b)/H(a). rankCorr with a tie:
    rx = [1.5, 1.5, 3] vs ry = [1, 2, 3] → 1.5/√3."""
    import math

    spark.createDataFrame(
        [(1, "p", "x"), (1, "p", "y"), (1, "q", "y")],
        "g int, a string, b string",
    ).createOrReplaceTempView("ch_assoc")
    r = spark.sql(
        translate(
            "SELECT entropy(a) AS h, cramersV(a, b) AS cv, "
            "contingency(a, b) AS ct, theilsU(a, b) AS tu "
            "FROM ch_assoc"
        )
    ).collect()[0]
    assert r.h == pytest.approx(
        -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    )
    assert r.cv == pytest.approx(0.5)
    assert r.ct == pytest.approx(math.sqrt(0.75 / 3.75))
    h_a = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert r.tu == pytest.approx((h_a - (2 / 3) * math.log(2)) / h_a)
    # perfect association: V = 1 (and bias-corrected V = 1 on 2×2 with
    # N = 8: the φ² correction and the r̃/c̃ shrinkage cancel exactly)
    spark.createDataFrame(
        [(1, "p", "x")] * 4 + [(1, "q", "y")] * 4,
        "g int, a string, b string",
    ).createOrReplaceTempView("ch_assoc2")
    r2 = spark.sql(
        translate(
            "SELECT cramersV(a, b) AS cv, "
            "cramersVBiasCorrected(a, b) AS cvb FROM ch_assoc2"
        )
    ).collect()[0]
    assert r2.cv == pytest.approx(1.0)
    assert r2.cvb == pytest.approx(1.0)
    spark.createDataFrame(
        [(1, 1.0, 1.0), (1, 1.0, 2.0), (1, 2.0, 3.0)],
        "g int, x double, y double",
    ).createOrReplaceTempView("ch_rc")
    r3 = spark.sql(
        translate("SELECT rankCorr(x, y) AS rc FROM ch_rc")
    ).collect()[0]
    assert r3.rc == pytest.approx(1.5 / math.sqrt(3))


def test_datetime_add_subtract_family(spark):
    _grid(
        spark,
        [
            ("addWeeks(toDate('2024-02-26'), 1)", dt.date(2024, 3, 4)),
            ("addYears(toDate('2024-02-29'), 1)", dt.date(2025, 2, 28)),
            ("addQuarters(toDate('2024-01-15'), 2)", dt.date(2024, 7, 15)),
            ("subtractWeeks(toDate('2024-03-04'), 1)", dt.date(2024, 2, 26)),
            ("subtractMonths(toDate('2024-03-31'), 1)", dt.date(2024, 2, 29)),
            ("subtractQuarters(toDate('2024-07-15'), 2)", dt.date(2024, 1, 15)),
            ("subtractYears(toDate('2024-02-29'), 1)", dt.date(2023, 2, 28)),
            ("toQuarter(toDate('2024-08-15'))", 3),
            (
                "toUnixTimestamp(toDateTime('1970-01-02 00:00:00'))",
                86400,
            ),
            (
                "fromUnixTimestamp(86400)",
                dt.datetime(1970, 1, 2, 0, 0),
            ),
            (
                "addMinutes(toDateTime('2024-01-01 10:59:00'), 2)",
                dt.datetime(2024, 1, 1, 11, 1),
            ),
            (
                "addSeconds(toDateTime('2024-01-01 10:59:59'), 2)",
                dt.datetime(2024, 1, 1, 11, 0, 1),
            ),
            (
                "subtractHours(toDateTime('2024-01-01 00:30:00'), 1)",
                dt.datetime(2023, 12, 31, 23, 30),
            ),
            (
                "subtractMinutes(toDateTime('2024-01-01 00:00:30'), 1)",
                dt.datetime(2023, 12, 31, 23, 59, 30),
            ),
            (
                "subtractSeconds(toDateTime('2024-01-01 00:00:00'), 1)",
                dt.datetime(2023, 12, 31, 23, 59, 59),
            ),
        ],
    )


def test_array_mutation_and_fold(spark):
    """arrayPush*/Pop*/Resize/Compact/Fold/Last/LastIndex/AUC — CH's
    published examples. arrayAUC hand-check: scores [0.1, 0.4, 0.35,
    0.8], labels [0, 0, 1, 1] → positive ranks 2 and 4 → AUC =
    (6 − 3)/(2·2) = 0.75."""
    _grid(
        spark,
        [
            ("arrayPushBack([1,2], 3)", [1, 2, 3]),
            ("arrayPushFront([2,3], 1)", [1, 2, 3]),
            ("arrayPopBack([1,2,3])", [1, 2]),
            ("arrayPopFront([1,2,3])", [2, 3]),
            ("arrayPopBack(arrayPopBack([1]))", []),
            ("arrayPopFront(arraySlice([1], 1, 0))", []),
            ("arrayResize([1,2,3], 2)", [1, 2]),
            ("arrayResize([1,2], 4, 0)", [1, 2, 0, 0]),
            ("arrayCompact([1,1,2,2,2,1,3,3])", [1, 2, 1, 3]),
            ("arrayCompact(arraySlice([1], 1, 0))", []),
            ("arrayFold((acc, x) -> acc + x, [1,2,3,4], toInt64(10))", 20),
            ("arrayLast(x -> x < 3, [1,2,5,2,9])", 2),
            ("arrayLastIndex(x -> x < 3, [1,2,5,2,9])", 4),
            ("arrayLastIndex(x -> x > 99, [1,2])", 0),
            ("arrayAUC([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1])", 0.75),
        ],
    )


def test_scalar_with_rewrite(spark):
    """CH's scalar WITH (``WITH expr AS ident``) binds expressions, not
    CTEs — Spark's WITH is CTE-only, so scalar entries substitute
    textually; genuine CTEs stay; mixed forms split; chained scalar
    references expand in order; scalar subqueries pass through as
    Spark scalar subqueries."""
    r = spark.sql(
        translate("WITH 2 AS k, k * 10 AS k10 SELECT k10 + k AS v")
    ).collect()[0]
    assert r.v == 22
    r2 = spark.sql(
        translate(
            "WITH toDate('2024-01-15') AS d "
            "SELECT toStartOfMonth(d) AS m, addWeeks(d, 2) AS w"
        )
    ).collect()[0]
    assert str(r2.m) == "2024-01-01" and str(r2.w) == "2024-01-29"
    r3 = spark.sql(
        translate("WITH (SELECT 41) AS q SELECT q + 1 AS v")
    ).collect()[0]
    assert r3.v == 42
    # mixed: scalar + CTE — the scalar substitutes INTO the CTE too
    r4 = spark.sql(
        translate(
            "WITH 5 AS x, cte AS (SELECT x AS a) SELECT a, x AS b FROM cte"
        )
    ).collect()[0]
    assert (r4.a, r4.b) == (5, 5)
    # CAST's internal AS must not be mistaken for the alias separator
    r5 = spark.sql(
        translate("WITH CAST(5 AS INT) AS five SELECT five * 2 AS ten")
    ).collect()[0]
    assert r5.ten == 10


def test_star_modifiers(spark):
    """* EXCEPT(cols) is shared CH/Spark syntax and passes through;
    * APPLY / * REPLACE need the result schema and gate."""
    spark.createDataFrame(
        [(1, 2, 3)], "a int, b int, c int"
    ).createOrReplaceTempView("ch_star")
    assert spark.sql(
        translate("SELECT * EXCEPT(b) FROM ch_star")
    ).columns == ["a", "c"]
    with pytest.raises(ValueError, match="APPLY"):
        translate("SELECT * APPLY(sum) FROM ch_star")
    with pytest.raises(ValueError, match="REPLACE"):
        translate("SELECT * REPLACE(a + 1 AS a) FROM ch_star")


def test_multisearch_and_count_matches(spark):
    _grid(
        spark,
        [
            ("multiSearchAllPositions('hello world', ['lo', 'zz', 'wor'])",
             [4, 0, 7]),
            ("multiSearchFirstIndex('hello', ['zz', 'll', 'he'])", 2),
            ("multiSearchFirstIndex('hello', ['zz'])", 0),
            ("multiSearchFirstPosition('hello world', ['wor', 'ello'])", 2),
            ("multiSearchFirstPosition('hello', ['zz'])", 0),
            ("positionCaseInsensitive('Hello World', 'WORLD')", 7),
            ("countMatches('aaa bb aa', 'a+')", 2),  # 'aaa', 'aa'
            ("countMatches('none', 'zz')", 0),
        ],
    )


def test_map_constructors_and_transforms(spark):
    row = spark.sql(
        translate(
            "SELECT map('a', 1, 'b', 2) AS m1, "
            "mapFromArrays(['x', 'y'], [7, 8]) AS m2, "
            "mapKeys(mapFilter((k, v) -> v > 1, map('a', 1, 'b', 2))) AS f, "
            "mapUpdate(map('a', 1, 'b', 2), map('b', 20, 'c', 30)) AS u"
        )
    ).collect()[0]
    assert dict(r for r in row.m1.items()) == {"a": 1, "b": 2}
    assert dict(row.m2.items()) == {"x": 7, "y": 8}
    assert row.f == ["b"]
    assert dict(row.u.items()) == {"a": 1, "b": 20, "c": 30}
    with pytest.raises(ValueError, match="transform_keys"):
        translate("mapApply((k, v) -> (k, v * 2), map('a', 1))")


def test_shingles_ngrams_tokens_quantile_gk(spark):
    _grid(
        spark,
        [
            ("arrayShingles([1,2,3,4], 3)", [[1, 2, 3], [2, 3, 4]]),
            ("arrayShingles([1,2], 3)", []),
            ("ngrams('abcd', 2)", ["ab", "bc", "cd"]),
            ("ngrams('ab', 3)", []),
            ("tokens('Hello, wo_rld!!42')", ["Hello", "wo", "rld", "42"]),
            ("tokens('')", []),
        ],
    )
    rows = spark.sql(
        "SELECT explode(sequence(1, 100)) AS v"
    )
    rows.createOrReplaceTempView("ch_gk")
    r = spark.sql(
        translate(
            "SELECT quantileGK(100)(v) AS med, "
            "quantilesGK(100, 0.25, 0.75)(v) AS qs FROM ch_gk"
        )
    ).collect()[0]
    assert 45 <= r.med <= 55
    assert len(r.qs) == 2 and r.qs[0] < r.qs[1]


def test_format_strip_and_summap_filtered(spark):
    """Trailing FORMAT <name> is an output directive — stripped; an
    identifier merely NAMED format survives. sumMapFiltered folds only
    the pairs whose key is in the parameter set."""
    assert spark.sql(translate("SELECT 1 AS a FORMAT JSONEachRow")).collect()[
        0
    ].a == 1
    assert spark.sql(translate("SELECT 1 AS format")).collect()[0][0] == 1
    spark.createDataFrame(
        [(1, [1, 2, 3], [10, 20, 30]), (1, [2, 4], [200, 400])],
        "g int, ks array<int>, vs array<int>",
    ).createOrReplaceTempView("ch_smf")
    r = spark.sql(
        translate(
            "SELECT tupleElement(sumMapFiltered([2, 3])(ks, vs), 1) AS k, "
            "tupleElement(sumMapFiltered([2, 3])(ks, vs), 2) AS v "
            "FROM ch_smf GROUP BY g"
        )
    ).collect()[0]
    assert list(r.k) == [2, 3] and list(r.v) == [220, 30]


def test_exact_interpolated_quantiles_and_sorted_topk(spark):
    """quantileExactInclusive = Hyndman-Fan R-7 (Spark's percentile);
    quantileExactExclusive = R-6 with rank p(n+1) clamped to the
    extremes. Hand values over [1..10]: inclusive p25 = 3.25 (rank
    0.25·9+1 = 3.25), exclusive p25 = 2.75 (rank 0.25·11 = 2.75);
    exclusive clamps at the edges."""
    spark.createDataFrame(
        [(1, float(v)) for v in range(1, 11)], "g int, v double"
    ).createOrReplaceTempView("ch_q")
    r = spark.sql(
        translate(
            "SELECT quantileExactInclusive(0.25)(v) AS qi, "
            "quantileExactExclusive(0.25)(v) AS qe, "
            "quantileExactExclusive(0.05)(v) AS qlo, "
            "quantileExactExclusive(0.95)(v) AS qhi, "
            "groupArraySorted(3)(v) AS g3, "
            "sumKahan(v) AS sk, "
            "singleValueOrNull(v) AS sv "
            "FROM ch_q"
        )
    ).collect()[0]
    assert r.qi == pytest.approx(3.25)
    assert r.qe == pytest.approx(2.75)
    assert r.qlo == pytest.approx(1.0)  # 0.05·11 = 0.55 < 1 → min
    assert r.qhi == pytest.approx(10.0)  # 0.95·11 = 10.45 ≥ n → max
    assert r.g3 == [1.0, 2.0, 3.0]
    assert r.sk == pytest.approx(55.0)
    assert r.sv is None
    r2 = spark.sql(
        translate(
            "SELECT singleValueOrNull(x) AS sv FROM "
            "(SELECT 7 AS x UNION ALL SELECT 7)"
        )
    ).collect()[0]
    assert r2.sv == 7


def test_half_md5_and_int_hash64(spark):
    """halfMD5 = big-endian UInt64 of MD5's first 8 bytes (signed
    two's-complement view, same documented class as toUInt64);
    intHash64 = Murmur3's fmix64 finalizer (ClickHouse's public integer
    mix). Expected values computed by from-scratch Python references."""
    import hashlib

    def ref_half_md5(s: str) -> int:
        v = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
        return v - (1 << 64) if v >= (1 << 63) else v

    def ref_int_hash64(x: int) -> int:
        m = (1 << 64) - 1
        x &= m
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) & m
        x ^= x >> 33
        x = (x * 0xC4CEB9FE1A85EC53) & m
        x ^= x >> 33
        return x - (1 << 64) if x >= (1 << 63) else x

    _grid(
        spark,
        [
            ("halfMD5('abc')", ref_half_md5("abc")),
            ("halfMD5('')", ref_half_md5("")),
            ("halfMD5('clickhouse')", ref_half_md5("clickhouse")),
            ("intHash64(42)", ref_int_hash64(42)),
            ("intHash64(0)", ref_int_hash64(0)),
            ("intHash64(-7)", ref_int_hash64(-7)),
            ("intHash64(123456789012345)", ref_int_hash64(123456789012345)),
        ],
    )
    with pytest.raises(ValueError, match="xxhash64"):
        translate("cityHash64('x')")


def test_r4_late_family_edges(spark):
    """Empty / degenerate inputs across the r4-late families — the
    class of silent edge the driver audits for. Typed empties are
    built with arraySlice (bare [] is ARRAY<NULL> and cannot type some
    builtins)."""
    _grid(
        spark,
        [
            # vector folds over empty arrays: sums are 0, cosine is
            # 0/0 → NULL under Spark double division (CH: nan —
            # documented divergence class), Linf coalesces to 0
            ("dotProduct(arraySlice([1], 1, 0), arraySlice([1], 1, 0))", 0.0),
            ("L2Norm(arraySlice([1.0], 1, 0))", 0.0),
            ("LinfNorm(arraySlice([1.0], 1, 0))", 0.0),
            (
                "cosineDistance(arraySlice([1.0], 1, 0), "
                "arraySlice([1.0], 1, 0))",
                None,
            ),
            # single-element and duplicate-x edges
            ("LpNorm([5], 3)", 5.0),
            ("arrayAUC([0.5, 0.5], [0, 1])", 0.5),  # tied scores → 0.5
            ("arrayROCAUC([0.1, 0.9], [0, 1])", 1.0),
            # shingle/ngram degenerate sizes already pinned; resize to 0
            ("arrayResize([1,2,3], 0)", []),
            ("arrayCompact([7])", [7]),
            ("arrayFold((acc, x) -> acc + x, arraySlice([1], 1, 0), 9)", 9),
        ],
    )
    # deltaSumTimestamp: single row and empty group both fold to 0
    spark.createDataFrame(
        [(1, 10, 5.0)], "g int, ts int, v double"
    ).createOrReplaceTempView("ch_dst1")
    assert spark.sql(
        translate("SELECT deltaSumTimestamp(v, ts) AS d FROM ch_dst1")
    ).collect()[0].d == 0.0
    # rankCorr with a constant side: 0/0 → NaN (CH: nan too)
    spark.createDataFrame(
        [(1, 1.0, 2.0), (1, 1.0, 3.0)], "g int, x double, y double"
    ).createOrReplaceTempView("ch_rc0")
    import math

    v = spark.sql(
        translate("SELECT rankCorr(x, y) AS r FROM ch_rc0")
    ).collect()[0].r
    assert v is None or math.isnan(v)
    # entropy of a single repeated value is exactly 0
    spark.createDataFrame(
        [(1, "a"), (1, "a")], "g int, v string"
    ).createOrReplaceTempView("ch_h0")
    assert spark.sql(
        translate("SELECT entropy(v) AS h FROM ch_h0")
    ).collect()[0].h == 0.0


def test_string_utf8_variants_and_dict_has(spark):
    _grid(
        spark,
        [
            ("arrayReverseSort([3, 1, 2])", [3, 2, 1]),
            ("positionUTF8('héllo wörld', 'wörld')", 7),
            ("countSubstringsCaseInsensitive('AbaBAb', 'ab')", 3),
            ("countSubstringsCaseInsensitive('xyz', 'ab')", 0),
            ("splitByWhitespace('  a  b\\tc ')", ["a", "b", "c"]),
        ],
    )
    # dictHas: membership subquery against the registered view
    spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "uid int, tier string"
    ).createOrReplaceTempView("ch_dh_dim")
    rows = spark.sql(
        translate(
            "SELECT dictHas('dim.tiers', 1) AS a, "
            "dictHas('dim.tiers', 99) AS b",
            dictionaries={"dim.tiers": ("ch_dh_dim", "uid")},
        )
    ).collect()[0]
    assert (rows.a, rows.b) == (True, False)
    with pytest.raises(ValueError, match="not registered"):
        translate("dictHas('nope', 1)")


def test_date_trunc_iso_year_and_millis(spark):
    _grid(
        spark,
        [
            (
                "dateTrunc('month', toDateTime('2024-03-05 07:08:09'))",
                dt.datetime(2024, 3, 1),
            ),
            ("toISOYear(toDate('2021-01-01'))", 2020),  # ISO week 53/2020
            ("toISOYear(toDate('2024-12-30'))", 2025),  # Monday of wk 1
            ("toISOYear(toDate('2024-06-15'))", 2024),
            (
                "toUnixTimestamp64Milli(toDateTime('1970-01-02 00:00:00'))",
                86400000,
            ),
            ("splitByRegexp('[0-9]+', 'a1bb22ccc')", ["a", "bb", "ccc"]),
            (
                "toMillisecond(toDateTime64('2024-01-01 00:00:02.123', 3))",
                123,
            ),
        ],
    )
    # replaceRegexpOne maps as of r5 (regexp_instr splice); only
    # backreference replacements stay gated
    _grid(
        spark,
        [
            ("replaceRegexpOne('a1b22c', '[0-9]+', 'X')", "aXb22c"),
            ("replaceRegexpOne('abc', '[0-9]+', 'X')", "abc"),
            ("replaceRegexpOne('', '[0-9]+', 'X')", ""),
        ],
    )
    with pytest.raises(ValueError, match="backreference"):
        translate(r"replaceRegexpOne(s, '(a)', '\1x')")


def test_bitmap_algebra_and_enumerates(spark):
    """The rest of the bitmap algebra on the sorted-array state
    representation, the groupBitmapAnd/Or/Xor aggregates (CH returns
    CARDINALITY), and arrayEnumerateDense/Uniq."""
    _grid(
        spark,
        [
            ("bitmapXor([1,2,3], [2,3,4])", [1, 4]),
            ("bitmapAndnot([1,2,3], [2,3,4])", [1]),
            ("bitmapXorCardinality([1,2,3], [2,3,4])", 2),
            ("bitmapAndnotCardinality([1,2,3], [2,3,4])", 1),
            ("bitmapContains([1,5,9], 5)", True),
            ("bitmapContains([1,5,9], 4)", False),
            ("bitmapHasAny([1,2], [2,3])", True),
            ("bitmapHasAll([1,2,3], [2,3])", True),
            ("bitmapHasAll([1,2], [2,3])", False),
            ("bitmapMin([4,1,9])", 1),
            ("bitmapMax([4,1,9])", 9),
            ("subBitmap([5,1,9,3], 1, 2)", [3, 5]),
            ("bitmapSubsetInRange([1,5,9,12], 5, 12)", [5, 9]),
            ("bitmapSubsetLimit([9,1,5,12], 5, 2)", [5, 9]),
            ("arrayEnumerateDense([10, 20, 10, 30])", [1, 2, 1, 3]),
            ("arrayEnumerateUniq([10, 20, 10, 10])", [1, 1, 2, 3]),
            ("arrayEnumerateUniq(arraySlice([1], 1, 0))", []),
        ],
    )
    spark.createDataFrame(
        [(1, [1, 2, 3]), (1, [2, 3, 4]), (1, [2, 5])],
        "g int, b array<int>",
    ).createOrReplaceTempView("ch_gb")
    r = spark.sql(
        translate(
            "SELECT groupBitmapAnd(b) AS a, groupBitmapOr(b) AS o, "
            "groupBitmapXor(b) AS x FROM ch_gb GROUP BY g"
        )
    ).collect()[0]
    # AND: {2}; OR: {1,2,3,4,5}; XOR (odd multiplicity): 1,4,5,3? —
    # counts: 1:1, 2:3, 3:2, 4:1, 5:1 → odd: {1,2,4,5}
    assert (r.a, r.o, r.x) == (1, 5, 4)


def test_has_token(spark):
    _grid(
        spark,
        [
            ("hasToken('Hello.World kit', 'World')", True),
            ("hasToken('HelloWorld', 'World')", False),  # not delimited
            ("hasToken('a-b c', 'b')", True),
            ("hasTokenCaseInsensitive('Hello.WORLD', 'world')", True),
            ("hasTokenCaseInsensitive('HelloWORLD', 'world')", False),
        ],
    )


def test_advice_r4_regressions(spark):
    """ADVICE r4 defects, each pinned: arrayResize negative size
    (CH pads/truncates from the LEFT), intHash64(NULL) -> NULL,
    quantileGK 2-param level honored, groupBitmapAnd over an all-NULL
    group returns 0 instead of a negative-slice runtime error."""
    _grid(
        spark,
        [
            ("arrayResize([1,2,3], -2)", [2, 3]),
            ("arrayResize([1,2,3], -5, 9)", [9, 9, 1, 2, 3]),
            ("arrayResize([1,2,3], -3)", [1, 2, 3]),
            ("arrayResize([1,2,3], 0)", []),
            ("intHash64(NULL)", None),
        ],
    )
    q = spark.sql(
        translate(
            "SELECT quantileGK(10000, 0.95)(x) AS q FROM "
            "(SELECT explode(sequence(1, 100)) AS x) t"
        )
    ).collect()[0][0]
    assert q == 95
    with pytest.raises(ValueError, match="quantileGK"):
        translate("SELECT quantileGK(100, 0.5, 1)(x) FROM t")
    c = spark.sql(
        translate(
            "SELECT groupBitmapAnd(b) AS c FROM "
            "(SELECT CAST(NULL AS ARRAY<INT>) AS b "
            "UNION ALL SELECT CAST(NULL AS ARRAY<INT>)) t"
        )
    ).collect()[0][0]
    assert c == 0


def test_point_in_polygon_ray_cast(spark):
    """pointInPolygon vs an independent pure-Python even-odd ray
    caster, over randomized polygons + hand-picked shapes (concave,
    holes, horizontal edges)."""
    import random

    def ref_inside(px, py, ring):
        inside = False
        n = len(ring)
        for i in range(n):
            ax, ay = ring[i - 1]
            bx, by = ring[i]
            if (ay > py) != (by > py):
                xcross = (bx - ax) * (py - ay) / (by - ay) + ax
                if px < xcross:
                    inside = not inside
        return inside

    random.seed(5)
    cases = []
    for _ in range(40):
        n = random.randint(3, 8)
        ring = [
            (round(random.uniform(0, 4), 3), round(random.uniform(0, 4), 3))
            for _ in range(n)
        ]
        px = round(random.uniform(-0.5, 4.5), 3)
        py = round(random.uniform(-0.5, 4.5), 3)
        cases.append((px, py, ring))
    # hand-picked: concave notch, horizontal edges, degenerate sliver
    cases += [
        (1.0, 1.5, [(0, 0), (2, 0), (2, 2), (1, 0.8), (0, 2)]),
        (0.5, 0.0001, [(0, 0), (1, 0), (0.5, 1)]),
        (0.5, 0.5, [(0, 0), (1, 0), (1, 0), (0, 1)]),
    ]
    sqls, want = [], []
    for px, py, ring in cases:
        ring_sql = "[" + ",".join(f"({x!r},{y!r})" for x, y in ring) + "]"
        sqls.append(f"pointInPolygon(({px!r}, {py!r}), {ring_sql})")
        want.append(ref_inside(px, py, [(float(x), float(y))
                                        for x, y in ring]))
    row = spark.sql(translate(
        "SELECT " + ", ".join(f"{s} AS c{i}" for i, s in enumerate(sqls))
    )).collect()[0]
    for i, w in enumerate(want):
        assert row[f"c{i}"] == w, (i, cases[i])
    # holes: even-odd across rings
    q = translate(
        "SELECT pointInPolygon((2.0, 2.0), "
        "[(0.,0.),(4.,0.),(4.,4.),(0.,4.)], "
        "[(1.,1.),(3.,1.),(3.,3.),(1.,3.)]) AS a, "
        "pointInPolygon((0.5, 2.0), "
        "[(0.,0.),(4.,0.),(4.,4.),(0.,4.)], "
        "[(1.,1.),(3.,1.),(3.,3.),(1.,3.)]) AS b"
    )
    r = spark.sql(q).collect()[0]
    assert r["a"] is False and r["b"] is True


def test_geohash_published_anchors(spark):
    """geohashEncode/Decode against the published example hashes and
    round-trip properties (cell size shrinks 32x per character)."""
    import random

    q = translate(
        "SELECT geohashEncode(-5.60302734375, 42.60498046875, 5) AS g5, "
        "geohashEncode(10.40744, 57.64911, 11) AS g11, "
        "length(geohashEncode(1.0, 2.0)) AS dflt, "
        "geohashDecode('ezs42').1 AS lon, "
        "geohashDecode('ezs42').2 AS lat, "
        "geohashEncode(NULL, 1.0, 5) AS gnull, "
        "geohashDecode('not a hash!').1 AS bad"
    )
    r = spark.sql(q).collect()[0]
    assert r["g5"] == "ezs42"
    assert r["g11"] == "u4pruydqqvj"
    assert r["dflt"] == 12  # CH default precision
    assert abs(r["lon"] + 5.603) < 0.01 and abs(r["lat"] - 42.605) < 0.01
    assert r["gnull"] is None and r["bad"] is None

    random.seed(9)
    cases = [
        (round(random.uniform(-180, 180), 5), round(random.uniform(-90, 90), 5),
         random.randint(1, 12))
        for _ in range(25)
    ]
    sel = ", ".join(
        f"geohashDecode(geohashEncode({lo!r}, {la!r}, {p})).1 AS lo{i}, "
        f"geohashDecode(geohashEncode({lo!r}, {la!r}, {p})).2 AS la{i}"
        for i, (lo, la, p) in enumerate(cases)
    )
    row = spark.sql(translate(f"SELECT {sel}")).collect()[0]
    for i, (lo, la, p) in enumerate(cases):
        nbits = 5 * p
        cell_lon = 360.0 / (1 << ((nbits + 1) // 2))
        cell_lat = 180.0 / (1 << (nbits // 2))
        assert abs(row[f"lo{i}"] - lo) <= cell_lon / 2 + 1e-9, (i, cases[i])
        assert abs(row[f"la{i}"] - la) <= cell_lat / 2 + 1e-9, (i, cases[i])


def test_group_array_insert_at(spark):
    """groupArrayInsertAt(default[, size])(x, pos): positions fill,
    gaps pad with the explicit default, duplicate positions pin to the
    MINIMUM value (CH documents multi-threaded resolution as
    undetermined — translate makes it deterministic), NULL positions
    are skipped, and the parameterless form gates."""
    import pytest as _pytest

    spark.createDataFrame(
        [(1, 0, 10), (1, 3, 30), (1, 3, 25), (1, 1, 11),
         (2, 2, 7), (3, None, 9)],
        "g int, pos int, v int",
    ).createOrReplaceTempView("gia_t")
    rows = {
        r["g"]: r
        for r in spark.sql(translate(
            "SELECT g, groupArrayInsertAt(-1)(v, pos) AS a, "
            "groupArrayInsertAt(0, 6)(v, pos) AS b "
            "FROM gia_t GROUP BY g"
        )).collect()
    }
    assert rows[1]["a"] == [10, 11, -1, 25]  # min of the pos-3 pair
    assert rows[1]["b"] == [10, 11, 0, 25, 0, 0]
    assert rows[2]["a"] == [-1, -1, 7]
    assert rows[3]["a"] == []  # only NULL positions -> empty
    with _pytest.raises(ValueError, match="default"):
        translate("SELECT groupArrayInsertAt(v, pos) FROM gia_t")


def test_array_rotate_shift_partial_sort(spark):
    """arrayRotateLeft/Right (cyclic, negative flips, modulo size),
    arrayShiftLeft/Right (length-preserving, explicit default), and
    arrayPartialSort (full sort = conforming instance of CH's
    unspecified tail); 2-arg shifts and randomized samplers gate."""
    import pytest as _pytest

    r = spark.sql(translate(
        "SELECT arrayRotateLeft([1,2,3,4,5], 2) AS rl, "
        "arrayRotateLeft([1,2,3,4,5], -1) AS rln, "
        "arrayRotateRight([1,2,3,4,5], 2) AS rr, "
        "arrayRotateLeft([1,2,3], 7) AS rbig, "
        "arrayRotateLeft(CAST(array() AS ARRAY<INT>), 3) AS rempty, "
        "arrayShiftLeft([1,2,3,4,5], 2, 0) AS sl, "
        "arrayShiftRight([1,2,3,4,5], 2, 0) AS sr, "
        "arrayShiftLeft([1,2,3], -1, 9) AS sln, "
        "arrayShiftLeft([1,2,3], 99, 0) AS sbig, "
        "arrayPartialSort(2, [5,1,4,2,3]) AS ps, "
        "arrayPartialReverseSort(2, [5,1,4,2,3]) AS prs"
    )).collect()[0]
    assert r["rl"] == [3, 4, 5, 1, 2] and r["rln"] == [5, 1, 2, 3, 4]
    assert r["rr"] == [4, 5, 1, 2, 3] and r["rbig"] == [2, 3, 1]
    assert r["rempty"] == []
    assert r["sl"] == [3, 4, 5, 0, 0] and r["sr"] == [0, 0, 1, 2, 3]
    assert r["sln"] == [9, 1, 2] and r["sbig"] == [0, 0, 0]
    assert r["ps"] == [1, 2, 3, 4, 5] and r["prs"] == [5, 4, 3, 2, 1]
    with _pytest.raises(ValueError, match="default"):
        translate("SELECT arrayShiftLeft([1,2], 1)")
    with _pytest.raises(ValueError, match="nondeterministic"):
        translate("SELECT arrayShuffle([1,2,3])")


def test_parse_datetime_timeslots_map_arith(spark):
    """parseDateTime family (MySQL %-codes via the shared rewriter;
    strict raises in both engines, OrNull/OrZero soften), timeSlots
    slot alignment, and the Map arithmetic family (union keys, missing
    = 0; integer-key gap fill)."""
    import pytest as _pytest

    r = spark.sql(translate(
        "SELECT parseDateTime('2024-02-29 13:45:01', "
        "'%Y-%m-%d %H:%i:%S') AS p1, "
        "parseDateTimeOrNull('bogus', '%Y-%m-%d') AS p2, "
        "parseDateTimeOrZero('bogus', '%Y-%m-%d') AS p3, "
        "parseDateTimeInJodaSyntax('2024/02/29', 'yyyy/MM/dd') AS p4, "
        "timeSlots(toDateTime('2024-01-01 10:05:00'), 3600, 1800) AS ts, "
        "size(timeSlots(toDateTime('2024-01-01 10:05:00'), 600)) AS tsd, "
        "mapAdd(map('a', 1, 'b', 2), map('b', 10, 'c', 3)) AS ma, "
        "mapSubtract(map('a', 5), map('a', 2, 'z', 1)) AS ms, "
        "mapPopulateSeries(map(1, 11, 4, 44)) AS mp, "
        "mapPopulateSeries(map(1, 11, 3, 33), 5) AS mp2"
    )).collect()[0]
    assert str(r["p1"]) == "2024-02-29 13:45:01"
    assert r["p2"] is None and str(r["p3"]).startswith("1970-01-01")
    assert str(r["p4"]).startswith("2024-02-29")
    assert [str(t)[11:16] for t in r["ts"]] == ["10:00", "10:30", "11:00"]
    assert r["tsd"] == 1  # 10:05+600s stays inside the 10:00 slot
    assert sorted(r["ma"].items()) == [("a", 1), ("b", 12), ("c", 3)]
    assert sorted(r["ms"].items()) == [("a", 3), ("z", -1)]
    assert sorted(r["mp"].items()) == [(1, 11), (2, 0), (3, 0), (4, 44)]
    assert sorted(r["mp2"].items()) == [
        (1, 11), (2, 0), (3, 33), (4, 0), (5, 0)]
    with _pytest.raises(ValueError, match="tuple-of-arrays"):
        translate("SELECT mapAdd(([1],[2]), ([1],[3]))")
    with _pytest.raises(ValueError, match="timezone"):
        translate("SELECT parseDateTime('x', '%Y', 'UTC')")
    # strict parse of malformed input raises at runtime in both engines
    with _pytest.raises(Exception):
        spark.sql(translate(
            "SELECT parseDateTime('nope', '%Y-%m-%d') AS x"
        )).collect()


def test_array_zip_tuple_field_names(spark):
    """arrayZip must yield tuples whose elements answer to CH's .1/.2
    positional access (col1/col2… struct fields here) — Spark's raw
    arrays_zip names fields after the input expressions instead."""
    r = spark.sql(translate(
        "SELECT arrayZip(['a','b'], [1,2]) AS z2, "
        "arrayMap(t -> concat(t.1, toString(t.2)), "
        "arrayZip(['x','y'], [7,8])) AS acc, "
        "arrayMap(t -> t.3, arrayZip([1], [2], [30])) AS z3"
    )).collect()[0]
    assert [t.asDict() for t in r["z2"]] == [
        {"col1": "a", "col2": 1}, {"col1": "b", "col2": 2}]
    assert list(r["acc"]) == ["x7", "y8"]
    assert list(r["z3"]) == [30]


def _mysql_calc_week(d, mode, yearweek=False):
    """Literal transcription of MySQL my_time.c calc_week (the
    semantics CH adopts), plus CH's newyear-day modes 8/9 — the
    independent reference the Catalyst closed form must match."""
    import datetime as _dt

    def days_in_year(y):
        return 366 if (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)) \
            else 365

    if mode >= 8:
        monday = bool(mode & 1)

        def ws(dd):
            off = dd.weekday() if monday else (dd.weekday() + 1) % 7
            return dd - _dt.timedelta(days=off)

        w = ws(d)
        yr = (w + _dt.timedelta(days=6)).year
        wk = (w - ws(_dt.date(yr, 1, 1))).days // 7 + 1
        return yr * 100 + wk if yearweek else wk

    behaviour = mode & 7
    if not (behaviour & 1):
        behaviour ^= 4
    if yearweek:
        behaviour |= 2
    monday_first = bool(behaviour & 1)
    week_year = bool(behaviour & 2)
    first_weekday = bool(behaviour & 4)
    daynr = d.toordinal()
    jan1 = _dt.date(d.year, 1, 1)
    first_daynr = jan1.toordinal()
    weekday = jan1.weekday() if monday_first else (jan1.weekday() + 1) % 7
    year = d.year
    if d.month == 1 and d.day <= 7 - weekday:
        if not week_year and ((first_weekday and weekday != 0) or
                              (not first_weekday and weekday >= 4)):
            return year * 100 if yearweek else 0
        week_year = True
        year -= 1
        days = days_in_year(year)
        first_daynr -= days
        weekday = (weekday + 53 * 7 - days) % 7
    if (first_weekday and weekday != 0) or \
            (not first_weekday and weekday >= 4):
        days = daynr - (first_daynr + (7 - weekday))
    else:
        days = daynr - (first_daynr - weekday)
    if week_year and days >= 52 * 7:
        weekday = (weekday + days_in_year(year)) % 7
        if (not first_weekday and weekday < 4) or \
                (first_weekday and weekday == 0):
            return (year + 1) * 100 + 1 if yearweek else 1
    wk = days // 7 + 1
    return year * 100 + wk if yearweek else wk


def test_week_modes_full_table(spark):
    """toWeek modes 0-9 and toYearWeek vs a literal transcription of
    MySQL calc_week: the published doc vector for 2000-01-01, ISO year
    wraps, and a seeded sweep concentrated on year boundaries."""
    import datetime as _dt
    import random as _random

    assert [_mysql_calc_week(_dt.date(2000, 1, 1), m) for m in range(8)] \
        == [0, 0, 52, 52, 0, 0, 52, 52]
    assert _mysql_calc_week(_dt.date(2014, 12, 29), 3) == 1
    assert _mysql_calc_week(_dt.date(2000, 1, 1), 0, True) == 199952

    rng = _random.Random(20260815)
    dates = []
    for y in range(1996, 2031, 3):
        for day in (1, 2, 3, 4, 5, 6, 7):
            dates.append(_dt.date(y, 1, day))
        for day in (25, 28, 29, 30, 31):
            dates.append(_dt.date(y, 12, day))
    for _ in range(40):
        dates.append(_dt.date(1970, 1, 1)
                     + _dt.timedelta(days=rng.randrange(0, 36500)))

    sel = ", ".join(
        f"toWeek(toDate(s), {m}) AS w{m}, "
        f"toYearWeek(toDate(s), {m}) AS yw{m}"
        for m in range(10)
    )
    df = spark.createDataFrame(
        [(d.isoformat(),) for d in dates], "s string")
    df.createOrReplaceTempView("week_fuzz_dates")
    rows = spark.sql(translate(
        f"SELECT s, toWeek(toDate(s)) AS wdef, toYearWeek(toDate(s)) "
        f"AS ywdef, {sel} FROM week_fuzz_dates")).collect()
    assert len(rows) == len(dates)
    for r in rows:
        d = _dt.date.fromisoformat(r["s"])
        assert r["wdef"] == _mysql_calc_week(d, 0), (d, "default")
        assert r["ywdef"] == _mysql_calc_week(d, 0, True), (d, "ywdef")
        for m in range(10):
            assert r[f"w{m}"] == _mysql_calc_week(d, m), (d, m)
            assert r[f"yw{m}"] == _mysql_calc_week(d, m, True), (d, m, "yw")


def test_round_ladders_mjd_and_misc_batch(spark):
    """roundDuration/roundAge documented ladders, roundToExp2 power-of-
    two floor, Modified Julian Day round trips, NULL-propagating
    concatWithSeparator, equal-length translate, *Stable stats, and
    deterministic quantiles (determinator dropped)."""
    import pytest as _pytest

    r = spark.sql(translate(
        "SELECT roundDuration(230) AS rd1, roundDuration(0) AS rd2, "
        "roundDuration(36001) AS rd3, "
        "roundAge(0) AS ra0, roundAge(17) AS ra17, roundAge(23) AS ra23, "
        "roundAge(44) AS ra44, roundAge(100) AS ra100, "
        "roundToExp2(0) AS re0, roundToExp2(1) AS re1, "
        "roundToExp2(300) AS re300, roundToExp2(1024) AS re1024, "
        "toModifiedJulianDay('1858-11-17') AS mjd0, "
        "toModifiedJulianDay('2020-01-01') AS mjd1, "
        "fromModifiedJulianDay(58849) AS fmjd, "
        "toModifiedJulianDayOrNull('bogus') AS mjdn, "
        "fromModifiedJulianDayOrNull(99999999) AS fmjdn, "
        "concatWithSeparator('-', 'a', 'b') AS cw1, "
        "concat_ws(',', 'x', CAST(NULL AS STRING)) AS cw2, "
        "translate('abca', 'ab', 'xy') AS tr1, "
        "toValidUTF8('plain') AS tv"
    )).collect()[0]
    assert (r["rd1"], r["rd2"], r["rd3"]) == (180, 0, 36000)
    assert (r["ra0"], r["ra17"], r["ra23"], r["ra44"], r["ra100"]) == \
        (0, 17, 18, 35, 55)
    assert (r["re0"], r["re1"], r["re300"], r["re1024"]) == (0, 1, 256, 1024)
    assert r["mjd0"] == 0 and r["mjd1"] == 58849
    assert r["fmjd"] == "2020-01-01"
    assert r["mjdn"] is None and r["fmjdn"] is None
    assert r["cw1"] == "a-b" and r["cw2"] is None  # CH: any NULL -> NULL
    assert r["tr1"] == "xycx" and r["tv"] == "plain"

    g = spark.sql(translate(
        "SELECT corrStable(x, y) AS c, varPopStable(x) AS v, "
        "stddevSampStable(y) AS s, "
        "medianDeterministic(x, 17) AS md, "
        "quantileDeterministic(0.5)(x, 17) AS qd, "
        "quantilesDeterministic(0.0, 1.0)(y, 17) AS qsd "
        "FROM VALUES (1.0, 2.0), (2.0, 4.0), (3.0, 7.0) AS t(x, y)"
    )).collect()[0]
    assert abs(g["c"] - 0.9933992677987828) < 1e-9
    assert abs(g["v"] - 2.0 / 3.0) < 1e-12
    assert g["md"] == 2.0 and g["qd"] == 2.0
    assert list(g["qsd"]) == [2.0, 7.0]

    with _pytest.raises(ValueError, match="same length"):
        translate("SELECT translate(s, 'ab', 'xyz')")
    with _pytest.raises(ValueError, match="same length"):
        translate("SELECT translateUTF8(s, 'abc', 'x')")


def test_divergence_guard_batch(spark):
    """Functions where Spark has a SAME-NAMED builtin with different
    semantics — the passthrough would silently mistranslate: negative
    left/right lengths, NULL-propagating greatest/least, CH initcap
    word rule (any non-alnum separates; rest lowercased), CH 21.3
    locate (= position, haystack first), substringIndex."""
    import pytest as _pytest

    r = spark.sql(translate(
        "SELECT left('abcdef', 2) AS l1, left('abcdef', -2) AS l2, "
        "right('abcdef', 2) AS r1, right('abcdef', -2) AS r2, "
        "left('ab', -5) AS l3, "
        "greatest(1, 2) AS g1, greatest(1, CAST(NULL AS INT)) AS g2, "
        "least(CAST(NULL AS INT), 2) AS l4, "
        "initcap('hello-world FOO_bar 2x') AS ic, "
        "locate('haystack', 'st') AS lc1, "
        "substringIndex('a.b.c', '.', 2) AS si, "
        "reverseUTF8('abc') AS rv"
    )).collect()[0]
    # locate's start_pos form gates (byte-offset arithmetic)
    with pytest.raises(ValueError, match="start_pos"):
        translate("SELECT locate('xxabxab', 'ab', 4)")
    assert (r["l1"], r["l2"], r["l3"]) == ("ab", "abcd", "")
    assert (r["r1"], r["r2"]) == ("ef", "cdef")
    assert r["g1"] == 2 and r["g2"] is None and r["l4"] is None
    # '2x': the first symbol is a digit — toupper('2') is '2' and the
    # rest still lowercases, per CH's per-word rule
    assert r["ic"] == "Hello-World Foo_Bar 2x"
    assert r["lc1"] == 4
    assert r["si"] == "a.b" and r["rv"] == "cba"

    for bad, msg in [
        ("ngramDistance(a, b)", "2\\^16"),
        ("normalizeQuery(s)", "implementation-defined"),
        ("sparkbar(9)(x, y)", "bar chart"),
        ("tupleToNameValuePairs(t)", "field names"),
    ]:
        with _pytest.raises(ValueError, match=msg):
            translate(f"SELECT {bad}")


def test_datetime_completion_batch(spark):
    """r5-late date/time completion: toRelative{Week,Month,Quarter,
    Year}Num (DateLUTImpl formulas — week 0 contains the epoch, weeks
    roll on Mondays), DateTime64 tick family, snowflake IDs (epoch
    1288834974657 ms), makeDate both arities, days-since-year-zero,
    toLastDayOfWeek both conventions, pinned-UTC constants."""
    import pytest as _pytest

    r = spark.sql(translate(
        "SELECT toRelativeWeekNum(toDate('1970-01-01')) AS w0, "
        "toRelativeWeekNum(toDate('1970-01-04')) AS w0b, "   # Sunday
        "toRelativeWeekNum(toDate('1970-01-05')) AS w1, "    # Monday
        "toRelativeMonthNum(toDate('2002-01-15')) AS mn, "
        "toRelativeQuarterNum(toDate('2002-04-01')) AS qn, "
        "toRelativeYearNum(toDate('2002-04-01')) AS yn, "
        "fromUnixTimestamp64Milli(1577836805250) AS f64, "
        "toUnixTimestamp64Micro(toDateTime('2020-01-01 00:00:05')) AS u64, "
        "toUnixTimestamp64Nano(toDateTime('2020-01-01 00:00:05')) AS n64, "
        "snowflakeToDateTime(1426860702736191488) AS sf, "
        "dateTime64ToSnowflake(snowflakeToDateTime64(1426860702736191488)) AS sfrt, "
        "makeDate(2024, 5, 1) AS md, makeDate(2024, 32) AS md2, "
        "makeDateTime(2024, 2, 29, 13, 45, 1) AS mdt, "
        "toDaysSinceYearZero(toDate('1970-01-01')) AS dz, "
        "fromDaysSinceYearZero(719528) AS dzr, "
        "toLastDayOfWeek(toDate('2024-01-03')) AS lw0, "   # Wed -> Sat
        "toLastDayOfWeek(toDate('2024-01-03'), 1) AS lw1, "  # -> Sun
        "timeDiff(toDateTime('2020-01-01 00:00:00'), "
        "toDateTime('2020-01-01 00:01:30')) AS td, "
        "serverTimezone() AS tz, "
        "toTimezone(toDateTime('2020-01-01 00:00:05'), 'UTC') AS tt"
    )).collect()[0]
    assert (r["w0"], r["w0b"], r["w1"]) == (0, 0, 1)
    assert r["mn"] == 2002 * 12 + 1
    assert r["qn"] == 2002 * 4 + 1 and r["yn"] == 2002
    assert str(r["f64"]) == "2020-01-01 00:00:05.250000"
    assert r["u64"] == 1577836805000000 and r["n64"] == r["u64"] * 1000
    # snowflake 1426860702736191488 >> 22 = 340211812770 ms after the
    # twitter epoch -> 2021-12-15 ... just pin the round trip + year
    assert str(r["sf"]).startswith("2021-")
    assert r["sfrt"] >> 22 == 1426860702736191488 >> 22
    assert str(r["md"]) == "2024-05-01" and str(r["md2"]) == "2024-02-01"
    assert str(r["mdt"]) == "2024-02-29 13:45:01"
    assert r["dz"] == 719528 and str(r["dzr"]) == "1970-01-01"
    assert str(r["lw0"]) == "2024-01-06" and str(r["lw1"]) == "2024-01-07"
    assert r["td"] == 90 and r["tz"] == "UTC"
    assert str(r["tt"]) == "2020-01-01 00:00:05"

    with _pytest.raises(ValueError, match="pins sessions to UTC"):
        translate("SELECT toTimezone(t, 'Asia/Shanghai')")
    with _pytest.raises(ValueError, match="timezone overload"):
        translate("SELECT makeDateTime(2024, 1, 1, 0, 0, 0, 'UTC')")


def test_moment_aggregates_pearson_vs_excess(spark):
    """CH kurtPop is raw Pearson mu4/sigma^4 (normal = 3); Spark's
    kurtosis is excess — the mapping must add 3. Sample variants =
    population x ((n-1)/n)^k. Hand set {0,0,1,1}: m2=.25, m4=.0625
    -> kurtPop 1.0; varSamp=1/3 -> kurtSamp = .0625/(1/9) = 0.5625."""
    import pytest as _pytest

    r = spark.sql(translate(
        "SELECT kurtPop(x) AS kp, kurtSamp(x) AS ks, "
        "skewPop(y) AS sp, skewSamp(y) AS ss, "
        "corrMatrix(x, y) AS cm "
        "FROM VALUES (0.0, 0.0), (0.0, 0.0), (1.0, 1.0), (1.0, 0.0) "
        "AS t(x, y)"
    )).collect()[0]
    assert r["kp"] == _pytest.approx(1.0)
    assert r["ks"] == _pytest.approx(0.5625)
    # y = {0,0,1,0}: m2 = 3/16, m3 = (3*(-.25)^3 + .75^3)/4 = 0.09375
    # skewPop = m3/m2^1.5; skewSamp = skewPop * (3/4)^1.5
    sp = 0.09375 / (3 / 16) ** 1.5
    assert r["sp"] == _pytest.approx(sp)
    assert r["ss"] == _pytest.approx(sp * 0.75 ** 1.5)
    cm = [list(row) for row in r["cm"]]
    assert cm[0][0] == _pytest.approx(1.0)
    assert cm[0][1] == _pytest.approx(cm[1][0])

    for bad, msg in [
        ("sumWithOverflow(x)", "integer width"),
        ("groupArrayLast(3)(x)", "insertion order"),
        ("sequenceNextNode('forward', 'head')(t, e, c)", "seqmatch"),
    ]:
        with _pytest.raises(ValueError, match=msg):
            translate(f"SELECT {bad}")


def test_json_map_regex_groups_batch(spark):
    """r5-late JSON structure family, map algebra completion, and
    capture-group extraction with the group count read from the
    literal pattern."""
    import pytest as _pytest

    r = spark.sql(translate(
        """SELECT JSONExtractKeys('{"a":1,"b":2}') AS jk,
        JSONLength('[1,2,3]') AS jl1, JSONLength('{"a":1}') AS jl2,
        JSONLength('nope') AS jl3,
        isValidJSON('{"a":1}') AS v1, isValidJSON('{bad') AS v2,
        JSONExtractKeysAndValues('{"a":"x","b":"y"}', 'String') AS kv,
        toJSONString(map('k', 7)) AS tj,
        mapSort(map('b', 2, 'a', 1)) AS ms,
        mapExists((k, v) -> v > 1, map('a', 1, 'b', 2)) AS me,
        mapAll((k, v) -> v > 0, map('a', 1, 'b', 2)) AS ma,
        mapContainsKeyLike(map('abc', 1), 'ab%') AS mk,
        mapExtractKeyLike(map('abc', 1, 'xyz', 2), 'a%') AS mek,
        extractGroups('a12b34', '([a-z])(\\\\d+)') AS eg,
        extractGroups('zzz', '([a-z])(\\\\d+)') AS eg0,
        extractAllGroupsHorizontal('a12b34', '([a-z])(\\\\d+)') AS eh,
        extractAllGroupsVertical('a12b34', '([a-z])(\\\\d+)') AS ev,
        regexpExtract('num-42', '(\\\\d+)') AS rx,
        queryStringAndFragment('http://h/p?x=1#frag') AS qf,
        queryStringAndFragment('http://h/p') AS qf2"""
    )).collect()[0]
    assert sorted(r["jk"]) == ["a", "b"]
    assert (r["jl1"], r["jl2"], r["jl3"]) == (3, 1, 0)
    assert r["v1"] and not r["v2"]
    assert [(t["col1"], t["col2"]) for t in r["kv"]] == \
        [("a", "x"), ("b", "y")]
    assert r["tj"] == '{"k":7}'
    assert list(r["ms"].items()) == [("a", 1), ("b", 2)]
    assert r["me"] and r["ma"] and r["mk"]
    assert dict(r["mek"]) == {"abc": 1}
    assert list(r["eg"]) == ["a", "12"]
    assert list(r["eg0"]) == []
    assert [list(x) for x in r["eh"]] == [["a", "b"], ["12", "34"]]
    assert [list(x) for x in r["ev"]] == [["a", "12"], ["b", "34"]]
    assert r["rx"] == "42"
    assert r["qf"] == "x=1#frag" and r["qf2"] == ""

    for bad, msg in [
        ("mapConcat(m1, m2)", "duplicate-key"),
        ("extractGroups(s, re_col)", "literal pattern"),
        ("JSONExtractKeysAndValues(j, 'k', 'String')", "path arguments"),
        ("mapSort((k, v) -> v, m)", "comparator"),
    ]:
        with _pytest.raises(ValueError, match=msg):
            translate(f"SELECT {bad}")


def test_float_classification_noops_geo_batch(spark):
    """isFinite/isInfinite/isNaN/ifNotFinite composition, server-side
    no-ops (identity/materialize/ignore/indexHint value semantics),
    formatReadableDecimalSize 1000-ladder, greatCircleAngle vs the
    distance formula, pointInEllipses any-of rule."""
    import pytest as _pytest

    r = spark.sql(translate(
        "SELECT isFinite(1.5) AS f1, isFinite(double('Infinity')) AS f2, "
        "isFinite(double('NaN')) AS f3, "
        "isInfinite(-double('Infinity')) AS i1, isInfinite(2.0) AS i2, "
        "isNaN(double('NaN')) AS n1, "
        "ifNotFinite(3.5, 0.0) AS nf1, ifNotFinite(double('Infinity'), -1.0) AS nf2, "
        "identity(42) AS idn, materialize(7) AS mat, "
        "ignore('x', 9) AS ign, indexHint(1 = 2) AS ih, "
        "formatReadableDecimalSize(1000) AS ds1, "
        "formatReadableDecimalSize(1234567) AS ds2, "
        "round(greatCircleAngle(0, 0, 0, 90), 6) AS gca, "
        "pointInEllipses(1.0, 0.0, 0, 0, 2, 1) AS pe1, "
        "pointInEllipses(3.0, 0.0, 0, 0, 2, 1) AS pe2, "
        "pointInEllipses(3.0, 0.0, 0, 0, 2, 1, 3, 0, 0.5, 0.5) AS pe3"
    )).collect()[0]
    assert r["f1"] and not r["f2"] and not r["f3"]
    assert r["i1"] and not r["i2"] and r["n1"]
    assert r["nf1"] == 3.5 and r["nf2"] == -1.0
    assert r["idn"] == 42 and r["mat"] == 7 and r["ign"] == 0
    assert r["ih"] is True
    assert r["ds1"] == "1.00 KB" and r["ds2"] == "1.23 MB"
    assert r["gca"] == _pytest.approx(90.0)
    assert r["pe1"] and not r["pe2"] and r["pe3"]

    for bad, msg in [("sleep(1)", "side effect"),
                     ("bar(x, 0, 100, 10)", "unicode blocks"),
                     ("pointInEllipses(x, y, 1, 2)", "pointInEllipses")]:
        with _pytest.raises(ValueError, match=msg):
            translate(f"SELECT {bad}")


def test_array_completion_batch(spark):
    """r5-late array completion: by-key sort lambdas (NULL keys last
    both directions), typed empty constructors, arrayWithConstant,
    null-safe countEqual, arrayElementOrNull 0-guard, product,
    clamped cumulative sum, carry-forward/backward fills, unaligned
    zip with NULL padding."""
    r = spark.sql(translate(
        "SELECT arraySort(x -> -x, [3, 1, 2]) AS s1, "
        "arrayReverseSort(x -> x, [3, 1, 2]) AS s2, "
        "arraySort(x -> nullIf(x, 2), [2, 3, 1]) AS s3, "
        "emptyArrayInt64() AS e1, emptyArrayString() AS e2, "
        "arrayWithConstant(3, 'ab') AS wc, "
        "countEqual([1, NULL, 2, NULL], NULL) AS ceq, "
        "countEqual([1, 2, 2], 2) AS ceq2, "
        "arrayElementOrNull([10, 20], 5) AS eon, "
        "arrayElementOrNull([10, 20], 0) AS eon0, "
        "arrayElementOrNull([10, 20], -1) AS eonm, "
        "arrayProduct([2, 3, 4]) AS pr, "
        "arrayCumSumNonNegative([2, -4, 3, -1]) AS cns, "
        "arrayFill(x -> x > 0, [-1, 5, -2, -3, 7, -4]) AS fl, "
        "arrayReverseFill(x -> x > 0, [-1, 5, -2, -3, 7, -4]) AS rfl, "
        "arrayZipUnaligned([1, 2, 3], ['a']) AS zu"
    )).collect()[0]
    assert list(r["s1"]) == [3, 2, 1]
    assert list(r["s2"]) == [3, 2, 1]
    assert list(r["s3"]) == [1, 3, 2]  # NULL key (the 2) sorts last
    assert list(r["e1"]) == [] and list(r["e2"]) == []
    assert list(r["wc"]) == ["ab", "ab", "ab"]
    assert r["ceq"] == 2 and r["ceq2"] == 2
    assert r["eon"] is None and r["eon0"] is None and r["eonm"] == 20
    assert r["pr"] == 24.0
    assert list(r["cns"]) == [2, 0, 3, 2]
    assert list(r["fl"]) == [-1, 5, 5, 5, 7, 7]
    assert list(r["rfl"]) == [5, 5, 7, 7, 7, -4]
    assert [(t["col1"], t["col2"]) for t in r["zu"]] == \
        [(1, "a"), (2, None), (3, None)]


def test_bitmask_mac_ipv4_rand_batch(spark):
    """Bitmask decompositions, MAC int<->colon-hex, IPv4 CIDR ranges,
    toIPv4 OrNull/OrZero guards, rand-family contracts (domains, not
    values), and block-introspection gates."""
    import pytest as _pytest

    r = spark.sql(translate(
        "SELECT bitmaskToArray(50) AS ba, bitmaskToList(50) AS bl, "
        "bitPositionsToArray(50) AS bp, "
        "MACNumToString(1093292146198) AS ms, "
        "MACStringToNum('00:FE:8D:4A:3E:16') AS mn, "
        "IPv4CIDRToRange(IPv4StringToNum('192.168.5.2'), 16) AS cr, "
        "toIPv4('1.2.3.4') AS i1, toIPv4OrNull('999.2.3.4') AS i2, "
        "toIPv4OrNull('not an ip') AS i3, toIPv4OrZero('bogus') AS i4, "
        "rand() AS r1, rand64() AS r2, randCanonical() AS r3, "
        "randConstant() AS r4, generateUUIDv4() AS u1"
    )).collect()[0]
    assert list(r["ba"]) == [2, 16, 32]  # 50 = 2 + 16 + 32
    assert r["bl"] == "2,16,32"
    assert list(r["bp"]) == [1, 4, 5]
    assert r["ms"] == "00:FE:8D:4A:3E:16"
    assert r["mn"] == 1093292146198
    lo, hi = r["cr"]["col1"], r["cr"]["col2"]
    assert lo == (192 << 24) + (168 << 16)
    assert hi == lo + 65535
    assert r["i1"] == 16909060  # 1*2^24 + 2*2^16 + 3*2^8 + 4
    assert r["i2"] is None and r["i3"] is None and r["i4"] == 0
    assert 0 <= r["r1"] < 2**32 and 0.0 <= r["r3"] < 1.0
    assert isinstance(r["r2"], int) and 0 <= r["r4"] < 2**32
    assert len(r["u1"]) == 36

    with _pytest.raises(ValueError, match="block layout"):
        translate("SELECT blockNumber()")


def test_map_agg_if_forms(spark):
    """sumMapIf/minMapIf/maxMapIf: the condition filters ROWS (failing
    rows contribute empty arrays the fold ignores)."""
    r = spark.sql(translate(
        "SELECT sumMapIf(k, v, keep) AS sm, maxMapIf(k, v, keep) AS xm "
        "FROM VALUES (array('a','b'), array(1,2), true), "
        "(array('a','c'), array(10,20), true), "
        "(array('a'), array(100), false) AS t(k, v, keep)"
    )).collect()[0]
    assert dict(zip(r["sm"]["col1"], r["sm"]["col2"])) == \
        {"a": 11, "b": 2, "c": 20}
    assert dict(zip(r["xm"]["col1"], r["xm"]["col2"])) == \
        {"a": 10, "b": 2, "c": 20}


def test_resample_combinator(spark):
    """<agg>Resample(start, end, step)(x, key): one result per key
    bucket, empty buckets = neutral (sum 0 / count 0 / min NULL)."""
    import pytest as _pytest

    r = spark.sql(translate(
        "SELECT sumResample(0, 30, 10)(v, k) AS s, "
        "countResample(0, 30, 10)(k) AS c, "
        "maxResample(0, 30, 10)(v, k) AS mx "
        "FROM VALUES (5, 1.0), (7, 3.0), (25, 7.0), (25, 9.0), "
        "(99, 100.0) AS t(k, v)"  # 99 out of range, middle bucket empty
    )).collect()[0]
    assert list(r["s"]) == [4.0, 0.0, 16.0]
    assert list(r["c"]) == [2, 0, 2]
    assert r["mx"][0] == 3.0 and r["mx"][1] is None and r["mx"][2] == 9.0
    # ADVICE r5: non-step-divisible range — CH drops keys >= end, so
    # the last bucket [20, 25) must exclude 27 (and 25) even though
    # they sit below start + nb*step = 30
    r2 = spark.sql(translate(
        "SELECT sumResample(0, 25, 10)(v, k) AS s, "
        "countResample(0, 25, 10)(k) AS c "
        "FROM VALUES (5, 1.0), (24, 2.0), (25, 4.0), (27, 8.0) "
        "AS t(k, v)"
    )).collect()[0]
    assert list(r2["s"]) == [1.0, 0.0, 2.0]
    assert list(r2["c"]) == [1, 0, 1]
    with _pytest.raises(ValueError, match="end > start"):
        translate("SELECT sumResample(10, 10, 5)(v, k)")
    with _pytest.raises(ValueError, match="integer literal"):
        translate("SELECT sumResample(a, 10, 5)(v, k)")


def test_interval_subsecond_date32_batch(spark):
    """toInterval* completion, sub-second add/subtract at microsecond
    precision, toDate32 family, toStartOfSecond, the date_diff alias
    (boundary-crossing semantics, NOT Spark's raw-unit 3-arg form),
    and 2-arg fromUnixTimestamp formatting."""
    r = spark.sql(translate(
        "SELECT toDateTime('2024-01-01 00:00:00') "
        "+ toIntervalMinute(90) AS t1, "
        "toDate('2024-01-31') + toIntervalMonth(1) AS t2, "
        "toDate('2024-01-01') + toIntervalQuarter(1) AS t3, "
        "addMilliseconds(toDateTime('2024-01-01 00:00:00'), 1250) AS ms, "
        "subtractMicroseconds(toDateTime64('2024-01-01 00:00:00.000500',"
        " 6), 700) AS us, "
        "toDate32('2024-05-06') AS d32, "
        "toDate32OrNull('bogus') AS d32n, "
        "toDate32OrZero('bogus') AS d32z, "
        "toStartOfSecond(toDateTime64('2024-01-01 00:00:00.789', 3)) "
        "AS ss, "
        "date_diff('day', toDateTime('2024-01-01 23:59:00'), "
        "toDateTime('2024-01-02 00:01:00')) AS dd, "
        "fromUnixTimestamp(1704067200, '%Y-%m-%d %H:%i:%S') AS fu"
    )).collect()[0]
    assert str(r["t1"]) == "2024-01-01 01:30:00"
    assert str(r["t2"]) == "2024-02-29" and str(r["t3"]) == "2024-04-01"
    assert str(r["ms"]) == "2024-01-01 00:00:01.250000"
    assert str(r["us"]).endswith("23:59:59.999800")
    assert str(r["d32"]) == "2024-05-06" and r["d32n"] is None
    # ADVICE r5: Date32's zero is the type minimum 1900-01-01, not
    # Date's 1970-01-01
    assert str(r["d32z"]) == "1900-01-01"
    assert str(r["ss"]) == "2024-01-01 00:00:00"
    assert r["dd"] == 1  # boundary crossing, not raw 24h units
    assert r["fu"] == "2024-01-01 00:00:00"


def test_punycode_family(spark):
    """RFC 3492 through the stdlib codec: the spec's own München
    example, ASCII passthrough shape, strict-vs-try failure modes."""
    r = spark.sql(translate(
        "SELECT punycodeEncode('München') AS e1, "
        "punycodeEncode('abc') AS e2, "
        "punycodeDecode('Mnchen-3ya') AS d1, "
        "tryPunycodeDecode('Mnchen-3ya') AS t1, "
        "tryPunycodeDecode('!!bad??') AS t2, "
        "punycodeEncode(CAST(NULL AS STRING)) AS n1"
    )).collect()[0]
    assert r["e1"] == "Mnchen-3ya" and r["e2"] == "abc-"
    assert r["d1"] == "München" and r["t1"] == "München"
    assert r["t2"] == "" and r["n1"] is None


def test_base58_family(spark):
    """Bitcoin-alphabet base58: the canonical 'Hello World!' vector,
    leading-zero-byte '1' padding, seeded roundtrips, strict-vs-try
    failure modes."""
    import random

    r = spark.sql(translate(
        "SELECT base58Encode('Hello World!') AS e, "
        "base58Decode('2NEpo7TZRRrLZSi2U') AS d, "
        "tryBase58Decode('2NEpo7TZRRrLZSi2U') AS t1, "
        "tryBase58Decode('l0O') AS t2, "
        "base58Encode('') AS z, "
        "base58Decode('3D') AS nb, "
        "tryBase58Decode('3D') AS nbt"
    )).collect()[0]
    assert r["e"] == "2NEpo7TZRRrLZSi2U" and r["d"] == "Hello World!"
    assert r["t1"] == "Hello World!" and r["t2"] == "" and r["z"] == ""
    # ADVICE r5: '3D' is VALID base58 whose payload byte 0x80 is not
    # UTF-8 — CH succeeds (returns the bytes); the repo's documented
    # binary-to-string boundary renders it with U+FFFD, and the try
    # form must NOT collapse it to '' (only invalid alphabet chars do)
    assert r["nb"] == "�" and r["nbt"] == "�"

    rng = random.Random(5)
    vals = ["".join(rng.choice("abcXYZ 019_") for _ in
                    range(rng.randint(0, 24))) for _ in range(40)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, s string")
    df.createOrReplaceTempView("b58_rt")
    rows = spark.sql(translate(
        "SELECT i, base58Decode(base58Encode(s)) AS rt FROM b58_rt"
    )).collect()
    for row in rows:
        assert row["rt"] == vals[row["i"]]


def test_string_distance_and_textnorm_family(spark):
    """r7: these names used to PASS THROUGH untranslated (the silent-
    mistranslation class). Pinned: public javaHash vectors ('' -> 0,
    'a' -> 97, 'abc' -> 96354, 'hello' -> 99162322), hiveHash =
    javaHash with the sign bit cleared (vector with a negative
    javaHash), UAX #15 normalization roundtrip, byte-vs-codepoint
    editDistance split, textbook Jaro/Winkler worked example, and the
    actionable gates — including xxHash64, which Spark would otherwise
    CASE-INSENSITIVELY resolve to its own seed-42 xxhash64 while CH
    uses seed 0 (every value would differ silently)."""
    import pytest

    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT javaHash('') AS j0, javaHash('a') AS j1, "
        "javaHash('abc') AS j2, javaHash('hello') AS j3, "
        "javaHash('Hello World!') AS jneg, "
        "hiveHash('Hello World!') AS hpos, "
        "normalizeUTF8NFC(normalizeUTF8NFD('é')) AS nfc, "
        "length(normalizeUTF8NFD('é')) AS nfd_len, "
        "editDistance('café', 'cafe') AS ed_b, "
        "editDistanceUTF8('café', 'cafe') AS ed_c, "
        "round(jaroSimilarity('MARTHA', 'MARHTA'), 9) AS jr, "
        "round(jaroWinklerSimilarity('MARTHA', 'MARHTA'), 9) AS jw, "
        "stringJaccardIndex('abc', 'bcd') AS jac"
    )).collect()[0]
    assert (r["j0"], r["j1"], r["j2"], r["j3"]) == (0, 97, 96354, 99162322)
    assert r["jneg"] < 0 and r["hpos"] == r["jneg"] & 0x7FFFFFFF
    # CH length() is BYTES: NFD('é') = 'e' + U+0301 = 1 + 2 bytes
    assert r["nfc"] == "é" and r["nfd_len"] == 3
    assert r["ed_b"] == 2 and r["ed_c"] == 1  # bytes vs codepoints
    assert r["jr"] == pytest.approx(0.944444444, abs=1e-9)
    assert r["jw"] == pytest.approx(0.961111111, abs=1e-9)
    assert r["jac"] == 0.5
    for bad, hint in (
        # xxHash64/xxHash32 are EXACT since r8 (functions/xxh.py,
        # verified in tests/test_xxh.py) — the remaining families gate
        ("xxHash3('x')", "hash family"),
        # murmurHash3_32/_64/_128 are EXACT since r9 (functions/
        # murmur.py, tests/test_murmur.py) — murmurHash2 stays gated
        ("murmurHash2_64('x')", "hash family"),
        ("wordShingleSimHash('x')", "hash family"),
        ("damerauLevenshteinDistance('a','b')", "not pinned offline"),
        ("byteHammingDistance('a','b')", "not pinned offline"),
        ("tupleHammingDistance((1,2),(1,3))", "tuple arity"),
        # ADVICE r8: CH hashes a bare integer literal at its NARROWEST
        # type (42 → UInt8 → 1 byte) — unknowable from Spark's INT
        # literal, so the mapping demands an explicit width cast
        ("xxHash64(42)", "NARROWEST"),
        ("xxHash32(-7)", "NARROWEST"),
    ):
        with pytest.raises(ValueError, match=hint):
            translate(f"SELECT {bad}")
    # r9: javaHashUTF16LE — the value's bytes read as UTF-16LE units;
    # derivation law vs the vector-pinned javaHash (an ASCII string's
    # UTF-16LE encoding interleaves NULs), and odd byte length raises
    # like CH
    r16 = spark.sql(translate(
        "SELECT javaHashUTF16LE(concat('a', char(0), 'b', char(0), "
        "'c', char(0))) AS h16, javaHash('abc') AS jh"
    )).collect()[0]
    assert r16["h16"] == r16["jh"] == 96354
    with pytest.raises(Exception, match="odd byte length"):
        spark.sql(translate("SELECT javaHashUTF16LE('abc')")).collect()
    # …while an explicit cast pins the byte width (8 LE bytes here ≡
    # hashing the typed BIGINT column form) and typed columns are
    # untouched by the literal gate
    r2 = spark.sql(translate(
        "SELECT xxHash64(CAST(42 AS BIGINT)) AS h64, "
        "xxHash64('42') AS hs"
    )).collect()[0]
    from clickhouse_learning_spark.functions.xxh import xxh64

    import struct
    assert (r2["h64"] + (1 << 64)) % (1 << 64) == \
        xxh64(struct.pack("<q", 42), seed=0)
    assert (r2["hs"] + (1 << 64)) % (1 << 64) == xxh64(b"42", seed=0)


def test_extract_groups_split_nonalpha_and_nlp_gates(spark):
    """r7 batch-2 audit: extractAllGroups{,Vertical,Horizontal} (one
    inner array per MATCH / per GROUP; unmatched optional groups ''),
    splitByNonAlpha (whitespace+punct separators, no empties), and the
    actionable gates for the NLP-model-backed names + bitSlice."""
    import pytest

    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT extractAllGroupsVertical('a1 b2', '([a-z])(\\\\d)') AS v, "
        "extractAllGroupsHorizontal('a1 b2', '([a-z])(\\\\d)') AS h, "
        "extractAllGroups('x', '(y)') AS none_match, "
        "extractAllGroupsVertical('ab', '(a)(c)?') AS opt, "
        "splitByNonAlpha('ab,cd  ef!') AS sp, "
        "splitByNonAlpha('...') AS sp_empty, "
        "splitByNonAlpha('café x, straße-42 日本') AS sp_nonascii, "
        "splitByNonAlpha(concat('a', char(1), 'b', char(9), 'c')) AS sp_ctrl"
    )).collect()[0]
    assert r["v"] == [["a", "1"], ["b", "2"]]
    assert r["h"] == [["a", "b"], ["1", "2"]]
    assert r["none_match"] == []
    assert r["opt"] == [["a", ""]]  # unmatched optional group -> ''
    assert r["sp"] == ["ab", "cd", "ef"] and r["sp_empty"] == []
    # ADVICE r7: CH separators are ASCII whitespace+punctuation ONLY —
    # non-ASCII letters stay inside tokens ('café', not 'caf'), and
    # control chars outside \t\n\v\f\r are NOT separators (\x01 binds
    # a\x01b into one token; \t still splits)
    assert r["sp_nonascii"] == ["café", "x", "straße", "42", "日本"]
    assert r["sp_ctrl"] == ["a\x01b", "c"]
    for bad, hint in (
        ("stem('running')", "NLP models"),
        ("detectLanguage('x')", "NLP models"),
        ("categoricalInformationValue(a, b)", "NLP models"),
        ("bitSlice('ab', 1, 4)", "sub-byte"),
    ):
        with pytest.raises(ValueError, match=hint):
            translate(f"SELECT {bad}")


def test_ipv6_bithamming_quotemeta(spark):
    """r9 late batch: former silent passthroughs. IPv6 codec = stdlib
    RFC 5952 with CH's dotted IPv4-mapped rendering special-cased;
    bitHammingDistance = popcount(xor); regexpQuoteMeta escapes CH's
    documented set (\\0 \\\\ | ( ) ^ $ . [ ] ? * + { : -) and NOT '}';
    UUID byte-order pair gates."""
    import re

    import pytest

    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT IPv6NumToString(IPv6StringToNum("
        "'2001:0db8:0000:0000:0000:ff00:0042:8329')) AS a, "
        "IPv6NumToString(IPv6StringToNum('::ffff:1.2.3.4')) AS b, "
        "IPv6NumToString(IPv6StringToNum('::')) AS z, "
        "isIPv6String('::1') AS c, isIPv6String('nope') AS d, "
        "IPv6StringToNumOrNull('bad') AS e, "
        "length(IPv6StringToNum('::1')) AS n16, "
        "bitHammingDistance(5, 6) AS f, "
        "bitHammingDistance(0, -1) AS f64, "
        "regexpQuoteMeta('a.b[c]{d}|e^$?*+:-\\\\f(g)') AS g"
    )).collect()[0]
    assert r["a"] == "2001:db8::ff00:42:8329"  # RFC 5952 shortening
    assert r["b"] == "::ffff:1.2.3.4"  # CH's dotted IPv4-mapped form
    assert r["z"] == "::"
    assert (r["c"], r["d"]) == (1, 0) and r["e"] is None
    assert r["n16"] == 16
    assert r["f"] == 2 and r["f64"] == 64
    orig = "a.b[c]{d}|e^$?*+:-\\f(g)"
    assert "\\{d}" in r["g"] and "\\}" not in r["g"]  # '{' yes, '}' no
    assert re.fullmatch(r["g"], orig)  # escaped form matches literally
    # strict parse throws on invalid input (CH throws too)
    with pytest.raises(Exception, match="IPv6|does not appear"):
        spark.sql(translate(
            "SELECT IPv6StringToNum('not-an-address')"
        )).collect()
    for bad in ("UUIDStringToNum('x')", "UUIDNumToString(b)"):
        with pytest.raises(ValueError, match="byte order"):
            translate(f"SELECT {bad}")


def test_ci_multisearch_decimal_accuratecast(spark):
    """r9 late batch 2: former passthroughs. CH's non-UTF8
    CaseInsensitive variants fold ASCII ONLY (translate over the
    alphabet — 'CAFÉ' must NOT match 'café'); toDecimalN casts at the
    width's precision (excess fractional digits round HALF_UP here —
    the documented divergence); accurateCast throws on overflow
    instead of wrapping or nulling; toBool's true/false/1/0 core."""
    import pytest

    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT multiSearchAnyCaseInsensitive('Hello World', "
        "['WORLD', 'xx']) AS a, "
        "multiSearchAnyCaseInsensitive('café', ['CAFÉ']) AS na, "
        "multiSearchAllPositionsCaseInsensitive('aXbX', ['x', 'zz']) "
        "AS pos, "
        "toDecimal64('1.555', 2) AS d1, "
        "CAST(toDecimal32OrZero('xx', 2) AS STRING) AS d2, "
        "toDecimal32OrNull('xx', 2) AS d3, "
        "accurateCast(300, 'Int64') AS ac, "
        "accurateCastOrNull(300, 'UInt8') AS acn, "
        "toBool('true') AS b1, toBool(0) AS b2"
    )).collect()[0]
    assert r["a"] is True and r["na"] is False  # ASCII-only folding
    assert r["pos"] == [2, 0]  # 1-based, 0 = not found
    assert str(r["d1"]) == "1.56" and r["d2"] == "0.00"
    assert r["d3"] is None and r["ac"] == 300 and r["acn"] is None
    assert r["b1"] is True and r["b2"] is False
    with pytest.raises(Exception, match="out of range"):
        spark.sql(translate(
            "SELECT accurateCast(300, 'UInt8')"
        )).collect()
    for gated, hint in (
        ("formatReadableTimeDelta(1)", "English rendering"),
        ("addTupleOfIntervals(today(), (toIntervalDay(1),))",
         "compose the additions"),
        ("nested(['k'], [1])", "parallel arrays"),
        ("toDecimal256('1', 2)", "precision 76"),
    ):
        with pytest.raises(ValueError, match=hint):
            translate(f"SELECT {gated}")


def test_utf8_case_cutzero_ascii_char(spark):
    """r9 late batch 3 (geo/encoding/string sweep): upperUTF8/
    lowerUTF8 = the full-Unicode fold; toStringCutToZero cuts at the
    first NUL byte; ascii = the first UTF-8 BYTE (195 for 'é', not
    Spark's codepoint 233); char builds one byte per argument mod 256
    and fails LOUDLY on non-UTF-8 byte sequences (CH's raw-byte
    strings are unrepresentable here); the H3/base64URL/convertCharset/
    bin/unbin names gate with pointers."""
    import pytest

    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT upperUTF8('héllo É') AS u, lowerUTF8('HÉLLO') AS l, "
        "toStringCutToZero(concat('ab', char(0), 'cd')) AS z, "
        "toStringCutToZero('plain') AS z2, "
        "ascii('a') AS a1, ascii('é') AS a2, ascii('') AS a0, "
        "char(72, 101, 108) AS c1, char(256 + 65) AS c3"
    )).collect()[0]
    assert r["u"] == "HÉLLO É" and r["l"] == "héllo"
    assert r["z"] == "ab" and r["z2"] == "plain"
    assert (r["a1"], r["a2"], r["a0"]) == (97, 195, 0)
    assert r["c1"] == "Hel" and r["c3"] == "A"  # byte mod 256
    with pytest.raises(Exception, match="MALFORMED|decode"):
        spark.sql(translate("SELECT char(233)")).collect()
    for gated, hint in (
        ("h3ToGeo(1)", "H3"),
        ("geoToH3(1.0, 2.0, 9)", "H3"),
        ("base64URLEncode('x')", "padding"),
        ("base64URLDecode('x')", "padding"),
        ("convertCharset('x', 'a', 'b')", "iconv"),
        ("bin('a')", "per-byte"),
        ("unbin('0')", "unhex"),
    ):
        with pytest.raises(ValueError, match=hint):
            translate(f"SELECT {gated}")


def test_advice_r9_null_propagation_and_json_index(spark):
    """ADVICE r9 (all three items, pinned):

    1. ascii(NULL) is NULL — the empty-string coalesce(...,0) must not
       fold a NULL input (CH propagates NULL through Nullable args).
    2. JSONExtract*'s bare-integer argument is a 1-BASED ELEMENT INDEX
       (CH semantics), not a member name: JSONExtractArrayRaw(j, 2)
       reads $[1], never $.2; negative (from-the-end) and zero
       indexes gate with a pointer.
    3. isIPv6String(NULL) is NULL, not 0.
    """
    import pytest

    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT ascii(CAST(NULL AS STRING)) AS a_null, "
        "ascii('') AS a_empty, ascii('a') AS a_a, "
        "isIPv6String(CAST(NULL AS STRING)) AS v6_null, "
        "isIPv6String('::1') AS v6_yes, isIPv6String('nope') AS v6_no, "
        # item 2: integer args address elements 1-based
        "JSONExtractArrayRaw('{\"a\":[[1,2],[3]],\"2\":[9]}', 'a', 2) AS el2, "
        "JSONExtractArrayRaw('[[7],[8,9]]', 2) AS one2, "
        "JSONExtractString('[\"x\",\"y\",\"z\"]', 3) AS s3"
    )).collect()[0]
    assert r["a_null"] is None and r["a_empty"] == 0 and r["a_a"] == 97
    assert r["v6_null"] is None and r["v6_yes"] == 1 and r["v6_no"] == 0
    # $.a[1] = [3] — NOT the member "2" ([9])
    assert r["el2"] == ["3"]
    assert r["one2"] == ["8", "9"] and r["s3"] == "z"
    for gated in (
        "JSONExtractArrayRaw('[1]', -1)",
        "JSONExtractString('[1]', 0)",
    ):
        with pytest.raises(ValueError, match="from-the-end|zero"):
            translate(f"SELECT {gated}")


def test_r10_sweep_batch(spark):
    """r10 candidate sweep (VERDICT r9 item 5): the ~50 names that
    used to PASS THROUGH, pinned at their mapped semantics. Gates are
    asserted in test_dialect_surface_audit; this pins the values."""
    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT L1Normalize([1,-3]) AS l1, L2Normalize([3,4]) AS l2, "
        "YYYYMMDDToDate(20240115) AS ymd, "
        "YYYYMMDDToDate(99999999) AS ymd_bad, "
        "YYYYMMDDhhmmssToDateTime(20240115102030) AS ymdh, "
        "makeDateTime64(2024,1,15,10,0,0) AS mk, "
        "toStartOfMillisecond(CAST('2024-01-15 10:20:30.123456' "
        "AS TIMESTAMP)) AS ms, "
        "concatAssumeInjective('a','b') AS cai, "
        "leftPadUTF8('x',3,'é') AS lp, "
        "stringCompare('a','b') AS sc_lt, stringCompare('b','a') "
        "AS sc_gt, stringCompare('a','a') AS sc_eq, "
        "min2(1,2) AS mn, max2(1,CAST(NULL AS INT)) AS mx_null, "
        "bitTestAll(5,0,2) AS bta, bitTestAll(5,0,1) AS bta_no, "
        "bitTestAny(5,1) AS bty_no, bitTestAny(5,1,2) AS bty, "
        "roundDown(5,[1,4,6]) AS rd_mid, roundDown(0,[1,4,6]) "
        "AS rd_lo, roundDown(9,[1,4,6]) AS rd_hi, "
        "caseWithExpression(2,1,'a',2,'b','c') AS cw"
    )).collect()[0]
    assert r["l1"] == [0.25, -0.75] and r["l2"] == [0.6, 0.8]
    assert str(r["ymd"]) == "2024-01-15"
    assert str(r["ymd_bad"]) == "1970-01-01"  # CH zero date
    assert str(r["ymdh"]) == "2024-01-15 10:20:30"
    assert str(r["mk"]) == "2024-01-15 10:00:00"
    assert str(r["ms"]) == "2024-01-15 10:20:30.123000"
    assert r["cai"] == "ab" and r["lp"] == "ééx"
    assert (r["sc_lt"], r["sc_gt"], r["sc_eq"]) == (-1, 1, 0)
    # CH min2/max2 return Float64 and PROPAGATE null (Spark's
    # least/greatest would skip it)
    assert r["mn"] == 1.0 and r["mx_null"] is None
    assert (r["bta"], r["bta_no"]) == (True, False)
    assert (r["bty_no"], r["bty"]) == (False, True)
    assert (r["rd_mid"], r["rd_lo"], r["rd_hi"]) == (4, 1, 6)
    assert r["cw"] == "b"

    # JSON-lite family: CH defaults on missing keys (0 / '' / false)
    r = spark.sql(translate(
        "SELECT simpleJSONExtractInt('{\"a\": 7}','a') AS i, "
        "simpleJSONExtractInt('{}','a') AS i0, "
        "simpleJSONExtractFloat('{\"a\": 1.5}','a') AS f, "
        "simpleJSONExtractBool('{\"a\": true}','a') AS b, "
        "simpleJSONExtractBool('{}','a') AS b0, "
        "simpleJSONHas('{\"a\":1}','a') AS h1, "
        "simpleJSONHas('{}','a') AS h0, "
        "visitParamExtractRaw('{\"a\":{\"b\":1}}','a') AS raw, "
        "JSONArrayLength('[1,2,3]') AS n, "
        "JSONArrayLength('nope') AS n_bad"
    )).collect()[0]
    assert r["i"] == 7 and r["i0"] == 0 and r["f"] == 1.5
    assert r["b"] is True and r["b0"] is False
    assert r["h1"] is True and r["h0"] is False
    assert r["raw"] == '{"b":1}'
    assert r["n"] == 3 and r["n_bad"] is None

    # aggregate-context names: groupConcat both forms, respect-nulls
    # variants, nothing(), and the arraySum/Min/Max lambda forms
    spark.sql(
        "SELECT explode(sequence(1,5)) AS x"
    ).createOrReplaceTempView("r10_sweep_tv")
    r = spark.sql(translate(
        "SELECT groupConcat(x) AS g1, groupConcat('-')(x) AS g2, "
        "nothing(x) AS nt, arraySum(y -> y*2, [1,2,3]) AS asum, "
        "arrayAvg(y -> y*2, [1,2,3]) AS aavg, "
        "arrayMax(y -> -y, [1,2]) AS amax, "
        "arrayMin(y -> -y, [1,2]) AS amin "
        "FROM r10_sweep_tv"
    )).collect()[0]
    assert r["g1"] == "12345" and r["g2"] == "1-2-3-4-5"
    assert r["nt"] is None
    assert r["asum"] == 12 and r["aavg"] == 4.0
    assert (r["amax"], r["amin"]) == (-1, -2)

    # respect-nulls: first/last RESPECT nulls by default in Spark —
    # a NULL-leading frame must surface the NULL (CH any() would skip)
    rows = spark.sql(translate(
        "SELECT any_respect_nulls(v) AS a FROM (SELECT "
        "CASE WHEN x = 1 THEN NULL ELSE x END AS v "
        "FROM r10_sweep_tv WHERE x = 1)"
    )).collect()
    assert rows[0]["a"] is None
    # decisive ordered check: over [NULL, 5] in one partition the
    # respect-nulls head is NULL while the tail is 5 (skip-nulls
    # semantics would return 5 for both)
    spark.sql(
        "SELECT IF(id = 0, NULL, 5) AS v FROM range(2)"
    ).coalesce(1).createOrReplaceTempView("r10_sweep_rn")
    r = spark.sql(translate(
        "SELECT any_respect_nulls(v) AS a, anyLast_respect_nulls(v) "
        "AS l FROM r10_sweep_rn"
    )).collect()[0]
    assert r["a"] is None and r["l"] == 5


def test_r10_sweep_batch2(spark):
    """r10 candidate sweep, batch 2: ids (UUID/ULID/snowflake),
    sub-second datetime components, changeX recomposition, 2-D morton
    interleave (pinned against a Python bit-loop reference), and the
    parameterized aliases. Gates asserted in the surface audit."""
    from clickhouse_learning_spark.functions.dialect import translate

    def q(sql):
        return spark.sql(translate(sql)).collect()[0]

    r = q("SELECT toUUID('F47AC10B-58CC-4372-A567-0E02B2C3D479') AS u,"
          " toUUIDOrNull('nope') AS n, toUUIDOrZero('nope') AS z, "
          "UUIDv7ToDateTime('01912e5c-8e80-7000-8000-000000000000') "
          "AS v7")
    assert r["u"] == "f47ac10b-58cc-4372-a567-0e02b2c3d479"
    assert r["n"] is None
    assert r["z"] == "00000000-0000-0000-0000-000000000000"
    assert int(r["v7"].timestamp() * 1000) == 0x01912E5C8E80

    # ULID: Crockford base32 is order-preserving onto conv()'s 0-9a-v
    ulid = "01GNB2S2FGN2P93QPXDNB4EN2R"
    alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
    ms = 0
    for ch in ulid[:10]:
        ms = ms * 32 + alphabet.index(ch)
    r = q(f"SELECT ULIDStringToDateTime('{ulid}') AS t")
    assert int(r["t"].timestamp() * 1000) == ms

    # snowflakeID pair: default epoch 0 (the deprecated
    # snowflakeToDateTime pair pins Twitter's 1288834974657)
    r = q("SELECT snowflakeIDToDateTime(shiftleft("
          "CAST(1722493636224 AS BIGINT), 22)) AS t, "
          "dateTimeToSnowflakeID(timestamp_millis(1722493636224)) "
          "AS i, snowflakeIDToDateTime(shiftleft(CAST(1000 AS "
          "BIGINT), 22), 1722493636224) AS te")
    assert int(r["t"].timestamp() * 1000) == 1722493636224
    assert r["i"] == 1722493636224 << 22
    assert int(r["te"].timestamp() * 1000) == 1722493637224

    r = q("SELECT toMicrosecond(CAST('2024-01-15 10:20:30.123456' AS "
          "TIMESTAMP)) AS us, toNanosecond(CAST("
          "'2024-01-15 10:20:30.123456' AS TIMESTAMP)) AS ns, "
          "changeYear(CAST('2024-01-15 10:20:30.5' AS TIMESTAMP), "
          "2000) AS cy, changeDay(CAST('2024-02-15' AS TIMESTAMP), "
          "31) AS cd_bad, changeSecond(CAST('2024-01-15 10:20:30.5' "
          "AS TIMESTAMP), 5) AS cs")
    assert r["us"] == 123456 and r["ns"] == 123456000
    assert str(r["cy"]) == "2000-01-15 10:20:30.500000"
    assert r["cd_bad"] is None  # invalid recomposition -> NULL
    assert str(r["cs"]) == "2024-01-15 10:20:05.500000"

    def _morton_ref(a, b):
        out = 0
        for i in range(32):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out - (1 << 64) if out >= (1 << 63) else out

    for a, b in [(1, 2), (123456, 654321), (0, 0),
                 (2**32 - 1, 2**32 - 1), (99, 0)]:
        r = q(f"SELECT mortonEncode({a}, {b}) AS mo")
        assert r["mo"] == _morton_ref(a, b), (a, b)

    r = q("SELECT (CAST('2024-01-15 00:00:00' AS TIMESTAMP) "
          "+ toIntervalMillisecond(1500)) AS tms, "
          "(CAST('2024-01-15 00:00:00' AS TIMESTAMP) "
          "+ toIntervalMicrosecond(7)) AS tus, "
          "overlayUTF8('héllo', 'XY', 2) AS ov")
    assert str(r["tms"]) == "2024-01-15 00:00:01.500000"
    assert str(r["tus"]) == "2024-01-15 00:00:00.000007"
    assert r["ov"] == "hXYlo"

    spark.sql(
        "SELECT * FROM VALUES (array(1,2,3)), (array(2,3,4)), "
        "(array(3,2,9)) AS t(a)"
    ).createOrReplaceTempView("r10b2_gai")
    r = spark.sql(translate(
        "SELECT groupArrayIntersect(a) AS g FROM r10b2_gai"
    )).collect()[0]
    assert sorted(r["g"]) == [2, 3]
    spark.sql(
        "SELECT explode(array(1,1,1,2,2,3)) AS x"
    ).createOrReplaceTempView("r10b2_tk")
    r = spark.sql(translate(
        "SELECT approx_top_k(2)(x) AS t, quantileDD(0.01, 0.5)(x) "
        "AS qd, sumMapFilteredWithOverflow([1,3])(array(x, x+1), "
        "array(10, 20)) AS sm FROM r10b2_tk"
    )).collect()[0]
    assert list(r["t"]) == [1, 2]


def test_r10_sweep_batch3(spark):
    """r10 candidate sweep, batch 3: XML encode (the five predefined
    entities, & first), clamp/positiveModulo/negate, and the
    closed-form rand-distribution transforms (distributional contract
    — range and loose moments, values RNG-fresh by design)."""
    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT encodeXMLComponent('a<b&\"c''d>') AS x, "
        "clamp(5, 1, 3) AS c1, clamp(0, 1, 3) AS c2, "
        "clamp(2, 1, 3) AS c3, clamp(CAST(NULL AS INT), 1, 3) AS cn, "
        "positiveModulo(-1, 3) AS pm, negate(5) AS ng"
    )).collect()[0]
    assert r["x"] == "a&lt;b&amp;&quot;c&apos;d&gt;"
    assert (r["c1"], r["c2"], r["c3"], r["cn"]) == (3, 1, 2, None)
    assert r["pm"] == 2 and r["ng"] == -5

    rows = spark.sql(translate(
        "SELECT randUniform(10, 20) AS u, randNormal(100, 0.001) AS n,"
        " randBernoulli(0.5) AS b, randExponential(1000000) AS e, "
        "randLogNormal(0, 0.001) AS ln FROM numbers(1000)"
    )).collect()
    us = [row["u"] for row in rows]
    assert all(10 <= u < 20 for u in us)
    assert 12 < sum(us) / 1000 < 18
    assert all(abs(row["n"] - 100) < 1 for row in rows)
    assert {row["b"] for row in rows} <= {0.0, 1.0}
    assert all(0 <= row["e"] < 0.01 for row in rows)
    assert all(abs(row["ln"] - 1) < 0.1 for row in rows)


def test_r10_sweep_batch4(spark):
    """r10 candidate sweep, batch 4: combinator-suffix corners —
    -OrNull/-OrDefault on basic aggregates (Spark aggregates are
    already NULL-on-empty; count and sum are the exceptions),
    argM*OrNull, avgWeightedIf, the bitwise aggregate folds, and the
    plural exact-low/high quantiles."""
    from clickhouse_learning_spark.functions.dialect import translate

    spark.sql(
        "SELECT explode(array(5, 3, 12, 7)) AS x"
    ).createOrReplaceTempView("r10b4")
    r = spark.sql(translate(
        "SELECT countOrNull(x) AS cn, sumOrDefault(x) AS sd, "
        "argMinOrNull(x, x) AS amn, argMaxOrNull(x, x) AS amx, "
        "avgWeightedIf(x, 2, x > 4) AS awi, "
        "groupBitAnd(x) AS ba, groupBitOr(x) AS bo, "
        "groupBitXor(x) AS bx, "
        "quantilesExactLow(0.25, 0.75)(x) AS ql, "
        "quantilesExactHigh(0.25, 0.75)(x) AS qh FROM r10b4"
    )).collect()[0]
    assert r["cn"] == 4 and r["sd"] == 27
    assert r["amn"] == 3 and r["amx"] == 12
    assert abs(r["awi"] - (5 + 12 + 7) / 3) < 1e-9
    assert r["ba"] == 5 & 3 & 12 & 7
    assert r["bo"] == 5 | 3 | 12 | 7
    assert r["bx"] == 5 ^ 3 ^ 12 ^ 7
    assert list(r["ql"]) == [3, 7] and list(r["qh"]) == [5, 12]
    # empty group: OrNull -> NULL, sumOrDefault -> CH's 0
    r = spark.sql(translate(
        "SELECT countOrNull(x) AS cn, sumOrDefault(x) AS sd, "
        "anyOrNull(x) AS an FROM r10b4 WHERE x > 100"
    )).collect()[0]
    assert r["cn"] is None and r["sd"] == 0 and r["an"] is None


def test_json_extract_raw_exact_slices(spark):
    """r10: JSONExtractRaw/simpleJSONExtractRaw return the slice
    VERBATIM via the jsonraw scanner — quotes and escape sequences
    kept on string scalars (get_json_object would unquote), objects
    byte-identical, '' on missing/invalid (CH's type default), and
    bare integer keys are 1-based element indexes (negatives from
    the end, the ADVICE-r9 rule)."""
    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        'SELECT JSONExtractRaw(\'{"a":"x\\\\n","b":{"c":1}}\', \'a\')'
        " AS sraw, "
        'JSONExtractRaw(\'{"a":"x","b":{"c":1}}\', \'b\') AS oraw, '
        "JSONExtractRaw('{\"a\":1}', 'zz') AS missing, "
        "JSONExtractRaw('not json', 'a') AS bad, "
        "JSONExtractRaw('[10, \"t\", null]', 2) AS el2, "
        "JSONExtractRaw('[10, \"t\", null]', -1) AS elm1, "
        "simpleJSONExtractRaw('{\"o\":{\"k\":2}}', 'o') AS sj"
    )).collect()[0]
    assert r["sraw"] == '"x\\n"'  # raw: quotes + the \n escape kept
    assert r["oraw"] == '{"c":1}'
    assert r["missing"] == "" and r["bad"] == ""
    assert r["el2"] == '"t"' and r["elm1"] == "null"
    assert r["sj"] == '{"k":2}'


def test_r10_sweep_batch6(spark):
    """r10 candidate sweep, batch 6: subsequence/token search (byte
    vs codepoint lanes, ASCII-only CI for the non-UTF8 forms),
    range() with CH's exclusive end and empty-progression rule, IPv6
    CIDR algebra over the ipaddress-module UDFs, null classifiers,
    and interval-typed datetime arithmetic. Gates are asserted in
    test_dialect_surface_audit; this pins the values."""
    import ipaddress

    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT hasSubsequence('garbage', 'arg') AS ss, "
        "hasSubsequence('garbage', 'arbw') AS ss_no, "
        "hasSubsequenceUTF8('désormais', 'éoa') AS ssu, "
        "hasSubsequenceCaseInsensitive('GaRbAgE', 'ARG') AS ssci, "
        "hasSubsequenceCaseInsensitiveUTF8('ÉCOLE', 'él') AS ssciu, "
        "hasSubsequence('', '') AS ss_ee, "
        "hasSubsequence('', 'x') AS ss_ex, "
        "hasTokenOrNull('a bc d', 'bc') AS tk, "
        "hasTokenOrNull('a bc d', 'b c') AS tk_bad, "
        "hasTokenOrNull('a bc d', '') AS tk_empty, "
        "hasTokenCaseInsensitiveOrNull('a BC d', 'bc') AS tk_ci"
    )).collect()[0]
    assert (r["ss"], r["ss_no"], r["ssu"]) == (True, False, True)
    assert (r["ssci"], r["ssciu"]) == (True, True)
    assert (r["ss_ee"], r["ss_ex"]) == (True, False)
    assert r["tk"] is True and r["tk_ci"] is True
    assert r["tk_bad"] is None and r["tk_empty"] is None

    # CH tokenizes on non-alnum ASCII bytes ONLY: non-ASCII stays
    # inside tokens ('xéthe' is ONE token), CI lowering is
    # ASCII-only (É does not fold to é), and a non-ASCII needle is
    # WELL-FORMED for the OrNull form (boolean, not NULL)
    r = spark.sql(translate(
        "SELECT hasToken('a naïve the b', 'naïve') AS t1, "
        "hasToken('a xéthe b', 'the') AS t2, "
        "hasTokenCaseInsensitive('a ÉTHE b', 'éthe') AS t3, "
        "hasTokenCaseInsensitive('a THE b', 'the') AS t4, "
        "hasTokenOrNull('x', 'naïve') AS t5"
    )).collect()[0]
    assert r["t1"] is True and r["t2"] is False
    assert r["t3"] is False and r["t4"] is True
    assert r["t5"] is False

    # range(): CH end is EXCLUSIVE; empty progressions (end <= start
    # for positive step) are [], never Spark sequence's auto-reverse
    r = spark.sql(translate(
        "SELECT range(5) AS r1, range(2, 5) AS r2, "
        "range(1, 10, 3) AS r3, range(5, 2) AS r_empty, "
        "range(10, 1, -3) AS r_neg, range(0) AS r_zero"
    )).collect()[0]
    assert r["r1"] == [0, 1, 2, 3, 4] and r["r2"] == [2, 3, 4]
    assert r["r3"] == [1, 4, 7] and r["r_neg"] == [10, 7, 4]
    assert r["r_empty"] == [] and r["r_zero"] == []

    r = spark.sql(translate(
        "SELECT countMatchesCaseInsensitive('aAbA', 'a') AS cm, "
        "firstLine('one\\ntwo\\nthree') AS fl, "
        "substringIndexUTF8('a.b.c', '.', 2) AS si, "
        "isNull(NULL) AS n1, isZeroOrNull(0) AS z1, "
        "isZeroOrNull(NULL) AS z2, isZeroOrNull(3) AS z3, "
        "isNotDistinctFrom(NULL, NULL) AS nd, "
        "MACStringToOUI('12:34:56:78:9A:BC') AS oui, "
        "hex(IPv4ToIPv6(3232235521)) AS v4v6"
    )).collect()[0]
    assert r["cm"] == 3 and r["fl"] == "one" and r["si"] == "a.b"
    assert r["n1"] is True and r["nd"] is True
    assert (r["z1"], r["z2"], r["z3"]) == (True, True, False)
    assert r["oui"] == 0x123456
    assert r["v4v6"] == "00000000000000000000FFFFC0A80001"

    # IPv6 CIDR algebra: lo/hi bounds, cut-and-render, membership
    r = spark.sql(translate(
        "SELECT IPv6CIDRToRange(IPv6StringToNum('2001:db8::1'), 32) "
        "AS rng, "
        "cutIPv6(IPv6StringToNum("
        "'2001:db8:ac10:fe01:feed:babe:cafe:f00d'), 2, 0) AS cut6, "
        "cutIPv6(IPv6StringToNum('::ffff:192.168.1.2'), 0, 2) "
        "AS cut4, "
        "isIPAddressInRange('127.0.0.1', '127.0.0.0/8') AS ir1, "
        "isIPAddressInRange('10.0.0.1', '127.0.0.0/8') AS ir0, "
        "isIPAddressInRange('::ffff:1.2.3.4', '::ffff:1.2.3.0/120') "
        "AS ir6, "
        "isIPAddressInRange('1.2.3.4', '::/0') AS ir_mixed"
    )).collect()[0]
    lo = ipaddress.IPv6Address(bytes(r["rng"]["col1"]))
    hi = ipaddress.IPv6Address(bytes(r["rng"]["col2"]))
    assert str(lo) == "2001:db8::"
    assert str(hi) == "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff"
    assert r["cut6"] == "2001:db8:ac10:fe01:feed:babe:cafe:0"
    assert r["cut4"] == "::ffff:192.168.0.0"
    assert (r["ir1"], r["ir0"], r["ir6"], r["ir_mixed"]) == (1, 0, 1, 0)

    # datetime arithmetic + misc
    r = spark.sql(translate(
        "SELECT addDate(DATE '2024-01-01', INTERVAL 1 DAY) AS ad, "
        "subDate(DATE '2024-01-01', INTERVAL 1 MONTH) AS sd, "
        "timestampAdd(TIMESTAMP '2024-01-01 00:00:00', "
        "INTERVAL 2 HOUR) AS ta, "
        "timestamp('2024-01-01') AS t1, "
        "timestamp('2024-01-01', '01:02:03.25') AS t2, "
        "fromUnixTimestampInJodaSyntax(86400, 'yyyy-MM-dd') AS joda, "
        "toLowCardinality('v') AS lc, "
        "mapPartialSort(2, map('b', 2, 'a', 1)) AS mps, "
        "medianTiming(x) AS mt, anyLastOrNull(x) AS alon "
        "FROM (SELECT 5 AS x)"
    )).collect()[0]
    assert str(r["ad"]) == "2024-01-02"
    assert str(r["sd"]) == "2023-12-01"
    assert str(r["ta"]) == "2024-01-01 02:00:00"
    assert str(r["t1"]) == "2024-01-01 00:00:00"
    assert str(r["t2"]) == "2024-01-01 01:02:03.250000"
    assert r["joda"] == "1970-01-02"
    assert r["lc"] == "v" and list(r["mps"].keys()) == ["a", "b"]
    assert r["mt"] == 5 and r["alon"] == 5

    # generateSnowflakeID: 41-bit ms timestamp in the high bits —
    # monotone lower bound is the epoch-0 layout's signature
    sf = spark.sql(translate(
        "SELECT generateSnowflakeID() AS id"
    )).collect()[0]["id"]
    assert (sf >> 22) > 1_500_000_000_000  # ms since 1970 > 2017



def test_r10_sweep_batch7(spark):
    """r10 candidate sweep, batch 7: arraySplit/arrayReverseSplit
    (cut-position + slice-window construction, [[]] on empty input
    per the left-fold model), the OrNull array picks, the OrDefault
    conversion family, generic typed JSONExtract, and the
    deterministic AES-ECB lane (PKCS7 both engines; a round trip
    plus a reference ciphertext pin). Gates are asserted in
    test_dialect_surface_audit."""
    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT arraySplit(x -> x = 1, [1,2,3,1,2,3]) AS sp, "
        "arrayReverseSplit(x -> x = 1, [1,2,3,1,2,3]) AS rsp, "
        "arraySplit(x -> x = 9, [1,2,3]) AS sp_none, "
        "arraySplit(x -> x = 1, CAST(array() AS ARRAY<INT>)) "
        "AS sp_empty, "
        "arrayFirstOrNull(x -> x > 10, [1,2]) AS fo, "
        "arrayLastOrNull(x -> x > 1, [1,2,3]) AS lo, "
        "indexOfAssumeSorted([1,3,5], 5) AS idx"
    )).collect()[0]
    assert r["sp"] == [[1, 2, 3], [1, 2, 3]]
    assert r["rsp"] == [[1], [2, 3, 1], [2, 3]]
    assert r["sp_none"] == [[1, 2, 3]] and r["sp_empty"] == [[]]
    assert r["fo"] is None and r["lo"] == 3 and r["idx"] == 3

    r = spark.sql(translate(
        "SELECT toInt64OrDefault('x', 7) AS d1, "
        "toInt64OrDefault('5', 7) AS d2, "
        "toDateOrDefault('nope', DATE '2020-01-01') AS d3, "
        "toUInt8OrDefault('300', 9) AS d4, "
        "toInt32OrDefault('bad') AS d5, "
        "JSONExtract('{\"k\": 42}', 'k', 'Int64') AS j1, "
        "JSONExtract('{\"k\": \"v\"}', 'k', 'String') AS j2, "
        "JSONExtract('{\"k\": true}', 'k', 'Bool') AS j3, "
        "appendTrailingCharIfAbsent('dir', '/') AS ap1, "
        "appendTrailingCharIfAbsent('dir/', '/') AS ap2, "
        "appendTrailingCharIfAbsent('', '/') AS ap3, "
        "isValidUTF8('ok') AS vu, isValidUTF8(NULL) AS vu_null"
    )).collect()[0]
    assert r["d1"] == 7 and r["d2"] == 5 and str(r["d3"]) == "2020-01-01"
    assert r["d4"] == 9 and r["d5"] == 0
    assert r["j1"] == 42 and r["j2"] == "v" and r["j3"] is True
    assert (r["ap1"], r["ap2"], r["ap3"]) == ("dir/", "dir/", "")
    assert r["vu"] == 1 and r["vu_null"] is None

    # AES-ECB: deterministic, PKCS7 in both engines. The ciphertext
    # is pinned (JDK AES, 'secret' under key '1234567890123456') and
    # the round trip + corrupt-input try form asserted.
    r = spark.sql(translate(
        "SELECT hex(encrypt('aes-128-ecb', 'secret', "
        "'1234567890123456')) AS ct, "
        "decrypt('aes-128-ecb', encrypt('aes-128-ecb', 'secret', "
        "'1234567890123456'), '1234567890123456') AS rt, "
        "tryDecrypt('aes-128-ecb', 'garbagegarbage!!', "
        "'1234567890123456') AS bad"
    )).collect()[0]
    assert r["ct"] == "472095246DCD6D4C387A36AE92F7E3B9"
    assert r["rt"] == "secret" and r["bad"] is None


def test_r10_sweep_batch8(spark):
    """r10 candidate sweep, batch 8: parseDateTimeBestEffort family
    (strict throws, OrNull tries, 32/64 width aliases), the
    sumMap/minMap/maxMap State/Merge combinators (state = the
    finalized (keys, values) tuple, Merge re-aggregates its arrays),
    epoch-aligned tumble windows as pure arithmetic, and basename.
    Gates are asserted in test_dialect_surface_audit."""
    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT parseDateTimeBestEffort('2024-01-15 10:20:30') AS p1, "
        "parseDateTimeBestEffortOrNull('garbage') AS p2, "
        "parseDateTime32BestEffort('2024-01-15 10:20:30') AS p3, "
        "parseDateTime64BestEffortOrNull('2024-01-15 10:20:30.123') "
        "AS p4, "
        "tumbleStart(TIMESTAMP '2024-01-15 10:23:45', "
        "INTERVAL 5 MINUTE) AS ts, "
        "tumbleEnd(TIMESTAMP '2024-01-15 10:23:45', "
        "INTERVAL 5 MINUTE) AS te, "
        "tumble(TIMESTAMP '2024-01-15 10:23:45', INTERVAL 1 HOUR) "
        "AS tw, "
        "basename('a/b/c.txt') AS b1, basename('plain') AS b2"
    )).collect()[0]
    assert str(r["p1"]) == "2024-01-15 10:20:30" and r["p2"] is None
    assert str(r["p3"]) == "2024-01-15 10:20:30"
    assert str(r["p4"]) == "2024-01-15 10:20:30.123000"
    assert str(r["ts"]) == "2024-01-15 10:20:00"
    assert str(r["te"]) == "2024-01-15 10:25:00"
    assert str(r["tw"]["col1"]) == "2024-01-15 10:00:00"
    assert str(r["tw"]["col2"]) == "2024-01-15 11:00:00"
    assert r["b1"] == "c.txt" and r["b2"] == "plain"

    # map-state round trip: per-key partial states merge to the
    # all-rows sumMap
    r = spark.sql(translate(
        "SELECT sumMapMerge(st) AS merged FROM ("
        "  SELECT sumMapState([k, k + 1], [v, v * 10]) AS st FROM ("
        "    SELECT 1 AS k, 5 AS v UNION ALL SELECT 1, 7 "
        "    UNION ALL SELECT 2, 1) GROUP BY k)"
    )).collect()[0]
    assert r["merged"]["col1"] == [1, 2, 3]
    assert r["merged"]["col2"] == [12, 121, 10]


def test_length_position_byte_semantics(spark):
    """CH length()/position()/locate() are BYTE-based on String
    (the UTF8 spellings are the codepoint forms). Pinned against
    2-byte é: length counts bytes, every position-family offset is
    the byte offset of the match, the ASCII-CI fold preserves those
    offsets, and the multiSearch positions agree."""
    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT length('héllo') AS blen, lengthUTF8('héllo') AS clen, "
        "position('héllo data', 'data') AS p, "
        "positionUTF8('héllo data', 'data') AS pu, "
        "positionCaseInsensitive('héLLo DAta', 'data') AS pci, "
        "position('héllo', 'zz') AS p0, "
        "locate('héllo data', 'data') AS loc, "
        "multiSearchFirstPosition('héllo data table', "
        "['table', 'data']) AS mfp, "
        "multiSearchAllPositions('héllo data', ['data', 'zz']) "
        "AS map_, "
        "multiSearchAllPositionsCaseInsensitive('héllo DAta', "
        "['data', 'zz']) AS mapci"
    )).collect()[0]
    assert r["blen"] == 6 and r["clen"] == 5
    assert r["p"] == 8 and r["pu"] == 7 and r["pci"] == 8
    assert r["p0"] == 0 and r["loc"] == 8 and r["mfp"] == 8
    assert r["map_"] == [8, 0] and r["mapci"] == [8, 0]


def test_r10_sweep_batch9(spark):
    """r10 candidate sweep, batch 9: combinator cross products
    (-Distinct×If, -ForEach/-Array×If, If×State both orders) and
    the moment-family State/Merge pairs (mergeable (n, Σx, Σx²) /
    6-tuple states whose merges reproduce the direct aggregates).
    Gates are asserted in test_dialect_surface_audit."""
    from clickhouse_learning_spark.functions.dialect import translate

    spark.sql(
        "SELECT * FROM VALUES (1, 10.0D, 2.0D, array(1,2)), "
        "(2, 20.0D, 8.0D, array(3,4,5)), (3, 30.0D, 18.0D, array(6)) "
        "t(id, x, y, arr)"
    ).createOrReplaceTempView("t_sweep9")

    r = spark.sql(translate(
        "SELECT uniqExactDistinct(id) AS u, "
        "sumIfDistinct(x, id < 3) AS sd, "
        "avgForEach(arr) AS afe, countForEach(arr) AS cfe, "
        "sumArrayIf(arr, id > 1) AS saif, anyArray(arr) AS aa "
        "FROM t_sweep9"
    )).collect()[0]
    assert r["u"] == 3 and float(r["sd"]) == 30.0
    assert r["cfe"] == [3, 2, 1]
    assert r["afe"] == [(1 + 3 + 6) / 3, 3.0, 5.0]
    assert r["saif"] == 3 + 4 + 5 + 6
    assert r["aa"] in (1, 3, 6)

    # moment State/Merge round trips == the direct aggregates
    merged = spark.sql(translate(
        "SELECT stddevPopMerge(st) AS sp, varSampMerge(st2) AS vs, "
        "corrMerge(cst) AS c, covarPopMerge(cst2) AS cp FROM ("
        "  SELECT stddevPopState(x) AS st, varSampState(x) AS st2, "
        "  corrState(x, y) AS cst, covarPopState(x, y) AS cst2 "
        "  FROM t_sweep9 GROUP BY id % 2)"
    )).collect()[0]
    direct = spark.sql(
        "SELECT stddev_pop(x) sp, var_samp(x) vs, corr(x, y) c, "
        "covar_pop(x, y) cp FROM t_sweep9"
    ).collect()[0]
    for a, b in zip(merged, direct):
        assert abs(a - b) < 1e-9

    # argMax state carries (arg, val); merge re-compares on val
    r = spark.sql(translate(
        "SELECT argMaxMerge(st) AS am, argMinMerge(st2) AS an FROM ("
        "  SELECT argMaxState(id, x) AS st, argMinState(id, x) AS st2 "
        "  FROM t_sweep9 GROUP BY id % 2)"
    )).collect()[0]
    assert r["am"] == 3 and r["an"] == 1

    # If×State both orders + count form
    r = spark.sql(translate(
        "SELECT avgMerge(st) AS a, sumMerge(st2) AS s, "
        "countMerge(st3) AS c FROM ("
        "  SELECT avgIfState(x, id < 3) AS st, "
        "  sumStateIf(x, id > 1) AS st2, "
        "  countIfState(id > 1) AS st3 FROM t_sweep9 GROUP BY id)"
    )).collect()[0]
    assert float(r["a"]) == 15.0 and float(r["s"]) == 50.0
    assert r["c"] == 2


def test_r10_sweep_batch10(spark):
    """r10 candidate sweep, batch 10: arithmetic leftovers (gcd/lcm
    via a bounded Euclid fold, toward-zero trunc/truncate,
    moduloOrZero/divideOrNull), strict/Or* IPv6 text→binary
    conversions, Class-C rendering, Linf/Lp normalization,
    readable-size parsing (decimal + binary ladders, rounded up),
    and dictGetOrNull (NULL beats the DDL default on a miss).
    Gates are asserted in test_dialect_surface_audit."""
    import pytest as _pytest

    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT gcd(12, 18) AS g1, gcd(0, 7) AS g2, gcd(0, 0) AS g3, "
        "gcd(-12, 18) AS g4, lcm(4, 6) AS l1, lcm(0, 5) AS l2, "
        "trunc(-2.7) AS t1, trunc(2.7) AS t2, "
        "truncate(2.789, 2) AS t3, truncate(-2.789, 2) AS t4, "
        "moduloOrZero(7, 0) AS mz, moduloOrZero(7, 3) AS m3, "
        "divideOrNull(1, 0) AS dn, divideOrNull(7, 2) AS d2, "
        "canonicalRand() AS cr"
    )).collect()[0]
    assert (r["g1"], r["g2"], r["g3"], r["g4"]) == (6, 7, 0, 6)
    assert (r["l1"], r["l2"]) == (12, 0)
    assert (r["t1"], r["t2"]) == (-2.0, 2.0)
    assert (abs(r["t3"] - 2.78) < 1e-12
            and abs(r["t4"] - -2.78) < 1e-12)
    assert r["mz"] == 0 and r["m3"] == 1
    assert r["dn"] is None and r["d2"] == 3.5
    assert 0.0 <= r["cr"] < 1.0

    r = spark.sql(translate(
        "SELECT hex(toIPv6('::1')) AS h1, "
        "toIPv6OrNull('bad') AS h2, "
        "hex(toIPv6OrZero('bad')) AS h3, "
        "hex(toIPv6OrDefault('bad')) AS h4, "
        "IPv4NumToStringClassC(3232235777) AS cc, "
        "LinfNormalize([3.0, -4.0]) AS ln_, "
        "LpNormalize([3.0, 4.0], 2) AS lp, "
        "parseReadableSize('1.5 KiB') AS ps, "
        "parseReadableSize('10 MB') AS ps2, "
        "parseReadableSizeOrNull('nonsense') AS ps3, "
        "parseReadableSizeOrZero('nonsense') AS ps4"
    )).collect()[0]
    assert r["h1"] == "0" * 31 + "1"
    assert r["h2"] is None and r["h3"] == "0" * 32
    assert r["h4"] == "0" * 32
    assert r["cc"] == "192.168.1.xxx"
    assert r["ln_"] == [0.75, -1.0]
    assert r["lp"] == [0.6, 0.8]
    assert r["ps"] == 1536 and r["ps2"] == 10_000_000
    assert r["ps3"] is None and r["ps4"] == 0

    # dictGetOrNull ignores the DDL default on a miss
    spark.sql(
        "SELECT * FROM VALUES (1, 30) t(uid, age)"
    ).createOrReplaceTempView("b10_user_dim")
    dicts = {"d.u": ("b10_user_dim", "uid", {"age": 99})}
    hit, miss, miss_dflt = spark.sql(translate(
        "SELECT dictGetOrNull('d.u', 'age', 1) AS hit, "
        "dictGetOrNull('d.u', 'age', 2) AS miss, "
        "dictGet('d.u', 'age', 2) AS miss_dflt",
        dictionaries=dicts,
    )).collect()[0]
    assert hit == 30 and miss is None and miss_dflt == 99

    # strict parseReadableSize raises on invalid input (CH throws)
    with _pytest.raises(Exception, match="parseReadableSize"):
        spark.sql(translate(
            "SELECT parseReadableSize('nonsense') AS x"
        )).collect()
