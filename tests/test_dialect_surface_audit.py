"""Standing surface audit: no silent passthroughs (r7).

The dialect's policy lets unknown function names pass through so Spark
builtins keep working — but a CH-specific name that Spark lacks (or
worse, resolves CASE-INSENSITIVELY to a different algorithm, like
xxHash64 → Spark's seed-42 xxhash64) then fails or silently changes
values at runtime. This suite walks a curated list of ClickHouse
function names and asserts each is either MAPPED (the name does not
survive translation), GATED (translate raises an actionable
ValueError), or on the explicit SAME-SEMANTICS whitelist of names
Spark shares. Round 7's audits found seven string-distance names, four
normalization forms, two Java hashes, the extractAllGroups family,
splitByNonAlpha and the xxHash64 seed trap this way — this test keeps
the class closed as the dialect grows."""

from __future__ import annotations

import pytest

from clickhouse_learning_spark.functions.dialect import translate

# CH names Spark shares with IDENTICAL semantics (audited by hand):
# these may pass through untranslated
_SHARED_OK = {
    "soundex",  # same 4-char code algorithm
    "initcap",
    "repeat", "reverse", "concat", "substring", "lower", "upper",
    "abs", "round", "floor", "ceil", "exp", "ln", "log2", "log10",
    "sqrt", "cbrt", "sin", "cos", "tan", "asin", "acos", "atan",
    "pi", "e", "sign", "degrees", "radians",
    # r9: name-identical WINDOW functions — CH and Spark agree on the
    # frame semantics; in an aggregate context both engines' first/
    # last are insertion-order non-deterministic, the same contract
    "first_value", "last_value", "nth_value",
    # r10: version() returns THIS engine's version in both systems —
    # Spark's builtin is the honest analog (engine identity, not a
    # ClickHouse version string)
    "version",
    # r10 sweep 2: name-identical math/string builtins with the same
    # IEEE/SQL-standard semantics in both engines
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh", "atan2",
    "hypot", "log1p", "expm1", "factorial", "width_bucket", "overlay",
    "space",
    # r10 sweep 5: name-identical WINDOW functions (same frame
    # semantics; CH requires an OVER clause for these exactly as
    # Spark does)
    "row_number", "rank", "dense_rank", "percent_rank", "cume_dist",
    "ntile",
    # r10 sweep 8: LAST_DAY is CH's toLastDayOfMonth alias and
    # Spark's last_day — identical last-day-of-month semantics
    "last_day",
    # r10 sweep 10: name-identical semantics — CH log(x) IS natural
    # log (alias ln) = Spark's log(x); power/pow identical IEEE;
    # date_trunc agrees on every unit incl. week (both Monday)
    "log", "power", "pow", "date_trunc",
}

# every name here must be mapped or gated — NEVER a passthrough
_MUST_HANDLE = [
    # string distance / similarity (r7)
    "editDistance('a','b')", "editDistanceUTF8('a','b')",
    "levenshteinDistance('a','b')", "levenshteinDistanceUTF8('a','b')",
    "jaroSimilarity('a','b')", "jaroWinklerSimilarity('a','b')",
    "stringJaccardIndex('a','b')", "damerauLevenshteinDistance('a','b')",
    "byteHammingDistance('a','b')",
    # hash families incl. the case-insensitive resolution traps
    "xxHash64('x')", "xxHash32('x')", "cityHash64('x')",
    "sipHash64('x')", "sipHash128('x')", "farmHash64('x')",
    "metroHash64('x')", "murmurHash2_64('x')", "murmurHash3_32('x')",
    "murmurHash3_64('x')", "murmurHash3_128('x')", "javaHash('x')",
    "hiveHash('x')", "javaHashUTF16LE('x')", "intHash64(1)",
    "halfMD5('x')",
    # normalization / text
    "normalizeUTF8NFC('a')", "normalizeUTF8NFD('a')",
    "normalizeUTF8NFKC('a')", "normalizeUTF8NFKD('a')",
    "toValidUTF8('a')", "splitByNonAlpha('a b')",
    "splitByWhitespace('a b')", "alphaTokens('a b')",
    "extractAllGroups('a1', '(\\\\d)')",
    "extractAllGroupsVertical('a1', '(\\\\d)')",
    "extractAllGroupsHorizontal('a1', '(\\\\d)')",
    "stem('x')", "lemmatize('en', 'x')", "detectLanguage('x')",
    "detectCharset('x')", "detectTonality('x')",
    "ngramDistance('a','b')", "ngramSearch('a','b')",
    "wordShingleSimHash('x')", "wordShingleMinHash('x')",
    "bitSlice('ab', 1, 4)", "tupleHammingDistance((1,2),(1,3))",
    # datetime families r7 touched
    "toDateTime64OrZero('x', 3)", "toDateTime64OrNull('x', 3)",
    "toDateTimeOrZero('x')", "toDateTimeOrNull('x')",
    "toDate32OrZero('x')", "toDate32OrNull('x')",
    # misc CH-only
    "formatReadableSize(1)", "formatReadableQuantity(1)",
    "bar(1, 0, 10, 10)", "transform(1, [1], ['a'], 'b')",
    "normalizeQuery('x')", "sparkbar(9)(1, 1)",
    # r8 (VERDICT r7 item 5): the URL family a crawl-analytics user
    # actually hits — every name mapped (parse_url/regex forms with
    # documented divergences) or gated (the hierarchy walks)
    "domain('http://a.b/c')", "domainWithoutWWW('http://www.a.b/c')",
    "topLevelDomain('http://a.b.c/')",
    "firstSignificantSubdomain('http://news.a.com/')",
    "cutToFirstSignificantSubdomain('http://news.a.com/')",
    "protocol('http://a.b/')", "path('http://a.b/c?d=1')",
    "pathFull('http://a.b/c?d=1')", "netloc('http://a.b:8080/c')",
    "fragment('http://a.b/#f')", "queryString('http://a.b/?x=1')",
    "queryStringAndFragment('http://a.b/?x=1#f')",
    "extractURLParameter('http://a.b/?x=1', 'x')",
    "extractURLParameters('http://a.b/?x=1&y=2')",
    "extractURLParameterNames('http://a.b/?x=1&y=2')",
    "cutQueryString('http://a.b/?x=1')",
    "cutFragment('http://a.b/#f')",
    "cutQueryStringAndFragment('http://a.b/?x=1#f')",
    "cutWWW('http://www.a.b/')", "port('http://a.b:8080/')",
    "decodeURLComponent('a%20b')", "encodeURLComponent('a b')",
    "decodeURLFormComponent('a+b')", "encodeURLFormComponent('a b')",
    "URLHierarchy('http://a.b/c/d')", "URLPathHierarchy('http://a.b/c/d')",
    # r8: split edge semantics + the toStartOf*/dateDiff unit grid
    "splitByChar(',', 'a,b')", "splitByString(', ', 'a, b')",
    "splitByRegexp('[0-9]+', 'a1b')",
    "toStartOfSecond(now64())", "toStartOfMinute(now())",
    "toStartOfFiveMinute(now())", "toStartOfFiveMinutes(now())",
    "toStartOfTenMinutes(now())", "toStartOfFifteenMinutes(now())",
    "toStartOfHour(now())", "toStartOfDay(now())",
    "toStartOfWeek(today())", "toStartOfWeek(today(), 1)",
    "toStartOfMonth(today())", "toStartOfQuarter(today())",
    "toStartOfYear(today())",
    "toStartOfInterval(now(), INTERVAL 5 MINUTE)",
    "dateDiff('day', today(), today())",
    "date_diff('week', today(), today())",
    "timeDiff(now(), now())",
    # r9 (VERDICT r8 item 6): the raw-slice JSON family (mapped to the
    # jsonraw scanner UDFs), JSONType's gate, the toRelative grid, and
    # the arrayEnumerate/arrayReduce corners — all mapped-or-gated
    "JSONExtractArrayRaw('[1,2]')",
    "JSONExtractKeysAndValuesRaw('{\"a\":1}')",
    "JSONType('{}')", "JSONExtractRaw('{\"a\":1}', 'a')",
    "JSONExtractKeys('{\"a\":1}')", "JSONLength('[1,2]')",
    "toRelativeYearNum(today())", "toRelativeQuarterNum(today())",
    "toRelativeMonthNum(today())", "toRelativeWeekNum(today())",
    "toRelativeDayNum(today())", "toRelativeHourNum(now())",
    "toRelativeMinuteNum(now())", "toRelativeSecondNum(now())",
    "arrayEnumerate([1,2])", "arrayEnumerateDense([1,1,2])",
    "arrayEnumerateUniq([1,1,2])", "arrayReduce('sum', [1,2])",
    # r9 late batch: former silent passthroughs caught by a candidate
    # sweep — the IPv6 codec pair (mapped via stdlib RFC 5952),
    # bitHammingDistance (popcount-of-xor), regexpQuoteMeta (CH's
    # documented escape set), and the UUID byte-order gates
    "IPv6NumToString(x)", "IPv6StringToNum('::1')",
    "IPv6StringToNumOrNull('::1')", "isIPv6String('::1')",
    "bitHammingDistance(1, 3)", "regexpQuoteMeta('a.b')",
    "UUIDStringToNum('00000000-0000-0000-0000-000000000000')",
    "UUIDNumToString(x)",
    "snowflakeToDateTime(1)", "dateTimeToSnowflake(now())",
    "toUnixTimestamp64Milli(x)", "fromUnixTimestamp64Milli(1)",
    # r9 late batch 2: CI multisearch, decimal casts, strict cast,
    # bool cast, prose/tuple gates
    "multiSearchAnyCaseInsensitive('a', ['A'])",
    "multiSearchAllPositionsCaseInsensitive('a', ['A'])",
    "positionCaseInsensitiveUTF8('a', 'A')",
    "toDecimal32('1', 2)", "toDecimal64('1', 2)",
    "toDecimal128('1', 2)", "toDecimal64OrZero('1', 2)",
    "toDecimal64OrNull('1', 2)", "toDecimal256('1', 2)",
    "accurateCast(1, 'Int64')", "toBool('true')",
    "formatReadableTimeDelta(1)",
    "addTupleOfIntervals(today(), (toIntervalDay(1),))",
    "nested(['k'], [1])",
    "quantilesExactInclusive(0.5)(x)",
    "quantilesExactExclusive(0.5)(x)",
    "stochasticLinearRegression(x, y)",
    "stochasticLogisticRegression(x, y)",
    # r9 late batch 3: geo/encoding/string sweep
    "upperUTF8('a')", "lowerUTF8('A')", "toStringCutToZero('a')",
    "ascii('a')", "char(65)",
    "h3ToGeo(1)", "geoToH3(1.0, 2.0, 9)",
    "base64URLEncode('x')", "base64URLDecode('x')",
    "convertCharset('x', 'a', 'b')", "bin('a')", "unbin('0')",
    # r10 sweep: vector/tuple math, datetime corners, string corners,
    # bit corners, JSON-lite family, respect-nulls variants, server
    # introspection, IDNA
    "L1Normalize([1,2])", "L2Normalize([3,4])",
    "tuplePlus((1,2),(3,4))", "tupleMinus((1,),(2,))",
    "tupleNegate((1,2))", "tupleConcat((1,),(2,))",
    "tupleMultiplyByNumber((1,),2)", "tupleDivideByNumber((1,),2)",
    "arrayEnumerateUniqRanked([1,1])", "arrayEnumerateDenseRanked([1])",
    "makeDateTime64(2024,1,15,10,0,0)", "YYYYMMDDToDate(20240115)",
    "YYYYMMDDToDate32(20240115)",
    "YYYYMMDDhhmmssToDateTime(20240115102030)",
    "toStartOfMillisecond(now64())", "toStartOfMicrosecond(now64())",
    "toStartOfNanosecond(now64())",
    "concatAssumeInjective('a','b')", "leftPadUTF8('x', 3, 'y')",
    "rightPadUTF8('x', 3, 'y')", "stringCompare('a','b')",
    "min2(1,2)", "max2(1,2)",
    "bitTestAll(5, 0, 2)", "bitTestAny(5, 1)",
    "bitRotateLeft(1, 2)", "bitRotateRight(1, 2)",
    "roundDown(5, [1,4,6])", "caseWithExpression(1, 1, 'a', 'b')",
    "multiplyDecimal(a, b)", "divideDecimal(a, b)",
    "any_respect_nulls(x)", "anyLast_respect_nulls(x)",
    "first_value_respect_nulls(x)", "last_value_respect_nulls(x)",
    "nothing(x)", "groupConcat(x)",
    "uptime()", "serverUUID()", "zookeeperSessionUptime()",
    "defaultValueOfArgumentType(1)", "isConstant(1)", "aggThrow(0.5)",
    "visibleWidth('x')", "sparseGrams('abc', 3)",
    "JSONMergePatch('{}','{}')", "JSONArrayLength('[1,2]')",
    "firstSignificantSubdomainCustom('http://a.co','x')",
    "cutToFirstSignificantSubdomainCustom('http://a.co','x')",
    "idnaEncode('a.de')", "tryIdnaEncode('a.de')", "idnaDecode('a.de')",
    "proportionsZTest(1,2,3,4,0.95,'unpooled')",
    "simpleJSONExtractInt('{}','a')", "simpleJSONExtractUInt('{}','a')",
    "simpleJSONExtractFloat('{}','a')",
    "simpleJSONExtractBool('{}','a')", "simpleJSONExtractRaw('{}','a')",
    "simpleJSONHas('{}','a')", "visitParamExtractInt('{}','a')",
    "visitParamExtractUInt('{}','a')",
    "visitParamExtractFloat('{}','a')",
    "visitParamExtractBool('{}','a')", "visitParamExtractRaw('{}','a')",
    "visitParamHas('{}','a')",
    # r10 sweep 2: ids/curves/datetime-components/consistent-hash/math
    "toUUID('x')", "toUUIDOrNull('x')", "toUUIDOrZero('x')",
    "UUIDToNum(u)", "toUUIDFromNum(b)", "UUIDv7ToDateTime(u)",
    "generateUUIDv7()", "generateULID()",
    "ULIDStringToDateTime('01GNB2S2FGN2P93QPXDNB4EN2R')",
    "snowflakeIDToDateTime(123)", "snowflakeIDToDateTime64(123)",
    "dateTimeToSnowflakeID(now())", "dateTime64ToSnowflakeID(now64())",
    "timezoneOf(now())", "toMicrosecond(now64())",
    "toNanosecond(now64())", "toTimeWithFixedDate(now())",
    "changeYear(today(), 2000)", "changeMonth(today(), 2)",
    "changeDay(today(), 2)", "changeHour(now(), 2)",
    "changeMinute(now(), 2)", "changeSecond(now(), 2)",
    "mortonEncode(1, 2)", "mortonDecode(2, 5)",
    "hilbertEncode(1, 2)", "hilbertDecode(2, 5)",
    "kostikConsistentHash(1, 2)", "yandexConsistentHash(1, 2)",
    "jumpConsistentHash(1, 2)", "wyHash64('x')",
    "CRC32('x')", "CRC32IEEE('x')", "CRC64('x')",
    "crc32('x')", "crc32ieee('x')", "crc64('x')",
    "erf(1.0)", "erfc(1.0)", "lgamma(1.0)", "tgamma(1.0)",
    "toIntervalMillisecond(5)", "toIntervalMicrosecond(5)",
    "toIntervalNanosecond(5)", "addInterval(x, y)",
    "overlayUTF8('hello', 'XX', 2)", "groupArrayIntersect(a)",
    "studentTTestOneSample(x, 1.0)", "analysisOfVariance(x, g)",
    "flameGraph(t)", "distinctDynamicTypes(d)", "distinctJSONPaths(j)",
    "approx_top_k(3)(x)", "approx_top_sum(3)(x, w)",
    "quantileDD(0.01, 0.5)(x)", "quantileTDigestWeighted(0.5)(x, w)",
    "quantileInterpolatedWeighted(0.5)(x, w)",
    "sumMapFilteredWithOverflow([1])(k, v)",
    # r10 sweep 3: HTML/XML, formatting, reinterpret, rand
    # distributions, numeric helpers
    "extractTextFromHTML('<p>x</p>')", "decodeHTMLComponent('&amp;')",
    "encodeXMLComponent('<a>')", "decodeXMLComponent('&lt;')",
    "toDecimalString(3.14, 2)", "printf('%d', 5)",
    "formatQuery('select 1')", "formatQuerySingleLine('select 1')",
    "fuzzBits('x', 0.1)", "byteSwap(123)", "toFixedString('a', 3)",
    "reinterpret(1, 'String')", "reinterpretAsUInt64('x')",
    "reinterpretAsString(1)", "structureToProtobufSchema('x Int64')",
    "structureToCapnProtoSchema('x Int64')",
    "generateRandomStructure(3)", "minSampleSizeContinous(1,1,1,1,1)",
    "minSampleSizeConversion(0.1,0.05,0.8,0.05)", "icebergTruncate(3, 'a')",
    "randUniform(0, 1)", "randNormal(0, 1)", "randBernoulli(0.5)",
    "randExponential(1)", "randLogNormal(0, 1)", "randChiSquared(2)",
    "randStudentT(2)", "randFisherF(2, 2)", "randPoisson(2)",
    "randBinomial(10, 0.5)", "randNegativeBinomial(10, 0.5)",
    "clamp(5, 1, 3)", "positiveModulo(-1, 3)", "negate(5)",
    # r10 sweep 4: combinator-suffix corners
    "anyOrNull(x)", "countOrNull(x)", "sumOrDefault(x)",
    "argMinOrNull(a, b)", "argMaxOrNull(a, b)",
    "avgWeightedIf(x, w, c)",
    "groupBitAnd(x)", "groupBitOr(x)", "groupBitXor(x)",
    "quantilesExactLow(0.5)(x)", "quantilesExactHigh(0.5)(x)",
    "exponentialTimeDecayedAvg(10)(v, t)",
    "exponentialTimeDecayedSum(10)(v, t)",
    "exponentialTimeDecayedCount(10)(t)",
    "exponentialTimeDecayedMax(10)(v, t)",
    "sequenceMatchEvents('(?1)')(t, c)", "bitmapTransform(b, f, t)",
    # r10 sweep 5: array set ops + server introspection
    "arrayUnion([1],[2])", "arraySymmetricDifference([1],[2])",
    "toUnixTimestamp64Second(t)", "nonNegativeDerivative(v, t)",
    "hostName()", "FQDN()", "shardNum()", "shardCount()",
    "queryID()", "initialQueryID()", "partitionID(a)",
    "getSetting('x')", "getServerSetting('x')", "globalVariable('x')",
    "getMacro('x')", "getClientHTTPHeader('x')", "connectionId()",
    "displayName()", "showCertificate()", "tcpPort()",
    "filesystemAvailable()", "filesystemCapacity()",
    "filesystemUnreserved()", "estimateCompressionRatio('lz4')(x)",
    # r10 sweep 6: subsequence/token search, range(), IPv6 CIDR
    # algebra, null classifiers, datetime arithmetic
    "hasSubsequence('ab', 'a')", "hasSubsequenceUTF8('ab', 'a')",
    "hasSubsequenceCaseInsensitive('ab', 'A')",
    "hasSubsequenceCaseInsensitiveUTF8('ab', 'A')",
    "hasTokenOrNull('a b', 'a')",
    "hasTokenCaseInsensitiveOrNull('a b', 'A')",
    "countMatchesCaseInsensitive('aA', 'a')",
    "substringIndexUTF8('a.b', '.', 1)", "firstLine('a')",
    "range(5)", "range(1, 5)", "range(1, 10, 2)",
    "isNull(x)", "isZeroOrNull(x)", "isNotDistinctFrom(a, b)",
    "anyLastOrNull(x)", "medianTiming(x)", "medianTDigest(x)",
    "medianBFloat16(x)", "medianDD(x)", "medianTimingWeighted(x, w)",
    "medianTDigestWeighted(x, w)", "medianBFloat16Weighted(x, w)",
    "quantileBFloat16Weighted(0.5)(x, w)",
    "IPv6CIDRToRange(ip, 32)", "cutIPv6(ip, 2, 0)",
    "isIPAddressInRange('1.2.3.4', '1.2.3.0/24')",
    "MACStringToOUI('12:34:56:78:9A:BC')", "IPv4ToIPv6(1)",
    "addDate(d, INTERVAL 1 DAY)", "subDate(d, INTERVAL 1 DAY)",
    "timestampAdd(d, INTERVAL 1 DAY)",
    "timestampSub(d, INTERVAL 1 DAY)",
    "timestamp('2024-01-01')", "timezone()",
    "fromUnixTimestampInJodaSyntax(x, 'yyyy')",
    "generateSnowflakeID()", "toLowCardinality(x)",
    "mapPartialSort(2, mp)", "mapPartialReverseSort(2, mp)",
    "arrayPartialShuffle(a, 2)",
    "formatRow('CSV', a)", "formatRowNoNewline('CSV', a)",
    "sqidEncode(1)", "sqidDecode('x')", "geohashesInBox(1,2,3,4,5)",
    "arrayPRAUC(s, l)", "arrayLevenshteinDistance(a, b)",
    "arrayLevenshteinDistanceWeighted(a, b, wa, wb)",
    "arraySimilarity(a, b, wa, wb)", "arrayNormalizedGini(a, b)",
    "untuple(t)", "toColumnTypeName(x)", "lowCardinalityKeys(x)",
    "lowCardinalityIndices(x)", "dictGetHierarchy(d, k)",
    "dictGetChildren(d, k)", "dictGetDescendants(d, k)",
    "dictIsIn(d, c, p)", "regionToCity(x)", "regionToArea(x)",
    "regionToDistrict(x)", "regionToCountry(x)",
    "regionToContinent(x)", "regionToTopContinent(x)",
    "regionToPopulation(x)", "regionIn(a, b)", "regionHierarchy(x)",
    # r10 sweep 7: array split corners, OrDefault conversions,
    # typed JSONExtract, AES-ECB, misc
    "arraySplit(f, a)", "arrayReverseSplit(f, a)",
    "arrayFirstOrNull(f, a)", "arrayLastOrNull(f, a)",
    "indexOfAssumeSorted(a, 3)", "arrayReduceInRanges('sum', r, a)",
    "toInt128(x)", "toInt256(x)", "toUInt128(x)", "toUInt256(x)",
    "toInt128OrNull(x)", "toUInt256OrZero(x)",
    "toInt64OrDefault(x, 0)", "toUInt8OrDefault(x, 0)",
    "toFloat64OrDefault(x, 0.0)", "toDateOrDefault(x, d)",
    "toDate32OrDefault(x, d)", "toDateTimeOrDefault(x, t)",
    "JSONExtract(j, 'a', 'Int64')",
    "JSONAllPaths(j)", "JSONAllPathsWithTypes(j)",
    "JSONDynamicPaths(j)", "JSONSharedDataPaths(j)",
    "encrypt('aes-128-ecb', s, k)", "decrypt('aes-128-ecb', s, k)",
    "tryDecrypt('aes-128-ecb', s, k)",
    "aes_encrypt_mysql('aes-128-ecb', s, k)",
    "aes_decrypt_mysql('aes-128-ecb', s, k)",
    "appendTrailingCharIfAbsent(s, '/')", "isValidUTF8(s)",
    "bech32Encode('bc', s)", "bech32Decode(s)",
    "stringToH3(s)", "h3ToString(x)",
    "avgMap(k, v)", "countMap(k)",
    "quantilesTimingWeighted(0.5, 0.9)(x, w)",
    # r10 sweep 8: best-effort parse aliases, map-state combinators,
    # tumble windows, geometry/ML/transaction gates
    "parseDateTimeBestEffort(s)", "parseDateTimeBestEffortOrNull(s)",
    "parseDateTime32BestEffort(s)",
    "parseDateTime32BestEffortOrNull(s)",
    "parseDateTime32BestEffortOrZero(s)",
    "parseDateTime64BestEffort(s)",
    "parseDateTime64BestEffortOrNull(s)",
    "parseDateTime64BestEffortOrZero(s)",
    "sumMapState(k, v)", "sumMapMerge(st)", "minMapState(k, v)",
    "minMapMerge(st)", "maxMapState(k, v)", "maxMapMerge(st)",
    "tumble(t, INTERVAL 5 MINUTE)",
    "tumbleStart(t, INTERVAL 5 MINUTE)",
    "tumbleEnd(t, INTERVAL 5 MINUTE)",
    "hop(t, INTERVAL 1 MINUTE, INTERVAL 5 MINUTE)",
    "hopStart(t, INTERVAL 1 MINUTE, INTERVAL 5 MINUTE)",
    "hopEnd(t, INTERVAL 1 MINUTE, INTERVAL 5 MINUTE)",
    "basename(p)", "joinGet('db.t', 'col', k)",
    "joinGetOrNull('db.t', 'col', k)", "evalMLMethod(st, f)",
    "runningConcurrency(s, e)",
    "runningDifferenceStartingWithFirstValue(x)",
    "initializeAggregation('sumState', x)", "finalizeAggregation(st)",
    "subtractInterval(t, i)", "quantileExactState(x)",
    "quantileExactMerge(st)", "file('p')",
    "defaultValueOfTypeName('Int32')", "hasColumnInTable('d','t','c')",
    "transactionID()", "transactionLatestSnapshot()", "revision()",
    "buildId()", "uptime()", "zookeeperSessionUptime()",
    "getOSKernelVersion()", "currentProfiles()", "enabledProfiles()",
    "defaultProfiles()", "currentRoles()", "enabledRoles()",
    "defaultRoles()", "wkt(p)", "svg(p)", "readWKTPoint(s)",
    "readWKTPolygon(s)", "readWKTMultiPolygon(s)",
    "readWKTLineString(s)", "readWKTRing(s)",
    "polygonAreaCartesian(p)", "polygonPerimeterCartesian(p)",
    "polygonsUnionCartesian(p, q)",
    "polygonsIntersectionCartesian(p, q)",
    "polygonAreaSpherical(p)", "polygonPerimeterSpherical(p)",
    "polygonsDistanceSpherical(p, q)",
    "polygonConvexHullCartesian(p)",
    # r10 sweep 9: combinator cross products + moment State/Merge
    "uniqExactDistinct(x)", "sumIfDistinct(x, c)",
    "sumDistinctIf(x, c)", "avgIfDistinct(x, c)",
    "countIfDistinct(x, c)",
    "avgForEach(a)", "countForEach(a)",
    "sumForEachIf(a, c)", "avgForEachIf(a, c)",
    "sumArrayIf(a, c)", "sumIfArray(a, c)", "avgArrayIf(a, c)",
    "minArrayIf(a, c)", "maxIfArray(a, c)", "countArrayIf(a, c)",
    "anyArray(a)",
    "anyLastState(x)", "anyLastMerge(st)",
    "argMaxState(a, b)", "argMaxMerge(st)",
    "argMinState(a, b)", "argMinMerge(st)",
    "sumIfState(x, c)", "sumStateIf(x, c)", "avgIfState(x, c)",
    "minIfState(x, c)", "maxStateIf(x, c)", "countIfState(c)",
    "countStateIf(c)", "anyLastIfState(x, c)",
    "varPopState(x)", "varPopMerge(st)", "varSampState(x)",
    "varSampMerge(st)", "stddevPopState(x)", "stddevPopMerge(st)",
    "stddevSampState(x)", "stddevSampMerge(st)",
    "covarPopState(x, y)", "covarPopMerge(st)",
    "covarSampState(x, y)", "covarSampMerge(st)",
    "corrState(x, y)", "corrMerge(st)",
    "topKState(5)(x)", "topKMerge(5)(st)",
    "windowFunnelState(10)(t, a)", "windowFunnelMerge(10)(st)",
    "quantilesExactState(0.5, 0.9)(x)",
    "quantilesExactMerge(0.5, 0.9)(st)",
    # r10 sweep 10: arithmetic leftovers, IPv6 strict conversions,
    # readable-size parsing, norm variants
    "moduloOrZero(a, b)", "divideOrNull(a, b)", "moduloLegacy(a, b)",
    "gcd(a, b)", "lcm(a, b)", "trunc(x)", "truncate(x, 2)",
    "canonicalRand()", "toUUIDOrDefault(s, u)",
    "toIPv6(s)", "toIPv6OrNull(s)", "toIPv6OrZero(s)",
    "toIPv6OrDefault(s)", "toIPv4OrDefault(s)",
    "IPv4NumToStringClassC(x)",
    "LinfNormalize(a)", "LpNormalize(a, 3)",
    "parseReadableSize('1 KiB')", "parseReadableSizeOrNull(s)",
    "parseReadableSizeOrZero(s)", "parseTimeDelta(s)",
    "emptyArrayToSingle(a)", "dictGetAll('d', 'a', k)",
    "ngramSimHashCaseInsensitive(s)", "ngramMinHashUTF8(s)",
    "ngramMinHashArg(s)", "wordShingleMinHashArgUTF8(s)",
]


@pytest.mark.parametrize("expr", _MUST_HANDLE,
                         ids=[e.split("(")[0] for e in _MUST_HANDLE])
def test_no_silent_passthrough(expr):
    name = expr.split("(")[0]
    try:
        out = translate(f"SELECT {expr}")
    except ValueError:
        return  # gated with an actionable message — correct handling
    import re

    # word-boundary match: a translation to a LONGER builtin that
    # merely embeds the name (timezone → current_timezone) is fine
    assert not re.search(rf"\b{re.escape(name)}\s*\(", out), (
        f"{name} passed through UNTRANSLATED — Spark will either fail "
        f"UNRESOLVED_ROUTINE at runtime or (worse) case-insensitively "
        f"resolve it to a different algorithm: {out}"
    )


def test_shared_whitelist_names_resolve(spark):
    """The whitelist is only legitimate while Spark actually shares
    the name — spot-check a few execute."""
    row = spark.sql(
        "SELECT soundex('Robert') AS s, initcap('ab cd') AS i"
    ).collect()[0]
    assert row["s"] == "R163" and row["i"] == "Ab Cd"
