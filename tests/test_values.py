"""ClickHouse Values format laws (sources/values.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from clickhouse_learning_spark.sources import values as V


def test_render_parse_identity_scalars():
    cases = [
        ("Int64", 42), ("Int64", -7), ("UInt32", 0),
        ("Float64", 1.5), ("Float64", -0.25),
        ("Float64", float("inf")), ("Float64", float("-inf")),
        ("String", ""), ("String", "plain"),
        ("String", "q'uote\\back\nnl\ttab\rcr\bbs\fff\0nul é日🙂"),
        ("Date", dt.date(2024, 2, 29)),
        ("DateTime", dt.datetime(2024, 1, 2, 3, 4, 5)),
        ("DateTime64(3)", dt.datetime(2024, 1, 2, 3, 4, 5, 789000)),
        ("Nullable(String)", None), ("Nullable(Int64)", None),
        ("Array(Int64)", [1, -2, 3]), ("Array(Int64)", []),
        ("Array(String)", ["a', b", "c]d", ""]),
        ("Array(Nullable(Int64))", [1, None, 3]),
    ]
    for t, v in cases:
        c = V._ValuesType(t)
        assert c.parse(c.render(v)) == v, (t, v)
    # nan compares by repr
    c = V._ValuesType("Float64")
    out = c.parse(c.render(float("nan")))
    assert out != out  # NaN


def test_parse_ch_style_streams():
    rows = V.parse_values(
        "(1,'a\\'b'),(2,NULL) , (3,'x,y')\n,(4,'[not,an,array]');",
        ["Int64", "Nullable(String)"],
    )
    assert rows == [
        (1, "a'b"), (2, None), (3, "x,y"), (4, "[not,an,array]")
    ]
    # arrays with quoted elements containing separators
    rows = V.parse_values(
        "(1,[ 'a,b' , ']' ],[1, 2])",
        ["Int64", "Array(String)", "Array(Int64)"],
    )
    assert rows == [(1, ["a,b", "]"], [1, 2])]
    # unknown escape keeps the char (the CH/TSV convention)
    assert V.parse_values("('a\\qb')", ["String"]) == [("aqb",)]


def test_sql_doubled_quote_escape():
    """ADVICE r8 (medium): CH's INSERT-wire Values parser accepts SQL
    doubled-quote escaping — 'x''y' is the 3-char string x'y, not a
    parse boundary. Pinned: the walk, the field splitter, and the
    array-element path."""
    assert V.parse_values("('x''y')", ["String"]) == [("x'y",)]
    # doubled quote does not end the literal even before a comma
    assert V.parse_values(
        "(1,'a'',b''c',2)", ["Int64", "String", "Int64"]
    ) == [(1, "a',b'c", 2)]
    # a string that is ONLY an escaped quote: '''' → '
    assert V.parse_values("('''')", ["String"]) == [("'",)]
    # adjacent empty strings stay empty (the '' literal is NOT an
    # escape when it is the whole field)
    assert V.parse_values(
        "('','')", ["String", "String"]
    ) == [("", "")]
    # array elements: ['a''b', ''] with separators after the escape
    assert V.parse_values(
        "(['a''b',''])", ["Array(String)"]
    ) == [(["a'b", ""],)]
    # mixed with backslash escapes in one literal: \' then '' → a''b
    assert V.parse_values("('a\\'''b')", ["String"]) == [("a''b",)]


def test_malformed_rejected():
    with pytest.raises(ValueError, match="expected '\\('"):
        V.parse_values("1,2", ["Int64", "Int64"])
    with pytest.raises(ValueError, match="unterminated string"):
        V.parse_values("('abc", ["String"])
    with pytest.raises(ValueError, match="fields, schema has"):
        V.parse_values("(1,2)", ["Int64"])
    with pytest.raises(ValueError, match="unterminated row"):
        V.parse_values("(1,2", ["Int64", "Int64"])


def test_deep_composites_gate():
    for t in ("Map(String, Int64)", "Tuple(Int64, String)",
              "Array(Array(Int64))", "Array(Tuple(Int64, String))"):
        with pytest.raises(ValueError, match="binary paths"):
            V._ValuesType(t)


@pytest.fixture(scope="module")
def typed_df(spark):
    from pyspark.sql import functions as F

    return spark.range(500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 != 0,
               F.concat(F.lit("s'\\\n\t"), F.col("id").cast("string"))
               ).alias("s"),
        (F.col("id") * 0.25 - 30).alias("f"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   (F.col("id") % 400).cast("int")).alias("d"),
        F.timestamp_seconds(F.col("id") * 97 + 1).alias("ts"),
        F.array(F.col("id") % 5, F.col("id") % 9).alias("arr"),
    )


_TYPES = ["Int64", "Nullable(String)", "Float64", "Date",
          "DateTime", "Array(Int64)"]


def _key(t):
    return tuple((x is None, str(x)) for x in t)


def test_spark_roundtrip_and_split_parity(spark, typed_df, tmp_path):
    out = str(tmp_path / "vals")
    n_files = V.write_values(typed_df.repartition(4), out, _TYPES)
    assert n_files == 4
    names = typed_df.columns
    back = V.read_values(spark, out, names, _TYPES)
    a = sorted((tuple(r) for r in typed_df.collect()), key=_key)
    b = sorted((tuple(r) for r in back.collect()), key=_key)
    assert a == b
    # split reader ≡ plain reader at an adversarially small chunk size
    split = V.read_values_split(spark, out, names, _TYPES,
                                chunk_bytes=512)
    c = sorted((tuple(r) for r in split.collect()), key=_key)
    assert c == b


def test_write_values_byte_parity_with_scalar_render(spark, tmp_path):
    """The r10 mapInArrow writer produces byte-identical files to the
    scalar render walk — quoting, escapes, NULLs, arrays, float/int
    text lanes."""
    import glob

    from pyspark.sql import functions as F

    from clickhouse_learning_spark.sources import values as VAL

    types = ["Int64", "Float64", "Nullable(String)", "Array(Int64)", "DateTime"]
    df = spark.range(300).select(
        (F.col("id") * 982451653 - 2**62).alias("k"),
        F.when(F.col("id") % 7 == 0, F.lit(float("inf")))
        .otherwise(F.col("id") / 7.0).alias("x"),
        F.when(F.col("id") % 3 == 0, F.concat(
            F.lit("it's a \\ test,\n"), F.col("id").cast("string"))).alias("s"),
        F.array(F.col("id"), F.col("id") * 2).alias("a"),
        F.timestamp_seconds(F.col("id") * 9973).alias("ts"),
    ).coalesce(1)
    out = str(tmp_path / "val_bytes")
    assert VAL.write_values(df, out, types) == 1
    got = open(glob.glob(out + "/part-*.values")[0], encoding="utf-8").read()

    conv = [VAL._ValuesType(t) for t in types]
    lines = [
        "(" + ",".join("NULL" if v is None else c.render(v)
                       for c, v in zip(conv, row)) + ")"
        for row in df.collect()
    ]
    assert got == ",\n".join(lines) + "\n"
