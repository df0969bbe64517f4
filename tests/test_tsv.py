"""ClickHouse TabSeparated source/sink (sources/tsv.py): the CH escape
set (never-quoted values), \\N NULLs, two-row headers, float
shortest-roundtrip, DateTime64 fractional digits, composite-type gates,
and the Spark roundtrip."""

from __future__ import annotations

import datetime as dt

import pytest

from clickhouse_learning_spark.sources import tsv as TSV


def test_escape_set_roundtrip():
    nasty = "a\tb\nc\\d'e\rf\bg\fh\0i"
    esc = TSV.escape_value(nasty)
    assert "\t" not in esc and "\n" not in esc and "\0" not in esc
    [val] = TSV._split_row(esc)
    assert val == nasty


def test_null_vs_literal_backslash_n():
    # a field that is exactly \N is NULL; \N as an escape elsewhere is
    # the literal 'N'
    assert TSV._split_row("\\N") == [None]
    assert TSV._split_row("a\t\\N\tb") == ["a", None, "b"]
    assert TSV._split_row("x\\Ny") == ["xNy"]
    assert TSV._split_row("") == [""]


def test_header_and_values():
    text = (
        "k\tname\tts\n"
        "Int64\tNullable(String)\tDateTime64(3)\n"
        "1\thi\\tthere\t2024-01-02 03:04:05.250\n"
        "-7\t\\N\t1969-12-31 23:59:59.500\n"
    )
    names, types, rows = TSV.parse_tsv(text)
    assert names == ["k", "name", "ts"]
    assert rows[0] == (1, "hi\tthere",
                       dt.datetime(2024, 1, 2, 3, 4, 5, 250000))
    assert rows[1] == (-7, None,
                       dt.datetime(1969, 12, 31, 23, 59, 59, 500000))


def test_float_shortest_roundtrip():
    c = TSV._TsvType("Float64")
    for v in (0.1, -2.5e-10, 1e300, 123456.789):
        assert c.parse(c.render(v)) == v


def test_datetime64_scale_digits():
    c3 = TSV._TsvType("DateTime64(3)")
    v = dt.datetime(2024, 1, 1, 0, 0, 0, 123456)
    assert c3.render(v).endswith(".123")
    c0 = TSV._TsvType("DateTime")
    assert c0.render(v) == "2024-01-01 00:00:00"
    # scale > 6: CH prints exactly `scale` digits; Spark timestamps
    # stop at microseconds, so digits 7-9 are zero-padded (ADVICE r6)
    c9 = TSV._TsvType("DateTime64(9)")
    assert c9.render(v).endswith(".123456000")
    assert c9.parse(c9.render(v)) == v


def test_composite_gate():
    with pytest.raises(ValueError, match="binary paths"):
        TSV._TsvType("Array(Int64)")
    with pytest.raises(ValueError, match="binary paths"):
        TSV._TsvType("Map(String, Int64)")


def test_field_count_mismatch():
    with pytest.raises(ValueError, match="fields"):
        TSV.parse_tsv("1\t2\n", ["Int64"])


def test_spark_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(500).select(
        F.col("id").alias("k"),
        (F.col("id") / 7.0).alias("x"),
        F.when(F.col("id") % 3 == 0, F.concat(
            F.lit("v\t"), F.col("id").cast("string"), F.lit("\nz")
        )).alias("s"),
        F.timestamp_seconds(F.col("id") * 97).alias("ts"),
    )
    out = str(tmp_path / "tsv_rt")
    n = TSV.write_tsv(df.repartition(3), out,
                      ["Int64", "Float64", "Nullable(String)", "DateTime"])
    assert n == 3
    back = TSV.read_tsv(spark, out)
    key = lambda t: (t[0],)  # noqa: E731
    a = sorted((tuple(r) for r in df.collect()), key=key)
    b = sorted((tuple(r) for r in back.collect()), key=key)
    assert a == b


def test_read_tsv_split_parity(spark, tmp_path):
    """read_tsv_split == read_tsv row-for-row with tiny chunk_bytes
    (many chunks per file); newline snapping must never split a row or
    a multibyte codepoint, and the two header rows belong to no
    chunk."""
    from pyspark.sql import functions as F

    df = spark.range(2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.concat(F.lit("héllo\tß\n"),
                            F.col("id").cast("string"))).alias("s"),
        (F.col("id") % 9).cast("double").alias("x"),
    )
    out = str(tmp_path / "tsv_split")
    TSV.write_tsv(df.repartition(2), out,
                  ["Int64", "Nullable(String)", "Float64"])

    def key(t):
        return tuple((x is None, str(x)) for x in t)

    base = sorted((tuple(r) for r in
                   TSV.read_tsv(spark, out).collect()), key=key)
    split_df = TSV.read_tsv_split(spark, out, chunk_bytes=1024)
    split = sorted((tuple(r) for r in split_df.collect()), key=key)
    assert base == split
    assert len(base) == 2000
    # headerless files through the headerless split form
    out2 = str(tmp_path / "tsv_split_nh")
    TSV.write_tsv(df.repartition(2), out2,
                  ["Int64", "Nullable(String)", "Float64"],
                  with_header=False)
    split2 = sorted(
        (tuple(r) for r in TSV.read_tsv_split(
            spark, out2, chunk_bytes=1024,
            ch_types=["Int64", "Nullable(String)", "Float64"],
            names=["k", "s", "x"]).collect()),
        key=key,
    )
    assert split2 == base


def test_arrow_int_cast_lane_matches_scalar_render():
    """The r10 vectorized writer's Int lane (pyarrow cast int64→string)
    must be byte-identical to str(int(v)) across random values and the
    int64 boundaries."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    rng = np.random.default_rng(20261)
    i = rng.integers(-(2**63), 2**63 - 1, size=50_000, dtype=np.int64)
    i[:2] = [-(2**63), 2**63 - 1]
    got = pc.cast(pa.array(i), pa.string()).to_pylist()
    assert got == [str(int(x)) for x in i.tolist()]


def test_write_tsv_byte_parity_with_scalar_render(spark, tmp_path):
    """The mapInArrow writer produces byte-identical files to the
    scalar render walk (guide §4.3 change must not move a single
    byte): one partition → one file, compared against a reference
    rendering of the collected rows."""
    import glob

    from pyspark.sql import functions as F

    types = ["Int64", "Float64", "Nullable(String)", "DateTime", "Date"]
    df = spark.range(300).select(
        (F.col("id") * 982451653 - 2**62).alias("k"),
        F.when(F.col("id") % 7 == 0, F.lit(float("nan")))
        .when(F.col("id") % 7 == 1, F.col("id") / 3.0)
        .otherwise(F.col("id") * 1e13 + 0.5).alias("x"),
        F.when(F.col("id") % 3 == 0, F.concat(
            F.lit("a\tb\\c\n'"), F.col("id").cast("string"))).alias("s"),
        F.timestamp_seconds(F.col("id") * 9973).alias("ts"),
        F.date_add(F.lit("2020-01-01"), F.col("id").cast("int")).alias("d"),
    ).coalesce(1)
    out = str(tmp_path / "tsv_bytes")
    assert TSV.write_tsv(df, out, types) == 1
    got = open(glob.glob(out + "/part-*.tsv")[0], encoding="utf-8").read()

    convs = [TSV._TsvType(t) for t in types]
    names = df.columns
    header = ("\t".join(TSV.escape_value(n) for n in names) + "\n"
              + "\t".join(TSV.escape_value(t) for t in types) + "\n")
    body = "".join(
        "\t".join("\\N" if v is None else c.render(v)
                  for c, v in zip(convs, row)) + "\n"
        for row in df.collect()
    )
    assert got == header + body
