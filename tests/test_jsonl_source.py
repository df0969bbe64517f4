"""JSONL source: schema-pinned reads and corrupt-record quarantine."""

from __future__ import annotations

from pyspark.sql import types as T

from clickhouse_learning_spark.sources.jsonl import (
    read_jsonl,
    read_jsonl_quarantine,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("gender", T.StringType()),
    ]
)


def test_quarantine_splits_bad_lines(spark, tmp_path):
    p = tmp_path / "dim.jsonl"
    p.write_text(
        '{"uid": 1, "gender": "f"}\n'
        "not json at all\n"
        '{"uid": 2, "gender": "m"}\n'
        '{"uid": "also-bad-type"\n'  # truncated object
    )
    good, bad = read_jsonl_quarantine(spark, str(p), SCHEMA)
    assert {(r["uid"], r["gender"]) for r in good.collect()} == {(1, "f"), (2, "m")}
    bad_lines = [r["raw_line"] for r in bad.collect()]
    assert len(bad_lines) == 2
    assert "not json at all" in bad_lines[0] or "not json at all" in bad_lines[1]


def test_quarantine_all_good_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "f"), (2, "m")], SCHEMA)
    out = str(tmp_path / "out")
    write_jsonl(df, out)
    good, bad = read_jsonl_quarantine(spark, out, SCHEMA)
    assert bad.count() == 0
    assert good.count() == 2
    assert read_jsonl(spark, out, SCHEMA).count() == 2
