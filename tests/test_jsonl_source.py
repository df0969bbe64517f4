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


def test_binary_file_media_source(spark, tmp_path):
    """binaryFile → MEDIA_SCHEMA: real PPM/WAV files on disk ingest
    into the exact shape the multimodal operators consume, and the
    decode pipeline runs unchanged on them."""
    from clickhouse_learning_spark.operators import multimodal as M
    from clickhouse_learning_spark.sources.binary import (
        read_media_dir,
        read_text_lines,
    )

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.ppm").write_bytes(M.ppm_image(1, 4, 3))
    (d / "b.wav").write_bytes(M.wav_audio(2))
    (d / "c.bin").write_bytes(b"\x00\x01")

    media = read_media_dir(spark, str(d))
    rows = {r.meta.source.split("/")[-1]: r for r in media.collect()}
    assert rows["a.ppm"].kind == "image" and rows["b.wav"].kind == "audio"
    assert rows["c.bin"].kind == "unknown"
    assert rows["a.ppm"].meta.bytes == len(M.ppm_image(1, 4, 3))
    assert len({r.media_id for r in rows.values()}) == 3  # stable ids

    decoded = M.decode_image_meta(media.filter("kind = 'image'"))
    r = decoded.collect()[0]
    assert (r.width, r.height) == (4, 3)

    # text lines: per-file order preserved
    t = tmp_path / "texts"
    t.mkdir()
    (t / "x.txt").write_text("alpha\nbeta\ngamma\n")
    lines = read_text_lines(spark, str(t)).collect()
    by_no = {r.line_no: r.text for r in lines}
    assert by_no == {1: "alpha", 2: "beta", 3: "gamma"}
