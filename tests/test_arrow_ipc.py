"""Arrow IPC source/sink laws (sources/arrow_ipc.py — CH FORMAT
Arrow / ArrowStream)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_learning_spark.sources import arrow_ipc as AR


def _mk(spark):
    return spark.range(3000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("x"),
        F.when(F.col("id") % 3 == 0, F.col("id").cast("string"))
        .alias("s"),  # nullable string
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id") % 100).cast("long").alias("n"),  # int+nulls
        F.date_add(F.lit("2024-01-01").cast("date"),
                   (F.col("id") % 400).cast("int")).alias("d"),
        F.array((F.col("id") % 5).cast("int"),
                (F.col("id") % 11).cast("int")).alias("a"),
    )


def _key(t):
    return tuple((x is None, str(x)) for x in t)


@pytest.mark.parametrize("stream", [False, True])
def test_roundtrip_both_framings(spark, tmp_path, stream):
    """write → read identity for both framings; int64-with-nulls must
    come back as longs (the mapInArrow pass-through guarantee — a
    pandas hop would decay them to float64)."""
    df = _mk(spark)
    out = str(tmp_path / ("st" if stream else "fi"))
    n = AR.write_arrow(df.repartition(3), out, stream=stream)
    assert n == 3
    back = AR.read_arrow(spark, out)
    assert back.schema == df.schema
    a = sorted((tuple(r) for r in df.collect()), key=_key)
    b = sorted((tuple(r) for r in back.collect()), key=_key)
    assert a == b


def test_split_parity_and_footer_chunking(spark, tmp_path):
    """read_arrow_split == read_arrow row-for-row with chunks small
    enough to force many chunks per file; stream framing is rejected
    with the actionable pointer."""
    df = _mk(spark)
    out = str(tmp_path / "split")
    # small batches so each file carries MANY record batches
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        AR.write_arrow(df.repartition(2), out)
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    base = sorted((tuple(r) for r in
                   AR.read_arrow(spark, out).collect()), key=_key)
    split = sorted((tuple(r) for r in AR.read_arrow_split(
        spark, out, batches_per_chunk=3).collect()), key=_key)
    assert base == split and len(base) == 3000

    out2 = str(tmp_path / "streamed")
    AR.write_arrow(df.repartition(2), out2, stream=True)
    with pytest.raises(Exception, match="FILE framing|no footer"):
        AR.read_arrow_split(spark, out2).collect()


def test_interop_with_plain_pyarrow(spark, tmp_path):
    """The bytes are the REAL Arrow IPC format: plain pyarrow (the
    reference implementation, no Spark involved) must read the sink's
    files and reproduce the rows — this is the same property that
    makes the files loadable by ClickHouse/DuckDB/pandas."""
    import pyarrow as pa

    df = _mk(spark).filter(F.col("k") < 50)
    out = str(tmp_path / "interop")
    AR.write_arrow(df.coalesce(1), out)
    import glob

    files = glob.glob(out + "/*.arrow")
    assert len(files) == 1
    tbl = pa.ipc.open_file(pa.memory_map(files[0], "r")).read_all()
    assert tbl.num_rows == 50
    got = sorted(tbl.to_pylist(), key=lambda r: r["k"])
    want = sorted((r.asDict() for r in df.collect()),
                  key=lambda r: r["k"])
    assert [r["k"] for r in got] == [r["k"] for r in want]
    assert [r["n"] for r in got] == [r["n"] for r in want]
    assert [str(r["d"]) for r in got] == [str(r["d"]) for r in want]
    # (DuckDB's IPC reader lives in its non-bundled `arrow`/nanoarrow
    # extension, so the cross-engine load is exercised via pyarrow —
    # the reference implementation — above.)
