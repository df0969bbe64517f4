"""Apache Arrow IPC source + sink (ClickHouse ``FORMAT Arrow`` /
``FORMAT ArrowStream``).

ClickHouse speaks Arrow natively on both directions (`SELECT … INTO
OUTFILE '…' FORMAT Arrow`, `INSERT … FORMAT ArrowStream`) — with
RowBinary (binary rows), Native (CH's own columnar blocks) and
TabSeparated (text rows) this completes the CH offboarding quartet
with the INTEROP columnar container: the same bytes load into CH,
DuckDB, pandas, polars and Spark without a row pivot.

Framing per the Arrow spec (both emitted by pyarrow, which IS the
reference implementation — no hand codec needed or wanted here):

- FILE format (``FORMAT Arrow``): magic ``ARROW1``, record batches,
  a FOOTER indexing every batch — random access per batch, which is
  what makes the split reader below possible;
- STREAM format (``FORMAT ArrowStream``): schema message + batches,
  no footer — forward-only, the socket/pipe framing.

Scale shape: the sink writes one file per partition STRAIGHT from
Spark's internal Arrow batches (``mapInArrow`` — no pandas
materialization, no dtype drift: int64-with-nulls stays int64,
never decays to float64). The plain reader is one file per task;
:func:`read_arrow_split` re-chunks FILE-format exports on record-batch
boundaries using the footer index, so parallelism is
total-batches / batches_per_chunk instead of file count — the
``read_warc_split`` / ``read_native_split`` pattern on the format's
own random-access index.
"""

from __future__ import annotations

import os
import re
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FILE_MAGIC = b"ARROW1"


def _spark_schema_from_arrow(arrow_schema):
    """Spark schema for an Arrow schema via pyspark's own converter
    (the same mapping mapInArrow enforces)."""
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(arrow_schema)


def write_arrow(
    df: DataFrame,
    out_dir: str,
    *,
    stream: bool = False,
) -> int:
    """Write each partition as one ``part-*.arrow`` (FILE format,
    CH ``FORMAT Arrow``) or ``part-*.arrows`` (STREAM format,
    ``FORMAT ArrowStream``). Batches pass through from Spark's
    internal Arrow representation — zero per-value Python. Returns the
    number of files written (empty partitions write nothing)."""
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    ext = "arrows" if stream else "arrow"
    use_stream = stream

    def write_part(batches):
        writer = None
        fname = os.path.join(out_dir, f"part-{_uuid.uuid4().hex}.{ext}")
        sink = None
        for b in batches:
            if writer is None:
                sink = pa.OSFile(fname, "wb")
                writer = (
                    pa.ipc.new_stream(sink, b.schema)
                    if use_stream else pa.ipc.new_file(sink, b.schema)
                )
            writer.write_batch(b)
        if writer is None:
            return iter(())
        writer.close()
        sink.close()
        out_schema = pa.schema([pa.field("file", pa.string())])
        yield pa.RecordBatch.from_pylist([{"file": fname}],
                                         schema=out_schema)

    files = df.mapInArrow(write_part, "file string").collect()
    return len(files)


def _open_ipc(data: bytes):
    """Reader for either framing (FILE detected by magic)."""
    import pyarrow as pa

    buf = pa.BufferReader(data)
    if data[:6] == _FILE_MAGIC:
        return pa.ipc.open_file(buf)
    return pa.ipc.open_stream(buf)


def read_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory/glob of Arrow IPC files (either framing, may
    be mixed): schema from the first file on the driver, then one file
    per task — batches enter Spark THROUGH Arrow (mapInArrow), no
    pandas hop."""
    binf = spark.read.format("binaryFile").load(path)
    head = binf.select("content").head()
    if head is None:
        raise ValueError(f"no Arrow files under {path}")
    arrow_schema = _open_ipc(bytes(head["content"])).schema
    schema = _spark_schema_from_arrow(arrow_schema)

    def gen(batches):
        for b in batches:
            for blob in b.column(0).to_pylist():
                rd = _open_ipc(bytes(blob))
                if rd.schema != arrow_schema:
                    raise ValueError(
                        f"file schema {rd.schema} != expected "
                        f"{arrow_schema}"
                    )
                if hasattr(rd, "num_record_batches"):  # file format
                    for i in range(rd.num_record_batches):
                        yield rd.get_batch(i)
                else:
                    yield from rd

    return binf.select("content").mapInArrow(gen, schema)


def read_arrow_split(
    spark: SparkSession,
    path: str,
    batches_per_chunk: int = 16,
) -> DataFrame:
    """Straggler-resistant :func:`read_arrow` for FILE-format exports:
    phase 1 reads each file's FOOTER (batch count only — the format's
    built-in index; no data bytes touched) and fans out
    (path, first_batch, last_batch) chunk rows; phase 2 memory-maps
    the file and reads ONLY its chunk's record batches via the
    footer's random access. Stream-format files have no footer and
    raise — re-export as FILE format or use read_arrow."""
    import pyarrow as pa

    binf = spark.read.format("binaryFile").load(path)
    head = binf.select("content").head()
    if head is None:
        raise ValueError(f"no Arrow files under {path}")
    if bytes(head["content"])[:6] != _FILE_MAGIC:
        raise ValueError(
            "read_arrow_split needs the FILE framing (FORMAT Arrow) — "
            "stream exports have no footer index; use read_arrow"
        )
    arrow_schema = _open_ipc(bytes(head["content"])).schema
    schema = _spark_schema_from_arrow(arrow_schema)

    idx_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("first", T.LongType()),
        T.StructField("last", T.LongType()),
    ])

    def index(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                rd = _open_ipc(bytes(blob))
                if not hasattr(rd, "num_record_batches"):
                    raise ValueError(f"{p}: stream framing, no footer")
                n = rd.num_record_batches
                for lo in range(0, n, batches_per_chunk):
                    rows.append(
                        (p, lo, min(lo + batches_per_chunk, n) - 1))
            yield pd.DataFrame(
                rows, columns=[f.name for f in idx_schema.fields])

    chunks = binf.select("path", "content").mapInPandas(index, idx_schema)
    # explicit COUNT (same as the warc/native/tsv splits): chunk rows
    # are bytes-sized and AQE would coalesce them to one partition
    chunks = chunks.repartition(
        spark.sparkContext.defaultParallelism, "path", "first"
    )

    def extract(arrow_batches):
        for b in arrow_batches:
            for p, lo, hi in zip(
                b.column(0).to_pylist(),
                b.column(1).to_pylist(),
                b.column(2).to_pylist(),
            ):
                local = re.sub(r"^file:/*", "/", str(p))
                with pa.memory_map(local, "r") as mm:
                    rd = pa.ipc.open_file(mm)
                    for i in range(int(lo), int(hi) + 1):
                        yield rd.get_batch(i)

    return chunks.mapInArrow(extract, schema)
