"""Streaming offboarding: per-micro-batch Arrow IPC / Avro OCF export.

The ``stream_warc_pipeline`` pattern in REVERSE (VERDICT r7 item 6):
instead of WARC waves streaming IN, result rows stream OUT — each
micro-batch lands as one set of format-native files, the way a
ClickHouse pipeline tails a table into ``INSERT … FORMAT Arrow`` /
``FORMAT Avro`` consumers (reference deploy scripts move data between
engines with exactly these formats).

Exactly-once: each epoch writes into its OWN ``epoch=<N>``
subdirectory, which is cleared first — a retried ``foreachBatch``
epoch therefore REPLACES the files of the failed attempt instead of
duplicating rows (the sink files carry uuid part names, so plain
re-append would double-count; this is the same epoch-keyed idempotence
the WARC ingest corpus sink uses, per ADVICE r7).

Scale shape: the export work is map-only per micro-batch — one
format-native file per partition straight from the batch's own
partitions (``mapInArrow`` for Arrow: zero per-value Python;
``mapPartitions`` encode for Avro), no extra shuffle, no driver
staging of rows. Readback parallelism comes from the formats' own
split readers (footer index / block headers).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("arrow", "avro")


def stream_export(
    spark: SparkSession,
    landing_dir: str,
    schema,
    out_dir: str,
    *,
    fmt: str = "arrow",
    checkpoint: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream ``landing_dir`` parquet → one Arrow-IPC / Avro-OCF
    file set per micro-batch under ``out_dir/epoch=<N>`` → drain →
    read the whole export back with the format's own reader.

    Returns the read-back DataFrame (schema = the streamed schema as
    the format carries it). Stream ≡ batch parity is law-tested in
    tests/test_streaming_export.py for both formats."""
    from clickhouse_learning_spark.sources import arrow_ipc as AR
    from clickhouse_learning_spark.sources import avro as AV
    from clickhouse_learning_spark.streaming.ingest import (
        drain,
        parquet_stream,
    )

    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}")

    def _batch(batch: DataFrame, epoch: int) -> None:
        # no isEmpty() pre-check: it cost one extra Spark job per epoch
        # (VERDICT r9 micro #3) while both writers already skip empty
        # partitions, so an empty epoch writes an empty dir with no
        # part files — invisible to the binaryFile read-back glob
        edir = os.path.join(out_dir, f"epoch={epoch}")
        # retried epoch replaces its own files — exactly-once
        if os.path.exists(edir):
            shutil.rmtree(edir)
        if fmt == "arrow":
            AR.write_arrow(batch, edir)
        else:
            AV.write_avro(batch, edir)

    q = (
        parquet_stream(spark, landing_dir, schema, max_files_per_trigger)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    glob = os.path.join(out_dir, "epoch=*")
    if fmt == "arrow":
        return AR.read_arrow(spark, glob)
    return AV.read_avro(spark, glob)
