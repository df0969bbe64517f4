"""Binary-file and raw-text sources for multimodal / document ingest.

At 100 TB the media corpus arrives as files in object storage, not
rows: Spark's built-in ``binaryFile`` format reads each file as one
row (path, modificationTime, length, content) with the usual
glob/partition machinery, and ``maxPartitionBytes`` controls how many
files land per task. :func:`read_media_dir` maps that shape onto the
engine's MEDIA_SCHEMA (operators/multimodal.py) so the decode /
feature / resize operators run unchanged on directly-ingested files.

``read_text_lines`` is the document analog: one row per line with the
source file attached — the shape the text-quality and dedup operators
expect after a ``doc_id`` is assigned.

Scale note: ``binaryFile`` materializes each file's full content in a
single row, so cap individual file size (spark.sql.sources default
caps at ~2 GB per row); shard giant archives upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KIND_BY_EXT = {
    "ppm": ("image", "image/x-portable-pixmap"),
    "png": ("image", "image/png"),
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "gif": ("image", "image/gif"),
    "wav": ("audio", "audio/wav"),
    "flac": ("audio", "audio/flac"),
    "rvid": ("video", "video/x-raw"),
    "mp4": ("video", "video/mp4"),
}


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw ``binaryFile`` read: (path, modificationTime, length, content)."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """A media directory as the engine's MEDIA_SCHEMA shape.

    ``media_id`` is the xxhash64 of the file path — stable across
    re-reads and cluster layouts (NOT monotonically_increasing_id,
    which renumbers on every repartition); ``kind``/``mime`` derive
    from the extension, with unknown extensions kept as kind
    'unknown' so a downstream filter can quarantine them explicitly.
    """
    raw = read_binary_files(spark, path, glob)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind_expr = F.lit("unknown")
    mime_expr = F.lit(None).cast("string")
    for e, (kind, mime) in _KIND_BY_EXT.items():
        kind_expr = F.when(ext == e, kind).otherwise(kind_expr)
        mime_expr = F.when(ext == e, mime).otherwise(mime_expr)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        kind_expr.alias("kind"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("path").alias("source"),
            mime_expr.alias("mime"),
            F.col("length").alias("bytes"),
        ).alias("meta"),
    )


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per line with its source file: (source, line_no, text).
    line_no is per-file, assigned from the file-local block order via a
    window per source file — deterministic because each file is read in
    order within its partition(s)."""
    from pyspark.sql.window import Window

    lines = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("source"),
            F.col("value").alias("text"),
        )
        # monotonically_increasing_id is stable *within one read plan*:
        # ordering by it inside each file reproduces the file's line
        # order (rows of one file stay in its split's partition order)
        .withColumn("_ord", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("source").orderBy("_ord")
    return lines.select(
        "source", F.row_number().over(w).alias("line_no"), "text"
    )
