"""JSON-lines dimension source (SURVEY S3).

The reference loads dimensions from JSON-lines files (one object per
line, /root/reference/files/user_dim.txt, read at
make_user_action_001.py:14-19). Spark-native form: ``spark.read.json``
with an explicit schema (never inference in production — one malformed
line would silently widen types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): parse with the declared schema in PERMISSIVE mode,
    splitting rows whose line failed to parse into a quarantine frame
    carrying the raw line — the production load shape (ClickHouse's
    ``input_format_allow_errors_num`` analog, but the rejects are kept,
    not dropped). One scan feeds both frames; at scale write the bad
    side to a quarantine table and alert on its count."""
    corrupt = "_corrupt_record"
    full = T.StructType(
        [*schema.fields, T.StructField(corrupt, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(path)
    )
    # Spark requires caching/materializing before filtering on the
    # corrupt column (the parser would otherwise prune it away)
    raw = raw.cache()
    good = raw.filter(F.col(corrupt).isNull()).drop(corrupt)
    bad = raw.filter(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw_line")
    )
    return good, bad


def write_jsonl(df: DataFrame, path: str) -> None:
    """Land a dimension as JSON-lines (the reference's files/ format)."""
    df.write.mode("overwrite").json(path)
