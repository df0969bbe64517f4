"""JSON-lines dimension source (SURVEY S3).

The reference loads dimensions from JSON-lines files (one object per
line, /root/reference/files/user_dim.txt, read at
make_user_action_001.py:14-19). Spark-native form: ``spark.read.json``
with an explicit schema (never inference in production — one malformed
line would silently widen types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Land a dimension as JSON-lines (the reference's files/ format)."""
    df.write.mode("overwrite").json(path)
