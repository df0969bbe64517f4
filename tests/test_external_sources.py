"""Gated external connectors: helpful errors when artifacts are absent
(this container has no Kafka jar / JDBC drivers / brokers)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from clickhouse_learning_spark.sources.external import (
    ConnectorUnavailable,
    jdbc_table,
    kafka_stream,
)


def test_kafka_unavailable_raises_actionable_error(spark):
    schema = T.StructType([T.StructField("x", T.LongType())])
    with pytest.raises(ConnectorUnavailable, match="spark-sql-kafka"):
        kafka_stream(spark, "localhost:9092", "events", schema)


def test_jdbc_unavailable_raises_actionable_error(spark):
    with pytest.raises(ConnectorUnavailable, match="driver jar"):
        jdbc_table(
            spark,
            "jdbc:postgresql://localhost:5432/nope",
            "dim",
            partition_column="id",
        )
