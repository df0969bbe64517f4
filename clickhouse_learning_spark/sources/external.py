"""External streaming/batch connectors, gated for this container.

The production ingest path for the reference's event stream is a Kafka
topic (the generator's ~2000-row/5-10 s batches,
make_user_action_001.py:50-62, map 1:1 onto Kafka micro-batches); dims
often live in an RDBMS (JDBC). Neither the Kafka connector jar nor any
JDBC driver ships in this container, so these helpers:

- build the correct reader configuration (the part that carries design
  weight: schema-on-read via from_json, starting offsets, fan-out);
- fail with an actionable error naming the missing artifact instead of
  a raw ClassNotFoundException;
- are interchangeable with sources/ingest.parquet_stream downstream —
  every StreamingMV consumer takes any streaming DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConnectorUnavailable(RuntimeError):
    pass


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka micro-batch source → parsed value columns.

    Requires the spark-sql-kafka connector jar on the classpath
    (org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # noqa: BLE001 - surfacing a clearer error
        raise ConnectorUnavailable(
            "Kafka connector not on the classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 via spark.jars.packages"
        ) from e
    return raw.select(
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
    ).select("kafka_ts", "v.*")


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options,
) -> DataFrame:
    """JDBC dimension/table read with parallel partitioned scans (the
    right shape for a big dim: numPartitions range-splits on a numeric
    key so the read isn't a single-connection bottleneck)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound or 0)
            .option("upperBound", upper_bound or 1 << 31)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # noqa: BLE001
        raise ConnectorUnavailable(
            f"JDBC read failed for {url!r} — is the driver jar on the classpath "
            "(spark.jars) and the database reachable?"
        ) from e
