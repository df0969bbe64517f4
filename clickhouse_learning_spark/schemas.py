"""Fixed, explicitly-declared schemas (the reference's MergeTree DDLs).

Type mapping per SURVEY.md §1.2: ClickHouse unsigned ints → LongType
(Spark has no unsigned; the reference never exceeds ~2×10⁸ so LongType
is lossless — uids at /root/reference/scripts/python/make_test_data/
models.py:105,116), Date → DateType, DateTime → TimestampType.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference star schema (scripts/sql/*.sql in the reference)
# ---------------------------------------------------------------------------

# ods.action_001 — exposure/click event log
# (/root/reference/scripts/sql/ods.action_001_dis.sql:2-23)
ACTION_001 = T.StructType(
    [
        T.StructField("day", T.DateType(), False),            # default toDate(second)
        T.StructField("hour", T.TimestampType(), False),      # default toStartOfHour(second)
        T.StructField("second", T.TimestampType(), False),
        T.StructField("insert_second", T.TimestampType(), False),  # default now()
        T.StructField("platform", T.StringType(), True),
        T.StructField("ip", T.StringType(), True),
        T.StructField("isp", T.StringType(), True),
        T.StructField("uid", T.LongType(), True),
        T.StructField("ver", T.StringType(), True),
        T.StructField("item_id", T.LongType(), True),
        T.StructField("show_cnt", T.LongType(), True),
        T.StructField("click_cnt", T.LongType(), True),
        T.StructField("show_time", T.LongType(), True),       # milliseconds
    ]
)

# ods.action_002 — post-click funnel log
# (/root/reference/scripts/sql/ods.action_002_dis.sql:2-22)
ACTION_002 = T.StructType(
    [f for f in ACTION_001.fields if f.name not in ("show_cnt", "click_cnt", "show_time")]
    + [
        T.StructField("action_a_cnt", T.LongType(), True),
        T.StructField("action_b_cnt", T.LongType(), True),
        T.StructField("action_c_cnt", T.LongType(), True),
        T.StructField("action_a_time", T.LongType(), True),
        T.StructField("action_b_time", T.LongType(), True),
        T.StructField("action_c_time", T.LongType(), True),
        T.StructField("action_d_sum", T.LongType(), True),
        T.StructField("action_e_sum", T.LongType(), True),
        T.StructField("action_f_sum", T.LongType(), True),
    ]
)

# dim.user_dim — user dimension (/root/reference/scripts/sql/dim.user_dim_dis.sql:1-21)
USER_DIM = T.StructType(
    [
        T.StructField("day", T.DateType(), False),
        T.StructField("uid", T.LongType(), False),
        T.StructField("platform", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("province", T.StringType(), True),
        T.StructField("isp", T.StringType(), True),
        T.StructField("app_version", T.StringType(), True),
        T.StructField("os_version", T.StringType(), True),
        T.StructField("mac", T.StringType(), True),
        T.StructField("ip", T.StringType(), True),
        T.StructField("gender", T.StringType(), True),
        T.StructField("age", T.ShortType(), True),             # default -1
    ]
)

# dim.item_dim — item dimension (/root/reference/scripts/sql/dim.item_dim_dis.sql:1-13)
ITEM_DIM = T.StructType(
    [
        T.StructField("day", T.DateType(), False),
        T.StructField("item_id", T.LongType(), False),
        T.StructField("type_id", T.LongType(), True),
        T.StructField("price", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata (/root/testdata/sf*/, see TESTDATA.md) — explicit schemas so
# reads never depend on inference.
# ---------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark, sf_dir: str, name: str):
    """Read one driver parquet table (vectorized columnar scan, SURVEY S1/S2).

    ``events.ts`` is stored as TIMESTAMP(NANOS), which Spark reads as a
    nanosecond LongType under ``spark.sql.legacy.parquet.nanosAsLong``;
    convert to a microsecond TimestampType here (sub-µs precision is
    dropped — Spark's native resolution).
    """
    if name == "events":
        # runtime SQL conf — set defensively in case the caller's session
        # (e.g. the driver's) was not built by session.get_spark
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def register_testdata_views(spark, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql queries."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
