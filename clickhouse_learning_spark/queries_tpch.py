"""Multi-join analytics queries (TPC-H Q3/Q5/Q10/Q14 shapes).

The reference's join surface stops at two-table equi joins
(SURVEY §2.3, J1-J6); these queries extend the engine to the 3-6-table
star/snowflake joins a warehouse user actually runs, and exercise the
scale machinery the two-table queries can't: Catalyst join reordering,
broadcast of the dimension chain (region/nation/supplier/customer), and
partial aggregation above a multi-join.

Scale notes (100 TB):
- region/nation/part are tiny → explicit F.broadcast; customer/supplier
  are per-key dimensions that AQE will broadcast at small SF and
  shuffle-join at large SF — we leave them unhinted on purpose.
- Every aggregate is keyed (no global sort-limit over a float column:
  an engine-dependent last-bit difference in an unrounded double sum
  could flip a LIMIT boundary; HAVING on exactly-representable sums is
  deterministic on both engines).
- Revenue doubles are round(x, 2) on BOTH sides (queries.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_learning_spark.queries import query
from clickhouse_learning_spark.schemas import load_table

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "shipping_priority",
    """
    SELECT l_orderkey,
           CAST(((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(100 - l_discount * 100) AS BIGINT)) + 50)
                 // 100) AS BIGINT) / 100.0 AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate  > TIMESTAMP '1997-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-table join, selective filters on all three
    inputs (each pushed to its scan), keyed revenue rollup.

    Per-order groups are tiny (~4 lineitems), so a double revenue sum
    lands on .005 round boundaries often enough to flap between
    engines; revenue is therefore summed as exact integer
    cents × discount-basis-points, half-up-rounded to cents in integer
    space, and divided by 100.0 once at the end (same integer in, same
    IEEE double out on both engines)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp_ntz")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.floor(
                    (
                        F.sum(
                            F.round(F.col("l_extendedprice") * 100).cast("long")
                            * F.round(100 - F.col("l_discount") * 100).cast("long")
                        )
                        + 50
                    )
                    / 100
                ).cast("long")
                / 100.0
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


@query(
    "regional_supplier_volume",
    """
    SELECT n_name,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table snowflake join where the local-supplier
    condition (c_nationkey = s_nationkey) rides on the supplier join.
    region/nation broadcast explicitly; the fact chain is left to
    Catalyst/AQE to reorder."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@query(
    "returned_item_report",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
           CAST(round(max(c_acctbal), 2) AS DOUBLE) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    HAVING sum(l_quantity) > 150
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue. The HAVING gate
    is a sum of small integral doubles (exact in FP on both engines) so
    the row set is deterministic — a float-sort LIMIT would not be."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
            F.sum("l_quantity").alias("_qty"),
        )
        .filter(F.col("_qty") > 150)
        .drop("_qty")
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
    )


@query(
    "range_join_campaigns",
    """
    WITH c AS (
      SELECT o_orderkey AS campaign_id,
             date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS start_day,
             date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) + 10 AS end_day
      FROM orders WHERE o_orderkey % 997 = 0),
    p AS (
      SELECT date_diff('day', TIMESTAMP '1970-01-01', l_shipdate) AS ship_day,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem)
    SELECT campaign_id,
           CAST(count(*) AS BIGINT) AS n_shipments,
           CAST(sum(qty) AS BIGINT) AS qty_sum
    FROM p JOIN c ON p.ship_day BETWEEN c.start_day AND c.end_day
    GROUP BY campaign_id
    """,
)
def range_join_campaigns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join: shipments landing inside each
    10-day campaign window. The oracle states the naive inequality join;
    the engine runs operators/rangejoin.point_in_interval_join — a
    bucketized equi-join (each point meets each window exactly once, the
    BETWEEN survives only as a hash-join residual filter), because Spark
    compiles the naive form to a nested-loop O(points × intervals) plan."""
    from clickhouse_learning_spark.operators.rangejoin import point_in_interval_join

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    epoch = F.lit("1970-01-01").cast("timestamp_ntz")
    campaigns = orders.filter(F.col("o_orderkey") % 997 == 0).select(
        F.col("o_orderkey").alias("campaign_id"),
        F.datediff("o_orderdate", epoch).cast("long").alias("start_day"),
        (F.datediff("o_orderdate", epoch) + 10).cast("long").alias("end_day"),
    )
    points = li.select(
        F.datediff("l_shipdate", epoch).cast("long").alias("ship_day"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    j = point_in_interval_join(
        points, campaigns, "ship_day", "start_day", "end_day", bucket_width=10
    )
    return j.groupBy("campaign_id").agg(
        F.count(F.lit(1)).alias("n_shipments"), F.sum("qty").alias("qty_sum")
    )


@query(
    "promo_revenue_share",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           CAST(round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END)
                      / sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)
               AS promo_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ship_month
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a fact ⋈ dim
    join (part broadcasts — it is a bounded catalog even at 100 TB of
    lineitem)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = _rev()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.to_date(F.date_trunc("month", "l_shipdate")).alias("ship_month"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 2).alias("promo_pct")
        )
    )
