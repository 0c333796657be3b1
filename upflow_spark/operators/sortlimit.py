"""§2-F sort / limit / top-k operators (SURVEY.md).

Scale note: every key here compiles to TakeOrderedAndProject (per-partition
top-k heaps + driver merge of k×partitions rows) — NOT a global sort. A full
orderBy of 100 TB is a range-partitioned shuffle; bounded-k queries must never
pay that, and these plans don't (verified via explain in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "sort_multikey",
    oracle="""
SELECT o_orderkey, o_orderpriority, floor((o_totalprice) * 10000 + 0.5) / 10000 AS o_totalprice
FROM orders
ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + limit (fuses to TakeOrderedAndProject); deterministic
    via the unique o_orderkey tiebreak."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderpriority", r4("o_totalprice").alias("o_totalprice"))
        .orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@query(
    "sort_nulls_ordering",
    oracle="""
SELECT c_custkey, last_order,
       row_number() OVER (ORDER BY last_order DESC NULLS LAST, c_custkey ASC) AS rn
FROM (
  SELECT c.c_custkey, max(o.o_orderdate) AS last_order
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
ORDER BY rn
LIMIT 50
""",
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESC NULLS LAST ordering made observable via row_number; customers
    who never ordered (null last_order) sink to the bottom.

    Scale: TakeOrderedAndProject does the distributed work (global top-50
    via per-partition top-50 merge); the row_number window then ranks the
    LIMIT 50 result — 50 rows, never the customers-sized relation (the r9
    no-unpartitioned-window audit; the prior shape windowed all customers).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    agg = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.max("o_orderdate").alias("last_order"))
    )
    from pyspark.sql import Window

    order = [F.col("last_order").desc_nulls_last(), F.col("c_custkey").asc()]
    top = agg.orderBy(*order).limit(50)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rn", F.row_number().over(w).cast("long"))
        .orderBy("rn")
        .select("c_custkey", "last_order", "rn")
    )


@query(
    "limit_offset",
    oracle="""
SELECT o_orderkey, floor((o_totalprice) * 10000 + 0.5) / 10000 AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20 OFFSET 20
""",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic page 2 of 20 (OFFSET … LIMIT, Spark 3.4+ offset())."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", r4("o_totalprice").alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(20)
        .limit(20)
    )


@query(
    "topk_two_level",
    oracle="""
SELECT l_partkey,
       floor((sum(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000
         AS revenue
FROM lineitem
GROUP BY l_partkey
ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_partkey ASC
LIMIT 20
""",
)
def topk_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 parts by revenue via TWO-LEVEL top-k: per-bucket
    ranked pruning (32 hash buckets, each keeps its local top 20) feeds a
    tiny 640-row global TakeOrdered. Identical result to the direct
    orderBy+limit — that IS the point: global top-k ⊆ ∪ bucket top-ks, so
    at 100 TB the final single-reducer step sees buckets×k candidate rows
    instead of every group, while the oracle proves the pruning lost
    nothing.
    """
    li = load(spark, sf_dir, "lineitem")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = li.groupBy("l_partkey").agg(rev.alias("rev_raw"))
    bucket = F.pmod(F.hash("l_partkey"), F.lit(32))
    w = Window.partitionBy(bucket).orderBy(
        F.col("rev_raw").desc(), F.col("l_partkey").asc()
    )
    pruned = agg.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 20)
    return (
        pruned.orderBy(F.col("rev_raw").desc(), F.col("l_partkey").asc())
        .limit(20)
        .select("l_partkey", r4(F.col("rev_raw")).alias("revenue"))
    )
