"""Hand-written vanilla-PySpark twins of the four BASELINE.md headline
queries, as (spark, sf_dir) -> DataFrame builders so bench.py can time them
INTERLEAVED with the engine keys in the SAME session (r12 VERDICT item 3:
round-over-round totals moved +30% with zero code cause — whole-box drift.
A same-session engine/vanilla ratio is immune to that drift because both
sides ride the same JVM, JIT state, and IO cache).

tools/measure_vanilla.py (the BASELINE.md protocol: its own local[4]
session) imports these builders too, so the twin definitions cannot fork.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _q1(spark: SparkSession, sf: str) -> DataFrame:
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"),
            F.sum("l_extendedprice"),
            F.sum(dp),
            F.sum(dp * (1 + F.col("l_tax"))),
            F.avg("l_quantity"),
            F.avg("l_extendedprice"),
            F.avg("l_discount"),
            F.count(F.lit(1)),
        )
    )


def _q3(spark: SparkSession, sf: str) -> DataFrame:
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")
    c = spark.read.parquet(f"{sf}/customer.parquet")
    s = spark.read.parquet(f"{sf}/supplier.parquet")
    n = spark.read.parquet(f"{sf}/nation.parquet")
    r = spark.read.parquet(f"{sf}/region.parquet")
    of = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    return (
        c.join(of, c.c_custkey == of.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            r.filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    )


def _wr(spark: SparkSession, sf: str) -> DataFrame:
    o = spark.read.parquet(f"{sf}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


def _ea(spark: SparkSession, sf: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value"))
        .orderBy(
            F.col("n").desc(), F.col("user_id").asc(), F.col("event_type").asc()
        )
        .limit(20)
    )


# keyed by the bench.py headline names they twin
VANILLA_BUILDERS = {
    "q1_agg": _q1,
    "q3_join3": _q3,
    "window_rank": _wr,
    "events_agg": _ea,
}
