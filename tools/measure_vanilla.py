"""Vanilla-PySpark headline baseline: hand-written queries, local[4],
shuffle.partitions=8, UTC, AQE default. Protocol identical to bench.py:
global JIT warm-up, then per query one untimed warm + best-of-2 timed."""
import time
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
li = spark.read.parquet(f"{SF}/lineitem.parquet")
o = spark.read.parquet(f"{SF}/orders.parquet")
c = spark.read.parquet(f"{SF}/customer.parquet")
s = spark.read.parquet(f"{SF}/supplier.parquet")
n = spark.read.parquet(f"{SF}/nation.parquet")
r = spark.read.parquet(f"{SF}/region.parquet")
ev = spark.read.parquet(f"{SF}/events.parquet")

def q1():
    dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.sum(dp),
             F.sum(dp * (1 + F.col("l_tax"))), F.avg("l_quantity"),
             F.avg("l_extendedprice"), F.avg("l_discount"), F.count(F.lit(1)))
    )

def q3():
    of = o.filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                  & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")))
    return (
        c.join(of, c.c_custkey == of.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r.filter(F.col("r_name") == "ASIA"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    )

def wr():
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)

def ea():
    return (ev.groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value"))
            .orderBy(F.col("n").desc(), F.col("user_id").asc(),
                     F.col("event_type").asc()).limit(20))

QS = {"q1_agg": q1, "q3_join3": q3, "window_rank": wr, "events_agg": ea}
for f in QS.values():  # global JIT warm-up
    f().collect()
out = {}
for name, f in QS.items():
    f().collect()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); f().collect()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print(out)
spark.stop()
