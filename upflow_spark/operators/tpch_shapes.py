"""Composed TPC-H-shape queries beyond Q1/Q5 — the multi-operator plans a
reference user actually runs, each mapping a classic pattern to Spark-first
form: decorrelated subqueries → windows/semi-joins, EXISTS → left_semi,
scalar subquery → cross-join of a 1-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "q_volume_between_nations",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       floor((sum(volume)) * 10000 + 0.5) / 10000 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q_volume_between_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.

    The OR-of-two-directions predicate lands AFTER the broadcast nation
    joins (it references both), but nation broadcast keeps it cheap; the
    fact-side joins stay equi-keyed shuffles.
    """
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair | rpair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
        )
    )


@query(
    "q_top_unshipped_orders",
    oracle="""
SELECT o.o_orderkey, o.o_orderdate,
       floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 10000 + 0.5) / 10000 AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'O' AND l.l_shipdate > TIMESTAMP '2000-06-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 10
""",
)
def q_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 open orders by pending revenue."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-06-01").cast("timestamp_ntz")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "q_parts_above_avg_price",
    oracle="""
SELECT p_partkey, p_brand, floor((p_retailprice) * 10000 + 0.5) / 10000 AS p_retailprice
FROM part
WHERE p_retailprice > (SELECT avg(p_retailprice) * 1.5 FROM part)
""",
)
def q_parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: parts priced >1.5× the global average.

    Spark-first: the 1-row aggregate is cross-joined (broadcast) instead of
    a correlated subquery — one extra tiny stage, no recompute per row.
    """
    p = load(spark, sf_dir, "part")
    avg_price = p.agg((F.avg("p_retailprice") * 1.5).alias("threshold"))
    return (
        p.crossJoin(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > F.col("threshold"))
        .select("p_partkey", "p_brand", r4("p_retailprice").alias("p_retailprice"))
    )


@query(
    "q_supplier_above_nation_avg",
    oracle="""
SELECT s_suppkey, s_name, n_name,
       floor((s_acctbal) * 10000 + 0.5) / 10000 AS s_acctbal
FROM (
  SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal,
         avg(s.s_acctbal) OVER (PARTITION BY s.s_nationkey) AS nation_avg
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
)
WHERE s_acctbal > nation_avg
""",
)
def q_supplier_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape decorrelated to a window: suppliers with
    above-average balance within their own nation."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("nation_avg", F.avg("s_acctbal").over(w))
        .filter(F.col("s_acctbal") > F.col("nation_avg"))
        .select("s_suppkey", "s_name", "n_name", r4("s_acctbal").alias("s_acctbal"))
    )
