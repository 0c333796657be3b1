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
WHERE p_retailprice > (SELECT avg(p_retailprice) + stddev_samp(p_retailprice) FROM part)
""",
)
def q_parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: parts priced above mean + one stddev.

    Spark-first: the 1-row aggregate is cross-joined (broadcast) instead of
    a correlated subquery — one extra tiny stage, no recompute per row.
    (r6: threshold was 1.5× avg, which exceeds the fixture's max retailprice
    at EVERY sf — a vacuous 0-row key; mean+stddev emits 42/422/4220 rows
    at sf0.001/0.01/0.1 so the broadcast-crossJoin shape is exercised.)
    """
    p = load(spark, sf_dir, "part")
    avg_price = p.agg(
        (F.avg("p_retailprice") + F.stddev("p_retailprice")).alias("threshold")
    )
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


@query(
    "q_order_priority_late",
    oracle="""
SELECT o_orderpriority, count(*) AS late_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
)
def q_order_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for orders with a late shipment.

    EXISTS with a correlated non-equi predicate maps to a left_semi join
    whose condition carries both the equi key (orderkey — drives the
    shuffle) and the date comparison (applied residually).
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("late_orders"))
    )


@query(
    "q_customer_order_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts (zeros kept
    via the left outer join)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q_large_volume_customers",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       floor((o.o_totalprice) * 10000 + 0.5) / 10000 AS o_totalprice,
       floor((sum(l.l_quantity)) * 10000 + 0.5) / 10000 AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
                       HAVING sum(l_quantity) > 150)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind orders whose total quantity exceeds
    a threshold.

    The IN-subquery becomes a pre-aggregated key set joined left_semi on
    o_orderkey; the partial (map-side) aggregation of sum(l_quantity)
    happens before the shuffle on both the filter branch and the final agg.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 150)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(r4(F.sum("l_quantity")).alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            r4("o_totalprice").alias("o_totalprice"), "total_qty",
        )
    )


@query(
    "q_promo_revenue_share",
    oracle="""
SELECT floor((100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END)
              / sum(l.l_extendedprice * (1 - l.l_discount))) * 10000 + 0.5) / 10000
       AS promo_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from PROMO parts in a quarter.

    part is broadcast (dim-sized), so the only wide operation is the final
    single-row global aggregate; the date filter is pushed to the scan.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            r4(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_share")
        )
    )


@query(
    "q_no_urgent_customers",
    oracle="""
SELECT c.c_custkey, c.c_name,
       floor((c.c_acctbal) * 10000 + 0.5) / 10000 AS c_acctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
)
def q_no_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no urgent orders.

    Scalar subquery -> broadcast cross join of a 1-row aggregate;
    NOT EXISTS -> left_anti join against the filtered orders side.
    """
    c = load(spark, sf_dir, "customer")
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("bal_threshold")
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("bal_threshold"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", r4("c_acctbal").alias("c_acctbal"))
    )


@query(
    "q_min_price_supplier_per_part",
    oracle="""
SELECT l_partkey, l_suppkey, s_name,
       floor((unit_price) * 10000 + 0.5) / 10000 AS unit_price
FROM (
  SELECT l.l_partkey, l.l_suppkey, s.s_name,
         l.l_extendedprice / l.l_quantity AS unit_price,
         row_number() OVER (PARTITION BY l.l_partkey
                            ORDER BY l.l_extendedprice / l.l_quantity,
                                     l.l_suppkey, l.l_orderkey, l.l_linenumber)
           AS rn
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_size <= 5
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
)
WHERE rn = 1
""",
)
def q_min_price_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted — no partsupp table): for each small part, the
    supplier observed offering the lowest unit price.

    The correlated MIN subquery decorrelates to one ranking window over the
    partkey shuffle; the tie-break chain (suppkey, orderkey, linenumber)
    makes rn=1 deterministic so both engines pick the identical row.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 5).select("p_partkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    w = Window.partitionBy("l_partkey").orderBy(
        "unit_price", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select("l_partkey", "l_suppkey", "s_name", "l_orderkey", "l_linenumber", unit)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "s_name", r4("unit_price").alias("unit_price"))
    )


@query(
    "q_small_qty_revenue",
    oracle="""
SELECT floor((sum(l_extendedprice) / 7.0) * 10000 + 0.5) / 10000 AS avg_yearly
FROM (
  SELECT l.l_extendedprice
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
  QUALIFY l.l_quantity < 0.2 * avg(l.l_quantity) OVER (PARTITION BY l.l_partkey)
)
""",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue attributable to small-quantity orders of one
    brand's parts (candidate for bulk-order consolidation).

    The per-part average decorrelates to a window after the broadcast part
    filter; only matching parts' lineitems enter the shuffle.
    """
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )
