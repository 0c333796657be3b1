"""TPC-H shapes, second wave — completes the 22-query sweep (Q6, Q8-Q12,
Q15, Q16, Q19-Q21; the rest live in tpch_shapes.py / joins.py / aggregates.py).

Schema adaptations (the star schema here is TPC-H-ish, not TPC-H):
- no `partsupp`: supply cost is proxied as 0.6 * p_retailprice, and the
  part<->supplier relation is derived from observed lineitems;
- no l_commitdate / l_receiptdate / l_shipmode: "late" is derived from
  l_shipdate vs o_orderdate + INTERVAL, and Q12's shipmode grouping becomes
  a derived delay bucket;
- no comment columns: Q16's complaint filter becomes a negative-balance
  supplier filter.
Each adaptation preserves the classic query's PLAN shape (the point of the
exercise): the same joins, the same decorrelations, the same agg structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


def _ts(s: str):  # noqa: ANN202
    return F.lit(s).cast("timestamp_ntz")


@query(
    "q_forecast_revenue_change",
    oracle="""
SELECT floor((sum(l_extendedprice * l_discount)) * 10000 + 0.5) / 10000 AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
""",
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue that would vanish if mid-range discounts were
    dropped. Pure scan-filter-agg: every predicate pushes to the parquet
    scan (shipdate range prunes row groups via min/max stats at scale); the
    only exchange is the 1-row final agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue_delta"))
    )


@query(
    "q_national_market_share",
    oracle="""
SELECT o_year,
       floor((sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
              / sum(volume)) * 10000 + 0.5) / 10000 AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n2.n_regionkey AND r.r_name = 'ASIA'
)
GROUP BY o_year
""",
)
def q_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1's share of PROMO-part volume sold into ASIA,
    by order year.

    Every dimension (part-filtered, supplier, both nations, region) is
    broadcast; the two fact tables join on orderkey. The share is one
    conditional-sum / sum over the same grouped pass — no second scan."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            r4(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0))
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )


@query(
    "q_product_type_profit",
    oracle="""
SELECT nation, o_year, floor((sum(amount)) * 10000 + 0.5) / 10000 AS profit
FROM (
  SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - 0.6 * p.p_retailprice * l.l_quantity AS amount
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%gear%'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
)
GROUP BY nation, o_year
""",
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on *gear* parts by supplier nation and year.
    Supply cost is proxied as 0.6 * p_retailprice (no partsupp table); the
    LIKE filter lands on the broadcast part side so the fact scan is pruned
    by the join, not a full-name scan."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(r4(F.sum(amount)).alias("profit"))
    )


@query(
    "q_returned_item_losses",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 10000 + 0.5) / 10000
         AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC, c.c_custkey ASC
LIMIT 20
""",
)
def q_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned items in
    one quarter. TakeOrdered(20) after the grouped agg — only 20 rows cross
    to the driver; the custkey tie-break makes the cut deterministic."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("rev_raw"))
        .orderBy(F.col("rev_raw").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "n_name", r4(F.col("rev_raw")).alias("revenue"))
    )


@query(
    "q_important_stock_value",
    oracle="""
WITH val AS (
  SELECT l.l_partkey, sum(l.l_quantity * 0.6 * p.p_retailprice) AS value_raw
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
  JOIN part p     ON p.p_partkey = l.l_partkey
  GROUP BY l.l_partkey
)
SELECT l_partkey, floor((value_raw) * 10000 + 0.5) / 10000 AS stock_value
FROM val
WHERE value_raw > (SELECT sum(value_raw) * 0.001 FROM val)
""",
)
def q_important_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing an outsized share of NATION_3's
    supplied value (0.6 * retailprice proxies supply cost; observed lineitem
    quantity proxies availqty).

    The HAVING-against-global-sum decorrelates to a broadcast cross join of
    the 1-row total over the SAME grouped result — the per-part agg is
    computed once and reused, not rescanned."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity") * 0.6 * F.col("p_retailprice")).alias("value_raw"))
    )
    total = val.agg((F.sum("value_raw") * 0.001).alias("threshold"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_raw") > F.col("threshold"))
        .select("l_partkey", r4(F.col("value_raw")).alias("stock_value"))
    )


@query(
    "q_priority_shipping_delay",
    oracle="""
SELECT delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM (
  SELECT o.o_orderpriority,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY THEN 'very_late'
              WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 'late'
              ELSE 'on_time' END AS delay_bucket
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)
GROUP BY delay_bucket
""",
)
def q_priority_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high- vs low-priority line counts per shipping-delay
    bucket (the derived bucket stands in for l_shipmode, which this schema
    lacks). The CASE-sum pivot is one grouped pass — no per-priority
    re-scan; both conditional counts ride the same partial agg."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = (
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS"),
            "very_late",
        )
        .when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
            "late",
        )
        .otherwise("on_time")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(high.alias("is_high"), bucket.alias("delay_bucket"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_top_supplier_revenue",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         floor((sum(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000
           AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
""",
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue.

    The revenue view is computed once; the scalar MAX decorrelates to an
    unpartitioned max window over the 100-row grouped result (cheaper than a
    second scan + self-join; ties are all kept, as the spec requires).
    Revenue is compared r4-rounded on both engines so float sum-order noise
    can't flip the argmax set."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.groupBy("l_suppkey")
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_rev"))
    )
    w = Window.partitionBy()
    return (
        rev.withColumn("mx", F.max("total_rev").over(w))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q_part_supplier_relationships",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 24)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q_part_supplier_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can supply each (brand, type,
    size) bucket. The part<->supplier relation is the observed lineitem
    pairing (no partsupp table); the complaint-supplier NOT IN becomes a
    left_anti against negative-balance suppliers. count(DISTINCT) rides the
    standard two-phase expand/agg — no driver-side dedup."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24)
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_disjunctive_revenue",
    oracle="""
SELECT floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 10000 + 0.5) / 10000
         AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three conjunctive
    brand/size/quantity envelopes.

    The classic optimizer test: the common parts of the disjunction
    (p_brand IN (...), p_size >= 1, quantity range hull) are factored out
    and pushed below the join by Catalyst's predicate normalization, so the
    broadcast hash join sees pre-filtered inputs rather than evaluating the
    full OR against the raw cross of rows."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    sz = F.col("p_size")
    branch = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@query(
    "q_promo_part_suppliers",
    oracle="""
SELECT DISTINCT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_2'
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'small%'
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING sum(l.l_quantity) > 40
)
""",
)
def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_2 suppliers who moved >40 units of any
    'small*' part in 1997 (shipped quantity proxies stocked quantity).

    Nested IN-subqueries flatten to a chain: broadcast part filter ->
    grouped HAVING keyset -> left_semi into the supplier dim. The heavy agg
    runs on the fact table ONCE; the supplier table is never shuffled."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_2")
        .select("n_nationkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q_waiting_suppliers",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders o   ON o.o_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_4'
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
""",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: NATION_4 suppliers who were the SOLE late supplier on
    a multi-supplier order ("late" = shipped >60 days after order date; no
    receipt/commit dates in this schema).

    EXISTS -> left_semi on (orderkey, suppkey<>) ; NOT EXISTS -> left_anti
    against the late subset. All three probes key on l_orderkey: at fixture
    scale the filtered probe sides broadcast; at 100 TB they degrade
    gracefully to sort-merge probes sharing the driving join's orderkey
    shuffle layout instead of three independent scans."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_4")
        .select("n_nationkey")
    )
    l1 = (
        late.join(F.broadcast(n.join(s, s.s_nationkey == n.n_nationkey)),
                  F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("x_orderkey"))
            & (F.col("l_suppkey") != F.col("x_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("y_orderkey"))
            & (F.col("l_suppkey") != F.col("y_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
