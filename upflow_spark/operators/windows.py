"""§2-E window function operators (SURVEY.md).

Scale notes: every window here partitions by a high-cardinality key (custkey,
user_id, brand) — one shuffle, then per-partition sort; no window runs
unpartitioned over the full table except the two aggregate-input ones
(win_moving_avg over ~2500 distinct days, win_percent_cume over priorities ×
buckets), which operate on pre-aggregated inputs small enough for a single
partition at any source scale. Unpartitioned windows over raw fact tables are
the classic 100 TB anti-pattern (single-task sort) and are avoided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.operators.rank2 import global_cummax_before
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "win_row_number_topk",
    oracle="""
SELECT o_custkey, o_orderkey, floor((o_totalprice) * 10000 + 0.5) / 10000 AS o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def win_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (deterministic via orderkey tiebreak)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", r4("o_totalprice").alias("o_totalprice"), "rn")
    )


@query(
    "win_rank_dense",
    oracle="""
SELECT p_partkey, p_brand, floor((p_retailprice) * 10000 + 0.5) / 10000 AS p_retailprice,
       rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
       dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank
FROM part
""",
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank of parts by retail price within each brand."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return p.select(
        "p_partkey",
        "p_brand",
        r4("p_retailprice").alias("p_retailprice"),
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
    )


@query(
    "win_ntile",
    oracle="""
SELECT c_custkey, c_nationkey,
       ntile(4) OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal DESC, c_custkey ASC) AS balance_quartile
FROM customer
""",
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acctbal quartile per nation (deterministic via custkey tiebreak)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select("c_custkey", "c_nationkey", F.ntile(4).over(w).cast("long").alias("balance_quartile"))


@query(
    "win_lag_lead",
    oracle="""
SELECT event_id, user_id,
       floor((value - lag(value) OVER w) * 10000 + 0.5) / 10000 AS delta_value,
       epoch_us(ts) - epoch_us(lag(ts) OVER w) AS us_since_prev,
       epoch_us(lead(ts) OVER w) - epoch_us(ts) AS us_until_next
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user deltas vs previous/next event (lag/lead over event time)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id",
        "user_id",
        r4(F.col("value") - F.lag("value").over(w)).alias("delta_value"),
        (ts_us - F.lag(ts_us).over(w)).alias("us_since_prev"),
        (F.lead(ts_us).over(w) - ts_us).alias("us_until_next"),
    )


@query(
    "win_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       floor((sum(o_totalprice) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate ASC, o_orderkey ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             * 10000 + 0.5) / 10000 AS running_spend
FROM orders
""",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer in order-date order."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        r4(F.sum("o_totalprice").over(w)).alias("running_spend"),
    )


@query(
    "win_moving_avg",
    oracle="""
SELECT day, floor((avg(daily_revenue) OVER (ORDER BY day ASC
                                            RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW))
                  * 10000 + 0.5) / 10000 AS ma7_revenue
FROM (
  SELECT date_trunc('day', l_shipdate) AS day,
         sum(l_extendedprice * (1 - l_discount)) AS daily_revenue
  FROM lineitem
  GROUP BY day
)
""",
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily revenue.

    Aggregate first (fact table → ~2500 day rows), then a RANGE window over
    days — the window input is tiny regardless of source scale, so the
    unpartitioned window is safe.
    """
    li = load(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.date_trunc("day", "l_shipdate").alias("day")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("daily_revenue")
    )
    # RANGE frame over integer epoch-days: -6 days .. current
    w = Window.orderBy(F.unix_date(F.col("day").cast("date"))).rangeBetween(-6, 0)
    return daily.select(
        "day",
        r4(F.avg("daily_revenue").over(w)).alias("ma7_revenue"),
    )


@query(
    "win_percent_cume",
    oracle="""
SELECT o_orderkey,
       floor((percent_rank() OVER w) * 10000 + 0.5) / 10000 AS price_pct_rank,
       floor((cume_dist() OVER w) * 10000 + 0.5) / 10000 AS price_cume_dist
FROM orders
WHERE o_orderpriority = '1-URGENT'
WINDOW w AS (ORDER BY o_totalprice ASC, o_orderkey ASC)
""",
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of order price within the URGENT slice."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_orderkey",
        r4(F.percent_rank().over(w)).alias("price_pct_rank"),
        r4(F.cume_dist().over(w)).alias("price_cume_dist"),
    )


@query(
    "win_first_last",
    oracle="""
SELECT user_id,
       arg_min(event_type, ts) AS first_type,
       arg_max(event_type, ts) AS last_type
FROM events
GROUP BY user_id
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event_type per user by time, via first/last with a full frame."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
        )
        .distinct()
    )


@query(
    "win_time_range_frame",
    oracle="""
SELECT user_id, event_id, ts,
       floor((sum(value) OVER (PARTITION BY user_id ORDER BY ts
                               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                         AND CURRENT ROW)) * 10000 + 0.5) / 10000
         AS val_1h
FROM events
WHERE event_type = 'purchase'
""",
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour running sum per user — a RANGE frame bounded by a
    time interval, not a row count.

    Unlike rowsBetween, the frame contains however many events fall in the
    hour (and all ts-peers, making it deterministic under ties). The
    DataFrame API's rangeBetween only takes numeric offsets, so the
    interval frame is expressed in SQL — same Catalyst WindowExec either
    way, one shuffle on user_id.
    """
    load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).createOrReplaceTempView("events_win_range_v")
    return spark.sql("""
        SELECT user_id, event_id, ts,
               sum(value) OVER (PARTITION BY user_id ORDER BY ts
                                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                          AND CURRENT ROW) AS val_raw
        FROM events_win_range_v
    """).select(
        "user_id", "event_id", "ts", r4(F.col("val_raw")).alias("val_1h")
    )


@query(
    "win_range_numeric_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       floor((o_totalprice) * 10000 + 0.5) / 10000 AS price,
       CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                           RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_within_50k
FROM orders
""",
)
def win_range_numeric_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame (value-based, not row-based): for each order,
    how many of the customer's orders cost within 50k below it. RANGE
    frames bound by VALUE distance are the frame type ROWS can't emulate
    when peers tie; complements win_time_range_frame (INTERVAL ranges).
    One o_custkey shuffle, sorted once."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        r4(F.col("o_totalprice")).alias("price"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_within_50k"),
    )


@query(
    "win_skyline_pareto",
    oracle="""
WITH s AS (
  SELECT o_orderkey, o_totalprice, o_orderdate,
         max(o_orderdate) OVER (ORDER BY o_totalprice DESC, o_orderdate DESC,
                                         o_orderkey ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_prev_date
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT o_orderkey,
       floor((o_totalprice) * 10000 + 0.5) / 10000 AS o_totalprice,
       o_orderdate
FROM s
WHERE best_prev_date IS NULL OR o_orderdate > best_prev_date
""",
)
def win_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of orders maximizing (totalprice,
    orderdate) over a stated 1/10 key sample: an order is on the frontier
    iff no earlier-sorted order (higher price, ties broken by later date
    then key) already reached a later date — the classic dominance
    operator (BNL/SFS skyline), expressed as ONE sort + ONE running-max
    window instead of the quadratic NOT EXISTS self-join.

    Exact full-row duplicates keep only their first (deterministic by
    orderkey) — the standard distinct-skyline convention, shared by the
    oracle formulation by construction. Scale: distributed SFS via
    rank2.global_cummax_before — range shuffle on the dominance order,
    per-partition running prev-max, and the cross-partition prev-max
    merged from the broadcast per-partition summary (max is idempotent, so
    the two-phase merge is exact for floats too). No single-partition
    sort.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    s = global_cummax_before(
        o.select("o_orderkey", "o_totalprice", "o_orderdate"),
        [
            ("o_totalprice", "desc"),
            ("o_orderdate", "desc"),
            ("o_orderkey", "asc"),
        ],
        F.col("o_orderdate"),
        "best_prev_date",
    )
    return s.filter(
        F.col("best_prev_date").isNull()
        | (F.col("o_orderdate") > F.col("best_prev_date"))
    ).select(
        "o_orderkey",
        r4(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderdate",
    )
