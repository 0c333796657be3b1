"""§2-H date/time functions (SURVEY.md).

Convention landmine handled here: Spark ``dayofweek`` is Sun=1..Sat=7 while
DuckDB ``dayofweek`` is Sun=0..Sat=6 — the oracle SQL adds 1 to align
(FIXTURES.md rule 3). All inputs are timestamp_ntz so no timezone skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "date_parts",
    oracle="""
SELECT year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       count(*) AS n_orders,
       count(DISTINCT dayofmonth(o_orderdate)) AS n_distinct_days,
       count(*) FILTER (WHERE dayofweek(o_orderdate) + 1 IN (1, 7)) AS n_weekend_orders,
       min(date_trunc('month', o_orderdate)) AS month_start
FROM orders
GROUP BY order_year, order_month
""",
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dayofweek extraction + date_trunc, grouped counts.

    Spark dayofweek: Sun=1..Sat=7; oracle uses DuckDB dayofweek+1 to match.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct(F.dayofmonth("o_orderdate")).alias("n_distinct_days"),
            F.count(F.when(F.dayofweek("o_orderdate").isin(1, 7), 1)).alias(
                "n_weekend_orders"
            ),
            F.min(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        )
    )


@query(
    "date_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       datediff('day', o_orderdate, l_shipdate) AS ship_delay_days,
       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       floor((12 * (year(l_shipdate) - year(o_orderdate))
              + (month(l_shipdate) - month(o_orderdate))
              + (dayofmonth(l_shipdate) - dayofmonth(o_orderdate)) / 31.0) * 10000 + 0.5) / 10000
         AS months_between_approx
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_linenumber = 1
""",
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff / date_add / last_day / month arithmetic, ship vs order date.

    months_between is emitted via an explicitly-portable formula (whole-month
    difference + day-fraction /31) computed identically on both sides —
    Spark's months_between has engine-specific day/time fraction semantics.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    o = load(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    months_approx = (
        12 * (F.year("l_shipdate") - F.year("o_orderdate"))
        + (F.month("l_shipdate") - F.month("o_orderdate"))
        + (F.dayofmonth("l_shipdate") - F.dayofmonth("o_orderdate")) / F.lit(31.0)
    )
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("ship_delay_days"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.last_day(F.col("o_orderdate").cast("date"))
        .cast("timestamp_ntz")
        .alias("month_end"),
        r4(months_approx).alias("months_between_approx"),
    )
