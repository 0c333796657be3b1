"""Extended scalar-function coverage (beyond §2-H's core tables): advanced
string ops, date formatting/parsing round-trips, trig/exponential math,
conditional expressions. All map-only, codegen'd, oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "str_advanced",
    oracle="""
SELECT p_partkey,
       reverse(p_brand) AS brand_rev,
       repeat(substr(p_brand, 1, 2), 2) AS brand_rep,
       translate(p_type, 'AEIOU', 'aeiou') AS type_translated,
       CAST(strpos(p_name, 'a') AS BIGINT) AS first_a_pos,
       substr(p_name, 1, 5) AS name_left5,
       contains(p_type, 'PROMO') AS is_promo
FROM part
""",
)
def str_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reverse / repeat / translate / instr / left-slice / contains."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.substring("p_brand", 1, 2), 2).alias("brand_rep"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_translated"),
        F.instr("p_name", "a").cast("long").alias("first_a_pos"),
        F.substring("p_name", 1, 5).alias("name_left5"),
        F.contains("p_type", F.lit("PROMO")).alias("is_promo"),
    )


@query(
    "date_format_parse",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m') AS order_month_str,
       strptime(strftime(o_orderdate, '%Y-%m') || '-01', '%Y-%m-%d') AS month_start,
       CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
FROM orders
""",
)
def date_format_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format → string → parse round-trip + quarter + epoch seconds.

    Spark date_format/to_timestamp interpret via the session tz; the session
    is pinned UTC (ensure_conf) so values match DuckDB's naive arithmetic.
    """
    o = load(spark, sf_dir, "orders")
    month_str = F.date_format("o_orderdate", "yyyy-MM")
    return o.select(
        "o_orderkey",
        month_str.alias("order_month_str"),
        F.to_timestamp(F.concat(month_str, F.lit("-01")), "yyyy-MM-dd")
        .cast("timestamp_ntz")
        .alias("month_start"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_sec"),
    )


@query(
    "math_trig",
    oracle="""
SELECT c_custkey,
       floor((sin(c_acctbal / 1000)) * 10000 + 0.5) / 10000 AS sin_bal,
       floor((cos(c_acctbal / 1000)) * 10000 + 0.5) / 10000 AS cos_bal,
       floor((atan2(c_acctbal, 1000)) * 10000 + 0.5) / 10000 AS atan2_bal,
       floor((exp(c_acctbal / 10000)) * 10000 + 0.5) / 10000 AS exp_bal,
       CAST(sign(c_acctbal) AS BIGINT) AS sign_bal
FROM customer
""",
)
def math_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sin/cos/atan2/exp/sign over balances (IEEE parity at 4dp)."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        r4(F.sin(bal / 1000)).alias("sin_bal"),
        r4(F.cos(bal / 1000)).alias("cos_bal"),
        r4(F.atan2(bal, F.lit(1000.0))).alias("atan2_bal"),
        r4(F.exp(bal / 10000)).alias("exp_bal"),
        F.signum(bal).cast("long").alias("sign_bal"),
    )


@query(
    "cond_exprs",
    oracle="""
SELECT c_custkey,
       if(c_acctbal > 0, 'credit', 'debit') AS balance_side,
       greatest(c_acctbal, 0.0) AS bal_or_zero,
       least(c_acctbal, 1000.0) AS bal_capped,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS segment_masked,
       CAST(CASE WHEN c_acctbal IS NULL THEN -1
                 WHEN c_acctbal < 0 THEN 0
                 ELSE 1 END AS BIGINT) AS bal_class
FROM customer
""",
)
def cond_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """if / greatest / least / nullif+coalesce masking / searched CASE."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal > 0, "credit").otherwise("debit").alias("balance_side"),
        F.greatest(bal, F.lit(0.0)).alias("bal_or_zero"),
        F.least(bal, F.lit(1000.0)).alias("bal_capped"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("SUPPRESSED")).alias(
            "segment_masked"
        ),
        F.when(bal.isNull(), -1).when(bal < 0, 0).otherwise(1).cast("long").alias("bal_class"),
    )
