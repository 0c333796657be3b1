"""§2-B projection / filter / expression operators (SURVEY.md).

Everything here is a narrow scan + per-row expression — the fastest shapes in
Spark: filters and column selection reach the parquet reader (PushedFilters /
ReadSchema in explain), and the expressions run inside whole-stage codegen.
No shuffle in any of these plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "project_compute",
    oracle="""
SELECT l_orderkey, l_linenumber,
       floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000 AS revenue,
       floor((l_tax + l_discount) * 10000 + 0.5) / 10000 AS tax_plus_disc,
       floor((l_extendedprice / l_quantity) * 10000 + 0.5) / 10000 AS unit_price
FROM lineitem
""",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived arithmetic columns; scan should read only 6 of 11 columns."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        r4(F.col("l_tax") + F.col("l_discount")).alias("tax_plus_disc"),
        r4(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )


@query(
    "filter_comparison",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity BETWEEN 5 AND 15 AND l_discount >= 0.05
""",
)
def filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + comparison predicates, pushed down to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 15) & (F.col("l_discount") >= 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "filter_in_like",
    oracle="""
SELECT p_partkey, p_brand, p_type
FROM part
WHERE p_brand IN ('Brand#1', 'Brand#3', 'Brand#5') AND p_type LIKE 'PROMO%'
""",
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE-prefix predicates (both parquet-pushable)."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#1", "Brand#3", "Brand#5")
        & F.col("p_type").like("PROMO%")
    ).select("p_partkey", "p_brand", "p_type")


@query(
    "filter_null_safe",
    oracle="""
SELECT event_id,
       k_val,
       coalesce(k_val, -1) AS k_or_default,
       (k_val IS NOT DISTINCT FROM 7) AS k_is_seven
FROM (
  SELECT event_id, nullif(CAST(props->>'k' AS INTEGER) % 10, 0) AS k_val
  FROM events
)
WHERE k_val IS NULL OR k_val >= 5
""",
)
def filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif/coalesce + null-safe equality (<=>) over JSON-extracted ints."""
    ev = load(spark, sf_dir, "events")
    k = F.nullif(F.get_json_object("props", "$.k").cast("int") % 10, F.lit(0))
    return (
        ev.select("event_id", k.alias("k_val"))
        .withColumn("k_or_default", F.coalesce(F.col("k_val"), F.lit(-1)))
        .withColumn("k_is_seven", F.col("k_val").eqNullSafe(F.lit(7)))
        .filter(F.col("k_val").isNull() | (F.col("k_val") >= 5))
    )


@query(
    "case_when",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            WHEN o_totalprice < 300000 THEN 'large'
            ELSE 'jumbo' END AS tier,
       count(*) AS n_orders,
       floor((avg(o_totalprice)) * 10000 + 0.5) / 10000 AS avg_price
FROM orders
GROUP BY tier
""",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + per-tier aggregate."""
    o = load(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        o.select(tier.alias("tier"), "o_totalprice")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(F.avg("o_totalprice")).alias("avg_price"),
        )
    )
