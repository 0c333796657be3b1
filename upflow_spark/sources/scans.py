"""§2-A scan operators (SURVEY.md).

These keys exist to pin the scan-efficiency contract: projection and
predicates must reach the parquet reader. tests/test_plans.py asserts the
formatted plan shows the pruned ReadSchema and PushedFilters — at 100 TB the
difference between scanning 2 columns of 11 with row-group skipping and a
full-table read is the whole game.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "scan_parquet",
    oracle="""
SELECT count(*) AS n_rows,
       min(l_orderkey) AS min_orderkey, max(l_orderkey) AS max_orderkey,
       min(l_partkey) AS min_partkey, max(l_partkey) AS max_partkey
FROM lineitem
""",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan: count + key ranges of the fact table."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.min("l_partkey").alias("min_partkey"),
        F.max("l_partkey").alias("max_partkey"),
    )


@query(
    "scan_projection_pushdown",
    oracle="SELECT l_orderkey, floor((l_extendedprice) * 10000 + 0.5) / 10000 AS l_extendedprice FROM lineitem",
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reads exactly 2 of lineitem's 11 columns (ReadSchema pruned)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", r4("l_extendedprice").alias("l_extendedprice"))


@query(
    "scan_predicate_pushdown",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
""",
)
def scan_predicate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range filter pushed to parquet (row-group stats pruning)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linenumber", "l_shipdate")
