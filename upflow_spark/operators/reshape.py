"""Reshape operators — wide<->long pivoting of measure columns.

agg_pivot (aggregates.py) covers long->wide; this module covers the inverse
(unpivot/melt), a staple of metric pipelines feeding per-measure models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query

MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "reshape_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, measure,
       floor((value) * 10000 + 0.5) / 10000 AS value
FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
)
WHERE l_orderkey % 50 = 0
""",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) lineitem's four measures into (measure, value) rows.

    Spark's native unpivot is a narrow (no-shuffle) 4x row expansion —
    the Expand physical operator, same machinery as rollup/cube — so it
    scales linearly and keeps columnar batches; never implement melt as a
    union of N self-scans (N passes over 100 TB).
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return (
        li.unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=MEASURES,
            variableColumnName="measure",
            valueColumnName="value_raw",
        )
        .select(
            "l_orderkey", "l_linenumber", "measure", r4("value_raw").alias("value")
        )
    )


@query(
    "reshape_transpose",
    oracle="""
SELECT 'sum_qty' AS key,
       floor((sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END)) * 10000 + 0.5) / 10000 AS A,
       floor((sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END)) * 10000 + 0.5) / 10000 AS N,
       floor((sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END)) * 10000 + 0.5) / 10000 AS R
FROM lineitem
UNION ALL
SELECT 'sum_rev',
       floor((sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice * (1 - l_discount) END)) * 10000 + 0.5) / 10000,
       floor((sum(CASE WHEN l_returnflag = 'N' THEN l_extendedprice * (1 - l_discount) END)) * 10000 + 0.5) / 10000,
       floor((sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1 - l_discount) END)) * 10000 + 0.5) / 10000
FROM lineitem
""",
)
def reshape_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.transpose (Spark 4): flip a small aggregate so measures become rows
    and group values become columns.

    Transpose collects the frame to the driver by design — ONLY legal after
    aggregation has reduced it to grouped-summary size (here 3 flags x 2
    measures); never transpose raw data at scale. The oracle spells the same
    flip as conditional aggregates.
    """
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.groupBy("l_returnflag")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.sum(rev)).alias("sum_rev"),
        )
        .orderBy("l_returnflag")
    )
    return agg.transpose()
