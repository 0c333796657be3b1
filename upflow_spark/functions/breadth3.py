"""SQL-surface breadth, wave 3: discrete percentiles, IGNORE NULLS window
semantics, single-pass column profiling, and mergeable partial-rollup
verification.

Same conventions as waves 1-2: native expressions, shared aliases, r4
rounding on float outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "agg_percentile_disc",
    oracle="""
SELECT c_mktsegment,
       floor((quantile_disc(c_acctbal, 0.5)) * 10000 + 0.5) / 10000 AS p50_bal,
       floor((quantile_disc(c_acctbal, 0.9)) * 10000 + 0.5) / 10000 AS p90_bal
FROM customer
GROUP BY c_mktsegment
""",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (actual data points, not interpolated): both
    engines return the smallest value whose cume_dist >= p."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        r4(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)")).alias("p50_bal"),
        r4(F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal)")).alias("p90_bal"),
    )


@query(
    "win_ignore_nulls",
    oracle="""
SELECT event_id, user_id,
       floor((last_value(click_value IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000
         AS last_click_value,
       floor((lag(value, 1, -1.0) OVER (PARTITION BY user_id ORDER BY ts, event_id)) * 10000 + 0.5) / 10000
         AS prev_value
FROM (SELECT event_id, user_id, ts, value,
             CASE WHEN event_type = 'click' THEN value END AS click_value
      FROM events)
""",
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics: forward-fill the last click value per
    user (NULL until the first click), plus lag with an explicit default —
    the default fires only at partition start, never on NULL inputs."""
    ev = load(spark, sf_dir, "events").withColumn(
        "click_value", F.when(F.col("event_type") == "click", F.col("value"))
    )
    order = [F.col("ts"), F.col("event_id")]
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    return ev.select(
        "event_id",
        "user_id",
        r4(F.last("click_value", ignorenulls=True).over(w_fill)).alias("last_click_value"),
        r4(F.lag("value", 1, -1.0).over(w_lag)).alias("prev_value"),
    )


@query(
    "profile_columns",
    oracle="""
SELECT 'c_custkey' AS col_name, CAST(count(*) - count(c_custkey) AS BIGINT) AS n_null,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
       CAST(min(c_custkey) AS DOUBLE) AS min_num, CAST(max(c_custkey) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM customer
UNION ALL
SELECT 'c_nationkey', CAST(count(*) - count(c_nationkey) AS BIGINT),
       CAST(count(DISTINCT c_nationkey) AS BIGINT),
       CAST(min(c_nationkey) AS DOUBLE), CAST(max(c_nationkey) AS DOUBLE), NULL, NULL
FROM customer
UNION ALL
SELECT 'c_acctbal', CAST(count(*) - count(c_acctbal) AS BIGINT),
       CAST(count(DISTINCT c_acctbal) AS BIGINT),
       floor(min(c_acctbal) * 10000 + 0.5) / 10000, floor(max(c_acctbal) * 10000 + 0.5) / 10000,
       NULL, NULL
FROM customer
UNION ALL
SELECT 'c_name', CAST(count(*) - count(c_name) AS BIGINT),
       CAST(count(DISTINCT c_name) AS BIGINT), NULL, NULL, min(c_name), max(c_name)
FROM customer
UNION ALL
SELECT 'c_mktsegment', CAST(count(*) - count(c_mktsegment) AS BIGINT),
       CAST(count(DISTINCT c_mktsegment) AS BIGINT), NULL, NULL, min(c_mktsegment), max(c_mktsegment)
FROM customer
""",
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profiler: null count, distinct count, min/max per
    column, unpivoted to one row per column via ``stack``.

    The whole profile is ONE aggregation over ONE scan — at 100 TB this is
    the difference between profiling in a single job and five. (The exact
    count_distincts expand the agg; at petabyte scale swap them for
    approx_count_distinct — the query shape is unchanged.)
    """
    c = load(spark, sf_dir, "customer")
    n = F.count(F.lit(1))

    def nn(col: str):
        return (n - F.count(col)).cast("long")

    agg = c.agg(
        nn("c_custkey").alias("nn_ck"),
        F.countDistinct("c_custkey").alias("nd_ck"),
        F.min("c_custkey").cast("double").alias("mn_ck"),
        F.max("c_custkey").cast("double").alias("mx_ck"),
        nn("c_nationkey").alias("nn_nk"),
        F.countDistinct("c_nationkey").alias("nd_nk"),
        F.min("c_nationkey").cast("double").alias("mn_nk"),
        F.max("c_nationkey").cast("double").alias("mx_nk"),
        nn("c_acctbal").alias("nn_ab"),
        F.countDistinct("c_acctbal").alias("nd_ab"),
        r4(F.min("c_acctbal")).alias("mn_ab"),
        r4(F.max("c_acctbal")).alias("mx_ab"),
        nn("c_name").alias("nn_nm"),
        F.countDistinct("c_name").alias("nd_nm"),
        F.min("c_name").alias("mn_nm"),
        F.max("c_name").alias("mx_nm"),
        nn("c_mktsegment").alias("nn_ms"),
        F.countDistinct("c_mktsegment").alias("nd_ms"),
        F.min("c_mktsegment").alias("mn_ms"),
        F.max("c_mktsegment").alias("mx_ms"),
    )
    return agg.selectExpr(
        """stack(5,
           'c_custkey',    nn_ck, nd_ck, mn_ck, mx_ck, CAST(NULL AS STRING), CAST(NULL AS STRING),
           'c_nationkey',  nn_nk, nd_nk, mn_nk, mx_nk, CAST(NULL AS STRING), CAST(NULL AS STRING),
           'c_acctbal',    nn_ab, nd_ab, mn_ab, mx_ab, CAST(NULL AS STRING), CAST(NULL AS STRING),
           'c_name',       nn_nm, nd_nm, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_nm, mx_nm,
           'c_mktsegment', nn_ms, nd_ms, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_ms, mx_ms
        ) AS (col_name, n_null, n_distinct, min_num, max_num, min_str, max_str)"""
    )


@query(
    "rollup_incremental_merge",
    oracle="""
SELECT l_returnflag,
       floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             * 10000 + 0.5) / 10000 AS total_rev,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
GROUP BY l_returnflag
""",
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-rollup pattern: month-partitioned partial aggregates
    re-aggregated to the final answer — the incremental-pipeline shape where
    each day/month is aggregated once and merged, never rescanned.

    Equality with the direct one-shot aggregate is exactly what the oracle
    checks. Sum-of-sums and sum-of-counts are the canonical mergeable pair
    (avg is rebuilt as merged_sum/merged_count downstream, never averaged).
    """
    li = load(spark, sf_dir, "lineitem")
    # revenue partials in exact DECIMAL: only 3 merged groups x ~200k rows
    # at sf0.1, where double accumulation-order drift exceeds the 4dp
    # compare (r6 sf0.1 sweep catch) — and decimal partials make the
    # merge-equals-one-shot property EXACT, which is the point of the key
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    partial = li.groupBy(
        "l_returnflag", F.date_trunc("month", "l_shipdate").alias("ship_month")
    ).agg(F.sum(rev).alias("rev_part"), F.count(F.lit(1)).alias("n_part"))
    return partial.groupBy("l_returnflag").agg(
        r4(F.sum("rev_part").cast("double")).alias("total_rev"),
        F.sum("n_part").cast("long").alias("n_items"),
    )
