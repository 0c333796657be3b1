"""SQL-surface breadth, wave 2: contingency tables (df.stat.crosstab),
conditional-count + exact-median aggregates, nth_value windows, and the
exists/forall/filter/zip_with higher-order-function family.

Same conventions as wave 1 (functions/breadth.py): native Catalyst
expressions only, identical aliases both sides, r4 float rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "stat_crosstab",
    oracle="""
SELECT c_mktsegment AS c_mktsegment_o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS "1-URGENT",
       CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS "2-HIGH",
       CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS "3-MEDIUM",
       CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS "4-NOT SPECIFIED",
       CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS "5-LOW"
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via df.stat.crosstab (pairwise frequency matrix).

    crosstab pivots on the distinct values of the second column — bounded
    cardinality (5 priorities) so the result is tiny regardless of fact-table
    size; the heavy lifting is one hash aggregation over the join.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    joined = c.join(o, c.c_custkey == o.o_custkey, "inner")
    ct = joined.stat.crosstab("c_mktsegment", "o_orderpriority")
    # crosstab emits count columns in value-discovery order; project a fixed
    # order and long dtype so the frame is deterministic
    return ct.select(
        "c_mktsegment_o_orderpriority",
        *[
            F.col(f"`{p}`").cast("long").alias(p)
            for p in ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        ],
    )


@query(
    "agg_count_if_median",
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) FILTER (WHERE c_acctbal < 0) AS BIGINT) AS n_negative,
       CAST(count(*) FILTER (WHERE c_acctbal >= 5000) AS BIGINT) AS n_rich,
       floor((CAST(median(c_acctbal) AS DOUBLE)) * 10000 + 0.5) / 10000 AS median_bal,
       CAST(count(*) AS BIGINT) AS n
FROM customer
GROUP BY c_mktsegment
""",
)
def agg_count_if_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if predicates + exact interpolated median per group (both
    engines interpolate the even-count midpoint identically on doubles)."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.groupBy("c_mktsegment").agg(
        F.count_if(bal < 0).alias("n_negative"),
        F.count_if(bal >= 5000).alias("n_rich"),
        r4(F.median(bal)).alias("median_bal"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "win_nth_value",
    oracle="""
SELECT o_orderkey, o_custkey,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       nth_value(o_orderkey, 3) OVER w AS third_key,
       first_value(o_totalprice) OVER w AS first_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a full-partition frame (deterministic: the order key
    includes the unique o_orderkey tiebreaker; NULL when the partition has
    fewer than n rows)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
        F.first("o_totalprice").over(w).alias("first_price"),
    )


@query(
    "hof_exists_forall",
    oracle="""
SELECT vec_id,
       len(list_filter(e, x -> x > 0.25)) > 0 AS any_big,
       len(list_filter(e, x -> NOT(x > -10))) = 0 AS all_sane,
       CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_pos,
       floor((list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * e[len(e) - i + 1]))) * 10000 + 0.5) / 10000 AS rev_dot
FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
""",
)
def hof_exists_forall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exists / forall / filter / zip_with higher-order functions — the
    UDF-free way to compute per-element logic (stays in codegen; no Python
    round-trip, no explode shuffle). rev_dot = <e, reverse(e)> via zip_with.
    """
    emb = load(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    d = emb.select("vec_id", e.alias("e"))
    ecol = F.col("e")
    return d.select(
        "vec_id",
        F.exists(ecol, lambda x: x > 0.25).alias("any_big"),
        F.forall(ecol, lambda x: x > -10).alias("all_sane"),
        F.size(F.filter(ecol, lambda x: x > 0)).cast("long").alias("n_pos"),
        r4(
            F.aggregate(
                F.zip_with(ecol, F.reverse(ecol), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("rev_dot"),
    )
