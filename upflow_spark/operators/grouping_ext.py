"""§2-D grouping extensions: ROLLUP / CUBE / GROUPING SETS / PIVOT (SURVEY.md).

Scale notes: rollup/cube/grouping-sets compile to a single Expand + hash
aggregate — one pass over the fact table producing one replicated row per
grouping set, so cost ∝ (#sets × rows) map-side, with partial aggregation
before the shuffle. Pivot with an explicit value list is a single groupBy with
conditional aggregates (no second pass to discover values — always pass the
list at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
       floor((sum(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000 AS revenue,
       count(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with grouping() indicator flags."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "agg_cube",
    oracle="""
SELECT c_mktsegment, n_name,
       grouping(c_mktsegment) AS g_seg, grouping(n_name) AS g_nat,
       count(*) AS n_customers,
       floor((avg(c_acctbal)) * 10000 + 0.5) / 10000 AS avg_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (c_mktsegment, n_name)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (mktsegment, nation) — all four grouping combinations."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .cube("c_mktsegment", "n_name")
        .agg(
            F.grouping("c_mktsegment").cast("long").alias("g_seg"),
            F.grouping("n_name").cast("long").alias("g_nat"),
            F.count(F.lit(1)).alias("n_customers"),
            r4(F.avg("c_acctbal")).alias("avg_balance"),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       grouping(o_orderpriority) AS g_pri, grouping(o_orderstatus) AS g_st,
       count(*) AS n_orders,
       floor((sum(o_totalprice)) * 10000 + 0.5) / 10000 AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((a,b),(a),()) via groupingSets()."""
    o = load(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping("o_orderpriority").cast("long").alias("g_pri"),
        F.grouping("o_orderstatus").cast("long").alias("g_st"),
        F.count(F.lit(1)).alias("n_orders"),
        r4(F.sum("o_totalprice")).alias("total_price"),
    )


@query(
    "agg_pivot",
    oracle="""
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS "click",
       count(*) FILTER (WHERE event_type = 'view')     AS "view",
       count(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
       count(*) FILTER (WHERE event_type = 'signup')   AS "signup",
       count(*) FILTER (WHERE event_type = 'error')    AS "error"
FROM events
GROUP BY user_id
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts pivoted to one column per event_type (fixed value list)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


@query(
    "agg_hll_sketch",
    oracle="""
SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_custs,
       TRUE AS est_within_bounds
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT '__all__', count(DISTINCT o_custkey), TRUE FROM orders
""",
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via Spark 3.5+ builtins):
    per-priority distinct-customer sketches, merged to a global estimate.

    The 100 TB property is MERGEABILITY: per-partition/per-day sketches are
    tiny (<= lgK 2^12 bytes), persistable, and hll_union_agg combines them
    without rescanning history — count-distinct over any rollup becomes an
    O(sketch) merge instead of an O(data) scan. Graded shape (r4, the
    agg_approx_count_distinct convention): exact counts next to
    error-bound booleans for both the per-group sketches AND the merged
    union (lgK 12 ⇒ rsd ≈ 1.6%; asserted within 5%) — the key is now
    hash-checkable while still exercising sketch build + merge.
    """
    o = load(spark, sf_dir, "orders")
    per_pri = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").alias("exact_custs"),
    )
    per_bound = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("exact_custs"))
        / F.col("exact_custs")
        < 0.05
    )
    union_est = per_pri.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_all")
    )
    global_exact = o.agg(F.count_distinct("o_custkey").alias("exact_all"))
    all_row = union_est.crossJoin(global_exact).select(
        F.lit("__all__").alias("o_orderpriority"),
        F.col("exact_all").alias("exact_custs"),
        (
            F.abs(F.col("est_all") - F.col("exact_all")) / F.col("exact_all")
            < 0.05
        ).alias("est_within_bounds"),
    )
    return per_pri.select(
        "o_orderpriority", "exact_custs", per_bound.alias("est_within_bounds")
    ).unionByName(all_row)


@query(
    "agg_mode_deterministic",
    oracle="""
SELECT c_mktsegment, modal_nation, n_custs
FROM (
  SELECT c_mktsegment, c_nationkey AS modal_nation, count(*) AS n_custs,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY count(*) DESC, c_nationkey ASC) AS rn
  FROM customer
  GROUP BY c_mktsegment, c_nationkey
)
WHERE rn = 1
""",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group, tie-broken deterministically.

    Built-in mode() is nondeterministic on ties (both in Spark and DuckDB,
    and differently so) — the portable formulation is count + ranking
    window with an explicit tie-break, which also generalizes to top-N
    modes. Two-phase: the groupBy pre-aggregates (map-side combine), the
    window only sees |segments|x|nations| rows.
    """
    c = load(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n_custs").desc(), F.col("c_nationkey").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("modal_nation"),
            "n_custs",
        )
    )


@query(
    "pivot_multi_agg",
    oracle="""
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent_n,
       floor((coalesce(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 0.0))
             * 10000 + 0.5) / 10000 AS urgent_total,
       count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low_n,
       floor((coalesce(sum(o_totalprice) FILTER (WHERE o_orderpriority = '5-LOW'), 0.0))
             * 10000 + 0.5) / 10000 AS low_total
FROM orders
GROUP BY o_orderstatus
""",
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per pivoted value (count + sum):
    Spark names the columns `{value}_{alias}`, so aliases are chosen to
    line up with the oracle's conditional-aggregation formulation. One
    grouped pass, Expand-free (fixed value list keeps it a single agg)."""
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "5-LOW"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("total"),
        )
        .na.fill({"1-URGENT_n": 0, "5-LOW_n": 0, "1-URGENT_total": 0.0, "5-LOW_total": 0.0})
    )
    return piv.select(
        "o_orderstatus",
        F.col("`1-URGENT_n`").alias("urgent_n"),
        r4(F.col("`1-URGENT_total`")).alias("urgent_total"),
        F.col("`5-LOW_n`").alias("low_n"),
        r4(F.col("`5-LOW_total`")).alias("low_total"),
    )
