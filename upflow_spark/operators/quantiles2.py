"""Exact distributed order statistics — applications of the r9 two-phase
rank primitive (operators/rank2.py).

agg_percentile (aggregates.py) uses Spark's exact percentile UDAF (fine
per group, an anti-pattern globally past ~1M distinct values — the r8
theil_sen lesson) and agg_percentile_approx covers the sketch regime.
These keys are the third regime: EXACT global/grouped quantiles computed
scalably — one two-phase global rank pass, a map-side rank filter that
keeps ≤2 rows per requested quantile, and quantile_cont's own
interpolation tree so both engines produce bit-identical values.

No reference implementation exists to cite (/root/reference is empty —
SURVEY §0); the rank-then-select shape is the textbook distributed exact
quantile (terasort-rank lineage, same as rank2 itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.operators.rank2 import global_row_number
from upflow_spark.parity import r4
from upflow_spark.registry import query

QS = (0.25, 0.5, 0.75, 0.9, 0.99)


@query(
    "agg_quantiles_exact_multi",
    oracle=f"""
WITH qc AS (
  SELECT quantile_cont(l_extendedprice, {list(QS)}) AS vs,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem
)
SELECT unnest({list(QS)}) AS q,
       CAST(unnest(generate_series(1, {len(QS)})) AS BIGINT) AS q_idx,
       n AS n_rows,
       floor((unnest(vs)) * 10000 + 0.5) / 10000 AS value
FROM qc
""",
)
def agg_quantiles_exact_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p25/p50/p75/p90/p99 of lineitem extended price in ONE
    two-phase global rank pass: rank2 assigns every row its global rank
    (range shuffle + local sort + broadcast offsets — no single-partition
    stage, no single-reducer percentile UDAF), a map-side filter keeps
    only the ≤2 rows straddling each requested quantile, and the finish
    interpolates with quantile_cont's exact tree
    (lo + (h−⌊h⌋)·(hi−lo), h = 1+(n−1)q) over those ≤10 rows.

    Ties: equal prices make individual ranks arbitrary, but the VALUE at
    every global position is deterministic under any tie permutation —
    exactly what quantiles consume.

    This is the missing third regime beside the grouped exact UDAF
    (agg_percentile, fine per group) and the sketch (agg_percentile_approx,
    the 100 TB default): exact AND distributed, for when the number must
    be right and the relation is one column of the fact table.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v")
    )
    ranked = global_row_number(li, ["v"], out="rn", total_out="n")
    # DuckDB quantile_cont's own index tree, verbatim: RN = (n−1)·q as a
    # double, lo row = floor(RN)+1, hi row = ceil(RN)+1 (1-based),
    # frac = RN − floor(RN). Sharing DuckDB's exact IEEE expression (the
    # r10 advice fix) keeps floor/ceil bit-agreed even when RN is
    # mathematically integral but a ulp off (0.9, 0.99 are not binary-
    # representable) — the previous 1+(n−1)q folded the +1 INTO the float
    # before flooring, a different tree that can straddle different rows.
    rn_of = {q: (F.col("n") - 1).cast("double") * F.lit(q) for q in QS}
    keep = None
    for q in QS:
        cond = (F.col("rn") == F.floor(rn_of[q]) + 1) | (
            F.col("rn") == F.ceil(rn_of[q]) + 1
        )
        keep = cond if keep is None else (keep | cond)
    sel = ranked.filter(keep)  # ≤ 2·len(QS) rows, selected map-side
    quants = spark.range(1).select(
        F.posexplode(F.array(*[F.lit(q) for q in QS])).alias("i", "q")
    )
    rnj = (F.col("n") - 1).cast("double") * F.col("q")
    out = (
        quants.join(
            F.broadcast(sel),
            (F.col("rn") == F.floor(rnj) + 1) | (F.col("rn") == F.ceil(rnj) + 1),
        )
        .groupBy("q", "i")
        .agg(
            F.max("n").alias("n"),
            F.min(F.when(F.col("rn") == F.floor(rnj) + 1, F.col("v"))).alias("lo_v"),
            F.min(F.when(F.col("rn") == F.ceil(rnj) + 1, F.col("v"))).alias("hi_v"),
        )
    )
    rn2 = (F.col("n") - 1).cast("double") * F.col("q")
    frac = rn2 - F.floor(rn2)
    return out.select(
        "q",
        (F.col("i") + 1).cast("long").alias("q_idx"),
        F.col("n").alias("n_rows"),
        r4(F.col("lo_v") + frac * (F.col("hi_v") - F.col("lo_v"))).alias("value"),
    ).orderBy("q_idx")


@query(
    "agg_median_per_group_two_phase",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       floor((quantile_cont(o_totalprice, 0.5)) * 10000 + 0.5) / 10000
         AS median_price
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_median_per_group_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median order value per priority, via rank2's GROUPED two-phase
    rank: 5 priorities over all orders is exactly the low-cardinality-group
    skew wall (a per-group window puts ~n/5 rows in one partition; the
    exact percentile UDAF merges ~n/5 distinct values on one reducer) —
    the grouped range-partition spreads every priority across ALL
    partitions and merges counts through the broadcast offsets relation.

    Median finish = rank average with quantile_cont's tree
    (lo + 0.5·(hi−lo)), the theil_sen r8 lesson applied per group.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_totalprice").alias("v")
    )
    ranked = global_row_number(
        o, ["v"], out="rn", partition_by=["o_orderpriority"], total_out="n"
    )
    lo_r = F.floor((F.col("n") + 1) / 2)
    hi_r = F.floor((F.col("n") + 2) / 2)
    sel = ranked.filter((F.col("rn") == lo_r) | (F.col("rn") == hi_r))
    return (
        sel.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_orders"),
            # lo + 0.5*(hi-lo): quantile_cont's exact IEEE tree (odd n ⇒
            # one selected row ⇒ min==max ⇒ degenerates to lo exactly)
            r4(F.min("v") + 0.5 * (F.max("v") - F.min("v"))).alias(
                "median_price"
            ),
        )
        .select(
            "o_orderpriority",
            F.col("n_orders").cast("long").alias("n_orders"),
            "median_price",
        )
    )
