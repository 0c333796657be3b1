"""Grouped-map Pandas operator (applyInPandas) — the third and last Python
execution surface (mapInPandas: multimodal, applyInPandasWithState:
streaming state, applyInPandas: per-group batch transforms).

Used only where built-ins genuinely can't express the computation as one
pass; here the per-group logic (z-score against the group's own moments) is
deliberately chosen to ALSO be SQL-expressible so the plumbing itself is
oracle-verified, same policy as the multimodal module.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "grouped_pandas_zscore",
    oracle="""
SELECT c_custkey, c_mktsegment,
       floor(((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
              / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment))
             * 10000 + 0.5) / 10000 AS bal_zscore
FROM customer
""",
)
def grouped_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment z-score of account balance via applyInPandas.

    Scale note: one shuffle on the grouping key, then vectorized pandas per
    group; group sizes must fit an executor (fine for segment-sized groups;
    for giant groups use the window-function formulation in the oracle,
    which streams instead of materializing the group).
    """
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["c_acctbal"].mean()
        std = pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "bal_zscore_raw": (pdf["c_acctbal"] - mean) / std,
            }
        )

    out = c.groupBy("c_mktsegment").applyInPandas(
        zscore, "c_custkey long, c_mktsegment string, bal_zscore_raw double"
    )
    return out.select(
        "c_custkey", "c_mktsegment", r4(F.col("bal_zscore_raw")).alias("bal_zscore")
    )


@query(
    "ts_ewma",
    oracle="""
WITH seq AS (
  SELECT user_id,
         list(value ORDER BY ts, event_id) AS vs,
         list(event_id ORDER BY ts, event_id) AS ids
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id
)
SELECT user_id,
       unnest(ids) AS event_id,
       unnest([
         floor(list_sum([
           vs[j] * CASE WHEN j = 1 THEN pow(0.5, i - 1)
                        ELSE pow(0.5, i - j + 1) END
           for j in range(1, i + 1)
         ]) * 10000 + 0.5) / 10000
         for i in range(1, len(vs) + 1)
       ]) AS ewma
FROM seq
""",
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (alpha=0.5) of purchase
    values, ordered by event time — the streaming-feature primitive behind
    recency-weighted user state.

    applyInPandas: one shuffle on user_id, then a vectorizable per-group
    recurrence (inherently sequential within a key, embarrassingly parallel
    across keys — exactly the applyInPandas sweet spot). alpha=0.5 keeps
    every weight an exact power of two, so Spark and the oracle's expanded
    power-sum agree bit-for-bit when both fold left-to-right.

    Scale: per-group state is one float; group size = one user's history
    (bounded); for unbounded keys use applyInPandasWithState
    (stream_custom_state) instead.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "value")
    )

    # grouping directly on user_id means one Arrow round-trip per user —
    # ~2 ms fixed cost x thousands of tiny groups dominates. Shuffle on a
    # coarse salt (user_id % 64) instead and run ONE flat segmented scan per
    # batch: sort by (user_id, ts, event_id), reset the accumulator at each
    # user boundary. Same per-user fold order — the recurrence
    # acc_i = 0.5*acc_{i-1} + 0.5*x_i stays BIT-IDENTICAL to the oracle's
    # expanded left-to-right power sum (every weight is an exact power of
    # two, so halving commutes exactly with IEEE-754 rounding) — but with
    # zero per-group pandas overhead (the r4 per-user groupby + concat built
    # thousands of tiny DataFrames per batch; VERDICT r4 item 8 measured its
    # compute ratio at 2.5x per 10x data from exactly that constant).
    def ewma_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        users = pdf["user_id"].to_numpy()
        xs = pdf["value"].to_numpy()
        out = np.empty(len(xs), dtype=np.float64)
        prev_user, acc = None, 0.0
        for i in range(len(xs)):
            if users[i] != prev_user:
                acc, prev_user = xs[i], users[i]
            else:
                acc = 0.5 * acc + 0.5 * xs[i]
            out[i] = acc
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "ewma_raw": out}
        )

    out = ev.withColumn("salt", F.col("user_id") % 64).groupBy("salt").applyInPandas(
        ewma_batch, "user_id long, event_id long, ewma_raw double"
    )
    return out.select("user_id", "event_id", r4("ewma_raw").alias("ewma"))


@query(
    "agg_pandas_udaf_trimmed_mean",
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)
           AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(CASE WHEN rn > n // 10 AND rn <= n - n // 10 THEN 1 END)
            AS BIGINT) AS n_kept,
       floor((sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                       THEN cents END)
              / (100.0 * count(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                                    THEN 1 END)))
             * 10000 + 0.5) / 10000 AS trimmed_avg_acctbal
FROM ranked GROUP BY c_mktsegment
""",
)
def agg_pandas_udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (VERDICT r10 item 8) — the sixth and last
    Arrow execution surface (SURVEY §2 Arrow-surface map): a vectorized
    user-defined AGGREGATE, Series → scalar per group, used for a 10%
    two-sided trimmed mean of account balance per market segment — the
    robust-statistics aggregate SQL has no built-in for.

    Float-parity discipline: the UDF sums exact INTEGER CENTS of the
    sorted middle slice (np.round lands exactly — the stored doubles sit
    within 1e-9 of their 2dp decimals, so no half-way cases) and divides
    once, which the oracle mirrors with the same integer-cents window
    restatement: the sum of an integer multiset is order-independent, so
    engine accumulation order cannot drift the hash at any sf.

    Scale: one shuffle on the grouping key (partial aggregation does not
    apply to order statistics — the trim NEEDS the whole group, exactly
    like percentile_exact); Arrow-batched transfer, one scalar back per
    group. For groups too large for one executor the fan-out rewrite in
    the oracle (rank window + conditional sum) IS the scale path — this
    key grades the UDAF surface itself against it.
    """
    import numpy as np

    c = load(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")

    @F.pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        cents = np.round(v.to_numpy(np.float64) * 100.0).astype(np.int64)
        cents.sort()
        k = len(cents) // 10
        kept = cents[k : len(cents) - k]
        return float(kept.sum()) / (100.0 * len(kept))

    # Spark disallows mixing a GROUPED_AGG pandas UDF with native
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — counts ride
    # a native agg and rejoin on the 5-segment key (broadcast-sized)
    counts = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.count(F.lit(1)) - 2 * F.floor(F.count(F.lit(1)) / 10)).alias("n_kept"),
    )
    trimmed = c.groupBy("c_mktsegment").agg(
        trimmed_mean(F.col("c_acctbal")).alias("raw")
    )
    return counts.join(F.broadcast(trimmed), "c_mktsegment").select(
        "c_mktsegment",
        "n_customers",
        "n_kept",
        r4(F.col("raw")).alias("trimmed_avg_acctbal"),
    )
