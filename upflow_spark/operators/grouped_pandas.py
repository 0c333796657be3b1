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
