"""Remaining engine surfaces: Python UDTF (table function), cached-plan
reuse, and corrupt-record-tolerant ingestion.

UDTF note: Spark 4's Python UDTFs run row-at-a-time in Python — the SLOW
path (no Arrow batching). The key exists to cover the surface; its
deterministic expansion is oracle-verified, and the docstring's guidance
stands: prefer sequence+explode (join_band_bucketed, ts_gapfill_ffill) or
mapInPandas for production row-expansion.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "udtf_installments",
    oracle="""
SELECT o_orderkey, k AS installment_no,
       floor((o_totalprice / 3) * 10000 + 0.5) / 10000 AS amount
FROM (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 100 = 0),
     unnest(range(1, 4)) AS t(k)
""",
)
def udtf_installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF expanding each order into 3 payment installments.

    Covers the UDTF surface (lateral table function registered in SQL).
    Row-at-a-time Python — fine for the sampled slice here; see module
    docstring for the production alternatives.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, installment_no bigint, amount double")
    class Installments:
        def eval(self, o_orderkey: int, o_totalprice: float):  # noqa: ANN201
            for k in (1, 2, 3):
                yield o_orderkey, k, o_totalprice / 3

    spark.udtf.register("upflow_installments", Installments)
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    o.select("o_orderkey", "o_totalprice").createOrReplaceTempView("upflow_inst_src")
    out = spark.sql(
        """
        SELECT i.o_orderkey, i.installment_no, i.amount
        FROM upflow_inst_src s,
             LATERAL upflow_installments(s.o_orderkey, s.o_totalprice) i
        """
    )
    return out.select(
        "o_orderkey", "installment_no", r4(F.col("amount")).alias("amount")
    )


@query(
    "cache_reuse",
    oracle="""
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT 'top' AS slice, count(*) AS n,
       floor((sum(spend)) * 10000 + 0.5) / 10000 AS total
FROM (SELECT spend FROM rev ORDER BY spend DESC, o_custkey ASC LIMIT 100)
UNION ALL
SELECT 'bottom', count(*),
       floor((sum(spend)) * 10000 + 0.5) / 10000
FROM (SELECT spend FROM rev ORDER BY spend ASC, o_custkey ASC LIMIT 100)
""",
)
def cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One expensive intermediate cached, consumed by two branches.

    cache() marks the per-customer aggregate for in-memory reuse so the
    second branch reads the materialized columnar cache instead of
    recomputing the scan+shuffle — the standard fan-out pattern for
    multi-output ETL. (unpersist left to context exit; at scale prefer
    explicit lifecycle or checkpoint for lineage truncation.)
    """
    o = load(spark, sf_dir, "orders")
    rev = (
        o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    ).cache()
    top = (
        rev.orderBy(F.col("spend").desc(), F.col("o_custkey").asc())
        .limit(100)
        .agg(
            F.count(F.lit(1)).alias("n"), r4(F.sum("spend")).alias("total")
        )
        .select(F.lit("top").alias("slice"), "n", "total")
    )
    bottom = (
        rev.orderBy(F.col("spend").asc(), F.col("o_custkey").asc())
        .limit(100)
        .agg(
            F.count(F.lit(1)).alias("n"), r4(F.sum("spend")).alias("total")
        )
        .select(F.lit("bottom").alias("slice"), "n", "total")
    )
    return top.unionByName(bottom)


@query(
    "source_json_corrupt_records",
    oracle="""
SELECT 'good' AS record_class, count(*) AS n FROM events WHERE value > 90
UNION ALL
SELECT 'corrupt', 7
""",
)
def source_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode ingestion: 7 corrupt lines injected among valid JSON;
    bad rows land in _corrupt_record instead of failing the job — the only
    sane posture for 100 TB of third-party text data. Counts of good vs
    corrupt are exact, so even the failure path is oracle-checked.
    """
    import os

    ev = load(spark, sf_dir, "events").filter(F.col("value") > 90)
    out_dir = tempfile.mkdtemp(prefix="upflow_corrupt_")
    path = os.path.join(out_dir, "data")
    # distributed write — the good rows never touch the driver (VERDICT r1
    # item 6: .toPandas() here was a driver OOM at 100×); the 7 corrupt
    # lines are one tiny extra file appended into the same directory
    ev.select("event_id", "user_id", "event_type", "value").write.json(path)
    with open(os.path.join(path, "part-corrupt.json"), "w") as f:
        for i in range(7):
            f.write(f"{{corrupt line {i} not json!!\n")
    schema = (
        "event_id long, user_id long, event_type string, value double, "
        "_corrupt_record string"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    ).cache()  # required: _corrupt_record queries need the raw rows pinned
    good = back.filter(F.col("_corrupt_record").isNull()).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("good").alias("record_class"), "n")
    corrupt = back.filter(F.col("_corrupt_record").isNotNull()).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("corrupt").alias("record_class"), "n")
    return good.unionByName(corrupt)
