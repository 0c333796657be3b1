"""§2-A sink operators (SURVEY.md) — rows-only keys.

Both sinks write under a fresh tempdir per invocation (the fixtures are
read-only). Rows-only because the interesting property — written data reads
back identically / partition pruning works — is asserted by re-reading and
returning verifiable counts, not by SQL-expressible values.

Scale notes: parquet is the only sane sink format at 100 TB (columnar,
splittable, stats for pruning). partitionBy on a low-cardinality column
(event_type: 5 values) gives partition-pruned reads; never partitionBy a
high-cardinality key (file-per-value explosion) — bucket instead.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.registry import query


@query("sink_parquet_roundtrip")
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write filtered orders to parquet, read back, prove count identity."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    out = tempfile.mkdtemp(prefix="upflow_sink_rt_") + "/orders"
    o.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    n_written = o.count()
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(n_written).alias("n_expected"),
        F.min("o_orderkey").alias("min_orderkey"),
        F.max("o_orderkey").alias("max_orderkey"),
    )


@query("sink_partitioned")
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events partitioned by event_type; read ONE partition back.

    The re-read filter on the partition column prunes directories (no scan of
    the other 4/5 of the data) — the same mechanism that makes date-partitioned
    100 TB tables queryable.
    """
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    out = tempfile.mkdtemp(prefix="upflow_sink_part_") + "/events"
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
    )
