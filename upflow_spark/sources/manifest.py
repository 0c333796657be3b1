"""Manifest-driven file pruning — the table-format metadata layer (§2-P).

Iceberg/Delta's core read-side idea with no format dependency (neither is
installable in this container — see streaming/stateful.py's ACID probe):
a manifest table stores per-file key ranges; the planner consults the
manifest FIRST and hands the engine only the files whose [min,max] can
contain matching rows. At 100 TB this is the difference between listing +
footer-reading a million files and reading one small manifest parquet.

The key materializes the whole cycle: bucketed write → manifest build →
manifest-pruned read → aggregate, with the pruning decision itself
(n_buckets_scanned) part of the oracle-checked output.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import R4, r4
from upflow_spark.registry import query

N_BUCKETS = 8


@query(
    "scan_manifest_pruned",
    oracle=f"""
WITH m AS (SELECT max(o_orderkey) AS mx FROM orders),
b AS (
  SELECT floor(o_orderkey / floor((mx + {N_BUCKETS}.0) / {N_BUCKETS})) AS bucket,
         o_orderkey, o_totalprice, floor(mx / 5.0) AS hi
  FROM orders, m
),
man AS (
  SELECT bucket, min(o_orderkey) AS mn, max(o_orderkey) AS mxk
  FROM b GROUP BY bucket
),
sel AS (
  SELECT man.bucket FROM man, (SELECT floor(mx / 5.0) AS hi FROM m) q
  WHERE man.mn <= q.hi AND man.mxk >= 0
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM man) AS n_buckets_total,
       (SELECT CAST(count(*) AS BIGINT) FROM sel) AS n_buckets_scanned,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(o_orderkey) AS min_orderkey,
       max(o_orderkey) AS max_orderkey,
       {R4("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")} AS revenue
FROM b JOIN sel ON b.bucket = sel.bucket
WHERE o_orderkey >= 0 AND o_orderkey <= hi
""",
)
def scan_manifest_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range query `o_orderkey ∈ [0, max/5]` answered through a manifest:
    orders are written into {N_BUCKETS} contiguous key buckets, a manifest
    parquet records each bucket's [min,max] orderkey, and the read consults
    ONLY the manifest to decide which bucket directories to scan (2 of 8 at
    every sf). Output includes the pruning decision (n_buckets_scanned) so
    the oracle verifies the metadata layer, not just the data.

    Driver-side state: the ≤{N_BUCKETS}-row manifest selection (a planner
    decision, bounded by bucket count — never by data) and one max()
    scalar. The pruned read hands Spark only the selected directories, so
    the untouched 6/8 of the data is never listed, opened, or scanned.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]
    step = int((mx + N_BUCKETS) // N_BUCKETS)
    hi = int(mx // 5)
    base = tempfile.mkdtemp(prefix="upflow_manifest_") + "/orders"
    o.withColumn("bucket", F.floor(F.col("o_orderkey") / F.lit(step))).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(base)
    # manifest build: per-bucket key ranges, persisted as the metadata table
    written = spark.read.parquet(base)
    man_path = base + "_manifest"
    written.groupBy("bucket").agg(
        F.min("o_orderkey").alias("mn"), F.max("o_orderkey").alias("mxk")
    ).write.mode("overwrite").parquet(man_path)
    # manifest-pruned planning: read the manifest, select buckets whose range
    # intersects [0, hi]; collect is bounded by N_BUCKETS rows by construction
    man = spark.read.parquet(man_path)
    sel = [
        r["bucket"]
        for r in man.filter((F.col("mn") <= hi) & (F.col("mxk") >= 0)).collect()
    ]
    n_total = man.count()
    pruned = spark.read.option("basePath", base).parquet(
        *[f"{base}/bucket={b}" for b in sorted(sel)]
    )
    return (
        pruned.filter((F.col("o_orderkey") >= 0) & (F.col("o_orderkey") <= hi))
        .agg(
            F.lit(n_total).cast("long").alias("n_buckets_total"),
            F.lit(len(sel)).cast("long").alias("n_buckets_scanned"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_orderkey"),
            F.max("o_orderkey").alias("max_orderkey"),
            r4(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            ).alias("revenue"),
        )
    )


@query(
    "scan_file_metadata",
    oracle="""
SELECT 'lineitem.parquet' AS file_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
FROM lineitem
GROUP BY file_name
""",
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file statistics via Spark's hidden file-metadata column
    (`_metadata.file_path`, populated by the scan itself — no extra I/O, no
    join against a listing): row counts and key ranges grouped by source
    file — the primitive a manifest builder (scan_manifest_pruned) or a
    small-file-compaction planner (sink_compaction) runs first.

    Oracle note: the driver's DuckDB side sees registered VIEWS, not file
    paths, so the oracle pins the fixture's deterministic basename as a
    literal — the compare still verifies that Spark's _metadata-derived
    name resolves to exactly that file and that its per-file stats are the
    table's. Grouping keys on file identity, which is bounded by file
    count, not rows.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.regexp_extract(F.col("_metadata.file_path"), "([^/]+)$", 1).alias(
                "file_name"
            ),
            "l_orderkey",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
        )
    )
