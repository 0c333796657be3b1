"""DPP file-count-scaling probe (VERDICT r10 item 9).

The r10 SCALE table re-ran scan_manifest_pruned at 10x DATA; this probe
holds data constant (sf0.1 orders) and scales the FILE COUNT 10x
(8 -> 80 bucket directories) to show the manifest-selection DPP prune
keeps files-read proportional to predicate selectivity as the table
fragments — the property that matters at 100 TB, where file counts grow
far faster than per-file sizes.

Method: for each bucket count B, write orders into B contiguous key
buckets, build the per-bucket [min,max] manifest, run the SAME range
query (o_orderkey <= max/5) through the relational DPP prune
(broadcast manifest-selection semi-join on the partition column), and
record: buckets selected/total, ACTUAL distinct files read
(_metadata.file_path on the pruned relation — ground truth, not intent),
and warm wall-clock.

Run serial (timing hygiene): python tools/dpp_probe.py
Output: one markdown table on stdout — paste into SCALE.md's analysis
section.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def probe(spark, n_buckets: int):
    import tempfile

    from upflow_spark.io import load

    o = load(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]
    step = int((mx + n_buckets) // n_buckets)
    hi = int(mx // 5)
    base = os.path.join(
        tempfile.gettempdir(), f"upflow_dpp_probe_{n_buckets}"
    )
    o.withColumn("bucket", F.floor(F.col("o_orderkey") / F.lit(step))).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(base)
    man = (
        spark.read.parquet(base)
        .groupBy("bucket")
        .agg(F.min("o_orderkey").alias("mn"), F.max("o_orderkey").alias("mxk"))
    )
    man.write.mode("overwrite").parquet(base + "_manifest")
    man = spark.read.parquet(base + "_manifest")
    sel = man.filter((F.col("mn") <= hi) & (F.col("mxk") >= 0)).select("bucket")

    def run():
        # materialize the metadata column BEFORE the join (it is only
        # resolvable directly on the scan relation)
        scan = spark.read.parquet(base).select(
            "bucket", "o_orderkey", F.col("_metadata.file_path").alias("__file")
        )
        pruned = scan.join(F.broadcast(sel), "bucket", "semi")
        return pruned.filter(
            (F.col("o_orderkey") >= 0) & (F.col("o_orderkey") <= hi)
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(F.col("__file")).alias("files_read"),
        ).collect()[0]

    run()  # warm
    t0 = time.perf_counter()
    r = run()
    dt = time.perf_counter() - t0
    total_files = (
        spark.read.parquet(base)
        .select(F.col("_metadata.file_path").alias("__file"))
        .agg(F.countDistinct(F.col("__file")))
        .collect()[0][0]
    )
    n_sel = sel.count()
    return {
        "buckets": n_buckets,
        "selected": n_sel,
        "files_read": r["files_read"],
        "files_total": total_files,
        "rows": r["n_rows"],
        "sec": dt,
    }


def main() -> None:
    from upflow_spark.session import get_spark

    spark = get_spark("upflow-dpp-probe")
    rows = [probe(spark, b) for b in (8, 80)]
    print("| buckets | selected | files read / total | frac read | rows | warm s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        frac = r["files_read"] / r["files_total"]
        print(
            f"| {r['buckets']} | {r['selected']} |"
            f" {r['files_read']} / {r['files_total']} | {frac:.2f} |"
            f" {r['rows']} | {r['sec']:.3f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
