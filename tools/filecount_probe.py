"""File-count scale probe for the table-format family (VERDICT r11 item 8).

The snapshot/MOR/partition-evolution keys are metadata-bound by design; the
r11 SCALE probes scaled ROWS 10x. This probe scales FILE COUNTS instead:
the same orders relation is laid out as 1x / 10x / 100x as many bucket
files (8 -> 80 -> 800), a manifest chain is committed over each layout,
and a version-2 incremental read touching a FIXED 4 buckets is timed two
ways:

  * root-listing read: spark.read.parquet(root) + broadcast (gen, bucket)
    semi-join — partition pruning happens AFTER the driver lists every
    file (the listing tax real lakes pay without a manifest);
  * manifest-scoped read: the manifest selection is turned into the exact
    bucket directory paths and ONLY those are handed to the reader — the
    O(touched) path the upflow manifest discipline promises.

Rows go under SCALE.md's preserved ANALYSIS section (this tool prints a
markdown table; paste/append it — it does NOT rewrite SCALE.md).

Run: python tools/filecount_probe.py   (serial — no other Spark JVMs)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/upflow_fcprobe"
TOUCH = 4  # buckets touched by the v2 commit (fixed across scales)


def build(spark, scale: int) -> tuple[str, str]:
    from pyspark.sql import functions as F

    from upflow_spark.io import load

    base = f"{ROOT}/s{scale}"
    data = base + "/data"
    man = base + "/manifest"
    if os.path.exists(base + "/_DONE"):
        return data, man
    shutil.rmtree(base, ignore_errors=True)
    o = load(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]
    nb = 8 * scale
    step = (mx + nb) // nb
    v1 = o.withColumn(
        "bucket", F.floor(F.col("o_orderkey") / F.lit(int(step))).cast("int")
    )
    # one file per bucket: repartition on the partition column first
    v1.repartition(nb, "bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(data + "/gen=1")
    touched = list(range(TOUCH))  # first TOUCH buckets get a v2 rewrite
    v2 = v1.filter(F.col("bucket").isin(touched)).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    v2.repartition(TOUCH, "bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(data + "/gen=2")
    g1 = spark.read.parquet(data + "/gen=1").select("bucket").distinct()
    g2 = spark.read.parquet(data + "/gen=2").select("bucket").distinct()
    m1 = g1.select(F.lit(1).alias("version"), F.lit(1).alias("gen"), "bucket")
    carried = g1.join(g2, "bucket", "left_anti").select(
        F.lit(2).alias("version"), F.lit(1).alias("gen"), "bucket"
    )
    m2 = g2.select(F.lit(2).alias("version"), F.lit(2).alias("gen"), "bucket")
    m1.unionByName(carried).unionByName(m2).coalesce(1).write.mode(
        "overwrite"
    ).parquet(man)
    open(base + "/_DONE", "w").write("ok")
    return data, man


def n_files(path: str) -> int:
    c = 0
    for _, _, files in os.walk(path):
        c += sum(1 for f in files if f.endswith(".parquet"))
    return c


def dir_bytes(path: str) -> int:
    c = 0
    for dp, _, files in os.walk(path):
        c += sum(os.path.getsize(os.path.join(dp, f)) for f in files)
    return c


def timed(fn) -> tuple[float, object]:
    t0 = time.perf_counter()
    r = fn()
    return time.perf_counter() - t0, r


def main() -> None:
    from pyspark.sql import functions as F

    from upflow_spark.session import get_spark

    spark = get_spark("upflow-filecount-probe")
    print("| files scale | data files | manifest rows | manifest bytes |"
          " touched files | root-listing read s | manifest-scoped read s |")
    print("|---|---|---|---|---|---|---|")
    for scale in (1, 10, 100):
        data, man = build(spark, scale)
        nf = n_files(data)
        mrows = spark.read.parquet(man).count()
        mbytes = dir_bytes(man)

        def root_read():
            m = spark.read.parquet(man)
            sel = m.filter(F.col("version") == 2).filter(
                F.col("gen") == 2
            ).select("gen", "bucket")
            d = spark.read.parquet(data)
            return (
                d.join(F.broadcast(sel), ["gen", "bucket"], "semi")
                .agg(F.count(F.lit(1)), F.sum("o_totalprice"))
                .collect()
            )

        def scoped_read():
            m = spark.read.parquet(man)
            sel = m.filter(F.col("version") == 2).filter(
                F.col("gen") == 2
            ).collect()  # bounded: TOUCH rows
            paths = [f"{data}/gen={r['gen']}/bucket={r['bucket']}" for r in sel]
            return (
                spark.read.parquet(*paths)
                .agg(F.count(F.lit(1)), F.sum("o_totalprice"))
                .collect()
            )

        # warm both paths once (JIT/listing caches), time the 2nd run
        root_read(); scoped_read()
        t_root, _ = timed(root_read)
        t_scoped, _ = timed(scoped_read)
        tf = sum(
            n_files(f"{data}/gen=2/bucket={b}") for b in range(TOUCH)
        )
        print(
            f"| {scale}x ({8 * scale} buckets) | {nf} | {mrows} |"
            f" {mbytes} | {tf} | {t_root:.3f} | {t_scoped:.3f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
