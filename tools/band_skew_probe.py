"""Banded-join skew probe (r10 — closes VERDICT r9 item 4).

The banded dedup family (simhash bands, MinHashLSH buckets) was claimed
skew-safe by construction — broadcast build side keeps parallelism at the
stream side's partitioning, "AQE skew-split takes over at open
vocabulary" — but that was never MEASURED. This probe grounds it on the
native sf0.1 fixture, whose templated docs already produce a band far
hotter than the verdict's 30% hypothetical (one simhash band value covers
~68% of documents at every sf):

1. hot-bucket shares of each family's band/bucket table;
2. per-partition WORK BALANCE of the scored candidate stream (the
   pre-filter pre-distinct join output = the actual per-task work):
   max/mean candidate count across partitions. ~1.0 means the hot band's
   work spreads evenly (broadcast join: every stream row joins locally,
   and hot-band rows are round-robin-spread by the repartition);
3. wall time of the broadcast plan vs the shuffle-equi-join variant with
   AQE (the open-vocabulary fallback) — and whether AQE actually
   skew-splits it (skew=true markers in the executed plan).

Run: python tools/band_skew_probe.py   (serial — no other Spark jobs)
Prints markdown rows for SCALE.md's preserved analysis section.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(df) -> tuple[float, str]:
    """(wall seconds, executed AQE-final plan string) for a compute-forcing
    aggregate over df. The plan must come from the DataFrame that actually
    RAN — an unexecuted AdaptiveSparkPlan hasn't decided skew-splits yet."""
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.concat_ws(":", *df.columns))).alias("h"),
    )
    t0 = time.perf_counter()
    agg.collect()
    dt = time.perf_counter() - t0
    return dt, agg._jdf.queryExecution().executedPlan().toString()


def _balance(df):
    per = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in per]
    mean = sum(counts) / len(counts)
    return max(counts) / mean, len(counts), sum(counts)


def main() -> None:
    from upflow_spark.io import load
    from upflow_spark.pipeline.dedup import (
        dedup_simhash,
        minhash_scored_candidates,
        simhash_scored_candidates,
    )
    from upflow_spark.session import get_spark

    spark = get_spark("upflow-band-skew")
    n_docs = load(spark, SF, "documents").count()

    # --- hot-bucket shares -------------------------------------------------
    sig = dedup_simhash(spark, SF).select(
        F.conv("simhash", 2, 10).cast("long").alias("sig")
    )
    bands = sig.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftright("sig", 8 * i).bitwiseAND(F.lit(255)).alias("bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b")
    ).select("b.bi", "b.bv")
    top = (
        bands.groupBy("bi", "bv").count().orderBy(F.desc("count")).limit(1).collect()
    )[0]
    print(
        f"simhash hot band: (band {top['bi']}, val {top['bv']}) covers "
        f"{top['count']}/{n_docs} docs = {100 * top['count'] / n_docs:.0f}%"
    )

    print("\n| key | variant | wall s | partitions | candidates | max/mean work |")
    print("|---|---|---|---|---|---|")
    for name, fn in (
        ("simhash banded", simhash_scored_candidates),
        ("minhash LSH", minhash_scored_candidates),
    ):
        # broadcast build (the shipped plan): warm once, then time + balance
        _timed(fn(spark, SF))
        tb, _ = _timed(fn(spark, SF))
        ratio, nparts, ncand = _balance(fn(spark, SF))
        print(
            f"| {name} | broadcast build | {tb:.2f} | {nparts} | {ncand} "
            f"| {ratio:.2f}x |"
        )
        # shuffle-equi-join variant (the open-vocabulary fallback): force a
        # real sort-merge join (no auto-broadcast), default AQE thresholds
        saved = {
            "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
                "spark.sql.autoBroadcastJoinThreshold"
            ),
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": spark.conf.get(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
            ),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": spark.conf.get(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes"
            ),
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": spark.conf.get(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
            ),
        }
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            ts, plan = _timed(fn(spark, SF, broadcast_build=False))
            skewed = "skew=true" in plan or "isSkewJoin=true" in plan
            print(
                f"| {name} | forced SMJ + AQE defaults | {ts:.2f} | — | {ncand} "
                f"| AQE skew-split: {'YES' if skewed else 'no'} |"
            )
            # fixture band tables are ~500 KB total — far below the 256 MB
            # default skew threshold. Scale the thresholds DOWN to the same
            # proportion a 100 TB corpus would scale its partitions UP past
            # the default (hot partition ≈ 60% of table bytes either way),
            # to show the split engages in the regime it exists for.
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20k"
            )
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20k")
            spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            ts2, plan = _timed(fn(spark, SF, broadcast_build=False))
            skewed = "skew=true" in plan or "isSkewJoin=true" in plan
            print(
                f"| {name} | forced SMJ + scaled skew thresholds | {ts2:.2f} | — "
                f"| {ncand} | AQE skew-split: {'YES' if skewed else 'no'} |"
            )
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
    spark.stop()


if __name__ == "__main__":
    main()
