"""Skew-stressed fixture probe (r9 — closes VERDICT r8 gap #5).

Every per-language window and salted pattern was previously exercised only
on a near-uniform corpus (5 balanced languages, ~uniform user activity),
so the skew mitigations were tested for correctness but never for their
actual purpose. This probe builds a SAME-SIZE replica of sf0.1 where

- one language carries ~68% of documents (lang := 'en' for doc_id%10<6,
  plus the original ~1/5 share of the rest), and
- one user_id carries 10% of events (user_id := hot for event_id%10==0;
  the hot id is an existing customer key so join semantics survive),

then times skew-sensitive keys against a LAYOUT-MATCHED CONTROL replica
(the identical Spark rewrite with the skew transformations disabled —
comparing against the raw sf0.1 files confounds skew with the rewrite's
different part-file split count: measured agg_skew_two_stage "3.5x" vs
raw that is 1.0x vs the control). Warm, compute-forced, best-of-2 — the
scale_test.py protocol. Row counts identical, so t_skew / t_control
isolates the skew response: ~1.0 means the plan spreads the hot key;
>>1 means a straggler task.

Run: python tools/skew_test.py   (builds /tmp/upflow_skew{,_ctrl} once,
prints a markdown table to paste under SCALE.md's preserved marker)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SKEW = "/tmp/upflow_skew"
CTRL = "/tmp/upflow_skew_ctrl"
HOT_USER = 1  # c_custkey 1 exists at every sf

# (key, why it is skew-sensitive)
PROBE_KEYS = [
    ("curation_lang_balance", "grouped two-phase rank; hot lang = 68% of docs"),
    ("curation_perplexity_buckets", "grouped two-phase ntile over the hot lang"),
    ("sample_topk_hashrank", "two-level per-lang top-k prune under hot lang"),
    ("curation_dsir_weights", "global two-phase keep-rank (lang-agnostic control)"),
    ("sample_systematic_every_k", "global two-phase row_number (control)"),
    ("text_lang_stats", "plain per-lang aggregate under hot lang"),
    ("join_skew_salted", "salted events⋈customer join; hot user = 10% of events"),
    ("agg_skew_two_stage", "salted two-stage aggregate over events"),
    ("sessionize_gap", "per-user window — the hot user IS one partition"),
    ("events_attribution_last_touch", "per-user window under the hot user"),
    ("dedup_keep_latest", "per-key keep-rule window over skewed user keys"),
]


def build_replica(spark, base: str, skewed: bool) -> None:
    from upflow_spark.io import TABLES, load

    os.makedirs(base, exist_ok=True)
    for t in TABLES:
        dst = f"{base}/{t}.parquet"
        if os.path.exists(dst):
            continue
        if t == "documents":
            d = load(spark, SF01, t)
            if skewed:
                d = d.withColumn(
                    "lang",
                    F.when(
                        F.pmod("doc_id", F.lit(10)) < 6, F.lit("en")
                    ).otherwise(F.col("lang")),
                )
            d.write.mode("overwrite").parquet(dst)
        elif t == "events":
            e = load(spark, SF01, t)
            if skewed:
                e = e.withColumn(
                    "user_id",
                    F.when(
                        F.pmod("event_id", F.lit(10)) == 0, F.lit(HOT_USER)
                    ).otherwise(F.col("user_id")),
                )
            # write back raw ns so the dir round-trips through load()
            e.drop("ts").withColumnRenamed("ts_ns", "ts").write.mode(
                "overwrite"
            ).parquet(dst)
        else:
            # untouched tables: byte-copy preserves the exact layout
            src = f"{SF01}/{t}.parquet"
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
        print(f"built {dst}", flush=True)


def _force_compute(df) -> None:
    from pyspark.sql.utils import AnalysisException

    try:
        df.select(F.xxhash64(F.struct(*df.columns)).alias("h")).agg(
            F.bit_xor("h")
        ).collect()
    except AnalysisException:
        df.agg(*[F.count(c).alias(f"c{i}") for i, c in enumerate(df.columns)]).collect()


def time_key(spark, key: str, sf_dir: str) -> float:
    from upflow_spark import QUERIES

    _force_compute(QUERIES[key](spark, sf_dir))  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _force_compute(QUERIES[key](spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from upflow_spark.session import get_spark

    spark = get_spark("upflow-skew")
    build_replica(spark, CTRL, skewed=False)
    build_replica(spark, SKEW, skewed=True)
    print("| key | skew pressure | control s | skewed s | skew ratio |")
    print("|---|---|---|---|---|")
    for key, why in PROBE_KEYS:
        tu = time_key(spark, key, CTRL)
        ts = time_key(spark, key, SKEW)
        print(
            f"| {key} | {why} | {tu:.3f} | {ts:.3f} | {ts / tu:.2f}x |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
