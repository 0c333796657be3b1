"""Standalone per-key timing with bench.py's exact protocol (one timed cold
run, then best-of-2 warm) for mid-round A/B comparisons.

Usage: python tools/time_keys.py key1 key2 ...   [env SPARK_GRAFT_SF_DIR/CPUS]
Prints one line per key: key cold warm. Same session configuration as
bench.py (UPFLOW_SHUFFLE_PARTITIONS default 8, JIT warm-up keys first).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ.setdefault("UPFLOW_SHUFFLE_PARTITIONS", "8")
    keys = sys.argv[1:]
    if not keys:
        print("usage: time_keys.py key1 [key2 ...]")
        sys.exit(2)

    from upflow_spark import QUERIES
    from upflow_spark.session import get_spark

    spark = get_spark("upflow-time-keys")
    for key in ("agg_groupby", "join_multiway", "win_row_number_topk"):
        try:
            QUERIES[key](spark, sf_dir).collect()
        except Exception:
            pass
    for key in keys:
        fn = QUERIES[key]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        cold = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        print(f"{key} cold={cold:.3f} warm={best:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
