"""Vanilla-PySpark headline baseline: hand-written queries, local[4],
shuffle.partitions=8, UTC, AQE default. Protocol identical to bench.py:
global JIT warm-up, then per query one untimed warm + best-of-2 timed.
Query definitions live in tools/vanilla_twins.py (shared with bench.py's
interleaved same-session ratio measurement)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from tools.vanilla_twins import VANILLA_BUILDERS  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

for f in VANILLA_BUILDERS.values():  # global JIT warm-up
    f(spark, SF).collect()
out = {}
for name, f in VANILLA_BUILDERS.items():
    f(spark, SF).collect()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        f(spark, SF).collect()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print(out)
spark.stop()
