"""SparkSession factory + defensive per-session config.

The driver may hand us a SparkSession it built itself, so every loader calls
:func:`ensure_conf` to apply the runtime-settable SQL configs this engine
depends on (verified runtime-settable on PySpark 4.1.2):

- ``spark.sql.legacy.parquet.nanosAsLong=true`` — ``events.parquet`` stores
  ``ts`` as parquet ``INT64 TIMESTAMP(NANOS)``, which Spark 4.x otherwise
  rejects with ``[PARQUET_TYPE_ILLEGAL]``. With the flag, ``ts`` arrives as
  LongType nanoseconds and is normalized in :mod:`upflow_spark.io`.
- ``spark.sql.session.timeZone=UTC`` — keeps tz-aware expressions (window(),
  date_trunc on instant timestamps) aligned with DuckDB's naive timestamps.

Scale note (100 TB): AQE is left ON (default in 4.x) for skew-join splitting
and post-shuffle coalescing; shuffle partitions are sized via env so the same
code runs local[32] here and 1000-executor clusters unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
}


def ensure_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs; safe to call repeatedly."""
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            # non-settable on this session build; reads will surface the issue
            pass
    return spark


def get_spark(app_name: str = "upflow-spark") -> SparkSession:
    """Local session factory for tests/bench (the driver brings its own)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = os.environ.get("UPFLOW_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        # 24g on the 128 GiB box (r14): the 8g default left ~4g of storage
        # memory, and the 10x scale probe's checkpointed edge relations
        # (486 MiB/partition) thrashed in and out of the cache — evicted
        # localCheckpoint blocks recompute their whole lineage, turning
        # iterative keys' sf1 probes into recompute storms. On a real
        # cluster this is per-executor storage sizing, not driver heap.
        .config("spark.driver.memory", os.environ.get("UPFLOW_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return ensure_conf(builder.getOrCreate())
