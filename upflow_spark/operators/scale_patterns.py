"""Scale-pattern operators: the 100 TB techniques as first-class, verified
keys — skew salting, SQL-surface parity, bucketed-time band joins.

These exist so the scale paths are not just docstring claims: each pattern
produces results hash-identical to its naive formulation's oracle, proving
the rewrite is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query

N_SALTS = 8


@query(
    "join_skew_salted",
    oracle="""
SELECT e.event_type,
       count(*) AS n_events,
       floor((sum(e.value)) * 10000 + 0.5) / 10000 AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY e.event_type
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join, hash-identical to the plain join's oracle.

    Pattern: the build side is replicated N_SALTS× with an explicit salt
    column; the probe side gets a random-in-[0,N) salt; the join key becomes
    (key, salt) so one hot key spreads over N_SALTS reducers instead of one
    straggler task. Salting must never change results — the oracle IS the
    unsalted join, which is exactly the point of the key.

    (AQE's skew-join split handles moderate skew automatically; explicit
    salting is for the catastrophic single-key case AQE can't split, e.g.
    null-key floods or one user with 10% of all events.)
    """
    ev = load(spark, sf_dir, "events").withColumn(
        "salt", (F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS))).cast("int")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .select("c_custkey")
        .crossJoin(F.broadcast(spark.range(N_SALTS).select(F.col("id").cast("int").alias("salt"))))
    )
    return (
        ev.join(cust, (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt), "inner")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("sum_value"),
        )
    )


@query(
    "sql_surface_q1",
    oracle="""
SELECT l_returnflag, l_linestatus,
       floor((sum(l_quantity)) * 10000 + 0.5) / 10000 AS sum_qty,
       floor((sum(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000 AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def sql_surface_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text entry point (EP2): same Q1 shape submitted as SQL over
    registered views — proves both surfaces share one analyzer/optimizer."""
    from upflow_spark.sql_api import sql

    return sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               floor(sum(l_quantity) * 10000 + 0.5) / 10000 AS sum_qty,
               floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000 AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
    )


@query(
    "join_band_bucketed",
    oracle="""
SELECT a.user_id, count(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL 60 SECOND
GROUP BY a.user_id
""",
)
def join_band_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed band self-join — the scale rewrite of join_theta_range,
    verified against the SAME oracle.

    Each event joins within (user_id, 60s-bucket) ∪ (user_id, next bucket):
    the left side is duplicated into its own bucket and the preceding one so
    every ≤60s pair co-locates in exactly one bucket pairing. Join key
    becomes (user_id, bucket) — per-task fanout is bounded by bucket
    population, not per-user history. The residual predicate restores
    exactness; dedup is unnecessary because each (a,b) pair meets in exactly
    one bucket (b's own).
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    bucket = F.expr("unix_micros(cast(ts as timestamp)) div 60000000")
    b = ev.withColumn("bucket", bucket)
    # a-side appears under its own bucket and the NEXT one, so any b within
    # +60s (same or next bucket) finds a in b's bucket
    a_same = ev.withColumn("bucket", bucket)
    a_next = ev.withColumn("bucket", bucket + 1)
    a = a_same.unionByName(a_next).select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
        F.col("bucket").alias("a_bucket"),
    )
    return (
        a.join(
            b,
            (F.col("a_user") == F.col("user_id"))
            & (F.col("a_bucket") == F.col("bucket"))
            & (F.col("a_id") < F.col("event_id"))
            & (F.col("ts") >= F.col("a_ts"))
            & (F.col("ts") <= F.col("a_ts") + F.expr("INTERVAL 60 SECONDS")),
        )
        .groupBy(F.col("a_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "agg_skew_two_stage",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       floor((sum(value)) * 10000 + 0.5) / 10000 AS sum_value
FROM events
GROUP BY event_type
""",
)
def agg_skew_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage (salted) aggregation, hash-identical to the plain groupBy.

    For hot grouping keys (5 event types over billions of rows) a single
    hash-agg reduces each key on ONE task. Stage 1 groups by (key, salt) —
    N_SALTS-way parallel partial reduction; stage 2 merges the partials per
    key. Spark's map-side partial aggregation usually makes this implicit,
    but the explicit form is needed when partial agg is defeated (e.g.
    count-distinct rewrites, high-cardinality maps in state).
    """
    ev = load(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)).cast("int")
    )
    partial = ev.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("psum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        r4(F.sum("psum")).alias("sum_value"),
    )


@query(
    "join_bloom_runtime_filter",
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_items,
       floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 10000 + 0.5) / 10000
         AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 200000
GROUP BY o.o_orderpriority
""",
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim-filtered fact join with a runtime Bloom filter injected
    on the fact side.

    At 100 TB the win is pre-shuffle row pruning: the filtered orders side
    builds a Bloom filter over o_orderkey; Catalyst injects might_contain()
    into the lineitem scan branch, so non-matching fact rows die BEFORE the
    exchange instead of after it (semi-join reduction). Spark gates the
    rewrite on a 10 GB application-side scan, so at fixture scale we lower
    the threshold for the demo; production keeps the default and the filter
    fires exactly where it pays. tests/test_plans.py asserts might_contain
    is present in the optimized plan.
    """
    conf = spark.conf
    # At fixture scale two size heuristics veto the rewrite that 100 TB would
    # trigger naturally: the 10 GB application-side floor, and "creation side
    # is broadcastable, so there is no shuffle to prune". Open both for the
    # demo window; restore after.
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1b",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: conf.get(k) for k in keys}
    for k, v in keys.items():
        conf.set(k, v)
    try:
        o = load(spark, sf_dir, "orders").filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 200000)
        )
        li = load(spark, sf_dir, "lineitem")
        df = (
            li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                r4(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                ).alias("revenue"),
            )
        )
        # materialize the optimized plan while the conf window is open —
        # QueryExecution memoizes it, so later execution keeps the filter
        df._jdf.queryExecution().optimizedPlan()
        return df
    finally:
        for k, v in prev.items():
            conf.set(k, v)
