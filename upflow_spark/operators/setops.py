"""§2-G set operations / deduplication (SURVEY.md).

Scale notes: union is metadata-only (no shuffle); distinct/intersect/except
shuffle on the full row — at 100 TB prefer pre-aggregated or key-only set ops
(as done here: intersect/except run on projected key columns, not wide rows).
dedup_keep_latest is the deterministic dedup (ranked window); plain
dropDuplicates keeps an arbitrary row and is only safe when projecting the
dedup keys themselves (FIXTURES.md rule 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "set_union_all",
    oracle="""
SELECT event_type, count(*) AS n
FROM (
  SELECT event_type FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT event_type FROM events WHERE value > 50
)
GROUP BY event_type
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two overlapping slices (duplicates preserved)."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("event_type")
    b = ev.filter(F.col("value") > 50).select("event_type")
    return a.unionByName(b).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_union_distinct",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with duplicate elimination."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders GROUP BY o_custkey HAVING count(*) > 8
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two customer-key sets."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    frequent = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 8)
        .select("c_custkey")
    )
    return building.intersect(frequent)


@query(
    "set_except",
    oracle="""
SELECT DISTINCT o_custkey AS c_custkey FROM orders
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): ordering customers minus high-balance ones."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    ordering = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return ordering.exceptAll(rich).distinct()


@query(
    "dedup_exact_rows",
    oracle="SELECT DISTINCT user_id, event_type, floor((value) * 10000 + 0.5) / 10000 AS value FROM events",
)
def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates projecting only the dedup keys (deterministic form)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "user_id", "event_type", r4("value").alias("value")
    ).dropDuplicates(["user_id", "event_type", "value"])


@query(
    "dedup_keep_latest",
    oracle="""
SELECT user_id, event_type, event_id AS latest_event_id, ts AS latest_ts
FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup: keep the latest event per (user_id, event_type)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
        )
    )


@query(
    "set_intersect_all",
    oracle="""
SELECT o_custkey % 200 AS cust_bucket FROM orders WHERE o_orderkey % 2 = 0
INTERSECT ALL
SELECT o_custkey % 200 AS cust_bucket FROM orders WHERE o_orderkey % 2 = 1
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics: each bucket value keeps
    min(count_left, count_right) copies (the DISTINCT variant collapses to
    ≤200 rows; ALL preserves multiplicity, which is what dataset-balance
    arithmetic needs). Spark plans it as a counted left-semi aggregate, not
    a row-pairing join.

    Predicate design (round-4 advisor fix): the two sides are the even/odd
    o_orderkey halves projected to a 200-ary customer bucket — equal
    selectivity, so per-bucket ordering flips by Binomial noise at EVERY
    scale factor. Roughly half the buckets have l>r and half l<r (verified
    sf0.001/0.01/0.1), so min(l,r) genuinely varies; the earlier
    status/totalprice predicates were one-sided for all values (min == left
    everywhere — vacuous). tests/test_ops.py asserts non-vacuity.
    """
    o = load(spark, sf_dir, "orders")
    bkt = (F.col("o_custkey") % 200).alias("cust_bucket")
    left = o.filter(F.col("o_orderkey") % 2 == 0).select(bkt)
    right = o.filter(F.col("o_orderkey") % 2 == 1).select(bkt)
    return left.intersectAll(right)


@query(
    "set_except_all",
    oracle="""
SELECT o_custkey % 200 AS cust_bucket FROM orders WHERE o_orderkey % 2 = 0
EXCEPT ALL
SELECT o_custkey % 200 AS cust_bucket FROM orders WHERE o_orderkey % 2 = 1
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: each value keeps
    max(count_left − count_right, 0) copies.

    Same equal-selectivity parity-split design as set_intersect_all: both
    max(l−r,0) > 0 buckets and clamped-to-0 buckets occur at every scale
    factor, so the multiset subtraction (including the clamp) is genuinely
    exercised — the earlier predicates yielded 0 rows at every fixture SF.
    """
    o = load(spark, sf_dir, "orders")
    bkt = (F.col("o_custkey") % 200).alias("cust_bucket")
    left = o.filter(F.col("o_orderkey") % 2 == 0).select(bkt)
    right = o.filter(F.col("o_orderkey") % 2 == 1).select(bkt)
    return left.exceptAll(right)


@query(
    "set_union_by_name_evolved",
    oracle="""
SELECT entity_id, kind, amount, region_key
FROM (
  SELECT o_orderkey AS entity_id, 'order' AS kind, o_totalprice AS amount,
         NULL AS region_key
  FROM orders WHERE o_orderkey % 1000 = 0
  UNION ALL BY NAME
  SELECT s_suppkey AS entity_id, s_nationkey AS region_key,
         s_acctbal AS amount, 'supplier' AS kind
  FROM supplier WHERE s_suppkey % 10 = 0
)
""",
)
def set_union_by_name_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two sources with DIFFERENT column orders and
    a column one side lacks, merged positionally-safely by NAME with
    null-fill (`unionByName(allowMissingColumns=True)` — the ingestion
    surface every multi-source pipeline needs when schemas drift; plain
    UNION would silently mis-align columns here).

    DuckDB's `UNION ALL BY NAME` is the exact SQL twin, so the key is
    hash-checked including the null-filled column.
    """
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 1000 == 0)
        .select(
            F.col("o_orderkey").alias("entity_id"),
            F.lit("order").alias("kind"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select(
            F.col("s_suppkey").alias("entity_id"),
            F.col("s_nationkey").alias("region_key"),
            F.col("s_acctbal").alias("amount"),
            F.lit("supplier").alias("kind"),
        )
    )
    return o.unionByName(s, allowMissingColumns=True).select(
        "entity_id", "kind", "amount", "region_key"
    )
