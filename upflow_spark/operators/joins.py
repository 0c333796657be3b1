"""§2-C join operators (SURVEY.md).

Join strategy is chosen deliberately per key and noted inline:

- dimension joins broadcast explicitly (`F.broadcast`) — at 100 TB the fact
  side never shuffles for a 25-row nation table;
- fact-fact equi joins rely on shuffle (sort-merge / shuffled-hash picked by
  Catalyst + AQE, incl. runtime skew-split);
- the non-equi family (theta/interval/as-of) always carries an EQUI component
  (user_id) so Spark plans a shuffled join with a residual range predicate
  instead of a BroadcastNestedLoopJoin — the thing that dies at scale. The
  as-of join avoids pair explosion entirely via union + last-carry-forward
  window (single shuffle, linear state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "join_broadcast",
    oracle="""
SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join of two tiny dims (no shuffle at any scale)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner").select(
        "n_nationkey", "n_name", F.col("r_name").alias("region_name")
    )


@query(
    "join_shuffle_equi",
    oracle="""
SELECT o.o_orderkey, o.o_orderstatus,
       floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 10000 + 0.5) / 10000 AS revenue,
       count(*) AS n_items
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey, o.o_orderstatus
""",
)
def join_shuffle_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact shuffle join on orderkey; revenue per order.

    Scale: lineitem is PRE-AGGREGATED per l_orderkey before the join
    (aggregate-below-join). This removes the post-join re-shuffle a naive
    join→groupBy(o_orderkey, o_orderstatus) plan needs (grouping on a
    superset of the join key defeats co-partition reuse), shrinks the join's
    probe side from line items to orders, and keeps results identical —
    o_orderstatus is constant per order.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return o.join(per_order, o.o_orderkey == per_order.l_orderkey, "inner").select(
        "o_orderkey", "o_orderstatus", "revenue", "n_items"
    )


@query(
    "join_multiway",
    oracle="""
SELECT n.n_name,
       floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 10000 + 0.5) / 10000 AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join chain, local-supplier revenue by nation.

    Scale: nation/region/supplier broadcast (dim-sized); customer⋈orders and
    ⋈lineitem shuffle on their keys. Date filter applied before the join so
    the pushed predicate prunes parquet row groups.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


@query(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment,
       count(o.o_orderkey) AS n_orders,
       floor((coalesce(sum(o.o_totalprice), 0)) * 10000 + 0.5) / 10000 AS total_spend
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_mktsegment
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers without orders (null-filled → 0)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            r4(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("total_spend"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
SELECT coalesce(o.key, e.key) AS entity_key,
       coalesce(o.n_orders, 0) AS n_orders,
       coalesce(e.n_events, 0) AS n_events
FROM (SELECT o_custkey AS key, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
FULL OUTER JOIN
     (SELECT user_id AS key, count(*) AS n_events FROM events GROUP BY user_id) e
ON o.key = e.key
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-key order/event activity (aggregate-then-join
    keeps the outer join 1:1 — no row explosion at scale)."""
    o = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    e = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return o.join(e, "key", "full").select(
        F.col("key").alias("entity_key"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


@query(
    "join_left_semi",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: customers with ≥1 order (probe side never duplicated)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_left_anti",
    oracle="""
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no URGENT-priority order.

    (r6: the unfiltered "zero orders" predicate was vacuous at the sf0.01
    grading scale — every customer has an order; the priority filter keeps
    the anti-join shape and emits 18/203/1986 rows at sf0.001/0.01/0.1.
    The filter is pushed below the join, so the build side shrinks ~5×
    before the anti probe — the plan a 100 TB run wants anyway.)
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_cross",
    oracle="""
SELECT r.r_name, f.l_returnflag
FROM region r CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem) f
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small cartesian product (5 × 3); both sides tiny by construction."""
    r = load(spark, sf_dir, "region").select("r_name")
    flags = load(spark, sf_dir, "lineitem").select("l_returnflag").distinct()
    return r.crossJoin(flags)


@query(
    "join_theta_range",
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
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band self-join: event pairs of the same user within 60 s.

    The user_id equality makes this a shuffled equi join with a residual
    range predicate — NOT a nested-loop cross product. At 100 TB, add
    time-bucketing (join on (user_id, 60s-bucket) ∪ adjacent bucket) to bound
    per-key fanout; at fixture scale per-user partitions are small.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 60 SECONDS")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_asof",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id,
       c.event_id AS last_click_id, c.ts AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's latest click at/before it.

    Spark has no native ASOF JOIN; the scalable formulation is union both
    streams, sort within user, and carry the last click forward with
    last(..., ignorenulls) — one shuffle on user_id, linear work, no pair
    explosion (vs the naive range-join + row_number which is O(clicks ×
    purchases) per user).
    """
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    timeline = clicks.withColumn("purchase_id", F.lit(None).cast("long")).unionByName(
        purchases.withColumn("click_id", F.lit(None).cast("long"))
    )
    # clicks sort before purchases at equal ts ⇒ 'at/before' is inclusive
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("purchase_id").isNotNull())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # one struct-valued last() ⇒ a single Window/Sort pass in the plan
    last_click = F.last(
        F.when(F.col("click_id").isNotNull(), F.struct("click_id", "ts")),
        ignorenulls=True,
    ).over(w)
    return (
        timeline.withColumn("lc", last_click)
        .filter(F.col("purchase_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.col("lc.click_id").alias("last_click_id"),
            F.col("lc.ts").alias("last_click_ts"),
        )
    )


@query(
    "join_interval",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id,
       count(c.event_id) AS n_views_next_hour
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts
 AND c.ts < p.ts + INTERVAL 1 HOUR
GROUP BY p.event_id, p.user_id
""",
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: views falling inside [purchase.ts, +1h) per purchase.

    Same scale pattern as join_theta_range: equi on user_id + residual range
    predicate; bucket time at 100 TB to bound fanout.
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("p_ts"))
            & (F.col("v_ts") < F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .groupBy("purchase_id", "user_id")
        .agg(F.count("view_id").alias("n_views_next_hour"))
    )


@query(
    "join_asof_tolerance",
    oracle="""
SELECT purchase_id, user_id,
       CASE WHEN within_tol THEN last_click_id END AS last_click_id,
       CASE WHEN within_tol THEN last_click_ts END AS last_click_ts
FROM (
  SELECT p.event_id AS purchase_id, p.user_id,
         c.event_id AS last_click_id, c.ts AS last_click_ts,
         c.ts IS NOT NULL AND c.ts >= p.ts - INTERVAL 1 HOUR AS within_tol
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND p.ts >= c.ts
)
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 1-hour tolerance (pandas merge_asof semantics): the
    user's latest click at/before each purchase, but only if it happened
    within the last hour — older matches become NULL.

    Because the as-of match is the LATEST prior click, "latest within
    tolerance" == "latest, then null-if-stale": one residual filter on the
    carried struct, no second window. Same single-shuffle union+last()
    formulation as join_asof.
    """
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    timeline = clicks.withColumn("purchase_id", F.lit(None).cast("long")).unionByName(
        purchases.withColumn("click_id", F.lit(None).cast("long"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("purchase_id").isNotNull())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(F.col("click_id").isNotNull(), F.struct("click_id", "ts")),
        ignorenulls=True,
    ).over(w)
    fresh = F.col("lc").isNotNull() & (
        F.col("lc.ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    )
    return (
        timeline.withColumn("lc", last_click)
        .filter(F.col("purchase_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.when(fresh, F.col("lc.click_id")).alias("last_click_id"),
            F.when(fresh, F.col("lc.ts")).alias("last_click_ts"),
        )
    )


@query(
    "join_null_safe_eq",
    oracle="""
WITH left_side AS (
  SELECT event_id, nullif(CAST(floor(value / 50) AS BIGINT), 5) AS bucket
  FROM events
),
right_side AS (
  SELECT unnest(range(0, 10)) AS bucket, 'b' || unnest(range(0, 10)) AS label
  UNION ALL SELECT NULL, 'b_null'
)
SELECT r.label, count(*) AS n_events
FROM left_side l JOIN right_side r ON l.bucket IS NOT DISTINCT FROM r.bucket
GROUP BY r.label
""",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): bucket 5 is mapped
    to NULL on the probe side and must still match the dimension's explicit
    NULL row — the lookup-with-unknown-bucket pattern plain equality
    silently drops.

    Catalyst plans EqualNullSafe as a HASH join key (nulls hash like any
    value under null-safe semantics), so this stays a shuffled/broadcast
    hash join at scale — not a nested loop.
    """
    ev = load(spark, sf_dir, "events")
    left = ev.select(
        "event_id",
        F.nullif(F.floor(F.col("value") / 50).cast("long"), F.lit(5)).alias("bucket"),
    )
    right = spark.range(0, 10).select(
        F.col("id").alias("bucket"), F.concat(F.lit("b"), F.col("id")).alias("label")
    ).unionByName(
        spark.range(1).select(
            F.lit(None).cast("long").alias("bucket"), F.lit("b_null").alias("label")
        )
    )
    joined = left.join(
        F.broadcast(right), left.bucket.eqNullSafe(right.bucket)
    )
    return joined.groupBy("label").agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "join_asof_nearest",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, p.user_id,
       (SELECT c.event_id FROM c
        WHERE c.user_id = p.user_id
          AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 3600000000
        ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), c.ts, c.event_id
        LIMIT 1) AS nearest_click_id
FROM p
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (merge_asof(direction='nearest')):
    each purchase takes the closest click within ±1 h; ties break toward
    the EARLIER click, then the smaller click id.

    Composition of two linear passes over one user_id shuffle domain — a
    backward carry (latest click ≤ t) and a forward carry (earliest click
    ≥ t) — then a deterministic argmin of the two candidate distances.
    Still no pair explosion: each pass is the union+last() formulation of
    join_asof, so the whole nearest join is O(n log n) per user at any
    scale.
    """
    ev = load(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", t_us.alias("t"), F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", t_us.alias("t"), F.col("event_id").alias("purchase_id")
    )
    timeline = clicks.withColumn("purchase_id", F.lit(None).cast("long")).unionByName(
        purchases.withColumn("click_id", F.lit(None).cast("long"))
    )
    # among equal-ts clicks the ORACLE keeps the smallest id; ordering
    # click_id DESC makes last() land on exactly that row
    wb = (
        Window.partitionBy("user_id")
        .orderBy("t", F.col("purchase_id").isNotNull(), F.col("click_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("t").desc(),
            F.col("purchase_id").isNotNull(),
            # DESC here mirrors wb: the scan runs in decreasing t, so last()
            # must land on the SMALLEST click id among equal-t forward
            # candidates to match the oracle's `ORDER BY dist, ts, event_id`
            F.col("click_id").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_struct = F.when(
        F.col("click_id").isNotNull(), F.struct("t", "click_id")
    )
    back = F.last(click_struct, ignorenulls=True).over(wb)
    fwd = F.last(click_struct, ignorenulls=True).over(wf)
    tol = 3_600_000_000
    db = F.col("t") - F.col("b.t")
    df_ = F.col("f.t") - F.col("t")
    b_ok = F.col("b").isNotNull() & (db <= tol)
    f_ok = F.col("f").isNotNull() & (df_ <= tol)
    nearest = (
        F.when(b_ok & (~f_ok | (db <= df_)), F.col("b.click_id"))
        .when(f_ok, F.col("f.click_id"))
    )
    return (
        timeline.withColumn("b", back)
        .withColumn("f", fwd)
        .filter(F.col("purchase_id").isNotNull())
        .select("purchase_id", "user_id", nearest.alias("nearest_click_id"))
    )


@query(
    "join_point_in_time",
    oracle="""
WITH dim AS (
  SELECT o_custkey, o_orderkey AS version_key, o_orderdate AS valid_from,
         lead(o_orderdate) OVER w AS valid_to
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
),
fact AS (
  SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_custkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 50 = 0
)
SELECT f.l_orderkey, f.l_linenumber, d.version_key
FROM fact f LEFT JOIN dim d
  ON f.o_custkey = d.o_custkey
 AND f.l_shipdate >= d.valid_from
 AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to)
""",
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (feature-store) join: each fact row picks the dim
    VERSION that was valid at its own timestamp — SCD2 validity windows
    (built inline with one lead() window) interval-joined on
    (business key, from ≤ ts < to).

    Scale shape: equi-join on the business key carries the fanout
    (versions per key, bounded), the validity predicate is a residual —
    never a time-range cross join. This is the lookup every training
    pipeline needs to avoid feature leakage from future dim versions.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    dim = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("version_key"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    # rename the fact's key: both sides derive from `orders`, and a shared
    # attribute id would make the equality predicate trivially true
    fact = li.join(
        o.select("o_orderkey", F.col("o_custkey").alias("f_custkey")),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "f_custkey")
    cond = (
        (F.col("f_custkey") == dim.o_custkey)
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("l_shipdate") < F.col("valid_to")))
    )
    return fact.join(dim, cond, "left_outer").select(
        "l_orderkey", "l_linenumber", "version_key"
    )


@query(
    "join_asof_forward",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, p.user_id,
       (SELECT c.event_id FROM c
        WHERE c.user_id = p.user_id
          AND c.ts >= p.ts
          AND epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
        ORDER BY c.ts, c.event_id
        LIMIT 1) AS next_click_id
FROM p
""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD-direction as-of join (merge_asof(direction='forward')): each
    purchase takes the EARLIEST click at-or-after it within 1 h — the
    post-event attribution lookup (did the user click again after buying?),
    completing the backward (join_asof) / nearest (join_asof_nearest)
    direction family.

    Same union-timeline + single-window formulation as the other
    directions: one shuffle on user_id, a descending-time forward carry,
    last() with the DESC id tie-break landing on the smallest click id
    among equal-timestamp candidates (the join_asof_nearest r5 fix,
    applied from the start here). No pair explosion at any scale.
    """
    ev = load(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", t_us.alias("t"), F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", t_us.alias("t"), F.col("event_id").alias("purchase_id")
    )
    timeline = clicks.withColumn("purchase_id", F.lit(None).cast("long")).unionByName(
        purchases.withColumn("click_id", F.lit(None).cast("long"))
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("t").desc(),
            F.col("purchase_id").isNotNull(),
            F.col("click_id").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_struct = F.when(F.col("click_id").isNotNull(), F.struct("t", "click_id"))
    fwd = F.last(click_struct, ignorenulls=True).over(wf)
    tol = 3_600_000_000
    ok = F.col("f").isNotNull() & (F.col("f.t") - F.col("t") <= tol)
    return (
        timeline.withColumn("f", fwd)
        .filter(F.col("purchase_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.when(ok, F.col("f.click_id")).alias("next_click_id"),
        )
    )


@query(
    "join_shuffle_hash_hint",
    oracle="""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       floor((sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))) * 10000 + 0.5)
         / 10000 AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-STRATEGY HINT surface (r11): the same orders⋈lineitem
    equi-join as join_shuffle_equi, but with a SHUFFLE_HASH hint on the
    orders side forcing ShuffledHashJoin over the SortMergeJoin Spark
    would otherwise pick for two over-broadcast-threshold relations.

    Why a user reaches for it at 100 TB: SHJ builds a hash map from the
    smaller side's shuffle partition and STREAMS the bigger side — no
    sort on either side, no spillable sort buffers — which wins whenever
    one side's per-partition share fits executor memory and the output
    doesn't need sorted runs (aggregation right after, as here). The
    hint is the escape hatch when stats mis-route the planner; AQE can
    also flip SMJ→SHJ at runtime, but only below its local-map threshold.

    Plan pinned (tests/test_plans.py): ShuffledHashJoin present,
    SortMergeJoin absent. Oracle: the plain join SQL — the hint must
    never change results, only the physical strategy (exact DECIMAL sum:
    the revenue groups are money-scale, r6 float-parity rule).
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    return (
        li.join(
            o.hint("shuffle_hash"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            r4(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
            ).alias("revenue"),
        )
    )
