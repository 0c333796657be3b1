"""Upsert / slowly-changing-dimension operators — the incremental-ETL core
(MERGE INTO semantics without a table format; on Delta/Iceberg the same
logic is one MERGE statement, here it's the portable DataFrame form).

Scale notes: SCD1 merge = full-outer join on the business key (one shuffle
each side — or zero if both sides are bucketed on the key, see
sink_bucketed_join); SCD2 intervals = one window per business key. Neither
requires driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "upsert_scd1",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, o_totalprice * 1.05 AS o_totalprice, 'U' AS o_orderstatus
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, 'N'
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT o_orderstatus,
       count(*) AS n_rows,
       floor((sum(o_totalprice)) * 10000 + 0.5) / 10000 AS total_price,
       min(o_orderkey) AS min_key,
       max(o_orderkey) AS max_key
FROM (
  SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
         coalesce(u.o_totalprice, b.o_totalprice) AS o_totalprice,
         coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus
  FROM (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders) b
  FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
)
GROUP BY o_orderstatus
""",
)
def upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 MERGE: updates overwrite matched rows, unmatched updates insert.

    updates = deterministic change set (every 3rd order repriced +5% →
    status U; every 7th order cloned to a new key → status N). The merge is
    a full-outer join + coalesce — matched rows take the update's values,
    unmatched base rows persist, unmatched updates insert.
    """
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    repriced = (
        base.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 1.05).alias("o_totalprice"),
            F.lit("U").alias("o_orderstatus"),
        )
    )
    inserts = (
        base.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_totalprice",
            F.lit("N").alias("o_orderstatus"),
        )
    )
    updates = repriced.unionByName(inserts)
    u = updates.select(
        F.col("o_orderkey").alias("u_key"),
        F.col("o_totalprice").alias("u_price"),
        F.col("o_orderstatus").alias("u_status"),
    )
    merged = base.join(u, base.o_orderkey == u.u_key, "full").select(
        F.coalesce("u_key", "o_orderkey").alias("o_orderkey"),
        F.coalesce("u_price", "o_totalprice").alias("o_totalprice"),
        F.coalesce("u_status", "o_orderstatus").alias("o_orderstatus"),
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        r4(F.sum("o_totalprice")).alias("total_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "scd2_history",
    oracle="""
SELECT o_custkey,
       o_orderkey AS version_key,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       (lead(o_orderdate) OVER w IS NULL) AS is_current,
       floor((o_totalprice) * 10000 + 0.5) / 10000 AS attr_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals: each order version of a customer gets
    [valid_from, valid_to) from its date and the next version's date; the
    open-ended row is flagged current. One window per business key."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    valid_to = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.col("o_orderkey").alias("version_key"),
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        r4("o_totalprice").alias("attr_price"),
    )


@query(
    "cdc_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT o_orderkey AS k, o_totalprice AS price FROM orders
),
new AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 5 = 0
              THEN floor((o_totalprice * 1.1) * 100 + 0.5) / 100
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 50000000, o_totalprice
  FROM orders WHERE o_orderkey % 101 = 0
),
diff AS (
  SELECT CASE WHEN old.k IS NULL THEN 'insert'
              WHEN new.k IS NULL THEN 'delete'
              WHEN old.price <> new.price THEN 'update'
              ELSE 'unchanged' END AS change_type,
         coalesce(new.price, old.price) AS price
  FROM old FULL OUTER JOIN new ON old.k = new.k
)
SELECT change_type, count(*) AS n_rows,
       floor(CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) * 10000 + 0.5) / 10000
         AS sum_price
FROM diff GROUP BY change_type
""",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture snapshot diff: classify every key across two
    snapshots as insert / delete / update / unchanged in ONE full-outer
    join, and aggregate per class.

    The "new" snapshot is a deterministic mutation of orders (every 97th
    key deleted, every 5th repriced +10% at 2dp, every 101st cloned to a
    fresh key) so all four classes are non-empty at every fixture sf. This
    is the batch primitive behind incremental-pipeline reconciliation:
    at 100 TB both snapshots shuffle once on the join key and the output
    is 4 rows — no per-row state ever reaches the driver.
    """
    old = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("price_old")
    )
    base = load(spark, sf_dir, "orders")
    mutated = base.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5) / 100,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("price_new"),
    )
    inserts = base.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 50_000_000).alias("k"),
        F.col("o_totalprice").alias("price_new"),
    )
    new = mutated.unionByName(inserts)
    diff = old.join(new, "k", "full_outer").select(
        F.when(F.col("price_old").isNull(), "insert")
        .when(F.col("price_new").isNull(), "delete")
        .when(F.col("price_old") != F.col("price_new"), "update")
        .otherwise("unchanged")
        .alias("change_type"),
        F.coalesce("price_new", "price_old").alias("price"),
    )
    # 2dp money summed in exact DECIMAL: the 'unchanged' class sums ~120k
    # prices into one group at sf0.1 — double accumulation-order drift
    # exceeds the 4dp compare at that group size (r6 sf0.1 sweep catch,
    # same class as agg_global / sink_bucketed_join)
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        r4(F.sum(F.col("price").cast("decimal(18,2)")).cast("double")).alias(
            "sum_price"
        ),
    )


@query(
    "cdc_apply_changes",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey % 7 <> 0
),
changes AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice
              ELSE o_totalprice * 1.1 END AS o_totalprice,
         CASE WHEN o_orderkey % 7 = 0 THEN 'I'
              WHEN o_orderkey % 5 = 0 THEN 'U'
              WHEN o_orderkey % 11 = 0 THEN 'D'
              ELSE NULL END AS op
  FROM orders
),
applied AS (
  SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
  FROM base b
  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM changes WHERE op IN ('U', 'D'))
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM changes WHERE op IN ('I', 'U')
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
       floor((sum(o_totalprice)) * 10000 + 0.5) / 10000 AS sum_price
FROM applied GROUP BY o_orderstatus
""",
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style CDC APPLY: fold a changelog (insert / update / delete
    ops, synthesized deterministically from the same table: keys ≡0 mod 7
    insert, else mod 5 update at +10%, else mod 11 delete) into a base
    snapshot and summarize the resulting table — the logical core of
    Delta/Iceberg MERGE INTO, expressed engine-agnostically
    (complementing cdc_snapshot_diff, which goes the OTHER direction:
    snapshot pair → changelog).

    Plan: deletes+updates remove base rows via one anti-join on the
    changed-key set; inserts+update-images append via union — the
    copy-on-write merge topology. At 100 TB the changed-key set is the
    broadcast side and only affected files rewrite (which is precisely
    what the lakehouse formats automate).
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.filter(F.col("o_orderkey") % 7 != 0)
    op = (
        F.when(F.col("o_orderkey") % 7 == 0, "I")
        .when(F.col("o_orderkey") % 5 == 0, "U")
        .when(F.col("o_orderkey") % 11 == 0, "D")
    )
    changes = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice") * 1.1)
        .alias("o_totalprice"),
        op.alias("op"),
    ).filter(F.col("op").isNotNull())
    touched = changes.filter(F.col("op").isin("U", "D")).select("o_orderkey")
    survivors = base.join(F.broadcast(touched), "o_orderkey", "left_anti")
    upserts = changes.filter(F.col("op").isin("I", "U")).drop("op")
    applied = survivors.unionByName(upserts)
    return applied.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        r4(F.sum("o_totalprice")).alias("sum_price"),
    )


@query(
    "scd2_point_lookup",
    oracle="""
WITH v AS (
  SELECT o_custkey, o_orderkey AS version_key, o_totalprice,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate ASC, o_orderkey ASC)
           AS valid_to
  FROM orders
)
SELECT o_custkey, version_key,
       floor((o_totalprice) * 10000 + 0.5) / 10000 AS price_asof
FROM v
WHERE valid_from <= TIMESTAMP '1997-06-01 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '1997-06-01 00:00:00')
""",
)
def scd2_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal point-in-time snapshot over the SCD2-versioned dimension:
    the version of every customer valid AS OF 1997-06-01 (valid_from ≤ t <
    valid_to, open-ended current rows included) — the "state of the world
    at time t" query every versioned table must answer, and the single-
    timestamp special case of join_point_in_time.

    One window pass builds validity intervals (same construction as
    scd2_history), then a pushed-down residual filter — no join at all for
    a constant lookup timestamp.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    t = F.lit("1997-06-01").cast("timestamp_ntz")
    v = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("version_key"),
        "o_totalprice",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    return v.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select(
        "o_custkey",
        "version_key",
        r4(F.col("o_totalprice")).alias("price_asof"),
    )


@query(
    "agg_time_grain_rollup",
    oracle="""
SELECT grain, bucket_start,
       CAST(count(*) AS BIGINT) AS n_orders,
       floor((sum(o_totalprice)) * 10000 + 0.5) / 10000 AS revenue
FROM (
  SELECT date_trunc('day', o_orderdate) AS bucket_start, 'day' AS grain, o_totalprice
  FROM orders WHERE o_orderkey % 20 = 0
  UNION ALL
  SELECT date_trunc('week', o_orderdate), 'week', o_totalprice
  FROM orders WHERE o_orderkey % 20 = 0
  UNION ALL
  SELECT date_trunc('month', o_orderdate), 'month', o_totalprice
  FROM orders WHERE o_orderkey % 20 = 0
)
GROUP BY grain, bucket_start
""",
)
def agg_time_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain time rollup: the same order stream aggregated at
    day/week/month grains in one result (the time-hierarchy cousin of the
    categorical agg_rollup), over a stated 1/20 key sample.

    Implemented as a grain EXPLODE (each row emits its three
    (grain, bucket) labels) + ONE groupBy — one scan and one shuffle for
    all grains, instead of three scans + a union; that is exactly how a
    100 TB time-hierarchy materialization runs (and incremental variants
    merge day partials upward, per rollup_incremental_merge).
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    grains = F.array(
        F.struct(F.lit("day").alias("grain"), F.date_trunc("day", "o_orderdate").alias("bucket_start")),
        F.struct(F.lit("week").alias("grain"), F.date_trunc("week", "o_orderdate").alias("bucket_start")),
        F.struct(F.lit("month").alias("grain"), F.date_trunc("month", "o_orderdate").alias("bucket_start")),
    )
    exploded = o.select("o_totalprice", F.explode(grains).alias("g")).select(
        F.col("g.grain").alias("grain"),
        F.col("g.bucket_start").alias("bucket_start"),
        "o_totalprice",
    )
    return exploded.groupBy("grain", "bucket_start").agg(
        F.count(F.lit(1)).alias("n_orders"),
        r4(F.sum("o_totalprice")).alias("revenue"),
    )


SCD2M_EFF = "1998-01-01 00:00:00"  # effective timestamp of the merge batch


@query(
    "scd2_merge_apply",
    oracle=f"""
WITH hist AS MATERIALIZED (
  SELECT c_custkey, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_c,
         TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to,
         true AS is_current
  FROM customer
),
chg AS MATERIALIZED (
  SELECT c_custkey,
         CAST(floor(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE)
                    * 1.1 * 100 + 0.5) AS BIGINT) AS new_bal_c
  FROM customer WHERE c_custkey % 7 = 0
),
applied AS MATERIALIZED (
  -- untouched current rows
  SELECT h.* FROM hist h
  WHERE h.c_custkey NOT IN (SELECT c_custkey FROM chg)
  UNION ALL
  -- closed-out prior versions of changed keys
  SELECT h.c_custkey, h.c_nationkey, h.bal_c, h.valid_from,
         TIMESTAMP '{SCD2M_EFF}' AS valid_to, false AS is_current
  FROM hist h JOIN chg USING (c_custkey)
  UNION ALL
  -- the new current versions
  SELECT h.c_custkey, h.c_nationkey, c.new_bal_c, TIMESTAMP '{SCD2M_EFF}',
         CAST(NULL AS TIMESTAMP), true
  FROM hist h JOIN chg c USING (c_custkey)
)
SELECT c_nationkey AS nationkey,
       CAST(count(*) AS BIGINT) AS n_history_rows,
       CAST(count(*) FILTER (is_current) AS BIGINT) AS n_current,
       CAST(count(*) FILTER (NOT is_current) AS BIGINT) AS n_closed,
       CAST(sum(bal_c) FILTER (is_current) AS BIGINT) AS sum_current_bal_c
FROM applied GROUP BY c_nationkey
""",
)
def scd2_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 MERGE APPLY — fold a change batch into a type-2 history table
    (the write half completing the SCD2 family: scd2_history derives the
    intervals, scd2_point_lookup reads them, THIS key maintains them):
    every changed business key's current row is CLOSED OUT (valid_to =
    the batch's effective timestamp) and a new open-ended version is
    inserted; untouched keys pass through. Graded per nation: history
    row count, current vs closed counts, and the exact integer-cents sum
    of current balances — the invariant a dimension-maintenance job
    checks after every merge (exactly one current row per key).

    Plan: ONE anti-join (untouched), one inner join each for close-outs
    and inserts, all on the broadcast changed-key set; money in integer
    cents end-to-end. At 100 TB this is MERGE INTO on an SCD2 dimension:
    cost ∝ the change batch, the history table shuffles once on the key.
    """
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_acctbal").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("bal_c"),
    )
    eff = F.lit(SCD2M_EFF).cast("timestamp")
    hist = c.select(
        "c_custkey",
        "c_nationkey",
        "bal_c",
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    chg = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            F.floor(
                F.col("c_acctbal").cast("decimal(12,2)").cast("double")
                * 1.1 * 100
                + F.lit(0.5)
            )
            .cast("long")
            .alias("new_bal_c"),
        )
    )
    untouched = hist.join(F.broadcast(chg.select("c_custkey")), "c_custkey", "anti")
    closed = hist.join(F.broadcast(chg.select("c_custkey")), "c_custkey").select(
        "c_custkey", "c_nationkey", "bal_c", "valid_from",
        eff.alias("valid_to"), F.lit(False).alias("is_current"),
    )
    fresh = hist.join(F.broadcast(chg), "c_custkey").select(
        "c_custkey", "c_nationkey",
        F.col("new_bal_c").alias("bal_c"),
        eff.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    applied = untouched.unionByName(closed).unionByName(fresh)
    return applied.groupBy(
        F.col("c_nationkey").alias("nationkey")
    ).agg(
        F.count(F.lit(1)).alias("n_history_rows"),
        F.count(F.when(F.col("is_current"), 1)).alias("n_current"),
        F.count(F.when(~F.col("is_current"), 1)).alias("n_closed"),
        F.sum(F.when(F.col("is_current"), F.col("bal_c")))
        .cast("long")
        .alias("sum_current_bal_c"),
    )
