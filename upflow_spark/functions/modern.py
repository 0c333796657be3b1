"""Modern Spark 4 engine surfaces: VARIANT semi-structured type, Arrow-batch
map transforms, and observed metrics — the APIs a reference user migrating
onto Spark 4.x would expect first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "variant_semi_structured",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(count(CASE WHEN json_valid(props) THEN 1 END) AS BIGINT) AS n_valid
FROM events
GROUP BY event_type
""",
)
def variant_semi_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path: parse_json once into a binary variant value,
    then typed variant_get extraction — the open-schema answer to rigid
    from_json structs.

    Why VARIANT at 100 TB: the parse happens ONCE per row at ingestion into
    a shredded binary encoding; every later field access is a cheap typed
    probe instead of a re-parse of the JSON text (get_json_object re-parses
    per call). try_parse_json gives NULL (not a job abort) on malformed
    rows, counted here as the validity metric.
    """
    ev = load(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    return (
        ev.select("event_type", v.alias("v"))
        .select(
            "event_type",
            F.variant_get("v", "$.k", "int").alias("k"),
            F.col("v").isNotNull().alias("valid"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.count(F.when(F.col("valid"), 1)).alias("n_valid"),
        )
    )


@query(
    "map_in_arrow_batch",
    oracle="""
SELECT price_band, count(*) AS n_orders,
       floor((sum(o_totalprice)) * 10000 + 0.5) / 10000 AS band_total
FROM (
  SELECT o_totalprice,
         CASE WHEN o_totalprice < 50000 THEN 'low'
              WHEN o_totalprice < 150000 THEN 'mid'
              ELSE 'high' END AS price_band
  FROM orders
)
GROUP BY price_band
""",
)
def map_in_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: zero-copy Arrow RecordBatch transform — the lowest-
    overhead Python escape hatch (no pandas conversion at all, unlike
    mapInPandas). Derives a price band per order batch-at-a-time with
    pyarrow.compute, then aggregates JVM-side.

    The banding itself could be a CASE expression (and the oracle states it
    that way); the key exists to pin the Arrow-batch plumbing: schema
    declaration, batch iteration, columnar kernel use.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")

    # NESTED on purpose: module-level callables cloudpickle by reference and
    # break on executors when the driver cwd isn't the repo
    def band_batches(batches):  # noqa: ANN001, ANN202
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            price = batch.column("o_totalprice")
            band = pc.if_else(
                pc.less(price, 50000.0),
                pa.scalar("low"),
                pc.if_else(pc.less(price, 150000.0), pa.scalar("mid"), pa.scalar("high")),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("o_orderkey"), price, band],
                names=["o_orderkey", "o_totalprice", "price_band"],
            )

    banded = o.mapInArrow(
        band_batches, "o_orderkey bigint, o_totalprice double, price_band string"
    )
    return banded.groupBy("price_band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        r4(F.sum("o_totalprice")).alias("band_total"),
    )


@query(
    "observe_metrics",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       floor((sum(o_totalprice)) * 10000 + 0.5) / 10000 AS total_price,
       CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open
FROM orders
""",
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.observe(): pipeline health metrics accumulated DURING the pass —
    row counts, sums, conditional counts ride the existing action instead of
    costing a second scan (the at-scale point: auditing 100 TB must not
    double the I/O).

    The observed values are returned as a 1-row DataFrame so the oracle can
    check them; production ships them to a metrics sink via
    QueryExecutionListener instead.
    """
    from pyspark.sql import Observation

    o = load(spark, sf_dir, "orders")
    obs = Observation("order_stats")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_totalprice").alias("total_price"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
    )
    observed.count()  # one JVM-side pass; metrics accumulate task-side
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_rows"]), float(m["total_price"]), int(m["n_open"]))],
        "n_rows bigint, total_price double, n_open bigint",
    ).select("n_rows", r4(F.col("total_price")).alias("total_price"), "n_open")


@query(
    "agg_bitmap_distinct",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via Spark 4 bitmap aggregates — the
    mergeable-bitmap pattern (Roaring-style): user ids bucket into 32k-bit
    bitmaps per (group, bucket), partial-aggregated map-side, then bit
    counts sum per group. Unlike HLL this is exact, unlike
    count(DISTINCT) it never reshuffles raw ids — at 100 TB the shuffle
    carries one bitmap per (group, bucket), not one row per id.
    DuckDB verifies against plain count(DISTINCT).
    """
    from upflow_spark.io import load

    ev = load(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type",
        F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )


@query(
    "grouped_apply_arrow",
    oracle="""
SELECT c_mktsegment, c_custkey,
       floor((CASE WHEN mx = mn THEN 0.5
              ELSE (c_acctbal - mn) / (mx - mn) END) * 10000 + 0.5) / 10000
         AS balance_norm
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         min(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mn,
         max(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mx
  FROM customer
)
""",
)
def grouped_apply_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment min-max normalization via applyInArrow — the 5th and
    lowest-overhead Python execution surface (grouped pyarrow RecordBatch,
    zero pandas conversion; complements mapInPandas / applyInPandas /
    applyInPandasWithState / mapInArrow already covered). pyarrow.compute
    kernels only; DuckDB verifies via the window formulation.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from upflow_spark.io import load

    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", "c_acctbal"
    )

    def normalize(tbl: pa.Table) -> pa.Table:
        bal = tbl.column("c_acctbal")
        mn = pc.min(bal).as_py()
        mx = pc.max(bal).as_py()
        if mx == mn:
            norm = pa.array([0.5] * len(tbl), type=pa.float64())
        else:
            norm = pc.divide(pc.subtract(bal, mn), mx - mn)
        return pa.table(
            {
                "c_mktsegment": tbl.column("c_mktsegment"),
                "c_custkey": tbl.column("c_custkey"),
                "balance_norm": norm,
            }
        )

    out = c.groupBy("c_mktsegment").applyInArrow(
        normalize, "c_mktsegment string, c_custkey long, balance_norm double"
    )
    return out.select("c_mktsegment", "c_custkey", r4(F.col("balance_norm")).alias("balance_norm"))


@query(
    "agg_grouping_id",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       count(*) AS n_orders
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with explicit grouping_id()/grouping() — the metadata that
    lets one hierarchical result set distinguish 'the NULL group' from
    'the subtotal row' (consumers route on gid, not on NULL-ness).
    Both engines compute the identical bitmask."""
    from upflow_spark.io import load

    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "g_status",
            "n_orders",
        )
    )
