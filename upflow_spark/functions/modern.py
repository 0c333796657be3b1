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
