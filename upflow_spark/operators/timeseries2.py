"""Time-series wave 2: OHLC bar resampling and robust (MAD) outlier
detection over the events stream.

Both are classic market-data / telemetry shapes: resample raw ticks into
fixed bars with first/last semantics, and flag anomalies against a
median-absolute-deviation band (robust to the outliers themselves, unlike
stddev z-scores — cf. grouped_pandas_zscore).

Reference: n/a (ref empty — SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import R4, r4
from upflow_spark.registry import query


@query(
    "ts_ohlc_resample",
    oracle=f"""
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS bar, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bar,
       {R4("max(CASE WHEN rn_a = 1 THEN value END)")} AS open,
       {R4("max(value)")} AS high,
       {R4("min(value)")} AS low,
       {R4("max(CASE WHEN rn_d = 1 THEN value END)")} AS close,
       CAST(count(*) AS BIGINT) AS volume
FROM ranked
GROUP BY event_type, bar
""",
)
def ts_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event_type: open/close are the first/last tick
    by (ts, event_id) — a deterministic total order — high/low/volume are
    plain aggregates.

    One window pass + one grouped agg, both keyed on (event_type, hour):
    high-cardinality over time, so at 100 TB partitions spread across the
    timeline and the window state per key is bounded by ticks-per-hour.
    ``min_by``-style first/last would be simpler but ties on ts would be
    nondeterministic; the ranked formulation pins them.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("bar"), "ts", "event_id", "value"
    )
    part = Window.partitionBy("event_type", "bar")
    ranked = ev.select(
        "event_type",
        "bar",
        "value",
        F.row_number().over(part.orderBy(F.asc("ts"), F.asc("event_id"))).alias("rn_a"),
        F.row_number().over(part.orderBy(F.desc("ts"), F.desc("event_id"))).alias("rn_d"),
    )
    return ranked.groupBy("event_type", "bar").agg(
        r4(F.max(F.when(F.col("rn_a") == 1, F.col("value")))).alias("open"),
        r4(F.max("value")).alias("high"),
        r4(F.min("value")).alias("low"),
        r4(F.max(F.when(F.col("rn_d") == 1, F.col("value")))).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    )


@query(
    "anomaly_mad_outliers",
    oracle=f"""
WITH med AS (
  SELECT event_type, median(value) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, any_value(m.med) AS med,
         median(abs(e.value - m.med)) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type,
       {R4("any_value(m.med)")} AS med,
       {R4("any_value(m.mad)")} AS mad,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE abs(e.value - m.med) > 3 * m.mad) AS BIGINT)
         AS n_outliers
FROM events e JOIN mad m USING (event_type)
GROUP BY e.event_type
""",
)
def anomaly_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: |x − median| > 3·MAD per event_type, where
    MAD = median(|x − median|) (explicit formula on both sides so the two
    engines share one interpolation definition).

    Two grouped exact-median passes + one counting pass, all keyed on
    event_type; the tiny per-type medians are broadcast back onto the
    events scan, so the fact table never shuffles. At 100 TB swap the exact
    median for ``approx_percentile`` sketches (same plan shape) if the
    grouped sort becomes the bottleneck.
    """
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"),
        )
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            r4(F.any_value("med")).alias("med"),
            r4(F.any_value("mad")).alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when(F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1)
            ).alias("n_outliers"),
        )
    )
