"""Product/BI analytics operators: time-series gap filling, histograms,
ratio-to-report, funnel conversion, cohort retention — the composed shapes
an analytics engine is actually asked for daily.

All pure DataFrame compositions with exact oracles; scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "ts_gapfill_ffill",
    oracle="""
WITH spine AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-30 00:00:00',
                                INTERVAL 1 DAY)) AS day
),
daily AS (
  SELECT date_trunc('day', ts) AS day,
         sum(value) AS day_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY day
)
SELECT s.day,
       (d.day IS NOT NULL) AS observed,
       floor((coalesce(d.day_value,
                       (SELECT d2.day_value FROM daily d2
                        WHERE d2.day < s.day ORDER BY d2.day DESC LIMIT 1),
                       0.0)) * 10000 + 0.5) / 10000 AS day_value_filled
FROM spine s LEFT JOIN daily d ON s.day = d.day
""",
)
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase-value series over a complete date spine, gaps
    forward-filled from the last observed day (0 before first observation).

    Spark-first: spine = sequence()+explode (no driver loop); fill = last(…,
    ignorenulls) over an ordered window. Scale: the spine is tiny (days);
    per-key series would add the key to the partitionBy.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum("value").alias("day_value"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp_ntz"),
                F.lit("2024-01-30").cast("timestamp_ntz"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(daily, "day", "left")
        .withColumn("observed", F.col("day_value").isNotNull())
        .withColumn(
            "day_value_filled",
            r4(F.coalesce(F.last("day_value", ignorenulls=True).over(w), F.lit(0.0))),
        )
        .select("day", "observed", "day_value_filled")
    )


@query(
    "hist_bins",
    oracle="""
SELECT CAST(least(floor((o_totalprice - 0) / 25000), 19) AS BIGINT) AS bin,
       count(*) AS n_orders,
       floor((min(o_totalprice)) * 10000 + 0.5) / 10000 AS bin_min,
       floor((max(o_totalprice)) * 10000 + 0.5) / 10000 AS bin_max
FROM orders
GROUP BY bin
""",
)
def hist_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bucket histogram of order totals (fixed-width binning expression —
    one map-side pass + tiny agg; the portable width_bucket)."""
    o = load(spark, sf_dir, "orders")
    bin_ = F.least(F.floor(F.col("o_totalprice") / 25000), F.lit(19)).cast("long")
    return (
        o.select(bin_.alias("bin"), "o_totalprice")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(F.min("o_totalprice")).alias("bin_min"),
            r4(F.max("o_totalprice")).alias("bin_max"),
        )
    )


@query(
    "ratio_to_report",
    oracle="""
SELECT n_name,
       floor((nation_rev) * 10000 + 0.5) / 10000 AS nation_rev,
       floor((nation_rev / sum(nation_rev) OVER ()) * 10000 + 0.5) / 10000 AS revenue_share
FROM (
  SELECT n.n_name, sum(o.o_totalprice) AS nation_rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
""",
)
def ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share per nation (ratio-to-report): aggregate first, then an
    unpartitioned window over the 25-row aggregate — never over the fact."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("nation_rev"))
    )
    w = Window.partitionBy()
    return agg.select(
        "n_name",
        r4(F.col("nation_rev")).alias("nation_rev"),
        r4(F.col("nation_rev") / F.sum("nation_rev").over(w)).alias("revenue_share"),
    )


@query(
    "funnel_conversion",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'signup') AS t_signup,
         min(ts) FILTER (WHERE event_type = 'click') AS t_click,
         min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT count(*) FILTER (WHERE t_signup IS NOT NULL) AS n_signup,
       count(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup) AS n_click_after,
       count(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup
                          AND t_purchase > t_click) AS n_purchase_after
FROM firsts
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase counted on first-event times.

    The standard product funnel: one groupBy(user) with conditional min()s —
    a single shuffle regardless of step count; step predicates compose on
    the firsts, not by re-scanning events per step.
    """
    ev = load(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    firsts = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    signed = F.col("t_signup").isNotNull()
    clicked = signed & (F.col("t_click") > F.col("t_signup"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count(F.when(signed, 1)).alias("n_signup"),
        F.count(F.when(clicked, 1)).alias("n_click_after"),
        F.count(F.when(purchased, 1)).alias("n_purchase_after"),
    )


@query(
    "retention_cohorts",
    oracle="""
WITH cohort AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT c.cohort_week,
       CAST(datediff('week', c.cohort_week, a.active_week) AS BIGINT) AS week_offset,
       count(DISTINCT a.user_id) AS n_active
FROM cohort c JOIN activity a ON c.user_id = a.user_id
GROUP BY c.cohort_week, week_offset
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted in
    each later activity week (offset in weeks). Two aggregations + one join,
    all keyed on user_id — the classic retention matrix feed."""
    ev = load(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    offset = (
        F.datediff(F.col("active_week").cast("date"), F.col("cohort_week").cast("date"))
        / 7
    ).cast("long")
    return (
        cohort.join(activity, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "sessionize_gap",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM marked
)
SELECT user_id, session_no, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       floor((sum(value)) * 10000 + 0.5) / 10000 AS sum_value
FROM sess
GROUP BY user_id, session_no
""",
)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a session breaks after 30 min of inactivity.

    The classic gaps-and-islands pattern — lag() marks session starts, a
    running sum numbers them, then one group-agg per (user, session). The
    batch twin of stream_session (which uses session_window in streaming).
    Scale: one shuffle on user_id for the window, then the same partitioning
    is reused by the groupBy — no second exchange.

    Tie note: BOTH windows (lag and running sum) order by (ts, event_id) —
    a total order. Ordering the cumsum by ts alone would be nondeterministic
    when a session opens on the first row of a timestamp tie group (peers
    could land on either side of the is_start row depending on engine).
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    marked = ev.withColumn(
        "is_start",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("session_no", F.sum("is_start").over(ws))
    return sess.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        r4(F.sum("value")).alias("sum_value"),
    )
