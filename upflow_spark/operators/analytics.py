"""Product/BI analytics operators: time-series gap filling, histograms,
ratio-to-report, funnel conversion, cohort retention — the composed shapes
an analytics engine is actually asked for daily.

All pure DataFrame compositions with exact oracles; scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.operators.rank2 import global_ntile
from upflow_spark.parity import R4, r4
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


@query(
    "ts_interp_linear",
    oracle="""
WITH ev AS (
  SELECT user_id, ts, avg(value) AS value
  FROM events WHERE user_id % 100 = 0 GROUP BY user_id, ts
),
b AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
  FROM ev GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts FROM b
),
u AS (
  SELECT user_id, ts, value, 0 AS src FROM ev
  UNION ALL
  SELECT user_id, ts, NULL, 1 FROM grid
),
w AS (
  SELECT user_id, ts, src,
    last_value(value IGNORE NULLS) OVER wp AS prev_val,
    last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wp AS prev_ts,
    first_value(value IGNORE NULLS) OVER wf AS next_val,
    first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wf AS next_ts
  FROM u
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, src
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY ts, src
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, ts AS grid_ts,
       floor((prev_val + (next_val - prev_val)
              * (CAST(epoch_us(ts) - epoch_us(prev_ts) AS DOUBLE)
                 / (epoch_us(next_ts) - epoch_us(prev_ts))))
             * 10000 + 0.5) / 10000 AS value_interp
FROM w
WHERE src = 1 AND prev_ts IS NOT NULL AND next_ts IS NOT NULL
""",
)
def ts_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of each sampled user's event values onto an
    hourly grid — the resampling primitive ffill (ts_gapfill_ffill) can't
    express. Grid rows interleave with observations in ONE (user, ts, src)
    window pass: running last/first IGNORE-NULLS give the bracketing
    observations, then the time-fraction blend. Grid points at an exact
    observation collapse to that value (fraction 0 — src orders the
    observation first at timestamp ties); points before the first / after
    the last observation are dropped on both engines.

    Scale: the grid is generated per user from its own [min, max] span
    (sequence + explode, no driver loop); one shuffle on user_id.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") % 100 == 0)
        .groupBy("user_id", "ts")
        .agg(F.avg("value").alias("value"))
    )
    b = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"), F.max("ts").alias("t1")
    )
    grid = b.select(
        "user_id", F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("ts")
    )
    u = ev.withColumn("src", F.lit(0)).unionByName(
        grid.select(
            "user_id", "ts", F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("src"),
        )
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("value").isNotNull(), F.col("ts"))
    w = u.select(
        "user_id",
        "ts",
        "src",
        F.last("value", ignorenulls=True).over(wp).alias("prev_val"),
        F.last(obs_ts, ignorenulls=True).over(wp).alias("prev_ts"),
        F.first("value", ignorenulls=True).over(wf).alias("next_val"),
        F.first(obs_ts, ignorenulls=True).over(wf).alias("next_ts"),
    )
    frac = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("prev_ts").cast("timestamp"))
    ).cast("double") / (
        F.unix_micros(F.col("next_ts").cast("timestamp"))
        - F.unix_micros(F.col("prev_ts").cast("timestamp"))
    )
    interp = F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac
    return (
        w.filter(
            (F.col("src") == 1)
            & F.col("prev_ts").isNotNull()
            & F.col("next_ts").isNotNull()
        )
        .select("user_id", F.col("ts").alias("grid_ts"), r4(interp).alias("value_interp"))
    )


@query(
    "basket_part_pairs",
    oracle="""
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(DISTINCT a.l_orderkey) AS n_orders
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY part_a, part_b
HAVING count(DISTINCT a.l_orderkey) >= 2
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 20
""",
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in ≥2
    orders, top-20. Self-join on the order key — safe at any scale because
    basket size is bounded (≤7 lines/order in this schema), so the pair
    blowup per order is ≤ 21 rows; the join shuffles both sides on
    l_orderkey once and the pair agg is map-side combinable.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, ["l_orderkey"])
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(20)
    )


@query(
    "win_streak_islands",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN value > lag(value) OVER w THEN 0 ELSE 1 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
grp AS (
  SELECT user_id,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM marked
),
streaks AS (
  SELECT user_id, island, count(*) AS streak_len FROM grp
  GROUP BY user_id, island
)
SELECT user_id, max(streak_len) AS max_streak
FROM streaks GROUP BY user_id
""",
)
def win_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing value streak per user — the second
    gaps-and-islands shape (sessionize_gap is the time-gap variant; this one
    breaks on a VALUE predicate). lag marks breaks, running sum numbers the
    islands, two cheap aggs on top; all four steps reuse the single user_id
    shuffle. First row of each user is its own break (lag NULL ⇒ brk=1), so
    island ids start at 1 on both engines.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "brk",
        F.when(F.col("value") > F.lag("value").over(w), 0).otherwise(1),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = marked.withColumn("island", F.sum("brk").over(ws))
    return (
        grp.groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("streak_len"))
        .groupBy("user_id")
        .agg(F.max("streak_len").alias("max_streak"))
    )


@query(
    "stat_winsorize",
    oracle="""
WITH cuts AS (
  SELECT c_mktsegment,
         percentile_disc(0.1) WITHIN GROUP (ORDER BY c_acctbal) AS lo,
         percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal) AS hi
  FROM customer GROUP BY c_mktsegment
)
SELECT c.c_mktsegment, cuts.lo, cuts.hi,
       floor((sum(c.c_acctbal)) * 10000 + 0.5) / 10000 AS sum_raw,
       floor((sum(greatest(cuts.lo, least(cuts.hi, c.c_acctbal)))) * 10000 + 0.5) / 10000
         AS sum_winsorized,
       CAST(count(*) FILTER (c.c_acctbal < cuts.lo) AS BIGINT) AS n_clipped_low,
       CAST(count(*) FILTER (c.c_acctbal > cuts.hi) AS BIGINT) AS n_clipped_high
FROM customer c JOIN cuts ON c.c_mktsegment = cuts.c_mktsegment
GROUP BY c.c_mktsegment, cuts.lo, cuts.hi
""",
)
def stat_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment winsorization at [p10, p90]: clip outlier balances and
    report raw vs clipped sums + clip counts — the standard robust-stats
    pre-step before training on heavy-tailed numeric features.

    percentile_disc (actual data points, identical both engines) computed
    per segment, broadcast back onto the fact scan, one grouped pass.
    Sums, not means: balances are 2-decimal money, and integer-exact sums
    can't land on a 4dp rounding boundary the way sum/n quotients can
    (parity.py). Scale: the cut table is |segments| rows — broadcast;
    the corpus shuffles once on the groupBy key it already joined on.
    """
    c = load(spark, sf_dir, "customer")
    cuts = c.groupBy("c_mktsegment").agg(
        F.expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY c_acctbal)").alias("lo"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal)").alias("hi"),
    )
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("c_acctbal")))
    return (
        c.join(F.broadcast(cuts), "c_mktsegment")
        .groupBy("c_mktsegment", "lo", "hi")
        .agg(
            r4(F.sum("c_acctbal")).alias("sum_raw"),
            r4(F.sum(clipped)).alias("sum_winsorized"),
            F.count_if(F.col("c_acctbal") < F.col("lo")).alias("n_clipped_low"),
            F.count_if(F.col("c_acctbal") > F.col("hi")).alias("n_clipped_high"),
        )
    )


@query(
    "interval_overlap_merge",
    oracle="""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(floor(value * 60) AS BIGINT) * 1000000 AS e
  FROM events
),
marked AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   >= s THEN 0 ELSE 1 END AS is_new
  FROM iv
),
isl AS (
  SELECT user_id, s, e,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
per_island AS (
  SELECT user_id, island, count(*) AS cnt, max(e) - min(s) AS len
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(cnt) AS BIGINT) AS n_intervals,
       CAST(sum(len) AS BIGINT) AS covered_us
FROM per_island
GROUP BY user_id
""",
)
def interval_overlap_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals per user: each event spans [ts, ts + value
    minutes]; overlapping spans merge (gaps-and-islands with a RUNNING MAX
    boundary, the variant sessionize's fixed-gap rule can't express), and
    the output is per-user merged-interval count + exact covered
    microseconds.

    All arithmetic is integer µs — no float parity surface. One user_id
    shuffle feeds the two windows and the final aggregate.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (F.floor(F.col("value") * 60)).cast("long") * 1_000_000
        ).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    prev_max = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.withColumn(
        "is_new", F.when(prev_max >= F.col("s"), 0).otherwise(1)
    )
    isl = marked.withColumn(
        "island",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.max("e") - F.min("s")).alias("len"),
    )
    return per_island.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("cnt").alias("n_intervals"),
        F.sum("len").alias("covered_us"),
    )


@query(
    "win_cumulative_users",
    oracle="""
WITH first_seen AS (
  SELECT event_type, user_id, min(date_trunc('day', ts)) AS d
  FROM events GROUP BY event_type, user_id
),
daily_new AS (
  SELECT event_type, d, count(*) AS new_users
  FROM first_seen GROUP BY event_type, d
)
SELECT event_type, d AS day, new_users,
       CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY d
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cumulative_users
FROM daily_new
""",
)
def win_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event_type by day — computed the
    scale-RIGHT way: distinct-over-running-window is re-expressed as
    first-seen-day per (type, user) + a plain running SUM of daily news.
    A naive size(collect_set() OVER ...) holds every user id in window
    state; this shape shuffles each key once and streams. (The sketch
    variant for approximate cumulative distincts is agg_hll_sketch.)
    """
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy(
        "event_type", "user_id"
    ).agg(F.min(F.date_trunc("day", "ts")).alias("d"))
    daily_new = first_seen.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily_new.select(
        "event_type",
        F.col("d").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


@query(
    "seq_pattern_detect",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS t,
         lag(event_type) OVER w AS prev_type,
         lag(epoch_us(ts)) OVER w AS prev_t
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, count(*) AS n_purchases,
       count(*) FILTER (WHERE prev_type = 'click'
                          AND t - prev_t <= 600000000) AS n_click_then_buy
FROM seq WHERE event_type = 'purchase'
GROUP BY user_id
""",
)
def seq_pattern_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern detection (MATCH_RECOGNIZE-lite): purchases whose
    IMMEDIATELY preceding event for the user was a click at most 10 minutes
    earlier. One lag window over the (user, time) order, then a grouped
    conditional count — a single user_id shuffle at any scale.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "user_id",
        "event_type",
        t.alias("t"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag(t).over(w).alias("prev_t"),
    ).filter(F.col("event_type") == "purchase")
    matched = (F.col("prev_type") == "click") & (
        F.col("t") - F.col("prev_t") <= 600_000_000
    )
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count_if(matched).alias("n_click_then_buy"),
    )


@query(
    "agg_histogram_equi_depth",
    oracle="""
SELECT tile, count(*) AS n_orders,
       floor((min(o_totalprice)) * 10000 + 0.5) / 10000 AS lo,
       floor((max(o_totalprice)) * 10000 + 0.5) / 10000 AS hi
FROM (
  SELECT o_totalprice,
         CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS tile
  FROM orders
)
GROUP BY tile
""",
)
def agg_histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (10 equal-count buckets with their value
    boundaries) — the other histogram an optimizer keeps (hist_bins is the
    equi-WIDTH one). ntile over a (value, key) total order makes bucket
    assignment deterministic under price ties on both engines.

    Scale: rank2.global_ntile — two-phase range shuffle + local rank +
    broadcast offsets, with the exact SQL NTILE bucket arithmetic applied
    map-side from the global row number and total. No single-partition
    sort; identical buckets to the oracle's window because the order is a
    total order. (approx_percentile boundaries remain the sketch
    alternative — agg_percentile_approx covers that regime.)
    """
    o = load(spark, sf_dir, "orders")
    return (
        global_ntile(
            o.select("o_totalprice", "o_orderkey"),
            ["o_totalprice", "o_orderkey"],
            10,
            "tile",
        )
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(F.min("o_totalprice")).alias("lo"),
            r4(F.max("o_totalprice")).alias("hi"),
        )
    )


@query(
    "agg_regression",
    oracle="""
SELECT l_returnflag,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
       floor((regr_slope(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS slope,
       floor((regr_intercept(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS intercept,
       floor((regr_r2(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS r2,
       floor((regr_avgx(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS avg_x
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI linear-regression aggregates (regr_slope/intercept/r2/avgx/
    count) per return flag — the in-database OLS both engines implement to
    the same SQL:2003 definition. One grouped pass; all five statistics
    partial-aggregate as (n, Σx, Σy, Σxy, Σx², Σy²) map-side, so the
    shuffle carries six doubles per group at any scale.
    """
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("long").alias("n"),
        r4(F.regr_slope(y, x)).alias("slope"),
        r4(F.regr_intercept(y, x)).alias("intercept"),
        r4(F.regr_r2(y, x)).alias("r2"),
        r4(F.regr_avgx(y, x)).alias("avg_x"),
    )


@query(
    "agg_distribution_entropy",
    oracle="""
WITH cnt AS (
  SELECT c_mktsegment AS seg, e.event_type, count(*) AS n
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
  GROUP BY seg, e.event_type
),
tot AS (SELECT seg, sum(n) AS total FROM cnt GROUP BY seg)
SELECT cnt.seg,
       CAST(count(*) AS BIGINT) AS n_classes,
       floor((-sum((CAST(n AS DOUBLE) / total) * ln(CAST(n AS DOUBLE) / total)))
             * 10000 + 0.5) / 10000 AS entropy,
       floor((1.0 - sum(pow(CAST(n AS DOUBLE) / total, 2))) * 10000 + 0.5) / 10000
         AS gini_impurity
FROM cnt JOIN tot ON cnt.seg = tot.seg
GROUP BY cnt.seg
""",
)
def agg_distribution_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-distribution health per segment: Shannon entropy + Gini
    impurity of the event-type mix — the class-balance audit a training
    pipeline runs before sampling decisions. Two grouped passes over
    (segment, class) counts; the per-class table is tiny, so the second
    agg is broadcast-scale regardless of corpus size.
    """
    ev = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("seg")
    )
    cnt = (
        ev.join(c, "user_id")
        .groupBy("seg", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy("seg").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    return (
        cnt.join(F.broadcast(tot), "seg")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            r4(-F.sum(p * F.log(p))).alias("entropy"),
            r4(F.lit(1.0) - F.sum(F.pow(p, F.lit(2.0)))).alias("gini_impurity"),
        )
    )


@query(
    "win_session_window_fn",
    oracle="""
WITH p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
marked AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       floor((sum(value)) * 10000 + 0.5) / 10000 AS sum_value
FROM sess
GROUP BY user_id, sid
""",
)
def win_session_window_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase sessions via Spark's NATIVE session_window() table function
    in a batch aggregation — the engine-level sibling of sessionize_gap's
    hand-rolled gaps-and-islands (that key proves the window formulation;
    this one proves the built-in surface, including its exact boundary
    semantics: a session's end is last_event + gap, end-EXCLUSIVE, so an
    event landing exactly on the boundary starts a NEW session — the
    oracle's `>= gap` break condition mirrors that).

    Scale: session_window aggregation is one shuffle on user_id with
    merge-able session state — the same operator Structured Streaming uses
    for stream_session, here exercised on a bounded frame.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_user_lifecycle_state",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
),
lagged AS (
  SELECT user_id, wk,
         lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
  FROM uw
),
st AS (
  SELECT wk,
         CASE WHEN prev_wk IS NULL THEN 'new'
              WHEN epoch_us(wk) - epoch_us(prev_wk) <= 7 * 86400000000 THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM lagged
)
SELECT wk AS week_start, state, CAST(count(*) AS BIGINT) AS n_users
FROM st GROUP BY wk, state
""",
)
def events_user_lifecycle_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly user lifecycle accounting: each active (user, week) is
    classified as `new` (first-ever week), `retained` (also active the
    immediately preceding week) or `resurrected` (returning after a gap) —
    the growth-accounting decomposition every activity dashboard runs.

    One distinct pass to (user, week), one lag window on the user_id
    shuffle domain, then a 3-state rollup; week-gap math stays in integer
    microseconds.
    """
    ev = load(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    lagged = uw.select("wk", F.lag("wk").over(w).alias("prev_wk"))
    gap_us = F.unix_micros(F.col("wk").cast("timestamp")) - F.unix_micros(
        F.col("prev_wk").cast("timestamp")
    )
    state = (
        F.when(F.col("prev_wk").isNull(), "new")
        .when(gap_us <= 7 * 86_400_000_000, "retained")
        .otherwise("resurrected")
    )
    return (
        lagged.select(F.col("wk").alias("week_start"), state.alias("state"))
        .groupBy("week_start", "state")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


HDR_QS = ((50, "p50"), (95, "p95"), (99, "p99"))  # percentiles, integer-exact ranks


@query(
    "agg_hdr_histogram_quantiles",
    oracle=f"""
WITH cents AS MATERIALIZED (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders
),
hist AS MATERIALIZED (
  SELECT length(bin(c)) - 1 AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM cents GROUP BY length(bin(c)) - 1
),
cum AS MATERIALIZED (
  SELECT a.bucket, a.cnt, CAST(sum(b.cnt) AS BIGINT) AS cum_cnt
  FROM hist a JOIN hist b ON b.bucket <= a.bucket
  GROUP BY a.bucket, a.cnt
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM cents),
qs AS (
  SELECT q, lbl, (q * n_rows + 99) // 100 AS k, n_rows
  FROM n, (VALUES {", ".join(f"({q}, '{lbl}')" for q, lbl in HDR_QS)}) AS v(q, lbl)
),
est AS (
  SELECT qs.lbl, qs.q, qs.k, qs.n_rows,
         min(cum.bucket) AS bucket
  FROM qs JOIN cum ON cum.cum_cnt >= qs.k
  GROUP BY qs.lbl, qs.q, qs.k, qs.n_rows
),
ranked AS MATERIALIZED (
  SELECT c, row_number() OVER (ORDER BY c, o_orderkey) AS rn FROM cents
)
SELECT e.lbl AS quantile, e.n_rows, e.bucket,
       CAST(2 ** e.bucket AS BIGINT) AS est_lo_cents,
       CAST(2 ** (e.bucket + 1) - 1 AS BIGINT) AS est_hi_cents,
       r.c AS exact_cents,
       {R4("abs(CAST(2 ** e.bucket AS DOUBLE) - r.c) / r.c")} AS rel_err_lo
FROM est e JOIN ranked r ON r.rn = e.k
""",
)
def agg_hdr_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-style MERGEABLE histogram quantiles: order totals in exact
    cents land in power-of-two (log2) buckets — an integer-exact sketch
    whose per-bucket counts are associative, so partial histograms from a
    thousand executors (or a thousand days) merge by addition, the
    property percentile-monitoring at 100 TB actually needs. For p50/p95/
    p99 the graded row carries the sketch's bucket bounds AND the true
    order statistic at the same integer rank, with the relative error of
    the bucket floor — the sketch-vs-exact honesty check built into the
    operator.

    Integer discipline end-to-end: bucket = bit-length(cents) − 1 (never
    floor(log2(double)) — a ULP near a power of two must not move a
    bucket), ranks k = ceil(q·n) as pure integer arithmetic, and the
    exact order statistic rides the two-phase rank primitive
    (operators/rank2.py — no single-partition global sort). The
    cumulative bucket walk is a ≤64-row inequality self-join (bucket
    count is bounded by the value range's bit width at any scale).
    """
    from upflow_spark.operators.rank2 import global_row_number

    o = load(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    hist = cents.groupBy(
        (F.length(F.bin(F.col("c"))) - 1).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    ha = hist.select("bucket", "cnt")
    hb = hist.select(F.col("bucket").alias("b2"), F.col("cnt").alias("cnt2"))
    cum = (
        ha.join(hb, F.col("b2") <= F.col("bucket"))
        .groupBy("bucket", "cnt")
        .agg(F.sum("cnt2").alias("cum_cnt"))
    )
    n = cents.agg(F.count(F.lit(1)).alias("n_rows"))
    qs = (
        spark.createDataFrame(
            [(q, lbl) for q, lbl in HDR_QS], "q INT, lbl STRING"
        )
        .crossJoin(F.broadcast(n))
        .select(
            "q",
            "lbl",
            ((F.col("q") * F.col("n_rows") + 99) / 100)
            .cast("bigint")
            .alias("k"),
            "n_rows",
        )
    )
    est = (
        qs.join(cum, F.col("cum_cnt") >= F.col("k"))
        .groupBy("lbl", "q", "k", "n_rows")
        .agg(F.min("bucket").alias("bucket"))
    )
    ranked = global_row_number(cents, ["c", "o_orderkey"], out="rn")
    exact = ranked.select("rn", F.col("c").alias("exact_cents"))
    lo = F.pow(F.lit(2.0), F.col("bucket")).cast("bigint")
    hi = (F.pow(F.lit(2.0), F.col("bucket") + 1) - 1).cast("bigint")
    return (
        est.join(exact, est["k"] == exact["rn"])
        .select(
            F.col("lbl").alias("quantile"),
            "n_rows",
            "bucket",
            lo.alias("est_lo_cents"),
            hi.alias("est_hi_cents"),
            "exact_cents",
            r4(
                F.abs(
                    F.pow(F.lit(2.0), F.col("bucket")) - F.col("exact_cents")
                )
                / F.col("exact_cents")
            ).alias("rel_err_lo"),
        )
    )


@query(
    "win_running_distinct",
    oracle="""
WITH rdm AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS is_first
  FROM events
),
rdr AS (
  SELECT user_id, us, is_first,
         CAST(sum(is_first) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
  FROM rdm
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(running) AS BIGINT) AS n_distinct_types,
       CAST(min(CASE WHEN is_first = 1 AND running = 3 THEN us END)
            AS BIGINT) AS third_type_us
FROM rdr GROUP BY user_id
""",
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING DISTINCT COUNT per user over the event stream — the window
    SQL famously can't express directly (COUNT(DISTINCT) OVER is illegal
    in every engine): rewritten as the first-occurrence-flag cumsum, the
    production pattern for breadth-of-engagement milestones. Graded per
    user: event count, final distinct event-type count, and the timestamp
    (epoch µs) at which the user first reached THREE distinct types (the
    activation-milestone column; NULL if never).

    Both windows are PARTITIONED by user (first-occurrence flag by
    (user, type), the cumsum by user) — no global ordering anywhere, so
    the op scales as two user-keyed shuffles at any corpus size; ties are
    totally ordered by (ts, event_id).
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("ts_ns div 1000").cast("long").alias("us"),
    )
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "us", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = ev.withColumn(
        "is_first", (F.row_number().over(w_first) == 1).cast("int")
    ).withColumn("running", F.sum("is_first").over(w_run).cast("long"))
    return marked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("running").cast("long").alias("n_distinct_types"),
        F.min(
            F.when(
                (F.col("is_first") == 1) & (F.col("running") == 3), F.col("us")
            )
        )
        .cast("long")
        .alias("third_type_us"),
    )
