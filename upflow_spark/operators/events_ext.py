"""Event-analytics operators, second wave (§2-P): marketing attribution
and rolling active-user metrics — the two dashboard primitives every
event pipeline ships.

Both are pure window/aggregate shapes with engine-identical semantics;
revenue sums are exact DECIMAL (parity.py accumulation-order rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import R4, r4
from upflow_spark.registry import query

TOUCH_TYPES = ("click", "view")
ATTR_WINDOW_US = 7 * 86400 * 1_000_000


@query(
    "events_attribution_last_touch",
    oracle=f"""
WITH seq AS (
  SELECT user_id, ts, event_type, value,
         last_value(CASE WHEN event_type IN ('click','view') THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type,
         last_value(CASE WHEN event_type IN ('click','view') THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts
  FROM events
),
conv AS (
  SELECT CASE WHEN touch_ts IS NOT NULL
               AND epoch_us(ts) - epoch_us(touch_ts) <= {ATTR_WINDOW_US}
              THEN touch_type ELSE 'organic' END AS channel,
         value
  FROM seq WHERE event_type = 'purchase'
)
SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
       floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 10000 + 0.5)
         / 10000 AS revenue
FROM conv GROUP BY channel
""",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to the
    user's most recent preceding click/view within a 7-day lookback, else
    'organic' — conversions and exact-decimal revenue per channel.

    One per-user ordered window (two IGNORE-NULLS last_value scans over the
    same frame — null on the same rows, so both come from the same touch
    event) + one 3-row rollup. The user_id partition key is
    high-cardinality, so the single shuffle spreads; at 100 TB this is the
    canonical sessionize-shape plan, and the lookback check is a map-side
    epoch-µs subtraction, not a join.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*TOUCH_TYPES)
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    in_window = F.col("touch_ts").isNotNull() & (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("touch_ts").cast("timestamp"))
        <= ATTR_WINDOW_US
    )
    conv = seq.filter(F.col("event_type") == "purchase").select(
        F.when(in_window, F.col("touch_type")).otherwise("organic").alias("channel"),
        "value",
    )
    return conv.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        r4(F.sum(F.col("value").cast("decimal(18,2)")).cast("double")).alias(
            "revenue"
        ),
    )


MAU_DAYS = 28
WAU_DAYS = 7


@query(
    "events_dau_wau_mau",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
days AS (SELECT DISTINCT day FROM ud)
SELECT d.day,
       CAST(count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS BIGINT)
         AS dau,
       CAST(count(DISTINCT CASE WHEN u.day >= d.day - INTERVAL {WAU_DAYS - 1} DAY
                                THEN u.user_id END) AS BIGINT) AS wau,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau,
       floor((CAST(count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS DOUBLE)
              / count(DISTINCT u.user_id)) * 10000 + 0.5) / 10000 AS stickiness
FROM days d
JOIN ud u ON u.day <= d.day AND u.day >= d.day - INTERVAL {MAU_DAYS - 1} DAY
GROUP BY d.day
""",
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active-user metrics per day: DAU, 7-day WAU, 28-day MAU, and
    the DAU/MAU stickiness ratio — the engagement dashboard row.

    Spark has no DISTINCT aggregate over a sliding window, so the scale
    shape is contribution EXPLODE, not a range join: each distinct
    (user, day) activity row fans out to the ≤28 target days it can count
    toward (a BOUNDED 28× multiplier, equi-shuffled on target day), then
    one groupBy(day) computes all three distinct counts with delta-gated
    CASE arguments. No non-equi join anywhere; at 100 TB the fan-out is
    map-side and the shuffle keys on ~#days × users.
    """
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    contrib = ud.select(
        "user_id",
        "day",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"INTERVAL {MAU_DAYS - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("target"),
    ).withColumn("delta", F.datediff("target", "day"))
    # only observed days emit a row (targets past the series end are
    # artifacts of the fan-out)
    obs = contrib.join(
        F.broadcast(days.select(F.col("day").alias("target"))), "target"
    )
    return (
        obs.groupBy(F.col("target").alias("day"))
        .agg(
            F.count_distinct(F.when(F.col("delta") == 0, F.col("user_id"))).alias(
                "dau"
            ),
            F.count_distinct(
                F.when(F.col("delta") <= WAU_DAYS - 1, F.col("user_id"))
            ).alias("wau"),
            F.count_distinct("user_id").alias("mau"),
            r4(
                F.count_distinct(
                    F.when(F.col("delta") == 0, F.col("user_id"))
                ).cast("double")
                / F.count_distinct("user_id")
            ).alias("stickiness"),
        )
    )


@query(
    "events_cohort_ltv",
    oracle="""
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
rev AS (
  SELECT f.cohort_week, e.user_id,
         CAST(floor(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7)
              AS BIGINT) AS age_week,
         CAST(e.value AS DECIMAL(18,2)) AS v
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
),
cohort_size AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
  FROM first_seen GROUP BY cohort_week
),
weekly AS (
  SELECT cohort_week, age_week, sum(v) AS wk_rev
  FROM rev GROUP BY cohort_week, age_week
)
SELECT w.cohort_week, w.age_week, c.n_users,
       floor((CAST(sum(w.wk_rev) OVER (PARTITION BY w.cohort_week
                                       ORDER BY w.age_week) AS DOUBLE)
              / c.n_users) * 10000 + 0.5) / 10000 AS cum_ltv_per_user
FROM weekly w JOIN cohort_size c ON w.cohort_week = c.cohort_week
""",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohorted by first-seen week;
    for each cohort × age-week, the CUMULATIVE purchase revenue per cohort
    member — the retention_cohorts companion that prices retention.

    Exact DECIMAL weekly sums, cumulated by an age-ordered window inside
    each cohort (decimal accumulation is order-insensitive, and the window
    order pins the prefix anyway); cohort sizes broadcast. Two shuffles
    total at any scale: min-per-user, then the (cohort, age) rollup.
    """
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("age_week"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
    )
    cohort_size = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    weekly = rev.groupBy("cohort_week", "age_week").agg(F.sum("v").alias("wk_rev"))
    w = Window.partitionBy("cohort_week").orderBy("age_week")
    return (
        weekly.join(F.broadcast(cohort_size), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            "n_users",
            r4(
                F.sum("wk_rev").over(w).cast("double") / F.col("n_users")
            ).alias("cum_ltv_per_user"),
        )
    )


@query(
    "events_user_overlap_jaccard",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_c,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p
  FROM events GROUP BY user_id
)
SELECT CAST(sum(has_c) AS BIGINT) AS n_click_users,
       CAST(sum(has_p) AS BIGINT) AS n_purchase_users,
       CAST(sum(has_c * has_p) AS BIGINT) AS n_both,
       floor((CAST(sum(has_c * has_p) AS DOUBLE)
              / (sum(has_c) + sum(has_p) - sum(has_c * has_p)))
             * 10000 + 0.5) / 10000 AS jaccard
FROM per_user
""",
)
def events_user_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience-overlap: |click users ∩ purchase users| and the
    Jaccard of the two cohorts — the set-intersection question theta/HLL
    sketches answer approximately, computed exactly with ONE user-keyed
    aggregate (per-user boolean flags, then integer sums: no distinct-pair
    join, no second shuffle; the same flags extend to any number of
    cohorts as extra columns)."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("has_c"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "has_p"
        ),
    )
    both = F.sum(F.col("has_c") * F.col("has_p"))
    return per_user.agg(
        F.sum("has_c").cast("long").alias("n_click_users"),
        F.sum("has_p").cast("long").alias("n_purchase_users"),
        both.cast("long").alias("n_both"),
        r4(
            both.cast("double")
            / (F.sum("has_c") + F.sum("has_p") - both)
        ).alias("jaccard"),
    )


SEQ_MAX = 16


@query(
    "seq_assemble_user_events",
    oracle=f"""
WITH s AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         list_slice(list(event_type ORDER BY ts, event_id), 1, {SEQ_MAX}) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(len(seq) AS BIGINT) AS seq_len,
       seq[1] AS first_type,
       seq[len(seq)] AS last_type,
       md5(array_to_string(seq, '>')) AS seq_fp
FROM s
""",
)
def seq_assemble_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-SEQUENCE assembly: each user's time-ordered event-type
    sequence, truncated to {SEQ_MAX} steps — the log-to-sequence transform
    behind behavioral-model training data (and the sequence twin of
    pack_token_bins). Verified via an order-sensitive fingerprint (md5 of
    the '>'-joined sequence), so the oracle checks the ORDERING, not just
    membership.

    Plan: ONE user-keyed aggregate — collect_list of (ts, event_id, type)
    structs, array_sort (struct order = field order, exactly the (ts, id)
    tie-broken event order), slice, transform to types. No window, no
    second shuffle; per-user state is bounded by the true sequence length
    (truncate-at-collect would cap even that via a slice pushdown at scale).
    """
    ev = load(spark, sf_dir, "events")
    seq = F.slice(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ),
        1,
        SEQ_MAX,
    )
    s = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), seq.alias("seq")
    )
    return s.select(
        "user_id",
        "n_events",
        F.size("seq").cast("long").alias("seq_len"),
        F.element_at("seq", 1).alias("first_type"),
        F.element_at("seq", -1).alias("last_type"),
        F.md5(F.concat_ws(">", "seq")).alias("seq_fp"),
    )


@query(
    "events_attribution_position",
    oracle=f"""
WITH p AS (
  SELECT event_id AS conv_id, user_id, ts AS pts,
         CAST(value AS DECIMAL(18,2)) AS val
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IN ('click','view')
),
j AS (
  SELECT p.conv_id, p.val, t.event_type AS channel, t.ts, t.event_id
  FROM p JOIN t ON p.user_id = t.user_id
   AND (t.ts < p.pts OR (t.ts = p.pts AND t.event_id < p.conv_id))
   AND epoch_us(p.pts) - epoch_us(t.ts) <= {ATTR_WINDOW_US}
),
r AS (
  SELECT conv_id, val, channel,
         row_number() OVER (PARTITION BY conv_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM j
),
c AS (
  SELECT channel, val,
         CAST(CASE WHEN n = 1 THEN 10000
                   WHEN n = 2 THEN 5000
                   WHEN rn = 1 OR rn = n THEN 4000
                   ELSE 2000 // (n - 2)
                        + CASE WHEN rn = 2 THEN 2000 % (n - 2) ELSE 0 END
              END AS BIGINT) AS bp
  FROM r
  UNION ALL
  SELECT 'organic' AS channel, val, CAST(10000 AS BIGINT) AS bp
  FROM p WHERE conv_id NOT IN (SELECT conv_id FROM j)
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_touches,
       {R4("CAST(sum(bp) AS DOUBLE) / 10000")} AS credit_conversions,
       {R4("CAST(sum(val * bp) AS DOUBLE) / 10000")} AS revenue_credited
FROM c GROUP BY channel
""",
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: every purchase's
    credit is split across ALL click/view touches in its 7-day lookback —
    40% first touch, 40% last, 20% spread over the middles (1 touch → 100%,
    2 touches → 50/50); untouched purchases stay 'organic'. Per channel:
    touch count, credited conversions, credited revenue.

    Exact-money design: credits are INTEGER BASIS POINTS that sum to
    exactly 10000 per conversion (the 20% middle share is integer-divided
    with the remainder assigned to the earliest middle touch), so credited
    revenue is a DECIMAL×BIGINT integer-exact aggregate — no fractional
    credit float ever crosses a row boundary, and both engines divide by
    10000 once at the very end (the parity.py accumulation-order rule
    applied to attribution math).

    Plan: the touch-purchase pairing is a user-keyed equi-join with a
    map-side lookback predicate (per-user touch sets are bounded), then
    two windows over conv_id — a high-cardinality partition key, so both
    the join and the windows spread across the cluster; the final rollup
    carries ≤3 rows per partition. At 100 TB the only skew risk is a
    power-user with massive touch history; the lookback predicate caps the
    blast radius to 7 days per conversion.
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.col("value").cast("decimal(18,2)").alias("val"),
    )
    t = ev.filter(F.col("event_type").isin(*TOUCH_TYPES)).select(
        "user_id", "ts", "event_id", "event_type"
    )
    before = (F.col("ts") < F.col("pts")) | (
        (F.col("ts") == F.col("pts")) & (F.col("event_id") < F.col("conv_id"))
    )
    within = (
        F.unix_micros(F.col("pts").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
        <= ATTR_WINDOW_US
    )
    cond = (F.col("p_user") == F.col("user_id")) & before & within
    j = p.join(t, cond).select(
        "conv_id", "val", F.col("event_type").alias("channel"), "ts", "event_id"
    )
    wo = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("conv_id")
    r = j.select(
        "conv_id",
        "val",
        "channel",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bp = (
        F.when(F.col("n") == 1, F.lit(10000))
        .when(F.col("n") == 2, F.lit(5000))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(4000))
        .otherwise(
            F.expr("2000 div (n - 2)")
            + F.when(F.col("rn") == 2, F.expr("2000 % (n - 2)")).otherwise(0)
        )
        .cast("long")
    )
    touched = r.select("channel", "val", bp.alias("bp"))
    organic = p.join(t, cond, "left_anti").select(
        F.lit("organic").alias("channel"),
        "val",
        F.lit(10000).cast("long").alias("bp"),
    )
    return (
        touched.unionByName(organic)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            r4(F.sum("bp").cast("double") / 10000).alias("credit_conversions"),
            r4(F.sum(F.col("val") * F.col("bp")).cast("double") / 10000).alias(
                "revenue_credited"
            ),
        )
    )


KM_GAP_US = 30 * 60 * 1_000_000  # session gap rule (30 min)
KM_CENSOR_US = 3600 * 1_000_000  # sessions ending within 1h of horizon: censored


@query(
    "events_survival_km",
    oracle=f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {KM_GAP_US}
              THEN 1 ELSE 0 END AS ns
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM g
),
ses AS MATERIALIZED (
  SELECT user_id, sid, min(ts) AS st, max(ts) AS en
  FROM s GROUP BY user_id, sid
),
h AS (SELECT max(en) AS horizon FROM ses),
u AS MATERIALIZED (
  SELECT CAST(floor((epoch_us(en) - epoch_us(st)) / 60000000.0) AS BIGINT) AS t,
         CASE WHEN epoch_us(horizon) - epoch_us(en) >= {KM_CENSOR_US}
              THEN 1 ELSE 0 END AS ev
  FROM ses, h
),
cnts AS MATERIALIZED (
  SELECT t, CAST(count(*) AS BIGINT) AS c_all, CAST(sum(ev) AS BIGINT) AS d_t
  FROM u GROUP BY t
),
r AS MATERIALIZED (
  SELECT a.t, a.d_t, CAST(sum(b.c_all) AS BIGINT) AS n_t
  FROM cnts a JOIN cnts b ON b.t >= a.t
  GROUP BY a.t, a.d_t
)
SELECT t AS t_minutes, n_t AS n_at_risk, d_t AS n_events,
       CASE WHEN max(CASE WHEN d_t = n_t THEN 1 ELSE 0 END)
                 OVER (ORDER BY t) = 1 THEN 0.0
            ELSE {R4("exp(sum(CASE WHEN d_t < n_t THEN "
                     "ln(1.0 - CAST(d_t AS DOUBLE) / n_t) END) "
                     "OVER (ORDER BY t))")}
       END AS survival
FROM r WHERE d_t > 0
""",
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over SESSION durations: sessions come
    from the 30-minute gap rule, a session's lifetime is its
    first-to-last-event span in whole minutes, and sessions ending within
    an hour of the observation horizon are CENSORED (they may still have
    been live when the window closed); everyone else is an 'ended'
    event at their duration. Per event time: risk-set size, ended count,
    and the KM estimate Π(1 − d/n) — the duration curve that handles
    right-censoring correctly, which a naive duration histogram doesn't.

    Shape: the sessionize pass is two user-partitioned windows + one
    groupBy (the sessionize_gap plan family, high-cardinality keys), and
    everything after happens on the per-duration-minute rollup — a
    relation bounded by the longest session in minutes at ANY corpus
    scale, so the risk-set inequality join and the ordered product are
    constant-size. The running product is exp(Σ ln(1−d/n)) in the SAME
    ordered window on both engines (the ts_cusum explicit-order
    precedent), from doubles derived identically from integer counts;
    the unpartitioned window is justified in TINY_WINDOW_OK.
    """
    ev = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    eus = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(F.col("ts")).over(wo)
    ns = F.when(
        prev.isNull()
        | (eus - F.unix_micros(prev.cast("timestamp")) > KM_GAP_US),
        1,
    ).otherwise(0)
    g = ev.select("user_id", "ts", "event_id", ns.alias("ns"))
    s = g.select(
        "user_id",
        "ts",
        F.sum("ns").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("sid"),
    )
    ses = s.groupBy("user_id", "sid").agg(
        F.min("ts").alias("st"), F.max("ts").alias("en")
    )
    h = ses.agg(F.max("en").alias("horizon"))
    en_us = F.unix_micros(F.col("en").cast("timestamp"))
    st_us = F.unix_micros(F.col("st").cast("timestamp"))
    hor_us = F.unix_micros(F.col("horizon").cast("timestamp"))
    u = ses.crossJoin(F.broadcast(h)).select(
        F.floor((en_us - st_us) / 60000000.0).cast("long").alias("t"),
        F.when(hor_us - en_us >= KM_CENSOR_US, 1).otherwise(0).alias("ev"),
    )
    cnts = u.groupBy("t").agg(
        F.count(F.lit(1)).alias("c_all"), F.sum("ev").alias("d_t")
    )
    a = cnts.select(F.col("t"), F.col("d_t"))
    b = cnts.select(F.col("t").alias("t2"), F.col("c_all"))
    r = (
        a.join(b, F.col("t2") >= F.col("t"))
        .groupBy("t", "d_t")
        .agg(F.sum("c_all").alias("n_t"))
    )
    # KM convention: once d_t = n_t (the whole risk set ends) survival is
    # exactly 0 from that time on — branch BEFORE ln so neither engine
    # evaluates ln(0) (DuckDB raises, Spark nulls)
    w = Window.orderBy("t")
    factor = F.when(
        F.col("d_t") < F.col("n_t"),
        F.log(1.0 - F.col("d_t").cast("double") / F.col("n_t")),
    )
    zero_seen = F.max(
        F.when(F.col("d_t") == F.col("n_t"), 1).otherwise(0)
    ).over(w)
    surv = F.when(zero_seen == 1, F.lit(0.0)).otherwise(
        r4(F.exp(F.sum(factor).over(w)))
    )
    return (
        r.withColumn("survival", surv)
        .filter(F.col("d_t") > 0)
        .select(
            F.col("t").alias("t_minutes"),
            F.col("n_t").alias("n_at_risk"),
            F.col("d_t").alias("n_events"),
            "survival",
        )
    )


@query(
    "events_ab_lift_hashbucket",
    oracle=f"""
WITH assign AS MATERIALIZED (
  SELECT user_id,
         CAST(('0x' || substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1))
              AS INT) % 2 AS arm
  FROM (SELECT DISTINCT user_id FROM events)
),
per_user AS MATERIALIZED (
  SELECT a.user_id, a.arm,
         COALESCE(sum(CAST(e.value AS DECIMAL(18,2)))
                  FILTER (e.event_type = 'purchase'),
                  CAST(0 AS DECIMAL(18,2))) AS rev
  FROM assign a LEFT JOIN events e ON e.user_id = a.user_id
  GROUP BY a.user_id, a.arm
),
g AS (
  SELECT CAST(count(*) FILTER (arm = 0) AS BIGINT) AS n_a,
         CAST(count(*) FILTER (arm = 1) AS BIGINT) AS n_b,
         CAST(sum(rev) FILTER (arm = 0) AS DOUBLE) AS s_a,
         CAST(sum(rev) FILTER (arm = 1) AS DOUBLE) AS s_b,
         CAST(sum(rev * rev) FILTER (arm = 0) AS DOUBLE) AS q_a,
         CAST(sum(rev * rev) FILTER (arm = 1) AS DOUBLE) AS q_b
  FROM per_user
)
SELECT n_a, n_b,
       {R4("s_a / n_a")} AS mean_a,
       {R4("s_b / n_b")} AS mean_b,
       {R4("(s_b / n_b) / (s_a / n_a) - 1.0")} AS lift,
       {R4("(s_b / n_b - s_a / n_a) - 1.96 * sqrt("
           "(q_a - s_a * s_a / n_a) / (n_a - 1) / n_a"
           " + (q_b - s_b * s_b / n_b) / (n_b - 1) / n_b)")} AS ci_lo,
       {R4("(s_b / n_b - s_a / n_a) + 1.96 * sqrt("
           "(q_a - s_a * s_a / n_a) / (n_a - 1) / n_a"
           " + (q_b - s_b * s_b / n_b) / (n_b - 1) / n_b)")} AS ci_hi
FROM g
""",
)
def events_ab_lift_hashbucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with HASH-BUCKET assignment — the online-
    experimentation primitive: every user is deterministically assigned
    an arm by md5('exp1:' user_id) parity (the salted-hash assignment
    real experiment platforms use — stable across sessions, reproducible
    across engines, no assignment table to store), the metric is
    per-user purchase revenue (zero for non-purchasers — the unit of
    analysis is the USER, so heavy users don't double-count), and the
    readout is mean per arm, relative lift, and the Welch 95% CI of the
    absolute difference.

    Variances come from exact DECIMAL per-user sums (rev and rev² are
    2dp/4dp-representable; the stat_welch_ttest accumulation rule) and
    the CI is finished in one identical IEEE expression per engine. One
    user-keyed aggregate + one 2-group rollup — at 100 TB the experiment
    readout is a single pass however many arms or metrics ride along.
    """
    ev = load(spark, sf_dir, "events")
    assign = ev.select("user_id").distinct().select(
        "user_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("int")
            % 2
        ).alias("arm"),
    )
    per_user = (
        assign.join(ev, "user_id", "left")
        .groupBy("user_id", "arm")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(18,2)"),
                    )
                ),
                F.lit(0).cast("decimal(18,2)"),
            ).alias("rev")
        )
    )
    cnt = lambda a: F.count(F.when(F.col("arm") == a, 1))  # noqa: E731
    ssum = lambda a, c: F.sum(F.when(F.col("arm") == a, c)).cast("double")  # noqa: E731
    g = per_user.agg(
        cnt(0).alias("n_a"),
        cnt(1).alias("n_b"),
        ssum(0, F.col("rev")).alias("s_a"),
        ssum(1, F.col("rev")).alias("s_b"),
        ssum(0, F.col("rev") * F.col("rev")).alias("q_a"),
        ssum(1, F.col("rev") * F.col("rev")).alias("q_b"),
    )
    mean_a = F.col("s_a") / F.col("n_a")
    mean_b = F.col("s_b") / F.col("n_b")
    se = F.sqrt(
        (F.col("q_a") - F.col("s_a") * F.col("s_a") / F.col("n_a"))
        / (F.col("n_a") - 1)
        / F.col("n_a")
        + (F.col("q_b") - F.col("s_b") * F.col("s_b") / F.col("n_b"))
        / (F.col("n_b") - 1)
        / F.col("n_b")
    )
    return g.select(
        "n_a",
        "n_b",
        r4(mean_a).alias("mean_a"),
        r4(mean_b).alias("mean_b"),
        r4(mean_b / mean_a - 1.0).alias("lift"),
        r4((mean_b - mean_a) - 1.96 * se).alias("ci_lo"),
        r4((mean_b - mean_a) + 1.96 * se).alias("ci_hi"),
    )


RETN_K = 6  # retention lags (weeks) fitted
RETN_UNAT = 10**6  # ln values quantized to integer micro-nats before sums


@query(
    "events_retention_curve_fit",
    oracle=f"""
WITH ra AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
  FROM events
),
rc AS MATERIALIZED (
  SELECT user_id, min(wk) AS cohort FROM ra GROUP BY user_id
),
rmx AS (SELECT max(wk) AS mx FROM ra),
rk AS (SELECT CAST(unnest(range(1, {RETN_K} + 1)) AS BIGINT) AS k),
rrisk AS (
  SELECT k.k, CAST(count(*) AS BIGINT) AS at_risk
  FROM rk k, rc, rmx WHERE rc.cohort + k.k <= rmx.mx GROUP BY k.k
),
rret AS (
  SELECT k.k, CAST(count(*) AS BIGINT) AS retained
  FROM rk k JOIN rc ON true JOIN ra
    ON ra.user_id = rc.user_id AND ra.wk = rc.cohort + k.k
  GROUP BY k.k
),
rpts AS MATERIALIZED (
  SELECT r.k, r.at_risk, coalesce(t.retained, 0) AS retained,
         CAST(floor(ln(CAST(coalesce(t.retained, 0) AS DOUBLE) / r.at_risk)
              * {RETN_UNAT} + 0.5) AS BIGINT) AS ly,
         CAST(floor(ln(CAST(r.k AS DOUBLE)) * {RETN_UNAT} + 0.5) AS BIGINT)
           AS lx
  FROM rrisk r LEFT JOIN rret t ON r.k = t.k
  WHERE coalesce(t.retained, 0) > 0 AND r.at_risk > 0
),
rfit AS (
  SELECT CAST(count(*) AS BIGINT) AS np,
         CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
         CAST(sum(lx * lx) AS BIGINT) AS sxx,
         CAST(sum(lx * ly) AS BIGINT) AS sxy
  FROM rpts
),
rab AS (
  -- degenerate-relation rule (ADVICE r13): with a single usable lag point
  -- the slope denominator np*sxx - sx*sx is 0 and the engines' x/0
  -- semantics diverge (DuckDB IEEE Inf/NaN vs Spark NULL) — np >= 2 drops
  -- the fit identically on both sides (distinct k => distinct lx, so the
  -- denominator is nonzero whenever np >= 2)
  SELECT np,
         (CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS braw
  FROM rfit WHERE np >= 2
),
rab2 AS (
  SELECT rab.np, rab.braw,
         (CAST(rfit.sy AS DOUBLE) / {RETN_UNAT}
          - rab.braw * CAST(rfit.sx AS DOUBLE) / {RETN_UNAT})
           / rab.np AS araw
  FROM rab, rfit
)
SELECT p.k, p.at_risk, p.retained,
       floor((CAST(p.retained AS DOUBLE) / p.at_risk) * 10000 + 0.5) / 10000
         AS rate,
       floor(exp(a.araw + a.braw * CAST(p.lx AS DOUBLE) / {RETN_UNAT})
             * 10000 + 0.5) / 10000 AS fitted_rate,
       floor(a.braw * 10000 + 0.5) / 10000 AS slope_b,
       floor(a.araw * 10000 + 0.5) / 10000 AS intercept_a
FROM rpts p, rab2 a
""",
)
def events_retention_curve_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention power-law fit — the forecasting summary ON TOP of
    retention_cohorts: pooled weekly retention rates r_k (users active k
    weeks after their first-activity week / users at risk at lag k) for
    k = 1..{RETN_K}, fitted as ln r_k = a + b·ln k (the power-law decay a
    growth team extrapolates). Graded per lag: at-risk and retained
    counts, the observed and fitted rate, plus the shared (a, b).

    Exactness: counts are exact ints; each point's ln values are one
    identical IEEE expression quantized to integer MICRO-NATS before the
    fit sums (the micro-nat rule — Σ over ≤{RETN_K} points is exact
    int64, order-free), and the closed-form least squares finishes in
    identical double trees. Zero-retained / at-risk-empty lags drop out
    of the fit on both sides (degenerate-relation rule).

    Scale: activity = one DISTINCT (user, week) rollup; cohorts = one
    groupBy(user) min; at-risk/retained = joins against the ≤{RETN_K}-row
    lag spine — calendar-bounded, never event-sized, after the first
    rollup shuffle.
    """
    ev = load(spark, sf_dir, "events")
    ra = (
        ev.select(
            "user_id",
            F.expr("ts_ns div 1000").cast("long").alias("us"),
        )
        .select("user_id", F.expr("us div 604800000000").cast("long").alias("wk"))
        .distinct()
        .localCheckpoint()  # read by cohorts, max-week, and retained joins
    )
    rc = ra.groupBy("user_id").agg(F.min("wk").cast("long").alias("cohort"))
    mx = ra.agg(F.max("wk").alias("mx"))
    ks = spark.range(1, RETN_K + 1).select(F.col("id").cast("long").alias("k"))
    risk = (
        ks.crossJoin(F.broadcast(mx))
        .join(rc, F.col("cohort") + F.col("k") <= F.col("mx"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("at_risk"))
    )
    ret = (
        ks.join(rc, F.lit(True))
        .join(
            ra.select(F.col("user_id").alias("u2"), F.col("wk").alias("w2")),
            (F.col("u2") == F.col("user_id"))
            & (F.col("w2") == F.col("cohort") + F.col("k")),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("retained"))
    )
    pts = (
        risk.join(ret, "k", "left")
        .select(
            "k",
            "at_risk",
            F.coalesce("retained", F.lit(0)).cast("long").alias("retained"),
        )
        .filter((F.col("retained") > 0) & (F.col("at_risk") > 0))
        .select(
            "k",
            "at_risk",
            "retained",
            F.floor(
                F.log(F.col("retained").cast("double") / F.col("at_risk"))
                * RETN_UNAT
                + F.lit(0.5)
            )
            .cast("long")
            .alias("ly"),
            F.floor(F.log(F.col("k").cast("double")) * RETN_UNAT + F.lit(0.5))
            .cast("long")
            .alias("lx"),
        )
        .localCheckpoint()  # read by the fit aggregate AND the output join
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).cast("long").alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).cast("long").alias("sxy"),
    )
    # np >= 2 mirrors the oracle's degenerate guard (ADVICE r13): one fit
    # point makes the slope denominator exactly 0, where Spark's non-ANSI
    # double division (NULL) and DuckDB's IEEE (Inf/NaN) silently diverge;
    # with the guard BOTH engines emit zero rows for the degenerate input
    fit = fit.filter(F.col("np") >= 2)
    npd = F.col("np").cast("double")
    braw = (npd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        npd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    ab = fit.select(
        "np",
        braw.alias("braw"),
        "sx",
        "sy",
    ).select(
        "np",
        "braw",
        (
            (
                F.col("sy").cast("double") / RETN_UNAT
                - F.col("braw") * F.col("sx").cast("double") / RETN_UNAT
            )
            / F.col("np")
        ).alias("araw"),
    )
    return pts.crossJoin(F.broadcast(ab)).select(
        "k",
        "at_risk",
        "retained",
        r4(F.col("retained").cast("double") / F.col("at_risk")).alias("rate"),
        r4(
            F.exp(
                F.col("araw")
                + F.col("braw") * F.col("lx").cast("double") / RETN_UNAT
            )
        ).alias("fitted_rate"),
        r4(F.col("braw")).alias("slope_b"),
        r4(F.col("araw")).alias("intercept_a"),
    )


MKV_SPLIT_BP = 7000  # temporal split: first 70% of the calendar window


@query(
    "events_markov_next_eval",
    oracle=f"""
WITH mne_seq AS MATERIALIZED (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
mne_win AS (
  SELECT min(us) AS lo,
         min(us) + (max(us) - min(us)) * {MKV_SPLIT_BP} // 10000 AS cut
  FROM mne_seq
),
mne_pairs AS MATERIALIZED (
  SELECT s.prev_type, s.event_type AS next_type, s.us < w.cut AS is_train
  FROM mne_seq s, mne_win w WHERE s.prev_type IS NOT NULL
),
mne_tr AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM mne_pairs WHERE is_train GROUP BY prev_type, next_type
),
mne_pred AS MATERIALIZED (
  SELECT prev_type, next_type AS predicted, n AS n_train_top FROM (
    SELECT *, row_number() OVER (PARTITION BY prev_type
      ORDER BY n DESC, next_type ASC) AS rk FROM mne_tr
  ) WHERE rk = 1
),
mne_tr_tot AS (
  SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_train FROM mne_tr
  GROUP BY prev_type
),
mne_te AS (
  SELECT p.prev_type, CAST(count(*) AS BIGINT) AS n_test,
         CAST(count(*) FILTER (p.next_type = d.predicted) AS BIGINT)
           AS n_correct
  FROM mne_pairs p LEFT JOIN mne_pred d ON p.prev_type = d.prev_type
  WHERE NOT p.is_train GROUP BY p.prev_type
),
mne_rows AS (
  SELECT t.prev_type, tt.n_train, d.predicted, t.n_test, t.n_correct
  FROM mne_te t
  LEFT JOIN mne_pred d ON t.prev_type = d.prev_type
  LEFT JOIN mne_tr_tot tt ON t.prev_type = tt.prev_type
)
SELECT prev_type, coalesce(n_train, 0) AS n_train, predicted,
       n_test, n_correct,
       floor((CAST(n_correct AS DOUBLE) / n_test) * 10000 + 0.5) / 10000
         AS top1_acc
FROM mne_rows
UNION ALL
SELECT '__ALL__', CAST(sum(coalesce(n_train, 0)) AS BIGINT),
       NULL, CAST(sum(n_test) AS BIGINT), CAST(sum(n_correct) AS BIGINT),
       floor((CAST(sum(n_correct) AS DOUBLE) / sum(n_test)) * 10000 + 0.5)
         / 10000
FROM mne_rows
""",
)
def events_markov_next_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction EVAL on a temporal split — the honest
    companion to events_markov_transition's fitted matrix: train the
    first-order argmax predictor on transitions completing in the first
    {MKV_SPLIT_BP} bp of the calendar window, score top-1 accuracy on the
    rest (per prev_type + an __ALL__ rollup). Train-before-test is the
    split a production sequence model actually gets; random splits leak.

    Determinism: the split point is integer arithmetic on epoch-µs; the
    per-state argmax tie-breaks (count desc, next_type asc); counts are
    exact ints and only the accuracy divides (r4). A prev_type seen only
    in test carries a NULL prediction and scores 0 — the honest cold-start
    bill (degenerate-relation rule, mirrored in the oracle's left join).

    Scale: one lag window over the user shuffle domain, then everything
    aggregates on the ≤|event-type|² transition space — margin tables,
    never event-sized joins.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.expr("ts_ns div 1000").cast("long").alias("us"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    # the calendar window spans ALL events (each user's first event has no
    # pair but still anchors min/max — the oracle measures the same span)
    win = ev.select(F.expr("ts_ns div 1000").cast("long").alias("us")).agg(
        (
            F.min("us")
            + F.expr(f"(max(us) - min(us)) * {MKV_SPLIT_BP} div 10000")
        ).alias("cut")
    )
    pairs = seq.crossJoin(F.broadcast(win)).select(
        "prev_type",
        F.col("event_type").alias("next_type"),
        (F.col("us") < F.col("cut")).alias("is_train"),
    )
    tr = (
        pairs.filter("is_train")
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wrk = Window.partitionBy("prev_type").orderBy(
        F.col("n").desc(), F.col("next_type").asc()
    )
    pred = (
        tr.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select("prev_type", F.col("next_type").alias("predicted"))
    )
    tr_tot = tr.groupBy("prev_type").agg(F.sum("n").cast("long").alias("n_train"))
    te = (
        pairs.filter(~F.col("is_train"))
        .join(pred, "prev_type", "left")
        .groupBy("prev_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.count(F.when(F.col("next_type") == F.col("predicted"), 1))
            .cast("long")
            .alias("n_correct"),
        )
    )
    rows = (
        te.join(pred, "prev_type", "left")
        .join(tr_tot, "prev_type", "left")
        .select(
            "prev_type",
            F.coalesce("n_train", F.lit(0)).cast("long").alias("n_train"),
            "predicted",
            "n_test",
            "n_correct",
        )
        .localCheckpoint()  # read by the per-state rows AND the rollup
    )
    allr = rows.agg(
        F.lit("__ALL__").alias("prev_type"),
        F.sum("n_train").cast("long").alias("n_train"),
        F.lit(None).cast("string").alias("predicted"),
        F.sum("n_test").cast("long").alias("n_test"),
        F.sum("n_correct").cast("long").alias("n_correct"),
    )
    acc = r4(F.col("n_correct").cast("double") / F.col("n_test"))
    return rows.unionByName(allr).select(
        "prev_type", "n_train", "predicted", "n_test", "n_correct",
        acc.alias("top1_acc"),
    )
