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


TSD_BUCKETS = 24  # downsample target: points per series


@query(
    "ts_downsample_lttb",
    oracle=f"""
WITH pts AS MATERIALIZED (
  SELECT event_type, ts, event_id,
         CAST(epoch_us(ts) AS DOUBLE) AS x, value AS y,
         ntile({TSD_BUCKETS}) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id) AS bucket
  FROM events
),
anch AS MATERIALIZED (
  SELECT event_type, bucket,
         CAST(sum(epoch_us(ts)) AS DOUBLE) / count(*) AS xm,
         CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS ym
  FROM pts GROUP BY event_type, bucket
),
ctx AS MATERIALIZED (
  SELECT event_type, bucket,
         lag(xm)  OVER w AS xp, lag(ym)  OVER w AS yp,
         lead(xm) OVER w AS xn, lead(ym) OVER w AS yn
  FROM anch WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
),
nb AS MATERIALIZED (
  SELECT event_type, max(bucket) AS lastb FROM pts GROUP BY event_type
),
scored AS MATERIALIZED (
  SELECT p.event_type, p.bucket, p.ts, p.event_id, p.y, n.lastb,
         COALESCE(
           {R4("abs((c.xp - c.xn) * (p.y - c.yp)"
               " - (c.xp - p.x) * (c.yn - c.yp))")},
           -1.0) AS area
  FROM pts p
  JOIN ctx c ON c.event_type = p.event_type AND c.bucket = p.bucket
  JOIN nb n  ON n.event_type = p.event_type
),
sel AS (
  SELECT event_type, bucket, ts, y FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS rn
    FROM scored WHERE bucket = 1) WHERE rn = 1
  UNION ALL
  SELECT event_type, bucket, ts, y FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM scored WHERE bucket = lastb AND lastb > 1) WHERE rn = 1
  UNION ALL
  SELECT event_type, bucket, ts, y FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type, bucket
                                 ORDER BY area DESC, ts, event_id) AS rn
    FROM scored WHERE bucket > 1 AND bucket < lastb) WHERE rn = 1
)
SELECT event_type, bucket, ts, y AS value FROM sel
""",
)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB-style visual downsampling (Steinarsson's
    largest-triangle-three-buckets, fixed-anchor variant): each per-type
    series collapses to ≤{TSD_BUCKETS} points — equal-count buckets, and
    from each middle bucket the point forming the LARGEST TRIANGLE with
    the neighboring buckets' mean anchors survives (first/last points are
    always kept). The downsample every dashboard runs before plotting a
    billion-point series: it preserves spikes and inflections that
    uniform/mean sampling erases.

    The fixed-anchor variant (neighbors' MEANS as triangle vertices, vs
    the original's previously-SELECTED point) is chosen deliberately: it
    removes the sequential bucket-to-bucket dependency, so the whole
    operator is two windows + one aggregate join — embarrassingly
    parallel per series at any scale, while the original is an inherently
    serial scan. Anchor means come from exact integer/decimal sums cast
    to double once; triangle areas are identical IEEE expression trees
    both engines round to 4dp BEFORE the argmax rank (the rounded-ADC
    tie-break discipline, ties broken by ts then event_id).
    """
    ev = load(spark, sf_dir, "events")
    wt = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pts = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).cast("double").alias("x"),
        F.col("value").alias("y"),
        F.ntile(TSD_BUCKETS).over(wt).cast("long").alias("bucket"),
    )
    anch = pts.groupBy("event_type", "bucket").agg(
        (
            F.sum(F.unix_micros(F.col("ts").cast("timestamp"))).cast("double")
            / F.count(F.lit(1))
        ).alias("xm"),
        (
            F.sum(F.col("y").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("ym"),
    )
    wb = Window.partitionBy("event_type").orderBy("bucket")
    ctx = anch.select(
        "event_type",
        "bucket",
        F.lag("xm").over(wb).alias("xp"),
        F.lag("ym").over(wb).alias("yp"),
        F.lead("xm").over(wb).alias("xn"),
        F.lead("ym").over(wb).alias("yn"),
    )
    nb = pts.groupBy("event_type").agg(F.max("bucket").alias("lastb"))
    area = F.coalesce(
        r4(
            F.abs(
                (F.col("xp") - F.col("xn")) * (F.col("y") - F.col("yp"))
                - (F.col("xp") - F.col("x")) * (F.col("yn") - F.col("yp"))
            )
        ),
        F.lit(-1.0),
    )
    scored = (
        pts.join(ctx, ["event_type", "bucket"])
        .join(F.broadcast(nb), "event_type")
        .select(
            "event_type", "bucket", "ts", "event_id", "y", "lastb",
            area.alias("area"),
        )
    )
    w_first = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_last = Window.partitionBy("event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    w_mid = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("area"), "ts", "event_id"
    )
    first = (
        scored.filter(F.col("bucket") == 1)
        .withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
    )
    last = (
        scored.filter((F.col("bucket") == F.col("lastb")) & (F.col("lastb") > 1))
        .withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
    )
    mid = (
        scored.filter(
            (F.col("bucket") > 1) & (F.col("bucket") < F.col("lastb"))
        )
        .withColumn("rn", F.row_number().over(w_mid))
        .filter(F.col("rn") == 1)
    )
    cols = ["event_type", "bucket", "ts", F.col("y").alias("value")]
    return (
        first.select(*cols)
        .unionByName(last.select(*cols))
        .unionByName(mid.select(*cols))
    )


SN_SEASON_DAYS = 7  # seasonal-naive lag and holdout length


@query(
    "events_forecast_snaive_backtest",
    oracle=f"""
WITH daily AS MATERIALIZED (
  SELECT date_trunc('day', ts) AS day,
         sum(CAST(value AS DECIMAL(18,2))) AS rev
  FROM events WHERE event_type = 'purchase'
  GROUP BY date_trunc('day', ts)
),
h AS (SELECT max(day) AS last_day FROM daily),
test AS MATERIALIZED (
  SELECT d.day, d.rev AS actual, f.rev AS forecast
  FROM daily d
  JOIN daily f ON f.day = d.day - INTERVAL {SN_SEASON_DAYS} DAY, h
  WHERE d.day > h.last_day - INTERVAL {SN_SEASON_DAYS} DAY
),
summ AS (
  SELECT {R4("avg(CAST(abs(actual - forecast) AS DOUBLE))")} AS mae,
         {R4("avg(CAST(abs(actual - forecast) AS DOUBLE)"
             " / CAST(actual AS DOUBLE))")} AS mape
  FROM test
)
SELECT t.day,
       {R4("CAST(t.actual AS DOUBLE)")} AS actual,
       {R4("CAST(t.forecast AS DOUBLE)")} AS forecast,
       {R4("CAST(abs(t.actual - t.forecast) AS DOUBLE)")} AS abs_err,
       s.mae, s.mape
FROM test t, summ s
""",
)
def events_forecast_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast BACKTEST — the baseline every forecasting
    pipeline must beat before it ships anything fancier: forecast(day) =
    actual(day − {SN_SEASON_DAYS}), evaluated on the last
    {SN_SEASON_DAYS}-day holdout of the daily purchase-revenue series,
    with per-day errors and the MAE/MAPE summary in the graded output.
    The operator IS the honest-baseline discipline (M-competition rule):
    a model that can't beat s-naive on the backtest doesn't deploy.

    Forecasts join by DATE ARITHMETIC (day − interval), not row offset,
    so calendar gaps never misalign the season. Revenue stays exact
    DECIMAL through the daily rollup and the error subtraction; only the
    final per-day casts and the {SN_SEASON_DAYS}-row error averages are
    doubles (4dp-rounded both sides). One events scan + one tiny self
    join on the per-day rollup — bounded by the observation window at
    any corpus scale.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"))
    )
    h = daily.agg(F.max("day").alias("last_day"))
    f = daily.select(
        (F.col("day") + F.expr(f"INTERVAL {SN_SEASON_DAYS} DAYS")).alias("day"),
        F.col("rev").alias("forecast"),
    )
    test = (
        daily.join(f, "day")
        .crossJoin(F.broadcast(h))
        .filter(
            F.col("day")
            > F.col("last_day") - F.expr(f"INTERVAL {SN_SEASON_DAYS} DAYS")
        )
        .select("day", F.col("rev").alias("actual"), "forecast")
    )
    abs_err = F.abs(F.col("actual") - F.col("forecast"))
    summ = test.agg(
        r4(F.avg(abs_err.cast("double"))).alias("mae"),
        r4(
            F.avg(abs_err.cast("double") / F.col("actual").cast("double"))
        ).alias("mape"),
    )
    return test.crossJoin(F.broadcast(summ)).select(
        "day",
        r4(F.col("actual").cast("double")).alias("actual"),
        r4(F.col("forecast").cast("double")).alias("forecast"),
        r4(abs_err.cast("double")).alias("abs_err"),
        "mae",
        "mape",
    )


def _bs_seg(sa: str, qa: str, sb: str, qb: str, na: str, nb: str) -> str:
    """Segment SSE over (a, b] from exact-decimal prefix sums, finished in
    one fixed double expression: Q - S*S/n (identical IEEE tree on both
    engines; mirrored token-for-token by the python driver fit)."""
    return (
        f"(CAST({qb} - {qa} AS DOUBLE)"
        f" - CAST({sb} - {sa} AS DOUBLE) * CAST({sb} - {sa} AS DOUBLE)"
        f" / ({nb} - {na}))"
    )


_BS_SEG0 = _bs_seg("0", "0", "p.s", "p.q", "0", "p.i")


@query(
    "ts_changepoint_binseg",
    oracle=f"""
WITH daily AS MATERIALIZED (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
  FROM orders GROUP BY 1
),
p AS MATERIALIZED (
  SELECT day,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
         CAST(sum(rev) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(38,4)) AS s,
         CAST(sum(CAST(floor(CAST(rev AS DECIMAL(19,2)) * CAST(rev AS DECIMAL(19,2))) AS DECIMAL(38,0))) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(38,0)) AS q
  FROM daily
),
tot AS MATERIALIZED (
  SELECT i AS n, s AS sn, q AS qn FROM p ORDER BY i DESC LIMIT 1
),
c1 AS (
  SELECT p.i, p.day,
         {_BS_SEG0}
         + {_bs_seg("p.s", "p.q", "t.sn", "t.qn", "p.i", "t.n")} AS sse
  FROM p, tot t WHERE p.i < t.n
),
s1 AS MATERIALIZED (SELECT i, day FROM c1 ORDER BY sse ASC, day ASC LIMIT 1),
p1 AS MATERIALIZED (
  SELECT p.i AS i1, p.s AS s1s, p.q AS s1q FROM p JOIN s1 ON p.i = s1.i
),
c2 AS (
  SELECT p.i, p.day,
         CASE WHEN p.i < o.i1 THEN
           {_BS_SEG0}
           + {_bs_seg("p.s", "p.q", "o.s1s", "o.s1q", "p.i", "o.i1")}
           + {_bs_seg("o.s1s", "o.s1q", "t.sn", "t.qn", "o.i1", "t.n")}
         ELSE
           {_bs_seg("0", "0", "o.s1s", "o.s1q", "0", "o.i1")}
           + {_bs_seg("o.s1s", "o.s1q", "p.s", "p.q", "o.i1", "p.i")}
           + {_bs_seg("p.s", "p.q", "t.sn", "t.qn", "p.i", "t.n")}
         END AS sse
  FROM p, tot t, p1 o WHERE p.i < t.n AND p.i <> o.i1
),
s2 AS MATERIALIZED (SELECT i FROM c2 ORDER BY sse ASC, day ASC LIMIT 1),
bnd AS MATERIALIZED (
  SELECT least(p1.i1, s2.i) AS a, greatest(p1.i1, s2.i) AS b FROM p1, s2
),
pa AS (SELECT p.* FROM p JOIN bnd ON p.i = bnd.a),
pb AS (SELECT p.* FROM p JOIN bnd ON p.i = bnd.b),
segs AS (
  SELECT 1 AS seg_id, (SELECT min(day) FROM p) AS start_day,
         pa.day AS end_day, pa.i AS n_days,
         CAST(pa.s AS DOUBLE) AS seg_sum,
         CAST(pa.s AS DOUBLE) / pa.i AS seg_mean,
         {_bs_seg("0", "0", "pa.s", "pa.q", "0", "pa.i")} AS seg_sse
  FROM pa
  UNION ALL
  SELECT 2, (SELECT day FROM p, bnd WHERE p.i = bnd.a + 1),
         pb.day, pb.i - pa.i,
         CAST(pb.s - pa.s AS DOUBLE),
         CAST(pb.s - pa.s AS DOUBLE) / (pb.i - pa.i),
         {_bs_seg("pa.s", "pa.q", "pb.s", "pb.q", "pa.i", "pb.i")}
  FROM pa, pb
  UNION ALL
  SELECT 3, (SELECT day FROM p, bnd WHERE p.i = bnd.b + 1),
         (SELECT day FROM p ORDER BY i DESC LIMIT 1), t.n - pb.i,
         CAST(t.sn - pb.s AS DOUBLE),
         CAST(t.sn - pb.s AS DOUBLE) / (t.n - pb.i),
         {_bs_seg("pb.s", "pb.q", "t.sn", "t.qn", "pb.i", "t.n")}
  FROM pb, tot t
)
SELECT CAST(seg_id AS BIGINT) AS seg_id, start_day, end_day,
       CAST(n_days AS BIGINT) AS n_days,
       {R4("seg_sum")} AS seg_sum, {R4("seg_mean")} AS seg_mean,
       {R4("seg_sse")} AS seg_sse
FROM segs
""",
)
def ts_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation change-point detection over the daily revenue
    series (the ruptures/binseg classic, completing the regime-change
    battery beside CUSUM, Hampel and STL): split 1 minimizes two-segment
    SSE over every candidate day; split 2 re-evaluates every remaining
    candidate against the fixed first split; graded output = the three
    segments (dates, day counts, sums, means, SSEs).

    Exactness: daily revenues and their prefix sums S_i, Q_i (= Σrev,
    Σrev²) are EXACT DECIMAL end-to-end, so every candidate's SSE is one
    fixed double expression over exact inputs — bit-identical across
    engines; argmin ties break to the earliest day. The corpus-sized work
    is the one groupBy(day) rollup; the series itself is bounded by the
    CALENDAR at any scale, so the binseg search is a driver-side model
    fit over ≤ a few thousand (day, S, Q) triples — the PQ-codebook
    "model on driver, data on cluster" topology, mirrored token-for-token
    by the oracle's SQL restatement.
    """
    import math
    from decimal import Decimal

    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
        .orderBy("day")
    )
    rows = daily.collect()  # bounded by the calendar at any corpus scale
    days = [r["day"] for r in rows]
    from decimal import ROUND_FLOOR

    s = [Decimal(0)]
    q = [0]  # scale-0: a DECIMAL(38,0) <-> double cast is ONE int->double
    # rounding on both engines (a (38,4) cast double-rounds in DuckDB:
    # scaled-int -> double, then /10^4 — observed 1-ULP drift at 1e15)
    for r in rows:
        rev = r["rev"]
        s.append(s[-1] + rev)
        q.append(q[-1] + int((rev * rev).to_integral_value(ROUND_FLOOR)))
    n = len(days)

    def sse(a: int, b: int) -> float:
        ds = float(s[b] - s[a])
        return float(q[b] - q[a]) - ds * ds / (b - a)

    c1 = [(sse(0, i) + sse(i, n), i) for i in range(1, n)]
    i1 = min(c1)[1]  # float min; ties impossible on continuous SSE, but
    # the tuple tie-break (sse, i) == (sse ASC, day ASC) regardless
    best2 = None
    for i in range(1, n):
        if i == i1:
            continue
        if i < i1:
            v = sse(0, i) + sse(i, i1) + sse(i1, n)
        else:
            v = sse(0, i1) + sse(i1, i) + sse(i, n)
        if best2 is None or (v, i) < best2:
            best2 = (v, i)
    i2 = best2[1]
    a, b = min(i1, i2), max(i1, i2)

    def r4f(x: float) -> float:
        return math.floor(x * 10000 + 0.5) / 10000

    def seg_row(k: int, lo: int, hi: int) -> tuple:
        tot = float(s[hi] - s[lo])
        return (
            k,
            days[lo],
            days[hi - 1],
            hi - lo,
            r4f(tot),
            r4f(tot / (hi - lo)),
            r4f(sse(lo, hi)),
        )

    out = [seg_row(1, 0, a), seg_row(2, a, b), seg_row(3, b, n)]
    return spark.createDataFrame(
        out,
        "seg_id long, start_day timestamp, end_day timestamp, n_days long,"
        " seg_sum double, seg_mean double, seg_sse double",
    )


ACF_MAX_LAG = 7
_ACF_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
_ACF_XBAR = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"


@query(
    "ts_acf_lags",
    oracle=f"""
WITH daily AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(sum({_ACF_CENTS}) AS BIGINT) AS x
  FROM orders GROUP BY o_orderdate
),
gstat AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS q
  FROM daily
),
ks AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, {ACF_MAX_LAG} + 1)),
per_k AS (
  SELECT k.lag,
         CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(CAST(a.x AS DECIMAL(19,0)) * CAST(b.x AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sp,
         CAST(sum(a.x) AS BIGINT) AS s1,
         CAST(sum(b.x) AS BIGINT) AS s2
  FROM ks k
  JOIN daily a ON TRUE
  JOIN daily b ON b.d = a.d + CAST(k.lag AS INTEGER)
  GROUP BY k.lag
)
SELECT p.lag, p.n_terms,
       {R4(
           f"(CAST(p.sp AS DOUBLE)"
           f" - {_ACF_XBAR} * (CAST(p.s1 AS DOUBLE) + CAST(p.s2 AS DOUBLE))"
           f" + CAST(p.n_terms AS DOUBLE) * {_ACF_XBAR} * {_ACF_XBAR})"
           f" / (CAST(q AS DOUBLE) - 2.0 * {_ACF_XBAR} * CAST(s AS DOUBLE)"
           f" + CAST(n AS DOUBLE) * {_ACF_XBAR} * {_ACF_XBAR})"
       )} AS acf
FROM per_k p, gstat
""",
)
def ts_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily-revenue series at lags
    1..{ACF_MAX_LAG} — the seasonality/memory diagnostic read before
    picking any forecasting model (companion to ts_seasonal_dow_profile's
    day-of-week means and events_forecast_snaive_backtest's lag-7 model):
    r_k = Σ(x_t−x̄)(x_{{t+k}}−x̄) / Σ(x_t−x̄)², global mean and global
    denominator per the standard estimator.

    Exactness discipline: daily revenue in integer cents; all sufficient
    statistics exact — S=Σx int64, Q=Σx² and SP_k=Σx_t·x_{{t+k}} in
    DECIMAL(38,0) at SCALE 0 (the single-rounding double-cast class: at
    sf1 daily-cents products exceed int64 but stay well inside 38
    digits). The centered numerator is recovered algebraically,
    Σ(x_t−x̄)(x_{{t+k}}−x̄) = SP_k − x̄(S1+S2) + n_k·x̄², so no float
    touches data until the final identical IEEE expression per engine.

    Shape: one groupBy(day) rollup of the fact table (map-side partial
    agg) to a calendar-bounded series, then a 7-way lag self-join ON
    date arithmetic — no windows, no sort; the daily relation broadcasts
    at any corpus scale (bounded by the calendar, not the data).
    """
    o = load(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(cents).cast("long").alias("x"))
        .localCheckpoint()  # calendar-bounded; feeds glob + both join legs
    )
    xdec = F.col("x").cast("decimal(19,0)")
    glob = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(xdec * xdec).cast("decimal(38,0)").alias("q"),
    )
    ks = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    pairs = (
        ks.crossJoin(a)
        .join(
            F.broadcast(b),
            F.col("db")
            == F.date_add(F.col("da"), F.col("lag").cast("int")),
        )
    )
    xad = F.col("xa").cast("decimal(19,0)")
    xbd = F.col("xb").cast("decimal(19,0)")
    per_k = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum(xad * xbd).cast("decimal(38,0)").alias("sp"),
        F.sum("xa").cast("long").alias("s1"),
        F.sum("xb").cast("long").alias("s2"),
    )
    xbar = F.col("s").cast("double") / F.col("n").cast("double")
    num = (
        F.col("sp").cast("double")
        - xbar * (F.col("s1").cast("double") + F.col("s2").cast("double"))
        + F.col("n_terms").cast("double") * xbar * xbar
    )
    den = (
        F.col("q").cast("double")
        - 2.0 * xbar * F.col("s").cast("double")
        + F.col("n").cast("double") * xbar * xbar
    )
    return per_k.crossJoin(F.broadcast(glob)).select(
        "lag", "n_terms", r4(num / den).alias("acf")
    )


HOLT_ALPHA = 0.3
HOLT_BETA = 0.1
_HOLT_OMA = 1.0 - HOLT_ALPHA
_HOLT_OMB = 1.0 - HOLT_BETA
HOLT_H = 7
_HA, _HB = repr(HOLT_ALPHA), repr(HOLT_BETA)
_HOA, _HOB = repr(_HOLT_OMA), repr(_HOLT_OMB)
# l_{t} inlined into b_{t} (same double either way — the expression is
# deterministic); spelled ONCE here and reused in the recursive member
_HOLT_LNEW = f"({_HA} * sx.x + {_HOA} * (rec.l + rec.b))"


@query(
    "ts_holt_linear_forecast",
    oracle=f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum({_ACF_CENTS}) AS DOUBLE) AS x
  FROM orders GROUP BY 1
),
sx AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY d) - 1 AS i, x FROM daily
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sx),
rec AS (
  SELECT CAST(0 AS BIGINT) AS i, a.x AS l, b.x - a.x AS b,
         CAST(0 AS DOUBLE) AS sse
  FROM sx a, sx b WHERE a.i = 0 AND b.i = 1
  UNION ALL
  SELECT rec.i + 1,
         {_HOLT_LNEW},
         {_HB} * ({_HOLT_LNEW} - rec.l) + {_HOB} * rec.b,
         rec.sse + (sx.x - (rec.l + rec.b)) * (sx.x - (rec.l + rec.b))
  FROM rec JOIN sx ON sx.i = rec.i + 1
),
fin AS (
  SELECT rec.l, rec.b, rec.sse, nn.n FROM rec, nn WHERE rec.i = nn.n - 1
),
hs AS (SELECT CAST(range AS BIGINT) AS horizon FROM range(1, {HOLT_H} + 1))
SELECT hs.horizon, fin.n AS n_days,
       {R4("fin.l + CAST(hs.horizon AS DOUBLE) * fin.b")} AS forecast_cents,
       {R4("fin.l")} AS level_cents,
       {R4("fin.b")} AS trend_cents,
       {R4("sqrt(fin.sse / CAST(fin.n - 1 AS DOUBLE))")} AS rmse_cents
FROM hs, fin
""",
)
def ts_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double) exponential smoothing over the daily
    revenue series — the parametric forecaster beside the model-free
    events_forecast_snaive_backtest and the diagnostics (ts_acf_lags says
    whether trend smoothing is warranted): l_t = αx_t + (1−α)(l_{{t−1}} +
    b_{{t−1}}), b_t = β(l_t − l_{{t−1}}) + (1−β)b_{{t−1}}, α={HOLT_ALPHA},
    β={HOLT_BETA}; graded = 7 forecast horizons ŷ(h) = l_n + h·b_n plus
    the final state and in-sample one-step RMSE.

    Parity needs SAMENESS, not convergence (the emb_pca_power_iteration
    rule): the fold is order-PINNED — the driver's sequential python loop
    over the date-sorted series executes the exact IEEE expression the
    oracle's recursive CTE steps through, literal-for-literal (the 1−α
    literals are injected via repr() because `1.0 − 0.3` and `0.7` are
    DIFFERENT doubles). Daily cents → double is a single exact int cast.

    The corpus-sized work is the one groupBy(day) rollup (map-side
    combinable); the series is CALENDAR-bounded at any scale, so the
    recurrence is a driver-side model fit — the binseg/PQ-codebook
    "model on driver, data on cluster" topology.
    """
    import math

    o = load(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(cents).cast("long").alias("c"))
        .orderBy("d")
    )
    xs = [float(r["c"]) for r in daily.collect()]  # calendar-bounded
    n = len(xs)
    schema = (
        "horizon long, n_days long, forecast_cents double,"
        " level_cents double, trend_cents double, rmse_cents double"
    )
    if n < 2:
        # degenerate relation rule (r12 ADVICE): Holt needs two points to
        # seed (l0, b0) — the oracle's recursive base case (rows i=0 AND
        # i=1) is empty then too, so both engines return the empty result
        return spark.createDataFrame([], schema)
    l, b, sse = xs[0], xs[1] - xs[0], 0.0
    for t in range(1, n):
        e = xs[t] - (l + b)
        l_new = HOLT_ALPHA * xs[t] + _HOLT_OMA * (l + b)
        b_new = HOLT_BETA * (l_new - l) + _HOLT_OMB * b
        sse = sse + e * e
        l, b = l_new, b_new

    def r4f(x: float) -> float:
        return math.floor(x * 10000 + 0.5) / 10000

    rmse = math.sqrt(sse / float(n - 1))
    out = [
        (h, n, r4f(l + float(h) * b), r4f(l), r4f(b), r4f(rmse))
        for h in range(1, HOLT_H + 1)
    ]
    return spark.createDataFrame(out, schema)
