"""Data-mining / analytics extensions (round 5): graph metrics, streaming
sketches with exact verification rails, distribution tests, segmentation.

Same conventions as every other module (SURVEY.md §2 header): identical
aliases Spark/SQL, floats through the r4/R4 deterministic rounding, no
row-at-a-time Python in hot paths. No reference implementation exists to
cite (/root/reference is empty — SURVEY §0); shapes follow the standard
published formulations (Misra–Gries 1982 counters, degree-oriented triangle
counting, two-sample Kolmogorov–Smirnov, RFM/ABC retail segmentation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.operators.rank2 import global_cumsum, global_ntile, global_row_number
from upflow_spark.parity import R4, r4
from upflow_spark.pipeline.text import SQL_TOKENS, tokens_col
from upflow_spark.registry import query


@query(
    "graph_triangle_count",
    oracle="""
WITH pl AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 4 = 0
),
e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM pl a JOIN pl b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1 JOIN e e2 ON e1.pb = e2.pa JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
""",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the part co-order graph (parts ≡ 0 mod 4 — a
    stated deterministic 1/4 node sample; the full graph's 72M-wedge join
    adds nothing methodologically at fixture scale).

    Edges: part pairs appearing in the same order. Triangles via the
    wedge-then-close plan: e1(a,b) ⋈ e2(b,c) on the shared middle node,
    then an equi-join against the edge set to close (a,c). Both closing
    joins BROADCAST the ~75k-row edge table, so the wedge stream never
    shuffles. At 100 TB: degree-ordered orientation (low→high) bounds wedge
    work at O(m^1.5), edges become the shuffle-join side, and AQE
    skew-split handles hub nodes.
    """
    pl = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = pl.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = pl.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
        .localCheckpoint()  # read three times (e1 stream + two broadcasts)
    )
    n_edges = edges.count()
    e2 = edges.select(F.col("pa").alias("pb"), F.col("pb").alias("pc"))
    wedges = edges.join(F.broadcast(e2), "pb").select("pa", F.col("pc").alias("pb"))
    tri = wedges.join(F.broadcast(edges), ["pa", "pb"])
    return tri.agg(
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.count(F.lit(1)).alias("n_triangles"),
    )


@query(
    "agg_heavy_hitters",
    oracle=f"""
WITH tok AS (SELECT unnest({SQL_TOKENS}) AS term FROM documents),
c AS (SELECT term, count(*) AS n_occurrences FROM tok GROUP BY term),
tot AS (SELECT sum(n_occurrences) AS s FROM c)
SELECT term, n_occurrences FROM c, tot WHERE n_occurrences * 30 >= s
""",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """φ = 1/30 heavy hitters over the document token stream, via the
    distributed Misra–Gries pipeline: per-partition MG(k=64) counter
    sketches → candidate union → EXACT recount of candidates only →
    threshold filter.

    The sketch guarantee makes the output exact: any term with frequency
    > n/(k+1) survives every per-partition MG pass, and k=64 > 30, so the
    candidate set provably contains every φ=1/30 heavy hitter; the recount
    then removes false positives. At 100 TB this is the shape that works:
    the full-stream groupBy only ever aggregates candidate terms (a
    broadcast semi-join prunes the explode), never the open vocabulary.
    Comparison is integer-exact (n*30 >= total), no float thresholds.
    """
    import pandas as pd

    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tok = d.select(F.explode(tokens_col()).alias("term"))

    def mg_sketch(batches):
        counters: dict[str, int] = {}
        k = 64
        for pdf in batches:
            for t in pdf["term"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:  # decrement-all step (dict rebuild, amortized O(1)/item)
                    counters = {c: v - 1 for c, v in counters.items() if v > 1}
        yield pd.DataFrame({"term": list(counters), "lb": list(counters.values())})

    candidates = (
        tok.mapInPandas(mg_sketch, "term string, lb long")
        .groupBy("term")
        .agg(F.sum("lb").alias("lb"))
        .select("term")
    )
    total = tok.agg(F.count(F.lit(1)).alias("s"))
    exact = (
        tok.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * 30 >= F.col("s"))
        .select("term", "n_occurrences")
    )


@query(
    "stat_ks_two_sample",
    oracle="""
WITH x AS (
  SELECT value,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isb
  FROM events WHERE event_type IN ('click', 'purchase')
),
tot AS (SELECT sum(isa) AS na, sum(isb) AS nb FROM x),
g AS (SELECT value, sum(isa) AS ca, sum(isb) AS cb FROM x GROUP BY value),
cum AS (
  SELECT sum(ca) OVER (ORDER BY value) AS fa,
         sum(cb) OVER (ORDER BY value) AS fb
  FROM g
)
SELECT floor(max(abs(fa / CAST(na AS DOUBLE) - fb / CAST(nb AS DOUBLE))) * 10000 + 0.5) / 10000 AS ks_d,
       CAST(max(na) AS BIGINT) AS n_click,
       CAST(max(nb) AS BIGINT) AS n_purchase
FROM cum, tot
""",
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the click and
    purchase `value` distributions: D = max_x |F_click(x) − F_purchase(x)|,
    ECDFs evaluated at every distinct pooled value.

    Plan: one groupBy(value) collapses the stream to distinct values with
    per-sample counts, then rank2.global_cumsum builds BOTH cumulative
    counts two-phase (range shuffle + per-partition running sums +
    broadcast offsets — no single-partition sort; the distinct-value
    relation grows with data, measured 17,792 values at 100k events).
    Counts are integers so the re-associated two-phase addition is exact;
    the ECDF division is the only float op and the max of |Δ| is taken
    before rounding.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    x = ev.select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("isa"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("isb"),
    )
    g = x.groupBy("value").agg(F.sum("isa").alias("ca"), F.sum("isb").alias("cb"))
    cum = global_cumsum(
        g, ["value"], {"fa": F.col("ca"), "fb": F.col("cb")}
    ).select("fa", "fb")
    tot = x.agg(F.sum("isa").alias("na"), F.sum("isb").alias("nb"))
    d = cum.crossJoin(F.broadcast(tot)).select(
        (
            F.abs(
                F.col("fa") / F.col("na").cast("double")
                - F.col("fb") / F.col("nb").cast("double")
            )
        ).alias("diff"),
        "na",
        "nb",
    )
    return d.agg(
        r4(F.max("diff")).alias("ks_d"),
        F.max("na").alias("n_click"),
        F.max("nb").alias("n_purchase"),
    )


@query(
    "seg_rfm_scores",
    oracle="""
WITH m AS (
  SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS n_orders,
         floor(sum(o_totalprice) * 100 + 0.5) AS spend_cents
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       CAST(ntile(5) OVER (ORDER BY last_order, o_custkey) AS BIGINT) AS r_score,
       CAST(ntile(5) OVER (ORDER BY n_orders, o_custkey) AS BIGINT) AS f_score,
       CAST(ntile(5) OVER (ORDER BY spend_cents, o_custkey) AS BIGINT) AS m_score
FROM m
""",
)
def seg_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quintile scores per customer for Recency (last
    order date), Frequency (order count), Monetary (lifetime spend).

    Spend is quantized to integer cents BEFORE ranking — ntile over a raw
    double sum would let partial-agg addition order flip neighbors whose
    sums differ only in ULPs; cents + custkey tie-break make every ordering
    integer-deterministic across engines. Three rank2.global_ntile passes
    (two-phase: range shuffle + local rank + broadcast offsets + exact SQL
    NTILE arithmetic from global rn and total — no single-partition sort)
    share one localCheckpoint'd per-customer aggregate and re-join on
    custkey; each ordering is a total order so the quintiles are identical
    to the oracle's global windows at any partitioning.
    """
    o = load(spark, sf_dir, "orders")
    m = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.floor(F.sum("o_totalprice") * 100 + 0.5).alias("spend_cents"),
    ).localCheckpoint()  # read by three independent rank passes
    r = global_ntile(
        m.select("o_custkey", "last_order"), ["last_order", "o_custkey"], 5, "r_score"
    ).select("o_custkey", "r_score")
    f = global_ntile(
        m.select("o_custkey", "n_orders"), ["n_orders", "o_custkey"], 5, "f_score"
    ).select("o_custkey", "f_score")
    mo = global_ntile(
        m.select("o_custkey", "spend_cents"), ["spend_cents", "o_custkey"], 5, "m_score"
    ).select("o_custkey", "m_score")
    return r.join(f, "o_custkey").join(mo, "o_custkey").select(
        "o_custkey", "r_score", "f_score", "m_score"
    )


@query(
    "abc_pareto_parts",
    oracle="""
WITH rev AS (
  SELECT l_partkey, floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000 AS revenue
  FROM lineitem GROUP BY l_partkey
),
c AS (
  SELECT l_partkey, revenue,
         sum(revenue) OVER (ORDER BY revenue DESC, l_partkey) AS cum,
         sum(revenue) OVER () AS tot
  FROM rev
)
SELECT l_partkey, revenue,
       floor(cum / tot * 10000 + 0.5) / 10000 AS cum_share,
       CASE WHEN floor(cum / tot * 10000 + 0.5) / 10000 <= 0.7 THEN 'A'
            WHEN floor(cum / tot * 10000 + 0.5) / 10000 <= 0.9 THEN 'B'
            ELSE 'C' END AS abc_class
FROM c
""",
)
def abc_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification of parts by cumulative revenue share
    (A = first 70% of revenue, B = to 90%, C = tail).

    Revenue is 4dp-rounded BEFORE the cumulative sum, then scaled to exact
    integer 4dp-units (longs) for rank2's TWO-PHASE ordered cumsum — the
    re-associated addition is bit-exact, so Spark's cumulative total is the
    true Σkᵢ/10000 regardless of partitioning (DuckDB's float window sum
    sits within ulps of the same rational; the ROUNDED share comparison
    absorbs it, as it did for the old sequential-window formulation). No
    single-partition WindowExec; the grand total rides the same broadcast
    offsets relation.
    """
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
    )
    units = F.round(F.col("revenue") * 10000).cast("long")
    c = global_cumsum(
        rev.withColumn("u", units),
        [("revenue", "desc"), "l_partkey"],
        {"cum_u": F.col("u")},
        totals={"cum_u": "tot_u"},
    )
    share = r4(F.col("cum_u").cast("double") / F.col("tot_u").cast("double"))
    return c.select(
        "l_partkey",
        "revenue",
        share.alias("cum_share"),
        F.when(share <= 0.7, "A").when(share <= 0.9, "B").otherwise("C").alias("abc_class"),
    )


@query(
    "funnel_time_to_convert",
    oracle="""
WITH fc AS (
  SELECT user_id, min(ts) AS first_click FROM events
  WHERE event_type = 'click' GROUP BY user_id
),
lat AS (
  SELECT e.user_id,
         (epoch_us(min(e.ts)) - epoch_us(fc.first_click)) / 1e6 AS latency_s
  FROM events e JOIN fc ON e.user_id = fc.user_id AND e.ts >= fc.first_click
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id, fc.first_click
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       floor(avg(latency_s) * 10000 + 0.5) / 10000 AS avg_latency_s,
       floor(quantile_cont(latency_s, 0.5) * 10000 + 0.5) / 10000 AS p50_latency_s,
       floor(quantile_cont(latency_s, 0.9) * 10000 + 0.5) / 10000 AS p90_latency_s
FROM lat
""",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion-latency distribution: per user, seconds
    from first click to the first purchase at-or-after it; then count, mean
    and exact p50/p90 over converting users.

    Plan: two aggs on one user_id shuffle domain (first click via groupBy,
    first subsequent purchase via a broadcast-joined filter + groupBy), all
    latency math in integer µs until the final /1e6. percentile() here is
    Spark's exact percentile — at 100 TB switch to approx_percentile, the
    same trade documented on agg_percentile_approx.
    """
    ev = load(spark, sf_dir, "events")
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    lat = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(fc), "user_id")
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id", "first_click")
        .agg(F.min("ts").alias("first_purchase"))
        .select(
            (
                (
                    F.unix_micros(F.col("first_purchase").cast("timestamp"))
                    - F.unix_micros(F.col("first_click").cast("timestamp"))
                )
                / 1e6
            ).alias("latency_s")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        r4(F.avg("latency_s")).alias("avg_latency_s"),
        r4(F.percentile("latency_s", F.lit(0.5))).alias("p50_latency_s"),
        r4(F.percentile("latency_s", F.lit(0.9))).alias("p90_latency_s"),
    )


@query(
    "text_zipf_slope",
    oracle=f"""
WITH tok AS (SELECT unnest({SQL_TOKENS}) AS term FROM documents),
c AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rnk FROM c)
SELECT floor(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(rnk AS DOUBLE))) * 10000 + 0.5) / 10000 AS zipf_slope,
       floor(regr_r2(ln(CAST(n AS DOUBLE)), ln(CAST(rnk AS DOUBLE))) * 10000 + 0.5) / 10000 AS fit_r2,
       CAST(count(*) AS BIGINT) AS n_terms
FROM r
""",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus token frequencies: OLS slope of
    ln(freq) on ln(rank) (natural text ≈ −1; this templated corpus is much
    flatter — the STATISTIC is the point, it's a standard corpus-quality
    probe for training-data pipelines).

    Map-side tokenize + one groupBy(term); ranking 31 terms is a trivial
    single-partition window; regr_slope/regr_r2 are native Catalyst
    aggregates (no UDF).
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens_col()).alias("term"))
    c = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    rnk = c.select(
        "n",
        F.row_number().over(Window.orderBy(F.col("n").desc(), "term")).alias("rnk"),
    )
    lf = F.log(F.col("n").cast("double"))
    lr = F.log(F.col("rnk").cast("double"))
    return rnk.agg(
        r4(F.regr_slope(lf, lr)).alias("zipf_slope"),
        r4(F.regr_r2(lf, lr)).alias("fit_r2"),
        F.count(F.lit(1)).alias("n_terms"),
    )


@query(
    "stat_chi2_independence",
    oracle="""
WITH x AS (
  SELECT event_type, least(CAST(floor(value / 50) AS BIGINT), 4) AS vbucket
  FROM events
),
o AS (SELECT event_type, vbucket, CAST(count(*) AS DOUBLE) AS obs FROM x GROUP BY 1, 2),
rt AS (SELECT event_type, sum(obs) AS r FROM o GROUP BY 1),
ct AS (SELECT vbucket, sum(obs) AS c FROM o GROUP BY 1),
n AS (SELECT sum(obs) AS total FROM o)
SELECT floor((sum(pow(obs - rt.r * ct.c / n.total, 2) / (rt.r * ct.c / n.total))) * 10000 + 0.5) / 10000 AS chi2,
       CAST((count(DISTINCT o.event_type) - 1) * (count(DISTINCT o.vbucket) - 1) AS BIGINT) AS dof,
       CAST(max(n.total) AS BIGINT) AS n
FROM o JOIN rt USING (event_type) JOIN ct USING (vbucket), n
""",
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² test of independence between event_type and the
    value-range bucket (floor(value/50), clamped to 5 buckets): observed
    vs expected contingency counts, χ² = Σ (O−E)²/E with
    dof = (rows−1)(cols−1).

    Plan: one groupBy builds the contingency table (≤25 cells), margins
    come from two re-aggregations of that tiny table, and the χ² fold is a
    single agg over the cells — nothing after the first shuffle touches
    row-scale data, which is exactly how a 100 TB χ² runs.
    """
    ev = load(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(4)).alias("vbucket"),
    )
    o = x.groupBy("event_type", "vbucket").agg(
        F.count(F.lit(1)).cast("double").alias("obs")
    )
    rt = o.groupBy("event_type").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("vbucket").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs").alias("total"))
    cells = (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "vbucket")
        .crossJoin(F.broadcast(n))
    )
    expected = F.col("r") * F.col("c") / F.col("total")
    return cells.agg(
        r4(F.sum(F.pow(F.col("obs") - expected, 2) / expected)).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("vbucket") - 1)
        ).alias("dof"),
        F.max("total").cast("long").alias("n"),
    )


@query(
    "graph_degree_stats",
    oracle="""
WITH pl AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 4 = 0
),
e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM pl a JOIN pl b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e)
  GROUP BY node
)
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(max(degree) AS BIGINT) AS max_degree,
       floor((avg(degree)) * 10000 + 0.5) / 10000 AS avg_degree,
       floor((quantile_cont(degree, 0.5)) * 10000 + 0.5) / 10000 AS p50_degree,
       floor((quantile_cont(degree, 0.9)) * 10000 + 0.5) / 10000 AS p90_degree
FROM deg
""",
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-order graph (same edge set as
    graph_triangle_count): node count, max/avg degree, exact p50/p90 —
    the graph-shape profile that decides whether triangle counting /
    CC need skew handling (a heavy-tailed p90/max gap ⇒ hub nodes ⇒
    orient-by-degree or salt).

    Edges materialize once; degrees are one unionAll + groupBy(node).
    """
    pl = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = pl.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = pl.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("degree").alias("max_degree"),
        r4(F.avg("degree")).alias("avg_degree"),
        r4(F.percentile("degree", F.lit(0.5))).alias("p50_degree"),
        r4(F.percentile("degree", F.lit(0.9))).alias("p90_degree"),
    )


@query(
    "events_markov_transition",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
),
t AS (SELECT prev_type, sum(n) AS tot FROM c GROUP BY prev_type)
SELECT c.prev_type, c.next_type, CAST(c.n AS BIGINT) AS n,
       floor((CAST(c.n AS DOUBLE) / t.tot) * 10000 + 0.5) / 10000 AS p
FROM c JOIN t USING (prev_type)
""",
)
def events_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event-type
    sequence: P(next | prev) with counts — the behavioral-sequence model
    behind next-event prediction and anomaly scoring.

    One window pass (lag over the user_id shuffle domain) + one groupBy on
    the 25-cell transition space; row-normalization joins the 5-row margin
    back broadcast. Sequence order is (ts, event_id) — fully deterministic
    under timestamp ties.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        r4(F.col("n").cast("double") / F.col("tot")).alias("p"),
    )


@query(
    "text_cooccurrence_pmi",
    oracle=f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
),
df AS (SELECT term, count(*) AS d FROM dt GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS nd FROM dt),
co AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS dab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
)
SELECT term_a, term_b, CAST(dab AS BIGINT) AS n_docs,
       floor((log2(CAST(dab AS DOUBLE) * n.nd / (da.d * db.d))) * 10000 + 0.5) / 10000 AS pmi
FROM co
JOIN df da ON da.term = term_a
JOIN df db ON db.term = term_b, n
WHERE dab >= 5
""",
)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs at the document level:
    PMI(a,b) = log₂(N·df(a,b) / (df(a)·df(b))), support ≥ 5 docs — the
    collocation/association signal topic models and phrase mining start
    from.

    The per-doc pair expansion is bounded by the vocabulary (distinct
    tokens per doc), not doc length; document frequencies broadcast back
    onto the pair counts. At open vocabulary, prune by per-term df first
    (standard frequent-pair mining) — same plan as basket_part_pairs.
    """
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    dt = d.select(
        "doc_id", F.explode(F.array_distinct(tokens_col())).alias("term")
    ).localCheckpoint()  # read three times (df, n, both sides of the pair join)
    df_ = dt.groupBy("term").agg(F.count(F.lit(1)).alias("d"))
    nd = dt.agg(F.countDistinct("doc_id").alias("nd"))
    a = dt.select("doc_id", F.col("term").alias("term_a"))
    b = dt.select("doc_id", F.col("term").alias("term_b"))
    co = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("dab"))
        .filter(F.col("dab") >= 5)
    )
    da = df_.select(F.col("term").alias("term_a"), F.col("d").alias("da"))
    db = df_.select(F.col("term").alias("term_b"), F.col("d").alias("db"))
    pmi = F.log2(
        F.col("dab").cast("double") * F.col("nd") / (F.col("da") * F.col("db"))
    )
    return (
        co.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .crossJoin(F.broadcast(nd))
        .select(
            "term_a",
            "term_b",
            F.col("dab").alias("n_docs"),
            r4(pmi).alias("pmi"),
        )
    )


@query(
    "orders_interarrival_stats",
    oracle="""
WITH gaps AS (
  SELECT datediff('day',
                  lag(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS gap_days
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n_gaps,
       floor((avg(gap_days)) * 10000 + 0.5) / 10000 AS avg_gap_days,
       floor((quantile_cont(gap_days, 0.5)) * 10000 + 0.5) / 10000 AS p50_gap_days,
       floor((quantile_cont(gap_days, 0.9)) * 10000 + 0.5) / 10000 AS p90_gap_days,
       CAST(max(gap_days) AS BIGINT) AS max_gap_days
FROM gaps WHERE gap_days IS NOT NULL
""",
)
def orders_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order inter-arrival distribution: days between consecutive
    orders per customer, summarized (count, mean, exact p50/p90, max) —
    the survival/repeat-purchase primitive behind churn models.

    One lag window over the o_custkey shuffle domain; the day arithmetic
    stays integer until the final statistics.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate").over(w).cast("date"),
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        r4(F.avg("gap_days")).alias("avg_gap_days"),
        r4(F.percentile("gap_days", F.lit(0.5))).alias("p50_gap_days"),
        r4(F.percentile("gap_days", F.lit(0.9))).alias("p90_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
    )


@query(
    "stat_benford_first_digit",
    oracle="""
WITH d AS (
  SELECT substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1)
           AS digit
  FROM orders WHERE o_totalprice > 0
),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
t AS (SELECT sum(n) AS tot FROM c)
SELECT digit, CAST(n AS BIGINT) AS n,
       floor((CAST(n AS DOUBLE) / t.tot) * 10000 + 0.5) / 10000 AS share,
       floor((log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) * 10000 + 0.5) / 10000
         AS benford_expected
FROM c, t
""",
)
def stat_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed first-significant-digit
    shares vs the log₁₀(1+1/d) expectation — the classic fraud/synthetic-
    data screen (TPC-H-style uniform prices fail it, visibly and
    deterministically).

    First digits are extracted through INTEGER cents (floor(x·100+0.5) →
    BIGINT → string), never by formatting the double — float-to-string is
    the one cast the two engines render differently.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").cast("string"),
            1,
            1,
        ).alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        r4(F.col("n").cast("double") / F.col("tot")).alias("share"),
        r4(F.log10(1.0 + 1.0 / F.col("digit").cast("double"))).alias(
            "benford_expected"
        ),
    )


@query(
    "agg_gini_concentration",
    oracle="""
WITH s AS (
  SELECT floor(sum(o_totalprice) * 100 + 0.5) AS spend_cents
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT spend_cents,
         row_number() OVER (ORDER BY spend_cents) AS i,
         count(*) OVER () AS n,
         sum(spend_cents) OVER () AS tot
  FROM s
)
SELECT CAST(max(n) AS BIGINT) AS n_customers,
       floor(((2.0 * sum(i * spend_cents) / (max(n) * max(tot)))
              - (max(n) + 1.0) / max(n)) * 10000 + 0.5) / 10000 AS gini
FROM r
""",
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime spend (revenue concentration):
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending-sorted spends — the
    inequality metric behind whale-customer analysis.

    Spend quantized to integer cents so ranks are engine-deterministic
    (ties broken by the stable sort on equal cents are rank-sum invariant:
    equal x values contribute the same Σ i·x for any permutation of their
    positions). One agg + rank2's two-phase global rank (no
    single-partition sort); n and Σx ride a broadcast 1-row aggregate
    instead of unpartitioned scalar windows.
    """
    o = load(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100 + 0.5).alias("spend_cents")
    )
    nt = s.agg(
        F.count(F.lit(1)).alias("n"), F.sum("spend_cents").alias("tot")
    )
    r = global_row_number(s, ["spend_cents"], out="i").crossJoin(F.broadcast(nt))
    gini = (
        2.0 * F.sum(F.col("i") * F.col("spend_cents"))
        / (F.max("n") * F.max("tot"))
    ) - (F.max("n") + 1.0) / F.max("n")
    return r.agg(
        F.max("n").cast("long").alias("n_customers"),
        r4(gini).alias("gini"),
    )


@query(
    "events_funnel_paths_topk",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type, 1) OVER w AS p1,
         lag(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT p2 || '>' || p1 || '>' || event_type AS path,
       CAST(count(*) AS BIGINT) AS n_paths
FROM seq WHERE p2 IS NOT NULL
GROUP BY path
ORDER BY n_paths DESC, path ASC
LIMIT 10
""",
)
def events_funnel_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent 3-step behavioral paths (event-type trigrams
    per user sequence) — the sequence-mining cousin of
    events_markov_transition (order-2 context instead of order-1).

    One window pass produces both lags; the 125-cell path space aggregates
    with map-side combine and the top-10 compiles to
    TakeOrderedAndProject.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(">", "p2", "p1", "event_type").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), F.col("path").asc())
        .limit(10)
    )


@query(
    "stat_mannwhitney_u",
    oracle="""
WITH x AS (
  SELECT value,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isb
  FROM events WHERE event_type IN ('click', 'purchase')
),
g AS (SELECT value, sum(isa) AS ca, sum(isb) AS cb FROM x GROUP BY value),
r AS (
  SELECT ca, cb,
         sum(ca + cb) OVER (ORDER BY value) - (ca + cb) AS before_cnt,
         (ca + cb) AS c
  FROM g
),
tot AS (SELECT sum(isa) AS na, sum(isb) AS nb FROM x)
SELECT CAST(max(tot.na) AS BIGINT) AS n_click,
       CAST(max(tot.nb) AS BIGINT) AS n_purchase,
       floor((sum(ca * (before_cnt + (c + 1.0) / 2.0))
              - max(tot.na) * (max(tot.na) + 1.0) / 2.0) * 10000 + 0.5) / 10000
         AS u_click,
       floor((max(tot.na) * CAST(max(tot.nb) AS DOUBLE)
              - (sum(ca * (before_cnt + (c + 1.0) / 2.0))
                 - max(tot.na) * (max(tot.na) + 1.0) / 2.0)) * 10000 + 0.5) / 10000
         AS u_purchase
FROM r, tot
""",
)
def stat_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U statistics (rank-sum test) comparing click vs
    purchase value distributions, with proper MIDRANKS for ties:
    midrank(v) = #(smaller) + (#(equal)+1)/2, R₁ = Σ ca(v)·midrank(v),
    U₁ = R₁ − n₁(n₁+1)/2, U₂ = n₁n₂ − U₁ — the distribution-free
    complement to stat_ks_two_sample (location shift vs shape).

    All quantities are integers or exact half-integers below 2⁵³, so the
    sums are bit-exact across engines despite being doubles. One
    groupBy(value) + rank2's two-phase cumulative count (integer-exact
    under re-association; no single-partition sort), same plan skeleton as
    the KS key; before_cnt = inclusive cumsum − own count.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    x = ev.select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("isa"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("isb"),
    )
    g = x.groupBy("value").agg(F.sum("isa").alias("ca"), F.sum("isb").alias("cb"))
    c = F.col("ca") + F.col("cb")
    r = global_cumsum(g, ["value"], {"cum": c}).select(
        "ca",
        (F.col("cum") - c).alias("before_cnt"),
        c.alias("c"),
    )
    tot = x.agg(F.sum("isa").alias("na"), F.sum("isb").alias("nb"))
    midrank = F.col("before_cnt") + (F.col("c") + 1.0) / 2.0
    folded = r.crossJoin(F.broadcast(tot))
    r1 = F.sum(F.col("ca") * midrank)
    na, nb = F.max("na"), F.max("nb")
    u1 = r1 - na * (na + 1.0) / 2.0
    return folded.agg(
        na.cast("long").alias("n_click"),
        nb.cast("long").alias("n_purchase"),
        r4(u1).alias("u_click"),
        r4(na * nb.cast("double") - u1).alias("u_purchase"),
    )


@query(
    "basket_affinity_lift",
    oracle="""
WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 4 = 0),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM po),
supp AS (SELECT l_partkey, count(*) AS s FROM po GROUP BY l_partkey),
pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS sab
  FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY part_a, part_b
)
SELECT part_a, part_b, CAST(sab AS BIGINT) AS n_co_orders,
       floor((CAST(sab AS DOUBLE) / sa.s) * 10000 + 0.5) / 10000 AS confidence,
       floor((CAST(sab AS DOUBLE) * n.n_orders / (sa.s * sb.s)) * 10000 + 0.5) / 10000 AS lift
FROM pair
JOIN supp sa ON sa.l_partkey = part_a
JOIN supp sb ON sb.l_partkey = part_b, n
WHERE sab >= 2
""",
)
def basket_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule metrics over co-ordered part pairs (support ≥ 2,
    parts ≡ 0 mod 4 — the graph keys' stated sample): confidence
    P(b|a) = s(ab)/s(a) and lift s(ab)·N/(s(a)·s(b)) — the full
    market-basket rule scoring that basket_part_pairs' raw counts feed.

    Same bounded per-order pair expansion; per-item supports broadcast
    back onto the pair table; every metric is a ratio of counts.
    """
    po = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint()  # read three times (n, supports, both pair sides)
    )
    n = po.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    supp = po.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    a = po.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = po.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pair = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("sab"))
        .filter(F.col("sab") >= 2)
    )
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("sa"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("sb"))
    return (
        pair.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("sab").alias("n_co_orders"),
            r4(F.col("sab").cast("double") / F.col("sa")).alias("confidence"),
            r4(
                F.col("sab").cast("double") * F.col("n_orders")
                / (F.col("sa") * F.col("sb"))
            ).alias("lift"),
        )
    )


@query(
    "stat_autocorr_lag1",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY d
),
lagged AS (
  SELECT n, lag(n) OVER (ORDER BY d) AS pn FROM daily
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       floor((corr(n, pn)) * 10000 + 0.5) / 10000 AS autocorr_lag1
FROM lagged WHERE pn IS NOT NULL
""",
)
def stat_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-count series — the
    stationarity/seasonality diagnostic run before any forecasting model
    (near 0 here: the synthetic arrival process is memoryless, and
    showing that IS the diagnostic).

    Daily rollup → one ordered lag window over the ~90-row series →
    native corr aggregate.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    w = Window.orderBy("d")
    lagged = daily.select("n", F.lag("n").over(w).alias("pn")).filter(
        F.col("pn").isNotNull()
    )
    return lagged.agg(
        F.count(F.lit(1)).alias("n_days"),
        r4(F.corr("n", "pn")).alias("autocorr_lag1"),
    )


@query(
    "sweepline_open_orders",
    oracle="""
WITH iv AS (
  SELECT o.o_orderkey, o.o_orderdate AS t_open, max(l.l_shipdate) AS t_close
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey % 5 = 0
  GROUP BY o.o_orderkey, o.o_orderdate
),
ev AS (
  SELECT t_open AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT t_close AS t, -1 AS delta FROM iv
),
sw AS (
  SELECT t, sum(sum(delta)) OVER (ORDER BY t) AS n_open
  FROM ev GROUP BY t
)
SELECT CAST(count(*) AS BIGINT) AS n_change_points,
       CAST(max(n_open) AS BIGINT) AS peak_open_orders,
       floor((avg(n_open)) * 10000 + 0.5) / 10000 AS avg_open_at_changes
FROM sw
""",
)
def sweepline_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-stabbing via sweep line: how many orders are simultaneously
    OPEN (orderdate → last lineitem shipdate) over time, on a stated 1/5
    key sample — the concurrency/backlog metric computed the scalable way:
    each interval becomes a +1/-1 event, one ordered cumulative sum gives
    the open count at every change point. O(n log n) total vs the
    interval×timestamp stabbing join's quadratic blowup; the same plan
    shape as interval_overlap_merge, aggregated to the concurrency
    profile.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
    li = load(spark, sf_dir, "lineitem")
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("t_close"))
    )
    ev = iv.select(F.col("o_orderdate").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("t_close").alias("t"), F.lit(-1).alias("delta"))
    )
    per_t = ev.groupBy("t").agg(F.sum("delta").alias("d"))
    # two-phase ordered cumsum (rank2): integer deltas, so the re-associated
    # addition is exact and no single-partition WindowExec exists in the plan
    sw = global_cumsum(per_t, ["t"], {"n_open": F.col("d")}).select("n_open")
    return sw.agg(
        F.count(F.lit(1)).alias("n_change_points"),
        F.max("n_open").cast("long").alias("peak_open_orders"),
        r4(F.avg("n_open")).alias("avg_open_at_changes"),
    )


@query(
    "events_hourly_heatmap",
    oracle="""
WITH c AS (
  SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY dow, hr
),
t AS (SELECT sum(n) AS tot FROM c)
SELECT dow, hr, n,
       floor((CAST(n AS DOUBLE) / t.tot) * 10000 + 0.5) / 10000 AS share
FROM c, t
""",
)
def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap: event share per (day-of-week, hour) cell — the
    seasonal-profile matrix behind load forecasting and anomaly baselines.
    Exercises the cross-engine dayofweek convention deliberately (Spark
    Sun=1..Sat=7 vs DuckDB Sun=0..Sat=6 — the §5 parity landmine, handled
    by the oracle's +1).
    """
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    return c.crossJoin(F.broadcast(t)).select(
        "dow",
        "hr",
        "n",
        r4(F.col("n").cast("double") / F.col("tot")).alias("share"),
    )


@query(
    "agg_weighted_percentile",
    oracle="""
WITH w AS (
  SELECT o.o_orderpriority, o.o_totalprice, count(*) AS wt
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderpriority, o.o_orderkey, o.o_totalprice
),
c AS (
  SELECT o_orderpriority, o_totalprice, wt,
         sum(wt) OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice) AS cum,
         sum(wt) OVER (PARTITION BY o_orderpriority) AS tot
  FROM w
)
SELECT o_orderpriority,
       floor((min(o_totalprice) FILTER (2 * cum >= tot)) * 10000 + 0.5) / 10000
         AS weighted_median_price,
       CAST(max(tot) AS BIGINT) AS total_weight
FROM c
GROUP BY o_orderpriority
""",
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median order price per priority, weights = lineitem count
    (so big orders pull the median toward their price): the smallest price
    whose cumulative weight reaches half the total — the weighted-quantile
    primitive plain percentile() lacks.

    Per-order weights from one join+groupBy, then ONE cumulative window
    per priority and a min-over-threshold fold; all comparisons on
    integer weights (2·cum ≥ tot, no float division).
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    w = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority", "o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).alias("wt"))
    )
    # default RANGE frame: price ties (peers) share one cumulative value in
    # BOTH engines, which is exactly the weighted-median convention
    cum_w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    c = w.select(
        "o_orderpriority",
        "o_totalprice",
        F.sum("wt").over(cum_w).alias("cum"),
        F.sum("wt").over(Window.partitionBy("o_orderpriority")).alias("tot"),
    )
    return c.groupBy("o_orderpriority").agg(
        r4(
            F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("o_totalprice")))
        ).alias("weighted_median_price"),
        F.max("tot").cast("long").alias("total_weight"),
    )


@query(
    "events_uniques_daily_growth",
    oracle="""
WITH fs AS (
  SELECT user_id, date_trunc('day', min(ts)) AS first_day FROM events GROUP BY user_id
),
daily AS (SELECT first_day, CAST(count(*) AS BIGINT) AS n_new FROM fs GROUP BY first_day)
SELECT first_day AS day, n_new,
       CAST(sum(n_new) OVER (ORDER BY first_day) AS BIGINT) AS cumulative_users
FROM daily
""",
)
def events_uniques_daily_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-user growth curve: first-seen day per user → daily new-user
    counts → running cumulative total — the daily-granularity signup curve
    beside the weekly lifecycle states.

    One min-per-user aggregate, one tiny daily rollup, one ordered cumsum
    over the ~90-row series. The per-user first-seen table is the
    mergeable state an incremental pipeline would checkpoint.
    """
    ev = load(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(F.date_trunc("day", F.min("ts")).alias("first_day"))
    daily = fs.groupBy("first_day").agg(F.count(F.lit(1)).alias("n_new"))
    return daily.select(
        F.col("first_day").alias("day"),
        "n_new",
        F.sum("n_new").over(Window.orderBy("first_day")).cast("long").alias(
            "cumulative_users"
        ),
    )


JN_MIN_CO = 2  # candidate pairs must share >= 2 orders
JN_TOPK = 100


@query(
    "graph_jaccard_neighbors",
    oracle=f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
deg AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS d FROM li GROUP BY l_partkey
),
co AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(count(*) AS BIGINT) AS inter
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING count(*) >= {JN_MIN_CO}
)
SELECT p1, p2, inter, d1.d AS deg1, d2.d AS deg2,
       {R4("CAST(inter AS DOUBLE) / (d1.d + d2.d - inter)")} AS jaccard
FROM co
JOIN deg d1 ON d1.l_partkey = p1
JOIN deg d2 ON d2.l_partkey = p2
ORDER BY jaccard DESC, p1, p2 LIMIT {JN_TOPK}
""",
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard similarity between parts in the co-purchase
    graph: a part's neighborhood is the set of orders containing it, and
    two parts are similar when those order sets overlap — the structural
    link-prediction / substitute-detection primitive (same index family as
    the document Jaccard keys, but over graph adjacency instead of
    shingles). Top-{JN_TOPK} pairs by 4dp-rounded Jaccard (part-key
    tie-break — rounding BEFORE ranking is the rounded-ADC discipline, so
    the cut is engine-deterministic).

    Plan: candidate generation is the open-triangle equi-join on the
    shared order key — never an all-pairs product; its fan-out per order
    is lines², bounded by the order-size cap (≤7 lineitems in TPC-H
    shapes), and the ≥{JN_MIN_CO}-co-occurrence HAVING prunes the long
    tail before the degree joins. At 100 TB the same plan holds with a
    hot-order guard (drop or salt orders above a line-count ceiling — the
    standard frequency cap every co-occurrence miner ships); degrees join
    back by part key and the final top-k is a TakeOrdered, no global sort
    materialization.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    deg = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("d"))
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    co = (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("inter"))
        .filter(F.col("inter") >= JN_MIN_CO)
    )
    d1 = deg.select(F.col("l_partkey").alias("p1"), F.col("d").alias("deg1"))
    d2 = deg.select(F.col("l_partkey").alias("p2"), F.col("d").alias("deg2"))
    scored = (
        co.join(d1, "p1")
        .join(d2, "p2")
        .select(
            "p1",
            "p2",
            "inter",
            "deg1",
            "deg2",
            r4(
                F.col("inter").cast("double")
                / (F.col("deg1") + F.col("deg2") - F.col("inter"))
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.desc("jaccard"), "p1", "p2"
    ).limit(JN_TOPK)
