"""Sampling / splitting / data-audit operators (training-data pipeline
essentials beyond SURVEY §2-J).

split_train_test uses content-hash bucketing — the industry-standard
deterministic split (stable under re-runs, shard-order independent, and
join-free): md5's first 7 hex digits mod 10 give a uniform 0-9 bucket both
engines compute identically. Random `sample()` is provided too but is
engine-specific by nature (rows-only + statistical test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.operators.rank2 import global_row_number
from upflow_spark.parity import R4, r4
from upflow_spark.registry import query


@query(
    "split_train_test",
    oracle="""
SELECT split, lang, count(*) AS n_docs,
       floor((avg(CAST(n_chars AS DOUBLE))) * 10000 + 0.5) / 10000 AS avg_chars
FROM (
  SELECT lang, n_chars,
         CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT lang, n_chars,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 7)) AS BIGINT) % 10 AS bucket
    FROM documents
  )
)
GROUP BY split, lang
""",
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content hash.

    Hash bucketing beats random splits at scale: stable across re-runs and
    partitionings, no persisted assignment table, and leak-safe (identical
    content always lands in the same split — pair with dedup first).
    """
    d = load(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws(":", F.col("doc_id"), F.col("text"))), 1, 7), 16, 10).cast("long"),
        F.lit(10),
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            r4(F.avg(F.col("n_chars").cast("double"))).alias("avg_chars"),
        )
    )


_STRAT_FRACTIONS = {
    "click": 0.2,
    "view": 0.2,
    "purchase": 1.0,
    "signup": 1.0,
    "error": 1.0,
}
_U32 = 4294967296
# exact integer thresholds: md5-derived u32 < floor(frac * 2^32)
_STRAT_THRESHOLDS = {t: int(f * _U32) for t, f in _STRAT_FRACTIONS.items()}
_SQL_STRAT_CASE = "CASE event_type " + " ".join(
    f"WHEN '{t}' THEN {thr}" for t, thr in _STRAT_THRESHOLDS.items()
) + " ELSE 0 END"


@query(
    "sample_stratified",
    oracle=f"""
SELECT event_type, count(*) AS n_sampled
FROM events
WHERE CAST(('0x' || substr(md5('strat:' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
      < {_SQL_STRAT_CASE}
GROUP BY event_type
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: 20% of clicks/views, 100% of rarer types — the
    standard class-rebalancing pass for training data.

    r6 (VERDICT r5 item 7, promoted from rows-only): Bernoulli draw per
    event via a DETERMINISTIC salted md5 of the key — keep when the first
    32 hash bits fall under floor(frac * 2^32) for the event's stratum.
    Statistically identical to seeded sampleBy (uniform hash ⇒ binomial
    per-type counts, which tests/test_ops.py still bounds), but the sample
    is engine-portable and partitioning/replay-independent, so the oracle
    hash-checks it exactly. That reproducibility is precisely what a
    100 TB curation pipeline wants from its sampling anyway (same inputs →
    same sample on re-run, resume, or backfill — no RNG stream coupling
    to task layout).
    """
    ev = load(spark, sf_dir, "events")
    u = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit("strat"), F.col("event_id"))), 1, 8),
        16,
        10,
    ).cast("long")
    thr = F.lit(0)
    for t, v in _STRAT_THRESHOLDS.items():
        thr = F.when(F.col("event_type") == t, F.lit(v)).otherwise(thr)
    sampled = ev.filter(u < thr)
    return sampled.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_sampled"))


@query(
    "audit_referential",
    oracle="""
SELECT 'lineitem_orphan_orders' AS check_name,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
UNION ALL
SELECT 'orders_orphan_customers',
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'orders_negative_price',
       (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
UNION ALL
SELECT 'lineitem_discount_range',
       (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
UNION ALL
SELECT 'customer_null_segment',
       (SELECT count(*) FROM customer WHERE c_mktsegment IS NULL)
""",
)
def audit_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: FK orphans (anti joins) + domain constraints,
    one row per check. The pre-training gate every pipeline needs; each
    check is an independent job-free plan unioned into one result."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    checks = [
        one(
            "lineitem_orphan_orders",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
        ),
        one(
            "orders_orphan_customers",
            o.join(c, o.o_custkey == c.c_custkey, "left_anti"),
        ),
        one("orders_negative_price", o.filter(F.col("o_totalprice") <= 0)),
        one(
            "lineitem_discount_range",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
        ),
        one("customer_null_segment", c.filter(F.col("c_mktsegment").isNull())),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


@query(
    "sample_topk_hashrank",
    oracle="""
SELECT doc_id, lang, rk
FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || text),
                                     doc_id) AS rk
  FROM documents
)
WHERE rk <= 3
""",
)
def sample_topk_hashrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group subsample: rank every doc inside its language
    by a content hash and keep the top 3 — reservoir-sampling semantics
    with a reproducible, engine-portable order (md5), no RNG state. The
    pattern behind balanced eval-set carving: same inputs → same sample on
    any engine, any partitioning, any day.

    Scale (bounded k): TWO-LEVEL top-k, the topk_two_level shape — a
    language is a low-cardinality partition key (one language ≈ corpus/5
    rows in one window partition at fixture shape, a skew wall at 100 TB),
    so each (lang, 32-way hash sub-bucket) keeps its local top-3 and the
    final per-lang window ranks ≤96 survivors. Global top-k ⊆ ∪ bucket
    top-ks, so the prune is lossless and the result identical to the
    oracle's single window.
    """
    d = load(spark, sf_dir, "documents")
    hkey = F.md5(F.concat_ws(":", F.col("doc_id"), F.col("text")))
    sub = F.pmod(F.hash("doc_id"), F.lit(32))
    w_local = Window.partitionBy("lang", sub).orderBy("hk", "doc_id")
    pruned = (
        d.select("doc_id", "lang", hkey.alias("hk"))
        .withColumn("lrk", F.row_number().over(w_local))
        .filter(F.col("lrk") <= 3)
    )
    w_final = Window.partitionBy("lang").orderBy("hk", "doc_id")
    return (
        pruned.withColumn("rk", F.row_number().over(w_final).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "lang", "rk")
    )


@query(
    "sample_systematic_every_k",
    oracle="""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (ORDER BY doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn % 20 = 1
""",
)
def sample_systematic_every_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-20 sample over the doc_id ordering (every k-th
    element) — the eval-slice/spot-check sampling pattern that, unlike
    hash or Bernoulli sampling, guarantees exactly ⌈n/k⌉ rows and uniform
    coverage of the key range.

    The rank is rank2.global_row_number — range shuffle + per-partition
    sort + broadcast offsets, no single-partition WindowExec — so the
    1-in-20 selection is fully parallel at any scale. (When doc_ids are
    dense the pure map-side `doc_id % 20` filter is equivalent and free.)
    """
    d = load(spark, sf_dir, "documents")
    r = global_row_number(d.select("doc_id", "lang"), ["doc_id"], out="rn")
    return r.filter(F.col("rn") % 20 == 1).select("doc_id", "lang", "rn")


AES_K = 50
_AES_SCALE = float(1 << 60)


@query(
    "sample_weighted_aes",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS w,
         floor((ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT + 1)
                   / {_AES_SCALE}) / n_chars) * 10000 + 0.5) / 10000 AS k4
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, lang, w, k4
FROM keyed
ORDER BY k4 DESC, doc_id ASC
LIMIT {AES_K}
""",
)
def sample_weighted_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement (Efraimidis–
    Spirakis A-ES): every doc gets key u^(1/w) — here ranked by the
    monotone-equivalent ln(u)/w — with u a content-hash uniform instead of
    RNG state (the repo's no-RNG stance: same corpus ⇒ same sample on any
    engine, any partitioning, any day). Weights = n_chars, so longer
    documents are proportionally more likely to be kept — the
    quality/length-weighted corpus subsampling step of LLM data prep,
    exact and reproducible.

    Parity: u = (md5-derived 60-bit int + 1) / 2⁶⁰ is bit-identical on
    both engines (power-of-two scaling is exact); ln() may differ in the
    last ulp between libms, so the RANKING key is the 4dp-rounded
    ln(u)/w with doc_id tie-breaks — engine-deterministic order. The
    top-k is TakeOrdered (two-phase: per-partition top-k then merge),
    never a global sort.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("text"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(_AES_SCALE)
    k4 = r4(F.log(u) / F.col("n_chars"))
    return (
        d.select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("w"),
            k4.alias("k4"),
        )
        .orderBy(F.col("k4").desc(), F.col("doc_id").asc())
        .limit(AES_K)
    )


@query(
    "data_quality_expectations",
    oracle=f"""
WITH o AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS pk_dup,
         CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS cust_null,
         CAST(count(*) FILTER (o_totalprice <= 0) AS BIGINT) AS price_bad,
         CAST(count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P'))
              AS BIGINT) AS status_bad
  FROM orders
),
l AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (l_quantity < 1 OR l_quantity > 50)
              AS BIGINT) AS qty_bad,
         CAST(count(*) FILTER (l_discount < 0 OR l_discount > 0.5)
              AS BIGINT) AS disc_bad
  FROM lineitem
),
fk AS (
  SELECT CAST(count(*) AS BIGINT) AS orphans
  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
),
dt AS (
  SELECT CAST(count(*) AS BIGINT) AS ship_before_order
  FROM lineitem li JOIN orders oo ON oo.o_orderkey = li.l_orderkey
  WHERE li.l_shipdate < oo.o_orderdate
)
SELECT * FROM (
  SELECT 'orders' AS table_name, 'pk_unique' AS check_name,
         o.n AS n_checked, o.pk_dup AS n_violations, o.pk_dup = 0 AS passed
  FROM o
  UNION ALL SELECT 'orders', 'custkey_not_null', o.n, o.cust_null,
         o.cust_null = 0 FROM o
  UNION ALL SELECT 'orders', 'price_positive', o.n, o.price_bad,
         o.price_bad = 0 FROM o
  UNION ALL SELECT 'orders', 'status_domain', o.n, o.status_bad,
         o.status_bad = 0 FROM o
  UNION ALL SELECT 'lineitem', 'qty_in_range', l.n, l.qty_bad,
         l.qty_bad = 0 FROM l
  UNION ALL SELECT 'lineitem', 'discount_in_range', l.n, l.disc_bad,
         l.disc_bad = 0 FROM l
  UNION ALL SELECT 'lineitem', 'fk_orders', l.n, fk.orphans,
         fk.orphans = 0 FROM l, fk
  UNION ALL SELECT 'lineitem', 'ship_after_order', l.n, dt.ship_before_order,
         dt.ship_before_order = 0 FROM l, dt
)
""",
)
def data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality EXPECTATIONS suite (the Deequ/
    Great-Expectations surface): eight constraints over orders and
    lineitem — primary-key uniqueness, non-null, value range, domain
    membership, referential integrity, and the cross-table temporal rule
    (no lineitem ships before its order) — evaluated together, with per-
    check violation counts in the graded output, not just booleans (a
    failing pipeline needs the blast radius, not a red light).

    ONE aggregate pass per table computes every single-table check
    (conditional counts share the scan; adding a ninth check adds a
    column, not a job), plus one anti-join for the FK and one key-join
    for the temporal rule. The 8-row report is an unpivot of those
    aggregates. At 100 TB this is the nightly gate before a training
    run: two table scans + one join, all partial-aggregated, regardless
    of how long the expectation list grows.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    oa = o.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_dup"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("cust_null"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("price_bad"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("status_bad"),
    )
    la = li.agg(
        F.count(F.lit(1)).alias("ln"),
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("qty_bad"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1)
        ).alias("disc_bad"),
    )
    fk = (
        li.select("l_orderkey")
        # no broadcast hint: orders is fact-scale, so the FK anti-join must
        # stay a shuffle join at 100 TB (ADVICE r11) — Catalyst may still
        # broadcast at fixture scale on its own estimate.
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
    )
    dt = (
        li.select("l_orderkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(F.count(F.lit(1)).alias("ship_before_order"))
    )
    one = (
        oa.crossJoin(F.broadcast(la))
        .crossJoin(F.broadcast(fk))
        .crossJoin(F.broadcast(dt))
    )
    checks = [
        ("orders", "pk_unique", "n", "pk_dup"),
        ("orders", "custkey_not_null", "n", "cust_null"),
        ("orders", "price_positive", "n", "price_bad"),
        ("orders", "status_domain", "n", "status_bad"),
        ("lineitem", "qty_in_range", "ln", "qty_bad"),
        ("lineitem", "discount_in_range", "ln", "disc_bad"),
        ("lineitem", "fk_orders", "ln", "orphans"),
        ("lineitem", "ship_after_order", "ln", "ship_before_order"),
    ]
    stack = ", ".join(
        f"'{t}', '{c}', {n}, {v}" for t, c, n, v in checks
    )
    return one.select(
        F.expr(
            f"stack({len(checks)}, {stack})"
            " AS (table_name, check_name, n_checked, n_violations)"
        )
    ).withColumn("passed", F.col("n_violations") == 0)


NEYMAN_BUDGET = 1000  # total sample budget to allocate across strata


@query(
    "sample_neyman_allocation",
    oracle=f"""
WITH gs AS MATERIALIZED (
  SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n_pop,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS DECIMAL(38,0)) AS s,
         CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                            AS BIGINT)
                       * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT) AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS q
  FROM orders GROUP BY o_orderpriority
),
w AS MATERIALIZED (
  SELECT grp, n_pop,
         n_pop * sqrt((CAST(q AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_pop)
                      / (n_pop - 1)) AS wgt
  FROM gs
),
tw AS (SELECT sum(wgt) AS total FROM (SELECT wgt FROM w ORDER BY grp) ),
sh AS MATERIALIZED (
  SELECT grp, n_pop, wgt, {NEYMAN_BUDGET} * wgt / t.total AS share,
         CAST(floor({NEYMAN_BUDGET} * wgt / t.total) AS BIGINT) AS base
  FROM w, tw t
),
rem AS (
  SELECT CAST({NEYMAN_BUDGET} - sum(base) AS BIGINT) AS r FROM sh
),
rk AS (
  SELECT grp, n_pop, wgt, share, base,
         row_number() OVER (ORDER BY share - base DESC, grp ASC) AS frac_rank
  FROM sh
)
SELECT rk.grp, rk.n_pop,
       {R4("rk.wgt / rk.n_pop / 100")} AS sigma,
       {R4("rk.share")} AS share,
       rk.base + CASE WHEN rk.frac_rank <= rem.r THEN 1 ELSE 0 END
         AS n_alloc
FROM rk, rem
""",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN-OPTIMAL stratified sample allocation — before drawing the
    stratified sample (sample_stratified executes one), a survey-grade
    pipeline decides HOW MANY rows each stratum gets: n_h ∝ N_h·σ_h
    (variance-weighted, minimizing the estimator variance at fixed
    budget), integerized by the LARGEST-REMAINDER method so the
    allocations sum exactly to the budget — deterministic, no float
    round-tripping (floors + a remainder rank with a stratum tie-break).

    Sufficient statistics per stratum (n, Σx, Σx² in integer cents)
    accumulate in exact DECIMAL(38,0); σ and the shares finish in
    identical IEEE expressions; the remainder ranking runs over the
    5-row stratum table (bounded by the STRATA, not the data). Graded:
    population size, σ, fractional share, and the final integer
    allocation per stratum (Σ n_alloc = {NEYMAN_BUDGET} by construction).
    """
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    gs = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("grp"), cents.alias("c"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_pop"),
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("q"),
        )
    )
    w = gs.select(
        "grp",
        "n_pop",
        (
            F.col("n_pop")
            * F.sqrt(
                (
                    F.col("q").cast("double")
                    - F.col("s").cast("double")
                    * F.col("s").cast("double")
                    / F.col("n_pop")
                )
                / (F.col("n_pop") - 1)
            )
        ).alias("wgt"),
    )
    # Σwgt folded in stratum order on both engines (a 5-element sum is
    # still order-sensitive in doubles — the r11 basis-point lesson)
    tw = (
        w.orderBy("grp")
        .agg(F.sum("wgt").alias("total"))
    )
    sh = w.crossJoin(F.broadcast(tw)).select(
        "grp",
        "n_pop",
        "wgt",
        (F.lit(NEYMAN_BUDGET) * F.col("wgt") / F.col("total")).alias("share"),
        F.floor(F.lit(NEYMAN_BUDGET) * F.col("wgt") / F.col("total"))
        .cast("long")
        .alias("base"),
    )
    rem = sh.agg(
        (F.lit(NEYMAN_BUDGET) - F.sum("base")).cast("long").alias("r")
    )
    wfr = Window.orderBy((F.col("share") - F.col("base")).desc(), F.col("grp").asc())
    return (
        sh.withColumn("frac_rank", F.row_number().over(wfr))
        .crossJoin(F.broadcast(rem))
        .select(
            "grp",
            "n_pop",
            r4(F.col("wgt") / F.col("n_pop") / 100).alias("sigma"),
            r4(F.col("share")).alias("share"),
            (
                F.col("base")
                + F.when(F.col("frac_rank") <= F.col("r"), 1).otherwise(0)
            ).cast("long").alias("n_alloc"),
        )
    )
