"""Hand-written vanilla-PySpark twins of the four BASELINE.md headline
queries, as (spark, sf_dir) -> DataFrame builders so bench.py can time them
INTERLEAVED with the engine keys in the SAME session (r12 VERDICT item 3:
round-over-round totals moved +30% with zero code cause — whole-box drift.
A same-session engine/vanilla ratio is immune to that drift because both
sides ride the same JVM, JIT state, and IO cache).

tools/measure_vanilla.py (the BASELINE.md protocol: its own local[4]
session) imports these builders too, so the twin definitions cannot fork.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _q1(spark: SparkSession, sf: str) -> DataFrame:
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"),
            F.sum("l_extendedprice"),
            F.sum(dp),
            F.sum(dp * (1 + F.col("l_tax"))),
            F.avg("l_quantity"),
            F.avg("l_extendedprice"),
            F.avg("l_discount"),
            F.count(F.lit(1)),
        )
    )


def _q3(spark: SparkSession, sf: str) -> DataFrame:
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")
    c = spark.read.parquet(f"{sf}/customer.parquet")
    s = spark.read.parquet(f"{sf}/supplier.parquet")
    n = spark.read.parquet(f"{sf}/nation.parquet")
    r = spark.read.parquet(f"{sf}/region.parquet")
    of = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    return (
        c.join(of, c.c_custkey == of.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            r.filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    )


def _wr(spark: SparkSession, sf: str) -> DataFrame:
    o = spark.read.parquet(f"{sf}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


def _ea(spark: SparkSession, sf: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value"))
        .orderBy(
            F.col("n").desc(), F.col("user_id").asc(), F.col("event_type").asc()
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# r14 wave (VERDICT r13 item 6): twins for the keys that dominate bench
# wall-time, so the same-session drift-proof ratio covers the top of the
# bill, not just the four sub-second headline rows. Each twin is the
# STRAIGHTFORWARD PySpark a competent user writes in one sitting: no
# localCheckpoints, no salting, no rank2 two-phase machinery, no broadcast
# hints; cache() only where an iterative loop forces materialization (the
# first remedy any user reaches for). Semantics mirror the engine keys
# (same hashes, bands, thresholds) so the timing comparison is apples to
# apples.

_WCAP = 4  # mirrors minhash_sql.WCAP / K/band constants
_K_HASHES, _N_BANDS = 16, 4


def _v_tokens():  # noqa: ANN202
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def _v_exact_survivors(d: DataFrame) -> DataFrame:
    w = Window.partitionBy(F.md5("text"))
    return (
        d.withColumn("__keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__keep"))
        .drop("__keep")
    )


def _v_minhash_sig(docs: DataFrame) -> DataFrame:
    """Naive K=16 md5-carved MinHash signature: distinct-token explode,
    4 md5 columns, 16 min aggregates."""
    tok = docs.select(
        "doc_id", F.explode(_v_tokens()).alias("term")
    ).distinct()
    tokh = tok.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{a}:"), F.col("term"))).alias(f"h{a}")
            for a in range(4)
        ],
    )
    return tokh.groupBy("doc_id").agg(
        *[
            F.min(
                F.conv(
                    F.substring(F.col(f"h{i // 4}"), (i % 4) * 8 + 1, 8), 16, 10
                ).cast("long")
            ).alias(f"mh{i}")
            for i in range(_K_HASHES)
        ]
    )


def _v_band_pairs(sig: DataFrame) -> DataFrame:
    """Naive banded candidates: four per-band equi-self-joins unioned,
    then distinct — the textbook LSH join, no salt, no first-band trick."""
    legs = []
    a, b = sig.alias("a"), sig.alias("b")
    for bi in range(_N_BANDS):
        cond = (F.col("a.doc_id") < F.col("b.doc_id"))
        for r in range(4):
            cond = cond & (
                F.col(f"a.mh{bi * 4 + r}") == F.col(f"b.mh{bi * 4 + r}")
            )
        legs.append(
            a.join(b, cond).select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                *[
                    (F.col(f"a.mh{i}") == F.col(f"b.mh{i}"))
                    .cast("int")
                    .alias(f"eq{i}")
                    for i in range(_K_HASHES)
                ],
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.dropDuplicates(["doc_a", "doc_b"])


def _staged(spark: SparkSession, sf: str) -> DataFrame:
    """dedup_staged twin: exact collapse -> minhash band -> 15/16 verify."""
    d = spark.read.parquet(f"{sf}/documents.parquet")
    surv = _v_exact_survivors(d).cache()
    sig = _v_minhash_sig(surv).cache()
    cand = _v_band_pairs(sig)
    n_agree = None
    for i in range(_K_HASHES):
        t = F.col(f"eq{i}")
        n_agree = t if n_agree is None else n_agree + t
    ver = F.col("n_agree") >= 15
    ph = (
        F.col("doc_a") * F.lit(2654435761) + F.col("doc_b") * F.lit(40503)
    ) % F.lit(4294967296)
    summary = cand.withColumn("n_agree", n_agree).agg(
        F.count(F.lit(1)).alias("n_band_candidates"),
        F.count(F.when(ver, 1)).alias("n_verified"),
        F.coalesce(F.sum(F.when(ver, ph)), F.lit(0))
        .cast("long")
        .alias("verified_checksum"),
    )
    counts = (
        d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(surv.agg(F.count(F.lit(1)).cast("long").alias("n_survivors")))
        .withColumn("n_exact_dups", F.col("n_docs") - F.col("n_survivors"))
    )
    return counts.crossJoin(summary)


def _minhash_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """dedup_minhash_weighted twin: the classic replica-row reduction —
    explode term replicas (weight-capped), minhash the replica set, band,
    verify by intersection join + per-pair re-aggregation."""
    d = spark.read.parquet(f"{sf}/documents.parquet")
    surv = _v_exact_survivors(d)
    wtok = (
        surv.select("doc_id", F.explode(_v_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.least(F.count(F.lit(1)), F.lit(_WCAP)).cast("long").alias("c"))
        .cache()
    )
    reps = (
        wtok.crossJoin(spark.range(_WCAP).select(F.col("id").alias("r")))
        .filter(F.col("r") < F.col("c"))
        .select(
            "doc_id",
            F.concat(F.col("term"), F.lit("#"), F.col("r").cast("string")).alias(
                "rterm"
            ),
        )
    )
    tokh = reps.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{a}:"), F.col("rterm"))).alias(f"h{a}")
            for a in range(4)
        ],
    )
    sig = tokh.groupBy("doc_id").agg(
        *[
            F.min(
                F.conv(
                    F.substring(F.col(f"h{i // 4}"), (i % 4) * 8 + 1, 8), 16, 10
                ).cast("long")
            ).alias(f"mh{i}")
            for i in range(_K_HASHES)
        ]
    ).cache()
    cand = _v_band_pairs(sig).cache()
    wa = wtok.select(F.col("doc_id").alias("doc_a"), "term", F.col("c").alias("ca"))
    wb = wtok.select(F.col("doc_id").alias("doc_b"), "term", F.col("c").alias("cb"))
    inter = (
        cand.select("doc_a", "doc_b")
        .join(wa, "doc_a")
        .join(wb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("ca", "cb")).cast("long").alias("smin"))
    )
    wtot = wtok.groupBy("doc_id").agg(F.sum("c").cast("long").alias("tot"))
    ta = wtot.select(F.col("doc_id").alias("doc_a"), F.col("tot").alias("tot_a"))
    tb = wtot.select(F.col("doc_id").alias("doc_b"), F.col("tot").alias("tot_b"))
    ph = (
        F.col("doc_a") * F.lit(2654435761) + F.col("doc_b") * F.lit(40503)
    ) % F.lit(4294967296)
    wv = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .fillna(0, ["smin"])
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn(
            "wj_bp",
            F.expr("(smin * 10000) div (tot_a + tot_b - smin)").cast("long"),
        )
        .withColumn("ph", ph)
    )
    band_ok = []
    for bi in range(_N_BANDS):
        c = F.lit(True)
        for r in range(4):
            c = c & (F.col(f"eq{bi * 4 + r}") == 1)
        band_ok.append(c)
    agg = wv.agg(
        *[
            col
            for bi in range(_N_BANDS)
            for col in (
                F.count(F.when(band_ok[bi], 1)).alias(f"n{bi}"),
                F.sum(F.when(band_ok[bi], F.col("ph"))).alias(f"c{bi}"),
            )
        ],
        F.count(F.when(F.col("wj_bp") >= 5000, 1)).alias("nv"),
        F.sum(F.when(F.col("wj_bp") >= 5000, F.col("ph"))).alias("cv"),
    )
    return agg


def _simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """dedup_simhash_pairs twin: 32-bit simhash from md5-digit majorities,
    banded self-joins, Hamming <= 3 verify via 32 substring comparisons."""
    d = spark.read.parquet(f"{sf}/documents.parquet")
    tok = d.select("doc_id", F.explode(_v_tokens()).alias("term")).select(
        "doc_id", F.md5("term").alias("h")
    )
    bits = []
    for j in range(32):
        high = F.substring("h", j + 1, 1).isin(
            "8", "9", "a", "b", "c", "d", "e", "f"
        )
        bits.append(
            F.when(F.sum(F.when(high, 1).otherwise(-1)) >= 0, "1").otherwise("0")
        )
    sig = tok.groupBy("doc_id").agg(F.concat(*bits).alias("simhash")).cache()
    a, b = sig.alias("a"), sig.alias("b")
    legs = []
    for bi in range(4):
        legs.append(
            a.join(
                b,
                (F.col("a.doc_id") < F.col("b.doc_id"))
                & (
                    F.substring(F.col("a.simhash"), bi * 8 + 1, 8)
                    == F.substring(F.col("b.simhash"), bi * 8 + 1, 8)
                ),
            ).select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sa"),
                F.col("b.simhash").alias("sb"),
            )
        )
    cand = legs[0]
    for leg in legs[1:]:
        cand = cand.unionByName(leg)
    cand = cand.dropDuplicates(["doc_a", "doc_b"])
    ham = None
    for i in range(32):
        t = (
            F.substring("sa", i + 1, 1) != F.substring("sb", i + 1, 1)
        ).cast("long")
        ham = t if ham is None else ham + t
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= 3).select(
        "doc_a", "doc_b", "hamming"
    )


def _quantiles_exact(spark: SparkSession, sf: str) -> DataFrame:
    """agg_quantiles_exact_multi twin: the naive exact multi-quantile — a
    GLOBAL row_number window (single reducer) over the sorted column, then
    pick the straddling rows per quantile."""
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        F.col("l_extendedprice").alias("v")
    )
    ranked = li.withColumn(
        "rn", F.row_number().over(Window.orderBy("v"))
    ).cache()
    n = ranked.count()
    rows = []
    for i, q in enumerate(qs):
        rn = (n - 1) * q
        lo, hi = int(rn) + 1, -(-rn // 1) + 1
        sel = ranked.filter(F.col("rn").isin(int(lo), int(hi)))
        import math

        frac = rn - math.floor(rn)
        agg = sel.agg(
            F.min(F.when(F.col("rn") == int(lo), F.col("v"))).alias("lo_v"),
            F.min(F.when(F.col("rn") == int(hi), F.col("v"))).alias("hi_v"),
        ).select(
            F.lit(q).alias("q"),
            F.lit(i + 1).cast("long").alias("q_idx"),
            F.lit(n).cast("long").alias("n_rows"),
            (
                F.floor(
                    (F.col("lo_v") + F.lit(frac) * (F.col("hi_v") - F.col("lo_v")))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("value"),
        )
        rows.append(agg)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """graph_pagerank twin: simhash near-dup edges + 6 plain power
    iterations (rank table re-joined to the cached edge list per round)."""
    pairs = _simhash_pairs(spark, sf).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .distinct()
        .cache()
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("d"))
    deg = deg.withColumnRenamed("u", "n").cache()
    nv = float(deg.count())
    ranks = deg.select("n", F.lit(1.0 / nv).alias("r"))
    for _ in range(6):
        contrib = (
            edges.join(deg, edges.u == deg.n)
            .join(ranks.withColumnRenamed("n", "rn_n"), F.col("u") == F.col("rn_n"))
            .select(F.col("v").alias("n"), (F.col("r") / F.col("d")).alias("c"))
        )
        ranks = contrib.groupBy("n").agg(
            (F.lit(0.15 / nv) + 0.85 * F.sum("c")).alias("r")
        ).cache()
    return ranks.select(
        F.col("n").alias("doc_id"),
        (F.floor(F.col("r") * nv * 10000 + F.lit(0.5)) / 10000).alias("pr_scaled"),
    )


def _min_label_cc(pairs: DataFrame) -> DataFrame:
    """Naive connected components: iterate min-neighbor-label propagation
    to convergence (the first CC every Spark user writes). localCheckpoint
    per round, not cache: the label table feeds two joins per round, so a
    cache-only loop doubles the logical plan every iteration and OOMs the
    driver — the lineage cut is the standard remedy every iterative-Spark
    user lands on (it is part of the vanilla experience, not an engine
    trick)."""
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .distinct()
        .cache()
    )
    labels = edges.select("u").distinct().select(
        "u", F.col("u").alias("lbl")
    ).localCheckpoint()
    for _ in range(30):
        nbr = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("lbl").alias("nl")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("nl").alias("nbl"))
        )
        nxt = (
            labels.join(nbr, "u", "left")
            .select(
                "u",
                F.least(F.col("lbl"), F.coalesce("nbl", F.col("lbl"))).alias(
                    "lbl"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            nxt.alias("a")
            .join(labels.alias("b"), F.col("a.u") == F.col("b.u"))
            .filter(F.col("a.lbl") != F.col("b.lbl"))
            .count()
        )
        labels = nxt
        if changed == 0:
            break
    return labels


def _pipeline_bill(spark: SparkSession, sf: str) -> DataFrame:
    """dedup_pipeline_bill twin: the five stages composed naively — exact
    collapse, canonical-URL keep-min, substring-span filter, minhash CC,
    semantic (exact cosine) CC — same thresholds, plain joins/windows."""
    d = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text", "source", "n_chars")
    )
    s1 = _v_exact_survivors(d).cache()

    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, "WWW.Example.COM")
        .when(F.col("doc_id") % 3 == 1, "www.EXAMPLE.com")
        .otherwise("www.example.com"),
        F.lit("/"), F.col("source"), F.lit("/d"),
        F.expr("n_chars div 100").cast("string"),
        F.lit("?utm_source=s"), (F.col("doc_id") % 4).cast("string"),
        F.lit("&id="), (F.col("doc_id") % 25).cast("string"),
        F.lit("&utm_campaign=c"), (F.col("doc_id") % 2).cast("string"),
        F.lit("#sec"), (F.col("doc_id") % 2).cast("string"),
    )
    host = F.lower(F.regexp_extract("url", r"^https?://([^/]+)", 1))
    path = F.regexp_extract("url", r"^https?://[^/]+([^?#]*)", 1)
    qs = F.array_join(
        F.filter(
            F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&"),
            lambda p: ~p.rlike("^utm_"),
        ),
        "&",
    )
    canon = F.concat(
        F.lit("https://"), host, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    wc = Window.partitionBy("canon")
    s2 = (
        s1.withColumn("url", url)
        .withColumn("canon", canon)
        .withColumn("__keep", F.min("doc_id").over(wc))
        .filter(F.col("doc_id") == F.col("__keep"))
        .select("doc_id", "text")
        .cache()
    )

    toks = _v_tokens()
    t = s2.select(
        "doc_id", toks.alias("t"), F.size(toks).cast("long").alias("n_tokens")
    )
    spans = (
        t.filter(F.col("n_tokens") >= 50)
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(1), (F.col("n_tokens") - 49).cast("int"), F.lit(10)
                )
            ).alias("pos"),
            "t",
        )
        .select(
            "doc_id",
            "pos",
            F.xxhash64(F.concat_ws(" ", F.expr("slice(t, pos, 50)"))).alias(
                "dig"
            ),
        )
    )
    cnt = spans.withColumn(
        "c", F.count(F.lit(1)).over(Window.partitionBy("dig"))
    )
    dup = cnt.filter(F.col("c") > 1).select(
        "doc_id", "pos", (F.col("pos") + 49).alias("e")
    )
    prev_max = F.max("e").over(
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = dup.select(
        "doc_id",
        F.greatest(
            F.lit(0),
            F.col("e")
            - F.greatest(F.col("pos") - 1, F.coalesce(prev_max, F.lit(0))),
        ).alias("cover"),
    )
    dup_tok = cov.groupBy("doc_id").agg(F.sum("cover").alias("dup_tokens"))
    frac = t.join(dup_tok, "doc_id", "left").select(
        "doc_id",
        (
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
            / F.col("n_tokens")
        ).alias("frac"),
    )
    s3 = s2.join(
        frac.filter(F.col("frac") < 0.5).select("doc_id"), "doc_id"
    ).cache()

    sig = _v_minhash_sig(s3).cache()
    cand = _v_band_pairs(sig)
    n_agree = None
    for i in range(_K_HASHES):
        tcol = F.col(f"eq{i}")
        n_agree = tcol if n_agree is None else n_agree + tcol
    verified = cand.withColumn("n_agree", n_agree).filter(
        F.col("n_agree") >= 15
    ).select("doc_a", "doc_b")
    mh_labels = _min_label_cc(verified)
    mh_losers = mh_labels.filter(F.col("lbl") != F.col("u")).select(
        F.col("u").alias("doc_id")
    )
    s4 = s3.select("doc_id").join(mh_losers, "doc_id", "left_anti").cache()

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x))
    e = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.transform(dbl, lambda x: x / norm).alias("u"),
    ).join(s4, "doc_id", "left_semi").cache()
    ea = e.select(F.col("doc_id").alias("doc_a"), F.col("u").alias("ua"))
    eb = e.select(F.col("doc_id").alias("doc_b"), F.col("u").alias("ub"))
    cos = F.aggregate(
        F.zip_with("ua", "ub", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sem_pairs = (
        ea.join(eb, F.col("doc_a") < F.col("doc_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= 0.40)
        .select("doc_a", "doc_b")
    )
    sm_labels = _min_label_cc(sem_pairs)
    sm_losers = sm_labels.filter(F.col("lbl") != F.col("u")).select(
        F.col("u").alias("doc_id")
    )
    s5 = s4.join(sm_losers, "doc_id", "left_anti")

    rows = []
    names = {1: "exact_content", 2: "url_canonical", 3: "substring",
             4: "minhash_neardup", 5: "semantic"}
    stages = [(1, d, s1), (2, s1, s2), (3, s2, s3), (4, s3, s4), (5, s4, s5)]
    for idx, rin, rout in stages:
        a = rin.agg(
            F.count(F.lit(1)).cast("long").alias("n_in"),
            F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("cs_in"),
        )
        b2 = rout.agg(
            F.count(F.lit(1)).cast("long").alias("n_out"),
            F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("cs_out"),
        )
        rows.append(
            a.crossJoin(b2).select(
                F.lit(idx).alias("stage"),
                F.lit(names[idx]).alias("stage_name"),
                "n_in",
                (F.col("n_in") - F.col("n_out")).alias("n_removed"),
                "n_out",
                (F.col("cs_in") - F.col("cs_out")).alias("removed_id_checksum"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# keyed by the bench.py headline names they twin
VANILLA_BUILDERS = {
    "q1_agg": _q1,
    "q3_join3": _q3,
    "window_rank": _wr,
    "events_agg": _ea,
    "dedup_staged": _staged,
    "dedup_minhash_weighted": _minhash_weighted,
    "dedup_simhash_pairs": _simhash_pairs,
    "quantiles_exact": _quantiles_exact,
    "graph_pagerank": _pagerank,
    "dedup_pipeline_bill": _pipeline_bill,
}
