"""Text retrieval scoring over the documents corpus: BM25 search.

The classic lexical-retrieval primitive a training-data pipeline uses for
eval-set mining and quality probes. Spark-first shape: per-doc term
frequencies are MAP-SIDE array ops (no explode, no shuffle), corpus
statistics (N, avgdl, per-term document frequencies) are one 1-row
aggregate broadcast back, scoring is map-only, and the top-k compiles to
TakeOrderedAndProject — at 100 TB the corpus is scanned once and nothing
but k rows ever converges.

Float parity: the score is an EXPLICIT fixed-order sum over the (constant)
query terms — no join-order-dependent aggregation — so Spark and DuckDB
evaluate the identical IEEE expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.pipeline.similarity import _cos, _sql_cos, _unit
from upflow_spark.pipeline.text import SQL_TOKENS, tokens_col
from upflow_spark.registry import query

QUERY_TERMS = ("join", "filter", "scan")
K1 = 1.2
B = 0.75


def _sql_tf(term: str) -> str:
    return f"len(list_filter({SQL_TOKENS}, t -> t = '{term}'))"


def _sql_score() -> str:
    parts = []
    for t in QUERY_TERMS:
        parts.append(
            f"ln((stats.n_docs - stats.df_{t} + 0.5) / (stats.df_{t} + 0.5) + 1.0)"
            f" * (tf.tf_{t} * {K1 + 1.0}) / "
            f"(tf.tf_{t} + {K1} * (1.0 - {B} + {B} * tf.dl / stats.avgdl))"
        )
    return " + ".join(parts)


# shared CTE prefix for every key scoring the fixed query: per-doc term
# frequencies + the 1-row corpus stats table
_SQL_TF_STATS = f"""tf AS (
  SELECT doc_id,
         CAST(len({SQL_TOKENS}) AS DOUBLE) AS dl,
         {", ".join(f"CAST({_sql_tf(t)} AS DOUBLE) AS tf_{t}" for t in QUERY_TERMS)}
  FROM documents
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
         {", ".join(f"CAST(count(*) FILTER (tf_{t} > 0) AS DOUBLE) AS df_{t}" for t in QUERY_TERMS)}
  FROM tf
)"""


@query(
    "bm25_search",
    oracle=f"""
WITH {_SQL_TF_STATS}
SELECT doc_id, floor(({_sql_score()}) * 10000 + 0.5) / 10000 AS bm25
FROM tf CROSS JOIN stats
ORDER BY ({_sql_score()}) DESC, doc_id ASC
LIMIT 10
""",
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by BM25 (k1=1.2, b=0.75, Lucene idf) for the fixed
    query {join, filter, scan}.

    Per-doc tf via size(filter(tokens)) — map-side, no explode; corpus
    stats via one 1-row aggregate broadcast back (the
    q_parts_above_avg_price pattern); ranking via orderBy+limit →
    TakeOrderedAndProject. One corpus scan end to end.
    """
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("score_raw").desc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id", r4(F.col("score_raw")).alias("bm25"))
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score_raw): every document BM25-scored for the fixed query."""
    toks = tokens_col()

    def _tf(term: str):  # noqa: ANN202  (closure, NOT a default arg: a
        # 2-arg HOF lambda would be read by pyspark as (element, index))
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    # repartition: the single-file fixture scans as ONE partition, so the
    # tokenize+tf projection otherwise runs on one core. localCheckpoint:
    # the tf table feeds BOTH the stats aggregate and the scoring pass, and
    # Spark does not share subplans — without materialization the corpus is
    # tokenized twice (the r5 bm25 regression: 0.63 → 0.74 s; this shape
    # measures 0.50 s at sf0.1). At 100 TB: persist the tf projection —
    # it's the classic scan-once/aggregate-then-rejoin pattern.
    d = (
        load(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.size(toks).cast("double").alias("dl"),
            *[_tf(t).cast("double").alias(f"tf_{t}") for t in QUERY_TERMS],
        )
        .localCheckpoint()
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count_if(F.col(f"tf_{t}") > 0).cast("double").alias(f"df_{t}")
            for t in QUERY_TERMS
        ],
    )
    scored = d.crossJoin(F.broadcast(stats))
    score = None
    for t in QUERY_TERMS:  # fixed-order sum — identical FP sequence to the SQL
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
            + 1.0
        )
        part = idf * (F.col(f"tf_{t}") * (K1 + 1.0)) / (
            F.col(f"tf_{t}") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))
        )
        score = part if score is None else score + part
    return scored.withColumn("score_raw", score).select("doc_id", "score_raw")


RRF_K = 60  # the standard reciprocal-rank-fusion constant (Cormack et al. 2009)
RRF_DEPTH = 100  # per-arm list depth: docs below rank 100 contribute nothing


@query(
    "search_rrf_hybrid",
    oracle=f"""
WITH {_SQL_TF_STATS},
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY ({_sql_score()}) DESC, doc_id ASC) AS rl
  FROM tf CROSS JOIN stats
  WHERE doc_id <> 0
),
lex_top AS (SELECT doc_id, rl FROM lex WHERE rl <= {RRF_DEPTH}),
probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
dense AS (
  SELECT e.vec_id AS doc_id,
         row_number() OVER (ORDER BY ({_sql_cos('e.embedding', 'probe.p')}) DESC,
                            e.vec_id ASC) AS rd
  FROM embeddings e CROSS JOIN probe
  WHERE e.vec_id <> 0
),
dense_top AS (SELECT doc_id, rd FROM dense WHERE rd <= {RRF_DEPTH}),
fused AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         coalesce(1.0 / ({RRF_K} + l.rl), 0.0)
           + coalesce(1.0 / ({RRF_K} + d.rd), 0.0) AS rrf_raw
  FROM lex_top l FULL OUTER JOIN dense_top d ON l.doc_id = d.doc_id
)
SELECT doc_id, floor(rrf_raw * 10000 + 0.5) / 10000 AS rrf
FROM fused
ORDER BY rrf_raw DESC, doc_id ASC
LIMIT 10
""",
)
def search_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) arm and
    a dense (embedding-cosine) arm — the standard production shape for
    training-data eval mining and RAG candidate generation. Query = the
    fixed terms {join, filter, scan} for the lexical arm and document 0's
    embedding for the dense arm (doc 0 itself is excluded from both arms).

    rrf(d) = Σ_arm 1/(60 + rank_arm(d)) over the arms' top-100 lists; docs
    outside a list contribute 0 from that arm. FP parity: ranks are exact
    integers (each arm's ordering is the engines' bit-identical score tree,
    ties broken by doc_id), so the fused score is the same two-term IEEE
    sum on both engines.

    Scale: each arm is an independent top-k (TakeOrderedAndProject — no
    global sort); fusion joins two ≤100-row lists. At 100 TB each arm's
    candidate generation is its own bucketed/ANN path (bm25_search,
    sim_probe_topk); RRF itself stays a driver-scale list merge, which is
    exactly why production hybrid search fuses by rank, not by score.
    """
    fused = _fused_rrf(spark, sf_dir)
    return (
        fused.orderBy(F.col("rrf_raw").desc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id", r4(F.col("rrf_raw")).alias("rrf"))
    )


def _lex_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rl): BM25 lexical arm ranks 1..RRF_DEPTH (doc 0 excluded).

    Rank assignment over an already-limited 100-row list: the unpartitioned
    window is a single task over <=100 rows by construction, not a scale
    risk. Shared by search_rrf_hybrid and eval_retrieval_ndcg."""
    lex = (
        _bm25_scored(spark, sf_dir)
        .filter(F.col("doc_id") != 0)
        .orderBy(F.col("score_raw").desc(), F.col("doc_id").asc())
        .limit(RRF_DEPTH)
    )
    return lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score_raw").desc(), F.col("doc_id").asc()))
        .alias("rl"),
    )


def _dense_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rd): dense cosine arm ranks 1..RRF_DEPTH vs doc 0's
    embedding (doc 0 excluded) — one corpus scan into
    TakeOrderedAndProject, probe broadcast as a 1-row relation."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _unit("embedding").alias("emb")
    )
    probe = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("p"))
    dense = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            _cos(F.col("emb"), F.col("p")).alias("cos_raw"),
        )
        .orderBy(F.col("cos_raw").desc(), F.col("doc_id").asc())
        .limit(RRF_DEPTH)
    )
    return dense.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("cos_raw").desc(), F.col("doc_id").asc()))
        .alias("rd"),
    )


def _fused_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rrf_raw): reciprocal-rank fusion of the two arms' top-100
    lists — the shared core of search_rrf_hybrid and eval_retrieval_ndcg."""
    lex = _lex_ranked(spark, sf_dir)
    dense = _dense_ranked(spark, sf_dir)
    return lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (RRF_K + F.col("rl")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("rd")), F.lit(0.0))
        ).alias("rrf_raw"),
    )


@query(
    "eval_rouge_ngram",
    oracle=f"""
WITH rgref AS MATERIALIZED (
  SELECT lang, min(doc_id) AS ref_id FROM documents GROUP BY lang
),
rgu AS MATERIALIZED (
  SELECT DISTINCT doc_id, lang, unnest({SQL_TOKENS}) AS g FROM documents
),
rgb AS MATERIALIZED (
  SELECT DISTINCT doc_id, lang, t[i] || ' ' || t[i + 1] AS g
  FROM (SELECT doc_id, lang, unnest(range(1, len(t))) AS i, t
        FROM (SELECT doc_id, lang, {SQL_TOKENS} AS t FROM documents))
),
rgru AS (SELECT r.lang, u.g FROM rgref r JOIN rgu u ON u.doc_id = r.ref_id),
rgrb AS (SELECT r.lang, b.g FROM rgref r JOIN rgb b ON b.doc_id = r.ref_id),
rgru_n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM rgru GROUP BY lang),
rgrb_n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM rgrb GROUP BY lang),
rh1 AS (
  SELECT u.doc_id, CAST(count(*) AS BIGINT) AS h
  FROM rgu u JOIN rgru r ON u.lang = r.lang AND u.g = r.g
  GROUP BY u.doc_id
),
rh2 AS (
  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS h
  FROM rgb b JOIN rgrb r ON b.lang = r.lang AND b.g = r.g
  GROUP BY b.doc_id
)
SELECT d.doc_id, d.lang,
       CAST(coalesce(h1.h, 0) AS BIGINT) AS r1_hits,
       u.n AS r1_ref,
       floor((CAST(coalesce(h1.h, 0) AS DOUBLE) / u.n) * 10000 + 0.5) / 10000
         AS rouge1,
       CAST(coalesce(h2.h, 0) AS BIGINT) AS r2_hits,
       coalesce(b.n, 0) AS r2_ref,
       CASE WHEN b.n > 0 THEN
         floor((CAST(coalesce(h2.h, 0) AS DOUBLE) / b.n) * 10000 + 0.5) / 10000
       END AS rouge2
FROM documents d
JOIN rgru_n u ON d.lang = u.lang
LEFT JOIN rgrb_n b ON d.lang = b.lang
LEFT JOIN rh1 h1 ON d.doc_id = h1.doc_id
LEFT JOIN rh2 h2 ON d.doc_id = h2.doc_id
""",
)
def eval_rouge_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-ROUGE evaluation against a per-language reference — the
    summarization/contamination eval primitive: for every document,
    ROUGE-1 and ROUGE-2 RECALL of its language's reference document (the
    language's min doc_id): |distinct-ngrams(doc) ∩ distinct-ngrams(ref)|
    / |distinct-ngrams(ref)|. The same overlap machinery an eval harness
    runs candidate-vs-reference; here the reference set doubles as a
    per-language similarity probe over the corpus.

    Exact integer overlap counts, one IEEE division, r4 — ROUGE-2 is NULL
    when the reference has no bigrams (degenerate-relation rule). Scale:
    the reference ngram sets are ≤|langs|·ref-doc-length rows (tiny —
    AQE broadcasts them; no forced hint); the corpus side is one distinct
    ngram explode joined on (lang, gram), never doc×doc.
    """
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()
    refs = d.groupBy("lang").agg(F.min("doc_id").alias("ref_id"))
    uni = d.select(
        "doc_id", "lang", F.explode(toks).alias("g")
    ).distinct()
    t = d.select("doc_id", "lang", toks.alias("t"), F.size(toks).alias("n"))
    big = (
        t.filter(F.col("n") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.col("n") - 1),
                    F.expr("slice(t, 2, n - 1)"),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("g"),
        )
        .distinct()
    )
    ref_uni = uni.join(
        refs, (uni.doc_id == refs.ref_id) & (uni.lang == refs.lang)
    ).select(uni.lang.alias("rl"), "g")
    ref_big = big.join(
        refs, (big.doc_id == refs.ref_id) & (big.lang == refs.lang)
    ).select(big.lang.alias("rl"), "g")
    run = ref_uni.groupBy("rl").agg(F.count(F.lit(1)).cast("long").alias("r1_ref"))
    rbn = ref_big.groupBy("rl").agg(F.count(F.lit(1)).cast("long").alias("r2_ref"))
    h1 = (
        uni.join(ref_uni, (uni.lang == ref_uni.rl) & (uni.g == ref_uni.g))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("r1_hits"))
    )
    h2 = (
        big.join(ref_big, (big.lang == ref_big.rl) & (big.g == ref_big.g))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("r2_hits"))
    )
    return (
        d.select("doc_id", "lang")
        .join(run.withColumnRenamed("rl", "lang"), "lang")
        .join(rbn.withColumnRenamed("rl", "lang"), "lang", "left")
        .join(h1, "doc_id", "left")
        .join(h2, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("r1_hits", F.lit(0)).cast("long").alias("r1_hits"),
            "r1_ref",
            r4(
                F.coalesce("r1_hits", F.lit(0)).cast("double") / F.col("r1_ref")
            ).alias("rouge1"),
            F.coalesce("r2_hits", F.lit(0)).cast("long").alias("r2_hits"),
            F.coalesce("r2_ref", F.lit(0)).cast("long").alias("r2_ref"),
            F.when(
                F.col("r2_ref") > 0,
                r4(
                    F.coalesce("r2_hits", F.lit(0)).cast("double")
                    / F.col("r2_ref")
                ),
            ).alias("rouge2"),
        )
    )


NDCG_K = 10  # graded depth for the retrieval-quality eval
NDCG_UNIT = 1_000_000  # micro-unit quantization for order-free DCG sums


@query(
    "eval_retrieval_ndcg",
    oracle=f"""
WITH {_SQL_TF_STATS},
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY ({_sql_score()}) DESC, doc_id ASC) AS rl
  FROM tf CROSS JOIN stats
  WHERE doc_id <> 0
),
lex_top AS (SELECT doc_id, rl FROM lex WHERE rl <= {RRF_DEPTH}),
probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
dense AS (
  SELECT e.vec_id AS doc_id,
         row_number() OVER (ORDER BY ({_sql_cos('e.embedding', 'probe.p')}) DESC,
                            e.vec_id ASC) AS rd
  FROM embeddings e CROSS JOIN probe
  WHERE e.vec_id <> 0
),
dense_top AS (SELECT doc_id, rd FROM dense WHERE rd <= {RRF_DEPTH}),
truth AS (
  SELECT doc_id, CAST({NDCG_K} + 1 - rd AS BIGINT) AS gain
  FROM dense WHERE rd <= {NDCG_K}
),
fused AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         coalesce(1.0 / ({RRF_K} + l.rl), 0.0)
           + coalesce(1.0 / ({RRF_K} + d.rd), 0.0) AS rrf_raw
  FROM lex_top l FULL OUTER JOIN dense_top d ON l.doc_id = d.doc_id
),
rrf_arm AS (
  SELECT doc_id, rk FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY rrf_raw DESC, doc_id ASC) AS rk
    FROM fused
  ) WHERE rk <= {NDCG_K}
),
arms AS (
  SELECT 'bm25' AS arm, doc_id, CAST(rl AS BIGINT) AS rk FROM lex
  WHERE rl <= {NDCG_K}
  UNION ALL
  SELECT 'rrf' AS arm, doc_id, CAST(rk AS BIGINT) AS rk FROM rrf_arm
),
scored AS (
  SELECT a.arm, a.rk, t.gain
  FROM arms a LEFT JOIN truth t ON a.doc_id = t.doc_id
),
nspine AS (SELECT CAST(unnest(range(1, {NDCG_K} + 1)) AS BIGINT) AS i),
idcg AS (
  SELECT CAST(sum(CAST(floor(CAST({NDCG_K} + 1 - i AS DOUBLE)
                 / ln(CAST(i + 1 AS DOUBLE)) * {NDCG_UNIT} + 0.5)
            AS BIGINT)) AS BIGINT) AS idcg_u
  FROM nspine
)
SELECT arm,
       CAST(count(gain) AS BIGINT) AS n_hits,
       floor(CAST(sum(CAST(CASE WHEN gain IS NULL THEN 0
                 ELSE floor(CAST(gain AS DOUBLE)
                      / ln(CAST(rk + 1 AS DOUBLE)) * {NDCG_UNIT} + 0.5)
                 END AS BIGINT)) AS DOUBLE)
             / CAST(idcg_u AS DOUBLE) * 10000 + 0.5) / 10000 AS ndcg10,
       floor(coalesce(1.0 / min(CASE WHEN gain IS NOT NULL THEN rk END), 0.0)
             * 10000 + 0.5) / 10000 AS mrr
FROM scored, idcg
GROUP BY arm, idcg_u
ORDER BY arm
""",
)
def eval_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality gate for the lexical and hybrid arms — nDCG@10
    and MRR of the BM25 arm and the RRF-fused arm against the
    embedding-cosine ground truth (the dense ranking vs document 0's
    embedding; graded gain NDCG_K+1-rank for the truth top-NDCG_K, 0 outside),
    the standard eval every retrieval stack reports (r13 verdict item 7).

    The rounded-rank discipline end to end: arm positions and truth gains
    are exact INTEGERS (each arm's ordering is the engines' bit-identical
    score tree, doc_id tie-breaks), each DCG term gain/ln(rank+1) is
    quantized to integer micro-units BEFORE summation (order-free int64
    sum — the retention micro-nat rule), and nDCG divides by the same
    micro-unit ideal-DCG constant computed in-engine from a range spine
    (never a Python float literal, so both engines use their own ln on
    identical inputs). MRR is a single IEEE division by the first hit's
    rank, 0.0 when an arm misses the truth set entirely.

    Scale: both arms are the shared top-k builders (_lex_ranked /
    _dense_ranked — corpus scan into TakeOrderedAndProject each); the
    eval itself joins three <= RRF_DEPTH-row lists and an NDCG_K-row spine —
    driver-scale by construction, exactly like the RRF fusion it grades.
    """
    lex = _lex_ranked(spark, sf_dir).localCheckpoint()  # feeds arm + fusion
    dense = _dense_ranked(spark, sf_dir).localCheckpoint()  # arm + truth
    truth = dense.filter(F.col("rd") <= NDCG_K).select(
        "doc_id", (F.lit(NDCG_K + 1) - F.col("rd")).cast("long").alias("gain")
    )
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (RRF_K + F.col("rl")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("rd")), F.lit(0.0))
        ).alias("rrf_raw"),
    )
    rrf_arm = (
        fused.orderBy(F.col("rrf_raw").desc(), F.col("doc_id").asc())
        .limit(NDCG_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("rrf_raw").desc(), F.col("doc_id").asc()))
            .cast("long")
            .alias("rk"),
        )
    )
    bm_arm = lex.filter(F.col("rl") <= NDCG_K).select(
        "doc_id", F.col("rl").cast("long").alias("rk")
    )
    arms = bm_arm.select(F.lit("bm25").alias("arm"), "doc_id", "rk").unionByName(
        rrf_arm.select(F.lit("rrf").alias("arm"), "doc_id", "rk")
    )
    scored = arms.join(truth, "doc_id", "left")
    spine = spark.range(1, NDCG_K + 1).select(F.col("id").cast("long").alias("i"))
    idcg = spine.agg(
        F.sum(
            F.floor(
                (F.lit(NDCG_K + 1) - F.col("i")).cast("double")
                / F.log((F.col("i") + 1).cast("double"))
                * NDCG_UNIT
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("idcg_u")
    )
    dcg_u = F.when(
        F.col("gain").isNull(), F.lit(0).cast("long")
    ).otherwise(
        F.floor(
            F.col("gain").cast("double")
            / F.log((F.col("rk") + 1).cast("double"))
            * NDCG_UNIT
            + F.lit(0.5)
        ).cast("long")
    )
    per_arm = (
        scored.select("arm", "rk", "gain", dcg_u.alias("dcg_u"))
        .groupBy("arm")
        .agg(
            F.count("gain").cast("long").alias("n_hits"),
            F.sum("dcg_u").cast("long").alias("dcg_sum"),
            F.min(F.when(F.col("gain").isNotNull(), F.col("rk"))).alias(
                "first_hit"
            ),
        )
    )
    return (
        per_arm.crossJoin(F.broadcast(idcg))
        .select(
            "arm",
            "n_hits",
            r4(
                F.col("dcg_sum").cast("double") / F.col("idcg_u").cast("double")
            ).alias("ndcg10"),
            r4(
                F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0))
            ).alias("mrr"),
        )
        .orderBy("arm")
    )
