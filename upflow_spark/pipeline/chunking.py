"""Training-window document chunking + statistical quality scoring.

Two LLM-pipeline operators that complement pack_token_bins (which PACKS
whole docs into bins; chunking SPLITS long docs into fixed-size training
windows) and text_quality_score (rule-based; the logprob key is
frequency-based):

- chunk_documents: fixed 64-token windows with 16-token stride overlap —
  the standard pretraining windowing. Map-only per doc (sequence +
  posexplode), no shuffle at any corpus width.
- text_unigram_logprob: per-doc average unigram surprisal −mean log p(term)
  with p estimated from the corpus itself. The vocabulary table is tiny
  relative to the corpus (Heaps' law), so it broadcasts; the corpus is
  scanned twice (once to count terms, once to score) — both map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.pipeline.text import SQL_TOKENS, tokens_col
from upflow_spark.registry import query

CHUNK = 64
STRIDE = 48  # 16-token overlap between consecutive chunks


@query(
    "chunk_documents",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKENS} AS ts FROM documents
),
idx AS (
  SELECT doc_id, ts,
         unnest(range(0, CAST(ceil(
           greatest(len(ts) - {CHUNK}, 0) / {STRIDE}.0) AS BIGINT) + 1)) AS i
  FROM toks
),
chunks AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         ts[i * {STRIDE} + 1 : least(i * {STRIDE} + {CHUNK}, len(ts))] AS w
  FROM idx
)
SELECT doc_id, chunk_idx,
       CAST(len(w) AS BIGINT) AS n_tokens,
       w[1] AS first_token,
       w[len(w)] AS last_token
FROM chunks
""",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into 64-token windows with stride 48 (16-token
    overlap); emit per-chunk stats (count, first/last token) so the output
    stays driver-hashable while the chunk arrays remain distributed.

    Chunk count per doc = ceil(max(n_tokens - CHUNK, 0) / STRIDE) + 1 —
    every token is covered, the final window may be short. sequence() +
    posexplode is map-only: no shuffle regardless of corpus size, and the
    chunk rows inherit the input partitioning (the property that matters
    when this feeds a tokenizer at 100 TB).
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", tokens_col().alias("ts")
    )
    n = F.size("ts")
    n_chunks = F.ceil(F.greatest(n - CHUNK, F.lit(0)) / F.lit(float(STRIDE))).cast(
        "long"
    ) + 1
    d = d.select(
        "doc_id",
        "ts",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_i"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.slice(
            "ts",
            F.col("chunk_idx") * STRIDE + 1,
            F.least(
                F.lit(CHUNK),
                F.size("ts") - F.col("chunk_idx") * STRIDE,
            ),
        ).alias("w"),
    )
    return d.select(
        "doc_id",
        "chunk_idx",
        F.size("w").cast("long").alias("n_tokens"),
        F.element_at("w", 1).alias("first_token"),
        F.element_at("w", -1).alias("last_token"),
    )


@query(
    "text_unigram_logprob",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
),
tf AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
total AS (SELECT sum(n) AS tot FROM tf)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       floor((avg(-ln(CAST(tf.n AS DOUBLE) / total.tot))) * 10000 + 0.5) / 10000
         AS avg_surprisal
FROM tok JOIN tf USING (term) CROSS JOIN total
GROUP BY doc_id
""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average unigram surprisal per document — the frequency-based quality
    signal (high = rare-vocabulary / noisy docs; near-duplicate boilerplate
    scores low). p(term) comes from the corpus itself.

    Scale shape: the term-frequency table follows Heaps' law (sublinear in
    corpus size) so it broadcasts; the grand total rides along as a
    broadcast 1-row aggregate — the corpus-side plan is scan → explode →
    broadcast-join → per-doc agg, with no wide shuffle of raw text.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    total = tf.agg(F.sum("n").cast("double").alias("tot"))
    return (
        tok.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            r4(F.avg(-F.log(F.col("n").cast("double") / F.col("tot")))).alias(
                "avg_surprisal"
            ),
        )
    )


LM_UNAT = 10**6  # per-bigram logprobs quantized to integer micro-nats


@query(
    "text_bigram_lm_logprob",
    oracle=f"""
WITH bl_tok AS MATERIALIZED (
  SELECT doc_id, {SQL_TOKENS} AS t FROM documents
),
bl_uni AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS cu
  FROM (SELECT unnest(t) AS w FROM bl_tok) GROUP BY w
),
bl_v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM bl_uni),
bl_big AS MATERIALIZED (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, unnest(range(1, len(t))) AS i, t FROM bl_tok)
),
bl_bc AS MATERIALIZED (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bl_big GROUP BY w1, w2
),
bl_lp AS (
  SELECT b.doc_id,
         CAST(floor(ln(CAST(c.cb + 1 AS DOUBLE)
                       / CAST(u.cu + bl_v.v AS DOUBLE)) * {LM_UNAT} + 0.5)
              AS BIGINT) AS lp
  FROM bl_big b
  JOIN bl_bc c ON b.w1 = c.w1 AND b.w2 = c.w2
  JOIN bl_uni u ON b.w1 = u.w, bl_v
),
bl_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(lp) AS BIGINT) AS lp_unats
  FROM bl_lp GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(coalesce(d.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(d.lp_unats, 0) AS BIGINT) AS lp_unats,
       CASE WHEN d.n_bigrams > 0 THEN
         floor((CAST(d.lp_unats AS DOUBLE) / {LM_UNAT} / d.n_bigrams)
               * 10000 + 0.5) / 10000
       END AS avg_logprob
FROM bl_tok t LEFT JOIN bl_doc d ON t.doc_id = d.doc_id
""",
)
def text_bigram_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-1 smoothing — the LM-quality
    signal one tier above text_unigram_logprob (perplexity-bucket inputs,
    fluency/quality proxy): P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) trained on
    the corpus itself, each document scored by its mean bigram logprob.

    Float parity: each bigram's logprob is one identical IEEE expression
    (integer counts → one division → ln), then quantized to integer
    MICRO-NATS before the per-doc sum — the basis-point rule, so the sum
    is exact int64 and order-free on both engines; only the final mean is
    an r4 double. Docs with <2 tokens carry 0 bigrams and a NULL score
    (degenerate-relation rule).

    Scale: two count groupBys (unigram, bigram — both Heaps-bounded vocab
    tables, NOT corpus-sized), then the doc bigram stream equi-joins its
    count tables on token keys (co-partitioned shuffle joins; nothing is
    forced broadcast — AQE broadcasts the vocab sides when they fit).
    One corpus scan feeds everything.
    """
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()
    t = d.select("doc_id", toks.alias("t"), F.size(toks).alias("n"))
    uni = (
        t.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cu"))
    )
    v = uni.agg(F.count(F.lit(1)).cast("long").alias("v"))
    big = t.filter(F.col("n") >= 2).select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.col("n") - 1).alias("w1"),
                F.expr("slice(t, 2, n - 1)").alias("w2"),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bc = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("cb")
    )
    lp = (
        big.join(bc, ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), "cu"), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.floor(
                F.log(
                    (F.col("cb") + 1).cast("double")
                    / (F.col("cu") + F.col("v")).cast("double")
                )
                * LM_UNAT
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp"),
        )
    )
    per_doc = lp.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("lp").cast("long").alias("lp_unats"),
    )
    return (
        t.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("lp_unats", F.lit(0)).cast("long").alias("lp_unats"),
            F.when(
                F.col("n_bigrams") > 0,
                r4(
                    F.col("lp_unats").cast("double")
                    / LM_UNAT
                    / F.col("n_bigrams")
                ),
            ).alias("avg_logprob"),
        )
    )
