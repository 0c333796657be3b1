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
