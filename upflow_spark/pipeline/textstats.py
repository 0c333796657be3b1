"""Training-data text operators beyond SURVEY §2-J's list (north star):
language-ID, quality scoring, token counting, document fingerprinting.

All pure-SQL shapes (both engines evaluate the same IEEE double formulas), so
every key is oracle-checked despite being "pipeline" functionality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.pipeline.text import SQL_TOKENS, tokens_col
from upflow_spark.registry import query

# marker-token heuristic: function words per language family. The synthetic
# corpus shares one vocabulary, so scores are corpus-relative, not absolute —
# the op demonstrates the mechanism (n-gram/stopword scoring) exactly.
EN_MARKERS = ("the", "a", "of", "and", "to")


@query(
    "text_lang_id",
    oracle=f"""
SELECT doc_id, lang,
       floor((CAST(len(list_filter({SQL_TOKENS}, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
              / len({SQL_TOKENS})) * 10000 + 0.5) / 10000 AS en_marker_ratio,
       (CAST(len(list_filter({SQL_TOKENS}, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        / len({SQL_TOKENS})) >= 0.05 AS looks_en
FROM documents
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language-ID score per document.

    ratio of English function words among tokens; ≥5% ⇒ classified en.
    At scale this is a map-only pass (no shuffle).
    """
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()
    markers = F.filter(toks, lambda t: t.isin(*EN_MARKERS))
    ratio = F.size(markers).cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        r4(ratio).alias("en_marker_ratio"),
        (ratio >= 0.05).alias("looks_en"),
    )


@query(
    "text_quality_score",
    oracle=f"""
SELECT doc_id,
       floor((len_score * 0.4 + short_tok_score * 0.3 + diversity_score * 0.3) * 10000 + 0.5) / 10000 AS quality,
       n_tokens
FROM (
  SELECT doc_id,
         len({SQL_TOKENS}) AS n_tokens,
         least(CAST(n_chars AS DOUBLE) / 300.0, 1.0) AS len_score,
         1.0 - CAST(len(list_filter({SQL_TOKENS}, t -> len(t) <= 2)) AS DOUBLE)
               / len({SQL_TOKENS}) AS short_tok_score,
         CAST(len(list_distinct({SQL_TOKENS})) AS DOUBLE) / len({SQL_TOKENS}) AS diversity_score
  FROM documents
)
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality: length, short-token ratio, lexical
    diversity (0.4/0.3/0.3 weights) — the standard pretraining heuristics,
    computed as one map-only expression."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()
    n_tokens = F.size(toks)
    len_score = F.least(F.col("n_chars").cast("double") / 300.0, F.lit(1.0))
    short_ratio = F.size(F.filter(toks, lambda t: F.length(t) <= 2)).cast(
        "double"
    ) / n_tokens
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    quality = len_score * 0.4 + (1.0 - short_ratio) * 0.3 + diversity * 0.3
    return d.select(
        "doc_id",
        r4(quality).alias("quality"),
        n_tokens.cast("long").alias("n_tokens"),
    )


@query(
    "text_token_count",
    oracle=f"""
SELECT doc_id,
       len({SQL_TOKENS}) AS n_ws_tokens,
       len(list_filter(regexp_split_to_array(text, '[^a-z0-9]+'), t -> t <> '')) AS n_re_tokens,
       CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS n_bpe_est
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, regex word-split, and the
    chars/4 BPE estimate used for LLM budget accounting."""
    d = load(spark, sf_dir, "documents")
    ws = F.size(tokens_col()).cast("long")
    re_toks = F.size(
        F.filter(F.split(F.col("text"), "[^a-z0-9]+"), lambda t: t != "")
    ).cast("long")
    bpe_est = F.ceil(F.col("n_chars").cast("double") / 4.0).cast("long")
    return d.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        re_toks.alias("n_re_tokens"),
        bpe_est.alias("n_bpe_est"),
    )


@query(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       min(md5(substr(norm, i, 16))) AS fingerprint,
       len(norm) AS n_norm_chars
FROM (
  SELECT doc_id, trim(text) AS norm,
         unnest(range(1, greatest(length(trim(text)) - 15, 1) + 1)) AS i
  FROM documents
)
GROUP BY doc_id, norm
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over all 16-char sliding windows.

    Shift-invariant content fingerprint (robust to leading/trailing edits,
    unlike whole-text md5). Windows are generated with sequence+transform —
    map-only, no UDF; at 100 TB combine with banding on the fingerprint for
    near-dup candidate generation.
    """
    # single-file fixture -> 1 partition; this key evaluates ~1000 md5s PER
    # DOC inside an interpreted HOF lambda (~5M at sf0.1), so spreading the
    # scan is the whole ballgame (r5: 4.1 s -> ~0.6 s, was the slowest key)
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    norm = F.trim(F.col("text"))
    n_windows = F.greatest(F.length(norm) - 15, F.lit(1))
    window_hashes = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.md5(norm.substr(i, F.lit(16))),
    )
    return d.select(
        "doc_id",
        F.array_min(window_hashes).alias("fingerprint"),
        F.length(norm).cast("long").alias("n_norm_chars"),
    )
